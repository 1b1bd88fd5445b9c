"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB (SURVEY.md §7.8):
- Exact dedup = one shuffle on an md5 fingerprint key (functions/text.py).
- MinHash+LSH: signatures are computed per-row with built-in array functions
  (no UDFs, no explode of the shingle set into a shuffle); only the tiny
  (doc_id, band_key) pairs shuffle.  Candidate verification joins back the
  shingle arrays and computes Jaccard with array_intersect sizes.  Total cost
  is O(rows) map-side + a bucket-join whose fan-out is controlled by band
  width — the standard scalable near-dup pipeline.
- SimHash: per-row 32-bit signature from token hashes; bucket by signature
  (or by rotated prefixes for hamming-distance search).

Cross-engine determinism: the shingle hash is a closed-form polynomial over
the first 8 character codes (no engine hash functions whose seeds differ),
so the DuckDB oracle reproduces signatures bit-for-bit.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from delta_lake_spark.functions.text import normalize_text, tokens

MINHASH_PRIME = 1_000_003
MINHASH_K = 16
MINHASH_BAND_SIZE = 4

# Fixed MinHash permutation coefficients (seeded; shared with the SQL oracle).
_rng = random.Random(42)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, MINHASH_PRIME), _rng.randrange(0, MINHASH_PRIME)) for _ in range(MINHASH_K)
]

_POLY_COEFS = [31**p for p in range(7, -1, -1)]  # 31^7 .. 31^0


def shingle_hash(s: Column) -> Column:
    """Closed-form polynomial hash of the first 8 chars: sum ascii(c_i)*31^(8-i).
    ascii('') == 0 in both Spark and DuckDB, so short strings pad with zeros."""
    total = F.lit(0).cast("long")
    for i, coef in enumerate(_POLY_COEFS, start=1):
        total = total + F.ascii(F.substring(s, i, 1)).cast("long") * F.lit(coef)
    return total


def token_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-token shingles (space-joined) of the normalized text.

    A plain column name takes the single-``F.expr`` fast path (same
    expression, one Py4J parse instead of hundreds of Column calls — see
    dedup_sql.py)."""
    if isinstance(text, str):
        from delta_lake_spark.functions.dedup_sql import token_shingles_sql

        return F.expr(token_shingles_sql(text, n))
    toks = tokens(normalize_text(text))
    # guard, not greatest(...,0): Spark's sequence(1, 0) yields a DESCENDING
    # [1, 0] (unlike DuckDB's empty range(1, 1)), so a <n-token document
    # crashed on element_at(toks, 0) under ANSI. <n tokens -> [].
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    sh = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]))
    )
    return F.when(F.size(toks) >= n, sh).otherwise(F.array().cast("array<string>"))


def _perm(a: int, b: int):
    # NB: plain single-arg lambdas only — PySpark reads the Python signature
    # to decide the higher-order function's arity, so default-arg closures
    # (lambda s, a=a: ...) break with NUM_ARGS_MISMATCH.
    return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_PRIME


def minhash_signature(shingles: Column) -> Column:
    """Array of MINHASH_K minima of (a*h(s)+b) mod p over the shingle set.

    The base hash is materialized ONCE per shingle (one transform), then each
    permutation is plain integer arithmetic over the hashed array — 16x less
    string work than hashing inside every permutation.
    """
    hashes = F.transform(shingles, shingle_hash)
    mins = [F.array_min(F.transform(hashes, _perm(a, b))) for a, b in MINHASH_COEFFS]
    return F.array(*mins)


def band_keys(sig: Column) -> Column:
    """LSH band keys: array of (band_id, key) structs; docs sharing any band
    key are near-dup candidates."""
    n_bands = MINHASH_K // MINHASH_BAND_SIZE
    bands = []
    for b in range(n_bands):
        parts = [
            F.element_at(sig, b * MINHASH_BAND_SIZE + j + 1).cast("string")
            for j in range(MINHASH_BAND_SIZE)
        ]
        bands.append(F.struct(F.lit(b).alias("band"), F.concat_ws("-", *parts).alias("key")))
    return F.array(*bands)


def minhash_candidate_pairs(
    docs: DataFrame, id_col: str, text_col: str, tokens_col: str | None = None
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline -> verified candidate pairs with
    exact shingle-Jaccard (intersection/union sizes as integers).

    Returns columns: id_a, id_b, inter_size, union_size, jaccard_bp
    (jaccard in basis points, floor(10000*|∩|/|∪|) — integer, oracle-stable).

    ``tokens_col``: optional pre-tokenized array column (the normalized
    whitespace tokens, i.e. ``tokens(normalize_text(text))``).  A pipeline
    that already tokenized the corpus (p03 tokenizes ONCE for contamination
    grams + dedup shingles + LM scoring) passes it to skip the
    normalize+split regex pass here; shingle values are identical.
    """
    from delta_lake_spark.functions.dedup_sql import (
        _shingle_transform_sql,
        band_keys_sql,
        hashed_shingles_sql,
        minhash_sig_sql,
        token_shingles_sql,
    )

    shingles = (
        f"array_distinct({_shingle_transform_sql(tokens_col, 3)})"
        if tokens_col is not None
        else token_shingles_sql(text_col)
    )
    base = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.expr(shingles).alias("_sh"),
        )
        # internal graph gate: documents with no shingles (fewer than 3
        # NORMALIZED tokens) are not in the dedup graph. This is the same
        # membership rule as the oracle's _SHINGLES_SQL (normalized token
        # count), so callers don't need — and must not rely on — raw-token
        # pre-filters: raw and normalized counts diverge on punctuation-
        # joined text ('a.b.c' is 1 raw token but 3 normalized).
        .filter(F.size("_sh") > 0)
        # hash each shingle ONCE to a materialized column, then take the 16
        # permutation minima over the hashed array (identical values to
        # minhash_signature; columnar form keeps the build to 3 expr parses)
        .withColumn("_hs", F.expr(hashed_shingles_sql("_sh")))
        .withColumn("_sig", F.expr(minhash_sig_sql("_hs")))
        .drop("_hs")
    )
    # materialize once: the shingle+signature computation is the expensive
    # map-side pass and feeds both sides of the bucket self-join.
    base = base.persist()
    banded = base.select("_id", F.explode(F.expr(band_keys_sql("_sig"))).alias("_bk"))
    a = banded.select(F.col("_bk").alias("_bka"), F.col("_id").alias("id_a"))
    b = banded.select(F.col("_bk").alias("_bkb"), F.col("_id").alias("id_b"))
    cand = (
        a.join(b, (a._bka == b._bkb) & (a.id_a < b.id_b))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # verification join pulls the shingle arrays back only for candidates
    pairs = (
        cand.join(base.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha")), "id_a")
        .join(base.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb")), "id_b")
    )
    inter = F.size(F.array_intersect("_sha", "_shb"))
    union = F.size("_sha") + F.size("_shb") - inter
    return pairs.select(
        "id_a",
        "id_b",
        inter.alias("inter_size"),
        union.alias("union_size"),
        F.floor(inter * 10000 / union).cast("long").alias("jaccard_bp"),
    )


def simhash32(text: Column | str) -> Column:
    """32-bit SimHash over the distinct token set (hash = polynomial-8).
    Bit k of the result is 1 iff sum over tokens of (2*bit_k(h)-1) > 0.

    Single pass: ONE ``aggregate`` fold over the token-hash array carrying
    an ``array<long>[32]`` of per-bit counters (each step zips the
    accumulator with the bit-position constants), instead of 32 separate
    folds — same per-bit integer sums (addition is associative and the
    token order is unchanged), 32x less array traversal.
    """
    if isinstance(text, str):
        from delta_lake_spark.functions.dedup_sql import simhash32_sql

        return F.expr(simhash32_sql(text))
    # bit positions 0..31 and place values 2^k, zipped against the
    # 32-counter accumulator (Column constants — built per call, cheap)
    bit_idx = F.array(*[F.lit(k) for k in range(32)])
    pow2 = F.array(*[F.lit(1 << k).cast("long") for k in range(32)])
    toks = F.array_distinct(tokens(normalize_text(text)))
    hashes = F.transform(toks, shingle_hash)
    sums = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 32),
        lambda acc, h: F.zip_with(
            acc, bit_idx, lambda s, k: s + F.getbit(h, k) * 2 - 1
        ),
    )
    weighted = F.zip_with(
        sums,
        pow2,
        lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda a, x: a + x)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_jaccard_bp: int = 0,
) -> DataFrame:
    """All-pairs character-n-gram Jaccard similarity.

    Exact quadratic variant of the dedup family: right for small/filtered
    candidate sets (a re-rank stage after LSH blocking); for full-corpus
    near-dup at scale use minhash_candidate_pairs, which replaces the
    O(n^2) self-join with band-bucket blocking.
    """
    from delta_lake_spark.functions.text import char_ngrams

    grams = F.array_distinct(char_ngrams(F.col(text_col), n))
    base = docs.select(F.col(id_col).alias("_id"), grams.alias("_g")).filter(
        F.size("_g") > 0
    )
    a = base.select(F.col("_id").alias("id_a"), F.col("_g").alias("_ga"))
    b = base.select(F.col("_id").alias("id_b"), F.col("_g").alias("_gb"))
    inter = F.size(F.array_intersect("_ga", "_gb"))
    union = F.size("_ga") + F.size("_gb") - inter
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            inter.alias("inter_size"),
            union.alias("union_size"),
            F.floor(inter * 10000 / union).cast("long").alias("jaccard_bp"),
        )
        .filter(F.col("jaccard_bp") >= min_jaccard_bp)
    )


def token_shingle_seq(text: Column | str, n: int = 3) -> Column:
    """n-token shingles in document order, duplicates KEPT — the rolling
    sequence winnowing needs (and order-stable across engines, unlike
    distinct sets)."""
    toks = tokens(normalize_text(text))
    # <n tokens -> [] (sequence(1, 0) descends in Spark — see token_shingles)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    seq = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])
    )
    return F.when(F.size(toks) >= n, seq).otherwise(F.array().cast("array<string>"))


def winnow_fingerprints(text: Column | str, window: int = 4) -> Column:
    """Winnowing document fingerprint set (Schleimer et al., MOSS): the
    distinct minima of a rolling window over the in-order token-shingle
    hash sequence.  Robust to local edits — shared fingerprints localize
    near-duplicate regions; integer-only, oracle-reproducible."""
    if isinstance(text, str):
        from delta_lake_spark.functions.dedup_sql import winnow_sql

        return F.expr(winnow_sql(text, window))
    hashes = F.transform(token_shingle_seq(text), shingle_hash)
    # <window shingles -> [] (sequence(1, 0) descends in Spark)
    idx = F.sequence(F.lit(1), F.size(hashes) - (window - 1))
    fps = F.array_distinct(
        F.transform(idx, lambda i: F.array_min(F.slice(hashes, i, window)))
    )
    return F.when(F.size(hashes) >= window, fps).otherwise(
        F.array().cast("array<bigint>")
    )


def near_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_jaccard_bp: int = 8000,
    tokens_col: str | None = None,
    graph_docs: DataFrame | None = None,
) -> DataFrame:
    """Greedy near-duplicate removal: drop every document that has a
    more-canonical (lower-id) near-dup above the threshold.

    One LSH candidate pass + one anti-join — the standard first-cut corpus
    dedup.  Chains (a~b~c with a!~c) keep their middle member; full
    transitive collapse is ``dedup_clusters`` (connected components).
    ``tokens_col`` forwards a pre-tokenized column (see
    minhash_candidate_pairs).  ``graph_docs`` optionally widens the dedup
    GRAPH beyond the survivor candidates: pairs are mined from it, while
    only rows of ``docs`` can survive — used when a caller's keep-set gate
    (e.g. raw token count) is narrower than graph membership (normalized
    token count), so a doc outside the keep-set can still evict its dups.
    """
    pairs = minhash_candidate_pairs(
        graph_docs if graph_docs is not None else docs,
        id_col,
        text_col,
        tokens_col=tokens_col,
    )
    losers = (
        pairs.filter(F.col("jaccard_bp") >= min_jaccard_bp)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return docs.join(losers, id_col, "left_anti")


def connected_components(
    edges: DataFrame, a: str = "id_a", b: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """Connected components over an undirected edge list -> (id, component)
    with component = min id reachable.  Iterative label propagation: each
    round every node adopts the smallest label in its neighborhood; stops
    at fixpoint (no label changed) or ``max_iter``.

    Scale notes: each iteration is one groupBy-min over the (undirected)
    edge list joined to current labels — O(E) shuffle per round, converging
    in O(diameter) rounds (near-dup clusters are tiny, so 3-4 rounds in
    practice).  Labels are PINNED per round (eager checkpoint, the q73
    PageRank discipline — r10): persist alone bounds re-execution but not
    re-planning, so after k rounds the returned frame's logical plan nested
    k deep with the full upstream edge pipeline at every level — p05's
    committed r9 physical plan carried 2,257 Exchange nodes and every
    downstream job replanned all of it.  Pinning the vertex-sized label
    table each round (and the edge layout once) keeps every round's plan
    flat; the fixpoint check is a 1-row aggregate, the only driver
    round-trip.
    """
    from delta_lake_spark.ops.lineage import pin, unpin

    spark = edges.sparkSession
    sym = pin(
        # symmetrize in ONE pass over the (often expensive) edge plan: a
        # two-branch union re-executes the upstream per branch — for d10
        # that is the whole LSH candidate + verify pipeline twice (the
        # q101 corner-union lesson); exploding both orientations inline
        # evaluates it once
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(a).alias("u"), F.col(b).alias("v")),
                    F.struct(F.col(b).alias("u"), F.col(a).alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        # pre-partition on the per-round join key (v) BEFORE pinning: the
        # cached partitioning satisfies each round's join requirement, so
        # only the vertex-sized label table shuffles per iteration; core-
        # count partitions, not shuffle.partitions — the iteration is
        # scheduling-bound (the q73 PageRank pattern, measured 3x there)
        .repartition(spark.sparkContext.defaultParallelism, "v")
    )
    labels = pin(
        sym.select(F.col("u").alias("node")).distinct().withColumn(
            "label", F.col("node")
        )
    )
    for _ in range(max_iter):
        nm = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.v") == F.col("l.node"), "inner")
            .groupBy(F.col("e.u").alias("node"))
            .agg(F.min("l.label").alias("nmin"))
        )
        new_labels = pin(
            labels.alias("cur")
            .join(nm.alias("nm"), F.col("cur.node") == F.col("nm.node"), "left")
            .select(
                F.col("cur.node").alias("node"),
                F.least(
                    F.col("cur.label"), F.coalesce("nm.nmin", F.col("cur.label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        # pin the NEW round first, THEN release the superseded pinned frame
        # (the q73/q75 sequencing — ADVICE r8)
        unpin(labels)
        labels = new_labels
        if changed == 0:
            break
    unpin(sym)
    return labels.select(F.col("node").alias("id"), F.col("label").alias("component"))


def prefix_filter_jaccard_join(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    tau_num: int = 3,
    tau_den: int = 5,
) -> DataFrame:
    """EXACT all-pairs Jaccard >= tau_num/tau_den over distinct n-token
    shingle sets, via prefix filtering (the All-Pairs / PPJoin family —
    Bayardo et al. WWW'07, Xiao et al. WWW'08) instead of LSH.

    Where d06's MinHash+LSH trades recall for speed, prefix filtering is
    lossless: order every document's shingles by ascending document
    frequency (rarest first, ties by token); if two sets have Jaccard >=
    tau they MUST share a token within each other's first
    ``|s| - ceil(tau*|s|) + 1`` tokens, so joining on prefix tokens alone
    generates a candidate superset — no false negatives.  Candidates then
    verify with exact intersection sizes.

    Scale shape: the shuffled volume is (a) one token-frequency aggregate,
    (b) the prefix explode — about (1-tau) of the token stream, rarest
    tokens only, so the hottest (most frequent) tokens never fan out — and
    (c) candidate verification joins.  All thresholds are exact integer
    cross-products (no float division).
    """
    # shingles hash to longs up front (d06/d09 verification convention:
    # the oracle applies the same closed-form hash, so Jaccard over hash
    # sets is the shared exact semantic) — long keys shuffle and compare
    # several times cheaper than bigram strings.  Built as ONE SQL string
    # (dedup_sql fast path): the Column form inlines the normalize+split
    # tree into every element_at and costs seconds of driver build time.
    from delta_lake_spark.functions.dedup_sql import (
        shingle_hash_sql,
        token_shingles_sql,
    )

    toks_sql = (
        f"array_distinct(transform({token_shingles_sql(text_col, n)}, "
        f"s -> {shingle_hash_sql('s')}))"
    )
    # NO size()>0 filter here: Catalyst pushes such a filter below
    # table_parallel's exchange, re-running the whole shingle pipeline
    # single-threaded in the scan stage (measured 24 s vs 1.3 s at sf0.1).
    # explode() drops empty arrays anyway, so the filter is redundant.
    base = docs.selectExpr(
        f"{id_col} AS _id", f"{toks_sql} AS _toks"
    ).persist()  # feeds the df aggregate AND the join-back
    exploded = base.select("_id", F.explode("_toks").alias("_tok"))
    # document frequency per token orders prefixes rarest-first.  groupBy
    # does the counting map-side (partial agg), so only the vocabulary-sized
    # (token, df) table shuffles; the join back is AQE-broadcast when the
    # vocabulary is small — the full token stream is never window-sorted.
    df_tbl = exploded.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    with_df = exploded.join(df_tbl, "_tok")
    # per-doc tokens sorted by (df, token); prefix length
    # p = s - ceil(tau*s) + 1, with ceil(tau*s) = (tau_num*s + tau_den - 1) div tau_den
    sorted_docs = (
        with_df.groupBy("_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_df", "_tok"))),
                lambda s: s["_tok"],
            ).alias("_sorted"),
        )
        .withColumn("_sz", F.size("_sorted"))
        .withColumn(
            "_prefix",
            F.slice(
                "_sorted",
                1,
                F.col("_sz")
                - F.expr(f"({tau_num} * _sz + {tau_den - 1}) div {tau_den}")
                + 1,
            ),
        )
        # consumed three times (both self-join sides + verification);
        # persist so candidates and verification reuse one computation —
        # per-doc sorted hash arrays, the same footprint d06 persists
        .persist()
    )
    pref = sorted_docs.select(
        "_id", "_sz", F.posexplode("_prefix").alias("_i", "_tok")
    ).withColumn("_pos", F.col("_i") + 1)
    a, b = pref.alias("a"), pref.alias("b")
    # candidates: shared prefix token + id order + length filter
    # (tau * max(sz) <= min(sz), as integers) + PPJoin position filter:
    # tokens are position-aligned in ONE global order, so for the first
    # common token at positions (i, j) the overlap is at most
    # 1 + min(sz_a - i, sz_b - j); a qualifying pair needs overlap >=
    # alpha = ceil(tau/(1+tau) * (sz_a + sz_b)) — cross-multiplied to
    # integers.  Lossless (the earliest collision has the loosest bound)
    # but prunes late-prefix collisions before the distinct + verify.
    cand = (
        a.join(
            b,
            (F.col("a._tok") == F.col("b._tok"))
            & (F.col("a._id") < F.col("b._id"))
            & (
                F.lit(tau_num) * F.greatest("a._sz", "b._sz")
                <= F.lit(tau_den) * F.least("a._sz", "b._sz")
            )
            & (
                F.lit(tau_num + tau_den)
                * (
                    F.lit(1)
                    + F.least(
                        F.col("a._sz") - F.col("a._pos"),
                        F.col("b._sz") - F.col("b._pos"),
                    )
                )
                >= F.lit(tau_num) * (F.col("a._sz") + F.col("b._sz"))
            ),
        )
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .distinct()
    )
    # exact verification on the candidate pairs only
    sets = sorted_docs.select("_id", "_sorted", "_sz")
    verified = (
        cand.join(
            sets.select(
                F.col("_id").alias("id_a"),
                F.col("_sorted").alias("_ta"),
                F.col("_sz").alias("sz_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("_id").alias("id_b"),
                F.col("_sorted").alias("_tb"),
                F.col("_sz").alias("sz_b"),
            ),
            "id_b",
        )
        .withColumn("inter_size", F.size(F.array_intersect("_ta", "_tb")).cast("bigint"))
        .withColumn(
            "union_size",
            (F.col("sz_a") + F.col("sz_b") - F.col("inter_size")).cast("bigint"),
        )
        .filter(
            F.lit(tau_den) * F.col("inter_size")
            >= F.lit(tau_num) * F.col("union_size")
        )
    )
    return verified.select(
        "id_a",
        "id_b",
        "inter_size",
        "union_size",
        F.expr("CAST((inter_size * 10000) div union_size AS BIGINT)").alias(
            "jaccard_bp"
        ),
    )
