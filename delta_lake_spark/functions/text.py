"""Text-analysis column functions for large-scale training-data pipelines.

All hot-path functions are built-in pyspark.sql.functions compositions
(JVM-side, codegen'd) — no Python UDFs — so they stay inside whole-stage
codegen and scale linearly with input splits at 100 TB.

Surface: tokenization / token counting, normalization, document
fingerprinting, n-gram shingles, language ID (stopword heuristic), and a
quality score.  Cross-engine determinism (for the DuckDB oracle): only
integer/string/md5 primitives, no float accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Chosen to be disjoint across languages.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "with"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "les", "des", "une", "est"],
    "de": ["der", "die", "und", "das", "ein"],
    "zh": ["de5", "shi4", "zai4", "he2", "le5"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization; empty string -> empty array (not [''])."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def normalize_text(text: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse whitespace.
    The canonical form used for exact-dup fingerprinting."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (Rolling-hash variant in dedup.py; md5 is the cross-engine-stable core.)"""
    return F.md5(normalize_text(text))


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Character n-gram shingles of the normalized text, as an array.

    Built-in-only implementation: slice positions via sequence + transform.
    """
    norm = normalize_text(text)
    # guard, not greatest(...,0): Spark's sequence(1, 0) yields a DESCENDING
    # [1, 0], so a <n-char text produced bogus duplicate grams (DuckDB's
    # range(1, 1) is empty). <n chars -> [].
    grams = F.transform(
        F.sequence(F.lit(1), F.length(norm) - (n - 1)),
        lambda i: norm.substr(i, F.lit(n)),
    )
    return F.when(F.length(norm) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_bigrams(text: Column | str) -> Column:
    """Adjacent-token bigrams ("tok_i tok_i+1") as an array; <2 tokens -> [].

    Built-in-only (sequence + transform + element_at) so the whole expression
    stays in codegen.  The explicit <2 guard matters: Spark's sequence(1, 0)
    yields a DESCENDING [1, 0], not an empty range.
    """
    toks = tokens(text)
    n = F.size(toks)
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat(F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)),
    )
    return F.when(n >= 2, pairs).otherwise(F.array().cast("array<string>"))


def word_count_of(text: Column | str, word: str) -> Column:
    """Occurrences of a word (word-boundary regexp count, JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit(r"\b" + word + r"\b"))


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Total stopword occurrences for one language's list.

    ONE bounded-alternation regexp scan per language instead of one scan
    per word: ``\\b(w1|w2|...)\\b`` counts exactly the positions where a
    full token equals any listed word (boundaries force the whole token, so
    a shorter alternative that prefixes a longer one backtracks rather than
    double-counting — 'le' never fires inside 'les').  Equals the per-word
    sum, 5x fewer passes over the text; parity with the per-word DuckDB
    oracle mirror is hash-checked (t03/t04/t06).
    """
    pat = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit(pat))


def detect_language(text: Column | str, langs: list[str] | None = None) -> Column:
    """Heuristic language ID: argmax of stopword hit counts, deterministic
    tie-break on language-code order; 'und' when no stopword is seen."""
    langs = langs or sorted(LANG_STOPWORDS)
    scored = F.array(
        *[F.struct(stopword_hits(text, lg).alias("hits"), F.lit(lg).alias("lang")) for lg in langs]
    )
    # array_max on struct compares fields in order -> (max hits, then max lang);
    # to make ties resolve to the *first* lang alphabetically we negate rank by
    # sorting: pick max hits, then min lang among maxima.
    max_hits = F.array_max(F.transform(scored, lambda s: s["hits"]))
    winners = F.filter(scored, lambda s: s["hits"] == max_hits)
    first = F.array_min(F.transform(winners, lambda s: s["lang"]))
    return F.when(max_hits > 0, first).otherwise(F.lit("und"))


def punct_ratio(text: Column | str) -> Column:
    """Share of characters that are not alphanumeric/space, in 1/10000ths
    (integer to stay hash-stable across engines)."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
    # floor, not cast: Spark's double->long cast truncates while DuckDB's
    # rounds, so only an explicit floor is portable to the oracle.
    return F.when(F.length(c) > 0, F.floor((n_punct * 10000) / F.length(c))).otherwise(
        F.lit(0)
    ).cast("long")


def quality_score(text: Column | str) -> Column:
    """Integer 0-100 quality score: token-count band + stopword presence +
    punctuation penalty.  Deterministic (integer arithmetic only)."""
    tc = token_count(text)
    len_score = (
        F.when((tc >= 20) & (tc <= 1000), 50)
        .when((tc >= 5) & (tc < 20), 30)
        .when(tc > 1000, 25)
        .otherwise(0)
    )
    any_stop = F.lit(0)
    for lg in sorted(LANG_STOPWORDS):
        any_stop = any_stop + stopword_hits(text, lg)
    stop_score = F.when(any_stop > 0, 30).otherwise(0)
    punct_penalty = F.when(punct_ratio(text) > 2000, 20).otherwise(0)
    return (len_score + stop_score + F.lit(20) - punct_penalty).cast("long")


def bigram_lm_scores(
    docs, id_col: str = "doc_id", text_col: str = "text",
    tokens_col: str | None = None,
):
    """Per-document add-one-smoothed bigram LM score in exact integer
    MICRO-units (the KenLM-style perplexity-proxy quality signal, with the
    log/float path replaced by per-term integer flooring so the score is
    bit-exact cross-engine): mean over in-order bigrams of
    floor(1e6 * (c(w1 w2)+1) / (c(w1)+V)), counts taken from ``docs``
    itself.  Returns (doc_id, n_bigrams, lm_score_micro); documents with
    fewer than 2 tokens produce no bigrams and are absent.

    Scale: two count aggregates (map-side partial) + two vocabulary-sized
    equi-joins (AQE broadcasts them when small) + one per-doc aggregate;
    V rides as a broadcast 1-row cross join — no driver collection.
    """
    from delta_lake_spark.functions.dedup_sql import (
        _shingle_transform_sql,
        normalize_sql,
        tokens_sql,
    )

    # tokenize ONCE and persist: the bigram explode, the unigram counts,
    # and the vocabulary size are three traversals of the same token
    # arrays — without the persist each re-runs the normalize+split regex
    # over the full corpus (measured 8.2 -> 2.3 s warm on t27 at sf0.1).
    # ``tokens_col``: the caller already tokenized (p03's tokenize-once
    # frame) — project it instead of re-splitting; the persist still
    # matters because it materializes whatever upstream produced the rows
    # (e.g. the dedup anti-join) exactly once for the three traversals.
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("ws")
        ).persist()
        if tokens_col is not None
        else docs.selectExpr(
            f"{id_col} AS doc_id",
            f"{tokens_sql(normalize_sql(text_col))} AS ws",
        ).persist()
    )
    bi = toks.selectExpr(
        "doc_id", f"explode({_shingle_transform_sql('ws', 2)}) AS bg"
    ).withColumn("w1", F.substring_index("bg", " ", 1))
    uni = toks.selectExpr("explode(ws) AS w")
    # V = |vocab| = row count of the unigram count table: persist c1 (it
    # also feeds the term join) and read the count on the driver — one
    # traversal instead of a separate count_distinct shuffle + 1-row
    # broadcast cross join (p03/t23 stage audit, r6).  A count collapses to
    # one long at any corpus scale.
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1")).persist()
    vsz = c1.count()
    c2 = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    term = (
        bi.join(c2, "bg")
        .join(c1, bi["w1"] == c1["w"])
        .select(
            "doc_id",
            F.expr(f"(1000000 * (c2 + 1)) div (c1 + {int(vsz)})").alias(
                "micro"
            ),
        )
    )
    return term.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.expr("CAST(SUM(micro) div COUNT(*) AS BIGINT)").alias(
            "lm_score_micro"
        ),
    )
