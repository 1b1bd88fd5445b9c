"""Scale-up corpus: a deterministic ~10x replication of sf0.1 ("sf1x") for
measuring how the headline queries scale with data volume (VERDICT r2 task 4).

Each table is unioned k times with copy-offset keys so every FK edge stays
consistent (copy i of lineitem joins copy i of orders, etc.) and key
cardinality scales with the data.  nation/region stay fixed (they are
fixed-size dims at any scale, like TPC-H).

Document text is NOT copied verbatim: copy i>0 gets a deterministic
copy-specific permutation of its tokens.  Verbatim copies would make every
document an exact/near duplicate of its 9 siblings, so LSH candidate-pair
counts (d06/d12) would grow quadratically in the copy count — an artifact
of the replication, not of scale — and exact dedup (t01) would collapse
10x of the corpus into one group.  Permuting token ORDER preserves each
document's token multiset (so token counts, language ID, quality scores
and length distributions are unchanged) while scrambling the 3-token
shingles that MinHash/winnowing fingerprint, keeping near-dup density
per-document roughly constant as the corpus grows — the property a real
10x corpus would have.

Embedding vectors are copied as-is (doc_id offset): the headline vector
queries (v01 top-k, v04 IVF probe) are linear in candidates, so duplicate
vectors only scale bucket populations, which is exactly what scale does.
"""

from __future__ import annotations

import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_spark.catalog import TABLES, table

# key column -> key domain; every column in one domain gets the same stride
_SCALE_KEYS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "c"},
    "orders": {"o_orderkey": "o", "o_custkey": "c"},
    "lineitem": {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"},
    "part": {"p_partkey": "p"},
    "supplier": {"s_suppkey": "s"},
    "events": {"event_id": "e", "user_id": "u"},
    "documents": {"doc_id": "d"},
    "embeddings": {"vec_id": "v"},
}

# where each domain's stride (max key + 1) is measured
_DOMAIN_SOURCE = {
    "c": ("customer", "c_custkey"),
    "o": ("orders", "o_orderkey"),
    "p": ("part", "p_partkey"),
    "s": ("supplier", "s_suppkey"),
    "e": ("events", "event_id"),
    "u": ("events", "user_id"),
    "d": ("documents", "doc_id"),
    "v": ("embeddings", "vec_id"),
}


def _permuted_text(text_col, copy_col):
    """Deterministic copy-specific token permutation (copy 0 = original).

    Tokens are sorted by xxhash64(token, position, copy) — a stable
    pseudo-random order per (document, copy), computed entirely JVM-side.
    """
    toks = F.split(text_col, " ")
    keyed = F.transform(
        toks, lambda t, i: F.struct(F.xxhash64(t, i, copy_col).alias("h"), t.alias("t"))
    )
    permuted = F.concat_ws(" ", F.transform(F.array_sort(keyed), lambda s: s["t"]))
    return F.when(copy_col == 0, text_col).otherwise(permuted)


def generate_scaled_corpus(
    spark: SparkSession, base_dir: str, out_dir: str, copies: int = 10
) -> dict[str, Any]:
    """Write the k-fold scaled corpus under ``out_dir`` (one parquet dir per
    table, same names as the base corpus so ``catalog.table`` reads it via
    sf_dir swap).  Idempotent: skips generation when the marker exists."""
    marker = os.path.join(out_dir, "_SCALED_OK")
    if os.path.exists(marker):
        # ADVICE r3: the skip path must verify the cached corpus was built
        # with the SAME copy count — otherwise ratios get computed against a
        # mislabeled corpus. Mismatch -> regenerate.
        with open(marker) as fh:
            if fh.read().strip() == f"copies={copies}":
                return {"generated": False, "copies": copies}
    t0 = time.perf_counter()
    os.makedirs(out_dir, exist_ok=True)

    strides = {
        dom: table(spark, base_dir, tbl).agg(F.max(col)).first()[0] + 1
        for dom, (tbl, col) in _DOMAIN_SOURCE.items()
    }

    for name in TABLES:
        src = table(spark, base_dir, name)
        if name not in _SCALE_KEYS:  # nation/region: fixed-size dims
            out = src
        else:
            copies_df = spark.range(copies).withColumnRenamed("id", "_copy")
            wide = src.crossJoin(copies_df)
            for col, dom in _SCALE_KEYS[name].items():
                wide = wide.withColumn(
                    col, (F.col(col) + F.col("_copy") * F.lit(strides[dom])).cast("long")
                )
            if name == "documents":
                wide = wide.withColumn(
                    "text", _permuted_text(F.col("text"), F.col("_copy"))
                )
            out = wide.drop("_copy")
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))

    with open(marker, "w") as fh:
        fh.write(f"copies={copies}\n")
    return {
        "generated": True,
        "copies": copies,
        "generate_sec": round(time.perf_counter() - t0, 3),
    }
