"""Child process for the partition-independence determinism test.

Usage: python determinism_child.py <sf_dir> <master> <shuffle_partitions> \
    <max_partition_bytes> <out_file> <name> [<name> ...]

Opens its OWN SparkSession (separate JVM) with a deliberately different
parallelism profile — different executor-thread count, shuffle partition
count, and input-split size — runs each named registry query, and writes
``name<TAB>digest`` lines to ``out_file``.  The digest canonicalizes the
result exactly the way the driver's correctness gate does (columns sorted
by name, rows sorted, values stringified), so two runs under different
physical parallelism must produce identical digests for every query whose
math is order-independent — which is the engine's stated determinism
contract (queries/registry.py docstring).
"""

from __future__ import annotations

import hashlib
import os
import sys


def canonical_digest(df) -> str:
    cols = sorted(df.columns)
    rows = [tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()]
    rows.sort()
    h = hashlib.sha256()
    for row in rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    sf_dir, master, shuffle, max_bytes, out_file = sys.argv[1:6]
    names = sys.argv[6:]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master)
        .appName("determinism_child")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.files.maxPartitionBytes", max_bytes)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from delta_lake_spark.queries import QUERIES

    lines = []
    for name in names:
        lines.append(f"{name}\t{canonical_digest(QUERIES[name](spark, sf_dir))}")
    with open(out_file, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
