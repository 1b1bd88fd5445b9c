"""Benchmark harnesses.

``ref10m`` reproduces the reference's published workload (BASELINE.md) at
its own scale — a seeded 10M-row transactions dataset, the three Gold
marts, the merge/append save path, and the 3-predicate Z-order scan suite —
so ``bench.py`` can report like-for-like numbers against the reference's
self-timed runs.
"""

from delta_lake_spark.benchmark.ref10m import run_ref10m  # noqa: F401
