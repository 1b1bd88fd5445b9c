"""Child process for the maintenance-vs-writer concurrency test.

Usage: python maintenance_child.py <table_path> <sync_dir> <n_passes>

Opens its own SparkSession (separate JVM), waits on the same file barrier
as concurrent_writer_child.py, then runs ``n_passes`` incremental
clustering passes through ``optimize_with_retry`` while the sibling
process merges — the scheduler-driven maintenance loop racing a live
writer.  Exits non-zero on any unexpected failure.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    table_path, sync_dir, n_passes = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("maintenance-child")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        from delta_lake_spark.tables import ManagedTable

        t = ManagedTable(spark, table_path)
        open(os.path.join(sync_dir, "ready-M"), "w").close()
        deadline = time.time() + 120
        while not os.path.exists(os.path.join(sync_dir, "go")):
            if time.time() > deadline:
                print("barrier timeout", file=sys.stderr)
                return 2
            time.sleep(0.05)

        for _ in range(n_passes):
            # every pass races the merging sibling by design
            t.optimize_with_retry(max_retries=50, target_file_bytes=64 * 1024)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
