"""Sink writers (SURVEY.md §2.1 K1, K6, K7).

Delta-zone sinks live in :mod:`delta_lake_spark.tables` (managed tables);
this module covers the export edge: tuned parquet, single-file CSV (the
reference's coalesce(1)+rename dance, deltalake.ipynb:4429-4431 /
:8531-8548), and a JDBC sink replacing the reference's psycopg2-COPY
serving path (silver.py:14-73).
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    block_size: int = 128 * 1024 * 1024,
    max_records_per_file: int | None = None,
) -> None:
    """K1 with the reference's file-size controls (parquet.block.size
    128MB, deltalake.ipynb:181; maxRecordsPerFile, :2952)."""
    writer = df.write.mode(mode).option("parquet.block.size", str(block_size))
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True, **options: str
) -> None:
    """K6 multi-file CSV export (one file per partition — the scalable
    default; deltalake.ipynb:312-329)."""
    writer = df.write.mode(mode).option("header", str(header).lower())
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.csv(path)


def write_single_csv(df: DataFrame, dest_file: str, header: bool = True) -> None:
    """K6 single-file variant (coalesce(1) + part-file rename,
    deltalake.ipynb:4429-4431).

    Driver-side rename of ONE executor-written file; everything funnels
    through one task, so this is for serving extracts, not bulk data —
    use :func:`write_csv` for anything large.
    """
    tmp = tempfile.mkdtemp(prefix="single_csv_", dir=os.path.dirname(dest_file) or ".")
    try:
        df.coalesce(1).write.mode("overwrite").option(
            "header", str(header).lower()
        ).csv(tmp)
        parts = glob.glob(os.path.join(tmp, "part-*.csv"))
        if len(parts) != 1:
            raise RuntimeError(f"expected one part file, found {parts}")
        shutil.move(parts[0], dest_file)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 100_000,
    **properties: str,
) -> None:
    """K7: JDBC serving sink (replaces the reference's psycopg2 COPY loader,
    silver.py:14-73; same 100K batching).  Executors write partitions in
    parallel — unlike the reference's single-process COPY.

    Requires the JDBC driver jar on the Spark classpath.  Exercised at
    runtime against embedded Apache Derby (on Spark's own classpath as the
    Hive-metastore dependency) in tests/test_io.py; for PostgreSQL serving
    pass the postgres driver jar + url, or use io.serving's COPY bundle.
    """
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.save()


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink (beyond-reference; Spark built-in) — for downstream systems
    standardized on ORC (Hive/Trino warehouses)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
