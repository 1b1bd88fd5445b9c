"""Serving-edge export: Postgres DDL + COPY-ready extracts (SURVEY.md K7).

The reference serves its Silver/Gold tables by hand-written Postgres DDL
plus psycopg2 ``COPY FROM`` of CSV buffers (silver.py:23-33,51-68,90-98,
129-137; load_currency.py:24-44).  The engine derives the DDL from the
DataFrame schema instead (one source of truth — the hand-written DDL in the
reference already drifted from the lake types, e.g. string FX rates vs
DECIMAL(15,6), SURVEY.md §1.2), and writes the extract + a ``COPY`` script
so any Postgres can load it without Spark or a JDBC driver present.

``write_jdbc`` (writers.py) is the direct executor-parallel path when a
driver jar is available; this module is the offline/bulk path and the one
that is fully testable in this environment.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from delta_lake_spark.io.writers import write_csv, write_single_csv

# Spark -> Postgres type mapping (the reference's own choices where it has
# one: BIGINT/TEXT/TIMESTAMP/DATE/BOOLEAN silver.py:23-33, DECIMAL(p,s)
# load_currency.py:24-32).
_PG_TYPES: dict[type, str] = {
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.ShortType: "SMALLINT",
    T.ByteType: "SMALLINT",
    T.DoubleType: "DOUBLE PRECISION",
    T.FloatType: "REAL",
    T.StringType: "TEXT",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.TimestampNTZType: "TIMESTAMP",
    T.BinaryType: "BYTEA",
}


def pg_type(dt: T.DataType) -> str:
    """Postgres column type for a Spark type; raises on non-relational
    types (arrays/maps/structs have no serving-table shape — flatten or
    JSON-encode them upstream, deliberately not silently here)."""
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    try:
        return _PG_TYPES[type(dt)]
    except KeyError:
        raise TypeError(
            f"no Postgres serving type for Spark type {dt.simpleString()}; "
            "flatten or to_json the column before export"
        ) from None


def postgres_ddl(
    df: DataFrame,
    table: str,
    primary_key: str | list[str] | None = None,
    if_not_exists: bool = True,
) -> str:
    """CREATE TABLE statement derived from the DataFrame schema.

    Nullability comes from the schema; ``primary_key`` mirrors the
    reference's ``date DATE PRIMARY KEY`` (load_currency.py:25)."""
    pk = [primary_key] if isinstance(primary_key, str) else (primary_key or [])
    cols = []
    for f in df.schema.fields:
        null = "" if f.nullable or f.name in pk else " NOT NULL"
        cols.append(f"    {f.name} {pg_type(f.dataType)}{null}")
    if pk:
        cols.append(f"    PRIMARY KEY ({', '.join(pk)})")
    ine = "IF NOT EXISTS " if if_not_exists else ""
    body = ",\n".join(cols)
    return f"CREATE TABLE {ine}{table} (\n{body}\n);"


def export_for_copy(
    df: DataFrame,
    out_dir: str,
    table: str,
    primary_key: str | list[str] | None = None,
    single_file: bool = False,
) -> dict[str, str]:
    """Write a COPY-loadable bundle: ``<table>.sql`` (DDL + COPY commands)
    and CSV data files.

    ``single_file=False`` (default) keeps one CSV per partition — the COPY
    script loads them all, preserving executor-parallel export for big
    tables; ``single_file=True`` is the reference's coalesce(1) serving
    extract.  Empty strings stay distinguishable from NULL via COPY's
    ``FORCE_NULL``-free default ('' = empty string, absent = NULL).
    """
    os.makedirs(out_dir, exist_ok=True)
    ddl = postgres_ddl(df, table, primary_key=primary_key)
    if single_file:
        data = os.path.join(out_dir, f"{table}.csv")
        write_single_csv(df, data)
        copy_lines = [
            f"\\copy {table} FROM '{data}' WITH (FORMAT csv, HEADER true);"
        ]
    else:
        data = os.path.join(out_dir, f"{table}_csv")
        write_csv(df, data)
        copy_lines = [
            f"\\copy {table} FROM '{data}/{part}' WITH (FORMAT csv, HEADER true);"
            for part in sorted(os.listdir(data))
            if part.startswith("part-") and part.endswith(".csv")
        ]
    script = os.path.join(out_dir, f"{table}.sql")
    with open(script, "w") as fh:
        fh.write(ddl + "\n\n" + "\n".join(copy_lines) + "\n")
    return {"ddl": ddl, "script": script, "data": data}
