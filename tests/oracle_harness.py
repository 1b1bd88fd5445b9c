"""Local replica of the driver's t2 correctness gate: run each registered
Spark query and its DuckDB oracle on the same parquet tables, sort columns by
name, sort rows, and compare values exactly.

Anything that passes here exactly should hash-match in the driver's
CORRECTNESS_r{N}.json check.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from dataclasses import dataclass

import duckdb
import numpy as np
import pandas as pd

from delta_lake_spark.catalog import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    rows_spark: int
    rows_duck: int
    detail: str = ""


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if not isinstance(v, (list, tuple, np.ndarray)) and pd.isna(v):
        return None
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, (float, np.floating)):
        return ("f", float(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, _dt.datetime):
        return ("d", v.date().isoformat()) if v.time() == _dt.time() else ("ts", v.isoformat())
    if isinstance(v, _dt.date):
        return ("d", v.isoformat())
    return ("s", str(v))


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare_one(spark, con, name: str, fn, sql: str, sf_dir: str) -> ParityResult:
    sdf = fn(spark, sf_dir).toPandas()
    ddf = con.execute(sql).fetchdf()
    if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, ddf.columns)):
        return ParityResult(
            name, False, len(sdf), len(ddf),
            f"column mismatch: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}",
        )
    ddf.columns = [c for c in ddf.columns]
    a, b = _normalize(sdf), _normalize(ddf)
    if len(a) != len(b):
        return ParityResult(name, False, len(a), len(b), "row count mismatch")
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return ParityResult(
                name, False, len(a), len(b), f"first diff at sorted row {i}: spark={ra} duck={rb}"
            )
    return ParityResult(name, True, len(a), len(b))


def run_all(spark, sf_dir: str, only: list[str] | None = None) -> list[ParityResult]:
    from delta_lake_spark.queries import ORACLE, QUERIES

    con = duck_connection(sf_dir)
    results = []
    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        if name not in ORACLE:
            continue
        try:
            results.append(compare_one(spark, con, name, fn, ORACLE[name], sf_dir))
        except Exception as e:  # noqa: BLE001
            results.append(ParityResult(name, False, -1, -1, f"EXC: {e}"))
    return results
