"""Versioned, parquet-backed managed tables (the engine's lakehouse format).

The reference stores every zone table as Delta Lake (parquet + transaction
log) and leans on five Delta capabilities: overwrite/append sinks
(deltalake.ipynb:526-550, :1539), partitioned writes (:959, :1319, :1326),
``MERGE`` upsert (:1786-1791, :2942-2945, :3212-3218), ``OPTIMIZE``
compaction / Z-ordering (:1336-1338, :4614-4620), and table metadata
(``DESCRIBE DETAIL`` / ``history`` — :8607-8613, :8760).  delta-spark is not
available in this environment, so this module re-implements that capability
surface natively on Spark primitives:

- **Commit log**: ``<root>/_log/<version>.json``, one JSON file per commit
  holding the commit's *delta* — ``add`` (new file records) and ``remove``
  (paths dropped from the snapshot) — exactly Delta's add/remove action
  model, so commit cost is O(changed files), not O(table files).  Every
  ``_CHECKPOINT_INTERVAL`` commits a ``<version>.checkpoint.json`` with the
  complete consolidated file list is also written (Delta's parquet
  checkpoint, in compacted JSON); reading any version loads the nearest
  checkpoint at-or-below it plus the delta tail — O(tail + snapshot), never
  O(all history).  Version 0 needs no checkpoint (its delta IS the full
  list); legacy entries carrying a full ``files`` list read as
  self-contained snapshots.
- **Data files**: each commit writes into its own ``<root>/c<version>/``
  directory via the normal Spark parquet writer (so partitioned layouts,
  snappy, column stats all come for free); the log records every file with
  its parsed partition values.
- **Atomicity**: the log file is written to a temp name and hard-linked
  (``os.link``) into place — link is an atomic put-if-absent on POSIX
  (fails ``EEXIST``), so readers see either the old or the new version,
  never a torn one, and two writers racing the same version cannot both
  succeed.  On losing the race, blind appends/overwrites re-prepare
  against the winner's snapshot and retry (optimistic concurrency, Delta's
  WriteSerializable level — appends never conflict, overwrites are
  last-writer-wins); read-modify-write operations (merge/DML/optimize)
  raise ``ConcurrentWriteError`` because their read snapshot may be
  logically invalidated — the caller re-runs the operation, exactly
  Delta's conflict behavior for non-disjoint transactions.

Scale notes (100 TB / 1000 executors):

- All metadata handling is driver-side and O(number of files), never
  O(rows).  Reads/writes are ordinary distributed parquet scans/writes.
- ``merge`` prunes at *partition* granularity: only partitions present in
  the source are rewritten; untouched files carry over into the new snapshot
  by reference.  (Delta additionally prunes at file granularity using
  per-file min/max stats — the same hook would fit here by filtering the
  log's file list against source key bounds.)
- ``merge_in_batches`` reproduces the reference's modulo-bucketed merge
  (deltalake.ipynb:2937-2946) that fixed its 11M-row OOM (:2217): the source
  is split by ``pmod(hash(key), n)`` and merged in ``n`` sequential commits,
  bounding the shuffle/join working set of any single commit.
- **Deletion vectors** (merge-on-read DML): ``delete_where`` /
  ``update_where`` with ``mode="merge_on_read"`` never rewrite data files —
  they commit a sidecar parquet of ``(file, row_index)`` pairs and attach it
  to the affected file records; every read anti-joins the (tiny) DV side
  back out.  A selective DELETE on a 100 TB table then costs one scan plus a
  KB-scale write instead of rewriting every touched 128 MB file; OPTIMIZE /
  ``purge_deletes`` later materializes the deletes off the read path.  This
  is Delta's deletion-vector design with the roaring bitmap swapped for a
  parquet position list (same asymptotics, Spark-native join instead of a
  native bitmap kernel).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

_LOG_DIR = "_log"

# Write a full-snapshot checkpoint every N commits; reads replay at most
# N-1 delta entries past a checkpoint.  Delta's default is 10 too.
_CHECKPOINT_INTERVAL = 10

# JSON-safe stat types we collect and prune on (Delta's data-skipping set,
# minus timestamps which need tz care)
_STATS_TYPES = (int, float, str, bool)


def _footer_meta(path: str) -> "tuple[dict[str, list[Any]], int | None]":
    """(column [min,max] stats, row count) from one parquet footer — a
    single metadata-only read on the driver at commit time (the same stats
    + numRecords Delta records in its add actions).  Dates are stored as
    ISO strings; unsupported types are skipped."""
    import datetime

    import pyarrow.parquet as pq

    try:
        meta = pq.ParquetFile(path).metadata
    except Exception:
        return {}, None
    agg: dict[str, list[Any]] = {}
    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            name = col.path_in_schema
            if "." in name:  # nested — skip
                continue
            try:
                lo, hi = st.min, st.max
            except Exception:  # pyarrow can't cast some types (e.g. decimal)
                continue
            if isinstance(lo, (datetime.date, datetime.datetime)):
                lo, hi = lo.isoformat(), hi.isoformat()
            elif isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                except UnicodeDecodeError:
                    continue
            if not isinstance(lo, _STATS_TYPES):
                continue
            if name in agg:
                agg[name] = [min(agg[name][0], lo), max(agg[name][1], hi)]
            else:
                agg[name] = [lo, hi]
    return agg, meta.num_rows


def _footer_stats(path: str) -> dict[str, list[Any]]:
    return _footer_meta(path)[0]


def _file_may_match(
    f: dict[str, Any], filters: list[tuple[str, str, Any]]
) -> bool:
    """Conservative stats check: False only when the file PROVABLY contains
    no matching row.  Unknown columns/types keep the file."""
    import datetime

    def _norm(v):
        return v.isoformat() if isinstance(v, (datetime.date, datetime.datetime)) else v

    def _comparable(lo, v):
        return type(lo) is type(v) or (
            isinstance(lo, (int, float)) and isinstance(v, (int, float))
        )

    for col, op, val in filters:
        stats = f.get("stats") or {}
        if col not in stats:
            continue
        lo, hi = stats[col]
        if op == "in":
            # skip only when EVERY element provably misses [lo, hi]; any
            # un-comparable (or null) element conservatively keeps the file
            elems = [_norm(v) for v in val]
            if elems and all(
                v is not None and _comparable(lo, v) and not (lo <= v <= hi)
                for v in elems
            ):
                return False
            continue
        val = _norm(val)
        if not _comparable(lo, val):
            continue
        if (
            (op == "=" and not (lo <= val <= hi))
            or (op in ("<", "<=") and lo > val)
            or (op in (">", ">=") and hi < val)
        ):
            return False
    # Bloom probe for point lookups (add_bloom_filters): "absent" is a
    # proof, "present" only a maybe — exactly the stats contract
    for col, op, val in filters:
        blooms = f.get("bloom") or {}
        if col not in blooms:
            continue
        if op == "=" and val is not None:
            if not _bloom_probe(val, blooms[col]):
                return False
        elif op == "in":
            elems = list(val)
            if elems and all(
                v is not None and not _bloom_probe(v, blooms[col]) for v in elems
            ):
                return False
    return True


_Z_BITS = 16


def _z_numeric(col: str, dtype: Any) -> Column:
    """Numeric view of a z-orderable column (dates -> days since epoch,
    timestamps -> seconds since epoch, booleans -> 0/1, strings -> the
    first 6 utf-8 bytes as a big-endian integer (zero-padded, so the
    projection is monotone in lexicographic order and exact in a double's
    53-bit mantissa), numerics -> double)."""
    from pyspark.sql.types import (
        BooleanType,
        DateType,
        StringType,
        TimestampType,
    )

    c = F.col(col)
    if isinstance(dtype, DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, TimestampType):
        return F.unix_timestamp(c).cast("double")
    if isinstance(dtype, BooleanType):
        return c.cast("int").cast("double")
    if isinstance(dtype, StringType):
        return _z_string(col, 0)
    return c.cast("double")


def _z_string(col: str, skip_bytes: int) -> Column:
    """Order-preserving numeric projection of a string: utf-8 bytes
    ``skip_bytes+1 .. skip_bytes+6`` as a big-endian integer (zero-padded —
    monotone in lexicographic order, exact in a double's 53-bit mantissa).
    ``skip_bytes`` strips the column's GLOBAL common prefix (min/max-
    derived), so keys like ``user-0042`` cluster on their distinguishing
    tail instead of collapsing onto the shared literal."""
    prefix = F.rpad(
        F.substring(F.col(col).cast("binary"), skip_bytes + 1, 6),
        6,
        F.lit(b"\x00"),
    )
    return F.conv(F.hex(prefix), 16, 10).cast("double")


def _zvalue_expr(col_bounds: dict[str, tuple[Column, Any, Any]]) -> Column:
    """Z-curve key: each column's numeric view linearly scaled to a fixed
    number of bits over its [lo, hi], bits interleaved (column j contributes
    bit i to position i*ncols + j).  Pure column arithmetic — runs in
    whole-stage codegen.

    Per-column bits are capped so the highest interleaved bit stays below
    position 62: with 16 bits and 4+ columns a bit would land on the long's
    sign bit (making z-values negative and mis-ordered) or wrap mod 64 and
    alias between columns.
    """
    ncols = len(col_bounds)
    bits = min(_Z_BITS, 62 // ncols)
    z = F.lit(0).cast("long")
    for j, (_col, (num, lo, hi)) in enumerate(col_bounds.items()):
        span = (F.lit(hi).cast("double") - F.lit(lo).cast("double"))
        scaled = F.when(span <= 0, F.lit(0)).otherwise(
            F.floor(
                (num - F.lit(lo).cast("double")) / span * ((1 << bits) - 1)
            )
        ).cast("long")
        for i in range(bits):
            bit = F.shiftright(scaled, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * ncols + j)
    return z


# Ceiling on distinct partition values a single merge may touch: the pruning
# collect is metadata-sized for sane layouts (dates, countries, years); past
# this the layout itself is the bug (VERDICT r3 "what's wrong" #2).
_PARTITION_DISCOVERY_CAP = 10_000

# Deletion-vector position lists: table-relative data-file path + the
# parquet row index (``_metadata.row_index``) of each logically deleted row.
_DV_FILE = "__dv_file"
_DV_POS = "__dv_pos"
_DV_SCHEMA = f"{_DV_FILE} string, {_DV_POS} bigint"
# Anti-join build side is broadcast while the DV sidecars stay metadata-sized;
# past this they flow through a regular (AQE-planned) join.
_DV_BROADCAST_BYTES = 64 * 1024 * 1024

# Materialized Change-Data-Feed (Delta ``delta.enableChangeDataFeed``
# analog): when the table property is on, partial-rewrite commits (DML
# delete/update, MERGE) additionally write their EXACT changed rows —
# tagged insert / delete / update_preimage / update_postimage — as
# ``-cdc-`` sidecar parquet files recorded in the commit entry.  Appends
# and overwrites need no sidecars (their change rows are implied by the
# add/remove file actions, exactly as in Delta), so the storage overhead
# is O(changed rows of partial rewrites) only.
_CDC_COL = "_change_type"
_CDC_VER = "_commit_version"

# Row tracking (Delta ``delta.enableRowTracking`` analog): every physical
# row owns a STABLE id that survives compaction, clustering, and DML
# rewrites.  Fresh rows get ``base_row_id + row_index`` from their file's
# commit-assigned base (no storage cost); a rewrite that moves rows into
# new files MATERIALIZES the ids as a physical ``_row_id`` column in the
# rewritten parquet (null entries = genuinely new rows, which draw fresh
# ids from the new file's base) — exactly Delta's fresh/materialized
# two-tier design.
_ROW_ID = "_row_id"


def _rec_dvs(rec: dict[str, Any]) -> list[str]:
    return list(rec.get("dvs") or ())


# Per-file Bloom filters (point-lookup data skipping).  min/max stats prune
# range predicates but are useless for `=` on high-cardinality unclustered
# columns (an id's range spans every file); a small per-file Bloom answers
# "provably absent" for those.  Hash: position_s(v) = int(md5("{v}:{s}")
# hex[:15], 16) % bits — md5 because Spark (JVM) and the driver-side Python
# probe compute it bit-identically over the same string rendering.
_BLOOM_WORD_MASK = (1 << 64) - 1


def _bloom_probe(val: Any, meta: dict[str, Any]) -> bool:
    """True if ``val`` MAY be present per the stored filter (driver-side
    replica of the JVM hash used when the filter was built)."""
    import hashlib

    bits, hashes, words = meta["bits"], meta["hashes"], meta["words"]
    for s in range(hashes):
        h = (
            int(
                hashlib.md5(f"{val}:{s}".encode()).hexdigest()[:15], 16
            )
            % bits
        )
        if not (int(words.get(str(h // 64), 0)) >> (h % 64)) & 1:
            return False
    return True


def _bloom_position_expr(col: str, seed: int, bits: int) -> Column:
    """The JVM twin of ``_bloom_probe``'s hash, as a Column."""
    rendered = F.concat_ws(
        ":", F.col(col).cast("string"), F.lit(str(seed))
    )
    return F.pmod(
        F.conv(F.substring(F.md5(rendered), 1, 15), 16, 10).cast("bigint"),
        F.lit(bits),
    )


def _hive_value_str(val: Any) -> str | None:
    """Render a Python value the way a Hive-style partition directory names
    it *after* unescaping: ``None``/empty string -> None (the default
    partition), booleans lowercase, dates/timestamps in Spark's dir format,
    everything else ``str``.  Paired with :func:`_dir_value_str` so both
    sides of a partition-value comparison are in the same form."""
    import datetime

    if val is None:
        return None
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, datetime.datetime):
        return val.isoformat(sep=" ")
    if isinstance(val, datetime.date):
        return val.isoformat()
    s = str(val)
    return s if s != "" else None


def _dir_value_str(raw: str) -> str | None:
    """Decode a raw Hive dir-name partition value: percent-unescape and map
    ``__HIVE_DEFAULT_PARTITION__`` (null or empty string) to None."""
    from urllib.parse import unquote

    if raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    return unquote(raw)


class _Unparsed:
    """Sentinel: a partition dir value that could not be parsed to the
    column's type — comparisons against it must keep the file."""


_UNPARSED = _Unparsed()


def _typed_dir_value(raw: str, simple_type: str):
    """Decode a Hive dir-name partition value to a comparable Python value
    of the column's type (for RANGE pruning; equality uses the normalized
    string path).  None = the null partition; _UNPARSED = keep the file."""
    import datetime

    s = _dir_value_str(raw)
    if s is None:
        return None
    t = (simple_type or "").lower()
    try:
        if t in ("tinyint", "smallint", "int", "bigint"):
            return int(s)
        if t in ("float", "double"):
            return float(s)
        if t == "date":
            return datetime.date.fromisoformat(s)
        if t in ("timestamp", "timestamp_ntz"):
            return datetime.datetime.fromisoformat(s)
        if t == "string":
            return s
    except ValueError:
        return _UNPARSED
    return _UNPARSED  # booleans/decimals/other: no range pruning


# Deriving a predicate through a monotone non-decreasing transform f:
# x op V implies f(x) op' f(V) with strict bounds relaxed (x < V only
# implies f(x) <= f(V) — e.g. two timestamps in the same day).
_MONOTONE_DERIVED_OP = {"=": "=", "<": "<=", "<=": "<=", ">": ">=", ">=": ">="}

_GEN_DATE_RE = re.compile(
    r"^\s*(?:to_date\s*\(\s*(\w+)\s*\)|cast\s*\(\s*(\w+)\s+as\s+date\s*\))\s*$",
    re.I,
)
_GEN_YEAR_RE = re.compile(r"^\s*year\s*\(\s*(\w+)\s*\)\s*$", re.I)
_GEN_TRUNC_RE = re.compile(
    r"^\s*date_trunc\s*\(\s*'(year|month|week|day|hour)'\s*,\s*(\w+)\s*\)\s*$",
    re.I,
)


def _parse_generated_form(expr: str):
    """Recognize the monotone time-derivation forms of a generated-column
    expression -> (kind, source_col, unit) or None."""
    m = _GEN_DATE_RE.match(expr)
    if m:
        return ("date", m.group(1) or m.group(2), None)
    m = _GEN_YEAR_RE.match(expr)
    if m:
        return ("year", m.group(1), None)
    m = _GEN_TRUNC_RE.match(expr)
    if m:
        return ("trunc", m.group(2), m.group(1).lower())
    return None


def _apply_time_derivation(kind: str, unit, val):
    """f(V) for the recognized generated forms, computed driver-side with
    exactly Spark's semantics on date/timestamp inputs.  None = underivable
    (unsupported literal type)."""
    import datetime

    if isinstance(val, str):
        try:
            val = datetime.datetime.fromisoformat(val)
        except ValueError:
            return None
    if isinstance(val, datetime.datetime):
        d, dt_ = val.date(), val
    elif isinstance(val, datetime.date):
        d, dt_ = val, datetime.datetime(val.year, val.month, val.day)
    else:
        return None
    if kind == "date":
        return d
    if kind == "year":
        return d.year
    if kind == "trunc":
        if unit == "year":
            return datetime.datetime(d.year, 1, 1)
        if unit == "month":
            return datetime.datetime(d.year, d.month, 1)
        if unit == "week":
            monday = d - datetime.timedelta(days=d.weekday())
            return datetime.datetime(monday.year, monday.month, monday.day)
        if unit == "day":
            return datetime.datetime(d.year, d.month, d.day)
        if unit == "hour":
            return dt_.replace(minute=0, second=0, microsecond=0)
    return None


def _derive_generated_filters(
    entry: dict[str, Any], filters: list[tuple[str, str, Any]]
) -> list[tuple[str, str, Any]]:
    """Delta-style generated-column filter derivation: a predicate on the
    SOURCE column of a recognized generated expression implies a (relaxed)
    predicate on the generated column — which then prunes partitions and
    file stats even though the caller never mentioned it.  The canonical
    payoff: ``scan([("ts", ">=", X)])`` on a table partitioned by generated
    ``event_date = to_date(ts)`` skips whole date partitions."""
    gen = entry.get("generated") or {}
    if not gen:
        return []
    derived: list[tuple[str, str, Any]] = []
    for gcol, expr in gen.items():
        form = _parse_generated_form(expr)
        if form is None:
            continue
        kind, src, unit = form
        for col, op, val in filters:
            if col != src or op not in _MONOTONE_DERIVED_OP or val is None:
                continue
            dv = _apply_time_derivation(kind, unit, val)
            if dv is not None:
                derived.append((gcol, _MONOTONE_DERIVED_OP[op], dv))
    return derived


def _filters_expr(filters: list[tuple[str, str, Any]]) -> "Column":
    """AND of simple (col, op, literal) predicates as a Column."""
    out = F.lit(True)
    for col, op, val in filters:
        c = F.col(col)
        if op == "in":
            out = out & c.isin(list(val))
            continue
        out = out & {
            "=": c == val, "<": c < val, "<=": c <= val, ">": c > val, ">=": c >= val
        }[op]
    return out


def _widened_type(a: Any, b: Any) -> "Any | None":
    """The common LOSSLESSLY-wider type of ``a``/``b`` under the Delta
    type-widening lattice (byte→short→int→long, float→double,
    byte/short/int→double, decimal precision growth at equal scale), or
    None if the pair isn't widenable.  Widening is metadata-only here:
    Spark's parquet reader upcasts narrow file types to the requested
    wider schema natively (probed on 4.1), so old files never rewrite."""
    from pyspark.sql.types import (
        ByteType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
    )

    if a == b:
        return a
    order = {ByteType: 0, ShortType: 1, IntegerType: 2, LongType: 3}
    ra, rb = order.get(type(a)), order.get(type(b))
    if ra is not None and rb is not None:
        return a if ra >= rb else b
    floats = {FloatType, DoubleType}
    if type(a) in floats and type(b) in floats:
        return DoubleType()
    # integral (except long: lossy) -> double
    for x, y in ((a, b), (b, a)):
        if isinstance(x, DoubleType) and type(y) in (
            ByteType,
            ShortType,
            IntegerType,
        ):
            return DoubleType()
    if isinstance(a, DecimalType) and isinstance(b, DecimalType) and a.scale == b.scale:
        return a if a.precision >= b.precision else b
    return None


def _merge_schemas(existing: "StructType", incoming: "StructType") -> "StructType":
    """Delta mergeSchema semantics: union of columns by name (existing
    order first, new columns appended as nullable); same-name columns
    resolve to the common type under the lossless widening lattice
    (``_widened_type``) — any other type conflict is rejected."""
    by_name = {f.name: f for f in incoming.fields}
    widened: dict[str, Any] = {}
    for f in existing.fields:
        inc = by_name.get(f.name)
        if inc is not None and inc.dataType != f.dataType:
            wide = _widened_type(f.dataType, inc.dataType)
            if wide is None:
                raise ValueError(
                    f"column {f.name!r} type conflict: table has "
                    f"{f.dataType.simpleString()}, data has "
                    f"{inc.dataType.simpleString()} (not a lossless widening)"
                )
            widened[f.name] = wide
    merged = [
        StructField(f.name, widened.get(f.name, f.dataType), f.nullable)
        for f in existing.fields
    ]
    seen = {f.name for f in existing.fields}
    merged += [f for f in incoming.fields if f.name not in seen]
    return StructType(merged)


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first."""


class VacuumedVersionError(FileNotFoundError):
    """Time travel to a version whose data files were vacuumed away."""


class ManagedTable:
    """Handle to one versioned table rooted at ``path``.

    Mirrors the ``DeltaTable`` API surface the reference uses
    (``forPath`` / ``merge`` / ``optimize`` / ``history`` / ``detail`` /
    ``isDeltaTable`` — SURVEY.md §2.11 M1-M5, §2.3 J7-J8).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        # Reconstructed snapshots keyed by version.  A committed version's
        # content is immutable, so cached entries never go stale; the cache
        # is bounded to keep driver memory O(few snapshots).
        self._snap_cache: dict[int, dict[str, Any]] = {}

    # ------------------------------------------------------------------ #
    # existence / construction
    # ------------------------------------------------------------------ #

    @staticmethod
    def is_managed_table(path: str) -> bool:
        """Existence probe gating merge-vs-create, the reference's
        ``DeltaTable.isDeltaTable`` pattern (deltalake.ipynb:1786, :2933)."""
        log = os.path.join(os.path.abspath(path), _LOG_DIR)
        return os.path.isdir(log) and any(
            f.endswith(".json") for f in os.listdir(log)
        )

    @classmethod
    def for_path(cls, spark: SparkSession, path: str) -> "ManagedTable":
        if not cls.is_managed_table(path):
            raise FileNotFoundError(f"not a managed table: {path}")
        return cls(spark, path)

    @classmethod
    def convert_from_parquet(
        cls,
        spark: SparkSession,
        path: str,
        partition_schema: "dict[str, str] | None" = None,
    ) -> "ManagedTable":
        """``CONVERT TO DELTA`` analog: register an existing plain-parquet
        directory (flat or Hive-partitioned) as a managed table IN PLACE —
        no data rewrite, just a v0 commit whose file records point at the
        existing files (with footer stats collected for data skipping).
        Partition columns and the schema are inferred exactly as a parquet
        read would; subsequent appends/DML/OPTIMIZE write normal commit
        dirs alongside, and vacuum reclaims converted files once rewrites
        retire them — the standard migration path from a raw parquet lake.

        ``partition_schema`` (``{col: ddl_type}``) pins partition-column
        types — Hive directory values are ambiguous (``p=1`` could be int
        or string), which is why Delta's CONVERT takes an explicit
        PARTITIONED BY clause; unlisted columns keep Spark's inference.
        """
        if cls.is_managed_table(path):
            raise ValueError(f"already a managed table: {path}")
        found: list[tuple[str, dict[str, str]]] = []
        for dirpath, _dirs, names in os.walk(path):
            if _LOG_DIR in dirpath:
                continue
            partition: dict[str, str] = {}
            for seg in os.path.relpath(dirpath, path).split(os.sep):
                if "=" in seg:
                    k, _, v = seg.partition("=")
                    partition[k] = v
            for name in names:
                if name.endswith(".parquet"):
                    found.append((os.path.join(dirpath, name), partition))
        if not found:
            raise FileNotFoundError(f"no parquet files under {path}")
        key_sets = {tuple(sorted(p)) for _f, p in found}
        if len(key_sets) != 1:
            raise ValueError(
                f"inconsistent Hive partition layouts under {path}: "
                f"{sorted(key_sets)}"
            )
        partition_by = list(key_sets.pop())
        # schema exactly as a parquet scan infers it (typed partition cols)
        schema = spark.read.option("basePath", path).parquet(path).schema
        if partition_schema:
            unknown = set(partition_schema) - set(partition_by)
            if unknown:
                raise ValueError(
                    f"partition_schema names non-partition columns: "
                    f"{sorted(unknown)} (partitions: {partition_by})"
                )
            from pyspark.sql.types import _parse_datatype_string

            schema = StructType(
                [
                    StructField(
                        f.name,
                        _parse_datatype_string(partition_schema[f.name])
                        if f.name in partition_schema
                        else f.dataType,
                        f.nullable,
                    )
                    for f in schema.fields
                ]
            )
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, len(found))) as pool:
            metas = list(pool.map(lambda fp: _footer_meta(fp[0]), found))
        files = [
            {
                "path": os.path.relpath(full, path),
                "size": os.path.getsize(full),
                "partition": partition,
                "stats": st,
                **({"rows": n} if n is not None else {}),
            }
            for (full, partition), (st, n) in zip(found, metas)
        ]
        mt = cls(spark, path)
        mt._commit(
            {
                "operation": "convert",
                "files": files,
                "partition_by": partition_by,
                "schema": json.loads(schema.json()),
                "num_files": len(files),
                "added_files": len(files),
            }
        )
        return mt

    # ------------------------------------------------------------------ #
    # log handling
    # ------------------------------------------------------------------ #

    def _log_path(self, version: int) -> str:
        return os.path.join(self.path, _LOG_DIR, f"{version:08d}.json")

    def _versions(self) -> list[int]:
        log = os.path.join(self.path, _LOG_DIR)
        if not os.path.isdir(log):
            return []
        return sorted(
            int(f[:-5])
            for f in os.listdir(log)
            if f.endswith(".json") and not f.endswith(".checkpoint.json")
        )

    def _checkpoint_versions(self) -> list[int]:
        log = os.path.join(self.path, _LOG_DIR)
        if not os.path.isdir(log):
            return []
        return sorted(
            int(f[: -len(".checkpoint.json")])
            for f in os.listdir(log)
            if f.endswith(".checkpoint.json")
        )

    def last_txn_batch(self, app: str) -> int | None:
        """Newest committed batch id for ``app`` (Delta ``txn`` action
        analog) — the idempotent-writes marker shared by the streaming sink
        and batch ``txn_app``/``txn_batch`` writes.  Metadata-only;
        O(commits since that marker)."""
        for v in sorted(self._versions(), reverse=True):
            txn = self._raw_entry(v).get("txn")
            if txn and txn.get("app") == app:
                return int(txn.get("batch"))
        return None

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _raw_entry(self, version: int) -> dict[str, Any]:
        """The log entry exactly as committed — a delta (``add``/``remove``)
        in the current format, or a full snapshot for legacy/checkpoint
        entries.  Metadata-only consumers (``history``) use this to stay
        O(1) per version."""
        try:
            with open(self._log_path(version)) as f:
                return json.load(f)
        except FileNotFoundError:
            vs = self._versions()
            if vs and version < vs[0]:
                raise VacuumedVersionError(
                    f"version {version} of {self.path} was removed by "
                    f"cleanup_log; earliest retained version is {vs[0]}"
                ) from None
            raise

    def _entry(self, version: "int | str | None" = None) -> dict[str, Any]:
        """The full snapshot at ``version``: the commit's metadata plus the
        materialized ``files`` list, reconstructed from the nearest
        checkpoint at-or-below plus the delta tail (O(tail), never O(all
        history)).  A string resolves as a tag name (see :meth:`tag`), so
        every version-taking surface (read/scan/schema/restore/clone/...)
        accepts tags uniformly."""
        if isinstance(version, str):
            version = self._resolve_version(version)
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(f"not a managed table: {self.path}")
        cached = self._snap_cache.get(version)
        if cached is not None:
            return cached
        raw = self._raw_entry(version)
        if "files" in raw:  # legacy self-contained entry
            snap = raw
        else:
            ckpts = [c for c in self._checkpoint_versions() if c <= version]
            files: dict[str, dict[str, Any]] = {}
            start = -1
            if ckpts:
                start = ckpts[-1]
                cp_path = os.path.join(
                    self.path, _LOG_DIR, f"{start:08d}.checkpoint.json"
                )
                with open(cp_path) as f:
                    files = {rec["path"]: rec for rec in json.load(f)["files"]}
            for v in range(start + 1, version + 1):
                d = raw if v == version else self._raw_entry(v)
                if "files" in d:  # legacy entry doubles as a checkpoint
                    files = {rec["path"]: rec for rec in d["files"]}
                    continue
                for p in d.get("remove", ()):
                    files.pop(p, None)
                for rec in d.get("add", ()):
                    files[rec["path"]] = rec
            snap = dict(raw)
            snap["files"] = list(files.values())
        self._snap_cache[version] = snap
        while len(self._snap_cache) > 4:
            self._snap_cache.pop(next(iter(self._snap_cache)))
        return snap

    def _commit(self, entry: dict[str, Any]) -> int:
        """Commit ``entry`` (carrying the complete post-commit ``files``
        list) as the next version.  The log entry stores only the diff vs
        the previous snapshot; a full checkpoint lands every
        ``_CHECKPOINT_INTERVAL`` commits."""
        os.makedirs(os.path.join(self.path, _LOG_DIR), exist_ok=True)
        latest = self.latest_version()
        version = 0 if latest is None else latest + 1
        new_files: list[dict[str, Any]] = entry.pop("files")
        prev: dict[str, dict[str, Any]] = (
            {}
            if latest is None
            else {f["path"]: f for f in self._entry(latest)["files"]}
        )
        # CHECK constraints / generated-column exprs / identity high-water
        # are table-level metadata: carry them across commits unless the
        # committing operation sets them explicitly
        for meta_key in (
            "constraints",
            "generated",
            "identity",
            "defaults",
            "column_mapping",
            "cdf",
            "row_tracking",
            "row_id_hwm",
            "auto_compact",
            "optimize_write",
            "stats",
            "clustering_by",
            "user_props",
        ):
            if meta_key not in entry and latest is not None:
                carried = self._entry(latest).get(meta_key)
                if carried:
                    entry[meta_key] = carried
        new_paths = {f["path"] for f in new_files}
        entry["add"] = [f for f in new_files if prev.get(f["path"]) != f]
        entry["remove"] = sorted(p for p in prev if p not in new_paths)
        rt_assigned: list[dict[str, Any]] = []
        if entry.get("row_tracking"):
            # assign each NEW file its fresh-row-id base from the table's
            # monotone high-water mark (one footer num_rows metadata read
            # per added file; a re-recorded file — e.g. gaining a DV —
            # keeps the base it already owns).  Assignments roll back on a
            # lost commit race: the retry re-carries the WINNER's hwm and
            # must re-assign, never reuse a stale range.
            import pyarrow.parquet as pq

            hwm = int(entry.get("row_id_hwm") or 0)
            for rec in entry["add"]:
                if "base_row_id" in rec:
                    continue
                rec["base_row_id"] = hwm
                rt_assigned.append(rec)
                hwm += pq.ParquetFile(
                    os.path.join(self.path, rec["path"])
                ).metadata.num_rows
            entry["row_id_hwm"] = hwm
        entry["version"] = version
        entry["timestamp"] = time.time()
        final = self._log_path(version)
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        # Atomic put-if-absent: link() fails with EEXIST if another writer
        # committed this version first (an exists()-then-rename check would
        # race — POSIX rename silently overwrites, losing a commit).
        try:
            os.link(tmp, final)
        except FileExistsError:
            for rec in rt_assigned:
                rec.pop("base_row_id", None)
            raise ConcurrentWriteError(
                f"version {version} already committed"
            ) from None
        finally:
            os.unlink(tmp)
        snap = dict(entry)
        snap["files"] = new_files
        self._snap_cache[version] = snap
        if version > 0 and version % _CHECKPOINT_INTERVAL == 0:
            # Checkpoints are derived data — racing writers may both try
            # this; first link wins, the loser's attempt is harmless.
            cp = os.path.join(
                self.path, _LOG_DIR, f"{version:08d}.checkpoint.json"
            )
            cp_tmp = cp + f".tmp-{uuid.uuid4().hex}"
            with open(cp_tmp, "w") as f:
                json.dump({"version": version, "files": new_files}, f)
            try:
                os.link(cp_tmp, cp)
            except FileExistsError:
                pass
            finally:
                os.unlink(cp_tmp)
        return version

    # ------------------------------------------------------------------ #
    # write paths
    # ------------------------------------------------------------------ #

    def _write_commit_dir(
        self,
        df: DataFrame,
        partition_by: list[str] | None,
        mapping: dict[str, str] | None = None,
    ) -> tuple[str, list[dict[str, Any]]]:
        """Write ``df`` into a fresh commit directory, return (dirname,
        file records).  Uses the stock distributed parquet writer; the
        driver only walks the output dir for metadata.

        ``df`` arrives with LOGICAL column names; when column mapping is
        active (``mapping`` given, or looked up from the current snapshot)
        the frame is renamed to physical names before writing so every data
        file in the table agrees on physical naming."""
        latest = self.latest_version()
        if mapping is None and latest is not None:
            mapping = self._entry(latest).get("column_mapping")
        if mapping:
            df = df.select(
                *[F.col(c).alias(mapping.get(c, c)) for c in df.columns]
            )
            if partition_by:
                partition_by = [mapping.get(c, c) for c in partition_by]
        commit_dir = f"c{(0 if latest is None else latest + 1):06d}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.path, commit_dir)
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        found: list[tuple[str, dict[str, str]]] = []
        for dirpath, _dirs, names in os.walk(out):
            partition: dict[str, str] = {}
            for seg in os.path.relpath(dirpath, out).split(os.sep):
                if "=" in seg:
                    k, _, v = seg.partition("=")
                    partition[k] = v
            for name in names:
                if name.endswith(".parquet"):
                    found.append((os.path.join(dirpath, name), partition))
        # footer stats are per-file metadata reads — IO-bound and
        # independent, so collect them in a thread pool (a partitioned
        # write can produce thousands of files; sequential collection was
        # the dominant cost of partitioned commits)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(32, max(1, len(found)))) as pool:
            metas = list(pool.map(lambda fp: _footer_meta(fp[0]), found))
        files = [
            {
                "path": os.path.relpath(full, self.path),
                "size": os.path.getsize(full),
                "partition": partition,
                "stats": st,
                **({"rows": n} if n is not None else {}),
            }
            for (full, partition), (st, n) in zip(found, metas)
        ]
        return commit_dir, files

    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        merge_schema: bool = False,
        max_retries: int = 10,
        optimize_write: "bool | None" = None,
        txn_app: str | None = None,
        txn_batch: int | None = None,
    ) -> int:
        """Delta-sink analog: ``overwrite`` (K2) / ``append`` (K4), with
        optional ``partitionBy`` (K3).  Returns the committed version.

        Schema evolution (SURVEY.md §1.4): an append whose schema drifts
        from the table's FAILS unless ``merge_schema=True`` (Delta's
        ``mergeSchema`` — new nullable columns are added, existing column
        types must match; old files read back with nulls for new columns).
        ``overwrite`` always replaces the schema (``overwriteSchema``).

        Optimistic concurrency: appends and overwrites don't read table
        DATA, so when another writer wins the version race the commit is
        re-prepared against the new snapshot and retried (up to
        ``max_retries`` times) — Delta's WriteSerializable behavior, where
        blind appends never conflict and concurrent overwrites are
        last-writer-wins.  A retry re-validates schema/layout against the
        competitor's commit: a concurrently-changed partition layout (or
        an incompatible concurrent schema change) still raises, because
        the data files were already laid out under the old assumptions.
        Read-modify-write operations (merge/delete/update/optimize) keep
        failing fast with :class:`ConcurrentWriteError` — their read
        snapshot may be logically invalidated, which needs the caller to
        re-run the whole operation.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")

        requested_pb = partition_by
        # CHECK constraints gate the incoming data before any files land
        # generated columns fill / validate and identity ids allocate
        # BEFORE the schema check (a source legitimately omits them)
        identity_update: dict[str, Any] | None = None
        ident_cache: DataFrame | None = None
        meta_extra: dict[str, Any] = {}
        if self.latest_version() is not None:
            cur = self._entry()
            if mode == "append":
                df, identity_update, ident_cache = (
                    self._apply_write_metadata(df, cur)
                )
            else:
                # overwrite replaces the schema: generated/identity
                # metadata survives only for columns the new data keeps
                meta_extra = {
                    "generated": {
                        c: e
                        for c, e in (cur.get("generated") or {}).items()
                        if c in df.columns
                    },
                    "identity": {
                        c: v
                        for c, v in (cur.get("identity") or {}).items()
                        if c in df.columns
                    },
                    "defaults": {
                        c: e
                        for c, e in (cur.get("defaults") or {}).items()
                        if c in df.columns
                    },
                }
        if (txn_app is None) != (txn_batch is None):
            raise ValueError("txn_app and txn_batch must be passed together")
        if txn_app is not None:
            # Delta txnAppId/txnVersion analog: a replayed foreachBatch
            # write (same app, batch id <= the committed marker) is a
            # no-op — checked BEFORE any data is written
            last = self.last_txn_batch(txn_app)
            if last is not None and txn_batch <= last:
                return self.latest_version()  # type: ignore[return-value]
        self._enforce_constraints(df, f"{mode} write")

        def prep() -> tuple[
            list[dict[str, Any]],
            list[str] | None,
            StructType,
            dict[str, str] | None,
        ]:
            prev_files: list[dict[str, Any]] = []
            pb = requested_pb
            schema = df.schema
            cur_map: dict[str, str] | None = None
            if self.latest_version() is not None:
                cur_map = self._entry().get("column_mapping")
            if mode == "append" and self.latest_version() is not None:
                prev = self._entry()
                prev_files = prev["files"]
                existing_pb = prev.get("partition_by") or None
                if pb is None:
                    pb = existing_pb
                elif pb != (existing_pb or []):
                    raise ValueError(
                        f"append partition_by {pb} != table layout {existing_pb}"
                    )
                existing = StructType.fromJson(prev["schema"])
                if [f.name for f in df.schema.fields] != [
                    f.name for f in existing.fields
                ] or any(
                    a.dataType != b.dataType
                    for a, b in zip(df.schema.fields, existing.fields)
                ):
                    if not merge_schema:
                        raise ValueError(
                            "append schema differs from table schema; pass "
                            f"merge_schema=True to evolve.\n  table: {existing.simpleString()}"
                            f"\n  data:  {df.schema.simpleString()}"
                        )
                    schema = _merge_schemas(existing, df.schema)
            new_map: dict[str, str] | None = None
            if cur_map:
                # column mapping active: carry physicals for known logicals;
                # NEW columns get collision-free physical names (a physical
                # ever used — including by dropped columns, kept as
                # ``__dropped_*`` tombstones — must never be reused, or old
                # files' stale bytes would resurface under the new column)
                used = set(cur_map.values())
                new_map = {
                    k: v for k, v in cur_map.items() if k.startswith("__dropped_")
                }
                for f_ in schema.fields:
                    c = f_.name
                    p = cur_map.get(
                        c, c if c not in used else f"col_{uuid.uuid4().hex[:8]}"
                    )
                    new_map[c] = p
                    used.add(p)
            return prev_files, pb, schema, new_map

        try:
            prev_files, partition_by, schema, write_map = prep()
            if optimize_write is None and self.latest_version() is not None:
                optimize_write = bool(self._entry().get("optimize_write"))
            if optimize_write and partition_by:
                # Delta optimizeWrite analog: shuffle rows to their target
                # partition BEFORE the write so each partition value lands
                # in one task -> one right-sized file per partition per
                # commit, instead of one shard per upstream task per
                # partition (the small-file explosion); AQE coalesces the
                # exchange to sensible sizes
                df = df.repartition(*[F.col(c) for c in partition_by])
            _dir, files = self._write_commit_dir(
                df, partition_by, mapping=write_map
            )
        finally:
            if ident_cache is not None:
                ident_cache.unpersist()
        attempts = 0
        while True:
            try:
                version = self._commit(
                    {
                        "operation": mode,
                        **(
                            {"txn": {"app": txn_app, "batch": int(txn_batch)}}
                            if txn_app is not None
                            else {}
                        ),
                        "files": prev_files + files,
                        "partition_by": partition_by or [],
                        "schema": json.loads(schema.json()),
                        "num_files": len(prev_files) + len(files),
                        "added_files": len(files),
                        **meta_extra,
                        **(
                            {"column_mapping": write_map}
                            if write_map is not None
                            else {}
                        ),
                        **(
                            {"identity": identity_update}
                            if identity_update
                            else {}
                        ),
                    }
                )
            except ConcurrentWriteError:
                attempts += 1
                if attempts > max_retries:
                    raise
                if identity_update is not None:
                    # the losing writer's id range may overlap the
                    # winner's allocation — identity makes appends
                    # non-commutative, so the whole write must re-run
                    raise ConcurrentWriteError(
                        "concurrent write raced an identity-column "
                        "allocation; re-run the write to allocate a fresh "
                        "id range"
                    ) from None
                if txn_app is not None:
                    last = self.last_txn_batch(txn_app)
                    if last is not None and txn_batch <= last:
                        # the RACING writer was our own replay twin: its
                        # commit already carries this batch — drop ours
                        return self.latest_version()  # type: ignore[return-value]
                new_prev, new_pb, schema, new_map = prep()  # re-validate vs winner
                if write_map is not None or new_map is not None:
                    stable = {
                        k: v
                        for k, v in (new_map or {}).items()
                        if (write_map or {}).get(k) == v
                    }
                    if stable != (new_map or {}) or set(
                        (write_map or {})
                    ) - set(new_map or {}):
                        # data files were written under OUR mapping; a
                        # concurrent mapping change invalidates the layout
                        raise ConcurrentWriteError(
                            "column mapping changed concurrently; data "
                            "files were written under the old mapping — "
                            "re-run the write"
                        ) from None
                if (new_pb or []) != (partition_by or []):
                    raise ConcurrentWriteError(
                        "partition layout changed concurrently; data files "
                        f"were written as {partition_by or []}, table is now "
                        f"{new_pb or []}"
                    ) from None
                prev_files = new_prev
            else:
                # post-commit maintenance runs OUTSIDE the retry guard: the
                # write is durable, and a compaction losing its own race
                # must never re-run the append
                self._maybe_auto_compact(files)
                return version

    # ------------------------------------------------------------------ #
    # read paths
    # ------------------------------------------------------------------ #

    def schema(self, version: int | None = None) -> StructType:
        return StructType.fromJson(self._entry(version)["schema"])

    def version_at(self, timestamp: "float | str | Any") -> int:
        """The version a ``TIMESTAMP AS OF`` read resolves to: the latest
        commit at or before ``timestamp`` (epoch seconds, ISO string, or
        datetime).  Raises if the timestamp predates the first commit —
        Delta's behavior for an out-of-range timestamp."""
        import datetime

        if isinstance(timestamp, str):
            timestamp = datetime.datetime.fromisoformat(timestamp)
        if isinstance(timestamp, datetime.datetime):
            if timestamp.tzinfo is None:
                timestamp = timestamp.replace(
                    tzinfo=datetime.timezone.utc
                )
            timestamp = timestamp.timestamp()
        best: int | None = None
        for v in self._versions():
            if self._raw_entry(v)["timestamp"] <= timestamp:
                best = v
        if best is None:
            raise ValueError(
                f"no commit at or before {timestamp}; the table's first "
                "commit is newer (Delta TIMESTAMP AS OF semantics)"
            )
        return best

    def read(
        self,
        version: "int | str | None" = None,
        timestamp: "float | str | Any | None" = None,
    ) -> DataFrame:
        """Snapshot scan (S3 analog); ``version`` gives time travel
        (``VERSION AS OF`` — an int, or a tag name from :meth:`tag`),
        ``timestamp`` resolves via :meth:`version_at`
        (``TIMESTAMP AS OF``).

        Files are grouped by commit directory and each group is read with
        ``basePath`` pointing at its commit dir so Hive-style partition
        columns are recovered; groups are unioned by name.  Each scan is a
        plain parquet relation, so Catalyst pushdown/pruning applies
        per-group.

        Raises :class:`VacuumedVersionError` when the requested historical
        snapshot's files were removed by :meth:`vacuum` — a clear verdict at
        plan time instead of a Spark file-not-found mid-execution.
        """
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            version = self.version_at(timestamp)
        version = self._resolve_version(version)
        entry = self._entry(version)
        self._check_time_travel_files(entry, version)
        return self._read_files(entry, entry["files"])

    def _check_time_travel_files(
        self, entry: dict[str, Any], version: int | None
    ) -> None:
        """Driver-side existence probe, ONLY for explicit time travel to a
        non-head version (the head's files are live by the vacuum contract,
        so the hot path pays nothing)."""
        if version is None or version == self.latest_version():
            return
        missing = [
            p
            for f in entry["files"]
            for p in [f["path"], *_rec_dvs(f)]
            if not os.path.exists(os.path.join(self.path, p))
        ]
        if missing:
            raise VacuumedVersionError(
                f"cannot time-travel to version {version}: {len(missing)} of "
                f"{len(entry['files'])} data file(s) were removed by vacuum "
                f"(e.g. {missing[0]}). Increase vacuum retain_hours to keep "
                "historical versions readable."
            )

    def _require_files_exist(self, recs: list[dict[str, Any]], what: str) -> None:
        """Clear VacuumedVersionError (not a mid-execution Spark
        file-not-found) when a historical read needs vacuumed files."""
        missing = [
            p
            for f in recs
            for p in [f["path"], *_rec_dvs(f)]
            if not os.path.exists(os.path.join(self.path, p))
        ]
        if missing:
            raise VacuumedVersionError(
                f"{what} needs {len(missing)} data file(s) removed by vacuum "
                f"(e.g. {missing[0]}). Increase vacuum retain_hours to keep "
                "the range readable."
            )

    def to_df(self) -> DataFrame:
        return self.read()

    def scan(
        self, filters: list[tuple[str, str, Any]], version: "int | str | None" = None
    ) -> DataFrame:
        """Stats-pruned scan: Delta-style data skipping on the per-file
        min/max recorded at commit time, plus partition-value pruning —
        then the same predicates applied exactly as DataFrame filters.

        ``filters``: [(column, op, literal), ...] with op in
        ``= < <= > >= in`` (AND semantics; ``in`` takes a list literal and
        prunes by stats ranges, bloom filters, and partition values).  Combined with
        ``optimize(sort_by=...)``, a selective scan touches only the files
        whose stat range covers the predicate — the measurable form of the
        reference's Z-order benefit (deltalake.ipynb:8354-8356).
        """
        entry = self._entry(version)
        self._check_time_travel_files(entry, version)
        _skipped, live = self._split_files(entry, filters)
        df = self._read_files(entry, live)
        return df.filter(_filters_expr(filters))

    def _split_files(
        self, entry: dict[str, Any], filters: list[tuple[str, str, Any]]
    ) -> tuple[list[dict[str, Any]], list[dict[str, Any]]]:
        """(provably-unmatched, possibly-matched) file split by footer
        stats + partition values — shared by scan/delete/update."""
        part_cols = set(entry.get("partition_by") or [])
        # stats/bloom metadata is keyed by physical names; partition columns
        # can never be renamed, so translating is safe for both checks
        filters = self._phys_filters(entry, filters)
        # generated-column derivation: predicates on a generated expression's
        # source column imply (relaxed) predicates on the generated column,
        # which participate in BOTH the partition checks below and the
        # footer-stats check (the derived filters are pruning-only — scan's
        # final DataFrame filter applies the caller's original predicates)
        filters = filters + _derive_generated_filters(entry, filters)
        part_types: dict[str, str] = {}
        if any(c in part_cols and o in ("<", "<=", ">", ">=") for c, o, _ in filters):
            part_types = {
                fld.name: fld.dataType.simpleString()
                for fld in StructType.fromJson(entry["schema"]).fields
            }
        skipped, live = [], []
        for f in entry["files"]:
            keep = _file_may_match(f, filters)
            for col, op, val in filters:
                if col not in part_cols or col not in f["partition"]:
                    continue
                if op == "=":
                    # normalized comparison (booleans, escaped chars, null
                    # partition): skip only on a PROVEN mismatch — a null/
                    # empty dir value (None) never proves a mismatch against
                    # an empty-string literal, so both normalize to None and
                    # the file is kept.
                    if _dir_value_str(f["partition"][col]) != _hive_value_str(val):
                        keep = False
                elif op == "in":
                    # the file's single partition value must be one of the
                    # list's normalized values (IN (...) with a null element
                    # never MATCHES null in SQL, but pruning only needs the
                    # PROVEN-miss direction, so equality of normalized forms
                    # conservatively keeps)
                    if _dir_value_str(f["partition"][col]) not in {
                        _hive_value_str(v) for v in val
                    }:
                        keep = False
                elif op in ("<", "<=", ">", ">="):
                    # typed RANGE pruning on the partition value: the file
                    # holds exactly one value pv for this column, so it can
                    # only match if ``pv op val`` holds.  The null partition
                    # never satisfies a range predicate (SQL null compare);
                    # unparseable/mixed-type values conservatively keep.
                    pv = _typed_dir_value(
                        f["partition"][col], part_types.get(col, "")
                    )
                    if pv is None:
                        keep = False
                    elif pv is not _UNPARSED:
                        try:
                            ok = (
                                pv < val if op == "<"
                                else pv <= val if op == "<="
                                else pv > val if op == ">"
                                else pv >= val
                            )
                        except TypeError:
                            ok = True
                        if not ok:
                            keep = False
            (live if keep else skipped).append(f)
        return skipped, live

    def pruned_file_count(
        self, filters: list[tuple[str, str, Any]], version: int | None = None
    ) -> tuple[int, int]:
        """(surviving, total) file counts for ``filters`` — the
        deterministic data-skipping metric used by tests/benchmarks.
        Counts every pruning source a scan/DML uses: footer stats, bloom
        filters, AND partition values (same split as :meth:`scan`)."""
        entry = self._entry(version)
        _skipped, live = self._split_files(entry, filters)
        return len(live), len(entry["files"])

    # ------------------------------------------------------------------ #
    # merge (J7 / J8)
    # ------------------------------------------------------------------ #

    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        when_matched: str = "update_all",
        when_not_matched: str = "insert_all",
        matched_condition: "Column | str | None" = None,
        update_set: "dict[str, Column | str] | None" = None,
        not_matched_condition: "Column | str | None" = None,
        when_not_matched_by_source: str = "ignore",
        not_matched_by_source_set: "dict[str, Column | str] | None" = None,
        not_matched_by_source_condition: "Column | str | None" = None,
        merge_schema: bool = False,
        txn_app: str | None = None,
        txn_batch: int | None = None,
        with_metrics: bool = False,
    ) -> int:
        """Upsert ``source`` into the table on equality of ``keys``.

        NULL source keys follow standard SQL/Delta MERGE semantics: a NULL
        key never matches (``NULL = NULL`` is not true), so such rows take
        the NOT MATCHED branch on EVERY merge — repeated merges of the same
        NULL-keyed row insert it repeatedly.  Layers that promise
        convergence on crawl-quality input define their own rule above
        this: IncrementalAggView fails fast on NULL grouping keys, SCD2
        drops NULL-business-key changes (tables/scd.py), and the
        incremental except-date append compares null-safely
        (tables/incremental.py).

        ``with_metrics=True`` records Delta-style ``operationMetrics``
        (source rows, matched/updated/deleted/inserted row counts,
        clause conditions applied) into the commit entry — read them back
        via ``history()[0]["operation_metrics"]``.  Opt-in because the
        counts cost two extra join jobs over the affected files.

        ``txn_app``/``txn_batch``: Delta txnAppId/txnVersion analog — a
        replayed foreachBatch merge (same app, batch id <= the committed
        marker) is a no-op, which makes even non-idempotent clause
        expressions (e.g. ``update_set={"v": "t.v + s.v"}``) replay-safe.

        ``merge_schema=True`` is Delta's ``withSchemaEvolution()`` for the
        add-column case: new source columns append to the table schema as
        nullable (old files and untouched rows read back null); same-name
        type conflicts raise; a source missing existing table columns is
        still an error (evolution adds columns — it never silently nulls
        updated rows' data).

        ``when_matched``: ``update_all`` (replace the whole row with the
        source row — Delta ``whenMatchedUpdateAll``), ``ignore``, or
        ``delete`` (Delta ``whenMatchedDelete``).
        ``when_not_matched``: ``insert_all`` (Delta
        ``whenNotMatchedInsertAll``) or ``ignore``.  The
        (``ignore``/``insert_all``) pair is the reference's insert-only
        dedup merge (deltalake.ipynb:1786-1791); the default pair is its
        full upsert (:2942-2945).

        Conditional clauses (Delta ``whenMatchedUpdate(set=…,
        condition=…)`` / ``whenNotMatchedInsert(condition=…)``):

        - ``update_set``: partial update — only the listed columns change
          on matched rows (``{col: expression}``; expressions may
          reference the target as ``t.<col>`` and the source as
          ``s.<col>``, strings are parsed with ``F.expr``).  Merge keys
          cannot be assigned.  Implies an update ``when_matched``.
        - ``matched_condition``: the matched clause (update or delete)
          applies only where this ``t``/``s`` predicate holds; other
          matched rows keep the target row.
        - ``not_matched_condition``: only source rows satisfying this
          ``s`` predicate insert.

        WHEN NOT MATCHED BY SOURCE (Delta 2.3+): target rows with no source
        match can be deleted or updated
        (``not_matched_by_source_set``, target-column expressions — the
        clause sees no source row), optionally gated by
        ``not_matched_by_source_condition`` (target columns only).  The
        classic use: full-snapshot sync — upsert the snapshot, delete (or
        flag stale) everything the snapshot no longer contains.  A by-source
        clause disables partition/stats pruning: no file can be proven
        irrelevant by the source's keys when rows WITHOUT a match are in
        scope, so the merge scans table-wide (Delta behaves identically).

        Like Delta, requires the source to have at most one row per key
        (not validated here — validate with ``quality.assert_unique`` when
        in doubt).

        Partition pruning: only applied when every partition column is part
        of ``keys`` — then a matched target row provably carries the same
        partition values as its source row, so partitions the source doesn't
        touch can't contain matches and carry over by reference.  When the
        partition columns are NOT merge keys, a key's partition value may
        differ between source and target (e.g. a client changing country);
        skipping the old partition would strand the stale row (duplicate
        keys), so the merge falls back to file-stats pruning across the
        whole table — Delta MERGE matches table-wide too.  The rewrite
        itself is a distributed anti/union plan — with a small source, Spark
        auto-broadcasts the anti-join side.
        """
        if when_matched not in ("update_all", "ignore", "delete"):
            raise ValueError(f"bad when_matched: {when_matched!r}")
        if when_not_matched not in ("insert_all", "ignore"):
            raise ValueError(f"bad when_not_matched: {when_not_matched!r}")
        if update_set:
            if when_matched != "update_all":
                raise ValueError(
                    "update_set implies an update clause; "
                    f"incompatible with when_matched={when_matched!r}"
                )
            bad_keys = sorted(set(update_set) & set(keys))
            if bad_keys:
                raise ValueError(f"update_set cannot assign merge keys: {bad_keys}")
        if matched_condition is not None and when_matched == "ignore":
            raise ValueError("matched_condition with when_matched='ignore' is a no-op")
        if when_not_matched_by_source not in ("ignore", "delete", "update"):
            raise ValueError(
                f"bad when_not_matched_by_source: {when_not_matched_by_source!r}"
            )
        if when_not_matched_by_source == "update" and not not_matched_by_source_set:
            raise ValueError(
                "when_not_matched_by_source='update' requires "
                "not_matched_by_source_set"
            )
        if not_matched_by_source_set:
            if when_not_matched_by_source != "update":
                raise ValueError(
                    "not_matched_by_source_set implies "
                    "when_not_matched_by_source='update'"
                )
            bad = sorted(set(not_matched_by_source_set) & set(keys))
            if bad:
                raise ValueError(
                    f"not_matched_by_source_set cannot assign merge keys: {bad}"
                )
        if (
            not_matched_by_source_condition is not None
            and when_not_matched_by_source == "ignore"
        ):
            raise ValueError(
                "not_matched_by_source_condition with "
                "when_not_matched_by_source='ignore' is a no-op"
            )
        bysource = when_not_matched_by_source != "ignore"
        if (txn_app is None) != (txn_batch is None):
            raise ValueError("txn_app and txn_batch must be passed together")
        if txn_app is not None:
            last = self.last_txn_batch(txn_app)
            if last is not None and txn_batch <= last:
                return self.latest_version()  # type: ignore[return-value]
        entry = self._entry()
        partition_by: list[str] = entry.get("partition_by") or []
        # a by-source clause touches target rows with NO source match, so
        # no file can be proven irrelevant by the source's keys — the merge
        # scans table-wide, exactly as Delta's whenNotMatchedBySource does
        prune = (
            bool(partition_by)
            and all(c in keys for c in partition_by)
            and not bysource
        )
        existing_schema = StructType.fromJson(entry["schema"])
        schema_json = entry["schema"]
        if merge_schema:
            # Delta withSchemaEvolution() analog, scoped like this table's
            # append contract: NEW source columns are appended as nullable
            # (carried-over files and non-matched target rows read back
            # null); same-name type conflicts raise; a source MISSING table
            # columns still errors below — evolution adds columns, it never
            # silently drops data from updated rows.
            evolved = _merge_schemas(existing_schema, source.schema)
            if len(evolved.fields) != len(existing_schema.fields):
                schema_json = evolved.jsonValue()
            existing_schema = evolved
        table_cols = [f.name for f in existing_schema.fields]
        read_entry = {**entry, "schema": schema_json}
        row_tracked = bool(entry.get("row_tracking"))

        # The source plan feeds every downstream consumer (the pruning
        # aggregate/distinct below plus both branches of the merge shape);
        # persist FIRST so an expensive source (e.g. a recomputed mart) is
        # evaluated once, not once per consumer.
        src = source.select(*table_cols)
        if row_tracked:
            # source rows are id-less: inserts draw fresh ids from their
            # new file's base; matched updates take the target's id below
            src = src.withColumn(_ROW_ID, F.lit(None).cast("long"))
        src = src.persist()
        # CHECK constraints gate the incoming source (update_set expressions
        # are the caller's responsibility — enforcement covers inserted and
        # whole-row-updated data, the Delta write-path scope)
        self._enforce_constraints(src, "merge source")
        try:
            if bysource:
                keep_files, affected = [], list(entry["files"])
            elif prune:
                # driver-side partition pruning over log metadata (small),
                # never over data rows; both sides normalized to the same
                # rendering (booleans, escapes, null partition).  The collect
                # is bounded: limit(CAP+1) caps what can ever reach the
                # driver, and exceeding CAP is an error — a partition column
                # with >10K distinct values is a layout bug (tiny-file
                # explosion at scale), not something to plan around.
                cap = _PARTITION_DISCOVERY_CAP
                part_rows = (
                    src.select(*partition_by).distinct().limit(cap + 1).collect()
                )
                if len(part_rows) > cap:
                    raise ValueError(
                        f"merge source touches more than {cap} distinct "
                        f"partition values for partition_by={partition_by}; "
                        "this partition layout is too fine-grained — "
                        "repartition the table on a bounded-cardinality "
                        "column (e.g. year, not date)"
                    )
                touched = {
                    tuple(_hive_value_str(r[c]) for c in partition_by)
                    for r in part_rows
                }
                keep_files, affected = [], []
                for f in entry["files"]:
                    if all(c in f["partition"] for c in partition_by):
                        part = tuple(
                            _dir_value_str(f["partition"][c]) for c in partition_by
                        )
                        hit = part in touched
                    else:  # un-layouted file (pre-partitioning commit): keep
                        hit = True
                    (affected if hit else keep_files).append(f)
            else:  # not bysource, not partition-prunable
                # file-level stats pruning (Delta data-skipping applied to
                # MERGE): a file whose per-key min/max range is disjoint from
                # the source's key bounds can't contain a matched row, so it
                # carries over by reference.  One tiny agg over the source;
                # inserts always land in the new commit's files, so only
                # matched rows constrain which files must rewrite.
                bounds_row = src.agg(
                    *[F.min(k).alias(f"_lo_{k}") for k in keys],
                    *[F.max(k).alias(f"_hi_{k}") for k in keys],
                ).first()
                filters = []
                for k in keys:
                    lo, hi = bounds_row[f"_lo_{k}"], bounds_row[f"_hi_{k}"]
                    if lo is not None:
                        pk = self._phys(entry, k)
                        filters += [(pk, ">=", lo), (pk, "<=", hi)]
                keep_files, affected = [], []
                for f in entry["files"]:
                    (affected if not filters or _file_may_match(f, filters) else keep_files).append(f)
            target = (
                self._read_files_tracked(read_entry, affected)
                if row_tracked
                else self._read_files(read_entry, affected)
            )

            # WHEN NOT MATCHED BY SOURCE (Delta 2.3+ clause): transform the
            # unmatched-target branch BEFORE the standard matched/insert
            # plan.  A row is matched XOR unmatched-by-source, and neither
            # clause may assign merge keys, so pre-transforming unmatched
            # rows cannot change what the matched plan below pairs up.
            bysource_cdc: "DataFrame | None" = None
            bysource_touched = 0
            if bysource:
                hit = (
                    src.select(*keys)
                    .dropDuplicates(keys)
                    .withColumn("_src_hit", F.lit(True))
                )
                cond = F.col("_src_hit").isNull()
                if not_matched_by_source_condition is not None:
                    c = not_matched_by_source_condition
                    cond = cond & (F.expr(c) if isinstance(c, str) else c)
                # materialize the clause decision BEFORE any assignment: the
                # condition must evaluate against pre-update values (an
                # update that falsifies its own condition would otherwise
                # vanish from the postimage filter)
                t2 = target.join(hit, keys, "left").withColumn("_bys", cond)
                applies = F.col("_bys")
                if self.cdf_enabled() or with_metrics:
                    bysource_touched = t2.filter(applies).count()
                if when_not_matched_by_source == "delete":
                    if self.cdf_enabled():
                        bysource_cdc = (
                            t2.filter(applies)
                            .select(*table_cols)
                            .withColumn(_CDC_COL, F.lit("delete"))
                        )
                    # NULL condition = clause does NOT apply = row KEPT
                    # (the raw ~applies is NULL there and would silently
                    # drop the row — same hazard as delete_where's remaining)
                    target = t2.filter(
                        ~F.coalesce(applies, F.lit(False))
                    ).drop("_src_hit", "_bys")
                else:  # update
                    pre = t2.filter(applies) if self.cdf_enabled() else None
                    upd = t2
                    for col_, e in (not_matched_by_source_set or {}).items():
                        expr_ = F.expr(e) if isinstance(e, str) else e
                        upd = upd.withColumn(
                            col_,
                            F.when(
                                applies, expr_.cast(existing_schema[col_].dataType)
                            ).otherwise(F.col(col_)),
                        )
                    if pre is not None:
                        bysource_cdc = (
                            pre.select(*table_cols)
                            .withColumn(_CDC_COL, F.lit("update_preimage"))
                            .unionByName(
                                upd.filter(applies)
                                .select(*table_cols)
                                .withColumn(_CDC_COL, F.lit("update_postimage"))
                            )
                        )
                    target = upd.drop("_src_hit", "_bys")

            conditional = (
                matched_condition is not None
                or update_set
                or not_matched_condition is not None
            )
            if conditional or (row_tracked and when_matched == "update_all"):
                merged = self._conditional_merge_plan(
                    target,
                    src,
                    keys,
                    table_cols,
                    existing_schema,
                    when_matched,
                    when_not_matched,
                    matched_condition,
                    update_set,
                    not_matched_condition,
                    row_tracked=row_tracked,
                )
            elif when_matched == "update_all" and when_not_matched == "insert_all":
                merged = src.unionByName(target.join(src, keys, "left_anti"))
            elif when_matched == "ignore" and when_not_matched == "insert_all":
                merged = target.unionByName(src.join(target, keys, "left_anti"))
            elif when_matched == "delete":
                merged = target.join(src, keys, "left_anti")
                if when_not_matched == "insert_all":
                    # only NOT-MATCHED source rows insert: a matched source
                    # row's pair was consumed by the delete clause —
                    # unioning ALL of src resurrected matched keys with the
                    # source payload (r9 degenerate-tables sweep, R-delete)
                    merged = merged.unionByName(
                        src.join(target, keys, "left_anti")
                    )
            elif when_matched == "ignore":  # and when_not_matched == "ignore"
                # both main clauses no-op: the merge is only its by-source
                # effects (already applied to `target` above).  This combo
                # previously fell into the update branch below and silently
                # REPLACED matched rows (r9 degenerate-tables sweep, R-ignore)
                merged = target
            else:  # update_all matched rows only, no inserts
                matched = src.join(target, keys, "left_semi")
                merged = matched.unionByName(target.join(src, keys, "left_anti"))

            op_metrics = None
            if with_metrics:
                on = None
                for k in keys:
                    c = F.col(f"t.{k}") == F.col(f"s.{k}")
                    on = c if on is None else (on & c)

                def as_cond(e):
                    return F.expr(e) if isinstance(e, str) else e

                pair = src.alias("s").join(target.alias("t"), on, "inner")
                if matched_condition is not None:
                    pair = pair.filter(as_cond(matched_condition))
                n_matched = pair.count()
                n_inserted = 0
                if when_not_matched == "insert_all":
                    anti = src.alias("s").join(target.alias("t"), on, "left_anti")
                    if not_matched_condition is not None:
                        anti = anti.filter(as_cond(not_matched_condition))
                    n_inserted = anti.count()
                op_metrics = {
                    "num_source_rows": src.count(),
                    **(
                        {
                            "num_target_rows_deleted_by_source": bysource_touched
                            if when_not_matched_by_source == "delete"
                            else 0,
                            "num_target_rows_updated_by_source": bysource_touched
                            if when_not_matched_by_source == "update"
                            else 0,
                        }
                        if bysource
                        else {}
                    ),
                    "num_target_rows_matched": n_matched,
                    "num_target_rows_updated": n_matched
                    if when_matched == "update_all"
                    else 0,
                    "num_target_rows_deleted": n_matched
                    if when_matched == "delete"
                    else 0,
                    "num_target_rows_inserted": n_inserted,
                }

            cdc_files = None
            if self.cdf_enabled():
                cdc = self._merge_cdc(
                    target,
                    src,
                    keys,
                    table_cols,
                    existing_schema,
                    when_matched,
                    when_not_matched,
                    matched_condition,
                    update_set,
                    not_matched_condition,
                )
                if bysource_cdc is not None:
                    # by-source rows are invisible to the standard CDC join
                    # (deleted rows left the target; updated rows have no
                    # source match), so their images union in here
                    cdc = cdc.unionByName(bysource_cdc)
                cdc_files = self._write_cdc_dir(cdc)
            if partition_by and bool(entry.get("optimize_write")):
                # Delta optimizeWrite applies to MERGE rewrites too:
                # without it every shuffle task of the rewrite writes a
                # shard into every touched partition dir (64 tasks x 5
                # partitions = 320 tiny files at the 10M bench); one
                # exchange keyed on the partition columns makes it one
                # right-sized file per partition per commit
                merged = merged.repartition(
                    *[F.col(c) for c in partition_by]
                )
            _dir, files = self._write_commit_dir(merged, partition_by or None)
        finally:
            src.unpersist()
        self._commit(
            {
                "operation": "merge",
                **(
                    {"txn": {"app": txn_app, "batch": int(txn_batch)}}
                    if txn_app is not None
                    else {}
                ),
                **({"cdc_files": cdc_files} if cdc_files is not None else {}),
                **(
                    {"operation_metrics": op_metrics}
                    if op_metrics is not None
                    else {}
                ),
                "files": keep_files + files,
                "partition_by": partition_by,
                "schema": schema_json,
                "num_files": len(keep_files) + len(files),
                "added_files": len(files),
                "pruned": prune,
                "skipped_files": len(keep_files),
            }
        )
        return self.latest_version()  # type: ignore[return-value]

    def _conditional_merge_plan(
        self,
        target: DataFrame,
        src: DataFrame,
        keys: list[str],
        table_cols: list[str],
        schema: StructType,
        when_matched: str,
        when_not_matched: str,
        matched_condition: "Column | str | None",
        update_set: "dict[str, Column | str] | None",
        not_matched_condition: "Column | str | None",
        row_tracked: bool = False,
    ) -> DataFrame:
        """General merge shape for conditional clauses: an inner join pairs
        matched rows (aliased ``t``/``s`` so clause expressions can
        reference both sides), a left-anti keeps unmatched target rows, a
        second left-anti produces inserts.  Still one equi-join family on
        the merge keys — with a small source Spark broadcasts it, same as
        the unconditional fast paths.

        ``row_tracked``: both frames carry ``_row_id`` (target real, source
        null); matched rows keep the TARGET's id through update/keep, and
        inserts stay null so the new file's base assigns them fresh ids.

        Unlike the unconditional ``update_all`` path (which replaces all
        rows of a key with the single source row), duplicate target keys
        each pair with the source row and update independently — Delta
        errors on multiple matches; here the documented unique-key
        precondition makes the cases coincide.
        """

        def as_col(e: "Column | str") -> Column:
            return F.expr(e) if isinstance(e, str) else e

        cond = (
            as_col(matched_condition)
            if matched_condition is not None
            else F.lit(True)
        )
        t, s = target.alias("t"), src.alias("s")
        join_cond = None
        for k in keys:
            c = F.col(f"t.{k}") == F.col(f"s.{k}")
            join_cond = c if join_cond is None else (join_cond & c)
        matched = t.join(s, join_cond, "inner")
        t_cols = [F.col(f"t.{c}").alias(c) for c in table_cols]
        rid = [F.col(f"t.{_ROW_ID}").alias(_ROW_ID)] if row_tracked else []
        if when_matched == "delete":
            # a NULL matched_condition keeps the row (clause not applied);
            # the raw ~cond complement would silently drop it instead
            kept = matched.filter(~F.coalesce(cond, F.lit(False))).select(
                *t_cols, *rid
            )
        elif when_matched == "ignore":
            kept = matched.select(*t_cols, *rid)
        else:  # update_all or partial update_set
            out_cols = []
            for c in table_cols:
                if update_set and c in update_set:
                    new_v = as_col(update_set[c])
                elif update_set:
                    new_v = F.col(f"t.{c}")  # untouched column of a partial update
                else:
                    new_v = F.col(f"s.{c}")  # update_all
                new_v = new_v.cast(schema[c].dataType)
                out_cols.append(
                    F.when(cond, new_v).otherwise(F.col(f"t.{c}")).alias(c)
                )
            kept = matched.select(*out_cols, *rid)
        merged = target.join(src, keys, "left_anti").unionByName(kept)
        if when_not_matched == "insert_all":
            ins = src.join(target, keys, "left_anti").alias("s")
            if not_matched_condition is not None:
                ins = ins.filter(as_col(not_matched_condition))
            ins_cols = table_cols + ([_ROW_ID] if row_tracked else [])
            merged = merged.unionByName(ins.select(*ins_cols))
        return merged

    def _rel_path_expr(self) -> Column:
        """``_metadata.file_path`` (a ``file:/abs/path`` URI) rendered as the
        table-relative path the log records — the DV join key."""
        absolute = F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/*", "/"
        )
        return F.replace(absolute, F.lit(self.path + os.sep), F.lit(""))

    def column_mapping(self, version: int | None = None) -> dict[str, str]:
        """Logical -> physical column-name mapping (Delta column-mapping
        analog).  Identity (empty dict) until the first :meth:`rename_column`
        / :meth:`drop_column` enables mapping; afterwards data files keep
        their original (physical) column names and only the mapping + logical
        schema change — no file rewrites."""
        return dict(self._entry(version).get("column_mapping") or {})

    def _phys(self, entry: dict[str, Any], col: str) -> str:
        return (entry.get("column_mapping") or {}).get(col, col)

    def _phys_filters(
        self, entry: dict[str, Any], filters: list[tuple[str, str, Any]]
    ) -> list[tuple[str, str, Any]]:
        """Translate filter column names logical -> physical so they match
        per-file footer stats / bloom metadata (always keyed physical)."""
        m = entry.get("column_mapping")
        if not m:
            return filters
        return [(m.get(c, c), op, v) for c, op, v in filters]

    def _read_files(
        self,
        entry: dict[str, Any],
        files: list[dict[str, Any]],
        with_pos: bool = False,
        extra_fields: "list[StructField] | None" = None,
    ) -> DataFrame:
        """Union the file groups into one frame, subtracting any deletion
        vectors attached to the records.  ``with_pos=True`` keeps the
        ``(__dv_file, __dv_pos)`` row-identity columns on the output (used
        by merge-on-read DML to address the surviving rows).

        ``extra_fields``: reserved PHYSICAL columns read verbatim alongside
        the logical schema (files lacking them null-fill) — used for the
        materialized ``_row_id`` column of row tracking.

        With column mapping active, files are read under their PHYSICAL
        column names and aliased back to the logical schema at the end —
        the rename/drop-without-rewrite contract."""
        logical = StructType.fromJson(entry["schema"])
        mapping = entry.get("column_mapping") or {}
        schema = (
            StructType(
                [
                    StructField(mapping.get(f.name, f.name), f.dataType, f.nullable)
                    for f in logical.fields
                ]
            )
            if mapping
            else logical
        )
        if extra_fields:
            schema = StructType(list(schema.fields) + list(extra_fields))
        dv_paths = sorted({dv for rec in files for dv in _rec_dvs(rec)})
        need_pos = with_pos or bool(dv_paths)
        if not files:
            empty_schema = (
                StructType(list(logical.fields) + list(extra_fields))
                if extra_fields
                else logical
            )
            out = self.spark.createDataFrame([], empty_schema)
            if with_pos:
                out = out.withColumn(
                    _DV_FILE, F.lit(None).cast("string")
                ).withColumn(_DV_POS, F.lit(None).cast("bigint"))
            return out
        groups: dict[str, list[str]] = {}
        for f in files:
            first = f["path"].split("/", 1)[0]
            # commit-dir files resolve Hive partition dirs relative to
            # their commit dir; CONVERTed files (registered in place by
            # convert_from_parquet, no c######- prefix) resolve relative
            # to the table root
            commit_dir = first if re.match(r"^c\d{6}-", first) else ""
            groups.setdefault(commit_dir, []).append(
                os.path.join(self.path, f["path"])
            )
        dfs = [
            self.spark.read.schema(schema)
            .option("basePath", os.path.join(self.path, commit_dir))
            .parquet(*paths)
            for commit_dir, paths in sorted(groups.items())
        ]
        if need_pos:
            # resolve the hidden _metadata struct per relation, BEFORE the
            # union (unionByName has no file provenance to offer)
            dfs = [
                d.withColumn(_DV_FILE, self._rel_path_expr()).withColumn(
                    _DV_POS, F.col("_metadata.row_index")
                )
                for d in dfs
            ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        if dv_paths:
            dv = self.spark.read.schema(_DV_SCHEMA).parquet(
                *[os.path.join(self.path, p) for p in dv_paths]
            )
            dv_bytes = 0
            for p in dv_paths:
                try:
                    dv_bytes += os.path.getsize(os.path.join(self.path, p))
                except OSError:
                    dv_bytes = _DV_BROADCAST_BYTES  # unknown: don't force
                    break
            if dv_bytes < _DV_BROADCAST_BYTES:
                dv = F.broadcast(dv)
            out = out.join(dv, on=[_DV_FILE, _DV_POS], how="left_anti")
        if need_pos and not with_pos:
            out = out.drop(_DV_FILE, _DV_POS)
        if mapping:
            # physical -> logical aliasing happens LAST so the _metadata
            # provenance columns above resolved against the raw relations
            keep = [
                F.col(mapping.get(f.name, f.name)).alias(f.name)
                for f in logical.fields
            ]
            if extra_fields:
                keep += [F.col(f.name) for f in extra_fields]
            if with_pos:
                keep += [F.col(_DV_FILE), F.col(_DV_POS)]
            out = out.select(*keep)
        else:
            # parquet scans surface Hive partition columns LAST regardless
            # of the requested schema order — re-select so every snapshot
            # read returns the table's logical column order
            keep2 = [F.col(f.name) for f in logical.fields]
            if extra_fields:
                keep2 += [F.col(f.name) for f in extra_fields]
            if with_pos:
                keep2 += [F.col(_DV_FILE), F.col(_DV_POS)]
            out = out.select(*keep2)
        return out

    def delete_where(
        self,
        filters: list[tuple[str, str, Any]],
        mode: str = "copy_on_write",
    ) -> int:
        """DML DELETE: remove rows matching all ``filters`` (same tuple
        form as :meth:`scan`).

        ``copy_on_write`` (default): files that provably contain no
        matching row carry over by reference; only possibly-matched files
        rewrite — read-optimal, write cost O(affected file bytes).

        ``merge_on_read``: commit a deletion-vector sidecar instead of
        rewriting anything — write cost O(matched rows), reads pay a small
        anti-join until :meth:`purge_deletes` / :meth:`optimize`
        materializes.  The right trade when deletes are selective and
        frequent (GDPR erasure, late-data retraction) on files that are
        large relative to the hit count.
        """
        if mode == "merge_on_read":
            return self._dml_merge_on_read(filters, assignments=None)
        if mode != "copy_on_write":
            raise ValueError(f"bad delete mode: {mode!r}")
        entry = self._entry()
        partition_by: list[str] = entry.get("partition_by") or []
        keep_files, affected = self._split_files(entry, filters)
        scope = (
            self._read_files_tracked(entry, affected)
            if entry.get("row_tracking")
            else self._read_files(entry, affected)
        )
        # SQL DELETE semantics: a row is removed only when the predicate is
        # TRUE.  A NULL predicate (null in a filtered column) must KEEP the
        # row — the raw complement ~expr is also NULL there, which would
        # silently drop the row from `remaining` without deleting it
        # (row-loss, caught by test_delete_keeps_null_predicate_rows).
        remaining = scope.filter(~F.coalesce(_filters_expr(filters), F.lit(False)))
        cdc_files = None
        if self.cdf_enabled():
            cdc_files = self._write_cdc_dir(
                scope.filter(_filters_expr(filters))
                .drop(_ROW_ID)
                .withColumn(_CDC_COL, F.lit("delete"))
            )
        _dir, files = self._write_commit_dir(remaining, partition_by or None)
        self._commit(
            {
                "operation": "delete",
                **({"cdc_files": cdc_files} if cdc_files is not None else {}),
                "files": keep_files + files,
                "partition_by": partition_by,
                "schema": entry["schema"],
                "num_files": len(keep_files) + len(files),
                "added_files": len(files),
                "skipped_files": len(keep_files),
            }
        )
        return self.latest_version()  # type: ignore[return-value]

    def _write_dv_dir(self, dv_df: DataFrame) -> list[str]:
        """Distributed write of one commit's deletion-vector sidecar;
        returns the table-relative parquet paths."""
        latest = self.latest_version()
        commit_dir = (
            f"c{(0 if latest is None else latest + 1):06d}"
            f"-dv-{uuid.uuid4().hex[:8]}"
        )
        out = os.path.join(self.path, commit_dir)
        dv_df.write.mode("errorifexists").parquet(out)
        return sorted(
            os.path.relpath(os.path.join(dirpath, name), self.path)
            for dirpath, _dirs, names in os.walk(out)
            for name in names
            if name.endswith(".parquet")
        )

    def _dml_merge_on_read(
        self,
        filters: list[tuple[str, str, Any]],
        assignments: "dict[str, Column] | None",
    ) -> int:
        """Shared merge-on-read DELETE/UPDATE: DV the matched rows; for
        UPDATE additionally append the reassigned images as new files."""
        entry = self._entry()
        schema = StructType.fromJson(entry["schema"])
        clash = {_DV_FILE, _DV_POS} & {f.name for f in schema.fields}
        if clash:
            raise ValueError(
                f"merge_on_read DML reserves column names {sorted(clash)}"
            )
        partition_by: list[str] = entry.get("partition_by") or []
        keep_files, affected = self._split_files(entry, filters)
        row_tracked = bool(entry.get("row_tracking"))
        hits = (
            (
                self._read_files_tracked(entry, affected, with_pos=True)
                if row_tracked
                else self._read_files(entry, affected, with_pos=True)
            )
            .filter(_filters_expr(filters))
            .persist()
        )
        try:
            dv_paths = self._write_dv_dir(hits.select(_DV_FILE, _DV_POS))
            # bounded collect: one row per affected FILE, never per row
            counts = {
                r[_DV_FILE]: r["cnt"]
                for r in hits.groupBy(_DV_FILE)
                .agg(F.count("*").alias("cnt"))
                .collect()
            }
            new_data_files: list[dict[str, Any]] = []
            cdf_on = self.cdf_enabled()
            cdc_files = None
            if assignments is not None:
                # row tracking: the reassigned images carry their original
                # ids as a materialized column, so an updated row's id
                # survives the move into the new files
                updated = hits.drop(_DV_FILE, _DV_POS)
                for col, expr in assignments.items():
                    field = next(f for f in schema.fields if f.name == col)
                    updated = updated.withColumn(
                        col, expr.cast(field.dataType)
                    )
                if cdf_on:
                    cdc_files = self._write_cdc_dir(
                        hits.drop(_DV_FILE, _DV_POS, _ROW_ID)
                        .withColumn(_CDC_COL, F.lit("update_preimage"))
                        .unionByName(
                            updated.drop(_ROW_ID).withColumn(
                                _CDC_COL, F.lit("update_postimage")
                            )
                        )
                    )
                _dir, new_data_files = self._write_commit_dir(
                    updated, partition_by or None
                )
            elif cdf_on:
                cdc_files = self._write_cdc_dir(
                    hits.drop(_DV_FILE, _DV_POS, _ROW_ID).withColumn(
                        _CDC_COL, F.lit("delete")
                    )
                )
            recs = []
            scope = []
            for rec in affected:
                cnt = counts.get(rec["path"])
                if cnt:
                    scope.append(rec["path"])
                    recs.append(
                        {
                            **rec,
                            "dvs": _rec_dvs(rec) + dv_paths,
                            "dv_rows": rec.get("dv_rows", 0) + cnt,
                        }
                    )
                else:
                    recs.append(rec)
            total = sum(counts.values())
            all_files = keep_files + recs + new_data_files
            self._commit(
                {
                    "operation": "delete" if assignments is None else "update",
                    **({"cdc_files": cdc_files} if cdc_files is not None else {}),
                    "mode": "merge_on_read",
                    "dv_added": dv_paths,
                    "dv_scope": scope,
                    "files": all_files,
                    "partition_by": partition_by,
                    "schema": entry["schema"],
                    "num_files": len(all_files),
                    "added_files": len(new_data_files),
                    "skipped_files": len(keep_files),
                    "num_deleted_rows": total,
                }
            )
        finally:
            hits.unpersist()
        return self.latest_version()  # type: ignore[return-value]

    def purge_deletes(
        self, target_file_bytes: int = 128 * 1024 * 1024
    ) -> int:
        """Materialize all deletion vectors: rewrite ONLY the files that
        carry DVs (everything else is untouched metadata), dropping the
        sidecars from the snapshot.  Logically content-preserving, so the
        change feed treats it like compaction — it surfaces nothing."""
        entry = self._entry()
        partition_by: list[str] = entry.get("partition_by") or []
        dirty = [f for f in entry["files"] if _rec_dvs(f)]
        if not dirty:
            return self.latest_version()  # type: ignore[return-value]
        clean = [f for f in entry["files"] if not _rec_dvs(f)]
        total = sum(f["size"] for f in dirty) or 1
        n_files = max(1, -(-total // target_file_bytes))
        df = (
            self._read_files_tracked(entry, dirty)
            if entry.get("row_tracking")
            else self._read_files(entry, dirty)
        )
        if n_files < len(dirty):
            df = df.coalesce(n_files)
        _dir, files = self._write_commit_dir(df, partition_by or None)
        all_files = clean + files
        self._commit(
            {
                "operation": "optimize",
                "purged_dv_rows": sum(f.get("dv_rows", 0) for f in dirty),
                "files": all_files,
                "partition_by": partition_by,
                "schema": entry["schema"],
                "num_files": len(all_files),
                "added_files": len(files),
            }
        )
        return self.latest_version()  # type: ignore[return-value]

    def add_bloom_filters(
        self,
        cols: list[str],
        bits: int | None = None,
        hashes: int = 3,
    ) -> int:
        """Compute per-file Bloom filters for ``cols`` and commit them as
        file metadata (Delta's ``delta.bloomFilter`` analog).

        Point lookups (``scan([(col, "=", v)])``) then skip every file
        whose filter proves absence — the data-skipping min/max stats
        cannot give for high-cardinality unclustered columns, where each
        file's [min, max] spans the whole domain.

        Cost: one distributed pass over the table (hash + explode + a
        (file, word)-keyed bit_or — map-side combined), then a
        metadata-only commit; the collect is O(files x bits/64), never
        O(rows).  ``bits`` defaults to ~10 bits per row of the largest
        file (rounded up to a power of two, clamped to [4096, 2^20]) for
        ~1% false-positive rate at 3 hashes.  Columns must be string /
        integral / date so the JVM hash and the driver-side probe render
        values identically.  Filters are per-file immutable metadata:
        carried over by reference, dropped naturally when a rewrite
        replaces the file (re-run after OPTIMIZE), still valid (a
        superset) after merge-on-read deletes.
        """
        from pyspark.sql.types import DateType, IntegralType, StringType

        entry = self._entry()
        schema = StructType.fromJson(entry["schema"])
        for c in cols:
            dt = schema[c].dataType
            if not isinstance(dt, (StringType, IntegralType, DateType)):
                raise ValueError(
                    f"bloom filter column {c!r} must be string/integral/"
                    f"date, got {dt.simpleString()}"
                )
        files = entry["files"]
        df = self._read_files(entry, files, with_pos=True)
        if bits is None:
            top = (
                df.groupBy(_DV_FILE)
                .count()
                .agg(F.max("count"))
                .first()[0]
                or 1
            )
            bits = max(4096, min(1 << 20, 1 << (10 * top).bit_length()))
        if bits % 64:
            raise ValueError("bits must be a multiple of 64")
        new_blooms: dict[str, dict[str, dict[str, Any]]] = {}
        for c in cols:
            positions = F.array(
                *[_bloom_position_expr(c, s, bits) for s in range(hashes)]
            )
            words = (
                df.select(
                    F.col(_DV_FILE).alias("f"),
                    F.explode(positions).alias("pos"),
                )
                .select(
                    "f",
                    (F.col("pos") / 64).cast("bigint").alias("w"),
                    F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("m"),
                )
                .groupBy("f", "w")
                .agg(F.bit_or("m").alias("word"))
                .collect()
            )
            for r in words:
                # keyed by PHYSICAL name like footer stats, so probes via
                # _phys_filters keep matching across renames
                new_blooms.setdefault(r["f"], {}).setdefault(
                    self._phys(entry, c), {}
                )[str(r["w"])] = r["word"] & _BLOOM_WORD_MASK
        recs = [
            {
                **rec,
                "bloom": {
                    **(rec.get("bloom") or {}),
                    **{
                        c: {"bits": bits, "hashes": hashes, "words": w}
                        for c, w in new_blooms.get(rec["path"], {}).items()
                    },
                },
            }
            for rec in files
        ]
        self._commit(
            {
                "operation": "bloom",
                "bloom_columns": list(cols),
                "files": recs,
                "partition_by": entry.get("partition_by") or [],
                "schema": entry["schema"],
                "num_files": len(recs),
                "added_files": 0,
            }
        )
        return self.latest_version()  # type: ignore[return-value]

    def update_where(
        self,
        filters: list[tuple[str, str, Any]],
        assignments: dict[str, Column],
        mode: str = "copy_on_write",
    ) -> int:
        """DML UPDATE: set ``assignments`` (col -> Column expression) on
        rows matching all ``filters``; same file pruning as delete.

        ``mode="merge_on_read"``: the old images are deletion-vectored and
        the reassigned images append as new files — write cost O(matched
        rows), not O(affected file bytes)."""
        if mode == "merge_on_read":
            return self._dml_merge_on_read(filters, assignments)
        if mode != "copy_on_write":
            raise ValueError(f"bad update mode: {mode!r}")
        entry = self._entry()
        partition_by: list[str] = entry.get("partition_by") or []
        keep_files, affected = self._split_files(entry, filters)
        df = (
            self._read_files_tracked(entry, affected)
            if entry.get("row_tracking")
            else self._read_files(entry, affected)
        )
        cond = _filters_expr(filters)
        schema = StructType.fromJson(entry["schema"])
        cdc_files = None
        if self.cdf_enabled():
            pre = df.filter(cond).drop(_ROW_ID)
            post = pre
            for col, expr in assignments.items():
                field = next(f for f in schema.fields if f.name == col)
                post = post.withColumn(col, expr.cast(field.dataType))
            cdc_files = self._write_cdc_dir(
                pre.withColumn(_CDC_COL, F.lit("update_preimage")).unionByName(
                    post.withColumn(_CDC_COL, F.lit("update_postimage"))
                )
            )
        for col, expr in assignments.items():
            field = next(f for f in schema.fields if f.name == col)
            df = df.withColumn(
                col, F.when(cond, expr.cast(field.dataType)).otherwise(F.col(col))
            )
        _dir, files = self._write_commit_dir(df, partition_by or None)
        self._commit(
            {
                "operation": "update",
                **({"cdc_files": cdc_files} if cdc_files is not None else {}),
                "files": keep_files + files,
                "partition_by": partition_by,
                "schema": entry["schema"],
                "num_files": len(keep_files) + len(files),
                "added_files": len(files),
                "skipped_files": len(keep_files),
            }
        )
        return self.latest_version()  # type: ignore[return-value]

    def merge_in_batches(
        self, source: DataFrame, keys: list[str], n_batches: int = 5
    ) -> list[int]:
        """Modulo-bucketed sequential merge (deltalake.ipynb:2937-2946):
        bounds any single merge's join working set; the reference added this
        after an un-batched 11M-row MERGE OOMed (:2217)."""
        bucket = F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(n_batches))
        src = source.withColumn("_mb", bucket).persist()
        try:
            versions = []
            for i in range(n_batches):
                batch = src.filter(F.col("_mb") == i).drop("_mb")
                versions.append(self.merge(batch, keys))
            return versions
        finally:
            src.unpersist()

    # ------------------------------------------------------------------ #
    # maintenance (M1-M4)
    # ------------------------------------------------------------------ #

    def set_clustering(self, cols: list[str] | None) -> int:
        """Liquid-clustering analog (Delta ``CLUSTER BY``): declare the
        table's clustering columns ONCE; every subsequent plain
        :meth:`optimize` call then clusters INCREMENTALLY — only files
        not yet clustered under the current column set (new appends,
        merge/DML output, DV-carrying files) are Z-ordered and tagged;
        files already carrying the tag carry over by reference.

        Why this matters at 100 TB: a classic ``optimize(zorder_by=...)``
        is a whole-table rewrite every time, so clustering debt grows
        with table size.  With declared clustering the rewrite cost of a
        maintenance pass is O(new data since the last pass), like Delta's
        liquid clustering.  The trade-off is also Delta's: each pass
        clusters the NEW files among themselves (bounds computed over the
        candidates), so old and new clusters interleave at file
        granularity until a ``optimize(full=True)`` re-clusters the whole
        table.  Data skipping still works throughout — it reads per-file
        min/max stats, which every pass produces.

        Composes with auto-compact: ``set_auto_compact`` + declared
        clustering gives cluster-on-write (each write's partitions are
        incrementally clustered once they cross the small-file
        threshold).  ``cols=None`` clears the declaration.  Metadata-only
        commit; rewriting a clustered file through merge/DML drops its
        tag, which is exactly what re-queues it for the next pass.
        """
        snap = self._entry()
        cols = list(cols or [])
        if cols:
            names = {f.name for f in self.schema().fields}
            missing = [c for c in cols if c not in names]
            if missing:
                raise ValueError(
                    f"clustering column(s) {missing} not in table schema"
                )
        return self._commit(
            {
                "operation": "set_clustering",
                "clustering_by": cols,
                "files": list(snap["files"]),
                "partition_by": snap.get("partition_by") or [],
                "schema": snap["schema"],
                "num_files": len(snap["files"]),
            }
        )

    def clustering(self) -> list[str]:
        """The declared clustering columns (empty if none)."""
        return list(self._entry().get("clustering_by") or [])

    def optimize(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        where: list[tuple[str, str, Any]] | None = None,
        full: bool = False,
    ) -> int:
        """Compaction (Delta ``optimize().executeCompaction()``,
        deltalake.ipynb:1336-1338) and data clustering (``executeZOrderBy``,
        :4614-4620).

        ``sort_by``: global range-sort — the strongest clustering for ONE
        leading column (plus prefix queries on the rest).

        ``zorder_by``: true multi-column Z-curve — each numeric column is
        linearly scaled to a 16-bit value over its [min, max] (one tiny agg
        job), the bits are interleaved into a single z-value, and the table
        is range-partitioned + sorted by it.  Every clustered column then
        gets selective per-file min/max stats, so filters on ANY of them
        skip files (the reference's measured 18-50% effect, :8354-8356) —
        the property linear sort only gives the leading column.

        ``where``: scope the rewrite to a file subset (Delta
        ``OPTIMIZE ... WHERE``) — same ``(col, op, literal)`` grammar as
        :meth:`scan`, matched against partition values and footer stats.
        Only possibly-matching files are read, rewritten, and replaced;
        everything else carries over untouched.  At 100 TB this is the
        difference between compacting yesterday's partition and rewriting
        the whole table.

        With clustering declared via :meth:`set_clustering`, a plain
        ``optimize()`` performs an INCREMENTAL clustering pass over the
        not-yet-clustered files only (see ``set_clustering``);
        ``full=True`` forces the whole scope through the rewrite.
        """
        if sort_by and zorder_by:
            raise ValueError("pass sort_by OR zorder_by, not both")
        entry = self._entry()
        partition_by: list[str] = entry.get("partition_by") or []
        if where:
            untouched, live = self._split_files(entry, where)
        else:
            untouched, live = [], entry["files"]
        clustering: list[str] = entry.get("clustering_by") or []
        cluster_key = ",".join(clustering)
        if clustering and not (sort_by or zorder_by):
            zorder_by = list(clustering)
            if not full:
                # liquid-style incremental pass: files already tagged with
                # the CURRENT clustering key (and carrying no DVs to
                # materialize) are done — carry them over by reference
                already = [
                    f
                    for f in live
                    if f.get("clustered") == cluster_key and not _rec_dvs(f)
                ]
                keep = {f["path"] for f in already}
                untouched = untouched + already
                live = [f for f in live if f["path"] not in keep]
        if not (sort_by or zorder_by):
            # plain compaction is BIN-PACKING, not a table rewrite: a file
            # already at/above target size (and carrying no deletion
            # vectors to materialize) is right-sized — rewriting it at
            # 100 TB is pure write amplification.  Delta OPTIMIZE skips
            # such files too.  Clustering passes (sort/zorder) still
            # rewrite their whole scope: layout is the point.
            right_sized = [
                f
                for f in live
                if f["size"] >= target_file_bytes and not _rec_dvs(f)
            ]
            if right_sized:
                untouched = untouched + right_sized
                keep = {f["path"] for f in right_sized}
                live = [f for f in live if f["path"] not in keep]
        if not live:
            return self.latest_version()  # type: ignore[return-value]
        df = (
            self._read_files_tracked(entry, live)
            if entry.get("row_tracking")
            else self._read_files(entry, live)
        )
        total = sum(f["size"] for f in live) or 1
        n_files = max(1, -(-total // target_file_bytes))
        if zorder_by:
            from pyspark.sql.types import (
                BooleanType,
                DateType,
                NumericType,
                TimestampType,
            )

            numeric: dict[str, Column] = {}
            for c in zorder_by:
                dt = df.schema[c].dataType
                from pyspark.sql.types import StringType

                if not isinstance(
                    dt,
                    (NumericType, DateType, TimestampType, BooleanType,
                     StringType),
                ):
                    raise ValueError(
                        f"zorder_by needs numeric/date/timestamp/boolean/"
                        f"string columns; {c!r} is {dt.simpleString()}"
                    )
                numeric[c] = _z_numeric(c, dt)
            str_cols = [
                c
                for c in zorder_by
                if isinstance(df.schema[c].dataType, StringType)
            ]
            if str_cols:
                # strip each string column's global common prefix before
                # projecting: one tiny min/max agg, then the projection
                # clusters on the bytes that actually distinguish keys
                mm = df.agg(
                    *[F.min(c).alias(f"_mn_{c}") for c in str_cols],
                    *[F.max(c).alias(f"_mx_{c}") for c in str_cols],
                ).first()
                for c in str_cols:
                    lo_s = (mm[f"_mn_{c}"] or "").encode("utf-8")
                    hi_s = (mm[f"_mx_{c}"] or "").encode("utf-8")
                    skip = len(os.path.commonprefix([lo_s, hi_s]))
                    numeric[c] = _z_string(c, skip)
            bounds = df.agg(
                *[F.min(numeric[c]).alias(f"_lo_{c}") for c in zorder_by],
                *[F.max(numeric[c]).alias(f"_hi_{c}") for c in zorder_by],
            ).first()
            zval = _zvalue_expr(
                {
                    c: (numeric[c], bounds[f"_lo_{c}"], bounds[f"_hi_{c}"])
                    for c in zorder_by
                }
            )
            df = (
                df.withColumn("_z", zval)
                .repartitionByRange(n_files, F.col("_z"))
                .sortWithinPartitions("_z")
                .drop("_z")
            )
        elif sort_by:
            df = df.repartitionByRange(n_files, *[F.col(c) for c in sort_by])
            df = df.sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(n_files) if n_files < len(live) else df
        _dir, files = self._write_commit_dir(df, partition_by or None)
        if clustering and zorder_by == clustering:
            # mark the rewrite's output as clustered under the current key
            # so the next incremental pass skips it (a later merge/DML
            # rewrite produces untagged records, re-queueing those rows)
            for rec in files:
                rec["clustered"] = cluster_key
        all_files = untouched + files
        self._commit(
            {
                "operation": "zorder" if (sort_by or zorder_by) else "optimize",
                "files": all_files,
                "partition_by": partition_by,
                "schema": entry["schema"],
                "num_files": len(all_files),
                "added_files": len(files),
                "sort_by": sort_by or [],
                "zorder_by": zorder_by or [],
                **({"where": [list(f) for f in where]} if where else {}),
            }
        )
        return self.latest_version()  # type: ignore[return-value]

    def _commit_diff(
        self, version: int
    ) -> tuple[list[dict[str, Any]], list[str]]:
        """(added file records, removed paths) for one commit — straight
        from the delta entry, or a snapshot diff for legacy full entries."""
        raw = self._raw_entry(version)
        if "files" not in raw:
            return raw.get("add", []), raw.get("remove", [])
        prev = (
            {f["path"] for f in self._entry(version - 1)["files"]}
            if version > 0
            else set()
        )
        new_paths = {f["path"] for f in raw["files"]}
        add = [f for f in raw["files"] if f["path"] not in prev]
        return add, sorted(prev - new_paths)

    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        include_change_type: bool = False,
    ) -> DataFrame:
        """Change-Data-Feed analog: rows changed after ``from_version`` up
        to ``to_version`` (latest by default), driven purely by the commit
        log's add/remove actions — no data rewrite, no extra storage.

        Compaction-only commits (``optimize``/``zorder``) are skipped:
        they rewrite files without a logical change, so they surface
        nothing (Delta CDF emits nothing for OPTIMIZE either).

        Default output: the union of each non-compaction commit's added
        rows.  Appends are exact; merge/overwrite/delete/update commits
        surface the POST-IMAGE of every row in their rewritten scope
        (like Delta CDF's update_postimage) — downstream idempotent
        merges (the engine's own sink pattern) absorb this correctly.

        ``include_change_type=True`` adds a ``_change_type`` column and
        additionally surfaces DELETED rows: for each commit, rows present
        in its removed files but absent from its added files
        (``exceptAll`` over the rewritten scope only) come back tagged
        ``delete`` — these are pre-images, so an updated row appears as a
        ``delete`` pre-image plus an ``insert`` post-image, standard CDC
        shape.  Pre-images (and insert images carried across a later
        compaction) require the original files to still exist — i.e.
        ``vacuum`` must not have reclaimed the range being read.
        """
        if to_version is None:
            to_version = self.latest_version() or 0
        target = self._entry(to_version)
        # `current`: files added by non-compaction commits whose rows are
        # still the latest image.  A later NON-compaction commit removing
        # such a file post-images its surviving rows in its own adds, so
        # the file drops out; a COMPACTION removing it preserves content
        # (the original file stays readable until vacuum), so it stays —
        # that is what makes a trailing OPTIMIZE emit nothing while the
        # pre-compaction changes still surface.  The one ambiguous case:
        # a non-compaction commit rewriting a compaction OUTPUT produced
        # inside the range (file identity lost across the compaction) —
        # degrade to the plain post-image diff vs the base snapshot, which
        # is always sound but also surfaces rewritten-unchanged rows
        # (idempotent consumers absorb them).
        current: dict[str, dict[str, Any]] = {}
        compaction_outputs: set[str] = set()
        degraded = False
        delete_frames: list[DataFrame] = []
        for v in range(from_version + 1, to_version + 1):
            raw = self._raw_entry(v)
            add, removed = self._commit_diff(v)
            if raw.get("operation") == "bloom":
                # metadata-only: same paths, same content — nothing to
                # surface, and no file-identity change to track
                continue
            if raw.get("operation") in ("optimize", "zorder"):
                compaction_outputs.update(rec["path"] for rec in add)
                continue
            if any(p in compaction_outputs for p in removed):
                degraded = True
            for p in removed:
                current.pop(p, None)
            for rec in add:
                current[rec["path"]] = rec
            if (
                include_change_type
                and raw.get("mode") == "merge_on_read"
                and raw.get("dv_scope")
            ):
                # merge-on-read DML removes no files — the pre-images are
                # the rows its new deletion vectors subtract: read the
                # scoped files as-of v-1 (old DVs) and as-of v (old+new
                # DVs); the difference is exactly the newly deleted rows.
                scope = set(raw["dv_scope"])
                prev_entry = self._entry(v - 1)
                this_entry = self._entry(v)
                pre_recs = [
                    f for f in prev_entry["files"] if f["path"] in scope
                ]
                post_recs = [
                    f for f in this_entry["files"] if f["path"] in scope
                ]
                self._require_files_exist(
                    pre_recs + post_recs,
                    f"change feed (DV pre-images at v{v})",
                )
                pre = self._read_files(
                    {**prev_entry, "schema": this_entry["schema"]}, pre_recs
                )
                post = self._read_files(this_entry, post_recs)
                delete_frames.append(pre.exceptAll(post))
            if include_change_type and removed:
                prev_entry = self._entry(v - 1)
                rm_recs = [
                    f for f in prev_entry["files"] if f["path"] in set(removed)
                ]
                this_entry = self._entry(v)
                # Pre-images are read under THIS commit's schema, not the
                # previous one's: a schema-evolving merge would otherwise
                # feed exceptAll two different column sets. Old files
                # null-fill evolved columns (schema-on-read), which is also
                # the correct CDC rendering of a pre-evolution pre-image.
                self._require_files_exist(
                    rm_recs + list(add), f"change feed (pre-images at v{v})"
                )
                pre = self._read_files(
                    {**prev_entry, "schema": this_entry["schema"]}, rm_recs
                )
                post = self._read_files(this_entry, add)
                delete_frames.append(pre.exceptAll(post))
        if degraded:
            base = {f["path"] for f in self._entry(from_version)["files"]}
            add_recs = [f for f in target["files"] if f["path"] not in base]
        else:
            add_recs = list(current.values())
        self._require_files_exist(
            add_recs, f"change feed (versions {from_version + 1}..{to_version})"
        )
        out = self._read_files(target, add_recs)
        if not include_change_type:
            return out
        out = out.withColumn("_change_type", F.lit("insert"))
        for d in delete_frames:
            # allowMissingColumns: a pre-image from before a schema
            # evolution lacks the later columns — they come back null
            out = out.unionByName(
                d.withColumn("_change_type", F.lit("delete")),
                allowMissingColumns=True,
            )
        return out

    def signed_changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Exact NET multiset delta between two snapshots, as rows tagged
        ``_sign`` (+1 added / -1 removed), computed per-commit from the
        log's add/remove scopes — the additive counterpart of
        :meth:`changes`.

        For every ABELIAN-GROUP aggregate (count, sum — anything with an
        inverse), ``agg(sign * x)`` over this frame equals
        ``agg(x) @ to_version - agg(x) @ from_version``: a rewritten-but-
        unchanged row appears once with each sign and cancels in the sum,
        a genuine insert/delete/update contributes its exact delta.  This
        is what incremental materialized-view maintenance consumes
        (:mod:`delta_lake_spark.tables.matview`); ``changes()`` stays the
        right feed for idempotent row-level consumers.

        IO is bounded by each commit's REWRITTEN scope (compaction commits
        are skipped — content-preserving, provably net zero), so an
        append-mostly history costs the appended files only, never a full
        snapshot diff.  Merge-on-read DML is handled snapshot-correctly:
        the pre side reads the scoped files under the old deletion
        vectors, the post side under the new, so only the DV'd rows
        survive cancellation.
        """
        if to_version is None:
            to_version = self.latest_version() or 0
        plus_frames: list[DataFrame] = []
        minus_frames: list[DataFrame] = []
        for v in range(from_version + 1, to_version + 1):
            raw = self._raw_entry(v)
            if raw.get("operation") in ("optimize", "zorder", "bloom"):
                continue
            add, removed = self._commit_diff(v)
            scope = {rec["path"] for rec in add} | set(removed)
            if not scope:
                continue
            prev_entry = self._entry(v - 1)
            this_entry = self._entry(v)
            pre_recs = [f for f in prev_entry["files"] if f["path"] in scope]
            post_recs = [f for f in this_entry["files"] if f["path"] in scope]
            self._require_files_exist(
                pre_recs + post_recs, f"signed changes (v{v})"
            )
            # pre-images read under the later schema (evolved columns
            # null-fill), mirroring changes()
            if post_recs:
                plus_frames.append(self._read_files(this_entry, post_recs))
            if pre_recs:
                minus_frames.append(
                    self._read_files(
                        {**prev_entry, "schema": this_entry["schema"]},
                        pre_recs,
                    )
                )
        schema_entry = self._entry(to_version)
        out = self._read_files(schema_entry, []).withColumn(
            "_sign", F.lit(0).cast("int")
        )
        for d in plus_frames:
            out = out.unionByName(
                d.withColumn("_sign", F.lit(1).cast("int")),
                allowMissingColumns=True,
            )
        for d in minus_frames:
            out = out.unionByName(
                d.withColumn("_sign", F.lit(-1).cast("int")),
                allowMissingColumns=True,
            )
        return out

    # ------------------------------------------------------------------ #
    # materialized Change Data Feed (delta.enableChangeDataFeed analog)
    # ------------------------------------------------------------------ #

    def cdf_enabled(self, version: int | None = None) -> bool:
        """Whether the CDF table property is on (as of ``version``).
        Metadata-only — safe in SparkSession-less contexts (stream
        workers)."""
        if self.latest_version() is None:
            return False
        return bool(self._entry(version).get("cdf"))

    def enable_cdf(self) -> int:
        """Turn on materialized change data (Delta ``ALTER TABLE ... SET
        TBLPROPERTIES (delta.enableChangeDataFeed = true)``).  From the
        NEXT commit on, DML delete/update and MERGE write their exact
        changed rows as ``-cdc-`` sidecars; :meth:`change_feed` (and the
        streaming source's ``readChangeFeed``) then serve exact per-commit
        CDC without diff computation.  Commits from before the property
        was set have no sidecars — ``change_feed`` refuses them
        (``changes()`` remains the computed-diff fallback)."""
        snap = self._entry()
        schema = StructType.fromJson(snap["schema"])
        clash = {_CDC_COL, _CDC_VER} & {f.name for f in schema.fields}
        if clash:
            raise ValueError(f"CDF reserves column names {sorted(clash)}")
        return self._commit(
            {
                "operation": "set_cdf",
                "cdf": True,
                "files": list(snap["files"]),
                "partition_by": snap.get("partition_by") or [],
                "schema": snap["schema"],
                "num_files": len(snap["files"]),
            }
        )

    def disable_cdf(self) -> int:
        snap = self._entry()
        return self._commit(
            {
                "operation": "set_cdf",
                "cdf": False,
                "files": list(snap["files"]),
                "partition_by": snap.get("partition_by") or [],
                "schema": snap["schema"],
                "num_files": len(snap["files"]),
            }
        )

    def _write_cdc_dir(self, cdc_df: DataFrame) -> list[str]:
        """Distributed write of one commit's change-data sidecar (all table
        columns + ``_change_type``); returns table-relative parquet paths."""
        latest = self.latest_version()
        commit_dir = (
            f"c{(0 if latest is None else latest + 1):06d}"
            f"-cdc-{uuid.uuid4().hex[:8]}"
        )
        out = os.path.join(self.path, commit_dir)
        cdc_df.write.mode("errorifexists").parquet(out)
        return sorted(
            os.path.relpath(os.path.join(dirpath, name), self.path)
            for dirpath, _dirs, names in os.walk(out)
            for name in names
            if name.endswith(".parquet")
        )

    def _merge_cdc(
        self,
        target: DataFrame,
        src: DataFrame,
        keys: list[str],
        table_cols: list[str],
        schema: StructType,
        when_matched: str,
        when_not_matched: str,
        matched_condition: "Column | str | None",
        update_set: "dict[str, Column | str] | None",
        not_matched_condition: "Column | str | None",
    ) -> DataFrame:
        """The exact CDC rows of one MERGE, mirroring the clause logic of
        :meth:`_conditional_merge_plan`: matched-and-clause-applied rows
        emit delete or update pre+post images, qualifying unmatched source
        rows emit inserts.  Built on the same key equi-join family as the
        merge itself (broadcast with a small source)."""

        def as_col(e: "Column | str") -> Column:
            return F.expr(e) if isinstance(e, str) else e

        t, s = target.alias("t"), src.alias("s")
        join_cond = None
        for k in keys:
            c = F.col(f"t.{k}") == F.col(f"s.{k}")
            join_cond = c if join_cond is None else (join_cond & c)
        matched = t.join(s, join_cond, "inner")
        if matched_condition is not None:
            matched = matched.filter(as_col(matched_condition))
        t_cols = [F.col(f"t.{c}").alias(c) for c in table_cols]
        s_cols = [
            F.col(f"s.{c}").cast(schema[c].dataType).alias(c)
            for c in table_cols
        ]
        frames: list[DataFrame] = []
        if when_matched == "delete":
            frames.append(
                matched.select(*t_cols).withColumn(_CDC_COL, F.lit("delete"))
            )
        elif when_matched == "update_all" and update_set:
            out_cols = [
                (
                    as_col(update_set[c]) if c in update_set else F.col(f"t.{c}")
                ).cast(schema[c].dataType).alias(c)
                for c in table_cols
            ]
            frames.append(
                matched.select(*t_cols).withColumn(
                    _CDC_COL, F.lit("update_preimage")
                )
            )
            frames.append(
                matched.select(*out_cols).withColumn(
                    _CDC_COL, F.lit("update_postimage")
                )
            )
        elif when_matched == "update_all":
            frames.append(
                matched.select(*t_cols).withColumn(
                    _CDC_COL, F.lit("update_preimage")
                )
            )
            frames.append(
                matched.select(*s_cols).withColumn(
                    _CDC_COL, F.lit("update_postimage")
                )
            )
        # when_matched == "ignore": matched rows are untouched, no CDC
        if when_not_matched == "insert_all":
            ins = src.join(target, keys, "left_anti").alias("s")
            if not_matched_condition is not None:
                ins = ins.filter(as_col(not_matched_condition))
            frames.append(
                ins.select(*s_cols).withColumn(_CDC_COL, F.lit("insert"))
            )
        if not frames:
            return (
                src.alias("s")
                .limit(0)
                .select(*s_cols)
                .withColumn(_CDC_COL, F.lit("insert"))
            )
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf)
        return out

    def change_feed(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Exact Change-Data-Feed read over ``(from_version, to_version]``
        (Delta ``spark.read.option("readChangeFeed", ...)`` /
        ``table_changes`` analog): every row change tagged ``insert`` /
        ``delete`` / ``update_preimage`` / ``update_postimage`` plus a
        ``_commit_version`` column.

        Append commits synthesize inserts from their add actions and
        overwrites synthesize delete pre-images + inserts from their
        remove/add actions (no sidecar storage, exactly as Delta);
        delete/update/merge commits read the exact ``-cdc-`` sidecars
        they materialized — which requires :meth:`enable_cdf` to have been
        on when they ran.  Compaction / Z-order / bloom / metadata commits
        surface nothing.  ``changes()`` remains the computed-diff feed for
        tables without the property."""
        if to_version is None:
            to_version = self.latest_version() or 0
        frames: list[DataFrame] = []
        for v in range(from_version + 1, to_version + 1):
            raw = self._raw_entry(v)
            op = raw.get("operation")
            add = raw.get("add") or []
            removed = raw.get("remove") or []
            if op in ("optimize", "zorder", "bloom") or not (add or removed):
                continue
            entry_v = self._entry(v)
            ver = F.lit(v).cast("long")
            if op in ("append", "streaming_append", "clone", "convert"):
                self._require_files_exist(add, f"change feed (inserts at v{v})")
                frames.append(
                    self._read_files(entry_v, add)
                    .withColumn(_CDC_COL, F.lit("insert"))
                    .withColumn(_CDC_VER, ver)
                )
            elif op == "overwrite":
                if v > 0 and removed:
                    prev = self._entry(v - 1)
                    rm_recs = [
                        f for f in prev["files"] if f["path"] in set(removed)
                    ]
                    self._require_files_exist(
                        rm_recs, f"change feed (overwrite pre-images at v{v})"
                    )
                    frames.append(
                        self._read_files(
                            {**prev, "schema": entry_v["schema"]}, rm_recs
                        )
                        .withColumn(_CDC_COL, F.lit("delete"))
                        .withColumn(_CDC_VER, ver)
                    )
                self._require_files_exist(add, f"change feed (inserts at v{v})")
                frames.append(
                    self._read_files(entry_v, add)
                    .withColumn(_CDC_COL, F.lit("insert"))
                    .withColumn(_CDC_VER, ver)
                )
            elif op in ("delete", "update", "merge"):
                cdc = raw.get("cdc_files")
                if cdc is None:
                    raise ValueError(
                        f"version {v} ({op}) carries no materialized change "
                        "data — enable_cdf() must be on when DML runs; use "
                        "changes() for computed CDC over this range"
                    )
                missing = [
                    p for p in cdc
                    if not os.path.exists(os.path.join(self.path, p))
                ]
                if missing:
                    raise VacuumedVersionError(
                        f"change-data files of version {v} were vacuumed: "
                        f"{missing[:3]}{'...' if len(missing) > 3 else ''}"
                    )
                if cdc:
                    frames.append(
                        self.spark.read.parquet(
                            *[os.path.join(self.path, p) for p in cdc]
                        ).withColumn(_CDC_VER, ver)
                    )
            else:
                raise ValueError(
                    f"change_feed does not cover operation {op!r} (v{v}); "
                    "use changes() for the computed diff"
                )
        base = (
            self._read_files(self._entry(to_version), [])
            .withColumn(_CDC_COL, F.lit("insert"))
            .withColumn(_CDC_VER, F.lit(0).cast("long"))
            .limit(0)
        )
        out = base
        for fdf in frames:
            out = out.unionByName(fdf, allowMissingColumns=True)
        return out

    # ------------------------------------------------------------------ #
    # row tracking (delta.enableRowTracking analog)
    # ------------------------------------------------------------------ #

    def row_tracking_enabled(self, version: int | None = None) -> bool:
        if self.latest_version() is None:
            return False
        return bool(self._entry(version).get("row_tracking"))

    def enable_row_tracking(self) -> int:
        """Turn on stable row ids (Delta ``delta.enableRowTracking``).
        Backfills a ``base_row_id`` for every EXISTING file (metadata-only:
        one footer num_rows read per file, no data rewrite); from then on
        every commit assigns new files their base, and rewrites materialize
        ids so they survive compaction, clustering, and DML.  Read them
        with :meth:`read_with_row_ids`."""
        import pyarrow.parquet as pq

        snap = self._entry()
        schema = StructType.fromJson(snap["schema"])
        if _ROW_ID in {f.name for f in schema.fields}:
            raise ValueError(f"row tracking reserves column name {_ROW_ID!r}")
        hwm = 0
        files = []
        for rec in snap["files"]:
            rec = dict(rec)
            if "base_row_id" not in rec:
                rec["base_row_id"] = hwm
                hwm += pq.ParquetFile(
                    os.path.join(self.path, rec["path"])
                ).metadata.num_rows
            else:  # re-enable after disable: keep existing bases
                hwm = max(
                    hwm,
                    rec["base_row_id"]
                    + pq.ParquetFile(
                        os.path.join(self.path, rec["path"])
                    ).metadata.num_rows,
                )
            files.append(rec)
        return self._commit(
            {
                "operation": "set_row_tracking",
                "row_tracking": True,
                "row_id_hwm": max(hwm, int(snap.get("row_id_hwm") or 0)),
                "files": files,
                "partition_by": snap.get("partition_by") or [],
                "schema": snap["schema"],
                "num_files": len(files),
            }
        )

    def _read_files_tracked(
        self,
        entry: dict[str, Any],
        files: list[dict[str, Any]],
        with_pos: bool = False,
    ) -> DataFrame:
        """Rows of ``files`` with the stable ``_row_id`` column resolved:
        the materialized value when the file carries one (a rewrite
        output), else ``base_row_id + row_index`` (a fresh file).  The
        base lookup is a broadcast join against a files-count-sized frame;
        merge-on-read deletes keep surviving rows' original indexes, so
        ids hold with no special casing."""
        from pyspark.sql.types import LongType, StructField

        missing = [f["path"] for f in files if "base_row_id" not in f]
        if missing:
            raise ValueError(
                f"files without a row-id base (written before "
                f"enable_row_tracking?): {missing[:3]}"
            )
        df = self._read_files(
            entry,
            files,
            with_pos=True,
            extra_fields=[StructField(_ROW_ID, LongType())],
        )
        if not files:
            return df if with_pos else df.drop(_DV_FILE, _DV_POS)
        base = self.spark.createDataFrame(
            [(f["path"], int(f["base_row_id"])) for f in files],
            f"`{_DV_FILE}` string, `_rt_base` long",
        )
        out = (
            df.join(F.broadcast(base), _DV_FILE, "left")
            .withColumn(
                _ROW_ID,
                F.coalesce(F.col(_ROW_ID), F.col("_rt_base") + F.col(_DV_POS)),
            )
            .drop("_rt_base")
        )
        return out if with_pos else out.drop(_DV_FILE, _DV_POS)

    def read_with_row_ids(self, version: int | None = None) -> DataFrame:
        """Snapshot read (time-travel capable) with the stable ``_row_id``
        column appended."""
        entry = self._entry(version)
        if not entry.get("row_tracking"):
            raise ValueError(
                "row tracking is not enabled (as of this version); call "
                "enable_row_tracking() first"
            )
        self._check_time_travel_files(entry, version)
        return self._read_files_tracked(entry, entry["files"])

    # ------------------------------------------------------------------ #
    # auto-compaction / optimized writes (delta.autoOptimize analog)
    # ------------------------------------------------------------------ #

    def set_auto_compact(
        self,
        min_files: int = 8,
        min_file_bytes: int = 32 * 1024 * 1024,
        enabled: bool = True,
    ) -> int:
        """Table property: after each batch write, any partition this
        commit touched (the whole table when unpartitioned) that has
        accumulated ``min_files`` or more data files smaller than
        ``min_file_bytes`` is compacted in place with a partition-scoped
        OPTIMIZE (Delta ``delta.autoOptimize.autoCompact``).  Solves the
        streaming/micro-append small-file problem without a scheduled
        maintenance job; the compaction commit is ``optimize``-tagged, so
        change feeds and streams ignore it."""
        if min_files < 2:
            raise ValueError(f"min_files must be >= 2, got {min_files}")
        snap = self._entry()
        return self._commit(
            {
                "operation": "set_auto_compact",
                "auto_compact": (
                    {"min_files": min_files, "min_file_bytes": min_file_bytes}
                    if enabled
                    else False
                ),
                "files": list(snap["files"]),
                "partition_by": snap.get("partition_by") or [],
                "schema": snap["schema"],
                "num_files": len(snap["files"]),
            }
        )

    def set_optimize_write(self, enabled: bool = True) -> int:
        """Table property (Delta ``delta.autoOptimize.optimizeWrite``):
        partitioned writes shuffle rows to their target partition first, so
        each partition value lands as one right-sized file per commit
        instead of one shard per upstream task."""
        snap = self._entry()
        return self._commit(
            {
                "operation": "set_optimize_write",
                "optimize_write": enabled,
                "files": list(snap["files"]),
                "partition_by": snap.get("partition_by") or [],
                "schema": snap["schema"],
                "num_files": len(snap["files"]),
            }
        )

    def _maybe_auto_compact(self, new_files: list[dict[str, Any]]) -> None:
        """Post-write hook: partition-scoped compaction of every touched
        partition that crossed the small-file threshold.  Best-effort — a
        lost compaction race is silently skipped (the data write itself is
        already durable), exactly Delta's auto-compact contract."""
        entry = self._entry()
        cfg = entry.get("auto_compact")
        if not cfg:
            return
        min_files = int(cfg["min_files"])
        min_bytes = int(cfg["min_file_bytes"])
        pcols = entry.get("partition_by") or []
        touched = {tuple(sorted((f.get("partition") or {}).items())) for f in new_files}
        for part in touched:
            part_d = dict(part)
            in_scope = [
                f
                for f in entry["files"]
                if all((f.get("partition") or {}).get(k) == v for k, v in part)
            ]
            small = [f for f in in_scope if f["size"] < min_bytes]
            if len(small) < min_files:
                continue
            where = [
                (k, "=", _dir_value_str(v))
                for k, v in part_d.items()
                if k in pcols and _dir_value_str(v) is not None
            ]
            try:
                self.optimize(
                    target_file_bytes=max(min_bytes, 1), where=where or None
                )
            except ConcurrentWriteError:
                return  # another writer advanced the table; their problem now

    def create_view(self, name: str, version: int | None = None) -> None:
        """Register the (time-travel) snapshot for ``spark.sql`` access —
        the engine's analog of the reference's
        ``CREATE TABLE ... USING DELTA LOCATION ...`` metastore registration
        (deltalake.ipynb:1046-1060; SURVEY.md §2.1 K8)."""
        self.read(version).createOrReplaceTempView(name)

    def history(self) -> list[dict[str, Any]]:
        """Commit history, latest first (Delta ``history()``,
        deltalake.ipynb:8760)."""
        out = []
        for v in reversed(self._versions()):
            e = self._raw_entry(v)  # metadata only — no snapshot replay
            out.append(
                {
                    "version": e["version"],
                    "operation": e["operation"],
                    "timestamp": e["timestamp"],
                    "num_files": e.get("num_files"),
                    "added_files": e.get("added_files"),
                    **(
                        {"operation_metrics": e["operation_metrics"]}
                        if e.get("operation_metrics") is not None
                        else {}
                    ),
                }
            )
        return out

    def properties(self, version: int | None = None) -> dict[str, Any]:
        """``SHOW TBLPROPERTIES`` analog: every table-level property the
        engine carries across commits, in one introspectable dict."""
        e = self._entry(version)
        return {
            "cdf": bool(e.get("cdf")),
            "row_tracking": bool(e.get("row_tracking")),
            "auto_compact": e.get("auto_compact") or False,
            "optimize_write": bool(e.get("optimize_write")),
            "column_mapping": dict(e.get("column_mapping") or {}),
            "constraints": dict(e.get("constraints") or {}),
            "generated_columns": dict(e.get("generated") or {}),
            "identity_columns": dict(e.get("identity") or {}),
            "partition_by": list(e.get("partition_by") or []),
            "stats_as_of_version": (e.get("stats") or {}).get("as_of_version"),
            "clustering_by": list(e.get("clustering_by") or []),
            "user": dict(e.get("user_props") or {}),
        }

    def detail(self) -> dict[str, Any]:
        """``DESCRIBE DETAIL`` analog (deltalake.ipynb:8607-8613)."""
        e = self._entry()
        return {
            "location": self.path,
            "version": e["version"],
            "num_files": len(e["files"]),
            "size_bytes": sum(f["size"] for f in e["files"]),
            "partition_columns": e.get("partition_by") or [],
            "schema": self.schema().simpleString(),
            "num_deleted_rows": sum(f.get("dv_rows", 0) for f in e["files"]),
            "num_dv_files": len(
                {dv for f in e["files"] for dv in _rec_dvs(f)}
            ),
        }

    def analyze(
        self, cols: list[str] | None = None, exact_distinct: bool = True
    ) -> int:
        """``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` analog:
        one distributed pass (quality.profile — a single wide aggregate,
        one scan regardless of column count) computes live row count plus
        per-column null count / NDV / min / max, committed as a
        METADATA-ONLY log entry (no data files touched, invisible to
        change feeds and streaming sources, like bloom commits).

        The stats dict records ``as_of_version`` so readers can judge
        staleness; it is carried across subsequent commits until the next
        ``analyze`` refreshes it.  ``exact_distinct=False`` switches NDV
        to HLL++ ``approx_count_distinct`` — the 100-TB-sane default for
        very wide tables (stats feed planning heuristics, which tolerate
        approximate NDV; Spark's own ANALYZE collects approximate NDV).

        Reads are DV-aware (merge-on-read deletes excluded), so
        ``n_rows`` is the live row count, matching what queries see.
        """
        from delta_lake_spark.quality import profile as profile_columns

        snap = self._entry()
        rows = profile_columns(
            self.read(), cols=cols, exact_distinct=exact_distinct
        ).collect()  # metadata-sized: one row per profiled column
        stats = {
            "as_of_version": snap["version"],
            "n_rows": int(rows[0]["n_rows"]) if rows else 0,
            "size_bytes": sum(f["size"] for f in snap["files"]),
            "exact_distinct": bool(exact_distinct),
            "columns": {
                r["column_name"]: {
                    "data_type": r["data_type"],
                    "n_nulls": int(r["n_nulls"]),
                    "n_distinct": int(r["n_distinct"]),
                    "min": r["min_num"] if r["min_num"] is not None else r["min_str"],
                    "max": r["max_num"] if r["max_num"] is not None else r["max_str"],
                }
                for r in rows
            },
        }
        return self._commit(
            {
                "operation": "analyze",
                "stats": stats,
                "files": list(snap["files"]),
                "partition_by": snap.get("partition_by") or [],
                "schema": snap["schema"],
                "num_files": len(snap["files"]),
            }
        )

    def statistics(self, version: int | None = None) -> dict[str, Any] | None:
        """Table statistics from the most recent ``analyze()`` at or before
        ``version`` (carried through the log), or None if never analyzed.
        Adds ``commits_since_analyze`` so planners can judge staleness."""
        e = self._entry(version)
        s = e.get("stats")
        if not s:
            return None
        out = dict(s)
        out["commits_since_analyze"] = e["version"] - s["as_of_version"]
        return out

    def count_rows(self, version: "int | str | None" = None) -> int:
        """Exact ``SELECT COUNT(*)`` from LOG METADATA — no data scan.

        Delta's OptimizeMetadataOnlyQuery analog: every commit records each
        file's footer ``rows`` (one metadata read at write time, alongside
        the skipping stats), and merge-on-read DML records per-file
        ``dv_rows``; the live count is their difference summed over the
        snapshot.  Files from pre-feature commits lack ``rows`` and fall
        back to one pooled footer read each (self-healing on the next
        rewrite).  Time-travel capable (version or tag name)."""
        entry = self._entry(version)
        self._check_time_travel_files(entry, version)
        missing = [f for f in entry["files"] if "rows" not in f]
        extra = 0
        if missing:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(32, len(missing))) as pool:
                ns = list(
                    pool.map(
                        lambda f: _footer_meta(os.path.join(self.path, f["path"]))[1],
                        missing,
                    )
                )
            unreadable = [f["path"] for f, n in zip(missing, ns) if n is None]
            if unreadable:
                # An unreadable footer means the file itself is unreadable —
                # treating it as 0 rows would silently undercount the table
                # (ADVICE r4).  Surface it instead.
                raise IOError(
                    f"count_rows: cannot read parquet footer for "
                    f"{len(unreadable)} file(s) lacking logged 'rows' "
                    f"(first: {unreadable[0]}); refusing to undercount"
                )
            extra = sum(ns)
        return (
            sum(f["rows"] - f.get("dv_rows", 0) for f in entry["files"] if "rows" in f)
            + extra
            - sum(f.get("dv_rows", 0) for f in missing)
        )

    def show_partitions(self, version: "int | str | None" = None) -> DataFrame:
        """``SHOW PARTITIONS`` analog (Spark's OptimizeMetadataOnlyQuery,
        Delta's partition listing): the distinct live partition values of a
        snapshot, from LOG METADATA only — no data-file scan.

        Partition-only DISTINCTs (e.g. an incremental save's "which dates
        already exist" anti-join build side) should come from here: the
        data-scan version schedules one read per live file for an answer
        the log already holds — at a 1,400-date daily mart that is 1,400
        single-row file reads, and at 100 TB it is the whole table.
        Values are cast to the table schema's column types; Hive
        default-partition markers read back as NULL.  Capped at
        ``_PARTITION_DISCOVERY_CAP`` distinct values like every other
        partition-metadata read (past that, the layout is the bug).

        Deletion-vector awareness (ADVICE r5): a file whose rows are ALL
        masked by a merge-on-read deletion vector (``dv_rows == rows``)
        contributes no live rows, so it does not witness its partition —
        matching ``count_rows``'s DV-aware semantics.  A partition is
        listed iff at least one of its files still has unmasked rows (an
        anti-join built on this listing therefore correctly re-appends
        data for a fully-DV-deleted partition).

        Partition-evolution safety (r6 audit): a file written under an
        OLDER spec that lacks one of the current partition columns holds
        rows whose values for that column are UNKNOWN to the log — listing
        them as NULL would let a metadata anti-join re-append data those
        files already hold (and eqNullSafe-match genuinely-NULL fresh
        rows).  Metadata cannot answer for such snapshots, so this raises;
        use ``read().select(partition cols).distinct()`` (a data scan)
        until the legacy files are rewritten under the current spec
        (e.g. ``rewrite_partitions`` / OPTIMIZE migration)."""
        from urllib.parse import unquote

        from pyspark.sql.types import StringType

        entry = self._entry(version)
        pb = entry.get("partition_by") or []
        if not pb:
            raise ValueError("show_partitions: table is not partitioned")
        live = [
            f
            for f in entry["files"]
            if not ("rows" in f and f.get("dv_rows", 0) >= f["rows"])
        ]
        legacy = [
            f for f in live if not set(pb) <= set(f.get("partition") or {})
        ]
        if legacy:
            raise ValueError(
                f"show_partitions: {len(legacy)} live file(s) predate the "
                f"current partition spec {pb} (partition evolution) — their "
                f"values for the new column(s) are unknown to the log, so a "
                f"metadata-only listing would be wrong; data-scan instead: "
                f"read().select({pb!r}).distinct()"
            )
        seen = {tuple(f["partition"].get(c) for c in pb) for f in live}
        if len(seen) > _PARTITION_DISCOVERY_CAP:
            raise ValueError(
                f"show_partitions: {len(seen)} distinct partition values "
                f"exceeds the {_PARTITION_DISCOVERY_CAP} metadata cap"
            )

        def _decode(v: "str | None") -> "str | None":
            if v is None or v == "__HIVE_DEFAULT_PARTITION__":
                return None
            return unquote(v)

        rows = sorted(
            (tuple(_decode(v) for v in t) for t in seen),
            key=lambda t: tuple("" if v is None else v for v in t),
        )
        types = {
            f.name: f.dataType
            for f in StructType.fromJson(entry["schema"]).fields
        }
        raw = self.spark.createDataFrame(
            rows, StructType([StructField(c, StringType(), True) for c in pb])
        )
        return raw.select(*[F.col(c).cast(types[c]).alias(c) for c in pb])

    def set_property(self, key: str, value: "str | None") -> int:
        """Generic user table property (``ALTER TABLE ... SET TBLPROPERTIES``
        analog): free-form string metadata carried across commits and
        surfaced by :meth:`properties` under ``"user"`` — owner, SLA tier,
        pipeline provenance, retention policy tags.  ``value=None``
        unsets.  Engine-reserved behaviors (CDF, clustering, ...) have
        their own typed setters; this namespace never changes semantics.
        Metadata-only commit, versioned like everything else."""
        snap = self._entry()
        props = dict(snap.get("user_props") or {})
        if value is None:
            props.pop(key, None)
        else:
            props[key] = str(value)
        return self._commit(
            {
                "operation": "set_property",
                "user_props": props,
                "files": list(snap["files"]),
                "partition_by": snap.get("partition_by") or [],
                "schema": snap["schema"],
                "num_files": len(snap["files"]),
            }
        )

    def set_partitioning(self, cols: list[str] | None) -> int:
        """Iceberg-style PARTITION EVOLUTION: change the partition spec
        for FUTURE writes without rewriting any history.

        Existing files keep their old Hive layout and still prune by
        their recorded per-file partition values and footer stats;
        subsequent appends, merge/DML rewrite output, OPTIMIZE passes,
        and streaming-sink commits adopt the new spec — so the table
        migrates to the new layout incrementally, exactly as fast as its
        data naturally rewrites (or in one shot via ``optimize(full=True)``
        with clustering / a plain compaction).

        Why this matters at 100 TB: the classic Delta answer to "we
        partitioned by day but need country" is a full-table rewrite.
        Evolution makes the spec a metadata flip: reads already union
        per-commit file groups under an explicit schema, so mixed layouts
        coexist; a filter on the NEW spec prunes new files by partition
        value and old files by column stats, converging as data churns.

        Metadata-only commit (invisible to change feeds and streams).
        """
        snap = self._entry()
        cols = list(cols or [])
        names = {f.name for f in self.schema().fields}
        missing = [c for c in cols if c not in names]
        if missing:
            raise ValueError(
                f"partition column(s) {missing} not in table schema"
            )
        return self._commit(
            {
                "operation": "set_partitioning",
                "files": list(snap["files"]),
                "partition_by": cols,
                "schema": snap["schema"],
                "num_files": len(snap["files"]),
            }
        )

    # ------------------------------------------------------------------ #
    # snapshot tags (Iceberg-style named refs): a tag pins a version by
    # name — reads resolve it, and BOTH retention paths honor it (vacuum
    # keeps a tagged snapshot's data files; cleanup_log keeps the log
    # prefix a tagged version needs).  Tags are log-side metadata files,
    # not commits: tagging is O(1) and invisible to readers/streams.
    # ------------------------------------------------------------------ #

    _TAG_NAME = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,127}$")

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin ``version`` (default: latest) under ``name``.  Fails if the
        name exists (delete_tag first — tags don't silently move) or the
        version was already removed by :meth:`cleanup_log`."""
        if not self._TAG_NAME.match(name):
            raise ValueError(
                f"invalid tag name {name!r}: use letters/digits/._- "
                "(max 128 chars)"
            )
        v = self.latest_version() if version is None else int(version)
        if v is None:
            raise ValueError("cannot tag an empty table")
        if not os.path.exists(self._log_path(v)):
            raise ValueError(
                f"version {v} does not exist (or its log entry was "
                "removed by cleanup_log)"
            )
        refs = os.path.join(self.path, _LOG_DIR, "refs")
        os.makedirs(refs, exist_ok=True)
        final = os.path.join(refs, f"{name}.json")
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"name": name, "version": v, "timestamp": time.time()}, f)
        try:
            os.link(tmp, final)  # put-if-absent, same protocol as commits
        except FileExistsError:
            raise ValueError(f"tag {name!r} already exists") from None
        finally:
            os.unlink(tmp)
        return v

    def tags(self) -> dict[str, int]:
        """All tags as ``{name: version}``."""
        refs = os.path.join(self.path, _LOG_DIR, "refs")
        if not os.path.isdir(refs):
            return {}
        out: dict[str, int] = {}
        for fn in sorted(os.listdir(refs)):
            if fn.endswith(".json") and ".tmp-" not in fn:
                with open(os.path.join(refs, fn)) as f:
                    rec = json.load(f)
                out[rec["name"]] = int(rec["version"])
        return out

    def delete_tag(self, name: str) -> None:
        refs = os.path.join(self.path, _LOG_DIR, "refs", f"{name}.json")
        if not os.path.exists(refs):
            raise KeyError(f"no such tag: {name!r}")
        os.unlink(refs)

    def _resolve_version(self, version: "int | str | None") -> int | None:
        """Resolve a tag name to its pinned version (ints/None pass through)."""
        if isinstance(version, str):
            t = self.tags()
            if version not in t:
                raise KeyError(
                    f"no such tag: {version!r} (known: {sorted(t) or 'none'})"
                )
            return t[version]
        return version

    def publish_from(
        self, staging: "ManagedTable", mode: str = "overwrite"
    ) -> int:
        """Zero-copy WRITE-AUDIT-PUBLISH (Iceberg's WAP pattern on this
        log): ``clone()`` the table to a staging path, run writes/merges
        there, audit the staged snapshot (expectations, row counts,
        constraints), then ``publish_from(staging)`` — the staged data
        files hard-link into the target and land as ONE atomic commit.
        Readers of the target never see intermediate staging states, and
        a failed audit costs nothing: drop the staging dir.

        No data bytes move at publish (hard links, like clone); file
        records carry their stats/DV metadata, so data skipping works
        immediately.  ``mode="overwrite"`` replaces the snapshot,
        ``"append"`` adds the WHOLE staged snapshot alongside the
        target's current files (schema must match; DV'd staged files
        publish their DVs too).  Note the append-mode contract: a
        staging table made with ``clone()`` still CONTAINS the original
        rows, so append-publishing it duplicates them — for append
        workflows, stage on an empty ``ManagedTable`` (write the new
        data there, audit, publish) and reserve ``clone()`` staging for
        overwrite publishes where the staged snapshot IS the intended
        final state.  Constraints on the TARGET are validated against
        the staged data before commit.
        """
        if mode not in ("overwrite", "append"):
            raise ValueError(f"publish mode must be overwrite/append, got {mode!r}")
        s_entry = staging._entry()
        t_entry = self._entry()
        if s_entry["schema"] != t_entry["schema"]:
            raise ValueError(
                "staged schema != target schema\n"
                f"  staged: {StructType.fromJson(s_entry['schema']).simpleString()}\n"
                f"  target: {StructType.fromJson(t_entry['schema']).simpleString()}"
            )
        self._enforce_constraints(staging.read(), "publish")
        # Each staged commit dir maps to a fresh target commit dir, with
        # the Hive subpath preserved underneath — so the target's grouped
        # read (basePath per commit dir) recovers partition columns from
        # the directory names exactly as it does for its own writes, and
        # part-file name collisions across staged commit dirs are
        # impossible.
        base = f"c{(t_entry['version'] + 1):06d}-pub-{uuid.uuid4().hex[:8]}"
        dir_map: dict[str, str] = {}
        path_map: dict[str, str] = {}  # staged data path -> published path
        new_recs: list[dict[str, Any]] = []
        for f in s_entry["files"]:
            rec = dict(f)
            first, _, rest = f["path"].partition("/")
            if not rest or not re.match(r"^c\d{6}-", first):
                first, rest = "", f["path"]  # converted-in-place file
            tgt_dir = dir_map.setdefault(first, f"{base}-{len(dir_map)}")
            linked = os.path.join(tgt_dir, rest)
            src = os.path.join(staging.path, f["path"])
            dst = os.path.join(self.path, linked)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.link(src, dst)
            rec["path"] = linked
            path_map[f["path"]] = linked
            new_recs.append(rec)
        # Deletion-vector sidecars name their data files by STAGED relative
        # path inside the parquet itself, so they cannot be hard-linked —
        # rewrite each (small, by design) sidecar driver-side with the
        # published paths.  One rewritten sidecar per staged sidecar.
        staged_dvs = sorted(
            {dv for f in s_entry["files"] for dv in _rec_dvs(f)}
        )
        if staged_dvs:
            import pyarrow as pa
            import pyarrow.parquet as pq

            dv_map: dict[str, str] = {}
            dv_dir = os.path.join(self.path, f"{base}-dv")
            os.makedirs(dv_dir, exist_ok=True)
            for i, dv in enumerate(staged_dvs):
                tbl = pq.read_table(os.path.join(staging.path, dv))
                remapped = pa.array(
                    [path_map[p] for p in tbl.column(_DV_FILE).to_pylist()],
                    type=pa.string(),
                )
                out = pa.table(
                    {_DV_FILE: remapped, _DV_POS: tbl.column(_DV_POS)}
                )
                rel = os.path.join(f"{base}-dv", f"dv-{i:04d}.parquet")
                pq.write_table(out, os.path.join(self.path, rel))
                dv_map[dv] = rel
            for rec in new_recs:
                if _rec_dvs(rec):
                    rec["dvs"] = [dv_map[d] for d in _rec_dvs(rec)]
        # Optimistic retry on a lost version race: the hard links are
        # already durable and version-agnostic; only the files list (for
        # append mode) must be recomputed against the winner's snapshot.
        for _attempt in range(10):
            cur = self._entry()
            files = (
                new_recs
                if mode == "overwrite"
                else list(cur["files"]) + new_recs
            )
            try:
                return self._commit(
                    {
                        "operation": mode,
                        "files": files,
                        "partition_by": s_entry.get("partition_by") or [],
                        "schema": s_entry["schema"],
                        "num_files": len(files),
                        "added_files": len(new_recs),
                        "published_from": staging.path,
                    }
                )
            except ConcurrentWriteError:
                self._snap_cache.clear()
        raise ConcurrentWriteError(
            f"publish_from lost 10 commit races on {self.path}; giving up"
        )

    def describe_extended(self) -> dict[str, Any]:
        """``DESCRIBE EXTENDED`` analog: one dict joining every
        introspection surface — detail (files/size/layout), properties
        (engine + user), statistics (latest analyze), tags, clustering —
        for catalogs, UIs, and audit tooling."""
        return {
            **self.detail(),
            "properties": self.properties(),
            "statistics": self.statistics(),
            "tags": self.tags(),
            "history_length": len(self._versions()),
        }

    def vacuum(self, retain_hours: float = 0.0, dry_run: bool = False) -> "int | list[str]":
        """Delete data files referenced by no retained snapshot.

        A snapshot is retained if it is the LATEST, or its commit
        timestamp falls within the last ``retain_hours`` (Delta's
        ``VACUUM ... RETAIN n HOURS``; Delta defaults to 168h, here the
        default keeps only the latest — the pre-existing behavior).
        Time travel and CDF pre-images older than the retention window
        stop working (log entries remain for ``history``).  Returns the
        number of files deleted — or, with ``dry_run=True`` (Delta's
        ``VACUUM ... DRY RUN``), the sorted relative paths that WOULD be
        deleted, touching nothing.
        """
        cutoff = time.time() - retain_hours * 3600.0
        latest = self.latest_version()
        tagged = set(self.tags().values())
        live: set[str] = set()
        for v in self._versions():
            if (
                v == latest
                or v in tagged
                or self._raw_entry(v)["timestamp"] >= cutoff
            ):
                for f in self._entry(v)["files"]:
                    live.add(f["path"])
                    live.update(_rec_dvs(f))
                # change-data sidecars live exactly as long as their commit
                # is within the CDF-readable retention window
                live.update(self._raw_entry(v).get("cdc_files") or [])
        deleted = 0
        would_delete: list[str] = []
        # in-flight streaming-sink shards: staged (written) BEFORE their
        # batch's atomic log commit, so they are momentarily unreferenced —
        # a vacuum racing a live micro-batch must not reap them.  Delta
        # protects uncommitted files via the retention window; staging gets
        # the same treatment with a one-hour floor (a micro-batch stages
        # and commits within seconds).
        staging_cutoff = time.time() - max(retain_hours, 1.0) * 3600.0
        for dirpath, _dirs, names in os.walk(self.path):
            if _LOG_DIR in dirpath:
                continue
            # publish_from links files into a `-pub-` commit dir BEFORE its
            # atomic log commit — same momentarily-unreferenced window as
            # streaming staging, so it gets the same mtime grace (the links
            # carry the staged write's recent mtime)
            in_staging = "_streaming_staging" in dirpath or "-pub-" in dirpath
            for name in names:
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, self.path)
                if name.endswith(".parquet") and rel not in live:
                    if in_staging and os.path.getmtime(full) >= staging_cutoff:
                        continue
                    if dry_run:
                        would_delete.append(rel)
                        continue
                    os.unlink(full)
                    deleted += 1
        return sorted(would_delete) if dry_run else deleted

    def cleanup_log(self, retain_hours: float = 0.0) -> int:
        """Delta's log-retention analog (``delta.logRetentionDuration``):
        delete commit-log entries no snapshot reconstruction needs.

        The deletion base is the NEWEST checkpoint whose commit is older
        than ``retain_hours``: every entry and checkpoint strictly below it
        goes (reconstruction of any version >= base reads the base
        checkpoint + the tail, never the deleted prefix).  ``history()``
        and time travel below the base stop working — a cleaned version
        raises a descriptive error, not a file-not-found.  Returns the
        number of log files removed.

        Complements :meth:`vacuum` (data files) — together they bound the
        table's metadata AND data footprint for long-lived tables with
        millions of commits.  Caveat (same as Delta's txn retention): a
        streaming sink's idempotence marker inside the deleted prefix is
        forgotten — keep ``retain_hours`` above any stream's max downtime."""
        cutoff = time.time() - retain_hours * 3600.0
        base = None
        min_tag = min(self.tags().values(), default=None)
        for c in sorted(self._checkpoint_versions()):
            if self._raw_entry(c)["timestamp"] < cutoff and (
                min_tag is None or c <= min_tag
            ):
                # never clean past the oldest tagged version: its
                # reconstruction needs the base checkpoint + tail
                base = c
        if base is None:
            return 0
        removed = 0
        for v in self._versions():
            if v < base:
                os.unlink(self._log_path(v))
                self._snap_cache.pop(v, None)
                removed += 1
        for c in self._checkpoint_versions():
            if c < base:
                os.unlink(
                    os.path.join(self.path, _LOG_DIR, f"{c:08d}.checkpoint.json")
                )
                removed += 1
        return removed

    def restore(self, version: "int | str") -> int:
        """RESTORE TABLE TO VERSION (an int, or a tag name): re-commit an old snapshot's state as
        the new head (Delta's ``RESTORE TABLE ... TO VERSION AS OF``).

        Pure metadata — no data file moves or rewrites; history is
        preserved (the restore is itself a new commit, and ``changes()``
        surfaces the resulting add/remove diff to CDC consumers).  Fails
        if the target snapshot's files were already vacuumed.
        """
        snap = self._entry(version)
        missing = [
            p
            for f in snap["files"]
            for p in [f["path"], *_rec_dvs(f)]
            if not os.path.exists(os.path.join(self.path, p))
        ]
        if missing:
            raise FileNotFoundError(
                f"cannot restore to version {version}: {len(missing)} data "
                f"file(s) were vacuumed, e.g. {missing[0]}"
            )
        return self._commit(
            {
                "operation": "restore",
                "restored_version": version,
                "files": list(snap["files"]),
                "partition_by": snap.get("partition_by") or [],
                "schema": snap["schema"],
                # restore the mapping AS OF the restored version (even if
                # empty) — letting _commit carry the NEWEST mapping under
                # the old schema would mis-resolve physical names on the
                # next mapping-aware append
                "column_mapping": snap.get("column_mapping") or {},
                "num_files": len(snap["files"]),
            }
        )

    def clone(self, dest_path: str, version: "int | str | None" = None) -> "ManagedTable":
        """Shallow (zero-copy) clone: a new independent table whose data
        files share storage with the source (Delta's ``SHALLOW CLONE``).

        Data files are hard-linked (same inode, no bytes copied — the
        local-FS analog of Delta's path-reference clone; on an object
        store this would store source-absolute paths instead).  The clone
        starts its own commit log at version 0, so later writes/merges/
        vacuums on either side never affect the other: links keep shared
        inodes alive until BOTH sides drop them.  O(files) metadata cost,
        O(1) data cost — cheap dev/test copies of 100 TB tables.
        """
        snap = self._entry(version)
        if os.path.exists(dest_path) and os.listdir(dest_path):
            raise FileExistsError(f"clone destination not empty: {dest_path}")
        dest = ManagedTable(self.spark, dest_path)
        to_link = {
            p for f in snap["files"] for p in [f["path"], *_rec_dvs(f)]
        }
        for rel in sorted(to_link):
            src = os.path.join(self.path, rel)
            dst = os.path.join(dest_path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(src, dst)
            except OSError:  # cross-device: fall back to a real copy
                shutil.copy2(src, dst)
        dest._commit(
            {
                "operation": "clone",
                "source": self.path,
                "source_version": snap["version"],
                "files": [dict(f) for f in snap["files"]],
                "partition_by": snap.get("partition_by") or [],
                "schema": snap["schema"],
                "column_mapping": snap.get("column_mapping") or {},
                "num_files": len(snap["files"]),
            }
        )
        return dest

    # ------------------------------------------------------------------ #
    # CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT ... CHECK)
    # ------------------------------------------------------------------ #

    def constraints(self) -> dict[str, str]:
        """Active CHECK constraints: {name: sql_predicate}."""
        if self.latest_version() is None:
            return {}
        return dict(self._entry().get("constraints") or {})

    def _enforce_constraints(self, df: DataFrame, context: str) -> None:
        """Raise if any row of ``df`` violates an active constraint.

        One filter+limit job per constraint over the INCOMING data only
        (existing data was validated when the constraint was added) — the
        Delta write-path behavior.  NULL predicate results count as
        violations (a constraint must provably hold).
        """
        for name, expr in self.constraints().items():
            bad = df.filter(~F.coalesce(F.expr(expr), F.lit(False))).limit(1)
            row = bad.collect()
            if row:
                raise ValueError(
                    f"CHECK constraint {name!r} ({expr}) violated by "
                    f"{context} row: {row[0].asDict()}"
                )

    def add_constraint(self, name: str, expr: str) -> int:
        """Add a CHECK constraint after validating the EXISTING data
        satisfies it (Delta semantics: ADD CONSTRAINT scans the table and
        fails if any current row violates).  Metadata-only commit."""
        existing = self.constraints()
        if name in existing:
            raise ValueError(f"constraint {name!r} already exists")
        bad = self.read().filter(~F.coalesce(F.expr(expr), F.lit(False))).limit(1).collect()
        if bad:
            raise ValueError(
                f"cannot add CHECK constraint {name!r} ({expr}): existing "
                f"row violates it: {bad[0].asDict()}"
            )
        snap = self._entry()
        return self._commit(
            {
                "operation": "add_constraint",
                "constraint": {name: expr},
                "constraints": {**existing, name: expr},
                "files": list(snap["files"]),
                "partition_by": snap.get("partition_by") or [],
                "schema": snap["schema"],
                "num_files": len(snap["files"]),
            }
        )

    def drop_constraint(self, name: str) -> int:
        existing = self.constraints()
        if name not in existing:
            raise ValueError(f"no such constraint: {name!r}")
        existing.pop(name)
        snap = self._entry()
        return self._commit(
            {
                "operation": "drop_constraint",
                "constraint": {name: None},
                "constraints": existing,
                "files": list(snap["files"]),
                "partition_by": snap.get("partition_by") or [],
                "schema": snap["schema"],
                "num_files": len(snap["files"]),
            }
        )

    # ------------------------------------------------------------------ #
    # column mapping (Delta ALTER TABLE RENAME/DROP COLUMN without file
    # rewrites — delta.columnMapping.mode = 'name' analog)
    # ------------------------------------------------------------------ #

    def _check_column_unreferenced(self, entry: dict[str, Any], col: str) -> None:
        """Refuse mapping changes for columns other table metadata is built
        on — their expressions/layout are bound to the current name."""
        import re as _re

        if col in (entry.get("partition_by") or []):
            raise ValueError(
                f"cannot rename/drop partition column {col!r}: the Hive "
                "directory layout is keyed by it"
            )
        if col in (entry.get("clustering_by") or []):
            raise ValueError(
                f"cannot rename/drop clustering column {col!r}; clear it "
                "with set_clustering first"
            )
        for kind in ("generated", "identity"):
            if col in (entry.get(kind) or {}):
                raise ValueError(
                    f"cannot rename/drop {kind} column {col!r}; drop the "
                    f"{kind} metadata first"
                )
        word = _re.compile(rf"\b{_re.escape(col)}\b")
        for name, expr in (entry.get("constraints") or {}).items():
            if word.search(expr):
                raise ValueError(
                    f"cannot rename/drop column {col!r}: CHECK constraint "
                    f"{name!r} ({expr}) references it"
                )
        for gcol, gexpr in (entry.get("generated") or {}).items():
            if word.search(gexpr):
                raise ValueError(
                    f"cannot rename/drop column {col!r}: generated column "
                    f"{gcol!r} ({gexpr}) is computed from it"
                )

    def add_column(self, col: str, dtype: str, default: str | None = None) -> int:
        """Metadata-only ``ALTER TABLE ... ADD COLUMN``: the schema gains a
        nullable column, no data file is touched — existing rows read back
        null (or ``default`` for FUTURE writes that omit the column, via
        :meth:`set_column_default`).  The explicit-DDL twin of
        ``write(..., merge_schema=True)`` evolution.  At 100 TB an added
        column must never be a table rewrite."""
        from pyspark.sql.types import _parse_datatype_string

        entry = self._entry()
        schema = StructType.fromJson(entry["schema"])
        if any(f.name == col for f in schema.fields):
            raise ValueError(f"column {col!r} already exists")
        try:
            dt = _parse_datatype_string(dtype)
        except Exception as exc:
            raise ValueError(f"bad column type {dtype!r}: {exc}") from exc
        new_schema = StructType(
            [*schema.fields, StructField(col, dt, True)]
        )
        v = self._commit(
            {
                "operation": "add_column",
                "added_column": {col: dtype},
                "files": list(entry["files"]),
                "partition_by": entry.get("partition_by") or [],
                "schema": json.loads(new_schema.json()),
                "num_files": len(entry["files"]),
                "added_files": 0,
            }
        )
        if default is not None:
            v = self.set_column_default(col, default)
        return v

    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only column rename (Delta ``ALTER TABLE ... RENAME
        COLUMN`` under column mapping): no data file is touched — files
        keep the original PHYSICAL column name, the logical schema renames,
        and the mapping records logical->physical.  At 100 TB a rename must
        never be a table rewrite.  Earlier versions keep their own schema
        and mapping, so time travel reads the pre-rename name."""
        entry = self._entry()
        schema = StructType.fromJson(entry["schema"])
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ValueError(f"no such column: {old!r}")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        self._check_column_unreferenced(entry, old)
        mapping = dict(entry.get("column_mapping") or {})
        phys = mapping.pop(old, old)
        mapping[new] = phys
        new_schema = StructType(
            [
                StructField(new if f.name == old else f.name, f.dataType, f.nullable)
                for f in schema.fields
            ]
        )
        return self._commit(
            {
                "operation": "rename_column",
                "renamed": {old: new},
                "files": list(entry["files"]),
                "partition_by": entry.get("partition_by") or [],
                "schema": json.loads(new_schema.json()),
                "column_mapping": mapping,
                "num_files": len(entry["files"]),
                "added_files": 0,
            }
        )

    def drop_column(self, col: str) -> int:
        """Metadata-only column drop (Delta ``ALTER TABLE ... DROP
        COLUMN`` under column mapping): the column leaves the logical
        schema; data files keep its bytes until a rewrite (OPTIMIZE /
        merge) naturally sheds them.  The physical name is retained as a
        ``__dropped_*`` tombstone in the mapping so a later column of the
        same name can never resurrect the stale bytes (it gets a fresh
        physical name instead)."""
        entry = self._entry()
        schema = StructType.fromJson(entry["schema"])
        names = [f.name for f in schema.fields]
        if col not in names:
            raise ValueError(f"no such column: {col!r}")
        if len(names) == 1:
            raise ValueError("cannot drop the only column")
        self._check_column_unreferenced(entry, col)
        mapping = dict(entry.get("column_mapping") or {})
        phys = mapping.pop(col, col)
        mapping[f"__dropped_{uuid.uuid4().hex[:8]}"] = phys
        new_schema = StructType(
            [f for f in schema.fields if f.name != col]
        )
        return self._commit(
            {
                "operation": "drop_column",
                "dropped": col,
                "files": list(entry["files"]),
                "partition_by": entry.get("partition_by") or [],
                "schema": json.loads(new_schema.json()),
                "column_mapping": mapping,
                "num_files": len(entry["files"]),
                "added_files": 0,
            }
        )

    # ------------------------------------------------------------------ #
    # generated + identity columns (Delta GENERATED ALWAYS AS (...) /
    # GENERATED ... AS IDENTITY analogs)
    # ------------------------------------------------------------------ #

    def add_generated_column(self, col: str, expr: str) -> int:
        """Declare ``col`` as a generated column: writes that omit it get
        it computed as ``expr`` (a SQL expression over the other columns);
        writes that supply it are validated against ``expr`` (null-safe
        equality) and rejected on mismatch — Delta's generated-column
        write contract.  ``col`` must already exist in the schema, and the
        existing data must satisfy ``expr`` (checked with one scan)."""
        entry = self._entry()
        schema = StructType.fromJson(entry["schema"])
        if not any(f.name == col for f in schema.fields):
            raise ValueError(
                f"generated column {col!r} must exist in the schema "
                f"({schema.simpleString()})"
            )
        field = next(f for f in schema.fields if f.name == col)
        probe = (
            f"NOT ({col} <=> CAST(({expr}) AS "
            f"{field.dataType.simpleString()}))"
        )
        if self.read().filter(F.expr(probe)).limit(1).count():
            raise ValueError(
                f"existing rows violate the generated expression for "
                f"{col!r}: {expr}"
            )
        return self._commit(
            {
                "operation": "set_generated",
                "generated": {**(entry.get("generated") or {}), col: expr},
                "files": list(entry["files"]),
                "partition_by": entry.get("partition_by") or [],
                "schema": entry["schema"],
                "num_files": len(entry["files"]),
                "added_files": 0,
            }
        )

    def set_column_default(self, col: str, expr: str) -> int:
        """Declare a DEFAULT for ``col`` (Delta ``ALTER TABLE ... ALTER
        COLUMN ... SET DEFAULT`` analog): writes that omit the column get
        it filled with ``expr`` instead of null; writes that supply it
        pass through untouched.  ``expr`` must be a constant-foldable SQL
        expression (validated by evaluating it once), castable to the
        column's type.  Unlike a generated column, the default is
        evaluated per WRITE, not derived from other columns — existing
        rows are unaffected (they read back their stored values)."""
        entry = self._entry()
        schema = StructType.fromJson(entry["schema"])
        if not any(f.name == col for f in schema.fields):
            raise ValueError(
                f"default column {col!r} must exist in the schema "
                f"({schema.simpleString()})"
            )
        if col in (entry.get("generated") or {}):
            raise ValueError(
                f"{col!r} is a generated column; a DEFAULT would conflict"
            )
        field = next(f for f in schema.fields if f.name == col)
        try:
            self.spark.sql(
                f"SELECT CAST(({expr}) AS {field.dataType.simpleString()})"
            ).first()
        except Exception as exc:
            raise ValueError(
                f"default expression for {col!r} is not a constant "
                f"castable to {field.dataType.simpleString()}: {expr} ({exc})"
            ) from exc
        return self._commit(
            {
                "operation": "set_default",
                "defaults": {**(entry.get("defaults") or {}), col: expr},
                "files": list(entry["files"]),
                "partition_by": entry.get("partition_by") or [],
                "schema": entry["schema"],
                "num_files": len(entry["files"]),
                "added_files": 0,
            }
        )

    def drop_column_default(self, col: str) -> int:
        """Remove ``col``'s DEFAULT (future omitting writes go back to
        null-filling via schema evolution rules)."""
        entry = self._entry()
        defaults = dict(entry.get("defaults") or {})
        if col not in defaults:
            raise ValueError(f"no default declared for {col!r}")
        defaults.pop(col)
        return self._commit(
            {
                "operation": "drop_default",
                "defaults": defaults,
                "files": list(entry["files"]),
                "partition_by": entry.get("partition_by") or [],
                "schema": entry["schema"],
                "num_files": len(entry["files"]),
                "added_files": 0,
            }
        )

    def add_identity_column(self, col: str, start: int = 1) -> int:
        """Add a bigint identity column: appends that omit ``col`` get
        monotonically increasing ids assigned from a table-level
        high-water mark (gaps allowed across writes — Delta identity
        semantics); appends that supply it pass through unchecked
        (GENERATED BY DEFAULT).  Existing rows read back null.

        Assignment is fully distributed: per-partition row counts (an
        O(partitions) collect) become cumulative offsets, and each row's
        id is offset + its row number WITHIN its partition — no global
        sort, no single-partition window.  Identity makes concurrent
        appends non-commutative, so a losing racer re-runs instead of
        blind-retrying."""
        from pyspark.sql.types import LongType, StructField

        entry = self._entry()
        schema = StructType.fromJson(entry["schema"])
        if any(f.name == col for f in schema.fields):
            raise ValueError(f"column {col!r} already exists")
        if entry.get("identity"):
            raise ValueError("one identity column per table")
        new_schema = StructType(
            schema.fields + [StructField(col, LongType(), True)]
        )
        return self._commit(
            {
                "operation": "set_identity",
                "identity": {col: {"next": int(start)}},
                "files": list(entry["files"]),
                "partition_by": entry.get("partition_by") or [],
                "schema": new_schema.jsonValue(),
                "num_files": len(entry["files"]),
                "added_files": 0,
            }
        )

    def _apply_write_metadata(
        self, df: DataFrame, entry: dict[str, Any]
    ) -> tuple[DataFrame, dict[str, Any] | None, DataFrame | None]:
        """Fill/validate generated columns and allocate identity ids for
        one write.  Returns (df, updated identity metadata or None, the
        persisted intermediate to unpersist after the write lands)."""
        schema = StructType.fromJson(entry["schema"])
        for col, expr in (entry.get("generated") or {}).items():
            field = next(f for f in schema.fields if f.name == col)
            typ = field.dataType.simpleString()
            if col not in df.columns:
                df = df.withColumn(
                    col, F.expr(expr).cast(field.dataType)
                )
            elif df.filter(
                F.expr(f"NOT ({col} <=> CAST(({expr}) AS {typ}))")
            ).limit(1).count():
                raise ValueError(
                    f"supplied values for generated column {col!r} "
                    f"disagree with its expression: {expr}"
                )
        for col, dexpr in (entry.get("defaults") or {}).items():
            if col not in df.columns:
                field = next(f for f in schema.fields if f.name == col)
                df = df.withColumn(col, F.expr(dexpr).cast(field.dataType))
        identity = entry.get("identity") or {}
        cache: DataFrame | None = None
        new_meta: dict[str, Any] | None = None
        for col, info in identity.items():
            if col in df.columns:
                continue  # caller-supplied ids (GENERATED BY DEFAULT)
            df, cache, assigned = self._assign_identity(
                df, col, int(info["next"])
            )
            new_meta = {**identity, col: {"next": int(info["next"]) + assigned}}
        # a filled column lands at the end of the frame; restore the
        # table's column order so the append schema check sees a match
        names = [f.name for f in schema.fields]
        if set(df.columns) == set(names) and df.columns != names:
            df = df.select(*names)
        return df, new_meta, cache

    def _assign_identity(
        self, df: DataFrame, col: str, start: int
    ) -> tuple[DataFrame, DataFrame, int]:
        from pyspark.sql.window import Window

        tagged = (
            df.withColumn("_iid_pid", F.spark_partition_id())
            .withColumn("_iid_mono", F.monotonically_increasing_id())
            .persist()
        )
        counts = sorted(
            tagged.groupBy("_iid_pid").count().collect(),
            key=lambda r: r["_iid_pid"],
        )
        acc = 0
        pairs: list[Column] = []
        for r in counts:
            pairs += [F.lit(int(r["_iid_pid"])), F.lit(acc)]
            acc += r["count"]
        offsets = F.create_map(*pairs) if pairs else F.create_map()
        w = Window.partitionBy("_iid_pid").orderBy("_iid_mono")
        out = (
            tagged.withColumn(
                col,
                (
                    F.lit(start)
                    + offsets[F.col("_iid_pid")]
                    + F.row_number().over(w)
                    - 1
                ).cast("bigint"),
            )
            .drop("_iid_pid", "_iid_mono")
        )
        return out, tagged, acc

    def merge_with_retry(
        self,
        source: DataFrame,
        keys: list[str],
        max_retries: int = 3,
        **merge_kwargs: Any,
    ) -> int:
        """Merge with optimistic-concurrency retry: on losing a version
        race (:class:`ConcurrentWriteError`), re-run the WHOLE merge
        against the new snapshot, up to ``max_retries`` times.

        A full re-run — not a commit retry — because a competing commit
        logically invalidates the merge's read snapshot (its anti-join and
        pruning were computed against the old file list).  This is Delta's
        documented conflict-resolution recipe for concurrent MERGE; blind
        appends/overwrites already retry inside :meth:`write`.  Persisting
        an expensive source before calling keeps retries cheap.
        """
        attempts = 0
        while True:
            try:
                return self.merge(source, keys, **merge_kwargs)
            except ConcurrentWriteError:
                attempts += 1
                if attempts > max_retries:
                    raise

    def optimize_with_retry(
        self, max_retries: int = 3, **optimize_kwargs: Any
    ) -> int:
        """OPTIMIZE with optimistic-concurrency retry — the maintenance
        twin of :meth:`merge_with_retry`.  A compaction/clustering pass
        racing a writer loses the version and must RE-PLAN against the
        new snapshot (its candidate file list is stale); with declared
        clustering the re-run is incremental, so a lost race costs one
        re-scan of the still-unclustered files, not a table rewrite.
        Safe to drive from a scheduler loop alongside live writers
        (auto-compact's silent-skip behavior is the fire-and-forget
        variant; this one guarantees the pass eventually lands)."""
        attempts = 0
        while True:
            try:
                return self.optimize(**optimize_kwargs)
            except ConcurrentWriteError:
                attempts += 1
                if attempts > max_retries:
                    raise
