"""Interop with the PUBLIC Delta Lake transaction-log format.

The reference workload (deltalake.ipynb throughout) runs on real delta-spark
tables, so a migrating user arrives with directories shaped like::

    table/_delta_log/00000000000000000000.json      # JSON-lines actions
    table/_delta_log/00000000000000000010.checkpoint.parquet
    table/_delta_log/_last_checkpoint
    table/part-....parquet

This module speaks that format from the published protocol spec
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md) — no delta-spark
dependency:

- :func:`read_delta`       snapshot / time-travel read of a real Delta table
- :func:`import_delta`     one-call migration into a :class:`ManagedTable`
- :func:`export_to_delta`  write a managed-table snapshot as a standard
                           Delta table (protocol 1/2) any Delta client reads

Supported on read: JSON commit replay, parquet checkpoints + _last_checkpoint,
add/remove reconciliation by path, metaData schema (Spark JSON schemaString),
partition-value typing per the spec's serialization rules, minReaderVersion
1-2 (without column mapping).  Clearly rejected with descriptive errors:
deletion vectors, column-mapping tables, and reader-version-3 feature tables —
the spec marks these reader-breaking, so silently misreading is not an option.

Scale note: log replay holds one dict per live FILE on the driver — the same
O(files) metadata cost every Delta client pays (delta-rs, delta-spark's
snapshot state).  Data reads group files by partition tuple and hand Spark
plain parquet scans, so the cluster-side plan is ordinary pruned/pushed-down
parquet scanning.
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from delta_lake_spark.tables.managed import ManagedTable

_LOG = "_delta_log"
_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CKPT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")


class DeltaProtocolError(RuntimeError):
    """The table uses a protocol feature this reader does not implement."""


def _log_dir(path: str) -> str:
    d = os.path.join(path, _LOG)
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"{path!r} is not a Delta table: no {_LOG}/ directory"
        )
    return d


def _list_log(path: str) -> tuple[dict[int, str], dict[int, str]]:
    commits, ckpts = {}, {}
    d = _log_dir(path)
    for name in os.listdir(d):
        if m := _COMMIT_RE.match(name):
            commits[int(m.group(1))] = os.path.join(d, name)
        elif m := _CKPT_RE.match(name):
            ckpts[int(m.group(1))] = os.path.join(d, name)
    return commits, ckpts


def _check_protocol(proto: dict[str, Any]) -> None:
    reader = int(proto.get("minReaderVersion", 1))
    feats = proto.get("readerFeatures") or []
    unsupported = {"deletionVectors", "columnMapping", "v2Checkpoint", "timestampNtz"} & set(feats)
    if reader > 3 or (reader == 3 and unsupported):
        raise DeltaProtocolError(
            f"table requires reader version {reader} with features "
            f"{sorted(feats)}; this reader implements protocol 1-2 "
            f"(no {sorted(unsupported) or feats})"
        )


def _check_metadata(meta: dict[str, Any]) -> None:
    conf = meta.get("configuration") or {}
    mode = conf.get("delta.columnMapping.mode", "none")
    if mode not in ("", "none"):
        raise DeltaProtocolError(
            f"column-mapping mode {mode!r} is not supported by this reader "
            "(physical/logical name indirection would be silently misread)"
        )


def _replay(
    spark: SparkSession, path: str, version: int | None
) -> tuple[dict[str, dict], dict[str, Any], int]:
    """Reconstruct snapshot state: live add-actions by path, metaData, and
    the resolved version.  Starts from the newest checkpoint at or below the
    requested version, then applies JSON commits."""
    commits, ckpts = _list_log(path)
    if not commits and not ckpts:
        raise FileNotFoundError(f"empty {_LOG}/ in {path!r}")
    latest = max(list(commits) + list(ckpts))
    v = latest if version is None else int(version)
    if v > latest or (v not in commits and v not in ckpts):
        raise ValueError(
            f"version {v} not present in {path!r} (latest is {latest})"
        )

    adds: dict[str, dict] = {}
    meta: dict[str, Any] = {}
    proto: dict[str, Any] = {}
    start = 0
    usable_ckpts = [c for c in ckpts if c <= v]
    if usable_ckpts:
        ck = max(usable_ckpts)
        for row in spark.read.parquet(ckpts[ck]).collect():
            rec = row.asDict(recursive=True)
            if rec.get("protocol"):
                proto = {k: val for k, val in rec["protocol"].items() if val is not None}
            if rec.get("metaData"):
                meta = {k: val for k, val in rec["metaData"].items() if val is not None}
            if rec.get("add"):
                a = {k: val for k, val in rec["add"].items() if val is not None}
                adds[a["path"]] = a
            if rec.get("remove"):
                adds.pop(rec["remove"]["path"], None)
        start = ck + 1

    for cv in sorted(c for c in commits if start <= c <= v):
        with open(commits[cv]) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    proto = action["protocol"]
                    _check_protocol(proto)
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    a = action["add"]
                    if a.get("deletionVector"):
                        raise DeltaProtocolError(
                            f"file {a['path']!r} carries a deletion vector; "
                            "this reader does not implement DV protocol — "
                            "ask the source to run PURGE/OPTIMIZE first"
                        )
                    adds[a["path"]] = a
                elif "remove" in action:
                    adds.pop(action["remove"]["path"], None)
    if proto:
        _check_protocol(proto)
    if not meta:
        raise DeltaProtocolError(
            f"no metaData action found replaying {path!r} to version {v}"
        )
    _check_metadata(meta)
    return adds, meta, v


def _partition_lit(raw: str | None, dtype) -> Any:
    """A typed Column for one partition value, per the spec's serialization
    rules (strings for everything; null means NULL)."""
    if raw is None:
        return F.lit(None).cast(dtype)
    # nullif() keeps the column NULLABLE, matching the declared schemaString
    # (a bare lit() — or when(), which constant-folds — comes out
    # non-nullable and diverges from the metaData schema)
    return F.nullif(F.lit(raw), F.lit(None)).cast(dtype)


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot (or time-travel) read of a REAL Delta Lake table directory,
    per PROTOCOL.md.  Partition columns are materialized from each file's
    ``partitionValues`` map (the spec's source of truth — directory names
    are advisory only)."""
    adds, meta, _ = _replay(spark, path, version)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    pcols = list(meta.get("partitionColumns") or [])
    ptypes = {f.name: f.dataType for f in schema.fields}
    file_schema = StructType([f for f in schema.fields if f.name not in pcols])

    if not adds:
        return spark.createDataFrame([], schema)

    # group files by identical partition tuple -> one plain parquet scan per
    # group with literal partition columns; union preserves the full schema
    groups: dict[tuple, list[str]] = {}
    for a in adds.values():
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in pcols)
        fpath = os.path.join(path, urllib.parse.unquote(a["path"]))
        groups.setdefault(key, []).append(fpath)

    out = None
    for key, files in sorted(groups.items(), key=lambda kv: str(kv[0])):
        part = spark.read.schema(file_schema).parquet(*files)
        for c, raw in zip(pcols, key):
            part = part.withColumn(c, _partition_lit(raw, ptypes[c]))
        part = part.select(*[f.name for f in schema.fields])
        out = part if out is None else out.unionByName(part)
    # normalize to the declared schema: literal partition columns otherwise
    # surface as non-nullable, diverging from the metaData schemaString
    return out.to(schema)


def import_delta(
    spark: SparkSession, src: str, dest: str, version: int | None = None
) -> ManagedTable:
    """Migrate a real Delta table into a :class:`ManagedTable` at ``dest``,
    preserving the partition layout — the one-call path for a reference user
    switching their lakehouse zone tables over."""
    df = read_delta(spark, src, version)
    _, meta, _ = _replay(spark, src, version)
    pcols = list(meta.get("partitionColumns") or [])
    mt = ManagedTable(spark, dest)
    mt.write(df, mode="overwrite", partition_by=pcols or None)
    return mt


def _hive_parts(rel: str) -> dict[str, str | None]:
    """partitionValues from Hive-style path components (k=v dirs)."""
    out: dict[str, str | None] = {}
    for comp in rel.split(os.sep)[:-1]:
        if "=" in comp:
            k, _, v = comp.partition("=")
            v = urllib.parse.unquote(v)
            out[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else v
    return out


def export_to_delta(
    mt: ManagedTable, dest: str, version: int | None = None
) -> str:
    """Write ``mt``'s snapshot at ``version`` as a STANDARD Delta table
    (protocol minReader=1/minWriter=2) under ``dest`` — readable by
    delta-spark, delta-rs, DuckDB's delta extension, etc.

    Snapshot-level by design: the managed log's richer actions (deletion
    vectors, column mapping, generated columns) are RESOLVED by the managed
    read path, so the exported table is plain parquet + one commit, the most
    portable shape.  Partitioning is preserved."""
    df = mt.read(version)
    entry = mt._entry(version)
    pcols = list(entry.get("partition_by") or [])

    os.makedirs(dest, exist_ok=True)
    writer = df.write.mode("overwrite")
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.parquet(dest)

    import pyarrow.parquet as pq

    actions: list[dict[str, Any]] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": pcols,
                "configuration": {},
                "createdTime": 0,
            }
        },
    ]
    for root, _dirs, files in os.walk(dest):
        for name in sorted(files):
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(root, name)
            rel = os.path.relpath(full, dest)
            st = os.stat(full)
            actions.append(
                {
                    "add": {
                        # percent-encode per spec, but keep '/' and '=' —
                        # the ecosystem writes Hive components literally
                        "path": urllib.parse.quote(rel, safe="/="),
                        "partitionValues": _hive_parts(rel),
                        "size": st.st_size,
                        "modificationTime": int(st.st_mtime * 1000),
                        "dataChange": True,
                        "stats": json.dumps(
                            {"numRecords": pq.ParquetFile(full).metadata.num_rows}
                        ),
                    }
                }
            )
    log_dir = os.path.join(dest, _LOG)
    os.makedirs(log_dir, exist_ok=True)
    commit = os.path.join(log_dir, f"{0:020d}.json")
    with open(commit, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return dest
