"""Interop with the public Delta Lake log format (tables/delta_interop.py).

The read-side fixtures are HAND-WRITTEN per PROTOCOL.md — not produced by our
exporter — so the reader is checked against the spec, not against itself.
The export test closes the loop the other way: managed snapshot -> standard
Delta log -> independent re-read equals the managed read.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from delta_lake_spark.tables.delta_interop import (
    DeltaProtocolError,
    export_to_delta,
    import_delta,
    read_delta,
)
from delta_lake_spark.tables.managed import ManagedTable

PROTO = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _schema_str(fields):
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": n, "type": t, "nullable": True, "metadata": {}}
                for n, t in fields
            ],
        }
    )


def _meta(fields, pcols=()):
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_str(fields),
            "partitionColumns": list(pcols),
            "configuration": {},
        }
    }


def _commit(table, v, actions):
    log = os.path.join(table, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _data_file(table, rel, rows: dict):
    full = os.path.join(table, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    pq.write_table(pa.table(rows), full)
    return {
        "add": {
            "path": rel,
            "partitionValues": {},
            "size": os.path.getsize(full),
            "modificationTime": 0,
            "dataChange": True,
        }
    }


def test_read_handcrafted_log_with_remove_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "dt")
    add_a = _data_file(t, "file-a.parquet", {"id": [1, 2], "val": ["x", "y"]})
    _commit(t, 0, [PROTO, _meta([("id", "long"), ("val", "string")]), add_a])
    add_b = _data_file(t, "file-b.parquet", {"id": [3, 4], "val": ["z", "w"]})
    _commit(t, 1, [add_b, {"remove": {"path": "file-a.parquet", "dataChange": True}}])

    latest = read_delta(spark, t)
    assert sorted(r["id"] for r in latest.collect()) == [3, 4]
    v0 = read_delta(spark, t, version=0)
    assert sorted(r["id"] for r in v0.collect()) == [1, 2]


def test_partition_values_are_typed_from_the_map(spark, tmp_path):
    # spec: partitionValues (strings) are the source of truth; files do NOT
    # contain the partition columns; nulls serialize as JSON null
    t = str(tmp_path / "dtp")
    fields = [("id", "long"), ("d", "date"), ("n", "integer"), ("s", "string")]
    a1 = _data_file(t, "p1.parquet", {"id": [1]})
    a1["add"]["partitionValues"] = {"d": "2023-06-01", "n": "7", "s": "ok"}
    a2 = _data_file(t, "p2.parquet", {"id": [2]})
    a2["add"]["partitionValues"] = {"d": None, "n": "8", "s": None}
    _commit(t, 0, [PROTO, _meta(fields, pcols=["d", "n", "s"]), a1, a2])

    rows = {r["id"]: r for r in read_delta(spark, t).collect()}
    assert str(rows[1]["d"]) == "2023-06-01" and rows[1]["n"] == 7
    assert rows[2]["d"] is None and rows[2]["s"] is None
    got = dict(read_delta(spark, t).dtypes)
    assert got["d"] == "date" and got["n"] == "int"


def test_checkpoint_replay_without_early_json(spark, tmp_path):
    # commits 0-1, parquet checkpoint at 1, early JSON deleted (the spec
    # allows log cleanup past a checkpoint), then a JSON tail at 2
    t = str(tmp_path / "dtc")
    add_a = _data_file(t, "a.parquet", {"id": [1]})
    add_b = _data_file(t, "b.parquet", {"id": [2]})
    _commit(t, 0, [PROTO, _meta([("id", "long")]), add_a])
    _commit(t, 1, [add_b])

    ckpt_schema = StructType(
        [
            StructField(
                "protocol",
                StructType(
                    [
                        StructField("minReaderVersion", IntegerType()),
                        StructField("minWriterVersion", IntegerType()),
                    ]
                ),
            ),
            StructField(
                "metaData",
                StructType(
                    [
                        StructField("id", StringType()),
                        StructField("schemaString", StringType()),
                        StructField("partitionColumns", ArrayType(StringType())),
                    ]
                ),
            ),
            StructField(
                "add",
                StructType(
                    [
                        StructField("path", StringType()),
                        StructField("size", LongType()),
                    ]
                ),
            ),
        ]
    )
    meta_struct = (
        "00000000-0000-0000-0000-000000000001",
        _schema_str([("id", "long")]),
        [],
    )
    rows = [
        ((1, 2), None, None),
        (None, meta_struct, None),
        (None, None, ("a.parquet", 1)),
        (None, None, ("b.parquet", 1)),
    ]
    ck_dir = str(tmp_path / "ckpt_build")
    spark.createDataFrame(rows, ckpt_schema).coalesce(1).write.parquet(ck_dir)
    (part,) = glob.glob(os.path.join(ck_dir, "part-*.parquet"))
    shutil.move(
        part,
        os.path.join(t, "_delta_log", f"{1:020d}.checkpoint.parquet"),
    )
    os.remove(os.path.join(t, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(t, "_delta_log", f"{1:020d}.json"))

    add_c = _data_file(t, "c.parquet", {"id": [3]})
    _commit(t, 2, [add_c])

    assert sorted(r["id"] for r in read_delta(spark, t).collect()) == [1, 2, 3]


def test_rejects_reader_breaking_features(spark, tmp_path):
    t = str(tmp_path / "dtdv")
    add = _data_file(t, "a.parquet", {"id": [1]})
    add["add"]["deletionVector"] = {"storageType": "u", "pathOrInlineDv": "x"}
    _commit(t, 0, [PROTO, _meta([("id", "long")]), add])
    with pytest.raises(DeltaProtocolError, match="deletion vector"):
        read_delta(spark, t)

    t2 = str(tmp_path / "dtcm")
    meta = _meta([("id", "long")])
    meta["metaData"]["configuration"] = {"delta.columnMapping.mode": "name"}
    _commit(t2, 0, [PROTO, meta, _data_file(t2, "a.parquet", {"id": [1]})])
    with pytest.raises(DeltaProtocolError, match="column-mapping"):
        read_delta(spark, t2)

    t3 = str(tmp_path / "dtv3")
    p3 = {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
        }
    }
    _commit(t3, 0, [p3, _meta([("id", "long")]), _data_file(t3, "a.parquet", {"id": [1]})])
    with pytest.raises(DeltaProtocolError, match="reader version 3"):
        read_delta(spark, t3)


def test_export_snapshot_roundtrip_resolves_dml(spark, tmp_path):
    # managed table with partitioning + a delete (deletion-vector mode) —
    # the export must RESOLVE the managed-only features into plain parquet
    src = spark.createDataFrame(
        [(i, "US" if i % 2 else "DE", float(i)) for i in range(40)],
        "k long, country string, v double",
    )
    mt = ManagedTable(spark, str(tmp_path / "mt"))
    mt.write(src, partition_by=["country"])
    mt.delete_where([("k", "<", 10)], mode="merge_on_read")

    dest = str(tmp_path / "exported")
    export_to_delta(mt, dest)

    back = read_delta(spark, dest)
    want = mt.read()
    assert back.schema == want.schema
    assert (
        back.exceptAll(want).union(want.exceptAll(back)).count() == 0
    )
    # structural spec checks on the written log
    with open(os.path.join(dest, "_delta_log", f"{0:020d}.json")) as fh:
        actions = [json.loads(x) for x in fh if x.strip()]
    assert actions[0]["protocol"]["minReaderVersion"] == 1
    assert actions[1]["metaData"]["partitionColumns"] == ["country"]
    adds = [a["add"] for a in actions if "add" in a]
    assert adds and all("country=" in a["path"] for a in adds)
    assert sum(json.loads(a["stats"])["numRecords"] for a in adds) == 30
    assert {a["partitionValues"]["country"] for a in adds} == {"US", "DE"}


def test_import_delta_into_managed_table(spark, tmp_path):
    t = str(tmp_path / "dt_src")
    fields = [("id", "long"), ("grp", "string")]
    a1 = _data_file(t, "grp=A/f1.parquet", {"id": [1, 2]})
    a1["add"]["partitionValues"] = {"grp": "A"}
    a2 = _data_file(t, "grp=B/f2.parquet", {"id": [3]})
    a2["add"]["partitionValues"] = {"grp": "B"}
    _commit(t, 0, [PROTO, _meta(fields, pcols=["grp"]), a1, a2])

    mt = import_delta(spark, t, str(tmp_path / "imported"))
    got = mt.read()
    assert sorted((r["id"], r["grp"]) for r in got.collect()) == [
        (1, "A"),
        (2, "A"),
        (3, "B"),
    ]
    assert mt._entry().get("partition_by") == ["grp"]
