"""Lakehouse table layer: versioned managed tables + incremental patterns."""

from delta_lake_spark.tables.incremental import (
    anti_join_append,
    near_dedup_ingest,
    apply_changes,
    external_source_refresh,
    high_water_mark,
    incremental_refresh,
    insert_only_merge,
)
from delta_lake_spark.tables.managed import (
    ConcurrentWriteError,
    ManagedTable,
    VacuumedVersionError,
)
from delta_lake_spark.tables.delta_interop import (
    DeltaProtocolError,
    export_to_delta,
    import_delta,
    read_delta,
)
from delta_lake_spark.tables.matview import IncrementalAggView
from delta_lake_spark.tables.sketchview import IncrementalSketchView
from delta_lake_spark.tables.stream_source import (
    ManagedTableStreamSource,
    ManagedTableStreamWriter,
    register_managed_stream_source,
)
from delta_lake_spark.tables.registry import TableCatalog

__all__ = [
    "ManagedTableStreamSource",
    "ManagedTableStreamWriter",
    "register_managed_stream_source",
    "DeltaProtocolError",
    "read_delta",
    "import_delta",
    "export_to_delta",
    "IncrementalAggView",
    "IncrementalSketchView",
    "ManagedTable",
    "ConcurrentWriteError",
    "VacuumedVersionError",
    "TableCatalog",
    "high_water_mark",
    "insert_only_merge",
    "anti_join_append",
    "near_dedup_ingest",
    "apply_changes",
    "incremental_refresh",
    "external_source_refresh",
]
