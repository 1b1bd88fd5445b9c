"""Persistent table registry — the engine's metastore analog.

The reference registers its zone tables in a metastore so any session can
query them by name: ``CREATE SCHEMA bronze/silver/gold`` +
``CREATE TABLE <schema>.<name> USING DELTA LOCATION '<path>'``
(deltalake.ipynb:1046-1060, :1341-1358).  Spark's built-in in-memory
catalog is session-scoped (names vanish with the session) and this
environment ships no Hive metastore, so this module provides the durable
half natively: a JSON registry file under a warehouse directory mapping
``schema.table`` to the table's location.  Registration survives process
restarts; a fresh ``SparkSession`` calls :meth:`TableCatalog.attach` to
re-expose every registered table for ``spark.sql``.

Scale notes: the registry holds one small record per TABLE (not per file
— file-level metadata lives in each table's own commit log), so it stays
tiny at any data scale.  Writes go through a tempfile + ``os.replace``
(atomic on POSIX); last-writer-wins is acceptable for DDL-rate updates,
matching what a metastore RDBMS would serialize anyway.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from delta_lake_spark.tables.managed import ManagedTable

_REGISTRY_FILE = "_catalog.json"
_DEFAULT_SCHEMA = "default"


class TableCatalog:
    """Durable ``schema.table`` → location registry rooted at a warehouse
    directory.

    View naming under :meth:`attach`: temp views cannot contain dots, so
    ``gold.clients`` is exposed as ``gold_clients``; tables in the
    ``default`` schema keep their bare name.
    """

    def __init__(self, warehouse_dir: str):
        self.warehouse = os.path.abspath(warehouse_dir)
        os.makedirs(self.warehouse, exist_ok=True)

    # ------------------------------------------------------------------ #
    # registry file
    # ------------------------------------------------------------------ #

    @property
    def _registry_path(self) -> str:
        return os.path.join(self.warehouse, _REGISTRY_FILE)

    def _load(self) -> dict[str, Any]:
        try:
            with open(self._registry_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"schemas": {}}

    def _save(self, reg: dict[str, Any]) -> None:
        tmp = self._registry_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(reg, f, indent=1, sort_keys=True)
        os.replace(tmp, self._registry_path)  # atomic swap

    @staticmethod
    def _split(name: str) -> tuple[str, str]:
        if name.count(".") > 1:
            raise ValueError(f"table name must be [schema.]table: {name!r}")
        schema, _, tbl = name.rpartition(".")
        return (schema or _DEFAULT_SCHEMA), tbl

    # ------------------------------------------------------------------ #
    # DDL surface
    # ------------------------------------------------------------------ #

    def create_schema(self, schema: str) -> None:
        """``CREATE SCHEMA IF NOT EXISTS`` analog (deltalake.ipynb:1046)."""
        reg = self._load()
        reg["schemas"].setdefault(schema, {})
        self._save(reg)

    def schemas(self) -> list[str]:
        return sorted(self._load()["schemas"])

    def register(self, name: str, path: str) -> None:
        """``CREATE TABLE <name> USING DELTA LOCATION '<path>'`` analog:
        record an EXISTING managed table under a durable name
        (deltalake.ipynb:1341-1358)."""
        if not ManagedTable.is_managed_table(path):
            raise FileNotFoundError(f"not a managed table: {path}")
        schema, tbl = self._split(name)
        reg = self._load()
        reg["schemas"].setdefault(schema, {})[tbl] = {
            "location": os.path.abspath(path)
        }
        self._save(reg)

    def create_table(
        self,
        spark: SparkSession,
        name: str,
        df: DataFrame | None = None,
        partition_by: list[str] | None = None,
    ) -> ManagedTable:
        """Create a managed table at the warehouse-derived location
        (``<warehouse>/<schema>/<table>``), optionally seeding it with
        ``df``, and register it."""
        schema, tbl = self._split(name)
        path = os.path.join(self.warehouse, schema, tbl)
        t = ManagedTable(spark, path)
        if df is not None:
            t.write(df, mode="overwrite", partition_by=partition_by)
        elif not ManagedTable.is_managed_table(path):
            raise ValueError(
                f"{name}: pass df= to create, or use register() for an "
                "existing location"
            )
        self.register(name, path)
        return t

    def drop_table(self, name: str, purge: bool = False) -> None:
        """Unregister; ``purge=True`` also deletes the data directory."""
        schema, tbl = self._split(name)
        reg = self._load()
        entry = reg["schemas"].get(schema, {}).pop(tbl, None)
        self._save(reg)
        if entry and purge:
            import shutil

            shutil.rmtree(entry["location"], ignore_errors=True)

    # ------------------------------------------------------------------ #
    # lookup / session attach
    # ------------------------------------------------------------------ #

    def tables(self, schema: str | None = None) -> list[str]:
        reg = self._load()
        out = []
        for s, tbls in sorted(reg["schemas"].items()):
            if schema is not None and s != schema:
                continue
            out += [f"{s}.{t}" for t in sorted(tbls)]
        return out

    def location(self, name: str) -> str:
        schema, tbl = self._split(name)
        reg = self._load()
        try:
            return reg["schemas"][schema][tbl]["location"]
        except KeyError:
            raise KeyError(f"table not registered: {name}") from None

    def table(self, spark: SparkSession, name: str) -> ManagedTable:
        return ManagedTable.for_path(spark, self.location(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return self.table(spark, name).read()

    @staticmethod
    def view_name(name: str) -> str:
        schema, tbl = TableCatalog._split(name)
        return tbl if schema == _DEFAULT_SCHEMA else f"{schema}_{tbl}"

    def attach(self, spark: SparkSession, schema: str | None = None) -> list[str]:
        """Expose every registered table (optionally one schema) to
        ``spark.sql`` in THIS session; returns the view names created.
        The registry outlives sessions — this is the fresh-session
        re-attachment the reference gets from its metastore."""
        created = []
        for name in self.tables(schema):
            view = self.view_name(name)
            self.table(spark, name).create_view(view)
            created.append(view)
        return created
