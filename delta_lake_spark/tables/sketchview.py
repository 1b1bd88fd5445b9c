"""Incremental DISTINCT-COUNT materialized views via mergeable HLL sketches.

:mod:`~delta_lake_spark.tables.matview` maintains the abelian-group
aggregates (count/sum) from the signed change feed and documents
non-invertible aggregates as out of scope.  This module closes the most
important of those — per-key ``COUNT(DISTINCT x)`` — with the industry-
standard answer: store a MERGEABLE sketch per key (Spark's built-in
Apache DataSketches HLL, ``hll_sketch_agg`` / ``hll_union``) instead of
the raw value set.

Maintenance algebra (sketches are add-monotone — union only, no inverse):

- **pure-insert keys**: the new rows' sketch unions into the stored sketch
  (``hll_union``) and the row count adds — O(changed rows), exactly like
  the sum view;
- **keys touched by a delete/update pre-image**: an HLL cannot "remove" a
  value, so those keys are RE-AGGREGATED from the base — but only those
  keys (a semi-join against the base, file-stats-prunable), never the
  whole table; keys whose rows all vanished are deleted from the view via
  a MERGE delete clause.

At 100 TB an append-mostly base pays sketch-union cost only; the bounded
recompute touches the deleted keys' slice.  Estimates are exact while a
key's sketch is in exact (list/set) mode and ~2% beyond — the standard
HLL contract; ``read()`` exposes ``<alias>`` as the estimate and keeps the
binary sketch available for further rollup unions.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_spark.tables.managed import ManagedTable

_STATE_FILE = "_sketch_view_state.json"


class IncrementalSketchView:
    """A managed table of per-key HLL distinct-count sketches over ``base``.

    ``keys``: grouping columns (non-null in the base).
    ``ndv``: ``{output_alias: source_column}`` distinct-counted columns.
    A row count ``n`` is always maintained (needed to detect vanished keys).
    """

    def __init__(
        self,
        spark: SparkSession,
        base: ManagedTable,
        path: str,
        keys: list[str],
        ndv: dict[str, str],
    ):
        if not keys:
            raise ValueError("at least one grouping key is required")
        if not ndv:
            raise ValueError("at least one distinct-counted column is required")
        clash = (set(ndv) & set(keys)) | ({"n"} & set(ndv))
        if clash or "n" in keys:
            raise ValueError(f"alias collision: {sorted(clash | {'n'})}")
        self.spark = spark
        self.base = base
        self.path = os.path.abspath(path)
        self.keys = list(keys)
        self.ndv = dict(ndv)
        self.table = ManagedTable(spark, self.path)

    # ------------------------------------------------------------------ #

    def _state_path(self) -> str:
        return os.path.join(self.path, _STATE_FILE)

    def last_refreshed_version(self) -> int | None:
        try:
            with open(self._state_path()) as f:
                return json.load(f)["base_version"]
        except FileNotFoundError:
            return None

    def _record(self, base_version: int) -> None:
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"base_version": base_version}, f)
        os.replace(tmp, self._state_path())  # atomic on POSIX

    def _sketch_agg(self, df: DataFrame) -> DataFrame:
        # enforce the documented non-null-key precondition (matview's
        # rationale: MERGE matches on SQL equality, a NULL group key would
        # silently duplicate the NULL group's view row every refresh)
        cond = None
        for k in self.keys:
            c = F.col(k).isNull()
            cond = c if cond is None else (cond | c)
        if df.filter(cond).limit(1).count():
            raise ValueError(
                f"IncrementalSketchView: NULL value in grouping key(s) "
                f"{self.keys}; incremental view maintenance requires "
                "non-null keys (MERGE matches on SQL equality)."
            )
        return df.groupBy(*self.keys).agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.hll_sketch_agg(F.col(src)).alias(alias)
                for alias, src in self.ndv.items()
            ],
        )

    # ------------------------------------------------------------------ #

    def refresh(self) -> dict[str, Any]:
        """Bring the view up to the base head.  Returns refresh stats."""
        base_head = self.base.latest_version()
        if base_head is None:
            raise FileNotFoundError(f"base is not a table: {self.base.path}")
        last = self.last_refreshed_version()
        if last is None:
            self.table.write(self._sketch_agg(self.base.read()), mode="overwrite")
            self._record(base_head)
            return {"mode": "full", "base_version": base_head}
        if last >= base_head:
            return {"mode": "noop", "base_version": last}

        # The union merge's txn marker is the DURABLE progress record for
        # the non-idempotent `n += s.n` / hll_union step: after a crash
        # between that merge and _record, the marker is ahead of the state
        # file, and the union window must resume FROM THE MARKER (re-
        # applying it would double-count) — while del_keys still derive
        # from the full recorded window, because the recompute/gone steps
        # re-aggregate from the CURRENT base and are idempotent.
        applied = self.table.last_txn_batch("sketchview-union")
        union_from = max(last, applied) if applied is not None else last

        changes = self.base.signed_changes(last, base_head).persist()
        try:
            # keys with any removed pre-image need recompute (no HLL inverse);
            # rewritten-but-unchanged rows appear with BOTH signs, so their key
            # lands here too — recompute is correct (if pessimistic) for them
            del_keys = (
                changes.filter(F.col("_sign") < 0).select(*self.keys).distinct()
            ).persist()
            if union_from < base_head:
                union_changes = (
                    changes
                    if union_from == last
                    else self.base.signed_changes(union_from, base_head)
                )
                pure_inserts = union_changes.filter(F.col("_sign") > 0).join(
                    del_keys, self.keys, "left_anti"
                )
                delta = self._sketch_agg(pure_inserts)
                union_set = {"n": "t.n + s.n"} | {
                    a: f"hll_union(t.{a}, s.{a})" for a in self.ndv
                }
                self.table.merge(
                    delta,
                    keys=self.keys,
                    update_set=union_set,
                    txn_app="sketchview-union",
                    txn_batch=base_head,
                )

            n_recompute = del_keys.count()
            if n_recompute:
                # bounded recompute: only the touched keys' slice of the base
                recomputed = self._sketch_agg(
                    self.base.read().join(del_keys, self.keys, "left_semi")
                )
                self.table.merge(
                    recomputed,
                    keys=self.keys,
                    txn_app="sketchview-recompute",
                    txn_batch=base_head,
                )
                gone = del_keys.join(recomputed, self.keys, "left_anti").select(
                    *self.keys,
                    F.lit(None).cast("bigint").alias("n"),
                    *[F.lit(None).cast("binary").alias(a) for a in self.ndv],
                )
                if not gone.isEmpty():
                    self.table.merge(
                        gone,
                        keys=self.keys,
                        when_matched="delete",
                        when_not_matched="ignore",
                        txn_app="sketchview-gone",
                        txn_batch=base_head,
                    )
        finally:
            changes.unpersist()
            del_keys.unpersist()
        self._record(base_head)
        return {
            "mode": "incremental",
            "base_version": base_head,
            "from": last,
            "recomputed_keys": n_recompute,
        }

    # ------------------------------------------------------------------ #

    def read(self) -> DataFrame:
        """Per-key row with ``n`` and one ESTIMATE column per alias (the
        binary sketches stay in the underlying table for further rollups)."""
        t = self.table.read()
        return t.select(
            *self.keys,
            "n",
            *[
                F.hll_sketch_estimate(F.col(a)).alias(a)
                for a in self.ndv
            ],
        )

    def read_sketches(self) -> DataFrame:
        return self.table.read()
