"""Lineage truncation with a fault-tolerance switch.

Several query plans need their logical lineage CUT, not just their results
cached: iterative algorithms (q73 PageRank, q103 pointer-doubling) grow an
unbounded plan chain per round, and multi-job consumers (p03's two exact
global-ranking stages) re-run Catalyst over the full upstream plan per job.
``persist()`` bounds re-EXECUTION but not re-PLANNING; checkpointing bounds
both.

The default is ``localCheckpoint(eager=True)``: blocks live on executors,
no checkpoint directory needed, fastest. The documented trade (ADVICE r6)
is fault tolerance — a lost executor cannot recompute a locally
checkpointed block because the lineage is gone, so on a real multi-node
cluster a long pipeline dies unrecoverably instead of recomputing. Set
``SPARK_GRAFT_RELIABLE_CHECKPOINT=1`` to switch every call site to
RELIABLE ``checkpoint(eager=True)`` — blocks go to the checkpoint
directory (set ``spark.checkpoint.dir`` / ``setCheckpointDir`` to a
cluster-visible path such as HDFS/S3; a session-local tmp dir is
provisioned when unset so the flag also works out of the box locally).
Same values, same lineage cut, survives executor loss.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

_ENV_FLAG = "SPARK_GRAFT_RELIABLE_CHECKPOINT"


def _reliable() -> bool:
    return os.environ.get(_ENV_FLAG, "0") == "1"


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        master = sc.master or ""
        if not master.startswith("local"):
            # On a real cluster a driver-local tmp dir is NOT shared
            # storage: executors would write checkpoint blocks to
            # node-local paths and the reliability the flag advertises
            # would be silently absent. Fail fast instead (ADVICE r7).
            raise RuntimeError(
                f"{_ENV_FLAG}=1 on non-local master {master!r} requires a "
                "cluster-visible checkpoint dir (HDFS/S3): call "
                "sparkContext.setCheckpointDir() or set spark.checkpoint.dir"
            )
        import warnings

        # local fallback so the flag works without cluster setup; the dir
        # lives for the JVM's lifetime (session-scoped scratch, not durable)
        path = tempfile.mkdtemp(prefix="spark_graft_ckpt_")
        warnings.warn(
            f"reliable checkpoint dir unset; provisioned local tmp dir "
            f"{path} (session-scoped — point setCheckpointDir at shared "
            "storage on a real cluster)",
            stacklevel=3,
        )
        sc.setCheckpointDir(path)


def pin(df: DataFrame) -> DataFrame:
    """Materialize ``df`` eagerly and TRUNCATE its lineage.

    localCheckpoint by default (fastest, session-scoped);
    reliable checkpoint when ``SPARK_GRAFT_RELIABLE_CHECKPOINT=1``
    (survives executor loss on a multi-node cluster).

    The pinned blocks live for the SESSION unless released: an iterative
    loop that pins every round (q73 PageRank, q75 pointer doubling) must
    ``unpin`` the superseded round once the next one is materialized, or a
    long-lived session accumulates every round of every run — the r8
    scale100 refresh (3 timed executions of a 10-round loop over a 15M-row
    graph) ran the JVM into GC-locker storms and shuffle-file loss exactly
    this way.  pin() records the block-manager RDD ids it created on the
    returned DataFrame so unpin() can free precisely those blocks.  (The
    before/after diff assumes pins are not created concurrently from other
    driver threads — true for this engine's single-threaded query
    functions.)
    """
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    if _reliable():
        _ensure_checkpoint_dir(df)
        out = df.checkpoint(eager=True)
    else:
        out = df.localCheckpoint(eager=True)
    after = sc._jsc.getPersistentRDDs().keySet().toArray()
    out._pin_rdd_ids = [int(i) for i in after if int(i) not in before]
    return out


def unpin(df: DataFrame) -> None:
    """Release the blocks of a DataFrame previously returned by ``pin``.

    Safe only once every consumer of ``df`` has materialized (the lineage
    was truncated, so the blocks are the ONLY copy of the data).  No-op for
    frames that pin() did not produce.
    """
    ids = getattr(df, "_pin_rdd_ids", None)
    if not ids:
        return
    rdds = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        r = rdds.get(i)
        if r is not None:
            r.unpersist(False)
    df._pin_rdd_ids = []
