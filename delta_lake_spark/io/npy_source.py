"""Custom PySpark Python DataSource (Spark 4.x API): dense embedding
matrices stored as NumPy ``.npy`` shards.

Spark has no native reader for the ubiquitous embedding-dump format (one
float32 matrix per file).  This source maps a directory of shards — or a
single file — into ``(vec_id bigint, embedding array<float>)`` rows:

- **partition-parallel reads**: each shard is split into row-range
  ``InputPartition``\\ s (``rows_per_partition`` option); a worker memory-maps
  only its slice (``np.load(mmap_mode='r')``), so a 100-TB shard directory
  reads with the same executor parallelism as parquet and no shard is ever
  materialized whole.
- **vec_id filter pushdown** (``pushFilters``, Spark 4.1): =, <, <=, >, >=
  bounds prune whole row-range partitions at planning time, before any task
  launches.
- **Arrow-batched emission**: each partition yields one
  ``pyarrow.RecordBatch`` — no per-row Python loop.
- **distributed writer**: one ``part-NNNNN.npy`` shard per task plus an
  atomic ``_SHARDS`` manifest on commit; readers honor manifest order so a
  ``vec_id``-range-partitioned write round-trips losslessly.

``vec_id`` is positional: shards are ordered (manifest order, else sorted
filename), ids are assigned by global row offset.  That is exactly the
contract of on-disk ANN index dumps (faiss/scann style), where row position
IS the vector id.

Reference analog: the S5 ingest boundary of SURVEY.md §2 generalized to
binary tensor inputs — the embedding ingest edge of an LLM data pipeline.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

MANIFEST = "_SHARDS"

SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), nullable=False),
        StructField("embedding", ArrayType(FloatType(), containsNull=False), nullable=False),
    ]
)


def _npy_header(path: str) -> tuple[int, int]:
    """(rows, dim) from the .npy header only — no data read on the driver."""
    import numpy as np

    with open(path, "rb") as fh:
        version = np.lib.format.read_magic(fh)
        read_header = (
            np.lib.format.read_array_header_1_0
            if version == (1, 0)
            else np.lib.format.read_array_header_2_0
        )
        shape, fortran, dtype = read_header(fh)
    if len(shape) != 2:
        raise ValueError(f"{path}: expected a 2-D embedding matrix, got shape {shape}")
    if fortran:
        raise ValueError(f"{path}: Fortran-ordered arrays are not supported")
    return int(shape[0]), int(shape[1])


def _shard_paths(path: str) -> list[str]:
    """Shards in id-assignment order: manifest order if present (writer
    output), else sorted ``*.npy`` filenames."""
    if os.path.isfile(path):
        return [path]
    manifest = os.path.join(path, MANIFEST)
    if os.path.exists(manifest):
        with open(manifest) as fh:
            names = [ln.strip() for ln in fh if ln.strip()]
        return [os.path.join(path, n) for n in names]
    paths = sorted(glob.glob(os.path.join(path, "*.npy")))
    if not paths:
        raise FileNotFoundError(f"no .npy shards under {path}")
    return paths


@dataclass
class _RowRange(InputPartition):
    path: str
    start_row: int  # offset within the shard
    start_id: int  # global vec_id of start_row
    n_rows: int


class NpyReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("npy source requires a path")
        self.rows_per_partition = int(options.get("rows_per_partition", 65536))
        self.lo = None  # inclusive pushed lower bound on vec_id
        self.hi = None  # inclusive pushed upper bound on vec_id

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        for f in filters:
            if getattr(f, "attribute", None) != ("vec_id",):
                yield f
                continue
            if isinstance(f, EqualTo):
                self.lo = max(self.lo, f.value) if self.lo is not None else f.value
                self.hi = min(self.hi, f.value) if self.hi is not None else f.value
            elif isinstance(f, GreaterThan):
                lo = f.value + 1
                self.lo = max(self.lo, lo) if self.lo is not None else lo
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, f.value) if self.lo is not None else f.value
            elif isinstance(f, LessThan):
                hi = f.value - 1
                self.hi = min(self.hi, hi) if self.hi is not None else hi
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, f.value) if self.hi is not None else f.value
            elif isinstance(f, IsNotNull):
                pass  # positional ids are never null — consumed for free
            else:
                yield f  # In / Not / ... stay Spark-side

    def partitions(self):
        out = []
        offset = 0
        for p in _shard_paths(self.path):
            rows, _dim = _npy_header(p)
            for start in range(0, rows, self.rows_per_partition):
                n = min(self.rows_per_partition, rows - start)
                first_id, last_id = offset + start, offset + start + n - 1
                if self.lo is not None and last_id < self.lo:
                    continue  # pruned at planning time
                if self.hi is not None and first_id > self.hi:
                    continue
                out.append(_RowRange(p, start, first_id, n))
            offset += rows
        return out

    def read(self, partition: _RowRange):
        import numpy as np
        import pyarrow as pa

        mat = np.load(partition.path, mmap_mode="r")
        start, n = partition.start_row, partition.n_rows
        first_id = partition.start_id
        # Exact bound trim within the coarse row-range partition.
        if self.lo is not None and first_id < self.lo:
            shift = self.lo - first_id
            start, n, first_id = start + shift, n - shift, self.lo
        if self.hi is not None and first_id + n - 1 > self.hi:
            n = self.hi - first_id + 1
        if n <= 0:
            return
        block = np.ascontiguousarray(mat[start : start + n], dtype=np.float32)
        ids = pa.array(range(first_id, first_id + n), type=pa.int64())
        flat = pa.array(block.reshape(-1), type=pa.float32())
        offsets = pa.array(range(0, (n + 1) * block.shape[1], block.shape[1]), type=pa.int32())
        embeddings = pa.ListArray.from_arrays(offsets, flat)
        yield pa.RecordBatch.from_arrays([ids, embeddings], ["vec_id", "embedding"])


@dataclass
class _ShardCommit(WriterCommitMessage):
    filename: str
    rows: int


class NpyWriter(DataSourceArrowWriter):
    """One ``part-NNNNN.npy`` shard per task; ``commit`` writes the
    ``_SHARDS`` manifest atomically (tmp + rename) so readers only ever see
    a complete shard set.  Task files are keyed by partition id, so
    speculative/retried tasks overwrite rather than duplicate."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("npy sink requires a path")
        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        import numpy as np
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        blocks, dims = [], set()
        for b in iterator:
            col = b.column(b.schema.get_field_index("embedding"))
            lens = np.diff(col.offsets.to_numpy())
            if len(lens) == 0:
                continue
            uniq = np.unique(lens)
            dims.update(int(x) for x in uniq)
            if len(dims) > 1:
                raise ValueError(f"ragged embedding lengths in one shard: {sorted(dims)}")
            # flatten() respects slicing, so vals lines up with lens exactly
            vals = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
            blocks.append(vals.reshape(len(lens), int(uniq[0])))
        name = f"part-{pid:05d}.npy"
        dim = dims.pop() if dims else 0
        mat = (
            np.concatenate(blocks, axis=0)
            if blocks
            else np.empty((0, dim), dtype=np.float32)
        )
        np.save(os.path.join(self.path, name), mat)
        return _ShardCommit(name, int(mat.shape[0]))

    def commit(self, messages):
        nonempty = [m for m in messages if m.rows > 0]
        tmp = os.path.join(self.path, MANIFEST + ".tmp")
        with open(tmp, "w") as fh:
            for m in sorted(nonempty, key=lambda m: m.filename):
                fh.write(m.filename + "\n")
        os.replace(tmp, os.path.join(self.path, MANIFEST))

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except OSError:
                pass


class NpyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "npy"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return NpyReader(self.options)

    def writer(self, schema, overwrite: bool):
        names = [f.name for f in schema.fields]
        if names != ["vec_id", "embedding"]:
            raise ValueError(f"npy sink expects (vec_id, embedding), got {names}")
        return NpyWriter(self.options)


def register_npy_source(spark) -> None:
    """Idempotent registration: ``spark.read.format('npy')`` afterwards.

    Python-data-source filter pushdown is gated off by default in Spark
    4.1; flip it on so ``pushFilters`` participates in planning (the
    reader also works unpushed — Spark then just re-applies the filters)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(NpyDataSource)
