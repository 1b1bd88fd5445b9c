"""IO edge: schema-declared readers and export writers."""

from delta_lake_spark.io.readers import (
    from_pandas,
    from_rows,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
)
from delta_lake_spark.io.bucketed import colocated_join, write_bucketed
from delta_lake_spark.io.npy_source import register_npy_source
from delta_lake_spark.io.writers import (
    write_csv,
    write_jdbc,
    write_orc,
    write_parquet,
    write_single_csv,
)

__all__ = [
    "read_parquet",
    "read_orc",
    "read_csv",
    "read_json",
    "from_pandas",
    "from_rows",
    "write_parquet",
    "write_orc",
    "write_csv",
    "write_single_csv",
    "write_jdbc",
    "write_bucketed",
    "colocated_join",
    "register_npy_source",
]
