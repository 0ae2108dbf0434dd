"""Sources & sinks.

* ``read_table`` — schema-normalizing reader for the driver-provided parquet
  tables (handles the TIMESTAMP(NANOS) events column Spark 4 refuses).
* ``write_encrypted`` / ``read_encrypted`` — parquet sink/source with
  age-encrypted columns: the Spark-native analog of the reference's
  encrypt-on-write pipelines (reference: FUNCTIONS.md pipeline examples).
"""

from .compact import compact_parquet, parquet_data_size
from .encrypted import read_encrypted, write_encrypted
from .tables import read_table
from .upsert import apply_cdc_parquet, upsert_parquet

__all__ = [
    "compact_parquet",
    "parquet_data_size",
    "read_encrypted",
    "read_table",
    "apply_cdc_parquet",
    "upsert_parquet",
    "write_encrypted",
]
