"""``register(spark)`` — the PySpark analog of ``LOAD 'age'``.

Mirrors the reference's LoadInternal (reference: src/age_extension.cpp:439-476):
registers the secret machinery and the six scalar functions into the Spark SQL
function registry, after which both the SQL surface
(``spark.sql("SELECT age_encrypt(...)")``) and the column API
(:mod:`duckdb_age_spark.functions`) work.

Re-registration on secret mutation: UDF closures are serialized to executors
at registration time, so the secret map they see is a snapshot.  A listener on
the SecretManager re-registers all six UDFs (cheap, driver-side) after every
create/drop, keeping executors consistent with the driver registry.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .functions import build_udfs
from .secrets import SecretManager, default_manager

_REGISTERED: dict[int, SecretManager] = {}


def register(
    spark: SparkSession,
    manager: SecretManager | None = None,
    arrow_batch_size: int | None = 1000,
) -> SecretManager:
    """Register all age functions + secret wiring into ``spark``.  Idempotent.

    ``arrow_batch_size`` tunes ``spark.sql.execution.arrow.maxRecordsPerBatch``
    (performance-only; pass ``None`` to leave the session untouched).  Measured
    round 3 (scripts/bench_crypto_shapes.py): at realistic partition sizes
    (>=10k rows/partition — the shape a 100 TB table feeds each task) the
    default 10000-row batch serializes 20 MB chunks through the JVM->Arrow->
    Python pipe with poor overlap; 1000-row batches pipeline the transfer
    against the Python crypto kernel for 2.4-4.1x encrypt throughput
    (2 KiB rows: 64->262 MB/s aggregate; 64 KiB rows: 363->1030 MB/s on
    local[32]).  At the small-partition bench shape (~156 rows/partition)
    everything fits one batch either way and the setting is a no-op.
    """
    manager = manager or default_manager
    if arrow_batch_size is not None:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_size)
        )

    def _do_register() -> None:
        for name, udf in build_udfs(manager.snapshot()).items():
            spark.udf.register(name, udf)

    _do_register()

    key = id(spark)
    if _REGISTERED.get(key) is not manager:
        manager.add_listener(_do_register)
        _REGISTERED[key] = manager
    return manager
