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


def register(spark: SparkSession, manager: SecretManager | None = None) -> SecretManager:
    """Register all age functions + secret wiring into ``spark``.  Idempotent."""
    manager = manager or default_manager

    def _do_register() -> None:
        for name, udf in build_udfs(manager.snapshot()).items():
            spark.udf.register(name, udf)

    _do_register()

    key = id(spark)
    if _REGISTERED.get(key) is not manager:
        manager.add_listener(_do_register)
        _REGISTERED[key] = manager
    return manager
