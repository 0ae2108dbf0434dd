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

# Registration marker attribute set on the SparkSession object itself
# (ADVICE r15): the previous id(spark)-keyed module dict was never pruned,
# so a garbage-collected session whose CPython address was reused by a NEW
# session aliased the stale entry and register(new_spark) returned without
# registering anything.  An attribute lives and dies with the session —
# aliasing is impossible by construction.
_REGISTERED_ATTR = "_duckdb_age_registered_manager"


def registered_manager(spark: SparkSession) -> SecretManager | None:
    """The SecretManager ``register()`` bound to this session, or None."""
    return getattr(spark, _REGISTERED_ATTR, None)

# Matches any bech32 age identity literal.  Plan-text redaction is
# defense-in-depth for every path that puts an identity into a plan
# LITERAL: raw keys users pass explicitly (Python or JVM path), and the
# driver-side resolution fallbacks (sources/encrypted._python_crypto_expr
# with an explicit manager; jvm.decrypt_col with a non-registered manager).
# Installed by BOTH register() and jvm.register_jvm_crypto() — ADVICE r10:
# a python-only session must not depend on the JVM seam for its redaction.
IDENTITY_REDACTION_REGEX = "AGE-SECRET-KEY-1[0-9A-Z]+"


def install_identity_redaction(spark: SparkSession) -> None:
    """Install ``spark.sql.redaction.string.regex`` covering
    ``AGE-SECRET-KEY-1...`` literals: QueryExecution wraps every explain
    string (and the UI SQL tab's plan description) in ``withRedaction``, so
    an embedded identity literal renders as ``*********(redacted)`` instead
    of the raw key.  An existing user regex is preserved by alternation.
    Event-log plan nodes go through the same explainString path;
    executor-side values are of course still the real key (that is the
    point), so treat cluster logs accordingly."""
    conf_key = "spark.sql.redaction.string.regex"
    try:
        existing = spark.conf.get(conf_key, None)
        if not existing:
            spark.conf.set(conf_key, IDENTITY_REDACTION_REGEX)
        elif IDENTITY_REDACTION_REGEX not in existing:
            spark.conf.set(conf_key, f"{existing}|{IDENTITY_REDACTION_REGEX}")
    except Exception:
        # redaction is defense-in-depth for DISPLAY only; never fail
        # registration over a conf the deployment may have locked down
        pass


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

    # True idempotence (r15 optimization round): when this session is
    # already registered with this manager, the six UDFs are current by
    # construction — registration installed them and the mutation listener
    # re-registers on every secret create/drop — so repeat calls skip the
    # build_udfs + six spark.udf.register py4j round-trips (~140 ms/call;
    # the driver contract calls register() once per query invocation, so
    # across a 193-query x 3-rep bench this was ~80 s of pure
    # re-registration).  A DIFFERENT manager still re-registers in full.
    if getattr(spark, _REGISTERED_ATTR, None) is manager:
        return manager

    def _do_register() -> None:
        for name, udf in build_udfs(manager.snapshot()).items():
            spark.udf.register(name, udf)

    _do_register()
    install_identity_redaction(spark)

    if getattr(spark, _REGISTERED_ATTR, None) is not manager:
        manager.add_listener(_do_register)
        setattr(spark, _REGISTERED_ATTR, manager)
    return manager
