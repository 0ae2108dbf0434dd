from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("duckdb-age-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def reliable_ckpt_dir(tmp_path_factory) -> str:
    """ONE checkpoint dir for every reliable-checkpoint test: Spark keeps a
    single GLOBAL checkpoint dir per SparkContext and truncate_lineage sets
    it only when unset, so two tests each passing their own tmp_path would
    race on test order — the first wins and the second's dir stays empty
    (broke test_iterative_ops_reliable_checkpoint_mode when the r15
    pairs-operator checkpoint test landed).  Sharing the fixture makes
    "requested dir == effective dir" hold regardless of ordering."""
    return str(tmp_path_factory.mktemp("reliable_ckpt"))


@pytest.fixture()
def manager(spark):
    """Fresh SecretManager registered into spark for each test."""
    from duckdb_age_spark.register import register
    from duckdb_age_spark.secrets import SecretManager

    m = SecretManager()
    register(spark, m)
    return m


# Reference fixture keypair-1 (reference: test/sql/age.test:44) — a real,
# valid pair: our crypto derives exactly this public key from the private key.
PUB1 = "age1j2tqev8spvn9s9ktkr750ntl03sy20f7dck0mdyetway3cj2naasngwz3u"
PRIV1 = "AGE-SECRET-KEY-1DMYUTPVUSD3M7HMU4K5KXNZ65JZVC9J04MSVV2J8Y4NE8GZCVU6ST7DRT2"
# Reference fixture keypair-2 (reference: test/sql/age_secret.test:18-19).
# NOTE: its private key has an invalid bech32 checksum — the reference only
# ever passes it through secret storage (prefix validation, never parsed), so
# tests may store it but must not decrypt with it.
PUB2 = "age1ql3z7hjy54pw3hyww5ayyfg7zqgvc7w3j2elw8zmrj2kg5sfn9aqmcac8p"
PRIV2 = "AGE-SECRET-KEY-1QTAYQ69LA4P3QQN0VQPSJMG2WHVSQPQ3SG2F55M0XWDE9VQN0SZQCGUGJ8"
