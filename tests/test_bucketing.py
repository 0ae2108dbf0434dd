"""Bucketed-table co-located join: the 100 TB fact⋈fact strategy.

Writing both join sides bucketed by the join key lets Spark hash-join them
with ZERO shuffle exchanges — the physical proof that the engine's big-join
path scales by layout, not luck.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from duckdb_age_spark.plans import count_exchanges


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    wh = tempfile.mkdtemp(prefix="age_spark_wh_")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{wh}/orders_b")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/lineitem_b")
        .saveAsTable("lineitem_b")
    )
    yield wh
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    shutil.rmtree(wh, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = (
            spark.table("lineitem_b")
            .join(spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
            .select("l_orderkey", "l_quantity", "o_orderpriority")
        )
        assert count_exchanges(joined) == 0, "bucketed join must not shuffle"
        # and it still computes the right thing: same row count as the join
        # over the original (unbucketed) parquet
        n = joined.count()
        assert n == 6000  # lineitem rows at sf0.001, every item has an order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_groupby_has_no_shuffle(spark, warehouse):
    agg = spark.table("lineitem_b").groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert count_exchanges(agg) == 0, "groupBy on the bucket key must not shuffle"
    assert agg.count() > 0
