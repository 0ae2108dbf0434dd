"""Parquet table reader for the driver's TPC-H-ish test tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; normalizes the events.ts TIMESTAMP(NANOS) column
    (read as long, truncated ns→µs with integer DIV — exact)."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
