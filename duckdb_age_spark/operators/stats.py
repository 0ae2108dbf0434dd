"""Statistical summary operators with cross-engine-exact arithmetic.

The discipline these operators share (and that `operators/text.py`'s
quality score established): never oracle-compare a float that an engine
ROUNDED — either keep values as exact integers end-to-end, or emit the
unrounded double produced by identical IEEE operations on identical exact
integers.  Sums of doubles are banned from compared columns (summation
order differs across engines/partitions); sums of integer cents are exact
and reduce map-side like any long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def price_histogram(orders: DataFrame, bucket_cents: int = 2_500_000) -> DataFrame:
    """Fixed-width histogram of order totals ($25k buckets by default).

    All arithmetic is integer: prices become cents with one multiply+cast
    (identical IEEE steps in both engines), bucketing is integer division,
    and per-bucket revenue is an exact long sum of cents divided once at
    the end.  Map-side combinable single shuffle; bucket count is bounded
    by the price range, not the data size.
    """
    # round() before the cast: double→int casting TRUNCATES in Spark but
    # ROUNDS in DuckDB, so 68423.46*100 = 6842345.999... would land on
    # different cents without it.  A 2-dp price's double never produces an
    # exact .5 product, so half-rounding rules can't diverge.
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        orders.select(cents.alias("cents"))
        .withColumn("bucket", F.expr(f"cents DIV {bucket_cents}"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            F.col("bucket").cast("bigint"),
            F.col("n_orders").cast("bigint"),
            (F.col("sum_cents") / F.lit(100.0)).alias("revenue"),
        )
    )


def _exact_sums(df: DataFrame, group: str, x, y):
    """n, Σx, Σy, Σx², Σy², Σxy as exact decimal aggregates of integer
    inputs (decimal(38,0) so 100 TB row counts can't overflow int64)."""
    d = df.select(
        group,
        x.cast("decimal(38,0)").alias("x"),
        y.cast("decimal(38,0)").alias("y"),
    )
    return d.groupBy(group).agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )


def corr_exact(df: DataFrame, group: str, x, y) -> DataFrame:
    """Pearson correlation from exact integer sums.

    Built-in ``corr()`` accumulates doubles in partition order — its last
    ulp differs between engines, which poisons hash comparison.  Here the
    six sufficient statistics are EXACT (decimal sums of integers); the
    final formula is a fixed sequence of IEEE double ops on identical
    inputs, hence bit-identical in any engine.  Same single-shuffle shape
    as any hash aggregate.
    """
    s = _exact_sums(df, group, x, y)
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxx, syy, sxy = (F.col(c).cast("double") for c in ("sxx", "syy", "sxy"))
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return s.select(group, corr.alias("corr_xy"))
