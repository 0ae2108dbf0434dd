"""As-of and range joins — operators Spark lacks natively (DuckDB grew an
ASOF JOIN; the oracle uses it, pinning our semantics to the host engine the
reference rides on).

Scale design:

* ``asof_join`` uses the union+window trick: tag both sides, union, one
  window over (key, time) carrying the right side's last values forward,
  keep left rows.  ONE shuffle on the key — the classic alternative to the
  quadratic "join then pick max" formulation, and the only formulation that
  survives a 100 TB fact side (state per key is O(1) in the running window).
* ``range_join_bucketed`` joins on a derived equi bucket first so Spark uses
  a hash join instead of BroadcastNestedLoopJoin; the residual range
  predicate filters after the hash probe.  For a small range table the
  bucket table is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row (same key,
    right_ts <= left_ts).  Right-side values arrive as ``<col><suffix>``,
    NULL when no earlier right row exists.

    Implementation: union both sides ordered by (key, ts, side) with right
    rows sorting BEFORE left rows at equal timestamps (inclusive as-of), then
    ``last(value, ignorenulls)`` over the running window.
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols],
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    return (
        filled.where(F.col("_side") == 1)
        .select(*lcols, *[F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in value_cols])
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_next",
) -> DataFrame:
    """Forward as-of: for each left row, attach the EARLIEST right row with
    the same key and right_ts >= left_ts (the "next event" lookup — next
    shipment after an order, next price tick after a trade).  Right values
    arrive as ``<col><suffix>`` plus ``<right_ts><suffix>`` so callers can
    apply a tolerance; all NULL when no later right row exists.

    Mirror of :func:`asof_join`: union both sides, one window per key
    ordered by (ts, side) with right rows sorting AFTER left rows at equal
    timestamps (inclusive), ``first(value, ignorenulls)`` over the
    CURRENT-TO-FOLLOWING frame.  Same single-shuffle scale shape.
    """
    lcols = left.columns
    rtypes = dict(right.dtypes)
    carry = list(dict.fromkeys(value_cols + [right_ts]))  # right_ts always carried
    tagged_left = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(rtypes[c]).alias(f"{c}{suffix}") for c in carry],
    )
    tagged_right = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols],
        *[F.col(c).alias(f"{c}{suffix}") for c in carry],
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = unioned.select(
        "*",
        *[
            F.first(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in carry
        ],
    )
    return filled.where(F.col("_side") == 0).select(
        *lcols, *[F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in carry]
    )


def range_join_bucketed(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join fact rows to [lo, hi) ranges via bucketed equi-join + residual
    predicate.  ``ranges`` must be small enough to broadcast after bucket
    expansion (one row per covered bucket)."""
    expanded = ranges.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.ceil(F.col(hi_col) / bucket_width).cast("long"),
            )
        ).alias("_bucket"),
    )
    bucketed_fact = fact.withColumn(
        "_bucket", F.floor(F.col(value_col) / bucket_width).cast("long")
    )
    return (
        bucketed_fact.join(F.broadcast(expanded), "_bucket")
        .where((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("_bucket")
    )
