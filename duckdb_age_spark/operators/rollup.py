"""Hypertable-style time-bucket rollups + grouping-set aggregates.

``time_bucket`` floors timestamps to fixed-width buckets via epoch
arithmetic (identical in DuckDB — the oracle replays the same expression, no
reliance on engine-specific time_bucket builtins).  ``continuous_rollup``
materializes multiple granularities in one pass over the fact table — the
batch shape of a streaming continuous aggregate.

Scale: each granularity is a partial-aggregated groupBy; the multi-grain
union aggregates the COARSER grains from the finest rollup, not the raw
facts, so the raw table is scanned exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .exact import exact_sum, units


def time_bucket(ts: Column, width_sec: int) -> Column:
    """Floor ``ts`` to a ``width_sec`` bucket (epoch-truncation arithmetic)."""
    sec = ts.cast("long")
    return F.timestamp_seconds((sec - sec % width_sec).cast("long"))


GRAINS = {"5min": 300, "1hour": 3600, "1day": 86400}


def continuous_rollup(events: DataFrame, grains: dict[str, int] | None = None) -> DataFrame:
    """Multi-granularity rollup of events: (grain, bucket, event_type,
    n_events, total_value).  The finest grain aggregates the raw facts; each
    coarser grain re-aggregates the previous rollup (classic rollup cascade —
    one fact scan, tiny follow-on aggregations)."""
    grains = grains or GRAINS
    ordered = sorted(grains.items(), key=lambda kv: kv[1])

    finest_name, finest_sec = ordered[0]
    finest = (
        events.groupBy(
            time_bucket(F.col("ts"), finest_sec).alias("bucket"), F.col("event_type")
        )
        .agg(F.count("*").alias("n_events"), F.sum(units("value").cast("decimal(38,0)")).alias("vc"))
        .withColumn("grain", F.lit(finest_name))
    )
    out = finest
    prev = finest
    for name, sec in ordered[1:]:
        nxt = (
            prev.groupBy(time_bucket(F.col("bucket"), sec).alias("bucket"), "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("vc").alias("vc"),
            )
            .withColumn("grain", F.lit(name))
        )
        out = out.unionByName(nxt)
        prev = nxt
    # exact cents carried through EVERY grain; one terminal int->double
    # division so re-aggregated coarse grains can't drift by summation order
    return out.select(
        "grain", "bucket", "event_type", "n_events",
        (F.col("vc").cast("double") / 100.0).alias("total_value"),
    )


def revenue_grouping_sets(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """ROLLUP(n_name, o_orderpriority) revenue — grouping-set aggregation
    parity with the host engine (DuckDB ROLLUP in the oracle)."""
    joined = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.rollup("n_name", "o_orderpriority")
        .agg(exact_sum(units("o_totalprice"), 100.0, "revenue"), F.count("*").alias("n_orders"))
        .orderBy(
            F.col("n_name").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first()
        )
    )


def priority_status_cube(orders: DataFrame) -> DataFrame:
    """CUBE over (priority, status): all four grouping combinations in one
    pass — Spark expands the cube map-side, so it is still one shuffle with
    partial aggregation, output size bounded by the attribute domains."""
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), exact_sum(units("o_totalprice"), 100.0, "total_price"))
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(), F.col("o_orderstatus").asc_nulls_first()
        )
    )


def gapfill_hourly(events, event_type: str = "signup"):
    """Time-series gap filling: hourly counts of one event type with MISSING
    hours materialized as zero rows — the hypertable `time_bucket_gapfill`
    analog.  The hour spine is generated with sequence() between the
    observed min/max (a 1-row broadcast), exploded, and left-joined to the
    actual counts; no UDFs, no driver-side loop.

    Scale shape: the spine is tiny (hours between bounds) while the counts
    aggregation is the only corpus-sized shuffle; the spine join broadcasts.
    """
    from pyspark.sql import functions as F

    h = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count("*").alias("n_events"))
    )
    bounds = h.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr")
    )
    return (
        spine.join(h, "hr", "left")
        .select(
            F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


def rolling_window_1h(events: DataFrame) -> DataFrame:
    """Per-user rolling one-hour trailing aggregates via a RANGE-interval
    window frame: for every event, the count and integer-cent value sum of
    the SAME USER's events in (ts - 1h, ts] — the time-series feature shape
    (trailing activity, velocity checks) a fixed-width tumbling bucket
    cannot express because every row needs its own window.

    Determinism: the frame is ordered by microsecond epoch (integer — no
    truncation ties beyond true duplicates, and RANGE includes ALL rows at
    an equal timestamp in both engines); the value sum is integer cents, so
    accumulation order cannot flip a bit.

    Scale shape: one shuffle keyed by user_id, then a linear sliding-frame
    scan per partition — Spark's range-frame implementation keeps a moving
    window over the sorted run, O(n) per user, state bounded by the hour's
    rows.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000 + 1, 0)  # (ts - 1h, ts] — half-open like session windows
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return events.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_1h"),
        F.sum(cents).over(w).cast("bigint").alias("cents_1h"),
    )


def time_weighted_avg(events: DataFrame, bucket_sec: int = 3600) -> DataFrame:
    """Time-weighted average of ``value`` per (event_type, bucket) over
    irregularly-spaced events — the TimescaleDB ``time_weight`` analog that
    completes this module's hypertable set (bucketing, gap-fill, rollup):
    a plain avg() over-weights bursts; TWAP weights each observation by how
    long it was the latest one.

    Semantics: each observation holds until the next one of the same type
    (last-observation-carried-forward); its weight is that µs interval,
    assigned to the bucket of the interval START (intervals are not split
    at bucket edges — documented approximation, same on both engines).
    The final observation per type has no successor and is excluded.

    Determinism: values fix to integer milli-units, intervals are exact µs
    longs, and the weighted sums accumulate as decimal(38,0) — exact at any
    partitioning (Σ v·dt can exceed 2⁵³, where a double sum would round by
    accumulation ORDER; the one exact-integer→double conversion at the end
    rounds identically in every engine).  Shape: one window shuffle keyed
    by event_type (lead), one map-side-combined aggregate.
    Returns (event_type, bucket_us, n_intervals, twap).
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts"))
    vm = F.round(F.col("value") * 1000, 0).cast("long")
    w = Window.partitionBy("event_type").orderBy("tus", "event_id")
    d = (
        events.select("event_type", "event_id", us.alias("tus"), vm.alias("vm"))
        .withColumn("dt", F.lead("tus").over(w) - F.col("tus"))
        .where(F.col("dt").isNotNull())
    )
    bucket_us = int(bucket_sec) * 1_000_000
    return (
        d.select(
            "event_type",
            (F.col("tus") - F.col("tus") % bucket_us).alias("bucket_us"),
            F.col("vm").cast("decimal(38,0)").alias("vmd"),
            F.col("dt").cast("decimal(38,0)").alias("dtd"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            F.sum(F.col("vmd") * F.col("dtd")).alias("swv"),
            F.sum("dtd").alias("sw"),
        )
        .select(
            "event_type",
            F.col("bucket_us").cast("bigint"),
            "n_intervals",
            (F.col("swv").cast("double") / F.col("sw").cast("double") / F.lit(1000.0)).alias(
                "twap"
            ),
        )
    )


def order_concurrency(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Interval-overlap analytics: how many orders are OPEN (placed but not
    yet fully received) on each day, reported as the per-month peak and
    average — the classic concurrent-sessions / active-intervals question
    (WIP inventory, connection counts, hotel occupancy).

    Each order's open interval is [o_orderdate, max(o_orderdate,
    max(l_shipdate))] — clamped so an order is open at least on its own
    order day (the synthetic fixtures contain ship dates BEFORE the order
    date).

    Shape: DELTA EVENTS, not interval explosion — each order emits exactly
    two rows (+1 at start, −1 the day after end), which aggregate
    map-side-combined onto the DAY AXIS; a running prefix sum over the
    day spine then yields per-day open counts.  The prefix window is
    single-partition but runs over the ~#days-of-history axis (a few
    thousand rows regardless of data size — the axis is time-bounded, not
    data-bounded), where the naive day-explode fans every order out by
    its lifetime in days (measured 37 s at sf0.1; deltas: ~1 s).  Days
    with zero open orders are excluded, matching the explode semantics.
    Returns (month, peak_open_orders, avg_open_orders) with avg rounded
    4 dp from exact integer day counts.
    """
    from pyspark.sql import Window

    spans = (
        lineitem.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("closed"))
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderdate", F.greatest("closed", "o_orderdate").alias("fin"))
    )
    deltas = (
        spans.select(F.col("o_orderdate").alias("day"), F.lit(1).alias("d"))
        .unionAll(spans.select(F.date_add("fin", 1).alias("day"), F.lit(-1).alias("d")))
        .groupBy("day")
        .agg(F.sum("d").alias("d"))
    )
    bounds = deltas.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    per_day = (
        spine.join(deltas, "day", "left")
        .select("day", F.coalesce("d", F.lit(0)).alias("d"))
        .select("day", F.sum("d").over(w).alias("n_open"))
        .where(F.col("n_open") > 0)
    )
    return (
        per_day.groupBy(F.date_format("day", "yyyy-MM").alias("month"))
        .agg(
            F.max("n_open").cast("bigint").alias("peak_open_orders"),
            F.round(F.sum("n_open") / F.count("*"), 4).alias("avg_open_orders"),
        )
        .orderBy("month")
    )


def daily_autocorr(events: DataFrame) -> DataFrame:
    """Lag-1 autocorrelation of the daily event-count series — the
    seasonality/trend screen for a metric pipeline ("does today predict
    tomorrow?").

    Day counts are exact integers; consecutive-day pairs come from ONE
    lead window over the (time-bounded) day axis; Pearson r uses the
    integer sufficient-statistics identity
        r = (nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²))
    with decimal-exact sums and a single terminal IEEE sqrt/division
    (rounded 6 dp) — engine-identical.  Only CONSECUTIVE calendar days
    pair up (gaps break pairs), replayed identically by the oracle.
    Returns one row (n_days, n_pairs, autocorr).
    """
    from pyspark.sql import Window

    daily = events.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("c"))
    w = Window.orderBy("day")
    pairs = (
        daily.select("day", "c", F.lead("day").over(w).alias("nday"), F.lead("c").over(w).alias("nc"))
        .where(F.col("nday") == F.date_add("day", 1))
        .select(
            F.col("c").cast("decimal(38,0)").alias("x"),
            F.col("nc").cast("decimal(38,0)").alias("y"),
        )
    )
    n_days = daily.agg(F.count("*").alias("n_days"))
    agg = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return agg.crossJoin(F.broadcast(n_days)).select(
        F.col("n_days").cast("bigint"),
        F.col("n").cast("bigint").alias("n_pairs"),
        F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0)).alias("autocorr"),
    )


def rolling_anomaly_z(events: DataFrame, window_days: int = 7, k: int = 3) -> DataFrame:
    """Rolling z-score anomaly screen on daily revenue per event type —
    the monitoring query behind a data-quality alert: each day is scored
    against the trailing ``window_days`` observed days (inclusive) and the
    top-k |z| days per type are reported.

    Sufficient statistics (n, Σx, Σx²) accumulate as EXACT integer cents
    over a rows-frame window; z is then one fixed IEEE chain on identical
    exact inputs — engine-identical, so even the ranking by |z| is pinned.
    Scale shape: daily pre-aggregation (map-side combinable), one window
    shuffle keyed by event_type, top-k via WindowGroupLimit.
    """
    daily = (
        events.groupBy(
            "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
        )
        .agg(F.sum(units("value")).alias("cents"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(window_days - 1), 0)
    )
    stats = daily.select(
        "event_type",
        "day",
        "cents",
        F.count("*").over(w).cast("long").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).over(w).alias("sx"),
        F.sum((F.col("cents").cast("decimal(38,0)") * F.col("cents")).cast("decimal(38,0)"))
        .over(w)
        .alias("sxx"),
    )
    n, x = F.col("n").cast("double"), F.col("cents").cast("double")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    var = (sxx - sx * sx / n) / n
    z = F.when(var > 0, (x - sx / n) / F.sqrt(var)).otherwise(F.lit(0.0))
    scored = stats.where(F.col("n") >= window_days).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        z.alias("z"),
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.desc(F.abs(F.col("z"))), F.asc("day"))
    )
    return (
        scored.withColumn("rk", rk.cast("long"))
        .where(F.col("rk") <= k)
        .orderBy("event_type", "rk")
    )


def acf_multi_lag(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Autocorrelation function of global daily revenue at lags 1..max_lag
    — the seasonality fingerprint (a weekly cycle shows as a lag-7 peak).

    Pairs at lag L come from a self-join on day = day + L (no
    single-partition global window), one join feeding ALL lags via a lag
    explode; sufficient statistics are exact decimal sums of integer
    cents, and each correlation is the fixed IEEE chain of corr_exact.
    Output: (lag, n_pairs, acf).
    """
    daily = (
        events.groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(F.sum(units("value")).alias("cents"))
    )
    lags = F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    left = daily.select("day", F.col("cents").alias("x"), lags)
    right = daily.select(F.col("day").alias("rday"), F.col("cents").alias("y"))
    pairs = left.join(
        right, F.expr("date_add(day, lag) = rday")
    ).select("lag", F.col("x").cast("decimal(38,0)"), F.col("y").cast("decimal(38,0)"))
    s = pairs.groupBy("lag").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxx, syy, sxy = (F.col(c).cast("double") for c in ("sxx", "syy", "sxy"))
    acf = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return (
        s.select(
            F.col("lag").cast("long"),
            F.col("n").cast("long").alias("n_pairs"),
            acf.alias("acf"),
        )
        .orderBy("lag")
    )
