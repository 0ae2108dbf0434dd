"""Event-stream operators over an ``events``-shaped table
(event_id, ts, user_id, event_type, value, props JSON).

Batch DataFrame forms here (the correctness/oracle surface); the streaming
module wraps the same logic over readStream with watermarks.

Scale notes: tumbling windows and sessionization both shuffle exactly once,
keyed by (window/user).  Sessionization uses a per-user sort window — at
100 TB user_id is the partition key and AQE handles skewed power-users;
the lag/cumsum pattern never materializes more than a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .exact import exact_sum, units

SESSION_GAP_MIN = 30


def tumbling_counts(events: DataFrame, hours: int = 24) -> DataFrame:
    """Per-day, per-type event counts + value stats.  date_trunc matches
    DuckDB exactly; one shuffle with map-side partial aggregation."""
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            exact_sum(units("value"), 100.0, "total_value"),
        )
        .orderBy("day", "event_type")
    )


def hourly_activity(events: DataFrame) -> DataFrame:
    """Hour-of-day histogram per event type (48h footprint regardless of
    data size — the canonical pre-aggregation rollup)."""
    return (
        events.groupBy(F.hour("ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy("hour", "event_type")
    )


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Assign session ids: a session breaks after ``gap_minutes`` of
    inactivity.  lag → boundary flag → running sum, all inside one per-user
    sort window (single shuffle on user_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    return (
        events.withColumn("new_session", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
        .withColumn("session_seq", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .drop("new_session")
    )


def session_stats(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Per-user session rollup: session count, avg session length (sec),
    avg events/session.  Deterministic; oracle-mirrored with the same
    window-function construction in DuckDB."""
    s = sessionize(events, gap_minutes)
    per_session = s.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias("dur_sec"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.round(F.avg("dur_sec"), 2).alias("avg_session_sec"),
            F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
        )
        .orderBy("user_id")
    )


def props_extract(events: DataFrame) -> DataFrame:
    """JSON props → typed column + rollup: distribution of props.k by event
    type.  get_json_object stays JVM-side; DuckDB mirrors with
    json_extract."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def user_funnel(events: DataFrame) -> DataFrame:
    """Per-user funnel: did signup→view→purchase happen in order?
    Conditional min-timestamp aggregation — one shuffle on user_id."""
    t = lambda et: F.min(F.when(F.col("event_type") == et, F.col("ts")))  # noqa: E731
    return (
        events.groupBy("user_id")
        .agg(
            t("signup").alias("first_signup"),
            t("view").alias("first_view"),
            t("purchase").alias("first_purchase"),
        )
        .select(
            "user_id",
            (
                F.col("first_signup").isNotNull()
                & F.col("first_view").isNotNull()
                & F.col("first_purchase").isNotNull()
                & (F.col("first_signup") <= F.col("first_view"))
                & (F.col("first_view") <= F.col("first_purchase"))
            ).alias("completed_funnel"),
        )
        .orderBy("user_id")
    )


def sliding_counts(events: DataFrame, window: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Sliding (hopping) window counts per event type: each event lands in
    window/slide overlapping windows via ``F.window``, which explodes to the
    window instances BEFORE the aggregation — so the shuffle is still a
    single partial-aggregated groupBy on (window_start, type), just over
    window/slide× the rows.  At 100 TB keep the overlap factor small and
    derive coarser grains from rollups (see rollup.py), not wider slides."""
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), exact_sum(units("value"), 100.0, "total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


def ohlc_candles(events: DataFrame, bucket_sec: int = 3600) -> DataFrame:
    """OHLC (open-high-low-close) candles per (event_type, time bucket) —
    the financial/metrics downsampling primitive (TimescaleDB candlestick
    / first-last aggregate analog).

    Open/close use ``min_by``/``max_by`` on a composite (µs epoch,
    event_id) tie key encoded as ONE exact decimal (u·10⁶ + event_id —
    DuckDB's arg_min/arg_max take scalar keys only, and both engines
    order wide integers identically) so simultaneous events resolve
    deterministically; values fix to integer milli-units before
    aggregation and convert back once, so every engine emits identical
    doubles.  One map-side-combined shuffle keyed by (type, bucket).
    Returns (event_type, bucket_us, open, high, low, close, n_events).
    """
    us = F.unix_micros(F.col("ts"))
    bucket_us = int(bucket_sec) * 1_000_000
    vm = F.round(F.col("value") * 1000, 0).cast("long")
    d = events.select(
        "event_type",
        (us - us % bucket_us).alias("bucket_us"),
        vm.alias("vm"),
        (us.cast("decimal(38,0)") * 1_000_000 + F.col("event_id")).alias("tk"),
    )
    return (
        d.groupBy("event_type", "bucket_us")
        .agg(
            (F.min_by("vm", "tk") / 1000.0).alias("open"),
            (F.max("vm") / 1000.0).alias("high"),
            (F.min("vm") / 1000.0).alias("low"),
            (F.max_by("vm", "tk") / 1000.0).alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .select("event_type", F.col("bucket_us").cast("bigint"), "open", "high", "low", "close", "n_events")
    )


def heartbeat_uptime(events: DataFrame, gap_sec: int = 7200) -> DataFrame:
    """Heartbeat-style uptime: treating each user's events as liveness
    pings, the share of their observed span covered by inter-event gaps
    shorter than ``gap_sec`` — the availability metric for agent/device
    fleets.

    up_us = Σ min(gap, ∞)·1[gap <= threshold]; span_us = last − first.
    All exact µs integers; one ratio division at the end (6 dp).  Users
    with a single event (no span) report uptime 1.0 by convention.
    Shape: one window shuffle keyed by user (lead), one aggregate on the
    same key — Catalyst keeps both in a single exchange.
    Returns (user_id, n_events, span_us, up_us, uptime).
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    d = (
        events.select("user_id", "event_id", us.alias("tus"))
        .withColumn("gap", F.lead("tus").over(w) - F.col("tus"))
    )
    agg = d.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        (F.max("tus") - F.min("tus")).cast("bigint").alias("span_us"),
        F.sum(
            F.when(F.col("gap").isNotNull() & (F.col("gap") <= gap_sec * 1_000_000), F.col("gap")).otherwise(0)
        ).cast("bigint").alias("up_us"),
    )
    return agg.select(
        "user_id",
        "n_events",
        "span_us",
        "up_us",
        F.when(F.col("span_us") > 0, F.round(F.col("up_us") / F.col("span_us"), 6))
        .otherwise(F.lit(1.0))
        .alias("uptime"),
    )


def time_to_convert(events: DataFrame) -> DataFrame:
    """Conversion-latency distribution: per user, seconds from first
    ``view`` to first ``purchase`` (only when the purchase follows),
    summarized as exact discrete-rank median/p90 plus the mean — the
    funnel-latency readout behind "how long does conversion take".

    Discrete ranks (floor(q·(n−1))+1 over the sorted deltas — no
    interpolation) and integer seconds keep every value engine-exact; the
    mean divides an exact integer sum once.  Shape: one user-keyed
    aggregate, one total-order rank window over the (small) converted-user
    set.  Returns one row (n_converted, median_sec, p90_sec, avg_sec).
    """
    from pyspark.sql import Window

    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.unix_micros("ts"))).alias("v"),
        F.min(F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))).alias("p"),
    )
    conv = firsts.where(
        F.col("v").isNotNull() & F.col("p").isNotNull() & (F.col("p") >= F.col("v"))
    ).select(((F.col("p") - F.col("v")) / F.lit(1_000_000)).cast("long").alias("delta_sec"), "user_id")
    # rank selection over a VALUE HISTOGRAM of delta_sec (the mann_whitney
    # pattern): the converted-user set is corpus-proportional, so the
    # row-level rank window this replaces put it through ONE window task;
    # the distinct-seconds histogram is bounded by the observation window.
    # The value at rank r == smallest value whose cumulative count reaches
    # r (the user_id tie-break never changed WHICH VALUE sat at a rank).
    h = conv.groupBy("delta_sec").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("delta_sec").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Totals ride the same window pass (unbounded frame, same single-task
    # partition) instead of a second aggregation branch: the two-consumer
    # DAG recomputed the whole conversion-delta pipeline twice per call
    # (r15 optimization round; guide §2.4/§1.2).
    all_w = Window.partitionBy()
    c = h.select(
        "delta_sec",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(all_w).alias("n"),
        F.sum(F.col("delta_sec") * F.col("cnt")).over(all_w).alias("s"),
    )
    return (
        c
        .select(
            "delta_sec",
            "cum",
            "n",
            "s",
            (F.floor(F.lit(0.5) * (F.col("n") - 1)) + 1).alias("r50"),
            (F.floor(F.lit(0.9) * (F.col("n") - 1)) + 1).alias("r90"),
        )
        .groupBy("n", "s")
        .agg(
            F.min(F.when(F.col("cum") >= F.col("r50"), F.col("delta_sec"))).alias("median_sec"),
            F.min(F.when(F.col("cum") >= F.col("r90"), F.col("delta_sec"))).alias("p90_sec"),
        )
        .select(
            F.col("n").cast("bigint").alias("n_converted"),
            F.col("median_sec").cast("bigint"),
            F.col("p90_sec").cast("bigint"),
            F.round(F.col("s") / F.col("n"), 4).alias("avg_sec"),
        )
    )


def user_stickiness(events: DataFrame) -> DataFrame:
    """DAU/MAU stickiness per month: average daily active users divided by
    monthly active users — the engagement ratio every product dashboard
    tracks.

    Exact distinct counts at both grains; avg DAU divides an exact
    integer sum by the month's active-day count, and the final ratio is
    ONE IEEE division rounded 6 dp.  Two distinct aggregations (day,
    month) over the same shuffle key family; no approximation.
    Returns (month, n_days, avg_dau, mau, stickiness).
    """
    day = F.to_date("ts")
    daily = events.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    monthly_d = daily.groupBy(F.date_format("day", "yyyy-MM").alias("month")).agg(
        F.count("*").alias("n_days"), F.sum("dau").alias("dau_sum")
    )
    monthly_u = events.groupBy(F.date_format(day, "yyyy-MM").alias("month")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    return (
        monthly_d.join(monthly_u, "month")
        .select(
            "month",
            F.col("n_days").cast("bigint"),
            F.round(F.col("dau_sum") / F.col("n_days"), 4).alias("avg_dau"),
            F.col("mau").cast("bigint"),
            F.round(
                F.col("dau_sum").cast("double")
                / F.col("n_days").cast("double")
                / F.col("mau").cast("double"),
                6,
            ).alias("stickiness"),
        )
        .orderBy("month")
    )


def pareto_share(events: DataFrame, pct: int = 10) -> DataFrame:
    """Pareto concentration: the share of all events produced by the top
    ``pct`` percent most active users — the "does 10% of the fleet
    generate 80% of the load" readout.

    Exact integer ranks (count desc, user_id tie-break), top-k cutoff
    k = ceil(pct·n/100) in integer arithmetic ((pct·n + 99) DIV 100), one
    terminal IEEE division for the share.  One user-keyed aggregate + one
    rank window over the user table (users ≪ events).
    Returns one row (n_users, top_k, top_events, total_events, share).
    """
    from pyspark.sql import Window

    # top-p% sum over a VALUE HISTOGRAM of per-user activity: the cutoff k
    # is PROPORTIONAL (pct% of users), so orderBy+limit doesn't apply and
    # the row-level rank window this replaces put the whole user table
    # through ONE window task.  Users tied at the same count are
    # interchangeable for the SUM, so each count-block contributes
    # c × clamp(k − users_above, 0, block_size) exactly, whichever tied
    # users the user_id tie-break would have picked.
    per_user = events.groupBy("user_id").agg(F.count("*").alias("c"))
    h = per_user.groupBy("c").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("c")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Totals ride the same window pass (unbounded frame, same single-task
    # partition) instead of a second aggregation branch: the two-consumer
    # DAG recomputed the per-user activity aggregate twice per call (r15
    # optimization round; guide §2.4/§1.2).
    all_w = Window.partitionBy()
    cdesc = h.select(
        "c",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(all_w).alias("n"),
        F.sum(F.col("c") * F.col("cnt")).over(all_w).alias("total"),
    )
    k = F.floor((F.col("n") * pct + 99) / 100).cast("long")
    take = F.greatest(
        F.lit(0), F.least(F.col("cnt"), F.col("k") - (F.col("cum") - F.col("cnt")))
    )
    return (
        cdesc
        .select("c", "cnt", "cum", "n", "total", k.alias("k"))
        .groupBy("n", "total", "k")
        .agg(F.sum(F.col("c") * take).alias("top_events"))
        .select(
            F.col("n").cast("bigint").alias("n_users"),
            F.col("k").cast("bigint").alias("top_k"),
            F.col("top_events").cast("bigint"),
            F.col("total").cast("bigint").alias("total_events"),
            F.round(F.col("top_events").cast("double") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
        )
    )


def decayed_revenue(events: DataFrame, half_lives: int = 20) -> DataFrame:
    """Exponentially-decayed daily revenue per event type (EWMA-style
    freshness metric, half-life = 1 day, horizon = ``half_lives`` days).

    decayed(d) = sum over days e in (d-H, d] of cents(e) * 2^(H-1-(d-e)),
    emitted once as double / (100 * 2^(H-1)) so the current day carries
    weight 1 and a day H-1 back carries 2^-(H-1).  All arithmetic is exact
    integer until that single terminal division — no float accumulation,
    so the result is partition-order-free (operators/exact.py playbook).

    Scale shape: daily pre-aggregation first (map-side combinable, grain =
    types x days), then each daily row EXPLODES into its H forward target
    days and re-aggregates — one partial-aggregated shuffle, NO range join
    (a band self-join would sort-merge on the 5-value type key: skew).
    Days after a type's last active day are clamped off with a broadcast
    per-type max-day join.  Weighted sums ride in decimal(38,0): daily
    cents x 2^19 x a 100 TB day count stays far inside 38 digits.
    """
    h = half_lives
    daily = (
        events.groupBy(
            "event_type", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
        )
        .agg(F.sum(units("value")).alias("cents"))
    )
    maxd = daily.groupBy("event_type").agg(F.max("day").alias("max_day"))
    exploded = daily.select(
        "event_type",
        "cents",
        F.posexplode(F.sequence(F.lit(0), F.lit(h - 1))).alias("_p", "j"),
        F.col("day"),
    ).select(
        "event_type",
        F.date_add(F.col("day"), F.col("j")).alias("tday"),
        (
            F.col("cents").cast("decimal(38,0)")
            * F.expr(f"CAST(shiftleft(CAST(1 AS BIGINT), {h} - 1 - j) AS DECIMAL(38,0))")
        ).alias("wcents"),
    )
    return (
        exploded.join(F.broadcast(maxd), "event_type")
        .where(F.col("tday") <= F.col("max_day"))
        .groupBy("event_type", "tday")
        .agg(
            (F.sum("wcents").cast("double") / F.lit(100.0 * float(1 << (h - 1)))).alias(
                "decayed_rev"
            )
        )
        .select(
            "event_type",
            F.date_format("tday", "yyyy-MM-dd").alias("day"),
            "decayed_rev",
        )
        .orderBy("event_type", "day")
    )


def dow_seasonality(events: DataFrame) -> DataFrame:
    """Day-of-week seasonality profile of event revenue — the weekly
    cyclicality check behind traffic forecasting and anomaly baselining.

    Exact throughout: per-DOW event counts and integer-cent revenue sums,
    each day's revenue share as (cents·10⁶) div total_cents (integer ppm —
    no float ratio), and the final revenue emitted with the single
    terminal division of operators/exact.py.  ISO day numbering (1 =
    Monday) is computed identically on both engines from the date.

    Scale shape: one map-side-combined 7-key aggregate; the total joins
    back as a 1-row broadcast.
    """
    # dayofweek() is 1=Sunday in Spark but isodow is 1=Monday in DuckDB;
    # weekday()+1 gives ISO 1=Monday in Spark, matching DuckDB's isodow
    dow = (F.weekday(F.col("ts")) + 1).cast("long")
    daily = (
        events.groupBy(dow.alias("iso_dow"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(units("value").cast("decimal(38,0)")).alias("_cents"),
        )
    )
    total = daily.agg(F.sum("_cents").alias("_total"))
    return (
        daily.crossJoin(F.broadcast(total))
        .select(
            "iso_dow",
            "n_events",
            (F.col("_cents").cast("double") / 100.0).alias("revenue"),
            # integer div, never decimal-divide + cast: double/decimal→int
            # casts TRUNCATE in Spark but ROUND in DuckDB
            F.expr("CAST((_cents * 1000000) DIV _total AS BIGINT)").alias("share_ppm"),
        )
        .orderBy("iso_dow")
    )


def burstiness(events: DataFrame) -> DataFrame:
    """Inter-event-time burstiness per event type: B = (σ−μ)/(σ+μ) of the
    gaps (Goh & Barabási) — −1 regular, 0 Poisson, →1 bursty.  Gaps are
    exact integer microseconds from a per-type lag; σ and μ derive from
    exact decimal sufficient statistics with one fixed IEEE chain, so B is
    engine-identical.  Population σ (÷n) keeps the chain division-free
    until the end.

    Scale shape: the per-type ordering window partitions by event_type —
    at 100 TB repartition the window key to (type, day) and compute gaps
    within day boundaries (documented coarsening); the aggregate itself is
    map-side combinable.
    """
    # order by the exact µs epoch (equivalent to ts ordering), event_id tie
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    # microsecond epoch directly: unix_micros is exact for TimestampType
    gaps = events.select(
        "event_type", F.unix_micros("ts").alias("us"), "event_id"
    ).withColumn("prev", F.lag("us").over(w)).where(F.col("prev").isNotNull()).select(
        "event_type", (F.col("us") - F.col("prev")).cast("decimal(38,0)").alias("g")
    )
    s = gaps.groupBy("event_type").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("g").alias("sg"),
        F.sum(F.col("g") * F.col("g")).alias("sgg"),
    )
    n, sg, sgg = (F.col(c).cast("double") for c in ("n", "sg", "sgg"))
    mean = sg / n
    sd = F.sqrt((sgg - sg * sg / n) / n)
    return (
        s.select(
            "event_type",
            F.col("n").cast("long").alias("n_gaps"),
            ((sd - mean) / (sd + mean)).alias("burstiness"),
        )
        .orderBy("event_type")
    )


def funnel_conversion(events: DataFrame) -> DataFrame:
    """Step-by-step funnel conversion (signup → view → purchase, order
    enforced by first-timestamps): per-step reached-user counts and the
    step-to-step conversion as exact integer ppm — the dropoff report
    behind any growth dashboard.

    One conditional min-timestamp aggregation per user (the user_funnel
    shuffle) reduced to THREE counters and two floor divisions; no floats.
    Output rows: (step, n_users, conv_from_prev_ppm).
    """
    t = lambda et: F.min(F.when(F.col("event_type") == et, F.col("ts")))  # noqa: E731
    per_user = events.groupBy("user_id").agg(
        t("signup").alias("s"), t("view").alias("v"), t("purchase").alias("p")
    )
    reached1 = F.col("s").isNotNull()
    reached2 = reached1 & F.col("v").isNotNull() & (F.col("s") <= F.col("v"))
    reached3 = reached2 & F.col("p").isNotNull() & (F.col("v") <= F.col("p"))
    agg = per_user.agg(
        F.sum(reached1.cast("long")).cast("long").alias("n1"),
        F.sum(reached2.cast("long")).cast("long").alias("n2"),
        F.sum(reached3.cast("long")).cast("long").alias("n3"),
    )
    # ONE pass over the 1-row agg: explode an array of (step, n, conv)
    # structs instead of unioning three selects of the same aggregate —
    # the union form re-executed the full per-user min-timestamp
    # aggregation up to three times unless exchange reuse happened to
    # kick in (ADVICE r6)
    steps = F.array(
        F.struct(
            F.lit("1_signup").alias("step"),
            F.col("n1").cast("long").alias("n_users"),
            F.lit(None).cast("long").alias("conv_from_prev_ppm"),
        ),
        F.struct(
            F.lit("2_view_after_signup").alias("step"),
            F.col("n2").cast("long").alias("n_users"),
            F.expr("(n2 * 1000000) DIV greatest(n1, 1)").alias("conv_from_prev_ppm"),
        ),
        F.struct(
            F.lit("3_purchase_after_view").alias("step"),
            F.col("n3").cast("long").alias("n_users"),
            F.expr("(n3 * 1000000) DIV greatest(n2, 1)").alias("conv_from_prev_ppm"),
        ),
    )
    return (
        agg.select(F.explode(steps).alias("r"))
        .select("r.step", "r.n_users", "r.conv_from_prev_ppm")
        .orderBy("step")
    )


def last_touch_attribution(events: DataFrame) -> DataFrame:
    """Last-touch revenue attribution: each purchase credits the user's most
    recent *preceding* non-purchase event type (the marketing channel);
    purchases with no prior touch credit 'direct'.  The classic attribution
    query every events warehouse runs, expressed as one IGNORE-NULLS window
    carry — no self-join, no per-user collect.

    Scale shape: a single window over (user_id) ordered by (ts, event_id)
    — one shuffle keyed by user, linear scan per user partition; revenue is
    summed in exact integer cents.  Skewed users are bounded by their own
    event counts (no cross-user state), and the final channel rollup is a
    five-row aggregate.  Returns (channel, n_purchases, revenue_cents).
    """
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        events.withColumn("channel", channel)
        .where(F.col("event_type") == "purchase")
        .select(
            F.coalesce("channel", F.lit("direct")).alias("channel"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("channel")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .orderBy("channel")
    )


def rfm_segments(events: DataFrame, n_tiles: int = 5) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation over
    purchasers — the classic customer-value grid every events warehouse
    derives: R = seconds since the user's last purchase (vs the stream's
    max timestamp), F = purchase count, M = exact integer cents.

    Each dimension is an ntile over a TOTAL order ((metric, user_id) —
    ntile on a partial order is engine-nondeterministic); R ascends
    (recent = tile 1), F and M descend (heavy = tile 1).  Returns the
    segment census (r_tile, f_tile, m_tile, n_users, revenue_cents) —
    the bounded ≤ n_tiles³ grid, not per-user rows.

    Scale shape: one map-side-combined per-user aggregate (the only
    corpus-scale shuffle), a 1-row global-max broadcast, three ntile
    windows over the USER table (user-cardinality, not event-cardinality
    — and ntile needs a global sort, the unavoidable exact-quantile cost;
    at extreme user counts swap approx quantile cuts into the same plan),
    one bounded census aggregate.
    """
    from pyspark.sql import Window as W

    per_user = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("long")).alias("last_sec"),
            F.count("*").alias("freq"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"),
        )
    )
    global_max = events.agg(F.max(F.col("ts").cast("long")).alias("max_sec"))
    scored = per_user.crossJoin(F.broadcast(global_max)).select(
        "user_id",
        (F.col("max_sec") - F.col("last_sec")).alias("recency_sec"),
        "freq",
        "cents",
    )
    r = F.ntile(n_tiles).over(W.orderBy(F.asc("recency_sec"), F.asc("user_id")))
    f = F.ntile(n_tiles).over(W.orderBy(F.desc("freq"), F.asc("user_id")))
    m = F.ntile(n_tiles).over(W.orderBy(F.desc("cents"), F.asc("user_id")))
    return (
        scored.select(
            "user_id",
            "cents",
            r.alias("r_tile"),
            f.alias("f_tile"),
            m.alias("m_tile"),
        )
        .groupBy("r_tile", "f_tile", "m_tile")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .select(
            F.col("r_tile").cast("long"),
            F.col("f_tile").cast("long"),
            F.col("m_tile").cast("long"),
            "n_users",
            "revenue_cents",
        )
        .orderBy("r_tile", "f_tile", "m_tile")
    )


def cusum_shift(events: DataFrame, h_mult: int = 4) -> DataFrame:
    """CUSUM mean-shift detection over daily revenue — the classic
    sequential change-point monitor (Page 1954) a pipeline runs on its
    own output volumes: a sustained upward drift accumulates where a
    z-score anomaly flag (rollup_anomaly_z) only sees single spikes.

    The textbook recurrence S_t = max(0, S_{t−1} + (x_t − target)) is not
    a window function, but the classic prefix identity

        S_t = C_t − min_{0≤j≤t} C_j,   C_t = Σ_{i≤t} (x_i − target)

    turns it into TWO window scans (cumulative sum, cumulative min) —
    fully relational, no recursion, no driver loop.  With target = the
    period's own mean, everything is cross-multiplied into exact
    integers: in n·cent units, C_t = n·prefix(cents) − t·total, staged
    through DECIMAL(38,0) so corpus-scale revenue cannot overflow.  The
    alarm threshold is ``h_mult``·(total DIV n)·n = h_mult·n·mean-days
    of drift, also exact.

    Scale shape: one map-side-combined daily aggregate (the only
    event-volume shuffle), then two windows over the DAY table ordered by
    day (bounded by days in retention, not events; a single-partition
    window over ~10³ retention days is deliberate).  Returns
    (day_sec, revenue_cents, cusum_ncents, alarm) ordered by day.
    """
    from pyspark.sql import Window as W

    daily = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(
            F.expr("CAST(CAST(ts AS LONG) DIV 86400 * 86400 AS LONG)").alias("day_sec")
        )
        .agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"))
    )
    tot = daily.agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("total"),
        F.count("*").alias("n"),
    )
    w = W.orderBy("day_sec").rowsBetween(W.unboundedPreceding, 0)
    enr = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn("t", F.count("*").over(W.orderBy("day_sec")))
        .withColumn(
            "c",
            F.sum(F.col("cents").cast("decimal(38,0)")).over(w) * F.col("n")
            - F.col("t") * F.col("total"),
        )
    )
    # prefix min of C including the implicit C_0 = 0 start
    cmin = F.least(F.min("c").over(w), F.lit(0).cast("decimal(38,0)"))
    s = F.col("c") - cmin
    thresh = F.col("total").cast("decimal(38,0)") * h_mult
    return (
        enr.select(
            "day_sec",
            F.col("cents").alias("revenue_cents"),
            s.cast("decimal(38,0)").alias("s"),
            thresh.alias("thresh"),
        )
        .select(
            "day_sec",
            "revenue_cents",
            F.expr("CAST(s AS BIGINT)").alias("cusum_ncents"),
            (F.col("s") > F.col("thresh")).alias("alarm"),
        )
        .orderBy("day_sec")
    )
