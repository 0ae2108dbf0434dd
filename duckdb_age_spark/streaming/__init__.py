"""Structured Streaming over an ``events``-shaped stream.

Batch semantics live in :mod:`duckdb_age_spark.operators.events`; this module
runs the same logic incrementally:

* ``stream_events`` — file-source readStream over the events parquet
  (schema pinned; ts normalized ns→µs like the batch reader);
* ``windowed_counts_stream`` — tumbling-window counts with a watermark for
  late data;
* ``sessionize_stream`` — gap-based sessions via
  ``applyInPandasWithState`` (the custom-stateful-operator seam);
* ``run_available_now`` — drain a stream to a memory sink with the
  availableNow trigger (how tests compare stream vs batch results).

Scale notes: windowed aggregation state is keyed by (window, event_type) —
bounded by watermark horizon; sessionization state is per user_id with
explicit timeout, the standard unbounded-key pattern.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

def _events_stream_source(spark: SparkSession, sf_dir: str, kind: str, names: list[str]) -> DataFrame:
    """readStream over staged links to the events parquet, handling both ts
    layouts the driver fixtures have shipped (ns-as-long through r3, µs from
    r4 — see sources/tables.py) and always yielding TimestampType ts."""
    from ..sources.tables import events_schema, events_ts_is_nanos

    nanos = events_ts_is_nanos(f"{sf_dir}/events.parquet")
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stage = _stage_links(kind, sf_dir, names)
    raw = (
        spark.readStream.schema(events_schema(nanos))
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw


def _stage_links(kind: str, sf_dir: str, names: list[str]) -> str:
    """Create (or repair) a scratch dir of symlinks to the events parquet.

    The dir key includes a hash of the ABSOLUTE source path — two fixtures
    with the same basename must not share a stage — and links are checked
    with ``os.path.lexists`` + target comparison so a broken or stale link
    is re-created instead of raising FileExistsError.
    """
    import hashlib
    import os
    import tempfile

    target = os.path.abspath(f"{sf_dir}/events.parquet")
    key = f"{os.path.basename(sf_dir.rstrip('/'))}-{hashlib.md5(target.encode()).hexdigest()[:12]}"
    stage = os.path.join(tempfile.gettempdir(), kind, key)
    os.makedirs(stage, exist_ok=True)
    for name in names:
        link = os.path.join(stage, name)
        if os.path.lexists(link):
            if os.path.islink(link) and os.readlink(link) == target:
                continue
            os.remove(link)
        os.symlink(target, link)
    return stage


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the same ts normalization the
    batch path uses (sources/tables.py)."""
    # The file-stream source wants a directory; the test dirs hold all ten
    # tables in one flat dir, so stage a symlink-dir containing only events.
    return _events_stream_source(spark, sf_dir, "duckdb_age_spark_stream", ["events.parquet"])


def windowed_counts_stream(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts per event type with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # exact cents sum: the state-store merge order is as
            # nondeterministic as a batch shuffle, so the same integer-unit
            # playbook applies (operators/exact.py)
            F.sum(F.round(F.col("value") * 100).cast("long").cast("decimal(38,0)")).alias("_vc"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            (F.col("_vc").cast("double") / 100.0).alias("total_value"),
        )
    )


def view_purchase_join_stream(
    events: DataFrame, within: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked stream-stream interval join: each ``purchase`` is matched
    to the ``view`` events by the same user in the preceding ``within``
    interval.

    Scale shape: both sides carry a watermark so the join state store evicts
    rows once ``view_ts < watermark - within`` (views) / ``purchase_ts <
    watermark`` (purchases) — without the time bound in the join condition,
    state would grow without bound.  The join shuffles both streams by
    user_id; an inner join emits matches eagerly, so an availableNow drain
    yields the complete batch-equivalent answer.
    """
    v = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    joined = v.join(
        p,
        F.expr(
            f"v_user = p_user AND purchase_ts >= view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {within}"
        ),
    )
    return joined.select(
        F.col("v_user").alias("user_id"), "view_id", "purchase_id", "purchase_value"
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30, timeout_ms: int | None = None) -> DataFrame:
    """Per-user session aggregation with ``applyInPandasWithState``: emits
    one row per closed session (user_id, n_events, dur_sec).

    State per user: (session_start_sec, last_sec, n_events); a session closes
    when a batch shows a gap past ``gap_minutes``.  Default NoTimeout: a live
    deployment passes ``timeout_ms`` to flush trailing sessions on a
    processing-time timer, but that conflicts with bounded availableNow
    drains (the query never terminates waiting for the timer), so tests leave
    it None and the trailing session of each user intentionally stays in
    state.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("dur_sec", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_sec", LongType()),
            StructField("last_sec", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    gap_sec = gap_minutes * 60

    cols = ["user_id", "n_events", "dur_sec"]

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([{"user_id": user_id, "n_events": n, "dur_sec": last - start}])
            return
        secs: list[int] = []
        for pdf in pdf_iter:
            secs.extend(int(t.timestamp()) for t in pdf["ts"])
        secs.sort()
        if not secs:
            yield pd.DataFrame(columns=cols)
            return
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = secs[0], secs[0], 0
        closed = []
        for s in secs:
            if s - last > gap_sec and n > 0:
                closed.append({"user_id": user_id, "n_events": n, "dur_sec": last - start})
                start, n = s, 0
            n += 1
            last = s
        state.update((start, last, n))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(closed, columns=cols) if closed else pd.DataFrame(columns=cols)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout if timeout_ms is None else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def windowed_distinct_users_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Distinct users per tumbling window, streaming — exact for every
    duplicate arriving within the watermark horizon.

    Streaming aggregation forbids COUNT(DISTINCT) (distinct state is
    unbounded per group in general), so this runs the standard TWO-PHASE
    form: (1) watermarked dropDuplicates on (user, window-bucketed ts) —
    state is one entry per distinct (user, window) inside the horizon,
    evicted as the watermark passes; (2) an ordinary windowed count of the
    survivors.  Both phases are watermark-bounded, so state is
    (active users × windows-in-horizon), not stream length — the shape
    that survives an unbounded feed.

    Exactness caveat (ADVICE r4): phase-2 aggregation state lives forever
    in complete output mode while phase-1 dedup state is watermark-evicted,
    so a duplicate (user, window) arriving AFTER its dedup entry was
    evicted — i.e. later than the watermark horizon — is counted twice.
    Exact whenever all duplicates of a key arrive within the horizon
    (guaranteed in the single-batch contract feed; on a real feed size the
    watermark to the source's max duplicate lag, or use
    :func:`windowed_distinct_users_stream_update`, which keys dedup set and
    count in one state row so a post-horizon duplicate is dropped, never
    double-counted — tested in
    test_update_mode_distinct_exact_after_horizon_duplicate)."""
    bucketed = events.withColumn("win_start", F.window("ts", window)["start"])
    # dropDuplicatesWithinWatermark, NOT dropDuplicates: the dedup keys are
    # (user, win_start) and win_start is a derived column with no event-time
    # metadata, so plain dropDuplicates would never evict state (Spark only
    # cleans dedup state when a watermarked column is among the keys).
    # WithinWatermark evicts by the ts watermark regardless of key; a
    # (user, window) key can only recur while its window is inside the
    # horizon, so exactness is preserved.
    uniques = bucketed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "win_start"]
    )
    return (
        uniques.groupBy(F.window("ts", window).alias("win"))
        .agg(F.count("*").alias("n_distinct_users"))
        .select(F.col("win.start").alias("window_start"), "n_distinct_users")
    )


def windowed_distinct_users_stream_update(
    events: DataFrame, window_sec: int = 3600, watermark_sec: int = 7200
) -> DataFrame:
    """Exact distinct users per tumbling window in UPDATE mode — the
    recompute alternative the two-phase form's docstring sketches (ADVICE
    r4 / VERDICT r5 item 8), with NO post-horizon double-count by
    construction.

    One stateful operator, keyed by window start: state is the window's
    user-id SET, updated per micro-batch, emitting the refreshed exact
    count (update semantics).  Because dedup state and count state are the
    SAME state row, their lifetimes cannot diverge — the failure mode of
    the two-phase form, where dedup state was watermark-evicted while the
    complete-mode count lived on, so a duplicate arriving after eviction
    incremented the count again.  Here a post-horizon event is simply LATE:
    the watermark filter drops it before the operator, the count never
    moves, and the state row is removed by its event-time timeout (window
    end + the watermark delay).

    State cost: distinct users per in-horizon window — the irreducible
    price of exact distinct; bounded by (active users x windows in
    horizon), same as phase 1 of the two-phase form.
    Returns (window_start, n_distinct_users) update rows.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    bucketed = (
        events.withWatermark("ts", f"{watermark_sec} seconds")
        .select(
            F.window("ts", f"{window_sec} seconds")["start"].alias("win_start"),
            "user_id",
            # keep the watermarked column in the projection: event-time
            # timeout requires a delay-tagged column in the operator input
            "ts",
        )
    )
    out_schema = StructType(
        [
            StructField("window_start", TimestampType()),
            StructField("n_distinct_users", LongType()),
        ]
    )
    state_schema = StructType([StructField("users", ArrayType(LongType()))])

    def fn(key, pdf_iter, state):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"window_start": [], "n_distinct_users": []})
            return
        win_start = key[0]
        # key timestamps arrive as naive datetimes in the session TZ; the
        # harness pins UTC (contract._prep / tests), so epoch via utc
        from datetime import timezone

        base_ms = int(win_start.replace(tzinfo=timezone.utc).timestamp() * 1000)
        end_ms = base_ms + (window_sec + watermark_sec) * 1000
        # applyInPandasWithState does NOT pre-filter late input, so the
        # post-horizon duplicate arrives here: drop it explicitly.  The
        # window is past its horizon exactly when its timeout instant is
        # not after the current watermark — emit nothing, never re-count.
        if end_ms <= state.getCurrentWatermarkMs():
            if state.exists:
                state.remove()
            yield pd.DataFrame({"window_start": [], "n_distinct_users": []})
            return
        users = set(state.get[0]) if state.exists else set()
        for pdf in pdf_iter:
            users.update(int(u) for u in pdf["user_id"])
        state.update((sorted(users),))
        state.setTimeoutTimestamp(end_ms)
        yield pd.DataFrame(
            {"window_start": [win_start], "n_distinct_users": [len(users)]}
        )

    return bucketed.groupBy("win_start").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours", keys: list[str] | None = None) -> DataFrame:
    """Streaming deduplication: emit each key's first arrival, drop repeats
    arriving within the watermark horizon (turns an at-least-once source
    into exactly-once rows).

    Scale shape: the state store holds one entry per key seen inside the
    horizon and evicts it once the watermark passes its event time — state
    is bounded by (arrival rate × horizon), not by stream length, which is
    what makes this safe on an unbounded 100 TB/day feed.  Backfill caveat
    (measured, sf10 oracle run r10): an availableNow drain replays history
    faster than event time advances, so "rate × horizon" degenerates to
    every key in the replayed corpus — 20 M entries OOM'd an 8 GB heap and
    completed at 28 GB.  For large backfills use
    :func:`backfill_dedup_sliced` (event-time-ordered slice replay; peak
    state measured at 7% of the sf1 corpus vs 100% for the one-shot drain)
    and/or :func:`use_rocksdb_state`."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys or ["event_id"])


def _resolve_stream_partitions(shuffle_partitions):
    """Shared ``"auto"`` policy for drain entry points (run_available_now,
    backfill_dedup_sliced): ``SPARK_GRAFT_STREAM_PARTITIONS`` or 8, the
    measured local optimum — per-store commit latency dominates small
    drains.  Ints pass through; ``None`` means leave the session setting."""
    import os
    import warnings

    if shuffle_partitions != "auto":
        return shuffle_partitions
    raw = os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8")
    try:
        val = int(raw)
        if val <= 0:
            raise ValueError(raw)
        return val
    except ValueError:
        warnings.warn(
            f"SPARK_GRAFT_STREAM_PARTITIONS={raw!r} is not a positive "
            "integer; falling back to 8",
            stacklevel=3,
        )
        return 8


def use_rocksdb_state(spark: SparkSession) -> None:
    """Switch this session's streaming state store to RocksDB (bundled with
    Spark 4 — no external deps): state spills to local disk instead of
    living wholly on-heap, which is the one-line mitigation when a single
    micro-batch must legitimately hold more dedup/agg state than the
    executor heap (the r10-measured availableNow backfill degenerate case).
    Locked into a query's checkpoint at first batch — set it BEFORE
    starting the query; existing HDFS-backed checkpoints cannot switch."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )


def backfill_dedup_sliced(
    history: DataFrame,
    work_dir: str,
    slice_interval: str = "1 day",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    ts_col: str = "ts",
    shuffle_partitions: int | str | None = "auto",
) -> dict:
    """Backfill-safe streaming dedup (VERDICT r10 item 4): replay a bounded
    HISTORY through :func:`dedup_stream` in event-time-ordered slices so the
    watermark advances between slices and state eviction keeps pace.

    Why: an availableNow drain of a whole history is one micro-batch whose
    starting watermark is epoch — nothing evicts until the END of the
    batch, so "state ≈ rate × horizon" degenerates to "every key in the
    corpus" (measured at sf10 in round 10: 20 M entries, 28 GB heap).
    Slicing restores the live-stream shape: each drain sees one
    ``slice_interval`` of event time, and at its first batch the watermark
    already stands at (previous slice's max ts − ``watermark``), so only
    the horizon tail of earlier slices is still resident.  Peak state is
    bounded by keys-per-(slice + horizon), independent of history length.

    Semantics note: this is NOT always identical to the one-shot drain —
    it is identical to what a LIVE stream would have produced, which is the
    point of a faithful backfill: a key recurring more than ``watermark``
    apart re-emits here (and live), where the one-shot drain's lagging
    watermark would have deduped it globally.

    Mechanics (each step is cluster-shaped):
      1. ONE distributed pass writes the history slice-partitioned under
         ``work_dir/staged`` (``partitionBy`` on the windowed ts — no
         driver-side iteration over rows, no second scan per slice).
      2. Per slice, the staged part-files are RENAMED into the watched feed
         dir (metadata-only ops, one per file) and a
         ``trigger(availableNow)`` drain of the SAME checkpoint processes
         exactly the new files; the file-source log + commit log carry the
         seen-files set and the watermark across drains.
      3. Output lands as parquet under ``work_dir/out``; per-drain state
         telemetry is collected from the query progress.

    Returns ``{"slices", "peak_state_rows", "state_rows_per_slice",
    "rows_emitted", "out_path"}``; ``rows_emitted`` is exact (an
    ``observe()`` metric on the deduped stream — FileStreamSink itself
    reports only -1/"unknown"), with None reserved for the defensive case
    of a drain that produced neither observed metrics nor a meaningful
    sink count.  Driver-side footprint: one listing of
    slice partition DIRS (|history span| / ``slice_interval`` entries) —
    never rows — through the Hadoop FileSystem API, so ``work_dir`` may be
    any Spark-writable URI (hdfs://, s3a://, file:///, a bare local path);
    the per-slice "move into the feed dir" is ``FileSystem.rename``, a
    metadata-only op on HDFS-like stores (on S3 a copy — still one op per
    FILE, never per row).  On success the ``staged``/``feed`` intermediates
    are deleted (only ``out`` + ``ckpt`` remain); a reused ``work_dir`` —
    including a failed run's leftovers — is refused up front.  For state that must exceed heap even per-slice,
    combine with :func:`use_rocksdb_state`.  ``shuffle_partitions`` sizes
    state-store parallelism for the drains exactly like
    :func:`run_available_now` (``"auto"`` → ``SPARK_GRAFT_STREAM_PARTITIONS``
    or 8; per-store commit latency dominates small drains; the session
    conf is restored after)."""
    import urllib.parse

    spark = history.sparkSession
    shuffle_partitions = _resolve_stream_partitions(shuffle_partitions)
    staged = work_dir.rstrip("/") + "/staged"
    feed = work_dir.rstrip("/") + "/feed"
    out = work_dir.rstrip("/") + "/out"
    ckpt = work_dir.rstrip("/") + "/ckpt"
    # Hadoop FS handle for the work_dir's scheme (code-review r11: driver
    # os.* calls only work when the driver shares a local filesystem with
    # the storage — a real cluster writes to a DFS)
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = hpath(work_dir).getFileSystem(spark._jsc.hadoopConfiguration())
    # Refuse a reused work_dir (ADVICE r11): staged/ is overwritten below,
    # but a prior run's out/ and ckpt/ would survive — the new drains would
    # APPEND to the old parquet output and read back both runs' rows.
    # feed/ is refused too (ADVICE r12): a prior run's renamed slice files
    # live there, so a caller who deleted only out/ and ckpt/ would replay
    # the old history into the new output under a fresh checkpoint.
    # Failing beats wiping: out/ may be the caller's only copy.
    for stale in (out, ckpt, feed):
        if fs.exists(hpath(stale)):
            raise ValueError(
                f"backfill_dedup_sliced: work_dir already holds {stale!r} from a "
                "previous run; reusing it would replay or append the old run. "
                "Pass a fresh work_dir (or delete the whole work_dir first)."
            )
    fs.mkdirs(hpath(feed))

    # Null event times would vanish with no signal (ADVICE r11): measured
    # on this Spark version, F.window() plants an implicit isnotnull(ts)
    # filter, so null-ts rows never even reach the staged write (they do
    # NOT land in the Hive default partition) — and a live
    # dropDuplicatesWithinWatermark drops them too.  Fail fast instead.
    # Cost: a column-pruned take(1) over ts only, short-circuiting at the
    # first null — noise next to the full staging pass below.
    if history.where(F.col(ts_col).isNull()).select(ts_col).take(1):
        raise ValueError(
            f"backfill_dedup_sliced: history has rows with null {ts_col!r}; "
            "watermarked dedup would silently drop them. Filter them out "
            "(or assign a timestamp) before backfilling."
        )

    (
        history.withColumn("_slice", F.window(ts_col, slice_interval)["start"])
        .write.mode("overwrite")
        .partitionBy("_slice")
        .parquet(staged)
    )
    slice_dirs = sorted(
        (urllib.parse.unquote(name.split("=", 1)[1]), name)
        for name in (
            st.getPath().getName() for st in fs.listStatus(hpath(staged))
        )
        if name.startswith("_slice=")
    )

    schema = history.schema
    state_rows: list[int] = []
    n_out = None  # None = sink never reported a meaningful count
    if not slice_dirs:
        # empty history (null-ts rows were rejected above): still honor the
        # contract that out_path reads back as an empty DataFrame of the
        # input schema
        history.limit(0).write.mode("overwrite").parquet(out)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    # rows_emitted/peak_state_rows are summed from q.recentProgress, whose
    # retention defaults to 100 batches — a drain splitting into more
    # micro-batches than that would silently undercount (ADVICE r12).
    # Raise the retention for the drains (each query reads the conf at
    # start) and guard the cap loudly after each drain.
    _PROGRESS_RETENTION = 10_000
    prev_retention = spark.conf.get(
        "spark.sql.streaming.numRecentProgressUpdates", "100"
    )
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(_PROGRESS_RETENTION)
    )
    try:
        for i, (_val, d) in enumerate(slice_dirs):
            for st in fs.listStatus(hpath(f"{staged}/{d}")):
                fname = st.getPath().getName()
                if fname.endswith(".parquet"):
                    fs.rename(st.getPath(), hpath(f"{feed}/slice{i:06d}_{fname}"))
            stream = spark.readStream.schema(schema).parquet(feed)
            q = (
                # observe() gives an exact per-batch emitted-row count in
                # the progress report (VERDICT r11 item 4): FileStreamSink
                # itself reports numOutputRows = -1 "unknown", and
                # re-reading out_path to count would scan the whole output
                # again.  The metric rides the existing rows executor-side
                # (an AggregatingAccumulator, no extra pass or shuffle).
                dedup_stream(stream, watermark=watermark, keys=keys)
                .observe("backfill_emitted", F.count(F.lit(1)).alias("n"))
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            progress = q.recentProgress
            if len(progress) >= _PROGRESS_RETENTION:
                raise RuntimeError(
                    f"backfill_dedup_sliced: drain {i} produced "
                    f">={_PROGRESS_RETENTION} micro-batches, hitting the "
                    "progress-retention cap — rows_emitted would undercount. "
                    "Use a larger slice_interval (fewer files per drain)."
                )
            peak = 0
            for p in progress:
                for op in p.get("stateOperators") or []:
                    peak = max(peak, int(op.get("numRowsTotal") or 0))
                observed = (p.get("observedMetrics") or {}).get("backfill_emitted")
                if observed is not None:
                    n_out = (n_out or 0) + int(observed["n"])
                    continue
                # fallback for sinks that do report (e.g. a future
                # non-file sink): only meaningful counts accumulate —
                # FileStreamSink's -1 "unknown" never does
                sunk = int(p.get("sink", {}).get("numOutputRows") or 0)
                if sunk >= 0:
                    n_out = (n_out or 0) + sunk
            state_rows.append(peak)
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.numRecentProgressUpdates", prev_retention
        )

    # A successful run's feed/ and staged/ are pure intermediates (the
    # output lives in out/); delete them so work_dir does not retain the
    # whole history a second time (ADVICE r12 — they also made the reuse
    # guard's old "delete out/ and ckpt/" advice a replay trap).
    fs.delete(hpath(feed), True)
    fs.delete(hpath(staged), True)

    return {
        "slices": len(slice_dirs),
        "peak_state_rows": max(state_rows) if state_rows else 0,
        "state_rows_per_slice": state_rows,
        "rows_emitted": n_out if n_out is not None else (0 if not slice_dirs else None),
        "out_path": out,
    }


def stream_duplicated_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over a staged dir holding TWO links to the same events
    parquet — an at-least-once delivery simulation: with maxFilesPerTrigger=1
    every event arrives again in the next micro-batch."""
    return _events_stream_source(
        spark, sf_dir, "duckdb_age_spark_stream_dup", ["events_a.parquet", "events_b.parquet"]
    )


def stream_to_encrypted_parquet(
    stream_df: DataFrame,
    path: str,
    columns: list[str],
    recipient: str,
    checkpoint: str,
):
    """foreachBatch sink: every micro-batch lands as parquet with
    ``columns`` age-encrypted — the streaming composition of the crypto UDFs
    with the encrypted sink (sources/encrypted.py).  Returns the started
    query; callers trigger/await as they choose."""
    from ..sources.encrypted import write_encrypted

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_encrypted(batch_df, f"{path}/batch={batch_id}", columns, recipient, mode="overwrite")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def enrich_stream_with_dim(stream_df: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: enrich a stream with a (slowly-changing) dimension
    table.  The static side is re-read per micro-batch by Spark, so dim
    updates between batches are picked up automatically; with a small dim
    the join planner broadcasts it — no stream-side shuffle and no state
    store at all (unlike stream-stream joins, a static join needs no
    watermark bookkeeping)."""
    from pyspark.sql import functions as F

    return stream_df.join(F.broadcast(dim), on)


def stream_to_keyed_upsert(
    stream_df: DataFrame,
    path: str,
    key: str,
    checkpoint: str,
):
    """foreachBatch CDC-apply sink: every micro-batch MERGEs into the keyed
    parquet table at ``path`` via :func:`sources.upsert_parquet` — re-deliveries
    and updates collapse onto their key instead of appending duplicates, so an
    at-least-once source lands as an exactly-once-per-key table.

    The first batch bootstraps the table (nothing to merge into yet).
    foreachBatch + idempotent-per-key merge is the standard Spark pattern for
    streaming upserts without a transactional table format; the checkpoint
    makes batch replay after failure converge to the same table state.
    Returns the started query; callers trigger/await as they choose."""
    import os

    from ..sources import upsert_parquet

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        deduped = batch_df.dropDuplicates([key])
        if os.path.isdir(path):
            upsert_parquet(spark, path, deduped, key)
        else:
            deduped.write.parquet(path)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_available_now(
    stream_df: DataFrame,
    output_mode: str = "complete",
    query_name: str | None = None,
    shuffle_partitions: int | str | None = "auto",
):
    """Drain a streaming DataFrame into a memory sink (availableNow trigger)
    and return the bounded result as a batch DataFrame.  ``complete`` suits
    windowed aggregations; stateful append operators need ``append``.

    ``shuffle_partitions`` sizes the STATE STORE parallelism for this drain
    (locked into the checkpoint at first batch): each stateful partition
    commits its own store per micro-batch, and that per-store commit —
    not row throughput — dominates small drains (measured on the interval
    join at sf0.1: 32 partitions → 6.0 s, 8 → 2.4 s for identical output).
    Size it to state volume: small bounded drains want few stores; a
    production 100 TB/day stream wants hundreds.  The session conf is
    restored after the drain so batch queries keep their own setting.

    The default ``"auto"`` resolves from ``SPARK_GRAFT_STREAM_PARTITIONS``
    (falling back to 8, the measured local optimum above) — the config
    seam that sizes state-store parallelism per deployment without code
    changes.  Pass an int to pin it, or ``None`` to leave the session's
    own shuffle-partitions setting untouched.

    NOTE (changelog): before the ``"auto"`` seam the parameter defaulted to
    ``None`` (leave the session setting).  External callers who relied on
    that must now pass ``shuffle_partitions=None`` explicitly.
    """
    shuffle_partitions = _resolve_stream_partitions(shuffle_partitions)
    spark = stream_df.sparkSession
    name = query_name or f"mem_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def cms_cells_stream(events: DataFrame, depth: int = 4, width: int = 256) -> DataFrame:
    """Count-min sketch cells over the streaming ``user_id`` column.

    The streaming-state angle of the sketch (see stats.cms_heavy_hitters
    for the batch form): a per-user streaming count keeps one state row per
    DISTINCT user — state grows with the keyspace and needs watermark
    eviction policy.  The CMS aggregate's state is depth x width rows
    FOREVER, no matter how many users or events flow through, while still
    answering frequency queries within eps*N.  Hash rows are md5-derived
    (portable), so the drained cells equal the batch-computed cells exactly
    and a SQL oracle can reproduce the estimates bit-for-bit.
    """
    def bucket(j: int):
        hx = F.substring(
            F.md5(F.concat(F.lit(f"{j}:"), F.col("user_id").cast("string"))), 1, 8
        )
        return (F.conv(hx, 16, 10).cast("long") % width)

    return (
        events.select(
            F.posexplode(F.array(*[bucket(j) for j in range(depth)])).alias("row", "bucket")
        )
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cell_n"))
    )


def ohlc_stream(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Streaming OHLC candles per (event_type, tumbling window): open/close
    via min_by/max_by over the composite (µs epoch, event_id) decimal tie
    key — the same deterministic rule as the batch operator
    (operators/events.py:ohlc_candles), running as a watermark-bounded
    streaming aggregation (state = one candle per open window per type,
    evicted as the watermark passes)."""
    us = F.unix_micros(F.col("ts"))
    vm = F.round(F.col("value") * 1000, 0).cast("long")
    tk = us.cast("decimal(38,0)") * 1_000_000 + F.col("event_id")
    return (
        events.withWatermark("ts", watermark)
        .select("ts", "event_type", vm.alias("vm"), tk.alias("tk"))
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            (F.min_by("vm", "tk") / 1000.0).alias("open"),
            (F.max("vm") / 1000.0).alias("high"),
            (F.min("vm") / 1000.0).alias("low"),
            (F.max_by("vm", "tk") / 1000.0).alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def windowed_user_counts_stream(events: DataFrame, window: str = "1 day") -> DataFrame:
    """Per-(window, user) event counts as a streaming aggregation — the
    state half of a streaming leaderboard.  Ranking is NOT legal inside a
    streaming aggregation (no window functions over streams); the standard
    pattern is aggregate-in-stream, rank-per-emission downstream (memory
    sink / foreachBatch), which the contract query exercises.

    Drain this in UPDATE mode (``topk_users_update_drain``): update mode
    emits only the groups a micro-batch changed and lets the state store
    EVICT a (window, user) row once the watermark passes the window end —
    so state is bounded by (active users × windows inside the horizon).
    Complete mode would pin every group forever to re-emit the full result
    (all-time day×user cardinality — a scale-killer on an unbounded feed).
    """
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", window).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "user_id",
            F.col("n_events").cast("long"),
        )
    )


def topk_users_update_drain(
    events: DataFrame, window: str = "1 day", k: int = 3
) -> DataFrame:
    """Streaming leaderboard with watermark-BOUNDED state (VERDICT r6
    item 3): per-(window, user) counts aggregate in update mode, then the
    top-k rank runs per drain on the compacted counts.

    Update-mode emissions are (window, user, count) rows, re-emitted each
    time a micro-batch touches the group; a group's count is monotone
    non-decreasing across emissions, so ``max(n_events)`` per key compacts
    the emission log to each group's LATEST value — the same
    last-writer-wins compaction a production ``foreachBatch`` upsert sink
    (``cdc_apply_stream``) performs incrementally against a keyed table.
    Here the memory sink holds the emission log for the bounded drain and
    the compaction runs as one batch aggregate.

    Scale shape: the streaming agg keeps one state row per (window, active
    user) INSIDE the watermark horizon and evicts it once the watermark
    passes the window end (asserted by the state-eviction test in
    tests/test_streaming.py); each drain ships only changed groups; the
    rank is a per-window top-k over the compacted store — at 100 TB/day
    the store is a table, not a memory sink, and the rank prunes with
    WindowGroupLimit.
    """
    from pyspark.sql import Window as W

    out = run_available_now(
        windowed_user_counts_stream(events, window=window), output_mode="update"
    )
    compact = out.groupBy("window_start", "user_id").agg(
        F.max("n_events").cast("long").alias("n_events")
    )
    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.desc("n_events"), F.asc("user_id"))
    )
    return compact.withColumn("rk", rk.cast("bigint")).where(F.col("rk") <= k)


def tvd_drift_update_drain(events: DataFrame, window: str = "1 day") -> DataFrame:
    """Streaming distribution-drift monitor: per-window total-variation
    distance between the window's event-type mix and the whole stream's —
    the mixture-composition alarm (batch twin: text.source_tv_distance)
    run against live windows.

    Streaming half: per-(window, event_type) counts aggregate in UPDATE
    mode (watermark-bounded state, one row per open window × type;
    re-uses windowed_counts_stream) and the emission log compacts by
    per-key max (counts are monotone — same last-writer-wins compaction
    as topk_users_update_drain).  Drift half runs per drain on the
    compacted counts with the sparse TVD identity

        Σ_t |p_w − p_all| · N_w·N = Σ_{t∈w} |c_wt·N − g_t·N_w|
                                     + N_w·(N − Σ_{t∈w} g_t)

    so only (window, type) rows that EXIST are touched; everything is
    decimal-exact integers until the single ppm floor division, so a SQL
    oracle replays it bit-for-bit.  In production the reference mix g_t
    comes from the compacted store (as here) or a frozen baseline table —
    either way the per-drain cost is two small aggregates and a
    type-keyed join, never a windows×types dense grid.
    Returns (window_sec, n_events, tvd_ppm) ordered by window.
    """
    from pyspark.sql import Window as W

    out = run_available_now(
        windowed_counts_stream(events, window=window, watermark="2 hours"),
        output_mode="update",
    )
    # One chain over the compacted counts: the per-type totals g_t,
    # per-window totals N_w, and grand total N are WINDOW sums instead of
    # three aggregate+join consumers — no self-join lineage, no
    # checkpoint, one job at collect.  The compacted table is bounded by
    # (windows in retention × event types), so even the grand-total
    # window's single partition holds ~10^6 tiny rows at the most
    # pessimistic 100 TB retention, not corpus-scale data (the lit(1)
    # partition key is deliberate: partition-less windows warn and plan
    # identically).
    c = out.groupBy("window_start", "event_type").agg(
        F.max("n_events").cast("long").alias("c")
    )
    enr = c.select(
        "window_start",
        F.col("c"),
        F.sum("c").over(W.partitionBy("event_type")).cast("long").alias("g"),
        F.sum("c").over(W.partitionBy("window_start")).cast("long").alias("n_w"),
        F.sum("c").over(W.partitionBy(F.lit(1))).cast("long").alias("n_total"),
    )
    per = enr.groupBy("window_start").agg(
        F.max("n_w").cast("long").alias("n_w"),
        F.max("n_total").alias("_n"),
        F.sum(
            F.abs(
                F.col("c").cast("decimal(38,0)") * F.col("n_total")
                - F.col("g").cast("decimal(38,0)") * F.col("n_w")
            )
        ).alias("a_term"),
        F.sum(F.col("g").cast("decimal(38,0)")).alias("g_s"),
    )
    return per.select(
        F.col("window_start").cast("long").alias("window_sec"),
        F.col("n_w").alias("n_events"),
        F.expr(
            "CAST(((a_term + CAST(n_w AS DECIMAL(38,0)) * (_n - g_s)) * 1000000)"
            " DIV (2 * CAST(n_w AS DECIMAL(38,0)) * _n) AS BIGINT)"
        ).alias("tvd_ppm"),
    ).orderBy("window_sec")


def ewma_volume_drain(events: DataFrame, window: str = "1 hour", span: int = 8) -> DataFrame:
    """Streaming volume-EWMA monitor: per-hour event counts aggregate in
    UPDATE mode (watermark-bounded state, same discipline as
    tvd_drift_update_drain) and each drain computes a *bounded-window*
    exponentially-weighted moving average of window volume — the smoothed
    trend line an ops dashboard alarms on.

    The classic EWMA recurrence s_t = α·x_t + (1−α)·s_{t−1} is an infinite
    lookback and float-orderdependent — unverifiable and unbounded.  This
    uses the production-practical truncation: power-of-two weights over the
    last ``span`` windows,

        ewma(w) = Σ_{d=0..span−1} x_{w−d} · 2^{span−1−d}
                  ÷ Σ_{d: window w−d exists} 2^{span−1−d}

    — α = 1/2 decay, exact integers throughout (the events_decayed_revenue
    trick).  Rather than a range join, each source window *scatters* its
    ``span`` weighted contributions forward (explode of a span-length
    array, shuffle keyed by target window) and a partial-agg sum gathers
    them — the same explode+combine shape that beat the interval join in
    ROADMAP r5's gap-fill rewrite.  Missing hours simply contribute
    nothing; the denominator sums only weights of windows that exist, so
    the estimate renormalizes over gaps instead of decaying toward zero.

    State shape: one streaming state row per open hour window inside the
    watermark horizon (update mode evicts at watermark-pass); the drain-side
    EWMA runs on the compacted per-window counts — bounded by windows in
    retention, never event volume.  Counts are monotone non-decreasing
    across update emissions, so per-key max compacts the emission log
    exactly like topk_users_update_drain.
    Returns (window_sec, n_events, ewma_x100) ordered by window.
    """
    out = run_available_now(
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", window).alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("n_events").cast("long"),
        ),
        output_mode="update",
    )
    c = out.groupBy("window_start").agg(F.max("n_events").cast("long").alias("n"))
    idx = c.select(F.expr("CAST(window_start AS LONG) DIV 3600").alias("w"), "n")
    contrib = idx.select(
        F.explode(F.sequence(F.lit(0), F.lit(span - 1))).alias("d"), "w", "n"
    ).select(
        (F.col("w") + F.col("d")).alias("t"),
        F.expr(f"n * CAST(shiftleft(1, {span - 1} - d) AS BIGINT)").alias("num"),
        F.expr(f"CAST(shiftleft(1, {span - 1} - d) AS BIGINT)").alias("den"),
    )
    gathered = contrib.groupBy("t").agg(
        F.sum("num").alias("num"), F.sum("den").alias("den")
    )
    return (
        idx.join(gathered, idx.w == gathered.t)
        .select(
            (F.col("w") * 3600).cast("long").alias("window_sec"),
            F.col("n").alias("n_events"),
            F.expr("num * 100 DIV den").cast("long").alias("ewma_x100"),
        )
        .orderBy("window_sec")
    )


def _hll_stateful_stage(
    events: DataFrame,
    window_sec_size: int,
    b: int,
    timeout_ms: int | None,
) -> DataFrame:
    """The STREAMING half of hll_distinct_users_stream_drain (kept
    separate so the eviction test can drive it with a continuous trigger
    instead of the bounded availableNow drain): per-window HLL registers
    as applyInPandasWithState state, one (window_sec, n_updates,
    n_buckets, s_scaled) snapshot row per touched key per micro-batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    m = 1 << b
    suffix_bits = 60 - b
    suffix_mask = (1 << suffix_bits) - 1
    rmax = suffix_bits + 1

    out_schema = StructType(
        [
            StructField("window_sec", LongType()),
            StructField("n_updates", LongType()),
            StructField("n_buckets", LongType()),
            StructField("s_scaled", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("registers", ArrayType(LongType())),
            StructField("n_updates", LongType()),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        import hashlib

        (window_sec,) = key
        if state.hasTimedOut:
            # final snapshot already went out with the last update —
            # eviction only reclaims the registers
            state.remove()
            yield pd.DataFrame(
                columns=["window_sec", "n_updates", "n_buckets", "s_scaled"]
            )
            return
        if state.exists:
            regs, n_updates = state.get
            regs = list(regs)
        else:
            regs, n_updates = [0] * m, 0
        for pdf in pdf_iter:
            for uid in pdf["user_id"]:
                k = int(hashlib.md5(str(int(uid)).encode()).hexdigest()[:15], 16)
                bucket = k >> suffix_bits
                w = k & suffix_mask
                rho = rmax if w == 0 else rmax - w.bit_length()
                if rho > regs[bucket]:
                    regs[bucket] = rho
        n_updates += 1
        state.update((regs, n_updates))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "window_sec": int(window_sec),
                    "n_updates": n_updates,
                    "n_buckets": sum(1 for r in regs if r > 0),
                    # empty buckets (r=0) contribute 2^rmax directly, so the
                    # scaled harmonic sum is one pass over all m registers
                    "s_scaled": sum(1 << (rmax - r) for r in regs),
                }
            ]
        )

    keyed = events.select(
        F.expr(
            f"CAST(CAST(ts AS LONG) DIV {window_sec_size} * {window_sec_size} AS LONG)"
        ).alias("window_sec"),
        "user_id",
    )
    return keyed.groupBy("window_sec").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


def hll_distinct_users_stream_drain(
    events: DataFrame,
    window_sec_size: int = 86400,
    b: int = 8,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming distinct-user ESTIMATION with fixed-size state: per-window
    HyperLogLog registers maintained as arbitrary state
    (``applyInPandasWithState``) — the bounded-memory counterpart to
    ``windowed_distinct_users_stream_update``, whose exact dedup-set state
    grows with the user count.  Here every open window pins exactly
    m = 2^b longs no matter how many users stream through — the sketch
    property that makes streaming reach/distinct monitoring viable at
    100 TB/day, and the streaming twin of operators/sketch.py.

    Register discipline is byte-identical to the batch HLL (sketch.py /
    the _HLL_* oracle constants): 60-bit md5 key, bucket = key >> (60−b),
    rho = (61−b) − bit_length(suffix) with the zero-suffix pin, register
    = max rho.  Registers only grow, so every per-batch emission carries
    a strictly increasing update counter and the drain compacts the
    emission log with max_by — then ONE double division of exact integers
    (plus the standard linear-counting low-range branch) yields the
    estimate, identically in the SQL oracle.

    Each sketch is fixed-size, but the KEY SPACE (one state row per
    window ever seen) is not — a live deployment must evict closed
    windows or state grows one sketch per window forever (code-review
    r8).  Pass ``timeout_ms`` to drop a window's registers on a
    processing-time timer after its last update (the final snapshot was
    already emitted — eviction loses nothing); the same
    availableNow-vs-timer conflict as sessionize_stream applies, so
    bounded test drains leave it None.

    Returns (window_sec, n_buckets, s_scaled, hll_est) per window.
    """
    from ..operators.sketch import _hll_est_cols, hll_alpha

    m = 1 << b
    rmax = 60 - b + 1
    numer = hll_alpha(m) * m * m * float(1 << rmax)
    out = run_available_now(
        _hll_stateful_stage(events, window_sec_size, b, timeout_ms),
        output_mode="append",
    )
    compact = (
        out.groupBy("window_sec")
        .agg(F.max_by(F.struct("n_buckets", "s_scaled"), "n_updates").alias("s"))
        .select("window_sec", "s.n_buckets", "s.s_scaled")
    )
    # reuse the batch estimator verbatim (incl. the linear-counting branch)
    # so streaming and batch can never silently diverge (code-review r8);
    # the err half lazily references exact_n and is simply not selected
    est, _err = _hll_est_cols(m, numer)
    return compact.select(
        "window_sec", "n_buckets", "s_scaled", est
    ).orderBy("window_sec")
