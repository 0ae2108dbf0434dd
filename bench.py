#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Includes two crypto-throughput microbenches comparable to the reference's
published ~50-100 MB/s single-core encrypt claim (BASELINE.md):
  * crypto_encrypt_bulk — 1 MiB payloads (streaming-throughput shape)
  * crypto_roundtrip_rows — per-row overhead shape over documents
Their MB/s figures are reported under "extra".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "age_roundtrip",
    "age_multi_roundtrip",
    "text_doc_stats",
    "text_fingerprints",
    "text_bm25_topk",
    "dedup_exact",
    "dedup_clusters",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_embedding_pairs",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "sim_topk_kmeans",
    "streaming_join",
    "events_tumbling",
    "events_sliding",
    "events_sessions",
    "events_funnel",
    "pipeline_sample_split",
    "pipeline_pack",
    "pipeline_quality_topk",
    "pipeline_decontaminate",
    "text_unigram_logprob",
    "text_pii_scrub",
    "text_repetition",
    "dedup_fuzzy_names",
    "dedup_fuzzy_names_d2",
    "events_gapfill",
    "events_rolling_1h",
    "pipeline_balanced_sample",
    "window_balance_analytics",
    "stats_price_histogram",
    "stats_corr_exact",
    "stats_label_centroids",
    "sketch_cms_heavy_hitters",
    "sketch_approx_percentile",
    "sim_knn_label_vote",
    "pipeline_vocab_topk",
    "setops_full_outer_reconcile",
    "events_session_window",
    "sink_schema_evolution",
    "graph_pagerank",
    "layout_zorder_stats",
    "pipeline_bpe_pairs",
    "tpch_q1",
    "tpch_q2",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "top_customers",
    "order_priority",
    "skew_salted_agg",
    "skew_salted_join",
    "asof_join",
    "rollup_timebuckets",
    "streaming_windowed",
    "multimodal_features",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_audio_stats",
    "graph_copurchase",
    "graph_triangles",
    "graph_triangles_degree",
    "scd2_priority_history",
    "stats_linreg",
    "stats_winsorized",
    "sim_int8_quantize",
    "sim_topk_int8",
    "graph_bfs_hops",
    "stats_chi_square",
    "stats_benford",
    "graph_edge_jaccard",
    "stats_mad_outliers",
    "text_tfidf_keywords",
    "pipeline_mixture_sample",
    "streaming_distinct_users",
    "relational_cohort_retention",
    "stats_entropy",
    "graph_weighted_pagerank",
    "text_bigram_logprob",
    "rollup_time_weighted_avg",
    "asof_forward_tolerance",
    "rollup_order_concurrency",
    "scd2_asof_lookup",
    "pipeline_weighted_sample",
    "stats_quantile_binning",
    "sim_embedding_zscore",
    "graph_kcore",
    "dedup_ngram_verify",
    "text_quality_screen",
    "text_hashing_vec",
    "stats_ks_test",
    "stats_gini",
    "graph_label_propagation",
    "events_ohlc",
    "events_uptime",
    "graph_topk_similar",
    "streaming_ohlc",
    "skew_bloom_prefilter",
    "upsert_incremental_agg",
    "events_time_to_convert",
    "rollup_autocorr",
    "stats_psi_drift",
    "events_stickiness",
    "pipeline_dedup_report",
    "pipeline_pack_efficiency",
    "graph_degree_distribution",
    "stats_welch_ttest",
    "events_pareto_share",
    "relational_revenue_share",
    "text_sentence_stats",
    "text_langid_confusion",
    "relational_transition_matrix",
    "graph_assortativity",
    # round 6
    "sketch_hll_distinct",
    "sketch_kmv_distinct",
    "sketch_kmv_union",
    "pipeline_doc_chunking",
    "pipeline_kfold_split",
    "events_decayed_revenue",
    "stats_quantile_interp",
    "graph_clustering_coeff",
    "multimodal_image_histogram",
    "text_readability",
    "sim_range_search",
    "graph_weighted_sssp",
    "stats_bootstrap_ci",
    "dedup_containment",
    "streaming_topk_users",
    "text_boilerplate_screen",
    "rollup_anomaly_z",
    "sink_bucketed_join",
    "multimodal_wav_resample",
    "sketch_hll_merge",
    "graph_modularity",
    "sim_pq_codebook",
    "events_dow_seasonality",
    "graph_link_prediction",
    "scd2_apply_changes",
    "rollup_acf_multi_lag",
    "events_burstiness",
    "stats_mann_whitney",
    "sink_encrypted_partitioned",
    "sink_encrypted_blobs",
    "relational_share_of_parent",
    "stats_spearman",
    "dedup_threshold_sweep",
    "pipeline_bigram_lift",
    "text_source_tv_distance",
    "events_funnel_conversion",
    "stats_grouped_trend",
    # round 7
    "relational_markov_steady",
    "streaming_tvd_drift",
    "multimodal_flip",
    # round 8
    "text_substring_dedup",
    "pipeline_ngram_novelty",
    "graph_hits",
    "streaming_ewma_hourly",
    "events_attribution",
    "dedup_span_pairs",
    "sim_topk_mips",
    "events_rfm_segments",
    "multimodal_audio_blocks",
    "text_zipf_slope",
    "streaming_hll_users",
    "dedup_span_clusters",
    "events_cusum_shift",
    "relational_cube_revenue",
    "relational_pivot_priority",
    "stats_theil_sen",
    "sketch_kmv_intersection",
    "pipeline_importance_weights",
    "graph_harmonic_closeness",
    "multimodal_ahash_pairs",
]


def _kernel_bench(all_cores: bool = True) -> dict[str, float]:
    """Single-core crypto kernel throughput, measured in-process with no
    Spark/Arrow/JVM in the loop.

    Runs BEFORE the Spark JVM is launched so the figure is as close to
    idle-core as this box gets.  Each sample is the minimum over several
    repetitions — the contention-robust estimator for a CPU-bound
    microbench (any scheduler preemption only inflates a sample, never
    deflates it).  This is the number comparable to the reference's
    published 50-100 MB/s single-core encrypt claim (BASELINE.md); the
    Spark-path figures below it additionally pay JVM->Arrow->Python
    transfer of every payload byte.
    """
    from duckdb_age_spark.contract import KP1
    from duckdb_age_spark.crypto import format as _fmt
    from duckdb_age_spark.crypto import keys as _keys

    pub = _keys.parse_recipient(KP1.public_key)
    priv = _keys.parse_identity(KP1.private_key)

    out: dict[str, float] = {}

    # per-row shape: 2 KiB payloads (documents-table scale) -> us/row
    pt_row = b"x" * 2048
    for _ in range(20):  # warm (key-cache, allocator)
        _fmt.decrypt(_fmt.encrypt(pt_row, [pub]), priv)
    n_rows = 200
    enc_best = dec_best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        cts = [_fmt.encrypt(pt_row, [pub]) for _ in range(n_rows)]
        enc_best = min(enc_best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        for ct in cts:
            _fmt.decrypt(ct, priv)
        dec_best = min(dec_best, time.perf_counter() - t0)
    out["kernel_encrypt_us_per_row"] = round(enc_best / n_rows * 1e6, 1)
    out["kernel_decrypt_us_per_row"] = round(dec_best / n_rows * 1e6, 1)

    # bulk shape: 1 MiB payloads -> MB/s per core
    pt_bulk = b"x" * (1024 * 1024)
    for _ in range(3):
        _fmt.decrypt(_fmt.encrypt(pt_bulk, [pub]), priv)
    n_blocks = 32
    enc_best = dec_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        cts = [_fmt.encrypt(pt_bulk, [pub]) for _ in range(n_blocks)]
        enc_best = min(enc_best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        for ct in cts:
            _fmt.decrypt(ct, priv)
        dec_best = min(dec_best, time.perf_counter() - t0)
    out["kernel_encrypt_mb_per_s_per_core"] = round(n_blocks / enc_best, 1)
    out["kernel_decrypt_mb_per_s_per_core"] = round(n_blocks / dec_best, 1)

    # All-cores control (r12 finding): one r12 run passed load +
    # single-core bracket + µs/row and still swept uniformly ~17% slow —
    # the single-core probe is blind to multicore-throughput degradation
    # (shared-tenant steal, turbo/thermal budgets that only bite with all
    # cores busy).  The same 2 KiB encrypt loop fanned across CPUS
    # processes (multiprocessing, NOT threads — the GIL serializes the
    # Python kernel); gated since r13 via SPARK_GRAFT_BENCH_MAX_US_ROW_MC.
    # ``all_cores=False`` skips it: the wait-for-clean loop probes the
    # cheap signals first because this control IS a 32-process load burst
    # — probing it every 30 s would inflate the very load average the
    # loop is waiting to decay (self-contention).
    if all_cores:
        try:
            out["kernel_encrypt_us_per_row_all_cores"] = _multicore_control()
        except Exception:
            pass  # control must never crash the bench
        # membw control rides the same all_cores flag: it too is a
        # deliberate full-box load burst (one triad thread per hardware
        # thread), so the wait-for-clean loop must not fire it every 30 s
        try:
            mc = _membw_probe_mc()
            if mc > 0:
                out["membw_mc_gb_per_s"] = mc
            elif mc == -2.0:
                # worker death inside the probe — make the vanished gate
                # VISIBLE in the snapshot: membw_mc_gb_per_s stays absent
                # (no check fires) but the failure is distinguishable from
                # "probe skipped" (ADVICE r14)
                out["membw_mc_probe_failed"] = 1.0
        except Exception:
            out["membw_mc_probe_failed"] = 1.0
    return out


def _membw_probe() -> float:
    """Single-threaded large-array triad bandwidth in GB/s — REPORT-ONLY.

    r13 finding (the gate arms race, next blind spot): a run can pass
    EVERY CPU-bound control — load 0.03, single-core bracket 960→1084,
    all-cores 194-212 µs/row (best calibration values ever recorded) —
    and still sweep a uniform +16-19% slow across 193 queries vs both the
    r12 clean run and a same-code run hours earlier.  The crypto kernel is
    compute-bound and cache-resident, so co-tenant MEMORY-BANDWIDTH / LLC
    pressure is invisible to every existing control, while the Spark sweep
    (scan/shuffle/hash heavy) pays full price.  This probe moves 3×256 MB
    per rep through a numpy triad (read a, write b, read b — LLC-busting
    working set), i.e. exactly the resource the crypto controls never
    touch.  Min-of-reps like the brackets (contention only inflates).
    STAYS REPORT-ONLY (membw_gb_per_s_start/_end in BENCH_extra): r14
    calibration showed this single-thread shape cannot discriminate — one
    core is latency-bound at ~9 GB/s on a >110 GB/s controller, so samples
    from gate-degraded and calm windows overlap (8.2-9.8 across both).
    The GATED membw signal is :func:`_membw_probe_mc` (all-threads
    aggregate), which sees controller-level steal directly.  Kept for
    round-over-round continuity of the r13 numbers.  NOT in the headline:
    that line sits at its 1800-byte driver-capture cap.
    """
    try:
        import numpy as np
    except Exception:
        return -1.0
    n = 32 * 1024 * 1024  # 256 MB of float64
    a = np.ones(n)
    b = np.empty_like(a)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.multiply(a, 1.0000001, out=b)
        _ = b.sum()
        best = min(best, time.perf_counter() - t0)
    del a, b
    return round(3 * n * 8 / best / 1e9, 2)


def _membw_probe_mc(
    nthreads: int | None = None,
    n: int = 4 * 1024 * 1024,
    reps: int = 8,
    invocations: int = 4,
) -> float:
    """ALL-THREADS triad aggregate bandwidth in GB/s — the gated membw
    signal (r14, VERDICT r13 item 1).

    Why a second membw probe: the single-thread triad above is
    latency/prefetch-bound, not controller-bound — one core moves ~9 GB/s
    on a controller this box drives at >110 GB/s aggregate (measured r14),
    so a co-tenant stealing 20-30% of DRAM bandwidth barely moves the
    single-thread figure (r13's degraded-day samples, 8.3-8.6 idle, overlap
    r14 samples taken minutes apart across regimes).  Saturating the
    controller with one triad worker per hardware thread makes the steal
    directly visible as a lower aggregate.

    Mechanics: ``nthreads`` numpy triad workers (threads, not processes —
    numpy releases the GIL inside multiply/sum, and threads share a start
    barrier tightly), each over its own 3×32 MB arrays (LLC-busting),
    barrier-released together; aggregate = total bytes / overlapped wall.
    Best-of-``invocations`` — contention only ever DEFLATES bandwidth, so
    max is the contention-robust estimator (the dual of the time brackets'
    min-of-reps).

    Calibration (r14, recorded in ROADMAP): on a window the existing CPU
    gate itself called degraded (bracket 753-814 MB/s/core) the best-of-4
    read 88.7; on the calmest window of the same day (load 0.03, minutes
    before a run that still swept slow) it read 114.3.  Floor default 90
    (SPARK_GRAFT_BENCH_MIN_MEMBW_MC) — refuses the observed degraded
    window, clears the best observed window; PROVISIONAL until a
    certified-clean day (sweep at r12-clean pace) widens the contrast set.
    """
    try:
        import numpy as np
    except Exception:
        return -1.0
    import threading

    if nthreads is None:
        nthreads = CPUS
    arrs = [(np.ones(n), np.empty(n)) for _ in range(nthreads)]
    best = 0.0
    for _ in range(invocations):
        barrier = threading.Barrier(nthreads)
        spans: list[tuple[float, float]] = [None] * nthreads  # type: ignore[list-item]

        def worker(i: int) -> None:
            a, b = arrs[i]
            np.multiply(a, 1.0000001, out=b)  # warm/fault the pages
            barrier.wait()
            t0 = time.perf_counter()
            for _ in range(reps):
                np.multiply(a, 1.0000001, out=b)
                _ = b.sum()
            spans[i] = (t0, time.perf_counter())

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(nthreads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if any(s is None for s in spans):
            # a worker died (allocation failure, broken barrier) without
            # recording its span — report PROBE FAILURE (-2.0) rather than
            # raising, so the caller can record it in the snapshot instead
            # of the gate silently vanishing (ADVICE r14)
            return -2.0
        wall = max(s[1] for s in spans) - min(s[0] for s in spans)
        # bytes per rep per worker: read a + write b + read b = 24n
        best = max(best, 24.0 * n * reps * nthreads / wall / 1e9)
    del arrs
    return round(best, 2)


def _mc_worker(n_rows: int) -> float:
    """Encrypt ``n_rows`` 2 KiB payloads; return elapsed seconds.  Module
    scope so multiprocessing can pickle it (spawn-safe)."""
    import time as _t

    from duckdb_age_spark.contract import KP1
    from duckdb_age_spark.crypto import format as _fmt
    from duckdb_age_spark.crypto import keys as _keys

    pub = _keys.parse_recipient(KP1.public_key)
    pt = b"x" * 2048
    _fmt.encrypt(pt, [pub])  # warm key cache
    t0 = _t.perf_counter()
    for _ in range(n_rows):
        _fmt.encrypt(pt, [pub])
    return _t.perf_counter() - t0


def _multicore_control(n_rows: int = 900) -> float:
    """us/row on the SLOWEST worker with EVERY core busy: CPUS processes
    each encrypt ``n_rows`` 2 KiB payloads and time only their own loop;
    the figure is max(worker elapsed)/n_rows.  Worker-side timing excludes
    ProcessPoolExecutor dispatch/IPC stagger (at the old 60-row size ~7 ms
    of work sat inside a wall clock dominated by scheduler overhead —
    ADVICE r12), and 900 rows x ~115 us ≈ 100 ms per worker keeps timer
    noise <1%.  On this SMT box (32 threads / 16 physical cores) healthy is
    ~2x the single-core us/row because pairs share a core; a larger gap
    means multicore-only degradation the single-core bracket cannot see."""
    import concurrent.futures as cf
    import multiprocessing as mp

    # spawn, not fork: the END bracket runs after spark.stop(), and forking
    # a process that hosted a JVM can inherit held locks from leftover py4j
    # threads — a child hang there would stall the whole bench (the
    # try/except above catches exceptions, not deadlocks).  Spawn starts
    # clean interpreters; bench.py's __main__ guard keeps re-import safe.
    with cf.ProcessPoolExecutor(max_workers=CPUS, mp_context=mp.get_context("spawn")) as pool:
        # warm the pool (interpreter + import cost must not pollute the
        # measurement; a 1-row task per worker forces full spin-up)
        list(pool.map(_mc_worker, [1] * CPUS))
        elapsed = list(pool.map(_mc_worker, [n_rows] * CPUS))
    return round(max(elapsed) / n_rows * 1e6, 1)


def contention_reasons(
    load_avg: list[float],
    kernel: dict[str, float],
    max_load: float,
    min_kernel: float,
    max_us_row: float = float("inf"),
    max_us_row_mc: float = float("inf"),
    min_membw_mc: float = 0.0,
) -> list[str]:
    """Pure contention rule (unit-tested without running the bench): a
    snapshot is tainted when the 1-minute load average exceeds
    ``max_load`` at start, the pre-JVM single-core kernel bracket sits
    below ``min_kernel`` MB/s/core, or the per-row encrypt kernel costs
    more than ``max_us_row`` us/row.  This box's healthy envelope is
    >=950 MB/s/core at ~110-125 us/row across every clean r6-r11 run; the
    tainted BENCH_r09 started at load 5.46 / 632 MB/s/core, and the r12
    floor raise exists because the r11 driver snapshot scraped through the
    old 850 floor at 851 MB/s/core / 191 us/row while ~30% degraded on its
    own yardstick (VERDICT r11 item 3)."""
    reasons = []
    if load_avg and load_avg[0] > max_load:
        reasons.append(f"load_avg_1m={load_avg[0]}>{max_load}")
    # 5-minute average too (round 11): a run started seconds after heavy
    # jobs finish can pass the 1-minute check while page-cache churn and
    # scheduler backlog still inflate medians — measured +7.7% median /
    # 31 queries >20% on a run at 1m=0.57, 5m=3.11.
    if len(load_avg) > 1 and load_avg[1] > max_load:
        reasons.append(f"load_avg_5m={load_avg[1]}>{max_load}")
    mbps = kernel.get("kernel_encrypt_mb_per_s_per_core", float("inf"))
    if mbps < min_kernel:
        reasons.append(f"start_kernel_mbps={mbps}<{min_kernel}")
    # The two kernel signals probe different shapes (1 MiB bulk vs 2 KiB
    # per-row) and a degraded box can pass one while failing the other —
    # the r11 driver window was exactly such a split at the old floors.
    us_row = kernel.get("kernel_encrypt_us_per_row", 0.0)
    if us_row > max_us_row:
        reasons.append(f"start_kernel_us_row={us_row}>{max_us_row}")
    # All-cores signal (r13, closes the r12 blind spot): a run can pass
    # every signal above yet sweep uniformly slow when degradation only
    # bites with all cores busy (the r12 180.4 s window: load 0.0,
    # bracket 953, 120 us/row — +17% median across 182 untouched
    # queries).  The key is absent when the probe skipped the control
    # (cheap-signals-first wait loop) — no check fires then.
    us_row_mc = kernel.get("kernel_encrypt_us_per_row_all_cores", 0.0)
    if us_row_mc > max_us_row_mc:
        reasons.append(f"start_kernel_us_row_all_cores={us_row_mc}>{max_us_row_mc}")
    # Memory-bandwidth signal (r14, closes the r13 blind spot): the 171.95 s
    # r13 window passed EVERY CPU-bound control (load 0.0, bracket 960-1084,
    # all-cores 194-212 — best values ever) yet swept a uniform 1.10-1.19x
    # slow across 193 queries — co-tenant DRAM/LLC pressure is invisible to
    # cache-resident crypto kernels while the scan/shuffle-heavy Spark path
    # pays full price.  The all-threads triad aggregate sees it directly.
    # Key absent ⇒ probe skipped (cheap-signals-first wait loop) or numpy
    # missing — no check fires, mirroring the all-cores control.
    membw_mc = kernel.get("membw_mc_gb_per_s", float("inf"))
    if membw_mc < min_membw_mc:
        reasons.append(f"start_membw_mc_gbps={membw_mc}<{min_membw_mc}")
    return reasons


def main() -> None:
    # Kernel microbench first: pre-JVM is the quietest this process gets,
    # and the load average brackets make any residual noise self-documenting.
    try:
        load_start = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_start = []
    kernel = _kernel_bench()

    # Contention guard (VERDICT r9 item 1): BENCH_r09 was taken at
    # load_avg 5.46 with a 632 MB/s/core start bracket — five queries
    # "regressed" >30% with zero code changes.  A dirty snapshot must
    # never silently become the round's number again: tag the JSON with
    # the specific contention signals, and under SPARK_GRAFT_BENCH_STRICT=1
    # refuse outright (exit 3) so an interactive re-measure can't be
    # fooled.  Thresholds are this box's observed healthy envelope
    # (pre-JVM bracket ≥900 across r6-r9 clean runs) and env-overridable
    # for other hardware.
    # Floors raised r12 (VERDICT r11 item 3): the driver's r11 snapshot
    # passed the old >=850 bracket floor at 851 MB/s/core while its per-row
    # kernel ran 191 us/row vs the clean 112 — ~30% degraded end to end.
    # 950/150 refuse that window; both remain env-overridable.
    max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0"))
    min_kernel = float(os.environ.get("SPARK_GRAFT_BENCH_MIN_KERNEL", "950"))
    max_us_row = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_US_ROW", "150"))
    # All-cores floor (r13, VERDICT r12 item 2): calibrated from repeated
    # clean-window samples of the max-of-workers measurement (ROADMAP r13
    # records the runs) — healthy reads ~2x the single-core us/row on
    # this SMT box (32 threads / 16 physical cores; observed 213-229),
    # while the r12 degraded windows read 330-445 on the old noisier
    # wall-clock metric.  280 = healthy envelope + ~25%, refusing every
    # observed degraded window while clearing every observed clean one.
    max_us_row_mc = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_US_ROW_MC", "280"))
    # Membw floor (r14, VERDICT r13 item 1): calibration points in the
    # _membw_probe_mc docstring — 88.7 on a CPU-gate-degraded window vs
    # 114.3 on the same day's calmest window.  90 refuses the former,
    # clears the latter; provisional until a certified-clean-day contrast.
    min_membw_mc = float(os.environ.get("SPARK_GRAFT_BENCH_MIN_MEMBW_MC", "90"))
    contended_reasons = contention_reasons(
        load_start, kernel, max_load, min_kernel, max_us_row, max_us_row_mc, min_membw_mc
    )
    # Wait-for-clean-window (VERDICT r10 item 1): rather than immediately
    # stamping a tainted snapshot, re-probe for up to
    # SPARK_GRAFT_BENCH_WAIT_S seconds (default 300; 0 disables) until the
    # box passes BOTH signals.  The r9/r10 taints were transient external
    # load — a bounded wait converts "tagged contended" into "clean, a few
    # minutes later" without changing the refusal/tagging semantics when
    # the window never opens.
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_S", "300"))
    waited = 0.0
    while contended_reasons and waited < wait_budget:
        step = min(30.0, wait_budget - waited)
        print(
            f"bench: contended ({'; '.join(contended_reasons)}); "
            f"waiting {step:.0f}s for a clean window "
            f"({waited:.0f}/{wait_budget:.0f}s used)",
            file=sys.stderr,
        )
        time.sleep(step)
        waited += step
        try:
            load_start = [round(x, 2) for x in os.getloadavg()]
        except OSError:
            load_start = []
        # cheap signals first: the all-cores control is itself a
        # 32-process burst, so probing it every 30 s would keep inflating
        # the load average this loop is waiting to decay.  Only when the
        # cheap signals pass does the full bracket (with the control) run.
        kernel = _kernel_bench(all_cores=False)
        contended_reasons = contention_reasons(
            load_start, kernel, max_load, min_kernel, max_us_row, max_us_row_mc, min_membw_mc
        )
        if not contended_reasons:
            kernel = _kernel_bench()
            contended_reasons = contention_reasons(
                load_start, kernel, max_load, min_kernel, max_us_row, max_us_row_mc, min_membw_mc
            )
    if contended_reasons:
        msg = "BENCH BOX CONTENDED: " + "; ".join(contended_reasons)
        print(msg, file=sys.stderr)
        if os.environ.get("SPARK_GRAFT_BENCH_STRICT") == "1":
            print(json.dumps({"metric": "bench_refused_contended",
                              "value": -1, "unit": "sec",
                              "contended": contended_reasons}))
            sys.exit(3)

    membw_start = _membw_probe()
    print(f"bench: membw_gb_per_s_start={membw_start}", file=sys.stderr)

    from pyspark.sql import SparkSession, functions as F

    # Session conf comes from the ENGINE's published recipe (VERDICT r15
    # item 3: one source of truth for bench, scripts, and users — the bench
    # measures exactly the session a library user gets).  The recipe's
    # rationale, incl. the preferSortMergeJoin=false join baseline, lives in
    # duckdb_age_spark/conf.py; shuffle partitions are the core count here
    # because AQE coalescing owns reduce sizing in local mode (guide §2.2).
    from duckdb_age_spark.conf import apply_recommended_conf

    builder = apply_recommended_conf(
        SparkSession.builder.master(f"local[{CPUS}]").appName("duckdb-age-spark-bench"),
        shuffle_partitions=CPUS,
    )
    builder = (
        builder
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    # JVM crypto path on the classpath so size-based routing (SCALING.md,
    # sources/encrypted.py) can engage for the large-payload sink queries
    # (VERDICT r8 item 7).  Must happen BEFORE the JVM launches; absence of
    # a JDK degrades to the Python path and the bench still runs.
    jvm_jar = None
    try:
        from duckdb_age_spark.jvm import ensure_jar

        jvm_jar = ensure_jar()
        builder = (
            builder.config("spark.jars", jvm_jar)
            .config("spark.driver.extraClassPath", jvm_jar)
            .config("spark.executor.extraClassPath", jvm_jar)
        )
    except Exception:
        pass
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    jvm_registered = False
    if jvm_jar is not None:
        try:
            from duckdb_age_spark.jvm import register_jvm_crypto

            register_jvm_crypto(spark)
            jvm_registered = True
        except Exception:
            pass

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}
    extra["jvm_crypto_registered"] = jvm_registered

    # Warm the Python worker pool once (first pandas-UDF stage pays ~100ms
    # per worker spawn across all cores; that's session setup, not a query).
    from duckdb_age_spark.contract import KP1 as _KP1
    from duckdb_age_spark.register import register as _register

    _register(spark)
    spark.range(CPUS * 4).repartition(CPUS).select(
        F.call_function("age_encrypt", F.lit(b"warmup"), F.lit(_KP1.public_key))
    ).count()

    # -- contract queries --------------------------------------------------
    # Median of REPS runs per query: this box runs concurrent JVMs and
    # single-shot timings swing 2-3×; the median is the stable figure the
    # round-over-round comparison needs.  Streaming entries checkpoint, so
    # rerunning them measures the same work each time (fresh temp sink).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    extra["reps"] = reps
    # Standing cache-hygiene gate (VERDICT r14 item 2): after each benched
    # query, the CacheManager must be EMPTY — an operator that returns a
    # plan pinning an internal persist leaks it for the session lifetime,
    # accumulating across this very sweep and skewing later medians (the
    # r13/r14 bug class).  Checking isEmpty() is one JVM call per query, so
    # the full benched surface is re-audited on every snapshot instead of
    # only in the opt-in pytest sweep; any leak is contained (clearCache)
    # so it cannot skew the remaining timings, and named in the snapshot.
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    cache_leakers: list[str] = []
    # The ~38 contract queries NOT in BENCH_QUERIES get a hygiene-ONLY
    # pass at sf0.001 (tiny — under a minute total) so the standing gate
    # covers the FULL 229-query contract surface every snapshot, not just
    # the benched 193.  No timing is recorded for these; leaks are named
    # with a "preflight:" prefix to distinguish them from benched leaks.
    hygiene_dir = os.environ.get("SPARK_GRAFT_HYGIENE_DIR", "/root/testdata/sf0.001")
    t_hyg = time.time()
    if os.path.isdir(hygiene_dir):
        for name in qs:
            if name in BENCH_QUERIES:
                continue
            try:
                qs[name](spark, hygiene_dir).count()
            except Exception as exc:  # a broken query is its own signal
                cache_leakers.append(f"preflight-error:{name}:{type(exc).__name__}")
                spark.catalog.clearCache()
                continue
            if not cache_mgr.isEmpty():
                cache_leakers.append(f"preflight:{name}")
                spark.catalog.clearCache()
    extra["hygiene_preflight_sec"] = round(time.time() - t_hyg, 1)
    for name in BENCH_QUERIES:
        samples = []
        for _ in range(reps):
            t0 = time.time()
            n = qs[name](spark, SF_DIR).count()
            samples.append(time.time() - t0)
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)
        extra[f"rows_{name}"] = n
        if not cache_mgr.isEmpty():
            cache_leakers.append(name)
            spark.catalog.clearCache()
    extra["cache_leakers"] = cache_leakers
    if cache_leakers:
        print(f"bench: CACHE HYGIENE VIOLATION: {cache_leakers}", file=sys.stderr)

    # -- crypto throughput microbenches ------------------------------------
    # Crypto wall-times get extra reps: BENCH_r02 showed a phantom 2.4x
    # "regression" on crypto_roundtrip_rows that was concurrent-JVM
    # scheduler noise (judge re-measured 92us/row idle); more samples pull
    # the median back toward the real cost.
    crypto_reps = max(reps, 7)
    extra["crypto_reps"] = crypto_reps

    from duckdb_age_spark.contract import KP1

    # bulk: 1 MiB payloads (streaming shape; reference claims 50-100 MB/s/core)
    n_blobs, blob_mib = 4 * CPUS, 1
    bulk = spark.range(n_blobs).select(
        F.expr(f"repeat('x', {blob_mib * 1024 * 1024})").cast("binary").alias("payload")
    )
    bulk = bulk.repartition(CPUS).cache()
    bulk.count()
    enc = bulk.select(
        F.octet_length(
            F.call_function("age_encrypt", F.col("payload"), F.lit(KP1.public_key))
        ).alias("n")
    )
    # First large-payload pass warms the worker pool's big-buffer path
    # (measured: 22s → 2s steady state in local mode); report steady state
    # and keep the cold figure in extras.
    t0 = time.time()
    enc.agg(F.sum("n")).collect()
    cold = time.time() - t0
    samples = []
    for _ in range(crypto_reps):
        t0 = time.time()
        enc.agg(F.sum("n")).collect()
        samples.append(time.time() - t0)
    dt = sorted(samples)[len(samples) // 2]
    timings["crypto_encrypt_bulk"] = round(dt, 3)
    total_mb = n_blobs * blob_mib
    extra["encrypt_bulk_cold_sec"] = round(cold, 3)
    extra["encrypt_bulk_mb_per_s"] = round(total_mb / dt, 1)
    extra["encrypt_bulk_mb_per_s_per_core"] = round(total_mb / dt / CPUS, 1)
    bulk.unpersist()

    # -- size-based crypto routing evidence (VERDICT r8 item 7) ------------
    # The encrypted sink routes per column by probed median payload size
    # (sources/encrypted.py): ≥64 KiB → executor-JVM cipher when
    # registered, below → Arrow-batched Python.  Record the route each
    # fixture actually took so BENCH_r*.json is the routing's evidence,
    # not just SCALING.md's prose.
    import shutil
    import tempfile

    from duckdb_age_spark.sources.encrypted import write_encrypted

    sink_dir = tempfile.mkdtemp(prefix="age_route_")
    try:
        big = spark.range(2 * CPUS).select(
            "id", F.expr("repeat('b', 262144)").alias("payload")  # 256 KiB
        )
        small = spark.range(2 * CPUS).select(
            "id", F.expr("repeat('s', 2048)").alias("payload")  # 2 KiB
        )
        t0 = time.time()
        r_big = write_encrypted(big, f"{sink_dir}/big", ["payload"], KP1.public_key)
        extra["route_256KiB"] = r_big["payload"]
        extra["route_256KiB_sec"] = round(time.time() - t0, 3)
        t0 = time.time()
        r_small = write_encrypted(small, f"{sink_dir}/small", ["payload"], KP1.public_key)
        extra["route_2KiB"] = r_small["payload"]
        extra["route_2KiB_sec"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(sink_dir, ignore_errors=True)

    # per-row: encrypt+decrypt round-trip over real documents
    # repartition: the sf0.1 parquet is a single split, which would serialize
    # the UDF onto one core — at target scale the input arrives in thousands
    # of partitions, so the parallel shape is the representative one.
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("text").cast("binary").alias("payload")
    )
    docs = docs.repartition(CPUS).cache()
    n_rows = docs.count()
    n_bytes = docs.agg(F.sum(F.octet_length("payload"))).collect()[0][0]
    rt = docs.select(
        F.call_function(
            "age_decrypt",
            F.call_function("age_encrypt", F.col("payload"), F.lit(KP1.public_key)),
            F.lit(KP1.private_key),
        ).alias("pt")
    )
    # Median of reps, same policy as the contract queries above: the first
    # execution pays one-time python-worker ramp for the chained two-UDF
    # stage (measured 5.9s cold vs 1.3s steady at sf0.1); report the steady
    # state and keep the cold figure in extras.
    samples = []
    for _ in range(crypto_reps):
        t0 = time.time()
        rt.agg(F.sum(F.octet_length("pt"))).collect()
        samples.append(time.time() - t0)
    dt = sorted(samples)[len(samples) // 2]
    timings["crypto_roundtrip_rows"] = round(dt, 3)
    extra["roundtrip_cold_sec"] = round(samples[0], 3)
    extra["roundtrip_rows_per_s"] = round(n_rows / dt, 1)
    extra["roundtrip_mb_per_s"] = round(n_bytes / 1e6 / dt, 2)
    docs.unpersist()

    try:
        load_end = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_end = []
    # Second kernel control AFTER the sweep (VERDICT r6 item 8): the box
    # has drifted hundreds of MB/s/core at idle within one session, so one
    # pre-run control can't tell box drift from a code regression.  The
    # bracket pair lets the reader normalize round-over-round comparisons
    # without forensics: a healthy run has start ≈ end; a drifting box
    # shows it here.  Stop the Spark session FIRST — the first r7 run
    # measured 610 MB/s/core with executor threads still settling vs 950
    # pre-JVM on the same box; post-stop the control is symmetric with the
    # pre-JVM one (min-of-reps only ever inflates under contention).
    # Drop this run's pid-keyed bucketed tables while the session is still
    # alive — the contract's atexit hook is a no-op once spark.stop() has
    # run, which is exactly what happens next (ADVICE r7).
    try:
        from duckdb_age_spark import contract as _contract

        for _t in _contract._BUCKETED_CLEANUP:
            spark.sql(f"DROP TABLE IF EXISTS {_t}")
    except Exception:
        pass  # best-effort: bench numbers must not depend on catalog state
    spark.stop()
    kernel_end = _kernel_bench()
    _end_mbps = kernel_end.get("kernel_encrypt_mb_per_s_per_core", float("inf"))
    if _end_mbps < min_kernel:
        contended_reasons.append(f"end_kernel_mbps={_end_mbps}<{min_kernel}")
    _end_membw_mc = kernel_end.get("membw_mc_gb_per_s", float("inf"))
    if _end_membw_mc < min_membw_mc:
        contended_reasons.append(f"end_membw_mc_gbps={_end_membw_mc}<{min_membw_mc}")
    if load_end and load_end[0] > max_load + CPUS * 0.5:
        # end load includes our own just-stopped executor threads; only a
        # figure far above what this process accounts for flags external load
        contended_reasons.append(f"load_avg_1m_end={load_end[0]}")
    membw_end = _membw_probe()
    print(f"bench: membw_gb_per_s_end={membw_end}", file=sys.stderr)
    extra["membw_gb_per_s_start"] = membw_start
    extra["membw_gb_per_s_end"] = membw_end
    extra["contended"] = contended_reasons
    extra["load_avg_start"] = load_start
    extra["load_avg_end"] = load_end
    extra.update(kernel)
    extra.update({f"end_{k}": v for k, v in kernel_end.items()})
    # Embed the latest payload-size sweep (scripts/payload_sweep.py) so the
    # committed BENCH_extra.json records the python-vs-JVM crypto-path
    # throughput at 2 KiB / 64 KiB / 1 MiB (VERDICT r7 item 3).  The sweep
    # needs its own session (the UDF jar must be on the driver classpath at
    # JVM launch), so it runs separately and bench just carries the file.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "PAYLOAD_SWEEP.json")) as f:
            extra["payload_sweep"] = json.load(f)
    except (OSError, ValueError):
        pass

    total = round(sum(timings.values()), 3)
    # Bracket-normalized times (VERDICT r11 item 3): scale every wall time
    # to a reference box speed so cross-round diffs stop misfiring on box
    # drift.  The yardstick is the mean of the pre-JVM and post-stop
    # single-core encrypt brackets (min-of-reps, so contention only ever
    # lowers it); REF=1000 MB/s/core is this box's clean-run envelope.  A
    # degraded box (bracket < REF) has inflated raw times, so normalized =
    # raw * bracket/REF deflates them to clean-box-equivalent.  This is a
    # linear model of CPU-bound drift — good enough to separate
    # "environment" from "code regression" (the r11 driver snapshot's 20
    # phantom regressions all vanish under it), not a substitute for the
    # contention gate, which still refuses badly degraded windows outright.
    bracket_ref = float(os.environ.get("SPARK_GRAFT_BENCH_BRACKET_REF", "1000"))
    brackets = [
        kernel.get("kernel_encrypt_mb_per_s_per_core"),
        kernel_end.get("kernel_encrypt_mb_per_s_per_core"),
    ]
    brackets = [x for x in brackets if x]
    bracket_mean = round(sum(brackets) / len(brackets), 1) if brackets else None
    norm_factor = round(bracket_mean / bracket_ref, 4) if bracket_mean else None
    if norm_factor:
        extra["bracket_normalized"] = {
            k: round(v * norm_factor, 3) for k, v in timings.items()
        }
        extra["bracket_norm_factor"] = norm_factor
    total_normalized = round(total * norm_factor, 3) if norm_factor else None
    # The driver tail-captures stdout and parses the LAST line as JSON: keep
    # that line small (headline only — no per-query row counts).  The full
    # detail (row counts, MB/s figures) goes to stderr and BENCH_extra.json
    # so a human can still diff it.
    detail = {"queries": timings, "extra": extra, "sf": sf, "total_sec": total}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_extra.json"), "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    except OSError:
        pass
    print(json.dumps(detail), file=sys.stderr)
    headline = {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        # the same total deflated to the REF-bracket box (see
        # bracket_normalized in BENCH_extra.json for per-query values):
        # compare THIS field round-over-round, not the raw one
        "value_normalized": total_normalized,
        "bracket_mean": bracket_mean,
        "bracket_ref": bracket_ref,
        "queries": timings,
        "sf": sf,
        # Idle single-core kernel figures as first-class fields: the
        # wall-time medians above swing 2-3x with concurrent JVMs on this
        # box (BENCH_r02's phantom crypto regression); these are measured
        # pre-JVM with min-of-reps and are the stable round-over-round
        # crypto signal.  load_avg documents how noisy the run was.
        # membw_mc_gb_per_s lives in BENCH_extra only — the headline sits
        # at its 1800-byte driver-capture cap (VERDICT r13 item 1)
        "kernel": {k: v for k, v in kernel.items() if k != "membw_mc_gb_per_s"},
        # the same control re-measured after the sweep: start ≈ end means a
        # quiet box; a gap means drift, and query medians should be read
        # against the bracket, not either endpoint
        "kernel_end": {k: v for k, v in kernel_end.items() if k != "membw_mc_gb_per_s"},
        "load_avg": {"start": load_start, "end": load_end},
        # non-empty list = this snapshot was taken on a contended box and
        # must not be read as a round-over-round regression signal
        "contended": contended_reasons,
        # standing hygiene gate (VERDICT r14 item 2): count of benched
        # queries that left a pinned CacheManager entry (names in
        # BENCH_extra.json's cache_leakers); MUST be 0 on a clean snapshot
        "cache_leaks": len(cache_leakers),
    }
    line = json.dumps(headline)
    # The driver captures only the LAST ~2000 chars of stdout and parses the
    # final line as JSON — a headline longer than the window gets its FRONT
    # cut off and fails to parse (BENCH_r03's "tail" field shows exactly
    # that: valid-looking JSON starting mid-stream).  So the budget is the
    # WINDOW size with margin, not 4 KiB: keep the crypto signal plus the
    # slowest queries, dropping entries until the line fits.  Full per-query
    # detail always lands in BENCH_extra.json regardless.
    BUDGET = 1800
    if len(line) > BUDGET:
        crypto = [k for k in ("crypto_encrypt_bulk", "crypto_roundtrip_rows") if k in timings]
        rest = sorted(
            (k for k in timings if k not in crypto), key=lambda k: -timings[k]
        )
        headline["n_queries"] = len(timings)
        # descending keep counts ending at an explicit 0 (crypto-only), so a
        # fitting line is guaranteed if the fixed fields fit at all; the
        # final fallback drops the queries dict entirely rather than ever
        # printing an oversized line (the BENCH_r03 failure mode).
        # coarse 5-steps down, then fine 1-steps through the last few so a
        # small queries dict that WOULD fit is never skipped over
        for keep in [*range(len(rest) - 1, 4, -5), *range(min(4, len(rest) - 1), -1, -1)]:
            headline["queries"] = {k: timings[k] for k in crypto + sorted(rest[:keep])}
            line = json.dumps(headline)
            if len(line) <= BUDGET:
                break
        if len(line) > BUDGET:
            headline["queries"] = {}
            line = json.dumps(headline)
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()
