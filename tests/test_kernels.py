"""Kernel-level dispatch + error-string parity tests (reference:
test/sql/age.test error cases), without a Spark session."""

from __future__ import annotations

import pytest

from duckdb_age_spark import errors
from duckdb_age_spark.functions import (
    decrypt_kernel,
    encrypt_kernel,
    encrypt_multi_kernel,
    resolve_identity,
    resolve_recipient,
)
from tests.conftest import PRIV1, PUB1

SECRETS = {"test_secret": {"public_key": PUB1, "private_key": PRIV1}}
NO_SECRETS: dict = {}


def test_dispatch_rules():
    assert resolve_recipient(PUB1, NO_SECRETS) == PUB1  # age1 prefix → raw key
    assert resolve_recipient("test_secret", SECRETS) == PUB1
    assert resolve_identity(PRIV1, NO_SECRETS) == PRIV1
    assert resolve_identity("test_secret", SECRETS) == PRIV1


# reference: test/sql/age.test:24-28
def test_encrypt_invalid_key():
    with pytest.raises(errors.AgeError) as e:
        encrypt_kernel(b"hello world", "invalid_key", NO_SECRETS)
    assert "Invalid age recipient key: invalid_key (not a valid age key or secret name)" in str(e.value)


# reference: test/sql/age.test:30-34
def test_encrypt_malformed_age_key():
    with pytest.raises(errors.AgeError) as e:
        encrypt_kernel(b"hello world", "age1invalid", NO_SECRETS)
    assert str(e.value) == "Invalid age recipient key: age1invalid"


# reference: test/sql/age.test:36-40
def test_encrypt_empty_key():
    with pytest.raises(errors.AgeError) as e:
        encrypt_kernel(b"hello world", "", NO_SECRETS)
    assert str(e.value) == "Invalid age recipient key:  (not a valid age key or secret name)"


def test_encrypt_secret_without_public_key():
    secrets = {"priv_only": {"public_key": None, "private_key": PRIV1}}
    with pytest.raises(errors.AgeError, match="not a valid age key or secret name"):
        encrypt_kernel(b"x", "priv_only", secrets)


# reference: test/sql/age.test:42-47,59-75
def test_secret_name_roundtrip():
    ct = encrypt_kernel(b"both secrets", "test_secret", SECRETS)
    assert decrypt_kernel(ct, "test_secret", SECRETS) == b"both secrets"
    ct2 = encrypt_kernel(b"secret test", PUB1, NO_SECRETS)
    assert decrypt_kernel(ct2, "test_secret", SECRETS) == b"secret test"


# reference: test/sql/age.test:77-81
def test_decrypt_invalid_identity():
    ct = encrypt_kernel(b"test", PUB1, NO_SECRETS)
    with pytest.raises(errors.AgeError) as e:
        decrypt_kernel(ct, "invalid_key", NO_SECRETS)
    assert "Invalid age identity key: invalid_key (not a valid age key or secret name)" in str(e.value)


# reference: test/sql/age.test:83-90 — valid-prefix wrong key → Decryption failed
def test_decrypt_wrong_key():
    ct = encrypt_kernel(b"test", PUB1, NO_SECRETS)
    with pytest.raises(errors.AgeError) as e:
        decrypt_kernel(ct, "AGE-SECRET-KEY-1" + "A" * 58, NO_SECRETS)
    assert str(e.value).startswith("Decryption failed")


# reference: test/sql/age.test:92-96
def test_decrypt_empty_key():
    ct = encrypt_kernel(b"test", PUB1, NO_SECRETS)
    with pytest.raises(errors.AgeError) as e:
        decrypt_kernel(ct, "", NO_SECRETS)
    assert str(e.value) == "Invalid age identity key:  (not a valid age key or secret name)"


# reference: test/sql/age.test:113-117
def test_multi_empty_list():
    with pytest.raises(errors.AgeError) as e:
        encrypt_multi_kernel(b"test", [], NO_SECRETS)
    assert str(e.value) == "Recipients list cannot be empty"


# reference: test/sql/age.test:119-123
def test_multi_invalid_recipient():
    with pytest.raises(errors.AgeError) as e:
        encrypt_multi_kernel(b"test", ["invalid_key"], NO_SECRETS)
    assert str(e.value) == "Invalid recipient: invalid_key"


# reference: rust/src/lib.rs:285 path — resolved-but-malformed age1 key
def test_multi_malformed_at_position():
    with pytest.raises(errors.AgeError) as e:
        encrypt_multi_kernel(b"test", [PUB1, "age1invalid"], NO_SECRETS)
    assert str(e.value) == "Encryption failed: Invalid recipient at position 1: age1invalid"


# reference: test/sql/age.test:125-133
def test_multi_mixed_keys_and_secrets():
    from duckdb_age_spark.functions import decrypt_kernel

    ct = encrypt_multi_kernel(b"mixed", [PUB1, "test_secret"], SECRETS)
    assert ct is not None
    assert decrypt_kernel(ct, PRIV1, NO_SECRETS) == b"mixed"


# --- driver priority order (VERDICT r1 item 1b) ------------------------------


def test_priority_50_covers_every_operator_family():
    """The driver records CORRECTNESS rows for only the first 50 queries()
    entries; this pins that those 50 slots include at least one query from
    every operator family, so a family can never silently lose its driver
    gate when queries are added."""
    from duckdb_age_spark import contract

    names = list(contract.QUERIES)
    first50 = set(names[:50])
    assert names[:50] == contract._PRIORITY_50
    # Membership is the FULL roster per family (not just the current
    # priority picks) so the first-50 list can rotate between rounds —
    # VERDICT r4 item 1 — while this gate still proves every family keeps
    # a driver-attested representative.  The roster moved to
    # duckdb_age_spark/families.py in r13 so scripts/rotation.py (the
    # per-round recompute) and this gate share one source; the inline
    # copy below pins the EXPECTED family keys so a silent roster edit
    # cannot weaken the gate.
    from duckdb_age_spark.families import FAMILIES as families

    assert set(families) == {
        "crypto", "dq", "upsert", "sinks", "setops", "streaming", "text",
        "pipeline", "dedup", "similarity", "grouped_map", "events",
        "window_cube", "graph_layout", "relational", "skew", "stats",
        "temporal", "extension_points", "multimodal", "sketches",
    }
    for family, members in families.items():
        assert first50 & set(members), f"family {family} has no query in the first 50"
    # every priority entry must also have an oracle so all 50 driver rows are
    # full three-check comparisons, not weaker rows-only checks
    assert all(n in contract.ORACLE_SQL for n in contract._PRIORITY_50)


# --- bench contention guard (VERDICT r9 item 1) -------------------------------


def test_bench_contention_reasons():
    """The rule that decides whether a bench snapshot is tainted: BENCH_r09
    was taken at load 5.46 / 632 MB/s/core and its five phantom regressions
    cost a round — pin that exact shape as contended, a clean-box shape as
    not, and each signal independently."""
    import bench

    healthy = {"kernel_encrypt_mb_per_s_per_core": 1008.2, "kernel_encrypt_us_per_row": 112.0}
    tainted = {"kernel_encrypt_mb_per_s_per_core": 632.5, "kernel_encrypt_us_per_row": 240.0}
    assert bench.contention_reasons([0.02, 0.01, 0.3], healthy, 2.0, 950, 150) == []
    # the BENCH_r09 shape: all four signals fire (1m, 5m, bulk kernel, per-row)
    r9 = bench.contention_reasons([5.46, 4.03, 2.57], tainted, 2.0, 950, 150)
    assert len(r9) == 4 and "load_avg_1m=5.46>2.0" in r9[0] and "632.5" in r9[2]
    assert "load_avg_5m=4.03>2.0" in r9[1]
    assert "start_kernel_us_row=240.0>150" in r9[3]
    # the round-11 shape the 5m signal exists for: 1m decayed below the
    # threshold seconds after heavy jobs finished, but the box was NOT
    # quiet (measured +7.7% median across 193 queries)
    assert bench.contention_reasons([0.57, 3.11, 5.69], healthy, 2.0, 950, 150) == [
        "load_avg_5m=3.11>2.0"
    ]
    # THE r12 floor-raise case (VERDICT r11 item 3): the r11 driver window
    # — quiet load, bracket 851.1 MB/s/core at 191.4 us/row — scraped the
    # old >=850 floor by 0.1% while ~30% degraded and inflated the round's
    # committed totals.  The raised floors must refuse it on BOTH kernel
    # signals, and must have refused it at the old floor too via us/row.
    r11_window = {
        "kernel_encrypt_mb_per_s_per_core": 851.1,
        "kernel_encrypt_us_per_row": 191.4,
    }
    got = bench.contention_reasons([0.3, 0.4, 0.5], r11_window, 2.0, 950, 150)
    assert got == [
        "start_kernel_mbps=851.1<950",
        "start_kernel_us_row=191.4>150",
    ]
    # each signal alone
    assert bench.contention_reasons([3.0, 0, 0], healthy, 2.0, 950, 150) == [
        "load_avg_1m=3.0>2.0"
    ]
    assert bench.contention_reasons([0.1, 0, 0], tainted, 2.0, 600, 300) == []
    # missing signals never false-positive (getloadavg can raise; a kernel
    # dict without the key means the microbench was skipped); max_us_row
    # also defaults open for callers that pass only the original four args
    assert bench.contention_reasons([], {}, 2.0, 950, 150) == []
    assert bench.contention_reasons([0.1], healthy, 2.0, 950) == []
    # THE r13 gate addition (VERDICT r12 item 2): the r12 180.4 s window —
    # load 0.0, bracket 953, 120 us/row — passed every signal above while
    # sweeping a uniform +17% median across 182 untouched queries; only
    # the all-cores control saw it (multicore-only degradation).  A
    # synthetic bracket of that shape must now be refused on exactly the
    # all-cores signal, and a healthy all-cores reading must pass.
    r12_blindspot = {
        "kernel_encrypt_mb_per_s_per_core": 953.0,
        "kernel_encrypt_us_per_row": 120.0,
        "kernel_encrypt_us_per_row_all_cores": 367.0,
    }
    assert bench.contention_reasons([0.0, 0.1, 0.2], r12_blindspot, 2.0, 950, 150, 280) == [
        "start_kernel_us_row_all_cores=367.0>280"
    ]
    mc_healthy = dict(healthy, kernel_encrypt_us_per_row_all_cores=224.5)
    assert bench.contention_reasons([0.1, 0.1, 0.1], mc_healthy, 2.0, 950, 150, 280) == []
    # a kernel dict WITHOUT the all-cores key (the wait loop's cheap
    # probe skips the 32-process burst) must not fire the new signal
    assert bench.contention_reasons([0.1, 0.1, 0.1], healthy, 2.0, 950, 150, 280) == []
    # THE r14 gate addition (VERDICT r13 item 1): the r13 171.95 s window —
    # load 0.0, bracket 960-1084, all-cores 194-212, the best CPU control
    # values ever recorded — still swept a uniform 1.10-1.19x slow across
    # 193 queries: co-tenant MEMORY-BANDWIDTH pressure is invisible to
    # every cache-resident CPU control.  A synthetic bracket of exactly
    # that shape with a degraded all-threads membw aggregate must be
    # refused on exactly the membw signal; the same shape at the calm
    # calibration value (114.3, r14) must pass.
    r13_blindspot = {
        "kernel_encrypt_mb_per_s_per_core": 1084.4,
        "kernel_encrypt_us_per_row": 120.0,
        "kernel_encrypt_us_per_row_all_cores": 211.7,
        "membw_mc_gb_per_s": 62.0,
    }
    assert bench.contention_reasons([0.0, 0.1, 0.2], r13_blindspot, 2.0, 950, 150, 280, 90) == [
        "start_membw_mc_gbps=62.0<90"
    ]
    membw_healthy = dict(r13_blindspot, membw_mc_gb_per_s=114.3)
    assert bench.contention_reasons([0.0, 0.1, 0.2], membw_healthy, 2.0, 950, 150, 280, 90) == []
    # the observed r14 degraded-window value (88.7, sampled while the CPU
    # gate itself read the box as degraded) sits under the 90 floor
    membw_degraded = dict(membw_healthy, membw_mc_gb_per_s=88.7)
    assert bench.contention_reasons([0.0, 0.1, 0.2], membw_degraded, 2.0, 950, 150, 280, 90) == [
        "start_membw_mc_gbps=88.7<90"
    ]
    # key absent (cheap-signals-first wait loop skipped the burst, or
    # numpy import failed) ⇒ no membw check fires
    assert bench.contention_reasons([0.1, 0.1, 0.1], mc_healthy, 2.0, 950, 150, 280, 90) == []


# --- float-sum determinism guard (VERDICT r6 item 2) --------------------------


def test_bench_membw_probe_reports_positive_bandwidth():
    """r13 gate finding: two clean-gate runs (best bracket/all-cores values
    ever recorded) still swept uniformly ~1.1-1.2x slower than r12-clean -
    every gate control is CPU-bound and cache-resident, blind to co-tenant
    memory-bandwidth/LLC pressure that the scan/shuffle-heavy suite pays
    for.  bench._membw_probe() is the report-only instrument for that
    resource (BENCH_extra membw_gb_per_s_start/_end); pin its contract: a
    positive, plausibly-bounded GB/s figure (a broken probe returning 0/
    negative/absurd values would silently poison the r14 calibration that
    is supposed to set the floor)."""
    import bench

    gbps = bench._membw_probe()
    # numpy is baked into this environment, so the -1.0 import-guard path
    # must NOT be what we exercise here
    assert gbps > 0.5, gbps
    # single-thread triad on any hardware this could run on sits well
    # under 1 TB/s; catches unit mistakes (bytes vs GB, per-rep vs total)
    assert gbps < 1000, gbps
    # the GATED instrument (r14): all-threads aggregate — same plausibility
    # contract, and it must exceed the single-thread figure (it saturates
    # the controller the single-thread probe cannot).  Small shape to keep
    # the test cheap; the bench runs the full CPUS-thread version.
    agg = bench._membw_probe_mc(nthreads=4, n=1024 * 1024, reps=4, invocations=2)
    assert agg > gbps, (agg, gbps)
    assert agg < 10000, agg


def test_kernel_bench_records_membw_probe_failure(monkeypatch):
    """ADVICE r14 (low): if a probe worker dies (allocation failure, broken
    barrier), the old code raised TypeError on the None span, _kernel_bench
    swallowed it, and the membw gate silently vanished — a bandwidth-
    degraded box would pass as clean with no trace.  Pin the fix: a probe
    failure (-2.0 sentinel, or an exception) records membw_mc_probe_failed
    in the kernel snapshot and never sets the gated key."""
    import bench

    monkeypatch.setattr(bench, "_multicore_control", lambda: 200.0)

    monkeypatch.setattr(bench, "_membw_probe_mc", lambda: -2.0)
    out = bench._kernel_bench()
    assert "membw_mc_gb_per_s" not in out
    assert out["membw_mc_probe_failed"] == 1.0

    def _boom() -> float:
        raise RuntimeError("worker vanished")

    monkeypatch.setattr(bench, "_membw_probe_mc", _boom)
    out = bench._kernel_bench()
    assert "membw_mc_gb_per_s" not in out
    assert out["membw_mc_probe_failed"] == 1.0

    # the numpy-missing sentinel (-1.0) stays "probe skipped": neither key
    monkeypatch.setattr(bench, "_membw_probe_mc", lambda: -1.0)
    out = bench._kernel_bench()
    assert "membw_mc_gb_per_s" not in out
    assert "membw_mc_probe_failed" not in out


def test_every_rounded_sum_oracle_is_audited():
    """Every oracle whose SQL rounds a sum() is a member of the IEEE
    reduction-order hazard class that flaked ``tpch_q9`` in round 5: if the
    summed expression is a non-integer DOUBLE, the result can depend on
    Spark's partition-dependent reduction tree.  This gate pins the full
    member list with a per-query audit verdict so a NEW query that rounds a
    sum cannot land without a conscious entry here (and, when 'swept', a
    matching row in scripts/sweep_determinism.py FAMILY).

    Audit vocabulary:
      int-units  — the sum's operand is an exact integer (CAST(round(x*scale)
                   AS BIGINT) cents/ppm/nano units, or counts): exact in any
                   order, safe by construction (operators/exact.py).
      int-valued — the operand is a DOUBLE but every value is integer-valued
                   (l_quantity): IEEE doubles add exactly below 2^53, safe.
      swept      — genuinely order-sensitive float terms; covered by the
                   rotating-config determinism sweep FAMILY.
    """
    import re

    from duckdb_age_spark import contract

    audited = {
        # name -> verdict (see vocabulary above)
        "text_unigram_logprob": "int-units",
        "setops_full_outer_reconcile": "int-units",
        "stats_price_histogram": "int-units",
        "stats_corr_exact": "int-units",
        "tpch_q1": "int-units",
        "tpch_q14": "int-units",   # converted r7 — also in sweep FAMILY
        "tpch_q18": "int-valued",  # sum(l_quantity): integer-valued doubles
        "tpch_q22": "int-units",
        "tpch_q8": "int-units",
        "tpch_q11": "int-units",
        "skew_salted_join": "int-valued",  # sum(l_quantity)
        "pivot_priority_by_flag": "int-units",
        "rollup_timebuckets": "int-units",
        "stats_label_centroids": "int-units",
        "stats_linreg": "int-units",
        "stats_benford": "int-units",
        "text_bigram_logprob": "int-units",
        "rollup_order_concurrency": "int-units",  # n_open is a count
        "stats_quantile_binning": "int-units",
        "stats_ks_test": "int-units",
        "stats_gini": "int-units",
        "events_uptime": "int-units",  # gap sums are integer microseconds
        "rollup_autocorr": "int-units",
        "stats_psi_drift": "int-units",  # nano-int terms, order-free
        "stats_welch_ttest": "int-units",
        "events_pareto_share": "int-units",  # c is a count
        "relational_revenue_share": "int-units",
        "text_langid_confusion": "int-units",  # n is a count
        "relational_transition_matrix": "int-units",
        "graph_assortativity": "int-units",  # degrees are integers
        "stats_grouped_trend": "int-units",
        "dedup_threshold_sweep": "int-units",  # dot of 6-dp-fixed ints
        "relational_share_of_parent": "int-units",
        "stats_mann_whitney": "int-units",
        "rollup_acf_multi_lag": "int-units",
        "events_dow_seasonality": "int-units",
        "rollup_anomaly_z": "int-units",
    }
    def _round_wraps_sum(sql: str) -> bool:
        # Balanced-paren scan of each round(...) argument (ADVICE r7: a
        # fixed 400-char window let a sum() sitting deeper in a long CTE
        # escape the audit).  Flags round(<arg>) iff a sum( appears
        # anywhere INSIDE the balanced argument.  String literals are
        # blanked first so a ')' inside '...' can't close the span early
        # and hide a following sum() (code-review r8); '' escapes are
        # consumed by the non-greedy repeat.
        sql = re.sub(r"'(?:[^']|'')*'", "''", sql)
        for rm in re.finditer(r"round\(", sql, re.I):
            depth, i = 1, rm.end()
            while i < len(sql) and depth:
                if sql[i] == "(":
                    depth += 1
                elif sql[i] == ")":
                    depth -= 1
                i += 1
            if re.search(r"\bsum\(", sql[rm.end() : i - 1], re.I):
                return True
        return False

    members = {name for name, sql in contract.ORACLE_SQL.items() if _round_wraps_sum(sql)}
    # detector self-check: the scan must still see known TRUE positives
    # (sum INSIDE a round argument), so a future regex regression can't
    # silently empty the member set.  Note sum(round(...)) — per-row round
    # then exact integer sum, e.g. tpch_q1 — is correctly NOT a member:
    # that shape is order-insensitive by construction.
    assert {"tpch_q14", "stats_gini", "events_uptime"} <= members
    unaudited = members - set(audited)
    assert not unaudited, (
        f"oracles round a sum() without a determinism audit entry: {sorted(unaudited)} "
        "— classify each as int-units / int-valued, or convert to exact integer "
        "units (operators/exact.py) / add to sweep_determinism.py FAMILY"
    )
    # swept members must actually be in the sweep FAMILY file
    import os

    fam_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "sweep_determinism.py",
    )
    fam_src = open(fam_path).read()
    for name, verdict in audited.items():
        if verdict == "swept":
            assert f'"{name}"' in fam_src, f"{name} audited as swept but absent from FAMILY"
    # the r5 flake class itself stays pinned in the sweep
    for pinned in ("tpch_q9", "tpch_q14"):
        assert f'"{pinned}"' in fam_src


def test_negative_dividend_integer_division_parity(spark):
    """Pin the semantics every DIV-based oracle depends on: Spark `DIV`
    and DuckDB integer `//` BOTH truncate toward zero on negative
    dividends (-7 → -3, not -4).  theil_sen_trend divides a negative
    dividend and relies on this outright; zipf/importance-weights keep
    dividends positive only as defense-in-depth (see their docstrings).
    If either engine ever switches to floored division this fails loudly
    at the exact operator family affected (ADVICE r8)."""
    import duckdb

    cases = [(-7, 2), (7, -2), (-7, -2), (-1, 3), (-999999999999, 7), (5, 3)]
    duck = duckdb.sql(
        "SELECT " + ", ".join(f"({a}) // ({b})" for a, b in cases)
    ).fetchone()
    spk = spark.sql(
        "SELECT " + ", ".join(f"({a}) DIV ({b})" for a, b in cases)
    ).first()
    py_trunc = [int(a / b) for a, b in cases]  # Python int() truncates toward 0
    assert list(duck) == py_trunc, "DuckDB // no longer truncates toward zero"
    assert list(spk) == py_trunc, "Spark DIV no longer truncates toward zero"
    # and HUGEINT `//` (what the zipf oracle actually uses) agrees too;
    # DECIMAL `//` does NOT (it silently becomes DOUBLE true-division) —
    # which is why no oracle uses DECIMAL with `//`
    assert duckdb.sql("SELECT (-7)::HUGEINT // 2::HUGEINT").fetchone()[0] == -3
