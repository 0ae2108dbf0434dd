"""Portable cardinality sketches: HyperLogLog + KMV (theta-style).

The reference engine ships no sketch operators, but a 100 TB training-data
pipeline lives on them (distinct-URL counts, per-source reach, dedup-rate
monitoring without a global distinct).  These implementations are
ENGINE-PORTABLE by construction: every hashed quantity derives from the
repo's canonical 60-bit md5 key (same value in Spark and DuckDB, see
pipeline._md5_rank / contract.py determinism rules), all register/sketch
arithmetic is exact integer (BIGINT throughout — no float accumulation
anywhere), and the single estimate expression at the end is one IEEE
division of exact integers, bit-identical across engines.  That is what
lets a DuckDB oracle replay the *identical* sketch cell-by-cell — the same
property the CMS heavy-hitter and Bloom-prefilter operators pin.

Scale shape:
* HLL registers: one groupBy over m=2^b buckets with a max() partial
  aggregate — map-side combinable, the shuffle carries at most m rows per
  partition regardless of input size.  The m-row register table then
  reduces to ONE row.  This is the textbook distributed-HLL plan (merge =
  max per register), so the operator would run unchanged on 100 TB.
* KMV: per-group top-k smallest keys via row_number — Spark's
  WindowGroupLimit pushes the limit into per-partition partial top-k
  before the shuffle, so the exchange carries ≤ k rows per partition per
  group.  Sketch UNION merges the per-group k-minima lists (k rows per
  group, driver-free) — demonstrating the mergeability that makes KMV
  usable across 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# 60-bit md5 key — identical in DuckDB as ('0x'||substr(md5(x),1,15))::BIGINT
KEY_BITS = 60


def key60(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant for m >= 128 (Flajolet et al. 2007).
    Computed once in Python from literals; both engines receive the SAME
    double literal, so no cross-engine libm involvement."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, col: str, b: int = 8) -> DataFrame:
    """HLL register table for ``col``: (bucket, register) with
    register = max over the bucket's keys of rho(w), rho = leading-zero
    rank of the (60-b)-bit suffix.

    rho uses length(bin(w)) — both engines' bin() renders without leading
    zeros, so 53 - length(bin(w)) IS the leading-zero count of a 52-bit
    (b=8) suffix, with the w=0 row pinned to the max rank 53 explicitly
    (bin(0)='0' has length 1, which would undercount by one).
    """
    m = 1 << b
    suffix_bits = KEY_BITS - b
    suffix_mod = 1 << suffix_bits
    key = key60(col)
    # integer ops only: a double division of 2^60-scale keys would lose
    # bits past the 2^53 exact range
    bucket = F.shiftright(key, suffix_bits)
    w = key % F.lit(suffix_mod)
    rho = F.when(w == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("long").alias("register"))
    )


def hll_estimate(df: DataFrame, col: str, b: int = 8) -> DataFrame:
    """One-row HLL cardinality estimate next to the exact count.

    The harmonic sum is kept EXACT: S = sum over all m buckets of
    2^(rmax - register), register = 0 for empty buckets, rmax = 61-b.
    Max possible S = m * 2^rmax = 2^61 < 2^63, so a BIGINT sum is exact in
    any order.  The estimate alpha*m^2*2^rmax / S is then ONE double
    division of exact integers (identical IEEE result on both engines).
    err_bp uses floor(), not round(), so no half-way rounding hazard.
    """
    m = 1 << b
    rmax = KEY_BITS - b + 1
    regs = hll_registers(df, col, b)
    agg = regs.agg(
        F.count("*").cast("long").alias("n_buckets"),
        # 1 << (rmax - register), never libm pow (not guaranteed exact)
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - CAST(register AS INT))")).alias(
            "s_present"
        ),
    )
    exact = df.agg(F.countDistinct(col).cast("long").alias("exact_n"))
    numer = hll_alpha(m) * m * m * float(1 << rmax)
    out = agg.crossJoin(exact).select(
        F.lit(m).cast("long").alias("m"),
        "n_buckets",
        (F.col("s_present") + (F.lit(m) - F.col("n_buckets")) * F.lit(1 << rmax))
        .cast("long")
        .alias("s_scaled"),
        "exact_n",
    )
    est, err = _hll_est_cols(m, numer)
    return out.select("m", "n_buckets", "s_scaled", est, "exact_n", err)


def _hll_est_cols(m: int, numer: float):
    """Final HLL estimate + basis-point error columns, with the standard
    small-range (linear counting) correction: when the raw estimate is
    ≤ 2.5·m AND empty buckets exist, E = m·ln(m / V) (V = empty buckets)
    replaces the raw harmonic estimate, fixing the well-known low-range
    bias of raw HLL (Flajolet et al. 2007 §4; ADVICE r6).

    Cross-engine note: ln() is a libm call — the one op in this module
    whose last ulp is not guaranteed identical across engines (same
    caveat as stats_benford's log10, which rides the same policy).  The
    contract fixtures sit far above the 2.5·m cut (exact_n ≥ 1000 vs
    2.5·m = 640 at b=8), so the corrected branch never feeds an oracle
    hash; it is exercised by a dedicated low-cardinality unit test.
    """
    raw = F.lit(numer) / F.col("s_scaled").cast("double")
    v = (F.lit(m) - F.col("n_buckets")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > F.lit(0.0)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    err = (
        F.floor(F.abs(est - F.col("exact_n")) / F.col("exact_n") * 10000)
        .cast("long")
        .alias("err_bp")
    )
    return est.alias("hll_est"), err


def kmv_minima(df: DataFrame, group: str, col: str, k: int = 64) -> DataFrame:
    """Per-group k smallest distinct 60-bit keys of ``col``:
    (group, rk, key).  The distinct is keyed by (group, key) — at pipeline
    scale one replaces it with per-partition pre-dedup; the top-k itself is
    WindowGroupLimit-optimized (partial per-partition limits)."""
    keyed = df.select(F.col(group), key60(col).alias("key")).distinct()
    rk = F.row_number().over(Window.partitionBy(group).orderBy("key"))
    return keyed.select(group, "key", rk.alias("rk")).where(F.col("rk") <= k)


def kmv_estimate(df: DataFrame, group: str, col: str, k: int = 64) -> DataFrame:
    """Per-group KMV distinct estimate: (k-1) * 2^60 / kth_min_key, falling
    back to the exact count when the group has fewer than k distinct keys
    (the sketch IS exact there).  One IEEE division of exact integers."""
    minima = kmv_minima(df, group, col, k)
    kth = minima.groupBy(group).agg(
        F.max("rk").cast("long").alias("n_keys"), F.max("key").alias("kth_key")
    )
    exact = df.groupBy(group).agg(F.countDistinct(col).cast("long").alias("exact_n"))
    est = F.when(
        F.col("n_keys") < k, F.col("n_keys").cast("double")
    ).otherwise(F.lit(float(k - 1) * float(1 << KEY_BITS)) / F.col("kth_key").cast("double"))
    return (
        kth.join(exact, group)
        .select(
            group,
            "n_keys",
            "kth_key",
            est.alias("kmv_est"),
            "exact_n",
            F.floor(F.abs(est - F.col("exact_n")) / F.col("exact_n") * 10000)
            .cast("long")
            .alias("err_bp"),
        )
        .orderBy(group)
    )


def kmv_union_estimate(
    df: DataFrame, group: str, col: str, groups: list[str], k: int = 64
) -> DataFrame:
    """Distinct-of-union estimated from the per-group SKETCHES ONLY — the
    mergeability demo: union the selected groups' k-minima lists, keep the
    k smallest distinct keys of the merged list, re-apply the KMV rule.
    Exact union distinct is computed alongside for the error column."""
    minima = kmv_minima(df, group, col, k).where(F.col(group).isin(groups))
    merged = minima.select("key").distinct()
    rk = F.row_number().over(Window.orderBy("key"))
    kth = (
        merged.select("key", rk.alias("rk"))
        .where(F.col("rk") <= k)
        .agg(F.max("rk").cast("long").alias("n_keys"), F.max("key").alias("kth_key"))
    )
    exact = (
        df.where(F.col(group).isin(groups))
        .agg(F.countDistinct(col).cast("long").alias("exact_n"))
    )
    est = F.when(
        F.col("n_keys") < k, F.col("n_keys").cast("double")
    ).otherwise(F.lit(float(k - 1) * float(1 << KEY_BITS)) / F.col("kth_key").cast("double"))
    return kth.crossJoin(exact).select(
        F.lit("+".join(sorted(groups))).alias("union_of"),
        "n_keys",
        "kth_key",
        est.alias("kmv_est"),
        "exact_n",
        F.floor(F.abs(est - F.col("exact_n")) / F.col("exact_n") * 10000)
        .cast("long")
        .alias("err_bp"),
    )


def hll_grouped_registers(df: DataFrame, group: str, col: str, b: int = 8) -> DataFrame:
    """Per-group HLL register tables: (group, bucket, register)."""
    m = 1 << b
    suffix_bits = KEY_BITS - b
    suffix_mod = 1 << suffix_bits
    key = key60(col)
    bucket = F.shiftright(key, suffix_bits)
    w = key % F.lit(suffix_mod)
    rho = F.when(w == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(F.col(group), bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(group, "bucket")
        .agg(F.max("rho").cast("long").alias("register"))
    )


def hll_merge_estimate(
    df: DataFrame, group: str, col: str, groups: list[str], b: int = 8
) -> DataFrame:
    """Distinct-of-union estimated by MERGING the per-group HLL register
    tables alone (merge = per-bucket max — the property that lets 1000
    executors each keep a 256-cell sketch and combine them for free).
    Exact union distinct is computed alongside for the error column; the
    merged estimate must equal what a direct HLL of the union would say.
    """
    m = 1 << b
    rmax = KEY_BITS - b + 1
    regs = hll_grouped_registers(df, group, col, b).where(F.col(group).isin(groups))
    merged = regs.groupBy("bucket").agg(F.max("register").alias("register"))
    agg = merged.agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - CAST(register AS INT))")
        ).alias("s_present"),
    )
    exact = (
        df.where(F.col(group).isin(groups)).agg(F.countDistinct(col).cast("long").alias("exact_n"))
    )
    numer = hll_alpha(m) * m * m * float(1 << rmax)
    out = agg.crossJoin(exact).select(
        F.lit("+".join(sorted(groups))).alias("union_of"),
        F.lit(m).cast("long").alias("m"),
        "n_buckets",
        (F.col("s_present") + (F.lit(m) - F.col("n_buckets")) * F.lit(1 << rmax))
        .cast("long")
        .alias("s_scaled"),
        "exact_n",
    )
    est, err = _hll_est_cols(m, numer)
    return out.select("union_of", "m", "n_buckets", "s_scaled", est, "exact_n", err)


def kmv_intersection_estimate(
    df: DataFrame, group: str, col: str, groups: list[str], k: int = 64
) -> DataFrame:
    """Set-INTERSECTION size estimated from the two per-group k-minima
    sketches alone — closes the KMV algebra (distinct / union /
    intersection): ρ̂ = |S_A ∩ S_B ∩ union-sketch| / k estimates the
    Jaccard similarity, and |A∩B| ≈ ρ̂ · |A∪B|̂ (the KMV union estimate).
    When the union sketch holds fewer than k keys it IS the union, so the
    intersection is exact (= the common-key count).

    Everything is deterministic: keys are md5-derived 60-bit integers
    (key60), ranks are total-ordered, and the two IEEE float ops (union
    estimate, scale-by-ρ̂) are a fixed sequence on exact integers — the
    oracle replays them bit-for-bit.  Scale shape: one distinct + one
    WindowGroupLimit top-k per group; every op after the sketch runs on
    ≤2k rows.  The exact intersection (for the error column) is the only
    other corpus-scale aggregate.
    Returns one row (pair, n_common, union_est, inter_est, jaccard_bp,
    exact_n, err_bp).
    """
    assert len(groups) == 2
    minima = kmv_minima(df, group, col, k).where(F.col(group).isin(groups))
    merged = minima.select("key").distinct()
    mrk = (
        merged.select("key", F.row_number().over(Window.orderBy("key")).alias("rk"))
        .where(F.col("rk") <= k)
    )
    kth = mrk.agg(F.max("rk").cast("long").alias("n_keys"), F.max("key").alias("kth_key"))
    both = minima.groupBy("key").agg(F.count("*").alias("ng")).where(F.col("ng") == 2)
    n_common = (
        both.join(mrk, "key").agg(F.count("*").cast("long").alias("n_common"))
    )
    exact = (
        df.where(F.col(group).isin(groups))
        .groupBy(col)
        .agg(F.countDistinct(group).alias("ng"))
        .where(F.col("ng") == 2)
        .agg(F.count("*").cast("long").alias("exact_n"))
    )
    union_est = F.lit(float(k - 1) * float(1 << KEY_BITS)) / F.col("kth_key").cast("double")
    inter_est = F.when(F.col("n_keys") < k, F.col("n_common").cast("double")).otherwise(
        (F.col("n_common").cast("double") * union_est) / F.lit(float(k))
    )
    return (
        kth.crossJoin(F.broadcast(n_common))
        .crossJoin(F.broadcast(exact))
        .select(
            F.lit("&".join(sorted(groups))).alias("pair"),
            "n_common",
            union_est.alias("union_est"),
            inter_est.alias("inter_est"),
            F.expr(f"CAST(n_common * 10000 DIV {k} AS BIGINT)").alias("jaccard_bp"),
            "exact_n",
            F.floor(F.abs(inter_est - F.col("exact_n")) / F.col("exact_n") * 10000)
            .cast("long")
            .alias("err_bp"),
        )
    )
