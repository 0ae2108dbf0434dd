"""Skew-mitigation operators: salted aggregation and salted join.

At 100 TB a handful of hot keys (the empty document, the default user, the
top SKU) can pin a whole stage on one task.  AQE's skew-join splitting
handles the join case at runtime; these operators are the declarative
fallback that also covers aggregation, and they produce results IDENTICAL
to the naive formulation — which is exactly what the oracle checks.

* ``salted_aggregate`` — two-phase: group by (key, salt) with map-side
  partials, then re-aggregate by key.  The hot key's rows spread over
  ``n_salts`` reducers instead of one.
* ``salted_join`` — explode the small side ``n_salts``× with a salt column,
  salt the big side randomly-but-deterministically (hash of a row id), join
  on (key, salt).  Fan-out on the SMALL side only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _det_salt(col: Column, n_salts: int) -> Column:
    """Deterministic pseudo-random salt from a row-identifying column (no
    rand(): results must be reproducible and oracle-checkable)."""
    return F.pmod(F.hash(col), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    key: str,
    salt_from: str,
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: {output_col: "sum:col" | "count:*" | "min:col" | "max:col"}.
    Semantically identical to ``df.groupBy(key).agg(...)`` — the salt only
    changes the shuffle layout.
    """
    first, second = [], []
    for out, spec in aggs.items():
        op, col = spec.split(":", 1)
        if op == "count":
            first.append(F.count("*").alias(out))
            second.append(F.sum(out).alias(out))
        elif op == "sum":
            first.append(F.sum(col).alias(out))
            second.append(F.sum(out).alias(out))
        elif op == "min":
            first.append(F.min(col).alias(out))
            second.append(F.min(out).alias(out))
        elif op == "max":
            first.append(F.max(col).alias(out))
            second.append(F.max(out).alias(out))
        else:
            raise ValueError(f"unsupported agg op: {op}")
    partial = df.withColumn("_salt", _det_salt(F.col(salt_from), n_salts)).groupBy(
        key, "_salt"
    ).agg(*first)
    return partial.groupBy(key).agg(*second)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe inner equi-join: big side salted deterministically, small
    side replicated n_salts×.  Row-for-row identical to ``big.join(small,
    key)``."""
    salted_big = big.withColumn("_salt", _det_salt(F.col(salt_from), n_salts))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(replicated_small, on=[key, "_salt"]).drop("_salt")


def bloom_prefilter_stats(
    orders: DataFrame,
    customer: DataFrame,
    segment: str = "BUILDING",
    m_bits: int = 8192,
    k_hashes: int = 3,
) -> DataFrame:
    """Broadcast BLOOM-FILTER semi-join prefilter, fully deterministic: build
    a Bloom filter of the qualifying customer keys (marketsegment =
    ``segment``), probe every order's custkey, and report the exact
    pass/true/false-positive census — the scan-side prefilter that saves a
    full shuffle when the build side is small but too large to broadcast
    raw (ships ≤ m/8 bytes of bits instead of the key set).

    Position i of key = first-60-bits(md5(i || '|' || key)) mod m — the
    same portable hash family as the CMS sketch, so the FALSE POSITIVES
    themselves are engine-identical and the oracle pins the census
    exactly, not just the true matches.

    Shape: the filter's set-positions table is tiny (≤ k·|build|, deduped)
    and broadcast; probes explode to k rows, join broadcast-local, and a
    (orderkey)-keyed count==k recovers might-contain.  Returns one row:
    (n_orders, n_pass_bloom, n_true_match, n_false_pos, fp_rate).
    """
    def positions(key_col):
        return F.transform(
            F.sequence(F.lit(0), F.lit(k_hashes - 1)),
            lambda i: F.conv(
                F.substring(
                    F.md5(F.concat(i.cast("string"), F.lit("|"), key_col.cast("string")).cast("binary")),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % m_bits,
        )

    qual = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    bloom = qual.select(F.explode(positions(F.col("c_custkey"))).alias("pos")).distinct()
    probe = orders.select(
        "o_orderkey", "o_custkey", F.explode(positions(F.col("o_custkey"))).alias("pos")
    )
    passed = (
        probe.join(F.broadcast(bloom), "pos")
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count("*").alias("nhit"))
        .where(F.col("nhit") == k_hashes)
        .select("o_orderkey", "o_custkey")
    )
    true_match = passed.join(
        F.broadcast(qual.withColumnRenamed("c_custkey", "o_custkey")), "o_custkey", "left_semi"
    )
    totals = orders.agg(F.count("*").alias("n_orders"))
    return (
        totals.crossJoin(passed.agg(F.count("*").alias("n_pass_bloom")))
        .crossJoin(true_match.agg(F.count("*").alias("n_true_match")))
        .select(
            F.col("n_orders").cast("bigint"),
            F.col("n_pass_bloom").cast("bigint"),
            F.col("n_true_match").cast("bigint"),
            (F.col("n_pass_bloom") - F.col("n_true_match")).cast("bigint").alias("n_false_pos"),
            F.round(
                (F.col("n_pass_bloom") - F.col("n_true_match")).cast("double")
                / F.col("n_orders").cast("double"),
                6,
            ).alias("fp_rate"),
        )
    )
