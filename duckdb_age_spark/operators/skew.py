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
