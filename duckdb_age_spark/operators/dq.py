"""Data-quality validation: the gate a training-data pipeline runs before
publishing a corpus snapshot — null/range violations, key uniqueness, and
referential integrity, reported as one (check, violations) table.

Scale shape: all intra-table rules for one table collapse into a SINGLE
conditional aggregation (one scan, map-side partials, one-row output), not
one job per rule.  Referential rules are left_anti joins that ship only the
key columns; the parent side is deduplicated to keys first so the join input
is as small as the key cardinality.  Adding a rule adds a column to an
existing aggregate — O(0) extra scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def single_pass_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Count every rule's violations in one scan: conditional sums inside one
    aggregate, unpivoted to (check, violations) rows."""
    agg = df.agg(
        *[F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name) for name, cond in rules.items()]
    )
    stack = ", ".join(f"'{name}', {name}" for name in rules)
    return agg.selectExpr(f"stack({len(rules)}, {stack}) as (check, violations)")


def duplicate_key_count(df: DataFrame, key: str, name: str) -> DataFrame:
    return df.agg((F.count(key) - F.countDistinct(key)).cast("bigint").alias("violations")).select(
        F.lit(name).alias("check"), "violations"
    )


def orphan_count(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str) -> DataFrame:
    """Referential integrity: non-null child keys with no parent (left_anti
    on the deduplicated parent key set).  NULL keys are excluded — they never
    match any parent under SQL semantics (NOT IN returns NULL for them) and
    belong to the null-check rule, not this one."""
    parents = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return (
        child.select(child_key)
        .where(F.col(child_key).isNotNull())
        .join(parents, on=child_key, how="left_anti")
        .agg(F.count("*").cast("bigint").alias("violations"))
        .select(F.lit(name).alias("check"), "violations")
    )


def dq_report(orders: DataFrame, customer: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Standard relational DQ suite over the star schema: one scan per table
    for the value rules + two key-only anti-joins for referential rules."""
    order_rules = single_pass_violations(
        orders,
        {
            "orders_null_custkey": F.col("o_custkey").isNull(),
            "orders_nonpositive_price": F.col("o_totalprice") <= 0,
        },
    )
    line_rules = single_pass_violations(
        lineitem,
        {
            "lineitem_nonpositive_qty": F.col("l_quantity") <= 0,
            "lineitem_discount_range": ~F.col("l_discount").between(0.0, 1.0),
        },
    )
    return (
        order_rules.unionByName(line_rules)
        .unionByName(duplicate_key_count(customer, "c_custkey", "customer_dup_key"))
        .unionByName(orphan_count(orders, "o_custkey", customer, "c_custkey", "orders_orphan_custkey"))
        .unionByName(orphan_count(lineitem, "l_orderkey", orders, "o_orderkey", "lineitem_orphan_order"))
        .orderBy("check")
    )
