"""Keyed upsert (UPDATE ... FROM / MERGE) for plain parquet directories.

The reference's test corpus exercises DuckDB's ``UPDATE ... FROM``
(test/sql/age_secret.test via FUNCTIONS.md:422-434); Spark has no in-place
update for files, so the operator is rewrite-by-key: keep current rows whose
key is absent from the updates (left_anti), union the updates, publish.

Publishing is write-aside-then-swap: the merged result lands in a staging
dir next to the target, then replaces it — never an in-place overwrite of a
path that is also the read source (Spark lineage may re-scan the input
during the write, and a failed overwrite would destroy the table).

Scale notes (100 TB): a whole-table rewrite is the correct primitive only
for dimension-sized tables.  For fact tables, partition the path (e.g. by
date — see the partitioned sink round-trip) and apply this per affected
partition: updates are grouped by partition key and only those directories
are rewritten.  Beyond that, a transactional table format (Delta/Iceberg)
is the right tool; none is available in this environment, so the swap
protocol stands in for their commit atomicity.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def upsert_parquet(spark: SparkSession, path: str, updates: DataFrame, key: str) -> None:
    """MERGE ``updates`` into the parquet dir at ``path`` by ``key``:
    matching rows are replaced, new keys appended.

    Duplicate keys within ``updates`` are collapsed to one arbitrary row per
    key (MERGE semantics forbid updating the same target row twice; DuckDB
    errors there, we pick deterministically-one like ``dropDuplicates``).

    Re-entrancy: a crashed prior run can leave ``._staging`` (pre-swap) or
    ``._old`` (post-swap) behind — both are swept before starting.  If a
    crash stranded the table at ``._old`` with nothing at ``path``, the old
    copy is restored first.  The swap itself has a small window between the
    two renames where no directory exists at ``path``; readers racing the
    swap must retry (documented trade-off standing in for a transactional
    table format's commit atomicity — see module docstring).
    """
    staging = path.rstrip("/") + "._staging"
    old = path.rstrip("/") + "._old"
    # sweep leftovers from a crashed prior run
    if not os.path.exists(path) and os.path.isdir(old):
        os.rename(old, path)  # recover: prior run crashed mid-swap
    for leftover in (staging, old):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
        elif os.path.lexists(leftover):
            os.remove(leftover)  # stray file/symlink at the scratch name

    current = spark.read.parquet(path)
    updates = updates.dropDuplicates([key])
    merged = current.join(updates.select(key).distinct(), on=key, how="left_anti").unionByName(
        updates.select(*current.columns)
    )
    _publish_swap(merged, path, staging, old)


def _publish_swap(merged: DataFrame, path: str, staging: str, old: str) -> None:
    """Write-aside-then-swap publication shared by the merge primitives."""
    merged.write.mode("overwrite").parquet(staging)
    os.rename(path, old)
    try:
        os.rename(staging, path)
    except OSError:
        os.rename(old, path)  # roll back: the original table stays live
        raise
    shutil.rmtree(old)


def _sweep_scratch(path: str, staging: str, old: str) -> None:
    """Recover/clean leftovers of a crashed prior run (see upsert_parquet)."""
    if not os.path.exists(path) and os.path.isdir(old):
        os.rename(old, path)  # recover: prior run crashed mid-swap
    for leftover in (staging, old):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
        elif os.path.lexists(leftover):
            os.remove(leftover)  # stray file/symlink at the scratch name


def apply_cdc_parquet(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str | None = None,
) -> None:
    """Apply a CDC change batch — inserts, updates AND deletes — to the
    parquet dir at ``path``.

    ``changes`` carries the target's columns plus ``op_col`` with values
    ``'I'``/``'U'`` (upsert — both apply the same rewrite-by-key way) or
    ``'D'`` (delete the key).  When ``seq_col`` is given, the LATEST change
    per key wins (ties by op: deletes last — the convention debezium-style
    feeds use for a delete-after-write in one batch); without it, one
    arbitrary-but-deterministic change per key is kept, like
    ``upsert_parquet``.

    Semantics = ``MERGE WHEN MATCHED AND op='D' THEN DELETE / WHEN MATCHED
    THEN UPDATE / WHEN NOT MATCHED AND op<>'D' THEN INSERT``.  Scale notes
    from the module docstring apply unchanged: whole-table rewrite for
    dimension tables, per-partition application for facts, a transactional
    format once available.
    """
    from pyspark.sql import Window, functions as F

    staging = path.rstrip("/") + "._staging"
    old = path.rstrip("/") + "._old"
    _sweep_scratch(path, staging, old)

    if seq_col is not None:
        w = Window.partitionBy(key).orderBy(
            F.desc(seq_col), F.desc(F.col(op_col) == "D")
        )
        latest = (
            changes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        latest = changes.dropDuplicates([key])

    current = spark.read.parquet(path)
    upserts = latest.where(F.col(op_col) != "D").select(*current.columns)
    touched = latest.select(key).distinct()
    merged = current.join(touched, on=key, how="left_anti").unionByName(upserts)
    _publish_swap(merged, path, staging, old)


def incremental_agg_merge(orders, split_date: str = "1997-01-01"):
    """Incremental aggregate maintenance (materialized-view refresh): the
    per-customer (order count, revenue) aggregate is maintained as STATE +
    DELTA — the pre-``split_date`` state merged with the newer rows' partial
    aggregate by re-aggregating the union of partials — and must equal the
    full recompute (which is exactly what the oracle runs).

    This is the batch form of what a streaming materialized view does
    every micro-batch: count partials add, sum partials add, so refresh
    cost is O(delta + affected keys), never a full rescan.  Both phases
    are map-side-combined shuffles on the same key, and AQE reuses the
    partitioning for the final merge.
    Returns (custkey, n_orders, total_cents).
    """
    from pyspark.sql import functions as F

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")

    def partial(df):
        return df.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.count("*").alias("n"), F.sum(cents).alias("c")
        )

    state = partial(orders.where(F.col("o_orderdate") < split_date))
    delta = partial(orders.where(F.col("o_orderdate") >= split_date))
    return (
        state.unionByName(delta)
        .groupBy("custkey")
        .agg(F.sum("n").cast("bigint").alias("n_orders"), F.sum("c").cast("bigint").alias("total_cents"))
    )
