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
    merged.write.mode("overwrite").parquet(staging)
    os.rename(path, old)
    try:
        os.rename(staging, path)
    except OSError:
        os.rename(old, path)  # roll back: the original table stays live
        raise
    shutil.rmtree(old)
