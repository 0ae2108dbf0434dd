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
    matching rows are replaced, new keys appended."""
    current = spark.read.parquet(path)
    merged = current.join(updates.select(key).distinct(), on=key, how="left_anti").unionByName(
        updates.select(*current.columns)
    )
    staging = path.rstrip("/") + "._staging"
    merged.write.mode("overwrite").parquet(staging)
    old = path.rstrip("/") + "._old"
    os.rename(path, old)
    try:
        os.rename(staging, path)
    except OSError:
        os.rename(old, path)  # roll back: the original table stays live
        raise
    shutil.rmtree(old)
