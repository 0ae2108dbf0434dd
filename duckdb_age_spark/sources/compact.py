"""Small-file compaction for parquet directories.

Streaming sinks, per-batch upserts, and over-partitioned writes all leave
many small files; at scan time each file costs a task and metadata round
trip, so a 100 TB table fragmented into KB-files reads orders of magnitude
slower than the same bytes in right-sized files.  Compaction is a rewrite:
read, coalesce to a target file count derived from the actual byte size,
publish via the same write-aside-and-swap protocol as the keyed upsert.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def parquet_data_size(path: str) -> int:
    """Total bytes of parquet data files under ``path`` (ignores _SUCCESS
    and checksums)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite the parquet dir at ``path`` into ~``target_file_bytes`` files
    (default 128 MB — the usual HDFS/S3 sweet spot).  Returns the file count
    written.

    coalesce() (not repartition) avoids a shuffle: compaction only narrows
    the partition count, and the write re-encodes row groups anyway.  The
    swap reuses the upsert protocol's crash-safety (stale scratch sweep,
    rollback on failed rename).
    """
    n_files = max(1, -(-parquet_data_size(path) // target_file_bytes))
    staging = path.rstrip("/") + "._staging"
    old = path.rstrip("/") + "._old"
    for leftover in (staging, old):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
    spark.read.parquet(path).coalesce(n_files).write.parquet(staging)
    os.rename(path, old)
    try:
        os.rename(staging, path)
    except OSError:
        os.rename(old, path)
        raise
    shutil.rmtree(old)
    return n_files
