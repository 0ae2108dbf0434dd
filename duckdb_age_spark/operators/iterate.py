"""Lineage control for iterative algorithms (CC, BFS, PageRank, Lloyd).

Every fixed-point loop here must truncate lineage each round or the plan
nests exponentially.  Two modes:

* ``checkpoint_dir=None`` (default): ``localCheckpoint`` — executor-local
  blocks, zero HDFS/disk configuration, ideal for local[] and tests.  NOT
  fault-tolerant: a lost executor loses blocks and fails the job.
* ``checkpoint_dir=<path>``: reliable ``checkpoint()`` to that directory
  (HDFS/S3/NFS on a real cluster) — survives executor loss, the setting a
  1000-executor run of a long CC/BFS loop should use.  The dir is set once
  per SparkContext (Spark keeps one global checkpoint dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame, checkpoint_dir: str | None = None, eager: bool = False) -> DataFrame:
    """Cut ``df``'s lineage: reliable checkpoint if a dir is given, else
    executor-local.  ``eager`` forces materialization now (use when the
    result is consumed by multiple downstream branches)."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)


def loop_join_cache(
    df: DataFrame, key: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Cache ``df`` hash-partitioned AND sorted on ``key`` for a fixed-point
    loop that joins it on ``key`` every round.

    Why: each round of a convergence loop is its own ACTION (a count, a
    label-sum check, or a per-round checkpoint materialization), so
    cross-round exchange reuse never applies — a plain persist()/checkpoint
    leaves every round's sort-merge join re-shuffling and re-sorting the
    full table (measured on the CC loop at sf10: 66M rows / 526 MB
    shuffle-written PER ROUND, the dominant repeated cost).  Neither
    ``checkpoint`` nor ``localCheckpoint`` preserves partitioning into the
    rebuilt plan (verified: the LogicalRDD side gets a fresh Exchange), so
    the partitioned view must be a CACHE on top: InMemoryTableScan reports
    the cached plan's outputPartitioning and outputOrdering, letting the
    round join consume it with no Exchange and no Sort — per-round shuffle
    drops to O(|other side|), and the big table is paid for once.

    The repartition uses an EXPLICIT partition count (AQE may not coalesce
    user-specified counts) equal to ``spark.sql.shuffle.partitions`` so the
    small side lands on the same N.  ``checkpoint_dir``: reliably checkpoint
    FIRST (cut lineage to durable storage — partitioning does not survive a
    checkpoint, so it composes as checkpoint → repartition → cache); without
    a dir the lineage above the cache is left intact, so an executor loss
    recomputes blocks instead of failing the job.
    """
    if checkpoint_dir is not None:
        df = truncate_lineage(df, checkpoint_dir)
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    return df.repartition(n_part, key).sortWithinPartitions(key).persist()
