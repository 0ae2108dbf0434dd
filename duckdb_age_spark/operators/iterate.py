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
