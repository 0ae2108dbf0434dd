"""Distributed exact top-k with ranks (the r15 scale playbook).

The idiom ``row_number().over(Window.orderBy(...))`` + ``rk <= k`` is NOT
optimized by Spark when the window has no PARTITION BY: InferWindowGroupLimit
only fires for partitioned windows (verified empirically on this Spark —
the partitioned variant plans a WindowGroupLimit, the partition-less one
does not), so the "rank pushdown" several module docstrings used to claim
never happened.  The partition-less form shuffles EVERY input row into ONE
window task for a full sort — at 100 TB, the whole frame through a single
task.

``df.orderBy(*order).limit(k)`` is the shape Spark does optimize: it plans
TakeOrderedAndProject — each task keeps a local k-row bounded heap and the
singleton merge handles #tasks × k rows, never the frame.  Re-deriving the
rank with a row_number window AFTER the limit runs one window task over k
rows.  For any TOTAL (tie-broken) ordering the two forms are identical
row-for-row and rank-for-rank; every caller in this repo tie-breaks its
ordering explicitly (the determinism playbook), so the swap is semantics-
free by construction.

NOT for proportional cutoffs (top-p% of rows): a data-proportional k makes
the merge task proportional too — those callers (pareto_share) aggregate
to a value histogram instead (the mann_whitney pattern in stats.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def global_top_k(df: DataFrame, order: list[Column], k: int, rk_col: str = "rk") -> DataFrame:
    """Exact top-k rows of ``df`` under the total order ``order``, with a
    1-based LongType rank column ``rk_col`` appended.

    ``order`` must be a TOTAL order (include tie-break columns) — with ties
    unbroken, ``limit`` and the rank window could disagree on which equal
    rows survive.  Identical to the naive global row_number + filter for
    total orders; plans TakeOrderedAndProject instead of a single-task
    full sort.
    """
    from pyspark.sql import Window

    limited = df.orderBy(*order).limit(k)
    rk = F.row_number().over(Window.orderBy(*order))
    return limited.withColumn(rk_col, rk.cast("long"))
