"""Custom function surfaces beyond the six reference scalars: a grouped-agg
pandas UDAF and a Python UDTF — the remaining Spark function shapes (the
reference registers only scalar functions, reference:
src/age_extension.cpp:439-476; these prove the engine covers the full
surface a user could ask for).

Both have exact SQL oracles: the UDAF computes a geometric mean
(= exp(avg(ln x)) in any SQL engine); the UDTF chunks documents into
fixed-size word windows (= unnest over generated slices in DuckDB).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def geomean_udaf(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (Arrow-batched UDAF): geometric mean."""
    import numpy as np

    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))


def order_price_geomean(orders: DataFrame) -> DataFrame:
    """Geometric-mean order value per priority via the pandas UDAF."""
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.round(geomean_udaf("o_totalprice"), 2).alias("geomean_price"))
        .orderBy("o_orderpriority")
    )


def make_chunk_udtf(chunk_words: int = 10):
    """Python UDTF (Spark 4): explode a document into fixed-width word
    chunks — the table-function shape of a training-data chunker."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string")
    class ChunkDoc:
        def eval(self, text: str):
            if text is None:
                return
            words = text.split()
            for i in range(0, len(words), chunk_words):
                yield i // chunk_words, " ".join(words[i : i + chunk_words])

    return ChunkDoc


def chunk_documents(docs: DataFrame, chunk_words: int = 10) -> DataFrame:
    """(doc_id, chunk_idx, chunk) via the UDTF, with lateral join."""
    spark = docs.sparkSession
    chunker = make_chunk_udtf(chunk_words)
    spark.udtf.register("chunk_doc", chunker)
    docs.select("doc_id", "text").createOrReplaceTempView("_docs_to_chunk")
    return spark.sql(
        "SELECT doc_id, c.chunk_idx, c.chunk "
        "FROM _docs_to_chunk, LATERAL chunk_doc(text) AS c"
    )
