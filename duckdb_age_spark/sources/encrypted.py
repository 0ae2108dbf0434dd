"""Encrypted-column parquet sink/source.

The reference's flagship pipeline pattern is "encrypt a column, store, read,
decrypt" (reference: FUNCTIONS.md usage examples over tables).  Here that
composes the §2a UDFs with Spark's native parquet IO:

    write_encrypted(df, path, ["ssn", "email"], recipient="age1..." or secret)
    df = read_encrypted(spark, path, ["ssn", "email"], identity="AGE-..." or secret)

Encrypted columns are stored as ``binary`` with a ``.age`` suffix marker in
the column metadata-free world of parquet: original name is kept, the column
is simply BinaryType ciphertext.  Non-listed columns pass through untouched,
so partition pruning / predicate pushdown on plaintext key columns still
works at scale — only the sensitive payload pays the crypto cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_encrypted(
    df: DataFrame,
    path: str,
    columns: list[str],
    recipient: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write ``df`` to parquet with ``columns`` age-encrypted for
    ``recipient`` (raw ``age1...`` key or secret name)."""
    out = df
    for c in columns:
        out = out.withColumn(
            c, F.call_function("age_encrypt", F.col(c).cast("binary"), F.lit(recipient))
        )
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_encrypted(
    spark: SparkSession,
    path: str,
    columns: list[str],
    identity: str,
    as_string: bool = True,
) -> DataFrame:
    """Read an encrypted parquet written by :func:`write_encrypted`,
    decrypting ``columns`` with ``identity`` (raw key or secret name)."""
    df = spark.read.parquet(path)
    for c in columns:
        dec = F.call_function("age_decrypt", F.col(c), F.lit(identity))
        df = df.withColumn(c, dec.cast("string") if as_string else dec)
    return df
