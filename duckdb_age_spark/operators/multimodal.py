"""Multimodal-column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` pipelines.

The decode step is STUBBED (no image/audio libraries in this environment —
see ``decode_image_stub``): the deliverable here is the real Spark plumbing —
schema, batch iteration, partition behavior, deterministic fake features —
with a clearly-marked seam where a real decoder (PIL/torchaudio/ffmpeg)
drops in.

Scale notes: mapInPandas streams Arrow batches, so a 100 TB binary column
never materializes more than ``spark.sql.execution.arrow.maxRecordsPerBatch``
rows per worker at once; per-file media should additionally cap
``spark.sql.files.maxPartitionBytes`` so one partition ≈ one memory budget.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_json", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("decode_ok", StringType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat documents.text bytes as opaque media payloads so the
    multimodal path is exercised on driver-provided data (TESTDATA.md has no
    binary table; the plumbing is payload-agnostic)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.to_json(F.struct(F.col("lang"), F.col("source"))).alias("meta_json"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB decoder seam.  A real implementation would be::

        from PIL import Image
        import io
        img = Image.open(io.BytesIO(payload))
        return img.width, img.height

    Here: deterministic fake dimensions derived from payload bytes, so tests
    and oracles are stable.  Raise NotImplementedError to see the real seam.
    """
    if not payload:
        raise NotImplementedError("real decoder required for empty payloads")
    # deterministic fake: "dimensions" from first/last byte and length
    return (payload[0] % 64 + 1) * 16, (payload[-1] % 64 + 1) * 16


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Everything except the decode seam is real: Arrow batch iteration, bytes
    handling, schema contract.  digest=md5 hex (oracle-checkable);
    width/height from the stub decoder.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                    ),
                }
            )
            dims = payloads.map(lambda b: decode_image_stub(bytes(b)) if b else (None, None))
            out["width"] = dims.map(lambda d: d[0]).astype("Int32")
            out["height"] = dims.map(lambda d: d[1]).astype("Int32")
            out["decode_ok"] = "stub"
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n_bytes: int = 1000) -> DataFrame:
    """'Frame sampling' shape: one output row per sampled offset of each
    payload — the explode-with-posexplode pattern a real video pipeline uses
    per frame, with byte offsets standing in for frame indices."""
    offsets = F.sequence(
        F.lit(0), F.greatest(F.octet_length("payload") - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return media.select(
        "media_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )
