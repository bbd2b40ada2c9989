"""Multimodal columns: image/audio/video as opaque binary with typed metadata.

The container has no image/audio libraries, so the *decode* step is stubbed
(deterministic fake or NotImplementedError) — but the Spark-side plumbing is
real and tested: schema contract, Arrow-batched `mapInPandas` over binary
columns, partition sizing, and batch shape.

Deployment note: swap `_decode_image_stub` for PIL/torchvision inside the same
`mapInPandas` iterator; nothing else changes. Binary payloads stream through
Arrow record batches, so executor memory is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch` x max blob size — set the batch
size down for video-scale blobs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# typed metadata contract for multimodal assets
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_stub(blob: bytes) -> list[float]:
    """Deterministic fake 'embedding' from bytes (stand-in for a real decoder).

    Real deployment: PIL.Image.open(io.BytesIO(blob)) -> resize -> model.
    """
    if blob is None:
        return []
    import hashlib

    h = hashlib.md5(blob).digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(assets: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary content via mapInPandas.

    The per-partition iterator shape is the real pattern for heavy decoders:
    load the model once per partition (outside the batch loop), stream batches
    through it. Partition count — not row count — bounds model loads.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # heavyweight decoder/model init would go HERE, once per partition
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "content_sha": pdf["content"].map(
                        lambda b: __import__("hashlib").sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": pdf["content"].map(_decode_image_stub),
                }
            )
            yield out

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(assets: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize over binary content via the same Arrow-batched iterator.

    The pixel transform is stubbed (no image libs in this container): the
    output carries the *target* dimensions and a deterministic content hash so
    the plumbing is testable; a real deployment swaps the body for
    PIL `Image.open(...).resize((width, height))` — schema, batching, and
    partitioning are already what that needs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "content": pdf["content"].map(
                        # stub: real decode+resize+re-encode goes here
                        lambda b: None if b is None else hashlib.sha256(b).digest()
                    ),
                    "mime_type": pdf["mime_type"],
                    "width": width,
                    "height": height,
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return assets.mapInPandas(run, ASSET_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, frame timestamp).

    The decode itself is stubbed (no codecs in this container) — this builds
    the distributed work list (explode on the JVM side), which is the part that
    must scale; frame decode plugs into extract_features' iterator.
    """
    return (
        assets.where(F.col("modality") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))),
        )
        .select("asset_id", "frame_ts_ms", "content")
    )


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/benchmarks: treat document text bytes as binary
    payloads so the multimodal plumbing is exercised with real data."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
