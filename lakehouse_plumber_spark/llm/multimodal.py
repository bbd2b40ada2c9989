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


def _load_pil():
    try:
        from PIL import Image  # type: ignore

        return Image
    except Exception:
        return None


def _decode_image_pil(blob: bytes, Image) -> list[float]:
    """Real decoder: 8x8 grayscale thumbnail, row-major pixels in [0, 1] —
    the deterministic perceptual grid aHash is computed from. Swap the body
    for a model forward pass for learned embeddings; the Arrow plumbing
    around it is identical."""
    if blob is None:
        return []
    import io

    with Image.open(io.BytesIO(blob)) as im:
        px = list(im.convert("L").resize((8, 8)).getdata())
    return [p / 255.0 for p in px]


def image_decoder(mode: str = "stub"):
    """Resolve the image-decode seam — the same import-gated pattern as
    tables.DeltaTableStore (real when the optional dep imports, honest
    otherwise). Returns ``(name, blob -> list[float])``.

    - ``"stub"``: deterministic md5 fake — what the oracle-compared registry
      rows use, so parity never depends on which image libs an executor has.
    - ``"pil"``: require Pillow; actionable ImportError when absent.
    - ``"auto"``: Pillow when importable, stub fallback otherwise.
    """
    if mode not in ("stub", "pil", "auto"):
        raise ValueError(f"image decoder mode must be stub|pil|auto, got {mode!r}")
    if mode == "stub":
        return "stub", _decode_image_stub
    Image = _load_pil()
    if Image is None:
        if mode == "pil":
            raise ImportError(
                "image decoder mode='pil' requires Pillow on driver AND "
                "executors (pip install Pillow); use mode='auto' to fall "
                "back to the deterministic stub when it is absent"
            )
        return "stub", _decode_image_stub
    return "pil", lambda blob: _decode_image_pil(blob, Image)


def extract_features(
    assets: DataFrame, batch_size: int = 256, decoder: str = "stub"
) -> DataFrame:
    """Arrow-batched feature extraction over binary content via mapInPandas.

    The per-partition iterator shape is the real pattern for heavy decoders:
    load the model once per partition (outside the batch loop), stream batches
    through it. Partition count — not row count — bounds model loads.
    `decoder` selects the image-decode seam (see image_decoder); the default
    stub keeps registry/oracle rows environment-independent.
    """
    # resolve 'auto' DRIVER-side and pin the outcome: an executor missing
    # Pillow then raises loudly instead of silently mixing stub and real
    # features within one result
    resolved, _ = image_decoder(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # heavyweight decoder/model init goes HERE, once per partition —
        # the import gate re-resolves on the executor, where decode runs
        name, decode = image_decoder(resolved)
        for pdf in batches:
            if name == "pil":
                # the real decoder is an IMAGE decoder: audio/video blobs
                # would crash Image.open mid-stage. Non-image rows get []
                # (no decoder), image rows the real grid. The stub is
                # modality-agnostic (hash of any bytes) so it keeps the
                # old all-rows behavior.
                feature = [
                    decode(b) if m == "image" else []
                    for m, b in zip(pdf["modality"], pdf["content"])
                ]
            else:
                feature = pdf["content"].map(decode)
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "content_sha": pdf["content"].map(
                        lambda b: __import__("hashlib").sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": feature,
                }
            )
            yield out

    # project to exactly what `run` reads before the Python boundary (r14):
    # Spark cannot see inside an opaque mapInPandas function, so without
    # this every asset column — including mime/geometry metadata the
    # extractor never touches — is read from storage and shipped through
    # the Arrow transpose (guide-class column pruning at the seam)
    return assets.select("asset_id", "modality", "content").mapInPandas(
        run, FEATURE_SCHEMA
    )


def resize_images(
    assets: DataFrame, width: int = 224, height: int = 224, decoder: str = "stub"
) -> DataFrame:
    """Image resize over binary content via the same Arrow-batched iterator.

    `decoder` gates the pixel transform like extract_features: with "pil"
    (or "auto" + Pillow importable) the content is really decoded, resized to
    (width, height) and re-encoded as PNG; the default stub replaces the
    bytes with a deterministic content hash so the plumbing stays testable
    on image-lib-free containers. Schema, batching, and partitioning are
    identical either way.
    """
    resolved, _ = image_decoder(decoder)  # validate + pin 'auto' driver-side

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        if resolved == "pil":
            import io

            Image = _load_pil()
            if Image is None:
                raise ImportError(
                    "resize_images resolved decoder='pil' on the driver but "
                    "Pillow is missing on this executor — install it on the "
                    "whole cluster"
                )

            def _resize(b):
                with Image.open(io.BytesIO(b)) as im:
                    out = io.BytesIO()
                    im.resize((width, height)).save(out, format="PNG")
                    return out.getvalue()

        else:
            _resize = None

        for pdf in batches:
            if resolved == "pil":
                # real resize touches IMAGE rows with content only; other
                # modalities (and null blobs) pass through untouched, and
                # only actually-re-encoded rows get the image/png mime
                content, mime = [], []
                for m, b, mt in zip(pdf["modality"], pdf["content"], pdf["mime_type"]):
                    if m == "image" and b is not None:
                        content.append(_resize(b))
                        mime.append("image/png")
                    else:
                        content.append(b)
                        mime.append(mt)
            else:
                content = pdf["content"].map(
                    lambda b: None if b is None else hashlib.sha256(b).digest()
                )
                mime = pdf["mime_type"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "content": content,
                    "mime_type": mime,
                    "width": width,
                    "height": height,
                    "duration_ms": pdf["duration_ms"],
                }
            )

    # same boundary-pruning as extract_features: width/height are replaced
    # by literals inside `run`, so they need not cross into Python
    return assets.select(
        "asset_id", "modality", "content", "mime_type", "duration_ms"
    ).mapInPandas(run, ASSET_SCHEMA)


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
