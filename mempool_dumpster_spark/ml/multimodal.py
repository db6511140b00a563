"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The Spark-side contract (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual codec work is STUBBED because no
image/audio libraries exist in this container — `decode_images` dispatches
to PIL when importable and otherwise uses `_fake_decode` (deterministic
byte-statistics features) or raises NotImplementedError in strict mode.

At 100 TB: media tables are date/modality-partitioned; decode runs as
mapInPandas so each Arrow batch holds only `batch_rows` payloads (bound
memory via maxRecordsPerBatch), and feature extraction emits SMALL columns
(embeddings/metadata), never re-emitting payload bytes unless asked.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media-table schema
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("mime", T.StringType(), True),  # e.g. image/png
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, mime string, n_bytes long, byte_mean double, "
    "byte_entropy double, width int, height int, decode_ok boolean"
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode: byte statistics +
    dimensions derived from content length. Keeps every downstream shape
    (schema, nullability, batching) identical to the real path. Vectorized
    over the payload with numpy — per-payload cost is O(n) C-speed, the
    shape a real decoder would have."""
    import math

    import numpy as np

    n = len(payload)
    if n == 0:
        return {"byte_mean": 0.0, "byte_entropy": 0.0, "width": 0, "height": 0}
    arr = np.frombuffer(payload, dtype=np.uint8)
    counts = np.bincount(arr, minlength=256)
    p = counts[counts > 0] / n
    entropy = float(-(p * np.log2(p)).sum())
    side = max(1, int(math.sqrt(n)))
    return {
        "byte_mean": float(arr.mean()),
        "byte_entropy": entropy,
        "width": side,
        "height": (n + side - 1) // side,
    }


def decode_images(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode/feature-extract an image media table → IMAGE_FEATURES_SCHEMA.

    mapInPandas: one Arrow batch in, one out; payload bytes never leave the
    executor. With PIL installed, real width/height are used; otherwise the
    deterministic fake (or NotImplementedError when strict=True).
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        try:
            from PIL import Image  # type: ignore
            import io

            def decode(payload: bytes) -> dict:
                img = Image.open(io.BytesIO(payload))
                stats = _fake_decode(payload)
                stats["width"], stats["height"] = img.size
                return stats

        except ImportError:
            if strict:
                raise NotImplementedError(
                    "image decoding requires PIL; container has no codec libs"
                )
            decode = _fake_decode

        for pdf in batches:
            out = []
            # column-wise zip, not iterrows (no per-row Series construction)
            for media_id, mime, payload in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"]
            ):
                payload = payload or b""
                try:
                    feats = decode(bytes(payload))
                    ok = True
                except NotImplementedError:
                    raise
                except Exception:
                    feats = {"byte_mean": None, "byte_entropy": None,
                             "width": None, "height": None}
                    ok = False
                out.append(
                    {
                        "media_id": media_id,
                        "mime": mime,
                        "n_bytes": len(payload),
                        "decode_ok": ok,
                        **feats,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "mime", "n_bytes", "byte_mean",
                    "byte_entropy", "width", "height", "decode_ok",
                ],
            )

    return media.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_n_seconds: int = 5
) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into per-frame
    task rows (media_id, frame_ts) without touching payloads — the decode
    itself would be another mapInPandas over (payload, frame_ts) pairs.
    Duration comes from metadata so the expansion is pure column algebra."""
    duration = F.coalesce(
        F.element_at("meta", "duration_s").cast("double"), F.lit(0.0)
    )
    n_frames = F.greatest((duration / every_n_seconds).cast("int"), F.lit(1))
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_s", F.col("frame_idx") * every_n_seconds)
