"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schemas, partition-friendly batch shapes,
mapInPandas signatures) is real and tested; the actual media DECODE step is
stubbed behind ``MEDIA_DECODERS`` because the codec libraries are not in
this container — each stub is deterministic so tests can assert the
plumbing end-to-end. Swapping a stub for a real decoder (PIL/ffmpeg) does
not change any Spark code.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

MEDIA_SCHEMA = Ty.StructType([
    Ty.StructField("media_id", Ty.LongType(), False),
    Ty.StructField("kind", Ty.StringType(), False),  # image | audio | video
    Ty.StructField("mime", Ty.StringType(), True),
    Ty.StructField("payload", Ty.BinaryType(), True),
    Ty.StructField("meta", Ty.MapType(Ty.StringType(), Ty.StringType()), True),
])

FEATURE_SCHEMA = Ty.StructType([
    Ty.StructField("media_id", Ty.LongType(), False),
    Ty.StructField("kind", Ty.StringType(), False),
    Ty.StructField("n_bytes", Ty.IntegerType(), True),
    Ty.StructField("digest", Ty.StringType(), True),
    Ty.StructField("feature", Ty.ArrayType(Ty.FloatType()), True),
])


def _stub_decode_image(payload: bytes) -> list[float]:
    """STUB — deterministic fake for the container (no PIL). A real
    deployment replaces this with PIL decode → resize → channel means."""
    d = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in d[:8]]


def _stub_decode_audio(payload: bytes) -> list[float]:
    """STUB — deterministic fake (no soundfile/ffmpeg here)."""
    d = hashlib.sha256(b"audio:" + payload).digest()
    return [b / 255.0 for b in d[:4]]


def _stub_frame_sample_video(payload: bytes) -> list[float]:
    """STUB — deterministic fake frame sampler (no ffmpeg here)."""
    d = hashlib.sha256(b"video:" + payload).digest()
    return [b / 255.0 for b in d[:6]]


MEDIA_DECODERS = {
    "image": _stub_decode_image,
    "audio": _stub_decode_audio,
    "video": _stub_frame_sample_video,
}


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads. The payload
    column stays off the shuffle: output carries only small features."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    rows.append((int(mid), kind, None, None, None))
                    continue
                payload = bytes(payload)
                dec = MEDIA_DECODERS.get(kind)
                feat = dec(payload) if dec else None
                rows.append((
                    int(mid), kind, len(payload),
                    hashlib.sha256(payload).hexdigest(), feat,
                ))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "n_bytes", "digest", "feature"]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def synthetic_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic fixture media table."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(64 + (i % 5) * 16))
        rows.append((i, kind, f"application/x-fixture-{kind}", payload,
                     {"w": str(64 + i), "h": str(48 + i)} if kind == "image" else {}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
