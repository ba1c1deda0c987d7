"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow UDFs over
``mapInPandas``. The image/audio codec libraries are NOT present in this
container, so the decode step is stubbed two ways:

- ``decode_image`` raises ``NotImplementedError`` (the real-codec slot);
- ``fake_decode_image`` is a deterministic stand-in (bytes -> seeded
  pseudo-pixel stats) so the Spark-side plumbing — schema, partitioning,
  UDF signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("mime", T.StringType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode slot — requires an image codec not in this container."""
    raise NotImplementedError("image codecs unavailable in this environment; use fake_decode_image")


def fake_decode_image(payload: bytes, w: int = 8, h: int = 8) -> np.ndarray:
    """Deterministic pseudo-decode: payload bytes -> (h, w) uint8 'pixels'
    via sha256 expansion. Pure function of payload. The counter suffix is
    ASCII ('#0', '#1', ...) so SQL engines can replay the expansion on
    text payloads (DuckDB sha256 takes VARCHAR) — the driver-gate oracle
    for q28 depends on this."""
    need = w * h
    out = bytearray()
    counter = 0
    while len(out) < need:
        out += hashlib.sha256(payload + f"#{counter}".encode()).digest()
        counter += 1
    return np.frombuffer(bytes(out[:need]), dtype=np.uint8).reshape(h, w)


def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the opaque payload column:
    byte size, pixel mean/std, and an 8x8 average-hash (pHash-style) —
    all from the deterministic fake decode."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = fake_decode_image(bytes(payload)).astype(np.float64)
                bits = (px > px.mean()).ravel()
                phash = 0
                for i, b in enumerate(bits[:63]):
                    phash |= int(b) << i
                rows.append(
                    {
                        "media_id": mid,
                        "n_bytes": len(bytes(payload)),
                        "mean_px": round(float(px.mean()), 6),
                        "std_px": round(float(px.std()), 6),
                        "phash": phash,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_no, frame)
    rows; frame decode itself is the deterministic stub."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = max(1, len(bytes(payload)) // 64)
                for f_no in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_no": f_no,
                            "frame": hashlib.sha256(bytes(payload) + f_no.to_bytes(4, "big")).digest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    return media.filter(F.col("kind") == "video").mapInPandas(fn, schema)


def synth_media(spark, n: int = 50) -> DataFrame:
    """Deterministic synthetic media table for tests/bench."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 7)
        kind = ["image", "audio", "video"][i % 3]
        rows.append((f"m{i:05d}", kind, bytearray(payload), (8, 8, f"x-fake/{kind}")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
