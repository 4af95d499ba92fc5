"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``. The decode step itself is
STUBBED (no image/audio libs in this container): ``decode_stub=True``
produces a deterministic fake decode (byte-statistics features), and
``decode_stub=False`` raises NotImplementedError where a real codec
(PIL/ffmpeg) would plug in. The Spark-side plumbing — schema, partition
flow, UDF signature, Arrow batch shape — is real and tested.

At 100 TB scale the pattern matters more than the codec: binaries never
pass through Python row-at-a-time, metadata columns stay prunable (scans
that only need metadata never read the payload bytes thanks to Parquet
column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, byte_mean double, byte_entropy double, "
    "sha256 string, features array<float>"
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        meta = (
            int(rng.integers(16, 1024)),
            int(rng.integers(16, 1024)),
            int(rng.integers(100, 60000)) if kind != "image" else 0,
            {"image": "png", "audio": "opus", "video": "h264"}[kind],
        )
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _feature_batches(decode_stub: bool):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container; "
                    "pass decode_stub=True for the deterministic fake"
                )
            out = {k: [] for k in ["media_id", "kind", "n_bytes", "byte_mean", "byte_entropy", "sha256", "features"]}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b, minlength=256).astype(np.float64)
                p = hist / max(1, b.size)
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(int(b.size))
                out["byte_mean"].append(float(b.mean()) if b.size else 0.0)
                out["byte_entropy"].append(entropy)
                out["sha256"].append(hashlib.sha256(bytes(payload)).hexdigest())
                # fake 8-dim feature: normalized 32-bin histogram pooled 4:1
                out["features"].append(
                    (hist.reshape(8, 32).sum(axis=1) / max(1, b.size)).astype(np.float32)
                )
            yield pd.DataFrame(out)

    return fn


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """media → per-item features. One Arrow pass; payload bytes stay in
    the executor, only small feature vectors come out."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        _feature_batches(decode_stub), schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video rows → (media_id, frame_ts_ms) sampling plan. Pure column
    math (sequence), no UDF: the expensive decode would consume this plan."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))).alias("frame_ts_ms"),
    )
