"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``.

Decode is REAL for the container-free formats (pure numpy, no external
libs): WAV/PCM16 audio (RIFF struct parse → sample rate, channels,
duration, RMS) and PPM/P6 images (header parse → HxWx3 array, mean-pool
resize). Codecs that need external libraries (h264 video, jpeg, opus)
fall back to deterministic byte-statistics features when
``decode_stub=True`` and raise NotImplementedError when
``decode_stub=False`` — the spot where PIL/ffmpeg would plug in.

At 100 TB scale the pattern matters more than the codec: binaries never
pass through Python row-at-a-time, metadata columns stay prunable (scans
that only need metadata never read the payload bytes thanks to Parquet
column pruning), and only small feature vectors leave the executor.
"""

from __future__ import annotations

import hashlib
import struct
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
    "sha256 string, width int, height int, duration_ms int, rms double, features array<float>"
)


# ------------------------------------------------------------- codecs


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono PCM16 WAV writer (RIFF) — pure struct packing."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, mono int16 samples) from a PCM16 RIFF WAV."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate, channels, bits = 0, 1, 16
    data = b""
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            _, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if bits != 16:
        raise ValueError(f"only PCM16 supported, got {bits}-bit")
    samples = np.frombuffer(data, dtype="<i2")
    if channels > 1:  # downmix to mono
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return sample_rate, samples


def encode_ppm(img: np.ndarray) -> bytes:
    """P6 binary PPM from an (h, w, 3) uint8 array."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 array from a binary P6 PPM."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace separated
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3)


def resize_mean_pool(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Mean-pool resize (area interpolation) via bincount on target bins —
    pure numpy, exact for any size ratio."""
    h, w, c = img.shape
    ys = (np.arange(h) * out_h // h).astype(np.int64)
    xs = (np.arange(w) * out_w // w).astype(np.int64)
    bin_idx = (ys[:, None] * out_w + xs[None, :]).reshape(-1)
    counts = np.bincount(bin_idx, minlength=out_w * out_h)
    out = np.empty((out_h * out_w, c), dtype=np.float64)
    flat = img.reshape(-1, c)
    for ch in range(c):
        out[:, ch] = np.bincount(bin_idx, weights=flat[:, ch], minlength=out_w * out_h)
    out /= counts[:, None]
    return out.reshape(out_h, out_w, c).astype(np.uint8)


# ------------------------------------------------------------- synth


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL wav/ppm payloads (video stays
    an opaque blob — its codec needs external libs by design)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = (
                np.add.outer(np.arange(h) * 3, np.arange(w) * 5)[..., None]
                + np.arange(3) * 11
                + int(rng.integers(0, 64))
            ) % 256
            payload = encode_ppm(img.astype(np.uint8))
            meta = (w, h, 0, "ppm")
        elif kind == "audio":
            sr = 8000
            dur = float(rng.uniform(0.05, 0.4))
            t = np.arange(int(sr * dur)) / sr
            amp = float(rng.uniform(0.2, 0.9))
            wave = (amp * 32767 * np.sin(2 * np.pi * float(rng.uniform(100, 1000)) * t))
            payload = encode_wav_pcm16(wave.astype(np.int16), sr)
            meta = (0, 0, int(dur * 1000), "wav")
        else:
            payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
            meta = (int(rng.integers(16, 1024)), int(rng.integers(16, 1024)), int(rng.integers(100, 60000)), "h264")
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ------------------------------------------------------------- features


def _byte_stats(b: np.ndarray) -> tuple[float, float, np.ndarray]:
    hist = np.bincount(b, minlength=256).astype(np.float64)
    p = hist / max(1, b.size)
    nz = p[p > 0]
    entropy = float(-(nz * np.log2(nz)).sum()) if nz.size else 0.0
    feats = (hist.reshape(8, 32).sum(axis=1) / max(1, b.size)).astype(np.float32)
    return (float(b.mean()) if b.size else 0.0), entropy, feats


def _feature_batches(decode_stub: bool):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "kind", "n_bytes", "byte_mean", "byte_entropy",
            "sha256", "width", "height", "duration_ms", "rms", "features",
        ]
        for pdf in batches:
            out = {k: [] for k in cols}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(payload)
                b = np.frombuffer(raw, dtype=np.uint8)
                mean, entropy, byte_feats = _byte_stats(b)
                width = height = duration_ms = 0
                rms = 0.0
                feats = byte_feats
                if raw[:2] == b"P6":  # real image decode
                    img = decode_ppm(raw)
                    height, width = img.shape[0], img.shape[1]
                    luma = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                    small = resize_mean_pool(img, 2, 1)[0]  # 2x1 thumbnail
                    feats = np.array(
                        [img[..., 0].mean(), img[..., 1].mean(), img[..., 2].mean(),
                         luma.std(), *small.reshape(-1)[:4]],
                        dtype=np.float32,
                    )
                elif raw[:4] == b"RIFF":  # real audio decode
                    sr, samples = decode_wav(raw)
                    duration_ms = int(round(1000 * len(samples) / max(1, sr)))
                    x = samples.astype(np.float64) / 32768.0
                    rms = float(np.sqrt((x * x).mean())) if x.size else 0.0
                    hist, _ = np.histogram(np.abs(x), bins=8, range=(0.0, 1.0))
                    feats = (hist / max(1, x.size)).astype(np.float32)
                elif not decode_stub:
                    raise NotImplementedError(
                        "codec needs external decoder (PIL/ffmpeg) — not in this "
                        "container; pass decode_stub=True for byte-stat features"
                    )
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(int(b.size))
                out["byte_mean"].append(mean)
                out["byte_entropy"].append(entropy)
                out["sha256"].append(hashlib.sha256(raw).hexdigest())
                out["width"].append(width)
                out["height"].append(height)
                out["duration_ms"].append(duration_ms)
                out["rms"].append(rms)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return fn


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """media → per-item features. One Arrow pass; payload bytes stay in
    the executor, only small feature vectors come out. wav/ppm payloads
    are REALLY decoded; other codecs follow decode_stub."""
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
