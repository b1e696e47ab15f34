"""Audio/video payload operators — the non-image multimodal columns.

Same design as the image axis (SURVEY §2.10): media rides as an opaque
``binary`` column with typed metadata, and every kernel is Arrow-batched
(``mapInPandas`` / ``pandas_udf``) with numpy inner loops — no per-row
Python UDFs, no external media libraries (payloads are raw PCM16 /
raw-frame video, so decode is a ``frombuffer`` + reshape).

The synthetic generators use pure integer-hash arithmetic (synth.py style),
so the driver oracles can recompute the decoded features EXACTLY in SQL:
sample values and pixel bytes are integers, their squared sums stay inside
int64, and the only floating-point steps (one divide, one sqrt) are
exactly-rounded IEEE ops identical across engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# generator constants (distinct from synth.M image/jitter constants)
A_M1, A_M2 = 2879636089, 40961
V_M1, V_M2, V_M3 = 3323198485, 198491317, 71

AUDIO_SR = 8000
AUDIO_SAMPLES = 2000
VIDEO_FRAMES = 8
VIDEO_W = VIDEO_H = 16


# ---------------------------------------------------------------------------
# generators (distributed: meta via Column arithmetic, payload via Arrow)
# ---------------------------------------------------------------------------

def audio_samples_np(i: int, n: int = AUDIO_SAMPLES) -> np.ndarray:
    """Deterministic int16 samples: s(i, k) = ((i*A_M1 + k*A_M2 + 77) %
    65536) - 32768. Pure integer hash — bit-identical in numpy and SQL."""
    k = np.arange(n, dtype=np.int64)
    return (((np.int64(i) * A_M1 + k * A_M2 + 77) % 65536) - 32768).astype(np.int16)


def synth_audio_df(spark: SparkSession, n: int,
                   n_samples: int = AUDIO_SAMPLES) -> DataFrame:
    """Audio table: (audio_id, bytes: raw PCM16-LE, sr, n_samples, fmt)."""
    schema = StructType([
        StructField("audio_id", StringType()),
        StructField("i", LongType()),
        StructField("bytes", BinaryType()),
        StructField("sr", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("fmt", StringType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                s = audio_samples_np(int(i), n_samples)
                rows.append((f"aud{int(i):09d}", int(i),
                             s.astype("<i2").tobytes(), AUDIO_SR,
                             n_samples, "pcm16"))
            yield pd.DataFrame(rows, columns=[
                "audio_id", "i", "bytes", "sr", "n_samples", "fmt"])

    return spark.range(n).mapInPandas(gen, schema=schema)


def video_frame_np(i: int, f: int, w: int = VIDEO_W, h: int = VIDEO_H) -> np.ndarray:
    """Deterministic frame pixels: p(i, f, k) = (i*V_M1 + f*V_M2 + k*V_M3 +
    13) % 256 over the flattened (h*w*3) index k."""
    k = np.arange(h * w * 3, dtype=np.int64)
    p = (np.int64(i) * V_M1 + np.int64(f) * V_M2 + k * V_M3 + 13) % 256
    return p.astype(np.uint8).reshape(h, w, 3)


def synth_video_df(spark: SparkSession, n: int, frames: int = VIDEO_FRAMES,
                   w: int = VIDEO_W, h: int = VIDEO_H) -> DataFrame:
    """Video table: (video_id, bytes: concatenated raw frames, n_frames,
    w, h, fmt). A 'video' is the simplest honest container: n_frames
    back-to-back raw RGB frames — decode is arithmetic, not a codec."""
    schema = StructType([
        StructField("video_id", StringType()),
        StructField("i", LongType()),
        StructField("bytes", BinaryType()),
        StructField("n_frames", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                blob = b"".join(
                    video_frame_np(int(i), f, w, h).tobytes()
                    for f in range(frames)
                )
                rows.append((f"vid{int(i):09d}", int(i), blob, frames, w, h,
                             "rawv"))
            yield pd.DataFrame(rows, columns=[
                "video_id", "i", "bytes", "n_frames", "w", "h", "fmt"])

    return spark.range(n).mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

_AUDIO_FEAT_SCHEMA = StructType([
    StructField("duration_s", DoubleType()),
    StructField("rms", DoubleType()),
    StructField("peak", IntegerType()),
    StructField("zero_crossings", IntegerType()),
])


@F.pandas_udf(_AUDIO_FEAT_SCHEMA)
def audio_features(data: pd.Series, sr: pd.Series) -> pd.DataFrame:
    """Decode PCM16 and emit per-clip features. The squared-sample sum is
    taken in int64 (exact: 2000 * 32768^2 < 2^42), so rms is one exact
    divide + sqrt — reproducible bit-for-bit by an integer-SQL oracle.
    Zero crossing = strict sign change (s[k-1] * s[k] < 0)."""
    dur, rms, peak, zc = [], [], [], []
    for blob, r in zip(data, sr):
        s = np.frombuffer(bytes(blob), dtype="<i2").astype(np.int64)
        dur.append(len(s) / float(r))
        rms.append(float(np.sqrt(np.sum(s * s) / len(s))))
        peak.append(int(np.max(np.abs(s))))
        zc.append(int(np.sum(s[:-1] * s[1:] < 0)))
    return pd.DataFrame({
        "duration_s": dur, "rms": rms,
        "peak": np.array(peak, dtype=np.int32),
        "zero_crossings": np.array(zc, dtype=np.int32),
    })


def resample_audio(df: DataFrame, target_sr: int,
                   data: str = "bytes", sr: str = "sr") -> DataFrame:
    """Linear-interpolation resample to ``target_sr`` (same half-open
    time-grid convention as the image resize: sample t maps to source
    position t * sr/target). Rewrites bytes/sr/n_samples in place; exact on
    linear ramps (pinned in pytest)."""
    out_schema = df.schema

    def _res(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, ns = [], []
            for blob, r in zip(pdf[data], pdf[sr]):
                s = np.frombuffer(bytes(blob), dtype="<i2").astype(np.float64)
                n_out = int(round(len(s) * target_sr / float(r)))
                pos = np.arange(n_out, dtype=np.float64) * (float(r) / target_sr)
                i0 = np.clip(np.floor(pos).astype(np.int64), 0, len(s) - 1)
                i1 = np.minimum(i0 + 1, len(s) - 1)
                frac = np.clip(pos - i0, 0.0, 1.0)
                out = s[i0] * (1.0 - frac) + s[i1] * frac
                blobs.append(
                    np.clip(np.rint(out), -32768, 32767).astype("<i2").tobytes()
                )
                ns.append(n_out)
            pdf = pdf.copy()
            pdf[data] = blobs
            pdf[sr] = np.int32(target_sr)
            if "n_samples" in pdf.columns:
                pdf["n_samples"] = np.array(ns, dtype=np.int32)
            yield pdf

    return df.mapInPandas(_res, schema=out_schema)


_FRAME_SCHEMA_FIELDS = [
    StructField("frame_idx", IntegerType()),
    StructField("mean_lum", DoubleType()),
    StructField("frame_hash", LongType()),
]


def frame_sample(df: DataFrame, every: int = 2, key: str = "video_id") -> DataFrame:
    """Frame-sampling stage: decode every ``every``-th frame of each video
    and emit (key, frame_idx, mean_lum, frame_hash) — one output row per
    sampled frame (the video analog of image decode_stats). mean_lum is an
    exact integer sum / count; frame_hash is a deterministic md5-derived
    63-bit content id (oracles pin mean_lum)."""
    import hashlib

    out_schema = StructType([df.schema[key]] + _FRAME_SCHEMA_FIELDS)

    def _fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, idxs, lums, hashes = [], [], [], []
            for kv, blob, nf, w, h in zip(
                pdf[key], pdf["bytes"], pdf["n_frames"], pdf["w"], pdf["h"]
            ):
                arr = np.frombuffer(bytes(blob), dtype=np.uint8).reshape(
                    int(nf), int(h), int(w), 3
                )
                for fi in range(0, int(nf), every):
                    frame = arr[fi].astype(np.int64)
                    keys.append(kv)
                    idxs.append(fi)
                    lums.append(float(frame.sum() / frame.size))
                    digest = hashlib.md5(frame.tobytes()).digest()
                    hashes.append(
                        int.from_bytes(digest[:8], "little") & 0x7FFFFFFFFFFFFFFF
                    )
            yield pd.DataFrame({
                key: keys,
                "frame_idx": np.array(idxs, dtype=np.int32),
                "mean_lum": lums,
                "frame_hash": np.array(hashes, dtype=np.int64),
            })

    return df.mapInPandas(_fs, schema=out_schema)
