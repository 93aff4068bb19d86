"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata, with decode / feature-extract / resize / frame-sample stages
as Arrow-batched `mapInPandas` pipelines.

The container ships no image/audio codecs, so the DECODE KERNELS are
stubs (deterministic fake features, or NotImplementedError for real
codecs) — but everything Spark-side is real and tested: the schema
convention, the partition-preserving mapInPandas plumbing, the batch
shapes, and the byte-level feature math (length/byte-histogram moments)
which runs on the actual binary payloads.

Schema convention (Iceberg-ready):
    media: binary                      -- raw payload, never decoded JVM-side
    media_meta: struct<kind:string, width:int, height:int, sample_rate:int>
Payload bytes travel Arrow-zero-copy into pandas; per-batch numpy does
the byte math. No per-row Python (input_hint mandate).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("doc_id long, n_bytes long, byte_mean double, "
                  "byte_std double, head_hash long")


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: treat the UTF-8 text bytes as the opaque payload
    (a deterministic stand-in for real image bytes) + typed metadata."""
    return df.select(
        "doc_id",
        F.col(text_col).cast("binary").alias("media"),
        F.struct(
            F.lit("image/fake").alias("kind"),
            F.lit(64).alias("width"), F.lit(64).alias("height"),
            F.lit(0).alias("sample_rate")).alias("media_meta"))


def decode_image(payload: bytes) -> np.ndarray:
    """Real-codec decode stub — the container has no image libraries.
    A deployment drops in PIL/opencv here; the surrounding plumbing
    (schema, batching, feature shapes) is already exercised."""
    raise NotImplementedError(
        "no image codec in this environment; use byte_features / the "
        "deterministic fake path")


def byte_features(media_df: DataFrame) -> DataFrame:
    """Feature extraction over the raw bytes via mapInPandas: length,
    byte-value mean/std (population), and a rolling 64-bit hash of the
    first 16 bytes. Deterministic, codec-free, and representative of
    the decode→feature batch shape."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            payloads = [bytes(p) for p in pdf["media"]]
            sizes = np.fromiter((len(p) for p in payloads),
                                dtype=np.int64, count=n)
            # one concatenated buffer + offset math → per-batch numpy
            # moments without a per-row ndarray each
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            ends = np.cumsum(sizes)
            starts = ends - sizes
            fv = flat.astype(np.float64)
            csum = np.concatenate(([0.0], np.cumsum(fv)))
            csq = np.concatenate(([0.0], np.cumsum(fv * fv)))
            safe = np.maximum(sizes, 1).astype(np.float64)
            mean = (csum[ends] - csum[starts]) / safe
            var = (csq[ends] - csq[starts]) / safe - mean * mean
            std = np.sqrt(np.maximum(var, 0.0))
            mean[sizes == 0] = 0.0
            std[sizes == 0] = 0.0
            # FNV-1a over the first 16 bytes, vectorized: pad heads to a
            # (n, 16) matrix (pad value only touches rows shorter than
            # 16, masked below) and fold the 16 COLUMNS — 16 numpy ops
            # per batch, no per-row loop.
            heads = np.zeros((n, 16), dtype=np.uint8)
            for k in range(16):
                take = sizes > k
                heads[take, k] = flat[starts[take] + k]
            h = np.full(n, 1469598103934665603, dtype=np.uint64)
            prime = np.uint64(1099511628211)
            for k in range(16):
                active = sizes > k
                hk = h[active]
                hk = (hk ^ heads[active, k].astype(np.uint64)) * prime
                h[active] = hk
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": sizes,
                "byte_mean": mean,
                "byte_std": std,
                "head_hash": (h - np.uint64(1 << 63)).view(np.int64)})

    return media_df.mapInPandas(_extract, FEATURE_SCHEMA)


def resize_stub(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: passthrough of payload with updated metadata (the
    pixel resample itself needs a codec — decode_image stub)."""
    return media_df.withColumn(
        "media_meta",
        F.struct(F.col("media_meta.kind").alias("kind"),
                 F.lit(width).alias("width"), F.lit(height).alias("height"),
                 F.col("media_meta.sample_rate").alias("sample_rate")))


def frame_sample(media_df: DataFrame, frame_bytes: int = 16,
                 every_k: int = 4) -> DataFrame:
    """FRAME-SAMPLE plumbing over an opaque video-like payload: treat
    the binary as a sequence of fixed-size frames (frame_bytes from the
    typed metadata in a real deployment), keep every k-th frame, emit
    (doc_id, frame_idx, frame_md5). Codec-free and exact: the sampling
    IS byte slicing, the per-frame digest is md5 over the slice — all
    JVM column math (substring over binary + md5), no Python at all,
    so a 10^12-frame sampling job is scan → explode → codegen'd hash.

    The real-codec variant swaps the digest for decode_frame(...) in a
    mapInPandas stage with the identical (doc_id, frame_idx, payload)
    batch shape."""
    n_frames = F.floor(F.length("media") / F.lit(frame_bytes)).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_k))
    return (media_df.filter(n_frames >= 1)
            .select("doc_id", F.explode(idx).alias("frame_idx"),
                    F.col("media"))
            .select("doc_id", "frame_idx",
                    F.md5(F.substring(
                        F.col("media"),
                        (F.col("frame_idx") * frame_bytes + 1).cast("int"),
                        frame_bytes)).alias("frame_md5")))


def resize_meta(media_df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """RESIZE plumbing: the metadata/schema transform of a resize stage
    (scale factors + output dims from the typed media_meta), with the
    pixel kernel left to the codec-backed deployment (decode_image).
    Exercises the struct-rewrite shape the real stage uses."""
    sx = F.lit(float(out_w)) / F.col("media_meta.width").cast("double")
    sy = F.lit(float(out_h)) / F.col("media_meta.height").cast("double")
    return media_df.select(
        "doc_id", "media",
        F.struct(F.col("media_meta.kind").alias("kind"),
                 F.lit(out_w).alias("width"), F.lit(out_h).alias("height"),
                 F.col("media_meta.sample_rate").alias("sample_rate"))
        .alias("media_meta"),
        F.round(sx, 6).alias("scale_x"), F.round(sy, 6).alias("scale_y"))
