"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The Spark-side machinery (schemas, Arrow batch shapes, partition-aware
batching, typed metadata) is real and tested; the actual media DECODE step
is stubbed: the codec libraries are not available in this environment, so
``decode_media`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, which substitutes a seeded, content-hashed
fake decoder with the same output schema. Swapping in a real decoder is a
one-function change inside the same mapInPandas stage.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id string, kind string, feature array<float>, n_frames int"


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns derivable without decoding: byte size and a
    content hash for exact dedup — JVM-side only."""
    return (
        df.withColumn("n_bytes", F.length(F.col(payload_col)))
        .withColumn("content_hash", F.sha2(F.col(payload_col), 256))
    )


def _fake_decode(payload: bytes, kind: str, dim: int, seed: int) -> tuple[np.ndarray, int]:
    """Deterministic stand-in decoder: hashed-content feature vector.
    Output SHAPE matches what a real embed-after-decode stage produces."""
    import zlib
    h = zlib.crc32(payload or b"")
    rng = np.random.RandomState((h ^ seed) & 0x7FFFFFFF)
    feat = rng.normal(size=dim).astype(np.float32)
    feat /= np.linalg.norm(feat) or 1.0
    n_frames = 1 if kind == "image" else 1 + h % 16
    return feat, n_frames


def extract_media_features(df: DataFrame, dim: int = 32, seed: int = 42,
                           deterministic_fake: bool = True,
                           batch_limit: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real-decoder integration point: replace the ``_fake_decode`` call.
    ``batch_limit`` re-chunks Arrow batches so a partition of large blobs
    never materializes more than ``batch_limit`` payloads at once (memory
    ceiling per task — the knob that matters at 100 TB)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_limit):
                sub = pdf.iloc[lo:lo + batch_limit]
                feats, frames = [], []
                for payload, kind in zip(sub["payload"], sub["kind"]):
                    if not deterministic_fake:
                        raise NotImplementedError(
                            "real media codecs are not available in this "
                            "environment; pass deterministic_fake=True or "
                            "plug a decoder in here")
                    f, nf = _fake_decode(bytes(payload or b""), kind, dim, seed)
                    feats.append(f.tolist())
                    frames.append(nf)
                yield pd.DataFrame({
                    "media_id": sub["media_id"],
                    "kind": sub["kind"],
                    "feature": feats,
                    "n_frames": frames,
                })

    return df.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explode a deterministic frame
    timeline from duration metadata (no decode needed for the plan)."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                                 F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms")
    )


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    kinds = ["image", "audio", "video"]
    return (
        spark.range(n)
        .withColumn("media_id", F.concat(F.lit("m"), F.lpad(F.col("id").cast("string"), 8, "0")))
        .withColumn("kind", F.element_at(F.array(*[F.lit(k) for k in kinds]),
                                         (F.col("id") % 3 + 1).cast("int")))
        .withColumn("payload", F.sha2(F.concat(F.lit(seed), F.col("id")), 512).cast("binary"))
        .withColumn("mime", F.concat(F.col("kind"), F.lit("/x-fake")))
        .withColumn("width", F.when(F.col("kind") == "image", (F.col("id") % 640 + 64).cast("int")))
        .withColumn("height", F.when(F.col("kind") == "image", (F.col("id") % 480 + 48).cast("int")))
        .withColumn("duration_ms", F.when(F.col("kind") != "image", ((F.col("id") % 30 + 1) * 1000).cast("int")))
        .select("media_id", "kind", "payload", "mime", "width", "height", "duration_ms")
    )
