"""Deterministic CLUSTERED embedding corpus — the near-dup-regime fixture.

The driver's ``embeddings.parquet`` is isotropic random (measured
intra-label cosine ≈ inter-label ≈ 0), which is the wrong regime for
verifying locality-sensitive candidate routes: at any high cosine threshold
it simply has no qualifying pairs, so an LSH query would be vacuously
"correct". This module synthesizes the regime LSH exists for — planted
near-duplicate clusters over an isotropic background — deterministically in
pure numpy/pyarrow, so the Spark query and the DuckDB oracle read the SAME
parquet bytes (the ``data/sequences`` fixture discipline, applied to
vectors).

Geometry (d = 64):

- ``n_clusters = n // 40`` clusters of 4 members each: ``member =
  unit_center + 0.03·N(0, I)``; members of one cluster pairwise cosine
  ≈ 1/(1 + σ²d) ≈ 0.94 (all ≥ ~0.92).
- the remaining 90 % of rows are isotropic ``N(0, I)``: the maximum
  background pair cosine concentrates near √(2·ln(n²)/d) ≈ 0.67 ≪ 0.9, and
  cross-cluster pairs inherit the ≤ ~0.5 center separation —
  so threshold 0.9 selects EXACTLY the planted intra-cluster pairs, with a
  wide dead zone on both sides.

Sizing follows the sf fixture it shadows (4 × the ``embeddings.parquet``
row count, so sf0.01 → 2 000 vectors, sf0.1 → 20 000).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

DIM = 64
MEMBERS = 4
SEED = 20260818

_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "data", "emb_clustered")


def clustered_embeddings_parquet_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return os.path.join(_CACHE_ROOT, f"{tag}_v1.parquet")


def synthesize_clustered_embeddings(sf_dir: str, force: bool = False) -> str:
    """Materialize the clustered corpus for ``sf_dir``; returns the parquet
    path. Pure numpy with a pinned Generator seed — bit-reproducible, so
    Spark and DuckDB always read identical bytes."""
    out = clustered_embeddings_parquet_path(sf_dir)
    if os.path.exists(out) and not force:
        return out
    os.makedirs(_CACHE_ROOT, exist_ok=True)

    n_base = pq.read_metadata(
        os.path.join(sf_dir, "embeddings.parquet")).num_rows
    n = 4 * n_base
    n_clusters = max(1, n // (10 * MEMBERS))

    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    planted = (np.repeat(centers, MEMBERS, axis=0)
               + 0.03 * rng.standard_normal((n_clusters * MEMBERS, DIM)))
    background = rng.standard_normal((n - n_clusters * MEMBERS, DIM))
    vecs = np.concatenate([planted, background]).astype(np.float32)

    table = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(vecs.tolist(),
                              type=pa.list_(pa.float32())),
        "cluster": pa.array(
            [i // MEMBERS for i in range(n_clusters * MEMBERS)]
            + [-1] * (n - n_clusters * MEMBERS), pa.int32()),
    })
    tmp = out + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, out)
    return out


def load_clustered_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(synthesize_clustered_embeddings(sf_dir))
