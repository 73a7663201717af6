"""Clustered embedding fixture (sources/embeddings.py): the emb_cosine_lsh
oracle depends on both engines reading the SAME deterministic parquet, so
synthesis must be bit-reproducible and the planted geometry must hold."""

import hashlib
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from pyanomalydetector_spark.sources.embeddings import (
    DIM, MEMBERS, synthesize_clustered_embeddings,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def fixture_path():
    return synthesize_clustered_embeddings(SF_DIR)


def _digest(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_synthesis_is_bit_reproducible(fixture_path, tmp_path):
    before = _digest(fixture_path)
    got = synthesize_clustered_embeddings(SF_DIR, force=True)
    assert got == fixture_path and _digest(got) == before


def test_planted_geometry_separates_at_threshold(fixture_path):
    """Every intra-cluster pair is above 0.9 and every other pair is far
    below it — the dead zone the LSH oracle contract relies on."""
    t = pq.read_table(fixture_path)
    v = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    c = np.array(t["cluster"].to_pylist())
    assert v.shape[1] == DIM
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    s = vn @ vn.T
    iu = np.triu_indices(len(v), 1)
    intra = (c[iu[0]] == c[iu[1]]) & (c[iu[0]] >= 0)
    assert s[iu][intra].min() >= 0.9
    assert s[iu][~intra].max() < 0.8
    n_clusters = int(c.max()) + 1
    assert intra.sum() == n_clusters * MEMBERS * (MEMBERS - 1) // 2
