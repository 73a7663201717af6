"""Persisted IVF index (build_ivf_index / ivf_topk_indexed).

Pins the three properties the serving path claims:
- indexed results ≡ the train-per-run path on the same params (training is
  deterministic, so the persisted codebook is the same codebook);
- exhaustive probe over the index ≡ exact brute-force cosine top-k;
- the exact-search scan carries PartitionFilters on ``_cell`` — unprobed
  cells' files are statically pruned, the whole point of the layout.
"""

import os

import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.operators.similarity import (
    build_ivf_index, cosine_topk, ivf_topk_indexed, ivf_topk_trained,
)

N_CELLS, N_ITERS = 8, 3
QIDS = [0, 1, 2, 3]


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


@pytest.fixture(scope="module")
def index_path(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    build_ivf_index(emb, path, n_cells=N_CELLS, n_iters=N_ITERS)
    return path


def _keyed(df):
    return sorted((r["q_id"], r["rank"], r["vec_id"]) for r in df.collect())


def test_index_layout_is_cell_partitioned(index_path):
    cells_dir = f"{index_path}/cells"
    parts = [d for d in os.listdir(cells_dir) if d.startswith("_cell=")]
    assert 2 <= len(parts) <= N_CELLS


def test_indexed_equals_trained_per_run(spark, emb, index_path):
    reg = []
    idx = ivf_topk_indexed(spark, index_path, QIDS, k=5, n_probe=3,
                           cache_registry=reg)
    trained = ivf_topk_trained(emb, QIDS, k=5, n_probe=3,
                               n_cells=N_CELLS, n_iters=N_ITERS)
    assert _keyed(idx) == _keyed(trained)
    for f in reg:
        f.unpersist()


def test_indexed_exhaustive_probe_equals_brute_force(spark, emb, index_path):
    reg = []
    idx = ivf_topk_indexed(spark, index_path, QIDS, k=5, n_probe=N_CELLS,
                           cache_registry=reg)
    exact = cosine_topk(emb, QIDS, k=5)
    assert _keyed(idx) == _keyed(exact)
    for f in reg:
        f.unpersist()


def test_indexed_search_scan_prunes_unprobed_cells(spark, index_path):
    reg = []
    df = ivf_topk_indexed(spark, index_path, QIDS, k=5, n_probe=1,
                          cache_registry=reg)
    old = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "5000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    scans = [ln for ln in plan.splitlines()
             if "PartitionFilters" in ln and "_cell" in ln]
    assert any("_cell#" in ln and " IN " in ln.upper() for ln in scans), (
        "cells scan has no _cell partition filter:\n" + plan)
    for f in reg:
        f.unpersist()
