"""Two-stage DBSCAN grouping + report assembly (reference M1-M6 semantics).

Golden-cluster pattern from the reference's tests
(/root/reference/tests/test_dbscan.py:31-43: exact expected cluster
counts/sizes on fixtures).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.operators.cluster import (
    dbscan_precomputed, jaccard_distance_matrix, correlation_distance_matrix,
    anomaly_indicators, two_stage_cluster, classify_series, collect_charts,
)
from pyanomalydetector_spark.plans.report import (
    suite_summary, cluster_groups, report_json,
)
from pyanomalydetector_spark.sources.sequences import load_sequences
from pyanomalydetector_spark.checks.core import run_checks, default_suite


def test_dbscan_basic_two_clusters_plus_noise():
    # points on a line: {0,1,2} , {10,11,12}, and an outlier at 100
    pos = np.array([0.0, 1, 2, 10, 11, 12, 100])
    dist = np.abs(pos[:, None] - pos[None, :])
    labels = dbscan_precomputed(dist, eps=1.5, min_samples=2)
    assert list(labels[:3]) == [0, 0, 0]
    assert list(labels[3:6]) == [1, 1, 1]
    assert labels[6] == -1


def test_dbscan_deterministic_under_permutation():
    rng = np.random.RandomState(7)
    pts = np.concatenate([rng.normal(0, .1, 5), rng.normal(5, .1, 5)])
    d = np.abs(pts[:, None] - pts[None, :])
    l1 = dbscan_precomputed(d, .5, 2)
    perm = rng.permutation(10)
    l2 = dbscan_precomputed(d[np.ix_(perm, perm)], .5, 2)
    # same partition structure regardless of order
    def part(labels):
        groups = {}
        for i, c in enumerate(labels):
            if c != -1:
                groups.setdefault(c, set()).add(i)
        return {frozenset(v) for v in groups.values()}
    assert {frozenset(int(perm[i]) for i in g) for g in part(l2)} == \
           {frozenset(int(i) for i in g) for g in part(l1)}


def test_jaccard_matrix_values():
    ind = np.array([[1, 1, 0, 0], [1, 1, 0, 0], [0, 0, 1, 1]], dtype=float)
    d = jaccard_distance_matrix(ind)
    assert d[0, 1] == pytest.approx(0.0)
    assert d[0, 2] == pytest.approx(1.0)
    assert np.all(np.diag(d) == 0)


def test_correlation_matrix_blend():
    t = np.linspace(0, 4 * math.pi, 50)
    a = np.sin(t)
    x = np.vstack([a, 2 * a + 3, -a, np.cos(7 * t + 1)])
    d = correlation_distance_matrix(x)
    assert d[0, 1] == pytest.approx(0.0, abs=1e-9)   # affine copy
    assert d[0, 2] == pytest.approx(0.0, abs=1e-9)   # |corr| blend
    assert d[0, 3] > 0.3


def test_two_stage_golden_clusters():
    rng = np.random.RandomState(42)
    t = np.arange(100, dtype=float)
    base_a = np.sin(t / 5)
    base_b = np.cos(t / 3)
    spike_a = np.zeros(100); spike_a[80:85] = 10
    spike_b = np.zeros(100); spike_b[20:25] = 10
    series = [
        base_a + spike_a, 1.1 * base_a + spike_a, 0.9 * base_a + spike_a,
        base_b + spike_b, 1.2 * base_b + spike_b,
        rng.normal(0, 1, 100),
    ]
    x = np.vstack(series)
    ids = list(range(6))
    labels = two_stage_cluster(ids, x, x, sigma=2.0, eps1=0.5, eps2=0.2,
                               min_samples=2)
    assert labels[0] == labels[1] == labels[2] != -1
    assert labels[3] == labels[4] != -1
    assert labels[0] != labels[3]
    assert labels[5] == -1


def test_classify_series_roundtrip(spark):
    rows = []
    t = list(range(50))
    for item, (amp, phase) in enumerate([(1, 0), (2, 0), (1, 9)]):
        for c in t:
            v = amp * math.sin(c / 4 + phase) + (10 if 40 <= c < 45 and phase == 0 else 0)
            rows.append((item, c, float(v)))
    df = spark.createDataFrame(rows, "itemid long, clock long, value double")
    out = classify_series(df, [0, 1, 2], eps1=0.5, eps2=0.2).collect()
    got = {r["itemid"]: r["clusterid"] for r in out}
    assert got[0] == got[1] != -1   # same spike window + correlated
    assert len(got) == 3


def test_collect_charts_alignment(spark):
    df = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (2, 20, 5.0), (2, 30, 6.0)],
        "itemid long, clock long, value double")
    ids, x = collect_charts(df)
    assert ids == [1, 2]
    assert x.shape == (2, 3)
    assert x[0].tolist() == [1.0, 2.0, 0.0]
    assert x[1].tolist() == [0.0, 5.0, 6.0]


def test_report_json_shape(spark, sf_dir, tmp_path):
    seq = load_sequences(spark, sf_dir)
    allowed = sorted(r["source"] for r in seq.select("source").distinct()
                     .filter(F.col("source").rlike("^src[0-9]+$")).collect())
    res = run_checks(seq, default_suite(allowed))
    clusters = spark.createDataFrame(
        [(1, 0), (2, 0), (3, -1)], "itemid long, clusterid long")
    p = str(tmp_path / "report.json")
    rep = report_json(res.verdicts, res.violations, clusters, path=p)
    assert not rep["all_passed"]          # fixture defects fail some checks
    assert rep["clusters"] == {"0": [1, 2]}
    assert rep["violations_by_check"]["unique_doc_id"] > 0
    import json as _json
    with open(p) as f:
        assert _json.load(f) == rep


def test_cluster_oracle_sql_matches_numpy_two_stage():
    """The ev_cluster oracle's recursive-CTE DBSCAN must reproduce the numpy
    index-order sweep LABEL-EXACTLY on richer fixtures than the driver's
    3-survivor set — clustered groups, correlated/anti-correlated pairs,
    noise items, and border candidates. Pins the label-order equivalence
    (cluster creation order = ascending min core id; borders attach to the
    earliest-created adjacent cluster) by data."""
    import duckdb

    import __spark_entry__ as entry

    for seed in (7, 19, 42, 101):
        rng = np.random.default_rng(seed)
        n_groups = int(rng.integers(2, 4))
        n_per = int(rng.integers(2, 4))
        n_noise = int(rng.integers(1, 3))
        n_clocks = 24
        series, ids = [], []
        base_t = np.arange(n_clocks, dtype=float)
        iid = 100
        for g in range(n_groups):
            # shared spiky pattern per group -> high correlation + shared
            # anomaly indicators; small per-item jitter
            pattern = np.sin(base_t / (g + 2)) * 3 + (base_t % (g + 3))
            spikes = rng.choice(n_clocks, size=3, replace=False)
            pattern[spikes] += 25
            for _ in range(n_per):
                s = pattern + rng.normal(0, 0.15, n_clocks)
                series.append(s); ids.append(iid); iid += 1
        for _ in range(n_noise):
            series.append(rng.normal(0, 1, n_clocks)); ids.append(iid); iid += 1
        x = np.array(series)

        labels_np = two_stage_cluster(ids, x, x, sigma=2.0, eps1=0.9,
                                      eps2=0.7, min_samples=2)

        con = duckdb.connect()
        con.execute("CREATE TABLE ev_tbl (itemid BIGINT, clock BIGINT, "
                    "v DOUBLE)")
        rows = [(int(i), int(c), float(x[k, c]))
                for k, i in enumerate(ids) for c in range(n_clocks)]
        con.executemany("INSERT INTO ev_tbl VALUES (?, ?, ?)", rows)
        sql = ("WITH RECURSIVE ev AS MATERIALIZED "
               "(SELECT itemid, clock, v FROM ev_tbl),\n"
               + entry._CLUSTER_DBSCAN_TAIL)
        got = {int(r[0]): int(r[1]) for r in con.execute(sql).fetchall()}
        con.close()

        assert got == {int(k): int(v) for k, v in labels_np.items()}, (
            seed, got, labels_np)
