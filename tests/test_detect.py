"""Detector cascade: Spark results vs an independent pandas re-derivation.

Follows the reference's oracle pattern (tests/test_trends_stats.py,
test_detector_detect1/2/3.py): expected survivor sets are re-derived from the
same statistical semantics with pandas over identical data — written fresh
from the semantics in SURVEY.md §2, not copied from the reference.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.operators.detect import (
    DetectorConfig, detect1, detect2, adjacent_diff_stats, local_peaks,
)
from pyanomalydetector_spark.operators.rollup import tumbling_rollup
from pyanomalydetector_spark.operators.normalize import (
    resample_to_grid, minmax_normalize,
)
from pyanomalydetector_spark.operators.topn import top_n_per_group
from pyanomalydetector_spark.operators.conditions import Condition, apply_conditions


def _mkseries(n_items=8, n_trend=40, n_hist=12, anomalous=(2, 5)):
    """Deterministic synthetic series; items in ``anomalous`` get a recent
    level shift of +8σ."""
    rows = []
    for item in range(n_items):
        base = 50.0 + item * 10
        for t in range(n_trend + n_hist):
            clock = 1000 + t * 10
            noise = ((t * 7919 + item * 104729) % 11) - 5  # deterministic ±5
            val = base + noise
            if item in anomalous and t >= n_trend:
                val += 8 * 3.2  # ~8σ shift in the recent window
            rows.append((item, clock, float(val)))
    pdf = pd.DataFrame(rows, columns=["itemid", "clock", "value"])
    split_clock = 1000 + n_trend * 10
    return pdf, split_clock


@pytest.fixture(scope="module")
def series(spark):
    pdf, split = _mkseries()
    df = spark.createDataFrame(pdf)
    hist = df.filter(F.col("clock") >= split)
    trend = df.filter(F.col("clock") < split)
    return pdf, split, hist, trend


def test_detect1_matches_pandas_model(spark, series):
    pdf, split, hist, trend = series
    cfg = DetectorConfig(detect1_lambda_threshold=2.0, ignore_diff_rate=0.01,
                         trends_min_count=3)
    got = sorted(r["itemid"] for r in detect1(hist, trend, cfg).collect())

    # independent pandas model of detector.py:185-218 (intended semantics)
    t = pdf[pdf.clock < split].groupby("itemid")["value"] \
        .agg(["mean", "std", "count"]).reset_index()
    h = pdf[pdf.clock >= split].groupby("itemid")["value"].mean().reset_index()
    m = h.merge(t, on="itemid")
    m = m[(m["count"] > 3) & (m["std"] > 0)]
    band = (m["value"] > m["mean"] + 2.0 * m["std"]) | \
           (m["value"] < m["mean"] - 2.0 * m["std"])
    guard = (m["mean"] > 0) & ((m["value"] - m["mean"]).abs() / m["mean"] > 0.01)
    expected = sorted(m[band & guard]["itemid"].tolist())

    assert got == expected == [2, 5]


def test_adjacent_diff_stats_matches_pandas(spark, series):
    pdf, split, hist, trend = series
    got = adjacent_diff_stats(trend).orderBy("itemid").toPandas()

    exp_rows = []
    for item, g in pdf[pdf.clock < split].sort_values("clock").groupby("itemid"):
        d = g["value"].diff()
        d = d[d != 0].dropna()
        exp_rows.append((item, d.mean(), d.std()))
    exp = pd.DataFrame(exp_rows, columns=["itemid", "mean", "std"])
    np.testing.assert_allclose(got["mean"], exp["mean"], rtol=1e-9)
    np.testing.assert_allclose(got["std"], exp["std"], rtol=1e-9)


def test_detect2_matches_pandas_model(spark, series):
    pdf, split, hist, trend = series
    lam, rate = 2.0, 0.01
    env_sdf = tumbling_rollup(trend, 40)  # 4-sample envelope buckets
    cfg = DetectorConfig(detect2_lambda_threshold=lam, ignore_diff_rate=rate)
    got = sorted(r["itemid"] for r in detect2(hist, env_sdf, cfg).collect())

    # pandas model of detector.py:286-356: recent (min/max − first) vs the
    # σ of adjacent diffs of the trend envelope
    h = pdf[pdf.clock >= split].sort_values("clock")
    first = h.groupby("itemid")["value"].first()
    r = pd.DataFrame({
        "min": h.groupby("itemid")["value"].min() - first,
        "max": h.groupby("itemid")["value"].max() - first,
    }).reset_index()

    p = pdf[pdf.clock < split].copy()
    p["bucket"] = p.clock - p.clock % 40
    expected = set()
    for colname, is_up in (("max", True), ("min", False)):
        env = p.groupby(["itemid", "bucket"])["value"] \
               .agg("max" if is_up else "min").reset_index()
        rows = []
        for item, g in env.sort_values("bucket").groupby("itemid"):
            d = g["value"].diff()
            d = d[d != 0].dropna()
            if len(d) > 1 and d.std() > 0:
                rows.append((item, d.mean(), d.std()))
        st = pd.DataFrame(rows, columns=["itemid", "mean", "std"])
        m = r.merge(st, on="itemid")
        ext = m["max"] if is_up else m["min"]
        diff = (ext - m["mean"]).abs() if is_up else (m["mean"] - m["min"]).abs()
        rel = ((ext - m["mean"]) / m["mean"]).abs()
        expected |= set(m[(diff > lam * m["std"]) & (rel > rate)]["itemid"])

    assert got == sorted(expected)
    assert len(got) > 0  # the fixture must exercise the operator


def test_local_peaks_matches_bruteforce(spark, series):
    pdf, split, hist, trend = series
    window = 100
    got = {r["itemid"]: r["local_peak"]
           for r in local_peaks(trend, window, is_up=True).collect()}
    for item, g in pdf[pdf.clock < split].groupby("itemid"):
        # brute force: for every row clock c, mean over (c-window, c]
        best = max(g[(g.clock > c - window) & (g.clock <= c)]["value"].mean()
                   for c in g.clock)
        assert abs(got[item] - best) < 1e-9


def test_tumbling_rollup_matches_pandas(spark, series):
    pdf, split, hist, trend = series
    got = tumbling_rollup(trend, 60).orderBy("itemid", "clock").toPandas()
    p = pdf[pdf.clock < split].copy()
    p["bucket"] = p.clock - p.clock % 60
    exp = p.groupby(["itemid", "bucket"])["value"] \
           .agg(["min", "mean", "max", "count"]).reset_index()
    np.testing.assert_allclose(got["value_avg"], exp["mean"], rtol=1e-12)
    np.testing.assert_allclose(got["value_min"], exp["min"])
    np.testing.assert_allclose(got["value_max"], exp["max"])


def test_resample_to_grid_forward_fills(spark):
    df = spark.createDataFrame(
        [(1, 105, 10.0), (1, 118, 20.0), (1, 151, 40.0)],
        "itemid int, clock int, value double")
    out = {r["clock"]: r["value"]
           for r in resample_to_grid(df, 100, 170, 10).collect()}
    # grid 100..170; cell (100,110]=105→10; (110,120]=118→20; (150,160]=40
    assert out[110] == 10.0
    assert out[120] == 20.0
    assert out[130] == 20.0 and out[140] == 20.0  # forward fill
    assert out[160] == 40.0 and out[170] == 40.0
    assert out[100] == 10.0  # leading backfill


def test_minmax_normalize(spark):
    df = spark.createDataFrame(
        [(1, 0, 10.0), (1, 1, 20.0), (1, 2, 30.0), (2, 0, 5.0), (2, 1, 5.0)],
        "itemid int, clock int, value double")
    out = minmax_normalize(df).orderBy("itemid", "clock").collect()
    assert [r["value"] for r in out] == [0.0, 0.5, 1.0, 0.0, 0.0]  # const →0


def test_top_n_per_group(spark):
    df = spark.createDataFrame(
        [("h1", 1, 10), ("h1", 2, 30), ("h1", 3, 20), ("h2", 4, 5)],
        "hostid string, itemid int, item_count int")
    out = top_n_per_group(df, ["hostid"], "item_count", 2, ["itemid"]) \
        .orderBy("hostid", "itemid").collect()
    assert [(r["hostid"], r["itemid"]) for r in out] == \
        [("h1", 2), ("h1", 3), ("h2", 4)]


def test_apply_conditions(spark):
    stats = spark.createDataFrame(
        [(1, 100.0), (2, 5.0), (3, 50.0)], "itemid int, mean_h double")
    catalog = spark.createDataFrame(
        [(1, "cpu"), (2, "cpu"), (3, "disk")], "itemid int, kind string")
    conds = [Condition("kind = 'cpu'", "mean_h", ">", 10.0)]
    out = sorted(r["itemid"]
                 for r in apply_conditions(stats, catalog, conds).collect())
    # item 2 matches the filter but fails mean_h>10 → removed; 3 unmatched → kept
    assert out == [1, 3]
