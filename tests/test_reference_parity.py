"""Parity against the reference's OWN fixtures and golden vectors.

- The alignment walk reproduces the reference's exact golden vectors
  (/root/reference/tests/test_normalizer.py:14-27).
- detect1 on the reference's frozen CSV snapshot
  (/root/reference/testdata/csv/20250214_1100, the fixture of
  tests/test_detector_detect1.py) with its pinned endep/items/config must
  produce the same survivor set as a pandas oracle that replicates the
  reference's arithmetic line-by-line — INCLUDING the operator-precedence
  bug in its ignore_diff_rate guard (detector.py:218: ``mean_t > 0 & (...)``
  binds as ``mean_t > (0 & ...) ≡ mean_t > 0``), which we reproduce here by
  running our engine with ``ignore_diff_rate=0`` (equivalent given the band
  filter already guarantees a non-zero deviation).
"""

import gzip
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.operators.normalize import (
    fit_to_grid_walk, resample_to_grid_exact,
)
from pyanomalydetector_spark.operators.detect import DetectorConfig, detect1
from pyanomalydetector_spark.sources.csv_io import (
    read_metrics_csv, HISTORY_SCHEMA, TRENDS_SCHEMA,
)

FIX = "/root/reference/testdata/csv/20250214_1100"
ITEM_IDS = [59888, 93281, 94003, 110309, 141917, 217822, 236160, 217825,
            270793, 270797, 217823]          # test_detector_detect1.py:47
T0 = 1739505598 - 3600 * 24 * 3              # trends-stats build time
ENDEP = 1739505598 - 600 * 18                # detection time

pytestmark = pytest.mark.skipif(not os.path.isdir(FIX),
                                reason="reference fixture not present")


def test_fit_walk_matches_reference_golden_vectors():
    # tests/test_normalizer.py:15-20
    assert fit_to_grid_walk([1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
                            [2, 4, 5, 7, 9], [1, 2, 3, 4, 5]) == \
        [1, 1, 2, 2, 3, 4, 4, 5, 5, 5]
    # tests/test_normalizer.py:22-27
    assert fit_to_grid_walk([2, 4, 5, 7, 9],
                            list(range(1, 11)), list(range(1, 11))) == \
        [1.5, 3.5, 5, 6.5, 9.25]


def test_resample_exact_distributed_equals_walk(spark):
    rows = [(1, c, float(v)) for c, v in zip([2, 4, 5, 7, 9], [1, 2, 3, 4, 5])]
    df = spark.createDataFrame(rows, "itemid long, clock long, value double")
    got = {r["clock"]: r["value"]
           for r in resample_to_grid_exact(df, 1, 10, 1).collect()}
    # grid floored to unit 1 → [1..10]
    expected = fit_to_grid_walk(list(range(1, 11)), [2, 4, 5, 7, 9],
                                [1, 2, 3, 4, 5])
    assert [got[c] for c in range(1, 11)] == expected


def _pandas_detect1_oracle():
    """The reference's detect1 arithmetic, replicated independently in
    pandas over the same fixture slices (stats.py:69-135 + detector.py
    185-230, with the :218 bug's effective semantics)."""
    with gzip.open(os.path.join(FIX, "trends.csv.gz"), "rt") as f:
        tr = pd.read_csv(f)
    with gzip.open(os.path.join(FIX, "history.csv.gz"), "rt") as f:
        hi = pd.read_csv(f)

    t_start = T0 - 86400 * 14
    tr = tr[tr["itemid"].isin(ITEM_IDS)
            & (tr["clock"] >= t_start) & (tr["clock"] <= T0)]
    t = tr.groupby("itemid")["value_avg"].agg(
        sum="sum", sqr_sum=lambda s: float(np.sum(np.square(s))), cnt="count"
    ).reset_index()
    t["mean"] = t["sum"] / t["cnt"]
    t["std"] = np.sqrt((t["sqr_sum"] - np.square(t["sum"]) / t["cnt"])
                       / (t["cnt"] - 1))
    t["std"] = t["std"].replace([np.inf, -np.inf], np.nan).fillna(0)
    t = t[(t["cnt"] > 14) & (t["std"] > 0)]

    h_start = ENDEP - 600 * 18
    hi = hi[hi["itemid"].isin(ITEM_IDS)
            & (hi["clock"] >= h_start) & (hi["clock"] <= ENDEP)]
    h = hi.groupby("itemid")["value"].mean().reset_index(name="mean_h")

    j = h.merge(t[["itemid", "mean", "std"]].rename(columns={"mean": "mean_t"}),
                on="itemid")
    lam = 3.0
    band = (j["mean_h"] > j["mean_t"] + lam * j["std"]) | \
           (j["mean_h"] < j["mean_t"] - lam * j["std"])
    j = j[band]
    j = j[j["mean_t"] > 0]        # detector.py:218's effective filter
    return sorted(set(j["itemid"].tolist()))


def test_detect1_on_reference_fixture(spark):
    history = read_metrics_csv(
        spark, os.path.join(FIX, "history.csv.gz"), HISTORY_SCHEMA,
        startep=ENDEP - 600 * 18, endep=ENDEP, item_ids=ITEM_IDS)
    trends = read_metrics_csv(
        spark, os.path.join(FIX, "trends.csv.gz"), TRENDS_SCHEMA,
        startep=T0 - 86400 * 14, endep=T0, item_ids=ITEM_IDS) \
        .select("itemid", "clock", F.col("value_avg").alias("value"))

    cfg = DetectorConfig(detect1_lambda_threshold=3.0, trends_min_count=14,
                         ignore_diff_rate=0.0)
    ours = sorted(r["itemid"] for r in detect1(history, trends, cfg).collect())

    expected = _pandas_detect1_oracle()
    assert ours == expected
    assert len(ours) > 0          # the reference test's own assertion

def _pandas_detect2_oracle(spark, survivors):
    """The reference's detect2 arithmetic over the fixture: grid-aligned
    history cache (update_history, detector.py:112-146) + trends envelopes
    [t_start, h_start] (detector.py:274-283, 340-379), replicated in pandas
    including the signed-denominator rel-diff guard (detector.py:325, 332)."""
    with gzip.open(os.path.join(FIX, "trends.csv.gz"), "rt") as f:
        tr = pd.read_csv(f)
    with gzip.open(os.path.join(FIX, "history.csv.gz"), "rt") as f:
        hi = pd.read_csv(f)

    h_start = ENDEP - 600 * 18
    t_start = ENDEP - 86400 * 14
    cache_start = ENDEP - 86400            # anomaly_keep_secs window

    # build the grid cache exactly like update_history
    grid = list(range(cache_start - cache_start % 600,
                      ENDEP - ENDEP % 600 + 600, 600))
    cache_rows = []
    for item in survivors:
        d = hi[(hi["itemid"] == item) & (hi["clock"] >= grid[0])
               & (hi["clock"] <= grid[-1])].sort_values("clock")
        if d.empty:
            continue
        vals = fit_to_grid_walk(grid, d["clock"].tolist(),
                                d["value"].astype(float).tolist())
        cache_rows += [(item, c, v) for c, v in zip(grid, vals)]
    cache = pd.DataFrame(cache_rows, columns=["itemid", "clock", "value"])
    cache = cache[(cache["clock"] >= h_start) & (cache["clock"] <= ENDEP)] \
        .sort_values(["itemid", "clock"])

    r = cache.groupby("itemid")["value"].agg(["min", "max", "first"]).reset_index()
    r["min"], r["max"] = r["min"] - r["first"], r["max"] - r["first"]

    tr = tr[tr["itemid"].isin(survivors)
            & (tr["clock"] >= t_start) & (tr["clock"] <= h_start)]

    out = set()
    for is_up, col in ((True, "value_max"), (False, "value_min")):
        frames = []
        for item in survivors:
            d = tr[tr["itemid"] == item].sort_values("clock").copy()
            d["diff"] = d[col].diff().fillna(0)
            d = d[d["diff"] != 0]
            if not d.empty:
                frames.append(d)
        if not frames:
            continue
        ds = pd.concat(frames).groupby("itemid")["diff"] \
               .agg(["mean", "std"]).reset_index()
        j = r.merge(ds, on="itemid")
        j = j[j["std"] > 0]
        ext = j["max"] if is_up else j["min"]
        j = j[abs(ext - j["mean"]) > 2.0 * j["std"]]
        ext = j["max"] if is_up else j["min"]
        j = j[abs(ext - j["mean"]) / j["mean"] > 0.2]
        out |= set(j["itemid"].tolist())
    return sorted(out)


def test_detect2_on_reference_fixture(spark):
    from pyanomalydetector_spark.operators.detect import detect2
    survivors = _pandas_detect1_oracle()
    assert survivors

    h_start = ENDEP - 600 * 18
    t_start = ENDEP - 86400 * 14
    cache_start = ENDEP - 86400

    raw = read_metrics_csv(
        spark, os.path.join(FIX, "history.csv.gz"), HISTORY_SCHEMA,
        item_ids=survivors)
    cache = resample_to_grid_exact(raw, cache_start, ENDEP, 600)
    h2 = cache.filter((F.col("clock") >= h_start) & (F.col("clock") <= ENDEP))

    trends = read_metrics_csv(
        spark, os.path.join(FIX, "trends.csv.gz"), TRENDS_SCHEMA,
        startep=t_start, endep=h_start, item_ids=survivors)

    cfg = DetectorConfig(detect2_lambda_threshold=2.0, ignore_diff_rate=0.2,
                         strict_reference_diff_guard=True)
    ours = sorted(r["itemid"] for r in detect2(h2, trends, cfg).collect())
    assert ours == _pandas_detect2_oracle(spark, survivors)
