"""Fused single-plan cascade ≡ staged semi-join cascade.

The fused path (operators/cascade_fused.py) recasts the detect1→2→3→4 chain
as one conjunctive predicate over a per-item feature frame; the staged path
(operators/detect.py:detect_cascade) replicates the reference's driver loop.
These must produce identical survivor sets for every stage subset and
threshold regime — including boards that empty out mid-cascade, where the
staged path early-exits and the fused path must still evaluate to ∅.
"""

import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.operators.cascade_fused import detect_cascade_fused
from pyanomalydetector_spark.operators.detect import DetectorConfig, detect_cascade
from pyanomalydetector_spark.plans.pipeline import (
    detect_pipeline, events_metrics, long_trends_window, split_windows)

CFG_LOOSE = DetectorConfig(detect1_lambda_threshold=1.0,
                           detect2_lambda_threshold=1.0,
                           detect3_lambda_threshold1=1.5,
                           detect3_lambda_threshold2=1.0,
                           ignore_diff_rate=0.01,
                           anomaly_valid_count_rate=0.001)
CFG_EXTREME = DetectorConfig(detect1_lambda_threshold=0.5,
                             detect2_lambda_threshold=0.5,
                             detect3_lambda_threshold1=1.0,
                             detect3_lambda_threshold2=0.5,
                             ignore_diff_rate=0.0,
                             anomaly_valid_count_rate=0.0)
CFG_EMPTY = DetectorConfig(detect1_lambda_threshold=50.0)


def _both(spark, sf_dir, cfg, stages):
    metrics = events_metrics(spark, sf_dir)
    history, trends, hc, hc2, sp2 = split_windows(metrics, cfg)
    lt = hc4 = hc4_2 = None
    if 4 in stages:
        lt, hc4, hc4_2 = long_trends_window(metrics, cfg)
    kw = dict(long_trends_df=lt, hist_count4=hc4, hist_count4_2=hc4_2,
              stages=stages)
    staged = detect_cascade(history, trends, history, cfg, hc, hc2, sp2, **kw)
    fused = detect_cascade_fused(history, trends, history, cfg, hc, hc2, sp2,
                                 **kw)
    return ({r.itemid for r in staged.collect()},
            {r.itemid for r in fused.collect()})


@pytest.mark.parametrize("stages", [(1, 2, 3, 4), (2, 3), (1,), (3,), (4,),
                                    (1, 4), ()])
def test_fused_eq_staged_stage_subsets(spark, sf_dir, stages):
    a, b = _both(spark, sf_dir, CFG_LOOSE, stages)
    assert a == b


@pytest.mark.parametrize("cfg", [DetectorConfig(), CFG_EXTREME, CFG_EMPTY],
                         ids=["default", "extreme", "empties-at-stage1"])
def test_fused_eq_staged_threshold_regimes(spark, sf_dir, cfg):
    a, b = _both(spark, sf_dir, cfg, (1, 2, 3, 4))
    assert a == b


def test_fused_eq_staged_nonempty_board(spark):
    """sf0.01 with the loose config actually has survivors at every stage —
    guards against both paths agreeing on vacuously-empty sets only."""
    a, b = _both(spark, "/root/testdata/sf0.01", CFG_LOOSE, (1, 2, 3, 4))
    assert a == b
    assert len(a) > 0


def test_pipeline_shared_scan_path_eq_staged(spark):
    """detect_pipeline's fused default takes the shared-rollup route (ENDEP
    is bucket-aligned): must equal the staged pipeline bit-for-bit."""
    sf = "/root/testdata/sf0.01"
    fused = {r.itemid for r in
             detect_pipeline(spark, sf, CFG_LOOSE, fused=True).collect()}
    staged = {r.itemid for r in
              detect_pipeline(spark, sf, CFG_LOOSE, fused=False).collect()}
    assert fused == staged and len(fused) > 0


def test_fused_eq_staged_all_null_history_values(spark):
    """An item whose history-window values are ALL NULL must be excluded by
    both paths: staged drops it (finalize_mean_std filters cnt==0 → inner
    join), fused must keep mean_h NULL (scrubbing it to 0.0 would pass the
    band + guard and fabricate a survivor)."""
    cfg = DetectorConfig(detect1_lambda_threshold=1.0, ignore_diff_rate=0.05,
                         trends_min_count=2)
    endep = 1706659200
    h_start = endep - cfg.history_interval * cfg.history_retention
    t_start = endep - cfg.trends_interval * cfg.trends_retention
    rows = []
    for item, hist_val in [("nullv", None), ("anom", 500.0), ("calm", 100.0)]:
        for d in range(10):
            rows.append((item, t_start + d * cfg.trends_interval + 10,
                         100.0 + (d % 3)))
        for k in range(5):
            rows.append((item, h_start + k * cfg.history_interval + 5,
                         hist_val))
    metrics = spark.createDataFrame(
        rows, "itemid string, clock long, value double")
    history, trends, hc, hc2, sp2 = split_windows(metrics, cfg, endep)
    staged = detect_cascade(history, trends, history, cfg, hc, hc2, sp2,
                            stages=(1,))
    fused = detect_cascade_fused(history, trends, history, cfg, hc, hc2, sp2,
                                 stages=(1,))
    a = {r.itemid for r in staged.collect()}
    b = {r.itemid for r in fused.collect()}
    assert a == b
    assert "anom" in a and "nullv" not in a


def test_pipeline_long_window_shorter_than_trends(spark):
    """long_trends_retention < trends_retention must NOT take the shared-scan
    route (filtering the long rollup would truncate the short trends window
    to [t_start4, ...)); the fused pipeline must still equal staged."""
    cfg = DetectorConfig(detect1_lambda_threshold=1.0,
                         detect2_lambda_threshold=1.0,
                         detect3_lambda_threshold1=1.5,
                         detect3_lambda_threshold2=1.0,
                         ignore_diff_rate=0.01,
                         anomaly_valid_count_rate=0.001,
                         long_trends_retention=10)   # < trends_retention=27
    sf = "/root/testdata/sf0.01"
    fused = {r.itemid for r in
             detect_pipeline(spark, sf, cfg, fused=True).collect()}
    staged = {r.itemid for r in
              detect_pipeline(spark, sf, cfg, fused=False).collect()}
    assert fused == staged


def test_strict_modes_fall_back_to_staged(spark, sf_dir):
    """Strict reference-quirk flags route through the staged implementation
    (the fused algebra intentionally models only the portable semantics)."""
    cfg = DetectorConfig(detect1_lambda_threshold=1.0,
                         ignore_diff_rate=0.01,
                         strict_reference_peaks=True)
    metrics = events_metrics(spark, sf_dir)
    history, trends, hc, hc2, sp2 = split_windows(metrics, cfg)
    staged = detect_cascade(history, trends, history, cfg, hc, hc2, sp2,
                            stages=(1, 2, 3))
    fused = detect_cascade_fused(history, trends, history, cfg, hc, hc2, sp2,
                                 stages=(1, 2, 3))
    assert {r.itemid for r in staged.collect()} == \
           {r.itemid for r in fused.collect()}


def test_fused_plan_is_single_history_scan(spark, sf_dir):
    """Plan-shape gate: the fused cascade must contain exactly ONE scan of
    the events parquet (the history pass) plus the checkpointed env RDD —
    the staged path's repeated history re-reads are the thing the fusion
    exists to remove."""
    spark.catalog.clearCache()
    df = detect_pipeline(spark, sf_dir, CFG_LOOSE, fused=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    scans = re.findall(r"Scan parquet|FileScan parquet", plan)
    assert len(scans) <= 1, f"expected ≤1 parquet scan, got {len(scans)}"
