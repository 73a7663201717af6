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
