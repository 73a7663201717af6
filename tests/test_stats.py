"""Sufficient-stats parity with the reference formulas.

Mirrors the reference's oracle pattern (tests/test_trends_stats.py:32-94):
incrementally-maintained stats must equal a from-scratch recompute, and the
finalization must match pandas mean()/std() (Bessel) with inf/NaN→0 scrub.
"""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.functions.stats import (
    sufficient_stats, finalize_mean_std, merge_stats, retract_stats, welford_stats,
)


@pytest.fixture(scope="module")
def metric_df(spark):
    rows = []
    for item in range(5):
        for t in range(50):
            rows.append((item, t, float((item + 1) * 10 + ((t * 7919 + item) % 13) - 6)))
    return spark.createDataFrame(rows, "itemid int, clock int, value double")


def test_finalize_matches_pandas(spark, metric_df):
    got = finalize_mean_std(sufficient_stats(metric_df, ["itemid"])) \
        .orderBy("itemid").toPandas()
    pdf = metric_df.toPandas()
    exp = pdf.groupby("itemid")["value"].agg(["mean", "std", "count"]).reset_index()
    for g, e_mean, e_std in zip(got.itertuples(), exp["mean"], exp["std"]):
        assert math.isclose(g.mean, e_mean, rel_tol=1e-9)
        assert math.isclose(g.std, e_std, rel_tol=1e-6)


def test_single_point_std_is_zero(spark):
    df = spark.createDataFrame([(1, 1, 5.0)], "itemid int, clock int, value double")
    out = finalize_mean_std(sufficient_stats(df, ["itemid"])).collect()[0]
    assert out["std"] == 0.0  # cnt==1 → division by zero → scrub to 0 (stats.py:133)
    assert out["mean"] == 5.0


def test_incremental_equals_recompute(spark, metric_df):
    """Window [10, 40): state built as full-window, then slid via merge+retract,
    must equal stats recomputed from scratch on the slid window [20, 50)."""
    w1 = metric_df.filter((F.col("clock") >= 10) & (F.col("clock") < 40))
    state = sufficient_stats(w1, ["itemid"])

    new = sufficient_stats(
        metric_df.filter((F.col("clock") >= 40) & (F.col("clock") < 50)), ["itemid"])
    expired = sufficient_stats(
        metric_df.filter((F.col("clock") >= 10) & (F.col("clock") < 20)), ["itemid"])

    slid = retract_stats(merge_stats(state, new, ["itemid"]), expired, ["itemid"])
    got = finalize_mean_std(slid).orderBy("itemid").toPandas()

    scratch = finalize_mean_std(sufficient_stats(
        metric_df.filter((F.col("clock") >= 20) & (F.col("clock") < 50)),
        ["itemid"])).orderBy("itemid").toPandas()

    pd.testing.assert_frame_equal(
        got[["itemid", "cnt", "mean", "std"]].reset_index(drop=True),
        scratch[["itemid", "cnt", "mean", "std"]].reset_index(drop=True),
        check_dtype=False, rtol=1e-9,
    )


def test_welford_equals_native(spark, metric_df):
    native = finalize_mean_std(sufficient_stats(metric_df, ["itemid"])) \
        .select("itemid", "cnt", "mean", "std").orderBy("itemid").toPandas()
    wf = welford_stats(metric_df, ["itemid"]) \
        .select("itemid", "cnt", "mean", "std").orderBy("itemid").toPandas()
    pd.testing.assert_frame_equal(native.reset_index(drop=True),
                                  wf.reset_index(drop=True),
                                  check_dtype=False, rtol=1e-9)
