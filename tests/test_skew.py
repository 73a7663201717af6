"""Skew stress: hot partition (50% of rows) + hot duplicate key (2.5% of
rows) must neither blow up check runtimes nor defeat the join planner.

- Runtime: uniqueness + referential on the skewed table within 2× of the
  uniform table (map-side combine neutralizes the hot key; the generous
  bound absorbs host variance — BENCH records the actual ratio per round).
- Plan: a doc_id self-join over the skewed table gets its oversized
  partitions split by AQE (``skew=true`` on the SortMergeJoin in the final
  adaptive plan).
"""

import time

import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.checks.core import Check, run_checks
from pyanomalydetector_spark.sources.skew import synthesize_skew_pair

N_ROWS = 300_000


@pytest.fixture(scope="module")
def pair(spark):
    uni, skw = synthesize_skew_pair(spark, N_ROWS)
    return spark.read.parquet(uni), spark.read.parquet(skw)


def _suite():
    return [Check("uniq", "unique", {"key": "doc_id"}),
            Check("ref", "referential",
                  {"column": "source",
                   "allowed": [f"src{i}" for i in range(20)] + ["src_hot"]})]


def _run(df):
    t0 = time.perf_counter()
    res = run_checks(df, _suite())
    res.verdicts.count()
    res.violations.count()
    return time.perf_counter() - t0


def test_checks_runtime_tolerates_skew(pair):
    uniform, skewed = pair
    _run(uniform)                      # warm both cache paths once
    t_uni = min(_run(uniform), _run(uniform))
    t_skw = min(_run(skewed), _run(skewed))
    assert t_skw <= 2.0 * t_uni + 0.5, (t_skw, t_uni)


def test_hot_key_counted_exactly(pair):
    _, skewed = pair
    res = run_checks(skewed, [Check("uniq", "unique", {"key": "doc_id"})])
    hot = [r for r in res.violations.collect() if r["doc_id"] == "doc_hot"]
    # the hot key is reported once per partition it appears in, with the
    # exact duplicate count — 20% of N_ROWS spread over the partitions
    assert sum(int(r["observed"]) for r in hot) == N_ROWS // 5


def test_aqe_splits_skewed_join(spark, pair):
    _, skewed = pair
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # the downstream aggregate would otherwise veto the skew split
        # (splitting breaks the join's output partitioning)
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        a = skewed.select("doc_id", "n_tok")
        b = skewed.select(F.col("doc_id"), F.col("source"))
        j = a.join(b, "doc_id").groupBy("source").count()
        j.collect()                       # finalize the adaptive plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
