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


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """The mergeable-sketch percentile path (the 10^12-row variant) must
    track the exact interpolated percentiles within a tight relative bound
    on the real fixture distribution."""
    from pyanomalydetector_spark.functions.stats import length_percentiles
    from pyanomalydetector_spark.sources.sequences import load_sequences
    seq = load_sequences(spark, sf_dir)
    exact = {r["source"]: (r["p_50"], r["p_90"], r["p_99"])
             for r in length_percentiles(seq, ["source"], "n_tok").collect()}
    approx = {r["source"]: (r["p_50"], r["p_90"], r["p_99"])
              for r in length_percentiles(seq, ["source"], "n_tok",
                                          exact=False).collect()}
    assert set(exact) == set(approx)
    # approx_percentile returns discrete sample values (no interpolation),
    # so assert RANK accuracy: the sketch's value must sit within 1% of the
    # requested rank in the group's actual sorted values
    vals = {}
    for r in seq.select("source", "n_tok").collect():
        vals.setdefault(r["source"], []).append(r["n_tok"])
    for src, xs in vals.items():
        xs.sort()
        n = len(xs)
        for p, a in zip((0.5, 0.9, 0.99), approx[src]):
            lo = sum(1 for x in xs if x < a)     # rank range of value a
            hi = sum(1 for x in xs if x <= a)
            target = p * (n - 1)
            assert lo - 0.01 * n - 1 <= target <= hi + 0.01 * n + 1, \
                (src, p, a, lo, hi, n)


def test_packing_assignment_invariants(spark, sf_dir):
    """Greedy concat-and-chunk assignment invariants per shard: offsets are
    the exclusive prefix sum of (n_tok+1) in doc order (consecutive deltas
    equal the previous doc's n_tok+1), context ids are non-decreasing, and
    the final context count agrees with seq_packing_stats' accounting."""
    from pyspark.sql import functions as F

    from pyanomalydetector_spark.functions.stats import packing_assignment
    from pyanomalydetector_spark.sources.sequences import load_sequences

    seq = load_sequences(spark, sf_dir)
    out = packing_assignment(seq, ctx=2048)
    rows = sorted(out.collect(),
                  key=lambda r: (r["partition_id"], r["start_offset"]))
    lens = {(r["source"], r["doc_id"]): r["n_tok"]
            for r in seq.select("source", "doc_id", "n_tok").collect()}

    by_part = {}
    for r in rows:
        by_part.setdefault(r["partition_id"], []).append(r)
    assert by_part
    for part, rs in by_part.items():
        assert rs[0]["start_offset"] == 0
        total = 0
        for r in rs:
            assert r["start_offset"] == total, (part, r)
            assert r["context_id"] == total // 2048
            assert r["offset_in_context"] == total % 2048
            total += lens[(part, r["doc_id"])] + 1
        # agreement with the packing-stats accounting
        assert rs[-1]["start_offset"] + lens[(part, rs[-1]["doc_id"])] + 1 \
            == total


def test_packing_two_phase_equals_single_on_whale_source(spark):
    """The distributed (two-phase) prefix sum must emit exactly the
    single-window assignment, AND actually parallelize a whale source: the
    heavy window keys on (source, bucket) over range-contiguous buckets,
    so one source that is 99% of the corpus runs as many window tasks."""
    from pyspark.sql import functions as F

    from pyanomalydetector_spark.functions.stats import packing_assignment

    whale = spark.range(20000).select(
        F.lit("whale").alias("source"),
        F.format_string("doc_%08d", F.col("id")).alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(400)) + 1).cast("int").alias("n_tok"))
    minnow = spark.range(10).select(
        F.lit("minnow").alias("source"),
        F.format_string("doc_%08d", F.col("id")).alias("doc_id"),
        F.lit(7).cast("int").alias("n_tok"))
    seq = whale.unionByName(minnow)

    def keyed(df):
        return sorted((r["partition_id"], r["doc_id"], r["start_offset"],
                       r["context_id"], r["offset_in_context"])
                      for r in df.collect())

    single = keyed(packing_assignment(seq, ctx=2048))
    two = packing_assignment(seq, ctx=2048, n_buckets=16)
    assert keyed(two) == single

    # parallelism evidence: the local-prefix window partitions on
    # (source, _bkt), and the whale's rows land in >1 range bucket
    plan = two._jdf.queryExecution().executedPlan().toString()
    assert "_bkt" in plan
    narrow = seq.repartitionByRange(16, F.col("source"), F.col("doc_id")) \
                .withColumn("_bkt", F.spark_partition_id())
    n_whale_buckets = narrow.filter(F.col("source") == "whale") \
                            .select("_bkt").distinct().count()
    assert n_whale_buckets > 1, n_whale_buckets


def test_merge_retract_null_key_is_one_group(spark):
    """A NULL key must merge/retract as ONE group across batches: the old
    plain-equality full-outer join never matched NULL = NULL, so every
    batch carrying a NULL-key partial appended a fresh NULL-key state row,
    silently diverging from a from-scratch recompute (and from the
    reference's pandas merge, which joins NaN keys). Incremental ≡
    recompute must hold on the hostile key too."""
    sch = "itemid string, clock int, value double"
    b1 = spark.createDataFrame(
        [(None, 1, 2.0), (None, 2, 4.0), ("a", 1, 1.0)], sch)
    b2 = spark.createDataFrame(
        [(None, 3, 6.0), ("a", 2, 3.0), ("b", 1, 9.0)], sch)
    state = merge_stats(sufficient_stats(b1, ["itemid"]),
                        sufficient_stats(b2, ["itemid"]), ["itemid"])
    assert state.filter(F.col("itemid").isNull()).count() == 1
    got = {r["itemid"]: r for r in finalize_mean_std(state).collect()}
    scratch = {r["itemid"]: r for r in finalize_mean_std(
        sufficient_stats(b1.unionByName(b2), ["itemid"])).collect()}
    assert set(got) == set(scratch)
    for k in got:
        assert got[k]["cnt"] == scratch[k]["cnt"]
        assert math.isclose(got[k]["mean"], scratch[k]["mean"], rel_tol=1e-12)
        assert math.isclose(got[k]["std"], scratch[k]["std"], rel_tol=1e-9)
    # retraction of the first batch leaves exactly the second batch's stats
    after = retract_stats(state, sufficient_stats(b1, ["itemid"]), ["itemid"])
    left = {r["itemid"]: r for r in finalize_mean_std(after).collect()}
    only2 = {r["itemid"]: r for r in finalize_mean_std(
        sufficient_stats(b2, ["itemid"])).collect()}
    assert {k: v["cnt"] for k, v in left.items() if v["cnt"] > 0} == \
           {k: v["cnt"] for k, v in only2.items()}
    assert math.isclose(left[None]["mean"], only2[None]["mean"], rel_tol=1e-12)
