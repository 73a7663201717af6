"""Streaming check suite: per-batch validation with pinned first-batch
baseline and idempotent redelivery."""

import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.sources.sequences import load_sequences
from pyanomalydetector_spark.checks.core import Check, run_checks, default_suite
from pyanomalydetector_spark.plans.checkpoint import (
    suite_hash, pin_suite,
)
from pyanomalydetector_spark.streaming.check_stream import (
    StreamingSuiteRunner, stream_check_suite,
)


@pytest.fixture(scope="module")
def seq(spark, sf_dir):
    return load_sequences(spark, sf_dir).persist()


def _suite(seq):
    allowed = sorted(r["source"] for r in seq.select("source").distinct()
                     .filter(F.col("source").rlike("^src[0-9]+$")).collect())
    return default_suite(allowed)


def test_stream_validates_each_batch(spark, seq, tmp_path):
    inp = str(tmp_path / "in")
    parts = sorted(r["source"] for r in seq.select("source").distinct().collect())
    half1, half2 = parts[: len(parts) // 2], parts[len(parts) // 2:]

    seq.filter(F.col("source").isin(half1)).write.mode("append").parquet(inp)
    suite = _suite(seq)
    runner = StreamingSuiteRunner(spark, str(tmp_path / "store"), suite)

    q = stream_check_suite(spark, inp, seq.schema, runner,
                           str(tmp_path / "ck"))
    q.awaitTermination(180)
    v1 = runner.verdicts().collect()
    assert {r["partition_id"] for r in v1} == set(half1)
    batch_ids = {r["batch_id"] for r in v1}

    # second wave of files → validated as a new batch against the SAME
    # pinned baseline
    seq.filter(F.col("source").isin(half2)).write.mode("append").parquet(inp)
    q = stream_check_suite(spark, inp, seq.schema, runner,
                           str(tmp_path / "ck"))
    q.awaitTermination(180)
    v2 = runner.verdicts().collect()
    assert {r["partition_id"] for r in v2} == set(parts)
    assert {r["batch_id"] for r in v2} - batch_ids  # new batch id appeared

    # equivalence: batch-2 verdicts == one-shot run of the pinned suite on
    # the same slice
    bl = runner.store.load_baseline(suite_hash(suite), "stream")
    pinned = pin_suite(suite, bl, runner.store)
    expected = run_checks(seq.filter(F.col("source").isin(half2)), pinned)

    def norm(rows):
        return sorted((r["partition_id"], r["check_id"], r["passed"],
                       round(r["observed"], 6)) for r in rows)
    got2 = [r for r in v2 if r["partition_id"] in set(half2)]
    assert norm(got2) == norm(expected.verdicts.collect())


def test_stream_batch_redelivery_noop(spark, seq, tmp_path):
    inp = str(tmp_path / "in")
    seq.limit(50).write.parquet(inp)
    runner = StreamingSuiteRunner(spark, str(tmp_path / "store"), _suite(seq))
    q = stream_check_suite(spark, inp, seq.schema, runner, str(tmp_path / "ck"))
    q.awaitTermination(180)
    before = runner.verdicts().count()
    runner.apply_batch(seq.limit(50), 0)   # redelivered batch 0
    assert runner.verdicts().count() == before


def test_stream_crash_between_write_and_mark_no_duplicates(spark, seq,
                                                           tmp_path):
    """The failure mode the per-batch-overwrite design targets: results
    written but the ledger mark lost (crash window). The redelivered batch
    must OVERWRITE, not append — verdicts()/violations() see each batch
    exactly once."""
    import json
    runner = StreamingSuiteRunner(spark, str(tmp_path / "store"), _suite(seq))
    runner.apply_batch(seq.limit(80), 0)
    v_before = sorted(map(tuple, runner.verdicts().collect()))
    viol_before = runner.violations().count()

    # simulate the crash: forget the mark, keep the written files
    with open(runner.ledger_path, "w") as f:
        json.dump([], f)
    runner.apply_batch(seq.limit(80), 0)   # redelivery re-processes fully

    assert sorted(map(tuple, runner.verdicts().collect())) == v_before
    assert runner.violations().count() == viol_before
