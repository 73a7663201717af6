"""Checkpoint/resume: skip-done, pinned baselines, lineage, gap reset.

Replicates the reference's oracle pattern "incremental result ≡ from-scratch
recompute" (/root/reference/tests/test_trends_stats.py:32-58) for the
check-suite engine.
"""

import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.sources.sequences import load_sequences
from pyanomalydetector_spark.checks.core import Check, run_checks, default_suite
from pyanomalydetector_spark.plans.checkpoint import (
    CheckpointStore, run_with_checkpoint, suite_hash, snapshot_id_for_dir,
    compute_baseline, pin_suite, CKPT_SCHEMA,
)


@pytest.fixture(scope="module")
def seq(spark, sf_dir):
    return load_sequences(spark, sf_dir).persist()


@pytest.fixture(scope="module")
def suite(seq):
    allowed = sorted(r["source"] for r in seq.select("source").distinct()
                     .filter(F.col("source").rlike("^src[0-9]+$")).collect())
    return default_suite(allowed)


def _norm_verdicts(df):
    return sorted(
        (r["partition_id"], r["check_id"], r["passed"],
         round(r["observed"], 6) if r["observed"] is not None else None,
         r["n_violations"], r["rows_scanned"])
        for r in df.collect())


def _norm_violations(df):
    return sorted(tuple(r) for r in df.collect())


def test_checkpointed_run_equals_plain_run(spark, seq, suite, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    res = run_with_checkpoint(seq, suite, store)
    plain = run_checks(seq, suite)
    assert _norm_verdicts(res.verdicts) == _norm_verdicts(plain.verdicts)
    assert _norm_violations(res.violations) == _norm_violations(plain.violations)


def test_second_run_skips_everything(spark, seq, suite, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    r1 = run_with_checkpoint(seq, suite, store)
    runs1 = {r["run_id"] for r in store.read_checkpoint().collect()}
    r2 = run_with_checkpoint(seq, suite, store)
    runs2 = {r["run_id"] for r in store.read_checkpoint().collect()}
    assert runs1 == runs2            # no new work was done
    assert _norm_verdicts(r1.verdicts) == _norm_verdicts(r2.verdicts)


def test_resume_completes_only_pending_partitions(spark, seq, suite, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    parts = sorted(r["source"] for r in seq.select("source").distinct().collect())
    half = parts[: len(parts) // 2]

    run_with_checkpoint(seq.filter(F.col("source").isin(half)), suite, store)
    ck1 = {r["partition_id"]: r["run_id"] for r in store.read_checkpoint().collect()}
    assert set(ck1) == set(half)

    res = run_with_checkpoint(seq, suite, store)
    ck2 = {r["partition_id"]: r["run_id"] for r in store.read_checkpoint().collect()}
    assert set(ck2) == set(parts)
    # previously-done partitions were NOT recomputed
    assert all(ck2[p] == ck1[p] for p in half)

    # resumed union ≡ one-shot run under the SAME pinned baseline
    shash = suite_hash(suite)
    bl = store.load_baseline(shash, "static")
    expected = run_checks(seq, pin_suite(suite, bl, store))
    assert _norm_verdicts(res.verdicts) == _norm_verdicts(expected.verdicts)
    assert _norm_violations(res.violations) == _norm_violations(expected.violations)


def test_suite_change_resets_state(spark, seq, suite, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    run_with_checkpoint(seq, suite, store)
    changed = [Check(c.check_id, c.kind, {**c.params, "lambda": 9.9})
               if c.kind == "zscore_threshold" else c for c in suite]
    assert suite_hash(changed) != suite_hash(suite)
    assert store.done_partitions(suite_hash(changed), "static") == []
    res = run_with_checkpoint(seq, changed, store)
    # all partitions re-verdicted under the new hash
    n_parts = seq.select("source").distinct().count()
    assert res.verdicts.select("partition_id").distinct().count() == n_parts


def test_lineage_columns_populated(spark, seq, suite, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    run_with_checkpoint(seq, suite, store)
    rows = store.read_checkpoint().collect()
    assert rows
    for r in rows:
        assert r["rows_scanned"] > 0
        assert r["stat_digest"] is not None
        assert r["t_ms"] > 0
        assert r["suite_hash"] == suite_hash(suite)


def test_snapshot_id_changes_with_input(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"x" * 10)
    s1 = snapshot_id_for_dir(str(d))
    (d / "b.parquet").write_bytes(b"y" * 20)
    s2 = snapshot_id_for_dir(str(d))
    assert s1 != s2


def test_parquet_backend_selected_without_iceberg(spark, tmp_path):
    """Backend gate: with no Iceberg jars/catalog the store must run on the
    parquet emulation (catalog None) — the path every other test pins."""
    from pyanomalydetector_spark.plans.checkpoint import iceberg_catalog
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    assert store.catalog == iceberg_catalog(spark)
    if store.catalog is None:
        assert store.current_snapshot_id() is None


def test_iceberg_backend_merge_contract(spark, tmp_path):
    """Production-fidelity state table: MERGE INTO keyed on partition_id,
    snapshot-id lineage, expire_snapshots retention. Auto-skips when the
    Iceberg runtime jars are absent (as in this sandbox) — the parquet
    emulation is contract-equivalent and covered by the rest of this file."""
    from pyanomalydetector_spark.plans.checkpoint import iceberg_catalog
    cat = iceberg_catalog(spark)
    if cat is None:
        pytest.skip("no Iceberg catalog on the classpath")
    store = CheckpointStore(spark, str(tmp_path / "ckpt"), catalog=cat)
    rows = spark.createDataFrame(
        [("p1", "h", "s", 10, 1, 0, 1.0, 1), ("p2", "h", "s", 20, 2, 0, 1.0, 1)],
        CKPT_SCHEMA)
    store.merge(rows)
    updated = spark.createDataFrame(
        [("p1", "h", "s", 99, 9, 1, 2.0, 2)], rows.schema)
    store.merge(updated)
    got = {r["partition_id"]: r for r in store.read_checkpoint().collect()}
    assert set(got) == {"p1", "p2"}          # MERGE upserted, no duplicates
    assert got["p1"]["rows_scanned"] == 99   # matched row was updated
    assert store.current_snapshot_id() is not None


def test_checkpoint_resume_with_null_partition(spark, tmp_path):
    """A NULL partition key must checkpoint and resume cleanly: once done it
    is skipped, it must not poison the skip-done filter for pending
    partitions (~isin over a list containing None is NULL for EVERY row),
    and resumed ≡ one-shot still holds."""
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    first = spark.createDataFrame(
        [("a", [1], 1, "s1"), ("n", [2], 2, None), ("n", [2], 2, None)],
        schema)
    both = first.unionByName(
        spark.createDataFrame([("b", [3], 3, "s2")], schema))
    ck_suite = [Check("u", "unique", {"key": "doc_id"}),
                Check("stats", "column_stats", {"value_col": "n_tok"})]
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    run_with_checkpoint(first, ck_suite, store)       # s1 + NULL now done
    res = run_with_checkpoint(both, ck_suite, store)  # only s2 pending
    oneshot = run_checks(both, ck_suite)

    def norm(df):
        return sorted(
            ((r["partition_id"], r["check_id"], r["passed"],
              r["n_violations"], r["rows_scanned"])
             for r in df.collect()),
            key=lambda t: tuple("" if x is None else str(x) for x in t))

    assert norm(res.verdicts) == norm(oneshot.verdicts)
    assert {r["partition_id"] for r in res.verdicts.collect()} == \
        {"s1", "s2", None}
