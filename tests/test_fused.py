"""Fused check execution ≡ per-check execution (checks/fused.py contract)."""

import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.sources.sequences import load_sequences
from pyanomalydetector_spark.checks.core import Check, run_checks, default_suite


@pytest.fixture(scope="module")
def seq(spark, sf_dir):
    return load_sequences(spark, sf_dir).persist()


def _allowed(seq):
    return sorted(r["source"] for r in seq.select("source").distinct()
                  .filter(F.col("source").rlike("^src[0-9]+$")).collect())


def _norm_verdicts(df):
    return sorted(
        (r["partition_id"], r["check_id"], r["passed"],
         round(r["observed"], 6) if r["observed"] is not None else None,
         round(r["expected"], 6) if r["expected"] is not None else None,
         round(r["threshold"], 6) if r["threshold"] is not None else None,
         r["n_violations"], r["rows_scanned"])
        for r in df.collect())


def _norm_violations(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_equals_per_check(seq):
    suite = default_suite(_allowed(seq))
    fused = run_checks(seq, suite, fuse=True)
    plain = run_checks(seq, suite, fuse=False)
    assert _norm_verdicts(fused.verdicts) == _norm_verdicts(plain.verdicts)
    assert _norm_violations(fused.violations) == _norm_violations(plain.violations)


def test_fused_zscore_failing_partition_emits_row_violations(seq):
    # force a failure: tiny lambda so every partition's mean deviates
    suite = [Check("z", "zscore_threshold",
                   {"value_col": "n_tok", "lambda": 0.01,
                    "ignore_diff_rate": 0.0}),
             Check("stats", "column_stats", {"value_col": "n_tok"})]
    fused = run_checks(seq, suite, fuse=True)
    plain = run_checks(seq, suite, fuse=False)
    assert _norm_violations(fused.violations) == _norm_violations(plain.violations)
    assert fused.violations.count() > 0


def test_unique_salted_equals_direct(seq):
    from pyanomalydetector_spark.checks.core import Check, run_checks
    direct = run_checks(seq, [Check("u", "unique", {"key": "doc_id"})])
    salted = run_checks(seq, [Check("u", "unique",
                                    {"key": "doc_id", "salt_buckets": 8})])
    assert _norm_verdicts(direct.verdicts) == _norm_verdicts(salted.verdicts)
    assert _norm_violations(direct.violations) == _norm_violations(salted.violations)


def test_fused_eq_per_check_all_null_value_partition(spark):
    """A partition whose value column is entirely NULL gets NO column_stats/
    zscore verdict row on the per-check path (finalize_mean_std drops
    cnt==0); the fused path must agree instead of emitting a scrubbed-to-0
    row."""
    df = spark.createDataFrame(
        [("a", [1], 1, "s1"), ("b", [2], 2, "s1"),
         ("c", [3], None, "s2"), ("d", [4], None, "s2")],
        "doc_id string, tokens array<int>, n_tok int, source string")
    suite = [Check("stats", "column_stats", {"value_col": "n_tok"}),
             Check("z", "zscore_threshold",
                   {"value_col": "n_tok", "lambda": 0.5,
                    "ignore_diff_rate": 0.0})]
    fused = run_checks(df, suite, fuse=True)
    plain = run_checks(df, suite, fuse=False)
    assert _norm_verdicts(fused.verdicts) == _norm_verdicts(plain.verdicts)
    assert _norm_violations(fused.violations) == _norm_violations(plain.violations)
    assert {r["partition_id"] for r in fused.verdicts.collect()} == {"s1"}


def test_fused_sql_strings_survive_quoted_identifiers(seq):
    """The fused builder emits SQL STRINGS (fused.py round-4 rewrite), so
    quote-bearing check ids and allowed-set members are an injection
    surface: a check_id like "o'brien", an allowed value with a quote, and
    a float literal that must round-trip exactly. Per-check path (Column
    DSL, no parsing) is the ground truth."""
    allowed = _allowed(seq) + ["it's-a-source", "x''y"]
    suite = [
        Check("o'brien \"stats\"", "column_stats",
              {"value_col": "n_tok", "min_count": 2}),
        Check("z; DROP TABLE--", "zscore_threshold",
              {"value_col": "n_tok", "lambda": 0.7300000000000001,
               "ignore_diff_rate": 0.1}),
        Check("ref'd", "referential", {"column": "source", "allowed": allowed}),
        Check("psi ± π", "drift_psi",
              {"value_col": "n_tok", "buckets": 7, "threshold": 0.25}),
        Check("n't", "n_tok_consistency", {}),
    ]
    fused = run_checks(seq, suite, fuse=True)
    plain = run_checks(seq, suite, fuse=False)
    assert _norm_verdicts(fused.verdicts) == _norm_verdicts(plain.verdicts)
    assert _norm_violations(fused.violations) == _norm_violations(plain.violations)
    fused.unpersist(); plain.unpersist()


def test_fused_hostile_value_col_names(seq):
    """ADVICE r04: generated aliases used to embed the raw value_col name
    (``m_{vc}_sum``, ``_lo_{vc}``) — a name with spaces/dashes failed to
    parse even though the per-check Column-DSL path accepted it. Now tags
    come from _ctag(); also pin that two names with the SAME word-character
    skeleton ("v 1" vs "v-1" → both "v1") do not collide on one moment tag."""
    df = (seq.withColumnRenamed("n_tok", "n tok ±")
             .withColumn("v 1", F.expr("`n tok ±` + 1"))
             .withColumn("v-1", F.expr("`n tok ±` * 2")))
    suite = [
        Check("stats-sp", "column_stats", {"value_col": "n tok ±",
                                           "min_count": 2}),
        Check("z-sp", "zscore_threshold",
              {"value_col": "n tok ±", "lambda": 0.7,
               "ignore_diff_rate": 0.0}),
        Check("psi-sp", "drift_psi",
              {"value_col": "n tok ±", "buckets": 5, "threshold": 0.25}),
        Check("stats-v1a", "column_stats", {"value_col": "v 1"}),
        Check("stats-v1b", "column_stats", {"value_col": "v-1"}),
        Check("z-v1a", "zscore_threshold",
              {"value_col": "v 1", "lambda": 0.5, "ignore_diff_rate": 0.0}),
        Check("z-v1b", "zscore_threshold",
              {"value_col": "v-1", "lambda": 0.5, "ignore_diff_rate": 0.0}),
    ]
    fused = run_checks(df, suite, fuse=True)
    plain = run_checks(df, suite, fuse=False)
    assert _norm_verdicts(fused.verdicts) == _norm_verdicts(plain.verdicts)
    assert _norm_violations(fused.violations) == _norm_violations(plain.violations)
    # the two skeleton-colliding columns must have produced DIFFERENT stats
    obs = {r["check_id"]: r["observed"]
           for r in fused.verdicts.collect() if r["check_id"].startswith("z-v1")}
    assert obs["z-v1a"] != obs["z-v1b"]
    fused.unpersist(); plain.unpersist()


def test_fused_constructed_tag_collision(seq):
    """The deterministic _ctag collision: a pure-word-char column literally
    named '<skel>_<md5prefix>' OF another hostile column produces _ctag's
    exact output for that column. Pre-_tag_map, both checks silently shared
    ONE set of moment aggregates (the second read the first's mean/std —
    wrong verdicts, no error). The per-suite injective map must keep them
    apart; fused ≡ per-check stays the oracle."""
    import hashlib
    evil = "v1_" + hashlib.md5(b"v 1").hexdigest()[:8]   # == _ctag("v 1")
    df = (seq.withColumn("v 1", F.expr("n_tok + 1"))
             .withColumn(evil, F.expr("CAST(n_tok * 100 AS DOUBLE)")))
    suite = [
        Check("s-sp", "column_stats", {"value_col": "v 1"}),
        Check("s-ev", "column_stats", {"value_col": evil}),
        Check("z-sp", "zscore_threshold",
              {"value_col": "v 1", "lambda": 0.5, "ignore_diff_rate": 0.0}),
        Check("z-ev", "zscore_threshold",
              {"value_col": evil, "lambda": 0.5, "ignore_diff_rate": 0.0}),
    ]
    fused = run_checks(df, suite, fuse=True)
    plain = run_checks(df, suite, fuse=False)
    assert _norm_verdicts(fused.verdicts) == _norm_verdicts(plain.verdicts)
    assert _norm_violations(fused.violations) == _norm_violations(plain.violations)
    obs = {r["check_id"]: r["observed"] for r in fused.verdicts.collect()
           if r["check_id"].startswith("z-")}
    assert obs["z-sp"] != obs["z-ev"]   # distinct columns, distinct stats
    fused.unpersist(); plain.unpersist()


def test_fused_backtick_column_name(spark):
    """A column literally named with a backtick must resolve to ITSELF:
    _bt escapes by doubling (VERDICT r04 nit — stripping rewrote a`b → ab,
    silently reading the wrong column). Hand-checked expectations because
    F.col() can't express a backtick name for the per-check ground truth."""
    df = spark.createDataFrame(
        [("a", [1], 1, "s1", 10.0, 99.0), ("b", [2], 2, "s1", 20.0, 99.0),
         ("c", [3], 3, "s2", 30.0, 99.0), ("d", [4], 4, "s2", 40.0, 99.0)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "`x``tick` double, ab double")
    # two fusible checks so the fused builder engages (fusion needs >=2)
    res = run_checks(df, [Check("bt", "column_stats",
                                {"value_col": "x`tick", "min_count": 1}),
                          Check("nt", "n_tok_consistency", {})],
                     fuse=True)
    rows = {r["partition_id"]: r for r in res.verdicts.collect()
            if r["check_id"] == "bt"}
    # the decoy column `ab` (what backtick-STRIPPING would resolve to) has
    # value 99.0 everywhere; x`tick has 2 non-null values per partition
    assert rows["s1"]["rows_scanned"] == 2 and rows["s2"]["rows_scanned"] == 2
    assert all(r["passed"] for r in rows.values())
    res.unpersist()
