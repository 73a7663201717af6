"""Check-suite engine: verdicts + violations on the synthesized sequence table.

The fixture defects are injected deterministically (sources/sequences.py), so
expected violation sets are derivable independently — the reference's
golden-verdict test pattern (tests/test_detector_all.py:20-53).
"""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.sources.sequences import (
    synthesize_sequences, load_sequences,
    DUP_MOD, BAD_SOURCE_MOD, BAD_NTOK_MOD, BAD_SOURCE,
)
from pyanomalydetector_spark.checks.core import Check, run_checks, default_suite


@pytest.fixture(scope="module")
def seq(spark, sf_dir):
    return load_sequences(spark, sf_dir).persist()


@pytest.fixture(scope="module")
def doc_ids(sf_dir):
    path = synthesize_sequences(sf_dir)
    t = pq.read_table(path, columns=["doc_id"])
    ids = [int(d.split("-")[1]) for d in t.column("doc_id").to_pylist()]
    return sorted(set(ids))


def test_unique_check_finds_injected_dups(spark, seq, doc_ids):
    res = run_checks(seq, [Check("uniq", "unique", {"key": "doc_id"})])
    viols = {r["doc_id"] for r in res.violations.collect()}
    expected = {f"doc-{d:08d}" for d in doc_ids if d % DUP_MOD == 0}
    assert viols == expected
    verd = res.verdicts.collect()
    failed = {r["partition_id"] for r in verd if not r["passed"]}
    assert failed  # at least one partition has dups
    # every partition got exactly one verdict row
    assert len(verd) == len({r["partition_id"] for r in verd})


def test_referential_check(spark, seq, doc_ids):
    allowed = sorted({r["source"] for r in seq.select("source").distinct().collect()
                      if r["source"] != BAD_SOURCE})
    res = run_checks(seq, [Check("ref", "referential",
                                 {"column": "source", "allowed": allowed})])
    viols = {r["doc_id"] for r in res.violations.collect()}
    expected = {f"doc-{d:08d}" for d in doc_ids if d % BAD_SOURCE_MOD == 0}
    assert viols == expected
    bad_verdict = [r for r in res.verdicts.collect() if not r["passed"]]
    assert {r["partition_id"] for r in bad_verdict} == ({BAD_SOURCE} if expected else set())


def test_ntok_consistency_check(spark, seq, doc_ids):
    res = run_checks(seq, [Check("ntok", "n_tok_consistency", {})])
    viols = {r["doc_id"] for r in res.violations.collect()}
    expected = {f"doc-{d:08d}" for d in doc_ids if d % BAD_NTOK_MOD == 0}
    assert viols == expected


def test_token_invariant_detects_mutation(spark, seq):
    clean = run_checks(seq, [Check("tok", "token_invariant", {"expected": seq})])
    assert clean.violations.count() == 0
    assert all(r["passed"] for r in clean.verdicts.collect())

    # mutate one document's tokens → exactly that doc flagged
    mutated = seq.withColumn(
        "tokens",
        F.when(F.col("doc_id") == "doc-00000001",
               F.concat(F.col("tokens"), F.array(F.lit(999))))
         .otherwise(F.col("tokens")))
    res = run_checks(mutated, [Check("tok", "token_invariant", {"expected": seq})])
    viols = [r["doc_id"] for r in res.violations.collect()]
    assert viols == ["doc-00000001"]


def test_zscore_threshold_verdict_semantics(spark):
    # partition "hot" has mean shifted far beyond λ·σ of the pinned baseline
    rows = [("doc-%d" % i, [1, 2], 2, "calm") for i in range(50)]
    rows += [("doc-h%d" % i, [1] * 40, 40, "hot") for i in range(50)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    base = spark.createDataFrame([(2.0, 1.0)], "mean double, std double")
    res = run_checks(df, [Check("z", "zscore_threshold",
                                {"value_col": "n_tok", "lambda": 3.0,
                                 "ignore_diff_rate": 0.1, "baseline": base})])
    verd = {r["partition_id"]: r["passed"] for r in res.verdicts.collect()}
    assert verd == {"calm": True, "hot": False}
    # row-level violations only from the failing partition
    parts = {r["partition_id"] for r in res.violations.collect()}
    assert parts == {"hot"}


def test_default_suite_runs_end_to_end(spark, seq):
    allowed = sorted({r["source"] for r in seq.select("source").distinct().collect()
                      if r["source"] != BAD_SOURCE})
    res = run_checks(seq, default_suite(allowed))
    verd = res.verdicts.collect()
    check_ids = {r["check_id"] for r in verd}
    assert check_ids == {"column_stats_n_tok", "zscore_n_tok", "unique_doc_id",
                         "referential_source", "n_tok_consistency",
                         "drift_psi_n_tok", "drift_ks_n_tok"}
    assert res.violations.count() > 0


def test_suite_on_empty_input(spark):
    """Robustness: the whole suite on a 0-row table must produce empty,
    well-typed verdict/violation frames — not crash (a real failure mode
    when a partition filter matches nothing on resume)."""
    empty = spark.createDataFrame(
        [], "doc_id string, tokens array<int>, n_tok int, source string")
    res = run_checks(empty, default_suite(["src0"]))
    assert res.verdicts.count() == 0
    assert res.violations.count() == 0
    assert "partition_id" in res.verdicts.columns


def test_jsonl_source_equals_parquet_source(spark, sf_dir):
    """The JSON-lines ingest path must be row-identical to the parquet path
    (explicit schema, no inference)."""
    from pyanomalydetector_spark.sources.sequences import load_sequences_jsonl
    a = sorted((r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
               for r in load_sequences(spark, sf_dir).collect())
    b = sorted((r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
               for r in load_sequences_jsonl(spark, sf_dir).collect())
    assert a == b


def test_psi_low_cardinality_route_equals_two_pass(spark, seq):
    """The one-scan value-counts PSI route (for structurally bounded columns
    like token length) must produce the same statistic as the default
    two-pass fixed-width path — bucketing values then summing their counts
    is algebraically identical to bucketing rows."""
    from pyanomalydetector_spark.checks.drift import psi_by_partition
    a = {r["partition_id"]: r["psi"]
         for r in psi_by_partition(seq, "source", "n_tok").collect()}
    b = {r["partition_id"]: r["psi"]
         for r in psi_by_partition(seq, "source", "n_tok",
                                   low_cardinality=True).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12), k


def test_ks_cardinality_guard_bins_continuous_columns(spark, seq):
    """Pointing KS at a continuous double column must not build a
    #distinct ≈ #rows grid: above max_grid_values the values re-bin into
    fixed-width bins derived from the cached counts (no raw re-scan), and
    the binned statistic stays close to the exact one (histogram
    approximation, error bounded by per-bin mass)."""
    from pyanomalydetector_spark.checks.drift import ks_by_partition
    # deterministic "continuous" column: n_tok + hash-derived fraction →
    # essentially every row a distinct double
    cont = seq.withColumn(
        "x", F.col("n_tok")
             + F.pmod(F.xxhash64("doc_id"), F.lit(100_000)) / 100_000.0)
    exact = {r["partition_id"]: r["ks_d"]
             for r in ks_by_partition(cont, "source", "x").collect()}
    binned = {r["partition_id"]: r["ks_d"]
              for r in ks_by_partition(cont, "source", "x",
                                       max_grid_values=50,
                                       n_fallback_bins=256).collect()}
    assert exact.keys() == binned.keys()
    for k in exact:
        assert 0.0 <= binned[k] <= 1.0
        # 256 bins over this range keep the histogram close to exact
        assert abs(exact[k] - binned[k]) < 0.1, k

    # NULL values must drop out of the binned path exactly as they do in
    # the unbinned one (least/greatest skip nulls — a naive bin expression
    # would sweep null mass into the top bin)
    cont_n = cont.withColumn(
        "x", F.when(F.pmod(F.xxhash64("doc_id"), F.lit(5)) == 0,
                    F.lit(None).cast("double")).otherwise(F.col("x")))
    e2 = {r["partition_id"]: r["ks_d"]
          for r in ks_by_partition(cont_n, "source", "x").collect()}
    b2 = {r["partition_id"]: r["ks_d"]
          for r in ks_by_partition(cont_n, "source", "x", max_grid_values=50,
                                   n_fallback_bins=256).collect()}
    for k in e2:
        assert abs(e2[k] - b2[k]) < 0.1, k

    # explicit-baseline side must trip the guard too: a continuous
    # high-cardinality baseline would otherwise rebuild the degenerate grid
    bl = {r["partition_id"]: r["ks_d"]
          for r in ks_by_partition(cont, "source", "x", baseline=cont,
                                   max_grid_values=50,
                                   n_fallback_bins=256).collect()}
    for k in exact:
        # baseline == the same rows ⇒ same statistic as self-baseline
        assert abs(exact[k] - bl[k]) < 0.1, k


def test_ks_bounded_single_plan_equals_grid(spark, seq):
    """``bounded=True`` (self-baseline) routes KS through the fully-lazy
    single linear plan — no dense grid, no persist, no blocking guard job.
    Its left/right-limit candidate evaluation must reproduce the dense-grid
    maximum bit-for-bit (same long/long→double arithmetic on the same
    integer cumulative sums), and ``include_rows`` must count NULL-value
    rows exactly like a raw count(*) per partition."""
    from pyanomalydetector_spark.checks.drift import ks_by_partition

    a = {r["partition_id"]: r["ks_d"]
         for r in ks_by_partition(seq, "source", "n_tok").collect()}
    b = {r["partition_id"]: (r["ks_d"], r["rows_scanned"])
         for r in ks_by_partition(seq, "source", "n_tok", bounded=True,
                                  include_rows=True).collect()}
    raw_rows = {r["source"]: r["cnt"]
                for r in seq.groupBy("source")
                            .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k][0], k          # bit-identical, not approx
        assert b[k][1] == raw_rows[k], k

    # NULL values carry no mass in the statistic but DO count in
    # rows_scanned — identical to the grid path + raw count
    seq_n = seq.withColumn(
        "n_tok", F.when(F.pmod(F.xxhash64("doc_id"), F.lit(7)) == 0,
                        F.lit(None).cast("int")).otherwise(F.col("n_tok")))
    e = {r["partition_id"]: r["ks_d"]
         for r in ks_by_partition(seq_n, "source", "n_tok").collect()}
    g = {r["partition_id"]: (r["ks_d"], r["rows_scanned"])
         for r in ks_by_partition(seq_n, "source", "n_tok", bounded=True,
                                  include_rows=True).collect()}
    assert e.keys() == g.keys()
    for k in e:
        assert e[k] == g[k][0], k
        assert g[k][1] == raw_rows[k], k


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_ks_bounded_matches_numpy_ecdf(spark, seed):
    """Semantic pin, independent of the grid implementation: the bounded KS
    statistic equals the textbook two-sample KS-D — max over the combined
    support of |ECDF_partition − ECDF_pooled| — computed with numpy on
    deterministic hash-synthesized fixtures (varying partition counts,
    duplicated values, integer supports with gaps)."""
    import hashlib
    import numpy as np
    from pyanomalydetector_spark.checks.drift import ks_by_partition

    def h(i: int) -> int:
        return int.from_bytes(
            hashlib.md5(f"{seed}:{i}".encode()).digest()[:4], "big")

    n = 400 + seed * 137
    rows = [(f"p{h(i) % (2 + seed)}", (h(i) >> 8) % (5 + 7 * seed))
            for i in range(n)]
    df = spark.createDataFrame(rows, "source string, n_tok int")

    got = {r["partition_id"]: r["ks_d"]
           for r in ks_by_partition(df, "source", "n_tok",
                                    bounded=True).collect()}

    pooled = np.sort(np.array([v for _, v in rows], dtype=float))
    support = np.unique(pooled)
    cdf_b = np.searchsorted(pooled, support, side="right") / len(pooled)
    for part in {p for p, _ in rows}:
        xs = np.sort(np.array([v for p, v in rows if p == part], dtype=float))
        cdf_p = np.searchsorted(xs, support, side="right") / len(xs)
        want = float(np.max(np.abs(cdf_p - cdf_b)))
        assert got[part] == pytest.approx(want, abs=1e-12), (part, seed)


def test_materialize_counts_match_sequential(spark, seq):
    """CheckResult.materialize() (parallel counts after eager cache
    materialization) must agree with plain sequential counts."""
    allowed = sorted({r["source"] for r in seq.select("source").distinct()
                     .collect() if r["source"] != BAD_SOURCE})
    res = run_checks(seq, default_suite(allowed))
    n_v, n_viol = res.materialize()
    assert n_v == res.verdicts.count()
    assert n_viol == res.violations.count()
    res.unpersist()


def test_results_invariant_under_shuffle_partitioning(spark, seq):
    """Distributed-correctness property: verdicts must be identical at any
    shuffle-partition count (hash/order-sensitivity bugs surface here)."""
    suite = [Check("uniq", "unique", {"key": "doc_id"}),
             Check("z", "zscore_threshold",
                   {"value_col": "n_tok", "lambda": 2.0,
                    "ignore_diff_rate": 0.1}),
             Check("psi", "drift_psi", {"value_col": "n_tok"}),
             Check("ks", "drift_ks", {"value_col": "n_tok"})]

    def run_at(n):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        try:
            res = run_checks(seq, suite)
            return sorted(
                (r["partition_id"], r["check_id"], r["passed"],
                 round(r["observed"], 9), r["n_violations"])
                for r in res.verdicts.collect())
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    assert run_at(3) == run_at(17)


def test_token_invariant_corrupted_duplicate_not_masked(spark):
    """A corrupted DUPLICATE row must be flagged even when a clean copy of
    the same doc_id exists in the partition (min+max digest comparison +
    all-copies exact confirm)."""
    schema = "doc_id string, tokens array<int>, n_tok int, source string"
    snapshot = spark.createDataFrame(
        [("d1", [5, 6, 7], 3, "s1"), ("d2", [9, 9], 2, "s1")], schema)
    observed = spark.createDataFrame(
        [("d1", [5, 6, 7], 3, "s1"),     # clean copy
         ("d1", [1], 1, "s1"),           # corrupted duplicate
         ("d2", [9, 9], 2, "s1")], schema)
    res = run_checks(observed,
                     [Check("tok", "token_invariant", {"expected": snapshot})])
    bad = {r["doc_id"] for r in res.violations.collect()}
    assert bad == {"d1"}
    v = res.verdicts.collect()[0]
    assert not v["passed"] and v["n_violations"] == 1


_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _null_partition_fixture(spark):
    """A NULL partition key carrying one violation of every row-level kind:
    exactly the dirty group key a quality engine must still score."""
    return spark.createDataFrame(
        [
            ("a1", [1, 2], 2, "s1"),
            ("a2", [3], 1, "s1"),
            ("n1", [1, 2, 3], 3, None),
            ("n1", [1, 2, 3], 3, None),      # duplicate doc_id
            ("n2", [4, 5], 99, None),        # n_tok mismatch
            ("n3", [6], 1, None),
        ],
        _SCHEMA)


def test_null_partition_scored_not_dropped(spark):
    """Every check must emit a verdict row for the NULL partition with
    correct counts, and attribute its row-level violations to it — and the
    fused path must agree with the per-check path on that fixture."""
    df = _null_partition_fixture(spark)
    suite = [
        Check("uniq", "unique", {"key": "doc_id"}),
        Check("ref", "referential", {"column": "source", "allowed": ["s1"]}),
        Check("ntok", "n_tok_consistency", {}),
        Check("z", "zscore_threshold",
              {"value_col": "n_tok", "lambda": 0.5, "ignore_diff_rate": 0.0,
               "baseline_scalars": {"mean": 2.0, "std": 1.0}}),
        Check("psi", "drift_psi", {"value_col": "n_tok"}),
        Check("ks", "drift_ks", {"value_col": "n_tok"}),
    ]

    def _key(t):
        return tuple("" if x is None else str(x) for x in t)

    def snap(res):
        v = sorted(((r["partition_id"], r["check_id"], r["passed"],
                     round(r["observed"], 9), r["n_violations"],
                     r["rows_scanned"])
                    for r in res.verdicts.collect()), key=_key)
        w = sorted(((r["partition_id"], r["check_id"], r["doc_id"])
                    for r in res.violations.collect()), key=_key)
        return v, w

    fused = snap(run_checks(df, suite, fuse=True))
    percheck = snap(run_checks(df, suite, fuse=False))
    assert fused == percheck

    verdicts = {(r[0], r[1]): r for r in fused[0]}
    # a verdict row exists for the NULL partition under every check
    for cid in ("uniq", "ref", "ntok", "z", "psi", "ks"):
        assert (None, cid) in verdicts, cid
    # exact counts: 1 duplicate key, 4 referentially-bad rows, 1 n_tok bad
    assert verdicts[(None, "uniq")][4] == 1
    assert verdicts[(None, "ref")][4] == 4 and not verdicts[(None, "ref")][2]
    assert verdicts[(None, "ntok")][4] == 1
    # drift statistics are REAL numbers for the NULL partition (a plain
    # equi-join in the grid would zero its counts into NaN/garbage)
    import math
    assert math.isfinite(verdicts[(None, "psi")][3])
    assert math.isfinite(verdicts[(None, "ks")][3])
    assert verdicts[(None, "ks")][5] == 4      # rows_scanned incl. NULL pid
    # row-level violations attribute to the NULL partition
    viols = fused[1]
    assert (None, "uniq", "n1") in viols
    assert (None, "ntok", "n2") in viols
    assert {d for p, c, d in viols if c == "ref" and p is None} == \
        {"n1", "n2", "n3"}
    # zscore: every NULL-partition row deviates >0.5 from the pinned mean 2
    assert {d for p, c, d in viols if c == "z" and p is None} == \
        {"n1", "n2", "n3"}


def test_bounded_ks_eq_grid_ks_with_null_partition(spark):
    """bounded=True (single-plan) and bounded=False (grid) KS must agree —
    including on a NULL partition key, which the window-based bounded route
    groups natively and the grid route must not silently zero out."""
    from pyanomalydetector_spark.checks.drift import ks_by_partition
    df = _null_partition_fixture(spark)

    def snap(bounded):
        out = ks_by_partition(df, "source", "n_tok", bounded=bounded,
                              include_rows=True)
        return sorted(((r["partition_id"], round(r["ks_d"], 9),
                        r["rows_scanned"]) for r in out.collect()),
                      key=lambda t: ("" if t[0] is None else t[0],))

    assert snap(True) == snap(False)
    assert len(snap(True)) == 2        # s1 + the NULL partition


def test_ks_massless_sides_score_nan_not_null(spark):
    """Either mass-less KS side must score NaN (→ fail), never NULL.

    A NULL ks_d would make the verdict ``NULL <= threshold`` = NULL —
    silently neither pass nor fail, dropped by any passed/~passed filter.
    Three shapes, all hit in real pipelines via the checkpoint store
    (plans/checkpoint.py:315 pins the NULL-v group of an all-NULL column):
    (a) pinned counts route, all-NULL-value partition next to healthy ones;
    (b) pinned counts route, baseline captured from an all-NULL column
        (only the NULL-v group → zero grid mass) over healthy data;
    (c) grid route, explicit all-NULL baseline frame over healthy data.
    """
    import math
    from pyanomalydetector_spark.checks.drift import (
        ks_by_partition, ks_by_partition_counts)

    healthy = spark.createDataFrame(
        [("s1", 10), ("s1", 12), ("s2", 11), ("s2", 14)],
        "source string, n_tok int")
    island = healthy.union(spark.createDataFrame(
        [("s3", None), ("s3", None)], "source string, n_tok int"))

    def assert_nan(x, label):
        assert x is not None and math.isnan(x), (label, x)

    # (a) healthy pinned baseline, one all-NULL partition
    pinned = healthy.select(F.col("n_tok").cast("double").alias("v")) \
                    .groupBy("v").agg(F.count(F.lit(1)).alias("c_b"))
    out_a = {r["partition_id"]: r["ks_d"]
             for r in ks_by_partition_counts(
                 island, "source", "n_tok", pinned).collect()}
    assert_nan(out_a["s3"], "a:s3")
    assert not math.isnan(out_a["s1"]) and not math.isnan(out_a["s2"])

    # (b) pinned counts from an all-NULL column: only the NULL-v group,
    # which the grid's equi-join skips → zero baseline mass everywhere
    null_pin = spark.createDataFrame(
        [(None, 7)], "v double, c_b bigint")
    out_b = {r["partition_id"]: r["ks_d"]
             for r in ks_by_partition_counts(
                 healthy, "source", "n_tok", null_pin).collect()}
    for pid, v in out_b.items():
        assert_nan(v, f"b:{pid}")

    # (c) grid route with an explicit all-NULL baseline frame
    all_null = spark.createDataFrame(
        [("s1", None), ("s2", None)], "source string, n_tok int")
    out_c = {r["partition_id"]: r["ks_d"]
             for r in ks_by_partition(
                 healthy, "source", "n_tok", baseline=all_null).collect()}
    for pid, v in out_c.items():
        assert_nan(v, f"c:{pid}")


def test_token_invariant_null_partition(spark):
    df = _null_partition_fixture(spark)
    snapshot = df.dropDuplicates(["doc_id"]).withColumn(
        "tokens",
        F.when(F.col("doc_id") == "n2", F.array(F.lit(-1)))
         .otherwise(F.col("tokens")))
    res = run_checks(df, [Check("tok", "token_invariant",
                                {"expected": snapshot})])
    verd = {r["partition_id"]: r for r in res.verdicts.collect()}
    assert None in verd and not verd[None]["passed"]
    assert verd[None]["n_violations"] == 1
    assert verd["s1"]["passed"]
    viols = [(r["partition_id"], r["doc_id"])
             for r in res.violations.collect()]
    assert viols == [(None, "n2")]


def test_unique_max_dup_emit_caps_rows_not_verdict(spark):
    """n_violations stays EXACT while the emitted duplicate rows are capped
    at max_dup_emit per partition, worst (highest copy-count) first."""
    rows = [(f"d{i}", [1], 1, "s") for i in range(5) for _ in range(i + 2)]
    df = spark.createDataFrame(rows, _SCHEMA)
    res = run_checks(df, [Check("u", "unique",
                                {"key": "doc_id", "max_dup_emit": 2})])
    v = res.verdicts.collect()[0]
    assert not v["passed"] and v["n_violations"] == 5
    viols = res.violations.collect()
    assert len(viols) == 2
    # d4 has 6 copies, d3 has 5 — the worst offenders are the ones emitted
    assert {r["doc_id"] for r in viols} == {"d4", "d3"}


def test_token_invariant_heavy_divergence_exact_counts(spark):
    """A wildly divergent snapshot (EVERY doc mismatching) must produce
    exact per-partition counts and stream every violation row — the dirty
    path may not assume the candidate set is small."""
    obs = spark.createDataFrame(
        [(f"d{i:03d}", [i], 1, f"s{i % 2}") for i in range(50)], _SCHEMA)
    snap = obs.withColumn("tokens", F.array(F.lit(-1)))
    res = run_checks(obs, [Check("tok", "token_invariant",
                                 {"expected": snap})])
    verd = {r["partition_id"]: r for r in res.verdicts.collect()}
    assert verd["s0"]["n_violations"] == 25 and not verd["s0"]["passed"]
    assert verd["s1"]["n_violations"] == 25
    assert res.violations.count() == 50


def test_token_invariant_conflicting_snapshot_duplicates_canonical(spark):
    """When the snapshot holds CONFLICTING duplicates of one doc_id, the
    canonical (min-hash) variant is the truth: an observed row that
    byte-equals it must pass — independent min(hash)/min(len) aggregates
    could mix fields of two variants and fabricate a mismatch."""
    t1, t2 = [5, 6, 7], [9, 9]
    h = {r["k"]: r["h"] for r in
         spark.createDataFrame([("t1", t1), ("t2", t2)],
                               "k string, v array<int>")
              .select("k", F.xxhash64("v").alias("h")).collect()}
    canon = t1 if h["t1"] < h["t2"] else t2
    other = t2 if canon is t1 else t1
    snapshot = spark.createDataFrame(
        [("d", t1, len(t1), "s"), ("d", t2, len(t2), "s")], _SCHEMA)
    observed = spark.createDataFrame(
        [("d", canon, len(canon), "s")], _SCHEMA)
    res = run_checks(observed, [Check("tok", "token_invariant",
                                      {"expected": snapshot})])
    assert res.violations.count() == 0
    assert all(r["passed"] for r in res.verdicts.collect())
    # and the non-canonical variant IS flagged
    res2 = run_checks(
        spark.createDataFrame([("d", other, len(other), "s")], _SCHEMA),
        [Check("tok", "token_invariant", {"expected": snapshot})])
    assert res2.violations.count() == 1


def test_unique_digest_prefilter_equals_direct(spark, seq):
    """The opt-in digest-prefilter unique route must produce EXACTLY the
    direct aggregation's outputs — verdicts (n_keys/n_dup_keys/
    rows_scanned all exact despite the 8-byte digest shuffle) and the
    capped duplicate lists — on the fixture with injected dups and on a
    NULL-partition/NULL-key frame."""
    direct = run_checks(seq, [Check("u", "unique", {"key": "doc_id"})])
    digest = run_checks(seq, [Check("u", "unique",
                                    {"key": "doc_id",
                                     "digest_prefilter": True})])
    as_set = lambda df: {tuple(r) for r in df.collect()}
    assert as_set(digest.verdicts) == as_set(direct.verdicts)
    assert as_set(digest.violations) == as_set(direct.violations)

    # NULL partition and NULL key rows must group/attach identically
    rows = [("k1", [1], 1, None), ("k1", [1], 1, None),
            (None, [1], 1, None), (None, [1], 1, None),
            ("k2", [1], 1, "s0"), ("k2", [1], 1, "s0"), ("k3", [1], 1, "s0")]
    df = spark.createDataFrame(rows, _SCHEMA)
    d1 = run_checks(df, [Check("u", "unique", {"key": "doc_id"})])
    d2 = run_checks(df, [Check("u", "unique", {"key": "doc_id",
                                               "digest_prefilter": True})])
    assert as_set(d2.verdicts) == as_set(d1.verdicts)
    assert as_set(d2.violations) == as_set(d1.violations)

    # scalar internals too (n_keys is not surfaced by the verdict):
    from pyanomalydetector_spark.checks.core import (
        _unique_per_part, _unique_per_part_digest)
    a = _unique_per_part(df, "doc_id", "source") \
        .select("partition_id", "n_keys", "n_dup_keys", "rows_scanned")
    b = _unique_per_part_digest(df, "doc_id", "source") \
        .select("partition_id", "n_keys", "n_dup_keys", "rows_scanned")
    assert as_set(a) == as_set(b)

    with pytest.raises(ValueError, match="mutually exclusive"):
        run_checks(df, [Check("u", "unique",
                              {"key": "doc_id", "digest_prefilter": True,
                               "salt_buckets": 4})])


def test_ntok_consistency_null_metadata_is_a_violation(spark):
    """NULL-safety of the metadata invariant: a row where one side is NULL
    and the other isn't CONTRADICTS n_tok == size(tokens) and must count
    (pre-fix, `!=` evaluated to NULL and the row silently PASSED). NULL on
    both sides is consistent. Pinned on both execution paths — the fused
    twin shares the predicate."""
    df = spark.createDataFrame(
        [("a", [1, 2], 2, "s1"),       # consistent
         ("b", [1, 2], None, "s1"),    # NULL declared count → violation
         ("c", None, 5, "s1"),         # NULL tokens, declared 5 → violation
         ("d", None, None, "s1"),      # both absent → consistent
         ("e", [1], 9, "s2")],         # plain mismatch → violation
        "doc_id string, tokens array<int>, n_tok int, source string")
    for fuse in (False, True):
        checks = [Check("ntok", "n_tok_consistency", {})]
        if fuse:   # fusion needs a second fusible check to engage
            checks.append(Check("stats", "column_stats", {"value_col": "n_tok"}))
        res = run_checks(df, checks, fuse=fuse)
        viols = {r["doc_id"] for r in res.violations.collect()
                 if r["check_id"] == "ntok"}
        assert viols == {"b", "c", "e"}, f"fuse={fuse}: {viols}"
        verd = {r["partition_id"]: r for r in res.verdicts.collect()
                if r["check_id"] == "ntok"}
        assert verd["s1"]["n_violations"] == 2 and not verd["s1"]["passed"]
        assert verd["s2"]["n_violations"] == 1 and not verd["s2"]["passed"]
        res.unpersist()


def test_salted_unique_is_key_generic(spark):
    """The salted uniqueness path must work on ANY frame with the named
    key (pre-fix it hashed a hard-coded n_tok column into the salt and
    crashed on frames without one); salted ≡ unsalted output."""
    df = spark.createDataFrame(
        [("e1", "s1"), ("e1", "s1"), ("e2", "s1"), ("e3", "s2"), ("e3", "s2")],
        "event_id string, source string")
    salted = run_checks(df, [Check("u", "unique",
                                   {"key": "event_id", "salt_buckets": 8})])
    plain = run_checks(df, [Check("u", "unique", {"key": "event_id"})])
    key = lambda res: sorted(
        (r["partition_id"], r["passed"], r["observed"], r["n_violations"])
        for r in res.verdicts.collect())
    assert key(salted) == key(plain)
    assert {r["doc_id"] for r in salted.violations.collect()} == \
           {r["doc_id"] for r in plain.violations.collect()} == {"e1", "e3"}
    salted.unpersist(); plain.unpersist()


def test_token_range_semantics_both_routes(spark):
    """token_range: NULL array passes, NULL element violates, out-of-range
    (either side) violates; the violation row carries the FIRST offending
    element ('NULL' for a NULL element). Pinned identically on the
    per-check and the fused route."""
    df = spark.createDataFrame(
        [("a", [1, 2, 3], 3, "s1"),      # in range → pass
         ("b", [1, None, 3], 3, "s1"),   # NULL element → violation ('NULL')
         ("c", [1, 900, 3], 3, "s2"),    # above max → violation ('900')
         ("d", None, None, "s2"),        # NULL array → pass
         ("e", [], 0, "s2"),             # empty array → pass
         ("f", [-5, 900], 2, None)],     # NULL partition; first bad is -5
        "doc_id string, tokens array<int>, n_tok int, source string")
    for fuse in (False, True):
        checks = [Check("tr", "token_range", {"max_value": 800})]
        if fuse:   # fusion needs a second fusible check to engage
            checks.append(Check("stats", "column_stats", {"value_col": "n_tok"}))
        res = run_checks(df, checks, fuse=fuse)
        viols = {(r["doc_id"], r["observed"], r["expected"])
                 for r in res.violations.collect() if r["check_id"] == "tr"}
        assert viols == {("b", "NULL", "token id in [0, 800)"),
                         ("c", "900", "token id in [0, 800)"),
                         ("f", "-5", "token id in [0, 800)")}, \
            f"fuse={fuse}: {viols}"
        verd = {r["partition_id"]: r for r in res.verdicts.collect()
                if r["check_id"] == "tr"}
        assert verd["s1"]["n_violations"] == 1 and not verd["s1"]["passed"]
        assert verd["s2"]["n_violations"] == 1 and verd["s2"]["rows_scanned"] == 3
        assert verd[None]["n_violations"] == 1      # NULL partition kept
        res.unpersist()


def test_token_range_min_bound_and_all_pass(spark):
    """min_value cuts the low end; a fully in-range table passes with zero
    violation rows and per-partition rows_scanned intact."""
    df = spark.createDataFrame(
        [("a", [10, 20], 2, "s1"), ("b", [5, 30], 2, "s1"),
         ("c", [10], 1, "s2")],
        "doc_id string, tokens array<int>, n_tok int, source string")
    res = run_checks(df, [Check("tr", "token_range",
                                {"min_value": 8, "max_value": 100})])
    viols = {(r["doc_id"], r["observed"]) for r in res.violations.collect()}
    assert viols == {("b", "5")}
    res.unpersist()
    ok = run_checks(df, [Check("tr", "token_range",
                               {"min_value": 0, "max_value": 100})])
    assert ok.violations.count() == 0
    verd = {r["partition_id"]: r for r in ok.verdicts.collect()}
    assert verd["s1"]["passed"] and verd["s1"]["rows_scanned"] == 2
    assert verd["s2"]["passed"] and verd["s2"]["rows_scanned"] == 1
    ok.unpersist()
