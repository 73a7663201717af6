"""The declarative check suite: checks → per-partition verdicts + violations.

This is the Spark-native recast of the reference's detection cascade
(/root/reference/detect_anomalies.py:82-122): instead of imperative per-item
loops writing to Postgres, each check is a declarative DataFrame plan over the
sequence table, producing

- ``verdicts``:   one row per (partition_id, check_id) —
  ``(partition_id, check_id, passed, observed, expected, threshold,
  n_violations, rows_scanned)``
- ``violations``: one row per violating document —
  ``(partition_id, check_id, doc_id, observed, expected)``

mirroring the reference's ``anomalies`` verdict table
(/root/reference/db/sql/postgresql/create_table_anomalies.sql.j2) and per-item
filter survivors.

Check kinds and their reference lineage:

- ``column_stats``     — per-partition sufficient stats of a numeric column
  (stats.py:75-79, 130-135) with min-count gating (detector.py:192
  ``cnt > trends_min_count``).
- ``zscore_threshold`` — detect1 semantics (detector.py:211): partition mean
  deviates from baseline mean by more than λ·σ, guarded by the relative-diff
  filter (detector.py:218 — the reference has an operator-precedence bug
  there: ``mean_t > 0 & (...)`` binds as ``mean_t > (0 & (...))``; we
  implement the *intended* semantics ``mean_t > 0 AND reldiff > rate`` and
  pin that choice in tests).
- ``unique``           — doc_id uniqueness via two-phase salted aggregation
  (skew-proof groupBy; exact duplicate emission).
- ``referential``      — membership of ``source`` in an allowed dimension
  (models/anomalies.py:94-104 anti-join discipline).
- ``n_tok_consistency``— metadata invariant ``n_tok == size(tokens)``.
- ``token_range``      — token-id vocabulary bounds: every array element
  non-NULL and in ``[min_value, max_value)`` (detect1's absolute-limit
  predicate applied element-wise to the token payload).
- ``token_invariant``  — token-array byte-equality against a trusted snapshot:
  xxhash64+length prefilter, exact array compare on candidates.
- ``drift_psi`` / ``drift_ks`` — distribution drift vs pinned baseline
  (recasting detect2/3's recent-vs-historical comparisons; see drift.py).

Scale posture: every check is a groupBy/join plan whose shuffled data is
O(#partitions) or O(#violations), never O(rows) beyond the initial scan; the
uniqueness check pre-aggregates behind a salt to keep hot keys off one reducer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType, DoubleType, LongType, StringType, StructField, StructType,
)

from pyanomalydetector_spark.functions.stats import sufficient_stats, finalize_mean_std
from pyanomalydetector_spark.checks.drift import psi_by_partition, ks_by_partition

VERDICT_SCHEMA = StructType([
    StructField("partition_id", StringType()),
    StructField("check_id", StringType()),
    StructField("passed", BooleanType()),
    StructField("observed", DoubleType()),
    StructField("expected", DoubleType()),
    StructField("threshold", DoubleType()),
    StructField("n_violations", LongType()),
    StructField("rows_scanned", LongType()),
])
VIOLATION_SCHEMA = StructType([
    StructField("partition_id", StringType()),
    StructField("check_id", StringType()),
    StructField("doc_id", StringType()),
    StructField("observed", StringType()),
    StructField("expected", StringType()),
])


@dataclass(frozen=True)
class Check:
    check_id: str
    kind: str
    params: dict = field(default_factory=dict)


@dataclass
class CheckResult:
    verdicts: DataFrame
    violations: DataFrame
    # frames persisted while building the plans (fused aggregates, KS count
    # grids). Long-lived sessions (streaming micro-batches) must call
    # unpersist() once verdicts/violations are materialized, or cached frames
    # accumulate until LRU eviction.
    cached: tuple = ()

    def unpersist(self) -> None:
        for frame in self.cached:
            frame.unpersist()

    def materialize(self, parallel: bool = True) -> tuple[int, int]:
        """Count verdicts and violations; returns ``(n_verdicts, n_viols)``.

        Persisted intermediates are materialized FIRST, so the two result
        counts can then run on concurrent threads without racing an
        unmaterialized cache: two actions hitting a lazy persist at once
        each recompute the whole subtree (the documented lazy-persist
        race), whereas after eager materialization both are cache hits.
        The cached frames themselves are INDEPENDENT plans (fused
        aggregates, unique's per-partition rollup, KS grids), so their
        first counts run concurrently too — each frame is counted by
        exactly one thread, which is race-free, and the suite's heavy
        shuffles overlap instead of queueing (measured 53 s → ~44 s at
        local[4]/32M rows).
        """
        if not parallel:
            for frame in self.cached:
                frame.count()
            return self.verdicts.count(), self.violations.count()
        from concurrent.futures import ThreadPoolExecutor
        if self.cached:
            with ThreadPoolExecutor(max_workers=len(self.cached)) as ex:
                list(ex.map(lambda f: f.count(), self.cached))
        with ThreadPoolExecutor(max_workers=2) as ex:
            fv = ex.submit(self.verdicts.count)
            fw = ex.submit(self.violations.count)
            return fv.result(), fw.result()


def _empty(spark: SparkSession, schema: StructType) -> DataFrame:
    return spark.createDataFrame([], schema)


def _rows_per_partition(df: DataFrame, pcol: str) -> DataFrame:
    return df.groupBy(F.col(pcol).alias("partition_id")) \
             .agg(F.count(F.lit(1)).alias("rows_scanned"))


def _finish_verdicts(v: DataFrame) -> DataFrame:
    """Project to the uniform verdict schema (column order + types)."""
    return v.select(
        F.col("partition_id").cast("string"),
        F.col("check_id").cast("string"),
        F.col("passed").cast("boolean"),
        F.col("observed").cast("double"),
        F.col("expected").cast("double"),
        F.col("threshold").cast("double"),
        F.col("n_violations").cast("long"),
        F.col("rows_scanned").cast("long"),
    )


def _finish_violations(v: DataFrame) -> DataFrame:
    return v.select(
        F.col("partition_id").cast("string"),
        F.col("check_id").cast("string"),
        F.col("doc_id").cast("string"),
        F.col("observed").cast("string"),
        F.col("expected").cast("string"),
    )


# ---------------------------------------------------------------- checks ----

def _check_column_stats(df: DataFrame, check: Check, pcol: str) -> CheckResult:
    value_col = check.params.get("value_col", "n_tok")
    min_count = int(check.params.get("min_count", 1))

    stats = finalize_mean_std(sufficient_stats(df, [pcol], value_col)) \
        .withColumnRenamed(pcol, "partition_id")
    verdicts = stats.select(
        "partition_id",
        F.lit(check.check_id).alias("check_id"),
        (F.col("cnt") >= min_count).alias("passed"),
        F.col("cnt").cast("double").alias("observed"),
        F.lit(float(min_count)).alias("expected"),
        F.lit(float(min_count)).alias("threshold"),
        F.lit(0).alias("n_violations"),
        F.col("cnt").alias("rows_scanned"),
    )
    return CheckResult(_finish_verdicts(verdicts),
                       _empty(df.sparkSession, VIOLATION_SCHEMA))


def _check_zscore_threshold(df: DataFrame, check: Check, pcol: str) -> CheckResult:
    """detect1: partition mean vs pinned baseline mean/std with λ·σ + rel-diff.

    Row-level violations replicate _filter_anomalies (detector.py:382-404):
    within failing partitions, rows whose value exceeds baseline mean ± λ·σ.
    """
    value_col = check.params.get("value_col", "n_tok")
    lam = float(check.params.get("lambda", 2.0))
    ignore_diff_rate = float(check.params.get("ignore_diff_rate", 0.0))
    baseline = check.params.get("baseline")  # optional DataFrame(mean, std)
    scalars = check.params.get("baseline_scalars")  # pinned {mean, std}

    if scalars is not None:
        baseline = df.sparkSession.createDataFrame(
            [(float(scalars["mean"]), float(scalars["std"]))], "mean double, std double")
    elif baseline is None:
        baseline = finalize_mean_std(
            sufficient_stats(df.select(F.lit("all").alias("_g"), value_col),
                             ["_g"], value_col)).select("mean", "std")
    base = F.broadcast(baseline.select(F.col("mean").alias("mean_t"),
                                       F.col("std").alias("std_t")))

    part_means = finalize_mean_std(sufficient_stats(df, [pcol], value_col)) \
        .select(F.col(pcol).alias("partition_id"),
                F.col("mean").alias("mean_h"),
                F.col("cnt").alias("rows_scanned"))

    j = part_means.crossJoin(base)
    dev = F.abs(F.col("mean_h") - F.col("mean_t"))
    # detector.py:211 threshold; detector.py:218 *intended* rel-diff guard.
    # try_divide keeps this ANSI-safe when mean_t == 0 (NULL → fail is false).
    fail = (dev > lam * F.col("std_t")) & \
           (F.col("mean_t") > 0) & \
           (F.try_divide(dev, F.col("mean_t")) > ignore_diff_rate)
    verdicts = j.select(
        "partition_id",
        F.lit(check.check_id).alias("check_id"),
        (~fail).alias("passed"),
        F.col("mean_h").alias("observed"),
        F.col("mean_t").alias("expected"),
        (lam * F.col("std_t")).alias("threshold"),
        F.lit(0).alias("n_violations"),
        F.col("rows_scanned"),
    )

    failing = j.filter(fail).select("partition_id", "mean_t", "std_t")
    viol = (
        # NULL-SAFE: a failing NULL partition's rows must still emit
        # violations (plain equality would silently drop them)
        df.join(F.broadcast(failing), df[pcol].eqNullSafe(failing["partition_id"]))
          .filter(F.abs(F.col(value_col) - F.col("mean_t")) > lam * F.col("std_t"))
          .select(
              F.col("partition_id"),
              F.lit(check.check_id).alias("check_id"),
              F.col("doc_id"),
              F.col(value_col).cast("string").alias("observed"),
              F.concat(F.lit("within "), F.round("mean_t", 6).cast("string"),
                       F.lit(" ± "), F.round(lam * F.col("std_t"), 6).cast("string"))
               .alias("expected"),
          )
    )
    return CheckResult(_finish_verdicts(verdicts), _finish_violations(viol))


def _unique_per_part(df: DataFrame, key: str, pcol: str,
                     salt_buckets: int = 0,
                     max_dup_emit: int = 100_000) -> DataFrame:
    """Lazy per-partition uniqueness rollup: ``(partition_id, n_keys,
    n_dup_keys, rows_scanned, _dups)``.

    ``n_dup_keys`` (the verdict count) is always EXACT; ``_dups`` — the
    emitted duplicate list — is capped at ``max_dup_emit`` entries per
    partition (worst offenders first: highest copy-count, then key order).
    Web-scale corpora run 30-50 % duplicate keys, so an uncapped per-
    partition array would hold millions of structs in one aggregation
    buffer / checkpointed row; the cap bounds memory while the verdict
    still reports the true violation count.

    Kept as its own function so the plan gate in tests/test_explain_plans.py
    can assert the counts-exchange reuse on the LAZY plan (the check
    persists it, hiding the shared exchange behind an InMemoryTableScan
    from consumers).

    Considered and measured (round 4): a digest-prefilter variant (shuffle
    ``xxhash64(key)`` — 8 B — then re-scan + exact-confirm only colliding
    hash groups, the token_invariant/exact-dedup discipline). The hash
    shuffle alone is 1.6× faster (9.9 s → 6.2 s at 32M/local[32]), but the
    confirm pass needs a second full (pcol, key) scan (~3.5 s), landing at
    parity locally. On a multi-executor cluster the trade leans the other
    way (scans are node-local, shuffles are all-to-all network), so a
    deployment bottlenecked on the unique shuffle's network volume should
    revisit it; here the single-shuffle direct aggregation is kept — one
    scan, exact by construction, and the salt knob still applies.
    """
    if salt_buckets > 0:
        # the salt only needs to spread a hot key's rows across buckets;
        # monotonically_increasing_id alone is already per-row unique
        # (hashing a data column in would also crash key-generic callers
        # on frames without that column)
        salted = df.select(
            F.col(pcol).alias("partition_id"), F.col(key),
            F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                   F.lit(salt_buckets)).alias("_salt"),
        )
        partial = salted.groupBy("partition_id", key, "_salt") \
                        .agg(F.count(F.lit(1)).alias("c"))
        counts = partial.groupBy("partition_id", key).agg(F.sum("c").alias("cnt"))
    else:
        counts = df.select(F.col(pcol).alias("partition_id"), F.col(key)) \
                   .groupBy("partition_id", key) \
                   .agg(F.count(F.lit(1)).alias("cnt"))

    # ONE pass over the (large) per-key counts: the scalar rollup and the
    # duplicate list are two branches of ONE plan over the same counts
    # exchange — ReuseExchange/AQE stage reuse executes the big shuffle
    # once, the scalar branch stays whole-stage-codegen HashAggregate, and
    # the collect_list object aggregate only ever sees the cnt>1 rows
    # (bounded by #violations). Folding the collect_list into the scalar
    # rollup instead forces the WHOLE counts frame through a non-codegen
    # ObjectHashAggregate — measured 2.3× slower at 32M rows.
    scalars = counts.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("n_dup_keys"),
        F.sum("cnt").alias("rows_scanned"),
    )
    return _attach_dup_lists(scalars, counts.filter(F.col("cnt") > 1),
                             key, max_dup_emit)


def _attach_dup_lists(scalars: DataFrame, dup_rows: DataFrame, key: str,
                      max_dup_emit: int) -> DataFrame:
    """Attach the capped duplicate list to the per-partition scalar rollup.

    ``dup_rows`` is (partition_id, <key>, cnt) with cnt > 1 only — bounded
    by #violations, never the corpus. Bound the per-partition array: rank
    duplicates (worst first) and keep the top ``max_dup_emit``;
    determinism via the (cnt desc, key) order.
    """
    w_rank = Window.partitionBy("partition_id") \
                   .orderBy(F.col("cnt").desc(), F.col(key))
    dup_rows = dup_rows.withColumn("_rn", F.row_number().over(w_rank)) \
                       .filter(F.col("_rn") <= max_dup_emit).drop("_rn")
    dup_lists = dup_rows.groupBy(
        F.col("partition_id").alias("_dp")).agg(
        F.collect_list(F.struct(F.col(key).alias("k"),
                                F.col("cnt").alias("c"))).alias("_dups"))
    # left join: partitions without duplicates get _dups = NULL (explode()
    # of NULL emits no rows, same as the empty list). NULL-SAFE equality,
    # for two reasons: a NULL partition_id's duplicates must still attach
    # to its verdict row (groupBy keeps NULL as a group), and a plain
    # equi-join would let Catalyst infer isnotnull(partition_id) on the
    # dup branch only — making the two counts subtrees non-identical and
    # silently disabling the exchange reuse this split depends on.
    return scalars.join(
        dup_lists, scalars["partition_id"].eqNullSafe(dup_lists["_dp"]),
        "left").drop("_dp")


def _unique_per_part_digest(df: DataFrame, key: str, pcol: str,
                            max_dup_emit: int = 100_000) -> DataFrame:
    """Digest-prefilter uniqueness rollup — same output contract as
    :func:`_unique_per_part` (``(partition_id, n_keys, n_dup_keys,
    rows_scanned, _dups)``, all EXACT), different shuffle shape.

    Two passes: (1) shuffle only an 8-byte ``xxhash64(partition, key)``
    digest and count per digest — the big all-to-all moves 8 B/row instead
    of the full key payload (the round-4 measurement in
    :func:`_unique_per_part`'s docstring: the hash shuffle alone is 1.6×
    faster at 32M rows); (2) semi-join the scan back to the COLLIDING
    digests only and group exactly by (partition, real key) — duplicate
    counts and dup lists are exact by construction, and a 64-bit collision
    between distinct keys costs only a wasted exact-confirm row (it groups
    to cnt=1 and is dropped), never a wrong answer.

    Exactness bookkeeping for ``n_keys``: distinct digests undercount by
    one per colliding digest that holds two distinct real keys, so
    ``n_keys = (distinct digests − colliding digests) + (distinct real
    keys inside colliding digests)`` — the last two terms come from the
    confirm pass.

    The trade vs the direct aggregation, measured at 32M rows/local[32]
    (round 5, warm min-of-3): direct 5.3 s, digest 9.2 s — locally the
    shuffle is memory-speed so the payload saving buys nothing and the
    confirm re-scan is pure overhead. The digest route exists for
    network-shuffled clusters where the all-to-all is the bottleneck and
    the key is wider than its 8-byte digest (URLs, long doc ids): there
    the big shuffle's bytes drop by the key/digest width ratio and the
    confirm pass touches only colliding groups. Opt-in
    (``digest_prefilter: True``), never the default.
    """
    base = df.select(F.col(pcol).alias("partition_id"), F.col(key))
    # one digest over (partition, key): the confirm semi-join can then key
    # on the digest alone (never NULL — xxhash64 of a NULL field is the
    # seed hash), sidestepping NULL-partition equality; a cross-partition
    # digest collision only adds a wasted exact-confirm row
    hashed = base.withColumn("_ph", F.xxhash64("partition_id", F.col(key)))
    hcounts = hashed.groupBy("partition_id", "_ph") \
                    .agg(F.count(F.lit(1)).alias("cnt"))
    scalars0 = hcounts.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("_n_digests"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("_n_colliding"),
        F.sum("cnt").alias("rows_scanned"),
    )
    # the colliding set keys on (partition, digest), NULL-SAFE on the
    # partition: a digest-only semi-join could pull in a row from ANOTHER
    # partition that shares the digest by 64-bit accident, and that row
    # would inflate its own partition's n_keys via _k_distinct (its digest
    # is already counted in _n_digests)
    coll = hcounts.filter(F.col("cnt") > 1) \
                  .select(F.col("partition_id").alias("_kp"),
                          F.col("_ph").alias("_kh"))
    confirm = (hashed.join(
            coll,
            (hashed["_ph"] == coll["_kh"])
            & hashed["partition_id"].eqNullSafe(coll["_kp"]), "left_semi")
                     .groupBy("partition_id", key)
                     .agg(F.count(F.lit(1)).alias("cnt")))
    per_confirm = confirm.groupBy(F.col("partition_id").alias("_cp")).agg(
        F.count(F.lit(1)).alias("_k_distinct"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("n_dup_keys"),
    )
    scalars = (scalars0.join(
            per_confirm,
            scalars0["partition_id"].eqNullSafe(per_confirm["_cp"]), "left")
        .drop("_cp")
        .na.fill({"_k_distinct": 0, "n_dup_keys": 0})
        .select("partition_id",
                (F.col("_n_digests") - F.col("_n_colliding")
                 + F.col("_k_distinct")).alias("n_keys"),
                "n_dup_keys", "rows_scanned"))
    return _attach_dup_lists(scalars, confirm.filter(F.col("cnt") > 1),
                             key, max_dup_emit)


def _check_unique(df: DataFrame, check: Check, pcol: str) -> CheckResult:
    """Key-uniqueness check with exact duplicate emission.

    Skew analysis (north-rule): the groupBy key is (partition, doc_id) —
    high-cardinality by construction, so hash partitioning spreads it evenly,
    and a *hot duplicate key* (one doc_id with millions of copies) is
    neutralized by the hash aggregate's map-side combine: each map task emits
    one partial count per key, so the hot key's reducer receives #map-tasks
    rows, not #duplicates. The default is therefore the single-shuffle direct
    aggregation (measured ~2× faster than two-phase at 32M rows — the salt
    phase doubles shuffled volume for no reduction when keys are unique).

    ``salt_buckets > 0`` enables the classic two-phase salted aggregation for
    the cases where pre-spreading genuinely matters: non-combinable payloads
    (e.g. collecting the duplicate rows themselves) or sort-based fallback
    paths. Skewed *joins* elsewhere in the engine are covered by AQE
    (session.py: spark.sql.adaptive.skewJoin.enabled).

    ``digest_prefilter: True`` routes to :func:`_unique_per_part_digest` —
    the all-to-all shuffles an 8-byte digest instead of the key payload and
    only colliding digest groups are exact-confirmed. Same exact outputs;
    the right trade on network-shuffled clusters with wide keys (see the
    variant's docstring). Mutually exclusive with ``salt_buckets`` (digest
    groups are high-cardinality by construction, salting adds nothing).
    """
    key = check.params.get("key", "doc_id")
    salt_buckets = int(check.params.get("salt_buckets", 0))
    digest_prefilter = bool(check.params.get("digest_prefilter", False))
    if digest_prefilter and salt_buckets:
        raise ValueError("unique check: digest_prefilter and salt_buckets "
                         "are mutually exclusive")
    # ``max_dup_emit``: per-partition cap on EMITTED duplicate rows (the
    # verdict's n_violations stays exact; see _unique_per_part)
    max_dup_emit = int(check.params.get("max_dup_emit", 100_000))
    # tiny (O(partitions + min(violations, cap))); persisted for the two
    # consumers and registered in CheckResult.cached. NOT a localCheckpoint:
    # under AQE even ``localCheckpoint(eager=False)`` materializes every
    # shuffle stage at PLAN-BUILD time (toRdd finalizes the adaptive plan),
    # which ran the suite's biggest shuffle as a serial job inside
    # run_checks before any other suite job could start (measured 28 s of
    # the 53 s local[4]/32M total spent inside the builder). A lazy persist
    # defers it to materialize(), where every cached frame's first count
    # runs CONCURRENTLY with the others — the unique shuffle now overlaps
    # the fused aggregate pass (measured 53 s → ~44 s at local[4]/32M).
    if digest_prefilter:
        per_part = _unique_per_part_digest(df, key, pcol,
                                           max_dup_emit).persist()
    else:
        per_part = _unique_per_part(df, key, pcol, salt_buckets,
                                    max_dup_emit).persist()

    dups = per_part.select(
        "partition_id", F.explode("_dups").alias("d")
    ).select("partition_id", F.col("d.k").alias(key), F.col("d.c").alias("cnt"))
    verdicts = per_part.select(
        "partition_id",
        F.lit(check.check_id).alias("check_id"),
        (F.col("n_dup_keys") == 0).alias("passed"),
        F.col("n_dup_keys").cast("double").alias("observed"),
        F.lit(0.0).alias("expected"),
        F.lit(0.0).alias("threshold"),
        F.col("n_dup_keys").alias("n_violations"),
        F.col("rows_scanned"),
    )
    viol = dups.select(
        "partition_id",
        F.lit(check.check_id).alias("check_id"),
        F.col(key).alias("doc_id"),
        F.col("cnt").cast("string").alias("observed"),
        F.lit("1").alias("expected"),
    )
    return CheckResult(_finish_verdicts(verdicts), _finish_violations(viol),
                       cached=(per_part,))


def _check_referential(df: DataFrame, check: Check, pcol: str) -> CheckResult:
    """source ∈ allowed-dimension membership (broadcast anti-join)."""
    column = check.params.get("column", "source")
    allowed = check.params.get("allowed")
    spark = df.sparkSession
    if isinstance(allowed, (list, tuple, set)):
        dim = spark.createDataFrame([(a,) for a in sorted(allowed)], f"{column} string")
    else:
        dim = allowed  # a DataFrame with one column named ``column``

    viol_rows = df.join(F.broadcast(dim), on=column, how="left_anti")
    per_part = df.groupBy(F.col(pcol).alias("partition_id")).agg(
        F.count(F.lit(1)).alias("rows_scanned"))
    bad_per_part = viol_rows.groupBy(F.col(pcol).alias("_bp")) \
                            .agg(F.count(F.lit(1)).alias("n_bad"))
    # NULL-SAFE: a NULL partition's bad-row count must attach to its verdict
    # (plain equality would fill 0 and report a false pass)
    verdicts = per_part.join(
            bad_per_part,
            per_part["partition_id"].eqNullSafe(bad_per_part["_bp"]), "left") \
        .drop("_bp") \
        .na.fill({"n_bad": 0}) \
        .select(
            "partition_id",
            F.lit(check.check_id).alias("check_id"),
            (F.col("n_bad") == 0).alias("passed"),
            F.col("n_bad").cast("double").alias("observed"),
            F.lit(0.0).alias("expected"),
            F.lit(0.0).alias("threshold"),
            F.col("n_bad").alias("n_violations"),
            F.col("rows_scanned"),
        )
    viol = viol_rows.select(
        F.col(pcol).alias("partition_id"),
        F.lit(check.check_id).alias("check_id"),
        F.col("doc_id"),
        F.col(column).cast("string").alias("observed"),
        F.lit("member of allowed source set").alias("expected"),
    )
    return CheckResult(_finish_verdicts(verdicts), _finish_violations(viol))


def _check_n_tok_consistency(df: DataFrame, check: Check, pcol: str) -> CheckResult:
    """Metadata invariant: declared n_tok equals size(tokens).

    NULL-SAFE: plain ``!=`` evaluates to NULL when either side is NULL
    (``size(NULL)`` is NULL in non-legacy Spark), so a row with NULL
    metadata but non-NULL tokens — or vice versa — would silently PASS
    the invariant. ``<=>`` makes the contradiction count; NULL on BOTH
    sides (no declared count, no tokens) is consistent and passes."""
    bad = ~F.col("n_tok").eqNullSafe(F.size("tokens"))
    per_part = df.groupBy(F.col(pcol).alias("partition_id")).agg(
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("n_bad"),
    )
    verdicts = per_part.select(
        "partition_id",
        F.lit(check.check_id).alias("check_id"),
        (F.col("n_bad") == 0).alias("passed"),
        F.col("n_bad").cast("double").alias("observed"),
        F.lit(0.0).alias("expected"),
        F.lit(0.0).alias("threshold"),
        F.col("n_bad").alias("n_violations"),
        F.col("rows_scanned"),
    )
    viol = df.filter(bad).select(
        F.col(pcol).alias("partition_id"),
        F.lit(check.check_id).alias("check_id"),
        F.col("doc_id"),
        F.col("n_tok").cast("string").alias("observed"),
        F.size("tokens").cast("string").alias("expected"),
    )
    return CheckResult(_finish_verdicts(verdicts), _finish_violations(viol))


def _check_token_range(df: DataFrame, check: Check, pcol: str) -> CheckResult:
    """Token-id vocabulary-bounds check: every element of the token array
    must be non-NULL and lie in ``[min_value, max_value)`` — the tokenized-
    corpus analog of the reference's hard threshold predicate (detect1's
    absolute limits, /root/reference/data_processing/detector.py:211): a
    token id outside the tokenizer's vocabulary, or a NULL element, proves
    upstream corruption regardless of any distribution.

    Semantics (pinned by tests/test_checks.py + the cross-engine fuzz):

    - a NULL tokens ARRAY passes — array presence/length is
      ``n_tok_consistency``'s contract, not range's;
    - a NULL ELEMENT violates (no real tokenizer emits NULL);
    - violation rows carry the FIRST offending element (``'NULL'`` for a
      NULL element) and the bound as ``expected``.

    Plan shape: one pruned scan → groupBy(partition) conditional sum over
    an ``exists()`` array predicate (whole-stage codegen, shuffle
    O(#partitions)); violations are a filter branch of the same scan
    (O(#violations)). Fully fusible (checks/fused.py) — inside the fused
    suite this check costs ZERO extra passes.
    """
    col = check.params.get("value_col", "tokens")
    lo = int(check.params.get("min_value", 0))
    hi = int(check.params["max_value"])

    def bad_elem(t: Column) -> Column:
        # single-arg lambda with lo/hi captured by closure (a 2-arg lambda
        # would be called as (element, index) — CLAUDE.md); the predicate
        # is never NULL because t.isNull() absorbs the NULL element case
        return t.isNull() | (t < F.lit(lo)) | (t >= F.lit(hi))

    arr = F.col(col)
    row_bad = F.when(arr.isNull(), F.lit(False)).otherwise(F.exists(arr, bad_elem))
    per_part = df.groupBy(F.col(pcol).alias("partition_id")).agg(
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(F.when(row_bad, 1).otherwise(0)).alias("n_bad"),
    )
    verdicts = per_part.select(
        "partition_id",
        F.lit(check.check_id).alias("check_id"),
        (F.col("n_bad") == 0).alias("passed"),
        F.col("n_bad").cast("double").alias("observed"),
        F.lit(0.0).alias("expected"),
        F.lit(0.0).alias("threshold"),
        F.col("n_bad").alias("n_violations"),
        F.col("rows_scanned"),
    )
    # try_element_at: ANSI-safe on the (unreachable) empty-filter case —
    # row_bad guarantees at least one offending element survives the filter
    first_bad = F.try_element_at(F.filter(arr, bad_elem), F.lit(1))
    viol = df.filter(row_bad).select(
        F.col(pcol).alias("partition_id"),
        F.lit(check.check_id).alias("check_id"),
        F.col("doc_id"),
        F.coalesce(first_bad.cast("string"), F.lit("NULL")).alias("observed"),
        F.lit(f"token id in [{lo}, {hi})").alias("expected"),
    )
    return CheckResult(_finish_verdicts(verdicts), _finish_violations(viol))


def _token_digest_join(df: DataFrame, expected_df: DataFrame,
                       pcol: str) -> tuple[DataFrame, Column]:
    """The token-invariant's shared lazy digest frame: one scan per side,
    digests-only shuffles, one row per (partition, doc_id) with both sides'
    (hash, length) digests. Returns ``(joined, mismatch)`` where ``mismatch``
    is the violation predicate over the frame.

    A digest mismatch PROVES the arrays differ (unequal hashes / lengths ⇒
    unequal bytes) — no exact-confirm rescan is needed; xxhash64 collisions
    can only produce false *negatives* (a missed corruption), which no
    candidate rescan could recover either.
    """
    # snapshot side: ONE canonical variant per doc (a snapshot with
    # conflicting duplicate doc_ids is ill-defined; the min-hash variant is
    # stable). hash and len must come from the SAME variant — independent
    # mins could mix fields of two conflicting variants and flag an
    # observed row that byte-equals the canonical one (min_by keeps the
    # buffer primitive, unlike min-of-struct which would leave codegen).
    exp = expected_df.groupBy("doc_id").agg(
        F.min(F.xxhash64("tokens")).alias("_exp_hash"),
        F.min_by(F.size("tokens"), F.xxhash64("tokens")).alias("_exp_len"),
    )
    # observed side: group by (partition, doc_id) with mutable-typed (long)
    # aggregates — a dropDuplicates here would carry the string partition
    # column through a first() buffer and fall back to SortAggregate on the
    # full scan. min AND max digests: every copy of the doc matches the
    # snapshot ⟺ min = max = expected, so a corrupted DUPLICATE row can
    # never hide behind a clean copy.
    obs = df.groupBy(pcol, "doc_id").agg(
        F.min(F.xxhash64("tokens")).alias("_obs_hash_min"),
        F.max(F.xxhash64("tokens")).alias("_obs_hash"),
        F.min(F.size("tokens")).alias("_obs_len_min"),
        F.max(F.size("tokens")).alias("_obs_len"),
    )
    mismatch = (
        F.col("_exp_hash").isNull()
        | (F.col("_obs_hash") != F.col("_exp_hash"))
        | (F.col("_obs_hash_min") != F.col("_exp_hash"))
        | (F.col("_obs_len") != F.col("_exp_len"))
        | (F.col("_obs_len_min") != F.col("_exp_len"))
    )
    return obs.join(exp, "doc_id", "left"), mismatch


def _token_digest_rollup(df: DataFrame, expected_df: DataFrame,
                         pcol: str) -> DataFrame:
    """Lazy scalar digest rollup: ``(partition_id, rows_scanned, n_bad)``.

    Kept as its own function so tests/test_explain_plans.py can gate the
    plan of the frame that actually shuffles (the check checkpoints it
    eagerly, which hides its Exchanges from the consumer frames' plans).
    """
    joined, mismatch = _token_digest_join(df, expected_df, pcol)
    return joined.groupBy(F.col(pcol).alias("partition_id")).agg(
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(F.when(mismatch, 1).otherwise(0)).alias("n_bad"),
    )


def _check_token_invariant(df: DataFrame, check: Check, pcol: str) -> CheckResult:
    """Token-array byte-equality vs a trusted snapshot DataFrame.

    Scale discipline (same as ``exact_duplicate_groups``, dedup.py:56-80):
    only scan-side digests ``(doc_id, xxhash64(tokens), size(tokens))`` —
    ~24 bytes/row — ever cross a shuffle; the token payload itself is NEVER
    shuffled (at 100 TB the old payload-carrying join moved ~2× the corpus
    over the wire to find a handful of mismatches). A digest mismatch is
    *proof* of a byte difference (see :func:`_token_digest_join`), so
    verdicts come straight from the scalar rollup.

    Scan budget and memory: the clean case (every deployment's steady
    state) is exactly one pruned scan per side — the scalar rollup — and
    the violations frame is provably empty without running anything (the
    probe reads the checkpointed O(#partitions) rollup). Only when some
    partition actually has mismatches is the digest join re-derived and
    filtered to emit violation ROWS — a lazy distributed frame, so a
    heavily divergent snapshot (millions of mismatches) streams through
    executors instead of materializing per-partition candidate arrays or
    driver-bounded broadcasts; nothing in the dirty path assumes the
    violation set is small.
    """
    expected_df: DataFrame = check.params["expected"]
    # (_token_digest_rollup is separate so the no-tokens-below-shuffle plan
    # gate can inspect the LAZY rollup plan — the checkpoint here executes
    # it before any consumer plan is built.)
    per_part = _token_digest_rollup(df, expected_df, pcol).localCheckpoint()
    verdicts = per_part.select(
        "partition_id",
        F.lit(check.check_id).alias("check_id"),
        (F.col("n_bad") == 0).alias("passed"),
        F.col("n_bad").cast("double").alias("observed"),
        F.lit(0.0).alias("expected"),
        F.lit(0.0).alias("threshold"),
        F.col("n_bad").alias("n_violations"),
        F.col("rows_scanned"),
    )

    bad_pids = [r["partition_id"] for r in
                per_part.filter(F.col("n_bad") > 0)
                        .select("partition_id").collect()]
    if not bad_pids:
        # clean corpus: zero extra scans, provably no violations
        viol = _empty(df.sparkSession, VIOLATION_SCHEMA)
        return CheckResult(_finish_verdicts(verdicts), viol)

    # dirty path: re-derive the digest join, but push the (tiny, known from
    # the checkpointed rollup) failing-partition set into the observed-side
    # scan — one corrupted partition must not cost a full-corpus re-scan.
    # NULL-safe: a NULL partition key can be a failing partition too.
    nn = [p for p in bad_pids if p is not None]
    is_bad = F.coalesce(F.col(pcol).isin(nn), F.lit(False)) if nn \
        else F.lit(False)
    if any(p is None for p in bad_pids):
        is_bad = is_bad | F.col(pcol).isNull()
    joined, mismatch = _token_digest_join(df.filter(is_bad), expected_df,
                                          pcol)
    viol = joined.filter(mismatch).select(
        F.col(pcol).alias("partition_id"),
        F.lit(check.check_id).alias("check_id"),
        F.col("doc_id"),
        F.col("_obs_hash").cast("string").alias("observed"),
        F.coalesce(F.col("_exp_hash").cast("string"), F.lit("<absent>"))
         .alias("expected"),
    )
    return CheckResult(_finish_verdicts(verdicts), _finish_violations(viol))


def _check_drift(df: DataFrame, check: Check, pcol: str, stat: str) -> CheckResult:
    value_col = check.params.get("value_col", "n_tok")
    threshold = float(check.params.get("threshold", 0.2))
    baseline = check.params.get("baseline")  # optional raw DataFrame
    cache_registry: list = []

    if stat == "psi":
        pinned = check.params.get("pinned_hist")
        if pinned is not None:
            from pyanomalydetector_spark.checks.drift import psi_by_partition_pinned
            scored = psi_by_partition_pinned(
                df, pcol, value_col, pinned["lo"], pinned["hi"],
                pinned["counts"], pinned["n_base"])
        else:
            scored = psi_by_partition(
                df, pcol, value_col,
                n_buckets=int(check.params.get("buckets", 10)),
                baseline=baseline, cache_registry=cache_registry,
                # opt-in one-scan route for structurally bounded columns
                # (token length is capped by the context size); unbounded
                # continuous columns keep the two-pass fixed-width path
                low_cardinality=bool(check.params.get("low_cardinality",
                                                      False)))
        obs = "psi"
    else:
        base_counts = check.params.get("baseline_counts")
        if base_counts is not None:
            from pyanomalydetector_spark.checks.drift import ks_by_partition_counts
            scored = ks_by_partition_counts(df, pcol, value_col, base_counts)
        else:
            scored = ks_by_partition(
                df, pcol, value_col, baseline=baseline,
                cache_registry=cache_registry,
                # structurally bounded columns (token length ≤ context
                # size) skip the cardinality guard's blocking job and run
                # the fully-lazy single-plan route
                bounded=bool(check.params.get("bounded", False)),
                # rows_scanned derives from the counts shuffle — saves the
                # second raw-input scan below
                include_rows=True)
        obs = "ks_d"

    if "rows_scanned" not in scored.columns:
        # NULL-SAFE: keep the NULL partition's verdict row
        rows = _rows_per_partition(df, pcol).withColumnRenamed(
            "partition_id", "_rp")
        scored = scored.join(
            rows, scored["partition_id"].eqNullSafe(rows["_rp"])).drop("_rp")
    verdicts = scored.select(
        "partition_id",
        F.lit(check.check_id).alias("check_id"),
        (F.col(obs) <= threshold).alias("passed"),
        F.col(obs).alias("observed"),
        F.lit(threshold).alias("expected"),
        F.lit(threshold).alias("threshold"),
        F.lit(0).alias("n_violations"),
        F.col("rows_scanned"),
    )
    return CheckResult(_finish_verdicts(verdicts),
                       _empty(df.sparkSession, VIOLATION_SCHEMA),
                       cached=tuple(cache_registry))


_DISPATCH = {
    "column_stats": _check_column_stats,
    "zscore_threshold": _check_zscore_threshold,
    "unique": _check_unique,
    "referential": _check_referential,
    "n_tok_consistency": _check_n_tok_consistency,
    "token_range": _check_token_range,
    "token_invariant": _check_token_invariant,
    "drift_psi": lambda df, c, p: _check_drift(df, c, p, "psi"),
    "drift_ks": lambda df, c, p: _check_drift(df, c, p, "ks"),
}


def run_checks(df: DataFrame, checks: Iterable[Check],
               partition_col: str = "source", fuse: bool = True) -> CheckResult:
    """Run a suite of checks; union the per-check verdict/violation frames.

    With ``fuse=True`` (default), aggregate-style checks execute on the fused
    two-scan path (checks/fused.py): one groupBy pass computes every
    per-partition aggregate, one filter pass emits every row-level violation —
    at 100 TB this is the difference between 2 and 7+ full table scans. Checks
    whose semantics need their own shuffle (``unique``, ``drift_ks``,
    ``token_invariant``) or carry DataFrame-valued params keep per-check plans.

    The input is deliberately NOT cached: each pass re-scans the columnar
    source with column pruning (a pass that only needs ``n_tok`` reads only
    that column), which beats materializing the full token table in executor
    memory — at 10¹²-row scale the input never fits cache, so the engine is
    designed around cheap pruned re-scans instead.
    """
    from pyanomalydetector_spark.checks.fused import run_fused, split_fusible

    spark = df.sparkSession
    checks = list(checks)
    verdict_frames: list[DataFrame] = []
    violation_frames: list[DataFrame] = []

    fused, rest = split_fusible(checks) if fuse else ([], checks)
    if len(fused) < 2:          # fusion only pays when scans are shared
        rest, fused = checks, []

    for check in rest:
        if _DISPATCH.get(check.kind) is None:
            raise ValueError(f"unknown check kind {check.kind!r}")

    # The fused pass and the eager per-check plans (unique's checkpoint)
    # each materialize via their own Spark jobs; submitting them from
    # concurrent threads lets the scheduler overlap their stages instead of
    # idling cores between sequential jobs (Spark actions are thread-safe).
    from concurrent.futures import ThreadPoolExecutor

    def run_rest(check):
        return _DISPATCH[check.kind](df, check, partition_col)

    if fused and rest:
        with ThreadPoolExecutor(max_workers=1 + len(rest)) as ex:
            fut_fused = ex.submit(run_fused, df, fused, partition_col)
            fut_rest = [ex.submit(run_rest, c) for c in rest]
            v, w, cached = fut_fused.result()
            rest_results = [f.result() for f in fut_rest]
    else:
        v, w, cached = run_fused(df, fused, partition_col) if fused \
            else ([], [], [])
        rest_results = [run_rest(c) for c in rest]

    verdict_frames += v
    violation_frames += w
    for res in rest_results:
        verdict_frames.append(res.verdicts)
        violation_frames.append(res.violations)
        cached += list(res.cached)

    verdicts = _empty(spark, VERDICT_SCHEMA)
    for v in verdict_frames:
        verdicts = verdicts.unionByName(v)
    violations = _empty(spark, VIOLATION_SCHEMA)
    for v in violation_frames:
        violations = violations.unionByName(v)
    return CheckResult(verdicts, violations, cached=tuple(cached))


def default_suite(allowed_sources: Iterable[str]) -> list[Check]:
    """The standard suite over the sequence table (north-rule check kinds)."""
    return [
        Check("column_stats_n_tok", "column_stats",
              {"value_col": "n_tok", "min_count": 1}),
        Check("zscore_n_tok", "zscore_threshold",
              {"value_col": "n_tok", "lambda": 2.0, "ignore_diff_rate": 0.1}),
        Check("unique_doc_id", "unique", {"key": "doc_id"}),
        Check("referential_source", "referential",
              {"column": "source", "allowed": list(allowed_sources)}),
        Check("n_tok_consistency", "n_tok_consistency", {}),
        Check("drift_psi_n_tok", "drift_psi",
              {"value_col": "n_tok", "buckets": 10, "threshold": 0.25}),
        # bounded: token length is structurally capped by the context size,
        # so the KS cardinality guard (a blocking distinct-count job) is
        # provably unnecessary → single-plan route
        Check("drift_ks_n_tok", "drift_ks",
              {"value_col": "n_tok", "threshold": 0.35, "bounded": True}),
    ]
