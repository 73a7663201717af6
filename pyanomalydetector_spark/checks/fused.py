"""Scan-fused, fully-lazy execution of the check suite.

The naive execution of a suite runs one plan per check — at 100 TB that is one
full table scan per check (7+ scans). But most check kinds only need
*per-partition aggregates* of the same scan:

- ``column_stats`` / ``zscore_threshold`` → moments (sum, Σx², cnt) of a value
  column per partition;
- ``n_tok_consistency`` / ``referential``  → conditional counts per partition;
- ``drift_psi``                            → fixed-width bucket histogram per
  partition.

The fused plan therefore has exactly two passes over the data:

1. ONE ``groupBy(partition).agg(...)`` computing every aggregate every
   fusible check needs (Spark's hash aggregate does the map-side combine;
   only #partitions × #agg-columns crosses the shuffle);
2. ONE filter scan emitting ALL row-level violations via an
   array-of-structs → ``filter`` → ``explode`` (each row evaluates every
   violation predicate in a single whole-stage-codegen pass).

Crucially, the whole suite is ONE declarative plan — there are no driver
round-trips inside it. Global inputs that earlier versions collected to the
driver are folded in as broadcast 1-row frames:

- PSI bucket bounds: a lazy ``df.agg(min, max)`` crossJoined onto the scan
  (executes as a tiny subquery stage inside the same job);
- global baselines (mean/std, bucket totals): a lazy re-aggregation of the
  tiny per-partition frame, crossJoined onto the verdict selects;
- z-score failing partitions: a broadcast left-join onto the violations
  scan instead of a collected id list.

So a full suite materializes in ~3 Spark jobs (fused verdicts, fused
violations, plus whatever non-fused checks need) instead of ~7 — the fixed
job-latency term that dominates small inputs, and fewer barriers at scale.
The per-partition aggregate cache is populated lazily by whichever of the
two concurrent jobs gets there first (see the measured rationale at the
persist site).

Non-fusible kinds (``unique`` needs a groupBy on the key, ``drift_ks`` needs
the per-value CDF grid, ``token_invariant`` needs a snapshot join) keep their
own plans — those shuffles are inherent to their semantics.

Results are bit-identical to the per-check path (asserted in
tests/test_fused.py); integer aggregates are exact, float aggregates differ
only in summation order (within the 6-decimal rounding every consumer
applies).

Reference lineage: this is the Spark answer to the reference recomputing its
stats per detection stage (/root/reference/data_processing/detector.py:149-230
re-reads stats tables per batch); a columnar engine fuses the passes instead.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyanomalydetector_spark.checks.drift import PSI_SMOOTH


def is_fusible(check) -> bool:
    """Checks with DataFrame-valued params use the per-check path; plain
    config (including pinned-baseline scalars) fuses."""
    k, p = check.kind, check.params
    if k in ("column_stats", "n_tok_consistency"):
        return True
    if k == "zscore_threshold":
        return p.get("baseline") is None
    if k == "referential":
        return isinstance(p.get("allowed"), (list, tuple, set))
    if k == "drift_psi":
        return p.get("baseline") is None
    return False


def _moment_cols(vc: str, tag: str) -> list[Column]:
    v = F.col(vc).cast("double")
    return [
        F.sum(v).alias(f"{tag}_sum"),
        F.sum(v * v).alias(f"{tag}_sqr"),
        F.count(v).alias(f"{tag}_cnt"),
    ]


def _finalized(tag: str, prefix: str = "") -> tuple[Column, Column]:
    """mean/std from fused moments with the reference's exact finalize
    semantics (stats.py:130-135: Bessel, inf/NaN→0, cnt==1 → std 0)."""
    s, q, c = (F.col(f"{prefix}{tag}_sum"), F.col(f"{prefix}{tag}_sqr"),
               F.col(f"{prefix}{tag}_cnt"))
    mean = F.try_divide(s, c.cast("double"))
    var = F.try_divide(q - F.try_divide(s * s, c.cast("double")),
                       (c - 1).cast("double"))
    std = F.when(c > 1, F.sqrt(var)).otherwise(F.lit(0.0))

    def scrub(col: Column) -> Column:
        return F.when(col.isNull() | F.isnan(col)
                      | col.isin(float("inf"), float("-inf")), F.lit(0.0)) \
                .otherwise(col)

    return scrub(mean), scrub(std)


def _global_mean_std(mtag: str) -> tuple[Column, Column]:
    """Global baseline mean/std as columns over the summed moments — the
    same arithmetic (and op order) the finalize formulas use."""
    gs = F.coalesce(F.col(f"g_{mtag}_sum"), F.lit(0.0))
    gq = F.coalesce(F.col(f"g_{mtag}_sqr"), F.lit(0.0))
    gc = F.coalesce(F.col(f"g_{mtag}_cnt"), F.lit(0)).cast("double")
    mean_t = F.when(gc > 0, gs / gc).otherwise(F.lit(0.0))
    var = F.when(gc > 1, (gq - gs * gs / gc) / (gc - 1)).otherwise(F.lit(0.0))
    std_t = F.when(var > 0, F.sqrt(var)).otherwise(F.lit(0.0))
    return mean_t, std_t


def run_fused(df: DataFrame, checks: Sequence, pcol: str):
    """Build the fused two-pass plan. Returns (verdicts, violations, cached):
    lists of *lazy* DataFrames in the order of ``checks`` plus the persisted
    intermediates (for the caller to unpersist once materialized) — no job
    runs here."""
    from pyanomalydetector_spark.checks.core import (  # local: avoid cycle
        _finish_verdicts, _finish_violations,
    )

    # ---- PSI bucket bounds: pinned → python lits; else a lazy 1-row agg ----
    psi_checks = [c for c in checks if c.kind == "drift_psi"]
    pinned_bounds: dict[str, tuple[float, float]] = {}
    scan_vcs: list[str] = []
    for c in psi_checks:
        vc = c.params.get("value_col", "n_tok")
        pinned = c.params.get("pinned_hist")
        if pinned is not None:
            pinned_bounds[vc] = (float(pinned["lo"]), float(pinned["hi"]))
        elif vc not in scan_vcs:
            scan_vcs.append(vc)

    part_src = df
    if scan_vcs:
        exprs = []
        for vc in scan_vcs:
            v = F.col(vc).cast("double")
            exprs += [F.min(v).alias(f"_lo_{vc}"), F.max(v).alias(f"_hi_{vc}")]
        part_src = df.crossJoin(F.broadcast(df.agg(*exprs)))

    # ---- pass 1 plan: the single fused per-partition aggregate -------------
    aggs: list[Column] = [F.count(F.lit(1)).alias("_rows")]
    moment_tags: set[str] = set()
    for i, c in enumerate(checks):
        tag, p = f"c{i}", c.params
        if c.kind in ("column_stats", "zscore_threshold"):
            vc = p.get("value_col", "n_tok")
            mtag = f"m_{vc}"
            if mtag not in moment_tags:
                moment_tags.add(mtag)
                aggs += _moment_cols(vc, mtag)
        elif c.kind == "n_tok_consistency":
            bad = F.col("n_tok") != F.size("tokens")
            aggs.append(F.sum(F.when(bad, 1).otherwise(0)).alias(f"{tag}_bad"))
        elif c.kind == "referential":
            col, allowed = p.get("column", "source"), sorted(p["allowed"])
            bad = F.when(F.col(col).isin(allowed), 0).otherwise(1)  # NULL→bad
            aggs.append(F.sum(bad).alias(f"{tag}_bad"))
        elif c.kind == "drift_psi":
            vc = p.get("value_col", "n_tok")
            nb = int(p.get("buckets", 10))
            v = F.col(vc).cast("double")
            if vc in pinned_bounds:
                lo, hi = pinned_bounds[vc]
                if hi == lo:
                    bucket = F.lit(0)
                else:
                    raw = F.floor((v - F.lit(lo)) / F.lit((hi - lo) / nb))
                    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(nb - 1))
            else:
                lo, hi = F.col(f"_lo_{vc}"), F.col(f"_hi_{vc}")
                raw = F.floor((v - lo) / ((hi - lo) / nb))
                clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(nb - 1))
                bucket = F.when(hi == lo, F.lit(0)).otherwise(clamped)
            for b in range(nb):
                aggs.append(F.sum(F.when(bucket == b, 1).otherwise(0))
                             .alias(f"{tag}_b{b}"))

    # persisted LAZILY on purpose: materialize() runs the verdicts and
    # violations jobs on concurrent threads, and the violations pass needs a
    # second raw scan regardless — an eager count() here serializes the two
    # full scans (measured +12% wall at 32M rows / local[4]) while the lazy
    # race costs nothing measurable (interleaved A/B at sf0.1: 3.17 s lazy
    # vs 3.19 s eager). This is the opposite call from the minhash/simhash
    # banding caches, where the duplicated work is a whole extra
    # explode+aggregate pass and eager wins — measure before changing.
    part_aggs = part_src.groupBy(F.col(pcol).alias("partition_id")) \
                        .agg(*aggs).persist()

    # ---- global baselines: lazy 1-row re-agg of the tiny frame -------------
    need_globals = any(
        (c.kind == "zscore_threshold" and c.params.get("baseline_scalars") is None)
        or (c.kind == "drift_psi" and c.params.get("pinned_hist") is None)
        for c in checks)
    pa = part_aggs
    if need_globals:
        gl_exprs: list[Column] = [F.sum("_rows").alias("g_rows")]
        for mtag in moment_tags:
            gl_exprs += [F.sum(f"{mtag}_sum").alias(f"g_{mtag}_sum"),
                         F.sum(f"{mtag}_sqr").alias(f"g_{mtag}_sqr"),
                         F.sum(f"{mtag}_cnt").alias(f"g_{mtag}_cnt")]
        for i, c in enumerate(checks):
            if c.kind == "drift_psi" and c.params.get("pinned_hist") is None:
                nb = int(c.params.get("buckets", 10))
                gl_exprs += [F.sum(f"c{i}_b{b}").alias(f"g_c{i}_b{b}")
                             for b in range(nb)]
        pa = part_aggs.crossJoin(F.broadcast(part_aggs.agg(*gl_exprs)))

    # ---- verdict plans from the aggregate frame ----------------------------
    verdicts: list[DataFrame] = []
    viol_entries = []   # (check_id, cond, observed_col, expected_col)
    viol_joins = []     # broadcast frames joined onto the violations scan

    for i, c in enumerate(checks):
        tag, p = f"c{i}", c.params
        cid = F.lit(c.check_id).alias("check_id")
        if c.kind == "column_stats":
            vc = p.get("value_col", "n_tok")
            min_count = int(p.get("min_count", 1))
            cnt = F.col(f"m_{vc}_cnt")
            # cnt==0 (an all-NULL-value partition) emits NO verdict row,
            # matching the per-check path (finalize_mean_std drops cnt==0)
            verdicts.append(_finish_verdicts(pa.filter(cnt > 0).select(
                "partition_id", cid,
                (cnt >= min_count).alias("passed"),
                cnt.cast("double").alias("observed"),
                F.lit(float(min_count)).alias("expected"),
                F.lit(float(min_count)).alias("threshold"),
                F.lit(0).alias("n_violations"),
                cnt.alias("rows_scanned"))))
        elif c.kind == "zscore_threshold":
            vc = p.get("value_col", "n_tok")
            lam = float(p.get("lambda", 2.0))
            rate = float(p.get("ignore_diff_rate", 0.0))
            mtag = f"m_{vc}"
            scalars = p.get("baseline_scalars")
            if scalars is not None:          # pinned baseline (resume path)
                mean_t = F.lit(float(scalars["mean"]))
                std_t = F.lit(float(scalars["std"]))
            else:
                mean_t, std_t = _global_mean_std(mtag)
            mean_h, _ = _finalized(mtag)
            dev = F.abs(mean_h - mean_t)
            fail = (dev > F.lit(lam) * std_t) & (mean_t > 0) & \
                   (F.try_divide(dev, mean_t) > rate)
            # cnt==0 partitions emit no verdict, matching the per-check
            # path (finalize_mean_std filters cnt>0 before the crossJoin)
            pa_z = pa.filter(F.col(f"{mtag}_cnt") > 0)
            verdicts.append(_finish_verdicts(pa_z.select(
                "partition_id", cid,
                (~fail).alias("passed"),
                mean_h.alias("observed"),
                mean_t.alias("expected"),
                (F.lit(lam) * std_t).alias("threshold"),
                F.lit(0).alias("n_violations"),
                F.col(f"{mtag}_cnt").alias("rows_scanned"))))
            # failing partitions flow into the violations scan as a
            # broadcast left-join — no driver collect
            zfail = pa_z.where(fail).select(
                F.col("partition_id").alias(f"_zp_{i}"),
                mean_t.alias(f"_zm_{i}"),
                (F.lit(lam) * std_t).alias(f"_zt_{i}"))
            viol_joins.append((zfail, f"_zp_{i}"))
            v = F.col(vc).cast("double")
            cond = F.col(f"_zm_{i}").isNotNull() & \
                (F.abs(v - F.col(f"_zm_{i}")) > F.col(f"_zt_{i}"))
            exp = F.concat(
                F.lit("within "), F.round(F.col(f"_zm_{i}"), 6).cast("string"),
                F.lit(" ± "), F.round(F.col(f"_zt_{i}"), 6).cast("string"))
            viol_entries.append((c.check_id, cond,
                                 F.col(vc).cast("string"), exp))
        elif c.kind == "n_tok_consistency":
            bad_n = F.col(f"{tag}_bad")
            verdicts.append(_finish_verdicts(pa.select(
                "partition_id", cid,
                (bad_n == 0).alias("passed"),
                bad_n.cast("double").alias("observed"),
                F.lit(0.0).alias("expected"),
                F.lit(0.0).alias("threshold"),
                bad_n.alias("n_violations"),
                F.col("_rows").alias("rows_scanned"))))
            viol_entries.append((
                c.check_id, F.col("n_tok") != F.size("tokens"),
                F.col("n_tok").cast("string"),
                F.size("tokens").cast("string")))
        elif c.kind == "referential":
            col, allowed = p.get("column", "source"), sorted(p["allowed"])
            bad_n = F.col(f"{tag}_bad")
            verdicts.append(_finish_verdicts(pa.select(
                "partition_id", cid,
                (bad_n == 0).alias("passed"),
                bad_n.cast("double").alias("observed"),
                F.lit(0.0).alias("expected"),
                F.lit(0.0).alias("threshold"),
                bad_n.alias("n_violations"),
                F.col("_rows").alias("rows_scanned"))))
            viol_entries.append((
                c.check_id,
                F.when(F.col(col).isin(allowed), F.lit(False)).otherwise(F.lit(True)),
                F.col(col).cast("string"),
                F.lit("member of allowed source set")))
        elif c.kind == "drift_psi":
            nb = int(p.get("buckets", 10))
            threshold = float(p.get("threshold", 0.2))
            pinned = p.get("pinned_hist")
            n_p = sum((F.col(f"{tag}_b{b}") for b in range(1, nb)),
                      F.col(f"{tag}_b0"))
            terms = []
            for b in range(nb):
                if pinned is not None:
                    qq = F.lit((float(pinned["counts"][b]) + PSI_SMOOTH)
                               / (float(pinned["n_base"]) + PSI_SMOOTH * nb))
                else:
                    c_b = F.coalesce(F.col(f"g_{tag}_b{b}"), F.lit(0)) \
                           .cast("double")
                    qq = (c_b + F.lit(PSI_SMOOTH)) / \
                         (F.col("g_rows").cast("double") + F.lit(PSI_SMOOTH * nb))
                pp = (F.col(f"{tag}_b{b}") + F.lit(PSI_SMOOTH)) / \
                     (n_p + F.lit(PSI_SMOOTH * nb))
                terms.append((pp - qq) * F.log(pp / qq))
            psi = sum(terms[1:], terms[0])
            verdicts.append(_finish_verdicts(pa.select(
                "partition_id", cid,
                (psi <= threshold).alias("passed"),
                psi.alias("observed"),
                F.lit(threshold).alias("expected"),
                F.lit(threshold).alias("threshold"),
                F.lit(0).alias("n_violations"),
                F.col("_rows").alias("rows_scanned"))))
        else:  # pragma: no cover — guarded by is_fusible
            raise ValueError(f"not fusible: {c.kind}")

    # ---- pass 2 plan: one scan emitting every row-level violation ----------
    violations: list[DataFrame] = []
    if viol_entries:
        viol_src = df
        for frame, keycol in viol_joins:
            # NULL-SAFE: a failing NULL partition's rows must still pick up
            # their z-thresholds (plain equality would drop its violations)
            viol_src = viol_src.join(
                F.broadcast(frame),
                F.col(pcol).eqNullSafe(F.col(keycol)), "left").drop(keycol)
        structs = F.array(*[
            F.when(cond, F.struct(
                F.lit(cid).alias("check_id"),
                obs.alias("observed"),
                exp.alias("expected"),
            ))
            for cid, cond, obs, exp in viol_entries
        ])
        hits = F.filter(structs, lambda x: x.isNotNull())
        exploded = (
            viol_src.select(F.col(pcol).alias("partition_id"), "doc_id",
                            F.explode(hits).alias("v"))
                    .select("partition_id",
                            F.col("v.check_id").alias("check_id"),
                            "doc_id",
                            F.col("v.observed").alias("observed"),
                            F.col("v.expected").alias("expected"))
        )
        violations.append(_finish_violations(exploded))

    return verdicts, violations, [part_aggs]


def split_fusible(checks: Iterable) -> tuple[list, list]:
    fused, rest = [], []
    for c in checks:
        (fused if is_fusible(c) else rest).append(c)
    return fused, rest
