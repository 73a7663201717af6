"""Scan-fused execution of the check suite.

The naive execution of a suite runs one plan per check — at 100 TB that is one
full table scan per check (7+ scans). But most check kinds only need
*per-partition aggregates* of the same scan:

- ``column_stats`` / ``zscore_threshold`` → moments (sum, Σx², cnt) of a value
  column per partition;
- ``n_tok_consistency`` / ``referential``  → conditional counts per partition;
- ``drift_psi``                            → fixed-width bucket histogram per
  partition (bucket membership is a row-local expression once the global
  [min, max] is known).

So the fused path runs:

1. one tiny pre-pass for the PSI bucket bounds (column-pruned min/max scan —
   parquet footer stats make this almost free);
2. ONE ``groupBy(partition).agg(...)`` over the table computing every
   aggregate every fusible check needs (Spark's hash aggregate does the
   map-side combine; only #partitions × #agg-columns crosses the shuffle);
3. verdicts derived from that tiny aggregate frame (global baselines — mean,
   std, bucket totals — are themselves sums over it, so no second scan);
4. ONE filter scan emitting ALL row-level violations via an
   array-of-structs → ``filter`` → ``explode`` (each row evaluates every
   violation predicate in a single whole-stage-codegen pass).

Non-fusible kinds (``unique`` needs a groupBy on the key, ``drift_ks`` needs
the per-value CDF grid, ``token_invariant`` needs a snapshot join) keep their
own plans — those shuffles are inherent to their semantics.

Results are bit-identical to the per-check path (asserted in
tests/test_fused.py); integer aggregates are exact, float aggregates differ
only in summation order (within the 6-decimal rounding every consumer applies).

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
    """Checks with exotic params (DataFrame baselines/dims) use the per-check
    path; plain-config checks fuse."""
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


def run_fused(df: DataFrame, checks: Sequence, pcol: str):
    """Execute fusible checks in two scans. Returns (verdicts, violations)
    lists of DataFrames, in the order of ``checks``."""
    from pyanomalydetector_spark.checks.core import (  # local: avoid cycle
        _finish_verdicts, _finish_violations,
    )

    spark = df.sparkSession

    # ---- pass 0: PSI bucket bounds (column-pruned tiny scan) ---------------
    # checks carrying a pinned histogram (checkpoint/resume path) supply
    # their bounds; only unpinned PSI checks need the min/max pre-pass.
    psi_checks = [c for c in checks if c.kind == "drift_psi"]
    bounds: dict[str, tuple[float, float]] = {}
    need_scan: list[str] = []
    for c in psi_checks:
        vc = c.params.get("value_col", "n_tok")
        pinned = c.params.get("pinned_hist")
        if pinned is not None:
            bounds[vc] = (float(pinned["lo"]), float(pinned["hi"]))
        elif vc not in bounds:
            bounds[vc] = (0.0, 0.0)
            need_scan.append(vc)
    if need_scan:
        exprs = []
        for vc in need_scan:
            v = F.col(vc).cast("double")
            exprs += [F.min(v).alias(f"lo_{vc}"), F.max(v).alias(f"hi_{vc}")]
        row = df.agg(*exprs).collect()[0]
        for vc in need_scan:
            bounds[vc] = (float(row[f"lo_{vc}"]), float(row[f"hi_{vc}"]))

    # ---- pass 1: the single fused per-partition aggregate ------------------
    aggs: list[Column] = [F.count(F.lit(1)).alias("_rows")]
    moment_tags: set[str] = set()
    for i, c in enumerate(checks):
        tag = f"c{i}"
        p = c.params
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
            lo, hi = bounds[vc]
            v = F.col(vc).cast("double")
            if hi == lo:
                bucket = F.lit(0)
            else:
                raw = F.floor((v - F.lit(lo)) / F.lit((hi - lo) / nb))
                bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(nb - 1))
            for b in range(nb):
                aggs.append(F.sum(F.when(bucket == b, 1).otherwise(0))
                             .alias(f"{tag}_b{b}"))

    part_aggs = df.groupBy(F.col(pcol).alias("partition_id")).agg(*aggs).persist()

    # global baselines are sums over the tiny aggregate frame — no re-scan
    gl_exprs: list[Column] = [F.sum("_rows").alias("g_rows")]
    for mtag in moment_tags:
        gl_exprs += [F.sum(f"{mtag}_sum").alias(f"g_{mtag}_sum"),
                     F.sum(f"{mtag}_sqr").alias(f"g_{mtag}_sqr"),
                     F.sum(f"{mtag}_cnt").alias(f"g_{mtag}_cnt")]
    for i, c in enumerate(checks):
        if c.kind == "drift_psi":
            nb = int(c.params.get("buckets", 10))
            gl_exprs += [F.sum(f"c{i}_b{b}").alias(f"g_c{i}_b{b}")
                         for b in range(nb)]
    globals_row = part_aggs.agg(*gl_exprs).collect()[0]

    # ---- verdicts from the aggregate frame ---------------------------------
    verdicts: list[DataFrame] = []
    viol_entries = []   # (check_id, cond, observed_col, expected_col)

    for i, c in enumerate(checks):
        tag, p = f"c{i}", c.params
        cid = F.lit(c.check_id).alias("check_id")
        if c.kind == "column_stats":
            vc = p.get("value_col", "n_tok")
            min_count = int(p.get("min_count", 1))
            cnt = F.col(f"m_{vc}_cnt")
            verdicts.append(_finish_verdicts(part_aggs.select(
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
                mean_t, std_t = float(scalars["mean"]), float(scalars["std"])
            else:
                # global mean/std with finalize semantics, from summed moments
                gs, gq, gc = (float(globals_row[f"g_{mtag}_sum"] or 0.0),
                              float(globals_row[f"g_{mtag}_sqr"] or 0.0),
                              int(globals_row[f"g_{mtag}_cnt"] or 0))
                mean_t = gs / gc if gc > 0 else 0.0
                var = ((gq - gs * gs / gc) / (gc - 1)) if gc > 1 else 0.0
                std_t = var ** 0.5 if var > 0 else 0.0
            mean_h, _ = _finalized(mtag)
            dev = F.abs(mean_h - F.lit(mean_t))
            fail = (dev > F.lit(lam * std_t)) & F.lit(mean_t > 0) & \
                   (F.try_divide(dev, F.lit(mean_t)) > rate)
            verdicts.append(_finish_verdicts(part_aggs.select(
                "partition_id", cid,
                (~fail).alias("passed"),
                mean_h.alias("observed"),
                F.lit(mean_t).alias("expected"),
                F.lit(lam * std_t).alias("threshold"),
                F.lit(0).alias("n_violations"),
                F.col(f"{mtag}_cnt").alias("rows_scanned"))))
            failing = [r["partition_id"] for r in
                       part_aggs.select("partition_id")
                       .where(fail).collect()]
            if failing:
                v = F.col(vc).cast("double")
                cond = F.col(pcol).isin(failing) & \
                    (F.abs(v - F.lit(mean_t)) > F.lit(lam * std_t))
                exp = F.concat(
                    F.lit("within "), F.round(F.lit(mean_t), 6).cast("string"),
                    F.lit(" ± "), F.round(F.lit(lam * std_t), 6).cast("string"))
                viol_entries.append((c.check_id, cond,
                                     F.col(vc).cast("string"), exp))
        elif c.kind == "n_tok_consistency":
            bad_n = F.col(f"{tag}_bad")
            verdicts.append(_finish_verdicts(part_aggs.select(
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
            verdicts.append(_finish_verdicts(part_aggs.select(
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
            if pinned is not None:
                n_base = float(pinned["n_base"])
                base_counts = [float(x) for x in pinned["counts"]]
            else:
                n_base = float(globals_row["g_rows"])
                base_counts = [float(globals_row[f"g_{tag}_b{b}"] or 0)
                               for b in range(nb)]
            n_p = sum((F.col(f"{tag}_b{b}") for b in range(1, nb)),
                      F.col(f"{tag}_b0"))
            terms = []
            for b in range(nb):
                c_b = base_counts[b]
                pp = (F.col(f"{tag}_b{b}") + F.lit(PSI_SMOOTH)) / \
                     (n_p + F.lit(PSI_SMOOTH * nb))
                qq = F.lit((c_b + PSI_SMOOTH) / (n_base + PSI_SMOOTH * nb))
                terms.append((pp - qq) * F.log(pp / qq))
            psi = sum(terms[1:], terms[0])
            verdicts.append(_finish_verdicts(part_aggs.select(
                "partition_id", cid,
                (psi <= threshold).alias("passed"),
                psi.alias("observed"),
                F.lit(threshold).alias("expected"),
                F.lit(threshold).alias("threshold"),
                F.lit(0).alias("n_violations"),
                F.col("_rows").alias("rows_scanned"))))
        else:  # pragma: no cover — guarded by is_fusible
            raise ValueError(f"not fusible: {c.kind}")

    # ---- pass 2: one scan emitting every row-level violation ---------------
    violations: list[DataFrame] = []
    if viol_entries:
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
            df.select(F.col(pcol).alias("partition_id"), "doc_id",
                      F.explode(hits).alias("v"))
              .select("partition_id",
                      F.col("v.check_id").alias("check_id"),
                      "doc_id",
                      F.col("v.observed").alias("observed"),
                      F.col("v.expected").alias("expected"))
        )
        violations.append(_finish_violations(exploded))

    return verdicts, violations


def split_fusible(checks: Iterable) -> tuple[list, list]:
    fused, rest = [], []
    for c in checks:
        (fused if is_fusible(c) else rest).append(c)
    return fused, rest
