"""Report assembly — the reference's reporter.py recast for the check suite.

Reference shape (/root/reference/reporter.py:9-50): scan the verdict window,
dedup per item, group by (host, cluster), keep clusters with >1 member,
convert epochs to strings, emit a JSON dict keyed by item. Here the unit is
the (partition, check) verdict plus the violation groups:

- ``suite_summary``  — per-partition pass/fail rollup (one aggregation over
  the tiny verdict frame);
- ``cluster_groups`` — violation series grouped by the two-stage DBSCAN
  labels, only clusters with >1 member (reporter.py:34-39);
- ``report_json``    — the driver-side dict, written with ``json.dump`` like
  the reference's utils/__init__.py:58-75.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suite_summary(verdicts: DataFrame) -> DataFrame:
    """Per-partition rollup: checks run/failed, total violations, rows."""
    return (
        verdicts.groupBy("partition_id")
                .agg(F.count(F.lit(1)).alias("n_checks"),
                     F.sum(F.when(~F.col("passed"), 1).otherwise(0))
                      .alias("n_failed"),
                     F.sum("n_violations").alias("n_violations"),
                     F.max("rows_scanned").alias("rows_scanned"))
                .orderBy("partition_id")
    )


def cluster_groups(clusters: DataFrame, id_col: str = "itemid") -> DataFrame:
    """Clusters with more than one member (reporter.py:34-39), with members
    sorted for deterministic output."""
    return (
        clusters.filter(F.col("clusterid") >= 0)
                .groupBy("clusterid")
                .agg(F.array_sort(F.collect_list(id_col)).alias("members"),
                     F.count(F.lit(1)).alias("size"))
                .filter(F.col("size") > 1)
                .orderBy("clusterid")
    )


def report_json(verdicts: DataFrame, violations: DataFrame,
                clusters: DataFrame | None = None,
                path: str | None = None) -> dict:
    """Assemble the run report on the driver (all inputs are already tiny:
    O(partitions + violations), never O(rows))."""
    summary = {
        r["partition_id"]: {
            "n_checks": r["n_checks"], "n_failed": r["n_failed"],
            "n_violations": int(r["n_violations"] or 0),
            "rows_scanned": int(r["rows_scanned"] or 0),
        }
        for r in suite_summary(verdicts).collect()
    }
    by_check = {
        r["check_id"]: int(r["n"])
        for r in violations.groupBy("check_id")
                           .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out = {
        "partitions": summary,
        "violations_by_check": by_check,
        "all_passed": all(p["n_failed"] == 0 for p in summary.values()),
    }
    if clusters is not None:
        out["clusters"] = {
            str(r["clusterid"]): [int(m) for m in r["members"]]
            for r in cluster_groups(clusters).collect()
        }
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=2, sort_keys=True)
    return out
