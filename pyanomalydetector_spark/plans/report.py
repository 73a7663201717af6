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


def items_details(catalog_df: DataFrame, trends_stats_df: DataFrame,
                  created: int, group_map_df: DataFrame | None = None,
                  top_n: int = 0) -> DataFrame:
    """The anomalies/topitems row builder (detector.py:589-635) recast:

    catalog details ⋈ per-item trend stats (inner), optional top-N per host
    by ``item_count`` — the reference's groupby-apply ``nlargest`` loop
    becomes ONE window rank (ties broken by itemid so the result is
    deterministic under any shuffle order) — and the group-map override
    becomes a broadcast left join + coalesce instead of a per-row
    ``df.apply`` lambda. Emits the typed anomalies-table shape
    (models/anomalies.py), ``clusterid`` initialized to −1 for the
    classifier to fill (update_topitems.py:53-74).
    """
    from pyspark.sql import Window

    df = catalog_df
    if top_n > 0:
        w = Window.partitionBy("hostid").orderBy(F.desc("item_count"),
                                                 "itemid")
        df = df.withColumn("_rn", F.row_number().over(w)) \
               .filter(F.col("_rn") <= top_n).drop("_rn")

    stats = trends_stats_df.select(
        "itemid", F.col("mean").alias("trend_mean"),
        F.col("std").alias("trend_std"))
    df = df.join(stats, "itemid")

    if group_map_df is not None:
        gm = group_map_df.select("itemid", F.col("group_name").alias("_gm"))
        df = df.join(F.broadcast(gm), "itemid", "left") \
               .withColumn("group_name",
                           F.coalesce("_gm", "group_name")).drop("_gm")

    return df.select(
        F.col("group_name").cast("string"),
        F.col("hostid").cast("int"),
        F.col("host_name").cast("string"),
        F.col("itemid").cast("long"),
        F.col("item_name").cast("string"),
        F.col("trend_mean").cast("double"),
        F.col("trend_std").cast("double"),
        F.lit(int(created)).alias("created"),
        F.lit(-1).alias("clusterid"),
    )
