"""End-to-end detection pipeline over the ``events`` stream table.

Maps the benchmark ``events`` table onto the reference's data model
(itemid=user_id, clock=epoch(ts), value=value — the reference's universal
long-format row, /root/reference/data_getter/data_getter.py:37-40), splits
history/trend windows around a pinned ``ENDEP`` (the reference pins
``endep=1739505598`` in its detector tests, tests/test_detector_all.py:20-53),
and runs the detect1→2→3 cascade.

Window layout (config-derived, mirrors README.md:4 "recent vs past"):
- trends window  [ENDEP − trends_interval·trends_retention, h_start)
  rolled into 1-day envelopes (logan_getter.py:253-268 semantics)
- history window [h_start, ENDEP] raw
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanomalydetector_spark.operators.detect import DetectorConfig, detect_cascade
from pyanomalydetector_spark.operators.rollup import tumbling_rollup
from pyanomalydetector_spark.sources.tables import load_table

# 2024-01-31 00:00:00 UTC — just past the last event in the synthetic table
ENDEP = 1706659200


def events_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → (itemid, clock, value). unix_timestamp truncates to seconds,
    matching the oracle's CAST(FLOOR(epoch(ts)) AS BIGINT)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").alias("itemid"),
        F.unix_timestamp("ts").alias("clock"),
        F.col("value").cast("double").alias("value"),
    )


def split_windows(metrics: DataFrame, cfg: DetectorConfig,
                  endep: int = ENDEP) -> tuple[DataFrame, DataFrame, int, int, int]:
    """Split into (history_df, trends_env_df) around endep; also return the
    base-clock grid sizes detect3 uses as count denominators
    (detector.py:526, 544-545) and startep2."""
    h_start = endep - cfg.history_interval * cfg.history_retention
    t_start = endep - cfg.trends_interval * cfg.trends_retention
    startep2 = endep - cfg.history_interval * cfg.history_recent_retention

    history = metrics.filter((F.col("clock") >= h_start) & (F.col("clock") <= endep))
    trends_src = metrics.filter((F.col("clock") >= t_start) & (F.col("clock") < h_start))
    trends = tumbling_rollup(trends_src, cfg.trends_interval)

    def grid_count(lo: int, hi: int, unit: int) -> int:
        lo -= lo % unit
        hi -= hi % unit
        return (hi - lo) // unit + 1

    hist_count = grid_count(t_start, endep, cfg.history_interval)
    base_lo = t_start - (t_start % cfg.history_interval)
    clocks2 = [c for c in range(base_lo, endep - (endep % cfg.history_interval) + 1,
                                cfg.history_interval) if c >= startep2]
    hist_count2 = len(clocks2)
    return history, trends, hist_count, hist_count2, startep2


def detect_pipeline(spark: SparkSession, sf_dir: str,
                    cfg: DetectorConfig | None = None,
                    endep: int = ENDEP) -> DataFrame:
    """Full cascade over events; returns the surviving anomaly key set."""
    cfg = cfg or DetectorConfig()
    metrics = events_metrics(spark, sf_dir)
    history, trends, hist_count, hist_count2, startep2 = \
        split_windows(metrics, cfg, endep)
    return detect_cascade(history, trends, history, cfg,
                          hist_count, hist_count2, startep2)
