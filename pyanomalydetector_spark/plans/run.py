"""Config-driven detection runs — the ``detect_anomalies.run`` analog.

Reference: detect_anomalies.py:53-126 — iterate ``conf['data_sources']``,
build a detector from each source's cascaded config, run the requested
detection stages with survivor chaining, and return
``{data_source_name: [anomaly itemids]}``. This module is the Spark-native
equivalent driven by the YAML loader (plans/config.py): a user of the
reference switches by pointing ``data_dir`` at their table directory and
keeping their YAML thresholds.

Per-item condition rules (item_conds) are applied to the final survivor set
against the per-item stats frame, mirroring _filter_by_conds
(detector.py:234-270) — there judged on ``mean_h``; rules may name another
metric explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanomalydetector_spark.plans.config import (
    conditions_from_config, detector_config_from_source,
)
from pyanomalydetector_spark.plans.pipeline import ENDEP, detect_pipeline

STAGE_DETECT1, STAGE_DETECT2, STAGE_DETECT3, STAGE_DETECT4 = 1, 2, 3, 4


def run_detection(spark: SparkSession, conf: dict,
                  endep: int = ENDEP,
                  detection_stages: tuple[int, ...] = (1, 2, 3, 4),
                  catalog_df: DataFrame | None = None,
                  stats_df: DataFrame | None = None) -> dict[str, list]:
    """Run the configured stages for every data source; returns the
    reference-shaped anomalies map ``{source_name: sorted itemids}``.

    ``catalog_df``/``stats_df`` feed the item_conds rules when provided
    (filter over the catalog, metric judged on the stats frame)."""
    anomalies: dict[str, list] = {}
    for name, src in (conf.get("data_sources") or {}).items():
        cfg = detector_config_from_source(src)
        sf_dir = src.get("data_dir")
        if not sf_dir:
            raise ValueError(f"data source {name!r} has no data_dir")
        survivors = detect_pipeline(spark, sf_dir, cfg, endep,
                                    stages=tuple(detection_stages))

        conds = conditions_from_config({"item_conds": src.get("item_conds")})
        if conds and catalog_df is not None and stats_df is not None:
            from pyanomalydetector_spark.operators.conditions import (
                apply_conditions,
            )
            kept = apply_conditions(stats_df, catalog_df, conds)
            survivors = survivors.join(kept, "itemid", "left_semi")

        anomalies[name] = sorted(
            r["itemid"] for r in survivors.select("itemid").collect())
    return anomalies
