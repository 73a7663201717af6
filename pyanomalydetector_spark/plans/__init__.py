from pyanomalydetector_spark.plans.pipeline import (
    ENDEP, events_metrics, split_windows, detect_pipeline,
)

__all__ = ["ENDEP", "events_metrics", "split_windows", "detect_pipeline"]
