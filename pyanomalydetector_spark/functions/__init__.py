from pyanomalydetector_spark.functions.stats import (
    sufficient_stats,
    finalize_mean_std,
    merge_stats,
    retract_stats,
    welford_stats,
)

__all__ = [
    "sufficient_stats",
    "finalize_mean_std",
    "merge_stats",
    "retract_stats",
    "welford_stats",
]
