"""Tumbling-window rollup: history → trends envelopes.

Reference: /root/reference/data_getter/logan_getter.py:253-268 —
``clock -= clock % trends_interval; groupby(itemid, clock).agg(mean/min/max,
count)``. One hash aggregate; at scale the integer-division bucketing keeps
partition pruning usable (bucket is derivable from the partition column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_rollup(df: DataFrame, interval: int,
                    itemid_col: str = "itemid", clock_col: str = "clock",
                    value_col: str = "value") -> DataFrame:
    """(itemid, clock, value) → (itemid, clock, value_min, value_avg,
    value_max, value_cnt) with clock floored to the interval grid."""
    bucket = (F.col(clock_col) - F.pmod(F.col(clock_col), F.lit(interval))) \
        .alias("clock")
    return (
        df.groupBy(F.col(itemid_col).alias("itemid"), bucket)
          .agg(F.min(value_col).alias("value_min"),
               F.avg(value_col).alias("value_avg"),
               F.max(value_col).alias("value_max"),
               F.count(value_col).alias("value_cnt"))
    )
