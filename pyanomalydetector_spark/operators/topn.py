"""Top-N per group.

Reference: /root/reference/data_processing/detector.py:598 —
``groupby('hostid').apply(lambda x: x.nlargest(top_n, 'item_count'))``.
Spark: rank over a partitioned window — no Python, no per-group apply.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(df: DataFrame, group_cols: Sequence[str],
                    order_col: str, n: int,
                    tiebreak_cols: Sequence[str] = ()) -> DataFrame:
    """Keep the n largest rows by ``order_col`` within each group.

    ``tiebreak_cols`` make the selection deterministic when ``order_col``
    ties (pandas nlargest keeps first occurrence; we require an explicit,
    stable tiebreak instead of row order, which is undefined in a
    distributed shuffle).
    """
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
          .filter(F.col("_rn") <= n)
          .drop("_rn")
    )
