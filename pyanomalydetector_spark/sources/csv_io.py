"""CSV source/sink — the reference's file-based connector family.

Reference: /root/reference/data_getter/csv_getter.py:25-69 reads gzipped CSV
with hand-coerced dtypes (``astype(int/float)``, csv_getter.py:35-39), filters
by time range and key set in pandas, and sorts; models/anomalies.py:122-127
imports a golden CSV back into a table. Spark-native recast:

- explicit ``StructType`` schemas, never inferred (SURVEY §1.2 — the
  reference re-asserts column lists on every read);
- gzip handled transparently by the datasource; time/key predicates are
  ordinary ``filter``s that Catalyst pushes into the scan;
- no eager sort: ordering is applied by the operator that needs it (W6 —
  only sequential window ops require order, and they sort within partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

HISTORY_SCHEMA = StructType([          # csv_getter.py:29 field list
    StructField("itemid", LongType()),
    StructField("clock", LongType()),
    StructField("value", DoubleType()),
])

TRENDS_SCHEMA = StructType([           # csv_getter.py:12 trends shape
    StructField("itemid", LongType()),
    StructField("clock", LongType()),
    StructField("value_min", DoubleType()),
    StructField("value_avg", DoubleType()),
    StructField("value_max", DoubleType()),
])


def read_metrics_csv(spark: SparkSession, path: str,
                     schema: StructType = HISTORY_SCHEMA,
                     startep: int | None = None, endep: int | None = None,
                     item_ids: list[int] | None = None,
                     header: bool = True) -> DataFrame:
    """S1/S2: CSV scan with explicit schema + pushed-down predicates.

    The reference's pandas-side filtering (csv_getter.py:60-65) becomes
    Catalyst filters over the scan; .gz paths decompress transparently.
    """
    df = spark.read.csv(path, schema=schema, header=header)
    if startep is not None:
        df = df.filter(F.col("clock") >= startep)
    if endep is not None:
        df = df.filter(F.col("clock") <= endep)
    if item_ids is not None:
        df = df.filter(F.col("itemid").isin(list(item_ids)))
    return df


def write_csv(df: DataFrame, path: str, header: bool = True,
              single_file: bool = False) -> None:
    """S12 export sink. ``single_file`` coalesces to one part (only for
    small result sets — violations, verdicts; never raw data)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").csv(path, header=header)
