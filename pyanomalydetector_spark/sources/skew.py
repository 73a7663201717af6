"""Deliberately-skewed sequence fixtures — the north rule's skew evidence.

Two deterministically generated variants of the sequence table:

- **uniform**: rows spread evenly over ``n_sources`` partitions, unique
  doc_ids.
- **skewed**: one partition (``src_hot``) holds 50% of all rows, AND one
  hot doc_id (``doc_hot``) is duplicated on 20% of all rows — the classic
  hot-partition + hot-key combination that breaks naive groupBys and joins.

The engine's defenses under test (tests/test_skew.py, BENCH skew extras):
uniqueness/referential aggregate via hash-partitioned map-side combine (the
hot key's reducer sees #map-tasks partials, not #duplicates — checks/
core.py:_check_unique docstring), and AQE skew-join splits oversized join
partitions (session.py enables spark.sql.adaptive.skewJoin).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "data", "skew")


def _base(spark: SparkSession, n_rows: int, n_sources: int) -> DataFrame:
    ids = spark.range(n_rows)
    tokens = F.transform(
        F.sequence(F.lit(1), 4 + F.pmod("id", F.lit(5)).cast("int")),
        lambda i: (F.pmod(F.col("id") * 31 + i, F.lit(50257))).cast("int"))
    return ids.select(
        F.concat(F.lit("doc_"), F.col("id")).alias("doc_id"),
        tokens.alias("tokens"),
        (4 + F.pmod("id", F.lit(5))).cast("int").alias("n_tok"),
        F.concat(F.lit("src"), F.pmod("id", F.lit(n_sources))).alias("source"),
    )


def synthesize_skew_pair(spark: SparkSession, n_rows: int = 1_000_000,
                         n_sources: int = 20,
                         force: bool = False) -> tuple[str, str]:
    """Materialize (uniform_path, skewed_path) parquet fixtures (cached)."""
    os.makedirs(_CACHE_ROOT, exist_ok=True)
    uni = os.path.join(_CACHE_ROOT, f"uniform_{n_rows}.parquet")
    skw = os.path.join(_CACHE_ROOT, f"skewed_{n_rows}.parquet")

    if force or not os.path.exists(uni):
        _base(spark, n_rows, n_sources).write.mode("overwrite").parquet(uni)
    if force or not os.path.exists(skw):
        base = _base(spark, n_rows, n_sources)
        skewed = base.select(
            # 20% of ALL rows collapse onto one hot doc_id
            F.when(F.expr("CAST(substring(doc_id, 5, 20) AS BIGINT) % 5 = 0"),
                   F.lit("doc_hot")).otherwise(F.col("doc_id")).alias("doc_id"),
            "tokens", "n_tok",
            # one partition holds 50% of all rows
            F.when(F.expr("CAST(substring(doc_id, 5, 20) AS BIGINT) % 2 = 0"),
                   F.lit("src_hot")).otherwise(F.col("source")).alias("source"),
        )
        skewed.write.mode("overwrite").parquet(skw)
    return uni, skw
