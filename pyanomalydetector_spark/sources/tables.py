"""Schema-pinned parquet scans.

The reference re-asserts fixed column lists on every read
(/root/reference/data_getter/csv_getter.py:29, 35-39 — ``df.columns = fields``
plus forced ``astype`` casts). The Spark-native equivalent is a declared scan:
``spark.read.parquet`` keeps the parquet footer schema, Catalyst prunes columns
and pushes filter predicates to the scan (visible as ``PushedFilters`` /
``ReadSchema`` in ``.explain``), so callers just ``select``/``filter``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic benchmark table from ``sf_dir``.

    Columnar parquet scan: column pruning + predicate pushdown are free via
    Catalyst (reference equivalent: hand-written SQL WHERE/SELECT lists,
    /root/reference/data_getter/zabbix_psql_getter.py:33-60).
    """
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
