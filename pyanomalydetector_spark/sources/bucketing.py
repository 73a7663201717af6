"""Bucketed-table layout: shuffle-free co-located joins on hot keys.

At 10¹²-sequence scale the same key joins recur constantly — doc_id for
token-invariant / dedup-cluster / violation-enrichment joins, itemid for
the detect-stage survivor narrowing. A shuffle on every join means moving
the corpus once per join; writing the table **bucketed** on that key moves
it ONCE at write time, after which every equi-join (and groupBy) on the
bucket key is shuffle-free: Spark's scan reports the bucket spec as its
output partitioning, EnsureRequirements inserts no Exchange, and two
tables bucketed the same way join bucket-to-bucket (the Hive/Spark
``CLUSTERED BY`` layout — the same role Iceberg's ``bucket(N, col)``
partition transform plays for the production north-rule table).

Spark requires the session catalog for bucket metadata (``saveAsTable``,
not path parquet), so callers pass a table name; the warehouse dir is the
session's ``spark-warehouse``. Plan-level guarantees are pinned in
tests/test_explain_plans.py::test_bucketed_join_is_shuffle_free.

Reference lineage: the reference keeps per-item history in database tables
keyed by itemid and always fetches/joins by that key
(/root/reference/models/history.py, db layer); bucketing is the
Spark-native realization of that access-path design at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 32, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket sorted) table.

    ``sortBy`` on the bucket key additionally makes merge joins between
    identically bucketed tables sort-free (no Sort below SortMergeJoin).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (the bucket spec rides along from the catalog;
    a plain ``spark.read.parquet`` of the same files would NOT know the
    layout and would re-shuffle)."""
    return spark.table(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Equi-join two identically bucketed tables on their bucket key —
    plans with zero shuffle Exchanges (asserted in tests)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), key, how)
