"""JDBC database source — the S3-S5 scans at production fidelity.

The reference reads history/trends straight from Postgres/MySQL with the
predicates pushed into SQL (zabbix_psql_getter.py:33-60 builds
``WHERE clock BETWEEN %s AND %s AND itemid IN (...)``;
zabbix_mysql_getter.py:33-120 likewise). This module is the Spark-native
equivalent with the same downstream contract as the parquet source
(``(itemid, clock, value)`` long-format metrics):

- ``spark.read.jdbc`` with the clock-range / key-set filters applied on the
  DataFrame so Catalyst pushes them into the JDBCRelation scan (the plan
  shows ``PushedFilters: [*GreaterThanOrEqual(clock, …)]`` — starred means
  evaluated by the database, not Spark; pinned by
  tests/test_jdbc_source.py).
- **Partitioned parallel reads**: ``partitionColumn=clock`` splits the scan
  into ``numPartitions`` range-disjoint queries so a 1000-executor cluster
  reads the table concurrently instead of through one connection — the JDBC
  analog of parquet split planning.

Tests run against embedded Apache Derby (its jars ship inside pyspark —
no install, no server); the code path is URL-generic, so a production
deployment only swaps the URL/driver for Postgres/MySQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

_JDBC_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "data", "jdbc")


def derby_url(db_dir: str, create: bool = True) -> str:
    return f"jdbc:derby:{db_dir}" + (";create=true" if create else "")


def write_table_jdbc(df: DataFrame, url: str, table: str,
                     driver: str = DERBY_DRIVER,
                     mode: str = "overwrite") -> None:
    """Upsert-style table load (S8 analog over JDBC): full overwrite here;
    production targets use the database's native MERGE via ``dbtable``
    staging + SQL, which Derby lacks."""
    df.write.format("jdbc").option("url", url).option("dbtable", table) \
        .option("driver", driver).mode(mode).save()


def read_table_jdbc(spark: SparkSession, url: str, table: str,
                    driver: str = DERBY_DRIVER) -> DataFrame:
    """Plain table read (sink round-trip / verification side of
    :func:`write_table_jdbc`)."""
    return spark.read.format("jdbc").option("url", url) \
        .option("dbtable", table).option("driver", driver).load()


def read_metrics_jdbc(spark: SparkSession, url: str, table: str,
                      startep: int | None = None, endep: int | None = None,
                      item_ids: list[int] | None = None,
                      driver: str = DERBY_DRIVER,
                      num_partitions: int = 1) -> DataFrame:
    """History/trends scan with reference-getter predicate semantics:
    ``clock BETWEEN startep AND endep`` and optional ``itemid IN (...)``,
    both pushed into the database; optionally range-partitioned on clock
    for parallel extraction."""
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table)
              .option("driver", driver))
    if num_partitions > 1 and startep is not None and endep is not None:
        reader = (reader.option("partitionColumn", "clock")
                  .option("lowerBound", int(startep))
                  .option("upperBound", int(endep) + 1)
                  .option("numPartitions", int(num_partitions)))
    df = reader.load()
    if startep is not None:
        df = df.filter(F.col("clock") >= int(startep))
    if endep is not None:
        df = df.filter(F.col("clock") <= int(endep))
    if item_ids:
        df = df.filter(F.col("itemid").isin([int(i) for i in item_ids]))
    return df


def seed_events_jdbc(spark: SparkSession, sf_dir: str) -> str:
    """One-time load of the events metrics into an embedded Derby database
    for ``sf_dir``; returns the JDBC URL. Idempotent via a marker file."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    db_dir = os.path.join(_JDBC_ROOT, f"{tag}_db")
    marker = os.path.join(_JDBC_ROOT, f"{tag}_db.seeded")
    url = derby_url(db_dir)
    if os.path.exists(marker):
        return url
    os.makedirs(_JDBC_ROOT, exist_ok=True)

    from pyanomalydetector_spark.plans.pipeline import events_metrics
    write_table_jdbc(events_metrics(spark, sf_dir), url, "metrics")
    with open(marker, "w") as f:
        f.write(sf_dir)
    return url
