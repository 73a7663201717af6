"""JDBC source (S3-S5): pushdown, partitioned reads, parquet-equivalence.

Runs against embedded Apache Derby (jars ship inside pyspark). Pins the two
properties that matter at scale: the clock/key predicates execute IN the
database (starred PushedFilters on the JDBCRelation scan), and the scan can
be split into range-disjoint parallel queries (numPartitions)."""

import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.sources.jdbc import (
    seed_events_jdbc, read_metrics_jdbc,
)
from pyanomalydetector_spark.plans.pipeline import events_metrics


@pytest.fixture(scope="module")
def url(spark, sf_dir):
    return seed_events_jdbc(spark, sf_dir)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_jdbc_matches_parquet_source(spark, sf_dir, url):
    lo, hi = 1704500000, 1705000000
    via_jdbc = read_metrics_jdbc(spark, url, "metrics", lo, hi)
    via_parquet = events_metrics(spark, sf_dir).filter(
        (F.col("clock") >= lo) & (F.col("clock") <= hi))
    a = sorted(map(tuple, via_jdbc.collect()))
    b = sorted(map(tuple, via_parquet.collect()))
    assert a == b
    assert a


def test_jdbc_clock_predicate_pushed_into_database(spark, url):
    df = read_metrics_jdbc(spark, url, "metrics", 1704500000, 1705000000)
    plan = _plan(df)
    assert "JDBCRelation" in plan
    # starred filters = evaluated by the database, not re-checked by Spark
    assert "*GreaterThanOrEqual(clock,1704500000)" in plan
    assert "*LessThanOrEqual(clock,1705000000)" in plan


def test_jdbc_itemid_in_pushed_into_database(spark, url):
    df = read_metrics_jdbc(spark, url, "metrics",
                           1704500000, 1705000000, item_ids=[1, 2, 3])
    # the scan's PushedFilters metadata is elided at the default 100 chars
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        plan = _plan(df)
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    assert "*In(itemid" in plan
    got = {r["itemid"] for r in df.collect()}
    assert got <= {1, 2, 3}


def test_jdbc_partitioned_parallel_read(spark, url):
    lo, hi = 1704500000, 1705000000
    df = read_metrics_jdbc(spark, url, "metrics", lo, hi, num_partitions=4)
    assert "numPartitions=4" in _plan(df)
    assert df.rdd.getNumPartitions() == 4
    single = read_metrics_jdbc(spark, url, "metrics", lo, hi)
    assert sorted(map(tuple, df.collect())) == \
        sorted(map(tuple, single.collect()))


def test_verdict_sink_jdbc_round_trip(spark, sf_dir, url):
    """The reference persists detection results to database tables
    (models/anomalies.py upserts); the JDBC sink analog must round-trip
    check-suite verdicts bit-for-bit through the database."""
    from pyanomalydetector_spark.checks.core import (
        Check, run_checks,
    )
    from pyanomalydetector_spark.sources.jdbc import (
        read_table_jdbc, write_table_jdbc,
    )
    from pyanomalydetector_spark.sources.sequences import load_sequences

    seq = load_sequences(spark, sf_dir)
    res = run_checks(seq, [Check("uniq", "unique", {"key": "doc_id"})])
    verdicts = res.verdicts.select(
        "partition_id", "check_id",
        F.col("passed").cast("int").alias("passed"),
        F.col("n_violations").cast("bigint").alias("n_violations"))
    write_table_jdbc(verdicts, url, "verdict_sink")
    back = read_table_jdbc(spark, url, "verdict_sink")
    a = {tuple(r) for r in verdicts.collect()}
    b = {tuple(r) for r in back.select(*verdicts.columns).collect()}
    assert a == b and a
