"""CSV connector (S1/S2/S12) + retention eviction (S9/T7)."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.sources.csv_io import (
    read_metrics_csv, write_csv, HISTORY_SCHEMA,
)
from pyanomalydetector_spark.plans.retention import (
    evict_older_than, retention_cutoff,
)


def test_csv_roundtrip_with_gzip_and_filters(spark, tmp_path):
    raw = "itemid,clock,value\n" + "\n".join(
        f"{i % 4},{100 + i},{i * 1.5}" for i in range(40))
    p = tmp_path / "h.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write(raw)

    df = read_metrics_csv(spark, str(p), startep=110, endep=130,
                          item_ids=[1, 2])
    rows = df.collect()
    assert rows
    assert all(110 <= r["clock"] <= 130 and r["itemid"] in (1, 2)
               for r in rows)
    assert df.schema == HISTORY_SCHEMA
    # csv-getter semantics: types coerced by schema, not inferred
    assert dict(df.dtypes)["value"] == "double"


def test_csv_filters_reach_the_scan(spark, tmp_path):
    p = tmp_path / "h.csv"
    p.write_text("itemid,clock,value\n1,5,1.0\n2,50,2.0\n")
    df = read_metrics_csv(spark, str(p), startep=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "Filter" in plan


def test_write_csv_single_file(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    out = str(tmp_path / "out")
    write_csv(df, out, single_file=True)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1
    back = spark.read.csv(out, header=True)
    assert back.count() == 2


def test_evict_older_than_atomic_swap(spark, tmp_path):
    d = str(tmp_path / "state")
    spark.createDataFrame([(i, 100 + i, float(i)) for i in range(20)],
                          "itemid long, clock long, value double") \
         .write.parquet(d)
    n = evict_older_than(spark, d, "clock", cutoff=110)
    assert n == 10
    left = spark.read.parquet(d)
    assert left.count() == 10
    assert left.agg(F.min("clock")).collect()[0][0] == 110
    # idempotent when nothing to evict
    assert evict_older_than(spark, d, "clock", cutoff=110) == 0


def test_retention_cutoff_formula():
    # detector.py:117: remove data older than startep - interval
    assert retention_cutoff(endep=1000, interval=10, retention=5) == 940


def test_evict_keeps_null_clock_rows(spark, tmp_path):
    """The contract is the reference's `DELETE WHERE clock < X`: a NULL
    clock is not < X, so undated rows SURVIVE eviction (pre-fix, the
    keep-side `clock >= cutoff` filter was NULL for them and they were
    silently deleted)."""
    d = str(tmp_path / "state_null")
    spark.createDataFrame(
        [(1, 100, 1.0), (2, None, 2.0), (3, 120, 3.0)],
        "itemid long, clock long, value double").write.parquet(d)
    assert evict_older_than(spark, d, "clock", cutoff=110) == 1
    left = spark.read.parquet(d)
    assert {r["itemid"] for r in left.collect()} == {2, 3}
    # and the NULL row never counts as evictable on a second pass
    assert evict_older_than(spark, d, "clock", cutoff=110) == 0
