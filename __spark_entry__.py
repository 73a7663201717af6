"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``  — flagship: run the full check suite over the synthesized
                    sequence table at sf0.001, return the verdicts DataFrame.
``queries()``     — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()``  — DuckDB-equivalent ANSI SQL per query.

The sequence table (doc_id, tokens array<int32>, n_tok, source) is synthesized
deterministically from ``documents.parquet`` by pure-Python md5 tokenization
(pyanomalydetector_spark/sources/sequences.py), so Spark and DuckDB read the
SAME parquet bytes — oracles reference it via read_parquet().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyanomalydetector_spark.sources.sequences import (  # noqa: E402
    load_sequences, synthesize_sequences, sequences_parquet_path,
)
from pyanomalydetector_spark.functions.stats import (  # noqa: E402
    sufficient_stats, finalize_mean_std,
)
from pyanomalydetector_spark.checks.core import (  # noqa: E402
    Check, run_checks, default_suite,
)
from pyanomalydetector_spark.checks.drift import (  # noqa: E402
    psi_by_partition, ks_by_partition,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

ALLOWED_SOURCE_RE = "^src[0-9]+$"  # the valid source universe (fixture defect: src_unknown)

# Correctness runs at sf0.01 — pin the oracle's parquet path and synthesize
# eagerly so the DuckDB side always finds it.
_SEQ_SQL_PATH = synthesize_sequences(SF01)
_SEQ = f"read_parquet('{_SEQ_SQL_PATH}')"


def _allowed_sources(seq: DataFrame) -> list[str]:
    return sorted(
        r["source"]
        for r in seq.select("source").distinct()
                    .filter(F.col("source").rlike(ALLOWED_SOURCE_RE)).collect()
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full check suite on sf0.001; returns per-partition verdicts."""
    seq = load_sequences(spark, SF001)
    res = run_checks(seq, default_suite(_allowed_sources(seq)))
    return res.verdicts


# --------------------------------------------------------------- queries ----

def _q_seq_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3: per-partition sufficient stats → mean/std (reference stats.py:75-135)."""
    seq = load_sequences(spark, sf_dir)
    out = finalize_mean_std(sufficient_stats(seq, ["source"], "n_tok"))
    return out.select(
        F.col("source").alias("partition_id"),
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("sum").cast("bigint").alias("sum_n_tok"),
        F.round("mean", 6).alias("mean_n_tok"),
        F.round("std", 6).alias("std_n_tok"),
    )


def _q_seq_unique_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniqueness check (salted two-phase groupBy) — duplicate doc_ids."""
    seq = load_sequences(spark, sf_dir)
    res = run_checks(seq, [Check("uniq", "unique", {"key": "doc_id"})])
    return res.violations.select(
        "partition_id", "doc_id",
        F.col("observed").cast("bigint").alias("dup_cnt"),
    )


def _q_seq_referential_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential check: source ∉ allowed dimension (broadcast anti-join)."""
    seq = load_sequences(spark, sf_dir)
    res = run_checks(seq, [Check("ref", "referential",
                                 {"column": "source",
                                  "allowed": _allowed_sources(seq)})])
    return res.violations.select("partition_id", "doc_id",
                                 F.col("observed").alias("bad_source"))


def _q_seq_ntok_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata invariant n_tok == size(tokens)."""
    seq = load_sequences(spark, sf_dir)
    res = run_checks(seq, [Check("ntok", "n_tok_consistency", {})])
    return res.violations.select(
        "partition_id", "doc_id",
        F.col("observed").cast("bigint").alias("declared_n_tok"),
        F.col("expected").cast("bigint").alias("actual_n_tok"),
    )


def _q_seq_zscore_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """detect1 semantics (detector.py:211,218) as per-partition verdicts."""
    seq = load_sequences(spark, sf_dir)
    res = run_checks(seq, [Check("z", "zscore_threshold",
                                 {"value_col": "n_tok", "lambda": 2.0,
                                  "ignore_diff_rate": 0.1})])
    return res.verdicts.select(
        "partition_id",
        F.col("passed").cast("int").alias("passed"),
        F.round("observed", 6).alias("observed"),
        F.round("expected", 6).alias("expected"),
        F.round("threshold", 6).alias("threshold"),
    )


def _q_seq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of per-partition n_tok distribution vs whole-table baseline."""
    seq = load_sequences(spark, sf_dir)
    return psi_by_partition(seq, "source", "n_tok", n_buckets=10) \
        .select("partition_id", F.round("psi", 6).alias("psi"))


def _q_seq_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS D of per-partition n_tok distribution vs baseline."""
    seq = load_sequences(spark, sf_dir)
    return ks_by_partition(seq, "source", "n_tok") \
        .select("partition_id", F.round("ks_d", 6).alias("ks_d"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "seq_column_stats": _q_seq_column_stats,
        "seq_unique_violations": _q_seq_unique_violations,
        "seq_referential_violations": _q_seq_referential_violations,
        "seq_ntok_consistency": _q_seq_ntok_consistency,
        "seq_zscore_verdict": _q_seq_zscore_verdict,
        "seq_drift_psi": _q_seq_drift_psi,
        "seq_drift_ks": _q_seq_drift_ks,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "seq_column_stats": f"""
            SELECT source AS partition_id,
                   COUNT(*) AS cnt,
                   CAST(SUM(n_tok) AS BIGINT) AS sum_n_tok,
                   ROUND(AVG(n_tok), 6) AS mean_n_tok,
                   ROUND(COALESCE(STDDEV_SAMP(n_tok), 0), 6) AS std_n_tok
            FROM {_SEQ}
            GROUP BY source
        """,
        "seq_unique_violations": f"""
            SELECT source AS partition_id, doc_id, COUNT(*) AS dup_cnt
            FROM {_SEQ}
            GROUP BY source, doc_id
            HAVING COUNT(*) > 1
        """,
        "seq_referential_violations": f"""
            SELECT source AS partition_id, doc_id, source AS bad_source
            FROM {_SEQ}
            WHERE NOT regexp_matches(source, '{ALLOWED_SOURCE_RE}')
        """,
        "seq_ntok_consistency": f"""
            SELECT source AS partition_id, doc_id,
                   CAST(n_tok AS BIGINT) AS declared_n_tok,
                   CAST(len(tokens) AS BIGINT) AS actual_n_tok
            FROM {_SEQ}
            WHERE n_tok <> len(tokens)
        """,
        "seq_zscore_verdict": f"""
            WITH base AS (
                SELECT AVG(n_tok) AS m, COALESCE(STDDEV_SAMP(n_tok), 0) AS s
                FROM {_SEQ}
            ),
            p AS (
                SELECT source AS partition_id, AVG(n_tok) AS mh
                FROM {_SEQ} GROUP BY source
            )
            SELECT partition_id,
                   CASE WHEN ABS(mh - m) > 2.0 * s AND m > 0
                             AND ABS(mh - m) / m > 0.1
                        THEN 0 ELSE 1 END AS passed,
                   ROUND(mh, 6) AS observed,
                   ROUND(m, 6) AS expected,
                   ROUND(2.0 * s, 6) AS threshold
            FROM p, base
        """,
        "seq_drift_psi": f"""
            WITH bounds AS (
                SELECT CAST(MIN(n_tok) AS DOUBLE) AS lo,
                       CAST(MAX(n_tok) AS DOUBLE) AS hi
                FROM {_SEQ}
            ),
            b AS (
                SELECT source,
                       CASE WHEN hi = lo THEN 0
                            ELSE LEAST(GREATEST(CAST(FLOOR(
                                 (CAST(n_tok AS DOUBLE) - lo) / ((hi - lo) / 10)
                               ) AS BIGINT), 0), 9) END AS bucket
                FROM {_SEQ}, bounds
            ),
            grid AS (
                SELECT p.source, g.bucket
                FROM (SELECT DISTINCT source FROM {_SEQ}) p,
                     (SELECT UNNEST(generate_series(0, 9)) AS bucket) g
            ),
            pc AS (SELECT source, bucket, COUNT(*) AS c_p FROM b GROUP BY 1, 2),
            bc AS (SELECT bucket, COUNT(*) AS c_b FROM b GROUP BY 1),
            tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM {_SEQ}),
            j AS (
                SELECT grid.source, grid.bucket,
                       COALESCE(pc.c_p, 0) AS c_p, COALESCE(bc.c_b, 0) AS c_b
                FROM grid
                LEFT JOIN pc ON grid.source = pc.source AND grid.bucket = pc.bucket
                LEFT JOIN bc ON grid.bucket = bc.bucket
            ),
            np AS (SELECT source, CAST(SUM(c_p) AS DOUBLE) AS n_p FROM j GROUP BY 1)
            SELECT j.source AS partition_id,
                   ROUND(SUM(
                     ((c_p + 0.5) / (n_p + 5.0) - (c_b + 0.5) / (n + 5.0))
                     * LN(((c_p + 0.5) / (n_p + 5.0)) / ((c_b + 0.5) / (n + 5.0)))
                   ), 6) AS psi
            FROM j JOIN np ON j.source = np.source, tot
            GROUP BY j.source
        """,
        "seq_drift_ks": f"""
            WITH vals AS (SELECT DISTINCT CAST(n_tok AS DOUBLE) AS v FROM {_SEQ}),
            parts AS (SELECT DISTINCT source FROM {_SEQ}),
            grid AS (SELECT source, v FROM parts, vals),
            pc AS (
                SELECT source, CAST(n_tok AS DOUBLE) AS v, COUNT(*) AS c_p
                FROM {_SEQ} GROUP BY 1, 2
            ),
            bc AS (
                SELECT CAST(n_tok AS DOUBLE) AS v, COUNT(*) AS c_b
                FROM {_SEQ} GROUP BY 1
            ),
            j AS (
                SELECT grid.source, grid.v,
                       COALESCE(c_p, 0) AS c_p, COALESCE(c_b, 0) AS c_b
                FROM grid
                LEFT JOIN pc ON grid.source = pc.source AND grid.v = pc.v
                LEFT JOIN bc ON grid.v = bc.v
            ),
            c AS (
                SELECT source,
                       CAST(SUM(c_p) OVER (PARTITION BY source ORDER BY v) AS DOUBLE)
                         / SUM(c_p) OVER (PARTITION BY source) AS cdf_p,
                       CAST(SUM(c_b) OVER (PARTITION BY source ORDER BY v) AS DOUBLE)
                         / SUM(c_b) OVER (PARTITION BY source) AS cdf_b
                FROM j
            )
            SELECT source AS partition_id,
                   ROUND(MAX(ABS(cdf_p - cdf_b)), 6) AS ks_d
            FROM c GROUP BY source
        """,
    }
