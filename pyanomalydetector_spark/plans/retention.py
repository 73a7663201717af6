"""Retention eviction — the reference's delete-old-data discipline (S9/T7).

Reference: /root/reference/models/history.py:51-53 (``DELETE WHERE clock <
X``), models/anomalies.py:89-91 (``created < endep - anomaly_keep_secs``),
driven from detector.py:117,143-145. In production this is Iceberg
``DELETE FROM t WHERE clock < X`` (metadata-only when the predicate aligns
with partition boundaries) plus ``expire_snapshots``; on the sandbox's plain
parquet state directories it is a filtered rewrite with an atomic directory
swap — same contract: readers only ever see a fully-retained or fully-evicted
view, never a partial delete.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def evict_older_than(spark: SparkSession, table_dir: str, clock_col: str,
                     cutoff: int) -> int:
    """Delete rows with ``clock_col < cutoff`` from a parquet state dir.

    Returns the number of evicted rows. Rewrite goes to a sibling temp dir,
    then a rename swap — a crash before the first rename leaves the
    original intact; between the two renames the directory is briefly
    absent but the prior state survives under ``.old-*`` for hand recovery
    (POSIX cannot swap two directories atomically).

    NULL-SAFE: the contract is the reference's ``DELETE WHERE clock < X``
    (models/history.py:51-53) — a NULL clock is not ``< X`` and therefore
    survives. The keep-side filter must say so explicitly: plain
    ``clock >= cutoff`` is NULL for a NULL clock and would silently evict
    undated rows, the opposite of the SQL it mirrors.
    """
    df = spark.read.parquet(table_dir)
    total = df.count()
    kept = df.filter(F.col(clock_col).isNull() | (F.col(clock_col) >= cutoff))
    n_kept = kept.count()
    if n_kept == total:
        return 0

    parent = os.path.dirname(os.path.abspath(table_dir))
    tmp = os.path.join(parent, f".evict-{uuid.uuid4().hex}")
    kept.write.mode("overwrite").parquet(tmp)
    old = os.path.join(parent, f".old-{uuid.uuid4().hex}")
    os.rename(table_dir, old)
    os.rename(tmp, table_dir)
    shutil.rmtree(old, ignore_errors=True)
    return total - n_kept


def retention_cutoff(endep: int, interval: int, retention: int) -> int:
    """detector.py:117 — history older than ``startep − interval`` expires."""
    return endep - interval * retention - interval
