"""Mergeable sufficient statistics — the reference's core aggregate.

Reference semantics (/root/reference/data_processing/stats.py):
- partial aggregate per key: ``sum, sqr_sum=Σx², cnt``   (stats.py:75-79)
- merge (window advance): add new partials                (stats.py:88-98)
- retract (window slide): subtract expired partials       (stats.py:107-124)
- finalize: ``mean = sum/cnt``;
  ``std = sqrt((sqr_sum − sum²/cnt) / (cnt−1))``  — Bessel-corrected to match
  pandas ``std()``, then inf/NaN scrubbed to 0               (stats.py:130-135)

Spark-native realization: one hash aggregate (map-side partial + final — Spark
does the two-phase combine the reference hand-rolls with ``batch_size`` loops),
all arithmetic JVM-side in whole-stage codegen. A Welford/Chan ``applyInPandas``
variant is provided because the north-star mandates a vectorized Arrow UDAF
path; both are tested equal.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def sufficient_stats(df: DataFrame, keys: Sequence[str], value_col: str = "value") -> DataFrame:
    """groupBy(keys).agg(sum, sqr_sum, cnt) — partial sufficient statistics.

    Reference: stats.py:75-79 (pandas groupby + custom ``square_sum`` agg,
    utils/__init__.py:22-23). Spark's hash aggregate does map-side combine, so
    this is shuffle-light: only (keys, 3 doubles) cross the wire.
    """
    v = F.col(value_col).cast("double")
    return df.groupBy(*keys).agg(
        F.sum(v).alias("sum"),
        F.sum(v * v).alias("sqr_sum"),
        F.count(v).alias("cnt"),
    )


def _scrubbed(col: Column) -> Column:
    """Replicate the reference's inf/NaN→0 scrub (stats.py:133-135).

    Also maps NULL→0 so the formulas are safe under ANSI mode (Spark 4
    default), where ``try_divide`` yields NULL instead of raising.
    """
    return F.when(col.isNull() | F.isnan(col)
                  | col.isin(float("inf"), float("-inf")), F.lit(0.0)) \
            .otherwise(col)


def finalize_mean_std(stats: DataFrame) -> DataFrame:
    """Derive mean/std from sufficient stats with exact reference semantics.

    stats.py:129-135: drop cnt<=0 rows; mean = sum/cnt; Bessel std; std that
    comes out inf/NaN (cnt==1 → division by zero; negative radicand from float
    cancellation → NaN) becomes 0. Written with ``try_divide`` + ``when``
    guards so the same values come out whether or not ANSI mode is enabled.
    """
    stats = stats.filter(F.col("cnt") > 0)
    mean = F.try_divide(F.col("sum"), F.col("cnt").cast("double"))
    var = F.try_divide(
        F.col("sqr_sum") - F.try_divide(F.col("sum") * F.col("sum"),
                                        F.col("cnt").cast("double")),
        (F.col("cnt") - 1).cast("double"))
    std = F.when(F.col("cnt") > 1, F.sqrt(var)).otherwise(F.lit(0.0))
    return (
        stats.withColumn("mean", _scrubbed(mean))
             .withColumn("std", _scrubbed(std))
    )


def _outer_combine(state: DataFrame, other: DataFrame, keys: Sequence[str],
                   sign: int) -> DataFrame:
    """Shared full-outer merge/retract kernel, NULL-SAFE on the keys.

    ``join(on=keys)`` uses plain equality, under which a NULL key never
    matches itself — two batches each carrying a NULL-key partial (which
    ``sufficient_stats``'s groupBy happily emits as a group) would
    accumulate as two separate NULL-key state rows, silently diverging
    from the single merged row a from-scratch recompute (or the
    reference's pandas merge, which DOES join NaN keys) produces. The
    join keys are therefore ``eqNullSafe`` and the output key is the
    coalesce of the two sides. Null-safe equi-keys still hash-join.
    """
    keys = list(keys)
    o = other.select(*[F.col(k).alias(f"_k_{k}") for k in keys],
                     F.col("sum").alias("_sum_o"),
                     F.col("sqr_sum").alias("_sqr_o"),
                     F.col("cnt").alias("_cnt_o"))
    s = state.select(*keys, "sum", "sqr_sum", "cnt")
    cond = None
    for k in keys:
        c = s[k].eqNullSafe(o[f"_k_{k}"])
        cond = c if cond is None else (cond & c)
    joined = s.join(o, cond, "full_outer")
    z, zl, sg = F.lit(0.0), F.lit(0), F.lit(float(sign))
    return joined.select(
        *[F.coalesce(s[k], o[f"_k_{k}"]).alias(k) for k in keys],
        (F.coalesce("sum", z) + sg * F.coalesce("_sum_o", z)).alias("sum"),
        (F.coalesce("sqr_sum", z)
         + sg * F.coalesce("_sqr_o", z)).alias("sqr_sum"),
        (F.coalesce(F.col("cnt").cast("long"), zl) +
         F.lit(sign) * F.coalesce(F.col("_cnt_o").cast("long"), zl))
        .alias("cnt"),
    )


def merge_stats(state: DataFrame, new: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Add new partial aggregates into persisted state (window advance).

    Reference: stats.py:88-98 — inner merge + add, but keys absent from state
    must still be kept (the reference handles them via its existing/nonexisting
    key split, models/model.py:49-65); a full-outer join + coalesce folds both
    paths into one distributed op (NULL-safe on the keys — see
    :func:`_outer_combine`). At production scale this is the MERGE INTO
    against the Iceberg checkpoint table.
    """
    return _outer_combine(state, new, keys, +1)


def retract_stats(state: DataFrame, expired: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Subtract expired partial aggregates (window slide / retraction).

    Reference: stats.py:107-124 — outer merge, fillna(0), subtract. Spark has
    no built-in aggregate retraction; this join-and-subtract is the distributed
    equivalent (NULL-safe keys, :func:`_outer_combine`), idempotent when
    driven by the checkpoint's watermark.
    """
    return _outer_combine(state, expired, keys, -1)


def welford_stats(df: DataFrame, keys: Sequence[str], value_col: str = "value") -> DataFrame:
    """Welford/Chan streaming stats as a vectorized Arrow UDAF (applyInPandas).

    North-star-mandated alternative path: numerically stabler than the naive
    sqr_sum formula for huge counts (catastrophic cancellation when
    std << mean). Per-group state is O(1); Arrow batches keep it vectorized —
    no per-row Python. Produces the same (sum, sqr_sum, cnt, mean, std) contract
    as :func:`finalize_mean_std` (with the same inf/NaN→0 scrub).
    """
    keys = list(keys)
    schema_fields = ", ".join(
        f"`{k}` {df.schema[k].dataType.simpleString()}" for k in keys
    )
    out_schema = StructType.fromDDL(
        f"{schema_fields}, sum double, sqr_sum double, cnt long, mean double, std double"
    )

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        x = pdf[value_col].astype("float64").to_numpy()
        x = x[~np.isnan(x)]
        n = int(x.size)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        if n == 0:
            return pd.DataFrame({**row, "sum": [0.0], "sqr_sum": [0.0],
                                 "cnt": [0], "mean": [0.0], "std": [0.0]})
        # Chan one-pass within the Arrow batch (vectorized):
        mean = float(x.mean())
        m2 = float(((x - mean) ** 2).sum())
        std = float(np.sqrt(m2 / (n - 1))) if n > 1 else 0.0
        if not np.isfinite(std):
            std = 0.0
        return pd.DataFrame({**row,
                             "sum": [float(x.sum())],
                             "sqr_sum": [float((x * x).sum())],
                             "cnt": [n],
                             "mean": [mean if np.isfinite(mean) else 0.0],
                             "std": [std]})

    return df.select(*keys, value_col).groupBy(*keys).applyInPandas(agg, out_schema)


def length_percentiles(df, keys: list[str], value_col: str,
                       ps: tuple = (0.5, 0.9, 0.99),
                       exact: bool = True):
    """Per-group distribution percentiles of ``value_col`` (p50/p90/p99 of
    token lengths is a standard training-corpus health metric).

    ``exact=True`` uses ``percentile`` (linear interpolation — matches
    DuckDB ``quantile_cont`` bit-for-bit, the oracle path); its sort-based
    aggregation buffers each group's values, so at 10¹²-row scale use
    ``exact=False``: ``approx_percentile`` keeps a bounded mergeable sketch
    per group (map-side combinable — the same shuffle shape as the moment
    aggregates), accuracy pinned vs exact in tests/test_stats.py.
    Returns one row per group with ``p_<pct>`` columns.
    """
    from pyspark.sql import functions as F

    def pname(p: float) -> str:
        # decimal-faithful name: 0.5→p_50, 0.99→p_99, 0.999→p_99_9,
        # 0.29→p_29 (int(p*100) would truncate float error to p_28 and
        # collide 0.99 with 0.999)
        s = ("%f" % round(p * 100, 6)).rstrip("0").rstrip(".")
        return "p_" + s.replace(".", "_")

    names = [pname(p) for p in ps]
    if len(set(names)) != len(names):
        raise ValueError(f"percentile names collide: {names}")
    arr = "array(" + ", ".join(str(p) for p in ps) + ")"
    fn = "percentile" if exact else "approx_percentile"
    agg = F.expr(f"{fn}({value_col}, {arr})").alias("_ps")
    out = df.groupBy(*keys).agg(agg)
    cols = [F.col("_ps")[i].alias(n) for i, n in enumerate(names)]
    return out.select(*keys, *cols)


def packing_assignment(seq, ctx: int = 2048, partition_col: str = "source",
                       id_col: str = "doc_id", len_col: str = "n_tok",
                       n_buckets: int | None = None):
    """Greedy concat-and-chunk context assignment — the packing PLAN that
    :func:`seq_packing_stats`' accounting summarizes: documents are laid
    out in deterministic id order within each partition (with one EOS
    separator each); every doc gets its absolute start offset in the
    packed token stream, the context it starts in, and its offset inside
    that context.

    Scale shape, ``n_buckets=None``: ONE shuffle (the window partition);
    the prefix sum within a partition is one sequential task — fine when
    partitions are real packing shards (pack-within-shard), a straggler if
    one whale source dominates.

    ``n_buckets=B``: the classic DISTRIBUTED prefix sum. The narrow
    ``(partition, id, len)`` projection is range-partitioned on
    ``(partition, id)`` into B order-contiguous buckets (pinned once via
    ``localCheckpoint`` — both downstream consumers must see the SAME
    sampled range boundaries), then (1) a per-(partition, bucket) local
    prefix window, (2) per-bucket subtotals — an O(B + #partitions) frame
    — cumulated per partition, (3) a broadcast join adds each bucket's
    offset to its local prefixes. A whale source now runs as up to B
    parallel window tasks instead of one; results are identical by
    construction (range buckets preserve the global (partition, id) order).

    Returns ``(partition_id, doc_id, start_offset, context_id,
    offset_in_context)``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def finalize(frame, start):
        start = start.cast("bigint")
        return frame.select(
            F.col(partition_col).alias("partition_id"),
            F.col(id_col).alias("doc_id"),
            start.alias("start_offset"),
            F.floor(start / ctx).cast("bigint").alias("context_id"),
            F.pmod(start, F.lit(ctx)).cast("bigint")
             .alias("offset_in_context"),
        )

    if not n_buckets:
        w = (Window.partitionBy(partition_col).orderBy(id_col)
                   .rowsBetween(Window.unboundedPreceding, -1))
        return finalize(seq, F.coalesce(
            F.sum(F.col(len_col) + 1).over(w), F.lit(0)))

    narrow = seq.select(partition_col, id_col, len_col)
    b = (narrow.repartitionByRange(n_buckets, F.col(partition_col),
                                   F.col(id_col))
               .withColumn("_bkt", F.spark_partition_id())
               .localCheckpoint())
    wl = (Window.partitionBy(partition_col, "_bkt").orderBy(id_col)
                .rowsBetween(Window.unboundedPreceding, -1))
    local = F.coalesce(F.sum(F.col(len_col) + 1).over(wl), F.lit(0))
    totals = b.groupBy(partition_col, "_bkt").agg(
        F.sum(F.col(len_col) + 1).cast("bigint").alias("_btot"))
    wo = (Window.partitionBy(partition_col).orderBy("_bkt")
                .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        partition_col, "_bkt",
        F.coalesce(F.sum("_btot").over(wo), F.lit(0)).cast("bigint")
         .alias("_boff"))
    j = b.join(F.broadcast(offsets), [partition_col, "_bkt"])
    return finalize(j, F.col("_boff") + local)
