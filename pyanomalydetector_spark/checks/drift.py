"""Distribution-drift scoring: PSI and two-sample KS per partition.

Recasts the reference's detect2/detect3 "recent distribution vs historical
distribution" semantics (/root/reference/data_processing/detector.py:286-337,
382-432: envelope z-exceedance counts and diff-stats comparisons) as two
standard drift statistics of the per-partition ``n_tok`` distribution against a
pinned baseline (the whole-table distribution, or a supplied histogram).

Everything is expressed as DataFrame aggregations + window cumulative sums —
no UDFs, fully whole-stage-codegen, one shuffle per statistic. The grid sizes
are #distinct-values × #partitions (tiny relative to row count), so this scales
to arbitrarily many input rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PSI_SMOOTH = 0.5  # Laplace smoothing added to every bucket count


def _pid_nullsafe_join(left: DataFrame, right: DataFrame, key2: str | None,
                       how: str = "left") -> DataFrame:
    """Join on ``partition_id`` NULL-SAFELY (plus a plain equality on
    ``key2`` when given), keeping ``left``'s columns first.

    A plain equi-join on partition_id never matches NULL = NULL, so a NULL
    partition key — exactly the dirty group key a quality engine must still
    score — would silently read as zero counts (grid joins) or drop its
    verdict row (result joins). ``key2`` (bucket/value) stays plain: a NULL
    value carries no probability mass by design, and buckets are never NULL.
    """
    r = right.withColumnRenamed("partition_id", "_rp")
    cond = left["partition_id"].eqNullSafe(F.col("_rp"))
    if key2 is not None:
        r = r.withColumnRenamed(key2, "_rk")
        cond = cond & (left[key2] == F.col("_rk"))
    return left.join(r, cond, how).drop("_rp", *(["_rk"] if key2 else []))


def _bucket_expr(value: Column, lo, hi, n_buckets: int) -> Column:
    """Fixed-width bucket index over [lo, hi] with edge clamping — the ONE
    definition every PSI path (self-baseline, explicit-baseline,
    low-cardinality, pinned) derives from, mirrored by the DuckDB oracle.
    Degenerate range (or empty input) → bucket 0; a NULL value coerces to
    bucket 0 via the null-skipping greatest, identically in both engines.
    """
    if lo is None or hi == lo:
        return F.lit(0)
    width = F.lit((hi - lo) / n_buckets)
    raw = F.floor((value - F.lit(lo)) / width)
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1))



def psi_by_partition(df: DataFrame, partition_col: str, value_col: str,
                     n_buckets: int = 10,
                     baseline: DataFrame | None = None,
                     cache_registry: list | None = None,
                     low_cardinality: bool = False) -> DataFrame:
    """Population Stability Index of ``value_col`` per partition vs baseline.

    Fixed-width buckets over the baseline's [min, max]; counts smoothed with
    ``PSI_SMOOTH`` so empty buckets don't blow up the log. Returns
    ``(partition_id, psi)``. ``cache_registry`` collects persisted
    intermediates for the caller to unpersist (see :func:`ks_by_partition`).

    ``low_cardinality=True`` (self-baseline only): route through a
    per-(partition, value) counts frame — ONE scan and one shuffle of
    O(partitions × distinct values) state; the [min, max] bounds and the
    baseline histogram both derive from the cached counts, so no second
    bounds pass over the raw input. Identical math (values are bucketed
    exactly as rows would be; counts sum). This is the right route for
    structurally bounded columns — token length is capped by the context
    size, so its distinct-value count is O(max_seq_len) at ANY corpus
    scale — while unbounded continuous columns should keep the default
    two-pass fixed-width path.
    """
    if low_cardinality and baseline is None:
        return _psi_low_cardinality(df, partition_col, value_col, n_buckets,
                                    cache_registry)
    base = baseline if baseline is not None else df
    v = F.col(value_col).cast("double")

    # Materialize the 1-row bounds EAGERLY (one map-side-combined min/max
    # job — parquet column stats make this nearly free) and fold them in as
    # literals. The previous crossJoin(broadcast(bounds)) formulation was
    # re-embedded into every downstream branch by AQE replanning, blowing
    # the audited plan up to 16 scans (BENCH r1→r2 psi regression); with
    # literal bounds each branch is a plain scan→groupBy that the
    # part_counts persist dedupes.
    row = base.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
    lo, hi = row["lo"], row["hi"]

    def bucketize(frame: DataFrame) -> DataFrame:
        return frame.withColumn(
            "bucket",
            _bucket_expr(F.col(value_col).cast("double"), lo, hi, n_buckets))

    if baseline is None:
        # Self-baseline in ONE linear plan: the n_buckets bucket counts per
        # partition are conditional sums in a single map-side-combined
        # groupBy (the pinned-psi idiom — the shuffle carries n_buckets
        # longs per partition), and the baseline histogram + grand total
        # are WINDOW sums over that tiny aggregated frame (#partitions
        # rows). Two jobs total (bounds + this plan); no grid join, no
        # persisted intermediate, nothing for concurrent stages to race.
        bucket = _bucket_expr(v, lo, hi, n_buckets)
        aggs = [F.sum(F.when(bucket == b, 1).otherwise(0)).alias(f"b{b}")
                for b in range(n_buckets)]
        part = df.groupBy(F.col(partition_col).alias("partition_id")) \
                 .agg(*aggs)

        w_all = Window.partitionBy()          # #partitions rows — trivial
        n_p = sum((F.col(f"b{b}") for b in range(1, n_buckets)),
                  F.col("b0"))
        n_base = F.sum(n_p).over(w_all).cast("double")
        terms = []
        for b in range(n_buckets):
            q_cnt = F.sum(F.col(f"b{b}")).over(w_all)
            p = (F.col(f"b{b}") + F.lit(PSI_SMOOTH)) / \
                (n_p + F.lit(PSI_SMOOTH * n_buckets))
            q = (q_cnt + F.lit(PSI_SMOOTH)) / \
                (n_base + F.lit(PSI_SMOOTH * n_buckets))
            terms.append((p - q) * F.log(p / q))
        psi = sum(terms[1:], terms[0])
        return part.select("partition_id", psi.alias("psi"))

    part_counts = (
        bucketize(df)
        .groupBy(F.col(partition_col).alias("partition_id"), "bucket")
        .agg(F.count(F.lit(1)).alias("c_p"))
    )
    parts = df.select(F.col(partition_col).alias("partition_id")).distinct()
    base_counts = (
        bucketize(base)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c_b"))
    )
    base_total = base.agg(F.count(F.lit(1)).cast("double").alias("n_base"))

    return _psi_finish(df.sparkSession, parts, part_counts, base_counts,
                       base_total, n_buckets)


def _psi_finish(spark, parts: DataFrame, part_counts: DataFrame,
                base_counts: DataFrame, base_total: DataFrame,
                n_buckets: int) -> DataFrame:
    """Shared PSI tail: full (partition × bucket) grid (so zero-count buckets
    still get smoothing), smoothed p/q, Σ (p−q)·ln(p/q)."""
    grid = parts.crossJoin(
        spark.range(n_buckets).select(F.col("id").alias("bucket")))

    joined = (
        _pid_nullsafe_join(grid, part_counts, "bucket")
            .join(F.broadcast(base_counts), ["bucket"], "left")
            .crossJoin(F.broadcast(base_total))
            .na.fill({"c_p": 0, "c_b": 0})
    )

    w_p = Window.partitionBy("partition_id")
    p = (F.col("c_p") + F.lit(PSI_SMOOTH)) / \
        (F.sum("c_p").over(w_p) + F.lit(PSI_SMOOTH * n_buckets))
    q = (F.col("c_b") + F.lit(PSI_SMOOTH)) / \
        (F.col("n_base") + F.lit(PSI_SMOOTH * n_buckets))

    term = (p - q) * F.log(p / q)
    return (
        joined.withColumn("term", term)
              .groupBy("partition_id")
              .agg(F.sum("term").alias("psi"))
    )


def _psi_low_cardinality(df: DataFrame, partition_col: str, value_col: str,
                         n_buckets: int,
                         cache_registry: list | None) -> DataFrame:
    """Self-baseline PSI via per-(partition, value) counts — see
    :func:`psi_by_partition` (``low_cardinality=True``).

    The raw input is scanned exactly once (the counts shuffle); bounds,
    the per-partition histograms AND the baseline histogram all derive
    from the cached counts frame, whose size is O(partitions × distinct
    values) regardless of row count. Bucketing values then summing their
    counts is algebraically identical to bucketing rows.
    """
    v = F.col(value_col).cast("double").alias("v")
    pvc = (
        df.select(F.col(partition_col).alias("partition_id"), v)
          .groupBy("partition_id", "v").agg(F.count(F.lit(1)).alias("c_p"))
          .persist()
    )
    if cache_registry is not None:
        cache_registry.append(pvc)

    row = pvc.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
    lo, hi = row["lo"], row["hi"]
    bucketed = pvc.withColumn(
        "bucket", _bucket_expr(F.col("v"), lo, hi, n_buckets))

    part_counts = bucketed.groupBy("partition_id", "bucket") \
                          .agg(F.sum("c_p").alias("c_p"))
    parts = pvc.select("partition_id").distinct()
    base_counts = bucketed.groupBy("bucket").agg(F.sum("c_p").alias("c_b"))
    base_total = pvc.agg(F.sum("c_p").cast("double").alias("n_base"))
    return _psi_finish(df.sparkSession, parts, part_counts, base_counts,
                       base_total, n_buckets)


def _ks_grid_tail(joined: DataFrame) -> DataFrame:
    """CDF comparison + per-partition KS-D over a dense ``(partition_id, v,
    c_p, c_b)`` grid — the ONE tail shared by :func:`ks_by_partition` and
    :func:`ks_by_partition_counts`, so the grid ≡ pinned-counts parity the
    fuzz layer pins can't drift out of lockstep.

    - ``try_divide``, NOT ``/``: a side whose values are ALL NULL has zero
      probability mass on the grid (its rows never match the value keys),
      so its CDF denominator is 0 — ANSI mode turns the plain division
      into a hard DIVIDE_BY_ZERO crash of the whole job (found by the
      cross-engine route fuzz; the bounded route was always safe because
      its divisions sit under a v-IS-NOT-NULL when-guard).
    - The NaN guard covers EITHER mass-less side: an all-NULL partition
      (sum c_p = 0) OR a baseline with zero grid mass (sum c_b = 0 — e.g.
      pinned counts captured from an all-NULL value column, whose only row
      is the NULL-v group the grid's equi-join skips). A one-sided guard
      would leave the baseline case at max(NULL d) = NULL, and a NULL ks_d
      makes the verdict ``NULL <= threshold`` = NULL — silently neither
      pass nor fail, where the documented semantics are NaN → fail. Self-
      baseline is unaffected (zero global mass implies zero partition
      mass, so the c_p disjunct already fires).
    """
    w_cum = Window.partitionBy("partition_id").orderBy("v") \
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_tot = Window.partitionBy("partition_id")
    cdf_p = F.try_divide(F.sum("c_p").over(w_cum), F.sum("c_p").over(w_tot))
    cdf_b = F.try_divide(F.sum("c_b").over(w_cum), F.sum("c_b").over(w_tot))
    no_mass = (F.sum("c_p") == 0) | (F.sum("c_b") == 0)
    return (
        joined.withColumn("d", F.abs(cdf_p - cdf_b))
              .groupBy("partition_id")
              .agg(F.when(no_mass, F.lit(float("nan")))
                    .otherwise(F.max("d")).alias("ks_d"))
    )


def ks_by_partition(df: DataFrame, partition_col: str, value_col: str,
                    baseline: DataFrame | None = None,
                    cache_registry: list | None = None,
                    max_grid_values: int = 65536,
                    n_fallback_bins: int = 4096,
                    bounded: bool = False,
                    include_rows: bool = False) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D per partition vs baseline.

    D = max over the combined support of |CDF_partition − CDF_baseline|.
    Computed on the (partition × distinct-value) grid with window cumulative
    sums — distributed, no collect. Returns ``(partition_id, ks_d)``.

    **Cardinality guard**: the grid is exact (and cheap) for bounded
    columns like token length, but a continuous double column would make
    #distinct ≈ #rows and the grid degenerate. If the COMBINED
    distinct-value count (df side + explicit-baseline side) exceeds
    ``max_grid_values``, values are re-binned into ``n_fallback_bins``
    fixed-width bins over the combined [min, max] *from the cached counts
    frames* (no raw re-scan; NULL values stay NULL and drop out exactly as
    in the unbinned path) and KS-D is computed on the binned
    distributions — the standard histogram approximation, whose error is
    bounded by the largest per-bin probability mass. The guard decision
    costs count(Distinct) over the already-persisted counts frames, never
    a second pass over the raw inputs.

    ``bounded=True`` skips the guard (and its blocking distinct-count job)
    entirely — the opt-in for *structurally* bounded columns, where the
    distinct-value count is capped by construction at any corpus scale
    (token length ≤ context size — the same argument as
    :func:`psi_by_partition`'s ``low_cardinality``). Unbounded or unknown
    columns must keep the guard. With no explicit baseline this routes to
    :func:`_ks_bounded_self` — a fully-lazy single linear plan (no persist,
    no grid self-join, no blocking job at all).

    ``include_rows=True`` appends a ``rows_scanned`` column (total rows per
    partition, NULL values included) derived from the already-shuffled
    counts frame — saving callers that need it a second raw-input scan.

    ``cache_registry``: persisted intermediates are appended here so a
    long-lived caller can unpersist them after materializing the result.
    """
    if bounded and baseline is None:
        return _ks_bounded_self(df, partition_col, value_col, include_rows)

    v = F.col(value_col).cast("double").alias("v")

    part_counts = (
        df.select(F.col(partition_col).alias("partition_id"), v)
          .groupBy("partition_id", "v").agg(F.count(F.lit(1)).alias("c_p"))
    ).persist()
    if cache_registry is not None:
        cache_registry.append(part_counts)
    rows = part_counts.groupBy("partition_id") \
                      .agg(F.sum("c_p").alias("rows_scanned")) \
        if include_rows else None

    # explicit baseline: reduce it to its own value-counts frame up front —
    # the guard must see ITS cardinality too (a continuous baseline would
    # otherwise rebuild the degenerate distinct-per-row grid the guard
    # exists to prevent), and binning must re-aggregate counts, not rows
    base_vcounts = None
    if baseline is not None:
        base_vcounts = (
            baseline.select(v).groupBy("v")
                    .agg(F.count(F.lit(1)).alias("c_b"))
        ).persist()
        if cache_registry is not None:
            cache_registry.append(base_vcounts)

    # materialize the persisted frames EAGERLY even on the bounded path
    # (where no cardinality probe runs): values/parts/base_counts/rows all
    # branch off them inside ONE downstream job, and concurrent stages each
    # miss a lazy cache and re-run the raw-scan groupBy (the PSI-histogram
    # race above)
    part_counts.count()
    if base_vcounts is not None:
        base_vcounts.count()
    ndv = 0 if bounded else part_counts.select("v").distinct().count()
    if not bounded and base_vcounts is not None:
        ndv += base_vcounts.count()
    bin_lo = bin_width = None
    if ndv > max_grid_values:
        sides = part_counts.select("v") if base_vcounts is None else \
            part_counts.select("v").union(base_vcounts.select("v"))
        row = sides.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
        lo, hi = row["lo"], row["hi"]
        if lo is not None and hi > lo:
            bin_lo, bin_width = lo, (hi - lo) / n_fallback_bins

    def _binned(col: Column) -> Column:
        b = F.least(F.floor((col - F.lit(bin_lo)) / F.lit(bin_width)),
                    F.lit(n_fallback_bins - 1))
        b = F.greatest(b, F.lit(0))
        # NULL stays NULL (a when-guard, because least/greatest SKIP nulls
        # and would otherwise sweep null mass into the top bin): the exact
        # path drops null values too — they never match the grid join keys
        return F.when(col.isNotNull(),
                      (b * bin_width + bin_lo).cast("double"))

    if bin_lo is not None:
        part_counts = (
            part_counts
            .withColumn("v", _binned(F.col("v")))
            .groupBy("partition_id", "v")
            .agg(F.sum("c_p").alias("c_p"))
        )
        if base_vcounts is not None:
            base_vcounts = (
                base_vcounts
                .withColumn("v", _binned(F.col("v")))
                .groupBy("v").agg(F.sum("c_b").alias("c_b"))
            )

    if baseline is None:
        # self-baseline: the partition/value universe AND the baseline counts
        # are all derivable from the one part_counts shuffle — no raw
        # re-scans (three full passes saved vs the naive formulation)
        values = part_counts.select("v").distinct()
        parts = part_counts.select("partition_id").distinct()
        base_counts = part_counts.groupBy("v").agg(F.sum("c_p").alias("c_b"))
    else:
        values = base_vcounts.select("v").union(part_counts.select("v")) \
                             .distinct()
        parts = part_counts.select("partition_id").distinct()
        base_counts = base_vcounts
    grid = parts.crossJoin(values)

    joined = (
        _pid_nullsafe_join(grid, part_counts, "v")
            .join(F.broadcast(base_counts), ["v"], "left")
            .na.fill({"c_p": 0, "c_b": 0})
    )

    out = _ks_grid_tail(joined)
    if rows is not None:
        out = _pid_nullsafe_join(out, rows, None, "inner")
    return out


def _ks_bounded_self(df: DataFrame, partition_col: str, value_col: str,
                     include_rows: bool) -> DataFrame:
    """Self-baseline KS as ONE linear plan — the ``bounded=True`` route.

    The naive formulation joins a dense (partitions × values) grid back onto
    the counts so every partition's CDF is sampled at every global value.
    That grid is unnecessary: between two consecutive values of partition
    *p*, CDF_p is constant and CDF_b is monotone, so |CDF_p − CDF_b| over
    the gap is maximized at one of its ends — both of which are visible
    from p's own rows as left/right limits. Per (partition, value) row we
    therefore evaluate TWO candidates:

    - at v:          |cum_p/n_p − cum_b/n_base|
    - just before v: |(cum_p−c_p)/n_p − (cum_b−c_b)/n_base|

    (the second also covers the head — base mass below p's first value —
    and the row at p's max value covers the tail, where CDF_p = 1). The
    max over both candidates over p's rows equals the dense-grid max
    exactly, candidate-for-candidate in the same long/long→double
    arithmetic, so results are bit-identical to the guarded path.

    Plan shape: one groupBy shuffle over the raw scan for the partition
    side; the per-value base CDF is its own single-column aggregation of
    the raw input (a second, column-pruned scan — deliberately NOT a
    reuse of the partition-side shuffle, whose exchange AQE re-plans per
    branch; cheap pruned re-scans are this engine's documented trade) with
    its global cumulative window running over the tiny distinct-values
    frame only, broadcast back onto the counts; windows + final agg then
    share one hash-partitioning by partition_id. No persist, no blocking
    driver job, nothing for concurrent stages to race, no wide frame ever
    through a single-partition window. Shuffled state is O(partitions ×
    distinct values) — bounded by the caller's structural guarantee.

    NULL values carry no probability mass (identically to the grid path,
    where NULL keys never match the grid join); a partition whose values
    are ALL NULL yields ``ks_d = NaN``, matching the grid's 0/0. With
    ``include_rows``, ``rows_scanned`` counts NULL rows too.
    """
    v = F.col(value_col).cast("double").alias("v")
    pc = (
        df.select(F.col(partition_col).alias("partition_id"), v)
          .groupBy("partition_id", "v").agg(F.count(F.lit(1)).alias("c_p"))
    )

    w_v = Window.orderBy("v") \
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = (
        df.select(v).filter(F.col("v").isNotNull())
          .groupBy("v").agg(F.count(F.lit(1)).alias("c_b"))
          .select("v", "c_b", F.sum("c_b").over(w_v).alias("cum_b"))
          .withColumn("n_base", F.sum("c_b").over(Window.partitionBy()))
    )

    j = pc.join(F.broadcast(base), "v", "left")
    w_part = Window.partitionBy("partition_id")
    w_cum = Window.partitionBy("partition_id") \
                  .orderBy(F.col("v").asc_nulls_first()) \
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # NULL-value rows contribute 0 mass; sorting them first keeps the
    # cumulative sums at non-null rows untouched
    c_nn = F.when(F.col("v").isNotNull(), F.col("c_p")).otherwise(F.lit(0))
    cum_p = F.sum(c_nn).over(w_cum)
    n_p = F.sum(c_nn).over(w_part)

    cdf_p = cum_p / n_p
    cdf_b = F.col("cum_b") / F.col("n_base")
    pre_p = (cum_p - F.col("c_p")) / n_p
    pre_b = (F.col("cum_b") - F.col("c_b")) / F.col("n_base")
    d = F.when(F.col("v").isNotNull(),
               F.greatest(F.abs(cdf_p - cdf_b), F.abs(pre_p - pre_b)))

    scored = j.withColumn("d", d).withColumn("c_nn", c_nn)
    aggs = [F.when(F.sum("c_nn") == 0, F.lit(float("nan")))
             .otherwise(F.max("d")).alias("ks_d")]
    if include_rows:
        aggs.append(F.sum("c_p").alias("rows_scanned"))
    return scored.groupBy("partition_id").agg(*aggs)


def psi_by_partition_pinned(df: DataFrame, partition_col: str, value_col: str,
                            lo: float, hi: float, base_counts: list[float],
                            n_base: float) -> DataFrame:
    """PSI against a *pinned* histogram baseline (checkpoint/resume path).

    ``base_counts[b]`` are the baseline bucket counts over [lo, hi] fixed-width
    buckets; the partition histogram is computed in one conditional-sum
    groupBy (no second scan, no baseline scan at all). Identical math to
    :func:`psi_by_partition` when the pinned values came from the same data.
    """
    nb = len(base_counts)
    v = F.col(value_col).cast("double")
    bucket = _bucket_expr(v, lo, hi, nb)
    aggs = [F.sum(F.when(bucket == b, 1).otherwise(0)).alias(f"b{b}")
            for b in range(nb)]
    part = df.groupBy(F.col(partition_col).alias("partition_id")).agg(*aggs)

    n_p = sum((F.col(f"b{b}") for b in range(1, nb)), F.col("b0"))
    terms = []
    for b in range(nb):
        p = (F.col(f"b{b}") + F.lit(PSI_SMOOTH)) / (n_p + F.lit(PSI_SMOOTH * nb))
        q = F.lit((base_counts[b] + PSI_SMOOTH) / (n_base + PSI_SMOOTH * nb))
        terms.append((p - q) * F.log(p / q))
    psi = sum(terms[1:], terms[0])
    return part.select("partition_id", psi.alias("psi"))


def ks_by_partition_counts(df: DataFrame, partition_col: str, value_col: str,
                           base_counts: DataFrame) -> DataFrame:
    """KS-D against pinned baseline *value counts* ``(v, c_b)``.

    Same grid construction as :func:`ks_by_partition` but the baseline side is
    the stored count table (bounded by #distinct values), not raw rows —
    the checkpointable form.
    """
    v = F.col(value_col).cast("double").alias("v")
    values = base_counts.select("v").union(df.select(v)).distinct()
    parts = df.select(F.col(partition_col).alias("partition_id")).distinct()
    grid = parts.crossJoin(values)

    part_counts = (
        df.select(F.col(partition_col).alias("partition_id"), v)
          .groupBy("partition_id", "v").agg(F.count(F.lit(1)).alias("c_p"))
    )
    joined = (
        _pid_nullsafe_join(grid, part_counts, "v")
            .join(F.broadcast(base_counts), ["v"], "left")
            .na.fill({"c_p": 0, "c_b": 0})
    )
    return _ks_grid_tail(joined)
