"""Single-plan fused execution of the detect1→2→3→4 cascade.

The staged cascade (:func:`pyanomalydetector_spark.operators.detect.
detect_cascade`) mirrors the reference's imperative control flow
(/root/reference/data_processing/detect_anomalies.py:82-113): each stage
materializes its survivor key set and the next stage semi-joins against it.
That is ~10 Spark jobs and a localCheckpoint per stage boundary — correct,
but the job-scheduling latency dominates at any scale and the survivor
narrowing is pure *efficiency*, not semantics: every stage verdict is a
per-item predicate over aggregates of fixed windows, and aggregating a
semi-joined frame per item is identical to aggregating the full frame per
item and filtering afterwards.

So the whole cascade is algebraically ONE conjunctive predicate over a
per-item feature frame, computable in two passes:

1. ONE pass over the (tiny, checkpointed) trends envelope rollup deriving
   every env feature: trend value_avg stats (detect1), adjacent-diff stats of
   the max/min envelopes (detect2), envelope mean/std (detect3/4 z
   thresholds), and sliding-window local peaks (detect3/4 peak guard) — all
   per item, all over #items × #days rows.
2. ONE pass over the raw history slice: broadcast-join the per-item z
   thresholds, then a single map-side-combined ``groupBy(itemid)`` computing
   detect1's mean, detect2's min/max/first, detect3/4's conditional
   z-exceedance counts (8 conditional sums) and the full/recent means the
   peak guards compare against.

Stage composition is then boolean algebra on that frame:
``s1 ∧ s2 ∧ (A₃ ∨ B₃) ∧ (A₄ ∨ B₄)`` — NULL-safe (a missing trend/envelope
row makes the predicate NULL which filters exactly like the staged path's
inner joins dropped the item).

Result equality with the staged path is pinned by tests/test_cascade_fused.py
across stage subsets, thresholds, and empty-survivor fixtures.

At 100 TB: the staged path re-scans (cached) history once per stage but
touches progressively fewer items; the fused path scans history exactly once
but for all items. Since every stage's history pass is already a full scan of
the *same cached slice* (the narrowing semi-join does not prune file I/O, only
rows after the probe), the fused plan strictly reduces both I/O and job
count; the per-item state that crosses the shuffle is O(#items × ~16 cols)
either way. Strict reference-quirk modes (anchored-stride peaks, signed-mean
guards) stay on the staged path — they exist for bit-parity, not speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyanomalydetector_spark.operators.detect import DetectorConfig


def _nvl(c: Column) -> Column:
    return F.coalesce(c, F.lit(False))


def _env_features(env: DataFrame, density_window: int, suffix: str,
                  with_detect12: bool) -> DataFrame:
    """Per-item features of one envelope rollup frame (itemid, clock,
    value_min, value_avg, value_max, value_cnt):

    - ``mean_t/std_t/cnt_t`` — sufficient stats of value_avg (detect1);
    - ``dmean_up/dstd_up/dmean_dw/dstd_dw`` — adjacent-diff stats of the
      max/min envelopes (detect2, detector.py:299-312);
    - ``mu_up/sd_up/mu_dw/sd_dw`` — envelope mean/Bessel-std (detect3/4
      z thresholds, detector.py:488-495);
    - ``peak_up/peak_dw`` — max/min of sliding-window envelope means
      (detector.py:435-457 via rangeBetween, as local_peaks).

    One window pass + one groupBy over the tiny rollup frame; column names
    get ``suffix`` so the short/long envelopes coexist in one join.
    """
    # SQL strings, not the Column DSL — same plan-construction fast path as
    # checks/fused.py (one py4j round trip per SELECT; trees identical —
    # fused ≡ staged pinned in tests/test_cascade_fused.py, oracle hash-exact)
    w_lag = "OVER (PARTITION BY itemid ORDER BY clock)"
    w_peak = (f"OVER (PARTITION BY itemid ORDER BY clock "
              f"RANGE BETWEEN {density_window - 1} PRECEDING AND CURRENT ROW)")
    z = "CAST('0.0' AS DOUBLE)"

    vmax = "CAST(value_max AS DOUBLE)"
    vmin = "CAST(value_min AS DOUBLE)"
    # NULL-ify zero diffs so avg/stddev skip them exactly like the staged
    # path's ``filter(diff != 0)`` (adjacent_diff_stats)
    diff_up = f"({vmax} - LAG({vmax}) {w_lag})"
    diff_dw = f"({vmin} - LAG({vmin}) {w_lag})"

    rows = env.selectExpr(
        "itemid", "clock", f"{vmax} AS vmax", f"{vmin} AS vmin",
        "CAST(value_avg AS DOUBLE) AS vavg",
        f"CASE WHEN {diff_up} != 0 THEN {diff_up} END AS d_up",
        f"CASE WHEN {diff_dw} != 0 THEN {diff_dw} END AS d_dw",
        f"AVG({vmax}) {w_peak} AS wm_up",
        f"AVG({vmin}) {w_peak} AS wm_dw",
    )

    aggs = [
        f"AVG(vmax) AS mu_up{suffix}",
        f"COALESCE(STDDEV_SAMP(vmax), {z}) AS sd_up{suffix}",
        f"AVG(vmin) AS mu_dw{suffix}",
        f"COALESCE(STDDEV_SAMP(vmin), {z}) AS sd_dw{suffix}",
        f"MAX(wm_up) AS peak_up{suffix}",
        f"MIN(wm_dw) AS peak_dw{suffix}",
    ]
    if with_detect12:
        # detect1 trend stats with the exact finalize semantics
        # (sufficient_stats → finalize_mean_std: Bessel, inf/NaN→0)
        s, q, c = "SUM(vavg)", "SUM(vavg * vavg)", "COUNT(vavg)"
        mean_t = f"TRY_DIVIDE({s}, CAST({c} AS DOUBLE))"
        var_t = (f"TRY_DIVIDE({q} - TRY_DIVIDE({s} * {s}, "
                 f"CAST({c} AS DOUBLE)), CAST(({c} - 1) AS DOUBLE))")
        std_t = f"CASE WHEN ({c} > 1) THEN SQRT({var_t}) ELSE {z} END"

        def scrub(col: str) -> str:
            return (f"CASE WHEN (({col}) IS NULL OR ISNAN({col}) OR "
                    f"({col}) IN (CAST('Infinity' AS DOUBLE), "
                    f"CAST('-Infinity' AS DOUBLE))) THEN {z} "
                    f"ELSE ({col}) END")

        aggs += [
            f"{scrub(mean_t)} AS mean_t",
            f"{scrub(std_t)} AS std_t",
            f"{c} AS cnt_t",
            "AVG(d_up) AS dmean_up",
            "STDDEV_SAMP(d_up) AS dstd_up",
            "AVG(d_dw) AS dmean_dw",
            "STDDEV_SAMP(d_dw) AS dstd_dw",
        ]
    return rows.groupBy("itemid").agg(*[F.expr(a) for a in aggs])


def _detect3_pred(tag: str, hist_count: int, hist_count2: int,
                  cfg: DetectorConfig) -> Column:
    """detect3/4 (detector.py:498-584) as a predicate over the feature frame:
    stage A (λ1, full-window counts + full-mean peak guard), else stage B
    (λ2, recent counts + recent-mean peak guard)."""
    rate = cfg.anomaly_valid_count_rate
    a_up = (F.col(f"cnt_up_a{tag}") / F.lit(float(hist_count)) > rate) & \
           (F.col(f"peak_up{tag}") < F.col("mean_full"))
    a_dw = (F.col(f"cnt_dw_a{tag}") / F.lit(float(hist_count)) > rate) & \
           (F.col(f"peak_dw{tag}") > F.col("mean_full"))
    stage_a = _nvl(a_up) | _nvl(a_dw)
    b_up = (F.col(f"cnt_up_b{tag}") / F.lit(float(hist_count2)) > rate) & \
           (F.col(f"peak_up{tag}") < F.col("mean_recent"))
    b_dw = (F.col(f"cnt_dw_b{tag}") / F.lit(float(hist_count2)) > rate) & \
           (F.col(f"peak_dw{tag}") > F.col("mean_recent"))
    # staged semantics are "stage A, else stage B" — a plain union once the
    # terms are null-safe booleans (A ∪ B)
    return stage_a | _nvl(b_up) | _nvl(b_dw)


def detect_cascade_fused(history_df: DataFrame, trends_df: DataFrame,
                         recent_df: DataFrame, cfg: DetectorConfig,
                         hist_count: int, hist_count2: int,
                         startep2: int,
                         long_trends_df: DataFrame | None = None,
                         hist_count4: int | None = None,
                         hist_count4_2: int | None = None,
                         stages: tuple[int, ...] = (1, 2, 3, 4),
                         materialize_envs: bool = True) -> DataFrame:
    """Drop-in equivalent of :func:`detect_cascade` as one declarative plan.

    Same arguments and the same survivor set; see the module docstring for
    the algebra. Falls back to the staged path when any strict-reference
    quirk mode is on (those replicate row-order-dependent reference behavior
    the predicate algebra deliberately does not).

    ``materialize_envs=False`` skips the env localCheckpoint when the caller
    already materialized the rollup (e.g. the pipeline's shared-scan path
    that derives the short env by filtering the checkpointed long env).
    """
    if (cfg.strict_reference_peaks or cfg.strict_reference_diff_guard
            or cfg.strict_reference_detect1_guard):
        from pyanomalydetector_spark.operators.detect import detect_cascade
        return detect_cascade(history_df, trends_df, recent_df, cfg,
                              hist_count, hist_count2, startep2,
                              long_trends_df, hist_count4, hist_count4_2,
                              stages)

    run4 = 4 in stages and long_trends_df is not None
    ran = [s for s in stages if s in (1, 2, 3)] + ([4] if run4 else [])
    if not ran:
        # no stage ran → empty survivor set (detect_anomalies.py:88-89)
        return history_df.select("itemid").distinct().limit(0)

    # ---- pass 1: env features off the (tiny) rollup frames -----------------
    density_window = cfg.history_interval * cfg.history_retention
    if materialize_envs:
        trends_df = trends_df.localCheckpoint()
        if run4:
            long_trends_df = long_trends_df.localCheckpoint()
    feats = _env_features(trends_df, density_window, "",
                          with_detect12=bool({1, 2} & set(stages)))
    if run4:
        feats = feats.join(
            _env_features(long_trends_df, density_window, "_l",
                          with_detect12=False),
            "itemid", "full")

    # ---- pass 2: one history scan → per-item aggregate spine ---------------
    same = recent_df is history_df
    need_recent = bool({2, 3}.intersection(stages)) or run4

    thr_cols = []
    if 3 in stages:
        thr_cols += ["mu_up", "sd_up", "mu_dw", "sd_dw"]
    if run4:
        thr_cols += ["mu_up_l", "sd_up_l", "mu_dw_l", "sd_dw_l"]

    def hist_aggs(with_d1: bool, with_rest: bool = True) -> list[Column]:
        v = F.col("value").cast("double")
        out: list[Column] = []
        if with_d1:
            # detect1's history mean via the same finalize arithmetic
            # (try_divide + inf/NaN→0 scrub, stats.py:130-135). cnt==0
            # (an item whose history values are all NULL) must stay NULL,
            # not scrub to 0: finalize_mean_std drops cnt==0 rows, so the
            # staged inner join excludes the item — the NULL propagates
            # through the band predicate and _nvl drops it identically.
            s, c = F.sum(v), F.count(v)
            mean = F.try_divide(s, c.cast("double"))
            scrubbed = F.when(F.isnan(mean)
                              | mean.isin(float("inf"), float("-inf")),
                              F.lit(0.0)).otherwise(mean)
            out.append(F.when(c > 0, scrubbed).alias("mean_h"))
        if not (need_recent and with_rest):
            return out
        if 2 in stages:
            first = F.min_by("value", F.struct("clock", "value"))
            out += [(F.min("value") - first).alias("re_min"),
                    (F.max("value") - first).alias("re_max")]
        if 3 in stages or run4:
            recent = F.col("clock") >= F.lit(startep2)
            out += [F.avg(v).alias("mean_full"),
                    F.avg(F.when(recent, v)).alias("mean_recent")]

            def zcnt(cond: Column, name: str) -> Column:
                return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

            for tag, lam1, lam2 in ([("", cfg.detect3_lambda_threshold1,
                                      cfg.detect3_lambda_threshold2)]
                                    if 3 in stages else []) + \
                                   ([("_l", cfg.detect3_lambda_threshold1,
                                      cfg.detect3_lambda_threshold2)]
                                    if run4 else []):
                up = v > F.col(f"mu_up{tag}") + F.lit(lam1) * F.col(f"sd_up{tag}")
                dw = v < F.col(f"mu_dw{tag}") - F.lit(lam1) * F.col(f"sd_dw{tag}")
                up2 = v > F.col(f"mu_up{tag}") + F.lit(lam2) * F.col(f"sd_up{tag}")
                dw2 = v < F.col(f"mu_dw{tag}") - F.lit(lam2) * F.col(f"sd_dw{tag}")
                out += [zcnt(up, f"cnt_up_a{tag}"),
                        zcnt(dw, f"cnt_dw_a{tag}"),
                        zcnt(recent & up2, f"cnt_up_b{tag}"),
                        zcnt(recent & dw2, f"cnt_dw_b{tag}")]
        return out

    def with_thresholds(df: DataFrame) -> DataFrame:
        if not thr_cols:
            return df
        thr = feats.select("itemid", *thr_cols)
        return df.join(F.broadcast(thr), "itemid", "left")

    if same or not (1 in stages):
        src = recent_df if need_recent else history_df
        spine = with_thresholds(src).groupBy("itemid") \
            .agg(*hist_aggs(with_d1=(1 in stages)))
    elif not need_recent:
        spine = history_df.groupBy("itemid").agg(*hist_aggs(with_d1=True))
    else:
        d1 = history_df.groupBy("itemid").agg(
            *hist_aggs(with_d1=True, with_rest=False))
        rec = with_thresholds(recent_df).groupBy("itemid") \
            .agg(*hist_aggs(with_d1=False))
        # stage≥2 survivors must appear in BOTH frames (staged: detect1 runs
        # on history, later stages on recent narrowed to its survivors)
        spine = d1.join(rec, "itemid")

    frame = spine.join(F.broadcast(feats), "itemid", "left")

    # ---- stage predicates --------------------------------------------------
    pred = F.lit(True)
    if 1 in stages:
        lam = cfg.detect1_lambda_threshold
        band = (F.col("mean_h") > F.col("mean_t") + lam * F.col("std_t")) | \
               (F.col("mean_h") < F.col("mean_t") - lam * F.col("std_t"))
        dev = F.abs(F.col("mean_h") - F.col("mean_t"))
        guard = (F.col("mean_t") > 0) & \
                (F.try_divide(dev, F.col("mean_t")) > cfg.ignore_diff_rate)
        eligible = (F.col("cnt_t") > cfg.trends_min_count) & \
                   (F.col("std_t") > 0)
        pred = pred & _nvl(eligible & band & guard)
    if 2 in stages:
        lam = cfg.detect2_lambda_threshold
        rate = cfg.ignore_diff_rate

        def diff_test(ext: Column, dmean: Column, dstd: Column) -> Column:
            diff = F.abs(ext - dmean)
            return (dstd > 0) & (diff > lam * dstd) & \
                   (diff > rate * F.abs(dmean))

        up = diff_test(F.col("re_max"), F.col("dmean_up"), F.col("dstd_up"))
        dw = diff_test(F.col("re_min"), F.col("dmean_dw"), F.col("dstd_dw"))
        pred = pred & (_nvl(up) | _nvl(dw))
    if 3 in stages:
        pred = pred & _detect3_pred("", hist_count, hist_count2, cfg)
    if run4:
        pred = pred & _detect3_pred("_l", hist_count4, hist_count4_2, cfg)

    return frame.filter(pred).select("itemid")
