"""Two-stage DBSCAN grouping of anomalous series — the reference's classifier
stage, Spark-assisted but deliberately driver-final.

Reference semantics (/root/reference/classifiers/):
- binary anomaly indicator per item: ``1[|(x−mean)/std| > σ]``
  (classifiers/__init__.py:21-34)                                   → M1
- Jaccard distance ``1 − |a∧b|/|a∨b|`` between indicator vectors
  (classifiers/__init__.py:6-10, 36-55)                             → M2
- correlation distance ``1 − |pearson|``, blended 50/50 between the raw
  series and its first difference (classifiers/__init__.py:12-18, 57-86) → M3
- matrix normalize to [0,1], NaN→max, zero diagonal
  (classifiers/dbscan.py:28-40, 51-62)                              → M4
- DBSCAN over the precomputed matrix (dbscan.py:43, 64)             → M5
- two-stage: Jaccard-DBSCAN first, then correlation-DBSCAN *within* each
  stage-1 cluster; labels relabelled with a running max id; noise = −1
  (dbscan.py:69-171)                                                → M6

Scale posture: N here is the number of *violating* series (cascade
survivors), never the corpus — the reference makes the same O(N²)
driver-memory tradeoff (SURVEY.md §4). All per-row work (alignment,
normalization, indicator construction) happens in Spark; only the N×N
distance matrices and the DBSCAN label sweep run on the driver, guarded by
``max_items``. sklearn is not required: DBSCAN on a precomputed metric is
re-implemented in numpy with deterministic index-order visiting (the
reference implicitly relies on insertion order, dbscan.py:110-116).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITEMS = 2000  # guard: distance matrices are O(N²) driver memory

NOISE = -1
UNVISITED = -2


def dbscan_precomputed(dist: np.ndarray, eps: float, min_samples: int) -> np.ndarray:
    """Deterministic DBSCAN on a precomputed distance matrix.

    Classic density-connected expansion; points visited in index order so
    labels are reproducible for any input order (reference relied on dict
    insertion order instead). Returns labels, noise = −1.
    """
    n = dist.shape[0]
    labels = np.full(n, UNVISITED, dtype=np.int64)
    cluster = -1
    for i in range(n):
        if labels[i] != UNVISITED:
            continue
        neigh = np.flatnonzero(dist[i] <= eps)
        if neigh.size < min_samples:
            labels[i] = NOISE
            continue
        cluster += 1
        labels[i] = cluster
        seeds = list(neigh[neigh != i])
        k = 0
        while k < len(seeds):
            j = seeds[k]
            k += 1
            if labels[j] == NOISE:
                labels[j] = cluster
            if labels[j] != UNVISITED:
                continue
            labels[j] = cluster
            jn = np.flatnonzero(dist[j] <= eps)
            if jn.size >= min_samples:
                seeds.extend(jn[(labels[jn] == UNVISITED) | (labels[jn] == NOISE)])
    labels[labels == UNVISITED] = NOISE
    return labels


# ------------------------------------------------------- distance matrices ---

def jaccard_distance_matrix(ind: np.ndarray) -> np.ndarray:
    """1 − |a∧b| / |a∨b| over binary indicator rows (M2). Empty unions → 1."""
    inter = ind @ ind.T
    sums = ind.sum(axis=1)
    union = sums[:, None] + sums[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        d = 1.0 - np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    np.fill_diagonal(d, 0.0)
    return d


def correlation_distance_matrix(x: np.ndarray) -> np.ndarray:
    """Blended correlation distance (M3): ½(1−|corr(x)|) + ½(1−|corr(Δx)|),
    then M4 scrub: NaN → max finite value, zero diagonal."""
    def corr_dist(m: np.ndarray) -> np.ndarray:
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.corrcoef(m)
        return 1.0 - np.abs(c)

    d = 0.5 * corr_dist(x) + 0.5 * corr_dist(np.diff(x, axis=1))
    finite = d[np.isfinite(d)]
    fill = finite.max() if finite.size else 1.0
    d = np.where(np.isfinite(d), d, fill)
    np.fill_diagonal(d, 0.0)
    return d


# --------------------------------------------------------- chart collection ---

def collect_charts(df: DataFrame, id_col: str = "itemid",
                   time_col: str = "clock", value_col: str = "value",
                   max_items: int = MAX_ITEMS) -> tuple[list, np.ndarray]:
    """Spark-side: align each series onto the sorted union of clocks
    (missing → 0, matching the reference's fillna(0) discipline) and hand a
    dense [N × T] matrix to the driver. Shuffle is one groupBy over the
    (small) violating-item slice."""
    rows = (
        df.groupBy(id_col)
          .agg(F.array_sort(F.collect_list(F.struct(time_col, value_col)))
                .alias("pts"))
          .orderBy(id_col)
          .collect()
    )
    if len(rows) > max_items:
        raise ValueError(f"refusing O(N²) clustering for N={len(rows)} > {max_items}")
    ids = [r[id_col] for r in rows]
    clocks = sorted({p[time_col] for r in rows for p in r["pts"]})
    pos = {c: i for i, c in enumerate(clocks)}
    x = np.zeros((len(rows), len(clocks)))
    for i, r in enumerate(rows):
        for p in r["pts"]:
            x[i, pos[p[time_col]]] = p[value_col]
    return ids, x


def anomaly_indicators(x: np.ndarray, sigma: float = 2.0) -> np.ndarray:
    """M1: per-series binary exceedance indicator ``1[|z| > σ]`` using the
    series' own mean/std (reference uses stored stats; same semantics)."""
    mean = x.mean(axis=1, keepdims=True)
    std = x.std(axis=1, ddof=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.where(std > 0, (x - mean) / std, 0.0)
    return (np.abs(z) > sigma).astype(np.float64)


# ------------------------------------------------------------ two-stage M6 ---

def two_stage_cluster(ids: list, recent: np.ndarray, full: np.ndarray,
                      sigma: float = 2.0, eps1: float = 0.5, eps2: float = 0.2,
                      min_samples: int = 2) -> dict:
    """Stage 1: Jaccard-DBSCAN on recent-window indicators; stage 2:
    correlation-DBSCAN within each stage-1 cluster over the full timeline;
    relabel with a running max cluster id; noise = −1 (dbscan.py:69-171)."""
    labels1 = dbscan_precomputed(
        jaccard_distance_matrix(anomaly_indicators(recent, sigma)),
        eps1, min_samples)

    out = {i: NOISE for i in ids}
    next_id = 0
    for c in sorted(set(labels1) - {NOISE}):
        members = np.flatnonzero(labels1 == c)
        if members.size < 2:
            continue
        sub = full[members]
        labels2 = dbscan_precomputed(
            correlation_distance_matrix(sub), eps2, min_samples)
        for c2 in sorted(set(labels2) - {NOISE}):
            for m in members[labels2 == c2]:
                out[ids[m]] = next_id
            next_id += 1
    return out


def classify_series(history_df: DataFrame, item_ids: list,
                    id_col: str = "itemid", sigma: float = 2.0,
                    eps1: float = 0.5, eps2: float = 0.2,
                    min_samples: int = 2,
                    recent_clock_from: int | None = None) -> DataFrame:
    """End-to-end grouping of the cascade's surviving series.

    Returns DF ``(itemid, clusterid)`` — the engine's analog of
    ``update_clusterid`` (/root/reference/models/anomalies.py:81-87).
    """
    spark = history_df.sparkSession
    if not item_ids:
        return spark.createDataFrame([], f"{id_col} long, clusterid long")
    sl = history_df.filter(F.col(id_col).isin(list(item_ids)))
    ids, full = collect_charts(sl, id_col)
    if recent_clock_from is not None:
        r_ids, recent = collect_charts(
            sl.filter(F.col("clock") >= recent_clock_from), id_col)
        # align: items with no recent rows get zero vectors
        idx = {i: k for k, i in enumerate(r_ids)}
        rec = np.zeros((len(ids), recent.shape[1] if recent.size else 1))
        for k, i in enumerate(ids):
            if i in idx:
                rec[k] = recent[idx[i]]
        recent = rec
    else:
        recent = full
    labels = two_stage_cluster(ids, recent, full, sigma, eps1, eps2, min_samples)
    return spark.createDataFrame(
        [(int(i), int(labels[i])) for i in ids], f"{id_col} long, clusterid long")
