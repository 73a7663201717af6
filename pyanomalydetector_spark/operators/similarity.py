"""Embedding similarity search: brute-force cosine top-k + IVF scale path.

The ``embeddings`` table is ``(vec_id, embedding array<float>, label int)``.
Everything is JVM-side higher-order array arithmetic (``zip_with`` +
``aggregate`` for dot products) — no UDFs, so the same math runs in the
DuckDB oracle (``list_dot_product``).

- :func:`cosine_topk` — exact brute force: broadcast the (small) query set
  against the corpus, one window for the top-k. The *correctness baseline*;
  O(Q × N × d) but embarrassingly parallel (no shuffle until the tiny top-k
  window).
- :func:`cosine_pairs_above` — embedding near-duplicate pairs (all-pairs ≥
  threshold). Brute force at test scale; at 10¹² rows the LSH/IVF candidate
  route below replaces the crossJoin.
- :func:`ivf_topk` — inverted-file ANN: probe the ``n_probe`` nearest cells
  per query, exact-search only those cells (scanned fraction =
  n_probe/n_cells). Cells come from :func:`train_ivf_codebook` — a REAL
  distributed spherical k-means (Lloyd with map-side-combined partial sums,
  deterministic hash-sample init) — via :func:`ivf_topk_trained`; recall
  vs :func:`cosine_topk` asserted in tests at 10× the base fixture.

Reference lineage: the reference's similarity machinery is its pairwise
Pearson/Jaccard distance matrices over anomalous items
(/root/reference/classifiers/__init__.py:6-18); these operators are the
training-data-scale generalization (SURVEY.md §7.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return emb.withColumn("_v", v).withColumn("_norm", _norm(F.col("_v")))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k cosine neighbours for each query id (self excluded).

    Returns ``(q_id, vec_id, cos_sim, rank)``; rank by (sim desc, vec_id) so
    the result is total-ordered and engine-portable.
    """
    base = with_norm(emb, vec_col).select(id_col, "_v", "_norm")
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"))
    j = base.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("q_id"))
    sim = F.try_divide(_dot(F.col("_v"), F.col("_qv")),
                       F.col("_norm") * F.col("_qnorm"))
    scored = j.select("q_id", id_col, sim.alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)) \
                 .filter(F.col("rank") <= k)


def cosine_pairs_above(emb: DataFrame, threshold: float = 0.95,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> DataFrame:
    """All pairs (d1 < d2) with cosine ≥ threshold — embedding near-dups."""
    base = with_norm(emb, vec_col).select(id_col, "_v", "_norm")
    a = base.select(F.col(id_col).alias("d1"), F.col("_v").alias("_va"),
                    F.col("_norm").alias("_na"))
    b = base.select(F.col(id_col).alias("d2"), F.col("_v").alias("_vb"),
                    F.col("_norm").alias("_nb"))
    j = a.crossJoin(b).filter(F.col("d1") < F.col("d2"))
    sim = F.try_divide(_dot(F.col("_va"), F.col("_vb")),
                       F.col("_na") * F.col("_nb"))
    return j.select("d1", "d2", sim.alias("cos_sim")) \
            .filter(F.col("cos_sim") >= threshold)


def centroids(emb: DataFrame, cell_col: str = "label",
              vec_col: str = "embedding") -> DataFrame:
    """Mean vector per cell: posexplode → per-(cell, dim) avg → re-assemble.

    This is the distributed "Summarizer.mean per group" pattern — state is
    O(cells × dims), never O(rows).
    """
    dims = (
        emb.select(cell_col, F.posexplode(_as_double(F.col(vec_col)))
                   .alias("dim", "x"))
           .groupBy(cell_col, "dim").agg(F.avg("x").alias("m"))
    )
    return (
        dims.groupBy(cell_col)
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select(cell_col,
                    F.transform("dm", lambda s: s["m"]).alias("centroid"))
    )


def _infer_dim(emb: DataFrame, vec_col: str, sample: int = 1024) -> int | None:
    """Majority embedding length over a bounded sample (one cheap
    first-partition job) — robust to a corrupt/ragged FIRST row, which
    would otherwise pin a garbage dimensionality and make the kernels
    silently drop the entire well-formed corpus as 'ragged'."""
    row = (emb.select(F.size(F.col(vec_col)).alias("n"))
              .filter(F.col("n") > 0).limit(sample)
              .groupBy("n").count()
              .orderBy(F.desc("count"), "n").first())
    return int(row["n"]) if row else None


def _scrub_vec_pdf(pdf, col: str, dim: int):
    """Drop null/ragged embedding rows from an Arrow batch — THE shared
    scrub for every pandas kernel in this module (LSH buckets, k-means
    partials, cell assign; ``unit_rows`` applies the same predicate to its
    row-list form plus a finiteness pass). One definition keeps the
    brute≡LSH and indexed≡trained parity invariants from diverging on drop
    semantics: a null vector would TypeError in np.array, a wrong-length
    one breaks the matmul — both are rows the brute path null-safely drops
    via try_divide."""
    return pdf[pdf[col].map(lambda v: v is not None and len(v) == dim)]


def cosine_pairs_above_lsh(emb: DataFrame, threshold: float = 0.9,
                           n_bits: int = 980, bands: int = 70,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           cache_registry: list | None = None,
                           max_bucket: int | None = None) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH — the 100 TB
    candidate route (the blocked-BLAS path is O(N²/B) tiles; this is
    O(collisions)).

    Signature: ``sign(v · h_i)`` for ``n_bits`` hyperplanes (deterministic,
    seed-pinned — resume-safe), banded into ``bands`` bucket keys; docs
    colliding in ≥1 band become candidates, exact-verified with true cosine
    so precision is 1.0 and the output contract equals
    :func:`cosine_pairs_above`. P[bit agrees] = 1 − θ/π.

    Default width 980 bits × 70 bands (14-bit bands) is the measured
    sub-quadratic shape: a random background pair collides per band with
    prob ~2⁻¹⁴, so ~70/2¹⁴ ≈ 0.4 % of all pairs reach the exact verify,
    while a pair at cosine ≥ 0.9 still misses with prob (1−0.856¹⁴)⁷⁰ ≈
    1.5·10⁻⁵, vanishing as cosine → 1 (the near-dup regime this targets).
    Band width decides sub-quadratic-ness — the old 4-bit-band default made
    ~40 % of ALL pairs candidates (quadratic in disguise); size bands so
    background collisions vanish FIRST, then add bands for recall.
    """
    import numpy as np
    import pandas as pd

    if bands <= 0 or n_bits % bands:
        raise ValueError(
            f"cosine_pairs_above_lsh: n_bits ({n_bits}) must be a positive "
            f"multiple of bands ({bands}) — trailing bits would be "
            f"silently dropped, widening every band's collision rate")
    rows_per_band = n_bits // bands
    dim = _infer_dim(emb, vec_col)
    if dim is None:        # empty/all-null input → empty result, like brute
        return emb.sparkSession.createDataFrame(
            [], "d1 long, d2 long, cos_sim double")
    H = np.random.default_rng(1234567).standard_normal((n_bits, dim))
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(H)

    def buckets(batches):
        Hm = bc.value
        for pdf in batches:
            pdf = _scrub_vec_pdf(pdf, vec_col, dim)
            if pdf.empty:
                continue
            M = np.array(pdf[vec_col].map(list).tolist(), dtype=np.float64)
            bits = (M @ Hm.T) > 0                        # [n, n_bits]
            ids, bnd, key = [], [], []
            weights = 1 << np.arange(rows_per_band)
            for b in range(bands):
                seg = bits[:, b * rows_per_band:(b + 1) * rows_per_band]
                k = seg @ weights
                ids.extend(pdf[id_col].tolist())
                bnd.extend([b] * len(pdf))
                key.extend(k.astype("int64").tolist())
            yield pd.DataFrame({"vid": ids, "band": bnd, "bucket": key})

    # persist the band-key frame: both alias-only-different arms of the
    # self-join consume it and ReuseExchange does not fire across them, so
    # without the cache the Arrow matmul pass over every embedding runs
    # once per arm (same gap as the minhash/simhash banding joins). Rows
    # are (long, int, long) — bands rows per doc, payload-free.
    # Partitioned by (band, bucket) at cache time: both join arms and the
    # optional hot-bucket window need exactly that distribution, and the
    # cached partitioning is honored downstream — one exchange at cache
    # fill instead of one per consumer (see dedup.minhash_dedup_pairs).
    sig = emb.mapInPandas(buckets, "vid long, band int, bucket long") \
             .repartition("band", "bucket") \
             .persist()
    if cache_registry is not None:
        cache_registry.append(sig)
    sig.count()
    if max_bucket is not None:
        # skip hot collision groups (boilerplate/duplicate-embedding
        # clusters emit O(bucket²) pairs from one reducer at web scale) —
        # recall is lost only inside the skipped cluster, precision is
        # unchanged (pairs are exact-verified); opt-in, default off, so
        # the brute-force oracle parity holds by default. Same knob as
        # dedup._cap_buckets.
        w = Window.partitionBy("band", "bucket")
        sig = sig.withColumn("_bn", F.count(F.lit(1)).over(w)) \
                 .filter(F.col("_bn") <= max_bucket).drop("_bn")
    a = sig.select(F.col("vid").alias("d1"), "band", "bucket")
    b = sig.select(F.col("vid").alias("d2"), "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
              .filter(F.col("d1") < F.col("d2"))
              .select("d1", "d2").distinct())

    # Exact verify on candidates only. No static broadcast hint on the
    # candidate frame: near-dup-heavy corpora make it arbitrarily large
    # (a forced broadcast would OOM); AQE broadcasts at runtime if it fits.
    base = with_norm(emb, vec_col).select(
        F.col(id_col).alias("_id"), "_v", "_norm")
    j = base.withColumnRenamed("_id", "d1") \
            .withColumnsRenamed({"_v": "_va", "_norm": "_na"}) \
            .join(cand, "d1") \
            .join(base.withColumnRenamed("_id", "d2")
                      .withColumnsRenamed({"_v": "_vb", "_norm": "_nb"}), "d2")
    sim = F.try_divide(_dot(F.col("_va"), F.col("_vb")),
                       F.col("_na") * F.col("_nb"))
    return j.select("d1", "d2", sim.alias("cos_sim")) \
            .filter(F.col("cos_sim") >= threshold)


def train_ivf_codebook(emb: DataFrame, n_cells: int = 16, n_iters: int = 5,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id"):
    """Distributed spherical k-means (Lloyd) — the REAL IVF coarse quantizer.

    Scale shape per iteration: ONE Arrow-batched ``mapInPandas`` pass over
    the corpus emits per-batch partial sums ``(cell, cnt, vsum)`` — a
    map-side combine, so the driver reduce sees O(partitions × n_cells)
    rows of d floats, never O(rows). Assignment inside the kernel is one
    BLAS matmul (batch × cells). Initialization is deterministic (top-K by
    xxhash64 of the id — a distributed order-free sample; no RNG, so
    training is resume-safe and bit-reproducible).

    Returns a ``numpy.ndarray [n_cells, d]`` of unit-norm centroids.
    """
    import numpy as np

    base = emb.select(F.col(id_col).alias("vid"),
                      _as_double(F.col(vec_col)).alias("v"))
    dim = _infer_dim(base, "v")
    if dim is None:
        raise ValueError("train_ivf_codebook: no non-null embeddings to seed")
    # null/ragged rows can neither seed nor train (the assign/partial
    # kernels drop them with the same predicate)
    seeds = base.filter(F.col("v").isNotNull() & (F.size("v") == dim)) \
                .orderBy(F.pmod(F.xxhash64("vid"), F.lit(1_000_003)), "vid") \
                .limit(n_cells).collect()
    # a corpus smaller than n_cells degrades to fewer cells, not a crash
    n_cells = min(n_cells, len(seeds))
    cents = np.array([r["v"] for r in seeds], dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    spark = emb.sparkSession
    for _ in range(n_iters):
        bc = spark.sparkContext.broadcast(cents)

        def partials(batches):
            import pandas as pd
            C = bc.value
            d = C.shape[1]
            for pdf in batches:
                pdf = _scrub_vec_pdf(pdf, "v", d)
                if pdf.empty:
                    continue
                M = np.array(pdf["v"].tolist(), dtype=np.float64)
                Mn = M / np.maximum(
                    np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
                a = np.argmax(Mn @ C.T, axis=1)
                cells, counts, sums = [], [], []
                for cell in np.unique(a):
                    mask = a == cell
                    cells.append(int(cell))
                    counts.append(int(mask.sum()))
                    sums.append(Mn[mask].sum(axis=0).tolist())
                yield pd.DataFrame({"cell": cells, "cnt": counts,
                                    "vsum": sums})

        rows = base.mapInPandas(
            partials, "cell int, cnt long, vsum array<double>").collect()
        new = np.zeros_like(cents)
        cnt = np.zeros(n_cells)
        for r in rows:
            new[r["cell"]] += np.array(r["vsum"])
            cnt[r["cell"]] += r["cnt"]
        for c in range(n_cells):
            if cnt[c] > 0:
                cents[c] = new[c] / max(np.linalg.norm(new[c]), 1e-12)
        bc.unpersist()
    return cents


def assign_cells(emb: DataFrame, cents, vec_col: str = "embedding",
                 cell_col: str = "_cell") -> DataFrame:
    """Nearest-centroid assignment (cosine argmax, BLAS per Arrow batch);
    appends ``cell_col`` — no shuffle, scan-stage only."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(cents, dtype=np.float64))
    out_schema = StructType(list(emb.schema.fields)
                            + [StructField(cell_col, IntegerType())])
    cols = emb.columns

    def assign(batches):
        C = bc.value
        d = C.shape[1]
        for pdf in batches:
            # null/ragged embeddings cannot be assigned a cell — drop them
            # (the exact search over cells would never score them either)
            pdf = _scrub_vec_pdf(pdf, vec_col, d)
            if pdf.empty:
                continue
            M = np.array(pdf[vec_col].map(list).tolist(), dtype=np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True),
                                1e-12)
            a = np.argmax(Mn @ C.T, axis=1).astype("int32")
            yield pd.concat(
                [pdf[cols], pd.Series(a, name=cell_col, index=pdf.index)],
                axis=1)

    return emb.mapInPandas(assign, out_schema)


def _codebook_frame(spark, cents, cell_col: str = "_cell") -> DataFrame:
    """Trained centroid matrix → the probe-side frame
    ``(cell_col, _cv, _cnorm)`` — the ONE centroid definition every trained
    path probes with (see :func:`ivf_topk_trained` / :func:`ivf_topk_indexed`)."""
    cb = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        f"{cell_col} int, _cv array<double>")
    return cb.withColumn("_cnorm", _norm(F.col("_cv")))


def ivf_topk_trained(emb: DataFrame, query_ids: list[int], k: int = 5,
                     n_probe: int = 3, n_cells: int = 16, n_iters: int = 5,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """IVF ANN over a TRAINED k-means codebook (not the fixture ``label``):
    train → assign → probe the n_probe nearest cells per query, exact-search
    only those cells. Recall vs :func:`cosine_topk` asserted in tests.

    Probing uses the trained unit-norm codebook itself (the SAME centroid
    definition :func:`ivf_topk_indexed` persists and probes with — not a
    recomputed raw per-cell mean), so indexed ≡ trained holds by
    construction, for any dataset."""
    cents = train_ivf_codebook(emb, n_cells, n_iters, vec_col, id_col)
    assigned = assign_cells(emb, cents, vec_col)
    cb = _codebook_frame(emb.sparkSession, cents)
    base = with_norm(assigned, vec_col).select(id_col, "_cell", "_v", "_norm")
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"))
    probes = _probe_cells(q, cb, n_probe, "_cell")
    return _exact_search_cells(base, probes, k, "_cell", id_col)


def _probe_cells(q: DataFrame, cents: DataFrame, n_probe: int,
                 cell_col: str) -> DataFrame:
    """Per-query top-``n_probe`` nearest centroid cells.

    ``q`` is ``(q_id, _qv, _qnorm)``, ``cents`` is
    ``(cell_col, _cv, _cnorm)``. Returns ``(q_id, cell_col, _qv, _qnorm)``
    — O(queries × n_probe) rows, carrying the query vectors along so the
    exact-search stage never rescans the query side."""
    qc = q.crossJoin(F.broadcast(cents))
    csim = F.try_divide(_dot(F.col("_qv"), F.col("_cv")),
                        F.col("_qnorm") * F.col("_cnorm"))
    wq = Window.partitionBy("q_id").orderBy(F.desc("_csim"), F.col(cell_col))
    return qc.select("q_id", cell_col, csim.alias("_csim"), "_qv", "_qnorm") \
             .withColumn("_r", F.row_number().over(wq)) \
             .filter(F.col("_r") <= n_probe) \
             .select("q_id", cell_col, "_qv", "_qnorm")


def _exact_search_cells(base: DataFrame, probes: DataFrame, k: int,
                        cell_col: str, id_col: str) -> DataFrame:
    """Exact cosine top-k restricted to each query's probed cells. ``probes``
    is bounded (queries × n_probe) → broadcast is safe by construction."""
    j = base.join(F.broadcast(probes), cell_col) \
            .filter(F.col(id_col) != F.col("q_id"))
    sim = F.try_divide(_dot(F.col("_v"), F.col("_qv")),
                       F.col("_norm") * F.col("_qnorm"))
    scored = j.select("q_id", id_col, sim.alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)) \
                 .filter(F.col("rank") <= k)


def ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
             n_probe: int = 2, cell_col: str = "label",
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF ANN: probe the ``n_probe`` closest cells per query, exact-search
    only those cells. Same output contract as :func:`cosine_topk` (approx —
    recall asserted in tests, not oracle-matched)."""
    cents = centroids(emb, cell_col, vec_col) \
        .select(cell_col, F.col("centroid").alias("_cv"))
    cents = cents.withColumn("_cnorm", _norm(F.col("_cv")))

    base = with_norm(emb, vec_col).select(id_col, cell_col, "_v", "_norm")
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"))

    probes = _probe_cells(q, cents, n_probe, cell_col)
    return _exact_search_cells(base, probes, k, cell_col, id_col)


def build_ivf_index(emb: DataFrame, path: str, n_cells: int = 16,
                    n_iters: int = 5, vec_col: str = "embedding",
                    id_col: str = "vec_id"):
    """Persist an IVF index: ``<path>/codebook`` (one row per cell:
    ``cell int, centroid array<double>``) + ``<path>/cells`` — the corpus
    re-laid-out as parquet PARTITIONED BY the assigned cell.

    This is the build-once/query-many shape ANN needs at corpus scale:
    training + assignment are paid once; every later query batch reads ONLY
    the probed cells' files (Hive-style partition pruning on ``_cell``), so
    per-batch IO is ~n_probe/n_cells of the corpus instead of a full scan —
    the difference between re-deriving the index per run (what
    :func:`ivf_topk_trained` does, fine for one-shot jobs) and serving many
    query batches against 10¹² rows. Training is deterministic
    (hash-sample init, fixed iterations), so rebuilding over unchanged data
    reproduces the index bit-for-bit. Null/ragged embeddings are dropped at
    assignment (they can never be scored). Returns the centroid matrix.
    """
    spark = emb.sparkSession
    cents = train_ivf_codebook(emb, n_cells, n_iters, vec_col, id_col)
    cb = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>")
    cb.coalesce(1).write.mode("overwrite").parquet(f"{path}/codebook")
    assign_cells(emb, cents, vec_col, "_cell") \
        .write.mode("overwrite").partitionBy("_cell").parquet(f"{path}/cells")
    return cents


def ivf_topk_indexed(spark, path: str, query_ids: list[int], k: int = 5,
                     n_probe: int = 3, vec_col: str = "embedding",
                     id_col: str = "vec_id",
                     cache_registry: list | None = None) -> DataFrame:
    """ANN top-k over a persisted :func:`build_ivf_index` layout.

    Two scans, both bounded: (1) the query lookup — an id-pushdown scan
    (``In(vec_id, …)`` reaches the parquet footers; at serving scale the
    cells layout can additionally be sorted by id for row-group skipping);
    (2) the exact search — the cells scan filtered to the probed cell SET,
    collected first (≤ queries × n_probe ints) so the filter is a literal
    ``isin`` and Hive partition pruning drops every unprobed cell's files
    statically (``PartitionFilters`` in the scan, pinned in tests) rather
    than relying on runtime DPP.

    The probes frame is bounded (queries × n_probe rows) and consumed twice,
    so it is collected ONCE and rebuilt as a local frame — no persist, no
    cached-RDD leak in long-lived sessions. ``cache_registry`` is kept for
    API compatibility but nothing is registered anymore."""
    cents = spark.read.parquet(f"{path}/codebook") \
        .select(F.col("cell").alias("_cell"), F.col("centroid").alias("_cv")) \
        .withColumn("_cnorm", _norm(F.col("_cv")))
    cells = spark.read.parquet(f"{path}/cells")
    base = with_norm(cells, vec_col).select(id_col, "_cell", "_v", "_norm")
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"))

    probe_plan = _probe_cells(q, cents, n_probe, "_cell")
    rows = probe_plan.collect()          # bounded: queries × n_probe
    probes = spark.createDataFrame(rows, probe_plan.schema)
    probed = sorted({r["_cell"] for r in rows})
    pruned = base.filter(F.col("_cell").isin(probed))
    return _exact_search_cells(pruned, probes, k, "_cell", id_col)


def cosine_pairs_above_blocked(emb: DataFrame, threshold: float = 0.95,
                               block_size: int = 1024,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id") -> DataFrame:
    """All-pairs cosine ≥ threshold via blocked matrix products.

    **Quadratic bound — not the 100 TB path.** The block-pair grid is
    O((N/block)²) tasks and O(N²·d) total FLOPs regardless of threshold:
    blocking amortizes per-pair overhead into dense BLAS tiles (10-100×
    faster than expression folds) but cannot change the pair count. Use it
    as the exact/oracle kernel at bounded N (verification fixtures, small
    probe sets, per-bucket verify inside LSH). At corpus scale use
    :func:`cosine_pairs_above_lsh` — random-hyperplane candidate generation
    + exact verify, sub-quadratic for any fixed recall target — which is
    pinned equal to this kernel on the clustered fixture
    (tests/test_dedup_text_sim.py).

    Vectors are L2-normalized once, grouped into blocks of ``block_size``,
    and the (upper-triangular) block-pair grid is joined; each block pair
    computes an entire [block × block] similarity tile with one BLAS matmul
    inside an Arrow-batched UDF. Compute per task is O(block² · d) dense
    math (numpy), shuffle is O(N/block · d) block rows — compared to the
    per-pair expression fold this is ~10-100× less overhead, and the block
    grid distributes across the cluster. Same output contract as
    :func:`cosine_pairs_above` (values agree within float round-off; both
    round to 6 decimals downstream).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    # raw vectors go to the kernel; L2-normalization happens in numpy there
    # (one vectorized pass per block — cheaper than per-element JVM lambdas)
    dim = _infer_dim(emb, vec_col)
    if dim is None:        # empty/all-null input → empty result, like brute
        return emb.sparkSession.createDataFrame(
            [], "d1 long, d2 long, cos_sim double")
    blocks = (
        emb.select(F.col(id_col).cast("long").alias("vid"),
                   _as_double(F.col(vec_col)).alias("_u"),
                   F.floor(F.col(id_col) / block_size).alias("_b"))
           .groupBy("_b")
           .agg(F.collect_list(F.struct("vid", "_u")).alias("rows"))
    )
    a = blocks.select(F.col("_b").alias("ba"), F.col("rows").alias("rows_a"))
    b = blocks.select(F.col("_b").alias("bb"), F.col("rows").alias("rows_b"))
    grid = a.join(b, F.col("ba") <= F.col("bb"))

    out_schema = StructType([
        StructField("d1", LongType()), StructField("d2", LongType()),
        StructField("cos_sim", DoubleType()),
    ])

    def tile(batches):
        def unit_rows(rows):
            """ids + unit-normalized matrix; null/ragged rows dropped BEFORE
            np.array (a None or wrong-length vector makes the stack an
            object array and norm() raises — same scrub as the LSH/assign
            kernels), then zero-norm/NaN vectors dropped (matches the brute
            path, where their NULL cos_sim never clears the threshold)."""
            rows = [r for r in rows
                    if r["vid"] is not None
                    and r["_u"] is not None and len(r["_u"]) == dim]
            if not rows:
                return np.empty(0, dtype=np.int64), np.empty((0, dim))
            ids = np.array([r["vid"] for r in rows])
            m = np.array([r["_u"] for r in rows], dtype=np.float64)
            norms = np.linalg.norm(m, axis=1)
            keep = (norms > 0) & np.isfinite(norms) & np.isfinite(m).all(axis=1)
            return ids[keep], m[keep] / norms[keep, None]

        for pdf in batches:
            d1s, d2s, sims = [], [], []
            for _, row in pdf.iterrows():
                ia, ma = unit_rows(row["rows_a"])
                ib, mb = unit_rows(row["rows_b"])
                s = ma @ mb.T
                hit = np.argwhere(s >= threshold)
                for x, y in hit:
                    va, vb = int(ia[x]), int(ib[y])
                    if va < vb:
                        d1s.append(va); d2s.append(vb)
                        sims.append(float(s[x, y]))
            yield pd.DataFrame({"d1": d1s, "d2": d2s, "cos_sim": sims})

    return grid.mapInPandas(tile, out_schema)
