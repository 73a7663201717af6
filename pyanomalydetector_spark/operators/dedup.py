"""Deduplication operators for training-data pipelines.

Four dedup families over the ``documents`` table, all JVM-side (no Python
UDFs) so every expression stays inside whole-stage codegen:

- **exact**: group rows by content → duplicate groups with a canonical
  (minimum) id. At scale, group on a 128-bit content hash first and confirm
  equality only within hash groups — here content is grouped directly because
  the comparison column must match a SQL oracle bit-for-bit.
- **n-gram Jaccard**: word k-shingles → inverted-index self-join → exact
  Jaccard ≥ t. The self-join shuffles by shingle; hot shingles are AQE
  skew-split. This is the *oracle* path — O(pairs sharing a shingle).
- **MinHash + LSH**: shingles → ``num_hashes`` min-hash signature (one
  groupBy) → banded LSH buckets → candidate pairs → exact-Jaccard verify.
  The scale path: candidate generation touches only colliding bands, never
  all pairs. With r rows/band, P[miss pair with sim j] = (1−j^r)^bands —
  at j ≥ 0.9, r=3, b=10 that is ≈ 2·10⁻⁶, so LSH output equals the
  brute-force output on any realistic corpus (verified against the oracle).
- **SimHash**: 32-bit sign-sum fingerprint of word hashes; near-dups =
  pairs within ``max_hamming``. Candidate generation by the pigeonhole
  banding trick (hamming ≤ h ⇒ some (h+1)-way band is equal).

Word hashes use ``int(md5(word)[:8], 16)`` — computable identically in Spark
(``conv(substring(md5(w),1,8),16,10)``) and in the DuckDB oracle
(``('0x'||substr(md5(w),1,8))::BIGINT``), so fingerprints are engine-portable.

Reference lineage: the reference dedups only keys (drop_duplicates —
/root/reference/reporter.py:23, detector.py:226); content-level dedup is part
of this engine's training-data charter (SURVEY.md §7.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 32


def word_hash(col) -> F.Column:
    """Engine-portable 32-bit word hash: int(md5(w)[:8], 16)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def _parallelize_narrow_scan(docs: DataFrame) -> DataFrame:
    """Round-robin repartition the doc scan IF it under-splits the cores.

    The shingle/fingerprint kernels are compute-heavy per input row
    (per-word hashing, k-gram rolling) while the input scan is byte-cheap —
    a corpus file smaller than one parquet row group yields ONE split, and
    everything up to the first shuffle runs single-threaded. At real corpus
    scale splits ≫ cores and this guard is a no-op (the condition is
    false); on a small/under-split input the one narrow-payload shuffle
    buys scan-stage parallelism for the expensive compute above it
    (measured 2.3 s → 0.2 s shingle materialization at sf0.1)."""
    target = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() >= max(2, target // 2):
        return docs
    return docs.repartition(target)


# ------------------------------------------------------------------ exact ----

def exact_duplicate_groups(df: DataFrame, content_cols: list[str],
                           id_col: str = "doc_id") -> DataFrame:
    """Membership of duplicate-content groups.

    Returns ``(doc_id, canonical_id, group_cnt)`` — one row per distinct id in
    each group of >1 identical rows; canonical = min id (equal to ``doc_id``
    itself when the duplicate rows share an id, as the injected fixture dups
    do).

    Scale design: the wide content (token arrays) never crosses the main
    shuffle. Pass 1 aggregates 8-byte ``xxhash64(content)`` values to find
    candidate hash groups; pass 2 re-scans with a semi-join on those (tiny)
    hashes and does the exact content-grouping window only over candidate
    rows — hash collisions between distinct contents are harmless because
    the final window partitions by the actual content.
    """
    content = [F.col(c) for c in content_cols]
    h = F.xxhash64(*content).alias("_h")
    hashed = df.select(id_col, *content_cols, h)

    dup_hashes = (
        hashed.groupBy("_h").agg(F.count(F.lit(1)).alias("_c"))
              .filter(F.col("_c") > 1).select("_h")
    )
    cands = hashed.join(dup_hashes, "_h", "left_semi")

    w = Window.partitionBy(*content_cols)
    return (
        cands.withColumn("canonical_id", F.min(id_col).over(w))
             .withColumn("group_cnt", F.count(F.lit(1)).over(w))
             .filter(F.col("group_cnt") > 1)
             .select(id_col, "canonical_id", "group_cnt")
             .distinct()
    )


# --------------------------------------------------------------- shingles ----

def shingles(docs: DataFrame, k: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Distinct word k-gram shingles per doc: ``(doc_id, sh)``.

    Pure array expressions (split → transform over a sequence of offsets →
    array_distinct → explode); a doc shorter than k words yields no shingles.
    """
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(words, i, k), " "),
    )
    grams = F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(F.array_distinct(grams)).alias("sh"))
    )


def hashed_shingles(docs: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Distinct 64-bit-hashed word k-grams per doc: ``(doc_id, sh:bigint)``.

    The minhash-path shingle representation: hash each word once, then
    roll adjacent hashes together with ``zip_with``+``xxhash64`` — no
    per-offset string slicing/joining, and the exploded/cached/shuffled
    payload is 8 bytes instead of a k-word string (measured 3.7× faster
    materialization at sf0.1). Set Jaccard over hashed shingles equals
    string-shingle Jaccard absent 64-bit collisions (~n²·2⁻⁶⁴), which the
    oracle equality of ``doc_dedup_minhash`` exercises end-to-end.
    """
    words = F.split(F.col(text_col), " ")
    hw = F.transform(words, lambda w: F.xxhash64(w))
    m = F.size(words) - (k - 1)
    g = F.slice(hw, 1, m)
    for off in range(2, k + 1):
        g = F.zip_with(g, F.slice(hw, off, m), lambda a, b: F.xxhash64(a, b))
    g = F.when(F.size(words) >= k, g) \
         .otherwise(F.array().cast("array<bigint>"))
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(F.array_distinct(g)).alias("sh"))


def _pair_jaccard(sh: DataFrame) -> DataFrame:
    """All (d1 < d2) pairs sharing ≥1 shingle, with exact Jaccard."""
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("d1"), "sh")
    b = sh.select(F.col("doc_id").alias("d2"), "sh")
    inter = (
        a.join(b, "sh")
         .filter(F.col("d1") < F.col("d2"))
         .groupBy("d1", "d2").agg(F.count(F.lit(1)).alias("inter"))
    )
    na = counts.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"))
    nb = counts.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"))
    # no static broadcast hint on the per-doc count frames: one row per doc
    # is unbounded at corpus scale (a forced broadcast would OOM exactly
    # like the candidate-pair hint this module already dropped); AQE
    # broadcasts them at runtime when they actually fit
    return (
        inter.join(na, "d1").join(nb, "d2")
             .withColumn("jaccard",
                         F.col("inter") /
                         (F.col("n1") + F.col("n2") - F.col("inter")))
    )


def jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.8,
                  text_col: str = "text") -> DataFrame:
    """Brute n-gram Jaccard near-dup pairs: ``(d1, d2, jaccard)``, j ≥ t."""
    sh = shingles(_parallelize_narrow_scan(docs), k, text_col)
    return _pair_jaccard(sh).filter(F.col("jaccard") >= threshold) \
                            .select("d1", "d2", "jaccard")


# ---------------------------------------------------------- MinHash + LSH ----

def minhash_signatures(sh: DataFrame, num_hashes: int = 30) -> DataFrame:
    """(doc_id, h0..h{n-1}) min-hash signature via ONE groupBy.

    Each hash family member is ``xxhash64(seed_i, shingle)``; the signature is
    ``num_hashes`` min-aggregates of the same exploded shingle frame — a
    single map-side-combined shuffle, O(#docs × num_hashes) state.
    """
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}")
            for i in range(num_hashes)]
    return sh.groupBy("doc_id").agg(*aggs)


def _cap_buckets(stacked: DataFrame, max_bucket: int | None) -> DataFrame:
    """Optionally drop banding rows whose (band, bucket) collision group
    exceeds ``max_bucket`` members — the standard web-scale LSH mitigation
    for *hot buckets* (boilerplate/template clusters that collide by the
    thousands and would emit O(bucket²) candidate pairs from one reducer).
    Skipping a hot bucket loses recall ONLY within that boilerplate cluster
    (precision is unaffected — every emitted pair is still exact-verified);
    at 100 TB that trade is taken deliberately, so it is an opt-in knob,
    default off (``None``), keeping brute-force oracle parity by default.

    One window count over the same (band, bucket) hash partitioning the
    downstream self-join shuffles on — no extra scan of the corpus.
    """
    if max_bucket is None:
        return stacked
    w = Window.partitionBy("band", "bucket")
    return stacked.withColumn("_bn", F.count(F.lit(1)).over(w)) \
                  .filter(F.col("_bn") <= max_bucket).drop("_bn")


def _band_stack(sig: DataFrame, bands: int, rows: int) -> DataFrame:
    """``(doc_id, band, bucket)`` banding rows from a signature frame: band
    key = hash of that band's ``rows`` signature slots."""
    band_cols = [
        F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("doc_id", *band_cols)
    return banded.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
            for b in range(bands)
        ])).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def lsh_candidates(sig: DataFrame, bands: int = 10, rows: int = 3,
                   max_bucket: int | None = None) -> DataFrame:
    """Banded-LSH candidate pairs (d1 < d2) from min-hash signatures.

    Band key = hash of its ``rows`` signature slots; docs sharing any band
    bucket become candidates. Shuffle is by (band, bucket) — collision
    groups only, never the full pair space. ``max_bucket`` skips hot
    collision groups (see :func:`_cap_buckets`).

    The explicit ``repartition(band, bucket)`` BELOW the arm aliases is a
    shuffle-count optimization, not a semantic one: the two self-join arms
    differ only by alias, so without it each arm plans its own Exchange
    over its own copy of the stack (alias-bearing Projects make the
    Exchanges non-identical — ReuseExchange never fires). With the
    repartition below the aliases both arms share ONE identical Exchange,
    so the stack is banded and shuffled once, and the hot-bucket window
    (same keys) rides the same partitioning.
    """
    stacked = _cap_buckets(
        _band_stack(sig, bands, rows).repartition("band", "bucket"),
        max_bucket)
    a = stacked.select(F.col("doc_id").alias("d1"), "band", "bucket")
    b = stacked.select(F.col("doc_id").alias("d2"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
         .filter(F.col("d1") < F.col("d2"))
         .select("d1", "d2").distinct()
    )


def minhash_dedup_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.8,
                        num_hashes: int = 30, bands: int = 10, rows: int = 3,
                        text_col: str = "text",
                        cache_registry: list | None = None,
                        max_bucket: int | None = None) -> DataFrame:
    """MinHash+LSH near-dup pairs with exact-Jaccard verification.

    Output contract equals :func:`jaccard_pairs` (candidates are verified
    with true Jaccard), so the brute-force SQL oracle applies; only the
    candidate-generation cost differs — this is the 100 TB path.

    The shingle frame is persisted (consumed by both the signature pass and
    the exact-verify pass); long-lived callers pass ``cache_registry`` to
    collect it for unpersist after the result is materialized.
    """
    sh = hashed_shingles(_parallelize_narrow_scan(docs), k, text_col).persist()
    if cache_registry is not None:
        cache_registry.append(sh)
    # Persist the BANDED stack, not the signature frame and not the
    # candidate pairs. The stack is the true multi-consumer (both self-join
    # arms + the candidate-id derivation below) and it is BOUNDED —
    # O(docs × bands) rows of (doc_id, band, bucket). The candidate PAIR
    # list, by contrast, is unbounded (30-50 % dup corpora make it
    # O(collision pairs) — billions of rows), so caching it, as an earlier
    # version did, is a memory liability at exactly the corpora dedup is
    # for. Eager count: the consumers are concurrent stages of one job and
    # a lazy cache would be raced (the documented lazy-persist race).
    #
    # The cache is partitioned by (band, bucket) BEFORE persist: all three
    # consumers — both self-join arms and the candidate-id window below —
    # require exactly that distribution, and a cached plan's output
    # partitioning is honored downstream (Spark 4 default
    # canChangeCachedPlanOutputPartitioning=false), so ONE exchange at
    # cache-fill time replaces three full-stack exchanges after it
    # (verified in tests/test_explain_plans.py). The shingle frame `sh` is
    # deliberately NOT repartitioned by doc_id: the signature groupBy's
    # map-side partial min-states (~250 B/doc) shuffle far less than raw
    # shingles would, and a pre-partition would forfeit that combine.
    stacked = _cap_buckets(
        _band_stack(minhash_signatures(sh, num_hashes), bands, rows)
        .repartition("band", "bucket"),
        max_bucket).persist()
    if cache_registry is not None:
        cache_registry.append(stacked)
    stacked.count()

    a = stacked.select(F.col("doc_id").alias("d1"), "band", "bucket")
    b = stacked.select(F.col("doc_id").alias("d2"), "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
             .filter(F.col("d1") < F.col("d2"))
             .select("d1", "d2").distinct())
    # candidate doc-ids straight from the stack: a doc is in some candidate
    # pair iff it shares a (band, bucket) with another doc — one window
    # count over the SAME (band, bucket) partitioning the join shuffles on.
    # This keeps `cand` single-consumer (it streams lazily into the verify
    # join) instead of materializing the pair list to feed the id union.
    w = Window.partitionBy("band", "bucket")
    cand_ids = (stacked.withColumn("_n", F.count(F.lit(1)).over(w))
                       .filter(F.col("_n") > 1)
                       .select("doc_id").distinct())

    return _verify_pairs(sh, cand, threshold, cand_ids=cand_ids)


def _verify_pairs(sh: DataFrame, cand: DataFrame, threshold: float,
                  cand_ids: DataFrame | None = None) -> DataFrame:
    """Exact-verify ONLY the candidate pairs: join the candidate set against
    per-doc shingle sets and take array_intersect — never the full
    inverted-index self-join (that's the brute-force oracle path;
    re-using it here would make LSH do strictly more work than brute).

    Scale discipline (100 TB): (a) semi-join the shingle frame to the
    candidate doc-id set BEFORE collect_set, so only candidate docs'
    shingles ever shuffle — a web corpus with a sparse near-dup rate
    must not pay a full-corpus shingle shuffle just to verify;
    (b) no static broadcast hint on the candidate frame — duplicate-heavy
    corpora (30-50 % dup rates) make it billions of rows, which would OOM
    a forced broadcast. AQE broadcasts it at runtime when it actually fits.

    ``cand_ids`` (the distinct doc-ids appearing in any pair) can be passed
    by callers who can derive it more cheaply than unioning the pair list
    (e.g. from the banded stack); when given, ``cand`` has exactly ONE
    consumer here and need not be persisted by the caller.
    """
    if cand_ids is None:
        cand_ids = (cand.select(F.col("d1").alias("doc_id"))
                        .unionByName(cand.select(F.col("d2").alias("doc_id")))
                        .distinct())
    sets = (sh.join(cand_ids, "doc_id", "left_semi")
              .groupBy("doc_id").agg(F.collect_set("sh").alias("_shs")))
    j = sets.select(F.col("doc_id").alias("d1"), F.col("_shs").alias("_s1")) \
            .join(cand, "d1") \
            .join(sets.select(F.col("doc_id").alias("d2"),
                              F.col("_shs").alias("_s2")), "d2")
    inter = F.size(F.array_intersect("_s1", "_s2"))
    jacc = F.try_divide(inter,
                        F.size("_s1") + F.size("_s2") - inter)
    return j.select("d1", "d2", jacc.alias("jaccard")) \
            .filter(F.col("jaccard") >= threshold)


# ------------------------------------------------ incremental dedup store ----

def build_minhash_store(docs: DataFrame, path: str, k: int = 3,
                        num_hashes: int = 30, bands: int = 10, rows: int = 3,
                        text_col: str = "text") -> None:
    """Persist the corpus-side dedup assets for INCREMENTAL ingest:

    - ``<path>/signatures`` — ``(doc_id, h0..h{n-1})`` min-hash signatures;
    - ``<path>/shingles``   — ``(doc_id, sh)`` hashed shingles (exact-verify
      side; 8 bytes/shingle, the same payload discipline as the in-memory
      path);
    - ``<path>/meta``       — one row pinning (k, num_hashes, bands, rows)
      so a query/append can never silently mix hash families.

    A training pipeline ingests shard after shard; re-shingling and
    re-hashing the full corpus per shard is O(corpus) work for an O(shard)
    question. With the store, :func:`minhash_pairs_vs_store` pays
    signature cost only for the new batch and :func:`append_to_minhash_store`
    folds the batch in afterwards — the corpus text itself is never re-read.
    """
    spark = docs.sparkSession
    sh = hashed_shingles(_parallelize_narrow_scan(docs), k, text_col).persist()
    try:
        minhash_signatures(sh, num_hashes) \
            .write.mode("overwrite").parquet(f"{path}/signatures")
        sh.write.mode("overwrite").parquet(f"{path}/shingles")
    finally:
        sh.unpersist()
    spark.createDataFrame(
        [(k, num_hashes, bands, rows)],
        "k int, num_hashes int, bands int, rows int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def _read_store_meta(spark, path: str):
    """The store's 1-row (k, num_hashes, bands, rows) pin. Read driver-side
    via pyarrow when the store is on a local filesystem — a metadata lookup
    should not cost a Spark job (one job ≈ 0.3-0.5 s of the serve path's
    fixed latency); falls back to a Spark read for remote/DFS paths."""
    meta_dir = f"{path}/meta"
    if os.path.isdir(meta_dir):
        import pyarrow.dataset as ds
        # ds.dataset's default ignore_prefixes ('.', '_') skips _SUCCESS
        return ds.dataset(meta_dir, format="parquet").to_table() \
                 .to_pylist()[0]
    return spark.read.parquet(meta_dir).first().asDict()


def _check_store_ids_disjoint(docs: DataFrame, path: str, op: str) -> None:
    """Fail loudly if a batch re-ingests a doc_id already in the store.

    The store APIs require batch/store id-disjointness: a duplicated id
    would merge both versions' shingles into one ``collect_set`` inside
    ``_verify_pairs``, silently corrupting every Jaccard touching that doc.
    Cost: one doc_id-pruned scan of the signatures asset semi-joined to the
    batch ids (no payload moves); pass ``check_disjoint=False`` to skip it
    when the pipeline guarantees fresh ids."""
    store_ids = docs.sparkSession.read.parquet(f"{path}/signatures") \
                    .select("doc_id")
    dup = store_ids.join(docs.select("doc_id").distinct(),
                         "doc_id", "left_semi")
    sample = [r["doc_id"] for r in dup.limit(5).collect()]
    if sample:
        raise ValueError(
            f"{op}: batch re-ingests doc_ids already present in the store "
            f"at {path} (sample: {sample}) — duplicated ids would silently "
            f"corrupt Jaccard verification; dedupe the batch ids first or "
            f"pass check_disjoint=False if this is intentional")


def append_to_minhash_store(docs: DataFrame, path: str,
                            text_col: str = "text",
                            check_disjoint: bool = True) -> None:
    """Fold an ingested batch into the store (parquet append on both
    assets). Call AFTER its pairs were emitted, so later batches dedup
    against it. Params come from ``<path>/meta`` — the caller cannot
    drift the hash family.

    Shingles are appended BEFORE signatures: the two appends are not
    atomic, and a shingles-only doc is harmless (it never bands into a
    candidate), whereas a signature-only doc would silently drop every
    pair touching it at verify time. Re-ingested ids fail loudly (see
    :func:`_check_store_ids_disjoint`)."""
    if check_disjoint:
        _check_store_ids_disjoint(docs, path, "append_to_minhash_store")
    m = _read_store_meta(docs.sparkSession, path)
    sh = hashed_shingles(_parallelize_narrow_scan(docs),
                         int(m["k"]), text_col).persist()
    try:
        sh.write.mode("append").parquet(f"{path}/shingles")
        minhash_signatures(sh, int(m["num_hashes"])) \
            .write.mode("append").parquet(f"{path}/signatures")
    finally:
        sh.unpersist()


def minhash_pairs_vs_store(new_docs: DataFrame, path: str,
                           threshold: float = 0.8, text_col: str = "text",
                           cache_registry: list | None = None,
                           max_bucket: int | None = None,
                           check_disjoint: bool = True) -> DataFrame:
    """Near-dup pairs TOUCHING the new batch — new-vs-corpus and
    new-vs-new — against a :func:`build_minhash_store` layout. Same output
    contract as :func:`minhash_dedup_pairs` restricted to pairs with at
    least one new doc (pinned in tests: batched ingest ≡ one-shot
    recompute minus pre-existing corpus-internal pairs).

    Scale shape: only the new batch is shingled/hashed (its banding frame
    is cached — O(batch × bands) rows); the store's signature scan streams
    through ONE (band, bucket) shuffle join per side, and the store's
    shingle scan is semi-joined to candidate ids before any collect_set
    (``_verify_pairs``), so corpus IO for the verify stage is proportional
    to the candidate set, not the corpus. ``max_bucket`` here caps
    collision groups by their STORE-side size (hot boilerplate clusters
    live in the corpus; the cap is evaluated without waiting on the new
    batch's counts).

    Precondition: batch doc_ids are DISJOINT from the store's (enforced by
    default — re-ingested ids would merge two shingle sets into one doc at
    verify time; see :func:`_check_store_ids_disjoint`)."""
    spark = new_docs.sparkSession
    if check_disjoint:
        _check_store_ids_disjoint(new_docs, path, "minhash_pairs_vs_store")
    m = _read_store_meta(spark, path)
    k, num_hashes = int(m["k"]), int(m["num_hashes"])
    bands, rows = int(m["bands"]), int(m["rows"])

    sh_new = hashed_shingles(_parallelize_narrow_scan(new_docs),
                             k, text_col).persist()
    if cache_registry is not None:
        cache_registry.append(sh_new)
    # cached + eagerly materialized: consumed by the vs-store join AND both
    # arms of the within-batch self-join (alias-only arms don't reuse
    # exchanges; concurrent stages would each recompute a lazy cache).
    # Partitioned by (band, bucket) at cache time so all three consumers
    # reuse the cached distribution instead of re-exchanging (see
    # minhash_dedup_pairs).
    stack_new = _band_stack(minhash_signatures(sh_new, num_hashes),
                            bands, rows) \
        .repartition("band", "bucket").persist()
    if cache_registry is not None:
        cache_registry.append(stack_new)
    stack_new.count()

    stack_old = _band_stack(
        spark.read.parquet(f"{path}/signatures"), bands, rows)
    stack_old = _cap_buckets(stack_old, max_bucket)

    a = stack_new.select(F.col("doc_id").alias("da"), "band", "bucket")
    b_old = stack_old.select(F.col("doc_id").alias("db"), "band", "bucket")
    b_new = stack_new.select(F.col("doc_id").alias("db"), "band", "bucket")
    cross = a.join(b_old, ["band", "bucket"]).select("da", "db")
    within = a.join(b_new, ["band", "bucket"]) \
              .filter(F.col("da") < F.col("db")).select("da", "db")
    # least/greatest: a new doc's id can sort before OR after a corpus id,
    # and the (d1 < d2) output contract must hold either way
    cand = (cross.unionByName(within)
                 .select(F.least("da", "db").alias("d1"),
                         F.greatest("da", "db").alias("d2"))
                 .filter(F.col("d1") != F.col("d2"))
                 .distinct().persist())
    if cache_registry is not None:
        cache_registry.append(cand)
    cand.count()        # feeds three verify branches (see minhash_dedup_pairs)

    sh_all = sh_new.unionByName(spark.read.parquet(f"{path}/shingles"))
    return _verify_pairs(sh_all, cand, threshold)


def minhash_pairs_in_store(spark, path: str, threshold: float = 0.8,
                           cache_registry: list | None = None,
                           max_bucket: int | None = None) -> DataFrame:
    """Near-dup pairs WITHIN a persisted :func:`build_minhash_store` — a
    full corpus dedup pass that never re-reads or re-shingles the corpus
    text: candidates come from banding the STORED signatures, verification
    from the STORED shingles. This is the maintenance query a store-backed
    pipeline runs after a season of appends — or to re-dedup at a NEW
    ``threshold``, which is a query-time parameter here (the store pins
    only the hash family), so tightening 0.8 → 0.9 costs one pass over
    the store assets instead of a corpus re-shingle.

    Output contract equals :func:`minhash_dedup_pairs` over the same
    corpus/params (pinned in tests/test_dedup_incremental.py), so the
    brute-force Jaccard SQL is its oracle. Same scale shape too: the
    banded stack is the one cached multi-consumer frame (bounded,
    O(docs × bands)); the candidate pair list stays lazy/single-consumer;
    store shingles are semi-joined to candidate ids before any
    ``collect_set``.
    """
    m = _read_store_meta(spark, path)
    bands, rows = int(m["bands"]), int(m["rows"])

    stacked = _cap_buckets(
        _band_stack(spark.read.parquet(f"{path}/signatures"), bands, rows)
        .repartition("band", "bucket"),
        max_bucket).persist()
    if cache_registry is not None:
        cache_registry.append(stacked)
    stacked.count()     # multi-consumer: lazy caches race concurrent stages

    a = stacked.select(F.col("doc_id").alias("d1"), "band", "bucket")
    b = stacked.select(F.col("doc_id").alias("d2"), "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
             .filter(F.col("d1") < F.col("d2"))
             .select("d1", "d2").distinct())
    w = Window.partitionBy("band", "bucket")
    cand_ids = (stacked.withColumn("_n", F.count(F.lit(1)).over(w))
                       .filter(F.col("_n") > 1)
                       .select("doc_id").distinct())
    return _verify_pairs(spark.read.parquet(f"{path}/shingles"), cand,
                         threshold, cand_ids=cand_ids)


def _swap_asset_dir(spark, live_dir: str, staged_dir: str) -> None:
    """Replace a store asset directory with its freshly-staged rewrite via
    the Hadoop FileSystem API (works on local FS and any Hadoop-supported
    DFS alike; an Iceberg-backed store would use DELETE WHERE + snapshot
    expiry instead). Rename is the closest-to-atomic primitive the layout
    offers: the live dir is parked at ``<dir>.retired`` until the staged
    dir lands, so a crash leaves either the old or the new asset whole,
    never a half-written mix."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    fs = HPath(live_dir).getFileSystem(conf)
    retired = HPath(live_dir + ".retired")
    fs.delete(retired, True)
    if not fs.rename(HPath(live_dir), retired):
        raise IOError(f"compact: could not park {live_dir}")
    if not fs.rename(HPath(staged_dir), HPath(live_dir)):
        # roll back so the store is still readable
        fs.rename(retired, HPath(live_dir))
        raise IOError(f"compact: could not land {staged_dir}")
    fs.delete(retired, True)


def compact_minhash_store(spark, path: str, delete_ids) -> dict:
    """Retire deleted documents from a persisted minhash store — the
    retention discipline the reference applies to its history tables
    (models/history.py:51-53, trim/remove on update) carried over to the
    dedup assets, so the store does not grow monotonically under churn.

    Both assets are rewritten WITHOUT the retired ids (one doc_id-pruned
    anti-join scan each — no shingle payload is ever collected), staged
    next to the live directories, then swapped in. Asset order mirrors
    :func:`append_to_minhash_store`'s crash-safety argument, inverted for
    deletes: SHINGLES are swapped first, so a crash between the two swaps
    leaves retired ids with a signature but no shingles — every interim
    behavior is then either already the post-compact one or fails LOUD:
    pairs touching a retired id drop out of verification (they are being
    deleted — that is the goal state), and a re-ingest of a retired id is
    still rejected by :func:`_check_store_ids_disjoint` (which scans
    signatures) until the compaction is re-run, which is idempotent. The
    opposite order (signatures first) would open a SILENT corruption
    window: with the signature gone the disjointness guard passes, a
    revised re-ingest appends fresh shingles NEXT TO the stale ones, and
    ``_verify_pairs``'s collect_set then merges two document versions
    into one shingle set — wrong Jaccard values with no error.

    ``delete_ids``: a DataFrame with a ``doc_id`` column, or a Python
    iterable of ids (kept driver-side only long enough to build a frame).
    Returns ``{"retired": n_removed_docs, "remaining": n_left_docs}``.
    Deleting ids absent from the store is a no-op for those ids.
    """
    if not isinstance(delete_ids, DataFrame):
        delete_ids = spark.createDataFrame(
            [(str(i),) for i in delete_ids], "doc_id string")

    sig = spark.read.parquet(f"{path}/signatures")
    # align the id type to the store's (ANSI mode: a plain cast on an
    # unparseable id aborts the job; try_cast -> NULL -> dropped -> no-op,
    # matching "deleting absent ids is a no-op")
    id_type = sig.schema["doc_id"].dataType
    dels = (delete_ids.select(F.col("doc_id").try_cast(id_type)
                              .alias("doc_id"))
                      .filter(F.col("doc_id").isNotNull()).distinct())
    kept_sig = sig.join(dels, "doc_id", "left_anti")
    kept_sig.write.mode("overwrite").parquet(f"{path}/signatures.staged")
    kept_sh = spark.read.parquet(f"{path}/shingles") \
                   .join(dels, "doc_id", "left_anti")
    kept_sh.write.mode("overwrite").parquet(f"{path}/shingles.staged")

    n_before = sig.select("doc_id").distinct().count()
    # shingles FIRST (see crash-safety argument in the docstring)
    _swap_asset_dir(spark, f"{path}/shingles", f"{path}/shingles.staged")
    _swap_asset_dir(spark, f"{path}/signatures", f"{path}/signatures.staged")
    n_after = spark.read.parquet(f"{path}/signatures") \
                   .select("doc_id").distinct().count()
    return {"retired": n_before - n_after, "remaining": n_after}


# ---------------------------------------------------------------- SimHash ----

def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = HASH_BITS) -> DataFrame:
    """32-bit SimHash per doc: ``(doc_id, simhash)``.

    Explode words (with multiplicity — SimHash weights by term frequency),
    hash each with the portable md5-based word hash, then one groupBy with
    ``bits`` conditional sign-sums; bit b of the fingerprint is 1 iff the
    sign-sum for b is positive.
    """
    w = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).withColumn("h", word_hash(F.col("w")))
    sums = w.groupBy("doc_id").agg(*[
        F.sum(F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1))
         .alias(f"s{b}")
        for b in range(bits)
    ])
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.cast("bigint").alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", bits: int = HASH_BITS,
                  cache_registry: list | None = None,
                  max_bucket: int | None = None) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split the fingerprint into ``max_hamming + 1`` bands;
    any pair within the distance budget collides on at least one whole band,
    so the self-join runs on (band, band_value) buckets, then the exact
    ``bit_count(xor) ≤ h`` filter confirms. Returns ``(d1, d2, hamming)``.
    ``max_bucket`` skips hot collision groups (see :func:`_cap_buckets`).

    The cached multi-consumer frame is the BANDED STACK, partitioned by
    (band, bucket) before persist — the same layout discipline as
    minhash_dedup_pairs: both self-join arms (which differ only by alias,
    so ReuseExchange never fires across them — measured: the word-explode
    + 32-agg groupBy ran twice without a cache) and the optional
    hot-bucket window all need exactly that distribution, and a cached
    plan's output partitioning is honored downstream, so the fingerprint
    computation runs once and NOTHING re-shuffles after the cache fill.
    The stack carries ``simhash`` (needed by the exact hamming confirm),
    so it subsumes the fingerprint frame an earlier version cached —
    footprint is bands× more rows but still 32 B each, the cheapest frame
    in the pipeline. Eagerly materialized (lazy caches race concurrent
    stages); long-lived callers pass ``cache_registry`` to collect it for
    unpersist after materialization.
    """
    n_bands = max_hamming + 1
    band_width = bits // n_bands
    sh = simhash(_parallelize_narrow_scan(docs), text_col, bits=bits)

    def band_val(col, b):
        # bits [b*w, (b+1)*w) — last band takes the remainder
        width = band_width if b < n_bands - 1 else bits - b * band_width
        return F.shiftrightunsigned(col.cast("long"), b * band_width) \
                .bitwiseAND(F.lit((1 << width) - 1))

    stacked = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     band_val(F.col("simhash"), b).alias("bucket"))
            for b in range(n_bands)
        ])).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bucket")
    stacked = _cap_buckets(stacked.repartition("band", "bucket"),
                           max_bucket).persist()
    if cache_registry is not None:
        cache_registry.append(stacked)
    stacked.count()
    a = stacked.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("f1"),
                       "band", "bucket")
    b = stacked.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("f2"),
                       "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
         .filter(F.col("d1") < F.col("d2"))
         .select("d1", "d2", "f1", "f2").distinct()
    )
    ham = F.bit_count(F.col("f1").bitwiseXOR(F.col("f2")))
    return pairs.withColumn("hamming", ham.cast("int")) \
                .filter(F.col("hamming") <= max_hamming) \
                .select("d1", "d2", "hamming")


# ------------------------------------------------- duplicate clusters ----

def duplicate_clusters(pairs: DataFrame, max_iters: int = 50) -> DataFrame:
    """Connected components over near-dup pair edges — the dedup stage after
    pair generation: every doc maps to its cluster representative (the
    smallest doc id reachable through dup edges), which is the canonical
    keeper; all other members are the removal set.

    Distributed min-label propagation with POINTER JUMPING: per round,
    every node takes the min of its own label and its neighbours' labels
    (one join + one min-agg), then compresses label chains one hop
    (``label ← label(label)`` — sound because labels are monotonically
    decreasing node ids inside the node's own component, so chasing a
    label stays within the component and can only move toward its min).
    The jump is the Hash-to-Min/pointer-doubling idea (Rastogi et al.,
    "Finding Connected Components in Map-Reduce", ICDE 2013): combined
    rounds converge in O(log diameter) instead of O(diameter), so a
    pathological dup CHAIN (templated docs A≈B≈C≈…, diameter ~cluster
    size) needs ~log₂(n) rounds where plain propagation needs n — with
    ``max_iters=50`` the algorithm now covers any component a 10¹²-row
    corpus could contain (2⁵⁰ diameter) rather than failing loudly at
    depth 50. A localCheckpoint cuts lineage per round; convergence is
    detected with an O(changed)-cost probe.

    Returns ``(doc_id, cluster_rep)`` for every doc appearing in a pair.
    """
    edges = pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
    edges = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint()

    labels = edges.select(F.col("a").alias("node")).distinct() \
                  .withColumn("label", F.col("node")).localCheckpoint()

    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels.select(F.col("node").alias("b"),
                                     F.col("label").alias("_nl")), "b")
                 .groupBy("a").agg(F.min("_nl").alias("_nl"))
        )
        new = (
            labels.join(nbr_min.withColumnRenamed("a", "node"), "node", "left")
                  .select("node",
                          F.least("label",
                                  F.coalesce("_nl", F.col("label")))
                           .alias("label"))
        )
        # pointer jump: label ← label(label). Every label IS a node (labels
        # start as self and only ever take existing node ids), so the
        # mapping join always resolves; left join + coalesce keeps
        # self-labelled roots (label(x) = x) unchanged.
        m = new.select(F.col("node").alias("_mn"), F.col("label").alias("_ml"))
        new = (
            new.join(m, new["label"] == m["_mn"], "left")
               .select("node",
                       F.coalesce("_ml", F.col("label")).alias("label"))
               .localCheckpoint()
        )
        changed = new.alias("n").join(
            labels.alias("o"), "node").filter(F.col("n.label") != F.col("o.label"))
        labels = new
        if changed.isEmpty():
            break
    else:
        # silent non-convergence would return WRONG representatives for
        # components deeper than max_iters — fail loudly instead
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iters} rounds "
            "(a dup chain deeper than the iteration cap); raise max_iters")
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_rep"))


# ----------------------------------------------------- decontamination ----

def contamination_scores(docs: DataFrame, benchmark_docs: DataFrame,
                         k: int = 3, text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: per doc, the fraction of its distinct
    k-gram shingles that appear ANYWHERE in the benchmark corpus —
    the standard eval-set-leak screen for training data.

    Scale shape: the benchmark's distinct shingle set is tiny relative to
    the corpus (eval sets are millions of shingles, the corpus is
    trillions), so it BROADCASTS and the corpus shingles are scored with a
    map-side semi-join — the training-corpus payload never shuffles.
    Shingles are 64-bit hashes (hashed_shingles), so the broadcast is
    8 bytes per benchmark shingle.

    Returns ``(doc_id, n_shingles, n_hits, overlap)``; docs shorter than
    ``k`` words have no shingles and are omitted (nothing to match on).
    """
    d = hashed_shingles(_parallelize_narrow_scan(docs), k, text_col)
    bench = hashed_shingles(benchmark_docs, k, text_col) \
        .select("sh").distinct()
    scored = d.join(F.broadcast(bench), "sh", "left_semi") \
              .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits"))
    totals = d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        totals.join(scored, "doc_id", "left")
              .select("doc_id", "n_shingles",
                      F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                      F.try_divide(F.coalesce("n_hits", F.lit(0)),
                                   F.col("n_shingles")).alias("overlap"))
    )
