"""Training-data pipeline operators: dedup, text analysis, similarity."""

import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.sources.tables import load_table
from pyanomalydetector_spark.sources.sequences import load_sequences, DUP_MOD
from pyanomalydetector_spark.operators.dedup import (
    exact_duplicate_groups, jaccard_pairs, minhash_dedup_pairs,
    shingles, simhash, simhash_pairs,
)
from pyanomalydetector_spark.operators.text import (
    token_counts, quality_scores, language_id, fingerprints,
)
from pyanomalydetector_spark.operators.similarity import (
    cosine_topk, ivf_topk, centroids,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").persist()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").persist()


def test_exact_dedup_finds_injected_token_dups(spark, sf_dir):
    seq = load_sequences(spark, sf_dir)
    got = exact_duplicate_groups(seq, ["tokens"]).collect()
    # every injected dup (doc_id % DUP_MOD == 0) duplicates its own row
    assert all(r["doc_id"] == r["canonical_id"] and r["group_cnt"] >= 2
               for r in got)
    ids = {int(r["doc_id"].split("-")[1]) for r in got}
    assert ids and all(i % DUP_MOD == 0 for i in ids)


def test_minhash_lsh_equals_brute_force(docs):
    brute = {(r["d1"], r["d2"]) for r in
             jaccard_pairs(docs, k=3, threshold=0.8).collect()}
    lsh = {(r["d1"], r["d2"]) for r in
           minhash_dedup_pairs(docs, k=3, threshold=0.8).collect()}
    assert lsh == brute
    assert brute  # fixture has injected near-dups


def test_shingles_short_doc_empty(spark):
    d = spark.createDataFrame([(1, "one two"), (2, "a b c d")],
                              "doc_id long, text string")
    got = shingles(d, k=3).groupBy("doc_id").count().collect()
    assert {r["doc_id"]: r["count"] for r in got} == {2: 2}


def test_simhash_near_dups_have_small_hamming(docs):
    # near-dup pairs by jaccard should also be simhash-close
    jac = jaccard_pairs(docs, k=3, threshold=0.9)
    sh = simhash(docs)
    a = sh.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("f1"))
    b = sh.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("f2"))
    j = jac.join(a, "d1").join(b, "d2").select(
        F.bit_count(F.col("f1").bitwiseXOR(F.col("f2"))).alias("ham"))
    hams = [r["ham"] for r in j.collect()]
    assert hams and max(hams) <= 6


def test_simhash_banding_complete(docs):
    """Pigeonhole banding must find every pair within the hamming budget."""
    got = {(r["d1"], r["d2"]): r["hamming"]
           for r in simhash_pairs(docs, max_hamming=2).collect()}
    sh = simhash(docs)
    a = sh.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("f1"))
    b = sh.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("f2"))
    brute = a.crossJoin(b).filter(F.col("d1") < F.col("d2")).select(
        "d1", "d2",
        F.bit_count(F.col("f1").bitwiseXOR(F.col("f2"))).alias("ham"))
    expected = {(r["d1"], r["d2"]): r["ham"]
                for r in brute.filter(F.col("ham") <= 2).collect()}
    assert got == expected


def test_token_counts_and_quality_sane(docs):
    tc = token_counts(docs).collect()
    assert all(r["n_words"] > 0 and r["n_bpe"] >= r["n_words"] - 1 >= 0
               for r in tc)
    q = quality_scores(docs).collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in q)
    assert all(r["punct_ratio"] is not None and 0 <= r["punct_ratio"] < 1
               for r in q)


def test_language_id_deterministic_votes(spark):
    d = spark.createDataFrame(
        [(1, "the cat and the hat of the house"),
         (2, "el perro y la casa de los gatos"),
         (3, "xyzzy qwerty plugh")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(d).collect()}
    assert got == {1: "en", 2: "es", 3: "und"}


def test_fingerprint_stable_under_distant_edit(spark):
    # fingerprint = min window hash; an edit far from the minimizing window
    # leaves it unchanged
    base = "the quick brown fox jumps over the lazy dog again and again"
    d = spark.createDataFrame([(1, base), (2, base + " EDITED TAIL")],
                              "doc_id long, text string")
    fps = {r["doc_id"]: r["fingerprint"] for r in fingerprints(d).collect()}
    # identical unless the edit introduced a smaller window hash
    assert fps[1] >= min(fps.values())
    d3 = spark.createDataFrame([(9, "short")], "doc_id long, text string")
    assert fingerprints(d3).collect()[0]["fingerprint"] is not None


def test_ivf_exhaustive_probe_equals_brute_force(emb):
    """Probing every cell must reproduce the exact top-k (the approximation
    is *only* the probe restriction)."""
    qids = list(range(8))
    brute = {(r["q_id"], r["vec_id"], round(r["cos_sim"], 6))
             for r in cosine_topk(emb, qids, k=5).collect()}
    full = {(r["q_id"], r["vec_id"], round(r["cos_sim"], 6))
            for r in ivf_topk(emb, qids, k=5, n_probe=10).collect()}
    assert full == brute


def test_ivf_partial_probe_shape(emb):
    qids = list(range(8))
    rows = ivf_topk(emb, qids, k=5, n_probe=3).collect()
    assert len(rows) == len(qids) * 5
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    for q, rs in by_q.items():
        sims = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["vec_id"] != q for r in rs)


def test_centroids_shape(emb):
    c = centroids(emb).collect()
    labels = {r["label"] for r in c}
    assert labels == set(range(10))
    assert all(len(r["centroid"]) == 64 for r in c)


def test_blocked_cosine_pairs_equals_brute(emb):
    from pyanomalydetector_spark.operators.similarity import (
        cosine_pairs_above, cosine_pairs_above_blocked,
    )
    brute = {(r["d1"], r["d2"], round(r["cos_sim"], 6))
             for r in cosine_pairs_above(emb, 0.35).collect()}
    blocked = {(r["d1"], r["d2"], round(r["cos_sim"], 6))
               for r in cosine_pairs_above_blocked(emb, 0.35, block_size=7).collect()}
    assert blocked == brute
    assert brute


def _recall(spark, emb, qids, k, **ivf_kw):
    from pyanomalydetector_spark.operators.similarity import (
        cosine_topk, ivf_topk_trained,
    )
    exact, approx = {}, {}
    for r in cosine_topk(emb, qids, k=k).collect():
        exact.setdefault(r["q_id"], set()).add(r["vec_id"])
    for r in ivf_topk_trained(emb, qids, k=k, **ivf_kw).collect():
        approx.setdefault(r["q_id"], set()).add(r["vec_id"])
    recalls = [len(exact[q] & approx.get(q, set())) / k for q in exact]
    return sum(recalls) / len(recalls)


def test_trained_ivf_recall_on_clustered_10x(spark):
    """Trained-codebook IVF must reach recall >= 0.9 at probe fraction 1/4
    on CLUSTERED data at 10× the base fixture (5000 vectors). The driver's
    embeddings fixture is isotropic random (measured intra-label cosine ==
    inter-label == ~0), where any IVF's recall is bounded by the probe
    fraction by construction — so the >= 0.9 bar is asserted on a
    deterministic clustered corpus, the regime IVF exists for."""
    import numpy as np
    rng = np.random.default_rng(42)
    n, d, n_clusters = 5000, 64, 20
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[np.arange(n) % n_clusters] + \
        0.25 * rng.normal(size=(n, d))
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    rec = _recall(spark, emb, list(range(0, 200, 25)), 10,
                  n_probe=4, n_cells=16, n_iters=4)
    assert rec >= 0.9, rec


def test_trained_ivf_beats_probe_fraction_on_real_fixture(spark):
    """On the (isotropic) driver fixture the trained quantizer must still
    beat the random-partition baseline: recall > 2× probe fraction."""
    import os
    path = "/root/testdata/sf0.1/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("sf0.1 fixture absent")
    emb = spark.read.parquet(path)
    rec = _recall(spark, emb, list(range(0, 200, 25)), 10,
                  n_probe=4, n_cells=16, n_iters=4)
    assert rec > 2 * (4 / 16), rec


def test_embedding_lsh_pairs_find_near_dups(spark):
    """Random-hyperplane LSH route: planted near-duplicate vectors (cosine
    ≈ 0.999, per-bit agreement ≈ 0.99 → miss prob ~1e-7) must all surface,
    precision is exactly 1 (candidates are cosine-verified), and the output
    is a subset of the brute-force pairs at the same threshold."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyanomalydetector_spark.operators.similarity import (
        cosine_pairs_above, cosine_pairs_above_lsh,
    )
    rng = np.random.default_rng(5)
    base = rng.normal(size=(200, 32))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(200)]
    # plant 20 near-dups: ids 1000+i ≈ id i with tiny noise
    for i in range(20):
        v = base[i] + 0.01 * rng.normal(size=32)
        rows.append((1000 + i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {(r["d1"], r["d2"]) for r in
           cosine_pairs_above_lsh(emb, threshold=0.95).collect()}
    brute = {(r["d1"], r["d2"]) for r in
             cosine_pairs_above(emb, 0.95).collect()}
    planted = {(i, 1000 + i) for i in range(20)}
    assert planted <= got          # every planted near-dup found
    assert got <= brute            # exact verify → no false positives


def test_trained_ivf_deterministic(spark, emb):
    from pyanomalydetector_spark.operators.similarity import (
        train_ivf_codebook,
    )
    import numpy as np
    c1 = train_ivf_codebook(emb, n_cells=8, n_iters=3)
    c2 = train_ivf_codebook(emb, n_cells=8, n_iters=3)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_blocked_cosine_pairs_zero_norm_vector(spark, emb):
    """A zero-norm vector must be dropped by the blocked path (matching the
    brute path, where its NULL cos_sim never clears the threshold) instead
    of poisoning the BLAS tile with an object-dtype array."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, FloatType
    from pyanomalydetector_spark.operators.similarity import (
        cosine_pairs_above, cosine_pairs_above_blocked,
    )
    dim = len(emb.select("embedding").first()["embedding"])
    zero = spark.createDataFrame(
        [(10_000, [0.0] * dim)], "vec_id long, embedding array<float>") \
        .withColumn("embedding", F.col("embedding").cast(ArrayType(FloatType())))
    with_zero = emb.select("vec_id", "embedding").unionByName(zero)
    brute = {(r["d1"], r["d2"]) for r in
             cosine_pairs_above(with_zero, 0.35).collect()}
    blocked = {(r["d1"], r["d2"]) for r in
               cosine_pairs_above_blocked(with_zero, 0.35,
                                          block_size=7).collect()}
    assert blocked == brute
    assert all(10_000 not in pair for pair in blocked)


def test_hashed_shingles_short_docs(spark):
    """Docs shorter than k words yield no shingles (guard on the zip_with
    rolling combine) and the minhash pipeline tolerates them."""
    from pyanomalydetector_spark.operators.dedup import (
        hashed_shingles, minhash_dedup_pairs,
    )
    docs = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "three words here"),
         (4, "three words here")],
        "doc_id long, text string")
    sh = hashed_shingles(docs, k=3)
    assert {r["doc_id"] for r in sh.collect()} == {3, 4}
    pairs = minhash_dedup_pairs(docs, k=3, threshold=0.8).collect()
    assert [(r["d1"], r["d2"], r["jaccard"]) for r in pairs] == [(3, 4, 1.0)]


def test_lsh_hot_bucket_cap(spark):
    """``max_bucket`` must skip pairs inside an oversized collision group
    (the web-scale boilerplate mitigation) while keeping pairs from small
    buckets, and default-off must equal the uncapped result."""
    hot = [(i, "the same boilerplate template text repeated verbatim here")
           for i in range(10)]                       # 10 identical docs
    pair = [(100, "a quite unusual document about distributed dedup pipes"),
            (101, "a quite unusual document about distributed dedup pipes")]
    docs = spark.createDataFrame(hot + pair, "doc_id long, text string")

    uncapped = {(r["d1"], r["d2"]) for r in
                minhash_dedup_pairs(docs, k=3, threshold=0.8).collect()}
    assert (100, 101) in uncapped
    assert sum(1 for d1, d2 in uncapped if d1 < 100) == 45  # C(10,2)

    capped = {(r["d1"], r["d2"]) for r in
              minhash_dedup_pairs(docs, k=3, threshold=0.8,
                                  max_bucket=5).collect()}
    assert capped == {(100, 101)}    # hot cluster skipped, small bucket kept

    sp = {(r["d1"], r["d2"]) for r in
          simhash_pairs(docs, max_hamming=2, max_bucket=5).collect()}
    assert (100, 101) in sp and all(d1 >= 100 for d1, _ in sp)


def test_duplicate_clusters_known_graph(spark):
    """Min-label propagation must produce exact components: a 4-chain
    (worst case for propagation depth), a triangle, and a detached pair."""
    from pyanomalydetector_spark.operators.dedup import duplicate_clusters
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13),        # chain 10-11-12-13
         (20, 21), (21, 22), (20, 22),        # triangle
         (30, 31)],                           # pair
        "d1 long, d2 long").withColumn("jaccard", F.lit(1.0))
    got = {r["doc_id"]: r["cluster_rep"]
           for r in duplicate_clusters(pairs).collect()}
    assert got == {10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20, 22: 20,
                   30: 30, 31: 30}


def test_contamination_scores_extremes(spark):
    """Benchmark members score overlap 1.0; disjoint docs score 0;
    partial overlap lands strictly between."""
    from pyanomalydetector_spark.operators.dedup import contamination_scores
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"),
         (2, "completely different words entirely here now"),
         (3, "the quick brown fox sleeps all day long")],
        "doc_id long, text string")
    bench = docs.filter("doc_id = 1")
    got = {r["doc_id"]: r for r in
           contamination_scores(docs, bench, k=3).collect()}
    assert got[1]["overlap"] == 1.0
    assert got[2]["overlap"] == 0.0
    assert 0.0 < got[3]["overlap"] < 1.0      # shares 'the quick brown' ...


def test_repetition_and_pii_extremes(spark):
    from pyanomalydetector_spark.operators.text import (
        repetition_scores, pii_scan,
    )
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"),
         (2, "six totally different words here friend"),
         (3, "contact me at bob@example.com or 555-123-4567 ssn 123-45-6789")],
        "doc_id long, text string")
    rep = {r["doc_id"]: r for r in repetition_scores(docs, k=3).collect()}
    assert rep[1]["rep_ratio"] == 0.75          # 4 grams, 1 distinct
    assert rep[1]["word_dup_ratio"] > 0.8
    assert rep[2]["rep_ratio"] == 0.0
    assert rep[2]["word_dup_ratio"] == 0.0
    pii = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert (pii[3]["n_email"], pii[3]["n_phone"], pii[3]["n_ssn"]) == (1, 1, 1)
    assert pii[3]["n_pii"] == 3
    assert pii[1]["n_pii"] == 0


def test_duplicate_clusters_raises_when_unconverged(spark):
    """A chain deeper than the iteration cap can cover must raise, never
    return a partially propagated labelling."""
    from pyanomalydetector_spark.operators.dedup import duplicate_clusters
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "d1 long, d2 long")
    # converges fine with the default cap
    got = {r["doc_id"]: r["cluster_rep"]
           for r in duplicate_clusters(chain).collect()}
    assert set(got.values()) == {0}
    # one round (neighbour-min + one pointer jump) reaches ≤ ~4 hops; a
    # 100-deep chain cannot converge in it
    deep = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "d1 long, d2 long")
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(deep, max_iters=1)


def test_duplicate_clusters_deep_chain_logarithmic_rounds(spark):
    """Pointer jumping must converge a 64-deep chain (worst case for plain
    propagation, which needs ~63 rounds) within 10 rounds — the
    O(log diameter) guarantee that makes pathological templated-doc dup
    CHAINS safe under the default iteration cap."""
    from pyanomalydetector_spark.operators.dedup import duplicate_clusters
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "d1 long, d2 long")
    got = {r["doc_id"]: r["cluster_rep"]
           for r in duplicate_clusters(chain, max_iters=10).collect()}
    assert set(got) == set(range(64))
    assert set(got.values()) == {0}


def test_similarity_kernels_tolerate_null_and_ragged_embeddings(spark):
    """Null or wrong-length embedding rows must be dropped by the Arrow
    kernels (LSH bucketing, IVF training partials, cell assignment) — not
    crash them — mirroring the brute path where a null vector's cos_sim is
    NULL and never clears a threshold."""
    from pyanomalydetector_spark.operators.similarity import (
        assign_cells, cosine_pairs_above_blocked, cosine_pairs_above_lsh,
        train_ivf_codebook,
    )
    rows = [(i, [float(i % 7), float((i * 3) % 5), 1.0], i % 3)
            for i in range(40)]
    rows += [(100, None, 0), (101, [1.0], 0)]      # null + ragged
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")

    pairs = cosine_pairs_above_lsh(emb, threshold=0.99, n_bits=16, bands=4)
    ids = {i for r in pairs.collect() for i in (r["d1"], r["d2"])}
    assert 100 not in ids and 101 not in ids

    # the blocked-BLAS tile kernel must drop the same rows before np.array
    # (an object-dtype stack would raise inside np.linalg.norm)
    blocked = cosine_pairs_above_blocked(emb, threshold=0.99, block_size=16)
    bids = {i for r in blocked.collect() for i in (r["d1"], r["d2"])}
    assert 100 not in bids and 101 not in bids

    cents = train_ivf_codebook(emb, n_cells=4, n_iters=2)
    assert cents.shape == (4, 3)

    assigned = assign_cells(emb, cents)
    got = {r["vec_id"] for r in assigned.collect()}
    assert 100 not in got and 101 not in got
    assert len(got) == 40


def test_ivf_codebook_clamps_to_corpus_size(spark):
    """A corpus smaller than n_cells degrades to fewer cells, not a crash."""
    from pyanomalydetector_spark.operators.similarity import (
        train_ivf_codebook,
    )
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)],
        "vec_id long, embedding array<double>")
    cents = train_ivf_codebook(emb, n_cells=16, n_iters=2)
    assert cents.shape == (3, 2)


def test_merged_profiles_equal_individual_operators(spark, docs):
    """quality_language_profile / text_profile ≡ the individual operators
    they compose (column-for-column), so the merge is pure plan fusion."""
    from pyanomalydetector_spark.operators.text import (
        quality_language_profile, repetition_scores, text_profile,
    )
    prof = {r["doc_id"]: r for r in quality_language_profile(docs).collect()}
    for r in quality_scores(docs).collect():
        p = prof[r["doc_id"]]
        for c in ("n_chars", "n_words", "punct_ratio", "stop_ratio",
                  "mean_word_len", "quality_score"):
            assert p[c] == r[c], (r["doc_id"], c)
    for r in token_counts(docs).collect():
        assert prof[r["doc_id"]]["n_bpe"] == r["n_bpe"]
    for r in language_id(docs).collect():
        p = prof[r["doc_id"]]
        assert (p["lang_pred"], p["lang_score"]) == \
            (r["lang_pred"], r["lang_score"])

    tp = {r["doc_id"]: r for r in text_profile(docs).collect()}
    for r in fingerprints(docs).collect():
        assert tp[r["doc_id"]]["fingerprint"] == r["fingerprint"]
    for r in repetition_scores(docs).collect():
        p = tp[r["doc_id"]]
        for c in ("n_words", "n_grams", "rep_ratio", "word_dup_ratio"):
            assert p[c] == r[c], (r["doc_id"], c)


def test_lsh_candidates_superset_of_emitted_pairs(docs):
    """The public candidate-generation block: every pair minhash_dedup_pairs
    emits must be an LSH candidate (same banding params), and the candidate
    set stays far from all-pairs — the sub-quadratic property that makes it
    a building block worth exposing on its own."""
    from pyanomalydetector_spark.operators.dedup import (
        hashed_shingles, lsh_candidates, minhash_signatures,
    )
    sig = minhash_signatures(hashed_shingles(docs, 3), 30)
    cand = {(r["d1"], r["d2"]) for r in lsh_candidates(sig, 10, 3).collect()}
    emitted = {(r["d1"], r["d2"]) for r in
               minhash_dedup_pairs(docs, k=3, threshold=0.8).collect()}
    assert emitted <= cand
    n = docs.count()
    assert len(cand) < n * (n - 1) / 20   # nowhere near all-pairs


def test_lsh_rejects_indivisible_band_width(spark):
    """n_bits not divisible by bands used to silently drop trailing bits,
    widening every band's collision rate — now a loud ValueError."""
    from pyanomalydetector_spark.operators.similarity import (
        cosine_pairs_above_lsh)
    emb = spark.createDataFrame([(1, [0.1, 0.2])],
                                "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="positive multiple"):
        cosine_pairs_above_lsh(emb, n_bits=33, bands=8)
