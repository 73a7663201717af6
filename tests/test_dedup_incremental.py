"""Incremental MinHash dedup store (build/append/query vs one-shot parity).

The pinned contract: ingesting the corpus in batches against a persisted
signature store emits exactly the pairs a one-shot ``minhash_dedup_pairs``
over the full corpus would, minus the pairs internal to the pre-existing
corpus (which earlier ingests already emitted). Band keys and exact-Jaccard
verification are deterministic, so the equality is exact, values included.
"""

import os

import pytest
from pyspark.sql import functions as F

from pyanomalydetector_spark.operators.dedup import (
    build_minhash_store, append_to_minhash_store, minhash_dedup_pairs,
    minhash_pairs_vs_store,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _keyed(rows):
    return sorted((r["d1"], r["d2"], round(r["jaccard"], 9)) for r in rows)


def test_batched_ingest_equals_one_shot(spark, docs, tmp_path_factory):
    part = F.pmod(F.xxhash64("doc_id"), F.lit(3))
    corpus = docs.filter(part == 0)
    batch1 = docs.filter(part == 1)
    batch2 = docs.filter(part == 2)
    assert 0 < batch1.count() < docs.count()

    path = str(tmp_path_factory.mktemp("mh") / "store")
    build_minhash_store(corpus, path)

    reg = []
    p1 = _keyed(minhash_pairs_vs_store(batch1, path,
                                       cache_registry=reg).collect())
    append_to_minhash_store(batch1, path)
    p2 = _keyed(minhash_pairs_vs_store(batch2, path,
                                       cache_registry=reg).collect())
    for f in reg:
        f.unpersist()

    full = minhash_dedup_pairs(docs)
    corpus_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    expected = _keyed([r for r in full.collect()
                       if not (r["d1"] in corpus_ids
                               and r["d2"] in corpus_ids)])
    assert sorted(p1 + p2) == expected
    # the two batch reports never overlap (a pair is emitted exactly once)
    assert not set(p1) & set(p2)


def test_store_pins_hash_family(spark, docs, tmp_path_factory):
    """Query params come from the store's meta row — a store built with a
    non-default family is queried with that family, not the defaults."""
    path = str(tmp_path_factory.mktemp("mh") / "store")
    part = F.pmod(F.xxhash64("doc_id"), F.lit(3))
    build_minhash_store(docs.filter(part == 0), path,
                        k=4, num_hashes=24, bands=8, rows=3)
    reg = []
    got = _keyed(minhash_pairs_vs_store(docs.filter(part != 0), path,
                                        cache_registry=reg).collect())
    for f in reg:
        f.unpersist()
    full = minhash_dedup_pairs(docs, k=4, num_hashes=24, bands=8, rows=3)
    old_ids = {r["doc_id"]
               for r in docs.filter(part == 0).select("doc_id").collect()}
    expected = _keyed([r for r in full.collect()
                       if not (r["d1"] in old_ids and r["d2"] in old_ids)])
    assert got == expected


def test_reingested_ids_fail_loudly(spark, docs, tmp_path_factory):
    """A batch sharing doc_ids with the store would silently corrupt the
    Jaccard verify stage (two shingle sets merged into one doc) — both the
    query and the append must refuse it up front."""
    part = F.pmod(F.xxhash64("doc_id"), F.lit(3))
    corpus, overlap = docs.filter(part == 0), docs.filter(part != 2)
    path = str(tmp_path_factory.mktemp("mh") / "store")
    build_minhash_store(corpus, path)
    with pytest.raises(ValueError, match="re-ingests doc_ids"):
        minhash_pairs_vs_store(overlap, path).collect()
    with pytest.raises(ValueError, match="re-ingests doc_ids"):
        append_to_minhash_store(overlap, path)
    # the opt-out still works for pipelines that guarantee fresh ids
    clean = docs.filter(part == 1)
    assert minhash_pairs_vs_store(
        clean, path, check_disjoint=False).collect() is not None


def test_in_store_dedup_equals_one_shot(spark, docs, tmp_path_factory):
    """Store-resident full dedup (minhash_pairs_in_store) must emit exactly
    the one-shot minhash_dedup_pairs output — including after appends, and
    at a DIFFERENT query-time threshold than the default."""
    from pyanomalydetector_spark.operators.dedup import minhash_pairs_in_store

    part = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    path = str(tmp_path_factory.mktemp("mhfull") / "store")
    build_minhash_store(docs.filter(part == 0), path)
    append_to_minhash_store(docs.filter(part == 1), path)

    reg = []
    for thr in (0.8, 0.95):
        got = _keyed(minhash_pairs_in_store(spark, path, threshold=thr,
                                            cache_registry=reg).collect())
        want = _keyed(minhash_dedup_pairs(docs, threshold=thr).collect())
        assert got == want and (thr > 0.8 or got)
    for f in reg:
        f.unpersist()


def test_compact_store_retires_deleted_docs(spark, docs, tmp_path_factory):
    """Store lifecycle under churn (VERDICT r04 #6): delete a slice of the
    corpus, compact, and (a) pairs over the survivors are EXACTLY the
    one-shot dedup of the surviving docs, (b) the retired ids are really
    gone (an append re-using one no longer trips the disjointness guard),
    (c) the compaction accounting matches the slice size."""
    from pyanomalydetector_spark.operators.dedup import (
        compact_minhash_store, minhash_pairs_in_store)

    part = F.pmod(F.xxhash64("doc_id"), F.lit(3))
    path = str(tmp_path_factory.mktemp("mhcomp") / "store")
    build_minhash_store(docs, path)

    doomed = docs.filter(part == 2).select("doc_id")
    n_doomed = doomed.count()
    survivors = docs.filter(part != 2)
    assert 0 < n_doomed < docs.count()

    stats = compact_minhash_store(spark, path, doomed)
    assert stats["retired"] == n_doomed
    assert stats["remaining"] == survivors.count()

    reg = []
    got = _keyed(minhash_pairs_in_store(spark, path,
                                        cache_registry=reg).collect())
    for f in reg:
        f.unpersist()
    want = _keyed(minhash_dedup_pairs(survivors).collect())
    assert got == want and got   # non-empty: fixture has surviving dups

    # retired ids are free again: re-ingesting one passes the guard and
    # the batch's pairs equal the one-shot over survivors+batch
    reborn = docs.filter(part == 2).limit(5)
    reg = []
    p = _keyed(minhash_pairs_vs_store(reborn, path,
                                      cache_registry=reg).collect())
    for f in reg:
        f.unpersist()
    reborn_full = survivors.unionByName(reborn)
    surv_ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    expected = _keyed([r for r in minhash_dedup_pairs(reborn_full).collect()
                       if not (r["d1"] in surv_ids and r["d2"] in surv_ids)])
    assert p == expected

    # a python-list id spec works too, and deleting absent ids is a no-op
    stats2 = compact_minhash_store(spark, path, ["no_such_doc_id"])
    assert stats2["retired"] == 0 and stats2["remaining"] == stats["remaining"]


def test_compact_crash_window_fails_loud_not_silent(spark, docs,
                                                    tmp_path_factory):
    """Crash between compaction's two asset swaps. The swap order is
    SHINGLES FIRST so the interim state (retired ids keep a signature but
    have no shingles) is post-compact-or-loud everywhere:
    (a) store-resident pairs already equal the post-compact output (the
        retired ids still band via their signatures, but verification has
        no shingles for them, so their pairs drop — the goal state);
    (b) re-ingesting a retired id still trips the id-disjointness guard
        (it scans SIGNATURES, where the id survives) — the reverse order
        would let the guard pass and collect_set would merge the stale
        shingles with the re-ingested version's: silently wrong Jaccard;
    (c) re-running the same compaction (the documented recovery) heals the
        store and frees the ids."""
    from pyanomalydetector_spark.operators.dedup import (
        compact_minhash_store, minhash_pairs_in_store, _swap_asset_dir)

    part = F.pmod(F.xxhash64("doc_id"), F.lit(3))
    path = str(tmp_path_factory.mktemp("mhcrash") / "store")
    build_minhash_store(docs, path)
    doomed = docs.filter(part == 2).select("doc_id")
    survivors = docs.filter(part != 2)
    assert 0 < doomed.count() < docs.count()

    # replicate compact_minhash_store up to (and including) the FIRST swap
    # only — the exact on-disk state a crash between the swaps leaves
    kept_sh = (spark.read.parquet(f"{path}/shingles")
                    .join(doomed, "doc_id", "left_anti"))
    kept_sh.write.mode("overwrite").parquet(f"{path}/shingles.staged")
    _swap_asset_dir(spark, f"{path}/shingles", f"{path}/shingles.staged")

    # (a) interim pairs == one-shot over the survivors
    reg = []
    got = _keyed(minhash_pairs_in_store(spark, path,
                                        cache_registry=reg).collect())
    for f in reg:
        f.unpersist()
    assert got == _keyed(minhash_dedup_pairs(survivors).collect()) and got

    # (b) re-ingest of a retired id fails LOUD, not silently corrupting
    reborn = docs.filter(part == 2).limit(3)
    with pytest.raises(ValueError, match="re-ingests doc_ids"):
        append_to_minhash_store(reborn, path)

    # (c) recovery: re-run the compaction; ids are free again
    stats = compact_minhash_store(spark, path, doomed)
    assert stats["remaining"] == survivors.count()
    append_to_minhash_store(reborn, path)   # guard passes now
