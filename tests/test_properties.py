"""Property-based tests (hypothesis) for the engine's algebraic cores.

These pin the invariants the incremental machinery depends on:
- merge/retract are inverse operations (window slide correctness);
- merged partials ≡ one-shot aggregation (the map-side-combine contract);
- finalize matches pandas' Bessel std within float tolerance (the
  reference-parity formula, stats.py:130-135);
- DBSCAN labels partition-structure-invariant under input permutation.
"""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pyanomalydetector_spark.operators.cluster import dbscan_precomputed

finite = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)


def _suff(xs):
    return (float(sum(xs)), float(sum(x * x for x in xs)), len(xs))


def _merge(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _retract(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _finalize(s, q, n):
    # mirror of functions/stats.py:finalize_mean_std arithmetic
    if n <= 0:
        return None
    mean = s / n
    if n > 1:
        var = (q - s * s / n) / (n - 1)
        std = math.sqrt(var) if var > 0 else 0.0
    else:
        std = 0.0
    if not math.isfinite(std):
        std = 0.0
    return mean, std


@given(st.lists(finite, min_size=1, max_size=50),
       st.lists(finite, min_size=0, max_size=50))
@settings(max_examples=200, deadline=None)
def test_merge_then_retract_is_identity(xs, ys):
    a, b = _suff(xs), _suff(ys)
    merged = _merge(a, b)
    back = _retract(merged, b)
    assert back[2] == a[2]
    # float absorption bound: retracting b from (a+b) can lose up to
    # ~ulp(a+b) of a's value — the inherent limit of sum-based retraction
    # (why verdict thresholds use tolerances, SURVEY §7.4)
    for i in (0, 1):
        tol = max(1e-9, abs(merged[i]) * 1e-12)
        assert abs(back[i] - a[i]) <= tol


@given(st.lists(st.lists(finite, min_size=1, max_size=20),
                min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_partials_merge_to_total(chunks):
    total = _suff([x for c in chunks for x in c])
    acc = (0.0, 0.0, 0)
    for c in chunks:
        acc = _merge(acc, _suff(c))
    assert acc[2] == total[2]
    assert acc[0] == pytest.approx(total[0], rel=1e-9, abs=1e-6)
    assert acc[1] == pytest.approx(total[1], rel=1e-9, abs=1e-6)


@given(st.lists(st.floats(min_value=-1e4, max_value=1e4,
                          allow_nan=False, allow_infinity=False),
                min_size=2, max_size=100))
@settings(max_examples=200, deadline=None)
def test_finalize_matches_pandas_bessel_std(xs):
    s, q, n = _suff(xs)
    mean, std = _finalize(s, q, n)
    ps = pd.Series(xs)
    assert mean == pytest.approx(ps.mean(), rel=1e-9, abs=1e-9)
    expected_std = float(ps.std())
    if math.isnan(expected_std):
        expected_std = 0.0
    # sqr_sum formula loses precision vs two-pass when std << mean
    # (catastrophic cancellation: absolute error grows with |mean|·ε) —
    # the abs tolerance scales accordingly; the Welford UDAF is the
    # high-precision path for that regime
    # noise floor of the one-pass formula: std ≈ |mean|·sqrt(ε) when the
    # true variance is ~0 (e.g. identical values)
    assert std == pytest.approx(expected_std, rel=1e-4,
                                abs=5e-8 * (1.0 + abs(mean)))


@given(st.lists(st.floats(min_value=0, max_value=100,
                          allow_nan=False), min_size=2, max_size=30),
       st.floats(min_value=0.5, max_value=10),
       st.integers(min_value=2, max_value=4))
@settings(max_examples=50, deadline=None)
def test_dbscan_partition_invariant_under_permutation(pts, eps, min_samples):
    pos = np.array(pts)
    dist = np.abs(pos[:, None] - pos[None, :])
    l1 = dbscan_precomputed(dist, eps, min_samples)
    rng = np.random.RandomState(0)
    perm = rng.permutation(len(pts))
    l2 = dbscan_precomputed(dist[np.ix_(perm, perm)], eps, min_samples)

    def parts(labels, index_map):
        groups = {}
        for i, c in enumerate(labels):
            if c != -1:
                groups.setdefault(c, set()).add(int(index_map[i]))
        return {frozenset(v) for v in groups.values()}

    assert parts(l2, perm) == parts(l1, np.arange(len(pts)))
    # noise set also invariant
    noise1 = {i for i, c in enumerate(l1) if c == -1}
    noise2 = {int(perm[i]) for i, c in enumerate(l2) if c == -1}
    assert noise1 == noise2


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
def test_png_codec_roundtrip_property(h, w, seed):
    """decode(encode(x)) == x for arbitrary 8-bit grayscale images — the
    codec pair behind the real multimodal decode path."""
    from pyanomalydetector_spark.sources.media import encode_png, decode_png
    arr = np.random.default_rng(seed).integers(
        0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(arr)), arr)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 2000), st.integers(0, 2**32 - 1),
       st.sampled_from([8000, 16000, 44100]))
def test_wav_codec_roundtrip_property(n, seed, rate):
    from pyanomalydetector_spark.sources.media import encode_wav, decode_wav
    s = np.random.default_rng(seed).integers(
        -32768, 32768, size=n, dtype=np.int64).astype(np.int16)
    out, got_rate = decode_wav(encode_wav(s, rate))
    assert got_rate == rate
    assert np.array_equal(out, s.astype(np.int32))


@given(st.integers(0, 2047), st.integers(1, 10**12))
@settings(max_examples=300, deadline=None)
def test_integer_round_half_up_is_engine_portable(rem, total):
    """The cross-engine rounding discipline (seq_packing_stats): the pure
    integer formula k = (rem·2e6 + total) div (2·total) equals decimal
    ROUND_HALF_UP of rem/total at 6 places, and k/1e6 is ONE correctly
    rounded IEEE division of identical integers — so Spark and DuckDB emit
    the same double bit pattern, where their native round() can differ by
    one ULP."""
    from decimal import ROUND_HALF_UP, Decimal

    k = (rem * 2_000_000 + total) // (2 * total)
    d = (Decimal(rem) / Decimal(total)).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP)
    assert Decimal(k) / Decimal(1_000_000) == d
