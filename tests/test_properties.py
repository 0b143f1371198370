"""Property-based tests (hypothesis) for the pure-function kernel of
the engine: the wire codec, the NumPy twins of the distance metrics,
PQ encoding, and the deterministic Lloyd iteration. These functions
decide correctness everywhere else (oracles, index routing, dedup),
so they get randomized coverage beyond the golden-value pytest pins.

Driver-side only — no SparkSession; the distributed paths that wrap
these kernels are covered by the oracle gate and the plan/behavior
tests."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from ydb_vector_search_simple_api_spark.functions import codec

finite_f32 = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
)
vectors = st.lists(finite_f32, min_size=1, max_size=64)


@settings(max_examples=200, deadline=None)
@given(vectors)
def test_codec_roundtrip_is_float32_exact(vec):
    """encode -> decode reproduces the float32 representation of every
    element exactly (the codec is the reference's wire format; codec
    truncation beyond fp32 would silently shift every score)."""
    raw = codec.vector_to_bytes(vec)
    back = codec.bytes_to_vector(raw)
    assert back == [float(np.float32(x)) for x in vec]
    # tag byte + 4 bytes per element — the reference's layout
    assert len(raw) == 4 * len(vec) + 1


@settings(max_examples=200, deadline=None)
@given(vectors, vectors)
def test_numpy_metric_properties(a, b):
    """Metric-space sanity of the scoring math on random vectors:
    symmetry, self-distance zero, cosine bounds."""
    n = min(len(a), len(b))
    x = np.asarray(a[:n], dtype=np.float64)
    y = np.asarray(b[:n], dtype=np.float64)

    eu = float(np.sqrt(((x - y) ** 2).sum()))
    eu_sym = float(np.sqrt(((y - x) ** 2).sum()))
    assert math.isclose(eu, eu_sym, rel_tol=1e-12, abs_tol=1e-12)
    assert float(np.sqrt(((x - x) ** 2).sum())) == 0.0

    man = float(np.abs(x - y).sum())
    assert man >= eu or math.isclose(man, eu, rel_tol=1e-12)  # L1 >= L2

    nx, ny = np.linalg.norm(x), np.linalg.norm(y)
    if nx > 0 and ny > 0:
        cos = float((x @ y) / (nx * ny))
        assert -1.0 - 1e-9 <= cos <= 1.0 + 1e-9


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=2, max_value=16),
    st.integers(min_value=8, max_value=64),
    st.randoms(use_true_random=False),
)
def test_pq_encode_is_nearest_codeword(m, n_rows, rnd):
    """_encode_batch's argmin-by-expansion must agree with the direct
    L2 argmin per subspace (the expansion drops ||s||^2 — legal only
    because it is constant per row; a regression here mis-assigns
    codes silently)."""
    from ydb_vector_search_simple_api_spark.operators import pq

    rng = np.random.default_rng(rnd.randint(0, 2**31))
    dsub = 2
    d = m * dsub
    X = rng.normal(size=(n_rows, d))
    books = np.stack([rng.normal(size=(4, dsub)) for _ in range(m)])
    codes = pq._encode_batch(X, books)
    for j in range(m):
        sub = X[:, j * dsub : (j + 1) * dsub]
        direct = np.linalg.norm(
            sub[:, None, :] - books[j][None, :, :], axis=2
        ).argmin(axis=1)
        assert (codes[:, j] == direct).all()


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=12), st.integers(min_value=1, max_value=40))
def test_lloyd_deterministic_and_bounded(k, n):
    """The deterministic Lloyd used by the tree build and PQ training:
    same input -> identical centroids; k_eff = min(k, n); centroids
    live inside the data's bounding box (means of subsets)."""
    from ydb_vector_search_simple_api_spark.operators.tree import _lloyd

    rng = np.random.default_rng(k * 1000 + n)
    x = rng.normal(size=(n, 3))
    c1 = _lloyd(x, k)
    c2 = _lloyd(x, k)
    assert (c1 == c2).all()
    assert len(c1) == min(k, n)
    assert (c1 >= x.min(axis=0) - 1e-12).all()
    assert (c1 <= x.max(axis=0) + 1e-12).all()


hashes64 = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    min_size=1,
    max_size=40,
)


def _pack_fn():
    """The Arrow vote-fold kernel behind dedup.simhash (pandas_udf
    exposes the wrapped plain function via .func)."""
    import pandas as pd

    from ydb_vector_search_simple_api_spark.operators.dedup import (
        _simhash_arrow_udf,
    )

    pack = _simhash_arrow_udf(64).func
    return lambda hs: int(pack(pd.Series([np.array(hs, dtype=np.int64)])).iloc[0])


@settings(max_examples=100, deadline=None)
@given(hashes64, st.randoms(use_true_random=False))
def test_simhash_vote_fold_is_order_invariant(hs, rnd):
    """The per-bit majority vote is a commutative reduction: permuting
    the token-hash array must never change the packed signature."""
    pack = _pack_fn()
    shuffled = list(hs)
    rnd.shuffle(shuffled)
    assert pack(hs) == pack(shuffled)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_simhash_of_single_hash_is_that_hash(h):
    """With one distinct token, every bit's vote follows that token's
    hash bit exactly, so the signature IS the hash (bit pattern)."""
    pack = _pack_fn()
    assert pack([h]) == h


# ---------------------------------------------------------- BQ kernels

_float_rows = st.lists(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=130,
    ),
    min_size=1,
    max_size=8,
).filter(lambda rows: len({len(r) for r in rows}) == 1)


@settings(max_examples=100, deadline=None)
@given(_float_rows)
def test_pack_bits_roundtrip_popcount(rows):
    """Packed words carry exactly the >0 bits: per-row popcount equals
    the count of strictly positive entries, and Hamming between two
    packed rows equals the sign-pattern disagreement count."""
    import numpy as np

    from ydb_vector_search_simple_api_spark.operators.bq import _pack_bits

    X = np.asarray(rows, dtype=np.float64)
    W = _pack_bits(X).astype(np.uint64)
    pop = np.array(
        [bin(int(w)).count("1") for row in W for w in row]
    ).reshape(W.shape)
    assert (pop.sum(axis=1) == (X > 0).sum(axis=1)).all()
    if len(rows) >= 2:
        want = int(((X[0] > 0) != (X[1] > 0)).sum())
        got = sum(bin(int(a ^ b)).count("1") for a, b in zip(W[0], W[1]))
        assert got == want


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=64), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=60),
)
def test_topn_by_hamming_id_matches_sorted(hams, top):
    """The argpartition + boundary-tie selection must equal the brute
    sort by (hamming, id) prefix — including ties at the boundary."""
    import numpy as np

    from ydb_vector_search_simple_api_spark.operators.bq import _topn_by_hamming_id

    ham = np.asarray(hams, dtype=np.int64)
    ids = np.arange(100, 100 + len(hams))  # distinct, ascending
    keep = _topn_by_hamming_id(ham, ids, top)
    got = sorted(zip(ham[keep], ids[keep]))
    want = sorted(zip(ham, ids))[: min(top, len(hams))]
    assert got == want


# ---------------------------------------------------------------- MMR
def _mmr_greedy(rel, sim, k, lam):
    """Reference MMR greedy (mirrors operators.ranking.mmr_rerank's
    driver loop: strictly-greater wins, ties keep the lower index)."""
    selected, remaining, order = [], list(range(len(rel))), []
    while remaining and len(selected) < k:
        best_i, best_val = None, None
        for i in remaining:
            pen = max((sim[i][j] for j in selected), default=0.0)
            val = round(lam * rel[i] - (1.0 - lam) * pen, 9)
            if best_val is None or val > best_val:
                best_i, best_val = i, val
        selected.append(best_i)
        remaining.remove(best_i)
        order.append(best_i)
    return order


@given(
    st.lists(st.floats(min_value=-1, max_value=1, allow_nan=False), min_size=2, max_size=12),
    st.randoms(use_true_random=False),
)
@settings(max_examples=50, deadline=None)
def test_mmr_lambda_one_is_relevance_order(rel, rnd):
    n = len(rel)
    sim = [[rnd.uniform(-1, 1) for _ in range(n)] for _ in range(n)]
    order = _mmr_greedy(rel, sim, k=n, lam=1.0)
    # lam=1: pure relevance; ties keep lower index (stable)
    expect = sorted(range(n), key=lambda i: (-round(rel[i], 9), i))
    assert order == expect


@given(
    st.integers(min_value=3, max_value=10),
    st.randoms(use_true_random=False),
)
@settings(max_examples=50, deadline=None)
def test_mmr_penalizes_duplicates(n, rnd):
    """Two identical max-relevance items: with lam<1 and a distinct
    third item of near relevance, the duplicate must NOT be picked
    second."""
    rel = [1.0, 1.0, 0.9] + [0.0] * (n - 3)
    sim = [[0.0] * n for _ in range(n)]
    for i in range(n):
        sim[i][i] = 1.0
    sim[0][1] = sim[1][0] = 1.0  # items 0 and 1 identical
    order = _mmr_greedy(rel, sim, k=3, lam=0.5)
    assert order[0] == 0
    assert order[1] == 2  # the diverse item beats the duplicate


# --------------------------------------------- round-4 codec properties


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(h, w, seed):
    import numpy as np

    from ydb_vector_search_simple_api_spark.functions import png as png_mod

    arr = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    assert (png_mod.decode_png(png_mod.encode_png(arr)) == arr).all()
    # identity resize is exact (pixel-center grid hits every source pixel)
    assert (png_mod.resize_bilinear(arr, w, h) == arr).all()


@given(
    word=st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=104),
        min_size=1,
        max_size=12,
    ),
    n_ranks=st.integers(0, 10),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=60, deadline=None)
def test_bpe_encode_invariants(word, n_ranks, seed):
    """encode_word: concatenation is lossless, token count within
    [1, len(word)], and encoding is deterministic."""
    import random

    from ydb_vector_search_simple_api_spark.operators.bpe import encode_word

    rng = random.Random(seed)
    letters = "abcdefgh"
    ranks = {}
    for i in range(n_ranks):
        pair = (
            "".join(rng.choice(letters) for _ in range(rng.randint(1, 2))),
            "".join(rng.choice(letters) for _ in range(rng.randint(1, 2))),
        )
        ranks.setdefault(pair, i)
    toks = encode_word(word, ranks)
    assert "".join(toks) == word
    assert 1 <= len(toks) <= len(word)
    assert encode_word(word, ranks) == toks


@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=3000,
    ),
    st.integers(min_value=10, max_value=200),
)
@settings(max_examples=30, deadline=None)
def test_tdigest_compress_invariants(vals, delta):
    """Weight conservation (exact), sorted means, size bound, and
    input-order invariance of the merging compression."""
    from ydb_vector_search_simple_api_spark.operators import tdigest as TD

    m, w = TD.compress(list(vals), [1.0] * len(vals), delta)
    assert sum(w) == len(vals)
    assert m == sorted(m)
    assert min(vals) <= m[0] and m[-1] <= max(vals)
    m2, w2 = TD.compress(list(reversed(vals)), [1.0] * len(vals), delta)
    assert (m, w) == (m2, w2)


@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=2,
        max_size=2000,
    )
)
@settings(max_examples=30, deadline=None)
def test_tdigest_quantile_monotone_and_bounded(vals):
    """quantile(q) is nondecreasing in q and clamped to the data
    range — for ANY input multiset."""
    from ydb_vector_search_simple_api_spark.operators import tdigest as TD

    m, w = TD.compress(list(vals), [1.0] * len(vals), 100)
    qs = [0.0, 0.01, 0.1, 0.5, 0.9, 0.99, 1.0]
    ests = [TD.quantile(m, w, q) for q in qs]
    assert ests == sorted(ests)
    assert min(vals) <= ests[0] and ests[-1] <= max(vals)


@given(st.text(alphabet="ab ", min_size=0, max_size=40))
@settings(max_examples=50, deadline=None)
def test_wordpiece_encode_word_covers_or_unks(word):
    """Greedy longest-match either concatenates back to the word
    (## stripped) or yields exactly [UNK] — never a partial cover."""
    from ydb_vector_search_simple_api_spark.operators import wordpiece as W

    vocab = {"a", "b", "##a", "##b", "ab", "##ab", "aa"}
    for w in word.split():
        enc = W.encode_word(w, vocab)
        if enc == [W.UNK]:
            continue
        rebuilt = enc[0] + "".join(p[2:] for p in enc[1:])
        assert rebuilt == w
        assert all(p.startswith("##") for p in enc[1:])
        assert not enc[0].startswith("##")
