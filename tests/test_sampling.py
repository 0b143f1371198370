"""Deterministic hash sampling / splitting (operators/sampling.py)."""

from __future__ import annotations

import hashlib

from ydb_vector_search_simple_api_spark.operators import sampling as S
from ydb_vector_search_simple_api_spark.sources.store import load_documents

SF_SMALL = "/root/testdata/sf0.001"


def test_threshold_hex_bounds():
    assert S._threshold_hex(0.0) == "000000"
    assert S._threshold_hex(0.5) == "800000"
    # frac=1.0 must sort above every 6-char hex draw ("ffffff" < "g")
    assert "ffffff" < S._threshold_hex(1.0)


def test_split_assignment_matches_python_md5(spark):
    rows = S.document_splits(spark, SF_SMALL).collect()
    t1, t2 = S._threshold_hex(0.8), S._threshold_hex(0.9)
    for r in rows:
        draw = hashlib.md5(str(r.doc_id).encode()).hexdigest()[: S.PREFIX_HEX]
        expect = "train" if draw < t1 else ("valid" if draw < t2 else "test")
        assert r.split == expect, (r.doc_id, draw)


def test_splits_partition_the_corpus(spark):
    n_docs = load_documents(spark, SF_SMALL).count()
    sizes = {r.split: r.n_docs for r in S.split_sizes(spark, SF_SMALL).collect()}
    assert sum(sizes.values()) == n_docs
    # rough uniformity at 500+ docs: train well above the others
    assert sizes.get("train", 0) > sizes.get("valid", 0)
    assert sizes.get("train", 0) > sizes.get("test", 0)


def test_hash_sample_stable_and_proportional(spark):
    docs = load_documents(spark, SF_SMALL)
    s1 = {r.doc_id for r in S.hash_sample(docs, "doc_id", 0.25).select("doc_id").collect()}
    s2 = {r.doc_id for r in S.hash_sample(docs, "doc_id", 0.25).select("doc_id").collect()}
    assert s1 == s2  # rerun-stable, unlike df.sample
    n = docs.count()
    assert 0.15 * n < len(s1) < 0.35 * n
    # monotone: a bigger fraction strictly contains a smaller one
    s_half = {
        r.doc_id for r in S.hash_sample(docs, "doc_id", 0.5).select("doc_id").collect()
    }
    assert s1 <= s_half


def test_quality_weighted_sample_rate_tracks_quality(spark):
    from ydb_vector_search_simple_api_spark.operators import sampling

    out = sampling.quality_weighted_sample(spark, SF_SMALL).collect()
    assert len(out) == 500
    hi = [r for r in out if r.quality >= 0.9]
    lo = [r for r in out if r.quality < 0.7]
    if hi and lo:
        rate_hi = sum(r.admitted for r in hi) / len(hi)
        rate_lo = sum(r.admitted for r in lo) / len(lo)
        assert rate_hi > rate_lo
    # admission is a pure function of (doc_id, quality): re-run identical
    again = sampling.quality_weighted_sample(spark, SF_SMALL).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_epoch_shards_balance_and_epoch_variation(spark):
    from ydb_vector_search_simple_api_spark.operators import sampling as S
    from ydb_vector_search_simple_api_spark.sources.store import load_documents

    r0 = S.epoch_shards(spark, SF_SMALL, n_shards=8, epoch=0).collect()
    n_docs = load_documents(spark, SF_SMALL).count()
    assert sum(r.n_docs for r in r0) == n_docs
    assert len(r0) == 8
    # roughly balanced (within 3x of ideal on the small corpus)
    ideal = n_docs / 8
    assert all(ideal / 3 < r.n_docs < ideal * 3 for r in r0)
    # a different epoch permutes the assignment
    r1 = S.epoch_shards(spark, SF_SMALL, n_shards=8, epoch=1).collect()
    assert [r.n_docs for r in r0] != [r.n_docs for r in r1] or [
        r.n_tokens for r in r0
    ] != [r.n_tokens for r in r1]
    # determinism: same epoch -> identical result
    r0b = S.epoch_shards(spark, SF_SMALL, n_shards=8, epoch=0).collect()
    assert r0 == r0b


def test_per_source_examples_deterministic_k(spark):
    from ydb_vector_search_simple_api_spark.operators import sampling as S

    rows = S.per_source_examples(spark, SF_SMALL, k=3).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r.rk)
    for rks in per_src.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert max(rks) <= 3
    assert rows == S.per_source_examples(spark, SF_SMALL, k=3).collect()
