"""Video sequence near-dup (operators/videodedup.py): planted
subsequence recovery, offset consistency, vote semantics."""

from __future__ import annotations

from conftest import SF_SMALL

from ydb_vector_search_simple_api_spark.operators import videodedup as VD
from ydb_vector_search_simple_api_spark.sources.store import load_documents


def test_shingles_deterministic_and_positional():
    h = VD._frame_hashes(7, 300)
    s1, s2 = VD._shingles(h), VD._shingles(h)
    assert s1 == s2
    assert [t for _, t in s1] == list(range(len(h) - VD.SHINGLE_K + 1))
    # different docs share no shingles (md5-keystream frames)
    other = {k for k, _ in VD._shingles(VD._frame_hashes(8, 300))}
    assert not other & {k for k, _ in s1}


def test_planted_subsequences_recovered(spark):
    n_docs = load_documents(spark, SF_SMALL).count()
    want = {(i - 9, i) for i in range(9, n_docs, 10)}
    assert want, "no planted pairs at this SF"
    rows = VD.video_sequence_dedup(spark, SF_SMALL).collect()
    got = {(r.id_a, r.id_b) for r in rows}
    assert got == want  # full recall, zero false pairs
    # borrowed base frames 1..10 sit at dup positions 2..11 -> +1
    assert all(r.offset == 1 for r in rows)
    assert all(r.n_votes >= 2 for r in rows)


def test_hot_shingle_cap_gates_everything(spark):
    s = VD.video_shingles(spark, SF_SMALL)
    assert VD.sequence_pairs(s, max_key_df=0).count() == 0
