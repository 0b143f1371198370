"""BM25 + hybrid RRF: formula replay, fusion invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import ranking as RK
from ydb_vector_search_simple_api_spark.sources.store import load_documents

from conftest import SF_SMALL


def test_bm25_replay_single_doc(spark):
    """Replay the BM25 formula in Python for one matched doc."""
    docs = load_documents(spark, SF_SMALL)
    scored = {r.doc_id: r.score for r in RK.bm25_scores(docs, RK.QUERY_TERMS).collect()}
    assert scored, "query terms must match the synthetic corpus"

    rows = docs.select("doc_id", "text").collect()
    toks = {r.doc_id: r.text.lower().strip().split() for r in rows}
    n_docs = len(rows)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    terms = sorted(set(RK.QUERY_TERMS))
    df = {
        t: sum(1 for tk in toks.values() if t in tk) for t in terms
    }
    # pick an arbitrary scored doc and replay
    doc_id = next(iter(scored))
    tk = toks[doc_id]
    s = 0.0
    for t in terms:
        tf = tk.count(t)
        if tf == 0:
            continue
        idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
        tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl))
        s += round(idf * tfn, 9)
    assert abs(scored[doc_id] - round(s, 6)) < 1e-9


def test_bm25_topk_ordering(spark):
    rows = RK.bm25_topk(spark, SF_SMALL, k=10).collect()
    assert 0 < len(rows) <= 10
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))


def test_hybrid_rrf_bounds_and_membership(spark, qvec=None):
    import __spark_entry__ as E

    qv = E._query_vec(spark, SF_SMALL)
    fused = RK.hybrid_rrf_topk(spark, SF_SMALL, qv, k=10, pool=50).collect()
    assert 0 < len(fused) <= 10
    # rrf of a doc in both lists is bounded by 2/(60+1); single-list
    # membership by 1/(60+1)
    for r in fused:
        assert 0.0 < r.rrf <= 2.0 / 61.0 + 1e-9
    # the fused list must contain at least one member of each source
    # list's head (fusion actually mixes, not copies)
    bm_head = {r.doc_id for r in RK.bm25_topk(spark, SF_SMALL, k=3).collect()}
    fused_ids = {r.doc_id for r in fused}
    assert bm_head & fused_ids


def test_mmr_selection_invariants(spark):
    import __spark_entry__ as E

    qv = E._query_vec(spark, SF_SMALL)
    mmr = RK.mmr_rerank(spark, SF_SMALL, qv, k=10, pool=50).collect()
    assert len(mmr) == 10
    assert [r.rk for r in mmr] == list(range(1, 11))
    # first pick is pure relevance: must equal the top-1 vector hit
    from ydb_vector_search_simple_api_spark.operators.search import exact_search

    top1 = exact_search(spark, SF_SMALL, qv, k=1, round_digits=6).collect()[0]
    assert mmr[0].doc_id == top1.id
    # determinism
    again = RK.mmr_rerank(spark, SF_SMALL, qv, k=10, pool=50).collect()
    assert mmr == again
    # lambda=1 degenerates to plain relevance ranking of the pool
    pure = RK.mmr_rerank(spark, SF_SMALL, qv, k=10, pool=50, lam=1.0).collect()
    ids_pure = [r.doc_id for r in pure]
    exact_ids = [r.id for r in exact_search(spark, SF_SMALL, qv, k=10, round_digits=6).collect()]
    assert ids_pure == exact_ids


def test_mmr_diversifies_duplicate_pool(spark):
    """With lam<1 MMR must not pick two identical vectors back-to-back
    when a distinct alternative exists — checked on the real corpus by
    asserting the penalty actually reorders vs pure relevance."""
    import __spark_entry__ as E

    qv = E._query_vec(spark, SF_SMALL)
    lo = RK.mmr_rerank(spark, SF_SMALL, qv, k=10, pool=50, lam=0.2).collect()
    hi = RK.mmr_rerank(spark, SF_SMALL, qv, k=10, pool=50, lam=1.0).collect()
    assert [r.doc_id for r in lo] != [r.doc_id for r in hi]


def test_mmr_distance_strategy_top1_is_nearest(spark):
    """For a distance strategy the greedy must still put the NEAREST
    doc first (the review-found inversion: rel had to be negated)."""
    import __spark_entry__ as E
    from ydb_vector_search_simple_api_spark.operators.search import exact_search

    qv = E._query_vec(spark, SF_SMALL)
    mmr = RK.mmr_rerank(
        spark, SF_SMALL, qv, k=5, pool=50, lam=1.0, strategy="EuclideanDistance"
    ).collect()
    exact = exact_search(
        spark, SF_SMALL, qv, k=5, strategy="EuclideanDistance", round_digits=6
    ).collect()
    assert [r.doc_id for r in mmr] == [r.id for r in exact]


def test_bm25_plan_has_no_token_stream_shuffle(spark):
    """The narrow-array formulation must not explode the corpus token
    stream: the only Generate in the plan fans out |terms| structs,
    and no Exchange carries a 'token'-keyed hash partitioning of the
    raw stream (the aggregate exchanges group on doc_id / token of
    the |terms|-sized side)."""
    from ydb_vector_search_simple_api_spark.plans import checks
    from ydb_vector_search_simple_api_spark.sources.store import load_documents

    df = RK.bm25_scores(load_documents(spark, SF_SMALL), RK.QUERY_TERMS)
    plan = checks.simple_plan(df)
    # every Generate must be the |terms| fan-out (the dfreq branch
    # repeats it) — a token-stream explode would Generate over the
    # bare tokens() split with no terms literal in sight
    gens = [ln for ln in plan.splitlines() if "Generate" in ln]
    assert gens, plan
    terms_literal = "[" + ",".join(sorted(set(RK.QUERY_TERMS))) + "]"
    assert all(terms_literal in ln for ln in gens), plan


# ----------------------------------------------------- lexical index


import pytest


@pytest.fixture(scope="module")
def lex_index(spark, tmp_path_factory):
    return RK.build_lexical_index(
        spark,
        load_documents(spark, SF_SMALL),
        str(tmp_path_factory.mktemp("lex") / "lexical"),
    )


def test_indexed_bm25_equals_recompute_bit_for_bit(spark, lex_index):
    """The serving contract: the persisted-postings path must equal the
    full-recompute path exactly — same doubles, same order."""
    docs = load_documents(spark, SF_SMALL)
    for terms in (RK.QUERY_TERMS, ("vector",), ("hash", "stream", "zzz_absent")):
        want = sorted(
            (r.doc_id, r.score) for r in RK.bm25_scores(docs, terms).collect()
        )
        got = sorted(
            (r.doc_id, r.score)
            for r in RK.bm25_scores_indexed(spark, lex_index, terms).collect()
        )
        assert got == want


def test_indexed_topk_equals_recompute(spark, lex_index):
    want = [tuple(r) for r in RK.bm25_topk(spark, SF_SMALL, k=10).collect()]
    got = [
        tuple(r)
        for r in RK.bm25_topk_indexed(spark, lex_index, k=10).collect()
    ]
    assert got == want


def test_indexed_load_roundtrip(lex_index, spark):
    loaded = RK.load_lexical_index(lex_index.path)
    assert loaded == lex_index
    got = [tuple(r) for r in RK.bm25_topk_indexed(spark, loaded, k=5).collect()]
    assert len(got) == 5


def test_indexed_plan_reads_postings_not_corpus(spark, lex_index):
    """Serving cost contract: the indexed path scans the postings
    parquet with the term IN-filter PUSHED, and never touches the
    documents table."""
    from ydb_vector_search_simple_api_spark.plans import checks

    df = RK.bm25_topk_indexed(spark, lex_index, k=10)
    plan = checks.formatted_plan(df)
    assert "documents.parquet" not in plan
    pushed = checks.pushed_filters(df)
    assert "token" in pushed, plan


def test_hybrid_with_index_equals_recompute(spark, lex_index):
    from ydb_vector_search_simple_api_spark.sources.store import load_embeddings

    qv = [
        float(x)
        for x in load_embeddings(spark, SF_SMALL)
        .filter(F.col("vec_id") == 0)
        .head()
        .embedding
    ]
    want = [
        tuple(r) for r in RK.hybrid_rrf_topk(spark, SF_SMALL, qv, k=10).collect()
    ]
    got = [
        tuple(r)
        for r in RK.hybrid_rrf_topk(
            spark, SF_SMALL, qv, k=10, lexical_index=lex_index
        ).collect()
    ]
    assert got == want


def test_engine_hybrid_serves_through_index(spark, lex_index):
    """HTTP-layer twin: an engine holding a lexical index answers
    hybrid requests identically to the recompute engine, without a
    corpus scan in its hybrid plan's BM25 half."""
    from ydb_vector_search_simple_api_spark import api

    qv = [
        float(x)
        for x in __import__(
            "ydb_vector_search_simple_api_spark.sources.store", fromlist=["x"]
        )
        .load_embeddings(spark, SF_SMALL)
        .filter(F.col("vec_id") == 0)
        .head()
        .embedding
    ]
    plain = api.VectorSearchEngine(spark, SF_SMALL)
    indexed = api.VectorSearchEngine(spark, SF_SMALL, lexical_index=lex_index)
    body = {"embedding": qv, "k": 5, "hybrid_terms": list(RK.QUERY_TERMS)}
    p1, c1 = api.search_request(plain, body)
    p2, c2 = api.search_request(indexed, body)
    assert c1 == c2 == 200
    strip = lambda p: [  # noqa: E731
        {k: v for k, v in r.items()} for r in p["results"]
    ]
    assert strip(p1) == strip(p2)


# ----------------------------------------------------- rag context


def test_rag_context_budget_cut(spark):
    from ydb_vector_search_simple_api_spark.sources.store import load_embeddings

    qv = [
        float(x)
        for x in load_embeddings(spark, SF_SMALL)
        .filter(F.col("vec_id") == 0)
        .head()
        .embedding
    ]
    rows = sorted(
        RK.rag_context(spark, SF_SMALL, qv, k=10, budget_tokens=256).collect(),
        key=lambda r: r.rk,
    )
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    # running total is consistent and the cut is a rank prefix
    cum = 0
    for r in rows:
        cum += r.n_tokens
        assert r.cum_tokens == cum
        assert r.included == (1 if cum <= 256 else 0)
    flags = [r.included for r in rows]
    assert flags == sorted(flags, reverse=True)  # prefix property
    # ranked best-first by score
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rag_context_plan_shape(spark):
    """Retrieval half must stay the flagship plan: TakeOrdered top-k,
    k-row broadcast build side, text read only for k rows."""
    from ydb_vector_search_simple_api_spark.plans import checks
    from ydb_vector_search_simple_api_spark.sources.store import load_embeddings

    qv = [
        float(x)
        for x in load_embeddings(spark, SF_SMALL)
        .filter(F.col("vec_id") == 0)
        .head()
        .embedding
    ]
    df = RK.rag_context(spark, SF_SMALL, qv, k=10)
    assert checks.uses_take_ordered(df), checks.simple_plan(df)
    for block in checks.broadcast_scan_blocks(df, "documents.parquet"):
        assert "source" not in block, block


# ------------------------------------------------------ phrase search


def test_phrase_search_known_positions(spark):
    from ydb_vector_search_simple_api_spark.operators.ranking import (
        phrase_match_positions,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox the quick brown"),
            (2, "quick brown"),
            (3, "the quick the slow"),
            (4, "brown quick"),
            (5, "quick"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_match_positions(docs, ["quick", "brown"]).collect()
    }
    assert got == {1: (2, 2), 2: (1, 1)}
    # m=1 degenerates to token search
    got1 = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_match_positions(docs, ["quick"]).collect()
    }
    assert got1[5] == (1, 1) and got1[1] == (2, 2) and got1[3] == (1, 2)


def test_phrase_search_plan_is_shuffle_free(spark):
    from ydb_vector_search_simple_api_spark.operators.ranking import phrase_search
    from tests.conftest import SF_SMALL

    df = phrase_search(spark, SF_SMALL)
    explained = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained
    assert df.count() >= 0


def test_phrase_store_equals_scan(spark, tmp_path):
    from tests.conftest import SF_SMALL
    from ydb_vector_search_simple_api_spark.operators.ranking import (
        build_positional_postings,
        phrase_search,
        phrase_search_indexed,
    )
    from ydb_vector_search_simple_api_spark.sources.store import load_documents

    idx = build_positional_postings(
        spark, load_documents(spark, SF_SMALL), str(tmp_path / "pos")
    )
    for phrase in (["table", "hash"], ["order"], ["the", "the"]):
        scan = phrase_search(spark, SF_SMALL, phrase)
        store = phrase_search_indexed(spark, idx, phrase)
        assert store.exceptAll(scan).count() == 0
        assert scan.exceptAll(store).count() == 0
