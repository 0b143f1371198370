"""exact_search semantics + physical plan shape (SURVEY.md §4.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.config import STRATEGIES, sort_descending
from ydb_vector_search_simple_api_spark.operators.search import exact_search, knn_join
from ydb_vector_search_simple_api_spark.plans import checks
from ydb_vector_search_simple_api_spark.sources.store import load_embeddings

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def qvec(spark):
    row = (
        load_embeddings(spark, SF_SMALL)
        .filter(F.col("vec_id") == 0)
        .head()
    )
    return [float(x) for x in row.embedding]


def test_output_shape(spark, qvec):
    df = exact_search(spark, SF_SMALL, qvec, k=7)
    assert df.columns == ["id", "title", "vendor", "description", "score"]
    assert df.count() == 7


def test_self_match_first(spark, qvec):
    """Query-by-example: the row the query came from scores 1.0 cosine."""
    top = exact_search(spark, SF_SMALL, qvec, k=1).head()
    assert top.id == 0
    assert top.score == pytest.approx(1.0)


def test_sort_direction_per_strategy(spark, qvec):
    """DESC iff strategy endswith 'Similarity' (reference app.py:55)."""
    for strat in STRATEGIES:
        rows = exact_search(spark, SF_SMALL, qvec, k=20, strategy=strat).collect()
        scores = [r.score for r in rows if r.score is not None]
        if sort_descending(strat):
            assert scores == sorted(scores, reverse=True), strat
        else:
            assert scores == sorted(scores), strat


def test_distance_vs_similarity_agree(spark, qvec):
    """CosineDistance ASC must rank identically to CosineSimilarity DESC."""
    sim = [r.id for r in exact_search(spark, SF_SMALL, qvec, k=15, strategy="CosineSimilarity").collect()]
    dist = [r.id for r in exact_search(spark, SF_SMALL, qvec, k=15, strategy="CosineDistance").collect()]
    assert sim == dist


def test_filter_restricts_results(spark, qvec):
    df = exact_search(spark, SF_SMALL, qvec, k=50, filter={"vendor": "fr"})
    rows = df.collect()
    assert rows and all(r.vendor == "fr" for r in rows)


def test_conjunctive_filter(spark, qvec):
    rows = exact_search(
        spark, SF_SMALL, qvec, k=50, filter={"vendor": "de", "title": "src3"}
    ).collect()
    assert all(r.vendor == "de" and r.title == "src3" for r in rows)


# ----------------------------------------------------------- plan shape


def test_topk_plan_is_take_ordered(spark, qvec):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject — the
    per-partition-heap physical top-k that survives any corpus size."""
    df = exact_search(spark, SF_SMALL, qvec, k=4)
    assert checks.uses_take_ordered(df), checks.simple_plan(df)


def test_metadata_join_is_broadcast(spark, qvec):
    df = exact_search(spark, SF_SMALL, qvec, k=4)
    assert checks.uses_broadcast_join(df), checks.simple_plan(df)


def test_metadata_join_build_side_is_topk(spark, qvec):
    """The BUILD side of the post-top-k metadata join must be the
    k-row top-k result; the documents table is the 100 TB side and
    must stay the streamed probe. uses_broadcast_join passes either
    way — this pins WHICH relation is broadcast."""
    df = exact_search(spark, SF_SMALL, qvec, k=4)
    subs = checks.broadcast_subtree_details(df)
    assert subs, checks.formatted_plan(df)
    # the broadcast build subtree is the top-k computation itself
    assert any("TakeOrderedAndProject" in s for s in subs), subs
    # and no broadcast build side scans the documents table at all in
    # the unfiltered path (the metadata scan is probe-side only)
    assert not checks.broadcast_scan_blocks(df, "documents.parquet"), subs


def test_filtered_metadata_join_never_broadcasts_wide_docs(spark, qvec):
    """The filtered path broadcasts the (narrow, pushed-down) id set —
    fine. What must never happen is the WIDE metadata scan (the one
    reading the title column `source`) riding a broadcast."""
    df = exact_search(spark, SF_SMALL, qvec, k=4, filter={"vendor": "fr"})
    doc_scans = checks.broadcast_scan_blocks(df, "documents.parquet")
    for block in doc_scans:
        assert "source" not in block, block
    assert any("TakeOrderedAndProject" in s
               for s in checks.broadcast_subtree_details(df))


def test_filter_pushed_to_parquet_scan(spark, qvec):
    df = exact_search(spark, SF_SMALL, qvec, k=4, filter={"vendor": "fr"})
    pushed = checks.pushed_filters(df)
    assert "lang" in pushed, checks.formatted_plan(df)


def test_unfiltered_scan_prunes_columns(spark, qvec):
    """The scored scan must read only vec_id+embedding (no text cols)."""
    df = exact_search(spark, SF_SMALL, qvec, k=4)
    plan = checks.formatted_plan(df)
    embs_scan = [
        block for block in plan.split("(") if "embeddings.parquet" in block
    ]
    assert embs_scan
    assert "text" not in plan.split("documents.parquet")[0] or True  # see ReadSchema below
    # ReadSchema of the embeddings scan must not include doc columns
    for line in plan.splitlines():
        if "ReadSchema" in line and "embedding" in line:
            assert "text" not in line and "source" not in line


# ----------------------------------------------------------- knn_join


def test_knn_join_topk_per_query(spark):
    embs = load_embeddings(spark, SF_SMALL)
    queries = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = embs.select(F.col("vec_id").alias("id"), "embedding")
    out = knn_join(spark, queries, corpus, k=5).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == [1, 2, 3, 4, 5]
        # self-match ranks first with score ~1
        best = min(rows, key=lambda r: r.rank)
        assert best.id == qid


def test_k_exceeding_rows_returns_all(spark, qvec):
    """k > corpus size: every row comes back, still ranked (SURVEY.md
    §7.4 edge inventory)."""
    out = exact_search(spark, SF_SMALL, qvec, k=10**6, strategy="CosineSimilarity")
    rows = out.collect()
    assert len(rows) == 500
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_empty_source_yields_no_rows(spark, qvec, tmp_path_factory):
    """Empty store: zero results, schema intact, no errors."""
    import os

    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.sources.store import (
        load_documents,
        load_embeddings,
    )

    d = str(tmp_path_factory.mktemp("empty"))
    load_embeddings(spark, SF_SMALL).limit(0).write.parquet(
        os.path.join(d, "embeddings.parquet")
    )
    load_documents(spark, SF_SMALL).limit(0).write.parquet(
        os.path.join(d, "documents.parquet")
    )
    out = exact_search(spark, d, qvec, k=4, strategy="CosineSimilarity")
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "id", "title", "vendor", "description", "score",
    ]


def test_range_search_threshold_semantics(spark, qvec):
    from ydb_vector_search_simple_api_spark.operators.search import range_search

    rows = range_search(spark, SF_SMALL, qvec, threshold=0.2).collect()
    assert rows, "threshold 0.2 should match something"
    assert all(r.score is not None and r.score >= 0.2 for r in rows)
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # distance direction flips the comparison
    d = range_search(
        spark, SF_SMALL, qvec, threshold=0.8, strategy="CosineDistance"
    ).collect()
    assert all(r.score <= 0.8 for r in d)
    # bounded variant keeps the TakeOrdered heap
    bounded = range_search(spark, SF_SMALL, qvec, threshold=0.2, max_rows=5)
    assert len(bounded.collect()) <= 5
    assert checks.uses_take_ordered(bounded), checks.simple_plan(bounded)


def test_prefix_dim_rerank_exact_and_monotone(spark):
    """Full shortlist == exact; recall monotone in shortlist; prefix
    validation raises."""
    import pytest
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.operators.search import (
        exact_search,
        prefix_dim_search_rerank,
    )
    from ydb_vector_search_simple_api_spark.sources.store import load_embeddings
    from conftest import SF_SMALL

    embs = load_embeddings(spark, SF_SMALL).select(
        F.col("vec_id").alias("id"), "embedding"
    )
    q = [float(x) for x in embs.filter("id = 0").head().embedding]
    n = embs.count()
    want = exact_search(spark, SF_SMALL, q, k=10, round_digits=6).collect()
    got = prefix_dim_search_rerank(
        spark, embs, q, k=10, shortlist=n, round_digits=6
    ).collect()
    assert [(r.id, r.score) for r in got] == [(r.id, r.score) for r in want]
    want_ids = {r.id for r in want}
    recalls = []
    for s in (32, 128, n):
        ids = {
            r.id
            for r in prefix_dim_search_rerank(
                spark, embs, q, k=10, shortlist=s, round_digits=6
            ).collect()
        }
        recalls.append(len(ids & want_ids))
    assert recalls == sorted(recalls)
    assert recalls[-1] == 10
    with pytest.raises(ValueError):
        prefix_dim_search_rerank(spark, embs, q, k=10, prefix_dims=0)
