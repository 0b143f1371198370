"""Retrieval-quality metrics (operators/retrieval_metrics.py) and the
logistic-regression classifier (operators/logreg.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from ydb_vector_search_simple_api_spark.operators import logreg
from ydb_vector_search_simple_api_spark.operators.retrieval_metrics import (
    rank_weights,
    reciprocal_ranks,
    retrieval_quality,
    retrieval_quality_report,
)


def test_rank_weight_literals():
    w = rank_weights(3)
    assert w[0] == "1.000000000"  # 1/log2(2)
    assert w[1] == "0.630929754"  # 1/log2(3)
    rr = reciprocal_ranks(4)
    assert rr == ["1.000000000", "0.500000000", "0.333333333", "0.250000000"]


def test_retrieval_quality_bounds_and_shape(spark):
    df = retrieval_quality(spark, SF_SMALL, k=5, n_queries=8).collect()
    assert len(df) == 8
    for r in df:
        assert 0.0 <= r.precision_at_k <= 1.0
        assert r.mrr is not None and 0.0 <= r.mrr <= 1.0
        if r.n_rel >= 1:
            assert 0.0 <= r.recall_at_k <= 1.0
            assert 0.0 <= r.ndcg_at_k <= 1.0
        # hits can't exceed k or the relevant pool
        assert r.hits <= 5 and r.hits <= max(r.n_rel, 0)


def test_retrieval_quality_self_excluded(spark):
    """Leave-self-out: with the query present in the corpus, rank-1
    under cosine is the query itself — the metrics must never count
    it (a query whose label is unique would otherwise score mrr=1)."""
    per_q = retrieval_quality(spark, SF_SMALL, k=5, n_queries=8)
    # reconstruct: a query with n_rel=0 must have hits=0 (the self row
    # was the only same-label item and was excluded)
    for r in per_q.filter(F.col("n_rel") == 0).collect():
        assert r.hits == 0 and r.mrr == 0.0


def test_retrieval_report_rows(spark):
    rows = retrieval_quality_report(
        spark, SF_SMALL, k=5, n_queries=8
    ).collect()
    systems = {r.system for r in rows}
    assert systems == {"CosineSimilarity", "InnerProductSimilarity"}
    for r in rows:
        assert r.n_queries == 8
        assert 0.0 <= r.mean_ndcg_at_k <= 1.0


# ------------------------------------------------------------ logreg


def _planted_docs(spark, n=400):
    """Synthetic corpus with a plantable signal: positive docs carry
    marker tokens, negatives carry disjoint ones, both share noise."""
    rows = []
    for i in range(n):
        pos = i % 2 == 0
        marker = (
            f"alpha{i % 7} beta{i % 5} signal"
            if pos
            else f"gamma{i % 7} delta{i % 5} nosign"
        )
        rows.append(
            (i, f"{marker} common{i % 11} filler", "en" if pos else "fr", "s", 1)
        )
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def test_logreg_learns_planted_signal(spark, tmp_path):
    docs = _planted_docs(spark)
    # point the loader at the synthetic table
    d = str(tmp_path)
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    scored = logreg.logreg_report(spark, d).collect()
    by_split = {r.split: r for r in scored}
    assert set(by_split) == {"train", "holdout"}
    # the signal is trivially separable: holdout accuracy far above
    # the 0.5 majority baseline
    assert by_split["holdout"].accuracy >= 0.9
    assert by_split["train"].accuracy >= 0.9


def test_logreg_weights_are_exact_nanounits(spark):
    """Training returns integer nano-unit weights (the engine-exact
    representation) and a second run is bit-identical."""
    docs = logreg.load_documents(spark, SF_SMALL)
    feats = logreg._features(docs)
    w1 = logreg.train_weights(spark, feats, n_iter=2)
    w2 = logreg.train_weights(spark, feats, n_iter=2)
    assert w1 == w2
    assert all(isinstance(u, int) for u in w1.values())
    assert any(u != 0 for u in w1.values())


def test_logreg_score_rows_and_range(spark):
    out = logreg.logreg_score(spark, SF_SMALL, n_iter=2).collect()
    assert len(out) == 500
    for r in out:
        assert 0.0 <= r.score <= 1.0
        assert r.y_pred in (0, 1)
