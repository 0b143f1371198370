"""Seeded clustering analytics: assignment invariants, profile
accounting, c-TF-IDF topic shape, embedding QA (operators/clustering)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import clustering as C
from ydb_vector_search_simple_api_spark.plans import checks
from ydb_vector_search_simple_api_spark.sources.store import load_embeddings

from conftest import SF_SMALL

K = 8


def test_assignment_is_total_and_bounded(spark):
    a = C.cluster_assign(spark, SF_SMALL, k=K).collect()
    n = load_embeddings(spark, SF_SMALL).count()
    assert len(a) == n
    assert len({r.doc_id for r in a}) == n  # exactly one cluster per doc
    assert all(0 <= r.cluster_id < K for r in a)
    assert all(r.dist is not None and 0.0 <= r.dist <= C.NULL_DIST for r in a)


def test_seeds_assign_to_themselves(spark):
    a = {r.doc_id: r for r in C.cluster_assign(spark, SF_SMALL, k=K).collect()}
    for sid in range(K):
        assert a[sid].cluster_id == sid
        assert a[sid].dist == 0.0  # cosine distance to itself


def test_assignment_is_argmin_replay(spark):
    """NumPy replay of the nearest-anchor rule for a sample of docs."""
    import numpy as np

    embs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in load_embeddings(spark, SF_SMALL).collect()}
    seeds = {i: embs[i] for i in range(K)}
    a = {r.doc_id: r.cluster_id
         for r in C.cluster_assign(spark, SF_SMALL, k=K).collect()}
    for doc_id in list(embs)[:50]:
        v = embs[doc_id]
        best = None
        for cid in range(K):
            s = seeds[cid]
            denom = np.linalg.norm(v) * np.linalg.norm(s)
            d = 9.0 if denom == 0 else round(1.0 - float(v @ s) / denom, 6)
            if best is None or d < best[0] or (d == best[0] and cid < best[1]):
                best = (d, cid)
        assert a[doc_id] == best[1], doc_id


def test_profile_accounting(spark):
    rows = C.cluster_profile(spark, SF_SMALL, k=K).collect()
    n = load_embeddings(spark, SF_SMALL).count()
    assert sum(r.n_docs for r in rows) == n
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert all(r.avg_dist >= 0.0 for r in rows)


def test_topics_shape_and_scores(spark):
    rows = C.cluster_topics(spark, SF_SMALL, k=K, top_terms=5).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rs in by_cluster.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        # ranked by (score desc, tf desc, term asc)
        keys = [(-r.score, -r.tf, r.term) for r in rs]
        assert keys == sorted(keys)
        # ln(k/df) with df<=k is never negative; on a tiny corpus the
        # top term may legitimately sit in every cluster (score 0,
        # tf tie-break)
        assert rs[0].score >= 0.0


def test_topics_score_formula(spark):
    """Replay c-TF-IDF for one returned row from raw counts."""
    rows = C.cluster_topics(spark, SF_SMALL, k=K, top_terms=5).collect()
    r = rows[0]
    a = C.cluster_assign(spark, SF_SMALL, k=K).select("doc_id", "cluster_id")
    from ydb_vector_search_simple_api_spark.functions import text as TXT
    from ydb_vector_search_simple_api_spark.sources.store import load_documents

    toks = (
        load_documents(spark, SF_SMALL)
        .join(a, "doc_id")
        .select("cluster_id", F.explode(TXT.tokens("text")).alias("term"))
        .filter(F.col("term") == r.term)
    )
    tf = toks.filter(F.col("cluster_id") == r.cluster_id).count()
    df = toks.select("cluster_id").distinct().count()
    assert tf == r.tf
    assert abs(r.score - round(tf * math.log(K / df), 6)) < 1e-9


def test_embedding_qa_totals(spark):
    rows = C.embedding_qa_report(spark, SF_SMALL).collect()
    n = load_embeddings(spark, SF_SMALL).count()
    assert sum(r.n_vecs for r in rows) == n
    for r in rows:
        assert r.n_dims_bad == 0  # synthetic store is uniform-dim
        assert r.min_norm <= r.avg_norm <= r.max_norm


def test_assign_plan_broadcasts_anchors_no_window(spark):
    """Scale shape: the k anchors ride a broadcast; the argmin is a
    partial-aggregatable min(struct), NOT a per-doc window sort."""
    df = C.cluster_assign(spark, SF_SMALL, k=K)
    plan = checks.simple_plan(df)
    assert checks.uses_broadcast_join(df) or "BroadcastNestedLoopJoin" in plan, plan
    assert "Window" not in plan, plan


def test_kmeans_lloyd_inertia_decreases(spark):
    """Lloyd's update never increases total inertia (the monotone
    convergence guarantee) — measured across iteration counts; and the
    assignment is a total partition of the corpus."""
    from tests.conftest import SF_SMALL
    import pyspark.sql.functions as SF
    from ydb_vector_search_simple_api_spark.operators.clustering import kmeans_lloyd

    inertia = []
    for t in (0, 1, 3):
        a = kmeans_lloyd(spark, SF_SMALL, k=8, n_iter=t)
        row = a.agg(SF.sum("dist"), SF.count("*")).collect()[0]
        inertia.append(row[0])
        assert row[1] == 500
    assert inertia[1] <= inertia[0] + 1e-6
    assert inertia[2] <= inertia[1] + 1e-6


def test_kmeans_lloyd_deterministic(spark):
    from tests.conftest import SF_SMALL
    from ydb_vector_search_simple_api_spark.operators.clustering import kmeans_lloyd

    a = sorted(map(tuple, kmeans_lloyd(spark, SF_SMALL, k=4, n_iter=2).collect()))
    b = sorted(map(tuple, kmeans_lloyd(spark, SF_SMALL, k=4, n_iter=2).collect()))
    assert a == b
