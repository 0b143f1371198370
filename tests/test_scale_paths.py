"""Scale-path variants must agree with their exact/declarative twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import enrich
from ydb_vector_search_simple_api_spark.operators.search import knn_join, knn_join_blocked
from ydb_vector_search_simple_api_spark.sources.store import load_documents, load_embeddings

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def ivf_idx(spark):
    import __spark_entry__ as E

    return E._ivf_index(spark, SF_SMALL)


@pytest.fixture(scope="module")
def qc(spark):
    embs = load_embeddings(spark, SF_SMALL)
    queries = embs.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = embs.select(F.col("vec_id").alias("id"), "embedding")
    return queries, corpus


# Euclidean uses the ||a||^2 - 2ab + ||b||^2 BLAS expansion, which
# loses ~sqrt(eps) to cancellation near zero distance — wider abs tol.
@pytest.mark.parametrize(
    "strategy,tol",
    [
        ("CosineSimilarity", 1e-9),
        ("InnerProductSimilarity", 1e-9),
        ("EuclideanDistance", 1e-6),
        ("ManhattanDistance", 1e-9),
    ],
)
def test_blocked_knn_matches_window_knn(spark, qc, strategy, tol):
    queries, corpus = qc
    exact = {
        (r.query_id, r.rank): (r.id, r.score)
        for r in knn_join(spark, queries, corpus, k=5, strategy=strategy).collect()
    }
    blocked = {
        (r.query_id, r.rank): (r.id, r.score)
        for r in knn_join_blocked(spark, queries, corpus, k=5, strategy=strategy).collect()
    }
    assert set(exact) == set(blocked)
    for key, (eid, escore) in exact.items():
        bid, bscore = blocked[key]
        assert bid == eid, (key, strategy)
        assert bscore == pytest.approx(escore, abs=tol)


def test_embed_column_plumbing(spark):
    docs = load_documents(spark, SF_SMALL).limit(50)
    out = enrich.embed_column(docs, dim=32)
    rows = out.collect()
    assert out.columns == docs.columns + ["embedding"]
    assert len(rows) == 50
    import numpy as np

    for r in rows[:10]:
        v = np.array(r.embedding)
        assert v.shape == (32,)
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)
    # determinism: same text -> same vector across runs
    again = {r.doc_id: r.embedding for r in enrich.embed_column(docs, dim=32).collect()}
    for r in rows:
        assert again[r.doc_id] == r.embedding


def test_blocked_knn_string_ids_and_zero_norm_nulls(spark):
    """Id output types follow the input schemas (not hardcoded long),
    and zero-norm vectors under cosine score NULL, ranked last —
    knn_join's documented semantics."""
    queries = spark.createDataFrame(
        [("qa", [1.0, 0.0]), ("qz", [0.0, 0.0])], ["query_id", "query_vec"]
    )
    corpus = spark.createDataFrame(
        [("d1", [1.0, 0.0]), ("d2", [0.0, 1.0]), ("d0", [0.0, 0.0])],
        ["id", "embedding"],
    )
    out = knn_join_blocked(spark, queries, corpus, k=3, strategy="CosineSimilarity")
    assert dict(out.dtypes)["query_id"] == "string"
    assert dict(out.dtypes)["id"] == "string"
    rows = {(r.query_id, r.id): r for r in out.collect()}
    assert rows[("qa", "d1")].score == pytest.approx(1.0)
    # zero-norm corpus row: NULL score, ranked last for qa
    assert rows[("qa", "d0")].score is None
    assert rows[("qa", "d0")].rank == 3
    # zero-norm query: every score NULL
    assert all(r.score is None for (q, _), r in rows.items() if q == "qz")


def test_ivf_knn_join_routed_blocked_matches_distributed(spark, ivf_idx):
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.operators import index as ivf

    embs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    for width in (2, ivf_idx.n_clusters):
        a = ivf.ivf_knn_join_routed_blocked(
            spark, ivf_idx, queries, k=5, search_top_size=width
        ).collect()
        b = ivf.ivf_knn_join_distributed(
            spark, ivf_idx, queries, k=5, search_top_size=width
        ).collect()
        # same candidate ids and ranks; scores agree to float tolerance
        assert [(r.query_id, r.id, r.rank) for r in a] == [
            (r.query_id, r.id, r.rank) for r in b
        ]
        for ra, rb in zip(a, b):
            assert ra.score == pytest.approx(rb.score, abs=1e-9)


def test_ivf_routed_blocked_prunes_partitions(spark, ivf_idx):
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.operators import index as ivf
    from ydb_vector_search_simple_api_spark.plans.checks import formatted_plan

    embs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    df = ivf.ivf_knn_join_routed_blocked(
        spark, ivf_idx, queries, k=3, search_top_size=1
    )
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan and "cluster_id" in plan


def test_pool_chunk_embeddings_matches_numpy_replay(spark):
    import hashlib

    import numpy as np

    from ydb_vector_search_simple_api_spark.operators import enrich
    from ydb_vector_search_simple_api_spark.operators.textual import chunk_documents

    out = {
        r.doc_id: r
        for r in enrich.pool_chunk_embeddings(spark, SF_SMALL, dim=16).collect()
    }
    assert len(out) == 500
    # driver-side replay on a handful of docs: same chunker output,
    # same fake embedder, plain float mean (decimal-exact Spark mean
    # agrees to float tolerance), same digest recipe
    chunks = (
        chunk_documents(spark, SF_SMALL)
        .filter(F.col("doc_id") < 5)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    emb = enrich.deterministic_fake_embedder(16)
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r.chunk_text)
    for doc_id, texts in by_doc.items():
        V = emb(texts).astype(np.float64)
        pooled = np.round(V.mean(axis=0), 6) + 0.0
        want_norm = round(float(np.sqrt((pooled * pooled).sum())), 6) + 0.0
        row = out[doc_id]
        assert row.n_chunks == len(texts)
        assert row.dim == 16
        assert row.pooled_norm == pytest.approx(want_norm, abs=2e-6)
    # determinism across runs
    again = {
        r.doc_id: r.pooled_md5
        for r in enrich.pool_chunk_embeddings(spark, SF_SMALL, dim=16).collect()
    }
    assert {d: r.pooled_md5 for d, r in out.items()} == again


def test_prefix_join_plan_has_no_cartesian(spark):
    """Every stage of the prefix-filter join is keyed: no cartesian /
    nested-loop joins anywhere in the physical plan, and no
    row-at-a-time Python."""
    from ydb_vector_search_simple_api_spark.operators import dedup
    from ydb_vector_search_simple_api_spark.plans.checks import formatted_plan

    df = dedup.ngram_jaccard_prefix_pairs(
        load_documents(spark, SF_SMALL), n=3, threshold=0.8
    )
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_range_search_ivf_plan_prunes_partitions(spark, ivf_idx):
    """At a tight threshold the angular bound rules out cells, and the
    pruned IN-list reaches the scan's PartitionFilters (planning-time
    directory pruning, the ivf_search contract)."""
    from ydb_vector_search_simple_api_spark.operators import index as ivf
    from ydb_vector_search_simple_api_spark.plans.checks import formatted_plan

    row = load_embeddings(spark, SF_SMALL).filter(F.col("vec_id") == 7).head()
    qvec = [float(x) for x in row.embedding]
    df = ivf.ivf_range_search(spark, ivf_idx, qvec, threshold=0.5, round_digits=6)
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan and "cluster_id" in plan
    # the IN list is strictly smaller than the full cluster set
    import re

    m = re.search(r"cluster_id#\d+ IN \(([^)]*)\)", plan)
    assert m and len(m.group(1).split(",")) < ivf_idx.n_clusters


def test_expectations_single_fused_aggregate(spark):
    """The events suite keeps the one-scan shape too."""
    from ydb_vector_search_simple_api_spark.operators.expectations import (
        expectations_report_events,
    )

    plan = (
        expectations_report_events(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1


def test_tfidf_cosine_plans_are_keyed_and_broadcast(spark):
    """Both weighted-cosine twins: no cartesian stage anywhere, the
    feature-table df/N attachments ride broadcasts, and no
    row-at-a-time Python (the kernel is pure Column expressions)."""
    from ydb_vector_search_simple_api_spark.operators import sparse_sim
    from ydb_vector_search_simple_api_spark.plans.checks import formatted_plan

    docs = load_documents(spark, SF_SMALL)
    for df in (
        sparse_sim.tfidf_cosine_pairs(docs, n=3, threshold=0.6),
        sparse_sim.tfidf_cosine_prefix_pairs(docs, n=3, threshold=0.9),
    ):
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert "BroadcastExchange" in plan  # dfreq + n_docs attachments


def test_sorted_neighborhood_has_no_global_window(spark):
    """The point of the rank decomposition: NO single-partition
    exchange in the plan (a naive row_number over the whole corpus
    would show Exchange SinglePartition), and no cartesian stage —
    the candidate join is keyed on rank blocks."""
    from ydb_vector_search_simple_api_spark.operators import blocking
    from ydb_vector_search_simple_api_spark.plans.checks import formatted_plan

    df = blocking.sorted_neighborhood_pairs(load_documents(spark, SF_SMALL))
    plan = formatted_plan(df)
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ks_drift_value_window_is_bucket_partitioned(spark):
    """The value-grain cumulative window must carry the bucket
    partition key — an unpartitioned window over `value` would render
    as windowspecdefinition(value# ... with no partition column and
    serialize every distinct value into one task."""
    from ydb_vector_search_simple_api_spark.operators import stats
    from ydb_vector_search_simple_api_spark.plans.checks import formatted_plan

    plan = formatted_plan(stats.ks_drift(spark, SF_SMALL))
    assert "windowspecdefinition(value#" not in plan
    assert "windowspecdefinition(bucket#" in plan
    assert "CartesianProduct" not in plan


def test_domain_caps_has_no_single_partition_exchange(spark):
    """Both rank windows are keyed (domain+salt, then domain over the
    cap-bounded survivors): no SinglePartition exchange in the plan."""
    from ydb_vector_search_simple_api_spark.operators import web
    from ydb_vector_search_simple_api_spark.plans.checks import formatted_plan

    plan = formatted_plan(web.domain_caps(spark, SF_SMALL))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_paragraph_dedup_elects_without_window(spark):
    """Keep-first election must be a hash aggregation (partial
    map-side min), not a window over paragraph occurrences — hot
    boilerplate paragraphs are the skewed keys."""
    from ydb_vector_search_simple_api_spark.operators import dedup
    from ydb_vector_search_simple_api_spark.plans.checks import formatted_plan

    plan = formatted_plan(dedup.paragraph_dedup_docs(spark, SF_SMALL))
    assert "windowspecdefinition(pmd5#" not in plan
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan


def test_image_phash_join_path_is_jvm_only(spark):
    """After the Arrow hash stage the pair path is pure codegen: no
    Python eval inside the join/verify, no cartesian."""
    from ydb_vector_search_simple_api_spark.operators import imagededup
    from ydb_vector_search_simple_api_spark.plans.checks import formatted_plan

    hashes = imagededup.image_dhashes(spark, SF_SMALL).select("doc_id", "dhash")
    plan = formatted_plan(imagededup.dhash_pairs(hashes))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the only Python nodes are the two scans' hash stages
    assert plan.count("MapInPandas") <= 2
