"""Streaming ANN query serving == exact batch kNN join (the strongest
streaming gate: per-query answers are batch-independent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators.search import knn_join
from ydb_vector_search_simple_api_spark.streaming import serve

from conftest import SF_SMALL


def test_knn_serve_stream_equals_batch_join(spark):
    got = serve.knn_serve_stream(spark, SF_SMALL, k=5, n_queries=8).collect()

    embs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    c = embs.select(F.col("vec_id").alias("id"), "embedding")
    want = knn_join(spark, q, c, k=5, round_digits=6).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # ordered surface: (query_id, rank) ascending, ranks 1..k per query
    assert [(r.query_id, r.rank) for r in got] == [
        (qid, rk) for qid in range(8) for rk in range(1, 6)
    ]


def test_stream_serve_appends_results_per_batch(spark, tmp_path):
    # pruned width also flows through the serving path (approximate
    # answers allowed; here width=full so equality still holds even
    # with a single-shard landing zone and no per-shard trigger cap)
    import __spark_entry__ as E

    idx = E._ivf_index(spark, SF_SMALL)
    embs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    queries = embs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    landing = str(tmp_path / "queries")
    queries.repartition(1).write.parquet(landing)
    q = serve.stream_knn_serve(
        spark,
        idx,
        serve.query_shard_stream(spark, landing, max_files_per_trigger=None),
        results_dir=str(tmp_path / "results"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=3,
        search_top_size=idx.n_clusters,
        round_digits=6,
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "results"))
    assert out.count() == 12
    assert set(r.query_id for r in out.collect()) == {0, 1, 2, 3}


def test_knn_serve_stream_fast_engine_same_ids_and_ranks(spark):
    a = serve.knn_serve_stream(spark, SF_SMALL, k=5, n_queries=6).collect()
    b = serve.knn_serve_stream(
        spark, SF_SMALL, k=5, n_queries=6, engine="routed_blocked"
    ).collect()
    assert [(r.query_id, r.id, r.rank) for r in a] == [
        (r.query_id, r.id, r.rank) for r in b
    ]
