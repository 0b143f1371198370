"""Streaming index ingestion (streaming/index_ingest.py): vectors
landed as parquet drops flow through foreachBatch -> ivf_upsert into
the cluster-partitioned layout, and serving sees them immediately."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL
from ydb_vector_search_simple_api_spark.operators import index as ivf
from ydb_vector_search_simple_api_spark.streaming import index_ingest
from ydb_vector_search_simple_api_spark.sources.store import load_embeddings


@pytest.fixture()
def halves(spark, tmp_path):
    embs = load_embeddings(spark, SF_SMALL).select(
        F.col("vec_id").alias("id"), "embedding"
    )
    first = embs.filter(F.col("id") % 2 == 0)
    second = embs.filter(F.col("id") % 2 == 1)
    idx = ivf.build_ivf_index(spark, first, str(tmp_path / "ivf"), n_clusters=4)
    return embs, first, second, idx


def test_stream_ingest_appends_and_serves(spark, tmp_path, halves):
    embs, first, second, idx = halves
    land = str(tmp_path / "landing")
    second.write.mode("overwrite").parquet(land)

    mon = index_ingest.IngestMonitor()
    q = index_ingest.stream_ivf_ingest(
        spark,
        idx,
        index_ingest.parquet_vector_stream(spark, land),
        checkpoint_dir=str(tmp_path / "ckpt"),
        monitor=mon,
    )
    q.awaitTermination(120)

    n_second = second.count()
    assert mon.n_appended == n_second
    assert mon.max_assign_l2 > 0.0
    assert spark.read.parquet(idx.path).count() == embs.count()

    # serving through the upserted index at full width == exact search
    # over the union — streamed rows are first-class index citizens
    from ydb_vector_search_simple_api_spark.operators.search import knn_join

    qrow = embs.filter(F.col("id") == 1).head()  # id 1 arrived by stream
    qvec = [float(x) for x in qrow.embedding]
    got = [
        r.id
        for r in ivf.ivf_search(spark, idx, qvec, k=10, search_top_size=4).collect()
    ]
    corpus = embs
    queries = spark.createDataFrame([(1, qvec)], "query_id long, query_vec array<double>")
    want = [
        r.id
        for r in knn_join(spark, queries, corpus, k=10).orderBy("rank").collect()
    ]
    assert got == want
    assert got[0] == 1  # the streamed row's self-match serves


def test_stream_ingest_is_incremental(spark, tmp_path, halves):
    """A restarted stream over the same landing dir appends nothing new
    (checkpointed file source); a new drop feeds exactly one batch."""
    embs, first, second, idx = halves
    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    part_a = second.filter(F.col("id") % 4 == 1)
    part_b = second.filter(F.col("id") % 4 == 3)
    part_a.write.mode("overwrite").parquet(land)

    mon = index_ingest.IngestMonitor()
    index_ingest.stream_ivf_ingest(
        spark, idx, index_ingest.parquet_vector_stream(spark, land),
        checkpoint_dir=ckpt, monitor=mon,
    ).awaitTermination(120)
    assert mon.n_appended == part_a.count()

    # restart with no new files: nothing re-ingested
    index_ingest.stream_ivf_ingest(
        spark, idx, index_ingest.parquet_vector_stream(spark, land),
        checkpoint_dir=ckpt, monitor=mon,
    ).awaitTermination(120)
    assert mon.n_appended == part_a.count()

    # drop a new shard: exactly its rows land
    part_b.write.mode("append").parquet(land)
    index_ingest.stream_ivf_ingest(
        spark, idx, index_ingest.parquet_vector_stream(spark, land),
        checkpoint_dir=ckpt, monitor=mon,
    ).awaitTermination(120)
    assert mon.n_appended == part_a.count() + part_b.count()
    assert spark.read.parquet(idx.path).count() == first.count() + mon.n_appended


def test_monitor_rebuild_trigger():
    mon = index_ingest.IngestMonitor()
    mon.batches.append({"n_appended": 5, "per_cluster": {0: 5}, "max_assign_l2": 1.0})
    assert not mon.needs_rebuild(baseline_l2=0.6)  # 1.0 <= 2 * 0.6
    mon.batches.append({"n_appended": 2, "per_cluster": {1: 2}, "max_assign_l2": 2.5})
    assert mon.max_assign_l2 == 2.5
    assert mon.needs_rebuild(baseline_l2=0.6)  # 2.5 > 1.2


def test_stream_ivfpq_ingest_keeps_layouts_in_lockstep(spark, tmp_path):
    """One stream feeds both serving layouts: full-precision IVF rows
    and IVFADC codes arrive together, and ivfpq_search over the
    upserted pair at full width/rerank stays exact."""
    from ydb_vector_search_simple_api_spark.operators import pq as pq_mod

    embs = load_embeddings(spark, SF_SMALL).select(
        F.col("vec_id").alias("id"), "embedding"
    )
    first = embs.filter(F.col("id") % 2 == 0)
    second = embs.filter(F.col("id") % 2 == 1)
    ivf_idx = ivf.build_ivf_index(spark, first, str(tmp_path / "ivf"), n_clusters=4)
    pq_idx = pq_mod.build_ivfpq_index(
        spark, ivf_idx, str(tmp_path / "codes"), m=8, normalize=True
    )

    land = str(tmp_path / "landing")
    second.write.mode("overwrite").parquet(land)
    mon = index_ingest.IngestMonitor()
    index_ingest.stream_ivfpq_ingest(
        spark, ivf_idx, pq_idx,
        index_ingest.parquet_vector_stream(spark, land),
        checkpoint_dir=str(tmp_path / "ckpt"),
        monitor=mon,
    ).awaitTermination(120)

    n_second = second.count()
    assert mon.n_appended == n_second
    assert sum(b["n_codes_appended"] for b in mon.batches) == n_second
    n_total = embs.count()
    assert spark.read.parquet(ivf_idx.path).count() == n_total
    codes = spark.read.parquet(pq_idx.path)
    assert codes.count() == n_total
    assert codes.filter(F.col("cluster_id").isNull()).count() == 0

    # exactness through the upserted pair (full width + full rerank)
    qrow = embs.filter(F.col("id") == 1).head()
    qvec = [float(x) for x in qrow.embedding]
    got = [
        (r.id, round(r.score, 6))
        for r in pq_mod.ivfpq_search(
            spark, ivf_idx, pq_idx, qvec, k=10, strategy="CosineSimilarity",
            search_top_size=4, rerank=n_total, round_digits=6,
        ).collect()
    ]
    from ydb_vector_search_simple_api_spark.operators.search import knn_join

    queries = spark.createDataFrame(
        [(1, qvec)], "query_id long, query_vec array<double>"
    )
    want = [
        (r.id, round(r.score, 6))
        for r in knn_join(spark, queries, embs, k=10, round_digits=6)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_parquet_vector_stream_empty_dir_needs_schema(spark, tmp_path, halves):
    """Wiring the stream before the first shard lands: schema
    inference fails with a clear error, an explicit schema works."""
    from pyspark.sql import types as T

    embs, first, second, idx = halves
    land = str(tmp_path / "empty_landing")

    with pytest.raises(ValueError, match="schema"):
        index_ingest.parquet_vector_stream(spark, land)

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    import os

    os.makedirs(land, exist_ok=True)
    src = index_ingest.parquet_vector_stream(spark, land, schema=schema)
    mon = index_ingest.IngestMonitor()
    # stream starts and drains an (empty) landing dir without error
    index_ingest.stream_ivf_ingest(
        spark, idx, src, checkpoint_dir=str(tmp_path / "ckpt"), monitor=mon
    ).awaitTermination(120)
    assert mon.n_appended == 0

    # first shard lands after wiring: picked up on the next drain
    second.write.mode("append").parquet(land)
    index_ingest.stream_ivf_ingest(
        spark, idx,
        index_ingest.parquet_vector_stream(spark, land, schema=schema),
        checkpoint_dir=str(tmp_path / "ckpt"), monitor=mon,
    ).awaitTermination(120)
    assert mon.n_appended == second.count()


def test_stream_bq_ingest_appends_and_search_is_exact(spark, tmp_path):
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.operators import bq
    from ydb_vector_search_simple_api_spark.operators.search import exact_search
    from ydb_vector_search_simple_api_spark.streaming.index_ingest import (
        parquet_vector_stream,
        stream_bq_ingest,
    )

    embs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    idx = bq.build_bq_index(
        spark, embs.filter(F.col("id") < 300), str(tmp_path / "bq"), dim=64
    )
    landing = str(tmp_path / "landing")
    embs.filter(F.col("id") >= 300).repartition(2).write.parquet(landing)
    q = stream_bq_ingest(
        spark,
        idx,
        parquet_vector_stream(spark, landing),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    idx2 = bq.load_bq_index(str(tmp_path / "bq"))
    assert idx2.n_rows == 500
    row = embs.filter(F.col("id") == 0).first()
    qv = [float(x) for x in row.embedding]
    got = bq.bq_search_rerank(
        spark, idx2, embs, qv, k=10, shortlist=None, round_digits=6
    ).collect()
    want = exact_search(spark, SF_SMALL, qv, k=10, round_digits=6).collect()
    assert [(r.id, r.score) for r in got] == [(r.id, r.score) for r in want]


def test_stream_graphann_ingest_appends_and_search_is_exact(spark, tmp_path):
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.operators import graphann as G
    from ydb_vector_search_simple_api_spark.operators.search import exact_search
    from ydb_vector_search_simple_api_spark.streaming.index_ingest import (
        parquet_vector_stream,
        stream_graphann_ingest,
    )

    embs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    idx = G.build_knn_graph(
        spark, embs.filter(F.col("id") < 300), str(tmp_path / "gann"), m=6
    )
    landing = str(tmp_path / "landing")
    embs.filter(F.col("id") >= 300).repartition(2).write.parquet(landing)
    q = stream_graphann_ingest(
        spark,
        idx,
        parquet_vector_stream(spark, landing),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    idx2 = G.load_graph_index(str(tmp_path / "gann"))
    assert idx2.n_rows == 500
    row = embs.filter(F.col("id") == 0).first()
    qv = [float(x) for x in row.embedding]
    got = G.graphann_search(
        spark, idx2, embs, qv, k=10, beam=None, round_digits=6
    ).collect()
    want = exact_search(spark, SF_SMALL, qv, k=10, round_digits=6).collect()
    assert [(r.id, r.score) for r in got] == [(r.id, r.score) for r in want]


def test_stream_tree_ingest_appends_and_search_is_exact(spark, tmp_path):
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.operators import tree as kmt
    from ydb_vector_search_simple_api_spark.operators.search import exact_search
    from ydb_vector_search_simple_api_spark.streaming.index_ingest import (
        IngestMonitor,
        parquet_vector_stream,
        stream_tree_ingest,
    )

    embs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    idx = kmt.build_kmeans_tree(
        spark, embs.filter(F.col("id") < 300), str(tmp_path / "tree"),
        n_l1=3, fanout=3,
    )
    landing = str(tmp_path / "landing")
    embs.filter(F.col("id") >= 300).repartition(2).write.parquet(landing)
    mon = IngestMonitor()
    q = stream_tree_ingest(
        spark,
        idx,
        parquet_vector_stream(spark, landing),
        checkpoint_dir=str(tmp_path / "ckpt"),
        monitor=mon,
    )
    q.awaitTermination()
    assert mon.n_appended == 200
    row = embs.filter(F.col("id") == 0).first()
    qv = [float(x) for x in row.embedding]
    got = kmt.tree_search(spark, idx, qv, k=10, round_digits=6).collect()
    want = exact_search(spark, SF_SMALL, qv, k=10, round_digits=6).collect()
    assert [(r.id, r.score) for r in got] == [(r.id, r.score) for r in want]


def test_stream_lexical_ingest_equals_offline_build(spark, tmp_path):
    """The streamed lexical generation is bit-identical to the offline
    build: same meta scalars, same per-doc scores, same top-k."""
    from ydb_vector_search_simple_api_spark.operators import ranking as RK
    from ydb_vector_search_simple_api_spark.sources.store import load_documents
    from ydb_vector_search_simple_api_spark.streaming import (
        index_ingest as II,
    )

    streamed = II.stream_lexical_ingest(
        spark, SF_SMALL, out_dir=str(tmp_path / "lexing"), n_shards=3
    )
    offline = RK.build_lexical_index(
        spark, load_documents(spark, SF_SMALL), str(tmp_path / "lexoff")
    )
    assert (streamed.k1, streamed.b, streamed.n_docs, streamed.avgdl) == (
        offline.k1, offline.b, offline.n_docs, offline.avgdl
    )
    for terms in (RK.QUERY_TERMS, ("vector",)):
        got = sorted(
            tuple(r)
            for r in RK.bm25_scores_indexed(spark, streamed, terms).collect()
        )
        want = sorted(
            tuple(r)
            for r in RK.bm25_scores_indexed(spark, offline, terms).collect()
        )
        assert got == want


def test_stream_sq_ingest_appends_and_search_is_exact(spark, tmp_path):
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.operators import sq
    from ydb_vector_search_simple_api_spark.operators.search import exact_search
    from ydb_vector_search_simple_api_spark.streaming.index_ingest import (
        parquet_vector_stream,
        stream_sq_ingest,
    )

    embs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    idx = sq.build_sq_index(
        spark, embs.filter(F.col("id") < 300), str(tmp_path / "sq")
    )
    landing = str(tmp_path / "landing")
    embs.filter(F.col("id") >= 300).repartition(2).write.parquet(landing)
    q = stream_sq_ingest(
        spark,
        idx,
        parquet_vector_stream(spark, landing),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    idx2 = sq.load_sq_index(str(tmp_path / "sq"))
    assert idx2.n_rows == 500
    row = embs.filter(F.col("id") == 0).first()
    qv = [float(x) for x in row.embedding]
    got = sq.sq_search_rerank(
        spark, idx2, embs, qv, k=10, shortlist=None, round_digits=6
    ).collect()
    want = exact_search(spark, SF_SMALL, qv, k=10, round_digits=6).collect()
    assert [(r.id, r.score) for r in got] == [(r.id, r.score) for r in want]
