"""Graph-ANN (k-NN graph + beam search) — the fifth index shape.

Contracts pinned here:
* full beam == exact search (ids AND scores), via the exact-rerank tail;
* full-beam traversal visits every node (connectivity augmentation);
* recall is monotone in beam width and 1.0 at full beam (O3 contract);
* the distributed frontier loop returns the same full-beam top-k as
  the driver replay;
* NN-descent refinement on the exact bootstrap is a no-op for the
  resulting top-k.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import graphann as G
from ydb_vector_search_simple_api_spark.operators.search import exact_search
from ydb_vector_search_simple_api_spark.sources.store import load_embeddings

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def gann(spark):
    out = tempfile.mkdtemp(prefix="svs_test_gann_")
    shutil.rmtree(out, ignore_errors=True)
    embs = load_embeddings(spark, SF_SMALL).select(
        F.col("vec_id").alias("id"), "embedding"
    )
    idx = G.build_knn_graph(spark, embs, out, m=8)
    yield idx
    shutil.rmtree(out, ignore_errors=True)


def _qvec(spark):
    row = (
        load_embeddings(spark, SF_SMALL)
        .filter(F.col("vec_id") == 3)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row.embedding]


def _src(spark):
    return load_embeddings(spark, SF_SMALL).select(
        F.col("vec_id").alias("id"), "embedding"
    )


def test_full_beam_matches_exact(spark, gann):
    q = _qvec(spark)
    got = G.graphann_search(
        spark, gann, _src(spark), q, k=10, strategy="CosineSimilarity",
        beam=None, round_digits=6,
    ).collect()
    want = exact_search(
        spark, SF_SMALL, q, k=10, strategy="CosineSimilarity", round_digits=6
    ).collect()
    assert [(r.id, r.score) for r in got] == [(r.id, r.score) for r in want]


def test_full_beam_visits_every_node(spark, gann):
    graph = G._load_graph_numpy(spark, gann)
    _, n_visited = G._beam_search_driver(
        graph, gann, _qvec(spark), "CosineSimilarity", beam=None
    )
    assert n_visited == gann.n_rows


def test_recall_monotone_in_beam(spark, gann):
    q = _qvec(spark)
    exact_ids = {
        r.id
        for r in exact_search(
            spark, SF_SMALL, q, k=10, strategy="CosineSimilarity"
        ).collect()
    }
    last = -1.0
    for beam in (16, 64, gann.n_rows):
        ids = {
            r.id
            for r in G.graphann_search(
                spark, gann, _src(spark), q, k=10,
                strategy="CosineSimilarity", beam=beam,
            ).collect()
        }
        recall = len(ids & exact_ids) / len(exact_ids)
        assert recall >= last - 1e-9
        last = recall
    assert last == 1.0  # exact at full beam


def test_distributed_matches_driver_replay(spark, gann):
    q = _qvec(spark)
    cand_d, vis_d = G._beam_search_distributed(
        spark, gann, q, "CosineSimilarity", beam=None
    )
    graph = G._load_graph_numpy(spark, gann)
    cand_r, vis_r = G._beam_search_driver(
        graph, gann, q, "CosineSimilarity", beam=None
    )
    assert vis_d == vis_r == gann.n_rows
    assert sorted(int(c) for c in cand_d) == sorted(int(c) for c in cand_r)


def test_beam_strategies_all_serve(spark, gann):
    q = _qvec(spark)
    for strat in (
        "CosineSimilarity", "InnerProductSimilarity", "CosineDistance",
        "EuclideanDistance", "ManhattanDistance",
    ):
        got = G.graphann_search(
            spark, gann, _src(spark), q, k=5, strategy=strat, beam=None,
            round_digits=6,
        ).collect()
        want = exact_search(
            spark, SF_SMALL, q, k=5, strategy=strat, round_digits=6
        ).collect()
        assert [(r.id, r.score) for r in got] == [(r.id, r.score) for r in want]


def test_nn_descent_noop_on_exact_bootstrap(spark):
    out = tempfile.mkdtemp(prefix="svs_test_gann_refine_")
    shutil.rmtree(out, ignore_errors=True)
    try:
        embs = load_embeddings(spark, SF_SMALL).select(
            F.col("vec_id").alias("id"), "embedding"
        )
        idx = G.build_knn_graph(spark, embs, out, m=4, refine_iters=1)
        q = _qvec(spark)
        got = G.graphann_search(
            spark, idx, embs, q, k=10, strategy="CosineSimilarity",
            beam=None, round_digits=6,
        ).collect()
        want = exact_search(
            spark, SF_SMALL, q, k=10, strategy="CosineSimilarity",
            round_digits=6,
        ).collect()
        assert [(r.id, r.score) for r in got] == [(r.id, r.score) for r in want]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_filter_ids_restrict_after_traversal(spark, gann):
    q = _qvec(spark)
    flt = spark.createDataFrame([(i,) for i in range(0, 500, 2)], ["id"])
    got = G.graphann_search(
        spark, gann, _src(spark), q, k=5, strategy="CosineSimilarity",
        beam=None, round_digits=6, filter_ids=flt,
    ).collect()
    assert all(r.id % 2 == 0 for r in got)
    assert len(got) == 5
