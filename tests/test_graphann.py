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


def test_upsert_then_compact_preserves_search(spark):
    """LSM maintenance contract: after graphann_upsert the full-beam
    search is exact over the GROWN corpus (new nodes reachable via
    delta reverse edges — the connectivity assertion still passes);
    graphann_compact folds the delta into a new generation with
    identical results; finite beam can actually find an inserted
    near-duplicate of the query."""
    import numpy as np

    base_out = tempfile.mkdtemp(prefix="svs_test_gann_up_")
    compact_out = tempfile.mkdtemp(prefix="svs_test_gann_cp_")
    shutil.rmtree(base_out, ignore_errors=True)
    shutil.rmtree(compact_out, ignore_errors=True)
    try:
        embs = load_embeddings(spark, SF_SMALL).select(
            F.col("vec_id").alias("id"), "embedding"
        ).filter(F.col("id") < 400)
        idx = G.build_knn_graph(spark, embs, base_out, m=6)
        q = _qvec(spark)
        # new batch: ids 10000+, one of them = the query vector itself
        new_rows = [(10000, q)] + [
            (10001 + i, [float(x) + 0.5 * (i + 1) for x in q]) for i in range(3)
        ]
        new_df = spark.createDataFrame(new_rows, ["id", "embedding"])
        idx2 = G.graphann_upsert(spark, idx, new_df)
        assert idx2.n_rows == 404

        grown = embs.unionByName(new_df)
        got = G.graphann_search(
            spark, idx2, grown, q, k=5, strategy="CosineSimilarity",
            beam=None, round_digits=6,
        ).collect()
        # exact over the grown corpus (brute force in numpy for truth)
        rows = grown.collect()
        qn = np.asarray(q)
        sims = []
        for r in rows:
            v = np.asarray(r.embedding, dtype=float)
            denom = np.linalg.norm(v) * np.linalg.norm(qn)
            sims.append((round(float(v @ qn / denom), 6), r.id))
        want_ids = [i for _, i in sorted(sims, key=lambda t: (-t[0], t[1]))[:5]]
        assert [r.id for r in got] == want_ids
        # the inserted exact duplicate scores 1.0 (id 3 — the query's
        # own stored row — wins the tie by the deterministic id order)
        assert {r.id for r in got if r.score == 1.0} == {3, 10000}

        # finite beam reaches the inserted near-dup through delta links
        got_b = G.graphann_search(
            spark, idx2, grown, q, k=5, strategy="CosineSimilarity", beam=32,
        ).collect()
        assert 10000 in {r.id for r in got_b}

        idx3 = G.graphann_compact(spark, idx2, compact_out)
        assert idx3.n_rows == 404
        assert not os.path.isdir(os.path.join(compact_out, "delta"))
        got_c = G.graphann_search(
            spark, idx3, grown, q, k=5, strategy="CosineSimilarity",
            beam=None, round_digits=6,
        ).collect()
        assert [(r.id, r.score) for r in got_c] == [(r.id, r.score) for r in got]
    finally:
        shutil.rmtree(base_out, ignore_errors=True)
        shutil.rmtree(compact_out, ignore_errors=True)


def test_filter_ids_restrict_after_traversal(spark, gann):
    q = _qvec(spark)
    flt = spark.createDataFrame([(i,) for i in range(0, 500, 2)], ["id"])
    got = G.graphann_search(
        spark, gann, _src(spark), q, k=5, strategy="CosineSimilarity",
        beam=None, round_digits=6, filter_ids=flt,
    ).collect()
    assert all(r.id % 2 == 0 for r in got)
    assert len(got) == 5
