"""PageRank: numpy replay on a non-regular graph, fixpoint property on
the regular dup-clique graph, determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import graph

from conftest import SF_SMALL


def _numpy_pagerank(edges, iters=10, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    deg = np.zeros(N)
    for u, _ in edges:
        deg[idx[u]] += 1
    r = np.full(N, 1.0 / N)
    for _ in range(iters):
        nxt = np.full(N, (1.0 - d) / N)
        for u, v in edges:
            nxt[idx[v]] += round(d * r[idx[u]] / deg[idx[u]], 12)
        r = nxt
    return {n: round(r[idx[n]], 6) for n in nodes}


def test_pagerank_star_graph_matches_numpy(spark):
    # star: center 0 <-> leaves 1..4 (non-regular: center deg 4, leaves 1)
    und = [(0, i) for i in range(1, 5)]
    edges = und + [(v, u) for u, v in und]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in graph.pagerank(spark, edf, iters=10).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=2e-6)
    # center dominates
    assert got[0] == max(got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_neardup_pagerank_regular_components_are_uniform(spark):
    out = graph.neardup_pagerank(spark, SF_SMALL).collect()
    assert len(out) > 0
    n = len(out)
    # the synthetic dup graph is a union of cliques (all members of a
    # dup group pair with each other) => regular components => the
    # uniform vector is the exact fixpoint
    for r in out:
        assert r.rank == pytest.approx(1.0 / n, abs=2e-6)
        assert r.degree >= 1
    # determinism
    again = graph.neardup_pagerank(spark, SF_SMALL).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_pagerank_validation(spark):
    edf = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        graph.pagerank(spark, edf, iters=0)
    with pytest.raises(ValueError):
        graph.pagerank(spark, edf, damping=1.0)


def test_graph_stats_on_synthetic_triangle(spark):
    """A 3-clique plus a dangling edge: 1 triangle, clustering =
    3*1/ (wedges: deg 2,2,3,1 -> 1+1+3+0 = 5) = 0.6."""
    from pyspark.sql import functions as F
    from ydb_vector_search_simple_api_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "id_a long, id_b long"
    )
    # replicate graph_stats' core on an injected edge list
    pairs = edges.select(
        F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
    ).distinct()
    e2 = pairs.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedge = pairs.join(e2, "b").select("a", "b", "c")
    tri = wedge.join(
        pairs.select(F.col("a"), F.col("b").alias("c")), ["a", "c"], "left_semi"
    )
    assert tri.count() == 1

    und = pairs.selectExpr("a AS src", "b AS dst").union(
        pairs.selectExpr("b AS src", "a AS dst")
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint").alias("w")
    ).collect()[0].w
    assert wedges == 5
    assert abs(3.0 * 1 / wedges - 0.6) < 1e-12


def test_graph_stats_corpus_row(spark):
    from ydb_vector_search_simple_api_spark.operators import graph as G

    row = G.graph_stats(spark, SF_SMALL).collect()[0]
    assert row.n_nodes > 0 and row.n_edges > 0
    assert 0.0 <= row.clustering <= 1.0
    # near-dup graphs are clique-heavy: triangles should exist
    assert row.n_triangles >= 0


def test_pagerank_driver_path_matches_distributed(spark):
    """small_graph_max=0 forces the distributed loop; the driver
    union-replay must reproduce its doubles bit-for-bit (the
    order-independent round-12/decimal-sum arithmetic is the shared
    contract)."""
    from ydb_vector_search_simple_api_spark.operators.graph import pagerank

    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3), (1, 3), (3, 1)],
        "src long, dst long",
    )
    fast = {(r.node, r.rank) for r in pagerank(spark, pairs).collect()}
    dist = {
        (r.node, r.rank)
        for r in pagerank(spark, pairs, small_graph_max=0).collect()
    }
    assert fast == dist


def test_twostar_components_equal_hashmin_on_neardup_graph(spark):
    """Identical (doc_id, component_id) output to the union-find/
    hash-min resolver on the real near-dup pair graph."""
    from ydb_vector_search_simple_api_spark.operators import dedup
    from ydb_vector_search_simple_api_spark.operators.curation import (
        connected_components,
    )
    from ydb_vector_search_simple_api_spark.operators.graph import (
        connected_components_twostar,
    )
    from ydb_vector_search_simple_api_spark.sources.store import load_documents

    pairs = dedup.ngram_jaccard_pairs(
        load_documents(spark, SF_SMALL), n=3, threshold=0.8
    ).localCheckpoint(eager=True)
    a = sorted(tuple(r) for r in connected_components(pairs).collect())
    b = sorted(tuple(r) for r in connected_components_twostar(pairs).collect())
    assert a == b and len(a) > 0
    # the round-12 small-graph driver path must equal the distributed
    # alternation exactly (same contract as pagerank's fast path)
    c = sorted(
        tuple(r)
        for r in connected_components_twostar(
            pairs, small_graph_max=0
        ).collect()
    )
    assert a == c


def test_twostar_converges_on_long_path_in_logsquared_rounds(spark):
    """The case two-star exists for: a 300-edge PATH graph has
    diameter 300 — hash-min label propagation needs 300 rounds (it
    would blow its max_iter), the two-star alternation finishes
    within 12 and still labels every vertex with the path minimum."""
    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["id_a", "id_b"]
    )
    from ydb_vector_search_simple_api_spark.operators.graph import (
        connected_components_twostar,
    )

    got = {
        r.doc_id: r.component_id
        # small_graph_max=0 forces the DISTRIBUTED alternation — this
        # test exists to prove the O(log² n)-round convergence, which
        # the small-graph driver path would bypass
        for r in connected_components_twostar(
            pairs, max_iter=12, small_graph_max=0
        ).collect()
    }
    assert got == {i: 0 for i in range(n + 1)}


def test_twostar_multiple_components_and_empty(spark):
    from ydb_vector_search_simple_api_spark.operators.graph import (
        connected_components_twostar,
    )

    pairs = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21), (40, 40)], ["id_a", "id_b"]
    )
    got = {
        r.doc_id: r.component_id
        for r in connected_components_twostar(pairs).collect()
    }
    # self-loop (40,40) is dropped; isolated vertices carry no label
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}
    got_dist = {
        r.doc_id: r.component_id
        for r in connected_components_twostar(
            pairs, small_graph_max=0
        ).collect()
    }
    assert got_dist == got

    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components_twostar(empty).count() == 0
    assert (
        connected_components_twostar(empty, small_graph_max=0).count() == 0
    )
