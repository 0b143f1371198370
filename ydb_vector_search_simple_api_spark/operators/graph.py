"""Iterative graph analytics over document-similarity graphs.

Public-knowledge basis: PageRank (Brin & Page 1998) with the standard
damping formulation; the Spark shape is the classic Pregel-style
DataFrame loop (join ranks to edges, aggregate contributions,
re-join), the same iterate-with-`localCheckpoint` hygiene as
``curation.dedup_components``.

Use in a data pipeline: rank documents by centrality inside a
near-duplicate cluster graph — the high-rank member is the canonical
"hub" copy worth keeping/inspecting, low-rank satellites are fringe
variants; also a building block for citation/link-graph corpus
weighting once `textual.extract_urls` feeds real edges.

Determinism contract: per-edge contributions are rounded to 12
decimals and summed as DECIMAL(28,12) — partitioning/visit-order
invariant, so results are stable across runs and cluster layouts
(the ``label_centroids`` trick applied to an iterative fixpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.store import load_documents
from . import dedup

ROUND = 6


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    small_graph_max: int = 200_000,
) -> DataFrame:
    """Fixed-iteration PageRank over a DIRECTED edge list (pass both
    directions for an undirected graph). Returns (node, rank) with
    rank rounded to 6; ranks over the graph's nodes sum to ~1.

    Scale shape per iteration: one join of the (node, rank) table onto
    the edge list + one keyed aggregation — 2 shuffles, both on node
    ids; the rank table is nodes-sized (narrow), edges are never
    mutated. ``localCheckpoint`` every iteration truncates the lineage
    (same rationale as ``dedup_components``). Degrees are computed
    once. No dangling-mass correction: every node in ``edges`` has
    out-degree >= 1 by construction of a similarity graph (undirected
    edges are passed both ways)."""
    if iters < 1:
        raise ValueError("iters must be a positive integer")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")

    # persist the edge set and the node table up front: BOTH are read
    # on every iteration (nodes re-joins contributions at line ~89),
    # and without pinning, each iteration would re-derive the full
    # upstream lineage — for a similarity graph that is the entire
    # near-dup pair generation, iters× over (measured 25 s → ~3 s at
    # sf0.1 for neardup_pagerank)
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist()
    )
    nodes = e.select(F.col("src").alias("node")).distinct().persist()
    n_nodes = nodes.count()
    if n_nodes == 0:
        e.unpersist()
        nodes.unpersist()
        return spark.createDataFrame([], "node long, rank double")
    # similarity graphs are O(duplicated docs): below ``small_graph_max``
    # edges, iterate driver-side. The arithmetic is REPLICABLE exactly
    # because the distributed path was built order-independent: per-edge
    # contributions round to 12 places (Spark's HALF_UP over the
    # shortest-repr BigDecimal — Decimal(repr(x)) matches) and sum as
    # exact decimals, so the driver loop reproduces the cluster's
    # doubles bit-for-bit (pinned in tests). Ten rounds of join+agg
    # over a persisted tiny edge set otherwise cost ~6 s of fixed
    # per-round job overhead.
    n_edges = e.count()
    if n_edges <= small_graph_max:
        from decimal import ROUND_HALF_UP, Decimal

        rows = e.collect()
        out_deg: dict = {}
        for r in rows:
            out_deg[r.src] = out_deg.get(r.src, 0) + 1
        node_list = sorted({r.src for r in rows})
        base = (1.0 - damping) / n_nodes
        rank = {v: 1.0 / n_nodes for v in node_list}
        q12 = Decimal("1e-12")
        for _ in range(iters):
            sums: dict = {}
            for r in rows:
                c = Decimal(repr(damping * rank[r.src] / out_deg[r.src]))
                c = c.quantize(q12, rounding=ROUND_HALF_UP)
                sums[r.dst] = sums.get(r.dst, Decimal(0)) + c
            rank = {
                v: base + float(sums[v]) if v in sums else base
                for v in node_list
            }
        e.unpersist()
        nodes.unpersist()
        q6 = Decimal("1e-6")
        out = [
            (
                v,
                float(
                    Decimal(repr(rank[v])).quantize(
                        q6, rounding=ROUND_HALF_UP
                    )
                )
                + 0.0,
            )
            for v in node_list
        ]
        id_type = edges.schema[src_col].dataType.simpleString()
        return spark.createDataFrame(
            out, f"node {id_type}, rank double"
        ).orderBy("node")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e_deg = e.join(deg, "src").persist()
    e_deg.count()

    base = (1.0 - damping) / n_nodes
    # n_nodes is already measured: when the rank table is demonstrably
    # small, hint broadcast for the per-iteration edge join (no shuffle
    # of the persisted edge table at all); past the threshold fall back
    # to AQE's choice. 1M (node, rank) rows ≈ 16 MB serialized — safe
    # on any driver; the hint bypasses autoBroadcastJoinThreshold, so
    # the cap must stay conservative (it is collected 2x per iteration)
    small_ranks = n_nodes <= 1_000_000
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    try:
        for it in range(iters):
            rank_side = ranks.withColumnRenamed("node", "src")
            if small_ranks:
                rank_side = F.broadcast(rank_side)
            contrib = (
                e_deg.join(rank_side, "src")
                # per-edge contribution rounded, then DECIMAL-summed:
                # the sum is exact integer arithmetic -> independent of
                # partitioning and join order
                .withColumn(
                    "c",
                    F.round(
                        F.lit(damping) * F.col("rank") / F.col("deg"), 12
                    ).cast("decimal(28,12)"),
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("c").alias("s"))
            )
            if small_ranks:
                contrib = F.broadcast(contrib)
            ranks = nodes.join(contrib, "node", "left").select(
                "node",
                (
                    F.lit(base)
                    + F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
            # checkpoint every 3rd round and on the last: per-round
            # lineage is just a join+agg over PERSISTED inputs, so a
            # short un-checkpointed run is safe — eager checkpointing
            # every round paid a full materialization barrier per
            # iteration for no correctness gain
            if it % 3 == 2 or it == iters - 1:
                ranks = ranks.localCheckpoint(eager=True)
    finally:
        # ranks is eagerly checkpointed each round, so the returned
        # frame no longer depends on any of these
        e_deg.unpersist()
        e.unpersist()
        nodes.unpersist()
    return ranks.select(
        "node", (F.round(F.col("rank"), ROUND) + F.lit(0.0)).alias("rank")
    ).orderBy("node")


def neardup_pagerank(
    spark: SparkSession, sf_dir: str, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Gate entry: PageRank over the undirected n-gram-Jaccard
    near-dup graph (``dedup.ngram_jaccard_pairs`` edges, both
    directions). Output (doc_id, rank, degree) for every doc in the
    graph — the canonical-copy centrality signal."""
    pairs = (
        dedup.ngram_jaccard_pairs(
            load_documents(spark, sf_dir), n=n, threshold=threshold
        )
        .select("id_a", "id_b")
        .persist()
    )
    edges = pairs.selectExpr("id_a AS src", "id_b AS dst").union(
        pairs.selectExpr("id_b AS src", "id_a AS dst")
    )
    pr = pagerank(spark, edges, iters=10, damping=0.85)
    # nodes-sized; checkpoint so `pairs` can be released before the
    # caller evaluates the returned frame
    deg = (
        edges.distinct()
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=True)
    )
    pairs.unpersist()
    return (
        pr.join(deg, "node")
        .select(F.col("node").alias("doc_id"), "rank", "degree")
        .orderBy("doc_id")
    )


def graph_stats(
    spark: SparkSession, sf_dir: str, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Structural audit of the near-dup graph: node/edge counts,
    triangle count, and the global clustering coefficient
    (3·triangles / wedges) — the standard check that a dedup graph has
    the clique-y structure duplicates produce (chains hint at
    threshold misconfiguration).

    Distributed triangle counting in its canonical join form
    (Suri & Vassilvitskii 2011): orient each undirected edge a<b, join
    edge (a,b) with (b,c) to enumerate wedges, then semi-join the
    closing edge (a,c). Two shuffles over the edge list; wedge fan-out
    is bounded by the near-dup cluster sizes. Wedge total derives from
    the degree table (deg·(deg−1)/2 summed), not from the wedge join.
    Output: one row (n_nodes, n_edges, n_triangles, clustering)."""
    pairs = (
        dedup.ngram_jaccard_pairs(
            load_documents(spark, sf_dir), n=n, threshold=threshold
        )
        .select(
            F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
        )
        .distinct()
        .persist()
    )
    n_edges = pairs.count()  # materializes the persist
    und = pairs.selectExpr("a AS src", "b AS dst").union(
        pairs.selectExpr("b AS src", "a AS dst")
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes_wedges = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint").alias("wedges"),
    )
    # wedges a-b-c with a<b<c… orientation a<b on both hops ensures
    # each triangle {a<b<c} is counted exactly once as (a,b)+(b,c)
    e1 = pairs.select(F.col("a"), F.col("b"))
    e2 = pairs.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedge = e1.join(e2, "b").select("a", "b", "c")
    tri = wedge.join(
        pairs.select(F.col("a"), F.col("b").alias("c")), ["a", "c"], "left_semi"
    )
    n_tri = tri.count()
    # nodes_wedges still derives from the persisted pairs — pin its
    # single row BEFORE unpersisting, or the caller's collect re-runs
    # the whole near-dup pair generation uncached
    nodes_wedges = nodes_wedges.localCheckpoint(eager=True)
    pairs.unpersist()
    return (
        nodes_wedges.select(
            "n_nodes",
            F.lit(n_edges).cast("bigint").alias("n_edges"),
            F.lit(n_tri).cast("bigint").alias("n_triangles"),
            (
                F.when(
                    F.col("wedges") > 0,
                    F.round(
                        F.lit(3.0) * F.lit(float(n_tri)) / F.col("wedges").cast("double"),
                        6,
                    )
                    + F.lit(0.0),
                ).otherwise(F.lit(0.0))
            ).alias("clustering"),
        )
    )


def connected_components_twostar(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    small_graph_max: int = 1_000_000,
) -> DataFrame:
    """Connected components by large-star/small-star alternation
    (Kiveris et al., *Connected Components in MapReduce and Beyond*,
    SoCC 2014 — public algorithm). Output (doc_id, component_id) with
    component_id = min id of the component — identical to
    ``curation.connected_components`` (shared oracle; equality
    pytest-pinned, including on graphs where hash-min cannot finish).

    Why it exists next to hash-min: hash-min needs DIAMETER rounds —
    fine for near-dup graphs (cliques/stars, diameter ~2), hopeless
    for chain-shaped graphs (reply threads, citation paths, linked
    page sequences) where the diameter is the data size. The two-star
    alternation contracts the graph toward stars and converges in
    O(log² n) rounds REGARDLESS of diameter: each round is two keyed
    aggregations + a join, every round's edge set is checkpointed
    (the PageRank lineage hygiene), and the only driver values are
    the per-round change counter and edge count.

    large-star: every neighbor v > u links to m(u) = min(N(u) ∪ u).
    small-star: every neighbor v <= u (plus u) links to
    m⁻(u) = min(N≤(u) ∪ u). Both steps preserve connectivity and
    never raise any node's reachable min; the fixpoint is a forest
    of depth-1 stars rooted at component minima.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # near-dup graphs are O(duplicated docs) — usually tiny next to
    # the corpus. Below ``small_graph_max`` edges, resolve driver-side
    # with union-find: identical output (min reachable id — exact
    # integer labels, nothing to replicate bit-wise), one bounded
    # collect. This is the SAME scale-adaptive gate the hash-min twin
    # (curation.connected_components) and pagerank already carry: the
    # alternation loop costs ~6 Spark jobs per round (two aggregations,
    # a join, a distinct, a checkpoint, two counts), which dominates
    # the entire resolution for small graphs (round-12 measurement:
    # dedup_components_twostar 3.29 s → 2.36 s isolated). The
    # distributed alternation below is unchanged and remains the
    # large-graph path (forced in pytest via small_graph_max=0).
    n_edges = edges.count()
    if n_edges <= small_graph_max:
        rows = edges.collect()
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for r in rows:
            a, b = r.u, r.v
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        comp_min: dict = {}
        for v in parent:
            rt = find(v)
            if rt not in comp_min or v < comp_min[rt]:
                comp_min[rt] = v
        out = [(v, comp_min[find(v)]) for v in parent]
        spark = pairs.sparkSession
        id_type = pairs.schema[id_a].dataType.simpleString()
        return spark.createDataFrame(
            out, f"doc_id {id_type}, component_id {id_type}"
        )

    def _sym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    for _ in range(max_iter):
        # large-star over the symmetric neighborhood
        nbr = _sym(edges)
        m = nbr.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            nbr.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over the to-smaller orientation (self included)
        small_nbr = large.union(
            large.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).filter(F.col("v") <= F.col("u"))
        m2 = small_nbr.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            small_nbr.join(m2, "u")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                        F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                    )
                ).alias("e")
            )
            .select("e.u", "e.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # fixpoint: the edge SET is unchanged (scalar counts + one
        # anti-join count reach the driver, never the edges)
        n_new = small.count()
        if n_new == edges.count():
            changed = small.exceptAll(edges).count()
            if changed == 0:
                edges = small
                break
        edges = small
    else:
        raise RuntimeError(f"no fixpoint after {max_iter} two-star rounds")

    # stars: every edge points (member -> component min); add roots
    labels = edges.select(
        F.col("u").alias("doc_id"), F.col("v").alias("component_id")
    )
    roots = edges.select(F.col("v").alias("doc_id")).distinct().withColumn(
        "component_id", F.col("doc_id")
    )
    return labels.unionByName(roots).distinct()
