"""IVF (inverted-file) ANN index: the Spark-native replacement for the
reference's YDB ``vector_kmeans_tree`` secondary index.

Reference semantics being reproduced (SURVEY.md §2 O2/O3):

* ``FROM {table} VIEW {INDEX_NAME}`` — approximate search through a
  k-means clustering instead of a full scan
  (``/root/reference/app.py:193-196``).
* ``PRAGMA ydb.KMeansTreeSearchTopSize = N`` — how many nearest
  clusters the search reads; the recall/latency knob
  (``app.py:186-191``, default 10 at ``app.py:60``).

Spark-native design (no custom Catalyst rule needed):

* **Build** (offline job): ``pyspark.ml.clustering.KMeans`` fits
  centroids over the embedding column; every row gets a ``cluster_id``
  and the table is rewritten ``partitionBy("cluster_id")`` — the
  cluster becomes a *physical partition directory*.
* **Search**: the driver ranks the (tiny) centroid table against the
  query vector in NumPy, keeps the ``search_top_size`` nearest
  cluster ids, and reads the table with
  ``cluster_id IN (...)`` — Catalyst partition-prunes to exactly
  those directories, so scanned bytes shrink by
  ~``search_top_size / n_clusters``. Candidates are re-ranked exactly
  (same TakeOrderedAndProject shape as exact_search).
* Recall contract (SURVEY.md §4.3): recall is monotone in
  ``search_top_size`` and the search is EXACT when
  ``search_top_size >= n_clusters`` (all partitions read).

At 100 TB the build is one shuffle (the partitioned rewrite); the
per-query cost is proportional to the pruned fraction only.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tombstones
from ..config import DEFAULT_K, DEFAULT_SEARCH_TOP_SIZE, sort_descending, validate_strategy
from ..functions.distance import score_expr

_CENTROIDS_FILE = "_ivf_centroids.json"


@dataclass(frozen=True)
class IvfIndex:
    path: str
    n_clusters: int
    centroids: np.ndarray  # (n_clusters, dim) float64
    id_col: str = "id"
    vec_col: str = "embedding"


def build_ivf_index(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    n_clusters: int = 16,
    id_col: str = "id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_sample_rows: int | None = None,
) -> IvfIndex:
    """Offline index build: KMeans fit -> assign cluster_id -> rewrite
    partitioned by cluster_id -> persist centroids for driver pruning.

    ``fit_sample_rows`` bounds the ITERATIVE part of the build: KMeans
    fits on a deterministic hash-sample of that many rows (the
    TakeOrdered-by-xxhash64 pattern shared with build_pq_index) instead
    of iterating full corpus scans; the single-pass ``transform``
    assignment and the partitioned rewrite still cover every row. At
    100 TB this is the only sane shape — Lloyd iterations over the full
    corpus re-scan everything per iteration for centroids a large
    uniform sample pins down just as well (standard IVF practice, same
    argument as PQ codebook training). None (default) fits on the full
    input. Full-width search is exact regardless of where the
    centroids came from — sampling moves the recall-vs-width CURVE,
    never correctness at full width."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("embedding"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    fit_input = feats
    if fit_sample_rows is not None:
        if fit_sample_rows < n_clusters:
            raise ValueError("fit_sample_rows must be >= n_clusters")
        fit_input = (
            feats.orderBy(F.abs(F.xxhash64(F.col("id"))).asc(), F.col("id").asc())
            .limit(fit_sample_rows)
        )
    model = KMeans(k=n_clusters, seed=seed, featuresCol="features").fit(fit_input)
    assigned = (
        model.transform(feats)
        .select("id", "embedding", F.col("prediction").alias("cluster_id"))
    )
    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(out_dir)

    centroids = np.array(
        [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
    )
    with open(os.path.join(out_dir, _CENTROIDS_FILE), "w") as f:
        json.dump(
            {"n_clusters": n_clusters, "centroids": centroids.tolist()}, f
        )
    return IvfIndex(path=out_dir, n_clusters=n_clusters, centroids=centroids)


def load_ivf_index(path: str) -> IvfIndex:
    with open(os.path.join(path, _CENTROIDS_FILE)) as f:
        meta = json.load(f)
    return IvfIndex(
        path=path,
        n_clusters=meta["n_clusters"],
        centroids=np.asarray(meta["centroids"], dtype=np.float64),
    )


def _rank_centroids(index: IvfIndex, query_vec: Sequence[float], strategy: str) -> list[int]:
    """Driver-side: order cluster ids best-first for the query under the
    given strategy's metric family."""
    q = np.asarray(query_vec, dtype=np.float64)
    c = index.centroids
    if strategy in ("CosineSimilarity", "CosineDistance"):
        qn = q / (np.linalg.norm(q) or 1.0)
        cn = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        sims = cn @ qn
        order = np.argsort(-sims, kind="stable")
    elif strategy == "InnerProductSimilarity":
        order = np.argsort(-(c @ q), kind="stable")
    else:  # Euclidean / Manhattan: nearest centroids by L2
        order = np.argsort(np.linalg.norm(c - q, axis=1), kind="stable")
    return [int(i) for i in order]


def ivf_search(
    spark: SparkSession,
    index: IvfIndex,
    query_vec: Sequence[float],
    k: int = DEFAULT_K,
    strategy: str = "CosineSimilarity",
    search_top_size: int = DEFAULT_SEARCH_TOP_SIZE,
    round_digits: int | None = None,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """ANN search: prune to the search_top_size nearest clusters, then
    exact re-rank within the candidates. Returns (id, score).

    ``filter_ids`` (a 1-column ``id`` DataFrame) restricts candidates
    AFTER cluster pruning, BEFORE scoring — the non-strict filtered-ANN
    contract (config.py strict_filter_index_exclusion=False): pruning
    still shrinks the scan, the semi-join keeps only rows passing the
    filter, and recall for filtered rows is bounded by the clusters the
    width admits (exact at full width)."""
    validate_strategy(strategy)
    if search_top_size < 1:
        raise ValueError("search_top_size must be a positive integer")
    keep = _rank_centroids(index, query_vec, strategy)[:search_top_size]

    df = spark.read.parquet(index.path)
    # partition pruning: cluster_id is a partition column, so this IN
    # list prunes whole directories at planning time.
    pruned = df.filter(F.col("cluster_id").isin(keep))
    pruned = tombstones.apply_tombstones(spark, index.path, pruned)
    if filter_ids is not None:
        # Catalyst/AQE broadcasts the (small) filtered id set
        pruned = pruned.join(filter_ids, "id", "left_semi")

    # plain vector (not vector_lit) so cosine's query-norm literal fold applies
    score = score_expr(strategy, F.col("embedding"), query_vec)
    if round_digits is not None:
        score = F.round(score, round_digits) + F.lit(0.0)
    direction = (
        F.col("score").desc_nulls_last()
        if sort_descending(strategy)
        else F.col("score").asc_nulls_last()
    )
    return (
        pruned.withColumn("score", score)
        .select("id", "score")
        .orderBy(direction, F.col("id").asc())
        .limit(k)
    )


_CELL_ANGLE_CACHE: dict[str, np.ndarray] = {}


def _cell_max_angles(spark: SparkSession, index: IvfIndex) -> np.ndarray:
    """Per-cell angular radius ``max_x theta(x, centroid)`` from the
    stored layout: one scan, Arrow-batched numpy cosine per row,
    cluster-keyed MIN-cosine aggregate, cluster-count-sized collect.
    A pure function of the index files — session-cached (the
    ``_SCAN_CACHE`` contract). Zero-norm rows count as angle pi (never
    prunable past them)."""
    if index.path in _CELL_ANGLE_CACHE:
        return _CELL_ANGLE_CACHE[index.path]
    cents = index.centroids
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            norms = np.linalg.norm(V, axis=1)
            cids = pdf["cluster_id"].to_numpy()
            cos = np.einsum("ij,ij->i", V, cn[cids]) / np.where(
                norms > 0, norms, 1.0
            )
            cos = np.where(norms > 0, np.clip(cos, -1.0, 1.0), -1.0)
            yield pd.DataFrame({"cluster_id": cids, "min_cos": cos})

    rows = (
        spark.read.parquet(index.path)
        .select("cluster_id", "embedding")
        .mapInPandas(part, "cluster_id int, min_cos double")
        .groupBy("cluster_id")
        .agg(F.min("min_cos").alias("min_cos"))
        .collect()
    )
    angles = np.full(index.n_clusters, np.pi)
    for r in rows:
        angles[r.cluster_id] = float(np.arccos(np.clip(r.min_cos, -1.0, 1.0)))
    _CELL_ANGLE_CACHE[index.path] = angles
    return angles


def ivf_range_search(
    spark: SparkSession,
    index: IvfIndex,
    query_vec: Sequence[float],
    threshold: float,
    round_digits: int | None = None,
) -> DataFrame:
    """Cosine RANGE search with LOSSLESS cell pruning — the IVF twin
    of :func:`search.range_search` for the "all near-duplicates of
    this item" lookup where k is unknown.

    Pruning bound (angular triangle inequality): for any x in cell i,
    ``theta(q, x) >= theta(q, c_i) - theta_max_i``, so
    ``cos(q, x) <= cos(max(0, theta(q, c_i) - theta_max_i))``. A cell
    whose upper bound cannot clear the threshold cannot hold a
    qualifying row — skipping it never changes the answer, so this
    shares the exact range search's oracle. The comparison carries a
    ``5e-7 + 1e-9`` slack: the gate's scores are ROUND(6), so a raw
    score up to half an ulp-of-round below the threshold still rounds
    into the result set, and the arccos/cos round trip is float. Both
    slacks only ever ADMIT extra cells (pruning stays lossless).

    Scale shape: per-cell radii are one cached corpus scan
    (cluster-keyed min-cosine, cluster-count-sized collect); the
    query-time decision is pure driver arithmetic on the
    (n_clusters,) radius vector; surviving cells resolve to partition
    directories at planning time (the ivf_search pruning path); the
    threshold is a codegen predicate on the pruned scan — no shuffle.
    """
    if not np.isfinite(threshold):
        raise ValueError("threshold must be finite")
    angles = _cell_max_angles(spark, index)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    cents = index.centroids
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    theta_qc = np.arccos(np.clip(cn @ qn, -1.0, 1.0))
    ubound = np.cos(np.maximum(0.0, theta_qc - angles))
    keep = [int(i) for i in np.nonzero(ubound >= threshold - 5e-7 - 1e-9)[0]]

    pruned = spark.read.parquet(index.path).filter(F.col("cluster_id").isin(keep))
    pruned = tombstones.apply_tombstones(spark, index.path, pruned)
    from .search import _order_cols

    score = score_expr("CosineSimilarity", F.col("embedding"), list(query_vec))
    if round_digits is not None:
        score = F.round(score, round_digits) + F.lit(0.0)
    return (
        pruned.withColumn("score", score)
        .select("id", "score")
        .filter(F.col("score") >= F.lit(float(threshold)))
        .orderBy(*_order_cols("CosineSimilarity"))
    )


def ivf_knn_join_distributed(
    spark: SparkSession,
    index: IvfIndex,
    queries_df: DataFrame,
    k: int = DEFAULT_K,
    strategy: str = "CosineSimilarity",
    search_top_size: int = DEFAULT_SEARCH_TOP_SIZE,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    round_digits: int | None = None,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Batch ANN join with NO driver-side query collect: the scale
    path for the large-query-batch regime (embed 10^6+ rows, find
    neighbors for all of them), where :func:`ivf_knn_join`'s
    driver-side centroid ranking loop would bottleneck.

    ``filter_ids`` (1-column ``id`` DataFrame) restricts the CORPUS
    side before the assignment join — "neighbors among documents
    passing the filter", the batch twin of the non-strict filtered
    serving path. Exact (== filtered knn_join) at full width.

    The centroid matrix (n_clusters x dim, a few KB) ships inside an
    Arrow-batched pandas UDF that replays ``_rank_centroids``'
    arithmetic per query row — the SAME NumPy expressions, so the
    best-first cluster order (stable argsort, ties by cluster id)
    agrees with the driver-side loop bit-for-bit, not just in exact
    math. (A previous revision ranked clusters with per-centroid
    Column folds; n_clusters x dim literals made plan analysis and
    codegen the dominant cost — same lesson as srp_cosine_pairs.)
    Each query explodes into ``search_top_size`` (query_id,
    cluster_id) assignments; the corpus joins on ``cluster_id``, and
    AQE picks broadcast when the assignment side is small and a
    shuffled join when it isn't.

    Unlike :func:`ivf_knn_join`, the scan is not statically pruned to
    the union of needed partitions (the driver never sees the
    assignments) — at large batch sizes every cluster is probed anyway,
    and the join itself discards non-probed clusters. Exact
    (== knn_join) when ``search_top_size >= n_clusters``. Queries
    whose vector length differs from the index dimensionality get no
    cluster assignments and therefore no output rows.

    Output: (query_id, id, score, rank) — identical to
    :func:`ivf_knn_join`.
    """
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    validate_strategy(strategy)
    if search_top_size < 1:
        raise ValueError("search_top_size must be a positive integer")

    c = index.centroids
    dim = c.shape[1]
    if strategy in ("CosineSimilarity", "CosineDistance"):
        mat = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    else:
        mat = c
    w_eff = min(search_top_size, index.n_clusters)

    # no type hints: this module uses `from __future__ import
    # annotations` (see dedup._band_vals_fn for the full story)
    def _top_clusters_fn(vecs):
        out = []
        for v in vecs:
            if v is None or len(v) != dim:
                out.append([])
                continue
            q = np.asarray(v, dtype=np.float64)
            if strategy in ("CosineSimilarity", "CosineDistance"):
                qn = q / (np.linalg.norm(q) or 1.0)
                order = np.argsort(-(mat @ qn), kind="stable")
            elif strategy == "InnerProductSimilarity":
                order = np.argsort(-(mat @ q), kind="stable")
            else:  # Euclidean / Manhattan: nearest centroids by L2
                order = np.argsort(np.linalg.norm(mat - q, axis=1), kind="stable")
            out.append(order[:w_eff].tolist())
        return pd.Series(out)

    _top_clusters = F.pandas_udf(_top_clusters_fn, T.ArrayType(T.IntegerType()))

    assignment = (
        queries_df.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec")
        )
        .select(
            "query_id",
            "query_vec",
            F.explode(_top_clusters(F.col("query_vec"))).alias("cluster_id"),
        )
    )

    corpus = tombstones.apply_tombstones(
        spark, index.path, spark.read.parquet(index.path)
    )
    if filter_ids is not None:
        corpus = corpus.join(filter_ids, "id", "left_semi")
    scored = corpus.join(assignment, "cluster_id", "inner").withColumn(
        "score", score_expr(strategy, F.col("embedding"), F.col("query_vec"))
    )
    if round_digits is not None:
        scored = scored.withColumn(
            "score", F.round(F.col("score"), round_digits) + F.lit(0.0)
        )
    direction = (
        F.col("score").desc_nulls_last()
        if sort_descending(strategy)
        else F.col("score").asc_nulls_last()
    )
    w = Window.partitionBy("query_id").orderBy(direction, F.col("id").asc())
    return (
        scored.select("query_id", "id", "score")
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "score", "rank")
    )


def ivf_knn_join(
    spark: SparkSession,
    index: IvfIndex,
    queries_df: DataFrame,
    k: int = DEFAULT_K,
    strategy: str = "CosineSimilarity",
    search_top_size: int = DEFAULT_SEARCH_TOP_SIZE,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    round_digits: int | None = None,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Batch ANN join through the IVF index: every query is matched
    only against its ``search_top_size`` nearest clusters.
    ``filter_ids`` restricts the corpus side after partition pruning
    (same contract as :func:`ivf_knn_join_distributed`).

    The 100 TB shape for "embed a query batch, find neighbors for all
    of them": per-query candidate clusters are ranked driver-side
    against the tiny centroid table, the corpus scan is statically
    pruned to the UNION of needed cluster partitions, and the
    (query, cluster) assignment is broadcast so each corpus row is
    scored only against the queries that probe its cluster — work is
    ~``search_top_size / n_clusters`` of the exact knn_join. Exact
    (== knn_join) when ``search_top_size >= n_clusters``.

    Output: (query_id, id, score, rank); rank in the strategy's
    direction, deterministic id tie-break.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    validate_strategy(strategy)
    if search_top_size < 1:
        raise ValueError("search_top_size must be a positive integer")

    q_rows = queries_df.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec")
    ).collect()

    assign_rows = []
    for r in q_rows:
        clusters = _rank_centroids(index, r.query_vec, strategy)[:search_top_size]
        vec = [float(x) for x in r.query_vec]
        assign_rows.extend(
            {"query_id": r.query_id, "cluster_id": c, "query_vec": vec}
            for c in clusters
        )
    # query_id keeps its native type (int, string, ...) — the schema is
    # derived from the input, same as knn_join_blocked (search.py); the
    # vector is double (values are upcast driver-side above, matching
    # the double-math scoring in score_expr)
    assign_schema = T.StructType(
        [
            T.StructField("query_id", queries_df.schema[query_id].dataType),
            T.StructField("cluster_id", T.IntegerType()),
            T.StructField("query_vec", T.ArrayType(T.DoubleType())),
        ]
    )
    assignment = spark.createDataFrame(assign_rows, schema=assign_schema)
    needed = sorted({a["cluster_id"] for a in assign_rows})

    corpus = tombstones.apply_tombstones(
        spark,
        index.path,
        spark.read.parquet(index.path).filter(
            F.col("cluster_id").isin(needed)  # static partition pruning
        ),
    )
    if filter_ids is not None:
        corpus = corpus.join(filter_ids, "id", "left_semi")
    scored = corpus.join(
        F.broadcast(assignment), "cluster_id", "inner"
    ).withColumn(
        "score", score_expr(strategy, F.col("embedding"), F.col("query_vec"))
    )
    score = F.col("score")
    if round_digits is not None:
        scored = scored.withColumn(
            "score", F.round(score, round_digits) + F.lit(0.0)
        )
    direction = (
        F.col("score").desc_nulls_last()
        if sort_descending(strategy)
        else F.col("score").asc_nulls_last()
    )
    w = Window.partitionBy("query_id").orderBy(direction, F.col("id").asc())
    return (
        scored.select("query_id", "id", "score")
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "score", "rank")
    )


def ivf_upsert(
    spark: SparkSession,
    index: IvfIndex,
    new_df: DataFrame,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> dict:
    """Incremental index maintenance: route new vectors to their
    nearest existing centroid (Arrow-batched, centroid matrix in the
    UDF closure — a few KB) and APPEND them to the cluster's partition
    directory. No rebuild, no touch of existing files; searches see
    the new rows immediately because pruning is directory-based.

    Routing is nearest-centroid by L2 — consistent with the KMeans
    build-time objective — for EVERY serving strategy; inner-product
    serving still routes by L2 here (same row placement the build
    produced), so upserted rows land where a rebuild would put them.

    Centroids are deliberately NOT moved: recall for pre-existing rows
    is untouched, and the approximation only degrades as drift between
    the frozen centroids and the true cluster means grows. That drift
    is what the returned stats measure — ``max_assign_l2`` and
    per-cluster counts feed the rebuild trigger (rebuild when the
    incoming distribution stops matching the codebook, e.g. p95 assign
    distance creeping above the build-time baseline). This mirrors how
    serving systems run IVF in production: cheap appends + periodic
    offline rebuilds, not online centroid updates.

    Returns {"n_appended", "per_cluster", "max_assign_l2"}.
    """
    import pandas as pd
    from pyspark.sql import types as T

    c = index.centroids
    dim = c.shape[1]

    # one Arrow pass computes assignment AND assign-distance (no
    # second scoring stage, no per-row Python)
    def _assign_fn(vecs):
        cids, dists = [], []
        for v in vecs:
            if v is None or len(v) != dim:
                cids.append(None)
                dists.append(None)
                continue
            q = np.asarray(v, dtype=np.float64)
            d2 = ((c - q) ** 2).sum(axis=1)
            j = int(d2.argmin())
            cids.append(j)
            dists.append(float(np.sqrt(d2[j])))
        return pd.DataFrame({"cluster_id": cids, "d": dists})

    _assign = F.pandas_udf(
        _assign_fn, T.StructType(
            [
                T.StructField("cluster_id", T.IntegerType()),
                T.StructField("d", T.DoubleType()),
            ]
        )
    )

    assigned = (
        new_df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("embedding"))
        .withColumn("a", _assign(F.col("embedding")))
        .select("id", "embedding", F.col("a.cluster_id").alias("cluster_id"),
                F.col("a.d").alias("d"))
        .filter(F.col("cluster_id").isNotNull())
    )
    # persist so the write and the stats collect see ONE evaluation of
    # the assignment: for a non-deterministic new_df (sampled / re-read
    # source) a recompute could describe different rows than were written
    assigned.persist()
    try:
        # upsert-wins: a previously tombstoned id that arrives again is
        # resurrected (the tiny tombstone set is rewritten minus these
        # ids) BEFORE the append, so readers never see it flicker
        tombstones.resurrect_ids(spark, index.path, assigned, "id")
        assigned.drop("d").write.mode("append").partitionBy("cluster_id").parquet(
            index.path
        )

        stats = (
            assigned.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"), F.max("d").alias("max_d"))
            .collect()
        )
    finally:
        assigned.unpersist()
    per_cluster = {int(r.cluster_id): int(r.n) for r in stats}
    return {
        "n_appended": sum(per_cluster.values()),
        "per_cluster": per_cluster,
        "max_assign_l2": max((float(r.max_d) for r in stats), default=0.0),
    }


def ivf_compact(
    spark: SparkSession,
    index: IvfIndex,
    out_dir: str,
    files_per_cluster: int = 1,
    dedup_ids: bool = False,
) -> IvfIndex:
    """Compaction: rewrite the (append-churned) cluster layout into a
    NEW index generation with ``files_per_cluster`` files per
    directory, centroids carried over unchanged. Many small appends
    (ivf_upsert) degrade scan efficiency — each file costs a task and
    a footer read; compaction restores ~one right-sized file per
    cluster. Generations are immutable: the new directory is written
    in full, then serving flips its index pointer (no in-place file
    surgery, readers of the old generation are never disturbed —
    the standard object-store-friendly pattern).

    One shuffle co-locates each cluster's rows and bounds the file
    count. Hash-partitioning on cluster_id alone lands each cluster in
    ONE shuffle partition — so for ``files_per_cluster > 1`` a salt
    (pmod of the row id hash) spreads every cluster across exactly
    that many partitions, each of which writes one file into the
    cluster's directory. Results are identical by construction (same
    rows, same layout contract); tests pin file-count reduction +
    result equality.

    ``dedup_ids=True`` additionally keeps one row per id (replayed
    streaming batches can re-append rows — see
    streaming/index_ingest.py). This costs a SECOND exchange (the
    dedup aggregate hashes on id, the compaction repartition on
    cluster_id[+salt]) — accepted for an offline generation rewrite
    because it makes dedup unconditional: it collapses same-id rows
    even if two versions carry different vectors and were routed to
    different clusters, which any single-shuffle per-partition scheme
    keyed on (cluster_id, id) could not. Map-side partial aggregation
    still shrinks the dedup exchange to distinct ids.
    """
    if files_per_cluster < 1:
        raise ValueError("files_per_cluster must be a positive integer")
    df = tombstones.apply_tombstones(
        spark, index.path, spark.read.parquet(index.path)
    )
    if dedup_ids:
        df = df.dropDuplicates(["id"])
    if files_per_cluster == 1:
        shuffled = df.repartition(index.n_clusters, "cluster_id")
    else:
        salt = F.pmod(F.xxhash64(F.col("id")), F.lit(files_per_cluster))
        shuffled = df.withColumn("_salt", salt).repartition(
            files_per_cluster * index.n_clusters, "cluster_id", "_salt"
        ).drop("_salt")
    (
        shuffled.write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(out_dir)
    )
    with open(os.path.join(out_dir, _CENTROIDS_FILE), "w") as f:
        json.dump(
            {
                "n_clusters": index.n_clusters,
                "centroids": index.centroids.tolist(),
            },
            f,
        )
    return IvfIndex(
        path=out_dir,
        n_clusters=index.n_clusters,
        centroids=index.centroids,
        id_col=index.id_col,
        vec_col=index.vec_col,
    )


def ivf_knn_join_routed_blocked(
    spark: SparkSession,
    index: IvfIndex,
    queries_df: DataFrame,
    k: int = DEFAULT_K,
    strategy: str = "CosineSimilarity",
    search_top_size: int = DEFAULT_SEARCH_TOP_SIZE,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Batch ANN join for the SERVING regime: driver-routed cluster
    pruning x BLAS block scoring. Output (query_id, id, score, rank),
    same contract as :func:`ivf_knn_join`.

    Why this exists (measured, tools/scale_probe.py @ 4M rows x 256
    queries): the join-based formulations materialize a (corpus row x
    assigned query) pair per score and evaluate a per-element Column
    fold on each — `ivf_knn_join_distributed` took 84 s where the
    un-routed BLAS join took 7 s. This variant composes the two wins:

    * rows-read lever: queries route on the driver (one small matmul,
      same `_rank_centroids` arithmetic), and the scan statically
      prunes to the UNION of needed cluster directories — bytes read
      track `search_top_size / n_clusters` like `ivf_search`.
    * per-score lever: inside each Arrow batch, rows score against
      only the queries assigned to their cluster as ONE matrix
      product (`_blas_block_scores`, the `knn_join_blocked` kernel),
      emitting just the block's per-query top-k.

    The query batch is collected driver-side — the documented
    serving-path contract shared with `knn_join_blocked`/`pq_knn_join`
    (batches of 10^2..10^5; the no-collect `ivf_knn_join_distributed`
    remains the 10^6+ regime and the oracle path). BLAS summation
    differs from the fold expressions in the last ulp, so this variant
    pins id-set equivalence in tests instead of carrying a SQL oracle.
    Exact candidate set (== knn_join) at full width."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    validate_strategy(strategy)
    if search_top_size < 1:
        raise ValueError("search_top_size must be a positive integer")
    from .search import _blas_block_scores

    q_rows = queries_df.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qv")
    ).collect()
    if not q_rows:
        empty = T.StructType(
            [
                T.StructField("query_id", queries_df.schema[query_id].dataType),
                T.StructField("id", T.LongType()),
                T.StructField("score", T.DoubleType()),
                T.StructField("rank", T.LongType()),
            ]
        )
        return spark.createDataFrame([], empty)
    qids = np.array([r.qid for r in q_rows])
    dim = index.centroids.shape[1]
    Q = np.array(
        [r.qv if (r.qv is not None and len(r.qv) == dim) else [np.nan] * dim for r in q_rows],
        dtype=np.float64,
    )
    valid = np.array(
        [r.qv is not None and len(r.qv) == dim for r in q_rows], dtype=bool
    )
    w_eff = min(search_top_size, index.n_clusters)

    # per-query cluster routing (one small matmul) -> cluster -> query idxs
    cluster_queries: dict[int, list[int]] = {}
    for qi in np.nonzero(valid)[0]:
        for cid in _rank_centroids(index, Q[qi], strategy)[:w_eff]:
            cluster_queries.setdefault(int(cid), []).append(int(qi))
    if not cluster_queries:
        return ivf_knn_join(
            spark, index, queries_df.limit(0), k=k, strategy=strategy,
            search_top_size=search_top_size, query_id=query_id, query_vec=query_vec,
        )

    desc = sort_descending(strategy)
    bc = spark.sparkContext.broadcast((qids, Q, cluster_queries, strategy, desc, k))

    out_schema = T.StructType(
        [
            T.StructField("query_id", queries_df.schema[query_id].dataType),
            T.StructField("id", spark.read.parquet(index.path).schema["id"].dataType),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def score_block(batches):
        qids_, Q_, cq, strat, desc_, k_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            frames = []
            for cid, grp in pdf.groupby("cluster_id"):
                q_idx = cq.get(int(cid))
                if not q_idx:
                    continue
                ids = grp["id"].to_numpy()
                E = np.array(grp["embedding"].tolist(), dtype=np.float64)
                S = _blas_block_scores(E, Q_[q_idx], strat)  # (m, nq_c)
                kk = min(k_, len(ids))
                order = np.argsort(-S if desc_ else S, axis=0, kind="stable")[:kk]
                for j, qi in enumerate(q_idx):
                    sel = order[:, j]
                    frames.append(
                        pd.DataFrame(
                            {
                                "query_id": [qids_[qi]] * kk,
                                "id": ids[sel],
                                "score": S[sel, j],
                            }
                        )
                    )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    corpus = tombstones.apply_tombstones(
        spark,
        index.path,
        spark.read.parquet(index.path)
        # static partition pruning: the driver knows the needed dirs
        .filter(F.col("cluster_id").isin(sorted(cluster_queries))),
    ).select("cluster_id", "id", "embedding")
    candidates = corpus.mapInPandas(score_block, schema=out_schema).withColumn(
        "score",
        F.when(F.isnan(F.col("score")), F.lit(None).cast("double")).otherwise(
            F.col("score")
        ),
    )
    direction = (
        F.col("score").desc_nulls_last() if desc else F.col("score").asc_nulls_last()
    )
    w = Window.partitionBy("query_id").orderBy(direction, F.col("id").asc())
    return (
        candidates.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "score", "rank")
    )
