"""Two-level k-means tree ANN index: hierarchical parity with the
reference's YDB ``vector_kmeans_tree`` secondary index.

Reference semantics being reproduced (SURVEY.md §2 O2/O3, §4.3):

* YDB's ``vector_kmeans_tree`` is a *hierarchical* k-means clustering
  — the index the reference searches through
  (``/root/reference/app.py:193-196``, ``env.example:20-22``); the
  single-level IVF in :mod:`.index` flattens it, this module restores
  the tree shape.
* ``PRAGMA ydb.KMeansTreeSearchTopSize = N`` (``app.py:186-191``) is
  applied PER LEVEL: the search descends the best ``N`` level-1 cells,
  then the best ``N`` leaves among their children.

Spark-native design — the tree is a *directory layout*, not a data
structure:

* **Build** (offline, three passes, all distributed):
  1. level-1 coarse clustering via ``pyspark.ml.clustering.KMeans``;
  2. per-cell level-2 clustering with a deterministic NumPy Lloyd
     iteration inside ``applyInPandas`` — cells are clustered in
     parallel, each group fits comfortably in one task (a cell at
     100 TB is corpus/n_l1; pick n_l1 so cells are task-sized). Only
     the tiny (n_l1 × fanout × dim) centroid table is collected;
  3. leaf assignment JVM->Arrow per batch (nearest level-2 centroid
     within the row's level-1 cell) and a rewrite
     ``partitionBy("l1", "l2")`` — each leaf is a physical directory.
* **Search**: the driver ranks level-1 centroids against the query
  (NumPy, tiny), keeps ``top_l1`` cells, ranks their children, keeps
  ``top_l2`` leaves, and reads the table with an OR-of-conjunctions
  over the two partition columns — Catalyst prunes to exactly those
  leaf directories. Candidates re-rank exactly (same
  TakeOrderedAndProject shape as exact_search).
* Recall contract: monotone in both widths; EXACT when both widths
  cover the whole tree (every leaf read).

Versus flat IVF at 100 TB: routing cost is ``n_l1 + top_l1·fanout``
centroid distances instead of ``n_clusters`` — the tree keeps the
routing table tiny even when the leaf count grows to 10^5+, which is
exactly why YDB shapes the index this way.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import tombstones
from ..config import DEFAULT_K, sort_descending, validate_strategy
from ..functions.distance import score_expr

_META_FILE = "_kmeans_tree.json"


@dataclass(frozen=True)
class KmeansTreeIndex:
    path: str
    n_l1: int
    fanout: int  # max level-2 children per level-1 cell
    centroids_l1: np.ndarray  # (n_l1, dim) float64
    centroids_l2: list[np.ndarray]  # [l1] -> (n_children_l1, dim)

    @property
    def n_leaves(self) -> int:
        return sum(len(c) for c in self.centroids_l2)


def _lloyd(x: np.ndarray, k: int, n_iter: int = 20) -> np.ndarray:
    """Deterministic Lloyd k-means (no RNG: init = k rows spread
    evenly through the cell's rows in their stored order). Empty
    clusters keep their previous centroid. Returns (k_eff, dim)."""
    n = len(x)
    k_eff = min(k, n)
    if k_eff == 0:
        return np.empty((0, x.shape[1]))
    init_idx = np.linspace(0, n - 1, k_eff).astype(int)
    cent = x[init_idx].astype(np.float64).copy()
    for _ in range(n_iter):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k_eff):
            m = assign == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
    return cent


def build_kmeans_tree(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    n_l1: int = 4,
    fanout: int = 4,
    id_col: str = "id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_sample_rows: int | None = None,
) -> KmeansTreeIndex:
    """Offline tree build; see module docstring for the three passes.

    ``fit_sample_rows`` bounds BOTH iterative fits to a deterministic
    hash-sample (the TakeOrdered-by-xxhash64 pattern of
    ``index.build_ivf_index``): L1 KMeans iterates over the sample
    only, and each cell's L2 Lloyd sees only the sample's rows — so
    the per-cell ``applyInPandas`` group is sample/n_l1 rows instead
    of corpus/n_l1 (the shape that actually survives 100 TB, where a
    full cell would not fit one task). The leaf-assignment pass and
    the partitioned rewrite still cover every row; full-width search
    stays exact regardless (sampling moves the recall-vs-width curve,
    never full-width correctness)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    import pandas as pd

    feats = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("embedding"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    fit_input = feats
    if fit_sample_rows is not None:
        if fit_sample_rows < n_l1 * fanout:
            raise ValueError("fit_sample_rows must be >= n_l1 * fanout")
        # persist the sample: the TakeOrdered sampling pass scans the
        # corpus once; without the persist both the L1 KMeans fit and
        # the L2 per-cell fit below would re-run that scan
        fit_input = (
            feats.orderBy(F.abs(F.xxhash64(F.col("id"))).asc(), F.col("id").asc())
            .limit(fit_sample_rows)
            .persist()
        )
    model = KMeans(k=n_l1, seed=seed, featuresCol="features").fit(fit_input)
    assigned = model.transform(feats).select(
        "id", "embedding", F.col("prediction").alias("l1")
    )

    # pass 2: per-cell level-2 centroids (parallel over cells; only
    # the tiny centroid rows come back). Fit input is the sample when
    # bounded — cells of the sample, not of the corpus.
    cent_schema = T.StructType(
        [
            T.StructField("l1", T.IntegerType()),
            T.StructField("l2", T.IntegerType()),
            T.StructField("centroid", T.ArrayType(T.DoubleType())),
        ]
    )

    def _fit_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        # stored order must be deterministic for the Lloyd init
        pdf = pdf.sort_values("id")
        x = np.stack(pdf["embedding"].map(np.asarray))
        cent = _lloyd(x, fanout)
        l1 = int(pdf["l1"].iloc[0])
        return pd.DataFrame(
            {
                "l1": l1,
                "l2": range(len(cent)),
                "centroid": [c.tolist() for c in cent],
            }
        )

    l2_fit = (
        assigned
        if fit_sample_rows is None
        else model.transform(fit_input).select(
            "id", "embedding", F.col("prediction").alias("l1")
        )
    )
    try:
        cent_rows = (
            l2_fit.select("id", "embedding", "l1")
            .groupBy("l1")
            .applyInPandas(_fit_cell, schema=cent_schema)
            .collect()
        )
    finally:
        if fit_sample_rows is not None:
            fit_input.unpersist()
    l1_centers = [
        np.asarray(c, dtype=np.float64) for c in model.clusterCenters()
    ]
    centroids_l2: list[np.ndarray] = []
    for l1 in range(n_l1):
        cell = sorted(
            ((r.l2, r.centroid) for r in cent_rows if r.l1 == l1)
        )
        if not cell:
            # a cell the (sampled) fit never saw still gets one leaf —
            # its own L1 centroid — so corpus rows assigned there are
            # routable (full-width exactness must not depend on the
            # sample covering every cell)
            centroids_l2.append(l1_centers[l1][None, :])
            continue
        centroids_l2.append(
            np.asarray([c for _, c in cell], dtype=np.float64)
        )

    # pass 3: leaf assignment (nearest L2 centroid within the row's
    # cell — membership and routing use the SAME centroids) + rewrite
    cents_bc = spark.sparkContext.broadcast(
        [c.tolist() for c in centroids_l2]
    )

    # positional returnType (module has `from __future__ import
    # annotations`; see dedup._band_vals_fn)
    def _leaf_fn(l1s, vecs):
        cents = [np.asarray(c, dtype=np.float64) for c in cents_bc.value]
        out = []
        for l1, v in zip(l1s, vecs):
            c = cents[int(l1)]
            if len(c) == 0:
                out.append(0)
                continue
            q = np.asarray(v, dtype=np.float64)
            d2 = ((c - q) ** 2).sum(axis=1)
            out.append(int(d2.argmin()))
        return pd.Series(out, dtype="int32")

    _leaf = F.pandas_udf(_leaf_fn, T.IntegerType())

    assigned.withColumn("l2", _leaf(F.col("l1"), F.col("embedding"))).select(
        "id", "embedding", "l1", "l2"
    ).write.mode("overwrite").partitionBy("l1", "l2").parquet(out_dir)

    with open(os.path.join(out_dir, _META_FILE), "w") as f:
        json.dump(
            {
                "n_l1": n_l1,
                "fanout": fanout,
                "centroids_l1": np.array(
                    [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
                ).tolist(),
                "centroids_l2": [c.tolist() for c in centroids_l2],
            },
            f,
        )
    return load_kmeans_tree(out_dir)


def load_kmeans_tree(path: str) -> KmeansTreeIndex:
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    return KmeansTreeIndex(
        path=path,
        n_l1=meta["n_l1"],
        fanout=meta["fanout"],
        centroids_l1=np.asarray(meta["centroids_l1"], dtype=np.float64),
        centroids_l2=[
            np.asarray(c, dtype=np.float64).reshape(-1, len(meta["centroids_l1"][0]))
            for c in meta["centroids_l2"]
        ],
    )


def _rank_rows(mat: np.ndarray, q: np.ndarray, strategy: str) -> np.ndarray:
    """Best-first row order of ``mat`` for query ``q`` under the
    strategy's metric family (same mapping as index._rank_centroids)."""
    if len(mat) == 0:
        return np.empty(0, dtype=int)
    if strategy in ("CosineSimilarity", "CosineDistance"):
        qn = q / (np.linalg.norm(q) or 1.0)
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return np.argsort(-(mn @ qn), kind="stable")
    if strategy == "InnerProductSimilarity":
        return np.argsort(-(mat @ q), kind="stable")
    return np.argsort(np.linalg.norm(mat - q, axis=1), kind="stable")


def route(
    index: KmeansTreeIndex,
    query_vec: Sequence[float],
    strategy: str,
    top_l1: int,
    top_l2: int,
) -> list[tuple[int, int]]:
    """Descend the tree: best ``top_l1`` cells, then best ``top_l2``
    leaves among their children. Returns (l1, l2) leaf ids,
    best-first; deterministic (stable sort, ids break ties)."""
    q = np.asarray(query_vec, dtype=np.float64)
    cells = _rank_rows(index.centroids_l1, q, strategy)[:top_l1]
    cand: list[tuple[int, int]] = []
    mats = []
    for l1 in cells:
        kids = index.centroids_l2[int(l1)]
        cand.extend((int(l1), l2) for l2 in range(len(kids)))
        mats.append(kids)
    if not cand:
        return []
    all_kids = np.concatenate(mats, axis=0)
    order = _rank_rows(all_kids, q, strategy)[:top_l2]
    return [cand[int(i)] for i in order]


def tree_search(
    spark: SparkSession,
    index: KmeansTreeIndex,
    query_vec: Sequence[float],
    k: int = DEFAULT_K,
    strategy: str = "CosineSimilarity",
    search_top_size: int | None = None,
    top_l1: int | None = None,
    top_l2: int | None = None,
    round_digits: int | None = None,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """ANN search through the tree. ``search_top_size`` mirrors YDB's
    per-level ``KMeansTreeSearchTopSize`` (used for both levels unless
    ``top_l1``/``top_l2`` override it); ``None`` = full width (exact).
    Returns (id, score).

    ``filter_ids`` (1-column ``id`` DataFrame) restricts candidates
    after leaf pruning, before scoring — same non-strict filtered-ANN
    contract as ``index.ivf_search``."""
    validate_strategy(strategy)
    for w in (search_top_size, top_l1, top_l2):
        if w is not None and w < 1:
            raise ValueError("search widths must be positive integers")
    n_leaves = index.n_leaves
    w1 = top_l1 if top_l1 is not None else (
        search_top_size if search_top_size is not None else index.n_l1
    )
    w2 = top_l2 if top_l2 is not None else (
        search_top_size if search_top_size is not None else n_leaves
    )

    leaves = route(index, query_vec, strategy, top_l1=w1, top_l2=w2)
    df = tombstones.apply_tombstones(
        spark, index.path, spark.read.parquet(index.path)
    )
    # OR of conjunctions over the two partition columns: Catalyst
    # prunes to exactly the routed leaf directories.
    cond = None
    for l1, l2 in leaves:
        c = (F.col("l1") == l1) & (F.col("l2") == l2)
        cond = c if cond is None else (cond | c)
    pruned = df.filter(cond) if cond is not None else df.limit(0)
    if filter_ids is not None:
        pruned = pruned.join(filter_ids, "id", "left_semi")

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


def tree_upsert(
    spark: SparkSession,
    index: KmeansTreeIndex,
    new_df: DataFrame,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> dict:
    """Incremental tree maintenance — the tree twin of
    ``index.ivf_upsert``: route each new vector down the FROZEN tree
    (nearest L1 centroid by L2, then nearest L2 centroid within that
    cell — the same membership rule the build's assignment pass used)
    and APPEND into the (l1, l2) leaf directory. One Arrow pass
    computes the leaf and the assignment distance; searches see new
    rows immediately (leaf pruning is directory-based).

    Centroids stay frozen; the returned stats (per-leaf counts +
    ``max_assign_l2``) feed the rebuild trigger, exactly as for the
    flat index. Rows with a mismatched vector length are dropped.
    Returns {"n_appended", "per_leaf", "max_assign_l2"}.
    """
    import pandas as pd

    c1 = index.centroids_l1
    c2 = index.centroids_l2
    dim = c1.shape[1]

    def _route_fn(vecs):
        l1s, l2s, ds = [], [], []
        for v in vecs:
            if v is None or len(v) != dim:
                l1s.append(None)
                l2s.append(None)
                ds.append(None)
                continue
            q = np.asarray(v, dtype=np.float64)
            d1 = ((c1 - q) ** 2).sum(axis=1)
            l1 = int(d1.argmin())
            kids = c2[l1]
            if len(kids) == 0:
                l2, d = 0, float(np.sqrt(d1[l1]))
            else:
                d2 = ((kids - q) ** 2).sum(axis=1)
                l2 = int(d2.argmin())
                d = float(np.sqrt(d2[l2]))
            l1s.append(l1)
            l2s.append(l2)
            ds.append(d)
        return pd.DataFrame({"l1": l1s, "l2": l2s, "d": ds})

    _route_udf = F.pandas_udf(
        _route_fn,
        T.StructType(
            [
                T.StructField("l1", T.IntegerType()),
                T.StructField("l2", T.IntegerType()),
                T.StructField("d", T.DoubleType()),
            ]
        ),
    )

    assigned = (
        new_df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("embedding"))
        .withColumn("a", _route_udf(F.col("embedding")))
        .select(
            "id", "embedding",
            F.col("a.l1").alias("l1"), F.col("a.l2").alias("l2"),
            F.col("a.d").alias("d"),
        )
        .filter(F.col("l1").isNotNull())
    )
    # one evaluation feeds both the write and the stats (ivf_upsert's
    # non-deterministic-source guard)
    assigned.persist()
    try:
        tombstones.resurrect_ids(spark, index.path, assigned, "id")
        assigned.drop("d").write.mode("append").partitionBy("l1", "l2").parquet(
            index.path
        )
        stats = (
            assigned.groupBy("l1", "l2")
            .agg(F.count(F.lit(1)).alias("n"), F.max("d").alias("max_d"))
            .collect()
        )
    finally:
        assigned.unpersist()
    per_leaf = {(int(r.l1), int(r.l2)): int(r.n) for r in stats}
    return {
        "n_appended": sum(per_leaf.values()),
        "per_leaf": per_leaf,
        "max_assign_l2": max((float(r.max_d) for r in stats), default=0.0),
    }


def tree_compact(
    spark: SparkSession,
    index: KmeansTreeIndex,
    out_dir: str,
    dedup_ids: bool = False,
) -> KmeansTreeIndex:
    """Generation-based compaction for the tree layout — the tree twin
    of ``index.ivf_compact``: rewrite append churn into a NEW immutable
    generation (~one file per leaf directory), centroids carried over,
    serving flips the pointer. ``dedup_ids=True`` keeps one row per id
    (streaming replay duplicates; costs its own exchange, same
    unconditional-dedup argument as ivf_compact)."""
    import shutil

    df = tombstones.apply_tombstones(
        spark, index.path, spark.read.parquet(index.path)
    )
    if dedup_ids:
        df = df.dropDuplicates(["id"])
    (
        df.repartition(max(1, index.n_leaves), "l1", "l2")
        .write.mode("overwrite")
        .partitionBy("l1", "l2")
        .parquet(out_dir)
    )
    shutil.copyfile(
        os.path.join(index.path, _META_FILE), os.path.join(out_dir, _META_FILE)
    )
    return load_kmeans_tree(out_dir)


def tree_knn_join_distributed(
    spark: SparkSession,
    index: KmeansTreeIndex,
    queries_df: DataFrame,
    k: int = DEFAULT_K,
    strategy: str = "CosineSimilarity",
    search_top_size: int | None = None,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    round_digits: int | None = None,
    top_l1: int | None = None,
    top_l2: int | None = None,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Batch ANN join through the tree with NO driver-side query
    collect — the tree twin of ``index.ivf_knn_join_distributed``.
    ``top_l1``/``top_l2`` override ``search_top_size`` per level, the
    same knob resolution as :func:`tree_search`. ``filter_ids``
    restricts the corpus side before the leaf join (the filtered
    batch ANN contract shared with the IVF joins).

    Routing replays :func:`route` itself inside an Arrow-batched
    pandas UDF (the tree's centroid tensors are a few KB and ship in
    the closure), so the executor-side leaf choice is bit-identical to
    the driver path, then each query explodes into its routed
    (l1, l2) leaves and the corpus joins on the two leaf columns.
    Exact (== knn_join) at full width. Queries with a mismatched
    vector length route nowhere and emit no rows.

    Output: (query_id, id, score, rank).
    """
    import pandas as pd

    validate_strategy(strategy)
    for w in (search_top_size, top_l1, top_l2):
        if w is not None and w < 1:
            raise ValueError("search widths must be positive integers")
    w1 = top_l1 if top_l1 is not None else (
        search_top_size if search_top_size is not None else index.n_l1
    )
    w2 = top_l2 if top_l2 is not None else (
        search_top_size if search_top_size is not None else index.n_leaves
    )
    dim = index.centroids_l1.shape[1]

    def _route_fn(vecs):
        out = []
        for v in vecs:
            if v is None or len(v) != dim:
                out.append([])
                continue
            out.append(
                [[l1, l2] for l1, l2 in route(index, v, strategy, w1, w2)]
            )
        return pd.Series(out)

    _route_udf = F.pandas_udf(
        _route_fn, T.ArrayType(T.ArrayType(T.IntegerType()))
    )

    assignment = (
        queries_df.select(
            F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec")
        )
        .select(
            "query_id",
            "query_vec",
            F.explode(_route_udf(F.col("query_vec"))).alias("leaf"),
        )
        .select(
            "query_id",
            "query_vec",
            F.col("leaf")[0].alias("l1"),
            F.col("leaf")[1].alias("l2"),
        )
    )

    corpus = tombstones.apply_tombstones(
        spark, index.path, spark.read.parquet(index.path)
    )
    if filter_ids is not None:
        corpus = corpus.join(filter_ids, "id", "left_semi")
    scored = corpus.join(assignment, ["l1", "l2"], "inner").withColumn(
        "score", score_expr(strategy, F.col("embedding"), F.col("query_vec"))
    )
    if round_digits is not None:
        scored = scored.withColumn(
            "score", F.round(F.col("score"), round_digits) + F.lit(0.0)
        )
    from pyspark.sql import Window

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


def tree_knn_join_routed_blocked(
    spark: SparkSession,
    index: KmeansTreeIndex,
    queries_df: DataFrame,
    k: int = DEFAULT_K,
    strategy: str = "CosineSimilarity",
    search_top_size: int | None = None,
    top_l1: int | None = None,
    top_l2: int | None = None,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Batch ANN join through the tree for the SERVING regime:
    driver routing (the per-level width contract of :func:`route`) x
    BLAS block scoring — the tree twin of
    ``index.ivf_knn_join_routed_blocked`` (same measured rationale,
    tools/scale_probe.py: the pair-join + fold formulation pays a
    per-score constant factor BLAS removes).

    The query batch is collected driver-side (serving contract);
    the scan statically prunes to the union of routed (l1, l2) leaf
    directories; each Arrow batch scores its rows against only the
    queries routed to that leaf as one matrix product. Exact candidate
    set (== knn_join) at full width; BLAS ulp note as in
    ``knn_join_blocked`` (id-set equivalence pinned in tests)."""
    import pandas as pd
    from pyspark.sql import Window

    from .search import _blas_block_scores

    validate_strategy(strategy)
    n_leaves = index.n_leaves
    w1 = top_l1 if top_l1 is not None else (
        search_top_size if search_top_size is not None else index.n_l1
    )
    w2 = top_l2 if top_l2 is not None else (
        search_top_size if search_top_size is not None else n_leaves
    )

    q_rows = queries_df.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qv")
    ).collect()
    qids = np.array([r.qid for r in q_rows])
    dim = index.centroids_l1.shape[1]
    leaf_queries: dict[tuple[int, int], list[int]] = {}
    Q = np.full((len(q_rows), dim), np.nan, dtype=np.float64)
    for qi, r in enumerate(q_rows):
        if r.qv is None or len(r.qv) != dim:
            continue
        Q[qi] = np.asarray(r.qv, dtype=np.float64)
        for leaf in route(index, Q[qi], strategy, top_l1=w1, top_l2=w2):
            leaf_queries.setdefault(leaf, []).append(qi)

    out_schema = T.StructType(
        [
            T.StructField("query_id", queries_df.schema[query_id].dataType),
            T.StructField(
                "id", spark.read.parquet(index.path).schema["id"].dataType
            ),
            T.StructField("score", T.DoubleType()),
        ]
    )
    if not leaf_queries:
        empty = out_schema.add(T.StructField("rank", T.LongType()))
        return spark.createDataFrame([], empty)

    desc = sort_descending(strategy)
    bc = spark.sparkContext.broadcast((qids, Q, leaf_queries, strategy, desc, k))

    def score_block(batches):
        qids_, Q_, lq, strat, desc_, k_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            frames = []
            for (l1, l2), grp in pdf.groupby(["l1", "l2"]):
                q_idx = lq.get((int(l1), int(l2)))
                if not q_idx:
                    continue
                ids = grp["id"].to_numpy()
                E = np.array(grp["embedding"].tolist(), dtype=np.float64)
                S = _blas_block_scores(E, Q_[q_idx], strat)
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

    cond = None
    for l1, l2 in sorted(leaf_queries):
        c = (F.col("l1") == l1) & (F.col("l2") == l2)
        cond = c if cond is None else (cond | c)
    corpus = tombstones.apply_tombstones(
        spark, index.path, spark.read.parquet(index.path).filter(cond)
    ).select("l1", "l2", "id", "embedding")
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
