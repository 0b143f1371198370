"""Exact vector top-k search — the reference's main query path.

Reproduces ``prepare_search_query`` + ``execute_search``
(``/root/reference/app.py:165-264``): scan -> [equality filter] ->
score with Knn strategy -> ORDER BY score -> LIMIT k, projected to
``id/title/vendor/description/score`` (``app.py:217-227``).

Physical shape (scale-critical, SURVEY.md §4):

* ``ORDER BY score LIMIT k`` compiles to ``TakeOrderedAndProject`` —
  per-partition heap top-k, driver merges k rows per partition. No
  global sort, no shuffle of the scored table. This holds at any
  corpus size.
* The score is computed over the NARROW ``embeddings`` table only
  (vec_id + embedding); the wide text columns join in AFTER the top-k,
  when only k rows remain (broadcast hash join). At 100 TB the
  alternative — scoring the joined wide table — would drag every
  document body through the scan for nothing.
* Equality filters (``app.py:168-184``) live on document columns, so
  the filtered path semi-joins the id set into the vector table before
  scoring; Catalyst/AQE broadcasts the id set when small. The filter
  itself is pushed to the Parquet scan of ``documents``.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import (
    ColumnMap,
    DEFAULT_K,
    FILTERABLE_FIELDS,
    sort_descending,
    validate_strategy,
)
from ..functions.distance import score_expr
from ..sources.store import load_documents, load_embeddings, load_store_df

# re-export for package __init__
load_store = load_store_df


def _order_cols(strategy: str, id_col: str = "id") -> list[Column]:
    """Sort by score in the strategy's direction (reference app.py:55,
    225) with a deterministic id tiebreak so the k-boundary is stable.

    Documented parity divergence: NULL scores (dimension mismatch)
    sort LAST in both directions here. YDB treats NULL as smallest, so
    the reference's ``ORDER BY score ASC`` (distance strategies) would
    surface mismatched-dimension rows FIRST. Returning garbage rows
    ahead of real neighbors is an artifact, not a contract, so this
    engine keeps nulls-last everywhere (see README parity notes)."""
    score = F.col("score")
    direction = (
        score.desc_nulls_last() if sort_descending(strategy) else score.asc_nulls_last()
    )
    return [direction, F.col(id_col).asc()]


def _validate_filter(filter: Mapping[str, str] | None) -> dict[str, str]:
    """Conjunctive equality filter over exactly title/vendor/description
    (reference app.py:168-184). Values are bound Column comparisons, not
    interpolated strings — the reference's injection bug is deliberately
    not reproduced (SURVEY.md §7.4)."""
    if not filter:
        return {}
    bad = set(filter) - set(FILTERABLE_FIELDS)
    if bad:
        raise ValueError(
            f"Unfilterable field(s) {sorted(bad)}; allowed: {FILTERABLE_FIELDS}"
        )
    return dict(filter)


def _filter_cond(flt: Mapping[str, str]) -> Column:
    """Conjunctive equality Column over already-validated filter keys."""
    cond = None
    for field, value in flt.items():
        c = F.col(field) == F.lit(value)
        cond = c if cond is None else (cond & c)
    return cond


def filtered_doc_ids(
    spark: SparkSession,
    sf_dir: str,
    filter: Mapping[str, str],
    columns: ColumnMap | None = None,
) -> DataFrame:
    """The document-id set matching a conjunctive equality filter
    (reference app.py:168-184), as a 1-column ``id`` DataFrame.

    The equality predicates are pushed to the ``documents`` Parquet
    scan; callers semi-join the result into a vector-side scan
    (exact or index-pruned) BEFORE scoring — the shared filtered-search
    building block for both the exact path and the non-strict
    filtered-ANN path (config.py strict_filter_index_exclusion=False).
    """
    m = columns or ColumnMap()
    flt = _validate_filter(filter)
    docs = load_documents(spark, sf_dir).select(
        F.col(m.id).alias("id"),
        F.col(m.title).alias("title"),
        F.col(m.vendor).alias("vendor"),
        F.col(m.description).alias("description"),
    )
    return docs.filter(_filter_cond(flt)).select("id")


def exact_search(
    spark: SparkSession,
    sf_dir: str,
    query_vec: Sequence[float],
    k: int = DEFAULT_K,
    strategy: str = "CosineSimilarity",
    filter: Mapping[str, str] | None = None,
    columns: ColumnMap | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """Top-k exact (brute-force) vector search over the store.

    Returns columns ``id, title, vendor, description, score`` —
    the reference's SELECT list (``app.py:217-222``).
    """
    validate_strategy(strategy)
    if not isinstance(k, int) or k < 1:
        raise ValueError("k must be a positive integer")  # app.py:368-370
    m = columns or ColumnMap()
    flt = _validate_filter(filter)

    embs = load_embeddings(spark, sf_dir).select(
        F.col("vec_id").alias("id"), F.col(m.embedding).alias("embedding")
    )
    docs = load_documents(spark, sf_dir).select(
        F.col(m.id).alias("id"),
        F.col(m.title).alias("title"),
        F.col(m.vendor).alias("vendor"),
        F.col(m.description).alias("description"),
    )

    if flt:
        # semi-join the (pushed-down) filtered id set into the narrow
        # vector table; Catalyst broadcasts it when small.
        ids = docs.filter(_filter_cond(flt)).select("id")
        embs = embs.join(ids, "id", "left_semi")

    # pass the PLAIN vector so cosine folds the query norm to a literal
    # driver-side (Catalyst won't constant-fold a HOF over a literal
    # array, so handing it a Column would re-fold the norm per row)
    score = score_expr(strategy, F.col("embedding"), query_vec)
    if round_digits is not None:
        # + 0.0 canonicalizes IEEE -0.0 to 0.0 (oracle bit-parity)
        score = F.round(score, round_digits) + F.lit(0.0)

    topk = (
        embs.withColumn("score", score)
        .select("id", "score")
        .orderBy(*_order_cols(strategy))
        .limit(k)
    )
    # metadata joins in AFTER top-k: the BROADCAST side is the k-row
    # top-k result, never the documents table — at 100 TB the corpus
    # metadata is the big side and must stay the streamed probe side
    # (the build side of the metadata join is plan-asserted in
    # tests/test_search.py via plans.checks.broadcast_subtree_details)
    out = F.broadcast(topk).join(docs, "id", "inner").select(
        "id", "title", "vendor", "description", "score"
    )
    return out.orderBy(*_order_cols(strategy))


def knn_join(
    spark: SparkSession,
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = DEFAULT_K,
    strategy: str = "CosineSimilarity",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "id",
    corpus_vec: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Batch k-nearest-neighbors join: for every query vector, the top-k
    corpus rows by the given strategy. Output: (query_id, id, score, rank).

    Scale shape: the query side is broadcast (a query batch is small by
    construction); scores are computed map-side inside codegen over the
    corpus scan; only (query_id, id, score) triples — never the wide
    corpus rows — enter the per-query top-k. The ranked window shuffles
    |corpus| x |queries| narrow triples; for very large corpora use the
    IVF index (operators/index.py) to prune the corpus side first.
    """
    validate_strategy(strategy)
    q = queries_df.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec")
    )
    c = corpus_df.select(
        F.col(corpus_id).alias("id"), F.col(corpus_vec).alias("embedding")
    )
    score = score_expr(strategy, F.col("embedding"), F.col("query_vec"))
    if round_digits is not None:
        score = F.round(score, round_digits) + F.lit(0.0)
    scored = c.crossJoin(F.broadcast(q)).withColumn("score", score)

    direction = (
        F.col("score").desc_nulls_last()
        if sort_descending(strategy)
        else F.col("score").asc_nulls_last()
    )
    w = Window.partitionBy("query_id").orderBy(direction, F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "score", "rank")
    )


def _blas_block_scores(E, Q, strategy):  # noqa: ANN001 — numpy arrays
    """Score one corpus block against the query matrix with BLAS —
    the shared kernel of the blocked batch joins. Returns (m, nq)
    float64; NaN marks undefined cosine (zero-norm row or query),
    surfaced as NULL by callers. Summation order differs from the
    sequential-fold Column expressions in the last ulp — blocked
    variants therefore pin equivalence in tests instead of carrying a
    SQL oracle."""
    import numpy as np

    if strategy == "InnerProductSimilarity":
        return E @ Q.T
    if strategy in ("CosineSimilarity", "CosineDistance"):
        q_norms = np.linalg.norm(Q, axis=1)
        Qn = Q / np.maximum(q_norms[:, None], 1e-300)
        e_norms = np.linalg.norm(E, axis=1)
        En = E / np.maximum(e_norms[:, None], 1e-300)
        S = En @ Qn.T
        if strategy == "CosineDistance":
            S = 1.0 - S
        S[e_norms == 0.0, :] = np.nan
        S[:, q_norms == 0.0] = np.nan
        return S
    if strategy == "EuclideanDistance":
        d2 = (
            (E * E).sum(axis=1)[:, None]
            - 2.0 * (E @ Q.T)
            + (Q * Q).sum(axis=1)[None, :]
        )
        return np.sqrt(np.maximum(d2, 0.0))
    return np.abs(E[:, None, :] - Q[None, :, :]).sum(axis=2)


def knn_join_blocked(
    spark: SparkSession,
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = DEFAULT_K,
    strategy: str = "CosineSimilarity",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Scale-path batch kNN join: NumPy-blocked scoring + two-level
    top-k. Same results as :func:`knn_join` (modulo last-ulp float
    ties), radically less shuffle.

    Stage 1 (map-side, zero shuffle): the query matrix is broadcast;
    each Arrow batch of the corpus is scored as ONE matrix product
    (BLAS) and reduced to the local top-k per query — so only
    ``n_queries x k`` candidate triples leave each partition instead
    of ``n_queries x batch_rows``.
    Stage 2: a ranked window over the surviving
    ``n_queries x n_partitions x k`` candidates — the per-group
    analogue of TakeOrderedAndProject.

    Output: (query_id, id, score, rank), score as float64 from BLAS
    (summation order differs from the sequential-fold Column
    expressions in the last ulp — hence no SQL oracle; equivalence to
    :func:`knn_join` is asserted in tests). Id column types follow the
    input schemas; zero-norm vectors under the cosine strategies score
    NULL (sorted last), matching :func:`knn_join`.
    """
    import numpy as np
    import pandas as pd

    validate_strategy(strategy)
    q_rows = (
        queries_df.select(
            F.col(query_id).alias("qid"), F.col(query_vec).alias("qv")
        )
        .collect()
    )
    qids = np.array([r.qid for r in q_rows])
    Q = np.array([r.qv for r in q_rows], dtype=np.float64)  # (nq, d)
    desc = sort_descending(strategy)
    bc = spark.sparkContext.broadcast((qids, Q, strategy, desc, k))

    import pyspark.sql.types as T

    out_schema = T.StructType(
        [
            T.StructField("query_id", queries_df.schema[query_id].dataType),
            T.StructField("id", corpus_df.schema[corpus_id].dataType),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def score_block(batches):
        qids_, Q_, strat, desc_, k_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            E = np.array(pdf["embedding"].tolist(), dtype=np.float64)  # (m, d)
            S = _blas_block_scores(E, Q_, strat)
            m = len(ids)
            kk = min(k_, m)
            order = np.argsort(-S if desc_ else S, axis=0, kind="stable")[:kk]
            rows = []
            for j, qid in enumerate(qids_):
                sel = order[:, j]
                # qid keeps its native type (int, string, ...) — the
                # output schema is derived from the input schemas
                rows.extend(zip([qid] * kk, ids[sel].tolist(), S[sel, j].tolist()))
            yield pd.DataFrame(rows, columns=["query_id", "id", "score"])

    corpus = corpus_df.select(
        F.col(corpus_id).alias("id"), F.col(corpus_vec).alias("embedding")
    )
    candidates = corpus.mapInPandas(score_block, schema=out_schema).withColumn(
        # Arrow carries NaN, not NULL, through a float64 column —
        # convert so downstream NULL semantics match knn_join's
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


def range_search(
    spark: SparkSession,
    sf_dir: str,
    query_vec: Sequence[float],
    threshold: float,
    strategy: str = "CosineSimilarity",
    max_rows: int | None = None,
    columns: ColumnMap | None = None,
    round_digits: int | None = 6,
) -> DataFrame:
    """RANGE search: every stored vector whose score clears
    ``threshold`` (>= for similarity strategies, <= for distance) —
    the radius-query twin of the top-k path, used for "all
    near-duplicates of this item" style lookups where k is unknown.
    Output (id, score), best-first.

    Scale shape: the threshold is a codegen predicate on the scored
    narrow scan — no shuffle at all when unbounded; result size is
    DATA-dependent, so ``max_rows`` (when set) bounds it with the same
    TakeOrderedAndProject heap as top-k. NULL scores (dimension
    mismatch / zero norm) never pass the threshold."""
    validate_strategy(strategy)
    m = columns or ColumnMap()
    embs = load_embeddings(spark, sf_dir).select(
        F.col("vec_id").alias("id"), F.col(m.embedding).alias("embedding")
    )
    score = score_expr(strategy, F.col("embedding"), list(query_vec))
    if round_digits is not None:
        score = F.round(score, round_digits) + F.lit(0.0)
    scored = embs.withColumn("score", score).select("id", "score")
    cond = (
        F.col("score") >= F.lit(float(threshold))
        if sort_descending(strategy)
        else F.col("score") <= F.lit(float(threshold))
    )
    out = scored.filter(cond)
    if max_rows is not None:
        return out.orderBy(*_order_cols(strategy)).limit(max_rows)
    return out.orderBy(*_order_cols(strategy))


def prefix_dim_search_rerank(
    spark: SparkSession,
    src: DataFrame,
    query_vec: Sequence[float],
    k: int = DEFAULT_K,
    strategy: str = "CosineSimilarity",
    prefix_dims: int = 16,
    shortlist: int | None = 100,
    id_col: str = "id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Matryoshka-style adaptive retrieval (Kusupati et al. 2022): a
    cheap shortlist scored on only the FIRST ``prefix_dims``
    coordinates, then an exact re-rank on the full vectors. With
    MRL-trained embeddings the leading dims carry most of the signal,
    so the shortlist pass reads/multiplies ``prefix_dims / dim`` of
    the work (e.g. 16/64 = 4× fewer flops — and with a layout that
    stores the prefix as its own column/file, 4× fewer bytes); on
    non-MRL embeddings the prefix is just a random projection and the
    recall/shortlist curve says how much that costs (pytest-pinned).

    ``shortlist=None`` (or >= corpus) keeps every row — the shortlist
    pass becomes a no-op filter and the result is EXACT top-k (the
    oracle-gated configuration shared with pq/bq/sq/opq_rerank_full).

    100 TB shape: both passes are shuffle-free codegen scans ending in
    TakeOrderedAndProject; the rerank join broadcasts the
    shortlist-sized id set. No trained state, no index build — the
    zero-maintenance member of the shortlist family.
    """
    validate_strategy(strategy)
    if not isinstance(k, int) or k < 1:
        raise ValueError("k must be a positive integer")
    if prefix_dims < 1 or prefix_dims > len(query_vec):
        raise ValueError(
            f"prefix_dims must be in [1, {len(query_vec)}], got {prefix_dims}"
        )
    vecs = src.select(F.col(id_col).alias("id"), F.col(vec_col).alias("embedding"))
    q_full = [float(x) for x in query_vec]
    n_short = None if shortlist is None else int(shortlist)
    if n_short is not None:
        q_pre = q_full[:prefix_dims]
        pre_score = score_expr(
            strategy, F.slice(F.col("embedding"), 1, prefix_dims), q_pre
        )
        cand = (
            vecs.select("id", pre_score.alias("score"))
            .orderBy(*_order_cols(strategy))
            .limit(n_short)
            .select("id")
        )
        vecs = vecs.join(F.broadcast(cand), "id", "left_semi")
    score = score_expr(strategy, F.col("embedding"), q_full)
    if round_digits is not None:
        score = F.round(score, round_digits) + F.lit(0.0)
    return (
        vecs.withColumn("score", score)
        .select("id", "score")
        .orderBy(*_order_cols(strategy))
        .limit(k)
    )
