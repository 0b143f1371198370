"""Retrieval-quality metrics: precision@k, recall@k, MRR, nDCG@k.

The evaluation half of a retrieval stack. Every serving-path operator
in this repo (`search.knn_join`, the IVF/tree/PQ indexes, BM25, RRF
hybrid) answers "what are the top-k"; this module answers "how GOOD
are the top-k" against a labeled relevance standard — the report a
pipeline runs before swapping a retrieval configuration, and the twin
of ``index.ann_recall_report`` (which grades pruned ANN against exact
retrieval; here the standard is external ground truth, not another
retriever).

Ground truth: the ``embeddings`` table carries an integer ``label``
column; a corpus item is *relevant* to a query iff it shares the
query's label (the standard proxy-judgment setup for labeled corpora
— same construction as ``curation.knn_classify``'s truth). The query
set is the first ``n_queries`` stored vectors (query-by-example, the
``knn_join`` convention), each evaluated leave-self-out.

Scale shape (100 TB posture):

- Retrieval is :func:`search.knn_join` — broadcast query batch,
  map-side scoring in codegen, per-query ranked window over narrow
  triples. The metrics stage touches ONLY the ``n_queries × k``
  retrieved rows plus one label-count aggregate over the corpus
  (a single map-side-combined groupBy), never the corpus cross join
  again. Swapping in a pruned index (IVF/tree) changes one line.
- The rank→gain weights (1/log2(r+1), 1/r) are a k-row literal array
  — no math on the big side, no log2 in the hot loop.

Float parity (DuckDB oracle): rank weights are PRECOMPUTED in Python
and inlined as identical 9-digit literals in both the Spark plan and
the oracle SQL, so no transcendental (log2) is ever evaluated by
either engine — the only floats that cross the gate are sums of those
literals folded in DECIMAL(28,9) and final ROUND(...,6) ratios of
exact integers. Ranks agree because both sides round the cosine to
``ROUND_DIGITS`` before the cut and tie-break by id (the established
``knn_join`` contract).

Reference note: the reference engine (app.py) has no evaluation
surface; extension scope per SURVEY.md ("beyond the reference") —
retrieval regression reports are step one of tuning any ANN serving
deployment of reference app.py:186-227's indexes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.store import load_embeddings
from .search import knn_join

#: digits for the inlined rank-weight literals (matches the repo's
#: decimal-fold convention: ROUND(x, 9) into DECIMAL(28,9) sums).
_W_DIGITS = 9


def rank_weights(k: int) -> list[str]:
    """DCG gain per rank r=1..k as exact 9-digit decimal strings:
    round(1/log2(r+1), 9). Computed once in Python so Spark and the
    oracle consume byte-identical literals."""
    return [f"{round(1.0 / math.log2(r + 1), _W_DIGITS):.9f}" for r in range(1, k + 1)]


def reciprocal_ranks(k: int) -> list[str]:
    """1/r per rank r=1..k as exact 9-digit decimal strings (MRR gains)."""
    return [f"{round(1.0 / r, _W_DIGITS):.9f}" for r in range(1, k + 1)]


def retrieval_quality(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    n_queries: int = 16,
    strategy: str = "CosineSimilarity",
    round_digits: int = 6,
) -> DataFrame:
    """Per-query retrieval metrics for exact top-k retrieval under
    ``strategy``, judged by shared-label relevance (leave-self-out).

    Output (one row per query, ordered by the driver's collect sort):
    (query_id, label, n_rel, hits, precision_at_k, recall_at_k,
    mrr, ndcg_at_k).

    - ``n_rel``: corpus items sharing the query's label (self excluded).
    - ``hits``: relevant items among the retrieved top-k.
    - ``precision_at_k`` = hits / k.
    - ``recall_at_k`` = hits / min(k, n_rel) — the @k-feasible recall
      (NULL when n_rel = 0).
    - ``mrr`` = 1 / rank of the first relevant retrieved item (0.0 when
      none retrieved are relevant).
    - ``ndcg_at_k`` = DCG / IDCG with binary gains and the standard
      1/log2(rank+1) discount (NULL when n_rel = 0).
    """
    embs = load_embeddings(spark, sf_dir).select("vec_id", "embedding", "label")
    queries_df = embs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("qlabel"),
    )
    corpus = embs.select(F.col("vec_id").alias("id"), "embedding", "label")

    retrieved = knn_join(
        spark,
        queries_df,
        corpus,
        k=k + 1,  # self lands somewhere in the top ranks; drop + re-rank
        strategy=strategy,
        round_digits=round_digits,
    )
    # leave-self-out: drop the query's own row, then close the rank gap
    # (rank' = rank - [self ranked above]); keeps exactly k rows/query.
    self_rank = retrieved.filter(F.col("query_id") == F.col("id")).select(
        "query_id", F.col("rank").alias("self_rank")
    )
    kept = (
        retrieved.filter(F.col("query_id") != F.col("id"))
        .join(F.broadcast(self_rank), "query_id", "left")
        .withColumn(
            "rank",
            F.when(
                F.col("self_rank").isNotNull() & (F.col("rank") > F.col("self_rank")),
                F.col("rank") - 1,
            ).otherwise(F.col("rank")),
        )
        .filter(F.col("rank") <= k)
        .drop("self_rank")
    )

    # relevance flag: retrieved item shares the query's label
    qlab = queries_df.select("query_id", "qlabel")
    clab = corpus.select(F.col("id"), F.col("label").alias("clabel"))
    flagged = (
        kept.join(F.broadcast(qlab), "query_id")
        .join(clab, "id")
        .withColumn("rel", (F.col("clabel") == F.col("qlabel")).cast("int"))
    )

    dcg_w = rank_weights(k)
    rr_w = reciprocal_ranks(k)
    dcg_arr = F.array(*[F.lit(w).cast("decimal(28,9)") for w in dcg_w])
    rr_arr = F.array(*[F.lit(w).cast("decimal(28,9)") for w in rr_w])

    per_q = flagged.groupBy("query_id", "qlabel").agg(
        F.sum("rel").alias("hits"),
        F.sum(
            F.when(F.col("rel") == 1, F.element_at(dcg_arr, F.col("rank").cast("int")))
            .otherwise(F.lit("0").cast("decimal(28,9)"))
        ).alias("dcg"),
        F.max(
            F.when(F.col("rel") == 1, F.element_at(rr_arr, F.col("rank").cast("int")))
        ).alias("best_rr"),
    )

    # n_rel per label from ONE corpus aggregate (map-side combine);
    # broadcast — |labels| rows.
    label_counts = corpus.groupBy(F.col("label").alias("qlabel")).agg(
        F.count("*").alias("label_n")
    )
    per_q = per_q.join(F.broadcast(label_counts), "qlabel", "left").withColumn(
        "n_rel", F.coalesce(F.col("label_n"), F.lit(0)) - F.lit(1)
    )

    # IDCG: prefix sums of the literal weight array, indexed by
    # min(k, n_rel) — a k-entry literal lookup, zero math at runtime.
    prefix = []
    acc = 0
    for w in dcg_w:
        acc += int(w.replace(".", ""))  # exact integer units of 1e-9
        prefix.append(f"{acc // 10**9}.{acc % 10**9:09d}")
    idcg_arr = F.array(*[F.lit(p).cast("decimal(28,9)") for p in prefix])
    m = F.least(F.lit(k), F.col("n_rel"))
    idcg = F.when(m >= 1, F.element_at(idcg_arr, m.cast("int")))

    return per_q.select(
        "query_id",
        F.col("qlabel").alias("label"),
        F.col("n_rel").cast("bigint").alias("n_rel"),
        F.col("hits").cast("bigint").alias("hits"),
        (F.round(F.col("hits") / F.lit(k), 6) + F.lit(0.0)).alias("precision_at_k"),
        (
            F.when(
                F.col("n_rel") >= 1,
                F.round(F.col("hits") / F.least(F.lit(k), F.col("n_rel")), 6),
            )
            + F.lit(0.0)
        ).alias("recall_at_k"),
        (
            F.round(F.coalesce(F.col("best_rr").cast("double"), F.lit(0.0)), 6)
            + F.lit(0.0)
        ).alias("mrr"),
        (
            F.round(F.col("dcg").cast("double") / idcg.cast("double"), 6) + F.lit(0.0)
        ).alias("ndcg_at_k"),
    )


def retrieval_quality_report(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    n_queries: int = 16,
    strategies: tuple[str, ...] = ("CosineSimilarity", "InnerProductSimilarity"),
) -> DataFrame:
    """Macro-averaged retrieval report, one row per strategy — the
    side-by-side a pipeline reads before switching scorers. Metrics are
    means of the per-query values (already ROUND(...,6), so the
    DECIMAL(28,9) fold is exact), NULL queries (n_rel = 0) excluded
    per-metric in the mean, matching AVG semantics in SQL."""
    frames = []
    for s in strategies:
        per_q = retrieval_quality(spark, sf_dir, k=k, n_queries=n_queries, strategy=s)
        frames.append(per_q.withColumn("system", F.lit(s)))
    allq = frames[0]
    for f2 in frames[1:]:
        allq = allq.unionByName(f2)

    def _avg(col: str):
        return (
            F.round(
                F.sum(F.col(col).cast("decimal(28,9)")).cast("double")
                / F.count(col),
                6,
            )
            + F.lit(0.0)
        ).alias(f"mean_{col}")

    return allq.groupBy("system").agg(
        F.count("*").cast("bigint").alias("n_queries"),
        _avg("precision_at_k"),
        _avg("recall_at_k"),
        _avg("mrr"),
        _avg("ndcg_at_k"),
    )
