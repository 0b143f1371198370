"""DuckDB oracle-SQL generators for the driver's correctness gate.

Every SQL string here mirrors a Spark query in ``__spark_entry__.py``.
The formulations are chosen for *bit-parity* with the Spark plans:

* float32 elements are cast to DOUBLE before any arithmetic, and sums
  fold left-to-right over the list — same as the Spark
  ``zip_with``/``aggregate`` expressions in ``functions/distance.py``;
* both sides ROUND the score to the same number of digits before the
  top-k cut, so the k-boundary is decided on identical values;
* ties at the boundary are broken by the unique id on both sides;
* computed columns carry identical aliases (driver hashes by sorted
  column name).
"""

from __future__ import annotations

ROUND_DIGITS = 6

#: id of the deterministic query vector used by all vector queries —
#: the first stored embedding (query-by-example).
QUERY_VEC_ID = 0


def _dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> x[1]::DOUBLE * x[2]::DOUBLE))"
    )


def _norm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


def score_sql(strategy: str, a: str = "e.embedding", b: str = "q.qe") -> str:
    """DuckDB expression for ``Knn::{strategy}(a, b)`` in double math."""
    if strategy == "InnerProductSimilarity":
        return _dot(a, b)
    if strategy == "CosineSimilarity":
        return (
            f"CASE WHEN {_norm(a)} * {_norm(b)} = 0 THEN NULL "
            f"ELSE {_dot(a, b)} / ({_norm(a)} * {_norm(b)}) END"
        )
    if strategy == "CosineDistance":
        return f"1.0 - ({score_sql('CosineSimilarity', a, b)})"
    if strategy == "EuclideanDistance":
        return (
            f"sqrt(list_sum(list_transform(list_zip({a}, {b}), "
            f"x -> (x[1]::DOUBLE - x[2]::DOUBLE) * (x[1]::DOUBLE - x[2]::DOUBLE))))"
        )
    if strategy == "ManhattanDistance":
        return (
            f"list_sum(list_transform(list_zip({a}, {b}), "
            f"x -> abs(x[1]::DOUBLE - x[2]::DOUBLE)))"
        )
    raise ValueError(strategy)


def _direction(strategy: str) -> str:
    return "DESC" if strategy.endswith("Similarity") else "ASC"


def topk_sql(
    strategy: str,
    k: int,
    filter_sql: str | None = None,
    round_digits: int = ROUND_DIGITS,
) -> str:
    """Oracle for exact_search: scan -> [filter] -> score -> top-k ->
    join document metadata (the reference's 5-column SELECT list)."""
    flt = f"WHERE e.vec_id IN (SELECT doc_id FROM documents WHERE {filter_sql})" if filter_sql else ""
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT e.vec_id AS id, ROUND({score_sql(strategy)}, {round_digits}) + 0.0 AS score
  FROM embeddings e, q
  {flt}
),
topk AS (
  SELECT id, score FROM scored
  ORDER BY score {_direction(strategy)} NULLS LAST, id ASC
  LIMIT {k}
)
SELECT t.id AS id, d.source AS title, d.lang AS vendor, d.text AS description, t.score AS score
FROM topk t JOIN documents d ON d.doc_id = t.id
"""


def topk_ids_sql(
    strategy: str,
    k: int,
    round_digits: int = ROUND_DIGITS,
    filter_sql: str | None = None,
) -> str:
    """Oracle for ivf_search / tree_search at full width (== exact):
    (id, score) only. ``filter_sql`` mirrors the non-strict filtered-ANN
    path (filter applied to candidates before scoring)."""
    flt = (
        f"WHERE e.vec_id IN (SELECT doc_id FROM documents WHERE {filter_sql})"
        if filter_sql
        else ""
    )
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT e.vec_id AS id, ROUND({score_sql(strategy)}, {round_digits}) + 0.0 AS score
FROM embeddings e, q
{flt}
ORDER BY score {_direction(strategy)} NULLS LAST, id ASC
LIMIT {k}
"""


def knn_join_sql(
    strategy: str,
    k: int,
    n_queries: int,
    round_digits: int = ROUND_DIGITS,
    filter_sql: str | None = None,
) -> str:
    """Oracle for knn_join: per-query top-k via a ranked window.
    ``filter_sql`` restricts the CORPUS side (the filtered batch ANN
    join contract: neighbors only among documents passing the filter)."""
    flt = (
        f"WHERE e.vec_id IN (SELECT doc_id FROM documents WHERE {filter_sql})"
        if filter_sql
        else ""
    )
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q.query_id AS query_id, e.vec_id AS id,
         ROUND({score_sql(strategy)}, {round_digits}) + 0.0 AS score
  FROM embeddings e, q
  {flt}
),
ranked AS (
  SELECT query_id, id, score,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY score {_direction(strategy)} NULLS LAST, id ASC
         ) AS rank
  FROM scored
)
SELECT query_id, id, score, rank FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------- seeded clustering

def _cluster_assign_cte(k: int) -> str:
    """Shared CTEs for the seeded-anchor assignment
    (operators/clustering.py): nearest of the first k stored vectors
    by rounded cosine distance, ties to the smaller anchor id;
    undefined cosine (zero norm) maps to the 9.0 sentinel."""
    cosdist = score_sql("CosineDistance", "e.embedding", "s.seed")
    return f"""
seeds AS (
  SELECT vec_id AS cluster_id, embedding AS seed
  FROM embeddings WHERE vec_id < {k}
),
pairs AS (
  SELECT e.vec_id AS doc_id, s.cluster_id,
         COALESCE(ROUND({cosdist}, 6) + 0.0, 9.0) AS dist
  FROM embeddings e CROSS JOIN seeds s
),
assign AS (
  SELECT doc_id, cluster_id, dist
  FROM (
    SELECT doc_id, cluster_id, dist,
           ROW_NUMBER() OVER (
             PARTITION BY doc_id ORDER BY dist ASC, cluster_id ASC
           ) AS rn
    FROM pairs
  ) WHERE rn = 1
)"""


def cluster_assign_sql(k: int = 8) -> str:
    return f"""
WITH {_cluster_assign_cte(k)}
SELECT doc_id, cluster_id, dist FROM assign ORDER BY doc_id
"""


def cluster_profile_sql(k: int = 8) -> str:
    return f"""
WITH {_cluster_assign_cte(k)},
tot AS (SELECT count(*)::DOUBLE AS n FROM assign)
SELECT cluster_id,
       count(*)::BIGINT AS n_docs,
       ROUND(count(*)::DOUBLE / (SELECT n FROM tot), 6) + 0.0 AS share,
       ROUND(SUM(CAST(dist AS DECIMAL(20,6)))::DOUBLE / count(*), 6) + 0.0
         AS avg_dist
FROM assign GROUP BY cluster_id ORDER BY cluster_id
"""


def cluster_topics_sql(k: int = 8, top_terms: int = 5) -> str:
    toks = r"string_split_regex(trim(lower(d.text)), '\s+')"
    return f"""
WITH {_cluster_assign_cte(k)},
toks AS (
  SELECT a.cluster_id, unnest({toks}) AS term
  FROM documents d JOIN assign a ON d.doc_id = a.doc_id
),
tf AS (
  SELECT cluster_id, term, count(*)::BIGINT AS tf
  FROM toks GROUP BY cluster_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT t.cluster_id, t.term, t.tf,
         ROUND(t.tf::DOUBLE * ln({float(k)} / df::DOUBLE), 6) + 0.0 AS score
  FROM tf t JOIN dfreq USING (term)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY cluster_id
    ORDER BY score DESC, tf DESC, term ASC
  ) AS rk
  FROM scored
)
SELECT cluster_id, term, tf, score, rk::BIGINT AS rk
FROM ranked WHERE rk <= {top_terms}
ORDER BY cluster_id, rk
"""


def embedding_qa_sql() -> str:
    norm = (
        "ROUND(sqrt(list_sum(list_transform(embedding, "
        "x -> x::DOUBLE * x::DOUBLE))), 6) + 0.0"
    )
    return f"""
WITH ref AS (
  SELECT len(embedding) AS dim FROM embeddings
  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
),
m AS (
  SELECT label, {norm} AS norm,
         CASE WHEN len(embedding) != (SELECT dim FROM ref)
              THEN 1 ELSE 0 END AS bad_dim
  FROM embeddings
)
SELECT label,
       count(*)::BIGINT AS n_vecs,
       SUM(bad_dim)::BIGINT AS n_dims_bad,
       SUM(CASE WHEN norm = 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_zero_norm,
       MIN(norm) AS min_norm,
       MAX(norm) AS max_norm,
       ROUND(SUM(CAST(norm AS DECIMAL(20,6)))::DOUBLE / count(*), 6) + 0.0
         AS avg_norm
FROM m GROUP BY label ORDER BY label
"""


def rag_context_sql(
    k: int = 10,
    budget_tokens: int = 256,
    strategy: str = "CosineSimilarity",
    round_digits: int = ROUND_DIGITS,
) -> str:
    """Oracle for ranking.rag_context: vector top-k, then a running
    token total in rank order with the greedy budget cut."""
    toks = r"string_split_regex(trim(lower(text)), '\s+')"
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT e.vec_id AS doc_id,
         ROUND({score_sql(strategy)}, {round_digits}) + 0.0 AS score
  FROM embeddings e, q
),
topk AS (
  SELECT doc_id, score FROM scored
  ORDER BY score {_direction(strategy)} NULLS LAST, doc_id ASC
  LIMIT {k}
),
with_tokens AS (
  SELECT t.doc_id, t.score, len({toks})::BIGINT AS n_tokens
  FROM topk t JOIN documents d ON d.doc_id = t.doc_id
),
ranked AS (
  SELECT doc_id, score, n_tokens,
         ROW_NUMBER() OVER (
           ORDER BY score {_direction(strategy)} NULLS LAST, doc_id ASC
         )::BIGINT AS rk,
         SUM(n_tokens) OVER (
           ORDER BY score {_direction(strategy)} NULLS LAST, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )::BIGINT AS cum_tokens
  FROM with_tokens
)
SELECT rk, doc_id, score, n_tokens, cum_tokens,
       (CASE WHEN cum_tokens <= {budget_tokens} THEN 1 ELSE 0 END)::INT
         AS included
FROM ranked ORDER BY rk
"""


def range_search_sql(
    threshold: float,
    strategy: str = "CosineSimilarity",
    round_digits: int = ROUND_DIGITS,
) -> str:
    """Oracle for search.range_search: every row clearing the score
    threshold (NULL scores never pass), best-first."""
    op = ">=" if strategy.endswith("Similarity") else "<="
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT e.vec_id AS id, ROUND({score_sql(strategy)}, {round_digits}) + 0.0 AS score
  FROM embeddings e, q
)
SELECT id, score FROM scored
WHERE score {op} {threshold!r}
ORDER BY score {_direction(strategy)} NULLS LAST, id ASC
"""


EMBEDDING_COVARIANCE = """
WITH x AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
consts AS (SELECT (SELECT count(*) FROM embeddings)::DOUBLE AS n_d),
means AS (
  SELECT i, SUM(CAST(ROUND(v, 9) AS DECIMAL(28,9))) AS s
  FROM x GROUP BY i
),
prods AS (
  SELECT a.i AS i, b.i AS j,
         SUM(CAST(ROUND(a.v * b.v, 9) AS DECIMAL(28,9))) AS s_xy
  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
)
SELECT p.i::BIGINT AS i, p.j::BIGINT AS j,
       ROUND((p.s_xy::DOUBLE - ma.s::DOUBLE * mb.s::DOUBLE / c.n_d) / c.n_d,
             6) + 0.0 AS cov
FROM prods p
JOIN means ma ON ma.i = p.i
JOIN means mb ON mb.i = p.j
CROSS JOIN consts c
"""


SOURCE_EMBEDDING_DRIFT = """
WITH coords AS (
  SELECT d.source,
         generate_subscripts(e.embedding, 1) - 1 AS i,
         unnest(e.embedding)::DOUBLE AS v
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
),
cent AS (
  SELECT source, i,
         SUM(CAST(ROUND(v, 9) AS DECIMAL(28,9))) AS s,
         count(*)::BIGINT AS n
  FROM coords GROUP BY 1, 2
),
cm AS (SELECT source, i, s::DOUBLE / n::DOUBLE AS m, n FROM cent),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.i,
         a.m AS ma, b.m AS mb, a.n AS n_a, b.n AS n_b
  FROM cm a JOIN cm b ON a.i = b.i AND a.source < b.source
),
agg AS (
  SELECT source_a, source_b,
         SUM(CAST(ROUND(ma * mb, 9) AS DECIMAL(28,9))) AS dot,
         SUM(CAST(ROUND(ma * ma, 9) AS DECIMAL(28,9))) AS naq,
         SUM(CAST(ROUND(mb * mb, 9) AS DECIMAL(28,9))) AS nbq,
         SUM(CAST(ROUND((ma - mb) * (ma - mb), 9) AS DECIMAL(28,9))) AS d2,
         MAX(n_a) AS n_a, MAX(n_b) AS n_b
  FROM pairs GROUP BY 1, 2
)
SELECT source_a, source_b,
       ROUND(dot::DOUBLE / (sqrt(naq::DOUBLE) * sqrt(nbq::DOUBLE)), 6) + 0.0
         AS cos_centroids,
       ROUND(sqrt(d2::DOUBLE), 6) + 0.0 AS l2_centroids,
       n_a::BIGINT AS n_a, n_b::BIGINT AS n_b
FROM agg
"""


# ------------------------------------------- retrieval-quality metrics

def _retrieval_kept_cte(k: int, n_queries: int, strategy: str) -> str:
    """Shared CTEs: exact top-k retrieval (leave-self-out with rank-gap
    closing) judged by shared-label relevance — mirrors
    ``operators/retrieval_metrics.retrieval_quality``. Rank weights are
    the SAME Python-precomputed literals the Spark plan inlines."""
    from .operators.retrieval_metrics import rank_weights, reciprocal_ranks

    dcg_w = rank_weights(k)
    rr_w = reciprocal_ranks(k)
    dcg_cases = " ".join(
        f"WHEN {r + 1} THEN CAST('{w}' AS DECIMAL(28,9))"
        for r, w in enumerate(dcg_w)
    )
    rr_cases = " ".join(
        f"WHEN {r + 1} THEN CAST('{w}' AS DECIMAL(28,9))"
        for r, w in enumerate(rr_w)
    )
    prefix, acc = [], 0
    for w in dcg_w:
        acc += int(w.replace(".", ""))
        prefix.append(f"{acc // 10**9}.{acc % 10**9:09d}")
    idcg_cases = " ".join(
        f"WHEN {r + 1} THEN CAST('{p}' AS DECIMAL(28,9))"
        for r, p in enumerate(prefix)
    )
    return f"""
q AS (
  SELECT vec_id AS query_id, embedding AS qe, label AS qlabel
  FROM embeddings WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q.query_id, q.qlabel, e.vec_id AS id, e.label AS clabel,
         ROUND({score_sql(strategy)}, {ROUND_DIGITS}) + 0.0 AS score
  FROM embeddings e, q
),
ranked AS (
  SELECT query_id, qlabel, id, clabel,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY score {_direction(strategy)} NULLS LAST, id ASC
         ) AS rank
  FROM scored
),
topk1 AS (SELECT * FROM ranked WHERE rank <= {k + 1}),
kept AS (
  SELECT r.query_id, r.qlabel, r.clabel,
         CASE WHEN s.self_rank IS NOT NULL AND r.rank > s.self_rank
              THEN r.rank - 1 ELSE r.rank END AS rank
  FROM (SELECT * FROM topk1 WHERE query_id <> id) r
  LEFT JOIN (
    SELECT query_id, rank AS self_rank FROM topk1 WHERE query_id = id
  ) s USING (query_id)
),
flagged AS (
  SELECT query_id, qlabel, rank,
         CASE WHEN clabel = qlabel THEN 1 ELSE 0 END AS rel
  FROM kept WHERE rank <= {k}
),
label_counts AS (
  SELECT label AS qlabel, count(*)::BIGINT AS label_n
  FROM embeddings GROUP BY 1
),
per_q AS (
  SELECT f.query_id, f.qlabel,
         SUM(f.rel)::BIGINT AS hits,
         SUM(CASE WHEN f.rel = 1
                  THEN CASE f.rank {dcg_cases} END
                  ELSE CAST('0' AS DECIMAL(28,9)) END) AS dcg,
         MAX(CASE WHEN f.rel = 1
                  THEN CASE f.rank {rr_cases} END END) AS best_rr
  FROM flagged f GROUP BY 1, 2
),
metrics AS (
  SELECT p.query_id, p.qlabel AS label,
         COALESCE(lc.label_n, 0) - 1 AS n_rel, p.hits,
         ROUND(p.hits / {k}.0, 6) + 0.0 AS precision_at_k,
         CASE WHEN COALESCE(lc.label_n, 0) - 1 >= 1 THEN
           ROUND(p.hits::DOUBLE
                 / LEAST({k}, COALESCE(lc.label_n, 0) - 1), 6)
         END + 0.0 AS recall_at_k,
         ROUND(COALESCE(p.best_rr::DOUBLE, 0.0), 6) + 0.0 AS mrr,
         CASE WHEN LEAST({k}, COALESCE(lc.label_n, 0) - 1) >= 1 THEN
           ROUND(p.dcg::DOUBLE /
                 (CASE LEAST({k}, COALESCE(lc.label_n, 0) - 1)
                  {idcg_cases} END)::DOUBLE, 6)
         END + 0.0 AS ndcg_at_k
  FROM per_q p LEFT JOIN label_counts lc USING (qlabel)
)"""


def retrieval_quality_sql(
    k: int, n_queries: int, strategy: str = "CosineSimilarity"
) -> str:
    return f"""
WITH {_retrieval_kept_cte(k, n_queries, strategy)}
SELECT query_id, label, n_rel::BIGINT AS n_rel, hits,
       precision_at_k, recall_at_k, mrr, ndcg_at_k
FROM metrics
"""


def retrieval_quality_report_sql(
    k: int, n_queries: int, strategies: tuple[str, ...]
) -> str:
    """Macro-average per strategy; AVG excludes NULL per-metric rows,
    matching the Spark SUM(decimal)/COUNT(col) fold."""
    parts = []
    for s in strategies:
        parts.append(
            f"""
SELECT '{s}' AS system, count(*)::BIGINT AS n_queries,
       ROUND(SUM(CAST(precision_at_k AS DECIMAL(28,9)))::DOUBLE
             / count(precision_at_k), 6) + 0.0 AS mean_precision_at_k,
       ROUND(SUM(CAST(recall_at_k AS DECIMAL(28,9)))::DOUBLE
             / count(recall_at_k), 6) + 0.0 AS mean_recall_at_k,
       ROUND(SUM(CAST(mrr AS DECIMAL(28,9)))::DOUBLE
             / count(mrr), 6) + 0.0 AS mean_mrr,
       ROUND(SUM(CAST(ndcg_at_k AS DECIMAL(28,9)))::DOUBLE
             / count(ndcg_at_k), 6) + 0.0 AS mean_ndcg_at_k
FROM (WITH {_retrieval_kept_cte(k, n_queries, s)}
      SELECT * FROM metrics)"""
        )
    return " UNION ALL ".join(parts)


# --------------------------------------------- Lloyd's k-means (exact)

def _kmeans_cte(k: int, n_iter: int) -> str:
    """Unrolled Lloyd iterations — mirrors
    ``operators/clustering.kmeans_lloyd``: squared-L2 as the same
    sequential double fold as the cosine oracles, ROUND(...,9) argmin
    with smaller-cluster ties, per-(cluster, dim) DECIMAL(28,9) mean
    re-quantized to 9 digits, empty clusters keeping their previous
    centroid."""
    sq = (
        "list_sum(list_transform(list_zip(e.embedding, c.c), "
        "x -> (x[1]::DOUBLE - x[2]) * (x[1]::DOUBLE - x[2])))"
    )
    parts = [
        f"""
c0 AS (
  SELECT vec_id AS cluster_id,
         list_transform(embedding, x -> x::DOUBLE) AS c
  FROM embeddings WHERE vec_id < {k}
)"""
    ]
    for t in range(1, n_iter + 2):
        prev = f"c{t - 1}"
        parts.append(
            f"""
s{t} AS (
  SELECT e.vec_id, e.embedding, c.cluster_id,
         ROUND({sq}, 9) + 0.0 AS d9
  FROM embeddings e CROSS JOIN {prev} c
),
a{t} AS (
  SELECT vec_id, embedding, cluster_id, d9
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY d9 ASC, cluster_id ASC) AS rk
    FROM s{t}
  ) WHERE rk = 1
)"""
        )
        if t <= n_iter:
            parts.append(
                f"""
u{t} AS (
  SELECT cluster_id, dim,
         ROUND(SUM(CAST(ROUND(v, 9) AS DECIMAL(28,9)))::DOUBLE
               / count(*), 9) AS m
  FROM (
    SELECT cluster_id, u.dim AS dim, u.v AS v
    FROM (
      SELECT cluster_id,
             unnest(list_transform(range(0, len(embedding)),
                    i -> {{'dim': i, 'v': embedding[i + 1]::DOUBLE}})) AS u
      FROM a{t}
    )
  ) GROUP BY 1, 2
),
cu{t} AS (
  SELECT cluster_id, list(m ORDER BY dim) AS c
  FROM u{t} GROUP BY 1
),
c{t} AS (
  SELECT p.cluster_id, COALESCE(u.c, p.c) AS c
  FROM {prev} p LEFT JOIN cu{t} u USING (cluster_id)
)"""
            )
    return ",".join(parts)


def kmeans_lloyd_sql(k: int = 8, n_iter: int = 3) -> str:
    """Twin of :func:`operators.clustering.kmeans_lloyd` — the final
    assignment after ``n_iter`` unrolled update steps."""
    return f"""
WITH {_kmeans_cte(k, n_iter)}
SELECT vec_id, cluster_id, ROUND(d9, 6) + 0.0 AS dist
FROM a{n_iter + 1}
"""


# ------------------------------------------------------ MMR (greedy)

def mmr_rerank_sql(k: int = 10, pool: int = 50, lam: float = 0.7) -> str:
    """Twin of :func:`operators.ranking.mmr_rerank` (cosine strategy,
    query = stored vector QUERY_VEC_ID) — the greedy selection
    UNROLLED: step t picks argmax ROUND(λ·rel − (1−λ)·max-sim-to-
    selected, 9), ties to the smaller doc_id. Pairwise sims use the
    same sequential-fold dot/(na·nb) the operator now computes, so
    every comparison sees bit-identical doubles."""
    lam_r = repr(float(lam))
    rel = f"ROUND({score_sql('CosineSimilarity')}, {ROUND_DIGITS}) + 0.0"
    sim = (
        f"CASE WHEN {_norm('a.embedding')} * {_norm('b.embedding')} = 0 "
        f"THEN 0.0 ELSE {_dot('a.embedding', 'b.embedding')} "
        f"/ ({_norm('a.embedding')} * {_norm('b.embedding')}) END"
    )
    parts = [
        f"""
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT e.vec_id AS doc_id, e.embedding, {rel} AS rel
  FROM embeddings e, q
),
cand AS MATERIALIZED (
  SELECT doc_id, embedding, rel FROM (
    SELECT *, ROW_NUMBER() OVER (
      ORDER BY rel DESC NULLS LAST, doc_id ASC) AS rk
    FROM scored
  ) WHERE rk <= {pool}
),
sim AS MATERIALIZED (
  SELECT a.doc_id AS i, b.doc_id AS j, {sim} AS s
  FROM cand a JOIN cand b ON a.doc_id <> b.doc_id
),
v1 AS MATERIALIZED (
  SELECT doc_id, ROUND({lam_r} * rel, 9) AS val FROM cand
),
sel1 AS MATERIALIZED (
  SELECT doc_id, val AS mmr, 1::BIGINT AS rk FROM v1
  ORDER BY val DESC NULLS LAST, doc_id ASC LIMIT 1
)"""
    ]
    for t in range(2, k + 1):
        prev = f"sel{t - 1}"
        parts.append(
            f"""
p{t} AS MATERIALIZED (
  SELECT c.doc_id, c.rel,
         MAX(s.s) AS penalty
  FROM cand c
  JOIN sim s ON s.i = c.doc_id
  JOIN {prev} pr ON pr.doc_id = s.j
  WHERE c.doc_id NOT IN (SELECT doc_id FROM {prev})
  GROUP BY 1, 2
),
v{t} AS MATERIALIZED (
  SELECT doc_id,
         ROUND({lam_r} * rel - (1.0 - {lam_r}) * penalty, 9) AS val
  FROM p{t}
),
sel{t} AS MATERIALIZED (
  SELECT * FROM {prev}
  UNION ALL
  SELECT doc_id, val AS mmr, {t}::BIGINT AS rk
  FROM (SELECT * FROM v{t}
        ORDER BY val DESC NULLS LAST, doc_id ASC LIMIT 1)
)"""
        )
    return "WITH " + ",".join(parts) + f"""
SELECT doc_id, mmr + 0.0 AS mmr, rk FROM sel{k}
"""


# ------------------------------------------- power iteration (PC1)

def power_iteration_sql(n_iter: int = 8) -> str:
    """Twin of :func:`operators.embstats.power_iteration_pc1` — the
    normalize(C·v) loop unrolled over the EMBEDDING_COVARIANCE cells
    (shared ROUND(...,6) inputs), DECIMAL matvec/norm folds, one sqrt
    per iteration, ROUND(...,9) re-quantized components."""
    parts = [
        f"""
cells AS MATERIALIZED ({EMBEDDING_COVARIANCE}),
sym AS MATERIALIZED (
  SELECT i, j, cov FROM cells
  UNION ALL
  SELECT j AS i, i AS j, cov FROM cells WHERE i <> j
),
v0 AS (SELECT DISTINCT i, 1.0 AS v FROM sym)"""
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"""
mv{t} AS MATERIALIZED (
  SELECT s.i,
         SUM(CAST(ROUND(s.cov * v.v, 9) AS DECIMAL(28,9)))::DOUBLE AS x
  FROM sym s JOIN v{t - 1} v ON v.i = s.j GROUP BY 1
),
nr{t} AS (
  SELECT sqrt(SUM(CAST(ROUND(x * x, 9) AS DECIMAL(28,9)))::DOUBLE) AS nr
  FROM mv{t}
),
v{t} AS MATERIALIZED (
  SELECT i, ROUND(x / nr, 9) AS v FROM mv{t}, nr{t}
)"""
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
SELECT v.i::BIGINT AS i, v.v + 0.0 AS pc1,
       (SELECT ROUND(nr, 6) + 0.0 FROM nr{n_iter}) AS eigenvalue
FROM v{n_iter} v
"""
    )
