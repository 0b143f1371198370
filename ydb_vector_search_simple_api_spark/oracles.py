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
