"""The 5 KNN distance/similarity strategies as native Column expressions.

Reference semantics: ``Knn::{strategy}(embedding, $target) -> Float?``
applied in the SELECT list (``/root/reference/app.py:222``); the five
legal strategies are listed in ``env.example:15-17``. YDB's ``Knn::*``
return NULL on dimension mismatch (SURVEY.md §1.2); we reproduce that.

Implementation notes (scale-critical):

* Pure ``pyspark.sql.functions`` expressions over
  ``ArrayType(FloatType)`` — they stay inside whole-stage codegen; no
  Python round-trip, no UDF. On a 100 TB scan this is the difference
  between a vectorized JVM pipeline and a per-row Python hop.
* All arithmetic is promoted to DOUBLE before accumulation
  (float32 storage, float64 math) and folds left-to-right, matching
  the DuckDB oracle formulation in ``oracles.py`` bit-for-bit in
  practice; query layers round to 6 decimals before hashing.
* ``zip_with`` pads the shorter array with NULL, so any dimension
  mismatch poisons the accumulation to NULL — the YDB behavior —
  without an explicit length check.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import validate_strategy


def vector_lit(vec: Sequence[float]) -> Column:
    """A query vector as an ARRAY<DOUBLE> literal column.

    Built as ONE list literal (a single py4j call) rather than
    ``F.array(*[F.lit(x) ...])`` — the per-element form costs ~130
    driver round-trips for a 64-dim query (~160 ms of pure plan-build
    latency per request, measured; the list literal is ~28 ms). Same
    doubles, same semantics."""
    vals = [float(x) for x in vec]
    if not vals:  # F.lit([]) infers array<void>; keep array<double>
        return F.array().cast("array<double>")
    return F.lit(vals)


def _as_col(v) -> Column:
    if isinstance(v, Column):
        return v
    if isinstance(v, str):
        return F.col(v)
    return vector_lit(v)


def dot(a, b) -> Column:
    """Sum_i a[i]*b[i] in double precision, left-to-right fold."""
    a, b = _as_col(a), _as_col(b)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a) -> Column:
    return F.sqrt(dot(a, a))


def inner_product_similarity(a, b) -> Column:
    """Knn::InnerProductSimilarity — the raw dot product."""
    return dot(a, b)


def _py_l2_norm(vec: Sequence[float]) -> float:
    """Driver-side query-vector norm with the SAME IEEE op sequence as
    the Column/oracle formulation (left-to-right double fold), so
    precomputing it is bit-identical to evaluating it per row."""
    acc = 0.0
    for x in vec:
        xx = float(x)
        acc += xx * xx
    return acc**0.5


def cosine_similarity(a, b) -> Column:
    """Knn::CosineSimilarity; NULL when either vector has zero norm
    (division guard, SURVEY.md §7.4) or on dimension mismatch.

    When ``b`` is a plain Python vector (the common query-by-vector path) its
    norm is folded to a literal driver-side — Catalyst does not
    constant-fold higher-order functions, so leaving it symbolic would
    re-aggregate the literal array once per scanned row.
    """
    b_is_plain = not isinstance(b, (Column, str))
    nb = F.lit(_py_l2_norm(b)) if b_is_plain else l2_norm(_as_col(b))
    a, b = _as_col(a), _as_col(b)
    # try_divide == NULL on zero divisor: the division-by-zero guard
    # WITHOUT a CASE WHEN that would re-evaluate the norm folds (no
    # let-binding in Catalyst; HOF folds are the per-row hot cost)
    return F.try_divide(dot(a, b), l2_norm(a) * nb)


def cosine_distance(a, b) -> Column:
    """Knn::CosineDistance = 1 - CosineSimilarity."""
    return F.lit(1.0) - cosine_similarity(a, b)


def euclidean_distance(a, b) -> Column:
    """Knn::EuclideanDistance = sqrt(Sum_i (a[i]-b[i])^2)."""
    a, b = _as_col(a), _as_col(b)
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def manhattan_distance(a, b) -> Column:
    """Knn::ManhattanDistance = Sum_i |a[i]-b[i]|."""
    a, b = _as_col(a), _as_col(b)
    diffs = F.zip_with(
        a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


_STRATEGY_FN = {
    "CosineSimilarity": cosine_similarity,
    "InnerProductSimilarity": inner_product_similarity,
    "CosineDistance": cosine_distance,
    "EuclideanDistance": euclidean_distance,
    "ManhattanDistance": manhattan_distance,
}


def score_expr(strategy: str, embedding, target) -> Column:
    """``Knn::{strategy}(embedding, $TargetEmbedding)`` as a Column
    (reference ``app.py:222``)."""
    validate_strategy(strategy)
    return _STRATEGY_FN[strategy](embedding, target)
