"""Property tests for the 5 distance strategies (SURVEY.md §5.2 item 4)."""

from __future__ import annotations

import math

import pytest

from ydb_vector_search_simple_api_spark.functions import distance as D


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


VEC_A = [1.0, 2.0, 3.0]
VEC_B = [-4.0, 5.5, 0.25]


def test_dot(spark):
    got = _eval(spark, D.dot(D.vector_lit(VEC_A), D.vector_lit(VEC_B)))
    assert got == pytest.approx(1 * -4 + 2 * 5.5 + 3 * 0.25)


def test_cosine_self_similarity_is_one(spark):
    got = _eval(spark, D.cosine_similarity(D.vector_lit(VEC_A), D.vector_lit(VEC_A)))
    assert got == pytest.approx(1.0)


def test_cosine_distance_is_one_minus_similarity(spark):
    sim = _eval(spark, D.cosine_similarity(D.vector_lit(VEC_A), D.vector_lit(VEC_B)))
    dist = _eval(spark, D.cosine_distance(D.vector_lit(VEC_A), D.vector_lit(VEC_B)))
    assert dist == pytest.approx(1.0 - sim)


def test_symmetry(spark):
    for fn in (D.cosine_similarity, D.euclidean_distance, D.manhattan_distance):
        ab = _eval(spark, fn(D.vector_lit(VEC_A), D.vector_lit(VEC_B)))
        ba = _eval(spark, fn(D.vector_lit(VEC_B), D.vector_lit(VEC_A)))
        assert ab == pytest.approx(ba)


def test_euclidean_manhattan_values(spark):
    eu = _eval(spark, D.euclidean_distance(D.vector_lit(VEC_A), D.vector_lit(VEC_B)))
    ma = _eval(spark, D.manhattan_distance(D.vector_lit(VEC_A), D.vector_lit(VEC_B)))
    assert eu == pytest.approx(math.sqrt(25 + 12.25 + 7.5625))
    assert ma == pytest.approx(5 + 3.5 + 2.75)


def test_self_distance_zero(spark):
    for fn in (D.euclidean_distance, D.manhattan_distance):
        assert _eval(spark, fn(D.vector_lit(VEC_A), D.vector_lit(VEC_A))) == 0.0


def test_dimension_mismatch_is_null(spark):
    """YDB Knn::* return NULL on dim mismatch (SURVEY.md §1.2)."""
    for fn in (
        D.cosine_similarity,
        D.inner_product_similarity,
        D.euclidean_distance,
        D.manhattan_distance,
    ):
        got = _eval(spark, fn(D.vector_lit([1.0, 2.0]), D.vector_lit([1.0, 2.0, 3.0])))
        assert got is None


def test_zero_norm_cosine_is_null(spark):
    got = _eval(spark, D.cosine_similarity(D.vector_lit([0.0, 0.0]), D.vector_lit(VEC_A)))
    assert got is None


def test_inner_product_equals_dot(spark):
    ip = _eval(
        spark, D.inner_product_similarity(D.vector_lit(VEC_A), D.vector_lit(VEC_B))
    )
    assert ip == pytest.approx(1 * -4 + 2 * 5.5 + 3 * 0.25)
