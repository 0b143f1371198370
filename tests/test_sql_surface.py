"""SQL-string surface: template parity, knn_* SQL UDFs, binding safety.

The surface must be result-identical to the library path
(``operators/search.py:exact_search``) — same rows, same ordering,
same double-precision scores — and must keep the library path's
physical plan shape (codegen scoring + TakeOrderedAndProject), since
the SQL UDF bodies are pure expressions Catalyst inlines.
"""

from __future__ import annotations

import pytest

from ydb_vector_search_simple_api_spark import sql_surface
from ydb_vector_search_simple_api_spark.config import STRATEGIES
from ydb_vector_search_simple_api_spark.operators.search import exact_search
from ydb_vector_search_simple_api_spark.plans.checks import (
    formatted_plan,
    uses_take_ordered,
)

from conftest import SF_SMALL


def _query_vec(spark):
    from pyspark.sql import functions as F

    row = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


@pytest.mark.parametrize("strategy", STRATEGIES)
def test_sql_search_matches_exact_search(spark, strategy):
    vec = _query_vec(spark)
    got = sql_surface.sql_search(
        spark, SF_SMALL, vec, k=7, strategy=strategy, round_digits=6
    ).collect()
    want = exact_search(
        spark, SF_SMALL, vec, k=7, strategy=strategy, round_digits=6
    ).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_sql_search_filtered_matches(spark):
    vec = _query_vec(spark)
    flt = {"vendor": "fr"}
    got = sql_surface.sql_search(
        spark, SF_SMALL, vec, k=5, filter=flt, round_digits=6
    ).collect()
    want = exact_search(
        spark, SF_SMALL, vec, k=5, filter=flt, round_digits=6
    ).collect()
    assert got == want
    assert all(r.vendor == "fr" for r in got)


def test_filter_values_are_bound_not_interpolated(spark):
    # a hostile filter value must be treated as data: zero rows, no error
    vec = _query_vec(spark)
    hostile = {"vendor": 'x" OR 1=1 --'}
    out = sql_surface.sql_search(spark, SF_SMALL, vec, k=5, filter=hostile)
    assert out.count() == 0


def test_template_text_shape():
    q = sql_surface.prepare_search_query(
        strategy="EuclideanDistance", k=3, filter={"title": "src1"}
    )
    assert "knn_euclidean_distance(embedding, :TargetEmbedding)" in q
    assert "WHERE title = :f_title" in q
    assert "ORDER BY score ASC NULLS LAST, id ASC" in q
    assert q.rstrip().endswith("LIMIT 3")
    # similarity strategies sort DESC (reference app.py:54-55)
    q2 = sql_surface.prepare_search_query(strategy="CosineSimilarity", k=4)
    assert "ORDER BY score DESC NULLS LAST" in q2


def test_template_validation():
    with pytest.raises(ValueError):
        sql_surface.prepare_search_query(strategy="DotProduct")
    with pytest.raises(ValueError):
        sql_surface.prepare_search_query(k=0)
    with pytest.raises(ValueError):
        sql_surface.prepare_search_query(k=True)
    with pytest.raises(ValueError):
        sql_surface.prepare_search_query(filter={"id": "x"})


def test_sql_udfs_inline_into_codegen_plan(spark):
    # the knn_* SQL UDF must disappear into the plan (no UDF node) and
    # the ORDER BY+LIMIT must stay a TakeOrderedAndProject
    vec = _query_vec(spark)
    df = sql_surface.sql_search(spark, SF_SMALL, vec, k=5)
    assert uses_take_ordered(df)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_semantics_dim_mismatch_and_zero_norm(spark):
    sql_surface.register_knn_functions(spark)
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [1.0, 0.0, 0.0]),  # dim mismatch -> NULL
            (2, [0.0, 0.0], [0.0, 1.0]),  # zero-norm a -> NULL cosine
            (3, [3.0, 4.0], [4.0, 3.0]),
        ],
        "id long, a array<float>, b array<float>",
    )
    df.createOrReplaceTempView("vv")
    rows = {
        r.id: r
        for r in spark.sql(
            "SELECT id, knn_cosine_similarity(a, b) AS cos,"
            "       knn_manhattan_distance(a, b) AS manh FROM vv"
        ).collect()
    }
    assert rows[1].cos is None and rows[1].manh is None
    assert rows[2].cos is None  # try_divide zero-norm guard
    assert rows[3].cos == pytest.approx(24.0 / 25.0)
    assert rows[3].manh == pytest.approx(2.0)


def test_chunk_text_udtf_matches_library_chunker(spark):
    from ydb_vector_search_simple_api_spark.operators.textual import chunk_documents

    sql_surface.register_table_functions(spark)
    spark.read.parquet(f"{SF_SMALL}/documents.parquet").createOrReplaceTempView(
        "docs_udtf"
    )
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk_text, c.n_chunk_tokens
        FROM docs_udtf d, LATERAL chunk_text(d.text, 64, 48) c
        ORDER BY d.doc_id, c.chunk_id
        """
    ).collect()
    want = (
        chunk_documents(spark, SF_SMALL, chunk_size=64, stride=48)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_narrow_template_matches_flat_and_library(spark):
    vec = _query_vec(spark)
    for flt in (None, {"vendor": "fr"}):
        narrow = sql_surface.sql_search_narrow(
            spark, SF_SMALL, vec, k=7, filter=flt, round_digits=6
        ).collect()
        flat = sql_surface.sql_search(
            spark, SF_SMALL, vec, k=7, filter=flt, round_digits=6
        ).collect()
        lib = exact_search(
            spark, SF_SMALL, vec, k=7, filter=flt, round_digits=6
        ).collect()
        assert [tuple(r) for r in narrow] == [tuple(r) for r in flat]
        assert [tuple(r) for r in narrow] == [tuple(r) for r in lib]


def test_narrow_template_plan_takes_topk_before_join(spark):
    from ydb_vector_search_simple_api_spark.plans.checks import uses_broadcast_join

    vec = _query_vec(spark)
    df = sql_surface.sql_search_narrow(spark, SF_SMALL, vec, k=5)
    plan = formatted_plan(df)
    # top-k happens on the narrow scan (TakeOrderedAndProject present)
    # and the metadata join is a broadcast of/onto k rows
    assert "TakeOrderedAndProject" in plan
    assert uses_broadcast_join(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sql_bm25_matches_library(spark):
    """The extension BM25 through the pure SQL-string surface (bound
    term params) is bit-identical to ranking.bm25_topk."""
    from ydb_vector_search_simple_api_spark import sql_surface
    from ydb_vector_search_simple_api_spark.operators import ranking as RK

    got = [
        tuple(r)
        for r in sql_surface.sql_bm25_topk(
            spark, SF_SMALL, RK.QUERY_TERMS, k=10
        ).collect()
    ]
    want = [tuple(r) for r in RK.bm25_topk(spark, SF_SMALL, k=10).collect()]
    assert got == want
    # terms are parameters: a quote in a term must bind, not break
    rows = sql_surface.sql_bm25_topk(
        spark, SF_SMALL, ["vector", "o'brien;--"], k=5
    ).collect()
    assert len(rows) == 5
