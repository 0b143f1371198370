"""DSIR importance resampling (operators/dsir.py)."""

from __future__ import annotations

import math

import numpy as np
from conftest import SF_SMALL


def _weights(spark):
    from ydb_vector_search_simple_api_spark.operators.dsir import dsir_weights

    return dsir_weights(spark, SF_SMALL).collect()


def test_weights_cover_all_docs_ordered(spark):
    rows = _weights(spark)
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    assert len(rows) == n_docs
    assert [r.doc_id for r in rows] == sorted(r.doc_id for r in rows)
    # every doc has at least one (unigram) feature
    assert all(r.n_feats >= 1 for r in rows)
    assert all(r.logw is not None and math.isfinite(r.logw) for r in rows)


def test_target_slice_scores_higher(spark):
    """The whole point: documents from the target (English) slice get
    a higher mean log importance weight than the rest of the pool."""
    docs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(
            f"{SF_SMALL}/documents.parquet"
        ).select("doc_id", "lang").collect()
    }
    rows = _weights(spark)
    en = [r.logw for r in rows if docs[r.doc_id] == "en"]
    other = [r.logw for r in rows if docs[r.doc_id] != "en"]
    assert en and other
    assert float(np.mean(en)) > float(np.mean(other))


def test_select_is_weighted_topk_without_replacement(spark):
    """Gumbel top-k: k distinct docs, keys descending, each key equal
    to ROUND(logw + gumbel(doc_id), 6) recomputed independently; the
    selection is exactly the top-k of the full keyed pool."""
    import hashlib

    from ydb_vector_search_simple_api_spark.operators.dsir import dsir_select

    got = dsir_select(spark, SF_SMALL, k=32).collect()
    assert len(got) == 32
    keys = [r.sel_key for r in got]
    assert keys == sorted(keys, reverse=True)
    assert len({r.doc_id for r in got}) == 32

    logw = {r.doc_id: r.logw for r in _weights(spark)}

    def gumbel(doc_id: int) -> float:
        h = hashlib.md5(f"dsir:{doc_id}".encode()).hexdigest()[:6]
        u = (int(h, 16) * 2 + 1) / (2 * 16**6)
        return round(-math.log(-math.log(u)), 9)

    expect = sorted(
        ((round(logw[d] + gumbel(d), 6), -d) for d in logw), reverse=True
    )[:32]
    assert [(r.sel_key, -r.doc_id) for r in got] == [
        (k, nd) for k, nd in expect
    ]


def test_selection_enriches_target_lang(spark):
    """Resampling with probability ∝ exp(logw) should over-represent
    the target language relative to its pool share."""
    from ydb_vector_search_simple_api_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    pool_share = docs.filter("lang = 'en'").count() / docs.count()
    lang = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    got = dsir_select(spark, SF_SMALL, k=64).collect()
    sel_share = sum(1 for r in got if lang[r.doc_id] == "en") / len(got)
    assert sel_share > pool_share
