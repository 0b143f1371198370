"""Persisted KN5 model store + production verdict store (round 11,
VERDICT r10 #2/#3): store == recompute, upsert is an exact count
fold, and the snapshot loop's production gate probes the stores."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMALL

from ydb_vector_search_simple_api_spark.operators import (
    lm_store,
    pipeline,
    textual,
)
from ydb_vector_search_simple_api_spark.sources.store import load_documents


def _score_map(df):
    return {
        r.doc_id: (r.n_grams, r.mean_kn5_logprob) for r in df.collect()
    }


def test_store_scores_equal_recompute(spark, tmp_path):
    """build → score the same corpus: byte-identical to the
    in-session kneser_ney5_logprob (the store==recompute pin)."""
    docs = load_documents(spark, SF_SMALL).select("doc_id", "text")
    path = str(tmp_path / "kn5")
    stats = lm_store.kn5_store_build(spark, docs, path)
    assert stats["n_distinct_grams"] > 0
    got = _score_map(lm_store.kn5_store_score(spark, docs, path))
    want = _score_map(textual.kneser_ney5_logprob(spark, SF_SMALL))
    assert got == want and len(want) > 0


def test_upsert_fold_equals_build_on_union(spark, tmp_path):
    """build(existing) + upsert(incoming) == build(full corpus): the
    c5 fold is associative and exact, and the cascade re-derives
    deterministically — scores match byte-for-byte."""
    from ydb_vector_search_simple_api_spark.operators.sampling import (
        _draw,
        _threshold_hex,
    )

    docs = load_documents(spark, SF_SMALL).select("doc_id", "text")
    thr = _threshold_hex(0.9)
    existing = docs.filter(_draw(F.col("doc_id")) < F.lit(thr))
    incoming = docs.filter(_draw(F.col("doc_id")) >= F.lit(thr))
    assert incoming.count() > 0

    inc_path = str(tmp_path / "kn5_inc")
    lm_store.kn5_store_build(spark, existing, inc_path)
    lm_store.kn5_store_upsert(spark, incoming, inc_path)

    full_path = str(tmp_path / "kn5_full")
    lm_store.kn5_store_build(spark, docs, full_path)

    inc_c5 = {
        (r.g1, r.g2, r.g3, r.g4, r.g5): r.c5
        for r in spark.read.parquet(inc_path + "/c5").collect()
    }
    full_c5 = {
        (r.g1, r.g2, r.g3, r.g4, r.g5): r.c5
        for r in spark.read.parquet(full_path + "/c5").collect()
    }
    assert inc_c5 == full_c5

    got = _score_map(lm_store.kn5_store_score(spark, docs, inc_path))
    want = _score_map(lm_store.kn5_store_score(spark, docs, full_path))
    assert got == want


def test_mkn5_store_scores_equal_recompute(spark, tmp_path):
    """One persisted c5 store serves BOTH scorers: the modified-KN
    path (discounts derived from the stored counts) equals the
    in-session kneser_ney5_modified_logprob byte-for-byte."""
    docs = load_documents(spark, SF_SMALL).select("doc_id", "text")
    path = str(tmp_path / "kn5")
    lm_store.kn5_store_build(spark, docs, path)
    got = {
        r.doc_id: (r.n_grams, r.mean_mkn5_logprob)
        for r in lm_store.mkn5_store_score(spark, docs, path).collect()
    }
    want = {
        r.doc_id: (r.n_grams, r.mean_mkn5_logprob)
        for r in textual.kneser_ney5_modified_logprob(
            spark, SF_SMALL
        ).collect()
    }
    assert got == want and len(want) > 0


def test_store_served_tiles_equal_session_tiles(spark, tmp_path):
    """perplexity_buckets_kn5 fed store-served scores produces the
    identical tile table (the production gate's KN5 leg)."""
    docs = load_documents(spark, SF_SMALL).select("doc_id", "text")
    path = str(tmp_path / "kn5")
    lm_store.kn5_store_build(spark, docs, path)
    scores = lm_store.kn5_store_score(spark, docs, path)
    got = {
        r.doc_id: tuple(r)
        for r in textual.perplexity_buckets_kn5(
            spark, SF_SMALL, scores=scores
        ).collect()
    }
    want = {
        r.doc_id: tuple(r)
        for r in textual.perplexity_buckets_kn5(spark, SF_SMALL).collect()
    }
    assert got == want


def test_verdict_store_loop_equals_recompute_loop(spark, tmp_path):
    """The loop probing the persisted verdict table == the loop
    scoring the gate per run, row-for-row — and the verdict store
    built FROM the model store matches the direct build."""
    kn5_path = str(tmp_path / "kn5")
    docs = load_documents(spark, SF_SMALL).select("doc_id", "text")
    lm_store.kn5_store_build(spark, docs, kn5_path)

    v_direct = str(tmp_path / "verdict_direct")
    v_stored = str(tmp_path / "verdict_stored")
    n1 = pipeline.production_verdict_store_build(spark, SF_SMALL, v_direct)
    n2 = pipeline.production_verdict_store_build(
        spark, SF_SMALL, v_stored, kn5_store=kn5_path
    )
    assert n1 == n2 > 0
    d1 = {
        r.doc_id: r.quality_ok
        for r in spark.read.parquet(v_direct).collect()
    }
    d2 = {
        r.doc_id: r.quality_ok
        for r in spark.read.parquet(v_stored).collect()
    }
    assert d1 == d2
    # keep_all: the store holds BOTH outcomes (staleness detectability)
    assert any(v for v in d1.values()) and any(not v for v in d1.values())

    want = {
        r.doc_id: tuple(r)
        for r in pipeline.incremental_snapshot_loop(
            spark, SF_SMALL, quality_gate="production"
        ).collect()
    }
    got = {
        r.doc_id: tuple(r)
        for r in pipeline.incremental_snapshot_loop(
            spark,
            SF_SMALL,
            quality_gate="production",
            quality_verdict_store=v_stored,
        ).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_twin_with_verdict_store(spark, tmp_path):
    """Drained == batch also when the streaming twin probes the
    persisted verdict table."""
    from ydb_vector_search_simple_api_spark.streaming.curation_ingest import (
        stream_snapshot_loop,
    )

    v_path = str(tmp_path / "verdict")
    pipeline.production_verdict_store_build(spark, SF_SMALL, v_path)
    want = {
        r.doc_id: tuple(r)
        for r in pipeline.incremental_snapshot_loop(
            spark, SF_SMALL, quality_gate="production"
        ).collect()
    }
    got = {
        r.doc_id: tuple(r)
        for r in stream_snapshot_loop(
            spark,
            SF_SMALL,
            quality_gate="production",
            quality_verdict_store=v_path,
        ).collect()
    }
    assert got == want


def test_strict_verdict_store_rejects_stale_store(spark, tmp_path):
    """quality_store_strict (round 11): a store missing some delta
    docs raises with the staleness message; a covering store passes
    and matches the non-strict path."""
    import pytest as _pytest

    full = str(tmp_path / "verdict_full")
    pipeline.production_verdict_store_build(spark, SF_SMALL, full)

    # a store that never saw half the corpus
    stale = str(tmp_path / "verdict_stale")
    spark.read.parquet(full).filter("doc_id % 2 = 0").write.parquet(stale)

    with _pytest.raises(ValueError, match="STALE"):
        pipeline.incremental_snapshot_loop(
            spark,
            SF_SMALL,
            quality_gate="production",
            quality_verdict_store=stale,
            quality_store_strict=True,
        ).count()

    ok = {
        r.doc_id: tuple(r)
        for r in pipeline.incremental_snapshot_loop(
            spark,
            SF_SMALL,
            quality_gate="production",
            quality_verdict_store=full,
            quality_store_strict=True,
        ).collect()
    }
    want = {
        r.doc_id: tuple(r)
        for r in pipeline.incremental_snapshot_loop(
            spark, SF_SMALL, quality_gate="production"
        ).collect()
    }
    assert ok == want


def test_stream_kn5_ingest_drained_equals_batch(spark):
    """The on-arrival model build: per-shard count folds, drained
    store serves scores identical to the in-session recompute."""
    from ydb_vector_search_simple_api_spark.streaming.curation_ingest import (
        stream_kn5_ingest,
    )

    got = _score_map(stream_kn5_ingest(spark, SF_SMALL))
    want = _score_map(textual.kneser_ney5_logprob(spark, SF_SMALL))
    assert got == want and len(want) > 0
