"""Cross-modality curation report: flag-by-flag equality against the
individual modality operators, admission logic."""

from __future__ import annotations

from conftest import SF_SMALL
from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import (
    audiofp,
    dedup,
    imagededup,
    mmcuration,
    videodedup,
)
from ydb_vector_search_simple_api_spark.sources.store import load_documents


def test_flags_match_individual_operators(spark):
    rows = mmcuration.multimodal_curation_report(spark, SF_SMALL).collect()
    docs = load_documents(spark, SF_SMALL)
    assert len(rows) == docs.count()

    text = {
        r.id_b
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    image = {
        r.id_b for r in imagededup.image_phash_dedup(spark, SF_SMALL).collect()
    }
    video = {
        r.id_b
        for r in videodedup.video_sequence_dedup(spark, SF_SMALL).collect()
    }
    audio = {
        r.probe_id
        for r in audiofp.audio_fingerprint_match(spark, SF_SMALL).collect()
    }
    for r in rows:
        assert r.text_near_dup == (r.doc_id in text)
        assert r.image_dup == (r.doc_id in image)
        assert r.video_dup == (r.doc_id in video)
        assert r.audio_dup == (r.doc_id in audio)
        assert r.admitted == (
            r.quality_pass
            and not (
                r.text_near_dup or r.image_dup or r.audio_dup or r.video_dup
            )
        )
    # the planted media dups (doc_id % 10 == 9) must all be rejected
    planted = [r for r in rows if r.doc_id % 10 == 9 and r.doc_id >= 9]
    assert planted and all(not r.admitted for r in planted)


def test_multimodal_safe_splits_never_straddle(spark):
    """No near-dup pair — in ANY modality — lands on opposite sides
    of the fence; components union correctly across modalities."""
    rows = {
        r.doc_id: r
        for r in mmcuration.multimodal_safe_splits(spark, SF_SMALL).collect()
    }
    docs = load_documents(spark, SF_SMALL)
    assert len(rows) == docs.count()
    assert {r.split for r in rows.values()} <= {"train", "valid", "test"}

    pairs = []
    pairs += [
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    ]
    pairs += [
        (r.id_a, r.id_b)
        for r in imagededup.image_phash_dedup(spark, SF_SMALL).collect()
    ]
    pairs += [
        (r.id_a, r.id_b)
        for r in videodedup.video_sequence_dedup(spark, SF_SMALL).collect()
    ]
    pairs += [
        (min(r.probe_id, r.track_id), max(r.probe_id, r.track_id))
        for r in audiofp.audio_fingerprint_match(spark, SF_SMALL).collect()
    ]
    assert pairs
    for a, b in pairs:
        assert rows[a].split == rows[b].split, (a, b)
        assert rows[a].component_id == rows[b].component_id
