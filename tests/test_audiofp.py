"""Audio fingerprint matching (operators/audiofp.py): kernel
determinism, planted excerpt recovery, vote-floor behavior."""

from __future__ import annotations

import numpy as np
from conftest import SF_SMALL
from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import audiofp as AFP
from ydb_vector_search_simple_api_spark.operators.multimodal import decode_pcm


def test_constellation_key_injective():
    """The packed key must decode uniquely back to (f1, f2, dt)."""
    seen = {}
    for f1 in range(0, AFP._N_BINS, 7):
        for f2 in range(0, AFP._N_BINS, 5):
            for dt in range(1, AFP.FANOUT + 1):
                key = (f1 * AFP._N_BINS + f2) * (AFP.FANOUT + 1) + dt
                assert key not in seen, (seen[key], (f1, f2, dt))
                seen[key] = (f1, f2, dt)


def test_spectral_peaks_deterministic_and_aligned():
    x = decode_pcm(AFP._fake_track(7, 300)).astype(np.float64)
    p1, p2 = AFP.spectral_peaks(x), AFP.spectral_peaks(x)
    assert (p1 == p2).all()
    assert (0 <= p1).all() and (p1 < AFP._N_BINS).all()
    # a hop-aligned excerpt's peaks are an exact slice of the track's
    start_frames = 3
    ex = x[start_frames * AFP.HOP : start_frames * AFP.HOP + 5 * AFP.HOP + AFP.FRAME]
    pe = AFP.spectral_peaks(ex)
    assert (pe == p1[start_frames : start_frames + len(pe)]).all()


def test_planted_excerpts_recovered(spark):
    probes = AFP.probe_fingerprints(spark, SF_SMALL).cache()
    truth = {
        r.probe_id: (r.true_track, r.true_offset)
        for r in probes.select(
            "probe_id", "true_track", "true_offset"
        ).distinct().collect()
    }
    assert truth, "no probes planted"
    res = AFP.audio_fingerprint_match(spark, SF_SMALL).collect()
    got = {r.probe_id: (r.track_id, r.offset) for r in res}
    assert got == truth  # every probe matched to its track AND offset
    assert all(r.n_votes >= 4 for r in res)
    probes.unpersist()


def test_vote_floor_rejects_everything_when_capped(spark):
    """max_key_df=0 drops every inverted-index key — no candidate
    pairs survive, so no matches (the hot-key cap is a real gate)."""
    p = AFP.probe_fingerprints(spark, SF_SMALL).select("probe_id", "key", "t")
    t = AFP.track_fingerprints(spark, SF_SMALL)
    assert AFP.match_fingerprints(p, t, max_key_df=0).count() == 0


def test_store_serving_equals_direct_match(spark, tmp_path):
    """Posting-store screen == recompute-everything match on the
    planted probes (track, offset AND votes), plus upsert membership:
    a screened clip upserted into the store re-matches itself at
    offset 0 with every fingerprint voting."""
    tracks = AFP.track_fingerprints(spark, SF_SMALL)
    path = str(tmp_path / "afp_store")
    AFP.build_audiofp_store(tracks, path)
    probes = AFP.probe_fingerprints(spark, SF_SMALL).select(
        F.col("probe_id").alias("doc_id"), "key", "t"
    )
    store_res = {
        r.doc_id: (r.track_id, r.offset, r.n_votes)
        for r in AFP.screen_audio_against_store(spark, probes, path).collect()
        if r.is_match
    }
    direct = {
        r.probe_id: (r.track_id, r.offset, r.n_votes)
        for r in AFP.audio_fingerprint_match(spark, SF_SMALL).collect()
    }
    assert store_res == direct

    # upsert the probes' own fingerprints; re-screen: self-match at 0
    AFP.audiofp_store_upsert(probes, path)
    res2 = AFP.screen_audio_against_store(spark, probes, path).collect()
    n_fps = {
        r.doc_id: r.n
        for r in probes.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    for r in res2:
        assert r.is_match and r.track_id == r.doc_id and r.offset == 0
        # >=: the store also holds doc_id's ORIGINAL track postings
        # (probe ids collide with track ids by construction), so a
        # coincidental shared key can add votes beyond the clip's own
        assert r.n_votes >= n_fps[r.doc_id]
