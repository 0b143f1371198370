"""Image perceptual-hash dedup (operators/imagededup.py): planted
near-duplicate recall, banded-blocking losslessness, determinism."""

from __future__ import annotations

import numpy as np
from conftest import SF_SMALL
from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import imagededup as IM


def test_dhash64_deterministic_and_structured():
    img = np.arange(8 * 9 * 3, dtype=np.uint8).reshape(8, 9, 3)
    h1, h2 = IM.dhash64(img), IM.dhash64(img)
    assert h1 == h2
    assert 0 <= h1 < (1 << 64)
    # monotone rows -> every horizontal gradient positive -> all ones
    assert h1 == (1 << 64) - 1
    # reversed columns -> all zeros
    assert IM.dhash64(img[:, ::-1, :]) == 0


def test_perturb_changes_bytes_not_hash():
    from ydb_vector_search_simple_api_spark.operators.multimodal import (
        _fake_raster,
        decode_raster,
    )

    payload = _fake_raster(42, 200)
    pert = IM.perturb_raster(payload, 51)
    assert pert != payload  # byte-level different (md5 dedup blind)
    d = bin(
        IM.dhash64(decode_raster(payload)) ^ IM.dhash64(decode_raster(pert))
    ).count("1")
    assert d <= 10  # perceptually near


def test_planted_recall_and_blocking_parity(spark):
    h = IM.image_dhashes(spark, SF_SMALL).cache()
    planted = h.filter(F.col("base_id") != F.col("doc_id")).collect()
    assert planted, "augmentation planted no duplicates"
    want = {
        (min(r.base_id, r.doc_id), max(r.base_id, r.doc_id)) for r in planted
    }
    hashes = h.select("doc_id", "dhash")
    got = {
        (r.id_a, r.id_b)
        for r in IM.dhash_pairs(hashes, max_hamming=10).collect()
    }
    assert want <= got, "planted near-dup missed"
    # blocked candidates + exact verify == brute-force all-pairs
    exact = {
        (r.id_a, r.id_b)
        for r in IM.dhash_pairs_exact(hashes, max_hamming=10).collect()
    }
    assert got == exact
    h.unpersist()


def test_banding_pigeonhole_lossless_within_radius(spark):
    """Any pair within Hamming radius n_bands - 1 = 3 shares an exact
    16-bit band, so blocking finds it — pinned on adversarial bit
    patterns that spread the differing bits across bands."""
    base = 0x0123456789ABCDEF
    rows = [(0, base)]
    flips = [0, 17, 34]  # three different bands
    v = base
    for i, bit in enumerate(flips, start=1):
        v ^= 1 << bit
        rows.append((i, v))
    df = spark.createDataFrame(rows, ["doc_id", "dhash"]).withColumn(
        "dhash", F.col("dhash").cast("long")
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in IM.dhash_pairs(df, max_hamming=3).collect()
    }
    # all 6 pairs are within radius 3 and must be found
    assert {(a, b) for a, b, _ in got} == {
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)
    }
    assert all(hm <= 3 for _, _, hm in got)


def test_image_dedup_groups_are_planted_pairs(spark):
    """pairs -> two-star components: every planted (base, dup) pair
    becomes one 2-member component labeled by the base id."""
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.operators.graph import (
        connected_components_twostar,
    )

    pairs = IM.image_phash_dedup(spark, SF_SMALL)
    comp = connected_components_twostar(pairs).collect()
    by_comp: dict[int, set[int]] = {}
    for r in comp:
        by_comp.setdefault(r.component_id, set()).add(r.doc_id)
    h = IM.image_dhashes(spark, SF_SMALL)
    planted = {
        (r.base_id, r.doc_id)
        for r in h.filter(F.col("base_id") != F.col("doc_id")).collect()
    }
    assert by_comp == {a: {a, b} for a, b in planted}


def test_phash_store_screen_equals_batch_and_upsert_grows(spark, tmp_path):
    """Store-backed screen == pair-join recompute on the same split;
    upserting the admitted batch makes a re-screen flag them as dups
    of themselves (membership semantics)."""
    from ydb_vector_search_simple_api_spark.operators.sampling import (
        _draw,
        _threshold_hex,
    )

    h = IM.image_dhashes(spark, SF_SMALL).select("doc_id", "dhash").cache()
    thr = _threshold_hex(0.9)
    existing = h.filter(_draw(F.col("doc_id")) < F.lit(thr))
    incoming = h.filter(~(_draw(F.col("doc_id")) < F.lit(thr))).cache()
    path = str(tmp_path / "phash_store")
    IM.build_phash_store(existing, path)
    res = IM.screen_images_against_store(spark, incoming, path).collect()

    ex_ids = {r.doc_id for r in existing.select("doc_id").collect()}
    pairs = IM.dhash_pairs(h, max_hamming=10).collect()
    expect = {}
    for r in pairs:
        for new, old in ((r.id_a, r.id_b), (r.id_b, r.id_a)):
            if new not in ex_ids and old in ex_ids:
                cur = expect.get(new)
                if cur is None or (r.hamming, old) < cur:
                    expect[new] = (r.hamming, old)
    got = {r.doc_id: (r.best_hamming, r.best_match) for r in res if r.is_near_dup}
    assert got == expect
    assert len(res) == incoming.count()

    # upsert the incoming batch, re-screen: every row now matches at 0
    IM.phash_store_upsert(incoming, path)
    res2 = IM.screen_images_against_store(spark, incoming, path).collect()
    assert all(r.is_near_dup and r.best_hamming == 0 for r in res2)
    h.unpersist(); incoming.unpersist()


def test_stream_image_dedup_equals_greedy_replay(spark):
    """Drained on-arrival verdicts == driver-side greedy-prefix
    admission replay (flags AND best matches), across 3 arrival
    shards with a mid-stream store."""
    from ydb_vector_search_simple_api_spark.streaming.image_ingest import (
        stream_image_dedup_ingest,
    )

    res = stream_image_dedup_ingest(spark, SF_SMALL, n_shards=3).collect()
    hs = {
        r.doc_id: r.dhash
        for r in IM.image_dhashes(spark, SF_SMALL)
        .select("doc_id", "dhash")
        .collect()
    }
    assert len(res) == len(hs)

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    admitted: list[int] = []
    dup: dict[int, tuple[int, int]] = {}
    for i in sorted(hs):
        near = [
            (ham(hs[i], hs[j]), j) for j in admitted if ham(hs[i], hs[j]) <= 10
        ]
        if near:
            dup[i] = min(near)
        else:
            admitted.append(i)
    got = {r.doc_id: (r.best_hamming, r.best_match) for r in res if r.is_near_dup}
    assert got == dup
