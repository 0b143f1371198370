"""Multimodal plumbing: payload metadata, Arrow-batched featurization,
stubbed decoders."""

from __future__ import annotations

import hashlib

import pytest

from ydb_vector_search_simple_api_spark.operators import multimodal as MM
from ydb_vector_search_simple_api_spark.sources.store import load_documents

from conftest import SF_SMALL


def test_meta_matches_python(spark):
    rows = MM.multimodal_meta(spark, SF_SMALL).collect()
    docs = {r.doc_id: r.text for r in load_documents(spark, SF_SMALL).collect()}
    assert len(rows) == len(docs)
    for r in rows[:20]:
        payload = docs[r.doc_id].encode("utf-8")
        assert r.n_bytes == len(payload)
        assert r.payload_md5 == hashlib.md5(payload).hexdigest()
        assert r.media_type == "text/plain"


def test_byte_histograms(spark):
    df = MM.attach_payload(load_documents(spark, SF_SMALL))
    hists = MM.byte_histograms(df).collect()
    assert len(hists) == 500
    for r in hists[:20]:
        assert len(r.byte_hist) == MM.HIST_BINS
        assert sum(r.byte_hist) == pytest.approx(1.0)
        assert r.n_bytes > 0


def _pillow_installed() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pillow_installed(), reason="Pillow installed")
def test_decode_image_unknown_format_gated_without_pillow():
    """PNG and baseline JPEG decode via the vendored codecs; other
    formats stay behind the Pillow gate (a JPEG-signature payload
    that is garbage raises ValueError from the codec, an unknown
    signature raises NotImplementedError honestly)."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            MM.decode_image(b"GIF89a...fake-gif")
        with pytest.raises(ValueError):
            MM.decode_image(b"\xff\xd8\xff\xe0...fake-jpeg")


def test_decode_and_resize_real_png():
    """The REAL image path (PNG bytes -> RGB array -> resize -> PNG),
    runnable in every environment: Pillow when installed, the
    vendored functions/png.py codec otherwise — 0 skips either way."""
    import numpy as np

    from ydb_vector_search_simple_api_spark.functions import png as png_mod

    arr0 = np.full((6, 8, 3), (10, 20, 30), dtype=np.uint8)
    payload = png_mod.encode_png(arr0)
    arr = MM.decode_image(payload)
    assert arr.shape == (6, 8, 3)
    assert (arr == (10, 20, 30)).all()

    small = MM.resize_image(payload, 4, 3)
    arr2 = MM.decode_image(small)
    assert arr2.shape == (3, 4, 3)
    assert (arr2 == (10, 20, 30)).all()  # constant image survives resize


def test_decode_and_resize_real_jpeg():
    """The REAL JPEG path (baseline T.81 bytes -> RGB -> resize),
    runnable in every environment via the vendored functions/jpeg.py
    codec — 0 skips. Lossy round-trip accuracy pinned by PSNR."""
    import numpy as np

    from ydb_vector_search_simple_api_spark.functions import jpeg as jpeg_mod

    h, w = 24, 40
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.dstack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (h + w)]
    ).astype(np.uint8)
    payload = jpeg_mod.encode_jpeg(img)
    assert payload[:2] == jpeg_mod.JPEG_SIGNATURE

    arr = MM.decode_image(payload)
    assert arr.shape == (h, w, 3) and arr.dtype == np.uint8
    err = arr.astype(float) - img.astype(float)
    psnr = 10 * np.log10(255**2 / (err**2).mean())
    assert psnr > 30.0  # smooth content decodes faithfully

    out = MM.resize_image(payload, 10, 6)
    arr2 = MM.decode_image(out)
    assert arr2.shape == (6, 10, 3)


def test_jpeg_gray_and_odd_sizes():
    """Grayscale replicates to RGB; non-multiple-of-8 dims crop
    exactly; decoder and encoder agree on edge-padded blocks."""
    import numpy as np

    from ydb_vector_search_simple_api_spark.functions import jpeg as jpeg_mod

    g = np.tile(np.arange(33, dtype=np.uint8) * 7, (13, 1))
    dec = jpeg_mod.decode_jpeg(jpeg_mod.encode_jpeg(g))
    assert dec.shape == (13, 33, 3)
    assert (dec[..., 0] == dec[..., 1]).all() and (dec[..., 1] == dec[..., 2]).all()
    err = dec[..., 0].astype(float) - g.astype(float)
    assert 10 * np.log10(255**2 / ((err**2).mean() + 1e-12)) > 30.0


def test_jpeg_codec_scope_gates():
    """Progressive (SOF2) and truncated streams raise ValueError;
    non-JPEG payloads raise on the signature."""
    import numpy as np
    import pytest as _pytest

    from ydb_vector_search_simple_api_spark.functions import jpeg as jpeg_mod

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    data = bytearray(jpeg_mod.encode_jpeg(img))
    sof = bytes(data).find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with _pytest.raises(ValueError, match="baseline"):
        jpeg_mod.decode_jpeg(bytes(data))
    with _pytest.raises(ValueError):
        jpeg_mod.decode_jpeg(jpeg_mod.encode_jpeg(img)[:-20] )
    with _pytest.raises(ValueError, match="SOI"):
        jpeg_mod.decode_jpeg(b"nope")


def _png_with_filters(arr, filters):
    """Build a PNG whose scanlines use the given per-row filter types
    (spec-exact forward filtering), to exercise the decoder's
    Sub/Up/Average/Paeth reconstruction."""
    import struct
    import zlib

    import numpy as np

    from ydb_vector_search_simple_api_spark.functions import png as png_mod

    h, w = arr.shape[:2]
    stride = w * 3
    raw = arr.reshape(h, stride).astype(np.int32)
    out = bytearray()
    for y, f in enumerate(filters):
        row = raw[y]
        prev = raw[y - 1] if y else np.zeros(stride, dtype=np.int32)
        filt = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            left = row[i - 3] if i >= 3 else 0
            up = prev[i]
            ul = prev[i - 3] if i >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                pred = png_mod._paeth(int(left), int(up), int(ul))
            filt[i] = (row[i] - pred) & 0xFF
        out.append(f)
        out.extend(filt.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        png_mod.PNG_SIGNATURE
        + png_mod._chunk(b"IHDR", ihdr)
        + png_mod._chunk(b"IDAT", zlib.compress(bytes(out)))
        + png_mod._chunk(b"IEND", b"")
    )


def test_png_codec_roundtrip_and_filters():
    import numpy as np

    from ydb_vector_search_simple_api_spark.functions import png as png_mod

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    # encoder round-trip (filter 0)
    assert (png_mod.decode_png(png_mod.encode_png(arr)) == arr).all()
    # every filter type reconstructs exactly
    payload = _png_with_filters(arr, [0, 1, 2, 3, 4])
    assert (png_mod.decode_png(payload) == arr).all()
    # cross-check against Pillow when it happens to be present
    # (no skip registered either way)
    if _pillow_installed():
        import io

        from PIL import Image

        via_pil = np.asarray(
            Image.open(io.BytesIO(payload)).convert("RGB"), dtype=np.uint8
        )
        assert (via_pil == arr).all()
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")  # Pillow-written, our read
        assert (png_mod.decode_png(buf.getvalue()) == arr).all()


def test_png_codec_rejects_unsupported():
    import pytest as _pytest

    from ydb_vector_search_simple_api_spark.functions import png as png_mod

    with _pytest.raises(ValueError):
        png_mod.decode_png(b"\x89PNG...")  # bad signature tail
    with _pytest.raises(ValueError):
        png_mod.decode_png(b"not a png at all")


def test_frame_sample_deterministic():
    payload = bytes(range(256)) * 20  # 5120 bytes -> 20 frames of 256
    frames = MM.frame_sample(payload, every_n=10)
    assert frames == MM.frame_sample(payload, every_n=10)
    assert len(frames) == 2
    assert all(len(f) == 256 for f in frames)


def test_sample_frames_spark_fanout(spark):
    df = MM.attach_payload(load_documents(spark, SF_SMALL))
    frames = MM.sample_frames(df, every_n=2).collect()
    texts = {r.doc_id: r.text for r in load_documents(spark, SF_SMALL).collect()}
    by_doc: dict = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.frame_id)
        assert [r.frame_id for r in rows] == list(range(len(rows)))
        payload = texts[doc_id].encode()
        expect = MM.frame_sample(payload, every_n=2)
        assert [bytes(r.frame) for r in rows] == expect
        assert all(r.n_frame_bytes == len(bytes(r.frame)) for r in rows)


@pytest.mark.skipif(_pillow_installed(), reason="Pillow installed")
def test_resize_image_unknown_format_gated_without_pillow():
    """JPEG now resizes via the vendored codec (garbage JPEG bytes
    raise ValueError from it); unknown formats stay NotImplemented."""
    with pytest.raises(ValueError):
        MM.resize_image(b"\xff\xd8\xff\xe0...fake-jpeg", 64, 64)
    with pytest.raises(NotImplementedError):
        MM.resize_image(b"GIF89a...fake-gif", 64, 64)


def test_raster_codec_roundtrip_and_resize():
    import numpy as np

    from ydb_vector_search_simple_api_spark.operators import multimodal as MM

    img = (np.arange(12 * 10 * 3) % 256).astype(np.uint8).reshape(12, 10, 3)
    payload = MM.encode_raster(img)
    back = MM.decode_raster(payload)
    assert (back == img).all()

    small = MM.decode_raster(MM.resize_raster(payload, 5, 6))
    assert small.shape == (6, 5, 3)
    # nearest-neighbor: every output pixel is some input pixel
    flat_in = {tuple(p) for p in img.reshape(-1, 3)}
    assert all(tuple(p) in flat_in for p in small.reshape(-1, 3))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="SVSR"):
        MM.decode_raster(b"JPEG not really")
    with _pytest.raises(ValueError, match="truncated"):
        MM.decode_raster(payload[:-5])


def test_raster_stats_deterministic(spark):
    from ydb_vector_search_simple_api_spark.operators import multimodal as MM

    a = {r.doc_id: tuple(r)[1:] for r in MM.raster_stats(spark, SF_SMALL).collect()}
    b = {r.doc_id: tuple(r)[1:] for r in MM.raster_stats(spark, SF_SMALL).collect()}
    assert a == b
    assert len(a) == 500
    h, w, mr, mg, mb, tm = a[0]
    assert 8 <= h <= 15 and 8 <= w <= 15
    assert 0 <= mr <= 255 and len(tm) == 32


def test_raster_codec_roundtrip_property():
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from ydb_vector_search_simple_api_spark.operators import multimodal as MM

    @settings(max_examples=50, deadline=None)
    @given(
        h=st.integers(1, 40), w=st.integers(1, 40), c=st.integers(1, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, c, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        assert (MM.decode_raster(MM.encode_raster(img)) == img).all()
        tw, th = max(1, w // 2), max(1, h // 2)
        small = MM.decode_raster(MM.resize_raster(MM.encode_raster(img), tw, th))
        assert small.shape == (th, tw, c)

    check()


def test_pcm_codec_and_stats(spark):
    import numpy as np

    from ydb_vector_search_simple_api_spark.operators import multimodal as MM

    x = np.array([0, 1000, -1000, 32767, -32768, 5], dtype="<i2")
    assert (MM.decode_pcm(x.tobytes()) == x).all()
    back = np.frombuffer(MM.resample_pcm(x.tobytes(), 3), dtype="<i2")
    assert len(back) == 3 and set(back).issubset(set(x))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="odd byte"):
        MM.decode_pcm(b"\x01\x02\x03")

    a = {r.doc_id: tuple(r)[1:] for r in MM.pcm_stats(spark, SF_SMALL).collect()}
    b = {r.doc_id: tuple(r)[1:] for r in MM.pcm_stats(spark, SF_SMALL).collect()}
    assert a == b and len(a) == 500
    n, rms, zc, cm = a[0]
    assert 64 <= n < 128 and rms > 0 and 0 <= zc < n and len(cm) == 32


def test_keyframe_select_matches_numpy_replay(spark):
    import numpy as np

    from ydb_vector_search_simple_api_spark.operators import multimodal as mm

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    frames = mm.sample_frames(mm.attach_payload(docs), every_n=2)
    out = mm.keyframe_select(frames, threshold=0.25).collect()
    assert len(out) == frames.count()
    # frame 0 of every doc is a keyframe with NULL distance
    for r in out:
        if r.frame_id == 0:
            assert r.dist_prev is None and r.is_keyframe == 1
    # numpy replay on a doc that actually has multiple frames
    counts = {}
    for r in frames.collect():
        counts[r.doc_id] = counts.get(r.doc_id, 0) + 1
    multi = [d for d, c in counts.items() if c >= 2]
    assert multi, "need a multi-frame doc to exercise the lag path"
    sample = [r for r in frames.collect() if r.doc_id == multi[0]]
    sample.sort(key=lambda r: r.frame_id)
    hists = []
    for r in sample:
        b = np.frombuffer(bytes(r.frame), dtype=np.uint8)
        h = np.bincount(b, minlength=256).astype(np.float64) / max(len(b), 1)
        hists.append(h)
    by_key = {(r.doc_id, r.frame_id): r for r in out}
    for i in range(1, len(hists)):
        want = round(float(np.abs(hists[i] - hists[i - 1]).sum() / 2.0), 6)
        got = by_key[(sample[i].doc_id, sample[i].frame_id)].dist_prev
        assert got == pytest.approx(want, abs=2e-6)
    # threshold monotonicity: higher threshold keeps fewer frames
    k_lo = sum(r.is_keyframe for r in mm.keyframe_select(frames, threshold=0.1).collect())
    k_hi = sum(r.is_keyframe for r in mm.keyframe_select(frames, threshold=0.6).collect())
    assert k_hi <= k_lo


def test_keyframe_select_synthetic_shot_boundary(spark):
    from ydb_vector_search_simple_api_spark.operators import multimodal as mm

    # three frames: two near-identical, then a hard content switch
    f0 = bytes([1, 2, 3, 4] * 64)
    f1 = bytes([1, 2, 3, 4] * 63 + [1, 2, 3, 5])
    f2 = bytes([200, 201] * 128)
    frames = spark.createDataFrame(
        [(1, 0, f0), (1, 1, f1), (1, 2, f2)],
        "doc_id long, frame_id int, frame binary",
    )
    out = {r.frame_id: r for r in mm.keyframe_select(frames, threshold=0.25).collect()}
    assert out[0].is_keyframe == 1 and out[0].dist_prev is None
    assert out[1].is_keyframe == 0 and out[1].dist_prev < 0.05
    assert out[2].is_keyframe == 1 and out[2].dist_prev > 0.9


def test_pcm_segments_islands_are_wellformed(spark):
    import numpy as np

    from ydb_vector_search_simple_api_spark.operators import multimodal as mm

    out = mm.pcm_segments(spark, SF_SMALL, window=16).collect()
    assert out
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.seg_id)
        for i, r in enumerate(rows):
            assert r.seg_id == i
            assert r.start_frame <= r.end_frame
            assert r.n_frames == r.end_frame - r.start_frame + 1
            if i:
                assert r.start_frame > rows[i - 1].end_frame + 1  # gap between islands
    # numpy replay for one clip
    doc_id = out[0].doc_id
    n_chars = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .filter(f"doc_id = {doc_id}")
        .first()
        .n_chars
    )
    x = mm.decode_pcm(mm._fake_pcm(doc_id, n_chars)).astype(np.float64)
    nf = len(x) // 16
    fr = x[: nf * 16].reshape(nf, 16)
    rms = np.sqrt((fr * fr).mean(axis=1))
    active = rms > rms.mean()
    want_active = {int(i) for i in np.nonzero(active)[0]}
    got_active = set()
    for r in by_doc[doc_id]:
        got_active |= set(range(r.start_frame, r.end_frame + 1))
    assert got_active == want_active
    # determinism
    again = mm.pcm_segments(spark, SF_SMALL, window=16).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_png_stats_real_decode_pipeline(spark):
    """The real-format pipeline: PNG-encoded keystream pixels decoded
    through decode_image inside Spark; means must equal raster_stats'
    (identical pixels, lossless codec), digests deterministic."""
    png_rows = {r.doc_id: r for r in MM.png_stats(spark, SF_SMALL).collect()}
    raster_rows = {r.doc_id: r for r in MM.raster_stats(spark, SF_SMALL).collect()}
    assert set(png_rows) == set(raster_rows)
    for doc_id, pr in list(png_rows.items())[:50]:
        rr = raster_rows[doc_id]
        assert (pr.height, pr.width) == (rr.height, rr.width)
        assert (pr.mean_r, pr.mean_g, pr.mean_b) == (
            rr.mean_r, rr.mean_g, rr.mean_b
        )
    again = {r.doc_id: r for r in MM.png_stats(spark, SF_SMALL).collect()}
    assert {d: r.thumb_md5 for d, r in again.items()} == {
        d: r.thumb_md5 for d, r in png_rows.items()
    }


def test_stft_band_energies_kernel_properties():
    """Parseval-ish sanity: a pure low-frequency tone concentrates its
    energy in band 0, a Nyquist-rate alternation in the top band;
    energy is nonnegative and the frame count follows the hop math."""
    import numpy as np

    from ydb_vector_search_simple_api_spark.operators.multimodal import (
        stft_band_energies,
    )

    n = 256
    t = np.arange(n)
    low = np.sin(2 * np.pi * t / 32.0) * 1000  # one cycle per frame
    be = stft_band_energies(low, frame=32, hop=16, n_bands=4)
    assert be.shape == (1 + (n - 32) // 16, 4)
    assert (be >= 0).all()
    m = be.mean(axis=0)
    assert m[0] == max(m)

    hi = (-1.0) ** t * 1000  # Nyquist alternation
    mh = stft_band_energies(hi, frame=32, hop=16, n_bands=4).mean(axis=0)
    assert mh[3] == max(mh)

    # short input -> zero frames, stable shape
    assert stft_band_energies(np.ones(5), frame=32).shape == (0, 4)


def test_pcm_spectral_replay_and_determinism(spark):
    """The Spark column equals a direct numpy replay of the kernel for
    every doc, and repeated runs are identical."""
    import numpy as np

    from ydb_vector_search_simple_api_spark.operators import multimodal as M

    got = {r.doc_id: r for r in M.pcm_spectral(spark, SF_SMALL).collect()}
    again = {r.doc_id: r for r in M.pcm_spectral(spark, SF_SMALL).collect()}
    assert got.keys() == again.keys()
    for k in got:
        assert tuple(got[k]) == tuple(again[k])
    some = sorted(got)[:10]
    # replay: regenerate the payload exactly as the operator does
    from ydb_vector_search_simple_api_spark.sources.store import load_documents

    meta = {
        r.doc_id: r.n_chars
        for r in load_documents(spark, SF_SMALL).select("doc_id", "n_chars").collect()
    }
    for doc_id in some:
        x = M.decode_pcm(M._fake_pcm(doc_id, meta[doc_id])).astype(np.float64)
        be = M.stft_band_energies(x, 32, 16, 4)
        r = got[doc_id]
        assert r.n_frames == len(be)
        if len(be):
            m = be.mean(axis=0)
            assert r.band0 == round(float(m[0]), 6)
            assert r.dominant_band == int(np.argmax(m))
