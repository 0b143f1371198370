"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB (north-star extension): media
lives in an opaque ``binary`` column with typed metadata alongside;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages so
bytes cross the JVM/Python boundary once per batch, never per row.

The container has no imaging/audio libraries, so the *decoders* are
stubbed behind clearly-marked gates (``NotImplementedError`` or a
deterministic fake) — but everything Spark-side is real and tested:
schemas, partitioning, UDF signatures, batch shapes, metadata
extraction, and a real byte-level feature (byte histogram) that
exercises the exact same plumbing a JPEG decoder would.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

from ..sources.store import load_documents

HIST_BINS = 16


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a source column as an opaque media payload with typed
    metadata — the canonical multimodal row shape. (Here the payload is
    the UTF-8 text itself: a deterministic stand-in for image bytes.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_type", F.lit("text/plain")
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata pass over payloads — pure built-ins, no Python:
    (doc_id, n_bytes, payload_md5, media_type)."""
    d = attach_payload(load_documents(spark, sf_dir))
    return d.select(
        "doc_id",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        "media_type",
    )


_HIST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_hist", T.ArrayType(T.DoubleType())),
    ]
)


def byte_histograms(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: a
    16-bin byte histogram (normalized). This is the real plumbing a
    media featurizer uses — NumPy over whole Arrow batches."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(buf >> 4, minlength=HIST_BINS).astype(np.float64)
                total = hist.sum()
                if total > 0:
                    hist = hist / total
                out.append((int(doc_id), int(len(buf)), hist.tolist()))
            yield pd.DataFrame(out, columns=["doc_id", "n_bytes", "byte_hist"])

    return df.select(id_col, payload_col).mapInPandas(extract, schema=_HIST_SCHEMA)


_DIGEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("hist_md5", T.StringType()),
    ]
)


def byte_histogram_digests(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Gate-friendly scalar projection of :func:`byte_histograms`:
    md5 over the comma-joined 16 *raw* bin counts (integers — no
    float-formatting ambiguity), so a SQL oracle can reproduce it from
    the hex encoding of the payload (``oracles_text.BYTE_HIST_DIGESTS``).
    Same Arrow-batched plumbing as the featurizer."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(buf >> 4, minlength=HIST_BINS)
                digest = hashlib.md5(
                    ",".join(str(int(c)) for c in hist).encode()
                ).hexdigest()
                out.append((int(doc_id), int(len(buf)), digest))
            yield pd.DataFrame(out, columns=["doc_id", "n_bytes", "hist_md5"])

    return df.select(id_col, payload_col).mapInPandas(extract, schema=_DIGEST_SCHEMA)


# --------------------------------------------------- raster pipeline
#
# A dependency-free raster format so decode -> transform -> featurize
# runs END-TO-END without an imaging library: header b"SVSR" + height/
# width/channels (uint16,uint16,uint8, little-endian) + raw uint8
# pixels in HWC order. Real formats (JPEG/PNG) stay behind the Pillow
# gate below — they drop into the same mapInPandas loops.

_RASTER_MAGIC = b"SVSR"


def encode_raster(arr: "np.ndarray") -> bytes:
    """(h, w, c) uint8 array -> SVSR payload bytes."""
    import struct

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3:
        raise ValueError(f"expected (h, w, c), got shape {a.shape}")
    h, w, c = a.shape
    return _RASTER_MAGIC + struct.pack("<HHB", h, w, c) + a.tobytes()


def decode_raster(payload: bytes) -> "np.ndarray":
    """SVSR payload -> (h, w, c) uint8 array. ValueError on a foreign
    payload (magic mismatch / truncation) — decode errors must be
    catchable per row, not kill the task."""
    import struct

    if payload[:4] != _RASTER_MAGIC:
        raise ValueError("not an SVSR raster payload")
    h, w, c = struct.unpack("<HHB", payload[4:9])
    body = payload[9 : 9 + h * w * c]
    if len(body) != h * w * c:
        raise ValueError("truncated SVSR raster payload")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)


def resize_raster(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample — real resize math, no library."""
    img = decode_raster(payload)
    h, w, _ = img.shape
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_raster(img[rows[:, None], cols[None, :], :])


def _fake_raster(doc_id: int, n_chars: int) -> bytes:
    """Deterministic synthetic image per document: dimensions derived
    from the text length, pixels from an md5 keystream of the id."""
    h = 8 + (n_chars % 8)
    w = 8 + ((n_chars // 8) % 8)
    c = 3
    need = h * w * c
    seed = str(doc_id).encode()
    chunks, i = [], 0
    while sum(len(x) for x in chunks) < need:
        chunks.append(hashlib.md5(seed + i.to_bytes(4, "little")).digest())
        i += 1
    pix = np.frombuffer(b"".join(chunks)[:need], dtype=np.uint8).reshape(h, w, c)
    return encode_raster(pix)


_RASTER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def raster_stats(spark: SparkSession, sf_dir: str, thumb: int = 8) -> DataFrame:
    """End-to-end media pipeline over synthetic rasters: generate ->
    decode -> per-channel means -> nearest-neighbor thumbnail ->
    digest, one Arrow batch at a time (bytes cross the JVM/Python
    boundary once per batch). Rows-only by nature (md5-keystream
    pixels have no SQL twin); determinism + shape pinned in
    tests/test_multimodal.py."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                payload = _fake_raster(int(doc_id), int(n_chars))
                img = decode_raster(payload).astype(np.float64)
                h, w, _ = img.shape
                means = img.mean(axis=(0, 1))
                tm = hashlib.md5(resize_raster(payload, thumb, thumb)).hexdigest()
                rows.append(
                    (int(doc_id), h, w,
                     round(float(means[0]), 6), round(float(means[1]), 6),
                     round(float(means[2]), 6), tm)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "height", "width", "mean_r", "mean_g", "mean_b",
                    "thumb_md5",
                ],
            )

    d = load_documents(spark, sf_dir).select("doc_id", "n_chars")
    return d.mapInPandas(extract, schema=_RASTER_STATS_SCHEMA)


# ---------------------------------------------------- audio pipeline
#
# Raw PCM (int16 little-endian mono) needs no codec at all — decode is
# np.frombuffer. Real compressed audio (mp3/ogg) would slot into the
# same batch loop behind a library gate, exactly like JPEG below.


def decode_pcm(payload: bytes) -> "np.ndarray":
    """int16-LE mono PCM bytes -> int16 array. ValueError on odd
    length (torn sample) — per-row containment, same contract as
    :func:`decode_raster`."""
    if len(payload) % 2:
        raise ValueError("truncated PCM payload (odd byte length)")
    return np.frombuffer(payload, dtype="<i2")


def resample_pcm(payload: bytes, n_out: int) -> bytes:
    """Nearest-neighbor resample to ``n_out`` samples (the
    fixed-length normalization step before audio featurization)."""
    x = decode_pcm(payload)
    if len(x) == 0:
        return b"\x00\x00" * n_out
    idx = (np.arange(n_out) * len(x) // n_out).clip(0, len(x) - 1)
    return x[idx].astype("<i2").tobytes()


def _fake_pcm(doc_id: int, n_chars: int) -> bytes:
    """Deterministic synthetic waveform per document: md5 keystream as
    int16 samples, length derived from the text length."""
    n_samples = 64 + (n_chars % 64)
    need = n_samples * 2
    seed = b"pcm" + str(doc_id).encode()
    chunks, i = [], 0
    while sum(len(c) for c in chunks) < need:
        chunks.append(hashlib.md5(seed + i.to_bytes(4, "little")).digest())
        i += 1
    return b"".join(chunks)[:need]


_PCM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossings", T.IntegerType()),
        T.StructField("clip_md5", T.StringType()),
    ]
)


def pcm_stats(spark: SparkSession, sf_dir: str, clip_len: int = 32) -> DataFrame:
    """End-to-end audio pipeline over synthetic PCM: generate ->
    decode -> RMS + zero-crossing features -> fixed-length clip digest,
    one Arrow batch at a time. Rows-only by nature (md5-keystream
    samples); determinism pinned in tests/test_multimodal.py."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                payload = _fake_pcm(int(doc_id), int(n_chars))
                x = decode_pcm(payload).astype(np.float64)
                rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
                zc = int(((x[:-1] * x[1:]) < 0).sum()) if len(x) > 1 else 0
                cm = hashlib.md5(resample_pcm(payload, clip_len)).hexdigest()
                rows.append((int(doc_id), len(x), round(rms, 6), zc, cm))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "rms", "zero_crossings", "clip_md5"],
            )

    d = load_documents(spark, sf_dir).select("doc_id", "n_chars")
    return d.mapInPandas(extract, schema=_PCM_STATS_SCHEMA)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real-format image decode -> (h, w, 3) uint8 RGB array.

    Pillow handles every format when installed (optional dependency —
    not in this container's baseline). Without Pillow, PNG decodes
    through the vendored spec-subset codec (``functions/png.py``:
    8-bit non-interlaced gray/RGB/alpha, all 5 scanline filters) and
    baseline JPEG through the vendored T.81 codec
    (``functions/jpeg.py``: SOF0 Huffman sequential, 4:4:4/4:2:2/
    4:2:0, restart markers), so the REAL decode paths run
    dependency-free; progressive JPEG and other formats stay behind
    the Pillow gate and raise NotImplementedError honestly. The
    Spark-side pipeline (binary column -> mapInPandas batches) is
    identical either way."""
    try:
        from PIL import Image
    except ImportError as exc:
        from ..functions import jpeg as _jpeg
        from ..functions import png as _png

        if bytes(payload[:8]) == _png.PNG_SIGNATURE:
            return _png.decode_png(bytes(payload))
        if bytes(payload[:2]) == _jpeg.JPEG_SIGNATURE:
            return _jpeg.decode_jpeg(bytes(payload))
        raise NotImplementedError(
            "image decode without Pillow handles PNG (functions/png.py) "
            "and baseline JPEG (functions/jpeg.py); other formats "
            "require Pillow, which is not installed"
        ) from exc
    import io

    with Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("RGB"), dtype=np.uint8)


def frame_sample(payload: bytes, every_n: int = 10) -> list[bytes]:
    """STUB-backed deterministic fake for video frame sampling: chunks
    the payload into fixed-size 'frames' and keeps every n-th. Lets the
    downstream Spark plumbing (explode of frame arrays, per-frame
    featurization) be exercised without a video codec."""
    frame_size = 256
    frames = [payload[i : i + frame_size] for i in range(0, len(payload), frame_size)]
    return frames[::every_n]


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_frame_bytes", T.LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling as a Spark stage: Arrow-batched ``mapInPandas``
    fan-out of one payload row into its kept frames — the 1:N shape a
    video sampler produces (no shuffle; output partitioning follows the
    scan). Frame extraction itself is the deterministic fake
    (:func:`frame_sample`); a real codec drops into the same loop."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for fid, fr in enumerate(frame_sample(bytes(payload), every_n)):
                    rows.append((int(doc_id), fid, fr, len(fr)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_id", "frame", "n_frame_bytes"]
            )

    return df.select(id_col, payload_col).mapInPandas(extract, schema=_FRAMES_SCHEMA)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Image resize: decode -> bilinear resize -> PNG bytes. Pillow
    when installed; without it, PNG payloads run through the vendored
    codec + NumPy bilinear kernel (``functions/png.py`` — same
    half-pixel-aligned sampling grid as Pillow's BILINEAR), and
    non-PNG formats raise NotImplementedError (same gate as
    :func:`decode_image`)."""
    try:
        from PIL import Image
    except ImportError as exc:
        from ..functions import jpeg as _jpeg
        from ..functions import png as _png

        if bytes(payload[:8]) == _png.PNG_SIGNATURE:
            arr = _png.decode_png(bytes(payload))
            return _png.encode_png(_png.resize_bilinear(arr, width, height))
        if bytes(payload[:2]) == _jpeg.JPEG_SIGNATURE:
            arr = _jpeg.decode_jpeg(bytes(payload))
            return _png.encode_png(_png.resize_bilinear(arr, width, height))
        raise NotImplementedError(
            "image resize without Pillow handles PNG and baseline JPEG "
            "payloads; other formats require Pillow"
        ) from exc
    import io

    with Image.open(io.BytesIO(payload)) as img:
        out = img.convert("RGB").resize((width, height), Image.BILINEAR)
    buf = io.BytesIO()
    out.save(buf, format="PNG")
    return buf.getvalue()


def keyframe_select(
    frames: DataFrame,
    threshold: float = 0.25,
    id_col: str = "doc_id",
    frame_id_col: str = "frame_id",
    frame_col: str = "frame",
) -> DataFrame:
    """Shot-boundary keyframe selection: a frame is a keyframe when
    its byte-histogram distance to the PREVIOUS frame exceeds
    ``threshold`` (frame 0 always is) — the standard cheap
    keyframe/scene-cut pass of a video curation pipeline (keep one
    representative frame per shot instead of every Nth).

    Distance = half the L1 distance between the frames' normalized
    256-bin byte histograms (in [0, 1]; invariant to frame length).
    Two stages, both scale-friendly: one Arrow pass computes per-frame
    histograms (narrow, 1:1), then a window ``lag`` per doc orders the
    comparison — the only shuffle keys on doc_id, carrying 256 doubles
    per frame, never the frame bytes.

    Output: (doc_id, frame_id, dist_prev, is_keyframe)."""
    from pyspark.sql import Window

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, fid, fr in zip(
                pdf[id_col], pdf[frame_id_col], pdf[frame_col]
            ):
                b = np.frombuffer(bytes(fr), dtype=np.uint8)
                h = np.bincount(b, minlength=256).astype(np.float64)
                h = h / max(len(b), 1)
                rows.append((int(doc_id), int(fid), h.tolist()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_id", "hist"])

    hists = frames.select(id_col, frame_id_col, frame_col).mapInPandas(
        hist, schema="doc_id bigint, frame_id int, hist array<double>"
    )
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    prev = F.lag("hist").over(w)
    l1_half = F.aggregate(
        F.zip_with(F.col("hist"), prev, lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.lit(2.0)
    return (
        hists.withColumn(
            "dist_prev",
            F.when(prev.isNull(), F.lit(None).cast("double")).otherwise(
                F.round(l1_half, 6) + F.lit(0.0)
            ),
        )
        .withColumn(
            "is_keyframe",
            (F.col("dist_prev").isNull() | (F.col("dist_prev") > threshold)).cast(
                "int"
            ),
        )
        .select("doc_id", "frame_id", "dist_prev", "is_keyframe")
        .orderBy("doc_id", "frame_id")
    )


def multimodal_keyframes(
    spark: SparkSession, sf_dir: str, every_n: int = 7, threshold: float = 0.25
) -> DataFrame:
    """Gate entry (rows-only): frame fan-out -> keyframe selection over
    the deterministic fake payloads. Selection properties (frame 0
    kept, threshold monotonicity, numpy histogram replay) are pinned
    in tests/test_multimodal.py."""
    from ..sources.store import load_documents

    frames = sample_frames(
        attach_payload(load_documents(spark, sf_dir)), every_n=every_n
    )
    return keyframe_select(frames, threshold=threshold)


def pcm_segments(
    spark: SparkSession,
    sf_dir: str,
    window: int = 16,
    rel_threshold: float = 1.0,
) -> DataFrame:
    """Energy-based segmentation (VAD-ish): split each clip's sample
    stream into ``window``-sample frames, mark frames whose RMS
    exceeds ``rel_threshold`` x the clip's mean frame RMS as active,
    and merge consecutive active frames into segments — the
    silence-trim / utterance-split primitive of an audio curation
    pipeline.

    Two stages: one Arrow pass computes per-frame RMS and the
    in-clip active runs (gaps-and-islands on the frame sequence,
    resolved with NumPy inside the batch — a clip's frames never span
    batches because the fan-out happens inside the pass), emitting one
    row per segment. No shuffle at all; output partitioning follows
    the scan. Output: (doc_id, seg_id, start_frame, end_frame,
    n_frames, seg_rms)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                x = decode_pcm(_fake_pcm(int(doc_id), int(n_chars))).astype(
                    np.float64
                )
                n_frames = len(x) // window
                if n_frames == 0:
                    continue
                fr = x[: n_frames * window].reshape(n_frames, window)
                rms = np.sqrt((fr * fr).mean(axis=1))
                active = rms > rel_threshold * rms.mean()
                # islands: segment id = cumsum of starts, on active rows
                starts = np.diff(np.concatenate([[0], active.view(np.int8)])) == 1
                seg_ids = np.cumsum(starts) - 1
                for seg in range(seg_ids[active].max() + 1 if active.any() else 0):
                    idx = np.nonzero(active & (seg_ids == seg))[0]
                    rows.append(
                        (
                            int(doc_id),
                            int(seg),
                            int(idx[0]),
                            int(idx[-1]),
                            len(idx),
                            round(float(rms[idx].mean()), 6),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "seg_id", "start_frame", "end_frame",
                    "n_frames", "seg_rms",
                ],
            )

    d = load_documents(spark, sf_dir).select("doc_id", "n_chars")
    return d.mapInPandas(
        extract,
        schema=(
            "doc_id bigint, seg_id int, start_frame int, end_frame int,"
            " n_frames int, seg_rms double"
        ),
    ).orderBy("doc_id", "seg_id")


def png_stats(spark: SparkSession, sf_dir: str, thumb: int = 8) -> DataFrame:
    """End-to-end pipeline over a REAL image format: the md5-keystream
    pixels are wrapped as spec-conforming PNG payloads, then run
    through :func:`decode_image` — Pillow when installed, the vendored
    ``functions/png.py`` codec otherwise, so the real-format decode
    path executes everywhere — then per-channel means + a bilinear
    thumbnail digest. Same Arrow-batch shape as :func:`raster_stats`
    (its synthetic-format sibling); rows-only by nature, pinned in
    tests/test_multimodal.py including a codec round-trip check."""
    from ..functions import png as _png

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                pix = decode_raster(_fake_raster(int(doc_id), int(n_chars)))
                payload = _png.encode_png(pix)
                img = decode_image(payload)  # the REAL decode path
                h, w, _ = img.shape
                means = img.astype(np.float64).mean(axis=(0, 1))
                tm = hashlib.md5(
                    _png.resize_bilinear(img, thumb, thumb).tobytes()
                ).hexdigest()
                rows.append(
                    (int(doc_id), h, w,
                     round(float(means[0]), 6), round(float(means[1]), 6),
                     round(float(means[2]), 6), tm)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "height", "width", "mean_r", "mean_g", "mean_b",
                    "thumb_md5",
                ],
            )

    d = load_documents(spark, sf_dir).select("doc_id", "n_chars")
    return d.mapInPandas(extract, schema=_RASTER_STATS_SCHEMA)


def stft_band_energies(
    x: "np.ndarray", frame: int = 32, hop: int = 16, n_bands: int = 4
) -> "np.ndarray":
    """Per-frame band energies: Hann-windowed frames -> rfft ->
    |X|² grouped into ``n_bands`` contiguous frequency bands
    (frame//2+1 bins split evenly, remainder to the top band).
    Pure-numpy kernel, importable for replay tests AND called from
    the Arrow batches — the png/jpeg vendored-codec pattern for
    audio. Returns (n_frames, n_bands) float64; empty input ->
    (0, n_bands)."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < frame:
        return np.zeros((0, n_bands))
    n_frames = 1 + (len(x) - frame) // hop
    win = np.hanning(frame)
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = np.abs(np.fft.rfft(x[idx] * win[None, :], axis=1)) ** 2
    n_bins = frame // 2 + 1
    per = n_bins // n_bands
    out = np.empty((n_frames, n_bands))
    for b in range(n_bands):
        lo = b * per
        hi = (b + 1) * per if b < n_bands - 1 else n_bins
        out[:, b] = spec[:, lo:hi].sum(axis=1)
    return out


_PCM_SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("band0", T.DoubleType()),
        T.StructField("band1", T.DoubleType()),
        T.StructField("band2", T.DoubleType()),
        T.StructField("band3", T.DoubleType()),
        T.StructField("dominant_band", T.IntegerType()),
        T.StructField("flatness", T.DoubleType()),
    ]
)


def pcm_spectral(
    spark: SparkSession, sf_dir: str, frame: int = 32, hop: int = 16
) -> DataFrame:
    """Spectral feature extraction over the synthetic PCM pipeline:
    decode -> STFT band energies -> per-doc mean energy per band,
    dominant band (argmin-index tie-break), and spectral flatness
    (geometric/arithmetic mean ratio over band means — the
    noise-vs-tone discriminator). The audio-feature stage a training
    pipeline runs before filtering silence/noise clips; rows-only by
    nature (md5-keystream samples), kernel replay pinned in
    tests/test_multimodal.py."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                payload = _fake_pcm(int(doc_id), int(n_chars))
                x = decode_pcm(payload).astype(np.float64)
                be = stft_band_energies(x, frame=frame, hop=hop, n_bands=4)
                if len(be) == 0:
                    rows.append((int(doc_id), 0, 0.0, 0.0, 0.0, 0.0, -1, 0.0))
                    continue
                m = be.mean(axis=0)
                dom = int(np.argmax(m))
                gm = float(np.exp(np.log(np.maximum(m, 1e-12)).mean()))
                am = float(m.mean())
                flat = round(gm / am, 6) if am > 0 else 0.0
                rows.append(
                    (
                        int(doc_id),
                        int(len(be)),
                        round(float(m[0]), 6),
                        round(float(m[1]), 6),
                        round(float(m[2]), 6),
                        round(float(m[3]), 6),
                        dom,
                        flat,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "band0", "band1", "band2", "band3",
                    "dominant_band", "flatness",
                ],
            )

    d = load_documents(spark, sf_dir).select("doc_id", "n_chars")
    return d.mapInPandas(extract, schema=_PCM_SPECTRAL_SCHEMA)
