"""Audio fingerprint matching: peak-pair constellation hashes +
inverted-index candidate join + offset-histogram verification — the
Shazam-style (Wang 2003, "An Industrial-Strength Audio Search
Algorithm") dedup/retrieval primitive, riding the same STFT kernel
the spectral stage uses (``multimodal.stft_band_energies``' sibling).

Pipeline:

1. **Fingerprint** (Arrow ``mapInPandas``, the only Python stage):
   per-frame spectral peak (argmax rfft bin) → anchor/target pairs
   within a small fan-out window → packed ``(f1, f2, dt)`` hash keys
   with the anchor's frame index.
2. **Candidate join** (JVM): probe hashes ⋈ track hashes on the key —
   an inverted-index join; only clips sharing an exact constellation
   key ever meet. No all-pairs stage.
3. **Offset histogram** (JVM): a true excerpt aligns at ONE offset,
   so votes pile up on a single ``(probe, track, track_t - probe_t)``
   cell; noise matches scatter. GroupBy-count then a max-struct
   election per probe (deterministic tie-break). The vote floor
   ``min_votes`` rejects coincidental key collisions.

Planted ground truth (same pattern as ``imagededup``): every
``doc_id % 10 == 9`` doc is a probe — an amplitude-scaled, noise-dusted
excerpt of doc ``doc_id - 9``'s track at a known frame offset. The
match must recover both the track and the offset (pinned in
tests/test_audiofp.py).

100 TB shape: fingerprints are (id, int key, int t) rows — narrow;
the join is keyed (hot-key cap available via ``max_key_df``); the
histogram is one keyed count with map-side combine; the election is a
groupBy-max. Everything after the Arrow stage is codegen.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

from ..sources.store import load_documents
from .dedup import _ensure_parallelism
from .multimodal import decode_pcm

FRAME = 64
HOP = 32
FANOUT = 5
_N_BINS = FRAME // 2 + 1  # 33


def _fake_track(doc_id: int, n_chars: int) -> bytes:
    """Deterministic long waveform per document (the track-length
    sibling of ``multimodal._fake_pcm``): md5 keystream as int16,
    ~24-32 STFT frames at FRAME/HOP."""
    n_samples = 768 + (n_chars % 256)
    need = n_samples * 2
    seed = b"track" + str(doc_id).encode()
    chunks, i = [], 0
    while sum(len(c) for c in chunks) < need:
        chunks.append(hashlib.md5(seed + i.to_bytes(4, "little")).digest())
        i += 1
    return b"".join(chunks)[:need]


def spectral_peaks(x: "np.ndarray", frame: int = FRAME, hop: int = HOP) -> "np.ndarray":
    """Per-frame dominant rfft bin (Hann window) — the constellation's
    peak extractor. Returns int array of length n_frames."""
    x = np.asarray(x, dtype=np.float64)
    if len(x) < frame:
        return np.zeros(0, dtype=np.int64)
    n_frames = 1 + (len(x) - frame) // hop
    win = np.hanning(frame)
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    spec = np.abs(np.fft.rfft(x[idx] * win[None, :], axis=1)) ** 2
    return spec.argmax(axis=1).astype(np.int64)


def constellation(peaks: "np.ndarray", fanout: int = FANOUT) -> list[tuple[int, int]]:
    """(key, anchor_t) pairs: key packs (f1, f2, dt) as
    ``(f1 * N_BINS + f2) * (fanout + 1) + dt`` — injective, so the
    join key IS the constellation point."""
    out = []
    n = len(peaks)
    for t in range(n):
        for dt in range(1, fanout + 1):
            if t + dt < n:
                key = (int(peaks[t]) * _N_BINS + int(peaks[t + dt])) * (
                    fanout + 1
                ) + dt
                out.append((key, t))
    return out


_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("key", T.LongType()),
        T.StructField("t", T.IntegerType()),
    ]
)


def track_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, key, t) constellation rows for every document's track.
    The input is fanned out to cluster parallelism first — a small
    parquet scans as ONE split, serializing the whole Arrow stage
    (measured 10.6 s single-task vs ~1 s fanned at sf0.1).
    Session-cached to parquet per sf_dir (pure function of the
    corpus; rm -rf /tmp/svs_afp_* after changing fingerprint code)."""
    return _fp_cached(spark, sf_dir, "afpt", _track_fingerprints_uncached)


def _track_fingerprints_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _ensure_parallelism(
        load_documents(spark, sf_dir).select("doc_id", "n_chars")
    )

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                x = decode_pcm(_fake_track(int(doc_id), int(n_chars)))
                for key, t in constellation(spectral_peaks(x)):
                    rows.append((int(doc_id), key, t))
            yield pd.DataFrame(rows, columns=["doc_id", "key", "t"])

    return d.mapInPandas(fp, schema=_FP_SCHEMA)


_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("probe_id", T.LongType()),
        T.StructField("true_track", T.LongType()),
        T.StructField("true_offset", T.IntegerType()),
        T.StructField("key", T.LongType()),
        T.StructField("t", T.IntegerType()),
    ]
)


def probe_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached (see track_fingerprints)."""
    return _fp_cached(spark, sf_dir, "afpp", _probe_fingerprints_uncached)


def _probe_fingerprints_uncached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constellation rows for the planted probes: every
    ``doc_id % 10 == 9`` doc yields an excerpt of doc ``doc_id - 9``'s
    track — 10 frames starting at a doc-dependent hop-aligned offset,
    scaled ×0.9 with ±64 md5 noise (peaks mostly survive; the vote
    floor absorbs the rest). ``true_track``/``true_offset`` are
    ground-truth columns for the recall pin — the matcher never reads
    them."""
    d = load_documents(spark, sf_dir).select("doc_id", "n_chars")
    base = d.select(
        F.col("doc_id").alias("base_id"), F.col("n_chars").alias("base_chars")
    )
    probes = _ensure_parallelism(
        d.filter(F.col("doc_id") % 10 == 9)
        .select("doc_id", (F.col("doc_id") - 9).alias("base_id"))
        .join(base, "base_id")
    )

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for probe_id, base_id, base_chars in zip(
                pdf["doc_id"], pdf["base_id"], pdf["base_chars"]
            ):
                track = decode_pcm(
                    _fake_track(int(base_id), int(base_chars))
                ).astype(np.float64)
                off_frames = 3 + int(probe_id) % 4
                start = off_frames * HOP
                excerpt = track[start : start + (10 - 1) * HOP + FRAME]
                noise_seed = hashlib.md5(f"an:{probe_id}".encode()).digest()
                rng_bytes = (noise_seed * ((len(excerpt) // 16) + 1))[
                    : len(excerpt)
                ]
                noise = (
                    np.frombuffer(bytes(rng_bytes), dtype=np.uint8).astype(
                        np.float64
                    )
                    - 128.0
                ) * 24.0  # ~±3k on an ~int16-RMS signal: flips SOME peaks
                y = np.clip(excerpt * 0.9 + noise, -32768, 32767)
                for key, t in constellation(spectral_peaks(y)):
                    rows.append(
                        (int(probe_id), int(base_id), off_frames, key, t)
                    )
            yield pd.DataFrame(
                rows,
                columns=["probe_id", "true_track", "true_offset", "key", "t"],
            )

    return probes.mapInPandas(fp, schema=_PROBE_SCHEMA)


def _fp_cached(spark, sf_dir, tag, fn):
    import hashlib as _hashlib
    import os
    import tempfile

    cache = os.path.join(
        tempfile.gettempdir(),
        f"svs_afp_{tag}_{_hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    if os.path.exists(cache):
        return spark.read.parquet(cache)
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").parquet(cache)
    return spark.read.parquet(cache)


def match_fingerprints(
    probes: DataFrame,
    tracks: DataFrame,
    min_votes: int = 4,
    max_key_df: int = 10000,
) -> DataFrame:
    """Inverted-index match: join on the constellation key, histogram
    the frame offsets, elect the best (track, offset) per probe by
    max-struct (votes, then track_id, then offset — deterministic).
    Output (probe_id, track_id, offset, n_votes), ordered."""
    # barrier: the track fingerprint stage feeds the df-cap count AND
    # the join side — checkpoint so the Arrow stage runs once
    tracks = tracks.localCheckpoint(eager=False)
    df_cap = (
        tracks.groupBy("key")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_key_df)
        .select("key")
    )
    tr = tracks.join(F.broadcast(df_cap), "key", "left_anti").select(
        "key", F.col("doc_id").alias("track_id"), F.col("t").alias("tt")
    )
    votes = (
        probes.select("probe_id", "key", F.col("t").alias("pt"))
        .join(tr, "key")
        .groupBy(
            "probe_id", "track_id", (F.col("tt") - F.col("pt")).alias("offset")
        )
        .agg(F.count(F.lit(1)).alias("n_votes"))
        .filter(F.col("n_votes") >= min_votes)
    )
    best = votes.groupBy("probe_id").agg(
        F.max(F.struct("n_votes", "track_id", "offset")).alias("w")
    )
    return best.select(
        "probe_id",
        F.col("w.track_id").alias("track_id"),
        F.col("w.offset").alias("offset"),
        F.col("w.n_votes").alias("n_votes"),
    ).orderBy("probe_id")


def audio_fingerprint_match(
    spark: SparkSession, sf_dir: str, min_votes: int = 4
) -> DataFrame:
    """Gate shape: constellation-hash matching of the planted probe
    excerpts against the track corpus. Rows-only (md5-keystream
    audio has no SQL twin); planted track+offset recovery pinned in
    tests/test_audiofp.py."""
    return match_fingerprints(
        probe_fingerprints(spark, sf_dir).select("probe_id", "key", "t"),
        track_fingerprints(spark, sf_dir),
        min_votes=min_votes,
    )


# -------------------------------------------- persisted fingerprint store


def build_audiofp_store(fps: DataFrame, path: str) -> int:
    """Materialize audio-dedup state as the on-disk inverted
    constellation index: one parquet table of (key, doc_id, t)
    posting rows — the production form of the match's track side
    (which refingerprinted the corpus per call). Same maintained-
    state pattern as the pHash band store. Returns the row count."""
    e = fps.select("key", "doc_id", "t").localCheckpoint(eager=True)
    n = e.count()
    e.write.mode("overwrite").parquet(f"{path}/postings")
    return n


def screen_audio_against_store(
    spark: SparkSession,
    new_fps: DataFrame,
    path: str,
    min_votes: int = 4,
) -> DataFrame:
    """Screen new clips' fingerprints against the store: inverted-
    index join on the constellation key, offset histogram, vote
    floor, max-struct election. Output (doc_id, is_match, track_id,
    offset, n_votes) for EVERY distinct incoming clip (non-matches
    carry nulls)."""
    new_fps = new_fps.localCheckpoint(eager=False)
    store = spark.read.parquet(f"{path}/postings").select(
        "key", F.col("doc_id").alias("track_id"), F.col("t").alias("tt")
    )
    votes = (
        new_fps.select(F.col("doc_id").alias("probe_id"), "key", F.col("t").alias("pt"))
        .join(store, "key")
        .groupBy(
            "probe_id", "track_id", (F.col("tt") - F.col("pt")).alias("offset")
        )
        .agg(F.count(F.lit(1)).alias("n_votes"))
        .filter(F.col("n_votes") >= min_votes)
    )
    best = votes.groupBy("probe_id").agg(
        F.max(F.struct("n_votes", "track_id", "offset")).alias("w")
    )
    return (
        new_fps.select("doc_id")
        .distinct()
        .join(best, F.col("doc_id") == F.col("probe_id"), "left")
        .select(
            "doc_id",
            F.col("w").isNotNull().alias("is_match"),
            F.col("w.track_id").alias("track_id"),
            F.col("w.offset").alias("offset"),
            F.col("w.n_votes").alias("n_votes"),
        )
        .orderBy("doc_id")
    )


def audiofp_store_upsert(admitted_fps: DataFrame, path: str) -> int:
    """Append an admitted batch's posting rows (duplicates harmless
    for vote semantics only if not re-appended — callers append each
    clip once; periodic compaction rewrites DISTINCT)."""
    e = admitted_fps.select("key", "doc_id", "t").localCheckpoint(eager=True)
    n = e.count()
    e.write.mode("append").parquet(f"{path}/postings")
    return n


def audio_match_store(
    spark: SparkSession, sf_dir: str, min_votes: int = 4
) -> DataFrame:
    """Gate entry: the store-backed serving path — the track corpus
    fingerprinted ONCE into the persisted posting index, the planted
    probe clips screened against it. Must recover exactly what the
    recompute-everything :func:`audio_fingerprint_match` recovers
    (equivalence pinned in tests/test_audiofp.py) while never
    re-reading the audio corpus. Rows-only like its direct twin."""
    import hashlib as _hashlib
    import os
    import tempfile

    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"svs_afpstore_{tag}")
    if not os.path.exists(os.path.join(path, "postings")):
        build_audiofp_store(track_fingerprints(spark, sf_dir), path)
    probes = probe_fingerprints(spark, sf_dir).select("probe_id", "key", "t")
    return screen_audio_against_store(
        spark,
        probes.withColumnRenamed("probe_id", "doc_id"),
        path,
        min_votes=min_votes,
    )
