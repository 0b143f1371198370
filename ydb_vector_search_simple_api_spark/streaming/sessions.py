"""Sessionization + custom stateful streaming over ``events``.

The reference has no streaming surface (SURVEY.md §2); north-star
extension scope. Two operators:

* **Session rollup** — per-user sessions separated by a 30-minute
  event-time gap. Spark-first: the built-in ``F.session_window``
  (batch AND streaming with watermark; state-store-backed merge at
  scale) — not a hand-rolled lag/cumsum. The DuckDB oracle *is* the
  lag/cumsum formulation, which doubles as an independent semantic
  check of the session-merge rule (new session iff the gap to the
  previous event is >= 30 min).
* **Running user history** — a genuinely custom stateful operator via
  ``applyInPandasWithState``: every event is enriched with the count
  and exact running sum of that user's history so far (classic
  stateful feature backfill for training data). State per user is two
  longs; sums are kept in integer micro-units so the result is exact
  and order-stable — bit-identical to a SQL window cumsum oracle, no
  float drift.

Aggregated money-ish sums go through DECIMAL(18,6) (exact,
order-independent) like the hourly rollup in ``events.py``.
"""

from __future__ import annotations

import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.store import load_events
from .events import _events_stream, _stream_shuffle

SESSION_GAP = "30 minutes"


def _session_agg(events: DataFrame) -> DataFrame:
    return (
        events.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def session_rollup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-min-gap sessions (batch). ``session_end`` is the
    built-in convention: last event ts + gap."""
    return _session_agg(load_events(spark, sf_dir))


def session_rollup_append(
    spark: SparkSession, sf_dir: str, lateness: str = "1 hour"
) -> DataFrame:
    """Streaming shape: watermarked session windows, append mode —
    only sessions the watermark has closed are emitted (the tail
    sessions stay in the state store). Tested as a subset-relation
    against the batch twin."""
    name = f"sessions_append_{uuid.uuid4().hex[:8]}"
    events = _events_stream(spark, sf_dir).withWatermark("ts", lateness)
    with _stream_shuffle(spark):
        q = (
            _session_agg(events)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


# ------------------------------------------------ custom stateful op

_RUNNING_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("n_prior", T.LongType()),
        T.StructField("total_micros", T.LongType()),
    ]
)

#: per-user state: events seen, exact sum in micro-units
_RUNNING_STATE = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("sum_micros", T.LongType())]
)


def _to_micros(values: np.ndarray) -> np.ndarray:
    """round(value * 1e6) half-away-from-zero — same double product and
    rounding rule as the DuckDB oracle's ROUND(value * 1e6), so the
    integer running sums are bit-identical across engines."""
    scaled = values * 1e6
    return (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)


def _running_update(key, pdf_iter, state: GroupState):
    (user_id,) = key
    n, sum_micros = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        micros = _to_micros(pdf["value"].to_numpy(dtype=np.float64))
        cum = sum_micros + np.cumsum(micros)
        out = pd.DataFrame(
            {
                "user_id": np.full(len(pdf), user_id, dtype=np.int64),
                "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
                "n_prior": n + np.arange(len(pdf), dtype=np.int64),
                "total_micros": cum,
            }
        )
        n += len(pdf)
        sum_micros = int(cum[-1])
        yield out
    state.update((n, sum_micros))


def user_running_totals_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with its user's running history:
    (user_id, event_id, n_prior, total_micros including this event).

    ``applyInPandasWithState``: state = two longs per user, carried
    across micro-batches; every event is emitted immediately (no
    holdback, so no timeout machinery needed). Within a batch, a
    user's rows are processed in (ts, event_id) order; across batches
    the totals are prefix-correct under event-time-ordered arrival —
    exact for backfill (availableNow over a static table), the mode
    the oracle checks."""
    name = f"running_totals_{uuid.uuid4().hex[:8]}"
    out = (
        _events_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_update,
            _RUNNING_OUT,
            _RUNNING_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    with _stream_shuffle(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


_SESSNO_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("session_no", T.LongType()),
    ]
)

#: per-user state: last event time (micros; -1 = none) and sessions so far
_SESSNO_STATE = T.StructType(
    [T.StructField("last_micros", T.LongType()), T.StructField("n_sessions", T.LongType())]
)

_SESSION_GAP_MICROS = 30 * 60 * 1_000_000


def _sessno_update(key, pdf_iter, state: GroupState):
    (user_id,) = key
    last, n = state.get if state.exists else (-1, 0)
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        micros = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        prev = np.concatenate(([last], micros[:-1]))
        new_flag = (prev < 0) | (micros - prev >= _SESSION_GAP_MICROS)
        sess_no = n + np.cumsum(new_flag.astype(np.int64))
        yield pd.DataFrame(
            {
                "user_id": np.full(len(pdf), user_id, dtype=np.int64),
                "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
                "session_no": sess_no,
            }
        )
        last = int(micros[-1])
        n = int(sess_no[-1])
    state.update((last, n))


def user_session_numbers_stream(
    spark: SparkSession, sf_dir: str, n_shards: int = 4
) -> DataFrame:
    """Second custom stateful operator: per-user SESSION NUMBERING
    across micro-batches. Unlike the running totals (whose backfill
    drains in one batch), the events land as ``n_shards`` time-ordered
    shard drops picked up one per trigger — so the (last_ts,
    n_sessions) state genuinely carries across batches: a session can
    START in one batch and CONTINUE in the next, and the 30-minute gap
    test at each batch boundary reads the previous batch's state.

    Drained result == the batch lag/cumsum sessionization at event
    grain (the oracle runs exactly that), provided arrival is
    time-ordered — which the ascending-ts sharding guarantees. Output
    (user_id, event_id, session_no), session_no counting per user
    from 1.

    Round 12 (guide §2.4 — remove passes; §2.5 — no single-reducer
    global window): the landing used to be fabricated with a global
    ``row_number() OVER (ORDER BY ts, event_id)`` (one-reducer sort of
    every event) + an eager checkpoint + ``n_shards`` sequential
    filter + coalesce(1) write jobs. It now rides the shared
    :func:`write_shard_landing` one-job writer with ascending-``ts``
    quantile cuts. Shard BOUNDARIES move (quantile cuts vs exact
    row-count quartiles), but the drained result is invariant to any
    time-ordered split — the (last_ts, n_sessions) state carries the
    session rule across every boundary, and ``_sessno_update`` sorts
    each batch by (ts, event_id) itself — so the output row set is
    unchanged (shared oracle re-verified)."""
    import os
    import tempfile

    from ..sources.store import load_events
    from .curation_ingest import write_shard_landing

    run = uuid.uuid4().hex[:8]
    base = os.path.join(tempfile.gettempdir(), f"svs_sessno_{run}")
    landing = os.path.join(base, "landing")
    os.makedirs(landing, exist_ok=True)

    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    write_shard_landing(ev, landing, n_shards, order_col="ts")

    schema = ev.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "shard=*"))
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _sessno_update, _SESSNO_OUT, _SESSNO_STATE, "append", GroupStateTimeout.NoTimeout
    )
    name = f"sessno_{uuid.uuid4().hex[:8]}"
    with _stream_shuffle(spark):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
