"""Structured Streaming over the ``events`` table.

The reference has no streaming surface (SURVEY.md §2, deliberately
absent); this is north-star extension scope. The operator is the
classic event-time hourly rollup:

``readStream(parquet) -> [withWatermark] -> groupBy(window(ts, 1h),
event_type) -> count/sum -> memory sink``

Two run modes:

* :func:`hourly_event_counts_stream` — **complete** output mode with
  ``availableNow`` (batch-over-stream): processes the whole table as a
  stream and emits every window, so the result is comparable 1:1 with
  the batch twin / DuckDB oracle.
* :func:`hourly_event_counts_append` — **append** mode with a real
  watermark: only windows the watermark has closed are emitted; the
  tail window stays in state. This is the production shape for
  unbounded sources (late data dropped after the lateness bound);
  tested as a subset-relation against the batch result.

``sum(value)`` goes through DECIMAL(18,6): decimal addition is exact
and order-independent, so the result is bit-stable under any
partitioning/trigger schedule — a floating sum would not be.
"""

from __future__ import annotations

import contextlib
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..sources.store import load_events, table_path

#: shuffle partitions while a stateful streaming query runs. State
#: stores are per (operator x shuffle partition) and their open/commit
#: cost dominates small/medium micro-batches; the right count tracks
#: key cardinality, not CPU count. Batch queries are unaffected — the
#: session conf is restored after the stream finishes.
STREAM_SHUFFLE_PARTITIONS = 8


@contextlib.contextmanager
def _stream_shuffle(spark: SparkSession, n: int = STREAM_SHUFFLE_PARTITIONS):
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events table with ``ts`` normalized to
    TIMESTAMP_NTZ. The file source needs an explicit schema, which must
    match the on-disk layout — and that layout has differed across
    driver rounds (TIMESTAMP(MICROS) vs int64 nanos), so take the
    authoritative schema from a driver-side batch footer read and apply
    the same normalization as ``sources.store.load_events``."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # the streaming file source wants a directory; glob-filter to the
    # events file so sibling tables in sf_dir are not picked up
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # watermarks demand TIMESTAMP (LTZ) event time, so the streaming
    # surface normalizes to LTZ; with session tz pinned UTC the wall
    # clock equals the batch side's NTZ values exactly
    if isinstance(raw_schema["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def _hourly_agg(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hourly_event_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the hourly rollup as a stream (availableNow, complete mode)
    and return the materialized result."""
    name = f"events_hourly_{uuid.uuid4().hex[:8]}"
    with _stream_shuffle(spark):
        q = (
            _hourly_agg(_events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def hourly_event_counts_append(
    spark: SparkSession, sf_dir: str, lateness: str = "1 hour"
) -> DataFrame:
    """Production shape: watermarked append mode. Emits only closed
    windows; the final window(s) within the lateness bound are retained
    in state and not in the output."""
    name = f"events_hourly_append_{uuid.uuid4().hex[:8]}"
    events = _events_stream(spark, sf_dir).withWatermark("ts", lateness)
    with _stream_shuffle(spark):
        q = (
            _hourly_agg(events)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def hourly_event_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming rollup (same plan, batch source)."""
    return _hourly_agg(load_events(spark, sf_dir))


def distinct_pairs_within_watermark_stream(
    spark: SparkSession, sf_dir: str, lateness: str = "1 hour"
) -> DataFrame:
    """Bounded-state streaming dedup: ``dropDuplicatesWithinWatermark``
    keeps one row per (user_id, event_type) while the key's state is
    younger than the watermark delay, then EVICTS it — unlike plain
    ``dropDuplicates`` whose state grows with the key universe forever.
    That eviction bound is what makes streaming dedup survive an
    unbounded source; over a finite availableNow run (single
    micro-batch, no mid-batch eviction) the emitted key set equals
    batch DISTINCT exactly, so the entry keeps a strong SQL oracle.
    Projected to the key columns for determinism (which physical row
    survives is arrival-order-dependent; the key set is not)."""
    name = f"events_distinct_wm_{uuid.uuid4().hex[:8]}"
    with _stream_shuffle(spark):
        q = (
            _events_stream(spark, sf_dir)
            .select("user_id", "event_type", "ts")
            .withWatermark("ts", lateness)
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .select("user_id", "event_type")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def purchase_click_interval_join_stream(
    spark: SparkSession,
    sf_dir: str,
    lateness: str = "1 hour",
    lookback_sql: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """Stream-stream interval join: every purchase joined to the same
    user's clicks in the trailing lookback window — the streaming twin
    of the bucketed range join (operators/temporal.py). Both sides are
    watermarked so the join state is evictable: a buffered click can
    be dropped once the purchase-side watermark passes
    ``click ts + lookback`` (the event-time constraint gives Spark the
    state-cleanup bound; an unconstrained stream-stream join would
    buffer forever). availableNow over a finite source processes one
    micro-batch, so the result equals the batch/SQL interval join
    exactly — hash-gated against the DuckDB twin."""
    name = f"events_ivjoin_{uuid.uuid4().hex[:8]}"
    # both sides derive from ONE stream source (a supported self-join):
    # the file is scanned once per micro-batch instead of twice
    ev = _events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("p_event_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", lateness)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("c_event_id"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
        )
        .withWatermark("c_ts", lateness)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"p_user_id = c_user_id AND "
            f"c_ts >= p_ts - {lookback_sql} AND c_ts <= p_ts"
        ),
        "inner",
    ).select(
        F.col("p_user_id").alias("user_id"),
        "p_event_id",
        "c_event_id",
        "p_ts",
        "c_ts",
        "c_value",
    )
    with _stream_shuffle(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def distinct_user_event_pairs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming stateful dedup: first occurrence of every
    (user_id, event_type) pair, via the built-in ``dropDuplicates`` on
    a stream (state-store-backed exact dedup — the streaming twin of
    exact_dup_groups). Projected to the key columns, the emitted SET
    equals batch DISTINCT regardless of which occurrence arrived
    first, so it has a strong SQL oracle."""
    name = f"events_distinct_{uuid.uuid4().hex[:8]}"
    with _stream_shuffle(spark):
        q = (
            _events_stream(spark, sf_dir)
            .select("user_id", "event_type")
            .dropDuplicates(["user_id", "event_type"])
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def sliding_type_counts_stream(
    spark: SparkSession, sf_dir: str, size: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding-window event counts (size > slide ⇒ overlapping
    windows; each event belongs to size/slide of them) — the trending
    / rate-monitoring shape, distinct from the tumbling hourly rollup.
    availableNow + complete mode, so the drained stream equals the
    batch sliding aggregation exactly (oracle: each event duplicated
    into its size/slide windows, then grouped).

    State per key is (n_windows_open x |event_type|) counters; with a
    watermark (production append mode) the open set is bounded by
    size + lateness. Output (window_start, event_type, n_events)."""
    name = f"events_sliding_{uuid.uuid4().hex[:8]}"
    with _stream_shuffle(spark):
        q = (
            _events_stream(spark, sf_dir)
            .groupBy(F.window("ts", size, slide).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def enriched_nation_counts_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join: the event stream enriched with the customer
    -> nation dimension (user_id = c_custkey), rolled up per (nation,
    event_type). Events with no matching customer keep a NULL nation
    (left join — real click streams always carry unknown users).
    Output (n_name, event_type, n_events, total_value).

    Scale shape: the static side is a dimension (size-gated broadcast
    would apply at the engine layer; here it is joined per micro-batch
    by Catalyst — the stream-static join re-plans each batch, so AQE
    sizes it fresh). State is only the aggregation (bounded by
    |nations| x |event types|), never the join. Drained == the batch
    join+rollup, so this carries a full SQL oracle."""
    from ..sources.store import load_table

    name = f"events_enriched_{uuid.uuid4().hex[:8]}"
    dim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    enriched = _events_stream(spark, sf_dir).join(
        dim, F.col("user_id") == F.col("c_custkey"), "left"
    )
    agg = enriched.groupBy("n_name", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (
            F.round(
                F.sum(F.round(F.col("value"), 6).cast("decimal(20,6)")).cast(
                    "double"
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("total_value"),
    )
    with _stream_shuffle(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
