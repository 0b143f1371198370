"""Sessionization + custom stateful running totals."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.sources.store import load_events
from ydb_vector_search_simple_api_spark.streaming import sessions

from conftest import SF_SMALL


def test_session_rollup_matches_lag_cumsum_twin(spark):
    """The built-in session_window must agree with the explicit
    lag/cumsum formulation (the oracle's semantics) inside Spark."""
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in sessions.session_rollup_batch(spark, SF_SMALL).collect()
    }

    ev = load_events(spark, SF_SMALL)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") >= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("new_s").over(w))
    twin = (
        flagged.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .collect()
    )
    assert len(twin) == len(got)
    for r in twin:
        end, n, sv = got[(r.user_id, r.session_start)]
        assert (end, n) == (r.session_end, r.n_events)
        assert abs(sv - r.sum_value) < 1e-9


def test_session_append_is_subset_of_batch(spark):
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessions.session_rollup_batch(spark, SF_SMALL).collect()
    }
    append = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessions.session_rollup_append(spark, SF_SMALL).collect()
    ]
    assert append, "watermarked append emitted nothing"
    assert set(append) <= batch


def test_running_totals_match_window_cumsum(spark):
    """applyInPandasWithState output == Spark window cumsum over the
    same integer micro-units (exact equality, no float tolerance)."""
    got = {
        r.event_id: (r.user_id, r.n_prior, r.total_micros)
        for r in sessions.user_running_totals_stream(spark, SF_SMALL).collect()
    }

    ev = load_events(spark, SF_SMALL)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    micros = F.round(F.col("value") * 1e6).cast("bigint")
    twin = ev.select(
        "user_id",
        "event_id",
        (F.count(F.lit(1)).over(w) - 1).alias("n_prior"),
        F.sum(micros).over(w).alias("total_micros"),
    ).collect()
    assert len(twin) == len(got)
    for r in twin:
        assert got[r.event_id] == (r.user_id, r.n_prior, r.total_micros), r.event_id


def test_session_numbers_state_spans_batches(spark):
    """With 4 one-file triggers, a user's numbering must CONTINUE
    across batch boundaries (state carry), and the drained result must
    equal the batch lag/cumsum sessionization."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from ydb_vector_search_simple_api_spark.sources.store import load_events
    from ydb_vector_search_simple_api_spark.streaming import sessions as SS
    from conftest import SF_SMALL

    got = {
        (r.user_id, r.event_id): r.session_no
        for r in SS.user_session_numbers_stream(spark, SF_SMALL, n_shards=4).collect()
    }
    ev = load_events(spark, SF_SMALL).select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") - F.lag("ts").over(w) >= F.expr("interval 30 minutes")),
        1,
    ).otherwise(0)
    want = {
        (r.user_id, r.event_id): r.sn
        for r in ev.withColumn("n", new_s)
        .withColumn("sn", F.sum("n").over(run))
        .collect()
    }
    assert got == want
    # numbering starts at 1 and is contiguous per user
    by_user = {}
    for (u, _), sn in got.items():
        by_user.setdefault(u, set()).add(sn)
    for sns in by_user.values():
        assert min(sns) == 1 and max(sns) == len(sns)
