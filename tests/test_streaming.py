"""Structured Streaming rollup vs its batch twin."""

from __future__ import annotations

from ydb_vector_search_simple_api_spark.streaming import events as SE

from conftest import SF_SMALL


def _keyed(rows):
    return {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in rows}


def test_stream_complete_equals_batch(spark):
    stream = _keyed(SE.hourly_event_counts_stream(spark, SF_SMALL).collect())
    batch = _keyed(SE.hourly_event_counts_batch(spark, SF_SMALL).collect())
    assert stream == batch
    assert len(batch) > 100


def test_stream_append_is_closed_window_subset(spark):
    """Append mode emits only watermark-closed windows: a strict subset
    of the batch result, missing (at least) the final window."""
    append = _keyed(SE.hourly_event_counts_append(spark, SF_SMALL).collect())
    batch = _keyed(SE.hourly_event_counts_batch(spark, SF_SMALL).collect())
    assert set(append) < set(batch)
    for k, v in append.items():
        assert v == batch[k]
    latest_emitted = max(w for (w, _) in append) if append else None
    latest_batch = max(w for (w, _) in batch)
    assert latest_emitted is None or latest_emitted < latest_batch


def test_distinct_within_watermark_equals_batch_distinct(spark):
    """Single availableNow micro-batch: no mid-run state eviction, so
    the bounded-state dedup's key set equals batch DISTINCT."""
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    got = {
        (r.user_id, r.event_type)
        for r in SE.distinct_pairs_within_watermark_stream(spark, SF_SMALL).collect()
    }
    want = {
        (r.user_id, r.event_type)
        for r in load_events(spark, SF_SMALL).select("user_id", "event_type").distinct().collect()
    }
    assert got == want
    assert len(want) > 50


def test_interval_join_stream_equals_batch_join(spark):
    """Stream-stream interval join over availableNow == the batch
    interval join (same predicate, plain DataFrame join)."""
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.sources.store import load_events

    got = {
        (r.p_event_id, r.c_event_id)
        for r in SE.purchase_click_interval_join_stream(spark, SF_SMALL).collect()
    }
    ev = load_events(spark, SF_SMALL)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pe"), F.col("ts").alias("pt")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("ce"), F.col("ts").alias("ct")
    )
    want = {
        (r.pe, r.ce)
        for r in p.join(
            c,
            F.expr("pu = cu AND ct >= pt - INTERVAL 1 HOUR AND ct <= pt"),
            "inner",
        ).collect()
    }
    assert got == want
    assert len(want) > 0


def test_sliding_window_counts_match_batch(spark):
    from ydb_vector_search_simple_api_spark.streaming import events as SE
    from ydb_vector_search_simple_api_spark.sources.store import load_events
    from pyspark.sql import functions as F
    from conftest import SF_SMALL

    got = {
        (r.window_start, r.event_type): r.n_events
        for r in SE.sliding_type_counts_stream(spark, SF_SMALL).collect()
    }
    ev = load_events(spark, SF_SMALL).select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    batch = (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = {(r.w.start, r.event_type): r.n for r in batch}
    assert got == want


def test_curation_ingest_equals_batch_election(spark):
    """Drained continuous curation == batch quality + first-occurrence
    election; no duplicate hashes survive; later-arriving dup is
    rejected by the accumulated state."""
    from pyspark.sql import functions as F
    from ydb_vector_search_simple_api_spark.functions import text as TXT
    from ydb_vector_search_simple_api_spark.sources.store import load_documents
    from ydb_vector_search_simple_api_spark.streaming import curation_ingest as CI
    from conftest import SF_SMALL

    got = {
        (r.doc_id, r.content_hash)
        for r in CI.stream_curation_ingest(spark, SF_SMALL, n_shards=4).collect()
    }
    d = load_documents(spark, SF_SMALL)
    passing = d.filter(
        (F.round(TXT.quality_score("text"), 6) + F.lit(0.0) >= 0.8)
        & (TXT.token_count("text") >= 16)
    ).select("doc_id", TXT.content_fingerprint("text").alias("h"))
    want = {
        (r.doc_id, r.h)
        for r in passing.groupBy("h").agg(F.min("doc_id").alias("doc_id")).select("doc_id", "h").collect()
    }
    assert got == want
    hashes = [h for _, h in got]
    assert len(hashes) == len(set(hashes))


def test_stream_static_enrich_equals_batch(spark):
    """Drained stream-static join == the batch join+rollup; unmatched
    users keep NULL nation (left-join contract)."""
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.sources.store import (
        load_events,
        load_table,
    )
    from ydb_vector_search_simple_api_spark.streaming import events as SE

    got = sorted(
        tuple(r)
        for r in SE.enriched_nation_counts_stream(spark, SF_SMALL).collect()
    )
    dim = (
        load_table(spark, SF_SMALL, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            load_table(spark, SF_SMALL, "nation").select(
                "n_nationkey", "n_name"
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    want = sorted(
        tuple(r)
        for r in load_events(spark, SF_SMALL)
        .join(dim, F.col("user_id") == F.col("c_custkey"), "left")
        .groupBy("n_name", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (
                F.round(
                    F.sum(
                        F.round(F.col("value"), 6).cast("decimal(20,6)")
                    ).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("total_value"),
        )
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_stream_decontaminate_equals_batch(spark):
    """Drained on-arrival contamination flags == the batch
    decontaminate output (stateless per batch by construction — the
    benchmark is static, so each doc's containment is independent of
    arrival order and batch boundaries)."""
    from ydb_vector_search_simple_api_spark.operators.curation import (
        decontaminate_documents,
    )
    from ydb_vector_search_simple_api_spark.streaming import curation_ingest as CI
    from conftest import SF_SMALL

    got = {
        (r.doc_id, r.bench_id, r.n_common, r.containment)
        for r in CI.stream_decontaminate_ingest(
            spark, SF_SMALL, n_shards=3
        ).collect()
    }
    want = {
        (r.doc_id, r.bench_id, r.n_common, r.containment)
        for r in decontaminate_documents(spark, SF_SMALL).collect()
    }
    assert got == want


def test_stream_heavy_hitters_drained_equals_batch(spark):
    """MG summary folded across micro-batches == the batch two-pass
    heavy hitters == the direct top-k (mergeable-summaries property),
    and the per-batch snapshots respect the capacity bound."""
    import glob
    import os

    from ydb_vector_search_simple_api_spark.operators.textual import (
        token_frequencies,
    )
    from ydb_vector_search_simple_api_spark.streaming.sketch_ingest import (
        stream_heavy_hitters,
    )

    got = [
        tuple(r)
        for r in stream_heavy_hitters(
            spark, SF_SMALL, k=25, capacity=64, n_shards=3
        ).collect()
    ]
    exact = [tuple(r) for r in token_frequencies(spark, SF_SMALL, top_n=25).collect()]
    assert got == exact
    # snapshots: every state file holds <= capacity rows
    for d in glob.glob(os.path.join("/tmp", "svs_hh_*", "state", "batch=*")):
        assert spark.read.parquet(d).count() <= 64


def test_stream_drift_monitor_drained_equals_batch(spark):
    """Per-batch PSI scored on arrival == the same per-shard PSI
    computed in batch mode over statically-derived shards; the
    stationary driver testdata stays under a loose drift bar."""
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.sources.store import load_events
    from ydb_vector_search_simple_api_spark.streaming import sketch_ingest as SK

    got = SK.stream_drift_monitor(spark, SF_SMALL, n_shards=3).collect()
    assert len(got) == 3
    assert sum(r.n_events for r in got) > 0

    # batch replay: same reference window, same bins, same shard cuts
    ev = load_events(spark, SF_SMALL)
    mid = ev.agg(
        F.timestamp_seconds(
            (F.unix_timestamp(F.min("ts")) + F.unix_timestamp(F.max("ts"))) / 2
        ).alias("mid")
    ).head()
    ref = ev.filter(F.col("ts") < F.lit(mid.mid)).select("event_id", "value")
    arr = ev.filter(F.col("ts") >= F.lit(mid.mid)).select("event_id", "value")
    rb = ref.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).head()
    lo, hi = float(rb.lo), float(rb.hi)
    width = (hi - lo) / 10.0
    ref_counts = {
        r.cell: r.c
        for r in SK._batch_cell_counts(ref, lo, width, 10)
        .filter(F.col("cell") >= 0)
        .collect()
    }
    cuts = list(
        arr.select(F.percentile_approx("event_id", [1 / 3, 2 / 3], 10_000).alias("c"))
        .head()
        .c
    )
    shards = [
        arr.filter(F.col("event_id") <= F.lit(cuts[0])),
        arr.filter(
            (F.col("event_id") > F.lit(cuts[0])) & (F.col("event_id") <= F.lit(cuts[1]))
        ),
        arr.filter(F.col("event_id") > F.lit(cuts[1])),
    ]
    for row, shard in zip(sorted(got, key=lambda r: r.batch_id), shards):
        cnt = {
            r.cell: r.c
            for r in SK._batch_cell_counts(shard, lo, width, 10).collect()
        }
        expect = SK._psi_from_counts(
            ref_counts, {k: v for k, v in cnt.items() if k >= 0}
        )
        assert row.psi == expect
        assert row.n_events == shard.count()
        assert row.psi < 0.5  # stationary stream: no alarm
