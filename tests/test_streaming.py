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
