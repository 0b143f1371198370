"""As-of join: declarative union+window vs cogrouped merge_asof."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators.asof import (
    asof_join,
    asof_join_cogrouped,
    purchase_attribution,
)

from conftest import SF_SMALL


def _ts(s):
    return datetime.fromisoformat(s)


def _toy(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (1, _ts("2024-01-01T12:00:00"), 101),
            (2, _ts("2024-01-01T09:00:00"), 200),  # before any right row
            (3, _ts("2024-01-01T10:00:00"), 300),  # key with no right rows
        ],
        ["user_id", "ts", "event_id"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 1.0),  # exact tie -> matched
            (1, _ts("2024-01-01T11:30:00"), 2.0),
            (2, _ts("2024-01-01T09:30:00"), 3.0),  # after the only left row
        ],
        ["user_id", "ts", "value"],
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _toy(spark)
    got = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof_join(left, right).collect()
    }
    assert got[100] == (_ts("2024-01-01T10:00:00"), 1.0)  # exact-tie match
    assert got[101] == (_ts("2024-01-01T11:30:00"), 2.0)  # latest prior
    assert got[200] == (None, None)  # right row exists but is later
    assert got[300] == (None, None)  # no right rows at all


def test_cogrouped_matches_declarative_toy(spark):
    left, right = _toy(spark)
    a = sorted(map(tuple, asof_join(left, right).collect()))
    b = sorted(map(tuple, asof_join_cogrouped(left, right).collect()))
    assert a == b


def test_cogrouped_matches_declarative_events(spark):
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    ev = load_events(spark, SF_SMALL)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    a = sorted(map(tuple, asof_join(purchases, clicks).collect()))
    b = sorted(map(tuple, asof_join_cogrouped(purchases, clicks).collect()))
    assert a == b
    assert len(a) == purchases.count()


def test_purchase_attribution_columns(spark):
    out = purchase_attribution(spark, SF_SMALL)
    assert out.columns == ["event_id", "user_id", "ts", "click_ts", "click_value"]
