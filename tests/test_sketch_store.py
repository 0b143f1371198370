"""Persisted HLL sketch store: mergeability algebra + accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import sketch_store as HS
from ydb_vector_search_simple_api_spark.sources.store import load_events

from conftest import SF_SMALL


def _events(spark):
    return load_events(spark, SF_SMALL).select(
        F.to_date("ts").alias("day"), "event_type", "user_id"
    )


def test_fold_equals_rebuild_and_is_idempotent(spark, tmp_path):
    """Union is register-wise max: building from half the data then
    folding the other half in == building from everything; folding the
    SAME batch twice changes nothing."""
    ev = _events(spark)
    first = ev.filter(F.col("user_id") % 2 == 0)
    second = ev.filter(F.col("user_id") % 2 == 1)

    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    HS.build_hll_store(first, inc, ["day", "event_type"], "user_id")
    HS.hll_store_upsert(spark, inc, second, ["day", "event_type"], "user_id")
    HS.build_hll_store(ev, full, ["day", "event_type"], "user_id")

    a = sorted(
        tuple(r)
        for r in HS.hll_store_estimate(spark, inc, ["day", "event_type"]).collect()
    )
    b = sorted(
        tuple(r)
        for r in HS.hll_store_estimate(spark, full, ["day", "event_type"]).collect()
    )
    assert a == b

    HS.hll_store_upsert(spark, inc, second, ["day", "event_type"], "user_id")
    c = sorted(
        tuple(r)
        for r in HS.hll_store_estimate(spark, inc, ["day", "event_type"]).collect()
    )
    assert c == a  # replay no-op


def test_rollup_union_equals_direct_sketch(spark, tmp_path):
    """Per-day estimates from unioned (day, type) registers equal
    sketching the raw per-day stream — identical, not approximate."""
    ev = _events(spark)
    fine = str(tmp_path / "fine")
    coarse = str(tmp_path / "coarse")
    HS.build_hll_store(ev, fine, ["day", "event_type"], "user_id")
    HS.build_hll_store(ev, coarse, ["day"], "user_id")
    a = sorted(
        tuple(r) for r in HS.hll_rollup_estimate(spark, fine, ["day"]).collect()
    )
    b = sorted(
        tuple(r) for r in HS.hll_store_estimate(spark, coarse, ["day"]).collect()
    )
    assert a == b


def test_daily_estimates_within_bound(spark):
    rows = HS.daily_user_sketches(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert abs(r.n_distinct_est - r.n_users_exact) <= max(
            2, 0.05 * r.n_users_exact
        )


def test_hist_store_fold_equals_rebuild_exactly(spark, tmp_path):
    """Integer bucket counts: build-on-half + fold == build-on-all,
    bit for bit, under FIXED bin geometry; quantile serving equals the
    one-shot computation when bounds match."""
    from ydb_vector_search_simple_api_spark.operators import hist_store as H
    from ydb_vector_search_simple_api_spark.operators.stats import (
        histogram_quantiles,
    )

    ev = load_events(spark, SF_SMALL).select("event_type", "value")
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).head()
    lo, hi = float(b.lo), float(b.hi)

    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    first = ev.filter(F.col("value") < (lo + hi) / 2)
    second = ev.filter(~(F.col("value") < (lo + hi) / 2))
    H.build_hist_store(first, inc, ["event_type"], "value", lo, hi, 1000)
    H.hist_store_upsert(spark, inc, second)
    H.build_hist_store(ev, full, ["event_type"], "value", lo, hi, 1000)

    a = sorted(tuple(r) for r in spark.read.parquet(inc).collect())
    c = sorted(tuple(r) for r in spark.read.parquet(full).collect())
    assert a == c  # exact fold, raw counts

    served = sorted(
        tuple(r) for r in H.hist_store_quantiles(spark, full).collect()
    )
    oneshot = sorted(
        tuple(r) for r in histogram_quantiles(spark, SF_SMALL).collect()
    )
    assert served == oneshot


def test_hist_store_upsert_clamps_out_of_range_batches(spark, tmp_path):
    """Regression: a fold batch containing values BELOW the stored lo
    must clamp to bucket 0 (not a negative index), mirroring the
    upper-edge clamp — the documented fixed-histogram contract. The
    served quantile edges therefore stay within [lo, hi]."""
    from ydb_vector_search_simple_api_spark.operators import hist_store as H

    base = spark.createDataFrame(
        [("a", float(v)) for v in range(10, 110)], ["event_type", "value"]
    )
    store = str(tmp_path / "clamp")
    H.build_hist_store(base, store, ["event_type"], "value", lo=10.0, hi=110.0,
                       n_buckets=100)
    # batch entirely out of range on BOTH sides
    wide = spark.createDataFrame(
        [("a", -500.0), ("a", -1.0), ("a", 9.999), ("a", 500.0)],
        ["event_type", "value"],
    )
    H.hist_store_upsert(spark, store, wide)
    buckets = [r.b for r in spark.read.parquet(store).collect()]
    assert min(buckets) == 0 and max(buckets) <= 99
    # below-lo mass landed in bucket 0: count there is 1 (base) + 3 (clamped)
    b0 = [r.c for r in spark.read.parquet(store).filter(F.col("b") == 0).collect()]
    assert b0 == [4]
    served = H.hist_store_quantiles(spark, store).head()
    assert 10.0 <= served.p50 <= 110.0 and 10.0 <= served.p99 <= 110.0
