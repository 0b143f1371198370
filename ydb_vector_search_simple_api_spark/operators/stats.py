"""Distribution statistics and set-operation cohorts over ``events``.

Extension scope (the reference has no aggregation surface —
SURVEY.md §2 "deliberately absent"): exact percentiles, sketch-based
approximate distinct counts, and INTERSECT/EXCEPT cohort analysis —
the profiling queries a data pipeline runs before and after a filter
stage.

Scale notes:

* ``value_percentiles`` uses Spark's exact ``percentile`` aggregate,
  grouped by a low-cardinality key — one shuffle, per-group state is
  the value multiset. For 100 TB one would switch to
  ``approx_percentile`` (KLL-style mergeable sketch, bounded state) —
  provided here as ``approx_value_percentiles`` with the exact form
  as its accuracy oracle (rows-only in the driver gate, since the
  sketch is engine-specific by design).
* ``approx_distinct_users`` is HyperLogLog++ (mergeable, fixed-size
  state) next to the exact distinct count so the relative error is
  visible in the output; at scale the exact column is the one you
  drop.
* ``retention_cohorts`` runs set ops over DISTINCT user sets — Spark
  plans INTERSECT/EXCEPT as aggregates over the union, one shuffle
  keyed by user_id, no row explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.store import load_events

PCTS = (0.5, 0.9, 0.99)

WEEK1_END = "2024-01-08 00:00:00"
WEEK4_START = "2024-01-24 00:00:00"


def _r(col) -> F.Column:
    return F.round(col, 6) + F.lit(0.0)


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of ``value`` per event_type (linear
    interpolation — the same definition as the oracle's
    ``quantile_cont``)."""
    ev = load_events(spark, sf_dir)
    pct = F.percentile("value", F.lit(list(PCTS)))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r(pct[0]).alias("p50"),
            _r(pct[1]).alias("p90"),
            _r(pct[2]).alias("p99"),
        )
    )


def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch path for the same query: ``approx_percentile`` with
    bounded, mergeable per-group state — what replaces the exact
    aggregate at 100 TB. Driver gate: rows-only (sketch output is
    engine-specific); accuracy is asserted against the exact form in
    tests/test_temporal_stats.py."""
    ev = load_events(spark, sf_dir)
    pct = F.approx_percentile("value", F.lit(list(PCTS)), F.lit(10000))
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r(pct[0]).alias("p50"),
            _r(pct[1]).alias("p90"),
            _r(pct[2]).alias("p99"),
        )
    )


def distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event_type (the oracle-checked
    ground truth for the HLL variant)."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users")
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event_type, side-by-side with
    the exact count and the realized relative error. The sketch is
    the 100 TB path: fixed-size mergeable state instead of a
    per-group hash set. Rows-only in the driver gate (HLL estimates
    are engine-specific); the rel_err column makes accuracy
    self-evident.

    Formulation: aggregate over the pre-distinct (event_type, user_id)
    pairs — HLL over a deduped input yields the identical estimate
    (the sketch only sees the distinct hash set), the exact count
    becomes a plain count, and mixing distinct + non-distinct
    aggregates in one groupBy (which forces a double-phase plan) is
    avoided. rsd=0.02: register count scales 1/rsd², so 0.02 is a 4x
    smaller sketch than 0.01 while staying well inside the 5% test
    envelope."""
    ev = load_events(spark, sf_dir)
    return (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_hll"),
            F.count(F.lit(1)).alias("n_users_exact"),
        )
        .select(
            "event_type",
            "n_users_hll",
            "n_users_exact",
            _r(
                F.abs(F.col("n_users_hll") - F.col("n_users_exact"))
                / F.col("n_users_exact").cast("double")
            ).alias("rel_err"),
        )
    )


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation cohorts: users active in week 1 vs week 4 of the
    event range — INTERSECT (retained), EXCEPT (churned), EXCEPT the
    other way (new). One labeled row per (user, cohort)."""
    ev = load_events(spark, sf_dir)
    w1 = (
        ev.filter(F.col("ts") < F.lit(WEEK1_END).cast("timestamp_ntz"))
        .select("user_id")
        .distinct()
    )
    w4 = (
        ev.filter(F.col("ts") >= F.lit(WEEK4_START).cast("timestamp_ntz"))
        .select("user_id")
        .distinct()
    )
    retained = w1.intersect(w4).withColumn("cohort", F.lit("retained"))
    churned = w1.subtract(w4).withColumn("cohort", F.lit("churned"))
    new = w4.subtract(w1).withColumn("cohort", F.lit("new"))
    return retained.unionByName(churned).unionByName(new)


def props_k_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``k`` out of the ``props`` JSON
    column (``get_json_object`` — JVM-side, no Python in the path) and
    aggregate per event type. The pattern every event pipeline needs:
    schema-on-read over a JSON payload column without a pre-parse pass.
    At scale the extraction is a narrow projection fused into the scan;
    the aggregation shuffles only event_type-many partials."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )
