"""Skewed-key join mitigation: salting.

First resort at scale is AQE's skew-join handling
(``spark.sql.adaptive.skewJoin.enabled``, on by default here), which
splits oversized partitions at runtime. Salting is the explicit
fallback for when AQE can't help: e.g. a single key so hot that even a
split partition's build side overflows, or a non-AQE environment.

Shape: the big (skewed) side gets a deterministic per-row salt in
[0, n_salt); the medium side (too big to broadcast, small enough to
replicate n_salt times) is exploded once per salt value. The join key
becomes (key, salt), so one hot key's rows spread over n_salt tasks.
Row-for-row identical output to the unsalted join for inner/left/
left_semi/left_anti joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUPPORTED = {"inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"}


def salted_join(
    big: DataFrame,
    medium: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    n_salt: int = 16,
) -> DataFrame:
    """Join ``big`` (skewed) with ``medium`` on equi-key(s), salted.

    ``medium`` is replicated ``n_salt`` times — size the salt so
    n_salt * |medium| stays shuffle-friendly. The salt on the big side
    is a deterministic hash of the whole row (stable under task
    retries, unlike rand()); duplicate rows share a salt, which only
    matters if a hot key's rows are all byte-identical.
    """
    if how not in _SUPPORTED:
        raise ValueError(
            f"salted_join supports {sorted(_SUPPORTED)}; replicating the "
            f"right side breaks {how!r} semantics"
        )
    keys = [on] if isinstance(on, str) else list(on)

    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    )
    salted_med = medium.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    joined = salted_big.join(salted_med, keys + ["__salt"], how)
    return joined.drop("__salt")


def key_skew_report(spark, sf_dir: str, top_n: int = 20):
    """Shuffle-skew diagnosis over the events fact table: the heavy
    hitters of the natural join/agg key (user_id) with their share of
    total rows — the table you read before deciding to salt a join.

    One keyed count with map-side combine; the share/rank pass runs
    on the aggregated (distinct keys)-sized table with the scalar
    total broadcast. Output (user_id, n_events, share, rk) for the
    ``top_n`` heaviest keys, share = ROUND(n/total, 6)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..sources.store import load_events

    ev = load_events(spark, sf_dir).select("user_id")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    total = counts.agg(F.sum("n_events").alias("tot"))
    w = Window.orderBy(F.col("n_events").desc(), F.col("user_id").asc())
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n_events",
            (
                F.round(F.col("n_events").cast("double") / F.col("tot").cast("double"), 6)
                + F.lit(0.0)
            ).alias("share"),
        )
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= top_n)
    )


def salted_user_rollup(spark, sf_dir: str, n_salt: int = 8):
    """Two-phase (salted) aggregation — the skewed-GROUP-BY mitigation:
    phase 1 aggregates on (key, salt) so one hot key's rows spread over
    ``n_salt`` reducers; phase 2 merges the ≤ n_salt partials per key.
    Decimal partial sums make the merge exact, so the result is
    row-identical to the direct groupBy (which is exactly what the
    oracle runs — the gate proves the rewrite safe).

    Spark's hash aggregate already does map-side partials; explicit
    salting matters when a single reducer key still overflows (the
    1-billion-events-one-user case). Output (user_id, n_events,
    sum_value)."""
    from ..sources.store import load_events

    ev = load_events(spark, sf_dir).select("user_id", "value")
    salt = F.pmod(F.xxhash64("user_id", "value"), F.lit(n_salt))
    phase1 = (
        ev.withColumn("_salt", salt)
        .groupBy("user_id", "_salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
        )
    )
    return (
        phase1.groupBy("user_id")
        .agg(
            F.sum("pn").cast("bigint").alias("n_events"),
            (F.round(F.sum("pv").cast("double"), 6) + F.lit(0.0)).alias("sum_value"),
        )
    )
