"""As-of (backward temporal) join — a custom operator Spark lacks.

For every left row, attach the right row with the greatest timestamp
<= the left timestamp within the same key group (the trades/quotes
join). Two implementations with identical semantics:

* :func:`asof_join` — **declarative** (the scale path): tag + union
  both sides, one window over (key, ts) carrying the last non-null
  right payload forward, filter back to left rows. ONE shuffle on the
  group key, no UDF, whole pipeline stays JVM-side; skew follows the
  key distribution exactly like any groupBy.
* :func:`asof_join_cogrouped` — ``cogroup().applyInPandas`` +
  ``pandas.merge_asof`` per key group (Arrow-batched). The imperative
  escape hatch pattern for per-group logic Spark can't express; here
  it exists to cross-check the declarative plan and document the
  cogroup API shape.

Ties: a right row at exactly the left ts IS matched (>= semantics,
``allow_exact_matches`` in pandas, ``ON l.ts >= r.ts`` in DuckDB's
native ASOF JOIN — the oracle). Among equal right timestamps the
highest ``tiebreak`` column value wins (deterministic).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join, declarative. Output: all left columns plus
    ``{prefix}{ts}`` and ``{prefix}{c}`` for each right payload column
    (NULL when the key has no right row at or before the left ts)."""
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (by, ts)
    ]
    payload = [ts] + rcols

    l_tag = left.select(
        F.col(by),
        F.col(ts),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[tiebreak].dataType if tiebreak else "long").alias("__tb"),
        *[F.col(c) for c in left.columns if c not in (by, ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}") for c in payload],
    )
    r_tag = right.select(
        F.col(by),
        F.col(ts),
        F.lit(0).alias("__is_left"),
        (F.col(tiebreak) if tiebreak else F.lit(0).cast("long")).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (by, ts)],
        *[F.col(c).alias(f"{prefix}{c}") for c in payload],
    )
    unioned = l_tag.unionByName(r_tag)

    # right rows sort before left at equal ts (>= semantics); among
    # equal right ts the greatest tiebreak sorts last and wins last()
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("__is_left").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in payload
        ],
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(
            by,
            ts,
            *[c for c in left.columns if c not in (by, ts)],
            *[F.col(f"__carry_{c}").alias(f"{prefix}{c}") for c in payload],
        )
    )


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join via cogroup().applyInPandas + merge_asof.
    Same output schema/semantics as :func:`asof_join`."""
    import pyspark.sql.types as T

    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (by, ts)
    ]
    payload = [ts] + rcols
    out_schema = T.StructType(
        list(left.schema.fields)
        + [
            T.StructField(f"{prefix}{c}", right.schema[c].dataType)
            for c in payload
        ]
    )
    left_cols = list(left.columns)

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if not len(l):
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        l = l.sort_values(ts, kind="stable")
        r = (
            r[[ts] + rcols]
            .sort_values(ts, kind="stable")
            .rename(columns={c: f"{prefix}{c}" for c in [ts] + rcols})
        )
        if not len(r):
            out = l.copy()
            for c in payload:
                out[f"{prefix}{c}"] = None
            return out[[f.name for f in out_schema.fields]]
        merged = pd.merge_asof(
            l,
            r,
            left_on=ts,
            right_on=f"{prefix}{ts}",
            direction="backward",
            allow_exact_matches=True,
        )
        return merged[[f.name for f in out_schema.fields]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, schema=out_schema)
    )


def purchase_attribution(spark, sf_dir: str) -> DataFrame:
    """Attribution query: every purchase event joined as-of to the
    user's most recent click at-or-before it. The canonical as-of
    workload shape (trades/quotes) on the events table."""
    from ..sources.store import load_events

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(purchases, clicks, by="user_id", ts="ts", right_cols=["value"])
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("click_ts"),
        F.col("asof_value").alias("click_value"),
    )
