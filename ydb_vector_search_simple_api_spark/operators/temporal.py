"""Temporal operators over the ``events`` table: gaps-and-islands,
point-in-interval range join, and gap-filled resampling with LOCF.

Extension scope (the reference has no time-series surface —
SURVEY.md §2 "deliberately absent"); these are the interval/resample
primitives a time-series or attribution pipeline needs, each shaped
for scale:

* Bucket aggregation is a plain groupBy — map-side combinable, one
  shuffle keyed by (calendar-bounded) bucket.
* The islands / grid windows run over BUCKET rows, never raw events:
  their cardinality is bounded by the calendar span (buckets per
  month), not by data volume, so the unpartitioned sort stays O(kB)
  at 100 TB of events.
* The range join has NO equality key — the naive Spark plan is a
  BroadcastNestedLoopJoin over every (event, interval) pair. The
  scale path quantizes: explode each interval into its covered
  buckets (intervals are bucket-aligned), broadcast that tiny table,
  and equi-join on the event's bucket. Facts never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.store import load_events

BUCKET_S = 600  # 10-minute buckets

DEC = "decimal(18,6)"
ROUND = 6


def _bucket(ts_col) -> F.Column:
    """Floor a timestamp to the 10-minute bucket boundary via integer
    epoch math (identical formulation in the DuckDB oracle — no
    engine-specific truncation semantics in play)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.timestamp_seconds(
        (F.unix_timestamp(c) - F.unix_timestamp(c) % BUCKET_S)
    ).cast("timestamp_ntz")


def surge_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal high-activity intervals: 10-minute buckets whose event
    count exceeds 2x the mean nonempty-bucket count, merged into
    contiguous islands (gaps-and-islands via lag + running sum).

    The surge test is exact integer arithmetic
    (``cnt * n_buckets > 2 * total``) — no float threshold to drift
    between engines. Output: one row per island with its half-open
    [window_start, window_end) extent."""
    ev = load_events(spark, sf_dir)
    buckets = ev.groupBy(_bucket("ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"), F.sum("cnt").alias("total")
    )
    surge = (
        buckets.crossJoin(F.broadcast(totals))
        .filter(F.col("cnt") * F.col("n_buckets") > 2 * F.col("total"))
        .select("bucket", "cnt")
    )
    # islands: a window over surge buckets only — cardinality bounded
    # by the calendar (<= 4464 buckets/month), safe unpartitioned
    w_ord = Window.orderBy("bucket")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = surge.select(
        "bucket",
        "cnt",
        F.when(
            F.col("bucket") - F.expr(f"interval {BUCKET_S} seconds")
            == F.lag("bucket").over(w_ord),
            0,
        )
        .otherwise(1)
        .alias("brk"),
    )
    islands = flagged.select(
        "bucket", "cnt", F.sum("brk").over(w_run).alias("island")
    )
    return (
        islands.groupBy("island")
        .agg(
            F.min("bucket").alias("window_start"),
            (
                F.max("bucket") + F.expr(f"interval {BUCKET_S} seconds")
            ).alias("window_end"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("cnt").alias("n_events"),
        )
        .drop("island")
    )


def events_in_surges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: every event landing inside a
    surge window, aggregated per window.

    There is no equality key — logically this is
    ``e.ts >= s.window_start AND e.ts < s.window_end`` (the oracle
    runs exactly that). Executing the inequality join directly is a
    nested-loop; instead each interval is exploded into its covered
    10-minute buckets (intervals are bucket-aligned by construction),
    the exploded table is broadcast, and events equi-join on their
    own bucket. The fact scan never shuffles; one map-side-combinable
    groupBy produces the per-window rollup."""
    surges = surge_windows(spark, sf_dir)
    expl = surges.select(
        "window_start",
        "window_end",
        F.explode(
            F.expr(
                "sequence(window_start,"
                f" window_end - interval {BUCKET_S} seconds,"
                f" interval {BUCKET_S} seconds)"
            )
        ).alias("bucket"),
    )
    ev = load_events(spark, sf_dir).select(
        _bucket("ts").alias("bucket"), "ts", "value"
    )
    joined = ev.join(F.broadcast(expl), "bucket").filter(
        (F.col("ts") >= F.col("window_start"))
        & (F.col("ts") < F.col("window_end"))
    )
    return joined.groupBy("window_start", "window_end").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 6)
            + F.lit(0.0)
        ).alias("total_value"),
    )


def hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample per event_type: every (type, hour)
    cell of the full calendar grid, zero-filled counts, and the hourly
    mean value carried forward over empty hours (LOCF).

    The grid is generated (types x sequence(min_hour..max_hour)), so
    empty hours exist as rows — a plain groupBy can't produce them.
    Both the grid and the LOCF window scale with calendar-hours x
    types, not with event volume; the only full-data pass is the
    map-side-combinable hourly aggregation. Mean is an exact decimal
    sum divided by the count, rounded BEFORE the carry — the oracle
    (DuckDB, ``last_value IGNORE NULLS``) rounds identically, so
    carried values compare bit-equal."""
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        (
            F.round(
                F.sum(F.col("value").cast(DEC)).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("avg_value"),
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(h0, h1, interval 1 hour)")
            ).alias("hour"),
        )
    )
    filled = grid.join(F.broadcast(hourly), ["event_type", "hour"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "event_type",
        "hour",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("n_events"),
        F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_locf"),
    )


def bucket_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over the 10-minute event-count
    series: each bucket scored against the TRAILING 6 buckets
    (excluded current), flagged when |z| > 3 — the ops-monitoring twin
    of ``surge_windows``' global threshold (local context instead of a
    corpus constant, so level shifts don't mask local spikes).

    Engine-exact float contract: the window aggregates are INTEGER
    sums (Σc, Σc²), so mean/variance derive from exact integers with
    one explicit double expression each — no accumulation-order drift
    between Spark and DuckDB window implementations. z's numerator is
    the exact integer ``6·cnt − Σc``. The ordered window is over
    calendar-bounded nonempty buckets (same cardinality argument as
    surge_windows). Output: (bucket, cnt, z6, is_anomaly) for buckets
    with a full 6-bucket history."""
    ev = load_events(spark, sf_dir)
    buckets = ev.groupBy(_bucket("ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("bucket").rowsBetween(-6, -1)
    s1 = F.sum("cnt").over(w)
    s2 = F.sum(F.col("cnt") * F.col("cnt")).over(w)
    n = F.count(F.lit(1)).over(w)
    # exact-integer variance numerator: 6*Σc² − (Σc)²; /30 = n*(n−1)
    var = (F.lit(6) * s2 - s1 * s1).cast("double") / F.lit(30.0)
    sigma = F.sqrt(var)
    z = F.when(
        sigma > 0.0,
        (F.lit(6) * F.col("cnt") - s1).cast("double") / (F.lit(6.0) * sigma),
    )
    return (
        buckets.select(
            "bucket",
            "cnt",
            n.alias("n_hist"),
            (F.round(z, ROUND) + F.lit(0.0)).alias("z6"),
        )
        .filter(F.col("n_hist") == 6)
        .select(
            "bucket",
            "cnt",
            "z6",
            F.when(F.abs(F.col("z6")) > 3.0, 1).otherwise(0).alias("is_anomaly"),
        )
        .orderBy("bucket")
    )


FUNNEL_STEPS: tuple[str, ...] = ("signup", "view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: how many users complete each prefix of
    signup → view → click → purchase IN ORDER (each step strictly
    after the previous one's first qualifying occurrence — the
    standard product-analytics conversion funnel).

    Shape: one conditional-min aggregation per user computes the
    earliest qualifying timestamp per step via an iterated
    min-over-filter (step i's candidates are events after the user's
    step-i−1 time) — expressed as a sequence of per-user scalar
    aggregations on ONE grouped pass (no joins, no window): step times
    are derived inside a single ``groupBy(user_id)`` using min(CASE)
    chains over collected (type, ts) structs. Per-user state is the
    event multiset — bounded by user activity, Arrow-free. Output: one
    row per funnel prefix (step, n_users, conversion_pct vs step 1).
    """
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts")
    # per user: earliest ts of step0; then earliest later ts of step1; ...
    per_user = ev.groupBy("user_id").agg(
        F.collect_list(F.struct("event_type", "ts")).alias("evs")
    )
    # chained selects: t_i references t_{i-1} as a materialized column
    # (a lambda can reference an OUTER attribute, but not another HOF
    # expression from the same projection — no let-binding in Catalyst)
    def _step_pred(st, prev_col):
        # factory: PySpark derives the lambda ARITY from the Python
        # signature, so closures must come from an enclosing scope,
        # never default args
        if prev_col is None:
            return lambda s: s.event_type == F.lit(st)
        return lambda s: (s.event_type == F.lit(st)) & (s.ts > prev_col)

    wide = per_user
    for i, step in enumerate(FUNNEL_STEPS):
        prev = None if i == 0 else F.col(f"t{i - 1}")
        cand = F.filter(F.col("evs"), _step_pred(step, prev))
        wide = wide.withColumn(
            f"t{i}", F.array_min(F.transform(cand, lambda s: s.ts))
        )
    wide = wide.select("user_id", *[f"t{i}" for i in range(len(FUNNEL_STEPS))])
    # ONE aggregation computes every step's count (the per-step
    # union-of-aggs formulation re-evaluated the whole collect_list +
    # HOF pipeline once per step PLUS once for the base — 5 passes,
    # measured 25 s at sf0.1; this shape is one pass, ~0.5 s), then a
    # step-count-sized explode unpivots to the output rows
    counts = wide.agg(
        *[
            F.count(F.col(f"t{i}")).cast("bigint").alias(f"c{i}")
            for i in range(len(FUNNEL_STEPS))
        ]
    )
    steps_arr = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_no"),
                F.lit(step).alias("step"),
                F.col(f"c{i}").alias("n_users"),
            )
            for i, step in enumerate(FUNNEL_STEPS)
        ]
    )
    return (
        counts.select(F.col("c0").alias("n0"), F.explode(steps_arr).alias("s"))
        .select(
            F.col("s.step_no").alias("step_no"),
            F.col("s.step").alias("step"),
            F.col("s.n_users").alias("n_users"),
            (
                F.round(
                    F.col("s.n_users").cast("double") / F.col("n0").cast("double"), 6
                )
                + F.lit(0.0)
            ).alias("conversion"),
        )
        .orderBy("step_no")
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition table over each user's event
    stream: for every (event_type -> next event_type) pair, the
    transition count and its conditional probability P(next | cur).

    The behavioral-modeling primitive (session synthesis, anomaly
    priors, next-action features for training data). One window pass
    partitioned by user (lead over (ts, event_id) — event_id breaks
    timestamp ties deterministically), one keyed aggregation, then the
    per-cur totals broadcast back. The fact table shuffles once on
    user_id; the pair aggregation's map-side combine makes the second
    exchange |types|^2-sized. Output (cur_type, next_type, n_trans,
    p) with p = ROUND(n/total, 6)."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    pairs = (
        ev.select(
            F.col("event_type").alias("cur_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("cur_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    totals = pairs.groupBy("cur_type").agg(F.sum("n_trans").alias("tot"))
    return (
        pairs.join(F.broadcast(totals), "cur_type")
        .select(
            "cur_type",
            "next_type",
            "n_trans",
            (
                F.round(F.col("n_trans").cast("double") / F.col("tot").cast("double"), 6)
                + F.lit(0.0)
            ).alias("p"),
        )
    )


def user_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-window features — the point-in-time-correct
    feature-engineering primitive (each row sees only its own past, so
    a model trained on these never leaks the future): for every event,
    the same user's event count in the trailing 1 hour and value sum
    in the trailing 24 hours, both windows inclusive of the current
    row.

    One window pass per user ordered by epoch seconds with RANGE
    frames (range, not rows: simultaneous events all see the same
    state). Value sums run in DECIMAL inside the frame so results are
    order-invariant. Shuffles once on user_id. Output (event_id,
    user_id, n_1h, v_24h)."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "value",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("sec"),
    )
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    w24 = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-86400, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w1).cast("bigint").alias("n_1h"),
        (
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).over(w24).cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("v_24h"),
    )


def session_paths(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30, top_n: int = 20
) -> DataFrame:
    """Sequence mining over sessionized behavior: the ``top_n`` most
    frequent 3-step event-type paths (consecutive within a 30-min-gap
    session) — the "what do users do next" primitive behind funnel
    design and behavioral features.

    Sessionization is the lag/cumsum islands pass (one user_id
    shuffle); each session's ordered type sequence is assembled with
    collect_list + array_sort (per-session state, bounded by session
    length), trigrams are a narrow slice fan-out, and the path count
    is one keyed aggregation over ≤ |types|³ groups. Output (path, n,
    rk) by (n DESC, path ASC)."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") - F.lag("ts").over(w) >= F.expr(f"interval {gap_minutes} minutes")),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.withColumn("new_s", new_s).withColumn("sid", F.sum("new_s").over(run))
    seqs = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(F.transform("evs", lambda s: s.event_type).alias("types"))
    )
    tri = seqs.filter(F.size("types") >= 3).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("types") - 2),
                lambda i: F.concat_ws(
                    ">",
                    F.element_at(F.col("types"), i),
                    F.element_at(F.col("types"), i + 1),
                    F.element_at(F.col("types"), i + 2),
                ),
            )
        ).alias("path")
    )
    counts = tri.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return (
        counts.withColumn("rk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rk") <= top_n)
        .select("path", "n", "rk")
    )


def session_labels(
    spark: SparkSession, sf_dir: str, horizon_hours: int = 24
) -> DataFrame:
    """Supervised-label generation: every user session labeled 1 iff
    the user makes a ``purchase`` within ``horizon_hours`` AFTER the
    session's last event — the propensity-model training-set shape
    (features come from the session, the label strictly from the
    future, so there is no leakage by construction).

    Sessionization is the lag/cumsum pass; the label probe joins each
    session to the user's purchase timestamps once (per-user keyed
    join, purchases only — a small fraction of events), with the
    half-open (last_ts, last_ts + horizon] window evaluated in the
    join condition. Output (user_id, session_start, session_end_last,
    n_events, label)."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") - F.lag("ts").over(w) >= F.expr("interval 30 minutes")),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn("n", new_s)
        .withColumn("sid", F.sum("n").over(run))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end_last"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    probe = sess.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("session_end_last"))
        & (
            F.col("p_ts")
            <= F.col("session_end_last") + F.expr(f"interval {horizon_hours} hours")
        ),
        "left",
    )
    return (
        probe.groupBy("user_id", "session_start", "session_end_last", "n_events")
        .agg(F.max(F.col("p_ts").isNotNull().cast("int")).cast("int").alias("label"))
    )


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 versioned-dimension build from the event stream — the
    history twin of ``curation.cdc_merge_snapshot`` (which keeps only
    the SCD-1 survivor): per user, the sequence of distinct
    ``event_type`` states with validity intervals.

    Gaps-and-islands over (user, ts): a row opens a new version when
    the previous event (ordered by ts, event_id) carried a different
    state; ``valid_to`` is the next version's ``valid_from`` and the
    open-ended row is ``is_current``.

    Scale shape: both windows are keyed on ``user_id`` — one shuffle,
    per-user partitions sort locally and spill; no single-partition
    exchange. Run-compression happens BEFORE the second window, so the
    versions window sees change rows only (bounded by state churn, not
    event volume).

    Output: (user_id, version, state, valid_from, valid_to,
    is_current).
    """
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn("prev_state", F.lag("event_type").over(w)).filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("event_type"))
    )
    wv = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.row_number().over(wv).cast("bigint").alias("version"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wv).alias("valid_to"),
        F.lead("ts").over(wv).isNull().alias("is_current"),
    )
