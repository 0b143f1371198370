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

from pyspark.sql import DataFrame, SparkSession, Window
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


# ------------------------------------------- count-min sketch

def cms_build(
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a plain
    aggregated table: depth x width counters, cell (d, w) = number of
    items whose seeded hash lands in bucket w under hash d.

    Fixed-memory frequency estimation for unbounded key universes —
    the lever when even the combined (token, count) table outgrows
    memory budgets (billions of distinct keys): the sketch is
    depth x width rows REGARDLESS of cardinality, mergeable across
    shards/days by cell-wise addition, and the estimate is an upper
    bound with error <= e/width * N at ~1 - (1/2)^depth probability.

    Spark shape: one narrow map (depth seeded xxhash64 buckets per
    item via explode over a literal seed array) + ONE keyed shuffle
    with map-side combine on (d, w) — cells, not items, cross the
    wire. Estimation (:func:`cms_estimate`) is a broadcast join of the
    tiny sketch onto the probe keys + a min over depth."""
    if width < 2 or depth < 1:
        raise ValueError("width must be >= 2 and depth >= 1")
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    cells = items.select(
        F.explode(seeds).alias("d"),
        F.pmod(
            F.xxhash64(F.col(item_col), F.col("d")), F.lit(width)
        ).alias("w"),
    )
    # F.explode before pmod: `d` must be a column before hashing with it
    return cells.groupBy("d", "w").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch for each probe key: est = min over the
    depth rows of the key's bucket counters (0 when a bucket row is
    absent — an empty cell). Output: probes + ``est_cnt``.
    est_cnt >= true count always (over-approximation only)."""
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    keyed = probes.select(
        F.col(item_col),
        F.explode(seeds).alias("d"),
    ).withColumn(
        "w", F.pmod(F.xxhash64(F.col(item_col), F.col("d")), F.lit(width))
    )
    return (
        keyed.join(F.broadcast(sketch), ["d", "w"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est_cnt"))
    )


def token_cms_accuracy(
    spark: SparkSession, sf_dir: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Gate entry (rows-only): sketch the corpus token stream at a
    deliberately tight width, then compare estimates against exact
    counts for every distinct token — (token, true_cnt, est_cnt,
    overcount). Properties pinned in tests: est >= true for ALL
    tokens; mean overcount tracks the e/width * N bound."""
    from ..functions import text as TXT
    from ..sources.store import load_documents

    toks = (
        load_documents(spark, sf_dir)
        .select(F.explode(TXT.tokens("text")).alias("tok"))
    )
    sketch = cms_build(toks, "tok", width=width, depth=depth)
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(sketch, exact.select("tok"), "tok", width=width, depth=depth)
    return (
        exact.join(est, "tok")
        .select(
            "tok",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).alias("overcount"),
        )
        .orderBy("tok")
    )


def table_profile(spark: SparkSession, sf_dir: str, table: str = "events") -> DataFrame:
    """Column-level data profile — the ingest-QA primitive run before
    a table joins the pipeline: per column, null count, exact distinct
    count, and min/max (numeric/timestamp columns as doubles — rounded
    6, timestamps as epoch seconds — string columns as strings).

    One scan computes all null counts and min/max; the exact distinct
    counts add one Expand pass (the gate shape — at 100 TB swap in
    approx_count_distinct, same plan minus the Expand). The per-column
    rows are unpivoted from a single aggregation row, so the fact
    table is read once, not once per column. Output (column, n_nulls,
    n_distinct, min_num, max_num, min_str, max_str)."""
    from ..sources.store import load_events, load_table

    df = (
        load_events(spark, sf_dir)
        if table == "events"
        else load_table(spark, sf_dir, table)
    )
    import pyspark.sql.types as T

    aggs = []
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(F.sum(c.isNull().cast("bigint")).alias(f"{f.name}__nulls"))
        aggs.append(F.count_distinct(c).alias(f"{f.name}__nd"))
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            # cast-to-double keeps fractional seconds (unix_timestamp
            # truncates, diverging from DuckDB's epoch())
            num = c.cast("timestamp").cast("double")
        elif isinstance(f.dataType, T.StringType):
            num = None
        else:
            num = c.cast("double")
        if num is not None:
            aggs.append((F.round(F.min(num), 6) + F.lit(0.0)).alias(f"{f.name}__minn"))
            aggs.append((F.round(F.max(num), 6) + F.lit(0.0)).alias(f"{f.name}__maxn"))
            aggs.append(F.lit(None).cast("string").alias(f"{f.name}__mins"))
            aggs.append(F.lit(None).cast("string").alias(f"{f.name}__maxs"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{f.name}__minn"))
            aggs.append(F.lit(None).cast("double").alias(f"{f.name}__maxn"))
            aggs.append(F.min(c).alias(f"{f.name}__mins"))
            aggs.append(F.max(c).alias(f"{f.name}__maxs"))
    row = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("column"),
                F.col(f"{f.name}__nulls").alias("n_nulls"),
                F.col(f"{f.name}__nd").alias("n_distinct"),
                F.col(f"{f.name}__minn").alias("min_num"),
                F.col(f"{f.name}__maxn").alias("max_num"),
                F.col(f"{f.name}__mins").alias("min_str"),
                F.col(f"{f.name}__maxs").alias("max_str"),
            )
            for f in df.schema.fields
        ]
    )
    return row.select(F.explode(structs).alias("p")).select("p.*")


def type_value_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of ``value`` over time —
    closed-form regression via aggregation (the OLAP way to ask "is
    this metric drifting"): slope and intercept of value ~ hours since
    the first event, plus Pearson r².

    Everything derives from five exact sums (n, Σx, Σy, Σxy, Σx²,
    Σy²) computed in one map-side-combinable groupBy — x is quantized
    to the 10-minute bucket index (exact integers), y to micro-units
    (ROUND(value·1e6), the running-totals contract), so every sum is
    integer-exact and the three final divisions are the only float
    ops. One shuffle, |event types| groups. Output (event_type, n,
    slope, intercept, r2) rounded to 6."""
    ev = load_events(spark, sf_dir).select(
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value"),
    )
    bounds = ev.agg(F.min("ts").alias("t0"))
    # x: 10-minute buckets since the corpus start (exact int);
    # y: micro-units (exact int via the established rounding contract)
    x = (
        (F.unix_timestamp("ts") - F.unix_timestamp("t0"))
        / F.lit(600)
    ).cast("bigint")
    y = F.round(F.col("value") * F.lit(1e6)).cast("bigint")
    base = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type", x.alias("x"), y.alias("y")
    )
    # products fit int64 per-row, but their SUMS can pass 2^63
    # (y ~ 1e9 micro-units squared) — sum in DECIMAL(38,0), still
    # exact integer arithmetic (DuckDB's BIGINT sums widen to HUGEINT
    # for the same reason)
    g = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    varx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    vary = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    slope = cov / varx  # micro-units per 10-min bucket
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / nd
    r2 = (cov * cov) / (varx * vary)
    return g.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (F.round(slope, 6) + F.lit(0.0)).alias("slope"),
        (F.round(intercept, 6) + F.lit(0.0)).alias("intercept"),
        (F.round(r2, 6) + F.lit(0.0)).alias("r2"),
    )


def type_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-movement of event types: Pearson correlation between every
    pair of types' HOURLY volume series — "do errors spike with
    purchases". The series grid is (calendar hours × |types|) rows —
    bounded by time, not data volume — with missing hours zero-filled
    (a type absent in a busy hour is signal, not a gap).

    One fact-table pass (hourly keyed count); the pair correlation
    derives from integer-exact sums (Σx, Σy, Σxy, Σx², Σy², n) via a
    self-join of the tiny grid on the hour. Output (type_a, type_b, r)
    with type_a < type_b, r rounded to 6."""
    ev = load_events(spark, sf_dir).select(
        "event_type", F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h")
    )
    hourly = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("c"))
    bounds = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    filled = (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type", "h", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c")
        )
        .localCheckpoint(eager=True)
    )
    a = filled.alias("a")
    b = filled.alias("b")
    g = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a.c").alias("sx"),
            F.sum("b.c").alias("sy"),
            F.sum(F.col("a.c") * F.col("b.c")).alias("sxy"),
            F.sum(F.col("a.c") * F.col("a.c")).alias("sxx"),
            F.sum(F.col("b.c") * F.col("b.c")).alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    cov = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    varx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    vary = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    r = F.round(cov / F.sqrt(varx * vary), 6) + F.lit(0.0)
    return g.select("type_a", "type_b", "n", r.alias("r"))


def histogram_quantiles(
    spark: SparkSession, sf_dir: str, n_buckets: int = 1000
) -> DataFrame:
    """Deterministic approximate quantiles from a fixed-width
    histogram — the MERGEABLE way to do percentiles at 100 TB when
    sketch nondeterminism is unacceptable: bucket counts are exact
    integers (shard-mergeable by addition, one keyed shuffle with
    map-side combine), and the quantile readout takes the lower edge
    of the first bucket whose cumulative count crosses p·n. Unlike
    KLL/t-digest the result is bit-stable across runs, partitionings
    and engines — which is why this variant carries a full SQL oracle
    while ``approx_value_percentiles`` is rows-only.

    Error bound: one bucket width = (max−min)/n_buckets. Output
    (event_type, n, p50, p90, p99)."""
    ev = load_events(spark, sf_dir).select("event_type", "value")
    bounds = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(n_buckets))
    bucket = F.least(
        F.floor((F.col("value") - F.col("lo")) / width).cast("int"),
        F.lit(n_buckets - 1),
    )
    hist = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type", bucket.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "event_type", "b", F.sum("c").over(w).alias("cum"),
    )
    totals = hist.groupBy("event_type").agg(F.sum("c").alias("n"))

    def q_edge(p: float):
        # lower edge of the first bucket with cum >= ceil(p * n)
        need = F.ceil(F.lit(p) * F.col("n"))
        return F.min(F.when(F.col("cum") >= need, F.col("b")))

    g = (
        cum.join(F.broadcast(totals), "event_type")
        .groupBy("event_type", "n")
        .agg(
            q_edge(0.5).alias("b50"),
            q_edge(0.9).alias("b90"),
            q_edge(0.99).alias("b99"),
        )
    )

    def edge(bcol):
        return (
            F.round(F.col("lo") + F.col(bcol).cast("double") * width, 6) + F.lit(0.0)
        )

    return g.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        edge("b50").alias("p50"),
        edge("b90").alias("p90"),
        edge("b99").alias("p99"),
    )


def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The experimentation primitive: users deterministically split
    into control/treatment by md5 draw (the sampling.py contract — a
    real assignment service does exactly this hash-bucket split), then
    per event_type a difference-in-means report on ``value`` with
    Welch's t statistic.

    Everything derives from exact per-arm sums (n, Σy, Σy² in
    micro-units) in ONE map-side-combinable groupBy over the fact
    table; the t statistic is a handful of scalar float ops on the
    5×2-row aggregate. Output (event_type, n_c, n_t, mean_c, mean_t,
    diff, t_stat) rounded to 6."""
    from .sampling import PREFIX_HEX, _threshold_hex

    thr = _threshold_hex(0.5)
    ev = load_events(spark, sf_dir).select("event_type", "user_id", "value")
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, PREFIX_HEX)
        < F.lit(thr),
        F.lit("c"),
    ).otherwise(F.lit("t"))
    y = F.round(F.col("value") * F.lit(1e6)).cast("long")
    g = (
        ev.select("event_type", arm.alias("arm"), y.alias("y"))
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("decimal(38,0)").alias("sy"),
            F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        )
    )
    c = g.filter(F.col("arm") == "c").select(
        "event_type",
        F.col("n").alias("n_c"), F.col("sy").alias("sy_c"), F.col("syy").alias("syy_c"),
    )
    t = g.filter(F.col("arm") == "t").select(
        "event_type",
        F.col("n").alias("n_t"), F.col("sy").alias("sy_t"), F.col("syy").alias("syy_t"),
    )
    j = c.join(t, "event_type")
    # means/variances in VALUE units (micro-units / 1e6)
    mean_c = F.col("sy_c").cast("double") / F.col("n_c").cast("double") / 1e6
    mean_t = F.col("sy_t").cast("double") / F.col("n_t").cast("double") / 1e6
    # sample variance: (Σy² − (Σy)²/n) / (n−1), micro² → value²
    # x*x, not pow(x, 2): pow can differ from the multiply in the last
    # ulp across libm implementations, and the oracle multiplies
    var_c = (
        (
            F.col("syy_c").cast("double")
            - F.col("sy_c").cast("double") * F.col("sy_c").cast("double") / F.col("n_c").cast("double")
        )
        / (F.col("n_c").cast("double") - 1.0)
        / 1e12
    )
    var_t = (
        (
            F.col("syy_t").cast("double")
            - F.col("sy_t").cast("double") * F.col("sy_t").cast("double") / F.col("n_t").cast("double")
        )
        / (F.col("n_t").cast("double") - 1.0)
        / 1e12
    )
    se = F.sqrt(var_c / F.col("n_c").cast("double") + var_t / F.col("n_t").cast("double"))
    diff = mean_t - mean_c
    return j.select(
        "event_type",
        F.col("n_c").cast("bigint").alias("n_c"),
        F.col("n_t").cast("bigint").alias("n_t"),
        (F.round(mean_c, 6) + F.lit(0.0)).alias("mean_c"),
        (F.round(mean_t, 6) + F.lit(0.0)).alias("mean_t"),
        (F.round(diff, 6) + F.lit(0.0)).alias("diff"),
        (F.round(diff / se, 6) + F.lit(0.0)).alias("t_stat"),
    )


def ab_test_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013) on the
    deterministic A/B split: each user's PRE-period mean value (first
    half of the event range) is the covariate; the post-period metric
    is adjusted as ``y − θ·(x − x̄)`` with ``θ = cov(x,y)/var(x)``
    estimated pooled. Reports the plain and CUPED-adjusted
    treatment-effect estimates plus the variance-reduction ratio —
    the standard online-experimentation speedup.

    Shape: two keyed aggregations (per-user pre and post means), a
    per-user join, then scalar moments over the user table (all
    map-side combinable). User means round to 6 before the moment
    pass so θ is engine-portable. Output one row (n_users, theta,
    diff_plain, diff_cuped, var_ratio) rounded to 6."""
    from .sampling import PREFIX_HEX, _threshold_hex

    ev = load_events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    mid = ev.agg(
        F.timestamp_seconds(
            (
                F.unix_timestamp(F.min("ts")) + F.unix_timestamp(F.max("ts"))
            )
            / 2
        ).alias("mid")
    )
    tagged = ev.crossJoin(F.broadcast(mid))
    mean6 = lambda c: F.round(  # noqa: E731
        F.sum(F.col(c).cast("decimal(18,6)")).cast("double")
        / F.count(F.lit(1)).cast("double"),
        6,
    ) + F.lit(0.0)
    pre = (
        tagged.filter(F.col("ts") < F.col("mid"))
        .groupBy("user_id")
        .agg(mean6("value").alias("x"))
    )
    post = (
        tagged.filter(F.col("ts") >= F.col("mid"))
        .groupBy("user_id")
        .agg(mean6("value").alias("y"))
    )
    thr = _threshold_hex(0.5)
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, PREFIX_HEX)
        < F.lit(thr),
        F.lit(0),
    ).otherwise(F.lit(1))
    u = pre.join(post, "user_id").select("user_id", "x", "y", arm.alias("t"))
    # every floating sum goes through decimal so the moments are
    # aggregation-order invariant (x, y are 6-decimal; products round
    # to 12 identically in both engines before the exact sum)
    m = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("sxx"),
    )
    theta = (
        (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
        / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
    )
    adj = u.crossJoin(F.broadcast(m)).select(
        "t",
        "y",
        # y_adj rounds to 9 so its moment sums are decimal-exact
        (
            F.round(
                F.col("y") - theta * (F.col("x") - F.col("sx") / F.col("n")), 9
            )
            + F.lit(0.0)
        ).alias("y_adj"),
        theta.alias("theta"),
    )
    g = adj.groupBy("t").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("y").cast("decimal(18,6)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("y") * F.col("y"), 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("syy"),
        F.sum(F.col("y_adj").cast("decimal(28,9)")).cast("double").alias("sa"),
        F.sum(F.round(F.col("y_adj") * F.col("y_adj"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("saa"),
        F.first("theta").alias("theta"),
    )
    c = g.filter(F.col("t") == 0).select(
        F.col("n").alias("n0"), F.col("sy").alias("sy0"), F.col("syy").alias("syy0"),
        F.col("sa").alias("sa0"), F.col("saa").alias("saa0"), "theta",
    )
    t = g.filter(F.col("t") == 1).select(
        F.col("n").alias("n1"), F.col("sy").alias("sy1"), F.col("syy").alias("syy1"),
        F.col("sa").alias("sa1"), F.col("saa").alias("saa1"),
    )
    j = c.crossJoin(t)
    var_plain = (
        (F.col("syy0") - F.col("sy0") * F.col("sy0") / F.col("n0")) / (F.col("n0") - 1)
        + (F.col("syy1") - F.col("sy1") * F.col("sy1") / F.col("n1")) / (F.col("n1") - 1)
    )
    var_adj = (
        (F.col("saa0") - F.col("sa0") * F.col("sa0") / F.col("n0")) / (F.col("n0") - 1)
        + (F.col("saa1") - F.col("sa1") * F.col("sa1") / F.col("n1")) / (F.col("n1") - 1)
    )
    return j.select(
        (F.col("n0") + F.col("n1")).cast("bigint").alias("n_users"),
        (F.round(F.col("theta"), 6) + F.lit(0.0)).alias("theta"),
        (
            F.round(F.col("sy1") / F.col("n1") - F.col("sy0") / F.col("n0"), 6)
            + F.lit(0.0)
        ).alias("diff_plain"),
        (
            F.round(F.col("sa1") / F.col("n1") - F.col("sa0") / F.col("n0"), 6)
            + F.lit(0.0)
        ).alias("diff_cuped"),
        (F.round(var_adj / var_plain, 6) + F.lit(0.0)).alias("var_ratio"),
    )


def dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness: per calendar day, the distinct active
    users that day (DAU), in the trailing 7 days (WAU), and their
    ratio. Exact trailing distinct counts come from the (user, day)
    grain joined to the day grid within a 6-day lookback — user-day
    rows, not raw events, drive the join, and the grid is
    calendar-bounded. Output (day, dau, wau, stickiness)."""
    ev = load_events(spark, sf_dir).select(
        F.date_trunc("DAY", F.col("ts").cast("timestamp")).alias("day"), "user_id"
    )
    user_days = ev.distinct()
    daily = user_days.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    bounds = ev.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("g_day")
    )
    wau = (
        user_days.join(
            F.broadcast(grid),
            (F.col("day") <= F.col("g_day"))
            & (F.col("day") > F.col("g_day") - F.expr("interval 7 days")),
        )
        .select("g_day", "user_id")
        .distinct()
        .groupBy("g_day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return (
        daily.join(wau, daily["day"] == wau["g_day"])
        .select(
            "day",
            "dau",
            "wau",
            (
                F.round(F.col("dau").cast("double") / F.col("wau").cast("double"), 6)
                + F.lit(0.0)
            ).alias("stickiness"),
        )
    )


def null_rate_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality drift probe: per column of ``events``, the
    JSON-extraction success/null rates in the FIRST vs SECOND half of
    the time range (``props.k`` plus each raw column) — the check that
    catches an upstream schema change mid-stream. One scan computes
    every half×column cell. Output (column, rate_first, rate_second,
    drift) with rates rounded to 6."""
    ev = load_events(spark, sf_dir)
    mid = ev.agg(
        F.timestamp_seconds(
            (F.unix_timestamp(F.min("ts")) + F.unix_timestamp(F.max("ts"))) / 2
        ).alias("mid")
    )
    probes = {
        "props_k": F.get_json_object("props", "$.k").isNull(),
        "value": F.col("value").isNull(),
        "event_type": F.col("event_type").isNull(),
        "user_id": F.col("user_id").isNull(),
    }
    tagged = ev.crossJoin(F.broadcast(mid)).withColumn(
        "half", (F.col("ts").cast("timestamp") >= F.col("mid")).cast("int")
    )
    aggs = []
    for name, isnull in probes.items():
        for h in (0, 1):
            aggs.append(
                (
                    F.sum(
                        (isnull & (F.col("half") == h)).cast("bigint")
                    ).cast("double")
                    / F.sum((F.col("half") == h).cast("bigint")).cast("double")
                ).alias(f"{name}__{h}")
            )
    row = tagged.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("column"),
                (F.round(F.col(f"{name}__0"), 6) + F.lit(0.0)).alias("rate_first"),
                (F.round(F.col(f"{name}__1"), 6) + F.lit(0.0)).alias("rate_second"),
                (
                    F.round(F.col(f"{name}__1") - F.col(f"{name}__0"), 6) + F.lit(0.0)
                ).alias("drift"),
            )
            for name in probes
        ]
    )
    return row.select(F.explode(structs).alias("p")).select("p.*")


def hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: per hour-of-day (0–23) and event type, the
    event count and decimal-exact mean value — the diurnal-pattern
    report behind load forecasting and anomaly baselines. One
    map-side-combinable groupBy. Output (event_type, hod, n_events,
    avg_value)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            "event_type", F.hour(F.col("ts").cast("timestamp")).alias("hod")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.round(
                    F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1)).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("avg_value"),
        )
    )


def psi_drift(spark: SparkSession, sf_dir: str, n_bins: int = 10) -> DataFrame:
    """Population Stability Index between the first and second halves
    of the event stream — the standard production drift score (PSI =
    sum (p2-p1)*ln(p2/p1)) over (a) the fixed-width value histogram
    and (b) the event_type frequency distribution. The
    null_rate_drift sibling watches SCHEMA health; this watches the
    DISTRIBUTIONS a trained model assumed.

    Float-parity contract: counts are exact integers, shares are
    Laplace-smoothed (c+1)/(n+B) so empty cells never hit ln(0), each
    cell term is rounded to 9 and decimal-summed (order-invariant),
    final ROUND(6). Bin edges come from the WHOLE range's min/max —
    the same mergeable fixed-width scheme as histogram_quantiles.

    Scale shape: one scan computes the half tag + cell key; one keyed
    count aggregate per feature; the cell tables are bins- or
    domain-sized, so the PSI fold is a broadcast-scale operation.
    Output (feature, n_cells, psi)."""
    ev = load_events(spark, sf_dir)
    bounds = ev.agg(
        F.timestamp_seconds(
            (F.unix_timestamp(F.min("ts")) + F.unix_timestamp(F.max("ts"))) / 2
        ).alias("mid"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "half", (F.col("ts").cast("timestamp") >= F.col("mid")).cast("int")
    )
    # degenerate-range guard: a constant value column gives vmax == vmin;
    # an unguarded width of 0 turns every bin expression into inf/NaN
    # (and the SQL twin's floor(inf)::INT errors). greatest(.., eps)
    # short-circuits that to a single bin-0 cell in BOTH twins.
    width = F.greatest(F.col("vmax") - F.col("vmin"), F.lit(1e-12)) / F.lit(
        float(n_bins)
    )
    vbin = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col("value") - F.col("vmin")) / width).cast("int"),
    )
    cells = {
        "value_hist": tagged.filter(F.col("value").isNotNull()).select(
            "half", vbin.cast("string").alias("cell")
        ),
        "event_type": tagged.select("half", F.col("event_type").alias("cell")),
    }
    outs = []
    for feature, cf in cells.items():
        cnt = cf.groupBy("cell", "half").agg(F.count(F.lit(1)).alias("c"))
        piv = (
            cnt.groupBy("cell")
            .agg(
                F.sum(F.when(F.col("half") == 0, F.col("c")).otherwise(0)).alias("c1"),
                F.sum(F.when(F.col("half") == 1, F.col("c")).otherwise(0)).alias("c2"),
            )
        )
        tot = piv.agg(
            F.sum("c1").alias("n1"),
            F.sum("c2").alias("n2"),
            F.count(F.lit(1)).alias("b"),
        )
        # identical double association order in the SQL twin:
        # p = (c+1)/(n+B); term = (p2 - p1) * ln(p2 / p1)
        j = piv.crossJoin(F.broadcast(tot))
        p1 = (F.col("c1") + F.lit(1)).cast("double") / (
            F.col("n1") + F.col("b")
        ).cast("double")
        p2 = (F.col("c2") + F.lit(1)).cast("double") / (
            F.col("n2") + F.col("b")
        ).cast("double")
        term = F.round((p2 - p1) * F.log(p2 / p1), 9).cast("decimal(20,9)")
        outs.append(
            j.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_cells"),
                (F.round(F.sum(term).cast("double"), 6) + F.lit(0.0)).alias("psi"),
            ).select(F.lit(feature).alias("feature"), "n_cells", "psi")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def ks_drift(spark: SparkSession, sf_dir: str, n_buckets: int = 32) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between the first
    and second halves of the event stream — the rank-based second
    opinion beside :func:`psi_drift` (PSI needs binning; KS is
    binning-free and catches shape drift PSI's fixed-width histogram
    smears out). Same half tag as psi_drift (timestamp midpoint).

    ``D = max_x |F1(x) - F2(x)|`` evaluated at every distinct value.
    Exact integer arithmetic end-to-end: per-value counts, cumulative
    counts, and the cross-multiplied numerator
    ``|cum1*n2 - cum2*n1|`` are all BIGINT — one double division +
    ROUND(6) at the very end, so the DuckDB twin is hash-exact.

    Scale shape: KS is an order statistic, so SOME global ordering is
    unavoidable — but not a single-partition sort. The cumulative sum
    decomposes over fixed-width value buckets (the blocking.py global
    -rank trick): per-bucket window cumsums run in parallel, and the
    bucket-level offsets are a ``n_buckets``-row aggregate (broadcast
    back). The plan has NO Exchange SinglePartition over event-scale
    data; the only tiny serial step is the n_buckets-row offset
    window. Output one row: (n1, n2, n_points, ks_d)."""
    ev = load_events(spark, sf_dir)
    bounds = ev.agg(
        F.timestamp_seconds(
            (F.unix_timestamp(F.min("ts")) + F.unix_timestamp(F.max("ts"))) / 2
        ).alias("mid"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    tagged = (
        ev.filter(F.col("value").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "half", (F.col("ts").cast("timestamp") >= F.col("mid")).cast("int")
        )
    )
    width = F.greatest(F.col("vmax") - F.col("vmin"), F.lit(1e-12)) / F.lit(
        float(n_buckets)
    )
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col("value") - F.col("vmin")) / width).cast("int"),
    )
    # per-value counts (map-side combine collapses hot values pre-shuffle)
    v = tagged.groupBy(bucket.alias("bucket"), F.col("value")).agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c2"),
    )
    # three consumers (local cumsums, bucket offsets, totals) — without
    # a barrier each re-scans events and re-aggregates; Catalyst does
    # not reuse the exchange across them (distinct grouping-expr ids)
    v = v.localCheckpoint(eager=False)
    # parallel per-bucket cumulative sums
    wb = (
        Window.partitionBy("bucket")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = v.select(
        "bucket",
        "value",
        F.sum("c1").over(wb).alias("l1"),
        F.sum("c2").over(wb).alias("l2"),
    )
    # bucket offsets: n_buckets rows — the only serial window
    per_bucket = v.groupBy("bucket").agg(
        F.sum("c1").alias("b1"), F.sum("c2").alias("b2")
    )
    wo = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = per_bucket.select(
        "bucket",
        (F.sum("b1").over(wo) - F.col("b1")).alias("o1"),
        (F.sum("b2").over(wo) - F.col("b2")).alias("o2"),
    )
    tot = v.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.count(F.lit(1)).alias("n_points"),
    )
    cum = local.join(F.broadcast(offsets), "bucket").select(
        (F.col("o1") + F.col("l1")).alias("cum1"),
        (F.col("o2") + F.col("l2")).alias("cum2"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
            F.first("n_points").alias("n_points"),
            (
                F.round(
                    F.max(
                        F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
                    ).cast("double")
                    / (F.first("n1") * F.first("n2")).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("ks_d"),
        )
    )


def chi2_drift(spark: SparkSession, sf_dir: str, n_bins: int = 10) -> DataFrame:
    """Pearson two-sample chi-square drift score over the SAME cells
    as :func:`psi_drift` (fixed-width value histogram + event_type
    shares, first vs second stream half) — the classical test
    statistic beside PSI's information-theoretic score and
    :func:`ks_drift`'s rank statistic. chi² = Σ_k (c1k·n2 − c2k·n1)²
    / (n1·n2·(c1k+c2k)).

    Float-parity contract: counts exact integers; the per-cell term
    is one double expression with a fixed association order, rounded
    to 9 and decimal-summed (order-invariant), final ROUND(6). Cells
    with c1+c2 = 0 cannot occur (cells come FROM the counts).

    Scale shape: identical to psi_drift — one scan computes the half
    tag + cell key, one keyed count per feature, the fold is
    bins-/domain-sized. Output (feature, n_cells, dof, chi2)."""
    ev = load_events(spark, sf_dir)
    bounds = ev.agg(
        F.timestamp_seconds(
            (F.unix_timestamp(F.min("ts")) + F.unix_timestamp(F.max("ts"))) / 2
        ).alias("mid"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "half", (F.col("ts").cast("timestamp") >= F.col("mid")).cast("int")
    )
    width = F.greatest(F.col("vmax") - F.col("vmin"), F.lit(1e-12)) / F.lit(
        float(n_bins)
    )
    vbin = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col("value") - F.col("vmin")) / width).cast("int"),
    )
    cells = {
        "value_hist": tagged.filter(F.col("value").isNotNull()).select(
            "half", vbin.cast("string").alias("cell")
        ),
        "event_type": tagged.select("half", F.col("event_type").alias("cell")),
    }
    outs = []
    for feature, cf in cells.items():
        piv = (
            cf.groupBy("cell", "half")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("cell")
            .agg(
                F.sum(F.when(F.col("half") == 0, F.col("c")).otherwise(0)).alias("c1"),
                F.sum(F.when(F.col("half") == 1, F.col("c")).otherwise(0)).alias("c2"),
            )
        )
        tot = piv.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
        j = piv.crossJoin(F.broadcast(tot))
        num = (
            F.col("c1").cast("double") * F.col("n2").cast("double")
            - F.col("c2").cast("double") * F.col("n1").cast("double")
        )
        den = (
            F.col("n1").cast("double")
            * F.col("n2").cast("double")
            * (F.col("c1") + F.col("c2")).cast("double")
        )
        term = F.round(num * num / den, 9).cast("decimal(20,9)")
        outs.append(
            j.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_cells"),
                (F.count(F.lit(1)) - 1).cast("bigint").alias("dof"),
                (F.round(F.sum(term).cast("double"), 6) + F.lit(0.0)).alias(
                    "chi2"
                ),
            ).select(F.lit(feature).alias("feature"), "n_cells", "dof", "chi2")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
