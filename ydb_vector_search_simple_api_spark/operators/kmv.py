"""KMV (k-minimum-values) distinct sketches with set algebra.

The sketch family's missing lens: HLL (``sketch_store``) answers
union-only distinct counts; the KMV / bottom-k sketch additionally
supports INTERSECTION and Jaccard estimates across groups — "how many
users did both A and B touch", "what fraction of source X's vocabulary
appears in source Y" — because the k smallest hash values of a set are
a uniform sample of its distinct elements (Bar-Yossef et al. 2002;
Beyer et al. 2007 "Distinct-Value Synopses").

Semantics:

- A group's sketch is the sorted list of the k smallest 48-bit
  md5-prefix hashes of its distinct keys.
- If a sketch holds FEWER than k values it saw every distinct hash and
  the estimate is EXACT — that regime is what the DuckDB oracle pins
  (COUNT(DISTINCT ...) equality, modulo 48-bit collisions with
  probability ~d²/2^49). With k exceeded, the estimator is the
  classic ``(k-1)·M / h_(k)`` (M = hash-space size), and for a pair
  the k-min values of the UNION are a uniform sample in which the
  fraction belonging to both sides estimates the Jaccard index.

Scale shape (100 TB posture):

- Stage 1 dedups (group, hash) pairs — the same shuffle a
  COUNT(DISTINCT) pays, with map-side partial dedup for free.
- Stage 2 is a TWO-LEVEL top-k: a per-(group, salt) ranked window
  prunes to k per salt bucket (sorts spill, nothing is held in
  executor memory), then the global per-group window ranks at most
  ``n_salts·k`` survivors. No ``collect_set`` of an unbounded group
  anywhere.
- Sketches are mergeable (k smallest of the concatenation), so
  per-partition / per-day partial sketches fold without rescanning
  facts — same contract as the HLL/t-digest stores.
- The pairwise report joins the EXPLODED sketch rows (≤ groups·k)
  against the broadcast group-pair table — cost is sketch-sized,
  never corpus-sized.

Engine parity: hashes are exact BIGINTs, ranks are integer windows,
and the only float is the final estimate division / ROUND(...,6)
Jaccard — in the oracle-pinned exact regime even those are ratios of
exact integers.

Reference note: no sketch surface exists in the reference (app.py);
extension scope per SURVEY.md ("beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.store import load_events

#: hex digits of the md5 prefix — 48-bit hash space.
_HEX = 12
#: hash-space size M = 16^12 = 2^48.
SPACE = 16**_HEX
#: default sketch size.
DEFAULT_K = 512
#: salt buckets for the stage-1 pre-prune window.
N_SALTS = 32


def _h(col: Column) -> Column:
    """48-bit md5-prefix hash as BIGINT (engine-portable: the DuckDB
    twin decodes the same 12 hex digits)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, _HEX), 16, 10).cast(
        "bigint"
    )


def kmv_sketch(
    df: DataFrame, key: str, groups: list[str], k: int = DEFAULT_K
) -> DataFrame:
    """Per-group KMV sketch: (groups..., sketch array<bigint> sorted
    ascending, n_min = len(sketch) ≤ k)."""
    pairs = df.select(*groups, _h(F.col(key)).alias("h")).distinct()
    salted = pairs.withColumn("_salt", F.col("h") % N_SALTS)
    w1 = Window.partitionBy(*groups, "_salt").orderBy("h")
    pruned = (
        salted.withColumn("_r", F.row_number().over(w1))
        .filter(F.col("_r") <= k)
        .drop("_salt", "_r")
    )
    w2 = Window.partitionBy(*groups).orderBy("h")
    topk = pruned.withColumn("_r", F.row_number().over(w2)).filter(F.col("_r") <= k)
    return topk.groupBy(*groups).agg(
        F.sort_array(F.collect_list("h")).alias("sketch"),
        F.count("*").cast("bigint").alias("n_min"),
    )


def kmv_merge(sketches: DataFrame, groups: list[str], k: int = DEFAULT_K) -> DataFrame:
    """Merge partial sketches sharing the same group key: k smallest
    of the deduped concatenation — the fold the incremental stores
    use. Idempotent and associative."""
    vals = sketches.select(*groups, F.explode("sketch").alias("h")).distinct()
    w = Window.partitionBy(*groups).orderBy("h")
    topk = vals.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
    return topk.groupBy(*groups).agg(
        F.sort_array(F.collect_list("h")).alias("sketch"),
        F.count("*").cast("bigint").alias("n_min"),
    )


def kmv_estimate(sketches: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """Append the distinct-count estimate: exact ``n_min`` when the
    sketch is unsaturated, else ``(k-1)·M / h_(k)`` rounded to BIGINT."""
    kth = F.element_at(F.col("sketch"), k)
    est = F.when(F.col("n_min") < k, F.col("n_min")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(float(SPACE)) / kth.cast("double"), 0)
    )
    return sketches.withColumn("est_distinct", est.cast("bigint")).withColumn(
        "exact", F.col("n_min") < k
    )


def kmv_pair_report(
    sketches: DataFrame, group: str, k: int = DEFAULT_K
) -> DataFrame:
    """All-pairs set-algebra report from per-group sketches:
    (a, b, n_union_sketch, n_common, union_est, inter_est, jaccard).

    The k smallest hashes of A∪B are exactly the k smallest of the
    merged sketches; the fraction of them present in BOTH sketches
    estimates Jaccard (exactly, when the union sketch is
    unsaturated)."""
    vals = sketches.select(
        F.col(group).alias("g"), F.explode("sketch").alias("h")
    )
    names = sketches.select(F.col(group).alias("g")).distinct()
    pairs = (
        names.select(F.col("g").alias("a"))
        .crossJoin(names.select(F.col("g").alias("b")))
        .filter(F.col("a") < F.col("b"))
    )
    # (a, b, h, in_a, in_b) — sketch-sized, pairs broadcast
    tagged = (
        vals.join(
            F.broadcast(pairs),
            (F.col("g") == F.col("a")) | (F.col("g") == F.col("b")),
        )
        .groupBy("a", "b", "h")
        .agg(
            F.max((F.col("g") == F.col("a")).cast("int")).alias("in_a"),
            F.max((F.col("g") == F.col("b")).cast("int")).alias("in_b"),
        )
    )
    w = Window.partitionBy("a", "b").orderBy("h")
    union_k = tagged.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k
    )
    agg = union_k.groupBy("a", "b").agg(
        F.count("*").cast("bigint").alias("n_union_sketch"),
        F.sum((F.col("in_a") * F.col("in_b"))).cast("bigint").alias("n_common"),
        F.max("h").alias("kth"),
    )
    union_est = F.when(
        F.col("n_union_sketch") < k, F.col("n_union_sketch").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(float(SPACE)) / F.col("kth").cast("double"),
            0,
        )
    )
    return agg.select(
        "a",
        "b",
        "n_union_sketch",
        "n_common",
        union_est.cast("bigint").alias("union_est"),
        F.round(
            F.col("n_common").cast("double")
            / F.col("n_union_sketch").cast("double")
            * union_est,
            0,
        )
        .cast("bigint")
        .alias("inter_est"),
        (
            F.round(
                F.col("n_common").cast("double")
                / F.col("n_union_sketch").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("jaccard"),
    )


# ------------------------------------------------------- gate entries


def kmv_distinct_by_type(
    spark: SparkSession, sf_dir: str, k: int = DEFAULT_K
) -> DataFrame:
    """Distinct users per event type through the KMV machinery —
    unsaturated at the gate SFs, so ``est_distinct`` must equal the
    oracle's COUNT(DISTINCT user_id) exactly."""
    ev = load_events(spark, sf_dir)
    sk = kmv_sketch(ev, "user_id", ["event_type"], k=k)
    return kmv_estimate(sk, k=k).select(
        "event_type", "n_min", "est_distinct", "exact"
    )


def kmv_user_overlap(
    spark: SparkSession, sf_dir: str, k: int = DEFAULT_K
) -> DataFrame:
    """Pairwise audience overlap between event types (union /
    intersection / Jaccard) from sketches alone — never re-touching
    the fact table per pair."""
    ev = load_events(spark, sf_dir)
    sk = kmv_sketch(ev, "user_id", ["event_type"], k=k)
    return kmv_pair_report(sk, "event_type", k=k).select(
        F.col("a").alias("type_a"),
        F.col("b").alias("type_b"),
        "n_union_sketch",
        "n_common",
        "union_est",
        "inter_est",
        "jaccard",
    )
