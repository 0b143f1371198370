"""Streaming sketch/monitor operators: a Misra-Gries heavy-hitter
summary maintained across micro-batches, and PSI drift scored per
batch against a static reference window.

The batch :func:`operators.textual.heavy_hitters_topk` assumes the
corpus is at rest; here shards arrive as a stream and the MG summary
is FOLDED over them — the mergeable-summaries property (Agarwal et
al., PODS 2012): merging two MG summaries and re-pruning to
``capacity`` keeps every token whose TOTAL count exceeds
N/(capacity+1). So the drained summary is a candidate superset of the
global heavy hitters, exactly like the batch union of per-partition
summaries, and the final exact count restricted to the candidates
reproduces the batch top-k bit for bit (shared oracle).

Replay-idempotence: state is a per-batch SNAPSHOT directory
(``state/batch=N``, written with overwrite), derived deterministically
from snapshot N-1 and batch N — a replayed batch rewrites the same
bytes instead of double-counting into an accumulator. The driver only
ever sees one scalar (the prune threshold) and the final
capacity-bounded candidate list — both constant-sized at any corpus
scale (the codebook-collect contract).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TXT
from ..operators.textual import mg_candidates
from ..sources.store import load_documents
from .curation_ingest import write_shard_landing


def _latest_snapshot_dir(state_dir: str, before: int) -> str | None:
    """Newest ``batch=N`` snapshot with N < before (replay safety:
    batch id B must fold on top of B-1's state, never its own)."""
    if not os.path.isdir(state_dir):
        return None
    ids = [
        int(d.split("=", 1)[1])
        for d in os.listdir(state_dir)
        if d.startswith("batch=") and int(d.split("=", 1)[1]) < before
    ]
    if not ids:
        return None
    return os.path.join(state_dir, f"batch={max(ids)}")


def stream_heavy_hitters(
    spark: SparkSession,
    sf_dir: str,
    k: int = 25,
    capacity: int = 4096,
    n_shards: int = 4,
) -> DataFrame:
    """Drain the documents table through the MG-summary stream in
    ``n_shards`` arrival batches, then serve the exact top-k over the
    drained candidates. Equal to the batch ``heavy_hitters_topk`` and
    the plain ``token_frequencies`` top-k (shared oracle)."""
    run = uuid.uuid4().hex[:8]
    base = os.path.join(tempfile.gettempdir(), f"svs_hh_{run}")
    landing = os.path.join(base, "landing")
    state_dir = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(landing, exist_ok=True)

    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    write_shard_landing(docs, landing, n_shards)
    schema = docs.schema

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        toks = batch_df.select(F.explode(TXT.tokens("text")).alias("token"))
        new = mg_candidates(toks, capacity)
        prev_dir = _latest_snapshot_dir(state_dir, before=batch_id)
        merged = new
        if prev_dir is not None:
            merged = new.unionByName(s.read.parquet(prev_dir))
        merged = merged.groupBy("token").agg(F.sum("est").alias("est"))
        if merged.count() > capacity:
            # the (capacity+1)-th largest estimate: the MG decrement,
            # applied to the merged summary. One scalar to the driver.
            th = (
                merged.orderBy(F.col("est").desc(), F.col("token").asc())
                .limit(capacity + 1)
                .collect()[-1]
                .est
            )
            merged = merged.filter(F.col("est") > th).withColumn(
                "est", F.col("est") - F.lit(th)
            )
        (
            merged.coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(state_dir, f"batch={batch_id}"))
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "shard=*"))
    )
    query = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    final_dir = _latest_snapshot_dir(state_dir, before=1 << 62)
    cands = spark.read.parquet(final_dir).select("token").distinct()
    toks = load_documents(spark, sf_dir).select(
        F.explode(TXT.tokens("text")).alias("token")
    )
    return (
        toks.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
    )


def _batch_cell_counts(
    batch_df: DataFrame, lo: float, width: float, n_bins: int
) -> DataFrame:
    """(cell, c) for one batch under the reference's FIXED bin
    geometry; null values ride the -1 sentinel cell so the row count
    comes out of the same aggregate."""
    return batch_df.groupBy(
        F.when(
            F.col("value").isNotNull(),
            F.least(
                F.lit(n_bins - 1),
                F.floor((F.col("value") - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        )
        .otherwise(F.lit(-1))
        .alias("cell")
    ).agg(F.count(F.lit(1)).alias("c"))


def _round9(x: float) -> float:
    """Spark's ROUND (half away from zero) at 9 places — NOT Python's
    banker's round; keeps the driver fold bit-compatible with the
    oracle-backed psi_drift arithmetic."""
    import math

    return math.copysign(math.floor(abs(x) * 1e9 + 0.5) / 1e9, x)


def _psi_from_counts(ref: dict[int, int], batch: dict[int, int]) -> float:
    """PSI fold over the bins-sized cell tables — plain driver
    arithmetic (the tables are CONSTANT-sized: this is the
    centroid-collect contract, and it is what keeps the per-trigger
    cost at ONE Spark job; the same join expressed in Spark cost
    ~4.7 s/trigger of micro-batch scheduling for 11 rows). Identical
    formula and association order as stats.psi_drift."""
    cells = sorted(set(ref) | set(batch))
    n1 = sum(ref.values())
    n2 = sum(batch.values())
    b = len(cells)
    import math

    total = 0.0
    for cell in cells:
        p1 = (ref.get(cell, 0) + 1) / (n1 + b)
        p2 = (batch.get(cell, 0) + 1) / (n2 + b)
        total += _round9((p2 - p1) * math.log(p2 / p1))
    return round(total, 6) + 0.0


def stream_drift_monitor(
    spark: SparkSession,
    sf_dir: str,
    n_shards: int = 4,
    n_bins: int = 10,
) -> DataFrame:
    """Drift ON ARRIVAL: the first half of the event stream (by time)
    is the static reference window; the second half arrives in
    ``n_shards`` micro-batches, and each batch's value-histogram PSI
    vs the reference is scored as it lands — the monitor that pages
    BEFORE a drifted day contaminates a training snapshot.

    Stateless per batch (reference counts are a materialized
    bins-sized table; each trigger touches only its batch), with the
    batch-id-keyed overwrite sink, so replays rewrite identical rows.
    Drained == the same per-shard PSI computed in batch mode
    (pytest-pinned; shard cuts are percentile sketches, so rows-only).
    Output (batch_id, n_events, psi)."""
    import os
    import tempfile
    import uuid

    from ..sources.store import load_events

    run = uuid.uuid4().hex[:8]
    base = os.path.join(tempfile.gettempdir(), f"svs_drift_{run}")
    landing = os.path.join(base, "landing")
    out_dir = os.path.join(base, "scores")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(landing, exist_ok=True)

    ev = load_events(spark, sf_dir)
    mid = ev.agg(
        F.timestamp_seconds(
            (F.unix_timestamp(F.min("ts")) + F.unix_timestamp(F.max("ts"))) / 2
        ).alias("mid")
    ).head()
    ref = ev.filter(F.col("ts") < F.lit(mid.mid)).select("event_id", "value")
    arriving = (
        ev.filter(F.col("ts") >= F.lit(mid.mid))
        .select("event_id", "value")
        # one materialization: the percentile cut and every shard
        # write otherwise re-run the scan+filter
        .localCheckpoint(eager=True)
    )
    rb = ref.agg(F.min("value").alias("lo"), F.max("value").alias("hi")).head()
    lo, hi = float(rb.lo), float(rb.hi)
    width = (hi - lo) / float(n_bins)
    # bins-sized (constant) reference table -> driver dict, once
    ref_counts = {
        r.cell: r.c
        for r in _batch_cell_counts(ref, lo, width, n_bins)
        .filter(F.col("cell") >= 0)
        .collect()
    }

    write_shard_landing(arriving, landing, n_shards, order_col="event_id")
    schema = arriving.schema

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        cnt = {
            r.cell: r.c
            for r in _batch_cell_counts(batch_df, lo, width, n_bins).collect()
        }
        n = sum(cnt.values())
        psi = _psi_from_counts(ref_counts, {k: v for k, v in cnt.items() if k >= 0})
        # the score is ONE row — write it with pyarrow, not a Spark
        # job (a 1-row createDataFrame().write inside foreachBatch
        # measured 4-5 s of micro-batch session overhead, 3x the
        # whole trigger's real work); fixed filename => replays
        # rewrite the same bytes.
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = os.path.join(out_dir, f"batch={batch_id}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "batch_id": pa.array([int(batch_id)], pa.int64()),
                    "n_events": pa.array([int(n)], pa.int64()),
                    "psi": pa.array([float(psi)], pa.float64()),
                }
            ),
            os.path.join(d, "part-0.parquet"),
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "shard=*"))
    )
    query = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(os.path.join(out_dir, "batch=*")).orderBy("batch_id")


def stream_tdigest_ingest(
    spark: SparkSession,
    sf_dir: str,
    n_shards: int = 4,
    delta: int = 100,
) -> DataFrame:
    """Maintain the t-digest quantile store ON ARRIVAL: the events
    table drains in ``n_shards`` checkpointed batches, the first
    builds the store, every later one folds in via
    ``tdigest_store_upsert`` (the ivf_upsert ingest pattern — the
    store is the same one the batch path builds, exercised under
    streaming freshness). Serving reads only the drained centroid
    state.

    What is pinned (tests/test_tdigest.py): weight conservation
    through the drain (total n equals the batch count per key) and
    rank accuracy of the drained quantiles vs the exact per-key
    values. Bit-equality with the batch-built store is NOT the
    contract — t-digest folds are lossy by design (module docstring
    of operators/tdigest.py); exactly-once per shard comes from the
    checkpoint, as in every other ingest twin."""
    from ..operators import tdigest as TD
    from ..sources.store import load_events

    run = uuid.uuid4().hex[:8]
    base = os.path.join(tempfile.gettempdir(), f"svs_tdstream_{run}")
    landing = os.path.join(base, "landing")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(landing, exist_ok=True)

    ev = load_events(spark, sf_dir).select("event_id", "event_type", "value")
    write_shard_landing(ev, landing, n_shards, order_col="event_id")
    schema = ev.schema

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.select("event_type", "value", "event_id")
        if not os.path.exists(os.path.join(store, TD.META)):
            TD.build_tdigest_store(
                b, store, "event_type", "value", "event_id", delta=delta
            )
        else:
            TD.tdigest_store_upsert(batch_df.sparkSession, store, b)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "shard=*"))
    )
    query = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return TD.tdigest_store_quantiles(spark, store)


def stream_kmv_ingest(
    spark: SparkSession,
    sf_dir: str,
    n_shards: int = 4,
    k: int = 512,
) -> DataFrame:
    """Maintain the KMV distinct-sketch store ON ARRIVAL: events drain
    in ``n_shards`` checkpointed batches, the first builds the
    per-type user sketch store, every later one folds in via
    ``kmv_store_upsert``. Serving reads only the drained sketches.

    Contract (stronger than the t-digest twin's): the k-min merge is
    LOSSLESS — k smallest of a union is a pure set function — so the
    drained store equals the batch-built store by EXACT array
    equality, and this entry shares ``kmv_user_overlap``'s oracle
    verbatim. Exactly-once per shard comes from the checkpoint, as in
    every other ingest twin."""
    from ..operators import kmv as KMV
    from ..sources.store import load_events

    run = uuid.uuid4().hex[:8]
    base = os.path.join(tempfile.gettempdir(), f"svs_kmvstream_{run}")
    landing = os.path.join(base, "landing")
    store = os.path.join(base, "store")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(landing, exist_ok=True)

    ev = load_events(spark, sf_dir).select("event_id", "event_type", "user_id")
    write_shard_landing(ev, landing, n_shards, order_col="event_id")
    schema = ev.schema

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.select("event_type", "user_id")
        if not os.path.exists(os.path.join(store, KMV.META)):
            KMV.build_kmv_store(b, store, "user_id", ["event_type"], k=k)
        else:
            KMV.kmv_store_upsert(
                batch_df.sparkSession, store, b, "user_id", ["event_type"], k=k
            )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(landing, "shard=*"))
    )
    query = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return KMV.kmv_store_pair_report(spark, store, "event_type", k=k).select(
        F.col("a").alias("type_a"),
        F.col("b").alias("type_b"),
        "n_union_sketch",
        "n_common",
        "union_est",
        "inter_est",
        "jaccard",
    )
