"""Continuous corpus curation: quality-gate + dedup-on-arrival.

The batch curation flow (``operators/curation.py``) assumes the corpus
is at rest; a production pipeline ingests it as shard drops. This
stream admits each micro-batch through the quality gate, then dedups
it against EVERYTHING admitted so far — a content-hash anti-join
versus the accumulated hash table — and appends survivors. State is a
parquet table of 32-byte hashes (not documents), so the stream's
working set is fingerprint-sized regardless of corpus bytes.

Determinism contract: shards are written (and picked up —
``maxFilesPerTrigger=1`` processes files in drop order) in ascending
doc_id ranges, and the within-batch election keeps the minimum
doc_id, so the drained result equals the BATCH rule "first
(min-doc_id) quality-passing occurrence of each content hash" — which
is exactly the SQL the DuckDB oracle runs. ``foreachBatch`` because
the sink is two coordinated appends (survivors + hash table); a
replayed batch re-derives the same survivors (the anti-join sees the
hashes it already appended, so duplicates cannot re-enter).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TXT
from ..sources.store import load_documents


def write_shard_landing(
    df: DataFrame,
    landing: str,
    n_shards: int,
    order_col: str = "doc_id",
) -> None:
    """Write ``df`` as ``n_shards`` arrival-ordered files for a file-
    source stream harness. Shard boundaries come from a quantile
    sketch: n_shards-1 cut SCALARS reach the driver instead of the
    whole key column (a data-sized collect has no 100 TB twin); the
    sketch's approximation error only moves shard SIZES, never rows —
    any ascending-range partition processed in drop order yields the
    same drained result for order-insensitive sinks and the batch
    min-key election for first-occurrence sinks."""
    probs = [i / n_shards for i in range(1, n_shards)]
    cuts = (
        list(
            df.select(
                F.percentile_approx(order_col, probs, 10_000).alias("c")
            ).head().c
        )
        if probs
        else []
    )
    # ascending key ranges, one file per shard, written in order so
    # the file source's drop-order pickup is deterministic
    for i, (lo, hi) in enumerate(zip([None, *cuts], [*cuts, None])):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(order_col) > F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(order_col) <= F.lit(hi))
        (
            df.filter(cond)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(landing, f"shard={i}"))
        )


def stream_curation_ingest(
    spark: SparkSession,
    sf_dir: str,
    n_shards: int = 4,
    min_quality: float = 0.8,
    min_tokens: int = 16,
) -> DataFrame:
    """Drain the documents table through the curation stream in
    ``n_shards`` arrival batches; returns the admitted survivors
    (doc_id, content_hash). Equal to the batch first-occurrence
    election over the quality-passing set."""
    run = uuid.uuid4().hex[:8]
    base = os.path.join(tempfile.gettempdir(), f"svs_curing_{run}")
    landing = os.path.join(base, "landing")
    out_dir = os.path.join(base, "admitted")
    seen_dir = os.path.join(base, "seen_hashes")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(landing, exist_ok=True)

    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    write_shard_landing(docs, landing, n_shards)

    schema = docs.schema

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        q = batch_df.filter(
            (F.round(TXT.quality_score("text"), 6) + F.lit(0.0) >= min_quality)
            & (TXT.token_count("text") >= min_tokens)
        ).select("doc_id", TXT.content_fingerprint("text").alias("content_hash"))
        # within-batch election: keep the minimum doc_id per hash
        q = (
            q.groupBy("content_hash")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id", "content_hash")
        )
        try:
            seen = batch_df.sparkSession.read.parquet(seen_dir)
            fresh = q.join(seen, "content_hash", "left_anti")
        except Exception:
            fresh = q
        fresh = fresh.localCheckpoint(eager=True)  # two appends, one eval
        fresh.select("doc_id", "content_hash").write.mode("append").parquet(out_dir)
        fresh.select("content_hash").write.mode("append").parquet(seen_dir)

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
    return spark.read.parquet(out_dir)


def stream_decontaminate_ingest(
    spark: SparkSession,
    sf_dir: str,
    n_shards: int = 4,
    n: int = 8,
    min_containment: float = 0.3,
) -> DataFrame:
    """Contamination flagging ON ARRIVAL: the benchmark (source
    'src0', the batch ``decontaminate`` convention) is static; the
    training corpus drains through the stream in ``n_shards`` arrival
    batches, and each batch pays exactly ITS OWN containment join
    against the benchmark's broadcast shingle table.

    Why stateless-per-batch is the right shape here (unlike the dedup
    stream above, which must remember every hash it admitted):
    containment is a pure function of (one training doc, the static
    benchmark), so no cross-batch state exists at all — the stream is
    embarrassingly incremental, the benchmark's SHINGLED table is
    materialized once (eager localCheckpoint) so each trigger pays
    only its own batch's tokenization, and a replayed batch rewrites
    the same flag rows (idempotent per batch content).
    Drained output == batch ``decontaminate`` bit-for-bit, so this
    entry shares the exact SQL oracle.

    At 100 TB: per-trigger cost tracks the BATCH's shingle volume,
    never the accumulated corpus; for suite-scale benchmarks swap the
    broadcast shingle table for the Bloom bitset admission
    (``operators.curation.decontaminate_bloom``) inside the same
    ``foreachBatch`` — the bitset is driver-resident and reusable
    across triggers unchanged.

    Returns (doc_id, bench_id, n_common, containment) for every
    flagged pair, read back from the sink.
    """
    from ..operators import dedup
    from ..operators.curation import _decontaminate_pair

    run = uuid.uuid4().hex[:8]
    base = os.path.join(tempfile.gettempdir(), f"svs_decon_{run}")
    landing = os.path.join(base, "landing")
    out_dir = os.path.join(base, "flagged")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(landing, exist_ok=True)

    docs = load_documents(spark, sf_dir).select("doc_id", "text", "source")
    bench = docs.filter(F.col("source") == "src0").select("doc_id", "text")
    train = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    write_shard_landing(train, landing, n_shards)
    # shingle the static benchmark ONCE; without the barrier every
    # trigger would re-run the bench scan+tokenization through lineage
    # (the build_knn_graph lesson)
    bench_sh = dedup.shingled_table(bench, n=n).localCheckpoint(eager=True)

    schema = train.schema

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        flagged = _decontaminate_pair(
            bench, batch_df, n=n, min_containment=min_containment,
            bench_shingled=bench_sh,
        )
        # idempotence: one overwritten directory per batch id — a
        # foreachBatch replay rewrites, never double-appends (the
        # lexical-ingest lesson)
        flagged.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
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
    return spark.read.parquet(os.path.join(out_dir, "batch=*")).select(
        "doc_id", "bench_id", "n_common", "containment"
    )


def stream_logreg_score(
    spark: SparkSession, sf_dir: str, n_shards: int = 4
) -> DataFrame:
    """Model-based filtering ON ARRIVAL: documents drain in
    ``n_shards`` checkpointed batches and every batch is scored with
    the session-trained logreg model (``operators/logreg`` — trained
    once, broadcast into each micro-batch; training set = the batch
    corpus, the standard offline-train/online-score split). Scoring is
    a pure per-doc function of the broadcast model, so drained
    verdicts equal the batch path row-for-row and this entry shares
    ``logreg_score``'s oracle verbatim.

    Scale shape: per batch one narrow featurize + broadcast join —
    nothing stateful, nothing corpus-sized in state; the model is the
    only cross-batch artifact (n_buckets rows)."""
    import uuid

    from pyspark.sql import functions as F

    from ..operators import logreg as LR
    from ..sources.store import load_documents

    run = uuid.uuid4().hex[:8]
    base = os.path.join(tempfile.gettempdir(), f"svs_lrstream_{run}")
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "scored")
    os.makedirs(landing, exist_ok=True)
    os.makedirs(out, exist_ok=True)

    docs = load_documents(spark, sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    # train once (session weight cache) — the offline half
    feats = LR._features(docs)
    key = (spark.sparkContext.applicationId, sf_dir, LR.N_ITER, int(LR.LR))
    w = LR._WEIGHT_CACHE.get(key)
    if w is None:
        w = LR.train_weights(spark, feats, n_iter=LR.N_ITER, lr=LR.LR)
        LR._WEIGHT_CACHE[key] = w
    wdf = spark.createDataFrame(
        [(b, u / 1e9) for b, u in w.items()], "b bigint, w double"
    )

    write_shard_landing(docs, landing, n_shards, order_col="doc_id")
    schema = docs.schema

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        bf = LR._features(batch_df)
        scored = LR._margins(bf, wdf).select(
            "doc_id",
            "y",
            LR._softsign_p(F.col("m")).alias("p"),
        )
        res = (
            batch_df.select(
                "doc_id",
                F.when(F.col("doc_id") % 5 != 0, F.lit("train"))
                .otherwise(F.lit("holdout"))
                .alias("split"),
            )
            .join(scored, "doc_id")
            .select(
                "doc_id",
                "split",
                F.col("y").cast("bigint").alias("y"),
                (F.round(F.col("p"), 6) + F.lit(0.0)).alias("score"),
                F.when(F.col("p") >= 0.5, F.lit(1))
                .otherwise(F.lit(0))
                .cast("bigint")
                .alias("y_pred"),
            )
        )
        res.write.mode("overwrite").parquet(
            os.path.join(out, f"batch={batch_id}")
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
    return spark.read.parquet(os.path.join(out, "batch=*")).select(
        "doc_id", "split", "y", "score", "y_pred"
    )
