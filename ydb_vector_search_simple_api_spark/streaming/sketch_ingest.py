"""Streaming heavy hitters: a Misra-Gries summary maintained across
micro-batches, with the exact-count serving pass of the batch
operator.

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
