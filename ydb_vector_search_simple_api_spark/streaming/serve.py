"""Streaming ANN query serving — the query-side twin of index_ingest.

``index_ingest`` keeps the index fresh as vectors land; this module
answers a *stream of queries* against the (frozen or concurrently
maintained) index: a landing directory of query shards is consumed
exactly once (checkpointed file source), each micro-batch runs the
distributed-assignment batch ANN join (no driver collect of the query
side — ``operators/index.py:ivf_knn_join_distributed``), and results
append to a results table. That is the standard high-throughput
serving topology: queries arrive on a bus/landing zone, answers land
on a results topic/table; per-batch cost tracks batch size, never
corpus size (pruned partition reads) nor stream history (no state —
every query is answered once, so no watermarking is needed).

Because per-query answers are independent, draining the whole stream
is set-equal to one batch kNN join over all queries — which makes the
operator oracle-checkable end-to-end (DuckDB twin: the same
``knn_join_sql``), not just rows-only: the strongest correctness gate
available to a streaming operator.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import index as ivf_mod
from ..sources.store import load_embeddings
from .events import _stream_shuffle


def stream_knn_serve(
    spark: SparkSession,
    index: "ivf_mod.IvfIndex",
    queries_stream: DataFrame,
    results_dir: str,
    checkpoint_dir: str,
    k: int,
    strategy: str = "CosineSimilarity",
    search_top_size: int | None = None,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    round_digits: int | None = None,
    available_now: bool = True,
    engine: str = "distributed",
):
    """Answer a streaming query source against an IVF index.

    Each micro-batch: cluster routing → pruned candidate join →
    per-query top-k → append to ``results_dir`` (parquet). Returns the
    started StreamingQuery; ``available_now`` drains-and-stops
    (test/backfill mode).

    ``engine`` picks the per-batch join:

    * ``"distributed"`` (default): ``ivf_knn_join_distributed`` —
      fold-scored, bit-exact with the SQL oracle (the gate path).
    * ``"routed_blocked"``: ``ivf_knn_join_routed_blocked`` — the
      measured serving fast path (25x, tools/scale_probe.py); BLAS
      scores differ in the last ulp, so this variant is pinned by
      id/rank equality tests rather than the value-hash oracle."""
    width = search_top_size or index.n_clusters
    if engine not in ("distributed", "routed_blocked"):
        raise ValueError("engine must be 'distributed' or 'routed_blocked'")

    def _answer(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        if engine == "routed_blocked":
            out = ivf_mod.ivf_knn_join_routed_blocked(
                spark, index, batch_df, k=k, strategy=strategy,
                search_top_size=width, query_id=query_id, query_vec=query_vec,
            )
        else:
            out = ivf_mod.ivf_knn_join_distributed(
                spark, index, batch_df, k=k, strategy=strategy,
                search_top_size=width, query_id=query_id, query_vec=query_vec,
                round_digits=round_digits,
            )
        out.write.mode("append").parquet(results_dir)

    writer = (
        queries_stream.writeStream.foreachBatch(_answer)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def query_shard_stream(
    spark: SparkSession,
    landing_dir: str,
    max_files_per_trigger: int | None = 1,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Checkpointed file-source over a landing directory of query
    shards. ``max_files_per_trigger=1`` forces one micro-batch per
    shard (exercises real increments in tests; None = drain freely)."""
    schema = spark.read.parquet(landing_dir).select(query_id, query_vec).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.parquet(landing_dir).select(query_id, query_vec)


def knn_serve_stream(
    spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 8,
    engine: str = "distributed",
) -> DataFrame:
    """Gate entry: drop the first ``n_queries`` embedding rows as 3
    query shards, drain them through :func:`stream_knn_serve` at full
    width (one shard per micro-batch), and return the accumulated
    results — set-equal to the exact batch kNN join (DuckDB twin:
    ``oracles.knn_join_sql``)."""
    import tempfile

    import __spark_entry__ as E  # reuse the round's cached IVF index

    idx = E._ivf_index(spark, sf_dir)
    embs = load_embeddings(spark, sf_dir)
    queries = embs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    base = tempfile.mkdtemp(prefix=f"svs_serve_{uuid.uuid4().hex[:8]}_")
    landing = os.path.join(base, "queries")
    results = os.path.join(base, "results")
    ckpt = os.path.join(base, "ckpt")
    # 3 shard files -> 3 micro-batches under maxFilesPerTrigger=1
    queries.repartition(3).write.parquet(landing)

    with _stream_shuffle(spark):
        q = stream_knn_serve(
            spark,
            idx,
            query_shard_stream(spark, landing),
            results_dir=results,
            checkpoint_dir=ckpt,
            k=k,
            search_top_size=idx.n_clusters,
            round_digits=6,
            engine=engine,
        )
        q.awaitTermination()
    return spark.read.parquet(results).orderBy("query_id", "rank")
