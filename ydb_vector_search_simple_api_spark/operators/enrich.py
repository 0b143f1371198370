"""Batch embedding enrichment: O13 (text -> embedding) at pipeline
scale.

The reference embeds one query string per HTTP request
(``/root/reference/app.py:105-154``). A training-data pipeline embeds
*billions of rows*, so the scale shape is: Arrow-batched
``mapInPandas`` with a pluggable batch embedder — one embedder call
per Arrow batch (which is where an HTTP/gRPC model server or an
in-process model would be invoked), never per row.

No embedding model ships in this container, so the default embedder is
a DETERMINISTIC FAKE (md5-seeded unit vectors): the Spark plumbing —
schema, batching, column wiring — is real and tested; swap
``embedder`` for a real model client in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F, types as T

#: batch embedder contract: list[str] -> (len(texts), dim) float32
Embedder = Callable[[list[str]], "np.ndarray"]


def deterministic_fake_embedder(dim: int = 64) -> Embedder:
    """md5-seeded unit vectors: stable across runs/machines, no model
    required. Clearly a stand-in — real deployments pass a model
    client with the same batch contract."""

    def embed(texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(dim)
            out[i] = (v / np.linalg.norm(v)).astype(np.float32)
        return out

    return embed


def embed_column(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    embedder: Embedder | None = None,
    dim: int = 64,
) -> DataFrame:
    """Append an embedding column computed by the batch embedder.

    One embedder invocation per Arrow batch; all other columns pass
    through untouched. Output schema = input schema + out_col
    (array<float>).
    """
    emb = embedder or deterministic_fake_embedder(dim)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = emb(pdf[text_col].astype(str).tolist())
            pdf = pdf.copy()
            pdf[out_col] = [v.tolist() for v in vecs]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def pool_chunk_embeddings(
    spark,
    sf_dir: str,
    chunk_size: int = 64,
    stride: int = 48,
    dim: int = 32,
    embedder: Embedder | None = None,
):
    """Long-document embedding: chunk -> embed each chunk -> mean-pool
    back to one vector per document — the standard pattern when texts
    outrun the embedder's context window.

    Scale shape: chunking is a narrow map (textual.chunk_documents),
    embedding is one Arrow batch call per block (embed_column), and
    the pool is posexplode -> groupBy(doc_id, pos) with MAP-SIDE
    partial aggregation in DECIMAL(28,10) (order-independent, exact —
    the label_centroids contract) -> one array_sort rebuild. Shuffle
    carries docs x dim partial sums, never chunk texts.

    Gate shape (rows-only: the fake embedder has no SQL twin): one row
    per doc — (doc_id, n_chunks, dim, pooled_norm, pooled_md5) where
    pooled_md5 digests the 6-rounded pooled vector. Pinned against a
    driver-side NumPy replay in tests/test_scale_paths.py.
    """
    from .textual import chunk_documents

    chunks = chunk_documents(spark, sf_dir, chunk_size=chunk_size, stride=stride)
    embedded = embed_column(
        chunks.select("doc_id", "chunk_id", F.col("chunk_text").alias("text")),
        text_col="text",
        out_col="emb",
        embedder=embedder,
        dim=dim,
    )
    ex = embedded.select(
        "doc_id", "chunk_id", F.posexplode("emb").alias("pos", "val")
    )
    pooled_val = (
        F.round(
            F.sum(F.col("val").cast("double").cast("decimal(28,10)"))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        )
        + F.lit(0.0)
    )
    per_pos = ex.groupBy("doc_id", "pos").agg(
        pooled_val.alias("v"),
        F.countDistinct("chunk_id").alias("n_chunks"),
    )
    vec = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
    )
    norm = F.aggregate(
        F.col("pooled"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return (
        per_pos.groupBy("doc_id")
        .agg(vec.alias("pooled"), F.max("n_chunks").alias("n_chunks"))
        .select(
            "doc_id",
            "n_chunks",
            F.size("pooled").alias("dim"),
            (F.round(F.sqrt(norm), 6) + F.lit(0.0)).alias("pooled_norm"),
            F.md5(F.to_json(F.struct("pooled"))).alias("pooled_md5"),
        )
    )
