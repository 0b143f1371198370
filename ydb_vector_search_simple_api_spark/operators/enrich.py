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
