"""OPQ — Optimized Product Quantization (Ge et al., CVPR 2013), the
parametric variant: learn an ORTHOGONAL rotation R that decorrelates
dimensions and balances variance across PQ subspaces, then product-
quantize the rotated vectors. Plain PQ chops the raw axes into m
contiguous blocks; when dimensions are correlated or variance is
uneven, some codebooks model noise while others saturate. The
parametric OPQ fix is closed-form: R = PCA eigenvectors with
EIGENVALUE ALLOCATION — greedily deal the principal directions to the
m subspaces so each subspace's variance product is balanced (Ge et
al. §4; the independence + balance assumptions of the paper).

Spark shape (all the heavy steps reuse the PQ machinery unchanged):

- **Train is driver-side on a bounded sample.** The same xxhash64
  thinning collect as ``build_pq_index``; fitting is one d×d ``eigh``
  (d=64 here) + a greedy allocation over d eigenvalues — O(d³) on the
  driver, constant in corpus size.
- **Rotation is an Arrow matmul, not a shuffle.** The corpus is
  rotated inside the SAME ``mapInPandas`` scan that encodes codes
  (one broadcast of a d×d matrix ≈ 32 KB), so OPQ's build plan is
  plan-identical to PQ's: scan → mapInPandas → write.
- **Search rotates the QUERY, not the data.** R is orthogonal, so
  distances/cosines in rotated space equal the originals; the ADC
  shortlist runs on rotated codes with the rotated query, and the
  exact re-rank joins the ORIGINAL vectors with the ORIGINAL query —
  full-shortlist therefore stays EXACT (the oracle-gated config,
  same contract as pq/bq/sq_rerank_full).

Reference note: the reference engine (app.py) exposes no compressed
index; extension scope (SURVEY.md "beyond the reference"), rounding out
the compressed-shape family (PQ, IVFADC, BQ, SQ8, OPQ, IVF×OPQ).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import sort_descending, validate_strategy
from ..functions.distance import score_expr
from .pq import PqIndex, build_pq_index, load_pq_index, pq_adc_topk

_META_FILE = "_opq_meta.json"


@dataclass(frozen=True)
class OpqIndex:
    path: str
    rotation: np.ndarray  # (d, d) orthogonal; applied as x @ R
    pq: PqIndex


def train_opq_rotation(x: np.ndarray, m: int) -> np.ndarray:
    """Parametric OPQ rotation from a training sample: PCA basis +
    eigenvalue allocation. Returns R (d, d) with columns ordered so
    subspace j owns columns [j·dsub, (j+1)·dsub) and the product of
    eigenvalues per subspace is greedily balanced (largest eigenvalue
    to the currently-lightest non-full bucket). Deterministic: ties
    break by bucket index; eigenvector sign fixed by largest-|coord|
    positive (the embstats convention)."""
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    for j in range(d):  # deterministic sign
        i = int(np.abs(evecs[:, j]).argmax())
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    # balanced allocation on log-eigenvalues (Ge et al. §4.1's goal,
    # SHIFT-INVARIANT greedy): the naive "assign to the min-product
    # non-full bucket" degenerates whenever all eigenvalues are < 1
    # (unit-normalized data: trace(cov) <= 1 so every log is negative
    # and the bucket just fed keeps being the minimum — it swallows a
    # contiguous run, reproducing the chop the allocation exists to
    # beat). Level greedy instead: one direction per bucket per round,
    # each round handing the largest remaining eigenvalue to the
    # currently-lightest bucket — comparisons only ever happen between
    # buckets with EQUAL fill, so a global rescale of the spectrum
    # (which shifts every log equally per slot) cannot change any
    # decision. Ties break by bucket index; fully deterministic.
    loads = np.zeros(m)
    slots: list[list[int]] = [[] for _ in range(m)]
    logs = np.log(np.maximum(evals, 1e-12))
    for level in range(dsub):
        order = sorted(range(m), key=lambda i: (loads[i], i))
        for pick, b in enumerate(order):
            j = level * m + pick
            slots[b].append(j)
            loads[b] += logs[j]
    cols = [j for b in range(m) for j in slots[b]]
    return np.ascontiguousarray(evecs[:, cols])


def build_opq_index(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    m: int = 8,
    nbits: int = 8,
    train_rows: int = 16384,
    normalize: bool = False,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> OpqIndex:
    """Offline build: train R on the bounded sample, rotate the corpus
    in one Arrow pass, and product-quantize the rotated vectors with
    the stock PQ builder (codes live under ``out_dir``/pq)."""
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("embedding"))
    train = (
        src.orderBy(F.abs(F.xxhash64(F.col("id"))).asc(), F.col("id").asc())
        .limit(train_rows)
        .collect()
    )
    X = np.array([r.embedding for r in train], dtype=np.float64)
    if normalize:
        X = X / np.maximum(np.linalg.norm(X, axis=1)[:, None], 1e-300)
    R = train_opq_rotation(X, m=m)
    rotated = rotate_df(spark, src, R)
    pq = build_pq_index(
        spark,
        rotated,
        os.path.join(out_dir, "pq"),
        m=m,
        nbits=nbits,
        train_rows=train_rows,
        normalize=normalize,
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _META_FILE), "w") as f:
        json.dump({"rotation": R.tolist()}, f)
    return OpqIndex(path=out_dir, rotation=R, pq=pq)


def load_opq_index(path: str) -> OpqIndex:
    with open(os.path.join(path, _META_FILE)) as f:
        meta = json.load(f)
    return OpqIndex(
        path=path,
        rotation=np.array(meta["rotation"], dtype=np.float64),
        pq=load_pq_index(os.path.join(path, "pq")),
    )


def rotate_df(
    spark: SparkSession,
    src: DataFrame,
    R: np.ndarray,
    extra_cols: tuple = (),
) -> DataFrame:
    """(id, embedding, *extra) -> (id, embedding @ R, *extra) via one
    broadcast Arrow matmul batch kernel — no shuffle, no per-row
    Python. ``extra_cols`` (e.g. the IVF ``cluster_id``) ride the
    batch untouched so the partitioned layout survives the rotation."""
    bc = spark.sparkContext.broadcast(R)
    extra_schema = "".join(
        f", {c} {src.schema[c].dataType.simpleString()}" for c in extra_cols
    )

    def _rot(batches):
        import pandas as pd

        R_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            out = {"id": pdf["id"].to_numpy(), "embedding": list(E @ R_)}
            for c in extra_cols:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    return src.mapInPandas(
        _rot, schema=f"id long, embedding array<double>{extra_schema}"
    )


def opq_search_rerank(
    spark: SparkSession,
    index: OpqIndex,
    full_df: DataFrame,
    query_vec: Sequence[float],
    k: int = 4,
    strategy: str = "CosineSimilarity",
    shortlist: int = 100,
    round_digits: int | None = None,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """ADC shortlist in ROTATED space -> exact re-rank on the ORIGINAL
    vectors/query. ``shortlist >= corpus size`` is EXACT (identical to
    exact_search over (id, score)) — the oracle-gated configuration.
    ``filter_ids`` restricts candidates BEFORE the shortlist (the
    shared non-strict filtered-ANN contract)."""
    validate_strategy(strategy)
    q = np.asarray(list(query_vec), dtype=np.float64)
    q_rot = q @ index.rotation
    cand = pq_adc_topk(
        spark, index.pq, list(q_rot), k=shortlist, strategy=strategy,
        filter_ids=filter_ids,
    )
    ids = cand.select("id")
    src = full_df.select(
        F.col(index.pq.id_col).alias("id"),
        F.col(index.pq.vec_col).alias("embedding"),
    )
    hit = src.join(F.broadcast(ids), "id", "left_semi")
    score = score_expr(strategy, F.col("embedding"), [float(v) for v in q])
    if round_digits is not None:
        score = F.round(score, round_digits) + F.lit(0.0)
    direction = (
        F.col("score").desc_nulls_last()
        if sort_descending(strategy)
        else F.col("score").asc_nulls_last()
    )
    return (
        hit.withColumn("score", score)
        .select("id", "score")
        .orderBy(direction, F.col("id").asc())
        .limit(k)
    )


def build_ivfopq_index(
    spark: SparkSession,
    ivf_index,
    out_dir: str,
    m: int = 8,
    nbits: int = 8,
    train_rows: int = 16384,
    normalize: bool = False,
) -> OpqIndex:
    """IVF×OPQ composition (the FAISS ``OPQ..,IVF..,PQ..`` factory
    string): rotate the IVF index's partitioned layout with the
    learned R and PQ-encode it keeping ``cluster_id`` as the codes
    partition column — directory pruning and rotated-ADC byte
    compression multiply, exactly like IVFADC, with the rotation's
    lower per-code distortion on top."""
    src = spark.read.parquet(ivf_index.path).select(
        F.col(ivf_index.id_col).alias("id"),
        F.col(ivf_index.vec_col).alias("embedding"),
        "cluster_id",
    )
    train = (
        src.select("id", "embedding")
        .orderBy(F.abs(F.xxhash64(F.col("id"))).asc(), F.col("id").asc())
        .limit(train_rows)
        .collect()
    )
    X = np.array([r.embedding for r in train], dtype=np.float64)
    if normalize:
        X = X / np.maximum(np.linalg.norm(X, axis=1)[:, None], 1e-300)
    R = train_opq_rotation(X, m=m)
    rotated = rotate_df(spark, src, R, extra_cols=("cluster_id",))
    pq = build_pq_index(
        spark,
        rotated,
        os.path.join(out_dir, "pq"),
        m=m,
        nbits=nbits,
        train_rows=train_rows,
        normalize=normalize,
        partition_col="cluster_id",
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _META_FILE), "w") as f:
        json.dump({"rotation": R.tolist()}, f)
    return OpqIndex(path=out_dir, rotation=R, pq=pq)


def ivfopq_search(
    spark: SparkSession,
    ivf_index,
    opq_index: OpqIndex,
    query_vec: Sequence[float],
    k: int = 4,
    strategy: str = "CosineSimilarity",
    search_top_size: int = 2,
    rerank: int | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """IVF×OPQ read path: the stock IVFADC engine
    (:func:`pq.ivfpq_search`) with one twist — the ADC stage sees the
    ROTATED query (the codes live in rotated space) while centroid
    routing and the full-precision rerank stay in the original space.
    Exact when ``search_top_size >= n_clusters`` and ``rerank >=
    corpus size`` (the oracle-gated configuration)."""
    from .pq import ivfpq_search

    q = np.asarray(list(query_vec), dtype=np.float64)
    return ivfpq_search(
        spark,
        ivf_index,
        opq_index.pq,
        [float(v) for v in q],
        k=k,
        strategy=strategy,
        search_top_size=search_top_size,
        rerank=rerank,
        round_digits=round_digits,
        adc_query_vec=[float(v) for v in (q @ opq_index.rotation)],
    )
