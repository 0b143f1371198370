"""Scalar quantization (SQ8) — 8-bit-per-dimension ANN scale path.

Public-knowledge basis: per-vector symmetric int8 quantization
(codes = round(x · 127 / max|x|)), the "SQ" layout every mainstream
vector store ships beside PQ and binary codes (e.g. faiss
ScalarQuantizer QT_8bit). It completes this repo's compression
ladder: BQ (1 bit, 32×, coarsest) — **SQ8 (8 bits, ~4×, near-exact)**
— PQ (codebook ADC, 8-32×, lookup-table scans).

Why it matters at 100 TB: a float32 corpus at dim 64 scans 256 bytes
per vector; int8 codes + one scale scan ~72 — a ~3.5× scan-byte cut
with reconstruction error ≤ max|x|/254 per coordinate, so the
approximate ranking is already close and a short exact rerank
restores precision. Unlike PQ there is no training pass and no
broadcast codebook: encode is stateless per row, which also makes
upserts trivial (encode the delta, append).

Spark-native shape:

* **Encode** (distributed, zero shuffle, build-time only): one
  Arrow-batched numpy pass — ``codes = floor(x·127/max|x| + 0.5)``
  (the exact scheme of the ``quantize_embeddings`` gate entry, so
  the two surfaces agree bit-for-bit). One narrow parquet table
  (id, codes array<tinyint>, qscale).
* **Approximate scan** (zero Python): strategy-specialized codegen
  over the raw codes — cosine divides the integer dot by the STORED
  code norm (the per-vector scale cancels; one fold per row),
  Euclidean uses the ``||v−q||² = ||v||² − 2⟨v,q⟩ + ||q||²``
  identity (one fold), inner product folds the dot and multiplies
  by one scalar. ONE array traversal per row is the design rule:
  the HOF fold's per-element lambda is the hot cost, so the naive
  dequant-then-score form (3 traversals) measured SLOWER than the
  brute-force float scan; this form measures 1.4× faster at 4M
  rows CPU-bound, plus the ~2× parquet byte cut when scan-bound
  (see ``_approx_score``).
* **Shortlist**: ``ORDER BY approx score LIMIT shortlist`` compiles
  to TakeOrderedAndProject.
* **Rerank**: shortlist ids broadcast-join back into the
  full-precision table; exact strategy score re-ranks. With
  ``shortlist >= corpus`` the result is EXACT for every strategy —
  the oracle-gate variant; pruned shortlists trade recall for scan
  bytes (recall contract pinned in tests/test_sq.py).

Reference parity: extends the reference's ANN surface
(app.py:267-405 exposes flat search only); cited for the shared
strategy vocabulary (app.py:120-131).
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tombstones
from ..config import validate_strategy
from ..functions.distance import score_expr
from .search import _order_cols


@dataclass(frozen=True)
class SqIndex:
    """A persisted (id, codes, qscale, cnorm) int8-code table.
    ``partition_col`` marks the IVF-partitioned composition layout
    (build_ivfsq_index) — maintenance ops guard on it so flat appends
    never mix into a partitioned directory tree."""

    path: str
    dim: int
    n_rows: int
    partition_col: str | None = None


def encode_sq(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes array<tinyint>, qscale double, cnorm double) via one
    Arrow-batched numpy pass (the BQ build pattern — a pure-Column
    encode would re-evaluate the ``max|x|`` subexpression per element
    because Catalyst has no let-binding: measured 84 s vs ~4 s at 4M
    rows). ``cnorm`` is the L2 norm of the integer codes, precomputed
    so the query-time cosine/Euclidean costs ONE array fold per row
    instead of two (the fold over 64 lambda evaluations is the hot
    cost; measured below brute-force without it). It only ranks the
    approximate shortlist, so numpy's summation order is fine.
    Build-time only; the query path stays entirely JVM-side. Zero
    vectors encode to all-zero codes with qscale 0 (dequantize
    reproduces the zero vector)."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    id_type = df.schema[id_col].dataType.simpleString()
    fields = [
        f"`{id_col}` {id_type}", "codes array<tinyint>",
        "qscale double", "cnorm double",
    ]
    for c in extra_cols:
        fields.append(f"`{c}` {df.schema[c].dataType.simpleString()}")
    out_schema = ", ".join(fields)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
                dtype=np.float64,
            )
            s = np.abs(X).max(axis=1)
            safe = np.where(s == 0.0, 1.0, s)
            # floor(x*127/s + 0.5): round-half-up, matching the
            # quantize_embeddings gate entry bit-for-bit
            C = np.floor(X * (127.0 / safe[:, None]) + 0.5).astype(np.int8)
            C[s == 0.0] = 0
            out = {
                id_col: pdf[id_col].values,
                "codes": [list(r) for r in C],
                "qscale": s,
                "cnorm": np.sqrt((C.astype(np.float64) ** 2).sum(axis=1)),
            }
            for c in extra_cols:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col, *extra_cols).mapInPandas(
        encode, schema=out_schema
    )


def build_sq_index(
    spark: SparkSession,
    src: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "id",
) -> SqIndex:
    """Encode + persist. One pass, no shuffle, no driver collect."""
    first = src.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        raise ValueError("cannot build an SQ index over an empty source")
    dim = int(first["d"])
    encode_sq(src, vec_col=vec_col, id_col=id_col).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "codes"))
    n_rows = spark.read.parquet(os.path.join(path, "codes")).count()
    with open(os.path.join(path, "_sq_meta.json"), "w") as f:
        json.dump({"dim": dim, "n_rows": n_rows, "id_col": id_col}, f)
    return SqIndex(path=path, dim=dim, n_rows=n_rows)


def load_sq_index(path: str) -> SqIndex:
    with open(os.path.join(path, "_sq_meta.json")) as f:
        meta = json.load(f)
    return SqIndex(
        path=path, dim=meta["dim"], n_rows=meta["n_rows"],
        partition_col=meta.get("partition_col"),
    )


def dequant_expr(codes_col="codes", scale_col="qscale") -> Column:
    """array<double> reconstruction: c · s / 127. (Reference form —
    the query path never materializes it; see ``_approx_score``.)"""
    s = F.col(scale_col) if isinstance(scale_col, str) else scale_col
    c = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    return F.transform(c, lambda x: x.cast("double") * s / F.lit(127.0))


def _approx_score(strategy: str, q: Sequence[float]) -> Column:
    """Approximate strategy score over (codes, qscale) WITHOUT
    materializing the dequantized array — a naive
    ``score_expr(strategy, dequant_expr(), q)`` re-evaluates the
    transform per reference (Catalyst has no let-binding; measured
    slower than the brute-force float scan at 4M rows).

    Per strategy: cosine is SCALE-INVARIANT, so scoring the raw int8
    codes against the float query is exactly the dequantized cosine
    (the per-vector s/127 cancels in numerator and denominator);
    inner product is the integer dot times one per-row scalar; the
    distance metrics fold ``c·s/127 − q_i`` in a single zip_with
    pass. All pure codegen, one array traversal each."""
    from ..functions.distance import _py_l2_norm, dot

    qlist = [float(x) for x in q]
    codes = F.col("codes")
    scale = F.col("qscale") / F.lit(127.0)
    if strategy in ("CosineSimilarity", "CosineDistance"):
        # scale-invariant (the per-vector s/127 cancels), and the row
        # norm is the stored cnorm — ONE dot fold per row; try_divide
        # nulls zero vectors like the library cosine
        cos = F.try_divide(
            dot(codes, qlist), F.col("cnorm") * F.lit(_py_l2_norm(qlist))
        )
        return F.lit(1.0) - cos if strategy == "CosineDistance" else cos
    if strategy == "InnerProductSimilarity":
        return dot(codes, qlist) * scale
    if strategy == "EuclideanDistance":
        # ||v - q||² = ||v||² − 2⟨v,q⟩ + ||q||² with v = codes·s/127:
        # one dot fold + stored norms (max(0,·) absorbs rounding)
        qn = _py_l2_norm(qlist)
        vnorm = F.col("cnorm") * scale
        return F.sqrt(
            F.greatest(
                vnorm * vnorm
                - F.lit(2.0) * scale * dot(codes, qlist)
                + F.lit(qn * qn),
                F.lit(0.0),
            )
        )
    # ManhattanDistance: no norm identity — a single zip_with fold
    qcol = F.lit(qlist).cast("array<double>")
    diffs = F.zip_with(
        codes, qcol, lambda c, qx: c.cast("double") * scale - qx
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + F.abs(x))


def sq_search_rerank(
    spark: SparkSession,
    index: SqIndex,
    src: DataFrame,
    query_vec: Sequence[float],
    k: int,
    strategy: str = "CosineSimilarity",
    shortlist: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "id",
    round_digits: int | None = None,
    filter_ids: DataFrame | None = None,
) -> DataFrame:
    """Dequantized-approx shortlist -> exact re-rank -> (id, score)
    top-k. ``shortlist=None`` keeps every row (exact for any strategy
    — the oracle-gate configuration); ``filter_ids`` restricts
    candidates BEFORE the shortlist (the shared non-strict filtered
    contract), so full-shortlist filtered == exact filtered."""
    validate_strategy(strategy)
    if not isinstance(k, int) or k < 1:
        raise ValueError("k must be a positive integer")
    if len(query_vec) != index.dim:
        raise ValueError(f"query dim {len(query_vec)} != index dim {index.dim}")
    n_short = index.n_rows if shortlist is None else int(shortlist)

    codes = tombstones.apply_tombstones(
        spark, index.path, spark.read.parquet(os.path.join(index.path, "codes")),
        id_col=id_col,
    )
    if filter_ids is not None:
        codes = codes.join(
            filter_ids.select(F.col(filter_ids.columns[0]).alias(id_col)),
            id_col,
            "left_semi",
        )
    approx = _approx_score(strategy, list(query_vec))
    cand = (
        codes.withColumn("score", approx)
        .select(id_col, "score")
        .orderBy(*_order_cols(strategy, id_col=id_col))
        .limit(int(n_short))
    )
    vecs = src.select(F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col))
    joined = vecs.join(F.broadcast(cand.select(id_col)), id_col, "inner")
    score = score_expr(strategy, F.col(vec_col), list(query_vec))
    if round_digits is not None:
        score = F.round(score, round_digits) + F.lit(0.0)
    return (
        joined.withColumn("score", score)
        .select(F.col(id_col).alias("id"), "score")
        .orderBy(*_order_cols(strategy))
        .limit(k)
    )


def sq_upsert(
    spark: SparkSession,
    index: SqIndex,
    new_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "id",
) -> SqIndex:
    """Incremental maintenance: encode new rows (stateless — SQ has no
    trained state to go stale, unlike PQ's codebooks) and APPEND to
    the codes table; same append-generation pattern as ``bq_upsert``.
    Re-inserted ids are resurrected from the tombstone set; duplicate
    ids fold at the next ``sq_compact(dedup_ids=True)``.

    Raises for an IVF-partitioned layout (build_ivfsq_index): flat
    appends would break cluster_id partition discovery/pruning —
    route new rows through ``ivf_upsert`` and re-encode the touched
    clusters (the shared pq_upsert/bq_upsert partition guard)."""
    if index.partition_col is not None:
        raise ValueError(
            f"sq_upsert on a layout partitioned by {index.partition_col!r} "
            "would mix unpartitioned files into the directory tree; "
            "rebuild via build_ivfsq_index (or ingest through ivf_upsert "
            "and re-encode the touched clusters)"
        )
    # dim guard: a mis-dimensioned batch would append codes that score
    # NULL through zip_with padding and silently sink in results
    bad = new_df.filter(F.size(F.col(vec_col)) != index.dim).limit(1).count()
    if bad:
        raise ValueError(
            f"sq_upsert batch has vectors whose length != index dim {index.dim}"
        )
    codes_df = encode_sq(new_df, vec_col=vec_col, id_col=id_col)
    codes_df.persist()
    try:
        tombstones.resurrect_ids(spark, index.path, codes_df, id_col)
        n_new = codes_df.count()
        codes_df.write.mode("append").parquet(os.path.join(index.path, "codes"))
    finally:
        codes_df.unpersist()
    out = SqIndex(path=index.path, dim=index.dim, n_rows=index.n_rows + n_new)
    with open(os.path.join(index.path, "_sq_meta.json"), "w") as f:
        json.dump({"dim": out.dim, "n_rows": out.n_rows, "id_col": id_col}, f)
    return out


def sq_compact(
    spark: SparkSession,
    index: SqIndex,
    out_dir: str,
    n_files: int = 1,
    dedup_ids: bool = False,
    id_col: str = "id",
) -> SqIndex:
    """Generation rewrite: fold tombstones and append churn into
    ``n_files`` files (immutable new generation, pointer flip — the
    shared ``ivf_compact``/``bq_compact`` contract). ``dedup_ids=True``
    keeps one row per id for streaming replay hygiene. A partitioned
    (IVF x SQ) layout compacts partition-aware — one file per cluster
    directory, ``partition_col`` preserved in the meta — so
    ``ivfsq_search`` keeps cluster-directory pruning and the
    ``sq_upsert`` partition guard keeps rejecting flat appends."""
    if n_files < 1:
        raise ValueError("n_files must be a positive integer")
    df = tombstones.apply_tombstones(
        spark, index.path,
        spark.read.parquet(os.path.join(index.path, "codes")),
        id_col=id_col,
    )
    if dedup_ids:
        df = df.dropDuplicates([id_col])
    if index.partition_col is not None:
        # hash on the partition key: each cluster's rows land in one
        # shuffle partition => exactly one file per cluster directory
        df.repartition(n_files, index.partition_col).write.mode(
            "overwrite"
        ).partitionBy(index.partition_col).parquet(os.path.join(out_dir, "codes"))
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(out_dir, "codes")
        )
    n_rows = spark.read.parquet(os.path.join(out_dir, "codes")).count()
    with open(os.path.join(out_dir, "_sq_meta.json"), "w") as f:
        json.dump({
            "dim": index.dim, "n_rows": n_rows, "id_col": id_col,
            "partition_col": index.partition_col,
        }, f)
    return SqIndex(
        path=out_dir, dim=index.dim, n_rows=n_rows,
        partition_col=index.partition_col,
    )


# ----------------------------------------------- IVF x SQ composition


def build_ivfsq_index(spark: SparkSession, ivf_index, out_dir: str) -> SqIndex:
    """IVF-partitioned int8 layout — the SQ analogue of IVFADC/IVFBQ:
    encode the IVF index's rows keeping ``cluster_id`` as the codes
    partition column, so a query reads ~(search_top_size / n_clusters)
    of the rows AND ~1/2 of the parquet bytes per row it does read,
    with near-exact codes (tight shortlists; see the recall contract
    in tests/test_sq.py)."""
    src = spark.read.parquet(ivf_index.path).select(
        F.col(ivf_index.id_col).alias("id"),
        F.col(ivf_index.vec_col).alias("embedding"),
        "cluster_id",
    )
    first = src.select(F.size("embedding").alias("d")).first()
    if first is None:
        raise ValueError("cannot build over an empty IVF layout")
    dim = int(first["d"])
    codes_df = encode_sq(src, extra_cols=("cluster_id",))
    (
        codes_df.write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(os.path.join(out_dir, "codes"))
    )
    n_rows = spark.read.parquet(os.path.join(out_dir, "codes")).count()
    with open(os.path.join(out_dir, "_sq_meta.json"), "w") as f:
        json.dump(
            {
                "dim": dim, "n_rows": n_rows, "id_col": "id",
                "partition_col": "cluster_id",
            },
            f,
        )
    return SqIndex(
        path=out_dir, dim=dim, n_rows=n_rows, partition_col="cluster_id"
    )


def ivfsq_search(
    spark: SparkSession,
    ivf_index,
    sq_index: SqIndex,
    query_vec: Sequence[float],
    k: int,
    strategy: str = "CosineSimilarity",
    search_top_size: int = 2,
    shortlist: int | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """Rank centroids on the driver -> prune the codes layout to the
    ``search_top_size`` nearest cluster directories (planner-level
    partition pruning) -> one-fold approx shortlist inside them ->
    exact rerank against the full-precision vectors of the SAME
    pruned clusters. Exact when ``search_top_size >= n_clusters`` and
    ``shortlist=None``."""
    from .index import _rank_centroids

    validate_strategy(strategy)
    if not isinstance(k, int) or k < 1:
        raise ValueError("k must be a positive integer")
    if len(query_vec) != sq_index.dim:
        raise ValueError(f"query dim {len(query_vec)} != index dim {sq_index.dim}")
    keep = _rank_centroids(ivf_index, query_vec, strategy)[:search_top_size]

    codes = tombstones.apply_tombstones(
        spark,
        sq_index.path,
        spark.read.parquet(os.path.join(sq_index.path, "codes")).filter(
            F.col("cluster_id").isin(keep)
        ),
    )
    n_short = sq_index.n_rows if shortlist is None else int(shortlist)
    cand = (
        codes.withColumn("score", _approx_score(strategy, list(query_vec)))
        .select("id", "score")
        .orderBy(*_order_cols(strategy))
        .limit(int(n_short))
    )
    vecs = (
        spark.read.parquet(ivf_index.path)
        .filter(F.col("cluster_id").isin(keep))
        .select(
            F.col(ivf_index.id_col).alias("id"),
            F.col(ivf_index.vec_col).alias("embedding"),
        )
    )
    joined = vecs.join(F.broadcast(cand.select("id")), "id", "inner")
    score = score_expr(strategy, F.col("embedding"), list(query_vec))
    if round_digits is not None:
        score = F.round(score, round_digits) + F.lit(0.0)
    return (
        joined.withColumn("score", score)
        .select("id", "score")
        .orderBy(*_order_cols(strategy))
        .limit(k)
    )
