"""Binary quantization (BQ) — 1-bit-per-dimension ANN scale path.

Public-knowledge basis: sign-bit quantization / binary hashing for
angular similarity (Charikar, "Similarity Estimation Techniques from
Rounding Algorithms", STOC 2002: the sign pattern of a vector is an
LSH family for cosine; Hamming distance between sign patterns
estimates the angle). The identity-projection special case used here
(sign of each coordinate) is the standard "binary quantization" of
vector databases.

Why it matters at 100 TB: a float32 corpus at dim 64 is 256 bytes per
vector; sign bits are 8 bytes — a 32x scan-size cut like PQ
(operators/pq.py) but with a *pure-JVM* query path: Hamming distance
is ``bit_count(a XOR b)`` over packed 64-bit words, a whole-stage
codegen expression. No Python boundary, no broadcast lookup table —
the cheapest possible first-pass filter, at the cost of a coarser
approximation than PQ's ADC (1 bit vs 8 bits per subdimension).

Spark-native shape:

* **Encode** (distributed, zero shuffle): one Arrow-batched
  ``mapInPandas`` pass packs ``sign(x) > 0`` bits into
  ``array<bigint>`` words (NumPy packbits). Build-time only.
* **Hamming scan** (distributed, zero shuffle, zero Python): the query
  word array is a literal; per-row distance is
  ``aggregate(zip_with(bits, qbits, (x, y) -> bit_count(x ^ y)), 0, +)``
  — all inside codegen over the narrow (id, bits) table.
* **Shortlist**: ``ORDER BY hamming LIMIT shortlist`` compiles to
  TakeOrderedAndProject (per-partition heap; only ``shortlist`` rows
  per partition reach the driver merge).
* **Rerank**: shortlist ids semi-join back into the full-precision
  vector table (broadcast — a shortlist is small by construction) and
  the exact strategy score re-ranks (same Column expressions as
  exact_search). With ``shortlist >= corpus`` the result is EXACT for
  every strategy — the oracle-gate variant; pruned shortlists trade
  recall for scan width, recall contract pinned in tests/test_bq.py.

The Hamming pre-filter approximates ANGULAR closeness: it is a strong
proxy for Cosine/InnerProduct (and exact-rerank fixes ranking); for
Euclidean/Manhattan on non-normalized data it is weaker — documented,
and the full-shortlist path stays exact regardless.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tombstones
from ..config import validate_strategy
from ..functions.distance import score_expr
from .search import _order_cols


@dataclass(frozen=True)
class BqIndex:
    """A persisted (id, bits) sign-bit table beside its source.

    ``partition_col`` records whether the bits layout is
    hive-partitioned (the IVF x BQ composition partitions by
    ``cluster_id``); maintenance ops honor or reject it so flat files
    are never mixed into a partitioned directory."""

    path: str
    dim: int
    n_words: int
    n_rows: int
    partition_col: str | None = None


def _pack_bits(X: np.ndarray) -> np.ndarray:
    """Sign bits of (n, dim) float rows packed into (n, n_words) int64
    words, big-endian within each word. NaN packs as 0 (not > 0)."""
    n, dim = X.shape
    bits = (X > 0).astype(np.uint8)
    pad = (-dim) % 64
    if pad:
        bits = np.concatenate([bits, np.zeros((n, pad), dtype=np.uint8)], axis=1)
    by = np.packbits(bits, axis=1)  # (n, (dim+pad)/8) big-endian bytes
    by = by.reshape(n, -1, 8).astype(np.uint64)
    words = np.zeros((n, by.shape[1]), dtype=np.uint64)
    for j in range(8):
        words |= by[:, :, j] << np.uint64(8 * (7 - j))
    return words.view(np.int64)


def pack_query_bits(vec: Sequence[float]) -> list[int]:
    """Driver-side sign-bit packing of a single query vector."""
    return [int(w) for w in _pack_bits(np.asarray([vec], dtype=np.float64))[0]]


def n_words_for(dim: int) -> int:
    return (dim + 63) // 64


def encode_binary(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "id",
    dim: int | None = None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distributed sign-bit encode: (id, bits array<bigint>[, extras]).

    ``dim`` is required knowledge for the word count; when omitted it
    is taken from the first row (one tiny driver action) — pass it
    explicitly in pipelines (same no-hidden-driver-action rule as the
    SRP LSH operator, operators/dedup.py). ``extra_cols`` pass through
    untouched (e.g. ``cluster_id`` for the IVF-partitioned layout)."""
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("cannot infer dim from an empty DataFrame")
        dim = int(first["d"])
    fields = [f"`{id_col}` {df.schema[id_col].dataType.simpleString()}", "bits array<bigint>"]
    for c in extra_cols:
        fields.append(f"`{c}` {df.schema[c].dataType.simpleString()}")
    out_schema = ", ".join(fields)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]], dtype=np.float64
            )
            words = _pack_bits(X)
            out = {id_col: pdf[id_col].values, "bits": [list(r) for r in words]}
            for c in extra_cols:
                out[c] = pdf[c].values
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col, *extra_cols).mapInPandas(encode, schema=out_schema)


def build_bq_index(
    spark: SparkSession,
    src: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "id",
    dim: int | None = None,
) -> BqIndex:
    """Encode + persist the narrow (id, bits) table. One pass over the
    source, no shuffle, no driver collect of data rows."""
    if dim is None:
        first = src.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("cannot build a BQ index over an empty source")
        dim = int(first["d"])
    bits_df = encode_binary(src, vec_col=vec_col, id_col=id_col, dim=dim)
    bits_df.write.mode("overwrite").parquet(os.path.join(path, "bits"))
    n_rows = spark.read.parquet(os.path.join(path, "bits")).count()
    meta = {"dim": dim, "n_words": n_words_for(dim), "n_rows": n_rows, "id_col": id_col}
    with open(os.path.join(path, "_bq_meta.json"), "w") as f:
        json.dump(meta, f)
    return BqIndex(path=path, dim=dim, n_words=n_words_for(dim), n_rows=n_rows)


def load_bq_index(path: str) -> BqIndex:
    with open(os.path.join(path, "_bq_meta.json")) as f:
        meta = json.load(f)
    return BqIndex(
        path=path, dim=meta["dim"], n_words=meta["n_words"],
        n_rows=meta["n_rows"], partition_col=meta.get("partition_col"),
    )


def hamming_expr(bits_col, query_words: Sequence[int]) -> Column:
    """``popcount(bits XOR qbits)`` summed over words — pure codegen."""
    q = F.array(*[F.lit(int(w)).cast("long") for w in query_words])
    col = F.col(bits_col) if isinstance(bits_col, str) else bits_col
    per_word = F.zip_with(col, q, lambda x, y: F.bit_count(x.bitwiseXOR(y)))
    return F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)


def bq_shortlist(
    spark: SparkSession,
    index: BqIndex,
    query_vec: Sequence[float],
    shortlist: int,
    id_col: str = "id",
) -> DataFrame:
    """Top-``shortlist`` ids by Hamming distance to the query's sign
    bits (ascending, id tiebreak). Narrow scan, TakeOrderedAndProject."""
    if len(query_vec) != index.dim:
        raise ValueError(f"query dim {len(query_vec)} != index dim {index.dim}")
    bits = tombstones.apply_tombstones(
        spark, index.path, spark.read.parquet(os.path.join(index.path, "bits")),
        id_col=id_col,
    )
    qw = pack_query_bits(query_vec)
    return (
        bits.withColumn("hamming", hamming_expr("bits", qw))
        .select(id_col, "hamming")
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(int(shortlist))
    )


def bq_upsert(
    spark: SparkSession,
    index: BqIndex,
    new_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "id",
) -> BqIndex:
    """Incremental maintenance: encode new rows and APPEND to the bits
    table — same append-generation pattern as ``ivf_upsert``
    (operators/index.py). No rebuild, no touch of existing files;
    searches see the new rows on the next scan. Replayed/duplicate ids
    are folded at the next ``bq_compact(dedup_ids=True)``.

    Raises for an IVF-partitioned layout (build_ivfbq_index): flat
    appends would break cluster_id partition discovery/pruning — route
    new rows through ``ivf_upsert`` + a bits rebuild of the touched
    clusters instead (same contract as pq_upsert's partition guard)."""
    if index.partition_col is not None:
        raise ValueError(
            f"bq_upsert on a layout partitioned by {index.partition_col!r} "
            "would mix unpartitioned files into the directory tree; "
            "rebuild via build_ivfbq_index (or ingest through ivf_upsert "
            "and re-encode the touched clusters)"
        )
    bits_df = encode_binary(new_df, vec_col=vec_col, id_col=id_col, dim=index.dim)
    bits_df.persist()
    try:
        tombstones.resurrect_ids(spark, index.path, bits_df, id_col)
        n_new = bits_df.count()
        bits_df.write.mode("append").parquet(os.path.join(index.path, "bits"))
    finally:
        bits_df.unpersist()
    out = BqIndex(
        path=index.path, dim=index.dim, n_words=index.n_words,
        n_rows=index.n_rows + n_new,
    )
    meta = {
        "dim": out.dim, "n_words": out.n_words, "n_rows": out.n_rows,
        "id_col": id_col,
    }
    with open(os.path.join(index.path, "_bq_meta.json"), "w") as f:
        json.dump(meta, f)
    return out


def bq_compact(
    spark: SparkSession,
    index: BqIndex,
    out_dir: str,
    n_files: int = 1,
    dedup_ids: bool = False,
    id_col: str = "id",
) -> BqIndex:
    """Generation rewrite: coalesce the append-churned bits table into
    ``n_files`` files (immutable new generation, pointer flip — same
    contract as ``ivf_compact``). ``dedup_ids=True`` keeps one row per
    id (streaming replay hygiene; one extra keyed exchange). A
    partitioned (IVF x BQ) layout compacts partition-aware: one file
    per cluster directory, layout contract preserved."""
    if n_files < 1:
        raise ValueError("n_files must be a positive integer")
    df = tombstones.apply_tombstones(
        spark, index.path, spark.read.parquet(os.path.join(index.path, "bits")),
        id_col=id_col,
    )
    if dedup_ids:
        df = df.dropDuplicates([id_col])
    if index.partition_col is not None:
        # hash on the partition key: each cluster's rows land in one
        # shuffle partition => exactly one file per cluster directory
        shaped = df.repartition(n_files, index.partition_col)
        shaped.write.mode("overwrite").partitionBy(index.partition_col).parquet(
            os.path.join(out_dir, "bits")
        )
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(out_dir, "bits")
        )
    n_rows = spark.read.parquet(os.path.join(out_dir, "bits")).count()
    meta = {
        "dim": index.dim, "n_words": index.n_words, "n_rows": n_rows,
        "id_col": id_col, "partition_col": index.partition_col,
    }
    with open(os.path.join(out_dir, "_bq_meta.json"), "w") as f:
        json.dump(meta, f)
    return BqIndex(
        path=out_dir, dim=index.dim, n_words=index.n_words, n_rows=n_rows,
        partition_col=index.partition_col,
    )


def _hamming_block(Qw, W, pop8):
    """(nq, m) Hamming counts: XOR the packed words, popcount bytes."""
    x = Qw[:, None, :] ^ W[None, :, :]
    return pop8[x.view(np.uint8)].reshape(Qw.shape[0], W.shape[0], -1).sum(
        axis=2, dtype=np.int64
    )


def _topn_by_hamming_id(ham, ids, top):
    """Indices of the true top-``top`` by (hamming ASC, id ASC) —
    argpartition for O(n), exact id tiebreak at the boundary (a plain
    argpartition keeps ARBITRARY members of a tied boundary, which
    would diverge from the SQL window's ordering)."""
    n = len(ids)
    if n <= top:
        return np.arange(n)
    part = np.argpartition(ham, top - 1)[:top]
    boundary = ham[part].max()
    sure = np.nonzero(ham < boundary)[0]
    tied = np.nonzero(ham == boundary)[0]
    need = top - len(sure)
    tied_keep = tied[np.argsort(ids[tied], kind="stable")[:need]]
    return np.concatenate([sure, tied_keep])


def _blocked_hamming_topn(
    spark: SparkSession,
    bits: DataFrame,
    queries_df: DataFrame,
    n_short: int,
    query_id: str,
    query_vec: str,
    id_col: str,
    dim: int,
) -> DataFrame:
    """Arrow-blocked Hamming scoring with PARTITION-level top-n: the
    packed query-bit matrix rides a broadcast; every batch of a
    partition is XOR'd + popcounted against all queries in NumPy, and
    a per-query running top-``n_short`` accumulates ACROSS the
    partition's batches — one emit per partition, so the downstream
    window merges partitions x nq x n_short rows (not batches x ...,
    which for a large corpus and shortlist is itself a flood).

    Integer arithmetic + the (hamming, id) boundary tiebreak make this
    bit-identical to the pure-codegen pair-join formulation; equality
    is pinned in tests/test_bq.py."""
    q_rows = queries_df.select(
        F.col(query_id).alias("qid"), F.col(query_vec).alias("qv")
    ).collect()
    qids = np.array([r.qid for r in q_rows])
    Qw = _pack_bits(
        np.asarray([np.asarray(r.qv, dtype=np.float64) for r in q_rows])
    ).astype(np.uint64)  # (nq, n_words)
    qid_dtype = queries_df.schema[query_id].dataType.simpleString()
    id_dtype = bits.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {qid_dtype}, `{id_col}` {id_dtype}, hamming int"
    popcount8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)
    bc = spark.sparkContext.broadcast((qids, Qw, popcount8, int(n_short)))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, Qw_, pop8, top = bc.value
        nq = len(qids_)
        # running candidates per query: (ham, id) arrays, re-pruned
        # whenever they outgrow 4x the target
        acc_h = [np.empty(0, dtype=np.int64) for _ in range(nq)]
        # (np.concatenate upcasts to object dtype for string ids)
        acc_i = [np.empty(0, dtype=np.int64) for _ in range(nq)]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            W = np.asarray(
                [np.asarray(w, dtype=np.int64) for w in pdf["bits"]]
            ).astype(np.uint64)
            ham = _hamming_block(Qw_, W, pop8)  # (nq, m)
            for qi in range(nq):
                keep = _topn_by_hamming_id(ham[qi], ids, top)
                acc_h[qi] = np.concatenate([acc_h[qi], ham[qi][keep]])
                acc_i[qi] = np.concatenate([acc_i[qi], ids[keep]])
            for qi in range(nq):
                if len(acc_h[qi]) > 4 * top:
                    k2 = _topn_by_hamming_id(acc_h[qi], acc_i[qi], top)
                    acc_h[qi] = acc_h[qi][k2]
                    acc_i[qi] = acc_i[qi][k2]
        out_q, out_i, out_h = [], [], []
        for qi in range(nq):
            if len(acc_h[qi]) > top:
                k2 = _topn_by_hamming_id(acc_h[qi], acc_i[qi], top)
                acc_h[qi], acc_i[qi] = acc_h[qi][k2], acc_i[qi][k2]
            out_q.extend([qids_[qi]] * len(acc_i[qi]))
            out_i.extend(acc_i[qi].tolist())
            out_h.extend(acc_h[qi].tolist())
        if out_q:
            yield pd.DataFrame({"query_id": out_q, id_col: out_i, "hamming": out_h})

    return bits.select(id_col, "bits").mapInPandas(scan, schema=out_schema)


def bq_knn_join(
    spark: SparkSession,
    index: BqIndex,
    src: DataFrame,
    queries_df: DataFrame,
    k: int,
    strategy: str = "CosineSimilarity",
    shortlist: int | None = None,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    vec_col: str = "embedding",
    id_col: str = "id",
    round_digits: int | None = None,
    blocked: bool = False,
) -> DataFrame:
    """Batch ANN join through the sign-bit domain: for every query,
    Hamming-shortlist candidates over the compressed bits table, then
    exact-rerank the survivors. Output (query_id, id, score, rank) —
    the contract of ``search.knn_join``; ``shortlist=None`` keeps
    every candidate, making the result EXACT (oracle-gate variant).

    Two shortlist engines, IDENTICAL results (Hamming is integer
    arithmetic with an id tiebreak — no float divergence):

    * ``blocked=False``: pure-codegen — broadcast-join the query bits,
      ``bit_count(xor)`` per pair, one ranked window. Zero Python, but
      the window shuffles |corpus| x n_queries int triples: right for
      small corpora or few queries.
    * ``blocked=True`` (the scale path): one Arrow pass over the bits
      table with the packed query-bit matrix in the closure; per batch
      NumPy XOR + popcount scores ALL queries against the block and
      emits only each block's per-query top-``shortlist`` — the window
      then merges batches x n_queries x shortlist rows, independent of
      corpus size (the ``knn_join_blocked`` economics; measured 30x on
      a 4M-row corpus in tools/scale_probe.py).

    Either way only ``nq x shortlist`` ids reach the full-precision
    rerank join, and the rerank scoring is the same Column fold — so
    ``blocked`` cannot change the final rows."""
    from pyspark.sql import Window

    validate_strategy(strategy)
    if not isinstance(k, int) or k < 1:
        raise ValueError("k must be a positive integer")
    n_short = index.n_rows if shortlist is None else int(shortlist)

    bits = tombstones.apply_tombstones(
        spark, index.path, spark.read.parquet(os.path.join(index.path, "bits")),
        id_col=id_col,
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col(id_col).asc()
    )
    if blocked:
        cand_scored = _blocked_hamming_topn(
            spark, bits, queries_df, n_short,
            query_id=query_id, query_vec=query_vec,
            id_col=id_col, dim=index.dim,
        )
    else:
        qbits = encode_binary(
            queries_df, vec_col=query_vec, id_col=query_id, dim=index.dim
        )
        pairs = bits.join(
            F.broadcast(
                qbits.select(
                    F.col(query_id).alias("query_id"), F.col("bits").alias("qbits")
                )
            )
        )
        per_word = F.zip_with(
            F.col("bits"), F.col("qbits"), lambda x, y: F.bit_count(x.bitwiseXOR(y))
        )
        hamming = F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)
        cand_scored = pairs.withColumn("hamming", hamming).select(
            "query_id", id_col, "hamming"
        )
    cand = (
        cand_scored
        .withColumn("hrank", F.row_number().over(w_short))
        .filter(F.col("hrank") <= n_short)
        .select("query_id", id_col)
    )

    vecs = src.select(F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col))
    qv = queries_df.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("query_vec")
    )
    scored = (
        cand.join(vecs, id_col, "inner")
        .join(F.broadcast(qv), "query_id", "inner")
        .withColumn("score", score_expr(strategy, F.col(vec_col), F.col("query_vec")))
    )
    if round_digits is not None:
        scored = scored.withColumn(
            "score", F.round(F.col("score"), round_digits) + F.lit(0.0)
        )
    return (
        scored.select("query_id", F.col(id_col).alias("id"), "score")
        .withColumn("rank", F.row_number().over(Window.partitionBy("query_id").orderBy(*_order_cols(strategy))))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def bq_search_rerank(
    spark: SparkSession,
    index: BqIndex,
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
    """Hamming shortlist -> exact re-rank -> (id, score) top-k.

    ``shortlist=None`` (or >= corpus) keeps every row: the Hamming
    pass is then a no-op filter and the result is EXACT top-k for any
    strategy — the oracle-gate configuration. Pruned shortlists cut
    the rerank join to ``shortlist`` rows (recall tested).

    ``filter_ids`` (1-column ``id`` DataFrame) restricts candidates
    BEFORE the Hamming shortlist — the non-strict filtered-ANN
    contract shared with ``ivf_search``/``tree_search``: the shortlist
    budget is then spent entirely on rows passing the filter, so
    full-shortlist filtered results equal exact filtered search."""
    validate_strategy(strategy)
    if not isinstance(k, int) or k < 1:
        raise ValueError("k must be a positive integer")
    n_short = index.n_rows if shortlist is None else int(shortlist)

    if len(query_vec) != index.dim:
        raise ValueError(f"query dim {len(query_vec)} != index dim {index.dim}")
    bits = tombstones.apply_tombstones(
        spark, index.path, spark.read.parquet(os.path.join(index.path, "bits")),
        id_col=id_col,
    )
    if filter_ids is not None:
        bits = bits.join(
            filter_ids.select(F.col(filter_ids.columns[0]).alias(id_col)),
            id_col,
            "left_semi",
        )
    qw = pack_query_bits(query_vec)
    cand = (
        bits.withColumn("hamming", hamming_expr("bits", qw))
        .select(id_col, "hamming")
        .orderBy(F.col("hamming").asc(), F.col(id_col).asc())
        .limit(int(n_short))
    )
    vecs = src.select(F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col))
    # shortlist rows are few by construction: broadcast them into the
    # vector table so the rerank reads only matching row groups
    joined = vecs.join(F.broadcast(cand.select(id_col)), id_col, "inner")

    score = score_expr(strategy, F.col(vec_col), query_vec)
    if round_digits is not None:
        score = F.round(score, round_digits) + F.lit(0.0)
    return (
        joined.withColumn("score", score)
        .select(F.col(id_col).alias("id"), "score")
        .orderBy(*_order_cols(strategy))
        .limit(k)
    )


# ----------------------------------------------- IVF x BQ composition


def build_ivfbq_index(spark: SparkSession, ivf_index, out_dir: str) -> BqIndex:
    """IVF-partitioned sign-bit layout — the BQ analogue of IVFADC
    (operators/pq.py:build_ivfpq_index): encode the IVF index's rows
    and keep ``cluster_id`` as the bits partition column, so a query
    reads ~(search_top_size / n_clusters) of the bit words AND pays
    1/32 of the bytes per row it does read. Rows-read and
    bytes-per-row levers multiply; the Hamming scan stays pure
    codegen."""
    src = spark.read.parquet(ivf_index.path).select(
        F.col(ivf_index.id_col).alias("id"),
        F.col(ivf_index.vec_col).alias("embedding"),
        "cluster_id",
    )
    first = src.select(F.size("embedding").alias("d")).first()
    if first is None:
        raise ValueError("cannot build over an empty IVF layout")
    dim = int(first["d"])
    bits_df = encode_binary(src, dim=dim, extra_cols=("cluster_id",))
    (
        bits_df.write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(os.path.join(out_dir, "bits"))
    )
    n_rows = spark.read.parquet(os.path.join(out_dir, "bits")).count()
    meta = {
        "dim": dim, "n_words": n_words_for(dim), "n_rows": n_rows,
        "id_col": "id", "partition_col": "cluster_id",
    }
    with open(os.path.join(out_dir, "_bq_meta.json"), "w") as f:
        json.dump(meta, f)
    return BqIndex(
        path=out_dir, dim=dim, n_words=n_words_for(dim), n_rows=n_rows,
        partition_col="cluster_id",
    )


def ivfbq_search(
    spark: SparkSession,
    ivf_index,
    bq_index: BqIndex,
    query_vec: Sequence[float],
    k: int,
    strategy: str = "CosineSimilarity",
    search_top_size: int = 2,
    shortlist: int | None = None,
    round_digits: int | None = None,
) -> DataFrame:
    """Rank centroids on the driver -> prune the bits layout to the
    ``search_top_size`` nearest cluster directories (planner-level
    partition pruning) -> Hamming-shortlist inside them -> exact
    rerank against the full-precision vectors of the SAME pruned
    clusters. Exact when ``search_top_size >= n_clusters`` and
    ``shortlist=None`` (full)."""
    from .index import _rank_centroids

    validate_strategy(strategy)
    if not isinstance(k, int) or k < 1:
        raise ValueError("k must be a positive integer")
    if len(query_vec) != bq_index.dim:
        raise ValueError(f"query dim {len(query_vec)} != index dim {bq_index.dim}")
    keep = _rank_centroids(ivf_index, query_vec, strategy)[:search_top_size]

    bits = tombstones.apply_tombstones(
        spark,
        bq_index.path,
        spark.read.parquet(os.path.join(bq_index.path, "bits")).filter(
            F.col("cluster_id").isin(keep)
        ),
    )
    qw = pack_query_bits(query_vec)
    n_short = bq_index.n_rows if shortlist is None else int(shortlist)
    cand = (
        bits.withColumn("hamming", hamming_expr("bits", qw))
        .select("id", "hamming")
        .orderBy(F.col("hamming").asc(), F.col("id").asc())
        .limit(n_short)
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
    score = score_expr(strategy, F.col("embedding"), query_vec)
    if round_digits is not None:
        score = F.round(score, round_digits) + F.lit(0.0)
    return (
        joined.withColumn("score", score)
        .select("id", "score")
        .orderBy(*_order_cols(strategy))
        .limit(k)
    )
