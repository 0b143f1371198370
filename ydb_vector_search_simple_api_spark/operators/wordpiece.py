"""WordPiece tokenizer: corpus-scale training + encoding — the third
member of the tokenizer triad next to BPE (``operators/bpe.py``) and
the unigram LM (``operators/sp_unigram.py``).

Public-knowledge basis: Schuster & Nakajima 2012 ("Japanese and
Korean voice search") and the BERT tokenizer's documented behavior —
training merges the adjacent symbol pair maximizing the likelihood
gain score count(pair) / (count(left) · count(right)) (BPE merges the
raw count maximum instead), continuation symbols carry the ``##``
prefix, and ENCODING is not merge-replay but greedy longest-match
against the final vocabulary, with a whole-word ``[UNK]`` on failure.

Spark-first shape (the bpe.py pattern): training runs on the
distinct-word table with frequencies (cost tracks vocabulary, not
corpus), each iteration is one pair-explode count plus one symbol
count, joined to score, TakeOrdered(1) for the winner; the merge is
applied with the shared codegen fold (``bpe._merge_pair_expr`` with
the ##-stripped merged symbol); lineage is truncated per iteration
with localCheckpoint; only 3 scalars per iteration reach the driver.
Encoding broadcasts the vocab set and runs greedy longest-match in
an Arrow-batched mapInPandas with a per-batch word cache.

No SQL oracle (iterative training); both operators are pinned by a
pure-Python replay in tests/test_wordpiece.py — rows-only gate
entries, the bpe_train precedent.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bpe import _merge_pair_expr, _word_table

UNK = "[UNK]"


def _init_syms():
    """first char bare, continuation chars ##-prefixed."""
    return F.expr(
        "transform(array_remove(split(word, '(?!^)'), ''), "
        "(c, i) -> CASE WHEN i = 0 THEN c ELSE concat('##', c) END)"
    )


def _merged_sym(left: str, right: str) -> str:
    return left + (right[2:] if right.startswith("##") else right)


def _train_impl(
    spark: SparkSession, sf_dir: str, n_merges: int
) -> tuple[list[tuple[int, str, str, str, float]], DataFrame]:
    """The merge loop. Returns (merges, final segmented word table).

    Per-iteration cost is TWO jobs (the bpe_train budget): unigram
    symbol counts and adjacent-pair counts come from ONE combined
    explode→groupBy whose exchange Catalyst reuses on both sides of
    the score join (pairs rows r IS NOT NULL, symbol rows r IS NULL),
    so the argmax is a single job; applying the winner + the lineage
    cut (localCheckpoint) is the second."""
    words = _word_table(spark, sf_dir).select("n", _init_syms().alias("syms"))
    words = words.localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, float]] = []
    for rank in range(1, n_merges + 1):
        units = (
            words.select(
                "n",
                F.explode(
                    F.expr(
                        "concat("
                        "transform(syms, s -> struct(s AS l, "
                        "CAST(NULL AS STRING) AS r)), "
                        "CASE WHEN size(syms) >= 2 THEN "
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(s, i) -> struct(s AS l, syms[i + 1] AS r)) "
                        "ELSE array() END)"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
            # vocabulary-sized; materialized once because THREE
            # consumers read it (pair rows + two broadcast symbol
            # sides) and broadcast exchanges do not reuse each
            # other's upstream computation
            .localCheckpoint(eager=True)
        )
        pairs = units.filter(F.col("r").isNotNull())
        cl = units.filter(F.col("r").isNull()).select(
            F.col("l").alias("sym"), F.col("cnt").alias("c")
        )
        scored = (
            pairs.join(
                F.broadcast(cl.select(F.col("sym").alias("l"), F.col("c").alias("c_l"))),
                "l",
            )
            .join(
                F.broadcast(cl.select(F.col("sym").alias("r"), F.col("c").alias("c_r"))),
                "r",
            )
            .withColumn(
                "score",
                F.col("cnt").cast("double")
                / (F.col("c_l") * F.col("c_r")).cast("double"),
            )
        )
        top = (
            scored.orderBy(
                F.col("score").desc(), F.col("l").asc(), F.col("r").asc()
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, score = top[0].l, top[0].r, float(top[0].score)
        piece = _merged_sym(l, r)
        merges.append((rank, l, r, piece, round(score, 9) + 0.0))
        words = words.select(
            "n", _merge_pair_expr(F.col("syms"), l, r, piece).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, words


def wordpiece_train(
    spark: SparkSession, sf_dir: str, n_merges: int = 10
) -> DataFrame:
    """Learn ``n_merges`` WordPiece merges. Output (rank, left, right,
    piece, score) — score is the likelihood gain
    count(pair) / (count(left)·count(right)) at merge time, rounded
    to 9 so the report row is engine-stable; the ARGMAX itself is
    taken on the raw double with (left, right) tie-break, so the
    merge table is deterministic under any partitioning."""
    merges, _ = _train_impl(spark, sf_dir, n_merges)
    return spark.createDataFrame(
        merges, "rank bigint, left string, right string, piece string, score double"
    )


def wordpiece_vocab(
    spark: SparkSession, sf_dir: str, n_merges: int = 10
) -> DataFrame:
    """The encoder's vocabulary: every symbol surviving in the final
    word segmentations (alphabet + learned pieces), with its weighted
    occurrence count — read straight off the trainer's final word
    table (no re-train, no merge replay). Output (piece, cnt)."""
    _, words = _train_impl(spark, sf_dir, n_merges)
    return (
        words.select("n", F.explode("syms").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").cast("bigint").alias("cnt"))
    )


def encode_word(word: str, vocab: set[str], max_len: int = 64) -> list[str]:
    """Greedy longest-match WordPiece encode of one word (the BERT
    procedure): repeatedly take the longest vocab piece from the
    cursor (##-prefixed after the first), whole-word [UNK] when no
    piece matches. Pure Python — the replay reference for tests AND
    the kernel the Arrow batches call."""
    out: list[str] = []
    i, L = 0, len(word)
    while i < L:
        j = min(L, i + max_len)
        piece = None
        while j > i:
            cand = word[i:j] if i == 0 else "##" + word[i:j]
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        i = j
    return out


_ENCODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_words", T.LongType()),
        T.StructField("n_pieces", T.LongType()),
        T.StructField("n_unk", T.LongType()),
        T.StructField("pieces_md5", T.StringType()),
    ]
)


def wordpiece_encode_digest(
    spark: SparkSession,
    sf_dir: str,
    vocab: DataFrame | None = None,
    n_merges: int = 10,
) -> DataFrame:
    """Encode every document with the trained vocab; per-doc digest
    (doc_id, n_words, n_pieces, n_unk, pieces_md5) — the
    bpe_encode_digest contract plus the encoder-specific UNK count
    (the coverage signal a vocab size is tuned against)."""
    import hashlib

    if vocab is None:
        vocab = wordpiece_vocab(spark, sf_dir, n_merges=n_merges)
    vset = {r.piece for r in vocab.select("piece").collect()}
    bc = spark.sparkContext.broadcast(vset)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vs = bc.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = str(text).lower().strip().split()
                toks: list[str] = []
                for w in words:
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, vs)
                        cache[w] = enc
                    toks.extend(enc)
                rows.append(
                    (
                        int(doc_id),
                        len(words),
                        len(toks),
                        sum(1 for t in toks if t == UNK),
                        hashlib.md5(" ".join(toks).encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_words", "n_pieces", "n_unk", "pieces_md5"],
            )

    from ..sources.store import load_documents

    return (
        load_documents(spark, sf_dir)
        .select("doc_id", "text")
        .mapInPandas(encode, schema=_ENCODE_SCHEMA)
    )
