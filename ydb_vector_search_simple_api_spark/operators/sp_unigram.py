"""SentencePiece-style unigram-LM tokenizer training (Kudo, ACL 2018
"Subword Regularization"; the unigram trainer of the public
SentencePiece library), Spark-first.

The reference has no tokenizer surface; this joins ``bpe.py`` as the
second tokenizer-training family of the north-star scope.

Shape of the problem at 100 TB: training needs only the WORD
FREQUENCY table — one corpus tokenize + one keyed count shuffle; the
EM loop then iterates over that (vocabulary-sized, not corpus-sized)
table. Each E-step is an Arrow ``mapInPandas`` pass doing per-word
Viterbi segmentation against the BROADCAST piece table (the trained
vocab is a few thousand rows at any corpus size); expected counts
come back as (piece, count) rows and the M-step is one keyed sum.

This implementation uses HARD EM (Viterbi counts, the SentencePiece
``--hard_em``-equivalent fast path): expected counts are exact
INTEGERS (word_count x occurrences-in-best-segmentation), so the
whole loop is deterministic under any partitioning — no float
accumulation order anywhere until the final log-prob projection.
Iterative + Python-segmented, so no SQL oracle (rows-only gate entry);
the training invariants are pytest-pinned instead: single characters
never leave the vocab (closure — every word stays segmentable), total
corpus loss is non-increasing across EM iterations, and every
encoding concatenates back to its word.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bpe import _word_table

#: probability floor exponent for pieces absent from a segmentation
#: round (they can re-enter via the seed only); ln-space.
_FLOOR = -1e9


def _viterbi_piece_counts(words, counts, pieces: dict[str, float], max_len: int):
    """Per-word Viterbi against ln-prob ``pieces``; returns
    (piece -> integer count weighted by word frequency, total ln-loss).
    Pure function, identical arithmetic on every executor."""
    out: dict[str, int] = {}
    loss = 0.0
    for w, n in zip(words, counts):
        L = len(w)
        best = [0.0] + [-math.inf] * L
        back = [0] * (L + 1)
        for i in range(1, L + 1):
            for j in range(max(0, i - max_len), i):
                p = pieces.get(w[j:i])
                if p is None:
                    continue
                cand = best[j] + p
                if cand > best[i]:
                    best[i] = cand
                    back[i] = j
        # closure guarantees best[L] is finite (single chars present)
        i = L
        while i > 0:
            j = back[i]
            piece = w[j:i]
            out[piece] = out.get(piece, 0) + int(n)
            i = j
        loss += -best[L] * int(n)
    return out, loss


def seed_pieces(
    spark: SparkSession, sf_dir: str, max_len: int = 4, max_seed: int = 2048
) -> DataFrame:
    """Candidate piece table: every substring of corpus words up to
    ``max_len`` chars, weighted by word frequency, cut to the
    ``max_seed`` highest-mass candidates — plus ALL single characters
    (the closure set, kept unconditionally so every word stays
    segmentable). One pass over the word table; the substring fan-out
    is codegen (sequence x sequence), not Python."""
    w = _word_table(spark, sf_dir)
    subs = w.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            i,
                            F.least(
                                F.length("word"), i + F.lit(int(max_len) - 1)
                            ),
                        ),
                        lambda j: F.substring(F.col("word"), i, j - i + 1),
                    ),
                )
            )
        ).alias("piece"),
        F.col("n"),
    )
    mass = subs.groupBy("piece").agg(F.sum("n").cast("bigint").alias("mass"))
    chars = mass.filter(F.length("piece") == 1)
    multi = (
        mass.filter(F.length("piece") > 1)
        .orderBy(F.col("mass").desc(), F.col("piece").asc())
        .limit(max_seed)
    )
    return chars.unionByName(multi)


def unigram_lm_train(
    spark: SparkSession,
    sf_dir: str,
    vocab_size: int = 256,
    em_iters: int = 2,
    max_len: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Train the unigram LM vocab; output (piece, logprob, cnt),
    logprob ROUND(6), deterministic ordering keys included.

    Loop structure: seed mass initializes the probabilities; each EM
    iteration re-segments the word table (Arrow batches, broadcast
    vocab) and renormalizes on the integer Viterbi counts; after the
    final iteration the vocab is cut to ``vocab_size`` by count
    (single characters exempt — closure). Every count is an exact
    integer; the only floats are the ln-probs broadcast per round and
    the final rounded projection."""
    seeds = seed_pieces(spark, sf_dir, max_len=max_len)
    rows = seeds.collect()  # bounded: <= max_seed + |alphabet| rows
    total = sum(r.mass for r in rows)
    pieces = {r.piece: math.log(r.mass / total) for r in rows}

    w = _word_table(spark, sf_dir)
    for _ in range(max(1, em_iters)):
        bpieces = pieces  # closure capture for this round

        def estep(batches):
            import pandas as pd

            for pdf in batches:
                cnts, _ = _viterbi_piece_counts(
                    pdf["word"].tolist(), pdf["n"].tolist(), bpieces, max_len
                )
                if cnts:
                    yield pd.DataFrame(
                        {"piece": list(cnts), "cnt": list(cnts.values())}
                    )

        counts = (
            w.mapInPandas(estep, "piece string, cnt bigint")
            .groupBy("piece")
            .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            .collect()
        )
        csum = sum(r.cnt for r in counts)
        seen = {r.piece: r.cnt for r in counts}
        # M-step: renormalize on Viterbi counts; unseen single chars
        # stay at the floor (closure pieces never leave the table)
        pieces = {
            p: (math.log(seen[p] / csum) if p in seen else _FLOOR)
            for p in pieces
            if p in seen or len(p) == 1
        }

    # final cut: top vocab_size multi-char pieces by (cnt, piece),
    # all single chars kept
    final = [(p, seen.get(p, 0)) for p in pieces]
    multi = sorted(
        [x for x in final if len(x[0]) > 1], key=lambda x: (-x[1], x[0])
    )[: max(0, vocab_size - len([x for x in final if len(x[0]) == 1]))]
    chars = [x for x in final if len(x[0]) == 1]
    kept = chars + multi
    ksum = sum(c for _, c in kept if c > 0) or 1
    out = [
        (
            p,
            round(math.log(c / ksum), round_digits) + 0.0 if c > 0 else None,
            int(c),
        )
        for p, c in kept
    ]
    return spark.createDataFrame(out, "piece string, logprob double, cnt bigint")


def unigram_lm_encode_digest(
    spark: SparkSession,
    sf_dir: str,
    vocab: DataFrame | None = None,
    vocab_size: int = 256,
    em_iters: int = 2,
    max_len: int = 4,
) -> DataFrame:
    """Encode every document with the trained vocab; per-doc digest
    (doc_id, n_words, n_pieces, pieces_md5) — the bpe_encode_digest
    contract: scalar gate row, whole encoding pinned by the md5."""
    if vocab is None:
        vocab = unigram_lm_train(
            spark, sf_dir, vocab_size=vocab_size, em_iters=em_iters, max_len=max_len
        )
    # Closure must hold at ENCODE time too: zero-count single chars are
    # kept in the vocab (null logprob) precisely so every word is
    # segmentable — score them at the M-step's _FLOOR instead of
    # dropping them, else a word containing one hits best[L] = -inf and
    # the default back-pointers emit the whole word as one out-of-vocab
    # "piece" not in the trained vocab. Null-logprob multi-char pieces
    # (zero Viterbi count) stay excluded: single chars already close.
    vrows = vocab.collect()
    pieces = {
        r.piece: (r.logprob if r.logprob is not None else _FLOOR)
        for r in vrows
        if r.logprob is not None or len(r.piece) == 1
    }
    from ..functions import text as TXT
    from ..sources.store import load_documents

    docs = load_documents(spark, sf_dir).select(
        "doc_id", TXT.tokens("text").alias("words")
    )

    def enc(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, words in zip(pdf["doc_id"], pdf["words"]):
                segs: list[str] = []
                for wd in words:
                    L = len(wd)
                    best = [0.0] + [-math.inf] * L
                    back = [0] * (L + 1)
                    for i in range(1, L + 1):
                        for j in range(max(0, i - max_len), i):
                            p = pieces.get(wd[j:i])
                            if p is None:
                                continue
                            if best[j] + p > best[i]:
                                best[i] = best[j] + p
                                back[i] = j
                    i, rev = L, []
                    while i > 0:
                        rev.append(wd[back[i] : i])
                        i = back[i]
                    segs.extend(reversed(rev))
                rows.append(
                    (
                        doc_id,
                        len(words),
                        len(segs),
                        hashlib.md5(" ".join(segs).encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_words", "n_pieces", "pieces_md5"]
            )

    return docs.mapInPandas(
        enc, "doc_id bigint, n_words bigint, n_pieces bigint, pieces_md5 string"
    )
