"""Tokenizer comparison report — the evaluation artifact a pipeline
publishes when choosing between its trained tokenizers (BPE,
SentencePiece-style unigram LM, WordPiece).

One row per tokenizer, aggregated from the per-doc encode digests the
three modules already produce: corpus words, emitted pieces, mean
pieces-per-word (the fertility metric tokenizer choices are judged
by), and the whole-word UNK rate where the encoder has one
(WordPiece; BPE and unigram close over characters by construction,
so their UNK rate is structurally 0).

Scale shape: three Arrow-batched encode passes (each one
mapInPandas over the corpus with a broadcast vocab) + one tiny
aggregate each; the vocab/merge assets arrive as arguments so a
serving layer passes its session-cached copies (the _bpe_merges /
_unigram_vocab / _wordpiece_vocab contract) and this report times
only the encodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tokenizer_report(
    spark: SparkSession,
    sf_dir: str,
    bpe_merges: list | None = None,
    unigram_vocab: DataFrame | None = None,
    wordpiece_vocab: DataFrame | None = None,
) -> DataFrame:
    """(tokenizer, n_words, n_pieces, pieces_per_word, unk_rate) —
    fertility and coverage per trained tokenizer over the corpus.
    pieces_per_word and unk_rate are ROUND(.,6) of exact integer
    ratios, so the row is engine-stable."""
    from . import bpe as bpe_mod
    from . import sp_unigram as uni_mod
    from . import wordpiece as wp_mod

    def rollup(digest: DataFrame, name: str, pieces_col: str, unk_col=None):
        aggs = [
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum(pieces_col).cast("bigint").alias("n_pieces"),
        ]
        aggs.append(
            (F.sum(unk_col) if unk_col else F.lit(0)).cast("bigint").alias("n_unk")
        )
        g = digest.agg(*aggs)
        return g.select(
            F.lit(name).alias("tokenizer"),
            "n_words",
            "n_pieces",
            (
                F.round(
                    F.col("n_pieces").cast("double")
                    / F.col("n_words").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("pieces_per_word"),
            (
                F.round(
                    F.col("n_unk").cast("double") / F.col("n_words").cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("unk_rate"),
        )

    out = rollup(
        bpe_mod.bpe_encode_digest(spark, sf_dir, merges=bpe_merges),
        "bpe",
        "n_bpe_tokens",
    )
    out = out.unionByName(
        rollup(
            uni_mod.unigram_lm_encode_digest(spark, sf_dir, vocab=unigram_vocab),
            "unigram_lm",
            "n_pieces",
        )
    )
    out = out.unionByName(
        rollup(
            wp_mod.wordpiece_encode_digest(spark, sf_dir, vocab=wordpiece_vocab),
            "wordpiece",
            "n_pieces",
            unk_col="n_unk",
        )
    )
    return out
