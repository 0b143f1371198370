"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over hashed n-gram features.

The standard "make the raw pool look like the target domain" selection
step a pretraining pipeline runs between dedup and tokenization: fit
two bag-of-hashed-n-gram unigram models — p̂ on a TARGET sample (here:
the corpus's English slice, the paper's formal-text stand-in) and q̂ on
the RAW pool (all documents) — weight every raw document by its log
importance ratio, then resample k documents with probability ∝ weight
via the Gumbel top-k trick.

Scale shape (the 100 TB contract):

- **Featurization is a narrow explode.** Per doc: unigrams + bigrams
  → md5 6-hex-prefix integer mod ``n_buckets`` — the corpus-sized
  stream is (doc_id, bucket int), never the text. Hashing makes the
  model size a CONSTANT (``n_buckets`` rows), independent of
  vocabulary — the point of the paper's hashed features.
- **Fitting is one keyed aggregation each.** Bucket counts with
  map-side combine; the fitted model is ``n_buckets`` rows and the
  log-ratio table λ_b = ln p̂_b − ln q̂_b broadcasts everywhere
  (1024 rows ≈ 16 KB).
- **Weighting is a broadcast join + one doc-keyed fold.** Per-doc
  bucket tf (exact ints) ⋈ λ on bucket, then one (doc)-keyed
  decimal sum — no window over the corpus, no driver round-trip.
- **Selection is TakeOrderedAndProject.** Gumbel top-k: key_d =
  log w_d + g_d with g_d a deterministic Gumbel draw from the
  md5-prefix uniform (the sampling-module contract) — top-k by key IS
  a weighted sample without replacement (Efraimidis–Spirakis /
  Gumbel-max), so "resample k docs" costs exactly one top-k, never a
  shuffle of the pool.

Float parity (DuckDB gate): every ``ln`` is ROUND(...,9); λ enters a
DECIMAL(18,9) so the per-doc fold (decimal × exact-int tf) is
visit-order-independent; final weights ROUND(...,6)+0.0. The Gumbel
draw is a pure function of ``md5('dsir:' || doc_id)`` — decorrelated
from the split/sample draws by the salt, reproducible in both engines.

Reference note: the reference engine (app.py) has no selection
surface; extension scope (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TXT
from ..sources.store import load_documents

#: hashed-feature space size; the fitted model is exactly this many
#: rows per distribution, so it broadcasts at any corpus size.
DSIR_BUCKETS = 1024

#: add-α smoothing mass per bucket (both distributions).
DSIR_ALPHA = 1.0

#: hex digits of the md5 prefix used for bucket hashing and the
#: Gumbel uniform (the sampling-module convention).
_HEX = 6

#: target slice: the DSIR "target domain" sample.
TARGET_LANG = "en"


def _bucket(col: Column, n_buckets: int) -> Column:
    """md5 6-hex-prefix integer mod n_buckets — exact in BIGINT and
    reproducible by the DuckDB list_reduce hex-decode idiom."""
    return (
        F.conv(F.substring(F.md5(col), 1, _HEX), 16, 10).cast("bigint")
        % n_buckets
    )


def _doc_features(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, lang, bucket) — one row per unigram AND bigram
    occurrence. Bigrams join unigrams in one feature stream (the
    paper's hashed n-gram featurization); the stream is two ints wide
    regardless of document length."""
    t = TXT.tokens("text")
    toks = F.col("toks")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    feats = F.when(F.size(toks) >= 2, F.concat(toks, bigrams)).otherwise(
        toks
    )
    return (
        docs.select("doc_id", "lang", t.alias("toks"))
        .select("doc_id", "lang", F.explode(feats).alias("f"))
        .select("doc_id", "lang", _bucket(F.col("f"), n_buckets).alias("b"))
    )


def _log_ratio_table(
    feats: DataFrame, n_buckets: int, alpha: float
) -> DataFrame:
    """λ table: (b, lam) with lam = ROUND(ln p̂_b − ln q̂_b, 9) as
    DECIMAL(18,9). Built from two bucket-count aggregations (map-side
    combine) over the SAME feature stream; n_buckets rows total."""
    # Round 12 (guide §2.4 — remove passes): the raw and target bucket
    # counts fuse into ONE conditional aggregate over ONE feature-
    # stream pass (the target stream is a lang-filtered subset of the
    # same stream, so count(when(lang = target)) == the filtered
    # count, and buckets with no target rows get 0 — exactly what the
    # old left join + coalesce produced), and the two totals are
    # GLOBAL WINDOWS over the n_buckets-row aggregate instead of
    # agg + crossJoin-back. The previous form planned the corpus
    # tokenize+explode subtree FOUR times (raw, tgt, and each total);
    # this form plans it once. λ values identical: same counts, same
    # double casts, same expression.
    from pyspark.sql import Window

    joined = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(F.when(F.col("lang") == TARGET_LANG, 1)).alias("ct"),
    )
    w_all = Window.partitionBy()
    a = float(alpha)
    ab = a * n_buckets
    return (
        joined.withColumn("tr", F.sum("cr").over(w_all).cast("double"))
        .withColumn(
            "tt",
            F.sum(F.coalesce(F.col("ct"), F.lit(0))).over(w_all).cast("double"),
        )
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + a)
                    / (F.col("tt") + ab)
                )
                - F.log(
                    (F.col("cr").cast("double") + a) / (F.col("tr") + ab)
                ),
                9,
            )
            .cast("decimal(18,9)")
            .alias("lam"),
        )
    )


def _gumbel(key: Column) -> Column:
    """Deterministic standard-Gumbel draw from md5('dsir:'||key):
    u = (2·draw+1) / 2·16^6 ∈ (0,1), g = −ln(−ln u), ROUND(...,9).
    Gumbel-max: argtop-k of (log w + g) is a weight-proportional
    sample without replacement (Efraimidis–Spirakis)."""
    draw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("dsir:"), key.cast("string"))), 1, _HEX
        ),
        16,
        10,
    ).cast("bigint")
    u = (draw.cast("double") * 2.0 + 1.0) / float(2 * 16**_HEX)
    return F.round(-F.log(-F.log(u)), 9)


def dsir_weights(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """Per-document DSIR log importance weight.

    Output: (doc_id, n_feats, logw), doc_id ASC — one row per
    document with non-NULL text (empty text still yields one ''
    unigram and a row; a NULL text tokenizes to NULL and is excluded,
    identically in the DuckDB twin). logw = Σ_b tf_b(d) · λ_b —
    exact decimal fold, ROUND(...,6)+0.0.
    """
    docs = load_documents(spark, sf_dir).select("doc_id", "lang", "text")
    feats = _doc_features(docs, n_buckets)
    lam = _log_ratio_table(feats, n_buckets, alpha)
    tf = feats.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tf.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_feats"),
            (
                F.round(
                    F.sum(
                        F.col("lam") * F.col("tf").cast("decimal(10,0)")
                    ).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("logw"),
        )
        .orderBy("doc_id")
    )


def dsir_select(
    spark: SparkSession,
    sf_dir: str,
    k: int = 64,
    n_buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """Gumbel top-k resample: the k documents drawn without
    replacement with probability ∝ exp(logw).

    Output: (doc_id, logw, sel_key), sel_key DESC then doc_id ASC —
    a TakeOrderedAndProject over the weighted pool, no full sort."""
    w = dsir_weights(spark, sf_dir, n_buckets, alpha)
    keyed = w.select(
        "doc_id",
        "logw",
        (F.round(F.col("logw") + _gumbel(F.col("doc_id")), 6) + F.lit(0.0)).alias(
            "sel_key"
        ),
    )
    return keyed.orderBy(F.desc("sel_key"), F.asc("doc_id")).limit(int(k))
