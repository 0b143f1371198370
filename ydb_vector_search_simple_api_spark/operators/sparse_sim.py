"""Weighted sparse-vector cosine similarity self-join over word
n-gram TF-IDF features — the "all-pairs similarity search" family
(Bayardo, Ma, Srikant: *Scaling Up All Pairs Similarity Search*,
WWW 2007; public algorithm).

Where :func:`dedup.ngram_jaccard_pairs` treats documents as shingle
SETS, this family weights each shingle by tf·idf and scores pairs by
cosine — boilerplate-heavy shingles (high document frequency, low
idf) stop dominating the score, which is why production near-dup
pipelines run the weighted form next to plain Jaccard.

Two twins, identical output (the pruned form carries the exact
form's SQL oracle verbatim):

- :func:`tfidf_cosine_pairs` — the exact inverted-index join. Every
  feature of every doc is a join key; fine when features are sparse
  (word n-grams), the documented oracle baseline.
- :func:`tfidf_cosine_prefix_pairs` — the LOSSLESS scale path, the
  paper's index-prefix / probe-full shape. Each doc's features are
  sorted by a global rarity order and INDEXED only while the
  remaining (suffix) L2 mass of the unit-normalized vector is >= t:
  by Cauchy-Schwarz, a pair whose shared features all avoid one
  side's indexed prefix has cosine <= that side's pruned-suffix norm
  < t, so every qualifying pair is caught by joining indexed
  prefixes against FULL feature lists (both orientations via pair
  normalization). Exact verification then touches only candidates.
  The higher the threshold, the shorter the indexed prefix — at
  near-dup thresholds the index holds only each doc's heavy rare
  features.

Float-parity contract (shared with the DuckDB twin): the weight is
quantized ONCE — w = ROUND(tf · ln(N/df), 6) — so every downstream
product is IEEE-deterministic on identical doubles; per-term products
and squares are ROUND(·,9) → DECIMAL(28,9) summed (order-invariant),
the final cosine is ROUND(·,6)+0.0. Features present in every doc
(idf = 0) are dropped in both twins: zero-weight terms cannot move a
dot product, and they are exactly the hottest (most skewed) join
keys.

Plan shape at 100 TB: tf and df are one keyed shuffle each with
map-side combine; df and N ride broadcasts onto the feature table;
the self-join keys are rare by construction (prefix features have
low document frequency — the global order is ascending df); norms
join back on id. No all-pairs stage, no collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TXT

ROUND = 6


def tfidf_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, feat, w, dfreq): word n-gram occurrence counts weighted by
    tf · ln(N/df), quantized to 6 decimals (the single quantization
    point of the parity contract). Features in every doc (idf 0) are
    dropped — output-identical for any threshold > 0, and it removes
    the hottest join keys before they reach a shuffle."""
    # repartition barrier before the explode fan-out: the testdata
    # parquet is a single row group, and at any scale the shingle
    # explode multiplies row width ~n_tokens-fold — spread the source
    # rows across the executors BEFORE the heavy projection (the
    # shingled_table precedent in dedup.py)
    target = df.sparkSession.sparkContext.defaultParallelism
    toks = df.select(
        F.col(id_col).alias("id"), TXT.tokens(text_col).alias("toks")
    ).repartition(target, "id")
    sh = toks.select(
        "id", F.explode(TXT.shingles_from_tokens(F.col("toks"), n)).alias("feat")
    )
    tf = sh.groupBy("id", "feat").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("feat").agg(F.count(F.lit(1)).alias("dfreq"))
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "feat")
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("dfreq") < F.col("n_docs"))
        .select(
            "id",
            "feat",
            (
                F.round(
                    F.col("tf").cast("double")
                    * F.log(F.col("n_docs") / F.col("dfreq").cast("double")),
                    ROUND,
                )
                + F.lit(0.0)
            ).alias("w"),
            "dfreq",
        )
    )


def _norms(w: DataFrame) -> DataFrame:
    """(id, nrm): sqrt of the order-invariant decimal sum of rounded
    squared weights — identical association order in any engine."""
    return w.groupBy("id").agg(
        F.sqrt(
            F.sum(
                F.round(F.col("w") * F.col("w"), 9).cast("decimal(28,9)")
            ).cast("double")
        ).alias("nrm")
    )


def _score_pairs(
    edges: DataFrame, w: DataFrame, threshold: float
) -> DataFrame:
    """Shared scoring tail: dot products grouped per (id_a, id_b) edge
    set, normalized, rounded, thresholded. ``edges`` is either the
    full inverted-index join (exact twin) or candidate pairs fanned
    back out over the full feature table (pruned twin) — both produce
    one row per shared feature with (id_a, id_b, wa, wb)."""
    dots = edges.groupBy("id_a", "id_b").agg(
        F.sum(
            F.round(F.col("wa") * F.col("wb"), 9).cast("decimal(28,9)")
        )
        .cast("double")
        .alias("dot")
    )
    norms = _norms(w)
    na = norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("nb"))
    cosine = F.round(F.col("dot") / (F.col("na") * F.col("nb")), ROUND) + F.lit(
        0.0
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact TF-IDF cosine pairs at or above ``threshold`` — the
    inverted-index baseline and oracle carrier. Output
    (id_a, id_b, cosine), id_a < id_b."""
    # THREE consumers read the feature table (both join sides + the
    # norms aggregate) and Catalyst re-runs the whole shingle pipeline
    # per reference — materialize it once (probe: the 50k-doc exact
    # join spent most of its 546 s re-tokenizing; the checkpoint is
    # feature-table-sized, linear in the corpus)
    w = tfidf_features(df, id_col, text_col, n).localCheckpoint(eager=True)
    a = w.select(F.col("id").alias("id_a"), "feat", F.col("w").alias("wa"))
    b = w.select(F.col("id").alias("id_b"), "feat", F.col("w").alias("wb"))
    edges = a.join(b, ["feat"]).filter(F.col("id_a") < F.col("id_b"))
    return _score_pairs(edges, w, threshold)


def tfidf_related_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = 3,
) -> DataFrame:
    """Per-document top-k most similar documents by TF-IDF cosine —
    the "related documents" surface on the same feature machinery
    (lexical kNN join, the sparse twin of ``knn_join_cosine``).

    Both orientations of every scored pair feed the per-doc window
    (similarity is symmetric, the ranking is per SOURCE doc), rank
    ties break on neighbor id ascending after the ROUND(6) score —
    deterministic in any engine. Docs whose every feature is idf-0
    produce no rows (nothing to score against — the exact-pairs
    contract). Output (doc_id, neighbor_id, cosine, rk)."""
    w = tfidf_features(df, id_col, text_col, n).localCheckpoint(eager=True)
    a = w.select(F.col("id").alias("id_a"), "feat", F.col("w").alias("wa"))
    b = w.select(F.col("id").alias("id_b"), "feat", F.col("w").alias("wb"))
    edges = a.join(b, ["feat"]).filter(F.col("id_a") < F.col("id_b"))
    scored = _score_pairs(edges, w, threshold=float("-inf"))
    both = scored.select(
        F.col("id_a").alias("doc_id"),
        F.col("id_b").alias("neighbor_id"),
        "cosine",
    ).unionByName(
        scored.select(
            F.col("id_b").alias("doc_id"),
            F.col("id_a").alias("neighbor_id"),
            "cosine",
        )
    )
    rk = Window.partitionBy("doc_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        both.withColumn("rk", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "neighbor_id", "cosine", "rk")
    )


def tfidf_cosine_prefix_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """LOSSLESS pruned twin of :func:`tfidf_cosine_pairs` — identical
    output, so it shares the exact form's SQL oracle (at the same
    threshold).

    Index rule (AllPairs, asymmetric): unit-normalize per doc, order
    features by ascending document frequency (rare first — index
    join keys stay cold), and index a feature only while the suffix
    L2 mass from it onward is >= t - 1e-6 - 1e-9. Soundness: if a
    pair's shared features all avoid x's indexed prefix, then by
    Cauchy-Schwarz cos(x,y) <= ||x's pruned suffix|| · ||y|| < t, so
    every qualifying pair shares a feature between one side's INDEX
    and the other side's FULL list — the candidate join probes full
    lists with the index and normalizes the pair orientation. The
    1e-6 covers the final ROUND(6) admission (a pair at true cosine
    t - 5e-7 still rounds in); the 1e-9 is the usual float slack —
    both only ever ADMIT extra candidates, never drop a true pair."""
    # six consumers (index window, norms, both candidate sides, both
    # verify sides) — same materialization argument as the exact twin
    w = tfidf_features(df, id_col, text_col, n).localCheckpoint(eager=True)
    norms = _norms(w)
    u = w.join(norms, "id").withColumn("usq", F.pow(F.col("w") / F.col("nrm"), 2))
    order = Window.partitionBy("id").orderBy(
        F.col("dfreq").asc(), F.col("feat").asc()
    )
    before = (
        F.sum("usq")
        .over(order.rowsBetween(Window.unboundedPreceding, -1))
    )
    total = F.sum("usq").over(Window.partitionBy("id"))
    suffix_sq = total - F.coalesce(before, F.lit(0.0))
    cut = threshold - 1e-6 - 1e-9
    idx = (
        u.withColumn("sfx", suffix_sq)
        .filter(F.sqrt(F.col("sfx")) >= F.lit(cut))
        .select(F.col("id").alias("id_i"), "feat")
    )
    full = w.select(F.col("id").alias("id_f"), "feat")
    cand = (
        idx.join(full, ["feat"])
        .filter(F.col("id_i") != F.col("id_f"))
        .select(
            F.least("id_i", "id_f").alias("id_a"),
            F.greatest("id_i", "id_f").alias("id_b"),
        )
        .distinct()
    )
    # exact verification restricted to candidates: fan each pair back
    # out over BOTH full feature lists, landing on (id_b, feat) so the
    # intersection is keyed, never positional
    a = w.select(F.col("id").alias("id_a"), "feat", F.col("w").alias("wa"))
    b = w.select(F.col("id").alias("id_b"), "feat", F.col("w").alias("wb"))
    edges = cand.join(a, "id_a").join(b, ["id_b", "feat"])
    return _score_pairs(edges, w, threshold)
