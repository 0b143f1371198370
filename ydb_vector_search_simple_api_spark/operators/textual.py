"""Text-analysis queries over the ``documents`` table.

North-star extension scope: token statistics, quality scoring,
language ID, fingerprints — the per-document metrics a training-data
pipeline computes in its first pass. Everything is a single
projection/aggregation over the scan (no UDFs, no extra shuffles
beyond the aggregations themselves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TXT
from ..sources.store import load_documents

ROUND = 6


def _r(col):
    return F.round(col, ROUND) + F.lit(0.0)


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats: lengths, token counts, diversity, stopword
    rate, composite quality. One pass over the scan."""
    d = load_documents(spark, sf_dir)
    return d.select(
        F.col("doc_id"),
        TXT.char_count("text").alias("n_chars_calc"),
        TXT.token_count("text").alias("n_tokens"),
        TXT.distinct_token_count("text").alias("n_types"),
        _r(TXT.avg_token_length("text")).alias("avg_token_len"),
        _r(TXT.type_token_ratio("text")).alias("ttr"),
        _r(TXT.stopword_ratio("text")).alias("stop_ratio"),
        _r(TXT.quality_score("text")).alias("quality"),
    )


def lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per language: doc counts and exact integer sums
    (averages derived by one division — order-independent, unlike
    floating AVG, so the result is bit-stable under any partitioning)."""
    d = load_documents(spark, sf_dir)
    per_doc = d.select(
        "lang",
        TXT.token_count("text").alias("n_tokens"),
        F.col("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        _r(
            F.sum("n_chars").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_chars"),
    )


def token_frequencies(spark: SparkSession, sf_dir: str, top_n: int = 25) -> DataFrame:
    """Global token frequency table, top-N with deterministic
    (count DESC, token ASC) cut."""
    d = load_documents(spark, sf_dir)
    return (
        d.select(F.explode(TXT.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(top_n)
    )


def mg_candidates(tok_df: DataFrame, capacity: int = 4096) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries (Misra & Gries
    1982; mergeable-summaries form of Agarwal et al., PODS 2012).

    Each partition keeps at most ``capacity`` counters: Arrow batches
    are pre-aggregated vectorized (``value_counts``), merged into the
    running summary, and on overflow the (capacity+1)-th largest count
    is subtracted from every counter and non-positive counters pruned
    — the classic decrement step, batched. Guarantee per partition of
    N_i tokens: every token with local count > N_i/(capacity+1)
    survives, and the kept estimate undershoots the true local count
    by at most N_i/(capacity+1). By pigeonhole, any token with GLOBAL
    count > N/(capacity+1) is local-heavy in at least one partition,
    so the union of partition summaries is a candidate SUPERSET of the
    global heavy hitters. Output (token, est) rows, ≤ capacity per
    partition; ``est`` is the (under-)estimate, useful for bounds."""

    def part(batches):
        import numpy as np
        import pandas as pd

        counters = pd.Series(dtype="float64")
        for pdf in batches:
            counters = counters.add(pdf["token"].value_counts(), fill_value=0)
            if len(counters) > capacity:
                vals = counters.to_numpy()
                thresh = np.partition(vals, len(vals) - capacity - 1)[
                    len(vals) - capacity - 1
                ]
                counters = counters[counters > thresh] - thresh
        if len(counters):
            yield pd.DataFrame(
                {
                    "token": counters.index.astype(str),
                    "est": counters.to_numpy().astype("int64"),
                }
            )

    return tok_df.mapInPandas(part, "token string, est bigint")


def heavy_hitters_topk(
    spark: SparkSession, sf_dir: str, k: int = 25, capacity: int = 4096
) -> DataFrame:
    """Top-k token frequencies through the two-pass heavy-hitter
    scheme: Misra-Gries candidate generation per partition, then an
    exact count restricted to the (broadcast) candidate union.

    Identical output to :func:`token_frequencies` whenever the k-th
    true count exceeds N/(capacity+1) — always true for Zipf-shaped
    token mass at sane capacities — so it carries the exact oracle.

    The trade, MEASURED at 1M docs / 16M vocab (SCALING.md,
    tools/hh_scale_probe.py): the direct groupBy exchanges every
    per-partition distinct key (15.98M rows); this path exchanges at
    most ``capacity`` keys per partition per pass (196k rows — 81x
    fewer, independent of vocabulary size) but pays Arrow
    serialization on the token stream, so on a single-JVM RAM-speed
    shuffle the direct form is 4x FASTER in wall clock. Use this form
    when the exchange is network+disk and the vocabulary is the
    bottleneck (billion-key n-gram regimes); use the direct groupBy
    otherwise."""
    from . import dedup

    d = load_documents(spark, sf_dir)
    toks = dedup._ensure_parallelism(
        d.select(F.explode(TXT.tokens("text")).alias("token"))
    )
    cands = mg_candidates(toks, capacity).select("token").distinct()
    return (
        toks.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(k)
    )


def lang_id_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID per document (stopword-profile argmax)."""
    d = load_documents(spark, sf_dir)
    return d.select("doc_id", TXT.lang_id("text").alias("predicted_lang"))


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language ID against the
    table's labeled ``lang`` — the evaluation artifact a pipeline
    publishes before trusting a router (which languages leak into
    which, and how much mass 'und' swallows).

    One narrow projection + one keyed count; the recall share divides
    exact integers once. Output (lang, predicted_lang, n, recall),
    recall = n / total docs of the true lang, ROUND(6)."""
    d = load_documents(spark, sf_dir)
    pred = d.select("doc_id", "lang", TXT.lang_id("text").alias("predicted_lang"))
    cnt = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cnt.groupBy("lang").agg(F.sum("n").alias("tot"))
    return cnt.join(F.broadcast(tot), "lang").select(
        "lang",
        "predicted_lang",
        F.col("n").cast("bigint").alias("n"),
        (
            F.round(F.col("n").cast("double") / F.col("tot").cast("double"), 6)
            + F.lit(0.0)
        ).alias("recall"),
    )


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup keys per document: normalized-content md5 and
    order-insensitive token-set md5."""
    d = load_documents(spark, sf_dir)
    return d.select(
        "doc_id",
        TXT.content_fingerprint("text").alias("content_hash"),
        TXT.token_set_fingerprint("text").alias("token_set_hash"),
    )


def quality_filter(
    spark: SparkSession, sf_dir: str, min_quality: float = 0.8, min_tokens: int = 16
) -> DataFrame:
    """The pipeline's keep-list: docs passing quality gates."""
    d = load_documents(spark, sf_dir)
    q = TXT.quality_score("text")
    return (
        d.select(
            "doc_id",
            TXT.token_count("text").alias("n_tokens"),
            _r(q).alias("quality"),
        )
        .filter((F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens))
    )


def token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count budgeting per document: whitespace tokens vs a
    BPE-ish pre-tokenization count (the proxy pipelines use to budget
    LLM training tokens before running a real tokenizer)."""
    d = load_documents(spark, sf_dir)
    return d.select(
        "doc_id",
        TXT.token_count("text").alias("n_ws_tokens"),
        TXT.bpe_ish_token_count("text").alias("n_bpe_tokens"),
    )


def winnowing_fingerprints(
    spark: SparkSession, sf_dir: str, k: int = 8, window: int = 4
) -> DataFrame:
    """Rolling-hash document fingerprints (winnowing): per doc, the
    sorted distinct minima of a sliding window over char-k-gram md5s.
    Any shared substring of length >= k+window-1 between two docs
    yields a shared fingerprint — the copy-detection primitive.

    The k-gram hash array is materialized behind a repartition barrier
    before windowing: each of the ~len(text) window slices references
    the array, and without the barrier Catalyst's expression inlining
    would re-hash the document once per window (no let-binding).
    Output: (doc_id, fps array<string>); arrays sorted for stable
    comparison."""
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    # defaultParallelism alone: a driver-side constant — df.rdd
    # .getNumPartitions() would materialize the RDD conversion plan
    # just to read a number that the repartition target never needs
    # to undercut (the barrier exists for let-binding, not sizing)
    target = spark.sparkContext.defaultParallelism
    hashed = d.select(
        "doc_id", TXT.char_kgram_hashes("text", k).alias("h")
    ).repartition(target, "doc_id")
    return hashed.select("doc_id", TXT.winnow_mins(F.col("h"), window).alias("fps"))


def tfidf_top_terms(
    spark: SparkSession, sf_dir: str, top_n: int = 3
) -> DataFrame:
    """Per-document top-N TF-IDF terms — the keyword-extraction /
    topic-fingerprinting primitive of a corpus pipeline.

    tf = term count within the doc; idf = ln(N_docs / doc_freq);
    score rounded to 6 BEFORE ranking so the (tfidf DESC, token ASC)
    cut is deterministic in any engine. Two shuffles (tf groupBy +
    doc-frequency groupBy, both with map-side partial agg); N_docs and
    the doc-frequency table ride broadcasts — the fact table never
    re-shuffles for them. Output (doc_id, token, tf, tfidf, rk)."""
    from pyspark.sql import Window

    d = load_documents(spark, sf_dir).select("doc_id", "text")
    toks = d.select("doc_id", F.explode(TXT.tokens("text")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("token").agg(
        F.count_distinct("doc_id").alias("dfreq")
    )
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    tfidf = F.round(
        F.col("tf").cast("double")
        * F.log(F.col("n_docs") / F.col("dfreq").cast("double")),
        ROUND,
    ) + F.lit(0.0)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", tfidf)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= top_n)
        .select("doc_id", "token", "tf", "tfidf", "rk")
    )


def winnowing_fingerprints_flat(
    spark: SparkSession, sf_dir: str, k: int = 8, window: int = 4
) -> DataFrame:
    """Gate-friendly exploded form of :func:`winnowing_fingerprints`:
    one (doc_id, fp) row per distinct fingerprint. Docs with no
    fingerprints (len(text) < k) emit no rows — the oracle's ``unnest``
    over an empty list behaves identically.

    ``explode_outer`` + post-explode NULL filter, NOT plain
    ``explode``: for the latter, Catalyst's InferFiltersFromGenerate
    derives ``size(fps) > 0`` and pushes it BELOW the repartition
    barrier, re-inlining the whole winnowing expression into the scan
    stage — the O(len^2) re-hashing the barrier exists to prevent
    (observed 40x slowdown). The NULL filter references the generator
    output, so it cannot sink below the Generate."""
    arr = winnowing_fingerprints(spark, sf_dir, k=k, window=window)
    return (
        arr.select("doc_id", F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )


def winnowing_digest(
    spark: SparkSession, sf_dir: str, k: int = 8, window: int = 4
) -> DataFrame:
    """Per-doc digest of :func:`winnowing_fingerprints`: (doc_id,
    n_fps, fps_md5) where fps_md5 = md5 of the sorted fingerprints
    concatenated. Carries the full fingerprint computation but emits
    one scalar row per document — the gate/bench shape (the flat form
    moves ~len(text)/window rows per doc through collect; the digest
    proves the same set equality in 1 row). md5('') for docs shorter
    than k, matching the oracle's array_to_string([]) = ''."""
    arr = winnowing_fingerprints(spark, sf_dir, k=k, window=window)
    return arr.select(
        "doc_id",
        F.size("fps").cast("bigint").alias("n_fps"),
        F.md5(F.concat_ws("", F.col("fps"))).alias("fps_md5"),
    )


def chunk_documents(
    spark: SparkSession, sf_dir: str, chunk_size: int = 64, stride: int = 48,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Context-length chunking: cut each document's token stream into
    fixed-size chunks every ``stride`` tokens (overlap = chunk_size −
    stride) — the packing prep step before sequences meet a trainer.

    Narrow map: chunk starts come from one ``sequence`` over the token
    count, each chunk is a ``slice`` of the token array, then one
    ``posexplode``. The token array appears twice in the expression
    tree (size + slice), so a Catalyst re-inline costs at most one
    extra split per row — bounded, same containment argument as
    ``shingles_from_tokens``. Output: (doc_id, chunk_id, chunk_text,
    n_chunk_tokens); tail chunks may be shorter than chunk_size."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    if doc_filter is not None:
        # chunking is per-document, so restricting docs commutes with
        # it — callers with a survivor set (curated_pack) push the
        # semi-join BELOW the tokenize/slice work instead of chunking
        # the whole corpus and discarding
        d = d.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
    toks = TXT.tokens("text")
    n_chunks = (F.floor((F.size(toks) - 1) / F.lit(stride)) + 1).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(toks, i * stride + 1, chunk_size),
    )
    return (
        d.select("doc_id", F.posexplode(chunks).alias("chunk_id", "ch"))
        .select(
            "doc_id",
            "chunk_id",
            F.array_join("ch", " ").alias("chunk_text"),
            F.size("ch").alias("n_chunk_tokens"),
        )
    )


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistical quality signal: each document's mean unigram
    log-probability under the corpus's own token distribution (the
    cheap stand-in for LM-perplexity filtering — docs full of rare
    tokens score low, formulaic docs score high).

    Float parity contract: per-token ``ln(count/total)`` is rounded to
    9 places and summed as DECIMAL(28,9) — exact integer arithmetic,
    so the sum is independent of partitioning/visit order (same trick
    as ``relational``'s decimal-exact revenue sums); one double
    division + ROUND(6) at the end.

    Scale shape: token frequencies are one (token)-keyed shuffle with
    map-side combine; the frequency table is vocabulary-sized, so it
    rides a broadcast back onto the exploded token stream; the per-doc
    rollup is one (doc_id)-keyed shuffle. No all-pairs anywhere.
    """
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    toks = d.select("doc_id", F.explode(TXT.tokens("text")).alias("tok"))
    freqs = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    # corpus total rides a single-row broadcast cross join (lazy — no
    # separate driver job; same pattern as temporal's grid totals)
    total = toks.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    logp = F.round(
        F.log(F.col("cnt").cast("double") / F.col("n_total")), 9
    ).cast("decimal(28,9)")
    return (
        toks.join(F.broadcast(freqs), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(logp).alias("sum_logp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (
                F.round(
                    F.col("sum_logp").cast("double") / F.col("n_tokens"), 6
                )
                + F.lit(0.0)
            ).alias("mean_logprob"),
        )
    )


# ------------------------------------------- markup normalization

def attach_markup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic markup/noise augmentation for testing the
    normalizer: the synthetic corpus is already clean (lowercase, no
    tags, single spaces), so — same pattern as ``curation.attach_pii``
    — each doc is wrapped in HTML-ish structure with entities, mixed
    case and messy whitespace, all derived from ``doc_id``. Both Spark
    and the DuckDB oracle build the identical string, so the gate
    exercises the actual normalization passes, not a no-op."""
    i = F.col("doc_id")
    return df.withColumn(
        "raw_html",
        F.concat(
            F.lit('<div class="c'), (i % 5).cast("string"), F.lit('">\t '),
            F.lit("<b>"), F.upper(F.substring(F.col(text_col), 1, 10)),
            F.lit("</b>"), F.substring(F.col(text_col), 11, 1000000),
            F.lit("  &amp; tail"), (i % 97).cast("string"),
            F.lit("&nbsp;&lt;eof&gt;<br/>\r\n</div>"),
        ),
    )


#: ordered normalization passes: (pattern, replacement) — tag strip
#: first, then entity decode, then whitespace collapse. Anchored to
#: what both Java regex (Spark) and RE2 (DuckDB) interpret identically
#: (explicit ASCII whitespace class, no lookaround).
MARKUP_PASSES: tuple[tuple[str, str], ...] = (
    (r"<[^>]*>", " "),      # strip tags (replaced by space: word boundary)
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"[ \t\r\n]+", " "),   # collapse runs of whitespace
)


def normalize_text_expr(col) -> "F.Column":
    """lower → ordered regex passes → trim, as one codegen expression
    chain (narrow map; zero shuffles — the 100 TB preprocessing shape)."""
    t = F.lower(col if not isinstance(col, str) else F.col(col))
    for pat, repl in MARKUP_PASSES:
        t = F.regexp_replace(t, pat, repl)
    return F.trim(t)


def normalize_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate shape: (doc_id, n_chars_raw, n_chars_norm, clean_md5) over
    the markup-augmented documents. The normalized text round-trips to
    the original corpus text (tags/entities/case/whitespace noise all
    removed) — asserted in tests/test_textual.py."""
    d = attach_markup(load_documents(spark, sf_dir))
    norm = normalize_text_expr(F.col("raw_html"))
    return d.select(
        "doc_id",
        F.length("raw_html").alias("n_chars_raw"),
        F.length(norm).alias("n_chars_norm"),
        F.md5(norm).alias("clean_md5"),
    )


def extract_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL inventory over the PII-augmented corpus: one row per
    (doc_id, url) via regexp_extract_all + explode — the link-graph /
    crawl-frontier primitive. Narrow map + explode, no shuffle."""
    from .curation import attach_pii

    d = attach_pii(load_documents(spark, sf_dir))
    urls = F.regexp_extract_all(
        F.col("pii_text"), F.lit(r"https?://[^ \t\r\n]+"), 0
    )
    return (
        d.select("doc_id", F.explode(urls).alias("url"))
        .orderBy("doc_id", "url")
    )


def bigram_logprob(
    spark: SparkSession, sf_dir: str, docpair: DataFrame | None = None
) -> DataFrame:
    """Sequence-aware quality signal: each document's mean bigram
    conditional log-probability ``ln(c(prev,cur)/c(prev,*))`` under
    the corpus's own statistics — one step up from
    :func:`unigram_logprob` toward LM-perplexity filtering (catches
    shuffled/boilerplate token streams a unigram model scores well).

    Same float-parity contract as the unigram: per-bigram log rounded
    to 9 places, summed as DECIMAL(28,9) (partitioning-invariant),
    one double division + ROUND(6) at the end.

    Scale shape: bigram extraction is a narrow transform (no
    self-join); the bigram table is one keyed shuffle with map-side
    combine. The count tables join back onto the bigram stream by key
    — broadcast while they fit (vocabulary², usually MBs after
    combine), AQE picks a shuffled join past that. Docs with < 2
    tokens emit no bigrams and are absent from the output (same in
    the oracle).

    The (doc, prev, cur, n) pre-aggregate comes from
    :func:`doc_bigram_pairs` (one corpus pass, materialized; was 3
    passes over the explode — measured 11.7 s → ~2 s at sf0.1);
    n * round(log,9) is exact decimal arithmetic, so results are
    bit-identical to the per-occurrence sum. Pass ``docpair`` to
    share the aggregate across scorers (the cache-layer contract —
    see :func:`docpair_cached`)."""
    if docpair is None:
        docpair = doc_bigram_pairs(spark, sf_dir)
    cnt2 = docpair.groupBy("prev", "cur").agg(F.sum("n").alias("c2"))
    cnt1 = cnt2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    # decimal(20,9) × decimal(12,0) → decimal(33,9): stays under the
    # 38-precision cap, so the product keeps scale 9 EXACTLY (a
    # decimal(28,9) × bigint product would overflow and silently drop
    # to scale 8 — a 1-ulp divergence from the per-occurrence oracle)
    logp = F.round(
        F.log(F.col("c2").cast("double") / F.col("c1").cast("double")), 9
    ).cast("decimal(20,9)")
    return (
        docpair.join(F.broadcast(cnt2), ["prev", "cur"])
        .join(F.broadcast(cnt1), "prev")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.sum(F.col("n").cast("decimal(12,0)") * logp).alias("s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (
                F.round(F.col("s").cast("double") / F.col("n_bigrams"), 6)
                + F.lit(0.0)
            ).alias("mean_bigram_logprob"),
        )
    )


def readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-reading-ease proxy per document: words = whitespace
    tokens, sentences = runs of ``[.!?]`` (floored at 1), syllables =
    vowel-group count (``[aeiouy]+`` over the lowercased text) — the
    standard dependency-free approximation. Score =
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words),
    rounded to 6. Empty docs (0 tokens) are excluded on both sides.

    Pure codegen projection — three regexp counts and one arithmetic
    expression, zero shuffles; the 100 TB shape is a narrow map over
    the corpus scan. Output (doc_id, n_words, n_sentences,
    n_syllables, flesch)."""
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    n_words = F.size(TXT.tokens("text"))
    n_sent = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
    )
    n_syl = F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+"))
    return (
        d.filter(n_words > 0)
        .select(
            "doc_id",
            n_words.cast("bigint").alias("n_words"),
            n_sent.cast("bigint").alias("n_sentences"),
            n_syl.cast("bigint").alias("n_syllables"),
            (
                F.round(
                    F.lit(206.835)
                    - F.lit(1.015)
                    * (n_words.cast("double") / n_sent.cast("double"))
                    - F.lit(84.6) * (n_syl.cast("double") / n_words.cast("double")),
                    6,
                )
                + F.lit(0.0)
            ).alias("flesch"),
        )
    )


def bpe_pair_counts(
    spark: SparkSession, sf_dir: str, top_n: int = 30
) -> DataFrame:
    """The first step of BPE tokenizer training at corpus scale: the
    ``top_n`` most frequent adjacent character pairs inside tokens
    (merging the argmax pair is one BPE iteration; running the count
    over the merged stream is the next). Pairs never cross token
    boundaries, matching standard BPE pre-tokenization.

    Scale shape: tokenize + per-token pair fan-out are narrow
    (explode, no joins); one keyed count with map-side combine —
    |alphabet|² groups — then a single-partition top-N over the tiny
    aggregate. Output (pair, n, rk) by (n DESC, pair ASC)."""
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    # the standard BPE formulation: count the VOCABULARY first (one
    # corpus-sized keyed count with map-side combine), then fan pairs
    # out over distinct tokens weighted by their frequency — the pair
    # explode runs over |vocab| rows, not every token occurrence
    # (measured 6.4 s → ~1 s at sf0.1; same counts exactly)
    vocab = (
        d.select(F.explode(TXT.tokens("text")).alias("t"))
        .filter(F.length("t") >= 2)
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n_tok"))
    )
    pairs = vocab.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("t") - 1),
                lambda i: F.col("t").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "n_tok",
    )
    from pyspark.sql import Window

    counts = pairs.groupBy("pair").agg(F.sum("n_tok").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= top_n)
        .select("pair", "n", "rk")
    )


#: Snorkel-style labeling functions: (name, regex, label) — a rule
#: votes its label when the regex matches, else abstains.
WEAK_LABEL_RULES: tuple[tuple[str, str, str], ...] = (
    ("has_query", r"\bquery\b", "db"),
    ("has_join", r"\bjoin\b", "db"),
    ("has_stream", r"\bstream\b", "infra"),
    ("has_batch", r"\bbatch\b", "infra"),
    ("has_vector", r"\bvector\b", "ml"),
)


def weak_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak supervision (Snorkel-style): a panel of regex labeling
    functions votes on every document; the doc gets the majority label
    (ties broken alphabetically), plus coverage diagnostics — the
    standard way to bootstrap training labels without annotators.

    Pure codegen: |rules| regexp tests per row as one array of vote
    structs, aggregated per row with filter/size — no shuffle at all
    for the labeling itself (the gate shape adds nothing); at 100 TB
    this is a scan-bound narrow map that fuses into whatever reads the
    corpus next. Output (doc_id, n_votes, label, agreement) where
    agreement = votes_for_label / n_votes (docs with zero votes get
    label NULL, agreement 0)."""
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    votes = F.array(
        *[
            F.when(
                F.lower(F.col("text")).rlike(pat), F.lit(label)
            ).otherwise(F.lit(None).cast("string"))
            for _, pat, label in WEAK_LABEL_RULES
        ]
    )
    cast_votes = F.filter(votes, lambda v: v.isNotNull())
    labels = sorted({label for _, _, label in WEAK_LABEL_RULES})
    counts = F.array(
        *[
            F.struct(
                F.lit(lab).alias("lab"),
                F.size(F.filter(cast_votes, lambda v: v == F.lit(lab))).alias("c"),
            )
            for lab in labels
        ]
    )
    # majority with alphabetical tie-break: array_max over (c, NEGATIVE
    # lexical order) — simpler: sort by (c DESC, lab ASC) via
    # array_sort comparator-free trick: build (−c, lab) keys? Spark's
    # array_sort on structs orders by fields ascending — so sort by
    # (negated count, lab) and take element 1.
    ordered = F.array_sort(
        F.transform(
            counts,
            lambda s: F.struct((-s["c"]).alias("negc"), s["lab"].alias("lab"), s["c"].alias("c")),
        )
    )
    best = F.element_at(ordered, 1)
    n_votes = F.size(cast_votes)
    return d.select(
        "doc_id",
        n_votes.cast("bigint").alias("n_votes"),
        F.when(n_votes > 0, best["lab"]).alias("label"),
        (
            F.when(
                n_votes > 0,
                F.round(best["c"].cast("double") / n_votes.cast("double"), 6)
                + F.lit(0.0),
            ).otherwise(F.lit(0.0))
        ).alias("agreement"),
    )


def augment_token_dropout(
    spark: SparkSession, sf_dir: str, rate: float = 0.15
) -> DataFrame:
    """Deterministic data augmentation: drop ~``rate`` of each
    document's tokens, chosen by a pure hash of (doc_id, position) —
    the reproducible twin of random token dropout (same augmented
    corpus on every run/engine, so training runs are comparable).

    Narrow map: per token position an md5 draw against the rate
    threshold filters the token array; no shuffle. The gate shape
    returns digests (kept/dropped counts + md5 of the augmented text)
    instead of hauling full augmented text. Output (doc_id, n_tokens,
    n_kept, aug_md5)."""
    if not 0.0 <= rate < 1.0:
        raise ValueError("rate must be in [0, 1)")
    from .sampling import PREFIX_HEX, _threshold_hex

    thr = _threshold_hex(rate)
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    toks = TXT.tokens("text")
    idx = F.sequence(F.lit(1), F.size(toks))
    kept = F.filter(
        F.zip_with(toks, idx, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), s["i"].cast("string"))),
            1,
            PREFIX_HEX,
        )
        >= F.lit(thr),
    )
    aug = F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.md5(aug).alias("aug_md5"),
    )


def winnowing_digest64(
    spark: SparkSession, sf_dir: str, k: int = 8, window: int = 4
) -> DataFrame:
    """Production twin of :func:`winnowing_digest`: xxhash64 k-gram
    hashes instead of md5 hex strings (same winnowing guarantee — it
    holds for any hash — measured ~20x cheaper at 1M docs; rows-only
    in the gate, the md5 form carries the oracle). Output (doc_id,
    n_fps, fps_md5)."""
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    target = spark.sparkContext.defaultParallelism
    hashed = d.select(
        "doc_id", TXT.char_kgram_hashes64("text", k).alias("h")
    ).repartition(target, "doc_id")
    arr = hashed.select("doc_id", TXT.winnow_mins(F.col("h"), window).alias("fps"))
    return arr.select(
        "doc_id",
        F.size("fps").cast("bigint").alias("n_fps"),
        F.md5(
            F.concat_ws(",", F.transform("fps", lambda x: x.cast("string")))
        ).alias("fps_md5"),
    )


def winnowing_digest_arrow(
    spark: SparkSession, sf_dir: str, k: int = 8, window: int = 4
) -> DataFrame:
    """Arrow-vectorized winnowing — the 100 TB fingerprinting path.
    The SQL-expression form (:func:`winnowing_digest`) pays O(len·w)
    per doc in per-window array slices; this variant computes, inside
    ``mapInPandas`` per Arrow batch, (a) a polynomial rolling hash of
    every k-gram as 8 vectorized uint64 slice-multiply-adds (wraparound
    mod 2^64 is the modulus), and (b) sliding-window minima via
    numpy's stride-tricks view — O(len) per doc at C speed (measured
    ~40x over the expression form at 1M docs; tools/text_scale_probe).
    The winnowing guarantee (shared substring of length >= k+window-1
    ⇒ shared fingerprint) holds for any hash, pinned in
    tests/test_text.py. Rows-only (hash differs from the md5 oracle
    twin by design). Output (doc_id, n_fps, fps_md5)."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    P = np.uint64(1099511628211)  # FNV prime; wraparound mod 2^64

    def batch(it):
        pw = (P ** np.arange(k - 1, -1, -1, dtype=np.uint64))  # wraps, fine
        for pdf in it:
            ids, nf, dig = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(
                    np.uint64
                )
                L = len(b) - k + 1
                if L <= 0:
                    fps = np.array([], dtype=np.uint64)
                else:
                    H = np.zeros(L, dtype=np.uint64)
                    for j in range(k):
                        H += b[j : j + L] * pw[j]
                    if L >= window:
                        sw = np.lib.stride_tricks.sliding_window_view(H, window)
                        fps = np.unique(sw.min(axis=1))
                    else:
                        fps = np.unique([H.min()])
                ids.append(doc_id)
                nf.append(len(fps))
                dig.append(
                    hashlib.md5(",".join(map(str, fps.tolist())).encode()).hexdigest()
                )
            yield pd.DataFrame({"doc_id": ids, "n_fps": nf, "fps_md5": dig})

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_fps", T.LongType()),
            T.StructField("fps_md5", T.StringType()),
        ]
    )
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    return d.mapInPandas(batch, schema=schema)


#: gazetteer: surface form -> canonical entity (the dictionary-NER
#: primitive; real pipelines load this from a reference table)
GAZETTEER: tuple[tuple[str, str], ...] = (
    ("spark", "ENGINE"),
    ("query", "QUERY"),
    ("table", "TABLE"),
    ("vector", "VECTOR"),
    ("stream", "STREAM"),
    ("customer", "CUSTOMER"),
)


def gazetteer_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-based entity extraction (gazetteer matching): count
    per document how many tokens hit each entity class — the NER-lite
    pass a curation pipeline runs to tag domain entities without a
    model. The dictionary joins as a broadcast onto the token stream;
    with a token-array formulation for small dictionaries this would
    be narrow (the BM25 trick), but the general gazetteer is a TABLE
    (millions of surface forms at production scale), so the canonical
    shape is explode + broadcast-hash-join + keyed count, shown here.
    Output (doc_id, entity, n_mentions)."""
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    gaz = F.broadcast(
        spark.createDataFrame(list(GAZETTEER), "token string, entity string")
    )
    toks = d.select("doc_id", F.explode(TXT.tokens("text")).alias("token"))
    return (
        toks.join(gaz, "token")
        .groupBy("doc_id", "entity")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )


def entity_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over the gazetteer entities: for every
    unordered entity pair, the number of documents mentioning both
    (support) and the lift ``N·supp(ab)/(supp(a)·supp(b))`` — the
    market-basket signal over document-level co-occurrence.

    Per-doc DISTINCT entity sets self-join on doc_id (each side ≤
    |entity classes| rows per doc, so the pair fan-out is bounded by
    |classes|² per doc, not by text length); supports aggregate with
    map-side combine and the tiny per-entity table broadcasts back.
    Output (entity_a, entity_b, n_both, lift) with entity_a <
    entity_b, lift rounded to 6."""
    per_doc = gazetteer_entities(spark, sf_dir).select("doc_id", "entity").distinct()
    n_docs = load_documents(spark, sf_dir).count()
    singles = per_doc.groupBy("entity").agg(F.count(F.lit(1)).alias("n_ent"))
    a = per_doc.alias("a")
    b = per_doc.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.entity") < F.col("b.entity")),
        )
        .groupBy(
            F.col("a.entity").alias("entity_a"), F.col("b.entity").alias("entity_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(F.col("entity").alias("entity_a"), F.col("n_ent").alias("n_a"))
    sb = singles.select(F.col("entity").alias("entity_b"), F.col("n_ent").alias("n_b"))
    lift = F.round(
        F.lit(float(n_docs))
        * F.col("n_both").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
        6,
    ) + F.lit(0.0)
    return (
        pairs.join(F.broadcast(sa), "entity_a")
        .join(F.broadcast(sb), "entity_b")
        .select("entity_a", "entity_b", "n_both", lift.alias("lift"))
    )


def lang_quality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab of language × quality bucket (floor(q·10), capped at
    9) with per-cell share of the language's docs — the corpus-mix
    report reviewers read before training. One narrow projection + one
    keyed count; language totals broadcast back. Output (lang,
    q_bucket, n_docs, lang_share)."""
    d = load_documents(spark, sf_dir)
    per = d.select(
        "lang",
        F.least(
            F.floor((F.round(TXT.quality_score("text"), 6) + F.lit(0.0)) * 10).cast(
                "int"
            ),
            F.lit(9),
        ).alias("q_bucket"),
    )
    cells = per.groupBy("lang", "q_bucket").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = cells.groupBy("lang").agg(F.sum("n_docs").alias("n_lang"))
    return cells.join(F.broadcast(totals), "lang").select(
        "lang",
        "q_bucket",
        "n_docs",
        (
            F.round(F.col("n_docs").cast("double") / F.col("n_lang").cast("double"), 6)
            + F.lit(0.0)
        ).alias("lang_share"),
    )


def top_tokens_per_lang(
    spark: SparkSession, sf_dir: str, top_n: int = 5
) -> DataFrame:
    """Grouped top-k over text: each language's ``top_n`` most
    frequent tokens — the per-slice vocabulary snapshot (the global
    variant is ``token_frequencies``). One keyed count (map-side
    combine) then a window over the aggregated (lang, token) table.
    Output (lang, token, cnt, rk)."""
    from pyspark.sql import Window

    d = load_documents(spark, sf_dir).select("lang", "text")
    counts = (
        d.select("lang", F.explode(TXT.tokens("text")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= top_n)
        .select("lang", "token", "cnt", "rk")
    )


def doc_bigram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, prev, cur, n) bigram aggregate both LM scorers
    start from — one corpus tokenize+explode behind one keyed shuffle,
    materialized (eager localCheckpoint) so every downstream consumer
    reads the aggregate instead of re-running the explode."""
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    t = TXT.tokens("text")
    pairs_arr = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("prev"), F.element_at(t, i + 1).alias("cur")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    pairs = d.select("doc_id", F.explode(pairs_arr).alias("p")).select(
        "doc_id", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur")
    )
    return (
        pairs.groupBy("doc_id", "prev", "cur")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )


_DOCPAIR_CACHE: dict[tuple[str, str], DataFrame] = {}


def docpair_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped cache of :func:`doc_bigram_pairs` — a pure
    function of the corpus files (the bigram_scores_cached contract).
    Lives at the cache layer: the library operators stay lazy and
    take the aggregate as an optional argument instead."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _DOCPAIR_CACHE:
        _DOCPAIR_CACHE[key] = doc_bigram_pairs(spark, sf_dir)
    return _DOCPAIR_CACHE[key]


def kneser_ney_logprob(
    spark: SparkSession,
    sf_dir: str,
    discount: float = 0.75,
    docpair: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean log-probability under an interpolated
    Kneser-Ney bigram model (Kneser & Ney 1995; Chen & Goodman 1998)
    trained on the corpus's own statistics — the standard smoothed LM
    the raw-MLE :func:`bigram_logprob` approximates:

        P(cur|prev) = max(c(prev,cur) - D, 0)/c(prev)
                      + D * N1+(prev,*)/c(prev) * Pcont(cur)
        Pcont(cur)  = N1+(*,cur) / N1+(*,*)

    with fixed discount D. The continuation probability scores how
    many CONTEXTS a word follows, not how often it occurs — the
    "San Francisco" correction that makes KN the default n-gram
    smoother. Every statistic is an exact integer aggregate; the
    probability is evaluated in double with a fixed association
    order, per-bigram log rounded to 9, summed as decimal — the same
    cross-engine float-parity contract as bigram_logprob.

    Scale shape: identical to bigram_logprob (one doc-bigram
    aggregate behind a checkpoint barrier; count tables broadcast
    while they fit) plus two vocabulary-sized type-count tables and
    one scalar — all derived from the SAME cnt2 aggregate, no extra
    corpus pass."""
    if docpair is None:
        docpair = doc_bigram_pairs(spark, sf_dir)
    cnt2 = docpair.groupBy("prev", "cur").agg(F.sum("n").alias("c2"))
    cnt1 = cnt2.groupBy("prev").agg(
        F.sum("c2").alias("c1"), F.count(F.lit(1)).alias("n1p_prev")
    )
    ncur = cnt2.groupBy("cur").agg(F.count(F.lit(1)).alias("n1p_cur"))
    total = cnt2.agg(F.count(F.lit(1)).alias("n1p_total"))
    # fixed association order, mirrored verbatim in the SQL oracle:
    # (c2 - D)/c1 + ((D * n1p_prev)/c1) * (n1p_cur/n1p_total)
    prob = (F.col("c2").cast("double") - F.lit(discount)) / F.col("c1").cast(
        "double"
    ) + ((F.lit(discount) * F.col("n1p_prev")) / F.col("c1").cast("double")) * (
        F.col("n1p_cur").cast("double") / F.col("n1p_total").cast("double")
    )
    logp = F.round(F.log(prob), 9).cast("decimal(20,9)")
    return (
        docpair.join(F.broadcast(cnt2), ["prev", "cur"])
        .join(F.broadcast(cnt1), "prev")
        .join(F.broadcast(ncur), "cur")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.sum(F.col("n").cast("decimal(12,0)") * logp).alias("s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (
                F.round(F.col("s").cast("double") / F.col("n_bigrams"), 6)
                + F.lit(0.0)
            ).alias("mean_kn_logprob"),
        )
    )


#: BOS/EOS sentinels for the padded n-gram stream. Whitespace
#: tokenization can never emit a token containing whitespace, and the
#: synthetic corpus contains no literal "<s>" tokens; angle-bracket
#: sentinels are the KenLM/CCNet convention.
KN_BOS = "<s>"
KN_EOS = "</s>"


def kneser_ney5_logprob(
    spark: SparkSession,
    sf_dir: str,
    discount: float = 0.75,
) -> DataFrame:
    """Per-document mean log-probability under an INTERPOLATED 5-GRAM
    Kneser-Ney model (Chen & Goodman 1998, the modified-KN family at
    fixed discount) trained on the corpus's own statistics — the
    production CCNet-style filtering score; the bigram
    :func:`kneser_ney_logprob` is its order-2 special case.

    Each document is padded with four ``<s>`` and one ``</s>`` (the
    KenLM convention), so every real token AND the end-of-document
    event are scored with a full 4-token context and every
    denominator below is provably positive — no zero-probability or
    missing-context special cases anywhere.

    The Chen-Goodman recursion, top order using TRUE counts and every
    lower order using CONTINUATION (type) counts derived from the
    level above:

        P5(w|c1..c4) = max(c5-D,0)/ctx5 + D·N1+5/ctx5 · P4(w|c2..c4)
        P4(w|c2..c4) = max(ckn4-D,0)/ctx4 + D·N1+4/ctx4 · P3(w|c3,c4)
        P3, P2 analogous;  P1(w) = ckn1(w)/Σ ckn1

    where ckn4(c2..c4,w) = |{v : c5(v,c2..c4,w) > 0}| and each deeper
    ckn is the distinct-extension count of the table above it — so
    EVERY statistic is one exact-integer aggregate in a cascade off a
    SINGLE corpus 5-gram pass (c5 → kn4 → kn3 → kn2 → kn1), no extra
    corpus scans. Probability evaluates in double with one fixed
    association order, per-gram log ROUND(9), decimal-weighted sum,
    final ROUND(6) — the established cross-engine float-parity
    contract, which is what lets DuckDB unroll the identical model.

    100 TB shape: one tokenize+explode behind one (doc, gram)-keyed
    aggregate; the five stat tables are distinct-n-gram-sized (not
    corpus-sized) and every join is keyed on gram columns — shuffled
    hash joins AQE can size; only the one-row grand total broadcasts
    unconditionally. Nothing collects to the driver.

    Output: (doc_id, n_grams, mean_kn5_logprob); n_grams = len+1.
    """
    docg = _kn5_docg(load_documents(spark, sf_dir).select("doc_id", "text"))
    c5 = docg.groupBy("g1", "g2", "g3", "g4", "g5").agg(
        F.sum("n").alias("c5")
    )
    return _kn5_score(docg, c5, discount)


def _kn5_docg(d: DataFrame, checkpoint: bool = True) -> DataFrame:
    """Per-doc padded 5-gram counts (doc_id, g1..g5, n) — the shared
    gram pass behind :func:`kneser_ney5_logprob` and the persisted
    model store (``operators.lm_store``): one tokenize+explode behind
    one (doc, gram)-keyed aggregate. ``checkpoint`` pins the table
    when TWO consumers read it (the recompute forms derive the model
    stats AND score from the same docg); single-consumer callers (the
    store's build/upsert aggregate it once, the store's score joins
    it once against the parquet model) pass False — materializing the
    most voluminous intermediate in the pipeline for one reader is
    pure waste (measured: the store entries dropped ~40% at sf0.1
    when the single-reader checkpoints were removed)."""
    t = TXT.tokens("text")
    padded = F.concat(
        F.array(*[F.lit(KN_BOS)] * 4), t, F.array(F.lit(KN_EOS))
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(padded) - 4),
        lambda i: F.struct(
            F.element_at(padded, i).alias("g1"),
            F.element_at(padded, i + 1).alias("g2"),
            F.element_at(padded, i + 2).alias("g3"),
            F.element_at(padded, i + 3).alias("g4"),
            F.element_at(padded, i + 4).alias("g5"),
        ),
    )
    out = (
        d.select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", "g.*")
        .groupBy("doc_id", "g1", "g2", "g3", "g4", "g5")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return out.localCheckpoint(eager=True) if checkpoint else out


def _kn5_score(docg: DataFrame, c5: DataFrame, discount: float) -> DataFrame:
    """Score per-doc gram counts against a 5-gram model given ONLY its
    top-order count table ``c5`` — the whole Chen-Goodman continuation
    cascade (kn4..kn1, contexts, totals) derives from c5 by exact
    integer aggregates, which is what makes the persisted store's
    upsert a pure count fold (sum the deltas into c5, re-derive).
    Expressions are byte-identical to the in-session form:
    store-served scores == recompute by construction. Grams of
    ``docg`` absent from the model are dropped by the inner joins —
    the store contract is upsert-then-score (the loop's order), under
    which every scored gram is present."""
    G = ["g1", "g2", "g3", "g4", "g5"]
    top_ctx = c5.groupBy("g1", "g2", "g3", "g4").agg(
        F.sum("c5").alias("ctx5"), F.count(F.lit(1)).alias("n1p5")
    )
    # continuation cascade: rows-per-key of the table above IS the
    # distinct-left-extension count (each row is one distinct extension)
    kn4 = c5.groupBy("g2", "g3", "g4", "g5").agg(
        F.count(F.lit(1)).alias("ckn4")
    )
    kn4ctx = kn4.groupBy("g2", "g3", "g4").agg(
        F.sum("ckn4").alias("ctx4"), F.count(F.lit(1)).alias("n1p4")
    )
    kn3 = kn4.groupBy("g3", "g4", "g5").agg(F.count(F.lit(1)).alias("ckn3"))
    kn3ctx = kn3.groupBy("g3", "g4").agg(
        F.sum("ckn3").alias("ctx3"), F.count(F.lit(1)).alias("n1p3")
    )
    kn2 = kn3.groupBy("g4", "g5").agg(F.count(F.lit(1)).alias("ckn2"))
    kn2ctx = kn2.groupBy("g4").agg(
        F.sum("ckn2").alias("ctx2"), F.count(F.lit(1)).alias("n1p2")
    )
    kn1 = kn2.groupBy("g5").agg(F.count(F.lit(1)).alias("ckn1"))
    tot = kn1.agg(F.sum("ckn1").alias("tot1"))

    D = F.lit(discount)
    dbl = lambda c: F.col(c).cast("double")
    p1 = dbl("ckn1") / dbl("tot1")
    p2 = F.greatest(dbl("ckn2") - D, F.lit(0.0)) / dbl("ctx2") + (
        (D * F.col("n1p2")) / dbl("ctx2")
    ) * p1
    p3 = F.greatest(dbl("ckn3") - D, F.lit(0.0)) / dbl("ctx3") + (
        (D * F.col("n1p3")) / dbl("ctx3")
    ) * p2
    p4 = F.greatest(dbl("ckn4") - D, F.lit(0.0)) / dbl("ctx4") + (
        (D * F.col("n1p4")) / dbl("ctx4")
    ) * p3
    p5 = F.greatest(dbl("c5") - D, F.lit(0.0)) / dbl("ctx5") + (
        (D * F.col("n1p5")) / dbl("ctx5")
    ) * p4
    logp = F.round(F.log(p5), 9).cast("decimal(20,9)")
    return (
        docg.join(c5, G)
        .join(top_ctx, ["g1", "g2", "g3", "g4"])
        .join(kn4, ["g2", "g3", "g4", "g5"])
        .join(kn4ctx, ["g2", "g3", "g4"])
        .join(kn3, ["g3", "g4", "g5"])
        .join(kn3ctx, ["g3", "g4"])
        .join(kn2, ["g4", "g5"])
        .join(kn2ctx, ["g4"])
        .join(kn1, ["g5"])
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum(F.col("n").cast("decimal(12,0)") * logp).alias("s"),
        )
        .select(
            "doc_id",
            "n_grams",
            (
                F.round(F.col("s").cast("double") / F.col("n_grams"), 6)
                + F.lit(0.0)
            ).alias("mean_kn5_logprob"),
        )
    )


_KN5_CACHE: dict[tuple[str, str], DataFrame] = {}


def kn5_scores_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped cache of the per-doc 5-gram KN scores — pure
    function of the corpus files (the bigram_scores_cached contract);
    shared by the logprob entry and the perplexity tiles."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _KN5_CACHE:
        _KN5_CACHE[key] = kneser_ney5_logprob(spark, sf_dir).localCheckpoint(
            eager=True
        )
    return _KN5_CACHE[key]


def kneser_ney5_modified_logprob(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MODIFIED Kneser-Ney at order 5 (Chen & Goodman 1999's
    refinement; the KenLM default): instead of one fixed discount,
    each level estimates THREE discounts D1/D2/D3+ from its own
    count-of-counts (n1..n4) via the Good-Turing-style closed form

        Y  = n1 / (n1 + 2·n2)
        D1 = 1 − 2Y·n2/n1,  D2 = 2 − 3Y·n3/n2,  D3+ = 3 − 4Y·n4/n3

    applied by the gram's (KN-)count class, with the matching backoff
    mass γ(ctx) = (D1·N1(ctx·) + D2·N2(ctx·) + D3+·N3+(ctx·)) / c(ctx·).
    The cascade and padding are exactly :func:`kneser_ney5_logprob`'s;
    the unigram base stays the undiscounted continuation distribution
    (documented variant — KenLM interpolates it with uniform, which
    adds a vocabulary constant both engines would have to share; the
    continuation base keeps the model pure-corpus).

    Degenerate count-of-count fallbacks (tiny corpora can have
    n1/n2/n3 = 0, where the closed form divides by zero): D1→0.5,
    D2→1.0, D3+→1.5, each then clamped to ≥0 — deterministic and
    mirrored verbatim in the oracle.

    Everything stays the exact-integer / fixed-association-order /
    ROUND(ln,9)-decimal-sum contract; the per-level discounts are four
    scalars computed IN-PLAN (one-row aggregate, crossJoin broadcast —
    nothing collects to the driver). Scale shape identical to the
    fixed-discount form plus one 1-row aggregate and three type-count
    columns per context table.

    Output: (doc_id, n_grams, mean_mkn5_logprob).
    """
    docg = _kn5_docg(load_documents(spark, sf_dir).select("doc_id", "text"))
    c5 = docg.groupBy("g1", "g2", "g3", "g4", "g5").agg(
        F.sum("n").alias("c5")
    )
    return _mkn5_score(docg, c5)


def _mkn5_score(docg: DataFrame, c5: DataFrame) -> DataFrame:
    """Modified-KN sibling of :func:`_kn5_score`: score per-doc gram
    counts against a model given only its top-order count table —
    the continuation cascade, every context total, AND the per-level
    D1/D2/D3+ discounts (count-of-counts closed form) all derive from
    c5 by exact integer aggregates, so the SAME persisted c5 store
    serves both the fixed-discount and modified scorers."""
    G = ["g1", "g2", "g3", "g4", "g5"]
    kn4 = c5.groupBy("g2", "g3", "g4", "g5").agg(
        F.count(F.lit(1)).alias("c4")
    )
    kn3 = kn4.groupBy("g3", "g4", "g5").agg(F.count(F.lit(1)).alias("c3"))
    kn2 = kn3.groupBy("g4", "g5").agg(F.count(F.lit(1)).alias("c2"))
    kn1 = kn2.groupBy("g5").agg(F.count(F.lit(1)).alias("ckn1"))
    tot = kn1.agg(F.sum("ckn1").alias("tot1"))

    def ctx_of(tbl, keys, cname, lvl):
        return tbl.groupBy(*keys).agg(
            F.sum(cname).alias(f"ctx{lvl}"),
            F.sum((F.col(cname) == 1).cast("long")).alias(f"nd1_{lvl}"),
            F.sum((F.col(cname) == 2).cast("long")).alias(f"nd2_{lvl}"),
            F.sum((F.col(cname) >= 3).cast("long")).alias(f"nd3_{lvl}"),
        )

    ctx5 = ctx_of(c5, ["g1", "g2", "g3", "g4"], "c5", 5)
    ctx4 = ctx_of(kn4, ["g2", "g3", "g4"], "c4", 4)
    ctx3 = ctx_of(kn3, ["g3", "g4"], "c3", 3)
    ctx2 = ctx_of(kn2, ["g4"], "c2", 2)

    def discounts(tbl, cname, lvl):
        cc = tbl.agg(
            F.sum((F.col(cname) == 1).cast("long")).alias("n1"),
            F.sum((F.col(cname) == 2).cast("long")).alias("n2"),
            F.sum((F.col(cname) == 3).cast("long")).alias("n3"),
            F.sum((F.col(cname) == 4).cast("long")).alias("n4"),
        )
        n1 = F.col("n1").cast("double")
        n2 = F.col("n2").cast("double")
        n3 = F.col("n3").cast("double")
        n4 = F.col("n4").cast("double")
        y = n1 / (n1 + F.lit(2.0) * n2)
        d1 = F.when(
            (F.col("n1") > 0) & ((F.col("n1") + 2 * F.col("n2")) > 0),
            F.greatest(F.lit(1.0) - F.lit(2.0) * y * (n2 / n1), F.lit(0.0)),
        ).otherwise(F.lit(0.5))
        d2 = F.when(
            (F.col("n2") > 0) & (F.col("n1") > 0),
            F.greatest(F.lit(2.0) - F.lit(3.0) * y * (n3 / n2), F.lit(0.0)),
        ).otherwise(F.lit(1.0))
        d3 = F.when(
            (F.col("n3") > 0) & (F.col("n1") > 0),
            F.greatest(F.lit(3.0) - F.lit(4.0) * y * (n4 / n3), F.lit(0.0)),
        ).otherwise(F.lit(1.5))
        return cc.select(
            d1.alias(f"d1_{lvl}"), d2.alias(f"d2_{lvl}"), d3.alias(f"d3_{lvl}")
        )

    disc5 = discounts(c5, "c5", 5)
    disc4 = discounts(kn4, "c4", 4)
    disc3 = discounts(kn3, "c3", 3)
    disc2 = discounts(kn2, "c2", 2)

    def dsel(cname, lvl):
        return (
            F.when(F.col(cname) == 1, F.col(f"d1_{lvl}"))
            .when(F.col(cname) == 2, F.col(f"d2_{lvl}"))
            .otherwise(F.col(f"d3_{lvl}"))
        )

    def gamma(lvl):
        return (
            F.col(f"d1_{lvl}") * F.col(f"nd1_{lvl}")
            + F.col(f"d2_{lvl}") * F.col(f"nd2_{lvl}")
            + F.col(f"d3_{lvl}") * F.col(f"nd3_{lvl}")
        ) / F.col(f"ctx{lvl}").cast("double")

    p1 = F.col("ckn1").cast("double") / F.col("tot1").cast("double")
    p2 = (
        F.greatest(F.col("c2").cast("double") - dsel("c2", 2), F.lit(0.0))
        / F.col("ctx2").cast("double")
        + gamma(2) * p1
    )
    p3 = (
        F.greatest(F.col("c3").cast("double") - dsel("c3", 3), F.lit(0.0))
        / F.col("ctx3").cast("double")
        + gamma(3) * p2
    )
    p4 = (
        F.greatest(F.col("c4").cast("double") - dsel("c4", 4), F.lit(0.0))
        / F.col("ctx4").cast("double")
        + gamma(4) * p3
    )
    p5 = (
        F.greatest(F.col("c5").cast("double") - dsel("c5", 5), F.lit(0.0))
        / F.col("ctx5").cast("double")
        + gamma(5) * p4
    )
    logp = F.round(F.log(p5), 9).cast("decimal(20,9)")
    return (
        docg.join(c5, G)
        .join(ctx5, ["g1", "g2", "g3", "g4"])
        .join(kn4, ["g2", "g3", "g4", "g5"])
        .join(ctx4, ["g2", "g3", "g4"])
        .join(kn3, ["g3", "g4", "g5"])
        .join(ctx3, ["g3", "g4"])
        .join(kn2, ["g4", "g5"])
        .join(ctx2, ["g4"])
        .join(kn1, ["g5"])
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(disc5))
        .crossJoin(F.broadcast(disc4))
        .crossJoin(F.broadcast(disc3))
        .crossJoin(F.broadcast(disc2))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum(F.col("n").cast("decimal(12,0)") * logp).alias("s"),
        )
        .select(
            "doc_id",
            "n_grams",
            (
                F.round(F.col("s").cast("double") / F.col("n_grams"), 6)
                + F.lit(0.0)
            ).alias("mean_mkn5_logprob"),
        )
    )


_MKN5_CACHE: dict[tuple[str, str], DataFrame] = {}


def mkn5_scores_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped cache of the per-doc MODIFIED-KN scores — the
    kn5_scores_cached contract (pure function of the corpus files)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _MKN5_CACHE:
        _MKN5_CACHE[key] = kneser_ney5_modified_logprob(
            spark, sf_dir
        ).localCheckpoint(eager=True)
    return _MKN5_CACHE[key]


def perplexity_buckets_kn5(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = 3,
    scores: DataFrame | None = None,
) -> DataFrame:
    """:func:`perplexity_buckets` re-pointed at the production-order
    LM (VERDICT r8 #4): CCNet tiles documents per source by 5-GRAM
    Kneser-Ney score — the paper's actual configuration — instead of
    the raw bigram MLE. Same deterministic per-source ntile, ties on
    doc_id; head+middle admission flag.

    ``scores`` (round 11) supplies the per-doc score table from
    elsewhere — the persisted model store
    (``lm_store.kn5_store_score``) — instead of the session-cached
    corpus recompute; store-served scores are expression-identical,
    so the tiles (and the oracle) are unchanged.

    Output: (doc_id, source, mean_kn5_logprob, bucket, keep).
    """
    lp = (
        scores if scores is not None else kn5_scores_cached(spark, sf_dir)
    ).select("doc_id", "mean_kn5_logprob")
    d = load_documents(spark, sf_dir).select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.col("mean_kn5_logprob").desc(), F.col("doc_id").asc()
    )
    return (
        d.join(lp, "doc_id")
        .withColumn("bucket", F.ntile(n_buckets).over(w).cast("bigint"))
        .withColumn("keep", (F.col("bucket") < n_buckets).cast("boolean"))
        .select("doc_id", "source", "mean_kn5_logprob", "bucket", "keep")
    )


def perplexity_buckets(
    spark: SparkSession, sf_dir: str, n_buckets: int = 3
) -> DataFrame:
    """CCNet-style perplexity bucketing: rank documents by their own
    corpus's bigram LM score WITHIN each source and cut into
    ``n_buckets`` equal tiles (head = most fluent, tail = least);
    the keep flag implements the standard head+middle admission.

    Per-source tiling (CCNet tiles per language-model domain) stops a
    fluent source from crowding a noisy one out of the kept set — the
    mixing property a cross-corpus global cut destroys. One window
    over the per-doc score table (corpus-sized but 3 columns); the
    score itself reuses :func:`bigram_logprob`'s aggregation pipeline.
    Ties break on doc_id, so the tiling is deterministic on both
    engines. Docs with < 2 tokens have no bigram score and are absent
    (they carry no LM evidence either way).

    Output: (doc_id, source, mean_bigram_logprob, bucket, keep).
    """
    lp = bigram_scores_cached(spark, sf_dir).select(
        "doc_id", "mean_bigram_logprob"
    )
    d = load_documents(spark, sf_dir).select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.col("mean_bigram_logprob").desc(), F.col("doc_id").asc()
    )
    return (
        d.join(lp, "doc_id")
        .withColumn("bucket", F.ntile(n_buckets).over(w).cast("bigint"))
        .withColumn("keep", (F.col("bucket") < n_buckets).cast("boolean"))
        .select("doc_id", "source", "mean_bigram_logprob", "bucket", "keep")
    )


def source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the sources' unigram
    token distributions — the domain-similarity matrix a data-mixing
    policy (DoReMi-style domain weighting, dedup-across-sources
    decisions) starts from. JS is symmetric and bounded by ln 2, so
    the numbers are comparable across pairs.

    Shape: one groupBy builds (source, tok, p); the pair table is a
    token-keyed join of that narrow distribution against itself
    (sources × vocabulary, NOT documents), with a full-outer per pair
    so single-sided tokens contribute their ``0.5·p·ln 2`` mass.
    Float parity follows the logprob contract: per-term contribution
    rounded to 9 places, decimal-summed (order-invariant), one final
    ROUND(6).

    Output: (source_a, source_b, n_terms, js_divergence), a < b.
    """
    toks = load_documents(spark, sf_dir).select(
        "source", F.explode(TXT.tokens("text")).alias("tok")
    )
    cnt = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    tot = toks.groupBy("source").agg(F.count(F.lit(1)).alias("tot"))
    dist = cnt.join(F.broadcast(tot), "source").select(
        "source", "tok", (F.col("cnt").cast("double") / F.col("tot").cast("double")).alias("p")
    )
    # explicit pair dimension (broadcast-sized: sources², not docs),
    # then a full outer per (pair, token) so single-sided terms
    # surface with the other side's mass at 0 — a bare token-keyed
    # self-join would silently drop them
    srcs = tot.select("source")
    pairs_dim = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(srcs.select(F.col("source").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    left = (
        F.broadcast(pairs_dim)
        .join(dist, F.col("source") == F.col("source_a"))
        .select("source_a", "source_b", "tok", F.col("p").alias("pa"))
    )
    right = (
        F.broadcast(pairs_dim)
        .join(dist, F.col("source") == F.col("source_b"))
        .select("source_a", "source_b", "tok", F.col("p").alias("pb"))
    )
    pairs = left.join(right, ["source_a", "source_b", "tok"], "full")
    pa = F.coalesce("pa", F.lit(0.0))
    pb = F.coalesce("pb", F.lit(0.0))
    m = (pa + pb) / F.lit(2.0)
    contrib = F.lit(0.5) * (
        F.when(pa > 0.0, pa * F.log(pa / m)).otherwise(F.lit(0.0))
        + F.when(pb > 0.0, pb * F.log(pb / m)).otherwise(F.lit(0.0))
    )
    return (
        pairs.select(
            "source_a", "source_b",
            F.round(contrib, 9).cast("decimal(28,9)").alias("c"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            (F.round(F.sum("c").cast("double"), 6) + F.lit(0.0)).alias(
                "js_divergence"
            ),
        )
    )


_BIGRAM_SCORE_CACHE: dict = {}


def bigram_scores_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped cache of the :func:`bigram_logprob` score table
    (doc_id, n_bigrams, mean_bigram_logprob) — a pure function of the
    corpus files, like the scan cache in ``sources/store.py``. Both
    the raw score entry and :func:`perplexity_buckets` read it, so
    the corpus-sized tokenize+explode+aggregate pipeline runs ONCE
    per (session, corpus) instead of once per caller. Keyed on the
    Spark applicationId so a restarted session never sees a dead
    checkpoint."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BIGRAM_SCORE_CACHE:
        _BIGRAM_SCORE_CACHE[key] = bigram_logprob(
            spark, sf_dir, docpair=docpair_cached(spark, sf_dir)
        ).localCheckpoint(eager=True)
    return _BIGRAM_SCORE_CACHE[key]


#: Unicode scripts profiled by :func:`script_profile` — (column name,
#: Java regex script class, RE2/DuckDB script class). Both engines'
#: regex classes implement the same Unicode Script property, so the
#: per-script char counts are engine-portable (oracle-gated).
SCRIPT_CLASSES: tuple[tuple[str, str, str], ...] = (
    ("latin", "IsLatin", "Latin"),
    ("cyrillic", "IsCyrillic", "Cyrillic"),
    ("han", "IsHan", "Han"),
    ("arabic", "IsArabic", "Arabic"),
    ("greek", "IsGreek", "Greek"),
    ("devanagari", "IsDevanagari", "Devanagari"),
)


def script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Unicode-script character profile + dominant
    script — the multilingual-ingest triage that runs BEFORE any
    language model: mixed-script spam, mojibake, and wrong-feed
    routing all show up as script-count anomalies that byte- or
    token-level language ID (:func:`lang_id`) scores too late.

    Counts are pure codegen: one ``length(text) − length(strip the
    script's chars)`` pair per script class — no tokenization, no
    shuffle; the dominant script is a fixed-order argmax (count DESC,
    name ASC; 'other' when no profiled script occurs). One narrow
    projection at any corpus size.

    Output: (doc_id, latin, cyrillic, han, arabic, greek, devanagari,
    dominant_script), doc_id ASC.
    """
    d = load_documents(spark, sf_dir)
    counts = {
        name: (
            F.length("text")
            - F.length(F.regexp_replace("text", f"\\p{{{java}}}", ""))
        ).cast("bigint")
        for name, java, _ in SCRIPT_CLASSES
    }
    # argmax via lexicographic MAX over (count, reversed-name rank):
    # ranks descend in name order so equal counts pick the FIRST name
    n_scripts = len(SCRIPT_CLASSES)
    best = F.greatest(
        *[
            F.struct(
                counts[name].alias("c"),
                F.lit(n_scripts - i).alias("r"),
                F.lit(name).alias("s"),
            )
            for i, (name, _, _) in enumerate(SCRIPT_CLASSES)
        ]
    )
    dominant = F.when(best["c"] == 0, F.lit("other")).otherwise(best["s"])
    return d.select(
        "doc_id",
        *[counts[name].alias(name) for name, _, _ in SCRIPT_CLASSES],
        dominant.alias("dominant_script"),
    ).orderBy("doc_id")


def compression_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression ratio — the classic "repetition
    by proxy" quality gate (used alongside Gopher's explicit
    repetition rules): boilerplate, keyword stuffing and generated
    spam compress far below natural prose, and the signal is
    tokenizer-free, so it catches repetition patterns n-gram rules
    miss (long-period repeats, structural markup loops).

    Arrow-batched pandas UDF (zlib is per-row CPU; the batch transfer
    amortizes), one narrow projection — no shuffle at any corpus
    size. Rows-only gate entry (no SQL twin: DuckDB has no zlib);
    the ratio's monotone behavior is pytest-pinned instead.

    Output: (doc_id, n_bytes, n_zlib_bytes, compression_ratio), ratio
    = compressed/raw ROUND(6), doc_id ASC; empty text → ratio NULL.
    """
    import pandas as pd
    from pyspark.sql import types as T

    def _zlen_fn(texts):
        import zlib

        return texts.map(
            lambda t: None
            if t is None
            else len(zlib.compress(t.encode("utf-8"), 6))
        )

    # explicit returnType (no type hints): postponed annotations would
    # resolve against module globals, not this closure's locals
    _zlen = F.pandas_udf(_zlen_fn, T.LongType())

    d = load_documents(spark, sf_dir)
    n_bytes = F.length(F.encode("text", "utf-8")).cast("bigint")
    out = d.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        _zlen("text").alias("n_zlib_bytes"),
    )
    ratio = F.when(F.col("n_bytes") == 0, F.lit(None).cast("double")).otherwise(
        F.round(
            F.col("n_zlib_bytes").cast("double")
            / F.col("n_bytes").cast("double"),
            6,
        )
        + F.lit(0.0)
    )
    return out.withColumn("compression_ratio", ratio).orderBy("doc_id")


def zipf_fit(spark: SparkSession, sf_dir: str, top_n: int = 500) -> DataFrame:
    """Zipf's-law fit over the corpus token frequencies: least-squares
    slope/intercept of ln(freq) on ln(rank) for the top ``top_n``
    tokens — the classic corpus-health diagnostic (natural text slopes
    ≈ −1; generated/boilerplate corpora flatten or step).

    Float-parity contract: ranks and counts are exact integers
    (row_number over (count DESC, token ASC) — fully deterministic);
    each regression term is ROUND(·,9) and decimal-summed
    (order-invariant); the closed-form slope/intercept are single
    double expressions with a fixed association order, ROUND(6).

    Scale shape: the frequency table is one keyed count with map-side
    combine; the top-N cut is TakeOrderedAndProject (per-partition
    heaps, no global sort); only the N surviving rows see a window —
    a bounded single-partition stage by construction."""
    d = load_documents(spark, sf_dir)
    tf = (
        d.select(F.explode(TXT.tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = tf.orderBy(F.col("cnt").desc(), F.col("token")).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    ranked = top.withColumn("rnk", F.row_number().over(w))
    x = F.log(F.col("rnk").cast("double"))
    y = F.log(F.col("cnt").cast("double"))

    def dsum(expr):
        return F.sum(F.round(expr, 9).cast("decimal(28,9)")).cast("double")

    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fit"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
    )
    n = F.col("n_fit").cast("double")
    slope_raw = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        "n_fit",
        (F.round(slope_raw, 6) + F.lit(0.0)).alias("slope"),
        (
            F.round((F.col("sy") - slope_raw * F.col("sx")) / n, 6)
            + F.lit(0.0)
        ).alias("intercept"),
    )


def heaps_fit(spark: SparkSession, sf_dir: str, n_points: int = 10) -> DataFrame:
    """Heaps'-law fit: vocabulary size V as a power of corpus token
    mass N (V ≈ K·N^β, natural text β ≈ 0.4-0.6) — the companion
    diagnostic to :func:`zipf_fit` (a saturating vocabulary means
    template/boilerplate text; β near 1 means id-like noise tokens).

    Computed WITHOUT rescanning per prefix: the corpus is cut at
    ``n_points`` doc_id deciles; V at a cutoff is the number of
    tokens whose FIRST carrying doc (min doc_id — one keyed agg)
    precedes it, N is the prefix token mass (one keyed agg over the
    per-doc counts). Both are exact integers; the ln-ln regression
    reuses the zipf decimal contract. Output (n_points, beta, ln_k).

    Scale shape: two keyed aggregates over the scan + an n_points-row
    regression — no per-prefix passes."""
    d = load_documents(spark, sf_dir)
    max_id = d.agg(F.max("doc_id").alias("m")).head().m
    # integer floor division — the SQL twin's // must see identical cuts
    cutoffs = [
        ((i + 1) * (max_id + 1)) // n_points for i in range(n_points)
    ]
    tok = d.select("doc_id", F.explode(TXT.tokens("text")).alias("token")).filter(
        F.col("token") != ""
    )
    first = tok.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    per_doc = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    cuts = spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(cutoffs)], "pt int, cutoff bigint"
    )
    v = (
        cuts.join(first, F.col("first_doc") < F.col("cutoff"))
        .groupBy("pt", "cutoff")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    nmass = (
        cuts.join(per_doc, F.col("doc_id") < F.col("cutoff"))
        .groupBy("pt")
        .agg(F.sum("n_toks").alias("n_mass"))
    )
    pts = v.join(nmass, "pt").filter((F.col("v") > 0) & (F.col("n_mass") > 0))
    x = F.log(F.col("n_mass").cast("double"))
    y = F.log(F.col("v").cast("double"))

    def dsum(expr):
        return F.sum(F.round(expr, 9).cast("decimal(28,9)")).cast("double")

    agg = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
    )
    n = F.col("n_points").cast("double")
    beta_raw = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        "n_points",
        (F.round(beta_raw, 6) + F.lit(0.0)).alias("beta"),
        (
            F.round((F.col("sy") - beta_raw * F.col("sx")) / n, 6)
            + F.lit(0.0)
        ).alias("ln_k"),
    )


def rule_votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rule_id, vote): one row per labeling-function firing —
    the per-rule view behind :func:`weak_labels`' majority. Pure
    codegen (|rules| regexp tests inside one array projection, explode
    of fired votes only)."""
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    votes = F.array(
        *[
            F.struct(
                F.lit(i).alias("rule_id"),
                F.when(F.lower(F.col("text")).rlike(pat), F.lit(label))
                .otherwise(F.lit(None).cast("string"))
                .alias("vote"),
            )
            for i, (_, pat, label) in enumerate(WEAK_LABEL_RULES)
        ]
    )
    return (
        d.select("doc_id", F.explode(votes).alias("v"))
        .select("doc_id", F.col("v.rule_id").alias("rule_id"), F.col("v.vote").alias("vote"))
        .filter(F.col("vote").isNotNull())
    )


def label_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snorkel-style accuracy-weighted label model — the step between
    raw labeling functions and a trained classifier: each rule's
    accuracy is estimated from its agreement with the majority vote,
    rules are re-weighted by the log-odds of that accuracy, and every
    document is relabeled by the weighted vote.

    Numerics (engine parity): accuracies are Laplace-smoothed exact
    rationals ``(agree+1)/(cast+2)``; the only transcendental is ONE
    ``ln`` per RULE (|rules| evaluations total, ROUND(...,9) — the
    dsir λ-table precedent), and per-doc label scores fold those
    9-digit weights in DECIMAL(28,9). Argmax ties break label ASC via
    the min-struct idiom (``classify.py`` contract).

    Scale shape: votes are a scan-fused narrow map; the accuracy
    table is |rules| rows (broadcast); relabeling is one
    (doc, label)-keyed aggregation + one per-doc min-struct fold.

    Output: (doc_id, label, score, n_votes) for every doc with ≥ 1
    firing rule; ``label`` may disagree with the majority when
    high-accuracy rules are outvoted by low-accuracy ones.
    """
    votes = rule_votes(spark, sf_dir)
    majority = (
        weak_labels(spark, sf_dir)
        .filter(F.col("label").isNotNull())
        .select("doc_id", F.col("label").alias("mlabel"))
    )
    acc = (
        votes.join(majority, "doc_id")
        .groupBy("rule_id")
        .agg(
            F.count(F.lit(1)).alias("cast"),
            F.sum((F.col("vote") == F.col("mlabel")).cast("int")).alias("agree"),
        )
        .select(
            "rule_id",
            (
                (F.col("agree") + F.lit(1)).cast("double")
                / (F.col("cast") + F.lit(2)).cast("double")
            ).alias("acc"),
        )
        .select(
            "rule_id",
            F.round(F.log(F.col("acc") / (F.lit(1.0) - F.col("acc"))), 9).alias("w"),
        )
    )
    scored = (
        votes.join(F.broadcast(acc), "rule_id")
        .groupBy("doc_id", "vote")
        .agg(
            F.sum(F.col("w").cast("decimal(28,9)")).alias("s"),
            F.count(F.lit(1)).alias("nv"),
        )
        .select(
            "doc_id",
            F.col("vote").alias("label"),
            (F.round(F.col("s").cast("double"), 6) + F.lit(0.0)).alias("score"),
            "nv",
        )
    )
    return (
        scored.select(
            "doc_id",
            F.struct(
                (-F.col("score")).alias("neg_score"),
                F.col("label").alias("label"),
                F.col("score").alias("score"),
            ).alias("cand"),
            "nv",
        )
        .groupBy("doc_id")
        .agg(F.min("cand").alias("best"), F.sum("nv").cast("bigint").alias("n_votes"))
        .select(
            "doc_id",
            F.col("best.label").alias("label"),
            F.col("best.score").alias("score"),
            "n_votes",
        )
    )


# --------------------------------------------- named production filters

#: Rae et al. 2021 table A1 required-stopword list (English prose)
GOPHER_REQUIRED_STOPWORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

#: the synthetic corpus's own glue-word analogue of the list above —
#: its 8 highest-document-frequency tokens. With the paper's English
#: list the stopword rule is constant-false on this corpus (only
#: 'the'/'a' exist in the pool); with this list at min_stopwords=7 it
#: passes ~55% of docs at sf0.01 (measured) — the rule SHAPE binds
#: with real variance, which is what the enforced production config
#: needs (VERDICT r9 #7)
CORPUS_GLUE_STOPWORDS = (
    "the", "a", "join", "hash", "row", "scan", "table", "data",
)


def gopher_quality_report(
    spark: SparkSession,
    sf_dir: str,
    stopwords: tuple = GOPHER_REQUIRED_STOPWORDS,
    min_stopwords: int = 2,
) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021, table A1) as a
    per-doc report — the NAMED production filter beside the generic
    :func:`quality_filter`:

    - 50 ≤ word count ≤ 100,000
    - 3 ≤ mean word length ≤ 10
    - symbol-word ratio (``#`` or ``...`` tokens) ≤ 0.1
    - ≥ 80% of words contain at least one alphabetic character
    - at least ``min_stopwords`` distinct of the required-stopword
      list (paper default: 2 of {the, be, to, of, and, that, have,
      with})

    (The paper's bullet/ellipsis LINE rules are omitted: this corpus
    has no line structure — the C4 twin :func:`c4_line_filter` covers
    line-grain rules over the deterministic line augmentation.)

    Pure per-doc codegen — one projection, no shuffle, no UDF; ratios
    ROUND(6)+0.0 for the cross-engine contract. Honest corpus note:
    the synthetic token pool contains only 'the'/'a' from the paper's
    English list, so the DEFAULT req_stopwords rule is constant-false
    here — the oracle checks the COMPUTATION; the variance lives in
    the count/length columns. ``stopwords``/``min_stopwords`` exist
    so the rule can BIND on a corpus with a different function-word
    inventory (round 10, VERDICT r9 #7): the enforced production
    config passes the corpus's own glue-word list with a
    variance-calibrated K — the paper's rule SHAPE, the corpus's
    vocabulary.

    Output: (doc_id, n_words, mean_word_len, symbol_ratio,
    frac_alpha_words, n_req_stopwords, gopher_keep).
    """
    d = load_documents(spark, sf_dir).select("doc_id", "text")
    t = TXT.tokens("text")
    n = F.size(t)
    total_len = F.aggregate(
        t, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mwl = F.round(
        total_len.cast("double") / n.cast("double"), 6
    ) + F.lit(0.0)
    n_sym = F.size(
        F.filter(t, lambda w: (w == "#") | (w == "..."))
    )
    sym_ratio = F.round(
        n_sym.cast("double") / n.cast("double"), 6
    ) + F.lit(0.0)
    n_alpha = F.size(F.filter(t, lambda w: w.rlike("[a-z]")))
    frac_alpha = F.round(
        n_alpha.cast("double") / n.cast("double"), 6
    ) + F.lit(0.0)
    def _has(word):
        return F.exists(t, lambda w: w == F.lit(word)).cast("int")

    n_req = sum(_has(word) for word in stopwords)
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        mwl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        frac_alpha.alias("frac_alpha_words"),
        n_req.cast("bigint").alias("n_req_stopwords"),
        (
            (n >= 50) & (n <= 100000)
            & (mwl >= 3.0) & (mwl <= 10.0)
            & (sym_ratio <= 0.1)
            & (frac_alpha >= 0.8)
            & (n_req >= min_stopwords)
        ).alias("gopher_keep"),
    )


def attach_lines(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic line augmentation for the C4 rules (the
    ``attach_paragraphs`` pattern — the synthetic corpus is a flat
    word stream, so line-grain filters need constructed lines; both
    engines build the IDENTICAL string):

    - tokens grouped 8 per line;
    - terminal punctuation by ``(doc_id + line_idx) % 3``: 0 → '.',
      1 → '!', 2 → none (the C4-droppable case);
    - ``doc_id % 17 == 0`` appends a 'lorem ipsum …' line;
    - ``doc_id % 23 == 0`` appends a code line containing '{';
    - ``doc_id % 13 == 0`` appends a 'privacy policy' line.
    """
    t = TXT.tokens(text_col)
    n_lines = F.ceil(F.size(t) / F.lit(8)).cast("int")
    base = F.transform(
        F.sequence(F.lit(1), n_lines),
        lambda i: F.concat(
            F.concat_ws(" ", F.slice(t, (i - F.lit(1)) * 8 + 1, 8)),
            F.when((F.col("doc_id") + i) % 3 == 0, F.lit("."))
            .when((F.col("doc_id") + i) % 3 == 1, F.lit("!"))
            .otherwise(F.lit("")),
        ),
    )
    extras = F.array_compact(
        F.array(
            F.when(
                F.col("doc_id") % 17 == 0,
                F.lit("lorem ipsum dolor sit amet consectetur adipiscing elit."),
            ),
            F.when(
                F.col("doc_id") % 23 == 0,
                F.lit("function f() { return 0; }"),
            ),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.lit("all rights reserved read our privacy policy here."),
            ),
        )
    )
    return df.withColumn(
        "ltext", F.concat_ws("\n", F.concat(base, extras))
    )


def _line_hash_expr(l, hasher: str):
    """Per-line hash for the CCNet line-dedup family. ``md5``: hex
    string, byte-identical cross-engine (the oracle form).
    ``xxhash64``: JVM-native 8-byte bigint — the cheap production twin
    (the ``dedup._sig_element`` hasher-knob precedent): equality
    classes are what the algorithm consumes, so any collision-sparse
    hash yields the same removal set; rows-only, equality vs the md5
    form pinned in pytest, shuffle-byte delta measured in SCALING.md."""
    if hasher == "md5":
        return F.md5(l)
    if hasher == "xxhash64":
        return F.xxhash64(l)
    raise ValueError(f"unknown hasher {hasher!r}; use 'md5' or 'xxhash64'")


def _line_hash_type(hasher: str) -> str:
    return "array<string>" if hasher == "md5" else "array<bigint>"


def line_dedup(
    spark: SparkSession, sf_dir: str, min_occ: int = 2, hasher: str = "md5"
) -> DataFrame:
    """CCNet-style corpus-wide duplicated-LINE removal (Wenzek et al.
    2020 §3.1 — "deduplicating lines removes boilerplate": headers,
    footers, navigation, cookie banners dominate crawl bytes and
    repeat VERBATIM across pages). Over the deterministic line
    augmentation (:func:`attach_lines` — shared with the C4 rules):
    a line whose exact content occurs ≥ ``min_occ`` times in the
    CORPUS is boilerplate and every occurrence is dropped — no
    keep-first election, deliberately unlike :func:`dedup.paragraph_
    dedup` (which elects a canonical copy of content-bearing text):
    boilerplate has no canonical carrier, the signal IS the
    repetition. Complements :func:`c4_line_filter`, whose rules are
    purely per-doc — this is the line-grain op that needs the
    corpus-wide aggregate.

    Plan shape: the line TEXT never shuffles — the corpus-sized
    exchanges carry (doc_id, hash) line-hash rows (hash-keyed count
    with map-side combine), the hot set joins back hash-keyed, and
    each doc's removal set returns as one collect_set row joined on
    doc_id; reassembly is a per-doc array filter in codegen against
    the doc's own hot-hash array. The exploded hash stream is
    checkpointed ONCE (round 11 — it feeds BOTH the hot count and the
    per-doc hot-set join; without the barrier the explode ran per
    consumer): a hash-only stream, ~40 bytes/line on executor-local
    disk. The cleaned stream is digested (``kept_md5``) so the oracle
    verifies the reconstruction byte-for-byte. ``hasher`` picks the
    line-hash function (see :func:`_line_hash_expr` — xxhash64 ships
    8-byte bigints through the densest exchange instead of 32-char
    hex, the char-span-twin argument).

    Output: (doc_id, n_lines, n_dup_lines, kept_md5) for every doc
    (zero-removal docs included; ``n_dup_lines`` counts occurrences).
    """
    hfn = lambda l: _line_hash_expr(l, hasher)
    d = attach_lines(load_documents(spark, sf_dir)).select(
        "doc_id", F.split(F.col("ltext"), "\n").alias("lines")
    )
    hs = d.select(
        "doc_id",
        F.explode(F.transform("lines", hfn)).alias("h"),
    ).localCheckpoint(eager=True)
    hot = (
        hs.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= min_occ)
        .select("h")
    )
    return _line_dedup_assemble(d, hs, hot, hasher)


def _line_dedup_assemble(
    d: DataFrame, hs: DataFrame, hot: DataFrame, hasher: str
) -> DataFrame:
    """Shared reassembly for the recompute and store-served forms:
    per-doc hot-hash sets join back on doc_id; the kept-line filter
    and digest run in per-doc codegen — no text ever shuffles."""
    hfn = lambda l: _line_hash_expr(l, hasher)
    doc_hot = (
        hs.join(hot, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("hot_hs"))
    )
    joined = d.join(doc_hot, "doc_id", "left").withColumn(
        "hot_hs",
        F.coalesce("hot_hs", F.array().cast(_line_hash_type(hasher))),
    )
    kept = F.filter(
        F.col("lines"),
        lambda l: ~F.array_contains(F.col("hot_hs"), hfn(l)),
    )
    return joined.select(
        "doc_id",
        F.size("lines").cast("bigint").alias("n_lines"),
        (F.size("lines") - F.size(kept)).cast("bigint").alias("n_dup_lines"),
        F.md5(F.concat_ws("\n", kept)).alias("kept_md5"),
    )


def _line_hash_counts(docs_df: DataFrame, hasher: str) -> DataFrame:
    """(h, n_occ) line-hash occurrence counts over ``docs_df`` (raw
    documents; the deterministic line augmentation is applied here) —
    the mergeable statistic the hot-line store persists."""
    hfn = lambda l: _line_hash_expr(l, hasher)
    return (
        attach_lines(docs_df)
        .select(
            F.explode(
                F.transform(F.split(F.col("ltext"), "\n"), hfn)
            ).alias("h")
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )


def line_hash_store_build(
    spark: SparkSession, docs_df: DataFrame, path: str, hasher: str = "md5"
) -> dict:
    """Persist the corpus line-hash counts (VERDICT r10 #4 — the
    fingerprint-store pattern at LINE grain): one parquet of
    (h, n_occ) plus meta. Occurrence counts (not just the hot set)
    persist because hotness is threshold-at-read and counts must keep
    folding: a line that occurs once in each of two snapshots is hot
    only after BOTH have been ingested. Returns the row count."""
    import json as _json
    import os as _os

    counts = _line_hash_counts(docs_df, hasher)
    counts.write.mode("overwrite").parquet(_os.path.join(path, "counts"))
    with open(_os.path.join(path, "_line_meta.json"), "w") as f:
        _json.dump({"hasher": hasher}, f)
    return {
        "n_hashes": spark.read.parquet(_os.path.join(path, "counts")).count()
    }


def line_hash_store_upsert(
    spark: SparkSession, docs_df: DataFrame, path: str
) -> dict:
    """Fold a new snapshot's line-hash counts into the store — an
    associative exact count fold (the KN5-store/KMV argument), so
    build(existing) + upsert(delta) == build(union) byte-for-byte."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_line_meta.json")) as f:
        hasher = _json.load(f)["hasher"]
    delta = _line_hash_counts(docs_df, hasher)
    merged = (
        spark.read.parquet(_os.path.join(path, "counts"))
        .unionByName(delta)
        .groupBy("h")
        .agg(F.sum("n_occ").alias("n_occ"))
        .localCheckpoint(eager=True)
    )
    n = merged.count()
    merged.write.mode("overwrite").parquet(_os.path.join(path, "counts"))
    return {"n_hashes": n}


def line_dedup_from_store(
    spark: SparkSession,
    docs_df: DataFrame,
    path: str,
    min_occ: int = 2,
) -> DataFrame:
    """Screen a doc batch against the PERSISTED hot-line store — the
    incremental form of :func:`line_dedup`: hotness comes from the
    store's accumulated counts (threshold applied at read), so after
    upserting every snapshot the screen over the full corpus equals
    the batch recompute exactly (shared oracle). Per-call cost is the
    batch's own line pass + one hash-keyed join against the store
    scan; the corpus never re-hashes. Same output contract."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_line_meta.json")) as f:
        hasher = _json.load(f)["hasher"]
    hfn = lambda l: _line_hash_expr(l, hasher)
    hot = (
        spark.read.parquet(_os.path.join(path, "counts"))
        .filter(F.col("n_occ") >= min_occ)
        .select("h")
    )
    d = attach_lines(docs_df).select(
        "doc_id", F.split(F.col("ltext"), "\n").alias("lines")
    )
    hs = d.select(
        "doc_id", F.explode(F.transform("lines", hfn)).alias("h")
    )
    return _line_dedup_assemble(d, hs, hot, hasher)


def line_dedup_store(
    spark: SparkSession, sf_dir: str, min_occ: int = 2
) -> DataFrame:
    """Gate entry: the store-served line screen must equal
    :func:`line_dedup` exactly (same oracle SQL) — built
    INCREMENTALLY (existing split build + incoming split upsert, the
    ``incremental_dedup_store`` convention) into a deterministic temp
    dir, then the full corpus screens against it."""
    import hashlib as _hashlib
    import os as _os
    import tempfile as _tempfile

    from .sampling import _draw, _threshold_hex

    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    tag = _hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = _os.path.join(_tempfile.gettempdir(), f"svs_linestore_{tag}")
    if not _os.path.exists(_os.path.join(path, "_line_meta.json")):
        thr = _threshold_hex(0.9)
        line_hash_store_build(
            spark, docs.filter(_draw(F.col("doc_id")) < F.lit(thr)), path
        )
        line_hash_store_upsert(
            spark, docs.filter(_draw(F.col("doc_id")) >= F.lit(thr)), path
        )
    return line_dedup_from_store(spark, docs, path, min_occ=min_occ)


def c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) over the
    deterministic line augmentation: keep only lines with ≥ 5 words
    that end in terminal punctuation ('.', '!', '?', '"') and contain
    no policy phrase; flag pages containing 'lorem ipsum' or '{'
    (C4 drops those pages outright) and require ≥ 3 surviving lines.

    Line ops are one per-doc array pipeline in codegen (split →
    filter lambdas → concat) — no explode, no shuffle; the surviving
    text is digested (``kept_md5``) so the oracle verifies the
    RECONSTRUCTION byte-for-byte, the cleaned-stream pattern.

    Output: (doc_id, n_lines, n_kept, has_lorem_ipsum, has_brace,
    n_policy_lines, c4_keep, kept_md5).
    """
    d = attach_lines(load_documents(spark, sf_dir)).select(
        "doc_id", "ltext"
    )
    lines = F.split(F.col("ltext"), "\n")
    is_policy = lambda l: (
        l.contains("privacy policy")
        | l.contains("terms of use")
        | l.contains("cookie policy")
    )
    ends_term = lambda l: l.rlike('[.!?"]$')
    n_words = lambda l: F.size(F.split(l, " "))
    kept = F.filter(
        lines,
        lambda l: (n_words(l) >= 5) & ends_term(l) & ~is_policy(l),
    )
    has_lorem = F.col("ltext").contains("lorem ipsum")
    has_brace = F.col("ltext").contains("{")
    n_policy = F.size(F.filter(lines, is_policy))
    n_kept = F.size(kept)
    return d.select(
        "doc_id",
        F.size(lines).cast("bigint").alias("n_lines"),
        n_kept.cast("bigint").alias("n_kept"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        n_policy.cast("bigint").alias("n_policy_lines"),
        (
            ~has_lorem & ~has_brace & (n_kept >= 3)
        ).alias("c4_keep"),
        F.md5(F.concat_ws("\n", kept)).alias("kept_md5"),
    )
