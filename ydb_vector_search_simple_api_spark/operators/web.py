"""Host/domain-level curation — the first pass of web-corpus curation.

A crawled corpus is dominated by a handful of hosts; before any
content-level dedup runs, pipelines cap how much each domain may
contribute (docs and tokens) so no single host floods the training
mix (the C4/RefinedWeb "per-domain cap" step). These operators ride
on the same deterministic PII/URL augmentation the scrubber tests use
(``curation.attach_pii`` — each doc carries exactly one synthetic
``http://ex{id%7}.example.com/p{id}`` URL), so the domain extraction
exercises the real URL machinery and both engines build identical
inputs.

Admission is **deterministic**: docs are ranked within their domain by
``md5(doc_id)`` (the corpus-wide salted-draw convention used by
``sampling.stratified_sample``), so the kept set is a pure function of
the data — re-runs, retries, and the DuckDB oracle all agree.

Scale shapes (100 TB):

* Domain extraction is a narrow map (regexp over the scan).
* The per-domain ranking is the skew hazard — a web corpus has
  million-doc hosts. ``domain_caps`` therefore pre-filters with a
  **salted local top-cap** (rank within (domain, salt) buckets, keep
  ≤ cap per bucket) before the global per-domain window: the global
  top-cap by draw is a subset of the union of per-salt top-caps, so
  the pre-filter is lossless while bounding every window partition to
  ``n_salts × cap`` rows. The token-budget cumsum then runs over at
  most ``cap`` admitted rows per domain — broadcast-scale.
* ``domain_profile`` is one keyed count/sum aggregate with map-side
  combine — the cheapest possible shape.

Reference scope: the reference (vgvoleg/ydb-vector-search-simple-api,
app.py) has no curation surface; this is north-star extension scope
per SURVEY.md §2.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TXT
from ..sources.store import load_documents

#: host part of the first URL in the augmented text
_HOST_RE = r"https?://([^/ \t\r\n]+)"


def doc_domains(df: DataFrame) -> DataFrame:
    """(doc_id, domain, n_tokens): one row per doc with the host of
    its (augmented) URL and its whitespace token count. Narrow map —
    no shuffle."""
    from .curation import attach_pii

    d = attach_pii(df)
    return d.select(
        "doc_id",
        F.regexp_extract(F.col("pii_text"), _HOST_RE, 1).alias("domain"),
        TXT.token_count("text").cast("bigint").alias("n_tokens"),
    )


def domain_caps(
    spark: SparkSession,
    sf_dir: str,
    doc_cap: int = 40,
    token_budget: int = 4000,
    n_salts: int = 16,
) -> DataFrame:
    """Per-domain admission ledger: the first ``doc_cap`` docs of each
    domain in deterministic ``md5(doc_id)`` draw order, with the
    running token total and whether each survives the domain's token
    budget. Output (domain, doc_id, draw_rank, n_tokens, cum_tokens,
    kept), ordered.

    Two-level ranking (see module docstring): a salted local top-cap
    bounds every global window partition to ``n_salts × doc_cap``
    rows regardless of how hot the domain is — lossless, because the
    global top-``doc_cap`` by draw is contained in the union of the
    per-salt top-``doc_cap`` sets."""
    d = doc_domains(load_documents(spark, sf_dir)).withColumn(
        "draw", F.md5(F.col("doc_id").cast("string"))
    )
    # salted local pre-filter: bounds the per-domain window input
    salt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts))
    local = Window.partitionBy(F.col("domain"), salt).orderBy("draw", "doc_id")
    pre = d.withColumn("_lr", F.row_number().over(local)).filter(
        F.col("_lr") <= doc_cap
    )
    w = Window.partitionBy("domain").orderBy("draw", "doc_id")
    admitted = (
        pre.withColumn("draw_rank", F.row_number().over(w))
        .filter(F.col("draw_rank") <= doc_cap)
    )
    cum = Window.partitionBy("domain").orderBy("draw_rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        admitted.withColumn("cum_tokens", F.sum("n_tokens").over(cum))
        .select(
            "domain",
            "doc_id",
            F.col("draw_rank").cast("bigint").alias("draw_rank"),
            "n_tokens",
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
            (F.col("cum_tokens") <= token_budget).alias("kept"),
        )
        .orderBy("domain", "draw_rank")
    )


def domain_profile(
    spark: SparkSession,
    sf_dir: str,
    doc_cap: int = 40,
    token_budget: int = 4000,
) -> DataFrame:
    """Per-domain curation summary: corpus-wide doc/token totals next
    to what the caps admit. Output (domain, n_docs, total_tokens,
    n_admitted, n_kept, kept_tokens). The totals are one keyed
    aggregate over the scan; the cap columns fold the (bounded)
    admission ledger."""
    d = doc_domains(load_documents(spark, sf_dir))
    totals = d.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    ledger = domain_caps(
        spark, sf_dir, doc_cap=doc_cap, token_budget=token_budget
    )
    caps = ledger.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_admitted"),
        F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0)).alias(
            "kept_tokens"
        ),
    )
    return (
        totals.join(caps, "domain", "left")
        .select(
            "domain",
            "n_docs",
            "total_tokens",
            F.coalesce("n_admitted", F.lit(0)).alias("n_admitted"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
        )
        .orderBy("domain")
    )


# --------------------------------------------- URL canonicalization

#: ordered, engine-portable canonicalization passes (Java regex and
#: RE2 read these identically — no lookaround, explicit classes):
#: drop the fragment, drop tracking params (utm_*/fbclid) with their
#: separator, clean a dangling '?'/'&', drop a default :80 port,
#: drop one trailing slash on a non-root path.
_CANON_PASSES: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),
    (r"(utm_[a-z]+|fbclid)=[^&]*&", ""),
    (r"[?&](utm_[a-z]+|fbclid)=[^&]*$", ""),
    (r"\?$", ""),
    (r":80/", "/"),
    (r"/$", ""),
)


def canonical_url_expr(col) -> "F.Column":
    """Canonical form of a URL: lowercase scheme://host, strip
    fragment / tracking params / default port / trailing slash. One
    codegen expression chain (narrow map)."""
    u = F.col(col) if isinstance(col, str) else col
    # lowercase ONLY the scheme://host[:port] prefix; path and query
    # stay case-sensitive (RFC 3986 §6.2.2.1)
    prefix = F.regexp_extract(u, r"^([a-zA-Z]+://[^/]*)", 1)
    rest = F.substr(u, F.length(prefix) + F.lit(1))
    c = F.concat(F.lower(prefix), rest)
    for pat, repl in _CANON_PASSES:
        c = F.regexp_replace(c, pat, repl)
    return c


def attach_urls(df: DataFrame) -> DataFrame:
    """Deterministic messy-URL augmentation: mixed-case scheme/host,
    a default :80 port, a 50-bucket path (so distinct docs COLLIDE
    after canonicalization — the planted ground truth), a kept `id`
    param, tracking params on even docs, a fragment on every third,
    a trailing slash on every fifth. Both engines build the identical
    string."""
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return df.withColumn(
        "url",
        F.concat(
            F.lit("HTTP://Ex"), s(i % 7), F.lit(".Example.COM:80/p"),
            s(i % 50), F.lit("/item"),
            F.lit("?id="), s(i % 50),
            F.when(i % 2 == 0, F.lit("&utm_source=feed&utm_campaign=x"))
            .otherwise(F.lit("")),
            F.when(i % 5 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(i % 3 == 0, F.lit("#section-2")).otherwise(F.lit("")),
        ),
    )


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup after canonicalization — the crawl-frontier /
    re-crawl dedup step (tracking params, fragments, default ports
    and case noise must not count as distinct pages). Keep-first
    election per canonical URL (min doc_id — groupBy-min, no window).
    Output (canon_url, n_docs, first_doc), ordered.

    100 TB shape: canonicalization is a narrow codegen map; the
    election is one keyed aggregate with map-side combine on the
    canonical-URL hash. No window, no self-join."""
    d = attach_urls(load_documents(spark, sf_dir))
    return (
        d.select(
            canonical_url_expr("url").alias("canon_url"), F.col("doc_id")
        )
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("canon_url")
    )
