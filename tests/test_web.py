"""Domain-level curation (operators/web.py): cap semantics, the
lossless two-level ranking, and profile consistency."""

from __future__ import annotations

from conftest import SF_SMALL

from ydb_vector_search_simple_api_spark.operators import web

CAP, BUDGET = 8, 900


def test_domain_caps_semantics(spark):
    rows = web.domain_caps(
        spark, SF_SMALL, doc_cap=CAP, token_budget=BUDGET
    ).collect()
    by_dom: dict[str, list] = {}
    for r in rows:
        by_dom.setdefault(r.domain, []).append(r)
    assert by_dom, "no domains extracted"
    for dom, rs in by_dom.items():
        assert dom.endswith(".example.com")
        assert len(rs) <= CAP
        # dense 1..n ranks, monotone cumulative tokens
        assert [r.draw_rank for r in rs] == list(range(1, len(rs) + 1))
        cum = 0
        for r in rs:
            cum += r.n_tokens
            assert r.cum_tokens == cum
            assert r.kept == (cum <= BUDGET)
        # kept is a prefix in draw order (cum_tokens monotone because
        # token counts are non-negative)
        kept_flags = [r.kept for r in rs]
        assert kept_flags == sorted(kept_flags, reverse=True)


def test_domain_caps_two_level_prefilter_lossless(spark):
    """The salted local top-cap pre-filter must not change the result:
    n_salts=1 (pre-filter == global window) and the default fan-out
    agree row-for-row."""
    a = web.domain_caps(
        spark, SF_SMALL, doc_cap=CAP, token_budget=BUDGET, n_salts=1
    ).collect()
    b = web.domain_caps(
        spark, SF_SMALL, doc_cap=CAP, token_budget=BUDGET, n_salts=16
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_domain_profile_consistency(spark):
    prof = {
        r.domain: r
        for r in web.domain_profile(
            spark, SF_SMALL, doc_cap=CAP, token_budget=BUDGET
        ).collect()
    }
    led = web.domain_caps(
        spark, SF_SMALL, doc_cap=CAP, token_budget=BUDGET
    ).collect()
    admitted: dict[str, int] = {}
    kept_tokens: dict[str, int] = {}
    for r in led:
        admitted[r.domain] = admitted.get(r.domain, 0) + 1
        if r.kept:
            kept_tokens[r.domain] = kept_tokens.get(r.domain, 0) + r.n_tokens
    for dom, p in prof.items():
        assert p.n_admitted == min(CAP, p.n_docs) == admitted.get(dom, 0)
        assert p.kept_tokens == kept_tokens.get(dom, 0) <= BUDGET
        assert p.n_kept <= p.n_admitted
        assert p.total_tokens >= p.kept_tokens


def test_canonical_url_expr_cases(spark):
    """Canonicalization table-tests: tracking params, fragments,
    default port, trailing slash, case — path/query case preserved."""
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.operators.web import (
        canonical_url_expr,
    )

    cases = [
        ("HTTP://Ex1.Example.COM:80/p3/item?id=3", "http://ex1.example.com/p3/item?id=3"),
        ("http://a.com/x?utm_source=f&id=2", "http://a.com/x?id=2"),
        ("http://a.com/x?id=2&utm_campaign=z", "http://a.com/x?id=2"),
        ("http://a.com/x?utm_source=f&utm_medium=m", "http://a.com/x"),
        ("https://A.com/Path/#frag", "https://a.com/Path"),
        ("http://a.com/x?fbclid=abc", "http://a.com/x"),
        ("http://a.com/UPPER?Q=V", "http://a.com/UPPER?Q=V"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r.c for r in df.select(canonical_url_expr("url").alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_url_canonical_dedup_groups_planted_collisions(spark):
    """Docs sharing (id%7, id%50) collapse to one canonical URL;
    keep-first elects the lowest doc_id."""
    from ydb_vector_search_simple_api_spark.operators.web import (
        url_canonical_dedup,
    )
    from ydb_vector_search_simple_api_spark.sources.store import load_documents

    rows = url_canonical_dedup(spark, SF_SMALL).collect()
    n_docs = load_documents(spark, SF_SMALL).count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        # canonical: lowercase, no port, no tracking, no fragment
        assert r.canon_url == r.canon_url.lower()
        for bad in (":80", "utm_", "#", "HTTP"):
            assert bad not in r.canon_url
        # ids mapping to this canon all share id%350 with the winner
        assert r.first_doc == min(
            i for i in range(n_docs) if i % 350 == r.first_doc % 350
        )
