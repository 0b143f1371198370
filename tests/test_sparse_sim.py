"""Weighted (TF-IDF) cosine similarity join: planted near-dups found,
the lossless prefix-indexed twin is output-identical to the exact
join at arbitrary thresholds, and the weighting does what it exists
for — boilerplate-dominated overlap scores LOW where raw Jaccard
scores high."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import dedup, sparse_sim
from ydb_vector_search_simple_api_spark.sources.store import load_documents

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_documents(spark, SF_SMALL)


def test_planted_near_dups_found(docs):
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in sparse_sim.tfidf_cosine_pairs(docs, n=3, threshold=0.6).collect()
    }
    assert len(got) >= 10
    assert all(c >= 0.6 for c in got.values())


def test_prefix_indexed_join_is_lossless(docs):
    """The AllPairs index cut (suffix L2 mass >= t) must be invisible
    in the output — pair for pair, score for score — across
    thresholds, including one whose double products sit near
    exact-integer boundaries (the ngram_jaccard_prefix hazard class)."""
    for t in (0.56, 0.75, 0.9):
        exact = sorted(
            tuple(r)
            for r in sparse_sim.tfidf_cosine_pairs(docs, n=3, threshold=t).collect()
        )
        pruned = sorted(
            tuple(r)
            for r in sparse_sim.tfidf_cosine_prefix_pairs(
                docs, n=3, threshold=t
            ).collect()
        )
        assert pruned == exact, f"threshold {t}"


def test_boilerplate_overlap_scores_low(spark):
    """Ten docs share a 24-token boilerplate header and differ only in
    a short unique tail: set-based Jaccard calls them all near-dups,
    but the tf-idf weighting crushes the high-df boilerplate shingles,
    so weighted cosine keeps them apart. Two extra boilerplate-free
    docs keep the header's df below N (idf > 0, features retained)."""
    header = " ".join(f"tok{i}" for i in range(24))
    rows = [(i, f"{header} tail{i}a tail{i}b tail{i}c") for i in range(10)]
    rows += [(100, "alpha beta gamma delta"), (101, "epsilon zeta eta theta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    jac = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.6).count()
    cos = sparse_sim.tfidf_cosine_pairs(df, n=3, threshold=0.6).count()
    assert jac >= 45  # all 10 boilerplate docs pairwise near-dup by sets
    assert cos == 0  # weighted cosine: the shared mass is low-idf

    # and the lossless twin agrees on this adversarial shape too: the
    # boilerplate pairs DO exist, at the tiny cosine the weighting
    # assigns them (~0.04 here), and the pruned join still finds all
    # of them at a bar below that
    ex = sorted(
        tuple(r)
        for r in sparse_sim.tfidf_cosine_pairs(df, n=3, threshold=0.03).collect()
    )
    pr = sorted(
        tuple(r)
        for r in sparse_sim.tfidf_cosine_prefix_pairs(df, n=3, threshold=0.03).collect()
    )
    assert ex == pr and len(ex) >= 45


def test_zero_idf_features_dropped(spark):
    """A feature present in every doc carries idf 0 and must not
    appear in the feature table (it cannot move a dot product, and it
    is the hottest join key)."""
    rows = [(i, "same same same same unique%d word%d" % (i, i)) for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    w = sparse_sim.tfidf_features(df, n=3)
    feats = [r.feat for r in w.collect()]
    assert "same same same" not in feats
    assert all(r.w > 0 for r in w.collect())


def test_prefix_index_is_selective_at_high_threshold(docs):
    """At the near-dup threshold the index must hold strictly less
    than the full feature table (the cut does real work), while at
    t -> 0 it degenerates to (almost) everything."""
    w = sparse_sim.tfidf_features(docs, n=3)
    n_all = w.count()
    # replicate the operator's index cut to observe its size
    from pyspark.sql import Window

    norms = sparse_sim._norms(w)
    u = w.join(norms, "id").withColumn(
        "usq", F.pow(F.col("w") / F.col("nrm"), 2)
    )
    order = Window.partitionBy("id").orderBy(
        F.col("dfreq").asc(), F.col("feat").asc()
    )
    before = F.sum("usq").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    total = F.sum("usq").over(Window.partitionBy("id"))
    sfx = total - F.coalesce(before, F.lit(0.0))
    n_idx = (
        u.withColumn("sfx", sfx)
        .filter(F.sqrt(F.col("sfx")) >= F.lit(0.9 - 1e-6 - 1e-9))
        .count()
    )
    assert 0 < n_idx < n_all


def test_related_docs_near_dup_partner_is_rank_one(spark, docs):
    """Every planted near-dup partner must appear in its mate's top-k
    related docs, in BOTH directions (a doc can have several planted
    partners, so top-1 alone is not guaranteed), and rk is dense
    1..k per doc."""
    pairs = sparse_sim.tfidf_cosine_pairs(docs, n=3, threshold=0.9).collect()
    rel = sparse_sim.tfidf_related_docs(docs, n=3, k=3)
    topk: dict[int, set[int]] = {}
    for r in rel.collect():
        topk.setdefault(r.doc_id, set()).add(r.neighbor_id)
    for p in pairs:
        assert p.id_b in topk[p.id_a]
        assert p.id_a in topk[p.id_b]
    per_doc = rel.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("c"), F.max("rk").alias("mx")
    )
    bad = per_doc.filter(F.col("c") != F.col("mx")).count()
    assert bad == 0  # dense ranks, no gaps
