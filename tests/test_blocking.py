"""Sorted-neighborhood blocking: the distributed rank decomposition
must equal a true global row_number, window semantics must hold
across bucket boundaries, and the multi-key pass must recover the
known SNM failure mode (a leading edit that breaks the sort key)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import blocking
from ydb_vector_search_simple_api_spark.sources.store import load_documents

from conftest import SF_SMALL


def test_snm_ranks_equal_global_row_number(spark):
    """The per-bucket window + offset decomposition is exactly the
    single-reducer row_number over (key, id) it replaces."""
    docs = load_documents(spark, SF_SMALL)
    got = {r.id: r.rank for r in blocking.snm_ranks(docs).collect()}
    ref_df = docs.select(
        F.col("doc_id").alias("id"),
        blocking._sort_key("text", 24).alias("key"),
    )
    w = Window.orderBy(F.col("key").asc(), F.col("id").asc())
    ref = {
        r.id: r.rank
        for r in ref_df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == ref


def test_planted_near_dups_found(spark):
    """The testdata's planted near-dup pairs share their leading
    content, so one SNM pass at window 8 finds them all — same pair
    set the LSH-blocked edit-distance verify finds."""
    from ydb_vector_search_simple_api_spark.operators import dedup

    docs = load_documents(spark, SF_SMALL)
    snm = {
        (r.id_a, r.id_b)
        for r in blocking.sorted_neighborhood_pairs(docs).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.neardup_edit_distance(docs).collect()
    }
    assert len(snm) >= 10
    assert snm == lsh


def test_window_semantics_cross_bucket(spark):
    """Pairs are exactly the rank gaps 1..window-1 — including across
    the bucket boundary the rank decomposition uses (keys 'aa…' and
    'ab…' land in different buckets but adjacent ranks)."""
    rows = [
        (1, "aazz hello world common tail"),
        (2, "abzz hello world common tail"),  # adjacent, other bucket
        (3, "zzzz hello world common tail"),  # far away in rank
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b)
        for r in blocking.sorted_neighborhood_pairs(
            df, window=2, max_rel_dist=0.5
        ).collect()
    }
    # window=2: only rank-adjacent pairs are candidates; (1,2) passes
    # the verify, (2,3) is adjacent too but differs more
    assert (1, 2) in got
    assert (1, 3) not in got  # rank gap 2 > window-1


def test_multi_key_recovers_leading_edit(spark):
    """A duplicate pair whose single edit is in the FIRST character
    sorts far apart (filler docs in between) and escapes pass 1; the
    reversed-key pass catches it."""
    tail = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, "a" + tail), (2, "z" + tail)]
    rows += [(10 + i, f"{chr(ord('b') + i)} filler document number {i} "
                      f"with its own unrelated content entirely")
             for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    one = {
        (r.id_a, r.id_b)
        for r in blocking.sorted_neighborhood_pairs(df, window=4).collect()
    }
    two = {
        (r.id_a, r.id_b)
        for r in blocking.sorted_neighborhood_multi_key(df, window=4).collect()
    }
    assert (1, 2) not in one  # the documented failure mode
    assert (1, 2) in two  # the second key recovers it
    assert one <= two  # pass 2 only ever adds pairs
