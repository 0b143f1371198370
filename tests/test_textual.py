"""Corpus-statistical text operators (textual.py additions)."""

from __future__ import annotations

from conftest import SF_SMALL


def test_unigram_logprob_orders_by_rarity(spark):
    """A doc made of corpus-frequent tokens must outscore a doc with
    rarer tokens; every mean log-prob is negative."""
    from ydb_vector_search_simple_api_spark.operators.textual import unigram_logprob

    rows = unigram_logprob(spark, SF_SMALL).collect()
    assert all(r.mean_logprob < 0 for r in rows)
    by_score = sorted(rows, key=lambda r: r.mean_logprob)
    assert by_score[0].mean_logprob < by_score[-1].mean_logprob


def test_unigram_logprob_plan_broadcasts_freq_table(spark):
    """The vocabulary-sized frequency table and the single-row total
    must both broadcast; the token stream itself never shuffles for
    the join (its only exchanges key the two aggregations)."""
    from ydb_vector_search_simple_api_spark.operators.textual import unigram_logprob

    plan = (
        unigram_logprob(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan  # the single-row total
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan
