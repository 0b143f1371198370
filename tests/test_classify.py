"""Naive Bayes trained-filter step (operators/classify.py)."""

from __future__ import annotations

import math

from conftest import SF_SMALL


def test_nb_classify_covers_all_docs(spark):
    """Every document gets a row; evidence-bearing docs get a label
    from the weak-rule label set and a negative log score."""
    from ydb_vector_search_simple_api_spark.operators.classify import (
        nb_classify_docs,
    )
    from ydb_vector_search_simple_api_spark.operators.textual import (
        WEAK_LABEL_RULES,
    )

    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    rows = nb_classify_docs(spark, SF_SMALL).collect()
    assert len(rows) == n_docs
    label_set = {lab for _, _, lab in WEAK_LABEL_RULES}
    for r in rows:
        if r.n_evidence_tokens > 0:
            assert r.predicted_label in label_set
            assert r.score < 0
        else:
            assert r.predicted_label is None and r.score is None


def test_nb_classifier_generalizes_beyond_rules(spark):
    """The point of training: docs NO rule fired on still get labels
    (evidence tokens shared with the training slice), and the
    rule-covered slice largely agrees with its own rule labels."""
    from ydb_vector_search_simple_api_spark.operators.classify import (
        nb_classify_docs,
    )
    from ydb_vector_search_simple_api_spark.operators.textual import weak_labels

    preds = {r.doc_id: r for r in nb_classify_docs(spark, SF_SMALL).collect()}
    rules = {r.doc_id: r.label for r in weak_labels(spark, SF_SMALL).collect()}

    unlabeled = [d for d, lab in rules.items() if lab is None]
    labeled = [d for d, lab in rules.items() if lab is not None]
    assert labeled, "fixture must have rule coverage"
    # every unlabeled doc with any in-vocab token is classified
    classified_unlabeled = [
        d for d in unlabeled if preds[d].predicted_label is not None
    ]
    assert len(classified_unlabeled) >= max(1, len(unlabeled) // 2)
    agree = sum(
        1 for d in labeled if preds[d].predicted_label == rules[d]
    )
    assert agree / len(labeled) > 0.5


def test_nb_matches_local_replay(spark):
    """Exact replay of train + score in pure Python for a sample of
    docs: per-token ln rounded to 9, decimal-free float check within
    1e-5 of the engine's ROUND(6) score, same argmax."""
    from ydb_vector_search_simple_api_spark.operators.classify import (
        NB_ALPHA,
        nb_classify_docs,
    )
    from ydb_vector_search_simple_api_spark.operators.textual import weak_labels

    docs = {
        r.doc_id: r.text.strip().lower().split()
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .selectExpr("doc_id", "text")
        .collect()
    }
    rules = {r.doc_id: r.label for r in weak_labels(spark, SF_SMALL).collect()}

    # train
    from collections import Counter, defaultdict

    model = defaultdict(Counter)
    n_docs_l = Counter()
    for d, toks in docs.items():
        lab = rules[d]
        if lab is None:
            continue
        n_docs_l[lab] += 1
        model[lab].update(toks)
    vocab = {t for c in model.values() for t in c}
    v = float(len(vocab))
    n_train = float(sum(n_docs_l.values()))
    labels = sorted(model)

    def score(toks, lab):
        tf = Counter(t for t in toks if t in vocab)
        if not tf:
            return None
        total_l = float(sum(model[lab].values()))
        ln_z = round(math.log(total_l + NB_ALPHA * v), 9)
        ln_prior = round(math.log(n_docs_l[lab] / n_train), 9)
        s = sum(
            n * round(math.log(model[lab][t] + NB_ALPHA), 9)
            for t, n in tf.items()
        )
        return s - sum(tf.values()) * ln_z + ln_prior

    preds = {r.doc_id: r for r in nb_classify_docs(spark, SF_SMALL).collect()}
    sample = sorted(docs)[:40]
    for d in sample:
        scores = {lab: score(docs[d], lab) for lab in labels}
        if scores[labels[0]] is None:
            assert preds[d].predicted_label is None
            continue
        best = min(
            ((-s, lab) for lab, s in scores.items())
        )  # highest score, ties to smallest label
        assert preds[d].predicted_label == best[1], d
        assert abs(preds[d].score - (-best[0])) < 1e-5, d


def test_nb_plan_stays_jvm_side_and_broadcasts_consts(spark):
    """Scoring plan: no Python eval anywhere (pure expression NB),
    label-constant join broadcast; the argmax is an aggregation, not
    a window sort."""
    from ydb_vector_search_simple_api_spark.operators.classify import (
        _nb_classify_plan,
    )

    plan = (
        _nb_classify_plan(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_nb_label_report_cells(spark):
    """Report covers every (rule, predicted) combination present in
    the per-doc output and the doc counts reconcile."""
    from ydb_vector_search_simple_api_spark.operators.classify import (
        nb_classify_docs,
        nb_label_report,
    )
    from ydb_vector_search_simple_api_spark.operators.textual import weak_labels

    preds = {r.doc_id: r for r in nb_classify_docs(spark, SF_SMALL).collect()}
    rules = {r.doc_id: r.label for r in weak_labels(spark, SF_SMALL).collect()}
    report = nb_label_report(spark, SF_SMALL).collect()
    from collections import Counter

    want = Counter(
        (rules[d], preds[d].predicted_label) for d in preds
    )
    got = {(r.rule_label, r.predicted_label): r.n_docs for r in report}
    assert got == dict(want)
    assert sum(got.values()) == len(preds)


def test_logreg_store_scores_equal_recompute(spark, tmp_path):
    """Round 11: the persisted-weights path == the in-session trained
    path byte-for-byte (exact integer nano-unit weights reconstruct
    the identical double weight table)."""
    from ydb_vector_search_simple_api_spark.operators import logreg

    path = str(tmp_path / "logreg")
    stats = logreg.logreg_store_build(spark, SF_SMALL, path)
    assert stats["n_buckets"] > 0
    got = {
        r.doc_id: tuple(r)
        for r in logreg.logreg_store_score(spark, SF_SMALL, path).collect()
    }
    want = {
        r.doc_id: tuple(r)
        for r in logreg.logreg_score(spark, SF_SMALL).collect()
    }
    assert got == want and len(want) > 0
