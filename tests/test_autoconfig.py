"""ANN auto-configuration (operators/autoconfig.py): the
recommendation logic is deterministic and codifies the measured
crossovers — replay-pinned here (VERDICT r8 #5; round 10 extends the
competition to all six serving shapes on estimated bytes touched,
VERDICT r9 #6)."""

from __future__ import annotations

import pytest

from conftest import SF_SMALL

from ydb_vector_search_simple_api_spark.operators import autoconfig

ALL_LAYOUTS = {
    "ivf_flat", "kmeans_tree", "bq_hamming",
    "pq_adc", "opq_adc", "sq8", "graph_beam",
}


def _indexes(spark):
    import __spark_entry__ as E

    return dict(
        idx=E._ivf_index(spark, SF_SMALL),
        tree_idx=E._kmt_index(spark, SF_SMALL),
        bq_idx=E._bq_index(spark, SF_SMALL),
        pq_idx=E._pq_index(spark, SF_SMALL),
        opq_idx=E._opq_index(spark, SF_SMALL),
        sq_idx=E._sq_index(spark, SF_SMALL),
        gann_idx=E._gann_index(spark, SF_SMALL),
    )


@pytest.fixture(scope="module")
def recs(spark):
    kw = _indexes(spark)
    rows = autoconfig.ann_autoconfig(spark, SF_SMALL, **kw).collect()
    return {r.target_recall: r for r in rows}


@pytest.fixture(scope="module")
def curves(spark):
    kw = _indexes(spark)
    return autoconfig.ann_layout_curves(
        spark, SF_SMALL, kw["idx"], kw["tree_idx"], kw["bq_idx"],
        pq_idx=kw["pq_idx"], opq_idx=kw["opq_idx"], sq_idx=kw["sq_idx"],
        gann_idx=kw["gann_idx"],
    ).collect()


def test_one_row_per_target_sorted(recs):
    assert sorted(recs) == [0.8, 0.9, 0.95, 1.0]


def test_full_recall_at_gate_scale_is_exact_scan(recs):
    """Below the measured blocked-method crossover (n < 100k) a
    1.0-recall ask must be answered with the brute-force scan."""
    r = recs[1.0]
    assert r.layout == "brute_force_exact"
    assert r.measured_recall == 1.0
    assert r.width == 0 and r.n_clusters == 0


def test_partial_targets_pick_min_est_bytes(recs, curves, spark):
    """Each partial target's recommendation replays from the measured
    curves: per layout take the smallest knob clearing the target,
    then the layout with the smallest estimated bytes touched per
    query wins (ties to ivf_flat); the reported measured_recall
    actually clears the target."""
    kw = _indexes(spark)
    n = kw["sq_idx"].n_rows
    d = kw["sq_idx"].dim
    full = {
        "ivf_flat": kw["idx"].n_clusters,
        "kmeans_tree": max(kw["tree_idx"].n_l1, kw["tree_idx"].n_leaves),
    }

    def est_bytes(layout, knob):
        if layout in full:
            return knob / full[layout] * n * 4 * d
        if layout == "graph_beam":
            return knob * (4 * d + 8 * kw["gann_idx"].m)
        bpv = {
            "bq_hamming": 8 * kw["bq_idx"].n_words,
            "pq_adc": kw["pq_idx"].m,
            "opq_adc": kw["opq_idx"].pq.m,
            "sq8": d,
        }[layout]
        return n * bpv + knob * 4 * d

    for t in (0.8, 0.9, 0.95):
        r = recs[t]
        assert r.measured_recall >= t
        per = {}
        for c in sorted(curves, key=lambda c: c.width):
            if c.recall >= t and c.layout not in per:
                per[c.layout] = (c.width, c.recall, est_bytes(c.layout, c.width))
        want = min(per, key=lambda lo: (per[lo][2], lo != "ivf_flat"))
        assert r.layout == want, t
        assert r.width == per[want][0]
        assert r.measured_recall == per[want][1]


def test_replay_deterministic(recs, spark):
    """Same corpus, same indexes, same thresholds -> identical rows."""
    kw = _indexes(spark)
    again = {
        r.target_recall: r
        for r in autoconfig.ann_autoconfig(spark, SF_SMALL, **kw).collect()
    }
    assert again.keys() == recs.keys()
    for t in recs:
        assert tuple(again[t]) == tuple(recs[t])


def test_pq_rule_fires_at_high_dim(spark, recs):
    """The d >= 256 branch recommends OPQ codes with a ~16x smaller
    per-vector footprint (rule check via the module thresholds — the
    gate corpus is d=32, so pin the rule arithmetic directly)."""
    assert autoconfig.PQ_DIM_CUTOFF == 256
    assert autoconfig.EXACT_CUTOFF == 100_000
    # the est_bytes_per_vec the OPQ branch would emit at d=1024
    assert max(8, 1024 // 16) == 64 < 4 * 1024


def test_layout_curves_monotone_and_exact_at_full(curves):
    """Every supplied layout: recall is non-decreasing in its knob
    and provably 1.0 at the exact endpoint."""
    by_layout = {}
    for r in curves:
        by_layout.setdefault(r.layout, []).append((r.width, r.recall))
    assert set(by_layout) == ALL_LAYOUTS
    for layout, pts in by_layout.items():
        pts.sort()
        recalls = [rc for _, rc in pts]
        assert recalls == sorted(recalls), layout
        assert recalls[-1] == 1.0, layout


def test_curves_memo_shares_one_measurement(curves, spark):
    """The session memo: a second identical call returns the SAME
    rows without re-serving (the kn5_scores_cached contract — corpus
    and indexes are immutable per key)."""
    kw = _indexes(spark)
    key_hits_before = len(autoconfig._CURVES_CACHE)
    again = autoconfig.ann_layout_curves(
        spark, SF_SMALL, kw["idx"], kw["tree_idx"], kw["bq_idx"],
        pq_idx=kw["pq_idx"], opq_idx=kw["opq_idx"], sq_idx=kw["sq_idx"],
        gann_idx=kw["gann_idx"],
    ).collect()
    assert len(autoconfig._CURVES_CACHE) == key_hits_before
    assert sorted(map(tuple, again)) == sorted(map(tuple, curves))
