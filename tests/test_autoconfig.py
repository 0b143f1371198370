"""ANN auto-configuration (operators/autoconfig.py): the
recommendation logic is deterministic and codifies the measured
crossovers — replay-pinned here (VERDICT r8 #5)."""

from __future__ import annotations

import pytest

from conftest import SF_SMALL

from ydb_vector_search_simple_api_spark.operators import autoconfig


@pytest.fixture(scope="module")
def recs(spark):
    import __spark_entry__ as E

    rows = autoconfig.ann_autoconfig(
        spark, SF_SMALL, E._ivf_index(spark, SF_SMALL),
        E._kmt_index(spark, SF_SMALL), E._bq_index(spark, SF_SMALL),
    ).collect()
    return {r.target_recall: r for r in rows}


def test_one_row_per_target_sorted(recs):
    assert sorted(recs) == [0.8, 0.9, 0.95, 1.0]


def test_full_recall_at_gate_scale_is_exact_scan(recs):
    """Below the measured blocked-method crossover (n < 100k) a
    1.0-recall ask must be answered with the brute-force scan."""
    r = recs[1.0]
    assert r.layout == "brute_force_exact"
    assert r.measured_recall == 1.0
    assert r.width == 0 and r.n_clusters == 0


def test_partial_targets_pick_min_probe_fraction(recs, spark):
    """Each partial target's recommendation replays from the measured
    curves: per layout take the smallest knob clearing the target,
    then the layout with the smallest probe fraction wins (ties to
    ivf_flat); the reported measured_recall actually clears the
    target."""
    import __spark_entry__ as E

    ivf_idx = E._ivf_index(spark, SF_SMALL)
    tree_idx = E._kmt_index(spark, SF_SMALL)
    bq_idx = E._bq_index(spark, SF_SMALL)
    full = {
        "ivf_flat": ivf_idx.n_clusters,
        "kmeans_tree": max(tree_idx.n_l1, tree_idx.n_leaves),
        "bq_hamming": bq_idx.n_rows,
    }
    curves = autoconfig.ann_layout_curves(
        spark, SF_SMALL, ivf_idx, tree_idx, bq_idx
    ).collect()
    for t in (0.8, 0.9, 0.95):
        r = recs[t]
        assert r.measured_recall >= t
        per = {}
        for c in sorted(curves, key=lambda c: c.width):
            if c.recall >= t and c.layout not in per:
                per[c.layout] = (c.width, c.recall, c.width / full[c.layout])
        want = min(per, key=lambda lo: (per[lo][2], lo != "ivf_flat"))
        assert r.layout == want, t
        assert r.width == per[want][0]
        assert r.measured_recall == per[want][1]


def test_replay_deterministic(recs, spark):
    """Same corpus, same index, same thresholds -> identical rows."""
    import __spark_entry__ as E

    again = {
        r.target_recall: r
        for r in autoconfig.ann_autoconfig(
            spark, SF_SMALL, E._ivf_index(spark, SF_SMALL),
            E._kmt_index(spark, SF_SMALL), E._bq_index(spark, SF_SMALL),
        ).collect()
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


def test_layout_curves_monotone_and_exact_at_full(spark):
    """Both batch-served layouts: recall is non-decreasing in width
    and provably 1.0 at full width (== exact)."""
    import __spark_entry__ as E

    rows = autoconfig.ann_layout_curves(
        spark, SF_SMALL, E._ivf_index(spark, SF_SMALL),
        E._kmt_index(spark, SF_SMALL), E._bq_index(spark, SF_SMALL),
    ).collect()
    by_layout = {}
    for r in rows:
        by_layout.setdefault(r.layout, []).append((r.width, r.recall))
    assert set(by_layout) == {"ivf_flat", "kmeans_tree", "bq_hamming"}
    for layout, pts in by_layout.items():
        pts.sort()
        recalls = [rc for _, rc in pts]
        assert recalls == sorted(recalls), layout
        assert recalls[-1] == 1.0, layout
