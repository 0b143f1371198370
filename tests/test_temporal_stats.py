"""Temporal (gaps-and-islands, range join, LOCF) and distribution
stats (percentiles, HLL, set-op cohorts) — results sanity, sketch
accuracy vs the exact forms, and scale-shape plan assertions.

Extension scope: the reference has no aggregation/time-series surface
(SURVEY.md §2, app.py:212-227 is its only query); these are the
profiling and resampling primitives a pipeline needs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ydb_vector_search_simple_api_spark.operators import stats, temporal
from ydb_vector_search_simple_api_spark.plans import checks

from conftest import SF_SMALL

BUCKET_S = temporal.BUCKET_S


# ---------------------------------------------------------------- temporal


def test_surge_windows_are_disjoint_and_aligned(spark):
    rows = temporal.surge_windows(spark, SF_SMALL).collect()
    assert rows, "no surge windows found at sf0.001"
    spans = sorted((r.window_start, r.window_end) for r in rows)
    for start, end in spans:
        assert start < end
        assert int(start.timestamp()) % BUCKET_S == 0
        assert int((end - start).total_seconds()) % BUCKET_S == 0
    # maximal islands: consecutive windows never touch (a touching
    # pair would have been merged into one island)
    for (_, e1), (s2, _) in zip(spans, spans[1:]):
        assert e1 < s2
    for r in rows:
        dur = int((r.window_end - r.window_start).total_seconds())
        assert r.n_buckets == dur // BUCKET_S
        assert r.n_events >= r.n_buckets  # surge buckets are nonempty


def test_events_in_surges_matches_inequality_join(spark):
    """The bucketed broadcast equi-join must equal the naive
    point-in-interval inequality join it replaces."""
    fast = {
        (r.window_start, r.window_end): (r.n_events, r.total_value)
        for r in temporal.events_in_surges(spark, SF_SMALL).collect()
    }
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    ev = load_events(spark, SF_SMALL)
    sw = temporal.surge_windows(spark, SF_SMALL).select(
        "window_start", "window_end"
    )
    naive = (
        ev.join(
            sw,
            (ev.ts >= sw.window_start) & (ev.ts < sw.window_end),
        )
        .groupBy("window_start", "window_end")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert {(r.window_start, r.window_end): r.n_events for r in naive} == {
        k: v[0] for k, v in fast.items()
    }


def test_events_in_surges_broadcasts_intervals(spark):
    df = temporal.events_in_surges(spark, SF_SMALL)
    plan = checks.simple_plan(df)
    # the fact-side join must be an equi-join on the bucket key with
    # the exploded intervals broadcast — never a nested loop over
    # (event, interval) pairs
    assert "BroadcastHashJoin [bucket" in plan, plan
    # the only NLJ allowed is the 1-row scalar `totals` cross-join
    # (builds on bucket rows, not facts); the threshold filter rides it
    nlj = [
        line
        for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line
    ]
    assert all("n_buckets" in line or "total" in line for line in nlj), plan


def test_hourly_locf_grid_complete_and_carried(spark):
    rows = temporal.hourly_locf(spark, SF_SMALL).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    # full calendar grid: every type spans the same hour range
    spans = {
        (min(v, key=lambda r: r.hour).hour, max(v, key=lambda r: r.hour).hour)
        for v in by_type.values()
    }
    assert len(spans) == 1
    h0, h1 = spans.pop()
    n_hours = int((h1 - h0).total_seconds()) // 3600 + 1
    for t, v in by_type.items():
        assert len(v) == n_hours, t
        v.sort(key=lambda r: r.hour)
        # LOCF: once a value appears it never goes null again
        seen = False
        for r in v:
            assert r.n_events >= 0
            if r.n_events > 0:
                seen = True
                assert r.avg_value_locf is not None
            elif seen:
                assert r.avg_value_locf is not None


# ------------------------------------------------------------------ stats


def test_percentiles_ordered_and_bounded(spark):
    rows = stats.value_percentiles(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.p50 <= r.p90 <= r.p99
        assert r.n > 0


def test_approx_percentiles_close_to_exact(spark):
    """approx_percentile guarantees a RANK error bound, not a value
    bound — on a heavy tail a tiny rank slip moves the value a lot.
    So the check is a rank band: the estimate must fall between the
    exact percentiles at p±eps."""
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    eps = 0.02
    band_pcts = []
    for p in stats.PCTS:
        band_pcts += [max(0.0, p - eps), min(1.0, p + eps)]
    ev = load_events(spark, SF_SMALL)
    bands = {
        r.event_type: r.band
        for r in ev.groupBy("event_type")
        .agg(F.percentile("value", F.lit(band_pcts)).alias("band"))
        .collect()
    }
    approx = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in stats.approx_value_percentiles(spark, SF_SMALL).collect()
    }
    assert bands.keys() == approx.keys()
    for t, vals in approx.items():
        for i, a in enumerate(vals):
            lo, hi = bands[t][2 * i], bands[t][2 * i + 1]
            assert lo - 1e-6 <= a <= hi + 1e-6, (t, stats.PCTS[i], lo, a, hi)


def test_hll_distinct_within_rsd(spark):
    rows = stats.approx_distinct_users(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_users_exact > 0
        # rsd=0.01 → generous 5% envelope for small groups
        assert r.rel_err <= 0.05, (r.event_type, r.rel_err)


def test_retention_cohorts_partition_users(spark):
    rows = stats.retention_cohorts(spark, SF_SMALL).collect()
    seen = {}
    for r in rows:
        # retained/churned partition week-1 users; new is disjoint
        key = (r.user_id, r.cohort in ("retained", "churned"))
        assert (r.user_id, r.cohort) not in seen
        seen[(r.user_id, r.cohort)] = True
    cohorts = {r.cohort for r in rows}
    assert cohorts <= {"retained", "churned", "new"}
    retained = {r.user_id for r in rows if r.cohort == "retained"}
    churned = {r.user_id for r in rows if r.cohort == "churned"}
    new = {r.user_id for r in rows if r.cohort == "new"}
    assert not (retained & churned)
    assert not (retained & new) and not (churned & new)


def test_props_k_stats_matches_manual_parse(spark):
    from ydb_vector_search_simple_api_spark.operators.stats import props_k_stats
    import json

    got = {r.event_type: (r.n_events, r.sum_k, r.min_k, r.max_k)
           for r in props_k_stats(spark, SF_SMALL).collect()}
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    rows = load_events(spark, SF_SMALL).select("event_type", "props").collect()
    want = {}
    for r in rows:
        k = json.loads(r.props)["k"]
        n, s, lo, hi = want.get(r.event_type, (0, 0, k, k))
        want[r.event_type] = (n + 1, s + k, min(lo, k), max(hi, k))
    assert got == want


def test_cms_upper_bound_and_depth_improves(spark):
    from ydb_vector_search_simple_api_spark.operators import stats as st

    # tight width forces collisions (31-token vocabulary)
    d2 = {r.tok: r for r in st.token_cms_accuracy(spark, SF_SMALL, width=16, depth=2).collect()}
    d4 = {r.tok: r for r in st.token_cms_accuracy(spark, SF_SMALL, width=16, depth=4).collect()}
    assert len(d2) == len(d4) > 0
    # CMS never undercounts
    assert all(r.est_cnt >= r.true_cnt for r in d2.values())
    assert all(r.est_cnt >= r.true_cnt for r in d4.values())
    # more hash rows -> estimates can only tighten (min over a superset)
    for tok in d2:
        assert d4[tok].est_cnt <= d2[tok].est_cnt
    # with collisions present, depth actually helps on this corpus
    assert sum(r.overcount for r in d4.values()) < sum(r.overcount for r in d2.values())
    # wide sketch: no collisions at this vocabulary -> exact
    wide = st.token_cms_accuracy(spark, SF_SMALL, width=1024, depth=4).collect()
    assert all(r.overcount == 0 for r in wide)


def test_cms_build_is_cells_sized_and_mergeable(spark):
    from pyspark.sql import functions as F

    from ydb_vector_search_simple_api_spark.operators import stats as st

    toks = spark.createDataFrame(
        [(w,) for w in "a b a c a b".split()], "tok string"
    )
    sk = st.cms_build(toks, "tok", width=8, depth=3)
    assert sk.count() <= 8 * 3
    # cell-wise merge of two half-sketches == sketch of the union
    part1 = spark.createDataFrame([(w,) for w in "a b a".split()], "tok string")
    part2 = spark.createDataFrame([(w,) for w in "c a b".split()], "tok string")
    h1 = st.cms_build(part1, "tok", width=8, depth=3)
    h2 = st.cms_build(part2, "tok", width=8, depth=3)
    merged = (
        h1.unionByName(h2).groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))
    )
    a = {(r.d, r.w): r.cnt for r in sk.collect()}
    b = {(r.d, r.w): r.cnt for r in merged.collect()}
    assert a == b


def test_bucket_anomalies_contract(spark):
    from ydb_vector_search_simple_api_spark.operators import temporal as tp

    out = tp.bucket_anomalies(spark, SF_SMALL).collect()
    assert out
    for r in out:
        if r.z6 is not None:
            assert r.is_anomaly == (1 if abs(r.z6) > 3.0 else 0)
    # determinism (exact-integer window sums -> identical reruns)
    again = tp.bucket_anomalies(spark, SF_SMALL).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_funnel_conversion_ordering_constraint(spark):
    from ydb_vector_search_simple_api_spark.operators import temporal as tp

    out = {r.step: r for r in tp.funnel_conversion(spark, SF_SMALL).collect()}
    assert list(out) == list(tp.FUNNEL_STEPS)
    # monotone: each step's user count can only shrink
    counts = [out[s].n_users for s in tp.FUNNEL_STEPS]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert out["signup"].conversion == 1.0


def test_event_transitions_probabilities(spark):
    from ydb_vector_search_simple_api_spark.operators import temporal as T

    rows = T.event_transitions(spark, SF_SMALL).collect()
    assert rows
    by_cur = {}
    for r in rows:
        by_cur.setdefault(r.cur_type, []).append(r)
    for cur, rs in by_cur.items():
        # conditional distribution sums to 1 up to per-pair rounding
        assert abs(sum(x.p for x in rs) - 1.0) < 1e-5 * len(rs) + 1e-9
        tot = sum(x.n_trans for x in rs)
        for x in rs:
            assert abs(x.p - round(x.n_trans / tot, 6)) < 1e-12


def test_event_transitions_count_conservation(spark):
    from ydb_vector_search_simple_api_spark.operators import temporal as T
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    rows = T.event_transitions(spark, SF_SMALL).collect()
    ev = load_events(spark, SF_SMALL)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user with k events contributes k-1 transitions
    assert sum(r.n_trans for r in rows) == n_events - n_users


def test_user_trailing_features_replay(spark):
    from ydb_vector_search_simple_api_spark.operators import temporal as T
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    rows = T.user_trailing_features(spark, SF_SMALL).collect()
    ev = load_events(spark, SF_SMALL).select("event_id", "user_id", "ts", "value").collect()
    by_user = {}
    for e in ev:
        by_user.setdefault(e.user_id, []).append(e)
    # replay a few users in Python
    import decimal
    checked = 0
    got = {r.event_id: r for r in rows}
    for uid, evs in list(by_user.items())[:5]:
        evs.sort(key=lambda e: e.ts)
        for e in evs:
            sec = e.ts.timestamp()
            n1 = sum(1 for x in evs if sec - 3600 <= x.ts.timestamp() <= sec)
            v24 = sum(
                (decimal.Decimal(repr(x.value)).quantize(decimal.Decimal("0.000001"))
                 for x in evs if sec - 86400 <= x.ts.timestamp() <= sec),
                decimal.Decimal(0),
            )
            r = got[e.event_id]
            assert r.n_1h == n1
            assert abs(r.v_24h - float(round(v24, 6))) < 1e-6
            checked += 1
    assert checked > 10


def test_table_profile_shapes(spark):
    from ydb_vector_search_simple_api_spark.operators import stats as S
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    rows = {r.column: r for r in S.table_profile(spark, SF_SMALL).collect()}
    assert set(rows) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    ev = load_events(spark, SF_SMALL)
    n = ev.count()
    assert rows["event_id"].n_distinct == n  # event_id is a key
    assert rows["event_id"].n_nulls == 0
    assert rows["event_type"].min_str is not None and rows["event_type"].min_num is None
    assert rows["value"].min_num is not None and rows["value"].min_str is None


def test_type_value_trends_replay(spark):
    """Replay the closed-form regression in numpy for one type."""
    import numpy as np
    from ydb_vector_search_simple_api_spark.operators import stats as S
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    rows = {r.event_type: r for r in S.type_value_trends(spark, SF_SMALL).collect()}
    ev = load_events(spark, SF_SMALL).select("event_type", "ts", "value").collect()
    t0 = min(e.ts for e in ev)
    import math
    for etype in list(rows)[:2]:
        xs, ys = [], []
        for e in ev:
            if e.event_type != etype:
                continue
            xs.append(int((math.floor(e.ts.timestamp()) - math.floor(t0.timestamp())) // 600))
            ys.append(round(e.value * 1e6))
        x = np.array(xs, dtype=object); y = np.array(ys, dtype=object)
        n = len(xs)
        cov = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        varx = n * int((x * x).sum()) - int(x.sum()) ** 2
        slope = float(cov) / float(varx)
        r = rows[etype]
        assert r.n == n
        assert abs(r.slope - round(slope, 6)) < 1e-9


def test_session_paths_well_formed(spark):
    from ydb_vector_search_simple_api_spark.operators import temporal as T
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    rows = T.session_paths(spark, SF_SMALL, top_n=20).collect()
    assert rows
    types = {
        r.event_type
        for r in load_events(spark, SF_SMALL).select("event_type").distinct().collect()
    }
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)
    for r in rows:
        parts = r.path.split(">")
        assert len(parts) == 3
        assert all(p in types for p in parts)
    # trigram conservation: total trigrams == sum over sessions of
    # max(len-2, 0); spot-check > 0
    assert sum(ns) > 0


def test_type_correlations_replay(spark):
    import numpy as np
    from collections import defaultdict
    from ydb_vector_search_simple_api_spark.operators import stats as S
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    rows = {(r.type_a, r.type_b): r.r for r in S.type_correlations(spark, SF_SMALL).collect()}
    assert rows
    ev = load_events(spark, SF_SMALL).select("event_type", "ts").collect()
    import datetime
    series = defaultdict(lambda: defaultdict(int))
    hours = set()
    for e in ev:
        h = e.ts.replace(minute=0, second=0, microsecond=0)
        series[e.event_type][h] += 1
        hours.add(h)
    h0, h1 = min(hours), max(hours)
    grid = []
    h = h0
    while h <= h1:
        grid.append(h)
        h += datetime.timedelta(hours=1)
    types = sorted(series)
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            x = np.array([series[ta].get(h, 0) for h in grid], dtype=float)
            y = np.array([series[tb].get(h, 0) for h in grid], dtype=float)
            r = float(np.corrcoef(x, y)[0, 1])
            assert abs(rows[(ta, tb)] - round(r, 6)) < 1e-5, (ta, tb)


def test_histogram_quantiles_rank_accuracy(spark):
    """Rank-space accuracy: the number of values <= the histogram
    estimate must bracket p*n within one order statistic plus the
    bucket discretization (value-space tolerance is meaningless in a
    sparse tail, where adjacent order stats can be far apart)."""
    from ydb_vector_search_simple_api_spark.operators import stats as S
    from ydb_vector_search_simple_api_spark.sources.store import load_events
    import math

    got = {r.event_type: r for r in S.histogram_quantiles(spark, SF_SMALL).collect()}
    ev = load_events(spark, SF_SMALL).select("event_type", "value").collect()
    by_type = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append(e.value)
    lo = min(v for vs in by_type.values() for v in vs)
    hi = max(v for vs in by_type.values() for v in vs)
    width = (hi - lo) / 1000.0
    for t, r in got.items():
        vals = sorted(by_type[t])
        n = len(vals)
        assert r.p50 <= r.p90 <= r.p99
        for p, est in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            # est is the LOWER edge of the target bucket: every value
            # strictly below it ranks below the target order stat; the
            # target value itself lies within [est, est + width]
            n_below = sum(1 for v in vals if v < est)
            target = math.ceil(p * n)
            assert n_below <= target, (t, p, n_below, target)
            n_at_or_below_upper = sum(1 for v in vals if v <= est + width + 1e-9)
            assert n_at_or_below_upper >= target, (t, p)


def test_session_labels_no_leakage_and_horizon(spark):
    """Label=1 sessions must have a purchase strictly AFTER their last
    event and within 24h; label=0 sessions must have none."""
    import datetime
    from collections import defaultdict
    from ydb_vector_search_simple_api_spark.operators import temporal as T
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    rows = T.session_labels(spark, SF_SMALL).collect()
    assert rows and any(r.label == 1 for r in rows) and any(r.label == 0 for r in rows)
    purch = defaultdict(list)
    for e in load_events(spark, SF_SMALL).filter("event_type = 'purchase'").collect():
        purch[e.user_id].append(e.ts)
    H = datetime.timedelta(hours=24)
    for r in rows:
        hits = [
            t for t in purch.get(r.user_id, [])
            if r.session_end_last < t <= r.session_end_last + H
        ]
        assert (len(hits) > 0) == (r.label == 1), r


def test_ab_test_report_replay(spark):
    """Replay one event type's Welch t in numpy."""
    import numpy as np
    from ydb_vector_search_simple_api_spark.operators import stats as S
    from ydb_vector_search_simple_api_spark.operators.sampling import (
        PREFIX_HEX,
        _threshold_hex,
    )
    from ydb_vector_search_simple_api_spark.sources.store import load_events
    import hashlib

    rows = {r.event_type: r for r in S.ab_test_report(spark, SF_SMALL).collect()}
    ev = load_events(spark, SF_SMALL).select("event_type", "user_id", "value").collect()
    thr = _threshold_hex(0.5)
    etype = next(iter(rows))
    arms = {"c": [], "t": []}
    for e in ev:
        if e.event_type != etype:
            continue
        d = hashlib.md5(str(e.user_id).encode()).hexdigest()[:PREFIX_HEX]
        arms["c" if d < thr else "t"].append(round(e.value * 1e6))
    c = np.array(arms["c"], dtype=np.float64) / 1e6
    t = np.array(arms["t"], dtype=np.float64) / 1e6
    r = rows[etype]
    assert r.n_c == len(c) and r.n_t == len(t)
    assert abs(r.mean_c - round(c.mean(), 6)) < 1e-6
    diff = t.mean() - c.mean()
    se = (c.var(ddof=1) / len(c) + t.var(ddof=1) / len(t)) ** 0.5
    assert abs(r.t_stat - diff / se) < 1e-3


def test_ab_test_cuped_reduces_variance(spark):
    from ydb_vector_search_simple_api_spark.operators import stats as S

    r = S.ab_test_cuped(spark, SF_SMALL).collect()[0]
    assert r.n_users > 0
    # CUPED cannot increase variance when theta is the OLS slope
    assert 0.0 < r.var_ratio <= 1.0 + 1e-6
    # adjusted and plain estimates agree in order of magnitude
    assert abs(r.diff_cuped - r.diff_plain) < 10.0


def test_dau_wau_bounds(spark):
    from ydb_vector_search_simple_api_spark.operators import stats as S

    rows = S.dau_wau(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 < r.dau <= r.wau
        assert 0.0 < r.stickiness <= 1.0


def test_null_rate_drift_shape(spark):
    from ydb_vector_search_simple_api_spark.operators import stats as S

    rows = {r.column: r for r in S.null_rate_drift(spark, SF_SMALL).collect()}
    assert set(rows) == {"props_k", "value", "event_type", "user_id"}
    for r in rows.values():
        assert 0.0 <= r.rate_first <= 1.0 and 0.0 <= r.rate_second <= 1.0
        assert abs(r.drift - round(r.rate_second - r.rate_first, 6)) < 1e-4


def test_hour_of_day_profile_covers_all_events(spark):
    from ydb_vector_search_simple_api_spark.operators import stats as S
    from ydb_vector_search_simple_api_spark.sources.store import load_events

    rows = S.hour_of_day_profile(spark, SF_SMALL).collect()
    assert sum(r.n_events for r in rows) == load_events(spark, SF_SMALL).count()
    assert all(0 <= r.hod <= 23 for r in rows)


def test_psi_drift_detects_planted_shift(spark, tmp_path):
    """PSI ~ 0 on a stationary stream; large when the second half's
    value distribution shifts — and the categorical PSI stays flat
    when only the numeric marginal moves."""
    import datetime as dt

    from ydb_vector_search_simple_api_spark.operators.stats import psi_drift

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(2000):
        ts = t0 + dt.timedelta(minutes=i)
        # stationary categorical; numeric shifts +10 in the 2nd half
        shift = 10.0 if i >= 1000 else 0.0
        rows.append(
            (i, ts, i % 50, ["click", "view"][i % 2], (i % 7) + shift, "{}")
        )
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r.feature: r.psi for r in psi_drift(spark, str(tmp_path)).collect()}
    assert got["event_type"] < 0.01
    assert got["value_hist"] > 1.0


def test_psi_drift_constant_value_column(spark, tmp_path):
    """Regression: a constant value column (vmax == vmin) must not
    divide by a zero bin width — both twins short-circuit to a single
    bin-0 cell via greatest(range, eps). PSI is finite and 0.0 for the
    degenerate histogram; the DuckDB twin agrees hash-exactly."""
    import datetime as dt

    import duckdb

    from ydb_vector_search_simple_api_spark.operators.stats import psi_drift
    from ydb_vector_search_simple_api_spark.oracles_temporal import psi_drift_sql

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), i % 50, ["click", "view"][i % 2],
         7.5, "{}")
        for i in range(400)
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = sorted(tuple(r) for r in psi_drift(spark, str(tmp_path)).collect())
    vh = dict((r[0], r) for r in got)["value_hist"]
    assert vh[1] == 1 and vh[2] == 0.0  # one cell, zero drift, no NaN/inf

    con = duckdb.connect()
    glob = str(tmp_path / "events.parquet" / "*.parquet").replace("'", "''")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{glob}')")
    want = sorted(tuple(r) for r in con.execute(psi_drift_sql()).fetchall())
    assert got == want


def test_ks_drift_detects_planted_shift(spark, tmp_path):
    """KS ~ 0 on a stationary stream, large under a planted mean
    shift — the rank-based twin of the PSI test."""
    import datetime as dt

    from ydb_vector_search_simple_api_spark.operators.stats import ks_drift

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(2000):
        ts = t0 + dt.timedelta(minutes=i)
        shift = 10.0 if i >= 1000 else 0.0
        rows.append(
            (i, ts, i % 50, ["click", "view"][i % 2], (i % 7) + shift, "{}")
        )
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = ks_drift(spark, str(tmp_path)).collect()[0]
    assert r.n1 + r.n2 == 2000
    # halves share only values {3..6} ∪ {10..13}: true D is large
    assert r.ks_d > 0.5

    # stationary control: same marginal in both halves
    rows2 = [
        (i, t0 + dt.timedelta(minutes=i), i % 50, "click", float(i % 7), "{}")
        for i in range(2000)
    ]
    spark.createDataFrame(
        rows2, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "ev2" / "events.parquet"))
    r2 = ks_drift(spark, str(tmp_path / "ev2")).collect()[0]
    assert r2.ks_d < 0.01


def test_ks_drift_matches_oracle_and_bucket_decomposition(spark, tmp_path):
    """The per-bucket cumsum decomposition must equal the single
    global cumsum the DuckDB twin runs — including on a constant
    value column (degenerate bucket width)."""
    import datetime as dt

    import duckdb

    from ydb_vector_search_simple_api_spark.operators.stats import ks_drift
    from ydb_vector_search_simple_api_spark.oracles_temporal import ks_drift_sql

    t0 = dt.datetime(2024, 1, 1)
    for sub, valfn in [
        ("mixed", lambda i: float((i * 37) % 101) / 7.0),
        ("const", lambda i: 42.0),
    ]:
        rows = [
            (i, t0 + dt.timedelta(minutes=i), i % 50,
             ["click", "view"][i % 2], valfn(i), "{}")
            for i in range(500)
        ]
        spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
        ).write.parquet(str(tmp_path / sub / "events.parquet"))
        got = tuple(ks_drift(spark, str(tmp_path / sub)).collect()[0])
        con = duckdb.connect()
        glob = str(tmp_path / sub / "events.parquet" / "*.parquet").replace(
            "'", "''"
        )
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{glob}')"
        )
        want = tuple(con.execute(ks_drift_sql()).fetchall()[0])
        assert got == want, sub


def test_chi2_drift_detects_planted_shift(spark, tmp_path):
    """chi² ~ 0 on a stationary stream, large under a planted numeric
    shift while the categorical feature stays flat — and both twins
    agree hash-exactly on the same data."""
    import datetime as dt

    import duckdb

    from ydb_vector_search_simple_api_spark.operators.stats import chi2_drift
    from ydb_vector_search_simple_api_spark.oracles_temporal import chi2_drift_sql

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(2000):
        shift = 10.0 if i >= 1000 else 0.0
        rows.append(
            (i, t0 + dt.timedelta(minutes=i), i % 50,
             ["click", "view"][i % 2], (i % 7) + shift, "{}")
        )
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r.feature: r for r in chi2_drift(spark, str(tmp_path)).collect()}
    assert got["event_type"].chi2 < 1.0
    assert got["value_hist"].chi2 > 100.0
    assert got["value_hist"].dof == got["value_hist"].n_cells - 1

    con = duckdb.connect()
    glob = str(tmp_path / "events.parquet" / "*.parquet").replace("'", "''")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{glob}')")
    want = sorted(tuple(r) for r in con.execute(chi2_drift_sql()).fetchall())
    assert sorted(tuple(r) for r in chi2_drift(spark, str(tmp_path)).collect()) == want
