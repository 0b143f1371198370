"""DuckDB oracle SQL for the temporal + stats operators.

Parity rules (same as oracles.py): integer epoch math for bucketing
(no engine-specific truncation), exact DECIMAL(18,6) sums surfaced as
ROUND(...,6)+0.0 doubles, ts cast to microsecond precision on both
sides before any comparison.
"""

# 10-minute bucket + surge threshold as exact integer arithmetic,
# islands via lag + running sum — the classic gaps-and-islands.
_SURGE_CTE = """
WITH b AS (
  SELECT to_timestamp((epoch_us(ts::TIMESTAMP) // 600000000) * 600)::TIMESTAMP AS bucket,
         count(*) AS cnt
  FROM events GROUP BY 1
),
tot AS (SELECT count(*) AS n_buckets, sum(cnt) AS total FROM b),
surge AS (SELECT bucket, cnt FROM b, tot WHERE cnt * n_buckets > 2 * total),
flag AS (
  SELECT bucket, cnt,
         CASE WHEN bucket - LAG(bucket) OVER (ORDER BY bucket) = INTERVAL 10 MINUTE
              THEN 0 ELSE 1 END AS brk
  FROM surge
),
isl AS (
  SELECT bucket, cnt,
         SUM(brk) OVER (ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flag
)
"""

SURGE_WINDOWS = _SURGE_CTE + """
SELECT min(bucket) AS window_start,
       max(bucket) + INTERVAL 10 MINUTE AS window_end,
       count(*)::BIGINT AS n_buckets,
       sum(cnt)::BIGINT AS n_events
FROM isl GROUP BY island
"""

# The range join stated directly as the inequality join the Spark
# side avoids (bucketed broadcast equi-join) — same result.
EVENTS_IN_SURGES = _SURGE_CTE + """,
sw AS (
  SELECT min(bucket) AS window_start,
         max(bucket) + INTERVAL 10 MINUTE AS window_end
  FROM isl GROUP BY island
)
SELECT s.window_start, s.window_end,
       count(*) AS n_events,
       ROUND(SUM(CAST(e.value AS DECIMAL(18,6)))::DOUBLE, 6) + 0.0 AS total_value
FROM (SELECT ts::TIMESTAMP AS ts, value FROM events) e
JOIN sw s ON e.ts >= s.window_start AND e.ts < s.window_end
GROUP BY s.window_start, s.window_end
"""

HOURLY_LOCF = """
WITH e AS (SELECT event_type, ts::TIMESTAMP AS ts, value FROM events),
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS cnt,
         ROUND(SUM(CAST(value AS DECIMAL(18,6)))::DOUBLE / count(*), 6) + 0.0 AS avg_value
  FROM e GROUP BY 1, 2
),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1 FROM e
),
grid AS (
  SELECT t.event_type, g.hour
  FROM (SELECT DISTINCT event_type FROM e) t,
       (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds) g
)
SELECT g.event_type, g.hour,
       COALESCE(h.cnt, 0)::BIGINT AS n_events,
       LAST_VALUE(h.avg_value IGNORE NULLS)
         OVER (PARTITION BY g.event_type ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value_locf
FROM grid g
LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hour = h.hour
"""

# quantile_cont == Spark's exact percentile: linear interpolation at
# rank (n-1)*p over the sorted values.
VALUE_PERCENTILES = """
SELECT event_type,
       count(*) AS n,
       ROUND(quantile_cont(value, 0.5), 6) + 0.0 AS p50,
       ROUND(quantile_cont(value, 0.9), 6) + 0.0 AS p90,
       ROUND(quantile_cont(value, 0.99), 6) + 0.0 AS p99
FROM events GROUP BY event_type
"""

DISTINCT_USERS_BY_TYPE = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""

RETENTION_COHORTS = """
WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events),
w1 AS (SELECT DISTINCT user_id FROM e WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
w4 AS (SELECT DISTINCT user_id FROM e WHERE ts >= TIMESTAMP '2024-01-24 00:00:00')
SELECT user_id, 'retained' AS cohort FROM (SELECT * FROM w1 INTERSECT SELECT * FROM w4)
UNION ALL
SELECT user_id, 'churned' AS cohort FROM (SELECT * FROM w1 EXCEPT SELECT * FROM w4)
UNION ALL
SELECT user_id, 'new' AS cohort FROM (SELECT * FROM w4 EXCEPT SELECT * FROM w1)
"""

PROPS_K_STATS = """
SELECT event_type,
       count(*) AS n_events,
       SUM(CAST(props->>'k' AS INT))::BIGINT AS sum_k,
       MIN(CAST(props->>'k' AS INT)) AS min_k,
       MAX(CAST(props->>'k' AS INT)) AS max_k
FROM events
GROUP BY event_type
"""

# exact-decimal element-wise mean: both engines sum DECIMAL(28,10)
# (order-independent) and divide once in double; generate_subscripts
# replicates Spark's posexplode position (1-based here on both sides)
LABEL_CENTROIDS = """
SELECT label, pos,
       ROUND(CAST(SUM(CAST(CAST(e AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE)
             / count(*), 6) + 0.0 AS centroid
FROM (
  SELECT label, unnest(embedding) AS e, generate_subscripts(embedding, 1) AS pos
  FROM embeddings
)
GROUP BY label, pos
"""


BUCKET_ANOMALIES = """
WITH b AS (
  SELECT to_timestamp((epoch_us(ts::TIMESTAMP) // 600000000) * 600)::TIMESTAMP AS bucket,
         count(*) AS cnt
  FROM events GROUP BY 1
),
w AS (
  SELECT bucket, cnt,
         count(*)        OVER win AS n_hist,
         sum(cnt)        OVER win AS s1,
         sum(cnt * cnt)  OVER win AS s2
  FROM b
  WINDOW win AS (ORDER BY bucket ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT bucket, cnt, n_hist,
         CASE WHEN (6 * s2 - s1 * s1)::DOUBLE / 30.0 > 0.0
              THEN ROUND((6 * cnt - s1)::DOUBLE
                         / (6.0 * sqrt((6 * s2 - s1 * s1)::DOUBLE / 30.0)), 6) + 0.0
         END AS z6
  FROM w
)
SELECT bucket, cnt, z6,
       CASE WHEN abs(z6) > 3.0 THEN 1 ELSE 0 END AS is_anomaly
FROM z WHERE n_hist = 6 ORDER BY bucket
"""


def funnel_sql(steps=("signup", "view", "click", "purchase")) -> str:
    """Twin of temporal.funnel_conversion: iterated earliest-after
    aggregations, one CTE per funnel step."""
    ctes = ["ev AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts FROM events)"]
    for i, st in enumerate(steps):
        if i == 0:
            ctes.append(
                f"t0 AS (SELECT user_id, min(ts) AS t FROM ev "
                f"WHERE event_type = '{st}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"t{i} AS (SELECT ev.user_id, min(ev.ts) AS t FROM ev "
                f"JOIN t{i-1} p ON ev.user_id = p.user_id "
                f"WHERE ev.event_type = '{st}' AND ev.ts > p.t "
                f"GROUP BY ev.user_id)"
            )
    selects = []
    for i, st in enumerate(steps):
        selects.append(
            f"SELECT {i+1} AS step_no, '{st}' AS step, "
            f"(SELECT count(*) FROM t{i})::BIGINT AS n_users, "
            f"ROUND((SELECT count(*) FROM t{i})::DOUBLE / "
            f"(SELECT count(*) FROM t0)::DOUBLE, 6) + 0.0 AS conversion"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects) + "\nORDER BY step_no"


EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT event_type AS cur_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ) AS next_type
  FROM events
),
pairs AS (
  SELECT cur_type, next_type, count(*)::BIGINT AS n_trans
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY cur_type, next_type
)
SELECT cur_type, next_type, n_trans,
       ROUND(n_trans::DOUBLE
             / sum(n_trans) OVER (PARTITION BY cur_type)::DOUBLE, 6) + 0.0 AS p
FROM pairs
"""


SALTED_USER_ROLLUP = """
SELECT user_id, count(*)::BIGINT AS n_events,
       ROUND(CAST(sum(value::DECIMAL(18,6)) AS DOUBLE), 6) + 0.0 AS sum_value
FROM events GROUP BY user_id
"""


USER_TRAILING_FEATURES = """
SELECT event_id, user_id,
       count(*) OVER (
         PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT
         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
       )::BIGINT AS n_1h,
       ROUND(CAST(sum(value::DECIMAL(18,6)) OVER (
         PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT
         RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 6) + 0.0 AS v_24h
FROM events
"""


TABLE_PROFILE_EVENTS = """
WITH p AS (
  SELECT 'event_id' AS column, sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
         count(DISTINCT event_id)::BIGINT AS n_distinct,
         ROUND(min(event_id)::DOUBLE, 6) + 0.0 AS min_num, ROUND(max(event_id)::DOUBLE, 6) + 0.0 AS max_num,
         NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
  FROM events
  UNION ALL
  SELECT 'ts', sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)::BIGINT,
         count(DISTINCT ts)::BIGINT,
         ROUND(epoch(min(ts))::DOUBLE, 6) + 0.0, ROUND(epoch(max(ts))::DOUBLE, 6) + 0.0,
         NULL::VARCHAR, NULL::VARCHAR
  FROM events
  UNION ALL
  SELECT 'user_id', sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT,
         count(DISTINCT user_id)::BIGINT,
         ROUND(min(user_id)::DOUBLE, 6) + 0.0, ROUND(max(user_id)::DOUBLE, 6) + 0.0,
         NULL::VARCHAR, NULL::VARCHAR
  FROM events
  UNION ALL
  SELECT 'event_type', sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT,
         count(DISTINCT event_type)::BIGINT,
         NULL::DOUBLE, NULL::DOUBLE, min(event_type), max(event_type)
  FROM events
  UNION ALL
  SELECT 'value', sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT,
         count(DISTINCT value)::BIGINT,
         ROUND(min(value), 6) + 0.0, ROUND(max(value), 6) + 0.0,
         NULL::VARCHAR, NULL::VARCHAR
  FROM events
  UNION ALL
  SELECT 'props', sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT,
         count(DISTINCT props)::BIGINT,
         NULL::DOUBLE, NULL::DOUBLE, min(props), max(props)
  FROM events
)
SELECT * FROM p
"""


TYPE_VALUE_TRENDS = """
WITH b AS (SELECT min(ts::TIMESTAMP) AS t0 FROM events),
base AS (
  SELECT event_type,
         ((floor(epoch(ts::TIMESTAMP))::BIGINT - floor(epoch(t0))::BIGINT) // 600)::BIGINT AS x,
         ROUND(value * 1000000.0)::BIGINT AS y
  FROM events CROSS JOIN b
),
g AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y) AS sy,
         sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
  FROM base GROUP BY event_type
)
SELECT event_type, n,
       ROUND((n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE)
             / (n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE), 6) + 0.0 AS slope,
       ROUND((sy::DOUBLE - ((n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE)
             / (n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE)) * sx::DOUBLE) / n::DOUBLE, 6) + 0.0 AS intercept,
       ROUND(((n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE) * (n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE))
             / ((n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE) * (n::DOUBLE*syy::DOUBLE - sy::DOUBLE*sy::DOUBLE)), 6) + 0.0 AS r2
FROM g
"""


def session_paths_sql(gap_minutes: int = 30, top_n: int = 20) -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type FROM events
), flagged AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL {gap_minutes} MINUTE
            THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, SUM(new_s) OVER (
      PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS sid FROM flagged
), seqs AS (
  SELECT list(event_type ORDER BY ts, event_id) AS types
  FROM sess GROUP BY user_id, sid
), tri AS (
  SELECT unnest([types[i] || '>' || types[i+1] || '>' || types[i+2]
                 FOR i IN range(1, len(types) - 1)]) AS path
  FROM seqs WHERE len(types) >= 3
), counts AS (
  SELECT path, count(*)::BIGINT AS n FROM tri GROUP BY path
)
SELECT path, n, rk FROM (
  SELECT path, n, ROW_NUMBER() OVER (ORDER BY n DESC, path ASC)::BIGINT AS rk
  FROM counts
) WHERE rk <= {top_n}
"""


TYPE_CORRELATIONS = """
WITH e AS (
  SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS h FROM events
),
hourly AS (
  SELECT event_type, h, count(*)::BIGINT AS c FROM e GROUP BY event_type, h
),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
grid AS (
  SELECT t.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM e) t
  CROSS JOIN (
    SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
  ) g
),
filled AS (
  SELECT grid.event_type, grid.h, COALESCE(hourly.c, 0)::BIGINT AS c
  FROM grid LEFT JOIN hourly USING (event_type, h)
),
g AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*)::BIGINT AS n,
         sum(a.c)::BIGINT AS sx, sum(b.c)::BIGINT AS sy,
         sum(a.c * b.c)::BIGINT AS sxy,
         sum(a.c * a.c)::BIGINT AS sxx, sum(b.c * b.c)::BIGINT AS syy
  FROM filled a JOIN filled b ON a.h = b.h AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n,
       ROUND((n::DOUBLE*sxy::DOUBLE - sx::DOUBLE*sy::DOUBLE)
             / sqrt((n::DOUBLE*sxx::DOUBLE - sx::DOUBLE*sx::DOUBLE)
                    * (n::DOUBLE*syy::DOUBLE - sy::DOUBLE*sy::DOUBLE)), 6) + 0.0 AS r
FROM g
"""


def histogram_quantiles_sql(n_buckets: int = 1000) -> str:
    return f"""
WITH bounds AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
hist AS (
  SELECT event_type,
         least(floor((value - lo) / ((hi - lo) / {float(n_buckets)}))::INT,
               {n_buckets - 1}) AS b,
         count(*)::BIGINT AS c
  FROM events CROSS JOIN bounds
  GROUP BY 1, 2
),
cum AS (
  SELECT event_type, b,
         SUM(c) OVER (
           PARTITION BY event_type ORDER BY b ROWS UNBOUNDED PRECEDING
         ) AS cum
  FROM hist
),
totals AS (SELECT event_type, sum(c)::BIGINT AS n FROM hist GROUP BY event_type),
g AS (
  SELECT cum.event_type, totals.n,
         min(CASE WHEN cum >= ceil(0.5 * n) THEN b END) AS b50,
         min(CASE WHEN cum >= ceil(0.9 * n) THEN b END) AS b90,
         min(CASE WHEN cum >= ceil(0.99 * n) THEN b END) AS b99
  FROM cum JOIN totals ON cum.event_type = totals.event_type
  GROUP BY cum.event_type, totals.n
)
SELECT event_type, n,
       ROUND(lo + b50::DOUBLE * ((hi - lo) / {float(n_buckets)}), 6) + 0.0 AS p50,
       ROUND(lo + b90::DOUBLE * ((hi - lo) / {float(n_buckets)}), 6) + 0.0 AS p90,
       ROUND(lo + b99::DOUBLE * ((hi - lo) / {float(n_buckets)}), 6) + 0.0 AS p99
FROM g CROSS JOIN bounds
"""


def session_labels_sql(horizon_hours: int = 24) -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type FROM events
), flagged AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
            THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess_rows AS (
  SELECT *, SUM(new_s) OVER (
      PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS sid FROM flagged
), sess AS (
  SELECT user_id, sid, MIN(ts) AS session_start,
         MAX(ts) AS session_end_last, COUNT(*)::BIGINT AS n_events
  FROM sess_rows GROUP BY user_id, sid
)
SELECT s.user_id, s.session_start, s.session_end_last, s.n_events,
       CASE WHEN EXISTS (
         SELECT 1 FROM e p
         WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
           AND p.ts > s.session_end_last
           AND p.ts <= s.session_end_last + INTERVAL {horizon_hours} HOUR
       ) THEN 1 ELSE 0 END AS label
FROM sess s
"""


def ab_test_report_sql() -> str:
    from .operators.sampling import PREFIX_HEX, _threshold_hex

    thr = _threshold_hex(0.5)
    return f"""
WITH base AS (
  SELECT event_type,
         CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, {PREFIX_HEX}) < '{thr}'
              THEN 'c' ELSE 't' END AS arm,
         ROUND(value * 1000000.0)::BIGINT AS y
  FROM events
),
g AS (
  SELECT event_type, arm, count(*)::BIGINT AS n,
         sum(y) AS sy, sum(y*y) AS syy
  FROM base GROUP BY event_type, arm
),
j AS (
  SELECT c.event_type,
         c.n AS n_c, c.sy::DOUBLE AS sy_c, c.syy::DOUBLE AS syy_c,
         t.n AS n_t, t.sy::DOUBLE AS sy_t, t.syy::DOUBLE AS syy_t
  FROM g c JOIN g t ON c.event_type = t.event_type
  WHERE c.arm = 'c' AND t.arm = 't'
)
SELECT event_type, n_c, n_t,
       ROUND(sy_c / n_c::DOUBLE / 1e6, 6) + 0.0 AS mean_c,
       ROUND(sy_t / n_t::DOUBLE / 1e6, 6) + 0.0 AS mean_t,
       ROUND(sy_t / n_t::DOUBLE / 1e6 - sy_c / n_c::DOUBLE / 1e6, 6) + 0.0 AS diff,
       ROUND((sy_t / n_t::DOUBLE / 1e6 - sy_c / n_c::DOUBLE / 1e6)
             / sqrt(((syy_c - sy_c*sy_c / n_c::DOUBLE) / (n_c::DOUBLE - 1.0) / 1e12) / n_c::DOUBLE
                    + ((syy_t - sy_t*sy_t / n_t::DOUBLE) / (n_t::DOUBLE - 1.0) / 1e12) / n_t::DOUBLE),
             6) + 0.0 AS t_stat
FROM j
"""


def ab_test_cuped_sql() -> str:
    from .operators.sampling import PREFIX_HEX, _threshold_hex

    thr = _threshold_hex(0.5)
    return f"""
WITH ev AS (
  SELECT user_id, ts::TIMESTAMP AS ts, value FROM events
),
mid AS (
  SELECT to_timestamp((floor(epoch(min(ts)))::BIGINT
                       + floor(epoch(max(ts)))::BIGINT) / 2) AS mid
  FROM ev
),
pre AS (
  SELECT user_id,
         ROUND(CAST(sum(value::DECIMAL(18,6)) AS DOUBLE) / count(*)::DOUBLE, 6) + 0.0 AS x
  FROM ev CROSS JOIN mid WHERE ts < mid GROUP BY user_id
),
post AS (
  SELECT user_id,
         ROUND(CAST(sum(value::DECIMAL(18,6)) AS DOUBLE) / count(*)::DOUBLE, 6) + 0.0 AS y
  FROM ev CROSS JOIN mid WHERE ts >= mid GROUP BY user_id
),
u AS (
  SELECT pre.user_id, x, y,
         CASE WHEN substr(md5(CAST(pre.user_id AS VARCHAR)), 1, {PREFIX_HEX}) < '{thr}'
              THEN 0 ELSE 1 END AS t
  FROM pre JOIN post ON pre.user_id = post.user_id
),
m AS (
  SELECT count(*)::DOUBLE AS n,
         CAST(sum(x::DECIMAL(18,6)) AS DOUBLE) AS sx,
         CAST(sum(y::DECIMAL(18,6)) AS DOUBLE) AS sy,
         CAST(sum(ROUND(x*y, 12)::DECIMAL(28,12)) AS DOUBLE) AS sxy,
         CAST(sum(ROUND(x*x, 12)::DECIMAL(28,12)) AS DOUBLE) AS sxx
  FROM u
),
adj AS (
  SELECT t, y,
         ROUND(y - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * (x - sx/n), 9) + 0.0 AS y_adj,
         (sxy - sx*sy/n) / (sxx - sx*sx/n) AS theta
  FROM u CROSS JOIN m
),
g AS (
  SELECT t, count(*)::DOUBLE AS n,
         CAST(sum(y::DECIMAL(18,6)) AS DOUBLE) AS sy,
         CAST(sum(ROUND(y*y, 12)::DECIMAL(28,12)) AS DOUBLE) AS syy,
         CAST(sum(y_adj::DECIMAL(28,9)) AS DOUBLE) AS sa,
         CAST(sum(ROUND(y_adj*y_adj, 12)::DECIMAL(38,12)) AS DOUBLE) AS saa,
         any_value(theta) AS theta
  FROM adj GROUP BY t
),
j AS (
  SELECT c.n AS n0, c.sy AS sy0, c.syy AS syy0, c.sa AS sa0, c.saa AS saa0, c.theta,
         t.n AS n1, t.sy AS sy1, t.syy AS syy1, t.sa AS sa1, t.saa AS saa1
  FROM g c JOIN g t ON c.t = 0 AND t.t = 1
)
SELECT (n0 + n1)::BIGINT AS n_users,
       ROUND(theta, 6) + 0.0 AS theta,
       ROUND(sy1/n1 - sy0/n0, 6) + 0.0 AS diff_plain,
       ROUND(sa1/n1 - sa0/n0, 6) + 0.0 AS diff_cuped,
       ROUND(((saa0 - sa0*sa0/n0)/(n0-1) + (saa1 - sa1*sa1/n1)/(n1-1))
             / ((syy0 - sy0*sy0/n0)/(n0-1) + (syy1 - sy1*sy1/n1)/(n1-1)), 6) + 0.0 AS var_ratio
FROM j
"""


DAU_WAU = """
WITH ud AS (
  SELECT DISTINCT date_trunc('day', ts::TIMESTAMP) AS day, user_id FROM events
),
daily AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY day),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
grid AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS g_day FROM bounds
),
wau AS (
  SELECT g_day, count(DISTINCT user_id)::BIGINT AS wau
  FROM ud JOIN grid ON day <= g_day AND day > g_day - INTERVAL 7 DAY
  GROUP BY g_day
)
SELECT daily.day, dau, wau,
       ROUND(dau::DOUBLE / wau::DOUBLE, 6) + 0.0 AS stickiness
FROM daily JOIN wau ON daily.day = wau.g_day
"""


NULL_RATE_DRIFT = """
WITH mid AS (
  SELECT to_timestamp((floor(epoch(min(ts::TIMESTAMP)))::BIGINT
                       + floor(epoch(max(ts::TIMESTAMP)))::BIGINT) / 2) AS mid
  FROM events
),
tagged AS (
  SELECT *, CASE WHEN ts::TIMESTAMP >= mid THEN 1 ELSE 0 END AS half
  FROM events CROSS JOIN mid
),
m AS (
  SELECT
    sum(CASE WHEN json_extract_string(props, '$.k') IS NULL AND half = 0 THEN 1 ELSE 0 END)::DOUBLE
      / sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::DOUBLE AS props_k_0,
    sum(CASE WHEN json_extract_string(props, '$.k') IS NULL AND half = 1 THEN 1 ELSE 0 END)::DOUBLE
      / sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::DOUBLE AS props_k_1,
    sum(CASE WHEN value IS NULL AND half = 0 THEN 1 ELSE 0 END)::DOUBLE
      / sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::DOUBLE AS value_0,
    sum(CASE WHEN value IS NULL AND half = 1 THEN 1 ELSE 0 END)::DOUBLE
      / sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::DOUBLE AS value_1,
    sum(CASE WHEN event_type IS NULL AND half = 0 THEN 1 ELSE 0 END)::DOUBLE
      / sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::DOUBLE AS event_type_0,
    sum(CASE WHEN event_type IS NULL AND half = 1 THEN 1 ELSE 0 END)::DOUBLE
      / sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::DOUBLE AS event_type_1,
    sum(CASE WHEN user_id IS NULL AND half = 0 THEN 1 ELSE 0 END)::DOUBLE
      / sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::DOUBLE AS user_id_0,
    sum(CASE WHEN user_id IS NULL AND half = 1 THEN 1 ELSE 0 END)::DOUBLE
      / sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::DOUBLE AS user_id_1
  FROM tagged
)
SELECT 'props_k' AS column, ROUND(props_k_0, 6) + 0.0 AS rate_first,
       ROUND(props_k_1, 6) + 0.0 AS rate_second,
       ROUND(props_k_1 - props_k_0, 6) + 0.0 AS drift FROM m
UNION ALL
SELECT 'value', ROUND(value_0, 6) + 0.0, ROUND(value_1, 6) + 0.0,
       ROUND(value_1 - value_0, 6) + 0.0 FROM m
UNION ALL
SELECT 'event_type', ROUND(event_type_0, 6) + 0.0, ROUND(event_type_1, 6) + 0.0,
       ROUND(event_type_1 - event_type_0, 6) + 0.0 FROM m
UNION ALL
SELECT 'user_id', ROUND(user_id_0, 6) + 0.0, ROUND(user_id_1, 6) + 0.0,
       ROUND(user_id_1 - user_id_0, 6) + 0.0 FROM m
"""


HOUR_OF_DAY_PROFILE = """
SELECT event_type, hour(ts::TIMESTAMP)::INT AS hod,
       count(*)::BIGINT AS n_events,
       ROUND(CAST(sum(value::DECIMAL(18,6)) AS DOUBLE) / count(*)::DOUBLE, 6) + 0.0 AS avg_value
FROM events GROUP BY event_type, hod
"""


def psi_drift_sql(n_bins: int = 10) -> str:
    """Twin of stats.psi_drift: same half tag, same fixed-width bins
    from the whole range, same Laplace-smoothed double association
    order, ROUND(term,9) decimal sum, final ROUND(6)."""

    def one(feature: str, cell_src: str) -> str:
        return f"""
SELECT '{feature}' AS feature,
       count(*)::BIGINT AS n_cells,
       ROUND(CAST(sum(CAST(ROUND(
         ((c2 + 1)::DOUBLE / (n2 + b)::DOUBLE - (c1 + 1)::DOUBLE / (n1 + b)::DOUBLE)
         * ln(((c2 + 1)::DOUBLE / (n2 + b)::DOUBLE) / ((c1 + 1)::DOUBLE / (n1 + b)::DOUBLE))
       , 9) AS DECIMAL(20,9))) AS DOUBLE), 6) + 0.0 AS psi
FROM (
  SELECT cell,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS c1,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS c2
  FROM ({cell_src}) GROUP BY cell
) piv CROSS JOIN (
  SELECT sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS n2,
         count(DISTINCT cell)::BIGINT AS b
  FROM ({cell_src})
) tot"""

    base = f"""
WITH bounds AS (
  SELECT to_timestamp((floor(epoch(min(ts::TIMESTAMP)))::BIGINT
                       + floor(epoch(max(ts::TIMESTAMP)))::BIGINT) / 2) AS mid,
         min(value) AS vmin, max(value) AS vmax
  FROM events
),
tagged AS (
  SELECT *, CASE WHEN ts::TIMESTAMP >= mid THEN 1 ELSE 0 END AS half
  FROM events CROSS JOIN bounds
)"""
    vcells = f"""
  SELECT half,
         CAST(least({n_bins - 1},
              floor((value - vmin) / (greatest(vmax - vmin, 1e-12) / {float(n_bins)})))::INT AS VARCHAR) AS cell
  FROM tagged WHERE value IS NOT NULL"""
    tcells = "SELECT half, event_type AS cell FROM tagged"
    return (
        base
        + "\n"
        + one("value_hist", vcells)
        + "\nUNION ALL\n"
        + one("event_type", tcells)
    )


def ks_drift_sql() -> str:
    """Twin of stats.ks_drift: same half tag as psi_drift_sql, exact
    integer per-value counts and cumulative counts, the cross-
    multiplied BIGINT numerator, one double division + ROUND(6)."""
    return """
WITH bounds AS (
  SELECT to_timestamp((floor(epoch(min(ts::TIMESTAMP)))::BIGINT
                       + floor(epoch(max(ts::TIMESTAMP)))::BIGINT) / 2) AS mid
  FROM events
),
tagged AS (
  SELECT value, CASE WHEN ts::TIMESTAMP >= mid THEN 1 ELSE 0 END AS half
  FROM events CROSS JOIN bounds
  WHERE value IS NOT NULL
),
v AS (
  SELECT value,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS c1,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS c2
  FROM tagged GROUP BY value
),
tot AS (
  SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2,
         count(*)::BIGINT AS n_points
  FROM v
),
c AS (
  SELECT (sum(c1) OVER (ORDER BY value))::BIGINT AS cum1,
         (sum(c2) OVER (ORDER BY value))::BIGINT AS cum2
  FROM v
)
SELECT n1, n2, n_points,
       ROUND(max(abs(cum1 * n2 - cum2 * n1))::DOUBLE
             / (n1 * n2)::DOUBLE, 6) + 0.0 AS ks_d
FROM c CROSS JOIN tot
GROUP BY n1, n2, n_points
"""


def chi2_drift_sql(n_bins: int = 10) -> str:
    """Twin of stats.chi2_drift: same cells as psi_drift_sql, the
    per-cell term in one double expression with the identical
    association order, ROUND(term,9) decimal sum, final ROUND(6)."""

    def one(feature: str, cell_src: str) -> str:
        num = "(c1::DOUBLE * n2::DOUBLE - c2::DOUBLE * n1::DOUBLE)"
        den = "(n1::DOUBLE * n2::DOUBLE * (c1 + c2)::DOUBLE)"
        return f"""
SELECT '{feature}' AS feature,
       count(*)::BIGINT AS n_cells,
       (count(*) - 1)::BIGINT AS dof,
       ROUND(CAST(sum(CAST(ROUND({num} * {num} / {den}, 9)
                      AS DECIMAL(20,9))) AS DOUBLE), 6) + 0.0 AS chi2
FROM (
  SELECT cell,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS c1,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS c2
  FROM ({cell_src}) GROUP BY cell
) piv CROSS JOIN (
  SELECT sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS n2
  FROM ({cell_src})
) tot"""

    base = f"""
WITH bounds AS (
  SELECT to_timestamp((floor(epoch(min(ts::TIMESTAMP)))::BIGINT
                       + floor(epoch(max(ts::TIMESTAMP)))::BIGINT) / 2) AS mid,
         min(value) AS vmin, max(value) AS vmax
  FROM events
),
tagged AS (
  SELECT *, CASE WHEN ts::TIMESTAMP >= mid THEN 1 ELSE 0 END AS half
  FROM events CROSS JOIN bounds
)"""
    vcells = f"""
  SELECT half,
         CAST(least({n_bins - 1},
              floor((value - vmin) / (greatest(vmax - vmin, 1e-12) / {float(n_bins)})))::INT AS VARCHAR) AS cell
  FROM tagged WHERE value IS NOT NULL"""
    tcells = "SELECT half, event_type AS cell FROM tagged"
    return (
        base
        + "\n"
        + one("value_hist", vcells)
        + "\nUNION ALL\n"
        + one("event_type", tcells)
    )


# ----------------------------------------------------- KMV sketches

def kmv_distinct_by_type_sql() -> str:
    """Twin of :func:`operators.kmv.kmv_distinct_by_type` in the
    oracle-pinned UNSATURATED regime (distinct users per type < k):
    the sketch saw every distinct hash, so n_min and est_distinct must
    equal COUNT(DISTINCT user_id) exactly (48-bit collisions would
    surface here as a deterministic mismatch, not a flake)."""
    return """
WITH d AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS n
  FROM events GROUP BY 1
)
SELECT event_type, n AS n_min, n AS est_distinct, TRUE AS exact FROM d
"""


def kmv_user_overlap_sql() -> str:
    """Twin of :func:`operators.kmv.kmv_user_overlap` (unsaturated
    regime): union/intersection/Jaccard from sketches must equal the
    exact pairwise audience overlap."""
    return """
WITH t AS (SELECT DISTINCT event_type, user_id FROM events),
types AS (SELECT DISTINCT event_type FROM events),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a, types b WHERE a.event_type < b.event_type
),
m AS (
  SELECT p.type_a, p.type_b, t.user_id,
         MAX(CASE WHEN t.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN t.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
  FROM p JOIN t ON t.event_type IN (p.type_a, p.type_b)
  GROUP BY 1, 2, 3
)
SELECT type_a, type_b,
       count(*)::BIGINT AS n_union_sketch,
       SUM(in_a * in_b)::BIGINT AS n_common,
       count(*)::BIGINT AS union_est,
       SUM(in_a * in_b)::BIGINT AS inter_est,
       ROUND(SUM(in_a * in_b)::DOUBLE / count(*), 6) + 0.0 AS jaccard
FROM m GROUP BY 1, 2
"""


def scd2_history_sql() -> str:
    """Twin of :func:`operators.temporal.scd2_history` — the same
    gaps-and-islands run compression then versions windows, both
    ordered (ts, event_id) for deterministic ties."""
    return """
WITH e AS (
  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type FROM events
),
ch AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
  FROM e
),
c2 AS (
  SELECT * FROM ch WHERE prev_state IS NULL OR prev_state <> event_type
)
SELECT user_id,
       ROW_NUMBER() OVER (
         PARTITION BY user_id ORDER BY ts, event_id)::BIGINT AS version,
       event_type AS state,
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM c2
"""
