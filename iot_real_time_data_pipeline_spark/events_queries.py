"""Driver-facing clickstream-analytics queries over the ``events``
table, each with a DuckDB oracle twin.

The oracle SQL mirrors the Spark window plans structurally: identical
integer epoch-second derivation (``epoch_ns // 1e9`` vs long-nanos
``div 1e9`` — both floor on the positive range), identical window
frames, identical (ts_sec, event_id) tie-breaks. Every output column is
BIGINT/VARCHAR except the histogram's raw double `value` ordering,
which involves no arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .driver_queries import QueryFn
from .entrypoints import read_table
from .functions import texthash as TH
from .operators import events_analytics as EA
from .operators import sketches as SK


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return EA.with_ts_sec(read_table(spark, sf_dir, "events"))


def q_sessionize(spark, sf_dir):
    return EA.sessionize(_events(spark, sf_dir))


def q_asof_attribution(spark, sf_dir):
    return EA.asof_attribution(_events(spark, sf_dir))


def q_retention(spark, sf_dir):
    return EA.retention_cohorts(_events(spark, sf_dir))


def q_value_histogram(spark, sf_dir):
    return EA.value_histogram(_events(spark, sf_dir))


def q_top_events_per_user(spark, sf_dir):
    return EA.top_events_per_user(_events(spark, sf_dir))


def q_funnel(spark, sf_dir):
    return EA.funnel(_events(spark, sf_dir))


def q_hourly_rollup(spark, sf_dir):
    return EA.hourly_rollup(_events(spark, sf_dir))


def q_anomalies(spark, sf_dir):
    return EA.value_anomalies(_events(spark, sf_dir))


def q_dau_wau(spark, sf_dir):
    return EA.dau_wau(_events(spark, sf_dir))


def q_deciles(spark, sf_dir):
    return EA.value_deciles(_events(spark, sf_dir))


def q_multi_action(spark, sf_dir):
    return EA.multi_action_users(_events(spark, sf_dir))


def q_scd2(spark, sf_dir):
    return EA.scd2_intervals(_events(spark, sf_dir))


def q_moving_avg(spark, sf_dir):
    return EA.daily_moving_avg(_events(spark, sf_dir))


def q_tw_avg(spark, sf_dir):
    return EA.time_weighted_avg(_events(spark, sf_dir))


def q_gapfill(spark, sf_dir):
    return EA.gapfill_locf(_events(spark, sf_dir))


def q_props_stats(spark, sf_dir):
    return EA.props_stats(_events(spark, sf_dir))


def q_exact_median(spark, sf_dir):
    return EA.exact_median(_events(spark, sf_dir))


def q_key_skew(spark, sf_dir):
    return EA.key_skew_report(_events(spark, sf_dir))


def q_heavy_hitters(spark, sf_dir):
    # key=event_type, k=5 (report types holding > 1/5 of all traffic):
    # the testdata's user_id distribution is near-uniform at every SF
    # (max/mean ~ 1.3x), so any user-level phi is either vacuous or
    # all-keys; the event-type mix hovers around 20% +- 0.4%, so the
    # 20% threshold genuinely discriminates (2-3 of 5 types qualify at
    # sf0.001/0.01/0.1) and the driver row carries real evidence.
    # The skewed-key/planted-hitter path stays covered by
    # test_heavy_hitters_exact_threshold.
    return EA.heavy_hitters(_events(spark, sf_dir), key="event_type", k=5)


def q_kmv(spark, sf_dir):
    return SK.kmv_distinct(_events(spark, sf_dir))


def q_cms(spark, sf_dir):
    return SK.cms_table(_events(spark, sf_dir))


def q_kmv_daily_merge(spark, sf_dir):
    return SK.kmv_daily_merge(_events(spark, sf_dir))


def q_hll_distinct(spark, sf_dir):
    return SK.hll_distinct(_events(spark, sf_dir))


def events_queries() -> dict[str, QueryFn]:
    return {
        "events_sessionize": q_sessionize,
        "events_asof_attribution": q_asof_attribution,
        "events_retention_cohorts": q_retention,
        "events_value_histogram": q_value_histogram,
        "events_top_per_user": q_top_events_per_user,
        "events_funnel": q_funnel,
        "events_hourly_rollup": q_hourly_rollup,
        "events_value_anomalies": q_anomalies,
        "events_dau_wau": q_dau_wau,
        "events_value_deciles": q_deciles,
        "events_multi_action_users": q_multi_action,
        "events_scd2_intervals": q_scd2,
        "events_daily_moving_avg": q_moving_avg,
        "events_time_weighted_avg": q_tw_avg,
        "events_gapfill_locf": q_gapfill,
        "events_props_stats": q_props_stats,
        "events_exact_median": q_exact_median,
        "events_key_skew": q_key_skew,
        "events_heavy_hitters": q_heavy_hitters,
        "events_kmv_distinct": q_kmv,
        "events_cms_table": q_cms,
        "events_kmv_daily_merge": q_kmv_daily_merge,
        "events_hll_distinct": q_hll_distinct,
        # later additions (callables/constants defined further down the
        # module — resolved when this function is CALLED, after load)
        "events_asof_join": q_asof_join,
        "events_time_band_pairs": q_time_band_pairs,
        "events_interarrival": q_interarrival,
        "events_hopping_rollup": q_hopping_rollup,
        "events_type_day_pivot": q_type_day_pivot,
        "events_transition_matrix": q_transition_matrix,
        "events_winsorized": q_winsorized,
        "events_cusum_changepoint": q_cusum,
        "events_scd2_lookup": q_scd2_lookup,
        "events_funnel_within": q_funnel_within,
        "events_incremental_rollup": q_incremental_rollup,
        "events_kmv_set_ops": q_kmv_set_ops,
        "events_ewma_daily": q_ewma_daily,
        "events_seasonal_anomalies": q_seasonal_anomalies,
        "events_linear_attribution": q_linear_attribution,
        "events_time_decay_attribution": q_time_decay_attribution,
        "events_bot_audit": q_bot_audit,
        "events_session_paths": q_session_paths,
        "events_audience_overlap": q_audience_overlap,
        "events_new_vs_returning": q_new_vs_returning,
        "events_conversion_latency": q_conversion_latency,
        "events_punch_card": q_punch_card,
        "events_ab_split_audit": q_ab_split_audit,
        "events_range_join_counts": q_range_join_counts,
        "events_ohlc_daily": q_ohlc_daily,
        "events_hist_quantile_audit": q_hist_quantile_audit,
    }


_EV_CTE = """
ev AS (
  SELECT event_id, user_id, event_type, value,
         epoch_ns(ts) // 1000000000 AS ts_sec
  FROM events
)"""

_SESSIONIZE_SQL = f"""
WITH {_EV_CTE},
flagged AS (
  SELECT user_id, ts_sec, event_id,
         CASE WHEN lag(ts_sec) OVER w IS NULL
                OR ts_sec - lag(ts_sec) OVER w > {EA.SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
),
runs AS (
  SELECT user_id, ts_sec,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       count(*) AS n_events,
       min(ts_sec) AS session_start_sec,
       max(ts_sec) AS session_end_sec,
       max(ts_sec) - min(ts_sec) AS duration_sec
FROM runs GROUP BY user_id, session_idx"""

def q_ab_split_audit(spark, sf_dir):
    return EA.ab_split_audit(_events(spark, sf_dir))


_AB_SPLIT_SQL = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY user_id
),
assigned AS (
  SELECT (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 2) AS variant, converted
  FROM per_user
),
per_variant AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_conv
  FROM assigned GROUP BY variant
),
row AS (
  SELECT max(CASE WHEN variant = 0 THEN n_users END) AS n_users_a,
         max(CASE WHEN variant = 1 THEN n_users END) AS n_users_b,
         max(CASE WHEN variant = 0 THEN n_conv END) AS conv_a,
         max(CASE WHEN variant = 1 THEN n_conv END) AS conv_b
  FROM per_variant
)
SELECT n_users_a, n_users_b,
       abs(n_users_a - n_users_b) * 1000000 // (n_users_a + n_users_b)
         AS srm_dev_ppm,
       (1000000 * conv_a) // n_users_a AS conv_ppm_a,
       (1000000 * conv_b) // n_users_b AS conv_ppm_b,
       (1000000 * conv_a) // n_users_a - (1000000 * conv_b) // n_users_b
         AS delta_ppm
FROM row"""


def q_punch_card(spark, sf_dir):
    return EA.punch_card(_events(spark, sf_dir))


_PUNCH_CARD_SQL = """
WITH base AS (
  SELECT user_id, CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec
  FROM events
)
SELECT (ts_sec // 86400 + 3) % 7 AS dow,
       (ts_sec % 86400) // 3600 AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM base GROUP BY 1, 2"""


def q_conversion_latency(spark, sf_dir):
    return EA.conversion_latency(_events(spark, sf_dir))


def _conversion_latency_sql() -> str:
    pct_cols = ",\n       ".join(
        f"min(CASE WHEN cum * 1000 >= {q} * total THEN lat_min END)"
        f" AS p{q // 10}_min"
        for q in EA.CONV_PCTS_MILLI
    )
    return f"""
WITH base AS (
  SELECT user_id, event_type,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec
  FROM events
),
per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts_sec END) AS first_from,
         min(CASE WHEN event_type = 'purchase' THEN ts_sec END) AS first_to
  FROM base GROUP BY user_id
),
lat AS (
  SELECT (first_to - first_from) // 60 AS lat_min
  FROM per_user
  WHERE first_from IS NOT NULL AND first_to > first_from
),
hist AS (SELECT lat_min, count(*) AS cnt FROM lat GROUP BY lat_min),
cdf AS (
  SELECT lat_min, cnt,
         sum(cnt) OVER (ORDER BY lat_min ROWS UNBOUNDED PRECEDING) AS cum,
         sum(cnt) OVER () AS total
  FROM hist
)
SELECT CAST(max(total) AS BIGINT) AS n_converters,
       {pct_cols},
       max(lat_min) AS max_min
FROM cdf"""


def q_new_vs_returning(spark, sf_dir):
    return EA.new_vs_returning(_events(spark, sf_dir))


_NEW_VS_RETURNING_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(epoch_ns(ts) // 1000000000 // 86400 AS BIGINT) AS day
  FROM events
),
first AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id),
agg AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_active,
         CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new
  FROM ud JOIN first USING (user_id) GROUP BY day
)
SELECT day, n_active, n_new, n_active - n_new AS n_returning,
       (1000000 * n_new) // n_active AS new_ppm
FROM agg"""


def q_audience_overlap(spark, sf_dir):
    return EA.audience_overlap(_events(spark, sf_dir))


_AUDIENCE_OVERLAP_SQL = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
totals AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
  FROM tu GROUP BY event_type
),
common AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT type_a, type_b,
       ta.n_users AS n_users_a, tb.n_users AS n_users_b, n_common,
       (1000000 * n_common) // (ta.n_users + tb.n_users - n_common)
         AS jaccard_ppm
FROM common
JOIN totals ta ON ta.event_type = type_a
JOIN totals tb ON tb.event_type = type_b"""


def q_session_paths(spark, sf_dir):
    return EA.session_paths(_events(spark, sf_dir))


def _session_paths_sql() -> str:
    ml, n = EA.PATH_MAX_LEN, EA.PATH_TOP_N
    return f"""
WITH {_EV_CTE},
flagged AS (
  SELECT user_id, ts_sec, event_id, event_type,
         CASE WHEN lag(ts_sec) OVER w IS NULL
                OR ts_sec - lag(ts_sec) OVER w > {EA.SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
),
runs AS (
  SELECT user_id, ts_sec, event_id, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
),
head AS (
  SELECT * FROM (
    SELECT user_id, session_idx, event_type,
           row_number() OVER (PARTITION BY user_id, session_idx
                              ORDER BY ts_sec, event_id) AS rn
    FROM runs
  ) WHERE rn <= {ml} + 1
),
per_session AS (
  SELECT user_id, session_idx,
         string_agg(event_type, '>' ORDER BY rn)
           FILTER (WHERE rn <= {ml})
         || CASE WHEN max(rn) > {ml} THEN '>…' ELSE '' END AS path
  FROM head GROUP BY user_id, session_idx
),
counted AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
  FROM per_session GROUP BY path
)
SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path)
            AS BIGINT) AS rank,
       path, n_sessions
FROM counted
ORDER BY n_sessions DESC, path
LIMIT {n}"""


_ASOF_SQL = f"""
WITH {_EV_CTE},
attributed AS (
  SELECT event_id, user_id, event_type, ts_sec,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w AS attributed_event_id,
         last_value(CASE WHEN event_type = 'click' THEN ts_sec END IGNORE NULLS)
           OVER w AS attributed_ts_sec
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, ts_sec, attributed_event_id, attributed_ts_sec,
       ts_sec - attributed_ts_sec AS gap_sec
FROM attributed WHERE event_type = 'purchase'"""

_RETENTION_SQL = f"""
WITH {_EV_CTE},
days AS (
  SELECT user_id, ts_sec // 86400 AS day,
         min(ts_sec // 86400) OVER (PARTITION BY user_id) AS cohort_day
  FROM ev
),
grid AS (
  SELECT DISTINCT user_id, cohort_day, day - cohort_day AS day_offset FROM days
)
SELECT cohort_day, day_offset, count(*) AS n_users
FROM grid GROUP BY cohort_day, day_offset"""

_HISTOGRAM_SQL = f"""
WITH binned AS (
  SELECT event_type,
         CAST(floor(value / {float(EA.HISTOGRAM_BIN_WIDTH)}) AS BIGINT) AS bin
  FROM events
)
SELECT event_type, bin, bin * {EA.HISTOGRAM_BIN_WIDTH} AS bin_lo,
       count(*) AS n_events
FROM binned GROUP BY event_type, bin"""

_TOP_PER_USER_SQL = """
WITH ranked AS (
  SELECT user_id, event_id, event_type, value,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
              AS BIGINT) AS rank
  FROM events
)
SELECT user_id, rank, event_id, event_type, value
FROM ranked WHERE rank <= 3"""


_FUNNEL_SQL = f"""
WITH {_EV_CTE},
s0 AS (
  SELECT *, min(CASE WHEN event_type = 'view' THEN ts_sec END)
         OVER (PARTITION BY user_id) AS t0 FROM ev
),
s1 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts_sec > t0 THEN ts_sec END)
         OVER (PARTITION BY user_id) AS t1 FROM s0
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_sec > t1 THEN ts_sec END)
         OVER (PARTITION BY user_id) AS t2 FROM s1
),
u AS (SELECT DISTINCT user_id, t0, t1, t2 FROM s2),
c AS (SELECT count(t0) AS n0, count(t1) AS n1, count(t2) AS n2 FROM u)
SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage, n0 AS n_users FROM c
UNION ALL
SELECT CAST(1 AS BIGINT), 'click', n1 FROM c
UNION ALL
SELECT CAST(2 AS BIGINT), 'purchase', n2 FROM c"""

_ROLLUP_SQL = f"""
WITH {_EV_CTE},
g AS (
  SELECT event_type, (ts_sec // {EA.ROLLUP_BUCKET_SEC}) * {EA.ROLLUP_BUCKET_SEC}
           AS bucket_start_sec,
         count(*) AS n_events,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
  FROM ev GROUP BY 1, 2
)
SELECT event_type, bucket_start_sec, n_events, sum_value_c,
       CAST((sum_value_c * 100) // n_events AS BIGINT) AS avg_value_cc
FROM g"""


_ANOMALY_SQL = f"""
WITH base AS (
  SELECT event_id, event_type, value,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
),
stats AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(vc) AS BIGINT) AS sum_c,
         CAST(sum(vc * vc) AS BIGINT) AS sumsq_c2
  FROM base GROUP BY event_type
),
moments AS (
  SELECT event_type, n, sum_c, sumsq_c2,
         (CAST(sumsq_c2 AS DOUBLE)
          - CAST(n AS DOUBLE)
            * (CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE)))
         / CAST(n AS DOUBLE) AS var
  FROM stats
),
scored AS (
  SELECT b.event_id, b.event_type, b.value,
         CASE WHEN s.var > 0 THEN
           (CAST(b.vc AS DOUBLE) - CAST(s.sum_c AS DOUBLE) / CAST(s.n AS DOUBLE))
             / sqrt(s.var)
         ELSE 0.0 END AS z
  FROM base b JOIN moments s ON b.event_type = s.event_type
)
SELECT event_id, event_type, value,
       CAST(round(z * 1000) AS BIGINT) AS z_milli
FROM scored WHERE abs(z) > {EA.ANOMALY_Z}"""


_DAU_WAU_SQL = f"""
WITH {_EV_CTE},
days AS (SELECT DISTINCT user_id, ts_sec // 86400 AS day FROM ev),
bounds AS (SELECT max(day) AS max_day FROM days),
dau AS (SELECT day, count(*) AS dau FROM days GROUP BY day),
support AS (
  SELECT DISTINCT user_id, day FROM (
    SELECT user_id, unnest(range(day, day + 7)) AS day FROM days
  )
),
wau AS (
  SELECT s.day, count(*) AS wau
  FROM support s, bounds b WHERE s.day <= b.max_day GROUP BY s.day
)
SELECT d.day, d.dau, w.wau,
       CAST((d.dau * 1000000) // w.wau AS BIGINT) AS stickiness_ppm
FROM dau d JOIN wau w ON d.day = w.day"""


_DECILES_SQL = """
WITH ranked AS (
  SELECT event_type, value,
         CAST(ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id)
              AS BIGINT) AS decile
  FROM events
)
SELECT event_type, decile, count(*) AS n_events,
       min(value) AS lo_value, max(value) AS hi_value
FROM ranked GROUP BY event_type, decile"""

_MULTI_ACTION_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error'"""


_SCD2_SQL = f"""
WITH {_EV_CTE},
flagged AS (
  SELECT user_id, event_type, ts_sec, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS is_change
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
),
versioned AS (
  SELECT user_id, event_type, ts_sec,
         CAST(sum(is_change) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS version
  FROM flagged
),
iv AS (
  SELECT user_id, version, min(event_type) AS event_type,
         min(ts_sec) AS valid_from_sec, count(*) AS n_events
  FROM versioned GROUP BY user_id, version
)
SELECT user_id, version, event_type, valid_from_sec,
       CAST(coalesce(lead(valid_from_sec)
            OVER (PARTITION BY user_id ORDER BY version), -1) AS BIGINT)
         AS valid_to_sec,
       n_events,
       CAST(CASE WHEN lead(valid_from_sec)
                      OVER (PARTITION BY user_id ORDER BY version) IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM iv"""


_MOVING_AVG_SQL = f"""
WITH {_EV_CTE},
daily AS (
  SELECT event_type, ts_sec // 86400 AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS daily_sum_c,
         count(*) AS n_events
  FROM ev GROUP BY 1, 2
),
win AS (
  SELECT event_type, day, daily_sum_c,
         CAST(sum(daily_sum_c) OVER w AS BIGINT) AS trailing_sum_c,
         CAST(sum(n_events) OVER w AS BIGINT) AS trailing_n
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               RANGE BETWEEN {EA.MOVING_AVG_DAYS - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, daily_sum_c, trailing_sum_c, trailing_n,
       CAST(trailing_sum_c // trailing_n AS BIGINT) AS trailing_avg_c
FROM win"""




_TW_AVG_SQL = f"""
WITH {_EV_CTE},
seq AS (
  SELECT event_type, ts_sec, CAST(round(value * 100) AS BIGINT) AS val_c,
         lead(ts_sec) OVER (PARTITION BY event_type ORDER BY ts_sec, event_id)
           AS next_sec
  FROM ev
),
weighted AS (
  SELECT event_type, val_c, next_sec - ts_sec AS weight_sec
  FROM seq WHERE next_sec IS NOT NULL
),
g AS (
  SELECT event_type, count(*) AS n_weighted,
         CAST(sum(weight_sec) AS BIGINT) AS total_sec,
         CAST(sum(val_c * weight_sec) AS BIGINT) AS tw_sum
  FROM weighted GROUP BY event_type
)
SELECT event_type, n_weighted, total_sec,
       CAST(tw_sum // total_sec AS BIGINT) AS tw_avg_c
FROM g"""


_GAPFILL_SQL = f"""
WITH {_EV_CTE},
rollup AS (
  SELECT event_type, ts_sec // {EA.GAPFILL_BUCKET_SEC} AS bucket,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS real_sum_c
  FROM ev GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
  FROM rollup GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(range(lo, hi + 1)) AS bucket FROM bounds
),
joined AS (
  SELECT g.event_type, g.bucket, r.real_sum_c
  FROM grid g LEFT JOIN rollup r
    ON g.event_type = r.event_type AND g.bucket = r.bucket
),
filled AS (
  SELECT event_type, bucket, real_sum_c,
         last_value(real_sum_c IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
  FROM joined
)
SELECT event_type, bucket,
       CAST(coalesce(real_sum_c, -1) AS BIGINT) AS real_sum_c,
       CAST(coalesce(f, -1) AS BIGINT) AS filled_sum_c,
       CAST(CASE WHEN real_sum_c IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_filled
FROM filled"""


_PROPS_STATS_SQL = """
WITH x AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
)
SELECT event_type, count(*) AS n_events,
       count(CASE WHEN k IS NULL THEN 1 END) AS n_null_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       count(DISTINCT k) AS n_distinct_k
FROM x GROUP BY event_type"""


_EXACT_MEDIAN_SQL = f"""
WITH {_EV_CTE},
ranked AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS val_c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(round(value * 100) AS BIGINT), event_id)
           AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev
),
mid AS (
  SELECT event_type, val_c, n FROM ranked
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
),
g AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n_values,
         CAST(sum(val_c) AS BIGINT) AS m_sum
  FROM mid GROUP BY event_type
)
SELECT event_type, n_values,
       CAST(CASE WHEN n_values % 2 = 1 THEN m_sum * 2 ELSE m_sum END AS BIGINT)
         AS median_halfcent_c
FROM g"""


_KEY_SKEW_SQL = """
WITH per_key AS (SELECT user_id, count(*) AS freq FROM events GROUP BY user_id),
g AS (
  SELECT count(*) AS n_keys, CAST(sum(freq) AS BIGINT) AS n_rows,
         CAST(max(freq) AS BIGINT) AS max_freq
  FROM per_key
)
SELECT n_keys, n_rows, max_freq,
       CAST((n_rows * 1000) // n_keys AS BIGINT) AS mean_freq_milli,
       CAST((max_freq * n_keys * 1000000) // n_rows AS BIGINT) AS skew_ratio_ppm
FROM g"""


def _heavy_hitters_sql() -> str:
    k = 5  # mirrors q_heavy_hitters: event_type share > 1/5
    return f"""
WITH per_key AS (SELECT event_type, count(*) AS freq FROM events GROUP BY event_type),
t AS (SELECT CAST(sum(freq) AS BIGINT) AS n FROM per_key)
SELECT event_type, freq, CAST((freq * 1000000) // n AS BIGINT) AS share_ppm
FROM per_key, t WHERE freq * {k} > n"""


def _hll_sql() -> str:
    w, m, sc = SK.HLL_W, SK.HLL_M, SK.HLL_SCALE
    # same integer CASE ladder as sketches._rho_ladder
    arms = " ".join(
        f"WHEN rem >= {1 << (w - k)} THEN {k}" for k in range(1, w + 1)
    )
    return f"""
WITH h AS (
  SELECT event_type,
         {TH.sql_token_hash('CAST(user_id AS VARCHAR)')} AS hv
  FROM events
),
b AS (
  SELECT event_type, hv // {1 << w} AS bucket, hv % {1 << w} AS rem FROM h
),
r AS (
  SELECT event_type, bucket,
         (CASE {arms} ELSE {w + 1} END) AS rho
  FROM b
),
regs AS (
  SELECT event_type, bucket, max(rho) AS rho FROM r GROUP BY 1, 2
),
pt AS (
  SELECT event_type, count(*) AS n_buckets_hit,
         CAST(sum(CAST(1 AS BIGINT) << ({sc} - rho)) AS BIGINT) AS sum_hit
  FROM regs GROUP BY event_type
),
est AS (
  SELECT event_type, n_buckets_hit,
         CAST(sum_hit + ({m} - n_buckets_hit) * (CAST(1 AS BIGINT) << {sc})
              AS BIGINT) AS sum_scaled
  FROM pt
),
raw AS (
  SELECT *,
         CAST((CAST({SK.HLL_ALPHA_NUM} AS BIGINT) * {m} * {m}
               * (CAST(1 AS BIGINT) << {sc}))
              // ({SK.HLL_ALPHA_DEN} * sum_scaled) AS BIGINT)
           AS hll_raw_estimate
  FROM est
)
SELECT event_type, n_buckets_hit, sum_scaled, hll_raw_estimate,
       CASE WHEN hll_raw_estimate * 2 < {5 * m} AND n_buckets_hit < {m}
            THEN {TH.sql_quantized6(f"{float(m)} * ln({m} / CAST({m} - n_buckets_hit AS DOUBLE))")}
            ELSE CAST(hll_raw_estimate AS DOUBLE) END AS hll_estimate
FROM raw"""


def _kmv_daily_merge_sql() -> str:
    p, k = SK.HASH_P, SK.KMV_K
    return f"""
WITH hashed AS (
  SELECT DISTINCT ((epoch_ns(ts) // 1000000000) // 86400) AS day, event_type,
         ({SK.KMV_A} * (user_id % {p}) + {SK.KMV_B}) % {p} AS h
  FROM events
),
daily AS (
  SELECT day, event_type, h FROM (
    SELECT *, row_number() OVER (PARTITION BY day, event_type ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {k}
),
nd AS (SELECT event_type, count(DISTINCT day) AS n_days FROM daily GROUP BY 1),
u AS (SELECT DISTINCT event_type, h FROM daily),
topk AS (
  SELECT event_type, h FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM u
  ) WHERE rn <= {k}
),
g AS (
  SELECT event_type, count(*) AS n_hashes_kept, max(h) AS m_k
  FROM topk GROUP BY event_type
)
SELECT g.event_type, CAST(nd.n_days AS BIGINT) AS n_days,
       g.n_hashes_kept,
       CAST(CASE WHEN g.n_hashes_kept < {k} THEN g.n_hashes_kept
                 ELSE ({k - 1} * CAST({p} AS BIGINT)) // m_k END AS BIGINT)
         AS kmv_estimate
FROM g JOIN nd ON g.event_type = nd.event_type"""


def _kmv_sql() -> str:
    p, k = SK.HASH_P, SK.KMV_K
    return f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         ({SK.KMV_A} * (user_id % {p}) + {SK.KMV_B}) % {p} AS h
  FROM events
),
topk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed
),
g AS (
  SELECT event_type, count(*) AS n_hashes_kept, max(h) AS m_k
  FROM topk WHERE rn <= {k} GROUP BY event_type
)
SELECT event_type, n_hashes_kept,
       CAST(CASE WHEN n_hashes_kept < {k} THEN n_hashes_kept
                 ELSE (CAST({k - 1} AS BIGINT) * {p}) // m_k END AS BIGINT)
         AS kmv_estimate
FROM g"""


def q_kmv_set_ops(spark, sf_dir):
    return SK.kmv_set_ops(_events(spark, sf_dir))


def _kmv_set_ops_sql() -> str:
    p, k = SK.HASH_P, SK.KMV_K
    return f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         ({SK.KMV_A} * (user_id % {p}) + {SK.KMV_B}) % {p} AS h
  FROM events
),
sk AS (
  SELECT event_type, h FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {k}
),
types AS (SELECT DISTINCT event_type FROM sk),
prs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM types a JOIN types b ON a.event_type < b.event_type
),
comb AS (
  SELECT DISTINCT type_a, type_b, h FROM (
    SELECT p.type_a, p.type_b, s.h
    FROM prs p JOIN sk s ON s.event_type = p.type_a
    UNION ALL
    SELECT p.type_a, p.type_b, s.h
    FROM prs p JOIN sk s ON s.event_type = p.type_b
  )
),
kk AS (
  SELECT type_a, type_b, h FROM (
    SELECT *, row_number() OVER (PARTITION BY type_a, type_b
                                 ORDER BY h) AS rn
    FROM comb
  ) WHERE rn <= {k}
),
flagged AS (
  SELECT kk.type_a, kk.type_b, kk.h,
         CASE WHEN sa.h IS NOT NULL THEN 1 ELSE 0 END AS in_a,
         CASE WHEN sb.h IS NOT NULL THEN 1 ELSE 0 END AS in_b
  FROM kk
  LEFT JOIN sk sa ON sa.event_type = kk.type_a AND sa.h = kk.h
  LEFT JOIN sk sb ON sb.event_type = kk.type_b AND sb.h = kk.h
),
agg AS (
  SELECT type_a, type_b,
         CAST(count(*) AS BIGINT) AS n_kept, max(h) AS m_k,
         CAST(sum(in_a * in_b) AS BIGINT) AS inter_cnt,
         CAST(sum(in_a * (1 - in_b)) AS BIGINT) AS a_only_cnt,
         CAST(sum((1 - in_a) * in_b) AS BIGINT) AS b_only_cnt
  FROM flagged GROUP BY type_a, type_b
),
est AS (
  SELECT *,
         CAST(CASE WHEN n_kept < {k} THEN n_kept
                   ELSE (CAST({k - 1} AS BIGINT) * {p}) // m_k END
              AS BIGINT) AS union_est
  FROM agg
)
SELECT type_a, type_b, n_kept, union_est,
       CAST((inter_cnt * union_est) // n_kept AS BIGINT) AS inter_est,
       CAST((a_only_cnt * union_est) // n_kept AS BIGINT) AS a_only_est,
       CAST((b_only_cnt * union_est) // n_kept AS BIGINT) AS b_only_est
FROM est"""


def q_ewma_daily(spark, sf_dir):
    return EA.ewma_daily(_events(spark, sf_dir))


def _ewma_daily_sql() -> str:
    # The SAME integer recurrence as the Spark in-row fold, walked as
    # a recursive CTE over the day-ordered daily rollup.
    am = EA.EWMA_ALPHA_MILLI
    return f"""
WITH RECURSIVE d AS (
  SELECT event_type, day,
         CAST(sum_c // n AS BIGINT) AS avg_c,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY day) AS BIGINT) AS rn
  FROM (
    SELECT event_type, (epoch_ns(ts) // 1000000000) // 86400 AS day,
           sum(CAST(round(value * 100) AS BIGINT)) AS sum_c,
           count(*) AS n
    FROM events GROUP BY 1, 2
  )
),
r AS (
  SELECT event_type, day, avg_c, rn, avg_c AS ewma_c
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.event_type, d.day, d.avg_c, d.rn,
         CAST(({1000 - am} * r.ewma_c + {am} * d.avg_c) // 1000 AS BIGINT)
  FROM d JOIN r ON d.event_type = r.event_type AND d.rn = r.rn + 1
)
SELECT event_type, day, avg_c AS daily_avg_c, ewma_c FROM r"""


def q_seasonal_anomalies(spark, sf_dir):
    return EA.seasonal_anomalies(_events(spark, sf_dir))


def _seasonal_anomaly_sql() -> str:
    z = EA.ANOMALY_Z
    return f"""
WITH base AS (
  SELECT event_id, event_type, value,
         CAST(round(value * 100) AS BIGINT) AS vc,
         CAST(((epoch_ns(ts) // 1000000000) // 3600) % 24 AS BIGINT) AS hour
  FROM events
),
stats AS (
  SELECT event_type, hour, count(*) AS n,
         CAST(sum(vc) AS BIGINT) AS sum_c,
         CAST(sum(vc * vc) AS BIGINT) AS sumsq_c2
  FROM base GROUP BY event_type, hour
),
moments AS (
  SELECT event_type, hour, n, sum_c,
         (CAST(sumsq_c2 AS DOUBLE)
          - CAST(n AS DOUBLE)
            * (CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE)))
         / CAST(n AS DOUBLE) AS var
  FROM stats
),
scored AS (
  SELECT b.event_id, b.event_type, b.hour, b.value,
         CASE WHEN s.var > 0 THEN
           (CAST(b.vc AS DOUBLE) - CAST(s.sum_c AS DOUBLE) / CAST(s.n AS DOUBLE))
             / sqrt(s.var)
         ELSE 0.0 END AS z
  FROM base b JOIN moments s
    ON b.event_type = s.event_type AND b.hour = s.hour
)
SELECT event_id, event_type, hour, value,
       CAST(round(z * 1000) AS BIGINT) AS z_milli
FROM scored WHERE abs(z) > {z}"""


def q_linear_attribution(spark, sf_dir):
    return EA.linear_attribution(_events(spark, sf_dir))


def _linear_attribution_sql() -> str:
    w = EA.ATTRIBUTION_WINDOW_SEC
    chans = EA.TOUCH_TYPES
    n_cols = ",\n         ".join(
        f"coalesce(sum(CASE WHEN event_type = '{ch}' THEN 1 ELSE 0 END)"
        f" OVER (PARTITION BY user_id ORDER BY ts_sec"
        f" RANGE BETWEEN {w} PRECEDING AND 1 PRECEDING), 0) AS n_{ch}"
        for ch in chans
    )
    total = " + ".join(f"n_{ch}" for ch in chans)
    branches = "\n  UNION ALL\n".join(
        f"  SELECT '{ch}' AS touch_type, n_{ch} AS n_ch,\n"
        f"         CASE WHEN n_total > 0\n"
        f"              THEN (1000000 * n_{ch}) // n_total ELSE 0 END"
        " AS credit_ppm\n"
        "  FROM conv"
        for ch in chans
    )
    return f"""
WITH base AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec
  FROM events
),
counted AS (
  SELECT event_id, user_id, event_type, ts_sec,
         {n_cols}
  FROM base
),
conv AS (
  SELECT *, {total} AS n_total FROM counted
  WHERE event_type = 'purchase'
),
credit AS (
{branches}
  UNION ALL
  SELECT 'unattributed', CASE WHEN n_total = 0 THEN 1 ELSE 0 END,
         CASE WHEN n_total = 0 THEN 1000000 ELSE 0 END
  FROM conv
)
SELECT touch_type,
       CAST(sum(CASE WHEN n_ch > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_conversions,
       CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_total
FROM credit GROUP BY touch_type"""


def q_time_decay_attribution(spark, sf_dir):
    return EA.time_decay_attribution(_events(spark, sf_dir))


def _time_decay_attribution_sql() -> str:
    chans = EA.TOUCH_TYPES
    nd = EA.DECAY_DAYS
    w_cols = []
    for ch in chans:
        units = " + ".join(
            f"coalesce(sum(CASE WHEN event_type = '{ch}'"
            f" THEN CAST({1 << (nd - 1 - d)} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
            f" OVER (PARTITION BY user_id ORDER BY ts_sec"
            f" RANGE BETWEEN {(d + 1) * 86400} PRECEDING"
            f" AND {d * 86400 + 1} PRECEDING), 0)"
            for d in range(nd)
        )
        w_cols.append(f"{units} AS w_{ch}")
    w_sel = ",\n         ".join(w_cols)
    total = " + ".join(f"w_{ch}" for ch in chans)
    branches = "\n  UNION ALL\n".join(
        f"  SELECT '{ch}' AS touch_type, w_{ch} AS w_ch,\n"
        f"         CASE WHEN w_total > 0\n"
        f"              THEN (1000000 * w_{ch}) // w_total ELSE 0 END"
        " AS credit_ppm\n"
        "  FROM conv"
        for ch in chans
    )
    return f"""
WITH base AS (
  SELECT event_id, user_id, event_type,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec
  FROM events
),
counted AS (
  SELECT event_id, user_id, event_type, ts_sec,
         {w_sel}
  FROM base
),
conv AS (
  SELECT *, {total} AS w_total FROM counted
  WHERE event_type = 'purchase'
),
credit AS (
{branches}
  UNION ALL
  SELECT 'unattributed', CASE WHEN w_total = 0 THEN 1 ELSE 0 END,
         CASE WHEN w_total = 0 THEN 1000000 ELSE 0 END
  FROM conv
)
SELECT touch_type,
       CAST(sum(CASE WHEN w_ch > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_conversions,
       CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_total
FROM credit GROUP BY touch_type"""


def q_bot_audit(spark, sf_dir):
    return EA.bot_audit(_events(spark, sf_dir))


def _bot_audit_sql() -> str:
    return f"""
WITH base AS (
  SELECT event_id, user_id,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_sec
  FROM events
),
gaps AS (
  SELECT user_id,
         ts_sec - lag(ts_sec) OVER (PARTITION BY user_id
                                    ORDER BY ts_sec, event_id) AS gap
  FROM base
),
per_user AS (
  SELECT user_id, count(*) AS n_events, count(gap) AS n_gaps,
         sum(gap) AS sum_gap, sum(gap * gap) AS sum_gap2,
         min(gap) AS min_gap_sec
  FROM gaps GROUP BY user_id
  HAVING count(*) >= {EA.BOT_MIN_EVENTS}
),
stats AS (
  SELECT user_id, n_events, n_gaps,
         sum_gap * 1000 // n_gaps AS mean_gap_milli,
         CASE WHEN sum_gap > 0 THEN
           CAST(floor(sqrt(CAST(n_gaps * sum_gap2 - sum_gap * sum_gap
                                AS DOUBLE))) AS BIGINT) * 1000 // sum_gap
         ELSE 0 END AS cv_milli,
         min_gap_sec
  FROM per_user
)
SELECT CAST(row_number() OVER (ORDER BY cv_milli, mean_gap_milli, user_id)
            AS BIGINT) AS suspicion_rank,
       user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_gaps AS BIGINT) AS n_gaps,
       CAST(mean_gap_milli AS BIGINT) AS mean_gap_milli,
       CAST(cv_milli AS BIGINT) AS cv_milli,
       CAST(min_gap_sec AS BIGINT) AS min_gap_sec
FROM stats
ORDER BY cv_milli, mean_gap_milli, user_id
LIMIT {EA.BOT_AUDIT_N}"""


def _cms_sql() -> str:
    p, w = SK.HASH_P, SK.CMS_WIDTH
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS depth, "
        f"(({a} * (user_id % {p}) + {b}) % {p}) % {w} AS slot FROM events"
        for i, (a, b) in enumerate(SK.CMS_AB)
    ]
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH cells AS (
{union}
)
SELECT depth, slot, count(*) AS n_events FROM cells GROUP BY depth, slot"""


def events_oracle_sql() -> dict[str, str]:
    return {
        "events_sessionize": _SESSIONIZE_SQL,
        "events_asof_attribution": _ASOF_SQL,
        "events_retention_cohorts": _RETENTION_SQL,
        "events_value_histogram": _HISTOGRAM_SQL,
        "events_top_per_user": _TOP_PER_USER_SQL,
        "events_funnel": _FUNNEL_SQL,
        "events_hourly_rollup": _ROLLUP_SQL,
        "events_value_anomalies": _ANOMALY_SQL,
        "events_dau_wau": _DAU_WAU_SQL,
        "events_value_deciles": _DECILES_SQL,
        "events_multi_action_users": _MULTI_ACTION_SQL,
        "events_scd2_intervals": _SCD2_SQL,
        "events_daily_moving_avg": _MOVING_AVG_SQL,
        "events_time_weighted_avg": _TW_AVG_SQL,
        "events_gapfill_locf": _GAPFILL_SQL,
        "events_props_stats": _PROPS_STATS_SQL,
        "events_exact_median": _EXACT_MEDIAN_SQL,
        "events_key_skew": _KEY_SKEW_SQL,
        "events_heavy_hitters": _heavy_hitters_sql(),
        "events_kmv_distinct": _kmv_sql(),
        "events_cms_table": _cms_sql(),
        "events_kmv_daily_merge": _kmv_daily_merge_sql(),
        "events_kmv_set_ops": _kmv_set_ops_sql(),
        "events_ewma_daily": _ewma_daily_sql(),
        "events_seasonal_anomalies": _seasonal_anomaly_sql(),
        "events_linear_attribution": _linear_attribution_sql(),
        "events_time_decay_attribution": _time_decay_attribution_sql(),
        "events_bot_audit": _bot_audit_sql(),
        "events_session_paths": _session_paths_sql(),
        "events_audience_overlap": _AUDIENCE_OVERLAP_SQL,
        "events_new_vs_returning": _NEW_VS_RETURNING_SQL,
        "events_conversion_latency": _conversion_latency_sql(),
        "events_punch_card": _PUNCH_CARD_SQL,
        "events_ab_split_audit": _AB_SPLIT_SQL,
        "events_hll_distinct": _hll_sql(),
        "events_asof_join": _ASOF_JOIN_SQL,
        "events_time_band_pairs": _TIME_BAND_SQL,
        "events_interarrival": _INTERARRIVAL_SQL,
        "events_hopping_rollup": _HOPPING_SQL,
        "events_type_day_pivot": _PIVOT_SQL,
        "events_transition_matrix": _TRANSITION_SQL,
        "events_winsorized": _WINSOR_SQL,
        "events_cusum_changepoint": _CUSUM_SQL,
        "events_scd2_lookup": _SCD2_LOOKUP_SQL,
        "events_funnel_within": _funnel_within_sql(),
        "events_incremental_rollup": _ROLLUP_SQL,
        "events_range_join_counts": _RANGE_JOIN_SQL,
        "events_ohlc_daily": _OHLC_SQL,
        "events_hist_quantile_audit": _HIST_QUANTILE_SQL,
    }


def q_asof_join(spark, sf_dir):
    return EA.asof_join_events(_events(spark, sf_dir))


def q_time_band_pairs(spark, sf_dir):
    return EA.time_band_pairs(_events(spark, sf_dir))


def q_interarrival(spark, sf_dir):
    return EA.interarrival_stats(_events(spark, sf_dir))


# DuckDB's native ASOF LEFT JOIN is an entirely independent
# implementation of the inclusive as-of contract — a stronger oracle
# than a structural mirror of the Spark union+window plan. The right
# side is pre-collapsed to one row per (user, ts) (max event_id wins)
# in BOTH engines so duplicate-timestamp matches are deterministic.
_ASOF_JOIN_SQL = f"""
WITH {_EV_CTE},
l AS (
  SELECT event_id, user_id, ts_sec FROM ev
  WHERE event_type = '{EA.ASOF_TARGET_TYPE}'
),
r AS (
  SELECT user_id, ts_sec, CAST(max(event_id) AS BIGINT) AS matched_event_id
  FROM ev WHERE event_type = '{EA.ASOF_REF_TYPE}'
  GROUP BY user_id, ts_sec
)
SELECT l.event_id, l.user_id, l.ts_sec,
       r.matched_event_id,
       r.ts_sec AS matched_ts_sec,
       l.ts_sec - r.ts_sec AS lag_sec
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts_sec >= r.ts_sec"""

# Oracle = the NAIVE range join the bucketed plan replaces: an
# independent formulation of the band predicate.
_TIME_BAND_SQL = f"""
WITH {_EV_CTE},
l AS (SELECT event_id AS left_event_id, ts_sec AS left_sec FROM ev
      WHERE event_type = '{EA.BAND_LEFT_TYPE}'),
r AS (SELECT event_id AS right_event_id, ts_sec AS right_sec FROM ev
      WHERE event_type = '{EA.BAND_RIGHT_TYPE}')
SELECT left_event_id, right_event_id,
       right_sec - left_sec AS gap_sec
FROM l JOIN r ON right_sec - left_sec BETWEEN -{EA.BAND_SEC} AND {EA.BAND_SEC}"""

_INTERARRIVAL_SQL = f"""
WITH {_EV_CTE},
g AS (
  SELECT user_id,
         ts_sec - lag(ts_sec) OVER (PARTITION BY user_id
                                    ORDER BY ts_sec, event_id) AS gap_sec
  FROM ev
)
SELECT user_id, count(*) AS n_gaps,
       CAST(min(gap_sec) AS BIGINT) AS min_gap_sec,
       CAST(max(gap_sec) AS BIGINT) AS max_gap_sec,
       CAST((sum(gap_sec) * 1000) // count(*) AS BIGINT) AS mean_gap_milli
FROM g WHERE gap_sec IS NOT NULL GROUP BY user_id"""




def q_hopping_rollup(spark, sf_dir):
    return EA.hopping_rollup(_events(spark, sf_dir))


def q_type_day_pivot(spark, sf_dir):
    return EA.type_day_pivot(_events(spark, sf_dir))


def q_transition_matrix(spark, sf_dir):
    return EA.transition_matrix(_events(spark, sf_dir))


_HOPPING_SQL = f"""
WITH {_EV_CTE},
fanned AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS val_c,
         unnest(list_transform(range(0, {EA.HOP_SIZE_SEC // EA.HOP_SLIDE_SEC}),
                k -> (ts_sec // {EA.HOP_SLIDE_SEC} - k) * {EA.HOP_SLIDE_SEC}))
           AS window_start_sec
  FROM ev
)
SELECT event_type, window_start_sec, count(*) AS n_events,
       CAST(sum(val_c) AS BIGINT) AS sum_value_c
FROM fanned GROUP BY event_type, window_start_sec"""

_PIVOT_SQL = f"""
WITH {_EV_CTE}
SELECT ts_sec // 86400 AS day,
       {", ".join(f"count(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}" for t in EA.EVENT_TYPES)}
FROM ev GROUP BY day"""

_TRANSITION_SQL = f"""
WITH {_EV_CTE},
seq AS (
  SELECT event_type AS next_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts_sec, event_id) AS prev_type
  FROM ev
),
pairs AS (
  SELECT prev_type, next_type, count(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_transitions,
       CAST((n_transitions * 1000000)
            // sum(n_transitions) OVER (PARTITION BY prev_type)
            AS BIGINT) AS prob_ppm
FROM pairs"""




def q_winsorized(spark, sf_dir):
    return EA.winsorized_stats(_events(spark, sf_dir))


_WINSOR_SQL = f"""
WITH {_EV_CTE},
base AS (
  SELECT event_type, event_id, CAST(round(value * 100) AS BIGINT) AS val_c
  FROM ev
),
ranked AS (
  SELECT event_type, val_c,
         row_number() OVER (PARTITION BY event_type ORDER BY val_c, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM base
),
cuts AS (
  SELECT event_type,
         CAST(min(val_c) AS BIGINT) AS cut_lo_c,
         CAST(max(val_c) AS BIGINT) AS cut_hi_c
  FROM ranked
  WHERE rn = (n + {EA.WINSOR_TRIM_DIV - 1}) // {EA.WINSOR_TRIM_DIV}
     OR rn = n + 1 - ((n + {EA.WINSOR_TRIM_DIV - 1}) // {EA.WINSOR_TRIM_DIV})
  GROUP BY event_type
),
clipped AS (
  SELECT b.event_type, b.val_c, c.cut_lo_c, c.cut_hi_c,
         least(greatest(b.val_c, c.cut_lo_c), c.cut_hi_c) AS wv
  FROM base b JOIN cuts c USING (event_type)
),
g AS (
  SELECT event_type, count(*) AS n_events,
         CAST(min(cut_lo_c) AS BIGINT) AS cut_lo_c,
         CAST(max(cut_hi_c) AS BIGINT) AS cut_hi_c,
         count(CASE WHEN val_c < cut_lo_c THEN 1 END) AS n_clipped_lo,
         count(CASE WHEN val_c > cut_hi_c THEN 1 END) AS n_clipped_hi,
         CAST(sum(wv) AS BIGINT) AS sum_winsor_c
  FROM clipped GROUP BY event_type
)
SELECT event_type, n_events, cut_lo_c, cut_hi_c, n_clipped_lo, n_clipped_hi,
       sum_winsor_c,
       CAST((sum_winsor_c * 1000) // n_events AS BIGINT) AS winsor_mean_milli
FROM g"""




def q_cusum(spark, sf_dir):
    return EA.cusum_changepoint(_events(spark, sf_dir))


_CUSUM_SQL = f"""
WITH {_EV_CTE},
daily AS (
  SELECT event_type, ts_sec // 86400 AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS daily_sum_c
  FROM ev GROUP BY 1, 2
),
stats AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(daily_sum_c) AS BIGINT) AS total_c
  FROM daily GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.day, s.n_days,
         d.daily_sum_c * s.n_days - s.total_c AS dev_xd
  FROM daily d JOIN stats s USING (event_type)
),
scored AS (
  SELECT event_type, day, n_days,
         CAST(sum(dev_xd) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cusum_xd
  FROM dev
),
ranked AS (
  SELECT event_type, n_days, day, abs(cusum_xd) AS mag,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(cusum_xd) DESC, day) AS rnk
  FROM scored
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(day AS BIGINT) AS peak_day,
       CAST(mag AS BIGINT) AS peak_abs_cusum_xd
FROM ranked WHERE rnk = 1"""




def q_scd2_lookup(spark, sf_dir):
    return EA.scd2_lookup(_events(spark, sf_dir))


# Containment stated as the NAIVE interval range join over the same
# recursive-free SCD2 build — independent of the Spark as-of plan.
_SCD2_LOOKUP_SQL = f"""
WITH {_EV_CTE},
flagged AS (
  SELECT user_id, event_type, ts_sec, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS is_change
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
),
versioned AS (
  SELECT user_id, event_type, ts_sec,
         CAST(sum(is_change) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS version
  FROM flagged
),
iv AS (
  SELECT user_id, version, min(event_type) AS regime,
         min(ts_sec) AS valid_from_sec
  FROM versioned GROUP BY user_id, version
),
dim AS (
  SELECT user_id, version, regime, valid_from_sec,
         CAST(coalesce(lead(valid_from_sec)
              OVER (PARTITION BY user_id ORDER BY version), -1) AS BIGINT)
           AS valid_to_sec
  FROM iv
)
SELECT e.event_id, e.user_id, e.ts_sec, d.version, d.regime
FROM ev e JOIN dim d
  ON e.user_id = d.user_id
 AND e.ts_sec >= d.valid_from_sec
 AND (d.valid_to_sec = -1 OR e.ts_sec < d.valid_to_sec)
WHERE e.event_type = 'purchase'"""




def q_funnel_within(spark, sf_dir):
    return EA.funnel_within(_events(spark, sf_dir))


def _funnel_within_sql() -> str:
    t = EA.FUNNEL_WITHIN_SEC
    return f"""
WITH {_EV_CTE},
s0 AS (
  SELECT *, min(CASE WHEN event_type = 'view' THEN ts_sec END)
         OVER (PARTITION BY user_id) AS t0 FROM ev
),
s1 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts_sec > t0
                     AND ts_sec <= t0 + {t} THEN ts_sec END)
         OVER (PARTITION BY user_id) AS t1 FROM s0
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts_sec > t1
                     AND ts_sec <= t1 + {t} THEN ts_sec END)
         OVER (PARTITION BY user_id) AS t2 FROM s1
),
u AS (SELECT DISTINCT user_id, t0, t1, t2 FROM s2),
c AS (SELECT count(t0) AS n0, count(t1) AS n1, count(t2) AS n2 FROM u)
SELECT CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage, n0 AS n_users FROM c
UNION ALL
SELECT CAST(1 AS BIGINT), 'click', n1 FROM c
UNION ALL
SELECT CAST(2 AS BIGINT), 'purchase', n2 FROM c"""




def q_incremental_rollup(spark, sf_dir):
    return EA.incremental_rollup_merge(_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Round-8 addition: bucketed range join (point-in-interval without a
# nested loop)
# ---------------------------------------------------------------------------


def q_range_join_counts(spark, sf_dir):
    return EA.range_join_window_counts(_events(spark, sf_dir))


_RANGE_JOIN_SQL = f"""
WITH {_EV_CTE},
days AS (SELECT DISTINCT ts_sec // 86400 AS interval_day FROM ev),
win AS (
  SELECT interval_day,
         interval_day * 86400 + {EA.MAINT_START_OFFSET_S} AS w_start,
         interval_day * 86400 + {EA.MAINT_START_OFFSET_S}
           + {EA.MAINT_DURATION_S} AS w_end
  FROM days
)
SELECT win.interval_day, w_start, w_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM ev JOIN win
  ON ev.ts_sec >= win.w_start AND ev.ts_sec < win.w_end
GROUP BY 1, 2, 3"""


def q_ohlc_daily(spark, sf_dir):
    return EA.ohlc_daily(_events(spark, sf_dir))


_OHLC_SQL = f"""
WITH {_EV_CTE},
cents AS (
  SELECT event_type, (ts_sec // 86400) * 86400 AS day_start_sec,
         ts_sec, event_id,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM ev
),
ranked AS (
  SELECT *,
         row_number() OVER wa AS rn_first,
         row_number() OVER wd AS rn_last
  FROM cents
  WINDOW wa AS (PARTITION BY event_type, day_start_sec
                ORDER BY ts_sec, event_id),
         wd AS (PARTITION BY event_type, day_start_sec
                ORDER BY ts_sec DESC, event_id DESC)
)
SELECT event_type, CAST(day_start_sec AS BIGINT) AS day_start_sec,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(CASE WHEN rn_first = 1 THEN v END) AS BIGINT) AS open_c,
       CAST(max(v) AS BIGINT) AS high_c,
       CAST(min(v) AS BIGINT) AS low_c,
       CAST(max(CASE WHEN rn_last = 1 THEN v END) AS BIGINT) AS close_c
FROM ranked
GROUP BY 1, 2"""


def q_hist_quantile_audit(spark, sf_dir):
    return SK.hist_quantile_audit(_events(spark, sf_dir))


_HIST_QUANTILE_SQL = f"""
WITH {_EV_CTE},
vals AS (
  SELECT event_id, value AS v FROM ev WHERE value IS NOT NULL
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
hist AS (
  SELECT CAST(floor(v / CAST({SK.HIST_BIN_WIDTH!r} AS DOUBLE)) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS c
  FROM vals GROUP BY 1
),
cum AS (
  SELECT bin, CAST(sum(c) OVER (ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM hist
),
qrows AS (
  SELECT u.q_pct AS q_pct, n, (u.q_pct * n + 99) // 100 AS k
  FROM nt CROSS JOIN (
    SELECT unnest([{', '.join('CAST(%d AS INT)' % q for q in SK.HIST_QUANTILES)}])
      AS q_pct) u
),
approx AS (
  SELECT q_pct, n, k,
         -- bare 8.0 would parse as DECIMAL (texthash.sql_quantized6's
         -- gotcha) and poison approx_upper/err_micro with Decimal types
         (min(bin) + 1) * CAST({SK.HIST_BIN_WIDTH!r} AS DOUBLE) AS approx_upper
  FROM qrows JOIN cum ON cum.cum >= qrows.k
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT v, row_number() OVER (ORDER BY v, event_id) AS rn FROM vals
)
SELECT q_pct, n, k, v AS exact_value, approx_upper,
       CAST(round((approx_upper - v) * 1e6) AS BIGINT) AS err_micro
FROM approx JOIN ranked ON ranked.rn = approx.k"""
