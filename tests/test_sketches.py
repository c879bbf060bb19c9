"""Sketch operators: deterministic sketches (KMV, CMS) checked for
their probabilistic guarantees against exact answers, and the
Spark-native approximate aggregates bound by error tests (their
estimates are implementation-defined, so no SQL oracle exists)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iot_real_time_data_pipeline_spark.operators import events_analytics as EA
from iot_real_time_data_pipeline_spark.operators import sketches as SK

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from iot_real_time_data_pipeline_spark.entrypoints import read_table

    return EA.with_ts_sec(read_table(spark, SF_DIR, "events"))


def test_kmv_estimate_within_standard_error(spark, events):
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {r.event_type: r.kmv_estimate for r in SK.kmv_distinct(events).collect()}
    assert set(est) == set(exact)
    for t, n in exact.items():
        if n < SK.KMV_K:
            assert est[t] == n  # exact below saturation
        else:
            # KMV standard error ~ 1/sqrt(k-2); allow 4 sigma
            rel = abs(est[t] - n) / n
            assert rel < 4.0 / (SK.KMV_K - 2) ** 0.5, (t, est[t], n)


def test_kmv_exact_below_saturation(spark):
    rows = [(i, i % 10, "view", 1.0, i) for i in range(100)]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "value", "ts_sec"]
    )
    out = SK.kmv_distinct(df).collect()
    assert len(out) == 1 and out[0].kmv_estimate == 10


def test_kmv_set_ops_exact_below_saturation(spark):
    """Two overlapping small sets: every estimate must be EXACT (the
    combined sketch holds every hash below saturation)."""
    rows = [(i, i, "view", 1.0, i) for i in range(30)] + [
        (100 + i, 20 + i, "click", 1.0, i) for i in range(30)
    ]  # view users 0..29, click users 20..49 -> inter 10, union 50
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "value", "ts_sec"]
    )
    out = SK.kmv_set_ops(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b) == ("click", "view")
    assert r.union_est == 50 and r.inter_est == 10
    assert r.a_only_est == 20 and r.b_only_est == 20


def test_kmv_set_ops_within_standard_error(spark, events):
    """Saturated pairs: union within KMV sigma; inter/diff within the
    rho-estimator's (looser) combined error; identities hold exactly
    by construction (counts partition the combined sketch)."""
    exact_sets = {}
    for t, u in [
        (r.event_type, r.user_id)
        for r in events.select("event_type", "user_id").distinct().collect()
    ]:
        exact_sets.setdefault(t, set()).add(u)
    out = SK.kmv_set_ops(events).collect()
    types = sorted(exact_sets)
    assert {(r.type_a, r.type_b) for r in out} == {
        (a, b) for i, a in enumerate(types) for b in types[i + 1:]
    }
    for r in out:
        A, B = exact_sets[r.type_a], exact_sets[r.type_b]
        un, inter = len(A | B), len(A & B)
        sigma = 1.0 / (SK.KMV_K - 2) ** 0.5
        assert abs(r.union_est - un) / un < 4 * sigma
        # rho has binomial error on top of the union error; scale the
        # bound by the union size (absolute, since inter can be small)
        assert abs(r.inter_est - inter) < 8 * sigma * un
        assert abs(r.a_only_est - len(A - B)) < 8 * sigma * un
        assert abs(r.b_only_est - len(B - A)) < 8 * sigma * un


def test_cms_never_underestimates_and_is_tight_for_heavy_keys(spark, events):
    exact = {
        r.user_id: r.n
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    est = {
        r.user_id: r.est_count
        for r in SK.cms_estimate(events, events.select("user_id")).collect()
    }
    assert set(est) == set(exact)
    n_total = sum(exact.values())
    for u, n in exact.items():
        assert est[u] >= n  # one-sided CMS guarantee
        # epsilon = e/width per row, min over depth rows; generous bound
        assert est[u] - n <= 3 * n_total / SK.CMS_WIDTH


def test_cms_table_total_mass_per_depth_equals_row_count(spark, events):
    n = events.count()
    rows = SK.cms_table(events).collect()
    for d in range(SK.CMS_DEPTH):
        assert sum(r.n_events for r in rows if r.depth == d) == n


def test_cms_merge_is_cell_addition(spark, events):
    """Sketch of the union == cell-wise sum of the two halves' sketches
    — the algebraic property that makes CMS streamable/distributable."""
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    whole = {(r.depth, r.slot): r.n_events for r in SK.cms_table(events).collect()}
    merged: dict = {}
    for half in (a, b):
        for r in SK.cms_table(half).collect():
            merged[(r.depth, r.slot)] = merged.get((r.depth, r.slot), 0) + r.n_events
    assert merged == whole


def test_approx_user_stats_error_bounds(spark, events):
    exact_users = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_med = {
        r.event_type: r.m
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    out = {r.event_type: r for r in SK.approx_user_stats(events).collect()}
    for t, n in exact_users.items():
        r = out[t]
        assert abs(r.approx_users - n) / n < 0.1  # HLL++ default rsd 5%
        assert r.p50 <= r.p95
        # approx_percentile returns a real data value near the median
        spread = exact_med[t] * 0.25 + 1
        assert abs(r.p50 - exact_med[t]) <= spread


def test_kmv_merge_equals_direct(spark):
    """The KMV merge theorem, asserted exactly: k-min over the union of
    per-day k-min sets == k-min over all hashes, so the merged estimate
    must EQUAL the direct single-pass sketch for every event type."""
    from iot_real_time_data_pipeline_spark.entrypoints import read_table
    from iot_real_time_data_pipeline_spark.operators import events_analytics as EA
    from iot_real_time_data_pipeline_spark.operators import sketches as SK

    ev = EA.with_ts_sec(read_table(spark, "/root/testdata/sf0.01", "events"))
    direct = {r.event_type: r.kmv_estimate for r in SK.kmv_distinct(ev).collect()}
    merged = {r.event_type: r.kmv_estimate for r in SK.kmv_daily_merge(ev).collect()}
    assert merged == direct
    days = {r.event_type: r.n_days for r in SK.kmv_daily_merge(ev).collect()}
    assert all(v > 1 for v in days.values()), "needs multiple days to be a merge"


def test_hll_estimate_within_standard_error(spark):
    """HLL with m=64 registers has relative standard error
    1.04/sqrt(64) = 13%; assert the oracle-exact estimate lands within
    3 sigma of the true distinct count per event type."""
    from iot_real_time_data_pipeline_spark.entrypoints import read_table
    from iot_real_time_data_pipeline_spark.operators import events_analytics as EA
    from iot_real_time_data_pipeline_spark.operators import sketches as SK
    from pyspark.sql import functions as F

    ev = EA.with_ts_sec(read_table(spark, "/root/testdata/sf0.01", "events"))
    truth = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    est = {r.event_type: r.hll_estimate for r in SK.hll_distinct(ev).collect()}
    assert set(est) == set(truth)
    for t, n in truth.items():
        assert abs(est[t] - n) <= 3 * 0.13 * n + 2, (t, est[t], n)


def test_hist_quantile_audit_hand_math(spark):
    """Integers 1..100 at bin_width 8: every estimate is the first
    bin-edge whose cumulative count reaches k = ceil(q·N/100), and the
    error is bounded by one bin width."""
    rows = [(i, float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    out = {r.q_pct: r for r in SK.hist_quantile_audit(df).collect()}
    # p50: cum(bin5)=47 < 50 <= cum(bin6)=55 -> upper 56, exact 50
    assert (out[50].k, out[50].exact_value, out[50].approx_upper) == (50, 50.0, 56.0)
    # p90: cum(bin10)=87 < 90 <= cum(bin11)=95 -> upper 96, exact 90
    assert (out[90].k, out[90].exact_value, out[90].approx_upper) == (90, 90.0, 96.0)
    # p99: cum(bin12)=100 >= 99 -> upper 104, exact 99
    assert (out[99].k, out[99].exact_value, out[99].approx_upper) == (99, 99.0, 104.0)
    for r in out.values():
        assert 0 <= r.err_micro <= 8_000_000  # within one bin width
        assert r.n == 100


def test_hist_quantile_audit_ignores_nulls(spark):
    rows = [(1, 10.0), (2, None), (3, 20.0), (4, 30.0)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    out = {r.q_pct: r for r in SK.hist_quantile_audit(df).collect()}
    assert out[50].n == 3 and out[50].k == 2 and out[50].exact_value == 20.0
