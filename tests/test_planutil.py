"""Focused tests for the round-12 optimization internals:
functions/planutil.lazy_local_checkpoint and the read_table plan memo.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iot_real_time_data_pipeline_spark.functions import planutil as PU

SF_DIR = "/root/testdata/sf0.001"


def test_lazy_local_checkpoint_runs_no_job_and_truncates(spark):
    """The checkpoint must launch NO job at construction (registry
    enumeration / plan audits build operators without executing them),
    must truncate the analyzed plan to a leaf, and must restore the
    session confs it flips during the Dataset->RDD conversion."""
    aqe_before = spark.conf.get(PU.AQE_KEY)
    bc_before = spark.conf.get(PU.BROADCAST_KEY)
    df = (
        spark.range(10_000)
        .withColumn("k", F.col("id") % 7)
        .groupBy("k")
        .agg(F.count("*").alias("c"))
    )
    sc = spark.sparkContext
    sc.setJobGroup("planutil-lazy", "lazy ckpt construction")
    try:
        ck = PU.lazy_local_checkpoint(df)
        jobs = sc.statusTracker().getJobIdsForGroup("planutil-lazy")
        assert list(jobs) == [], "lazy checkpoint launched a job at construction"
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    # confs restored
    assert spark.conf.get(PU.AQE_KEY) == aqe_before
    assert spark.conf.get(PU.BROADCAST_KEY) == bc_before
    # lineage truncated: the optimized plan is a bare leaf (no Aggregate)
    plan = ck._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan and "LogicalRDD" in plan
    # and it still computes the right answer on first action
    rows = {r.k: r.c for r in ck.collect()}
    assert len(rows) == 7 and sum(rows.values()) == 10_000


def test_lazy_local_checkpoint_identical_results(spark):
    df = spark.range(1_000).withColumn("g", F.col("id") % 13)
    agg = df.groupBy("g").agg(F.sum("id").alias("s"))
    expect = sorted(map(tuple, agg.collect()))
    got = sorted(map(tuple, PU.lazy_local_checkpoint(agg).collect()))
    assert got == expect


def test_read_table_memo_same_session_same_plan(spark):
    """Repeat calls in one session return the SAME plan object (the
    construction-cost memo); a different (sf_dir, name) key misses."""
    from iot_real_time_data_pipeline_spark.entrypoints import read_table

    a = read_table(spark, SF_DIR, "documents")
    b = read_table(spark, SF_DIR, "documents")
    assert a is b
    c = read_table(spark, SF_DIR, "embeddings")
    assert c is not a
    # the memoized frame still reads fresh data from parquet per action
    assert a.count() == a.count() > 0


def test_read_table_memo_invalidates_on_new_session(spark):
    """A different SparkSession must not see the old session's plan."""
    from iot_real_time_data_pipeline_spark import entrypoints as EP

    df = EP.read_table(spark, SF_DIR, "documents")
    key = (SF_DIR, "documents")
    stored_session, stored_df = EP._READ_TABLE_MEMO[key]
    assert stored_session is spark and stored_df is df
    # simulate another session arriving: identity check must miss
    EP._READ_TABLE_MEMO[key] = (object(), df)
    try:
        rebuilt = EP.read_table(spark, SF_DIR, "documents")
        assert rebuilt is not df  # rebuilt, not served from the stale entry
        assert rebuilt.count() == df.count()
    finally:
        EP._READ_TABLE_MEMO.pop(key, None)
