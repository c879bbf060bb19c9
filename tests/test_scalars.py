"""Scalar column builders (F10/F11/F14) + flatten compiler (§2.12)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from iot_real_time_data_pipeline_spark.functions.scalars import clamp, event_id, round2


def test_event_id_shape_and_uniqueness(spark):
    df = spark.range(50).select(event_id().alias("eid"))
    ids = [r.eid for r in df.collect()]
    assert all(re.fullmatch(r"evt_[0-9a-f]{12}", i) for i in ids)
    assert len(set(ids)) == 50


def test_round2_and_clamp(spark):
    df = spark.createDataFrame([(1.005,), (99.999,), (-5.0,)], "v double")
    out = df.select(
        round2(F.col("v")).alias("r"), clamp(F.col("v"), 0.0, 10.0).alias("c")
    ).collect()
    assert [r.c for r in out] == [1.005, 10.0, 0.0]
    assert out[1].r == 100.0


def test_flatten_compiler_matches_reference_scheme(spark):
    from iot_real_time_data_pipeline_spark.functions.flatten import flatten

    df = spark.createDataFrame(
        [("e1", (1.0, 2.0), ["a", "b"])],
        "event_id string, location struct<latitude:double,longitude:double>, tags array<string>",
    )
    out = flatten(df)
    assert out.columns == ["event_id", "location_latitude", "location_longitude", "tags"]
    row = out.collect()[0]
    assert row.location_latitude == 1.0
    assert row.tags == '["a","b"]'  # lists JSON-stringified (lamda.py:343-344)
