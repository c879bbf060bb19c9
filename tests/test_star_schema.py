"""Star-schema ETL: dims, fact join invariant, watermark, incremental."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest

from iot_real_time_data_pipeline_spark.operators.star_schema import (
    build_fact,
    incremental_load,
    new_dim_location,
    new_dim_soil,
    new_dim_time,
    new_dim_weather,
    watermark_filter,
)
from iot_real_time_data_pipeline_spark.schemas import staging_schema


def ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def staging_rows(spark, rows):
    return spark.createDataFrame(rows, staging_schema())


def mk_row(event_id, t, loc="loc_1", lat=23.0, lon=30.0, temp=25.0, hum=60.0,
           wl=1.5, ph=7.0, n=110.0, p=60.0, k=60.0, wt=24.0, wh=50.0,
           ws=10.0, wd=180.0, rain=0.0, sp=1010.0, status="VALID"):
    return (event_id, ts(t), loc, lat, lon, temp, hum, wl, ph, n, p, k,
            wt, wh, ws, wd, rain, sp, status)


@pytest.fixture
def batch1(spark):
    return staging_rows(spark, [
        mk_row("e1", "2024-03-01T06:00:00"),
        mk_row("e2", "2024-03-01T06:01:00", temp=26.0),
        # duplicate measurement tuple of e1 -> same soil/weather dim rows
        mk_row("e3", "2024-03-01T06:02:00"),
        mk_row("e4", "2024-03-01T06:03:00", loc="loc_2", lat=22.4, lon=28.5,
               ph=7.7, status="WARNING"),
    ])


def test_fact_count_equals_staging_count(batch1):
    """SURVEY §7.3 — the double-equality dim joins must drop nothing."""
    out = incremental_load(batch1, existing=None, dense_keys=True)
    assert out["fact_sensor_readings"].count() == batch1.count()


def test_dim_distinct_and_keys(batch1):
    out = incremental_load(batch1, existing=None, dense_keys=True)
    soil = out["dim_soil"].collect()
    # e1/e2/e3 share (ph,n,p,k); e4 differs -> 2 rows, keys 1..2
    assert sorted(r.soil_key for r in soil) == [1, 2]
    loc = out["dim_location"].collect()
    assert sorted((r.location_key, r.loc_id) for r in loc) == [(1, "loc_1"), (2, "loc_2")]
    time = out["dim_time"].collect()
    assert len(time) == 4
    assert all(r.year == 2024 and r.hour == 6 for r in time)


def test_incremental_second_batch(spark, batch1):
    first = incremental_load(batch1, existing=None, dense_keys=True)
    existing = {k: v.localCheckpoint() for k, v in first.items()}

    batch2 = staging_rows(spark, [
        # stale row (before watermark) must be filtered out
        mk_row("e1b", "2024-03-01T05:59:00"),
        # new row, existing location + existing soil tuple
        mk_row("e5", "2024-03-01T06:10:00"),
        # new row, brand-new soil tuple
        mk_row("e6", "2024-03-01T06:11:00", ph=6.5, n=120.0),
    ])
    out = incremental_load(batch2, existing=existing, dense_keys=True)

    assert out["dim_location"].count() == 0  # both locs already present
    new_soil = out["dim_soil"].collect()
    assert len(new_soil) == 1  # only e6's tuple is new
    assert new_soil[0].soil_key == 3  # continues from existing max
    fact = out["fact_sensor_readings"].collect()
    assert sorted(r.evt_id for r in fact) == ["e5", "e6"]  # e1b filtered


def test_watermark_epoch_fallback(batch1):
    assert watermark_filter(batch1, None).count() == batch1.count()


def test_empty_batch_short_circuit(spark, batch1):
    """P5 — an empty staging batch yields empty outputs everywhere."""
    empty = staging_rows(spark, []).filter(F.lit(False))
    out = incremental_load(empty, existing=None)
    assert out["fact_sensor_readings"].isEmpty()
    assert out["dim_soil"].isEmpty()


def test_sparse_keys_are_unique(spark, batch1):
    out = incremental_load(batch1, existing=None, dense_keys=False)
    keys = [r.soil_key for r in out["dim_soil"].collect()]
    assert len(keys) == len(set(keys))
    fact_ids = [r.fact_id for r in out["fact_sensor_readings"].collect()]
    assert len(fact_ids) == len(set(fact_ids))


def test_fact_id_offsets_across_loads(spark, batch1):
    """fact_id is an IDENTITY PK (Creating Tables.sql:37): uniqueness must
    hold across incremental cycles, not just within one batch."""
    first = incremental_load(batch1, existing=None, dense_keys=True)
    existing = {k: v.localCheckpoint() for k, v in first.items()}
    batch2 = staging_rows(spark, [mk_row("e9", "2024-03-01T07:00:00")])
    second = incremental_load(batch2, existing=existing, dense_keys=True)
    ids1 = {r.fact_id for r in first["fact_sensor_readings"].collect()}
    ids2 = {r.fact_id for r in second["fact_sensor_readings"].collect()}
    assert ids1.isdisjoint(ids2)
