"""Dashboard queries over a hand-built star (D1-D10)."""

from __future__ import annotations

import datetime

import pytest

from iot_real_time_data_pipeline_spark.operators import dashboard as D


@pytest.fixture
def star(spark):
    t0 = datetime.datetime(2024, 3, 1, 6, 0)
    t1 = datetime.datetime(2024, 3, 1, 7, 0)
    fact = spark.createDataFrame(
        [
            (1, "e1", 1, 1, 1, t0, 20.0, 50.0, 1.0, "VALID"),
            (2, "e2", 1, 1, 1, t0, 30.0, 70.0, 2.0, "VALID"),
            (3, "e3", 2, 2, 2, t1, 40.0, 60.0, 3.0, "WARNING"),
        ],
        "fact_id long, evt_id string, location_key long, weather_key long, "
        "soil_key long, full_date timestamp, soil_temperature double, "
        "soil_humidity double, water_level double, validation_status string",
    )
    dim_weather = spark.createDataFrame(
        [(1, 20.0, 50.0, 10.0, 10.0, 0.0, 1000.0), (2, 30.0, 60.0, 20.0, 350.0, 1.0, 1010.0)],
        "weather_key long, weather_temperature double, weather_humidity double, "
        "wind_speed double, wind_direction double, rain double, surface_pressure double",
    )
    dim_soil = spark.createDataFrame(
        [(1, 7.0, 100.0, 50.0, 50.0), (2, 6.5, 120.0, 60.0, 60.0)],
        "soil_key long, ph double, nitrogen double, phosphorus double, potassium double",
    )
    dim_location = spark.createDataFrame(
        [(1, "loc_1", 23.0, 30.0), (2, "loc_2", 22.0, 28.0)],
        "location_key long, loc_id string, latitude double, longitude double",
    )
    dim_time = spark.createDataFrame(
        [(t0, 2024, 3, 1, 6, 0), (t1, 2024, 3, 1, 7, 0)],
        "full_date timestamp, year int, month int, day int, hour int, minute int",
    )
    return dict(fact=fact, dim_weather=dim_weather, dim_soil=dim_soil,
                dim_location=dim_location, dim_time=dim_time)


def test_d1_d2_tiles(star):
    assert D.avg_temperature(star["fact"]).collect()[0].avg_temperature == 30.0
    assert D.avg_humidity(star["fact"]).collect()[0].avg_humidity == 60.0


def test_d3_wind_speed_join(star):
    got = D.avg_wind_speed(star["fact"], star["dim_weather"]).collect()[0]
    assert got.avg_wind_speed == pytest.approx((10 + 10 + 20) / 3)


def test_d4_health_donut(star):
    rows = {r.validation_status: r for r in D.health_donut(star["fact"]).collect()}
    assert rows["VALID"].readings == 2
    assert rows["VALID"].share == pytest.approx(2 / 3)
    assert rows["WARNING"].share == pytest.approx(1 / 3)


def test_d5_by_hour(star):
    rows = {r.hour: r for r in
            D.temp_humidity_by_hour(star["fact"], star["dim_time"]).collect()}
    assert rows[6].sum_temperature == 50.0
    assert rows[7].sum_humidity == 60.0


def test_d6_compass_buckets(star):
    rows = {r.direction_category: r.readings for r in
            D.wind_direction_counts(star["fact"], star["dim_weather"]).collect()}
    assert rows == {"N": 3}  # 10° and 350° both bucket N


def test_d7_nutrients_unpivoted(star):
    rows = {r.nutrient: r.total for r in
            D.nutrient_levels(star["fact"], star["dim_soil"]).collect()}
    assert rows["Nitrogen"] == 100.0 + 100.0 + 120.0
    assert set(rows) == {"Nitrogen", "Phosphorus", "Potassium"}


def test_d8_d9_farm_names(star):
    rows = {r.farm: r for r in
            D.readings_by_location(star["fact"], star["dim_location"]).collect()}
    assert rows["Toshka"].readings == 2
    assert rows["Sharq El Owainat"].share == pytest.approx(1 / 3)
    water = {r.farm: r.total_water_level for r in
             D.water_level_by_farm(star["fact"], star["dim_location"]).collect()}
    assert water == {"Toshka": 3.0, "Sharq El Owainat": 3.0}


def test_slicers_filter_date_and_farm(star):
    import datetime

    got = D.avg_temperature(
        D.with_slicers(
            star["fact"],
            star["dim_location"],
            date_from=datetime.datetime(2024, 3, 1, 6, 30),
            farms=["Sharq El Owainat"],
        )
    ).collect()[0]
    assert got.avg_temperature == 40.0  # only e3 survives both slicers


def test_slicer_date_pushes_to_scan(star, spark, tmp_path):
    # the date predicate must reach the parquet scan as a pushed filter
    p = str(tmp_path / "fact_pq")
    star["fact"].write.parquet(p)
    fact = spark.read.parquet(p)
    import datetime

    plan = (
        D.with_slicers(fact, date_from=datetime.datetime(2024, 3, 1, 6, 30))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # note: no inferred IsNotNull — constraint propagation is disabled
    # session-wide (see session.py); the range predicate itself reaches
    # the parquet scan for row-group pruning.
    assert "DataFilters: [(full_date" in plan
    assert "GreaterThanOrEqual(full_date" in plan or "full_date" in plan.split("PushedFilters")[-1][:120]
