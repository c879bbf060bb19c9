"""The analytical query surface — the Power BI dashboard visuals
(``Dashboard/Dashboard.jpg``, SURVEY §2.5) as DataFrame queries over
``fact_sensor_readings`` + dims.

Every function takes the star-schema tables and returns the visual's
result set. All are plain groupBy/agg/join plans: partial aggregation
(map-side combine) and broadcast of the tiny dims come free from
Catalyst; the only shuffles are the final groupBys on low-cardinality
keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# D10 — loc_id -> dashboard display name (producer.py:43-47 names vs
# Dashboard.jpg labels).
FARM_NAMES = {
    "loc_1": "Toshka",
    "loc_2": "Sharq El Owainat",
    "loc_3": "Dina Farms",
}


def farm_name(loc_col) -> F.Column:
    expr = None
    for loc_id, name in FARM_NAMES.items():
        expr = (
            F.when(loc_col == loc_id, F.lit(name))
            if expr is None
            else expr.when(loc_col == loc_id, F.lit(name))
        )
    return expr.otherwise(loc_col)


def with_slicers(
    fact: DataFrame,
    dim_location: DataFrame | None = None,
    date_from=None,
    date_to=None,
    farms: list[str] | None = None,
) -> DataFrame:
    """The dashboard's two global slicers (date range + farm,
    Dashboard.jpg right edge) as pre-filters for any visual.

    Date bounds prune on ``full_date``; the farm slicer resolves display
    names through dim_location (broadcast) and semi-joins the fact.
    Applied before any visual, Catalyst pushes the date predicate into
    the fact scan (parquet row-group pruning at scale).
    """
    out = fact
    if date_from is not None:
        out = out.filter(F.col("full_date") >= F.lit(date_from).cast("timestamp"))
    if date_to is not None:
        out = out.filter(F.col("full_date") < F.lit(date_to).cast("timestamp"))
    if farms:
        if dim_location is None:
            raise ValueError("farm slicer needs dim_location")
        keys = dim_location.filter(
            farm_name(F.col("loc_id")).isin(farms)
        ).select("location_key")
        out = out.join(F.broadcast(keys), "location_key", "left_semi")
    return out


def avg_temperature(fact: DataFrame) -> DataFrame:
    """D1 — 'Average Temperature' tile."""
    return fact.agg(F.avg("soil_temperature").alias("avg_temperature"))


def avg_humidity(fact: DataFrame) -> DataFrame:
    """D2 — 'Average Humidity' tile."""
    return fact.agg(F.avg("soil_humidity").alias("avg_humidity"))


def avg_wind_speed(fact: DataFrame, dim_weather: DataFrame) -> DataFrame:
    """D3 — 'Average Wind Speed' tile (fact -> dim_weather join)."""
    return (
        fact.join(dim_weather, "weather_key", "inner")
        .agg(F.avg("wind_speed").alias("avg_wind_speed"))
    )


def health_donut(fact: DataFrame) -> DataFrame:
    """D4 — 'Farm Health Monitoring': count + share per status."""
    counts = fact.groupBy("validation_status").agg(F.count("*").alias("readings"))
    total = Window.partitionBy()
    return counts.select(
        "validation_status",
        "readings",
        (F.col("readings") / F.sum("readings").over(total)).alias("share"),
    )


def temp_humidity_by_hour(fact: DataFrame, dim_time: DataFrame) -> DataFrame:
    """D5 — 'Temperature & Humidity Over Time' dual line by hour."""
    return (
        fact.join(dim_time, "full_date", "inner")
        .groupBy("hour")
        .agg(
            F.sum("soil_temperature").alias("sum_temperature"),
            F.sum("soil_humidity").alias("sum_humidity"),
        )
        .orderBy("hour")
    )


def wind_direction_category(col) -> F.Column:
    """D6 — degrees -> compass category (8-way + Unknown)."""
    deg = col % 360
    return (
        F.when(deg.isNull(), F.lit("Unknown"))
        .when((deg >= 337.5) | (deg < 22.5), F.lit("N"))
        .when(deg < 67.5, F.lit("NE"))
        .when(deg < 112.5, F.lit("E"))
        .when(deg < 157.5, F.lit("SE"))
        .when(deg < 202.5, F.lit("S"))
        .when(deg < 247.5, F.lit("SW"))
        .when(deg < 292.5, F.lit("W"))
        .otherwise(F.lit("NW"))
    )


def wind_direction_counts(fact: DataFrame, dim_weather: DataFrame) -> DataFrame:
    """D6 — 'Count of Wind Direction by Direction Category'."""
    return (
        fact.join(dim_weather, "weather_key", "inner")
        .groupBy(wind_direction_category(F.col("wind_direction")).alias("direction_category"))
        .agg(F.count("*").alias("readings"))
        .orderBy("direction_category")
    )


def nutrient_levels(fact: DataFrame, dim_soil: DataFrame) -> DataFrame:
    """D7 — 'Nutrient Levels' bar: total N/P/K, unpivoted to long form."""
    sums = (
        fact.join(dim_soil, "soil_key", "inner")
        .agg(
            F.sum("nitrogen").alias("Nitrogen"),
            F.sum("phosphorus").alias("Phosphorus"),
            F.sum("potassium").alias("Potassium"),
        )
    )
    return sums.select(
        F.expr(
            "stack(3, 'Nitrogen', Nitrogen, 'Phosphorus', Phosphorus,"
            " 'Potassium', Potassium) as (nutrient, total)"
        )
    )


def readings_by_location(fact: DataFrame, dim_location: DataFrame) -> DataFrame:
    """D8 — 'Readings by Location' pie: count + share per farm."""
    counts = (
        fact.join(F.broadcast(dim_location), "location_key", "inner")
        .groupBy(farm_name(F.col("loc_id")).alias("farm"))
        .agg(F.count("*").alias("readings"))
    )
    total = Window.partitionBy()
    return counts.select(
        "farm",
        "readings",
        (F.col("readings") / F.sum("readings").over(total)).alias("share"),
    )


def water_level_by_farm(fact: DataFrame, dim_location: DataFrame) -> DataFrame:
    """D9 — 'water level' by farm."""
    return (
        fact.join(F.broadcast(dim_location), "location_key", "inner")
        .groupBy(farm_name(F.col("loc_id")).alias("farm"))
        .agg(
            F.sum("water_level").alias("total_water_level"),
            F.avg("water_level").alias("avg_water_level"),
        )
        .orderBy("farm")
    )
