"""Weather enrichment source (reference S3, ``Producer /producer.py:302-345``).

The reference calls the Open-Meteo REST API per (lat, lon) with a 1 h
cache and falls back to synthetic "dummy" weather when the call fails.
Spark-first equivalent: the API snapshot becomes a small *lookup
DataFrame* keyed by location (exactly what the 1 h response cache is —
one row per location per refresh), broadcast-joined onto the stream;
missing lookups take a deterministic fallback via ``coalesce``.

At 100 TB the enrichment is a broadcast hash join against a table with
one row per distinct location — no shuffle of the event stream, no
per-row network calls (the reference's per-record HTTP would be the
first thing to die at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import WEATHER_FIELDS

# Deterministic stand-in for the reference's random dummy values
# (producer.py:334-345): midpoint of each uniform range; rain and
# precipitation are literal 0 and is_day literal 1 in the reference.
FALLBACK_WEATHER: dict[str, float] = {
    "temperature_2m": 27.5,      # uniform(20, 35) midpoint
    "relative_humidity_2m": 60.0,  # uniform(40, 80)
    "is_day": 1.0,
    "wind_speed_10m": 7.5,       # uniform(0, 15)
    "wind_direction_10m": 180.0,  # uniform(0, 360)
    "wind_gusts_10m": 10.0,      # uniform(0, 20)
    "rain": 0.0,
    "precipitation": 0.0,
    "surface_pressure": 1010.0,  # uniform(1000, 1020)
    "apparent_temperature": 28.0,  # uniform(18, 38)
}


def fallback_struct() -> Column:
    return F.struct(
        *[F.lit(FALLBACK_WEATHER[f]).alias(f) for f in WEATHER_FIELDS]
    )


def enrich_weather(
    events: DataFrame,
    lookup: DataFrame,
    on: str = "loc_id",
    output_col: str = "weather_data",
) -> DataFrame:
    """Broadcast-join weather onto the event stream with fallback.

    ``lookup`` carries one row per location: (``on``, one column per
    WEATHER_FIELDS entry) — the cached API snapshot. Events whose
    location has no snapshot get FALLBACK_WEATHER (producer.py:334-345's
    dummy-data path, made deterministic).
    """
    looked = F.struct(*[F.col(f"_w.{f}").alias(f) for f in WEATHER_FIELDS])
    w = lookup.select(
        F.col(on),
        *[F.col(f).alias(f) for f in WEATHER_FIELDS],
    ).alias("_w")
    return (
        events.alias("_e")
        .join(F.broadcast(w), on=on, how="left")
        .select(
            "_e.*",
            F.when(F.col(f"_w.{WEATHER_FIELDS[0]}").isNotNull(), looked)
            .otherwise(fallback_struct())
            .alias(output_col),
        )
    )
