"""DuckDB oracle SQL for the IoT-derived query surface.

Emits ANSI SQL (DuckDB dialect) that independently re-implements the
``entrypoints.iot_*`` derivation and the reference's validation / star
/ dashboard semantics (``Lambda/lamda.py:60-150``, ``DWH - Redshift/
Transforming Tables.sql``) from the same constants. The driver runs
this side-by-side with the Spark operators at sf=0.01 — two
implementations, one contract.

Everything is generated from ``schemas.EXPECTED_RANGES_PER_LOCATION``
and ``entrypoints.SENSOR_DERIVATION`` so the two sides cannot drift
silently. No rounding: both engines perform identical IEEE-double
arithmetic, which keeps the double-equality dim joins exact.
"""

from __future__ import annotations

from .entrypoints import (
    MOD_EMPTY_SENSORS,
    MOD_HUMIDITY_SENTINEL,
    MOD_MISSING_LOC,
    MOD_MISSING_WEATHER,
    MOD_NITROGEN_NULL,
    MOD_UNKNOWN_LOC,
    SENSOR_DERIVATION,
)
from .schemas import EXPECTED_RANGES_PER_LOCATION, SENSOR_NAMES


def _loc_bound(sensor: str, idx: int) -> str:
    cases = " ".join(
        f"WHEN '{loc}' THEN {float(ranges[sensor][idx])!r}"
        for loc, ranges in EXPECTED_RANGES_PER_LOCATION.items()
    )
    return f"(CASE loc_id {cases} END)"


def _derived(sensor: str) -> str:
    scale, offset, span = SENSOR_DERIVATION[sensor]
    # DuckDB note: use the % operator, not fmod() — duckdb fmod is
    # x-trunc(x/y)*y (inexact), while % matches C/Java fmod bit-exactly.
    return f"({offset!r} + ((value * {scale!r}) % {span!r}))"


def readings_cte() -> str:
    """The `readings` CTE — mirror of ``entrypoints.iot_raw_events``."""
    sensors = []
    for s in SENSOR_NAMES:
        expr = _derived(s)
        if s == "humidity":
            expr = f"(CASE WHEN event_id % {MOD_HUMIDITY_SENTINEL} = 0 THEN 9999.0 ELSE {expr} END)"
        elif s == "nitrogen":
            expr = f"(CASE WHEN event_id % {MOD_NITROGEN_NULL} = 0 THEN NULL ELSE {expr} END)"
        sensors.append(f"{expr} AS s_{s}")
    temp = _derived("temperature")
    return f"""
readings AS (
  SELECT
    'evt_' || CAST(event_id AS VARCHAR) AS event_id,
    ts AS timestamp,
    CASE WHEN event_id % {MOD_MISSING_LOC} = 0 THEN NULL
         WHEN event_id % {MOD_UNKNOWN_LOC} = 0 THEN 'loc_9'
         ELSE 'loc_' || CAST(user_id % 3 + 1 AS VARCHAR) END AS loc_id,
    22.0 + CAST(user_id % 3 AS DOUBLE) * 4.0 AS latitude,
    28.0 + CAST(user_id % 3 AS DOUBLE) * 1.25 AS longitude,
    (event_id % {MOD_EMPTY_SENSORS} = 0) AS sensors_empty,
    (event_id % {MOD_MISSING_WEATHER} = 0) AS weather_missing,
    {", ".join(sensors)},
    ({temp} + ((value * 3.7) % 44.0) - 22.0) AS w_temperature_2m,
    ((value * 1.9) % 100.0) AS w_relative_humidity_2m,
    ((value * 0.9) % 60.0) AS w_wind_speed_10m,
    ((value * 7.3) % 360.0) AS w_wind_direction_10m,
    ((value * 0.13) % 8.0) AS w_rain,
    990.0 + ((value * 0.41) % 40.0) AS w_surface_pressure
  FROM events
)"""


def _sensor_error(sensor: str) -> str:
    """INVALID-causing condition for one sensor (lamda.py:94-126).

    extreme (null or numeric sentinel) OR out-of-range beyond the 10%
    buffer. The derived stream has no quoted non-sentinel strings, so
    invalid_type never fires here (covered by unit tests instead).
    """
    v = f"s_{sensor}"
    lo, hi = _loc_bound(sensor, 0), _loc_bound(sensor, 1)
    buf = f"(({hi} - {lo}) * 0.1)"
    extreme = f"({v} IS NULL OR {v} IN (0.0, 9999.0, -9999.0))"
    oor = f"({v} < {lo} - {buf} OR {v} > {hi} + {buf})"
    return f"({extreme} OR {oor})"


def _sensor_warning(sensor: str) -> str:
    """WARNING-causing condition: near-threshold within the buffer."""
    v = f"s_{sensor}"
    lo, hi = _loc_bound(sensor, 0), _loc_bound(sensor, 1)
    buf = f"(({hi} - {lo}) * 0.1)"
    not_extreme = f"({v} IS NOT NULL AND {v} NOT IN (0.0, 9999.0, -9999.0))"
    near = (
        f"(({v} < {lo} AND {v} >= {lo} - {buf}) OR ({v} > {hi} AND {v} <= {hi} + {buf}))"
    )
    return f"({not_extreme} AND {near})"


def validated_cte() -> str:
    any_error = " OR ".join(_sensor_error(s) for s in SENSOR_NAMES)
    any_warning = " OR ".join(_sensor_warning(s) for s in SENSOR_NAMES)
    mismatch = "(NOT sensors_empty AND NOT weather_missing AND abs(s_temperature - w_temperature_2m) > 15)"
    return f"""
validated AS (
  SELECT *,
    CASE
      WHEN loc_id IS NULL THEN 'INVALID'
      WHEN loc_id NOT IN ('loc_1','loc_2','loc_3') THEN 'INVALID'
      WHEN sensors_empty THEN 'INVALID'
      WHEN weather_missing THEN 'INVALID'
      WHEN {any_error} THEN 'INVALID'
      WHEN {any_warning} OR {mismatch} THEN 'WARNING'
      ELSE 'VALID'
    END AS validation_status
  FROM readings
)"""


def staging_cte() -> str:
    sensor_cols = ", ".join(f"s_{s} AS {s}" for s in SENSOR_NAMES)
    return f"""
staging AS (
  SELECT
    event_id, timestamp, loc_id, latitude, longitude,
    {sensor_cols},
    w_temperature_2m AS weather_temperature_2m,
    w_relative_humidity_2m AS weather_relative_humidity_2m,
    w_wind_speed_10m AS weather_wind_speed_10m,
    w_wind_direction_10m AS weather_wind_direction_10m,
    w_rain AS weather_rain,
    w_surface_pressure AS weather_surface_pressure,
    validation_status
  FROM validated
  WHERE validation_status IN ('VALID','WARNING')
)"""


def star_ctes() -> str:
    """dim + fact CTEs mirroring operators/star_schema.py (which in turn
    implements Transforming Tables.sql:1-102). Surrogate keys:
    row_number ordered by the full business tuple — matches
    ``_assign_keys(dense_keys=True)`` exactly."""
    return """
dim_location AS (
  SELECT row_number() OVER (ORDER BY loc_id, latitude, longitude) AS location_key,
         loc_id, latitude, longitude
  FROM (SELECT DISTINCT loc_id, latitude, longitude FROM staging WHERE loc_id IS NOT NULL)
),
dim_time AS (
  SELECT DISTINCT
    timestamp AS full_date,
    CAST(EXTRACT(YEAR FROM timestamp) AS INT) AS year,
    CAST(EXTRACT(MONTH FROM timestamp) AS INT) AS month,
    CAST(EXTRACT(DAY FROM timestamp) AS INT) AS day,
    CAST(EXTRACT(HOUR FROM timestamp) AS INT) AS hour,
    CAST(EXTRACT(MINUTE FROM timestamp) AS INT) AS minute
  FROM staging WHERE timestamp IS NOT NULL
),
dim_soil AS (
  SELECT row_number() OVER (ORDER BY ph, nitrogen, phosphorus, potassium) AS soil_key,
         ph, nitrogen, phosphorus, potassium
  FROM (SELECT DISTINCT ph, nitrogen, phosphorus, potassium FROM staging
        WHERE ph IS NOT NULL AND nitrogen IS NOT NULL
          AND phosphorus IS NOT NULL AND potassium IS NOT NULL)
),
dim_weather AS (
  SELECT row_number() OVER (ORDER BY weather_temperature, weather_humidity, wind_speed,
                            wind_direction, rain, surface_pressure) AS weather_key,
         weather_temperature, weather_humidity, wind_speed, wind_direction, rain, surface_pressure
  FROM (SELECT DISTINCT
          weather_temperature_2m AS weather_temperature,
          weather_relative_humidity_2m AS weather_humidity,
          weather_wind_speed_10m AS wind_speed,
          weather_wind_direction_10m AS wind_direction,
          weather_rain AS rain,
          weather_surface_pressure AS surface_pressure
        FROM staging WHERE weather_temperature_2m IS NOT NULL)
),
fact AS (
  SELECT
    v.event_id AS evt_id,
    l.location_key,
    w.weather_key,
    s.soil_key,
    t.full_date,
    v.temperature AS soil_temperature,
    v.humidity AS soil_humidity,
    v.water_level,
    v.validation_status
  FROM staging v
  JOIN dim_location l
    ON v.loc_id = l.loc_id AND v.latitude = l.latitude AND v.longitude = l.longitude
  JOIN dim_weather w
    ON v.weather_temperature_2m = w.weather_temperature
   AND v.weather_relative_humidity_2m = w.weather_humidity
   AND v.weather_wind_speed_10m = w.wind_speed
   AND v.weather_wind_direction_10m = w.wind_direction
   AND v.weather_rain = w.rain
   AND v.weather_surface_pressure = w.surface_pressure
  JOIN dim_soil s
    ON v.ph = s.ph AND v.nitrogen = s.nitrogen
   AND v.phosphorus = s.phosphorus AND v.potassium = s.potassium
  JOIN dim_time t ON v.timestamp = t.full_date
)"""


def _extreme_cond(sensor: str) -> str:
    v = f"s_{sensor}"
    return f"({v} IS NULL OR {v} IN (0.0, 9999.0, -9999.0))"


def _oor_cond(sensor: str) -> str:
    v = f"s_{sensor}"
    lo, hi = _loc_bound(sensor, 0), _loc_bound(sensor, 1)
    buf = f"(({hi} - {lo}) * 0.1)"
    not_extreme = f"({v} IS NOT NULL AND {v} NOT IN (0.0, 9999.0, -9999.0))"
    return f"({not_extreme} AND ({v} < {lo} - {buf} OR {v} > {hi} + {buf}))"


def alerts_cte() -> str:
    """The alert rule engine R1-R5 (``Lambda/lamda.py:152-244``) in SQL.

    One row per fired alert, mirroring ``functions.alerts.alerts_column``:
    R1 fires one CRITICAL 'Sensor Failure' per error *class* present
    (extreme / out_of_range; the 'missing' class is unreachable because
    null sensors classify as extreme — reference quirk), R2-R5 are the
    operational rules over post-conversion numeric values, only for
    VALID/WARNING rows. Sensor errors are only evaluated when the row
    got past the loc_id / empty-sensor short-circuits.
    """
    any_extreme = " OR ".join(_extreme_cond(s) for s in SENSOR_NAMES)
    any_oor = " OR ".join(_oor_cond(s) for s in SENSOR_NAMES)
    eligible = (
        "(loc_id IS NOT NULL AND loc_id IN ('loc_1','loc_2','loc_3') AND NOT sensors_empty)"
    )
    carry = "loc_id, event_id, timestamp"
    nutrient_rules = "\n  UNION ALL\n".join(
        f"""  SELECT 'Low Nutrient' AS alert_type, 'MEDIUM' AS priority, {carry}
  FROM flagged WHERE operational AND s_{n} < {_loc_bound(n, 0)} * 0.8"""
        for n in ["nitrogen", "phosphorus", "potassium"]
    )
    return f"""
flagged AS (
  SELECT *,
    ({eligible} AND ({any_extreme})) AS has_extreme,
    ({eligible} AND ({any_oor})) AS has_oor,
    (validation_status IN ('VALID','WARNING')) AS operational
  FROM validated
),
alerts AS (
  SELECT 'Sensor Failure' AS alert_type, 'CRITICAL' AS priority, {carry}
  FROM flagged WHERE validation_status = 'INVALID' AND has_extreme
  UNION ALL
  SELECT 'Sensor Failure' AS alert_type, 'CRITICAL' AS priority, {carry}
  FROM flagged WHERE validation_status = 'INVALID' AND has_oor
  UNION ALL
  SELECT 'High Temperature' AS alert_type, 'HIGH' AS priority, {carry}
  FROM flagged WHERE operational AND s_temperature > 35
  UNION ALL
  SELECT 'Low Temperature' AS alert_type, 'HIGH' AS priority, {carry}
  FROM flagged WHERE operational AND s_temperature < 5
  UNION ALL
  SELECT 'Low Water Level' AS alert_type, 'HIGH' AS priority, {carry}
  FROM flagged WHERE operational AND s_water_level < 1.0
  UNION ALL
  SELECT 'High Water Level' AS alert_type, 'MEDIUM' AS priority, {carry}
  FROM flagged WHERE operational AND s_water_level >= 1.0 AND s_water_level > 2.5
  UNION ALL
  SELECT 'Soil pH Warning' AS alert_type,
         CASE WHEN s_ph < 5.5 OR s_ph > 8.0 THEN 'HIGH' ELSE 'MEDIUM' END AS priority, {carry}
  FROM flagged WHERE operational AND (s_ph < 6.0 OR s_ph > 7.5)
  UNION ALL
{nutrient_rules}
)"""


def with_prefix(
    body: str,
    star: bool = False,
    alerts: bool = False,
    recursive: bool = False,
) -> str:
    """``WITH <derivation CTEs> <body>`` — the standard oracle shape.

    ``recursive=True`` emits ``WITH RECURSIVE``: SQL allows recursive
    and plain CTEs to share one WITH clause, so a body that appends its
    own recursive CTE (the greedy-throttle replay) just opts in here.
    """
    ctes = [readings_cte(), validated_cte(), staging_cte()]
    if star:
        ctes.append(star_ctes())
    if alerts:
        ctes.append(alerts_cte())
    kw = "WITH RECURSIVE " if recursive else "WITH "
    return kw + ",".join(ctes) + "\n" + body
