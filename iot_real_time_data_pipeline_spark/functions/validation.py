"""The validation rule engine (V1-V9) as native Column expressions.

Reproduces ``validate_record`` (``Lambda/lamda.py:60-150``) semantics
exactly, including its quirks:

- ``None`` is a member of the extreme-value sentinel list
  (lamda.py:97), so the later per-sensor ``_missing`` branch
  (lamda.py:104-106) is unreachable: an absent/null sensor value
  classifies as ``sensor_data:<s>_extreme_value``.
- Numeric JSON values compare numerically against ``0/9999/-9999``
  (so ``0.0`` is extreme) while quoted JSON strings compare literally
  (so ``"0.0"`` is NOT extreme — it type-converts with a warning and
  then fails the range check).
- A record whose ``temperature`` value is a *string* that survives to
  the weather cross-check (lamda.py:129-137) raises ``TypeError`` in
  the reference and lands in the ``errors/processing/`` dead letter
  (lamda.py:506-530) — it never receives a validation_status. We flag
  such rows ``dead_letter = true`` instead of crashing.
- Short-circuits: missing/unknown ``loc_id`` and missing/empty
  ``sensor_data`` return INVALID immediately with only their own
  errors (plus accumulated required-key errors for the latter).

Input contract: a DataFrame with ``schemas.raw_event_schema()``
columns; optionally a ``raw_json`` string column holding the original
event JSON, used to distinguish quoted from numeric sensor values
(without it, every value is assumed to have been numeric JSON).

All rules compile to ``when/otherwise`` chains over 3 locations x 7
sensors = 21 literal ranges — constant-folded by Catalyst, no lookup
join, no UDF. At 100 TB scale this is a pure map stage: no shuffle,
fully pipelined with the parquet/json scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import (
    EXPECTED_RANGES_PER_LOCATION,
    EXTREME_NUMERIC_SENTINELS,
    EXTREME_STRING_SENTINELS,
    KNOWN_LOC_IDS,
    SENSOR_NAMES,
)

REQUIRED_TOP_LEVEL_KEYS = ["event_id", "timestamp", "sensor_data", "weather_data", "location"]


def _per_location(loc: Column, sensor: str, idx: int) -> Column:
    """Literal (min or max) of the sensor range keyed by loc_id."""
    expr = None
    for loc_id, ranges in EXPECTED_RANGES_PER_LOCATION.items():
        bound = F.lit(float(ranges[sensor][idx]))
        expr = F.when(loc == loc_id, bound) if expr is None else expr.when(loc == loc_id, bound)
    return expr


def range_min(loc: Column, sensor: str) -> Column:
    return _per_location(loc, sensor, 0)


def range_max(loc: Column, sensor: str) -> Column:
    return _per_location(loc, sensor, 1)


def _key_present(raw_json: Column | None, col: Column, key: str) -> Column:
    """Reference semantics: required-key errors fire on key *absence*
    (``key not in data``, lamda.py:84), not on explicit JSON null. The
    lexical check on the raw payload preserves that distinction; for
    synthesized (non-JSON) plans a non-null column implies presence.
    """
    if raw_json is None:
        return col.isNotNull()
    return F.coalesce(raw_json.rlike(f'"{key}"\\s*:'), F.lit(False)) | col.isNotNull()


def _was_quoted(raw_json: Column | None, sensor: str) -> Column:
    """True when the sensor value appeared as a quoted JSON string.

    Lexical check on the raw payload — the only place the
    string-vs-number distinction survives once values are ingested as
    map<string,string>.
    """
    if raw_json is None:
        return F.lit(False)
    # coalesce: a null raw payload (e.g. events synthesized in-plan
    # rather than parsed from JSON text) means "not quoted".
    return F.coalesce(raw_json.rlike(f'"{sensor}"\\s*:\\s*"'), F.lit(False))


class _SensorChecks:
    """Per-sensor derived expressions, computed once and reused."""

    def __init__(self, loc: Column, sensors: Column, raw_json: Column | None, sensor: str):
        self.name = sensor
        raw = sensors.getItem(sensor)
        self.raw = raw
        quoted = _was_quoted(raw_json, sensor)
        # try_cast: null on failure — the reference's try/except float()
        # (lamda.py:111-116) under Spark 4's default ANSI mode.
        casted = raw.try_cast("double")
        lo = range_min(loc, sensor)
        hi = range_max(loc, sensor)

        string_sentinel = raw.isin(EXTREME_STRING_SENTINELS)
        numeric_sentinel = casted.isin(EXTREME_NUMERIC_SENTINELS)
        # lamda.py:97-101 — null (absent or JSON-null) is itself a sentinel.
        self.extreme = raw.isNull() | F.when(quoted, string_sentinel).otherwise(
            string_sentinel | numeric_sentinel
        )
        # lamda.py:109-117 — only quoted strings take the convert path.
        self.invalid_type = ~self.extreme & quoted & casted.isNull()
        self.type_converted = ~self.extreme & quoted & casted.isNotNull()
        # Value as seen by the range check after in-place conversion.
        self.value = casted
        in_range = casted.between(lo, hi)
        buffer = (hi - lo) * F.lit(0.1)
        in_buffer = casted.between(lo - buffer, hi + buffer)
        checkable = ~self.extreme & ~self.invalid_type
        self.out_of_range = checkable & ~in_range & ~in_buffer
        self.near_threshold = checkable & ~in_range & in_buffer
        # Numeric (post-conversion) at the time of the weather cross-check:
        # originally-numeric JSON stays numeric; a quoted string is numeric
        # only if the convert branch actually ran (i.e. it was not a
        # sentinel — sentinels `continue` before conversion, lamda.py:98-101).
        self.numeric_after_loop = raw.isNotNull() & (
            ~quoted | (~self.extreme & casted.isNotNull())
        )
        # Lexical rendering Python would produce in the f-string at
        # lamda.py:137 (ints keep no '.0'; converted strings render as float).
        self.py_repr = F.when(quoted, casted.cast("string")).otherwise(raw)

        self.error = (
            F.when(self.extreme, F.lit(f"sensor_data:{sensor}_extreme_value"))
            .when(self.invalid_type, F.lit(f"sensor_data:{sensor}_invalid_type"))
            .when(self.out_of_range, F.lit(f"sensor_data:{sensor}_out_of_range"))
        )
        self.warning_converted = F.when(
            self.type_converted, F.lit(f"sensor_data:{sensor}_type_converted")
        )
        self.warning_near = F.when(self.near_threshold, F.lit(f"sensor_data:{sensor}_near_threshold"))


def validation_columns(
    loc: Column,
    event_id: Column,
    timestamp: Column,
    location: Column,
    sensors: Column,
    weather: Column,
    raw_json: Column | None = None,
) -> dict[str, Column]:
    """Build the full validation outcome as a dict of named Columns.

    Returns ``validation_status`` / ``validation_errors`` /
    ``validation_warnings`` / ``dead_letter`` plus one
    ``sensor_<name>`` double column per sensor (the validated-cast
    value, lamda.py:109-117's in-place conversion).
    """
    loc_missing = loc.isNull() | (loc == "")
    loc_invalid = ~loc_missing & ~loc.isin(KNOWN_LOC_IDS)
    sensors_empty = sensors.isNull() | (F.size(F.map_keys(sensors)) == 0)

    # lamda.py:82-86 — required-key errors, in declaration order.
    key_cols = {
        "event_id": event_id,
        "timestamp": timestamp,
        "sensor_data": sensors,
        "weather_data": weather,
        "location": location,
    }
    required_key_errors = [
        F.when(
            ~_key_present(raw_json, key_cols[k], k),
            F.lit(f"missing_top_level_key:{k}"),
        )
        for k in REQUIRED_TOP_LEVEL_KEYS
    ]

    checks = [_SensorChecks(loc, sensors, raw_json, s) for s in SENSOR_NAMES]
    sensor_errors = [c.error for c in checks]
    sensor_warnings: list[Column] = []
    for c in checks:
        sensor_warnings.append(c.warning_converted)
        sensor_warnings.append(c.warning_near)

    temp = next(c for c in checks if c.name == "temperature")
    weather_temp = weather.getField("temperature_2m")
    crosscheck_applies = (
        ~sensors_empty
        & F.map_contains_key(sensors, "temperature")
        & weather.isNotNull()
        & weather_temp.isNotNull()
    )
    # lamda.py:129-137: abs(sensor - weather) > 15 => warning. Two paths
    # raise TypeError in the reference and dead-letter instead of getting
    # a status: (a) a string/None temperature reaching the subtraction;
    # (b) an explicit-null weather_data — the key IS in data, so the
    # cross-check runs `"temperature_2m" in None` and crashes.
    eligible = ~loc_missing & ~loc_invalid & ~sensors_empty
    weather_explicit_null = (
        _key_present(raw_json, weather, "weather_data") & weather.isNull()
    )
    dead_letter = eligible & (
        (crosscheck_applies & ~temp.numeric_after_loop)
        | (F.map_contains_key(sensors, "temperature") & weather_explicit_null)
    )
    mismatch = crosscheck_applies & temp.numeric_after_loop & (
        F.abs(temp.value - weather_temp) > 15
    )
    # f"temperature_mismatch:{sensor}vs{weather}" — repr of the floats.
    mismatch_warning = F.when(
        mismatch,
        F.concat(
            F.lit("temperature_mismatch:"),
            temp.py_repr,
            F.lit("vs"),
            weather_temp.cast("string"),
        ),
    )

    errors = (
        F.when(loc_missing, F.array(F.lit("missing_loc_id")))
        .when(loc_invalid, F.array(F.concat(F.lit("invalid_loc_id:"), loc)))
        .when(
            sensors_empty,
            F.array_compact(F.array(*required_key_errors, F.lit("missing_sensor_data"))),
        )
        .otherwise(F.array_compact(F.array(*required_key_errors, *sensor_errors)))
    )
    warnings = (
        F.when(loc_missing | loc_invalid | sensors_empty, F.array().cast("array<string>"))
        .otherwise(F.array_compact(F.array(*sensor_warnings, mismatch_warning)))
    )
    status = (
        F.when(F.size(errors) > 0, F.lit("INVALID"))
        .when(F.size(warnings) > 0, F.lit("WARNING"))
        .otherwise(F.lit("VALID"))
    )

    out: dict[str, Column] = {
        "validation_errors": errors,
        "validation_warnings": warnings,
        "validation_status": status,
        "dead_letter": dead_letter,
    }
    for c in checks:
        # Validated double — null for sentinel / unconvertible values.
        out[f"sensor_{c.name}"] = F.when(~c.extreme & ~c.invalid_type, c.value)
    return out


def validate_events(df: DataFrame, raw_json_col: str | None = None) -> DataFrame:
    """Append validation outcome columns to a raw-event DataFrame.

    One narrow map stage — no shuffle; safe to run inline with the
    ingest scan at any scale.
    """
    raw_json = F.col(raw_json_col) if raw_json_col else None
    cols = validation_columns(
        loc=F.col("loc_id"),
        event_id=F.col("event_id"),
        timestamp=F.col("timestamp"),
        location=F.col("location"),
        sensors=F.col("sensor_data"),
        weather=F.col("weather_data"),
        raw_json=raw_json,
    )
    return df.withColumns(cols)
