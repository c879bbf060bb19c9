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
- Required-key errors fire on key *absence* (``key not in data``,
  lamda.py:84), not on explicit JSON null — presence is detected
  lexically from the raw payload.
- Two paths raise TypeError in the reference and dead-letter instead of
  getting a status: a string/None ``temperature`` reaching the weather
  cross-check subtraction, and an explicit-null ``weather_data`` (the
  key IS present, so ``"temperature_2m" in None`` crashes). We flag
  such rows ``dead_letter = true`` instead of crashing.
- Short-circuits: missing/unknown ``loc_id`` and missing/empty
  ``sensor_data`` return INVALID immediately with only their own
  errors (plus accumulated required-key errors for the latter).

Input contract: a DataFrame with ``schemas.raw_event_schema()``
columns; optionally a ``raw_json`` string column holding the original
event JSON, used to distinguish quoted from numeric sensor values
(without it, every value is assumed to have been numeric JSON).

Physical shape: the rules evaluate in *layers* of ``withColumns`` —
raw probes / quoted flags, casts and bounds, per-sensor predicate
flags, then the error/warning arrays, then status. Each non-cheap
subexpression (regex probe, try_cast, range predicates) lands in its
own column, so it is computed once per row and downstream layers
reference attributes. Catalyst keeps these projections separate
(non-cheap multi-referenced expressions don't inline), which keeps the
generated code per stage small. The whole engine remains a pure narrow
map — no shuffle, no UDFs, pipelined with the scan at any scale.
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


def validate_events(df: DataFrame, raw_json_col: str | None = None) -> DataFrame:
    """Append validation outcome columns to a raw-event DataFrame.

    Adds ``validation_status`` / ``validation_errors`` /
    ``validation_warnings`` / ``dead_letter`` plus one ``sensor_<name>``
    double column per sensor (the validated-cast value — the
    reference's in-place conversion, lamda.py:109-117).
    """
    raw_json = F.col(raw_json_col) if raw_json_col else None
    loc = F.col("loc_id")
    sensors = F.col("sensor_data")
    weather = F.col("weather_data")

    # --- L1: probes + lexical flags ------------------------------------
    key_cols = {
        "event_id": F.col("event_id"),
        "timestamp": F.col("timestamp"),
        "sensor_data": sensors,
        "weather_data": weather,
        "location": F.col("location"),
    }
    l1: dict[str, Column] = {}
    for s in SENSOR_NAMES:
        l1[f"_raw_{s}"] = sensors.getItem(s)
        l1[f"_q_{s}"] = _was_quoted(raw_json, s)
    for k in REQUIRED_TOP_LEVEL_KEYS:
        l1[f"_key_{k}"] = _key_present(raw_json, key_cols[k], k)
    l1["_loc_missing"] = loc.isNull() | (loc == "")
    l1["_sensors_empty"] = sensors.isNull() | (F.size(F.map_keys(sensors)) == 0)
    l1["_has_temp_key"] = F.coalesce(F.map_contains_key(sensors, "temperature"), F.lit(False))
    df = df.withColumns(l1)

    # --- L2: casts + per-location bounds -------------------------------
    l2: dict[str, Column] = {}
    for s in SENSOR_NAMES:
        # try_cast: null on failure — the reference's try/except float()
        # (lamda.py:111-116) under Spark 4's default ANSI mode.
        l2[f"_cast_{s}"] = F.col(f"_raw_{s}").try_cast("double")
        l2[f"_lo_{s}"] = range_min(loc, s)
        l2[f"_hi_{s}"] = range_max(loc, s)
    l2["_loc_invalid"] = ~F.col("_loc_missing") & ~loc.isin(KNOWN_LOC_IDS)
    df = df.withColumns(l2)

    # --- L3: per-sensor predicate flags --------------------------------
    l3: dict[str, Column] = {}
    for s in SENSOR_NAMES:
        raw, quoted, casted = F.col(f"_raw_{s}"), F.col(f"_q_{s}"), F.col(f"_cast_{s}")
        lo, hi = F.col(f"_lo_{s}"), F.col(f"_hi_{s}")
        string_sentinel = raw.isin(EXTREME_STRING_SENTINELS)
        numeric_sentinel = casted.isin(EXTREME_NUMERIC_SENTINELS)
        # lamda.py:97-101 — null (absent or JSON-null) is itself a sentinel.
        extreme = raw.isNull() | F.when(quoted, string_sentinel).otherwise(
            string_sentinel | numeric_sentinel
        )
        l3[f"_ext_{s}"] = extreme
        # lamda.py:109-117 — only quoted strings take the convert path.
        l3[f"_invtype_{s}"] = ~extreme & quoted & casted.isNull()
        l3[f"_conv_{s}"] = ~extreme & quoted & casted.isNotNull()
        in_range = casted.between(lo, hi)
        buffer = (hi - lo) * F.lit(0.1)
        in_buffer = casted.between(lo - buffer, hi + buffer)
        checkable = ~extreme & ~l3[f"_invtype_{s}"]
        l3[f"_oor_{s}"] = checkable & ~in_range & ~in_buffer
        l3[f"_near_{s}"] = checkable & ~in_range & in_buffer
    # Temperature extras for the weather cross-check: numeric-after-loop
    # (originally-numeric stays numeric; quoted is numeric only if the
    # convert branch ran — sentinels `continue` first, lamda.py:98-101)
    # and the lexical rendering Python's f-string would produce.
    t_raw, t_q, t_cast = F.col("_raw_temperature"), F.col("_q_temperature"), F.col("_cast_temperature")
    l3["_t_num"] = t_raw.isNotNull() & (~t_q | (~l3["_ext_temperature"] & t_cast.isNotNull()))
    df = df.withColumns(l3)

    # --- L4: arrays + outputs ------------------------------------------
    required_key_errors = [
        F.when(~F.col(f"_key_{k}"), F.lit(f"missing_top_level_key:{k}"))
        for k in REQUIRED_TOP_LEVEL_KEYS
    ]
    sensor_errors = [
        F.when(F.col(f"_ext_{s}"), F.lit(f"sensor_data:{s}_extreme_value"))
        .when(F.col(f"_invtype_{s}"), F.lit(f"sensor_data:{s}_invalid_type"))
        .when(F.col(f"_oor_{s}"), F.lit(f"sensor_data:{s}_out_of_range"))
        for s in SENSOR_NAMES
    ]
    sensor_warnings: list[Column] = []
    for s in SENSOR_NAMES:
        sensor_warnings.append(
            F.when(F.col(f"_conv_{s}"), F.lit(f"sensor_data:{s}_type_converted"))
        )
        sensor_warnings.append(
            F.when(F.col(f"_near_{s}"), F.lit(f"sensor_data:{s}_near_threshold"))
        )

    weather_temp = weather.getField("temperature_2m")
    crosscheck_applies = (
        ~F.col("_sensors_empty")
        & F.col("_has_temp_key")
        & weather.isNotNull()
        & weather_temp.isNotNull()
    )
    # lamda.py:129-137: abs(sensor - weather) > 15 => warning.
    mismatch = crosscheck_applies & F.col("_t_num") & (
        F.abs(t_cast - weather_temp) > 15
    )
    t_repr = F.when(t_q, t_cast.cast("string")).otherwise(t_raw)
    mismatch_warning = F.when(
        mismatch,
        F.concat(
            F.lit("temperature_mismatch:"), t_repr, F.lit("vs"),
            weather_temp.cast("string"),
        ),
    )

    loc_missing, loc_invalid = F.col("_loc_missing"), F.col("_loc_invalid")
    sensors_empty = F.col("_sensors_empty")
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
    eligible = ~loc_missing & ~loc_invalid & ~sensors_empty
    weather_explicit_null = F.col("_key_weather_data") & weather.isNull()
    dead_letter = eligible & (
        (crosscheck_applies & ~F.col("_t_num"))
        | (F.col("_has_temp_key") & weather_explicit_null)
    )

    l4: dict[str, Column] = {
        "validation_errors": errors,
        "validation_warnings": warnings,
        "dead_letter": dead_letter,
    }
    for s in SENSOR_NAMES:
        # Validated double — null for sentinel / unconvertible values.
        l4[f"sensor_{s}"] = F.when(
            ~F.col(f"_ext_{s}") & ~F.col(f"_invtype_{s}"), F.col(f"_cast_{s}")
        )
    df = df.withColumns(l4)

    # --- L5: status fold + cleanup -------------------------------------
    df = df.withColumn(
        "validation_status",
        F.when(F.size("validation_errors") > 0, F.lit("INVALID"))
        .when(F.size("validation_warnings") > 0, F.lit("WARNING"))
        .otherwise(F.lit("VALID")),
    )
    temp_cols = [c for c in df.columns if c.startswith("_")]
    return df.drop(*temp_cols)
