"""Schema-driven record flattening — compile-time recursion, runtime-native.

The reference flattens nested dicts with an ``_`` separator and
JSON-stringifies lists (``Lambda/lamda.py:333-348``): top-level keys
keep no prefix, ``location.latitude`` -> ``location_latitude``,
``sensor_data.temperature`` -> ``sensor_data_temperature``; arrays
become JSON text.

Here the recursion walks the *StructType* once at plan-build time and
emits a flat ``select`` list — the runtime plan is a plain projection
(column pruning + codegen apply), never a per-row Python flatten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_select(schema: T.StructType, sep: str = "_") -> list[Column]:
    """Emit aliased Columns replicating flatten_record's key scheme."""
    cols: list[Column] = []
    for field in schema.fields:
        cols.extend(_flatten_field(field, field.name, field.name, sep))
    return cols


def _flatten_field(field: T.StructField, flat_name: str, col_path: str, sep: str) -> list[Column]:
    dt = field.dataType
    if isinstance(dt, T.StructType):
        out: list[Column] = []
        for child in dt.fields:
            out.extend(
                _flatten_field(child, f"{flat_name}{sep}{child.name}", f"{col_path}.{child.name}", sep)
            )
        return out
    if isinstance(dt, T.ArrayType):
        # lamda.py:343-344 — lists are JSON-stringified.
        return [F.to_json(F.col(col_path)).alias(flat_name)]
    if isinstance(dt, T.MapType):
        # The reference only ever flattens dict *values* it knows; a map
        # column at flatten time is rendered as JSON text too.
        return [F.to_json(F.col(col_path)).alias(flat_name)]
    return [F.col(col_path).alias(flat_name)]


def flatten(df: DataFrame, sep: str = "_") -> DataFrame:
    """Flatten every nested column of ``df`` per the reference's rule."""
    return df.select(*flatten_select(df.schema, sep=sep))
