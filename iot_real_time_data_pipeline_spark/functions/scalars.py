"""Small scalar Column builders (SURVEY §2.9 F10/F11/F14).

Column-expression counterparts of helpers the reference runs in Python:
id generation (producer.py:356, lamda.py:358), 2-decimal rounding
(producer.py:298), and min/max clamping (producer.py:220-221, 290-293).
All JVM-side, codegen-friendly, usable in streaming and batch plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def event_id(prefix: str = "evt_", hex_len: int = 12) -> Column:
    """F10 — ``evt_<12 hex>`` identifier (uuid4-derived, per row)."""
    return F.concat(
        F.lit(prefix),
        F.substring(F.regexp_replace(F.uuid(), "-", ""), 1, hex_len),
    )


def round2(col: Column) -> Column:
    """F11 — 2-decimal rounding (producer emission format)."""
    return F.round(col, 2)


def clamp(col: Column, lo: float, hi: float) -> Column:
    """F14 — clamp into [lo, hi] via greatest/least."""
    return F.greatest(F.lit(float(lo)), F.least(col, F.lit(float(hi))))
