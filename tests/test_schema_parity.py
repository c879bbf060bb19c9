"""Engine-vs-oracle OUTPUT TYPE parity, pinned as a test.

The driver's value hash is type-sensitive: bit-identical values fail
when one engine widens a column the other doesn't (r07's HUGEINT
sums; the pre-emptively caught INTEGER-vs-bigint probe_radius). The
DuckDB-side lint in test_driver_contract rejects types Spark can
never emit; this test closes the other half by comparing BOTH
engines' bound output schemas for every oracle-twinned query. Slow
(~minutes — builds all registered DataFrames at sf0.001), but it is
the only local check that sees the engine side of the contract.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_every_oracle_twin_binds_identical_output_types(spark):
    from tools.schema_parity import compare

    mismatches = compare("/root/testdata/sf0.001")
    assert not mismatches, mismatches
