"""Engine-vs-oracle OUTPUT SCHEMA parity over every registered query.

The driver's correctness hash is type-sensitive: a column whose DuckDB
type differs from Spark's fails the hash even when every value is
bit-identical (round 7's `docs_source_mix` HUGEINT failure; round 8's
pre-emptively caught `emb_ivf_probe_sweep` INTEGER-vs-bigint). The
DuckDB-only lint in ``tests/test_driver_contract.py`` rejects types
Spark can NEVER emit; this tool closes the other half of the class —
types both engines support but BIND DIFFERENTLY for the same column
(int32 vs int64, float vs double).

For each ``__spark_entry__.queries()`` entry it builds the Spark
DataFrame (analysis only, no execution) and binds the oracle SQL in
DuckDB (no execution), then compares column-name sets and per-column
types under the driver's equivalence map.

Usage::

    python tools/schema_parity.py [sf_dir]

Exit 0 = all queries with an oracle twin agree column-for-column.
"""

from __future__ import annotations

import os
import sys

# Repo root derived from this file, not hard-coded: the tool must
# import the sibling __spark_entry__ wherever the repo is cloned.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark simpleString -> the DuckDB type the driver's Arrow transport
# would carry for it. Anything outside this map is compared verbatim.
SPARK_TO_DUCK = {
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "binary": "BLOB",
}


def _duck_equiv(spark_type: str) -> str:
    if spark_type.startswith("timestamp"):
        return "TIMESTAMP"  # tz-naive micros on both wires
    if spark_type.startswith("decimal"):
        return spark_type.upper().replace(" ", "")
    return SPARK_TO_DUCK.get(spark_type, spark_type.upper())


def compare(sf_dir: str) -> list[str]:
    import duckdb

    import __spark_entry__ as E
    from iot_real_time_data_pipeline_spark.session import build_session

    spark = build_session("schema-parity")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    oracles = E.oracle_sql()
    mismatches: list[str] = []
    for name, fn in E.queries().items():
        if name not in oracles:
            continue  # rows-only queries have no oracle twin to drift from
        try:
            sdf = fn(spark, sf_dir)
            stypes = {f.name: f.dataType.simpleString()
                      for f in sdf.schema.fields}
        except Exception as ex:  # noqa: BLE001
            mismatches.append(f"{name}: spark build failed: {ex!r}"[:200])
            continue
        try:
            rel = con.sql(oracles[name])
            otypes = dict(zip(rel.columns, (str(t) for t in rel.types)))
        except Exception as ex:  # noqa: BLE001
            mismatches.append(f"{name}: oracle bind failed: {ex!r}"[:200])
            continue
        if set(stypes) != set(otypes):
            mismatches.append(
                f"{name}: column sets differ — spark-only "
                f"{sorted(set(stypes) - set(otypes))}, oracle-only "
                f"{sorted(set(otypes) - set(stypes))}"
            )
            continue
        for col, st in stypes.items():
            want = _duck_equiv(st)
            got = otypes[col]
            # TIMESTAMP WITH TIME ZONE and TIMESTAMP both land as
            # micros on the Arrow wire once the session is UTC.
            if got.startswith("TIMESTAMP") and want == "TIMESTAMP":
                continue
            if got != want:
                mismatches.append(
                    f"{name}.{col}: spark={st} (wire {want}) oracle={got}"
                )
    return mismatches


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    mismatches = compare(sf_dir)
    for m in mismatches:
        print("MISMATCH", m)
    n = len(mismatches)
    print(f"schema parity: {n} mismatch(es) across oracle-twinned queries")
    return 1 if n else 0


if __name__ == "__main__":
    raise SystemExit(main())
