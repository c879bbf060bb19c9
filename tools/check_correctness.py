"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` twin (DuckDB) at the given scale factor and compares
row count, column names, and an order-insensitive value comparison
(columns sorted by name, rows sorted, cell-wise equality with exact
doubles). Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

# Repo root derived from this file, not hard-coded: the tool must
# import the sibling __spark_entry__ wherever the repo is cloned.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return repr(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main() -> int:
    import duckdb

    import __spark_entry__ as E
    from iot_real_time_data_pipeline_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session("check-correctness")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"weak  {name}: no oracle ({len(srows)} rows)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {ex}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} vs {sorted(ocols)}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            failures.append(name)
            continue
        sc, oc = canon(srows, scols), canon(orows, ocols)
        if sc != oc:
            ndiff = sum(1 for a, b in zip(sc, oc) if a != b)
            print(f"FAIL  {name}: {ndiff}/{len(sc)} rows differ")
            for a, b in zip(sc, oc):
                if a != b:
                    print(f"      spark : {a}")
                    print(f"      oracle: {b}")
                    break
            failures.append(name)
            continue
        print(f"ok    {name}: {len(srows)} rows")

    # denominator = queries actually run (a filtered invocation must
    # print "12/12 green", not "177/177 green")
    print(f"\n{n_run - len(failures)}/{n_run} green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
