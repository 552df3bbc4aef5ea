#!/usr/bin/env python3
"""DESCRIBE every oracle SQL in DuckDB and fail on HUGEINT output columns.

Usage: python3 tools/oracle_type_lint.py <sfDir>   (oracle JSON on stdin)

DuckDB widens sum(BIGINT) to HUGEINT, which pandas renders as float64 —
the driver then hashes `313.0` against Spark's `313` and the query red-
lines even though the values are identical (round-8/9 postmortem). This
lint makes that class of oracle-authoring bug impossible to reintroduce:
it is run by OracleTypeLintSpec over the full registry on every sbt test.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sfdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(sys.stdin)
    bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"DESCRIBE-ERROR {name}: {e}")
            bad += 1
            continue
        for col, typ, *_ in desc:
            if "HUGEINT" in str(typ).upper():
                print(f"HUGEINT {name}: column {col} is {typ} "
                      "(wrap the integer sum in CAST(... AS BIGINT))")
                bad += 1
    print(f"== {len(oracle)} oracles, {bad} offending ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
