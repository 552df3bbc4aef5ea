#!/usr/bin/env python3
"""Local emulation of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <verifyOutDir> <sfDir> [onlyQuery ...]

With onlyQuery args, checks just those queries (for single-query verify
runs); otherwise checks every oracle entry.

Reads <verifyOutDir>/<name>/ parquet (Spark results from graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB against the
parquet tables in <sfDir>, and compares: row count, column names, dtype
KINDS (int vs float vs object — the round-8/9 driver hash-fails were all
DuckDB HUGEINT (rendered float64 by pandas) vs Spark LONG, invisible to a
string-level compare), and values (columns sorted by name, rows sorted by
all columns; floats compared at full repr precision, bit-level strict).

Additionally every oracle SQL is DESCRIBEd first and FAILS if any output
column is HUGEINT/UHUGEINT — DuckDB's sum(BIGINT) widens to HUGEINT, which
pandas renders as float64 and the driver hashes differently from Spark's
LongType; wrap integer sums in CAST(... AS BIGINT).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True) if len(df) else df
    return df.reset_index(drop=True)


def cell(v):
    if isinstance(v, float):
        return repr(v)  # full precision: 313.0 stays distinct from 313
    return str(v)


def kinds(df: pd.DataFrame):
    return [df[c].dtype.kind for c in df.columns]


def main(outdir: str, sfdir: str, only=()) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in set(only)}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").df()
            huge = [
                (r["column_name"], r["column_type"])
                for _, r in desc.iterrows()
                if "HUGEINT" in str(r["column_type"]).upper()
            ]
            if huge:
                print(f"FAIL {name}: oracle emits HUGEINT columns {huge}; "
                      "wrap integer sums in CAST(... AS BIGINT)")
                n_bad += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle DESCRIBE error: {e}")
            n_bad += 1
            continue
        try:
            got = duckdb.sql(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_bad += 1
            continue
        # kind gate only on NULL-free columns: a nullable integer column
        # legitimately renders float64 on whichever side carries the
        # NULLs (pandas has no NA in int64), which is not a value bug
        bad = [(c, str(g[c].dtype), str(w[c].dtype))
               for c in g.columns
               if g[c].dtype.kind != w[c].dtype.kind
               and not (g[c].isna().any() or w[c].isna().any())]
        if bad:
            print(f"FAIL {name}: dtype kinds differ (spark, duckdb): {bad}")
            n_bad += 1
            continue
        # NULL-carrying numeric columns whose kinds diverged: when both
        # sides are integral-valued, compare as pandas nullable Int64 —
        # float64 cannot represent int64 above 2^53 exactly, so casting
        # there could false-match (or false-mismatch) large keys/sums.
        # Genuine int/float mixes still fall back to float64.
        for c in g.columns:
            if (g[c].dtype.kind in "iuf" and w[c].dtype.kind in "iuf"
                    and g[c].dtype.kind != w[c].dtype.kind):
                def integral(s):
                    if s.dtype.kind in "iu":
                        return True
                    v = s.dropna()
                    import numpy as np
                    return bool(np.isfinite(v).all() and (v == v.round()).all())
                if integral(g[c]) and integral(w[c]):
                    g[c] = g[c].astype("Int64")
                    w[c] = w[c].astype("Int64")
                else:
                    g[c] = g[c].astype("float64")
                    w[c] = w[c].astype("float64")
        gs = g.map(cell)
        ws = w.map(cell)
        if not gs.equals(ws):
            diff = (gs != ws)
            rows = diff.any(axis=1)
            print(f"FAIL {name}: {int(rows.sum())}/{len(g)} rows differ; first:")
            idx = rows[rows].index[0]
            print("  spark :", dict(gs.loc[idx]))
            print("  duckdb:", dict(ws.loc[idx]))
            n_bad += 1
            continue
        print(f"ok   {name} ({len(g)} rows)")
        n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
