#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the sfDir
tables, and compares row count, schema (loosely: column names), and exact
values after sorting columns by name and rows by all columns.

Dev tool only — not part of the graft library (driver-side python env).
"""
import datetime
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # Spark DATE reads back as object(datetime.date); DuckDB DATE as
            # datetime64 — normalize both so dates compare by value
            vals = df[c].dropna()
            if len(vals) and isinstance(vals.iloc[0], datetime.date):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        pq_dir = Path(out_dir) / name
        if not pq_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(pq_dir)
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} vs {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} vs {sorted(exp.columns)}")
        if not problems:
            g, e = canon(got), canon(exp)
            for c in g.columns:
                gc, ec = g[c], e[c]
                if str(gc.dtype) != str(ec.dtype):
                    problems.append(f"dtype[{c}] {gc.dtype} vs {ec.dtype}")
                try:
                    eq = gc.equals(ec)
                    if not eq:
                        # tolerate NaN-position equality already via .equals;
                        # show first diff
                        neq = (gc != ec) & ~(gc.isna() & ec.isna())
                        idx = neq[neq].index[:3].tolist()
                        problems.append(
                            f"values[{c}] first diffs at {idx}: "
                            f"{[(gc[i], ec[i]) for i in idx]}")
                except Exception as ex:
                    problems.append(f"compare[{c}] error: {ex}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(p[:300] for p in problems[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
