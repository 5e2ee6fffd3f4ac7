#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle against the parquet tables in <sfDir>, and compares with the
Spark-written parquet in <verifyOutDir>/<name>/. Mirrors the driver's
compare: sort columns by name, sort rows, compare values.
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            got = con.sql(
                f"SELECT * FROM read_parquet({files!r})"
            ).df()
            exp_c, got_c = canon(exp), canon(got)
            if list(exp_c.columns) != list(got_c.columns):
                print(f"FAIL {name}: columns {list(got_c.columns)} != {list(exp_c.columns)}")
                n_fail += 1
                continue
            if len(exp_c) != len(got_c):
                print(f"FAIL {name}: rows {len(got_c)} != {len(exp_c)}")
                n_fail += 1
                continue
            # exact compare (NaN-safe); dtype-insensitive via astype(object)
            eq = exp_c.astype(object).where(pd.notna(exp_c), None).equals(
                got_c.astype(object).where(pd.notna(got_c), None)
            )
            if eq:
                print(f"PASS {name} ({len(exp_c)} rows)")
                n_pass += 1
            else:
                diff = (exp_c.astype(object).fillna("@null") != got_c.astype(object).fillna("@null"))
                bad = diff.any(axis=1)
                print(f"FAIL {name}: value mismatch in {int(bad.sum())}/{len(exp_c)} rows")
                sample = pd.concat(
                    [exp_c[bad].head(3).add_suffix("_exp"), got_c[bad].head(3).add_suffix("_got")],
                    axis=1,
                )
                print(sample.to_string()[:2000])
                n_fail += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
