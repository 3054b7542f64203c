#!/usr/bin/env python3
"""Filtered twin of oracle_check.py: only adjudicates queries whose
Spark output directory exists under <verifyOutDir> — the dev loop for
a `runMain graft.Verify <sf> <out> q1,q2,...` filtered run, where the
full checker would pay every other query's DuckDB replay just to
report 'no spark output'.

Usage: python3 tools/oracle_check_filtered.py <sfDir> <verifyOutDir>
Dev harness only — the shipped Scala library has no Python dependency.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue
        try:
            exp = canon(con.sql(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            ok = (exp.shape == got.shape
                  and list(exp.dtypes) == list(got.dtypes)
                  and exp.equals(got))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        print(("PASS" if ok else "FAIL"), name, f"({len(got)} rows)")
        n_pass += ok
        n_fail += not ok
    print(f"== {n_pass} pass, {n_fail} fail (filtered) ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
