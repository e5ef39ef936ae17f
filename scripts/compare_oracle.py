#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 scripts/compare_oracle.py <verify_out_dir> <sf_dir>
Loads each <name>/ parquet result, runs the matching oracle SQL from
oracle_sql.json against the sf parquet tables, and diffs values
(column-name-sorted, row-sorted) the way the driver does.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
            duck_df = canon(con.sql(sql).df())
            if list(spark_df.columns) != list(duck_df.columns):
                bad.append((name, f"columns {list(spark_df.columns)} vs {list(duck_df.columns)}"))
                continue
            if len(spark_df) != len(duck_df):
                bad.append((name, f"rows {len(spark_df)} vs {len(duck_df)}"))
                continue
            if not spark_df.equals(duck_df):
                neq = (spark_df != duck_df) & ~(spark_df.isna() & duck_df.isna())
                cols = [c for c in spark_df.columns if neq[c].any()]
                r = neq.any(axis=1).idxmax()
                bad.append((name, f"values differ in {cols}; first row {r}: "
                            f"spark={spark_df.iloc[r].to_dict()} duck={duck_df.iloc[r].to_dict()}"))
                continue
            ok.append(name)
        except Exception as e:
            bad.append((name, f"ERROR {type(e).__name__}: {e}"))
    for n in ok:
        print(f"OK    {n}")
    for n, why in bad:
        print(f"FAIL  {n}: {why}")
    print(f"\n{len(ok)}/{len(oracle)} oracles match")


if __name__ == "__main__":
    main()
