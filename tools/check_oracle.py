#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark result), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
<sfDir> parquet tables, and compares as multisets (columns sorted by name,
rows sorted, exact value equality). Mirrors what the driver does so
mismatches surface before a round ends.  Dev-tool only — not part of the
shipped library.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> iso strings, floats stay exact
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            duck_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            failures += 1
            continue
        if not spark_df.equals(duck_df):
            neq = (spark_df != duck_df) & ~(spark_df.isna() & duck_df.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(spark_df)} rows differ; first:")
            print(pd.concat([spark_df[bad].head(3).add_suffix("_spark"),
                             duck_df[bad].head(3).add_suffix("_duck")], axis=1))
            failures += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
    extra = [q for q in glob.glob(f"{out_dir}/q_*") if q.split("/")[-1] not in oracle]
    for q in sorted(extra):
        n = sum(len(pd.read_parquet(f)) for f in glob.glob(f"{q}/*.parquet"))
        print(f"ROWS {q.split('/')[-1]}: {n} rows (no oracle)")
    print(f"\n{failures} failures / {len(oracle)} oracles")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
