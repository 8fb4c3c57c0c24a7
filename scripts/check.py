#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate.

Usage: python3 scripts/check.py <sfdir> <verify_outdir>

Runs each oracle SQL from oracle_sql.json in DuckDB over the testdata
parquet tables, loads the corresponding Spark result parquet, sorts
columns by name and rows by value, and compares stringified frames.
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)].copy()
    df = df.astype(str)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            parts = glob.glob(f"{outdir}/{name}/*.parquet")
            mine = con.sql(f"SELECT * FROM read_parquet({parts!r})").df()
            ref = con.sql(sql).df()
            a, b = norm(mine), norm(ref)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
                failures += 1
            elif not a.equals(b):
                print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
                diff = (a != b).any(axis=1) if len(a) == len(b) else None
                if diff is not None and diff.any():
                    i = diff.idxmax()
                    print("  first diff row mine:", a.iloc[i].to_dict())
                    print("  first diff row ref :", b.iloc[i].to_dict())
                elif len(a) != len(b):
                    print("  mine head:", a.head(3).to_dict("records"))
                    print("  ref  head:", b.head(3).to_dict("records"))
                failures += 1
            else:
                print(f"OK   {name} ({len(a)} rows)")
        except Exception as e:
            print(f"ERROR {name}: {e}")
            failures += 1
    print(f"{len(oracle) - failures}/{len(oracle)} oracles pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
