#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling,
not part of the engine): run graft.Verify output against DuckDB oracles.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cmp_frames(a: pd.DataFrame, b: pd.DataFrame, name: str):
    issues = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"schema mismatch: spark={sorted(a.columns)} oracle={sorted(b.columns)}"]
    if len(a) != len(b):
        issues.append(f"row count: spark={len(a)} oracle={len(b)}")
        return issues
    a, b = canon(a), canon(b)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            bad = 0
            for x, y in zip(av, bv):
                xn, yn = pd.isna(x), pd.isna(y)
                if xn and yn:
                    continue
                if xn != yn or (x != y and not math.isclose(x, y, rel_tol=0, abs_tol=0)):
                    bad += 1
                    if bad <= 3:
                        issues.append(f"col {col}: {x!r} != {y!r} (diff {abs(x - y) if not (xn or yn) else 'nan'})")
            if bad:
                issues.append(f"col {col}: {bad} exact-mismatch values")
        else:
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                idx = neq.idxmax()
                issues.append(f"col {col}: {neq.sum()} mismatches, e.g. {av[idx]!r} != {bv[idx]!r}")
    return issues


def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are plain files; ScaleUp fixtures (sf1) are
        # Spark output DIRECTORIES — glob the part files in that case
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            fail += 1
            continue
        try:
            ora_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fail += 1
            continue
        issues = cmp_frames(spark_df, ora_df, name)
        if issues:
            print(f"FAIL {name}: rows={len(spark_df)}")
            for i in issues[:6]:
                print(f"   {i}")
            fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            ok += 1
    print(f"\n{ok} passed, {fail} failed")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
