#!/usr/bin/env python3
"""Local emulation of the driver's t2 DuckDB-oracle check.

Usage: python3 tools/local_t2.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
the same tables, sorts columns by name, and compares shape + values.
Dev-only tool (driver-side python env); not part of the library.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
            duck_df = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1
            continue
        if spark_df.shape != duck_df.shape:
            print(f"FAIL {name}: shape {spark_df.shape} vs {duck_df.shape}")
            n_fail += 1
            continue
        sdt, ddt = list(spark_df.dtypes), list(duck_df.dtypes)
        mismatch = None
        for i in range(len(spark_df)):
            for j, c in enumerate(spark_df.columns):
                a, b = spark_df.iloc[i, j], duck_df.iloc[i, j]
                a = None if pd.isna(a) else (a.item() if hasattr(a, "item") else a)
                b = None if pd.isna(b) else (b.item() if hasattr(b, "item") else b)
                if not values_equal(a, b):
                    mismatch = (i, c, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            i, c, a, b = mismatch
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            dtw = "" if sdt == ddt else f"  [dtype note: {sdt} vs {ddt}]"
            print(f"PASS {name} ({spark_df.shape[0]} rows){dtw}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} total")
    sys.exit(1 if n_fail else 0)

main()
