#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query...]

Runs AFTER `graft.Verify` has dumped <outDir>/<name>/ parquet and
<outDir>/oracle_sql.json. Binds bare table names as DuckDB views over
<sfDir>/<name>.parquet, executes each oracle SQL, and compares against the
Spark parquet dump THE WAY THE DRIVER DOES (round-1 lesson: the old
float-canonicalizing compare passed 69 locally while the driver scored 40):

  - both sides load into pandas (Spark parquet via pandas.read_parquet, the
    oracle via duckdb .df()) — so a Spark DECIMAL column becomes object
    dtype of decimal.Decimal (str '138014.00') while DuckDB's becomes
    float64 (str '138014.0'): STRING-level compare keeps that a FAIL;
  - columns sorted by name, then rows sorted by all columns
    (pandas sort_values — crashes on ndarray/dict cells exactly like the
    driver's comparator, reported as ERR);
  - cells compared as strings (df.astype(str)), mirroring the driver hash.

Dev-only tool — NOT part of the shipped library.
"""
import sys, json, glob, traceback

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    """Driver-style canonical frame: columns sorted by name, rows sorted by
    every column, cells stringified. Raises on unhashable cells (arrays/
    structs) just like the driver's pandas sort."""
    cols = sorted(df.columns)
    df = df[cols]
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df.astype(str)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            spark = pd.concat([pd.read_parquet(f) for f in files],
                              ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: spark parquet read error: {e}")
            n_fail += 1
            continue
        if sorted(spark.columns) != sorted(duck.columns):
            print(f"FAIL {name}: columns spark={sorted(spark.columns)} "
                  f"duck={sorted(duck.columns)}")
            n_fail += 1
            continue
        if len(spark) != len(duck):
            print(f"FAIL {name}: rows spark={len(spark)} duck={len(duck)}")
            n_fail += 1
            continue
        try:
            s, d = normalize(spark), normalize(duck)
        except Exception:
            print(f"ERR  {name}: comparator crash (driver would err too): "
                  f"{traceback.format_exc().splitlines()[-1]}")
            n_fail += 1
            continue
        if s.equals(d):
            print(f"PASS {name} ({len(spark)} rows)")
            n_pass += 1
        else:
            neq = (s != d)
            cells = int(neq.to_numpy().sum())
            # first mismatching cell for the report
            loc = next(((i, c) for c in s.columns for i in s.index[neq[c]]),
                       None)
            i, c = loc
            print(f"FAIL {name}: {cells} cells differ; first row {i} col {c}: "
                  f"spark={s.at[i, c]!r} duck={d.at[i, c]!r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
