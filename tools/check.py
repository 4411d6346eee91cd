#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query...]

Runs AFTER `graft.Verify` has dumped <outDir>/<name>/ parquet and
<outDir>/oracle_sql.json. Binds bare table names as DuckDB views over
<sfDir>/<name>.parquet, executes each oracle SQL, and compares against the
Spark parquet dump: row count, column-name set (sorted), and cell-by-cell
values (exact; floats flagged with max-abs-diff when not exact).

Dev-only tool — NOT part of the shipped library.
"""
import sys, json, glob, math
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def eq(a, b):
    a, b = canon(a), canon(b)
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b


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
            duck = con.execute(sql).fetchall()
            dcols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        spark = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        scols = [d[0] for d in con.description]
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        if len(spark) != len(duck):
            print(f"FAIL {name}: rows spark={len(spark)} duck={len(duck)}")
            n_fail += 1
            continue
        # reorder both to sorted-column order (driver sorts cols by name)
        sidx = [scols.index(c) for c in sorted(scols)]
        didx = [dcols.index(c) for c in sorted(dcols)]
        bad = None
        maxdiff = 0.0
        for i, (srow, drow) in enumerate(zip(spark, duck)):
            for j, (si, di) in enumerate(zip(sidx, didx)):
                a, b = srow[si], drow[di]
                if not eq(a, b):
                    if bad is None:
                        bad = (i, sorted(scols)[j], a, b)
                    ca, cb = canon(a), canon(b)
                    if isinstance(ca, float) and isinstance(cb, float):
                        maxdiff = max(maxdiff, abs(ca - cb))
        if bad:
            print(f"FAIL {name}: first mismatch row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} duck={bad[3]!r} (maxfloatdiff={maxdiff:g})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
