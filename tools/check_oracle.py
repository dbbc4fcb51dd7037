#!/usr/bin/env python3
"""Local development harness mimicking the driver's correctness gate:
run graft.Verify (sbt) at a given SF, then replay SparkEntry.oracleSql in
DuckDB over the same parquet tables and diff the results.

Usage: python3 tools/check_oracle.py [sfDir] [outDir] [--no-run] [query ...]

This is a dev tool only — the shipped engine is the Scala library.
"""
import json, os, subprocess, sys

SF = "/root/testdata/sf0.01"
OUT = "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    args = [a for a in sys.argv[1:]]
    run = True
    if "--no-run" in args:
        run = False
        args.remove("--no-run")
    sf = args[0] if len(args) > 0 else SF
    out = args[1] if len(args) > 1 else OUT
    only = set(args[2:])

    if run:
        r = subprocess.run(
            ["sbt", f'runMain graft.Verify {sf} {out}'],
            cwd="/root/repo", capture_output=True, text=True)
        sys.stdout.write(r.stdout[-4000:])
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-4000:])
            sys.exit(1)

    import duckdb
    import pandas as pd
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    with open(f"{out}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:300]}")
            n_fail += 1
            continue
        # driver semantics: sort columns by name, then compare values
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        ok = True
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            ok = False
        elif len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            ok = False
        else:
            es = exp.astype(str).reset_index(drop=True)
            gs = got.astype(str).reset_index(drop=True)
            neq = (es != gs)
            if neq.any().any():
                ok = False
                cells = int(neq.sum().sum())
                print(f"FAIL {name}: {cells} differing cells")
                mask = neq.any(axis=1)
                idx = list(es.index[mask])[:5]
                for i in idx:
                    print(f"  row {i}: exp={exp.iloc[i].to_dict()}")
                    print(f"          got={got.iloc[i].to_dict()}")
                # dtype hint
                for c in exp.columns:
                    if str(exp[c].dtype) != str(got[c].dtype):
                        print(f"  dtype {c}: exp={exp[c].dtype} got={got[c].dtype}")
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(exp)} rows)")
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
