#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, run its oracle SQL in DuckDB over
the same parquet tables and compare: schema (column names sorted), row
count, and values (rows sorted, columns sorted by name, floats exact).
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
n_pass = n_fail = 0
no_oracle = []
for qdir in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    got = con.sql(
        f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
    if name not in oracle:
        no_oracle.append((name, len(got)))
        continue
    try:
        exp = con.sql(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    ok = True
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: columns {gcols} vs {ecols}")
        ok = False
    elif len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        ok = False
    else:
        g = got[gcols].sort_values(gcols, kind="mergesort").reset_index(drop=True)
        e = exp[ecols].sort_values(ecols, kind="mergesort").reset_index(drop=True)
        for c in gcols:
            gv, ev = g[c], e[c]
            try:
                eq = (gv.astype(str) == ev.astype(str)).all()
            except Exception:
                eq = False
            if not eq:
                diffs = (gv.astype(str) != ev.astype(str))
                i = diffs.idxmax()
                print(f"FAIL {name}: col {c} differs at sorted row {i}: "
                      f"spark={gv[i]!r} duckdb={ev[i]!r} "
                      f"({int(diffs.sum())}/{len(gv)} rows differ)")
                ok = False
                break
    if ok:
        n_pass += 1
        print(f"PASS {name} ({len(got)} rows)")
    else:
        n_fail += 1
for name, n in no_oracle:
    print(f"ROWS-ONLY {name}: {n} rows" + ("  ** EMPTY **" if n == 0 else ""))
missing = set(oracle) - {os.path.basename(d.rstrip('/'))
                         for d in glob.glob(f'{out_dir}/*/')}
for m in sorted(missing):
    print(f"MISSING OUTPUT for oracle entry: {m}")
print(f"\n{n_pass} pass, {n_fail} fail, {len(no_oracle)} rows-only, "
      f"{len(missing)} missing")
sys.exit(1 if (n_fail or missing) else 0)
