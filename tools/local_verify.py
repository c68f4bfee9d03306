#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify at a given SF,
then execute each oracle SQL in DuckDB against the same parquet tables and
compare (columns sorted by name, rows sorted, exact values; floats must be
bit-identical, with a tolerance report if not).

Usage: python3 tools/local_verify.py [sfDir] [outDir] [--skip-spark]
"""
import json, os, subprocess, sys, glob

import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
# --only=q1,q2 restricts both the Spark dump and the DuckDB compare —
# for the sf>=10 scale-correctness runs where all 121 queries are
# wall-clock-prohibitive. The driver's own gate never passes it.
ONLY = None
for a in sys.argv[3:]:
    if a.startswith("--only="):
        ONLY = ",".join(x.strip() for x in a[len("--only="):].split(",") if x.strip())
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if "--skip-spark" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch",
         f'runMain graft.Verify {SF} {OUT}' + (f" {ONLY}" if ONLY else "")],
        cwd="/root/repo", capture_output=True, text=True, timeout=7200)
    sys.stdout.write(r.stdout[-3000:])
    sys.stderr.write(r.stderr[-3000:])
    if r.returncode != 0:
        sys.exit("Verify failed")

con = duckdb.connect()
# Large-SF oracle runs can exceed DuckDB's default 80%-of-RAM budget and
# fill the root filesystem with temp spill; both knobs are overridable so
# the heavy sf10 oracles spill to a chosen volume instead of dying.
if os.environ.get("GRAFT_DUCKDB_MEMORY"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEMORY']}'")
if os.environ.get("GRAFT_DUCKDB_TEMP"):
    os.makedirs(os.environ["GRAFT_DUCKDB_TEMP"], exist_ok=True)
    con.execute(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TEMP']}'")
if os.environ.get("GRAFT_DUCKDB_THREADS"):
    con.execute(f"SET threads={os.environ['GRAFT_DUCKDB_THREADS']}")
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written table: a directory of part files
        p = f"{p}/*.parquet"
    elif not os.path.exists(p):
        continue
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))
if ONLY:
    keep = set(ONLY.split(","))
    oracles = {k: v for k, v in oracles.items() if k in keep}
fail = 0
for name, sql in sorted(oracles.items()):
    spark_dir = f"{OUT}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} != {wc}"); fail += 1; continue
    got = got[gc].sort_values(gc, kind="mergesort").reset_index(drop=True)
    want = want[wc].sort_values(wc, kind="mergesort").reset_index(drop=True)
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fail += 1; continue
    ok = True
    for c in gc:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            eq = (g.values == w.values) | (pd.isna(g.values) & pd.isna(w.values))
            if not eq.all():
                d = np.nanmax(np.abs(g.values - w.values))
                print(f"FAIL {name}: col {c} float mismatch maxdiff={d} "
                      f"({(~eq).sum()}/{len(g)} rows)")
                ok = False
        else:
            if not g.astype(object).where(pd.notna(g), None).equals(
                   w.astype(object).where(pd.notna(w), None)):
                n = (g.astype(str) != w.astype(str)).sum()
                print(f"FAIL {name}: col {c} mismatch in {n} rows; e.g.\n"
                      f"{pd.concat([g, w], axis=1, keys=['spark','duck'])[g.astype(str) != w.astype(str)].head(3)}")
                ok = False
        if g.dtype != w.dtype:
            print(f"WARN {name}: col {c} dtype spark={g.dtype} duck={w.dtype}")
    if ok:
        print(f"PASS {name} ({len(got)} rows)")
    else:
        fail += 1

noracle = [n for n in json.load(open(f"{OUT}/oracle_sql.json"))]
print(f"\n{len(oracles) - fail}/{len(oracles)} oracle-checked queries pass")
sys.exit(1 if fail else 0)
