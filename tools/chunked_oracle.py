#!/usr/bin/env python3
"""Chunked DuckDB oracle compare for the two per-doc text oracles whose
89-step float-canonical list_reduce cannot spill in DuckDB at sf10
(text_unigram_logprob, text_ppl_buckets).

Protocol (semantics-preserving, documented in docs/BENCH_NOTES.md):
- text_unigram_logprob: the oracle's output is per-doc. Run the UNMODIFIED
  oracle SQL wrapped as `SELECT * FROM (<sql>) WHERE doc_id % N = k` for
  k = 0..N-1. DuckDB's own optimizer pushes the residue filter through the
  per-doc group-bys but NOT into the corpus-level branch (pushdown is
  semantics-preserving by construction), so each chunk recomputes the
  full corpus stats but holds only 1/N of the non-spillable per-doc list
  state. The union of chunks is exactly the full result.
- text_ppl_buckets: same inner per-doc table (`ul` CTE), but the final
  SELECT is a bucket aggregate. Rewrite ONLY the final FROM to read the
  doc_id-filtered `ul`, collect per-chunk partial rows, and merge with
  the aggregate's own combine: n_docs = sum, min_bpt = min, max_bpt = max
  (count is integer-exact; min/max select existing doubles — bit-exact).

Usage: python3 tools/chunked_oracle.py <sfDir> <outDir> <query> [chunks]
"""
import json, os, sys, glob

import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1]
OUT = sys.argv[2]
QUERY = sys.argv[3]
N = int(sys.argv[4]) if len(sys.argv) > 4 else 16

con = duckdb.connect()
if os.environ.get("GRAFT_DUCKDB_MEMORY"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEMORY']}'")
if os.environ.get("GRAFT_DUCKDB_TEMP"):
    os.makedirs(os.environ["GRAFT_DUCKDB_TEMP"], exist_ok=True)
    con.execute(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TEMP']}'")
if os.environ.get("GRAFT_DUCKDB_THREADS"):
    con.execute(f"SET threads={os.environ['GRAFT_DUCKDB_THREADS']}")

p = f"{SF}/documents.parquet"
if os.path.isdir(p):
    p = f"{p}/*.parquet"
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")

sql = json.load(open(f"{OUT}/oracle_sql.json"))[QUERY]

PPL_TAIL = "FROM ul GROUP BY 1 ORDER BY 1"

parts = []
for k in range(N):
    if QUERY == "text_unigram_logprob":
        chunk_sql = f"SELECT * FROM ({sql}) WHERE doc_id % {N} = {k}"
    elif QUERY == "text_ppl_buckets":
        assert sql.rstrip().endswith(PPL_TAIL), "oracle tail changed"
        chunk_sql = sql.rstrip()[: -len(PPL_TAIL)] + (
            f"FROM (SELECT * FROM ul WHERE doc_id % {N} = {k}) ul "
            "GROUP BY 1 ORDER BY 1")
    else:
        sys.exit(f"unsupported query {QUERY}")
    parts.append(con.execute(chunk_sql).df())
    print(f"chunk {k + 1}/{N}: {len(parts[-1])} rows", flush=True)

want = pd.concat(parts, ignore_index=True)
if QUERY == "text_ppl_buckets":
    want = (want.groupby("bucket", as_index=False)
                .agg(n_docs=("n_docs", "sum"),
                     min_bpt=("min_bpt", "min"),
                     max_bpt=("max_bpt", "max")))

got = con.execute(
    f"SELECT * FROM read_parquet('{OUT}/{QUERY}/*.parquet')").df()

gc, wc = sorted(got.columns), sorted(want.columns)
if gc != wc:
    sys.exit(f"FAIL {QUERY}: columns {gc} != {wc}")
got = got[gc].sort_values(gc, kind="mergesort").reset_index(drop=True)
want = want[wc].sort_values(wc, kind="mergesort").reset_index(drop=True)
if len(got) != len(want):
    sys.exit(f"FAIL {QUERY}: rows {len(got)} != {len(want)}")
for c in gc:
    g, w = got[c], want[c]
    if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
        ga = g.to_numpy(dtype=np.float64)
        wa = w.to_numpy(dtype=np.float64)
        same = (ga.view(np.int64) == wa.view(np.int64)) | (np.isnan(ga) & np.isnan(wa))
        if not same.all():
            bad = int((~same).sum())
            md = float(np.nanmax(np.abs(ga - wa)))
            sys.exit(f"FAIL {QUERY}: col {c} {bad} rows differ, maxdiff {md}")
    else:
        if not g.equals(w):
            sys.exit(f"FAIL {QUERY}: col {c} values differ")
print(f"PASS {QUERY} ({len(got)} rows, {N}-chunk protocol)")
