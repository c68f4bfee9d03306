#!/usr/bin/env python3
"""Staged DuckDB oracle compare for the three heaviest dedup oracles at
sf>=10 (dedup_near_apply, dedup_cluster_sizes, dedup_minhash_est).

Why: these oracles reference their corpus-wide shingle CTE (`sh`/`shh`,
~150M rows of strings at sf10) three or four times. DuckDB materializes a
multi-referenced CTE, and at sf10 the string-level materializations plus
concurrent join spills exceed the volume (observed 52 GB of temp before
ENOSPC). Running the SAME chain stage-by-stage — materializing each
barrier CTE once as a temp table and exposing it as a view under its
original CTE name — holds one pipeline's footprint at a time. CTE bodies
are reused byte-identical from the oracle string (parsed, not rewritten),
so the compare stays faithful to the gate SQL. The one allowed extra step
is a plain filter on an already-constructed CTE's OUTPUT (e.g. restrict
`sh` to candidate-pair docs before the intersection join), which is
semantics-preserving for the downstream joins that only read those rows.

Validated bit-exact against the plain single-statement compare at sf0.01
before any sf10 use (see docs/BENCH_NOTES.md round-12 oracle section).

Usage: python3 tools/staged_oracle.py <sfDir> <outDir> <query>
"""
import json, os, re, sys

import duckdb
import pandas as pd
import numpy as np

SF, OUT, QUERY = sys.argv[1], sys.argv[2], sys.argv[3]

con = duckdb.connect()
if os.environ.get("GRAFT_DUCKDB_MEMORY"):
    con.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEMORY']}'")
if os.environ.get("GRAFT_DUCKDB_TEMP"):
    os.makedirs(os.environ["GRAFT_DUCKDB_TEMP"], exist_ok=True)
    con.execute(f"SET temp_directory='{os.environ['GRAFT_DUCKDB_TEMP']}'")
if os.environ.get("GRAFT_DUCKDB_THREADS"):
    con.execute(f"SET threads={os.environ['GRAFT_DUCKDB_THREADS']}")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    elif not os.path.exists(p):
        continue
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

sql = json.load(open(f"{OUT}/oracle_sql.json"))[QUERY]


def parse_ctes(q):
    """Split `WITH [RECURSIVE] n1 AS (b1), n2 AS (b2), ... final` into
    ([(name, body)...], final_select, recursive_flag)."""
    m = re.match(r"\s*WITH\s+(RECURSIVE\s+)?", q, re.I)
    assert m, "not a WITH query"
    rec = bool(m.group(1))
    i = m.end()
    ctes = []
    while True:
        m = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(").match(q, i)
        if not m:
            break
        name = m.group(1)
        j = m.end()  # position after '('
        depth = 1
        while depth:
            c = q[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        ctes.append((name, q[m.end():j - 1]))
        i = j
        m2 = re.compile(r"\s*,").match(q, i)
        if not m2:
            break
        i = m2.end()
    return ctes, q[i:].strip(), rec


ctes, final, rec = parse_ctes(sql)
names = [n for n, _ in ctes]


def run_prefix(upto, select, label):
    """Run `WITH <not-yet-materialized CTEs up to `upto`> <select>`,
    materialize as temp table exposed as view `upto`."""
    idx = names.index(upto)
    chain = [(n, b) for n, b in ctes[: idx + 1] if not materialized(n)]
    with_clause = ("WITH " + ",\n".join(f"{n} AS ({b})" for n, b in chain)
                   if chain else "")
    con.execute(f"CREATE TEMP TABLE {upto}__t AS {with_clause}\n{select}")
    con.execute(f"CREATE TEMP VIEW {upto} AS SELECT * FROM {upto}__t")
    n = con.execute(f"SELECT count(*) FROM {upto}__t").fetchone()[0]
    print(f"stage {label}: {upto} materialized ({n} rows)", flush=True)


done = set()


def materialized(n):
    return n in done


def barrier(name, extra_filter=None):
    sel = f"SELECT * FROM {name}"
    if extra_filter:
        sel += f" WHERE {extra_filter}"
    run_prefix(name, sel, name)
    done.add(name)


if QUERY in ("dedup_near_apply", "dedup_cluster_sizes"):
    barrier("shh")        # one streaming pass: d -> sh -> shh (longs out)
    barrier("shf")        # df-cap join over shh
    con.execute("DROP VIEW shh"); con.execute("DROP TABLE shh__t")
elif QUERY == "dedup_minhash_est":
    barrier("hb")         # d -> sh -> hb: one pass, (doc_id, hbase) out
    barrier("mh")         # 16-way min over hb
    con.execute("DROP VIEW hb"); con.execute("DROP TABLE hb__t")
    barrier("cand")       # bands/small/kept self-join over mh (bounded)
    # sizes and inter re-derive sh; restrict inter's sh to candidate docs
    # (plain filter on sh's output — inter only reads those rows).
    barrier("sizes")      # second full pass: d -> sh -> count per doc
    cd = ("doc_id IN (SELECT doc_a FROM cand UNION "
          "SELECT doc_b FROM cand)")
    # materialize the restricted sh under its own name for the remainder
    idx = names.index("sh")
    chain = [(n, b) for n, b in ctes[: idx + 1]]
    wc = "WITH " + ",\n".join(f"{n} AS ({b})" for n, b in chain)
    con.execute(f"CREATE TEMP TABLE sh__t AS {wc}\nSELECT * FROM sh WHERE {cd}")
    con.execute("CREATE TEMP VIEW sh AS SELECT * FROM sh__t")
    n = con.execute("SELECT count(*) FROM sh__t").fetchone()[0]
    print(f"stage sh(restricted): {n} rows", flush=True)
    done.add("sh")
elif QUERY in ("text_unigram_logprob", "text_ppl_buckets"):
    # The single-statement form dies in DuckDB at sf10: the 26M-row
    # per-term window (sc), the 89-step float-canonical list_reduce
    # projection (lg) and the ordered per-doc list aggregate (pd) all
    # hold memory inside ONE pipeline. Materializing tf -> sc -> lg as
    # stages (bodies verbatim) leaves each blocking operator alone with
    # the full budget. Even then, pd's ordered list aggregate alone
    # exceeds the allocator at 500k docs, so the remainder runs in
    # doc_id-residue chunks: the lg view is re-created with a plain
    # residue filter on the materialized table (per-doc rows are
    # independent), and the per-doc chunk outputs union exactly; ppl's
    # bucket aggregate merges with its own combine (sum/min/max — count
    # integer-exact, min/max select existing doubles).
    barrier("tf")         # d -> tok -> tf: one pass, (doc, term, tf)
    barrier("sc")         # per-term window over materialized tf
    barrier("lg")         # streaming 89-step reduce projection over sc
    con.execute("DROP VIEW sc"); con.execute("DROP TABLE sc__t")
    CHUNKS = int(os.environ.get("GRAFT_ORACLE_CHUNKS", "8"))
elif QUERY == "rel_dominant_supplier":
    # The single-statement plan evaluates the doubly-correlated `dom`
    # by re-deriving `ps` (the 3-key lineitem aggregate) once per
    # correlated reference (ps, p2, p3) — three concurrent full-width
    # materializations spilled ~47 GB of DuckDB temp at sf100 (ENOSPC
    # twice, r14). Materializing ps ONCE (body verbatim) leaves the
    # decorrelated per-(partkey, yr) aggregates to run over the temp
    # table — one pipeline's footprint at a time. At sf100 even that
    # one pipeline (ps ⋈ its own per-cell aggregate, ~600M rows each
    # side) exceeds the volume's temp headroom, so GRAFT_DOM_CHUNKS>1
    # additionally evaluates `dom` (body verbatim) over partkey-residue
    # slices of the materialized ps: every correlated probe in dom is
    # confined to rows sharing (l_partkey, yr), a residue class keeps
    # each such cell whole, and dom is a per-row existential — the
    # chunk outputs union exactly. All arithmetic inside dom is
    # DECIMAL/COUNT (exact, order-free), so chunking is bit-exact by
    # construction (and validated against the unchunked staged form at
    # sf0.01 before sf100 use).
    barrier("ps")
    DOM_CHUNKS = int(os.environ.get("GRAFT_DOM_CHUNKS", "1"))
    if DOM_CHUNKS > 1:
        dom_body = dict(ctes)["dom"]
        for k in range(DOM_CHUNKS):
            con.execute("DROP VIEW ps")
            con.execute(f"CREATE TEMP VIEW ps AS SELECT * FROM ps__t "
                        f"WHERE (l_partkey % {DOM_CHUNKS}) = {k}")
            if k == 0:
                con.execute(f"CREATE TEMP TABLE dom__t AS {dom_body}")
            else:
                con.execute(f"INSERT INTO dom__t {dom_body}")
            print(f"dom chunk {k + 1}/{DOM_CHUNKS}", flush=True)
        con.execute("DROP VIEW ps")
        con.execute("CREATE TEMP VIEW ps AS SELECT * FROM ps__t")
        con.execute("CREATE TEMP VIEW dom AS SELECT * FROM dom__t")
        done.add("dom")
elif QUERY == "sim_embedding_decontam":
    # The single-statement `hits` re-computes the full |corpus|x|eval|
    # cosine through per-element list_reduce SQL (~2e12 FLOPs at sf100;
    # DuckDB ground 45+ min interpreted and was killed, r14). Staged
    # form: materialize `nl` (vectors + norms, bodies verbatim — the
    # norms that enter every cosine are DuckDB's own values), then
    # compute the EXISTENTIAL hit set with blocked BLAS and re-check
    # every borderline pair with the oracle's exact sequential
    # accumulation order — the oracle-side mirror of the kernel's
    # conservative-slack discipline:
    #  - BLAS reorders the 64-term dot accumulation, so its cosine can
    #    differ from the canonical left-fold by rounding; any pair with
    #    |cos_blas - t| > EPS (EPS = 1e-9, ~1e5 times the worst 64-term
    #    reorder error for unit-scale data) has a certain verdict;
    #  - borderline pairs re-run the dot as the literal i=1..64 left
    #    fold (acc += v[i]*ev[i]) — bit-identical to list_reduce — and
    #    decide exactly. Hit sets are existential unions over blocks,
    #    so blocking cannot change the verdict.
    barrier("nl")
    t = 0.4
    EPS = 1e-9
    ev_df = con.execute(
        "SELECT v, nrm FROM nl WHERE label = 0").df()
    E = np.array(ev_df["v"].tolist(), dtype=np.float64)
    en = ev_df["nrm"].to_numpy(dtype=np.float64)
    c_df = con.execute(
        "SELECT vec_id, v, nrm FROM nl WHERE label <> 0").df()
    C = np.array(c_df["v"].tolist(), dtype=np.float64)
    cn = c_df["nrm"].to_numpy(dtype=np.float64)
    cid = c_df["vec_id"].to_numpy()
    del ev_df, c_df
    sq_en = np.sqrt(en)
    sq_cn = np.sqrt(cn)
    hit = np.zeros(len(cid), dtype=bool)
    CB, EB = 16384, 16384
    reconsidered = 0
    for ci in range(0, len(cid), CB):
        Cb = C[ci:ci + CB]
        sb = sq_cn[ci:ci + CB]
        hb = hit[ci:ci + CB]
        for ei in range(0, len(en), EB):
            pend = ~hb  # rows already hit need no more blocks
            if not pend.any():
                break
            cos = (Cb[pend] @ E[ei:ei + EB].T) / (
                sb[pend, None] * sq_en[None, ei:ei + EB])
            sure = cos >= t + EPS
            hb[np.flatnonzero(pend)[sure.any(axis=1)]] = True
            border = (np.abs(cos - t) <= EPS) & ~sure
            if border.any():
                pi = np.flatnonzero(pend)
                for r, e in zip(*np.nonzero(border)):
                    gi = pi[r]
                    if hb[gi]:
                        continue
                    reconsidered += 1
                    acc = 0.0
                    cv, evv = Cb[gi], E[ei + e]
                    for i in range(64):
                        acc += cv[i] * evv[i]
                    if acc / (sq_cn[ci + gi] * sq_en[ei + e]) >= t:
                        hb[gi] = True
        print(f"hits block {ci // CB + 1}/{(len(cid) + CB - 1) // CB}: "
              f"{int(hit.sum())} hit so far", flush=True)
    print(f"hits: {int(hit.sum())} of {len(cid)} corpus vectors "
          f"({reconsidered} borderline pairs re-checked exactly)", flush=True)
    hits_df = pd.DataFrame({"vec_id": np.sort(cid[hit])})
    con.register("hits_src", hits_df)
    con.execute("CREATE TEMP TABLE hits__t AS SELECT * FROM hits_src")
    con.execute("CREATE TEMP VIEW hits AS SELECT * FROM hits__t")
    done.add("hits")
    del C, E
else:
    sys.exit(f"unsupported query {QUERY}")

# Run the remainder: original WITH minus materialized CTEs (views stand in),
# pruned to CTEs actually referenced from the final select (directly or
# transitively) — an unused CTE body may reference an already-dropped stage.
rest = [(n, b) for n, b in ctes if n not in done]
needed = set()
frontier = final
changed = True
while changed:
    changed = False
    for n, b in reversed(rest):
        if n in needed:
            continue
        if re.search(rf"\b{n}\b", frontier) or any(
                re.search(rf"\b{n}\b", b2) for n2, b2 in rest if n2 in needed):
            needed.add(n)
            changed = True
rest = [(n, b) for n, b in rest if n in needed]
wc = ""
if rest:
    wc = "WITH " + ("RECURSIVE " if rec else "") + ",\n".join(
        f"{n} AS ({b})" for n, b in rest)

PPL_TAIL = "FROM ul GROUP BY 1 ORDER BY 1"
if QUERY in ("text_unigram_logprob", "text_ppl_buckets"):
    parts = []
    for k in range(CHUNKS):
        con.execute("DROP VIEW lg")
        con.execute(
            f"CREATE TEMP VIEW lg AS SELECT * FROM lg__t "
            f"WHERE doc_id % {CHUNKS} = {k}")
        if QUERY == "text_unigram_logprob":
            chunk_sql = (f"SELECT * FROM ({wc}\n{final}) "
                         f"WHERE doc_id % {CHUNKS} = {k}")
        else:
            assert final.rstrip().endswith(PPL_TAIL), "oracle tail changed"
            chunk_sql = wc + "\n" + final.rstrip()[: -len(PPL_TAIL)] + (
                f"FROM (SELECT * FROM ul WHERE doc_id % {CHUNKS} = {k}) ul "
                "GROUP BY 1 ORDER BY 1")
        parts.append(con.execute(chunk_sql).df())
        print(f"chunk {k + 1}/{CHUNKS}: {len(parts[-1])} rows", flush=True)
    want = pd.concat(parts, ignore_index=True)
    if QUERY == "text_ppl_buckets":
        want = (want.groupby("bucket", as_index=False)
                    .agg(n_docs=("n_docs", "sum"),
                         min_bpt=("min_bpt", "min"),
                         max_bpt=("max_bpt", "max")))
else:
    want = con.execute(f"{wc}\n{final}").df()
got = con.execute(
    f"SELECT * FROM read_parquet('{OUT}/{QUERY}/*.parquet')").df()

gc, wc2 = sorted(got.columns), sorted(want.columns)
if gc != wc2:
    sys.exit(f"FAIL {QUERY}: columns {gc} != {wc2}")
got = got[gc].sort_values(gc, kind="mergesort").reset_index(drop=True)
want = want[wc2].sort_values(wc2, kind="mergesort").reset_index(drop=True)
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
print(f"PASS {QUERY} ({len(got)} rows, staged protocol)")
