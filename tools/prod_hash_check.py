#!/usr/bin/env python3
"""Production-hash correctness protocol (r13): the DuckDB oracle mirrors
the md5-derived portable hash only, so the xxhash64 production mode is
checked Spark-vs-Spark instead:

  1. dump every query in md5 mode   (graft.Verify, default)
  2. dump every query in prod mode  (SPARK_GRAFT_PRODUCTION_HASH=true)
  3. this script compares the dumps:
     - the hash-INDEPENDENT majority must be BIT-IDENTICAL across modes
       (the hash never reaches their outputs);
     - the documented HASH_DEPENDENT set (outputs are hash-valued or
       hash-assigned) is invariant-checked: same schema, row counts
       within a documented band, and never empty. Their per-kernel
       correctness in both modes is spec-pinned (kernel ≡ chain parity
       runs in BOTH hash modes in the test suite).

Any query that differs but is not allowlisted fails; any allowlisted
query that turns out bit-identical is reported so the list can shrink.

Usage: python3 tools/prod_hash_check.py <md5_dump_dir> <prod_dump_dir>
"""
import glob
import os
import sys

import pandas as pd

# Queries whose OUTPUT depends on the portable-hash choice, with the
# reason and the row-count band (prod_rows / md5_rows) they must stay
# inside. Everything else must be bit-identical across hash modes.
HASH_DEPENDENT = {
    # minhash signatures / estimates / candidate pairs: the affine
    # minima are taken over hash VALUES, so both the signature columns
    # and the surviving candidate set change with the hash.
    "dedup_minhash_candidates": (0.3, 3.0),
    "dedup_minhash_est": (0.3, 3.0),
    "dedup_bucket_stats": (1.0, 1.0),  # 3 audit rows always; values may move
    # simhash: bit-majority over hashed feature values.
    "dedup_simhash": (1.0, 1.0),       # one row per doc, signature values move
    "dedup_simhash_pairs": (0.0, 10.0),  # hamming-ball membership moves freely
    # LSH bucket membership drives the incremental near verdicts.
    # (Observed bit-identical at sf0.1 — the fixture's verdicts are
    # hash-robust — but membership CAN flip borderline pairs, so they
    # stay documented rather than required-identical.)
    "dedup_incremental": (1.0, 1.0),   # one row per delta doc, verdicts may move
    "dedup_incremental_reuse": (1.0, 1.0),
    # salted-hash assignment: split/fold/shard/sample membership is the
    # hash value itself.
    "sample_split_assign": (1.0, 1.0),  # one row per doc; split label moves
    "sample_split_stats": (0.5, 1.5),   # one row per non-empty (split, source)
    "sample_kfold": (1.0, 1.0),        # every doc appears once per fold pairing
    "sample_stratified": (0.5, 2.0),
    "sample_mix_apply": (0.5, 2.0),    # sampled membership moves
    "sample_mix_stats": (0.8, 1.25),   # one row per source; counts move
    "sample_temperature_apply": (0.5, 2.0),  # sampled membership moves
    "sample_pack_plan": (1.0, 1.0),    # one row per doc; shard/pack ids move
    "sample_pack_stats": (0.8, 1.25),  # one row per non-empty shard
    # LSH table membership. (ann_lsh/bucket_stats/ann_recall observed
    # bit-identical at sf0.1 — candidate sets superset the fixture's
    # true top-k under either hash — but membership is hash-valued.)
    "sim_cosine_ann_lsh": (0.3, 3.0),
    "sim_bucket_stats": (1.0, 1.0),
    "sim_ann_recall": (1.0, 1.0),      # 3 audit rows; recall values may move
    # NOT here: text_fingerprint — its fingerprints are md5-hex by
    # construction in BOTH modes (DuckDB-portable), it never consults
    # PortableHash; sample_split_stats siblings sample_budget_plan /
    # sample_temperature_plan aggregate counts only (hash-free).
}


def load(path):
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    names = sorted(
        d for d in os.listdir(a_dir)
        if os.path.isdir(os.path.join(a_dir, d)))
    missing = [d for d in names if not os.path.isdir(os.path.join(b_dir, d))]
    if missing:
        sys.exit(f"FAIL: prod dump missing queries: {missing}")
    stale = [q for q in HASH_DEPENDENT if q not in names]
    if stale:
        sys.exit(f"FAIL: HASH_DEPENDENT names not in the dump (allowlist "
                 f"rot — fix the names): {stale}")
    identical, invariant_ok, failures, shrink = [], [], [], []
    for name in names:
        a = load(os.path.join(a_dir, name))
        b = load(os.path.join(b_dir, name))
        same_schema = list(a.columns) == list(b.columns) and all(
            str(a[c].dtype) == str(b[c].dtype) for c in a.columns)
        bit_same = same_schema and len(a) == len(b) and a.equals(b)
        if name not in HASH_DEPENDENT:
            if bit_same:
                identical.append(name)
            else:
                failures.append(
                    f"{name}: differs across hash modes but is not in the "
                    f"documented HASH_DEPENDENT set (md5={len(a)} rows, "
                    f"prod={len(b)} rows, schema_same={same_schema})")
            continue
        lo, hi = HASH_DEPENDENT[name]
        ratio = len(b) / max(len(a), 1)
        problems = []
        if not same_schema:
            problems.append("schema drift")
        if len(b) == 0:
            problems.append("prod dump empty")
        if not (lo <= ratio <= hi):
            problems.append(
                f"row ratio {ratio:.2f} outside [{lo}, {hi}] "
                f"(md5={len(a)}, prod={len(b)})")
        if problems:
            failures.append(f"{name}: " + "; ".join(problems))
        else:
            invariant_ok.append(f"{name} (rows {len(a)} -> {len(b)})")
            if bit_same:
                shrink.append(name)
    print(f"bit-identical across hash modes: {len(identical)}")
    print(f"hash-dependent, invariants hold: {len(invariant_ok)}")
    for line in invariant_ok:
        print(f"  {line}")
    if shrink:
        print(f"NOTE: allowlisted but bit-identical (consider removing): {shrink}")
    if failures:
        print("FAILURES:")
        for f in failures:
            print(f"  {f}")
        sys.exit(1)
    print(f"OK: {len(identical)} identical + {len(invariant_ok)} "
          f"invariant-checked = {len(names)} queries")


if __name__ == "__main__":
    main()
