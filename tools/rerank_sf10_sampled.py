#!/usr/bin/env python3
"""Dev-only sf10 sampled-queries oracle for the emb_sq_rerank pair.

The committed emb_sq_rerank / emb_sq_rerank_recall oracles replay the
full two-stage chain for all 10 gate queries; at sf10 (6M vectors) that
is ~4B per-dim terms per stage and DuckDB needs hours. Every window in
both oracles partitions BY query_id and the SQ model (per-dim min/max)
is corpus-global and query-independent, so the oracle restricted to any
query subset is EXACT for the covered queries (the
tools/sf10_oracles.py residue-class argument: zero false positives on
covered rows, a deterministic slice rather than an approximation).
This evaluates the committed SQL for queries vec_id < K (default 2) and
compares against the Spark output filtered to the same queries.

Usage: python3 tools/rerank_sf10_sampled.py <sfDir> <verifyOutDir> [K]
Exit 0 iff both gates match on the covered slice.
"""
import sys

import duckdb

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check import table_hash  # noqa: E402


def committed_oracles():
    """Pull the two committed SQL strings out of the Verify dump the
    driver reads (oracle_sql.json), so this stays byte-coupled to the
    gate definitions instead of carrying a copy."""
    import json
    import glob
    for cand in glob.glob(f"{OUT_DIR}/oracle_sql.json"):
        with open(cand) as f:
            oracles = json.load(f)
        return oracles["emb_sq_rerank"], oracles["emb_sq_rerank_recall"]
    raise SystemExit(f"no oracle_sql.json under {OUT_DIR}")


MARKER = "q.vec_id < 10"
# Expected marker occurrences per gate: a partial rename of the filter
# in SOME CTEs but not others would silently produce a partially
# restricted (wrong) sampled oracle, so the count must match exactly
# (round-15 ADVICE #4).
EXPECTED_MARKERS = {"emb_sq_rerank": 1, "emb_sq_rerank_recall": 3}


def restrict(sql, k, expected):
    n = sql.count(MARKER)
    assert n == expected, (
        f"query-restriction marker found {n} times, expected {expected} "
        f"— oracle SQL drifted; update EXPECTED_MARKERS deliberately")
    return sql.replace(MARKER, f"q.vec_id < {k}")


def main():
    global OUT_DIR
    sf_dir, OUT_DIR = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{sf_dir}/embeddings.parquet'")
    rerank_sql, recall_sql = committed_oracles()
    ok = True
    for name, sql in [("emb_sq_rerank", rerank_sql),
                      ("emb_sq_rerank_recall", recall_sql)]:
        cur = con.execute(restrict(sql, k, EXPECTED_MARKERS[name]))
        names = [d[0] for d in cur.description]
        oracle_rows = cur.fetchall()
        g = duckdb.sql(
            f"SELECT * FROM '{OUT_DIR}/{name}/*.parquet' "
            f"WHERE query_id < {k} ORDER BY query_id").fetchall()
        gnames = [d[0] for d in duckdb.sql(
            f"SELECT * FROM '{OUT_DIR}/{name}/*.parquet' LIMIT 0")
            .description]
        rows_ok = len(g) == len(oracle_rows)
        schema_ok = sorted(names) == sorted(gnames)
        hash_ok = table_hash(gnames, g) == table_hash(names, oracle_rows)
        status = "PASS" if rows_ok and schema_ok and hash_ok else "FAIL"
        if status == "FAIL":
            ok = False
        print(f"{status} {name} (sampled q<{k}: {len(g)} rows, "
              f"rows={rows_ok} schema={schema_ok} hash={hash_ok})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
