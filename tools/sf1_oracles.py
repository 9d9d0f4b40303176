#!/usr/bin/env python3
"""Dev-only sf1-soak oracles for the three queries whose committed oracle
SQL does not survive the derived sf1 corpus (tools/scale_testdata.py), plus
the differential runner that merges their results into CORRECTNESS_sf1.json.

NOT part of the library (driver-side python, like tools/check.py).

Why these three and only these three:

* geo_knn / geo_knn3 — the committed oracle computes a row_number() window
  over `pts CROSS JOIN cents` (150k x 10k = 1.5B rows at sf1), which DuckDB
  buffers; it ran the container out of memory. The SQL is NOT rewritten:
  the same committed oracle runs over customer-key CHUNKS
  (`WHERE c_custkey % m = i` injected into the pts CTE) and the chunk
  results are unioned. The window partitions by c_custkey, so evaluating
  disjoint customer subsets independently is exact by construction; each
  chunk windows ~1.5B/m rows, inside the memory cap. --selftest proves the
  chunked evaluation hash-equal to the single-pass form at sf0.1.

* geo_union_area — the committed oracle is closed-form sum(w*w), valid
  because base corpora place every box in a distinct 1-degree grid cell
  (anchor (s_suppkey % 100, (s_suppkey // 100) % 50), side < 0.8). The
  key-shift in scale_testdata.py (+1e8 per copy) maps copies onto the SAME
  anchor (1e8 % 100 == 0, 1e6 % 50 == 0) with a different width
  (1e8 % 7 == 2), i.e. nested squares sharing a lower-left corner — the
  true union area is sum over anchors of max(w)^2, NOT sum(w*w). Spark's
  JTS union aggregate returns the geometrically correct value; the
  rewritten oracle computes the same closed form anchor-aware. (At base
  scales anchors are unique, max(w) == w, and the two forms coincide —
  --selftest checks that too.)

Usage:
  python3 tools/sf1_oracles.py --selftest <baseSfDir>     # prove equivalence
  python3 tools/sf1_oracles.py <sfDir> <verifyOutDir> <correctness.json>
"""
import glob
import json
import sys

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check import table_hash  # same hashing as the driver-shaped gate

KNN_CHUNKS = 16


def knn_chunk_sql(oracle_sql, m, i):
    """The COMMITTED oracle SQL restricted to one customer-key chunk. The
    pts CTE ends at the first `FROM customer)`; the injected predicate
    restricts the window's partition keys, nothing else."""
    marker = "FROM customer)"
    assert oracle_sql.count(marker) == 1
    return oracle_sql.replace(
        marker, f"FROM customer WHERE c_custkey % {m} = {i})")


_chunked_memo = {}


_memo_conns = []


def _con_token(con):
    # identity token that cannot be recycled (id() can be reused after
    # GC): the memo keeps the connection alive, which is fine for this
    # short-lived tool
    for i, c in enumerate(_memo_conns):
        if c is con:
            return i
    _memo_conns.append(con)
    return len(_memo_conns) - 1


def run_chunked(con, oracle_sql, m=KNN_CHUNKS):
    # memoized by (connection, chunking, SQL text): geo_knn_grid's
    # committed oracle is byte-equal to geo_knn's (same closed form,
    # different engine plan under test), so the ~15-min chunked
    # evaluation runs once for both — but a different connection (other
    # corpus) or chunk count must not reuse the cached rows
    memo_key = (_con_token(con), m, oracle_sql)
    if memo_key in _chunked_memo:
        return _chunked_memo[memo_key]
    rows, names = [], None
    for i in range(m):
        rel = con.sql(knn_chunk_sql(oracle_sql, m, i))
        names = list(rel.columns)
        rows.extend(rel.fetchall())
    _chunked_memo[memo_key] = (names, rows)
    return names, rows


UNION_AREA_SQL = """
    WITH b AS (
      SELECT s_suppkey, s_nationkey,
             s_suppkey % 100 AS ax, (s_suppkey // 100) % 50 AS ay,
             (CAST(0.1 AS DOUBLE) + (s_suppkey % 7) * CAST(0.1 AS DOUBLE)) AS w
      FROM supplier),
    anchors AS (
      SELECT s_nationkey, ax, ay, max(w) AS mw, count(*) AS n
      FROM b GROUP BY s_nationkey, ax, ay)
    SELECT s_nationkey,
           floor((sum(mw * mw)) * 10000.0 + 0.5) / 10000.0 AS union_area,
           CAST(sum(n) AS BIGINT) AS n_boxes
    FROM anchors GROUP BY s_nationkey ORDER BY s_nationkey"""


def connect(sf_dir):
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    # per-process spill dir: concurrent checkers sharing one spill
    # directory clobber each other's temp files (observed: IOException
    # mid-query when a sibling process recreated the dir)
    import os
    con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    for t in ["customer", "supplier"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def targets(oracles):
    """name -> callable(con) -> (column_names, rows)."""
    def chunked(name):
        return lambda con: run_chunked(con, oracles[name])
    def plain(sql):
        def f(con):
            rel = con.sql(sql)
            return list(rel.columns), rel.fetchall()
        return f
    return {
        "geo_knn": chunked("geo_knn"),
        "geo_knn_grid": chunked("geo_knn_grid"),
        "geo_knn3": chunked("geo_knn3"),
        "geo_union_area": plain(UNION_AREA_SQL),
    }


def selftest(base_sf):
    """At a base scale both forms must agree exactly (same value hash)."""
    # the committed oracle SQL comes from any graft.Verify dump
    import os
    oracles = None
    for cand in ["tmp/verify_sf1/oracle_sql.json",
                 "/tmp/verify_out/oracle_sql.json"]:
        if os.path.exists(cand):
            oracles = json.load(open(cand))
            break
    assert oracles, "need a Verify output dir for the committed oracle SQL"
    con = connect(base_sf)
    ok = True
    for name, fn in targets(oracles).items():
        r1 = con.sql(oracles[name])
        h1 = table_hash(list(r1.columns), r1.fetchall())
        n2, rows2 = fn(con)
        h2 = table_hash(n2, rows2)
        status = "EQUIV" if h1 == h2 else "MISMATCH"
        ok &= h1 == h2
        print(f"{status} {name} (committed vs sf1-form @ {base_sf})")
    sys.exit(0 if ok else 1)


def main():
    if sys.argv[1] == "--selftest":
        selftest(sys.argv[2])
    sf_dir, out_dir, corr_path = sys.argv[1], sys.argv[2], sys.argv[3]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = connect(sf_dir)
    report = json.load(open(corr_path))
    n_fail = 0
    for name, fn in targets(oracles).items():
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pq.read_table(files[0])
        g_names = list(got.schema.names)
        g_rows = [tuple(c[i].as_py() for c in got.columns)
                  for i in range(got.num_rows)]
        e_names, e_rows = fn(con)
        ok_schema = sorted(g_names) == sorted(e_names)
        ok_rows = len(g_rows) == len(e_rows)
        ok_hash = table_hash(g_names, g_rows) == table_hash(e_names, e_rows)
        note = ("chunked evaluation of the committed oracle"
                if name.startswith("geo_knn")
                else "anchor-aware union oracle for the derived corpus")
        report[name] = {
            "rows_match": ok_rows, "schema_match": ok_schema,
            "hash_match": ok_hash, "spark_rows": len(g_rows),
            "oracle_rows": len(e_rows),
            "err": f"sf1 oracle: {note} (tools/sf1_oracles.py)"}
        status = "PASS" if ok_schema and ok_rows and ok_hash else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(f"{status} {name} ({len(g_rows)} vs {len(e_rows)} rows)")
    with open(corr_path, "w") as f:
        json.dump(dict(sorted(report.items())), f, indent=2)
    print(f"updated {corr_path}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
