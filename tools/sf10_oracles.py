#!/usr/bin/env python3
"""Dev-only sf10-soak oracles: the sampled-chunk extension of
tools/sf1_oracles.py for the three kNN gates, plus the anchor-aware
union-area oracle, merged into a CORRECTNESS json.

NOT part of the library (driver-side python, like tools/check.py).

Why sampling: the committed kNN oracle windows `pts CROSS JOIN cents`.
At sf1 that is 1.5B rows and the full chunked evaluation already costs
~15-18 min of DuckDB CPU; at sf10 it is 150B rows (~100x), i.e. a full
oracle pass would take a day. The window partitions by c_custkey, so the
oracle restricted to any customer-key residue class is EXACT for every
customer in that class — evaluating k of m classes and comparing against
the Spark output filtered to the same classes is a sound (zero false
positives possible on the covered rows) exact check of a deterministic
1/128th slice, not an approximation of the whole. Chunk residues are
fixed (spread across the key space), so the check is reproducible.

geo_union_area reuses sf1_oracles.UNION_AREA_SQL unchanged: the key
shift maps every copy onto its base anchor with a different width
(1e8 % 7 == 2), i.e. nested squares sharing a lower-left corner, so the
anchor-aware max(w)^2 closed form stays geometrically exact at ANY copy
count — sf10's 100 copies included.

Usage:
  python3 tools/sf10_oracles.py --selftest <baseSfDir>  # chunk==full proof
  python3 tools/sf10_oracles.py <sfDir> <verifyOutDir> <correctness.json>
"""
import glob
import json
import sys

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check import table_hash
from sf1_oracles import UNION_AREA_SQL, connect, knn_chunk_sql

M_CHUNKS = 512
SAMPLED = [0, 170, 341, 511]  # 4/512 residues, spread across the key space


def sampled_sql(oracle_sql, m, residues):
    """The committed oracle restricted to a residue set: the same
    injection point sf1_oracles.knn_chunk_sql uses (the pts CTE), with an
    IN list. Window partitions are per-c_custkey, so this is exact."""
    marker = "FROM customer)"
    assert oracle_sql.count(marker) == 1
    inlist = ",".join(str(r) for r in residues)
    return oracle_sql.replace(
        marker, f"FROM customer WHERE c_custkey % {m} IN ({inlist}))")


_memo = {}


def run_sampled(con, oracle_sql):
    # geo_knn and geo_knn_grid share byte-equal oracle SQL: one pass
    key = oracle_sql
    if key in _memo:
        return _memo[key]
    rows, names = [], None
    # one residue per pass keeps each window under the memory cap
    for r in SAMPLED:
        rel = con.sql(sampled_sql(oracle_sql, M_CHUNKS, [r]))
        names = list(rel.columns)
        rows.extend(rel.fetchall())
    _memo[key] = (names, rows)
    return names, rows


def spark_sampled(files):
    """Spark output rows restricted to the sampled residues."""
    got = pq.read_table(files[0])
    names = list(got.schema.names)
    ci = names.index("c_custkey")
    rows = [tuple(c[i].as_py() for c in got.columns)
            for i in range(got.num_rows)]
    keep = [r for r in rows if r[ci] % M_CHUNKS in SAMPLED]
    return names, keep, len(rows)


DWITHIN_PRED = ("WHERE sqrt((lon - cx) * (lon - cx) + "
                "(lat - cy) * (lat - cy)) <= 0.313")
# The circle predicate implies |lon-cx| <= r and |lat-cy| <= r, so
# prepending the bbox conditions is a REDUNDANT predicate — the result
# set is identical. What changes is the plan: DuckDB evaluates the bare
# CROSS JOIN + sqrt filter as a nested loop (1.5M pts x 100k cents =
# 150B sqrt evaluations at sf10 — hours), but the BETWEEN pair qualifies
# for its inequality join, making the committed semantics tractable at
# any SF. --selftest proves result equality at a base scale.
DWITHIN_BBOX = ("WHERE lon BETWEEN cx - 0.313 AND cx + 0.313 "
                "AND lat BETWEEN cy - 0.313 AND cy + 0.313 "
                "AND sqrt((lon - cx) * (lon - cx) + "
                "(lat - cy) * (lat - cy)) <= 0.313")


def dwithin_sql(oracle_sql):
    assert oracle_sql.count(DWITHIN_PRED) == 1
    return oracle_sql.replace(DWITHIN_PRED, DWITHIN_BBOX)


def selftest(base_sf):
    """At a base scale the sampled evaluation must hash-equal the
    committed oracle filtered to the same residues (exactness of the
    injection), for each distinct kNN oracle form."""
    import os
    oracles = None
    for cand in ["tmp/verify_sf10/oracle_sql.json",
                 "/tmp/verify_out/oracle_sql.json"]:
        if os.path.exists(cand):
            oracles = json.load(open(cand))
            break
    assert oracles, "need a Verify output dir for the committed oracle SQL"
    con = connect(base_sf)
    ok = True
    for name in ["geo_knn", "geo_knn3"]:
        full = con.sql(oracles[name])
        names = list(full.columns)
        ci = names.index("c_custkey")
        want = [r for r in full.fetchall() if r[ci] % M_CHUNKS in SAMPLED]
        got_names, got = run_sampled(con, oracles[name])
        same = table_hash(names, want) == table_hash(got_names, got)
        ok &= same
        print(f"{'EQUIV' if same else 'MISMATCH'} {name} "
              f"(sampled-chunk vs committed-filtered @ {base_sf})")
    full = con.sql(oracles["geo_dwithin_join"])
    want = (list(full.columns), full.fetchall())
    rel = con.sql(dwithin_sql(oracles["geo_dwithin_join"]))
    got = (list(rel.columns), rel.fetchall())
    same = table_hash(*want) == table_hash(*got)
    ok &= same
    print(f"{'EQUIV' if same else 'MISMATCH'} geo_dwithin_join "
          f"(bbox-augmented vs committed @ {base_sf})")
    sys.exit(0 if ok else 1)


def main():
    if sys.argv[1] == "--selftest":
        selftest(sys.argv[2])
    sf_dir, out_dir, corr_path = sys.argv[1], sys.argv[2], sys.argv[3]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = connect(sf_dir)
    report = json.load(open(corr_path))
    n_fail = 0
    for name in ["geo_knn", "geo_knn_grid", "geo_knn3"]:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        g_names, g_rows, g_total = spark_sampled(files)
        e_names, e_rows = run_sampled(con, oracles[name])
        ok_schema = sorted(g_names) == sorted(e_names)
        ok_rows = len(g_rows) == len(e_rows)
        ok_hash = table_hash(g_names, g_rows) == table_hash(e_names, e_rows)
        report[name] = {
            "rows_match": ok_rows, "schema_match": ok_schema,
            "hash_match": ok_hash, "spark_rows": g_total,
            "oracle_rows": len(e_rows),
            "err": f"sf10 oracle: committed SQL on {len(SAMPLED)}/"
                   f"{M_CHUNKS} sampled customer-key residues, exact on "
                   f"the covered slice ({len(g_rows)} rows) — "
                   "tools/sf10_oracles.py"}
        status = "PASS" if ok_schema and ok_rows and ok_hash else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(f"{status} {name} ({len(g_rows)} vs {len(e_rows)} sampled rows"
              f" of {g_total} total)", flush=True)
    # dwithin: committed semantics with the implied bbox predicate
    # prepended (identical result set, inequality-join-able plan)
    files = glob.glob(f"{out_dir}/geo_dwithin_join/*.parquet")
    got = pq.read_table(files[0])
    g_names = list(got.schema.names)
    g_rows = [tuple(c[i].as_py() for c in got.columns)
              for i in range(got.num_rows)]
    rel = con.sql(dwithin_sql(oracles["geo_dwithin_join"]))
    e_names, e_rows = list(rel.columns), rel.fetchall()
    ok = (sorted(g_names) == sorted(e_names) and len(g_rows) == len(e_rows)
          and table_hash(g_names, g_rows) == table_hash(e_names, e_rows))
    report["geo_dwithin_join"] = {
        "rows_match": len(g_rows) == len(e_rows),
        "schema_match": sorted(g_names) == sorted(e_names),
        "hash_match": table_hash(g_names, g_rows) == table_hash(e_names,
                                                               e_rows),
        "spark_rows": len(g_rows), "oracle_rows": len(e_rows),
        "err": "sf10 oracle: committed SQL + implied bbox predicate "
               "(tools/sf10_oracles.py dwithin_sql)"}
    if not ok:
        n_fail += 1
    print(f"{'PASS' if ok else 'FAIL'} geo_dwithin_join "
          f"({len(g_rows)} vs {len(e_rows)} rows)", flush=True)
    # union area: the sf1 anchor-aware closed form, copy-count-independent
    files = glob.glob(f"{out_dir}/geo_union_area/*.parquet")
    got = pq.read_table(files[0])
    g_names = list(got.schema.names)
    g_rows = [tuple(c[i].as_py() for c in got.columns)
              for i in range(got.num_rows)]
    rel = con.sql(UNION_AREA_SQL)
    e_names, e_rows = list(rel.columns), rel.fetchall()
    ok = (sorted(g_names) == sorted(e_names) and len(g_rows) == len(e_rows)
          and table_hash(g_names, g_rows) == table_hash(e_names, e_rows))
    report["geo_union_area"] = {
        "rows_match": len(g_rows) == len(e_rows),
        "schema_match": sorted(g_names) == sorted(e_names),
        "hash_match": table_hash(g_names, g_rows) == table_hash(e_names,
                                                               e_rows),
        "spark_rows": len(g_rows), "oracle_rows": len(e_rows),
        "err": "sf10 oracle: anchor-aware union closed form "
               "(tools/sf1_oracles.py UNION_AREA_SQL)"}
    if not ok:
        n_fail += 1
    print(f"{'PASS' if ok else 'FAIL'} geo_union_area "
          f"({len(g_rows)} vs {len(e_rows)} rows)", flush=True)
    with open(corr_path, "w") as f:
        json.dump(dict(sorted(report.items())), f, indent=2)
    print(f"updated {corr_path}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
