#!/usr/bin/env python3
"""Dev-only differential harness mirroring the driver's correctness gate.

NOT part of the library (driver-side python: duckdb/pyarrow are available in
this container for the driver; the Scala library never depends on them).

Runs graft.Verify output against DuckDB executing oracle_sql.json over the
same parquet tables, comparing row count, sorted-column-name schema, and a
value hash — the same shape as CORRECTNESS_r{N}.json.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--json out.json] [query ...]

--json writes per-query results in the driver's CORRECTNESS_r{N}.json shape
(used for the committed sf1 soak artifact, CORRECTNESS_sf1.json).
"""
import sys, json, glob, math, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types that survive the driver's DuckDB->comparison conversion losslessly.
# HUGEINT (duckdb's sum(INTEGER/BIGINT) result) and DECIMAL are NOT safe:
# the driver's fetch path widens them to float/decimal repr and the hash
# diverges from Spark's BIGINT/DOUBLE (round-2: all 6 driver hash-fails
# were HUGEINT columns that passed locally via lossless fetchall()).
SAFE_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
              "VARCHAR", "TIMESTAMP", "DATE", "BOOLEAN", "BLOB"}


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL precision: the driver hashes floats exactly; a 1-ulp
        # divergence between Spark and DuckDB must fail here too
        # (round-1 verdict: %.9g masked exactly that).
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    lines = sorted("\x1f".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    json_out = None
    if "--json" in rest:
        i = rest.index("--json")
        json_out = rest[i + 1]
        rest = rest[:i] + rest[i + 2:]
    only = set(rest)
    report = {}
    con = duckdb.connect()
    # DuckDB's default memory_limit is 80% of RAM; the declared-quadratic
    # oracles (emb_neardup is 20k x 20k = 400M list-cosine pairs at sf1)
    # must spill to disk instead of ballooning the in-process RSS.
    con.execute("SET memory_limit='24GB'")
    # per-process spill dir: concurrent checkers sharing one spill
    # directory clobber each other's temp files (observed: IOException
    # mid-query when a sibling process recreated the dir)
    import os
    con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # no-oracle queries (not SQL-expressible): record spark row count only,
    # mirroring the driver's `"err": "no_oracle"` rows
    import os
    for d in sorted(os.listdir(out_dir)):
        if d in oracles or not os.path.isdir(f"{out_dir}/{d}"):
            continue
        if only and d not in only:
            continue
        fs = glob.glob(f"{out_dir}/{d}/*.parquet")
        nrows = pq.read_table(fs[0]).num_rows if fs else None
        report[d] = {"rows_match": None, "schema_match": None,
                     "hash_match": None, "spark_rows": nrows,
                     "oracle_rows": None, "err": "no_oracle"}
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            report[name] = {"rows_match": False, "schema_match": None,
                            "hash_match": None, "spark_rows": None,
                            "oracle_rows": None, "err": "no_spark_output"}
            n_fail += 1
            continue
        got = pq.read_table(files[0])
        g_names = list(got.schema.names)
        g_rows = [tuple(c[i].as_py() for c in got.columns)
                  for i in range(got.num_rows)]
        try:
            rel = con.sql(sql)
            e_names = list(rel.columns)
            e_types = [str(t) for t in rel.types]
            e_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(g_rows),
                            "oracle_rows": None, "err": f"oracle error: {e}"}
            n_fail += 1
            continue
        bad_types = [(c, t) for c, t in zip(e_names, e_types)
                     if t not in SAFE_TYPES]
        if bad_types:
            print(f"FAIL {name}: driver-unsafe oracle column types "
                  f"{bad_types} — CAST them (e.g. sum(int) -> "
                  f"CAST(... AS BIGINT))")
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(g_rows),
                            "oracle_rows": len(e_rows),
                            "err": f"unsafe oracle types: {bad_types}"}
            n_fail += 1
            continue
        ok_schema = sorted(g_names) == sorted(e_names)
        ok_rows = len(g_rows) == len(e_rows)
        gh = table_hash(g_names, g_rows)
        eh = table_hash(e_names, e_rows)
        ok_hash = gh == eh
        report[name] = {"rows_match": ok_rows, "schema_match": ok_schema,
                        "hash_match": ok_hash, "spark_rows": len(g_rows),
                        "oracle_rows": len(e_rows), "err": None}
        if ok_schema and ok_rows and ok_hash:
            print(f"PASS {name} ({len(g_rows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: schema={ok_schema} rows={ok_rows}"
                  f" ({len(g_rows)} vs {len(e_rows)}) hash={ok_hash}")
            if not ok_schema:
                print(f"  spark cols: {sorted(g_names)}")
                print(f"  oracle cols: {sorted(e_names)}")
            if ok_schema and not ok_hash:
                order = sorted(range(len(g_names)), key=lambda i: g_names[i])
                gl = sorted("\x1f".join(norm(r[i]) for i in order) for r in g_rows)
                eo = sorted(range(len(e_names)), key=lambda i: e_names[i])
                el = sorted("\x1f".join(norm(r[i]) for i in eo) for r in e_rows)
                for a, b in zip(gl, el):
                    if a != b:
                        print(f"  spark : {a[:300]}")
                        print(f"  oracle: {b[:300]}")
                        break
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sorted(report.items())), f, indent=2)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
