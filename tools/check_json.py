#!/usr/bin/env python3
"""Dev-only: check.py with driver-format JSON output (CORRECTNESS_r{N}-style).

NOT part of the library (driver-side python). Compares a graft.Verify dump
against DuckDB running oracle_sql.json over the same tables, and writes one
JSON object per query: rows/schema/hash match booleans, row counts, err
("no_oracle" for rows-only gates, matching the driver's artifact shape).

Usage: python3 tools/check_json.py <sfDir> <verifyOutDir> <outJson>
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

from check import SAFE_TYPES, TABLES, table_hash


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    dumped = sorted(d for d in os.listdir(out_dir)
                    if os.path.isdir(os.path.join(out_dir, d)))
    result = {}
    for name in dumped:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        entry = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": None, "oracle_rows": None, "err": None}
        if not files:
            entry["err"] = "no_spark_output"
            result[name] = entry
            continue
        got = pq.read_table(files[0])
        g_names = list(got.schema.names)
        g_rows = [tuple(c[i].as_py() for c in got.columns)
                  for i in range(got.num_rows)]
        entry["spark_rows"] = len(g_rows)
        if name not in oracles:
            entry["err"] = "no_oracle"
            result[name] = entry
            continue
        try:
            rel = con.sql(oracles[name])
            e_names = list(rel.columns)
            e_types = [str(t) for t in rel.types]
            e_rows = rel.fetchall()
        except Exception as e:
            entry["err"] = f"oracle error: {e}"
            result[name] = entry
            continue
        bad = [(c, t) for c, t in zip(e_names, e_types) if t not in SAFE_TYPES]
        if bad:
            entry["err"] = f"driver-unsafe oracle types: {bad}"
            result[name] = entry
            continue
        entry["oracle_rows"] = len(e_rows)
        entry["rows_match"] = len(g_rows) == len(e_rows)
        entry["schema_match"] = sorted(g_names) == sorted(e_names)
        entry["hash_match"] = table_hash(g_names, g_rows) == table_hash(
            e_names, e_rows)
        result[name] = entry
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    n_fail = sum(1 for e in result.values()
                 if e["err"] not in (None, "no_oracle")
                 or e["err"] is None and not (
                     e["rows_match"] and e["schema_match"] and e["hash_match"]))
    n_green = sum(1 for e in result.values() if e["err"] is None
                  and e["rows_match"] and e["schema_match"] and e["hash_match"])
    n_rows_only = sum(1 for e in result.values() if e["err"] == "no_oracle")
    print(f"== {n_green} green, {n_rows_only} rows-only, {n_fail} fail "
          f"-> {out_json} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
