#!/usr/bin/env python3
"""Dev-only scale-soak handler for pair gates that emit the DIGEST form.

NOT part of the library (driver-side python, like tools/check.py).

pairGate (operators/PipelineQueries.scala) switches from full
(id_a, id_b, value) rows to a one-row digest `(n_pairs, pair_digest)`
when the pair list exceeds 1e6 rows — the derived scale corpora
(tools/scale_testdata.py) are clone-heavy enough that doc_simhash_dedup
crosses that at sf1 and all four LSH pair gates cross it at sf10. The
digest is `bit_xor(xxhash64(id_a, id_b, value))`, which DuckDB cannot
replay (no Spark-compatible xxhash64), so at digest scales the check is
the pair COUNT: run the committed oracle SQL (exact full replay of the
signature/banding/refine pipeline), count its pairs, and compare to the
Spark digest row's n_pairs. A wrong signature, banding, prefilter, or
refine moves the count; the value hash stays pinned by the full-row
check at sf0.01/sf0.1 (the driver's gate scale).

For each named gate, the tool auto-detects the form: full rows → the
committed oracle compares rows+schema+hash exactly (same as check.py);
digest row → count comparison with an explanatory note.

Usage:
  python3 tools/digest_oracles.py <sfDir> <verifyOutDir> <correctness.json>
      [gate ...]
Defaults to the four LSH pair gates.
"""
import glob
import json
import sys

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check import table_hash, TABLES

DEFAULT_GATES = ["doc_minhash_dedup", "doc_simhash_dedup",
                 "doc_winnow_pairs", "emb_neardup_lsh"]


def connect(sf_dir):
    con = duckdb.connect()
    # 96GB: the sf1 minhash replay (50k docs x 128 permutations over
    # exploded shingles) spills >70GB under a 24GB cap and runs /tmp out
    # of disk; at 96GB it stays in RAM on the 128GB soak box
    con.execute("SET memory_limit='96GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main():
    sf_dir, out_dir, corr_path = sys.argv[1], sys.argv[2], sys.argv[3]
    gates = sys.argv[4:] or DEFAULT_GATES
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    report = json.load(open(corr_path))
    con = connect(sf_dir)
    n_fail = 0
    for name in gates:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"SKIP {name}: no spark output")
            continue
        got = pq.read_table(files[0])
        g_names = list(got.schema.names)
        g_rows = [tuple(c[i].as_py() for c in got.columns)
                  for i in range(got.num_rows)]
        sql = oracles[name]
        if sorted(g_names) == ["n_pairs", "pair_digest"]:
            # digest form: count-only differential
            n_spark = g_rows[0][g_names.index("n_pairs")]
            n_oracle = con.sql(
                f"SELECT count(*) FROM ({sql})").fetchone()[0]
            ok = n_spark == n_oracle
            report[name] = {
                "rows_match": ok, "schema_match": True,
                "hash_match": None, "spark_rows": int(n_spark),
                "oracle_rows": int(n_oracle),
                "err": ("scale oracle: digest form — committed-oracle "
                        "pair COUNT compared (xxhash64 digest not "
                        "replayable in DuckDB); value hash pinned at "
                        "sf0.01/sf0.1 (tools/digest_oracles.py)")}
            status = "PASS" if ok else "FAIL"
            print(f"{status} {name} (digest count {n_spark} vs {n_oracle})")
        else:
            rel = con.sql(sql)
            e_names = list(rel.columns)
            e_rows = rel.fetchall()
            ok_schema = sorted(g_names) == sorted(e_names)
            ok_rows = len(g_rows) == len(e_rows)
            ok_hash = (table_hash(g_names, g_rows) ==
                       table_hash(e_names, e_rows))
            ok = ok_schema and ok_rows and ok_hash
            report[name] = {
                "rows_match": ok_rows, "schema_match": ok_schema,
                "hash_match": ok_hash, "spark_rows": len(g_rows),
                "oracle_rows": len(e_rows), "err": None}
            status = "PASS" if ok else "FAIL"
            print(f"{status} {name} ({len(g_rows)} vs {len(e_rows)} rows)")
        if status == "FAIL":
            n_fail += 1
    with open(corr_path, "w") as f:
        json.dump(dict(sorted(report.items())), f, indent=2)
    print(f"updated {corr_path}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
