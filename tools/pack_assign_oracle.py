#!/usr/bin/env python3
"""Non-recursive FULL DuckDB oracle for doc_pack_bpe at soak scale
(round-18 verdict #3).

Dev-only (driver-side python, like tools/check.py). The committed SQL
oracle replays the greedy recurrence with a recursive CTE whose depth is
the max per-source doc count — effectively quadratic in DuckDB and
useless at sf10 (~50k rows/source). This checker keeps the recursion out
of the oracle entirely:

  1. per-doc BPE counts come from the committed per-text table
     (src/main/resources/graft/bpe_counts.tsv — the doc_tokens_bpe
     oracle's own source; an unmatched text FAILS);
  2. each doc's bin is DERIVED from committed bin boundaries
     (tools/gen_pack_assign.py) with an ASOF join — no recursion;
  3. GREEDINESS is re-proven from scratch with window functions: the
     greedy walk is the UNIQUE assignment where (a) the first doc per
     source opens bin 0, (b) bins step by 0 or 1 in doc order, (c) a
     doc staying in its bin keeps the running fill <= budget, and
     (d) a doc opening bin b+1 would have overflowed bin b. So the
     boundary file is untrusted input: any wrong boundary fails (a)-(d),
     it cannot certify a wrong Spark result;
  4. the (source, bin) aggregates over the derived assignment are
     hash-compared against the gate's dumped parquet.

`--selftest <sfDir>` additionally proves the window form row-identical
to the committed recursive SQL oracle where both are cheap.

Usage:
  python3 tools/gen_pack_assign.py tmp/sf10 tools/data/pack_assign_sf10.tsv.gz
  python3 tools/pack_assign_oracle.py tmp/sf10 tmp/verify_sf10 CORRECTNESS_sf10.json \
      tools/data/pack_assign_sf10.tsv.gz
  python3 tools/pack_assign_oracle.py --selftest /root/testdata/sf0.1
"""
import glob
import json
import sys
import tempfile

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check import table_hash

BUDGET = 2048
COUNTS = "src/main/resources/graft/bpe_counts.tsv"


def connect(sf_dir):
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    con.execute(f"SET temp_directory='{tempfile.mkdtemp(prefix='packasg')}'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con


def derived(con, assign_path):
    """Build the derived per-doc assignment views; returns nothing, the
    views d (per-doc tokens), j (doc->bin), w (windowed) persist."""
    con.execute(f"""
      CREATE VIEW cnt AS SELECT h, CAST(n AS BIGINT) AS n
      FROM read_csv('{COUNTS}', header=false, delim='\t',
                    columns={{'h':'VARCHAR','n':'BIGINT'}})""")
    con.execute("""
      CREATE VIEW d AS
      SELECT doc_id, source, cnt.n AS n_tokens
      FROM documents JOIN cnt ON substr(md5(text), 1, 16) = cnt.h
      WHERE text IS NOT NULL""")
    con.execute(f"""
      CREATE VIEW a AS
      SELECT source, CAST(bin AS BIGINT) AS bin,
             CAST(first_doc_id AS BIGINT) AS fid
      FROM read_csv('{assign_path}', header=false, delim='\t',
        columns={{'source':'VARCHAR','bin':'BIGINT','first_doc_id':'BIGINT'}})""")
    con.execute("""
      CREATE VIEW j AS
      SELECT d.doc_id, d.source, d.n_tokens, a.bin
      FROM d ASOF JOIN a ON d.source = a.source AND d.doc_id >= a.fid""")
    con.execute(f"""
      CREATE VIEW w AS
      SELECT *,
        row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
        lag(bin) OVER (PARTITION BY source ORDER BY doc_id) AS prev_bin,
        sum(n_tokens) OVER (PARTITION BY source, bin ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) AS fill
      FROM j""")


def greedy_violations(con):
    """Scalar violation counts; all must be zero for the derived
    assignment to BE the greedy packing."""
    checks = {
        # committed counts cover every text (inner join lost nothing)
        "unmatched_text": """
          SELECT (SELECT count(*) FROM documents WHERE text IS NOT NULL)
               - (SELECT count(*) FROM d)""",
        # every doc got a bin (ASOF covered: no doc before its source's
        # first boundary, no source missing from the boundary file)
        "unassigned_doc": "SELECT (SELECT count(*) FROM d) "
                          "- (SELECT count(*) FROM j)",
        "first_doc_not_bin0": "SELECT count(*) FROM w WHERE rn = 1 AND bin <> 0",
        "bin_step_not_0_or_1": """
          SELECT count(*) FROM w
          WHERE prev_bin IS NOT NULL AND bin NOT IN (prev_bin, prev_bin + 1)""",
        f"fill_over_budget": f"""
          SELECT count(*) FROM w
          WHERE prev_bin = bin AND fill > {BUDGET}""",
        # a doc opening bin b+1 must NOT have fit in bin b (else greedy
        # would have kept it there): previous bin's final fill + tokens
        # must exceed the budget
        "opener_would_have_fit": f"""
          SELECT count(*) FROM w
          JOIN (SELECT source, bin, sum(n_tokens) AS tot
                FROM j GROUP BY 1, 2) bt
            ON bt.source = w.source AND bt.bin = w.bin - 1
          WHERE w.prev_bin = w.bin - 1
            AND bt.tot + w.n_tokens <= {BUDGET}""",
    }
    return {name: con.sql(q).fetchone()[0] for name, q in checks.items()}


AGG = """
  SELECT source, bin, count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
         CAST(sum(doc_id) AS BIGINT) AS id_checksum
  FROM j GROUP BY 1, 2 ORDER BY source, bin"""


def check(sf_dir, out_dir, assign_path):
    con = connect(sf_dir)
    derived(con, assign_path)
    viol = greedy_violations(con)
    rel = con.sql(AGG)
    e_names, e_rows = list(rel.columns), rel.fetchall()
    files = glob.glob(f"{out_dir}/doc_pack_bpe/*.parquet")
    assert files, f"no spark output under {out_dir}/doc_pack_bpe"
    got = pq.read_table(files[0])
    g_rows = [tuple(c[i].as_py() for c in got.columns)
              for i in range(got.num_rows)]
    ok_greedy = all(v == 0 for v in viol.values())
    ok_schema = sorted(got.schema.names) == sorted(e_names)
    ok_rows = len(g_rows) == len(e_rows)
    ok_hash = (table_hash(list(got.schema.names), g_rows)
               == table_hash(e_names, e_rows))
    ok = ok_greedy and ok_schema and ok_rows and ok_hash
    return {
        "rows_match": ok_rows, "schema_match": ok_schema,
        "hash_match": ok_hash and ok_greedy,
        "spark_rows": len(g_rows), "oracle_rows": len(e_rows),
        "err": None if ok else
        f"pack-assign oracle mismatch: greedy violations {viol}, "
        f"schema {ok_schema}, rows {ok_rows}, hash {ok_hash}",
    }


def selftest(sf_dir):
    """Window form == committed recursive SQL oracle where both are
    cheap, on a boundary file generated fresh for that corpus."""
    import subprocess
    sqls = None
    for cand in glob.glob("/tmp/*/oracle_sql.json") + \
            glob.glob("tmp/*/oracle_sql.json"):
        d = json.load(open(cand))
        if "doc_pack_bpe" in d:
            sqls = d
            break
    assert sqls, "run graft.Verify once so oracle_sql.json exists"
    with tempfile.NamedTemporaryFile(suffix=".tsv.gz") as tmp:
        subprocess.run([sys.executable, "tools/gen_pack_assign.py",
                        sf_dir, tmp.name], check=True)
        con = connect(sf_dir)
        derived(con, tmp.name)
        viol = greedy_violations(con)
        assert all(v == 0 for v in viol.values()), viol
        rel = con.sql(AGG)
        w_names, w_rows = list(rel.columns), rel.fetchall()
        rec = con.sql(sqls["doc_pack_bpe"])
        r_names, r_rows = list(rec.columns), rec.fetchall()
        assert table_hash(w_names, w_rows) == table_hash(r_names, r_rows), \
            f"window form != recursive SQL oracle at {sf_dir}"
        print(f"selftest doc_pack_bpe: window form == recursive oracle "
              f"({len(w_rows)} bins) at {sf_dir}")


def main():
    if sys.argv[1] == "--selftest":
        selftest(sys.argv[2])
        return
    sf_dir, out_dir, corr_path = sys.argv[1], sys.argv[2], sys.argv[3]
    assign = sys.argv[4] if len(sys.argv) > 4 \
        else "tools/data/pack_assign_sf10.tsv.gz"
    res = check(sf_dir, out_dir, assign)
    report = json.load(open(corr_path)) if glob.glob(corr_path) else {}
    report["doc_pack_bpe"] = res
    with open(corr_path, "w") as f:
        json.dump(dict(sorted(report.items())), f, indent=2)
    status = "PASS" if res["err"] is None else f"FAIL ({res['err']})"
    print(f"doc_pack_bpe: {status} ({res['spark_rows']} rows)")
    sys.exit(0 if res["err"] is None else 1)


if __name__ == "__main__":
    main()
