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
import re
import sys

import duckdb
import pyarrow.parquet as pq

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check import table_hash, TABLES

DEFAULT_GATES = ["doc_minhash_dedup", "doc_simhash_dedup",
                 "doc_winnow_pairs", "emb_neardup_lsh"]

# The digest row's ORACLE-REPLAYABLE leg (round-18 verdict #5): Spark
# emits sum(conv(substr(md5('<id_a>:<id_b>'),1,15),16,10)) as id_digest;
# md5 is bit-identical across engines and 15 hex chars parse exactly as
# a 60-bit BIGINT on both sides, so the same commutative sum recomputed
# over the committed oracle's pair rows is a VALUE HASH of the id pair
# set — it rides the same (optionally sharded) pass as the count.
DIGEST_AGG = ("count(*), "
              "sum((('0x' || substr(md5(CAST(id_a AS VARCHAR) || ':' || "
              "CAST(id_b AS VARCHAR)), 1, 15))::BIGINT)::DECIMAL(38,0))")

# Residue sharding (round-16 verdict #7): at sf10 the clone-heavy corpus
# makes the candidate SELF-JOIN's output quadratic in clique size — the
# three gates below exceeded the allocator even parquet-staged. Every
# pair is OWNED by its id_a, so injecting `AND a.<id> % m = r` at the
# pair join and summing counts over r = 0..m-1 is an EXACT full-cover
# decomposition (pairs partition by id_a residue; each shard's join
# output is ~1/m of the whole). The signature pipeline CTEs above the
# join stage ONCE and are re-read per shard. --selftest proves the
# sharded evaluation row-identical to the monolith at a base scale.
SHARD_MARKERS = {
    "doc_simhash_dedup": "AND a.doc_id < b.doc_id",
    "doc_winnow_pairs": "AND a.doc_id < b.doc_id",
    "emb_neardup_lsh": "AND a.vec_id < b.vec_id",
    # round-18: the round-17 sf10 attempt OOM'd on the UNSHARDED staged
    # minhash count (tools log, 02:41 round-17 close) — same ownership
    # argument, different join aliases in the committed SQL
    "doc_minhash_dedup": "AND x.doc_id < y.doc_id",
}


def split_ctes(sql):
    """Split the committed oracle into its top-level CTEs and the final
    SELECT. Returns ([(name, body), ...], final_select)."""
    s = sql.strip()
    assert s.upper().startswith("WITH "), "oracle must start with WITH"
    i = len("WITH ")
    ctes = []
    pat = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(")
    while True:
        m = pat.match(s, i)
        if not m:
            break
        name = m.group(1)
        j = m.end() - 1  # at the opening paren
        depth = 0
        for k in range(j, len(s)):
            if s[k] == "(":
                depth += 1
            elif s[k] == ")":
                depth -= 1
                if depth == 0:
                    break
        ctes.append((name, s[m.end():k]))
        i = k + 1
        while i < len(s) and s[i] in " \t\n\r":
            i += 1
        if i < len(s) and s[i] == ",":
            i += 1
        else:
            break
    return ctes, s[i:]


def shard_suffix_sql(ctes, final, marker, m, r):
    """The oracle's tail (from the CTE containing `marker` onward) with
    the pair-owning residue filter injected, as standalone SQL over the
    already-staged prefix views. Returns (sql, prefix_count)."""
    idref = marker.split(" < ")[0].replace("AND ", "")  # e.g. a.doc_id
    inj = f"{marker} AND {idref} % {m} = {r}"
    split_at = len(ctes)
    for idx, (_, body) in enumerate(ctes):
        if marker in body:
            split_at = idx
            break
    suffix = [(n, b.replace(marker, inj)) for n, b in ctes[split_at:]]
    fin = final.replace(marker, inj)
    assert (sum(b.count(inj) for _, b in suffix) + fin.count(inj)) == 1, \
        f"marker must inject exactly once: {marker}"
    if suffix:
        sql = ("WITH " + ", ".join(f"{n} AS ({b})" for n, b in suffix) +
               " " + fin)
    else:
        sql = fin
    return sql, split_at


def run_staged(con, sql, agg=None, shard=None):
    """Execute the committed oracle STAGE BY STAGE: each top-level CTE
    is COPY'd to a parquet stage file and re-registered as a view of
    the same name (bodies reference predecessors verbatim), then the
    final SELECT runs over the views. Semantically identical to the
    monolith; physically it pins one out-of-core materialization per
    CTE. DuckDB 1.0 otherwise INLINES multi-referenced CTEs — the
    minhash oracle's signature pipeline (referenced 3-4x) replans as
    one join tree that spills >160GB at sf1 and dies; the
    AS MATERIALIZED hint executes single-threaded (10x slower), and
    in-memory TEMP TABLE staging exhausts the allocator at sf10.
    `--selftest <baseSfDir>` proves the staged evaluation
    row-identical to the monolith; the DRIVER still runs the committed
    SQL verbatim at its gate scales.

    With `shard=(marker, m)`, CTEs from the one containing the pair-join
    marker onward are NOT staged; the tail runs once per id_a residue
    class over the staged prefix views and results concatenate (exact
    full cover — see SHARD_MARKERS), bounding each pass's join output
    to ~1/m of the whole."""
    import os
    import shutil
    ctes, final = split_ctes(sql)
    n_stage = len(ctes)
    if shard is not None:
        _, n_stage = shard_suffix_sql(ctes, final, shard[0], shard[1], 0)
    stage_dir = f"/tmp/duckdb_stage_{os.getpid()}"
    os.makedirs(stage_dir, exist_ok=True)
    made = []
    try:
        for name, body in ctes[:n_stage]:
            path = f"{stage_dir}/{name}.parquet"
            # parquet has no 128-bit int: HUGEINT silently degrades to
            # DOUBLE (lossy — breaks the 64-bit hash chains). Cast it
            # through DECIMAL(38,0) (exact for the mod-2^64 values these
            # oracles carry; overflow would error loudly) and back.
            desc = con.sql(f"DESCRIBE SELECT * FROM ({body})").fetchall()
            cols_out, cols_in = [], []
            for cname, ctype, *_ in desc:
                q = '"' + cname + '"'
                if ctype == "HUGEINT":
                    cols_out.append(
                        f"CAST({q} AS DECIMAL(38,0)) AS {q}")
                    cols_in.append(f"CAST({q} AS HUGEINT) AS {q}")
                else:
                    cols_out.append(q)
                    cols_in.append(q)
            con.execute(f"COPY (SELECT {', '.join(cols_out)} "
                        f"FROM ({body})) TO '{path}' (FORMAT PARQUET)")
            con.execute(f'CREATE VIEW "{name}" AS '
                        f"SELECT {', '.join(cols_in)} "
                        f"FROM read_parquet('{path}')")
            made.append(name)
        if shard is None:
            if agg is not None:
                return None, con.sql(
                    f"SELECT {agg} FROM ({final})").fetchone()
            rel = con.sql(final)
            return list(rel.columns), rel.fetchall()
        marker, m = shard
        if agg is not None:
            totals = None
            for r in range(m):
                s, _ = shard_suffix_sql(ctes, final, marker, m, r)
                row = con.sql(f"SELECT {agg} FROM ({s})").fetchone()
                if totals is None:
                    totals = list(row)
                else:  # commutative aggregates: shard results add
                    totals = [
                        (a or 0) + (b or 0) for a, b in zip(totals, row)]
            return None, tuple(totals)
        names, rows = None, []
        for r in range(m):
            s, _ = shard_suffix_sql(ctes, final, marker, m, r)
            rel = con.sql(s)
            names = list(rel.columns)
            rows.extend(rel.fetchall())
        return names, rows
    finally:
        for name in reversed(made):
            con.execute(f'DROP VIEW IF EXISTS "{name}"')
        shutil.rmtree(stage_dir, ignore_errors=True)


def connect(sf_dir):
    con = duckdb.connect()
    # 96GB: the sf1 minhash replay (50k docs x 128 permutations over
    # exploded shingles) spills >70GB under a 24GB cap and runs /tmp out
    # of disk; at 96GB it stays in RAM on the 128GB soak box
    con.execute("SET memory_limit='96GB'")
    # Insertion order is meaningless to every check this tool performs
    # (digest COUNTS, and table_hash sorts rows before hashing; stage
    # files are re-read through views, so their file order is opaque) —
    # dropping it lets DuckDB stream large COPY/aggregate pipelines
    # instead of buffering them for order, which is the difference
    # between the sf10 minhash replay finishing and the allocator dying
    # at the 96GB cap (observed: OOM inside the sig-pipeline COPY).
    con.execute("SET preserve_insertion_order=false")
    # 8 threads: per-thread operator buffering is what actually kills
    # the sf10 minhash replay — at 32 threads the 102M-row shingle
    # pipeline OOMs the 96GB cap inside a stage COPY even with
    # insertion order dropped; at 8 it completes with ~14GB RSS
    # (measured; stages stream at 0.5-3 min each). Wall cost at the
    # small scales is noise next to the correctness of finishing.
    con.execute("SET threads=8")
    # per-process spill dir: concurrent checkers sharing one spill
    # directory clobber each other's temp files (observed: IOException
    # mid-query when a sibling process recreated the dir)
    import os
    con.execute(f"SET temp_directory='/tmp/duckdb_spill_{os.getpid()}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def selftest(base_sf):
    """Staged evaluation must be row-identical to the monolith at a
    base scale where the monolith is tractable."""
    import os
    oracles = None
    for cand in ["tmp/verify_sf1_r16/oracle_sql.json",
                 "/tmp/verify_out/oracle_sql.json"]:
        if os.path.exists(cand):
            oracles = json.load(open(cand))
            break
    assert oracles, "need a Verify output dir for the committed SQL"
    con = connect(base_sf)
    ok = True
    for name in DEFAULT_GATES:
        mono = con.sql(oracles[name]).fetchall()
        _, staged = run_staged(con, oracles[name])
        eq = mono == staged
        ok &= eq
        print(f"{'EQUIV' if eq else 'MISMATCH'} {name} "
              f"(staged vs monolith @ {base_sf}, {len(mono)} rows)")
        if name in SHARD_MARKERS:
            # the residue decomposition must be row-identical too (order
            # differs by construction: shards concatenate)
            _, sharded = run_staged(con, oracles[name],
                                    shard=(SHARD_MARKERS[name], 4))
            eq = sorted(mono) == sorted(sharded)
            ok &= eq
            print(f"{'EQUIV' if eq else 'MISMATCH'} {name} "
                  f"(sharded m=4 vs monolith, {len(sharded)} rows)")
            # the (count, md5 id digest) aggregate must decompose
            # exactly across shards too (commutative sums)
            _, am = run_staged(con, oracles[name], agg=DIGEST_AGG)
            _, ash = run_staged(con, oracles[name], agg=DIGEST_AGG,
                                shard=(SHARD_MARKERS[name], 4))
            eq = [int(x or 0) for x in am] == [int(x or 0) for x in ash]
            ok &= eq
            print(f"{'EQUIV' if eq else 'MISMATCH'} {name} "
                  f"(sharded digest agg vs monolith: {tuple(am)})")
    sys.exit(0 if ok else 1)


def main():
    if sys.argv[1] == "--selftest":
        selftest(sys.argv[2])
    args = list(sys.argv[1:])
    shards = 1
    if "--shards" in args:
        i = args.index("--shards")
        shards = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    sf_dir, out_dir, corr_path = args[0], args[1], args[2]
    gates = args[3:] or DEFAULT_GATES
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
        shard = (SHARD_MARKERS[name], shards) \
            if shards > 1 and name in SHARD_MARKERS else None
        if sorted(g_names) in (["id_digest", "n_pairs", "pair_digest"],
                               ["n_pairs", "pair_digest"]):
            # digest form: the committed oracle recomputes the pair COUNT
            # and (new form) the md5 id-pair VALUE DIGEST in one pass
            n_spark = g_rows[0][g_names.index("n_pairs")]
            _, orc = run_staged(con, sql, agg=DIGEST_AGG, shard=shard)
            n_oracle, d_oracle = orc
            ok = n_spark == n_oracle
            note = (f"; pair join evaluated in {shards} exact id_a-"
                    f"residue shards" if shard else "")
            if "id_digest" in g_names:
                d_spark = g_rows[0][g_names.index("id_digest")]
                ok_digest = int(d_spark) == int(d_oracle or 0)
                ok = ok and ok_digest
                err = ("scale oracle: digest form — committed-oracle "
                       "pair COUNT and md5 id-pair VALUE DIGEST both "
                       "recomputed and matched (per-pair value column "
                       "additionally hash-pinned at sf0.01/sf0.1)" + note
                       ) if ok else (
                       f"digest mismatch: count {n_spark} vs {n_oracle}, "
                       f"id_digest {d_spark} vs {d_oracle}")
                report[name] = {
                    "rows_match": n_spark == n_oracle,
                    "schema_match": True, "hash_match": ok_digest,
                    "spark_rows": int(n_spark), "oracle_rows": int(n_oracle),
                    "err": err}
                print(f"{'PASS' if ok else 'FAIL'} {name} (digest count "
                      f"{n_spark} vs {n_oracle}, id_digest "
                      f"{'match' if ok_digest else 'MISMATCH'})")
            else:
                report[name] = {
                    "rows_match": ok, "schema_match": True,
                    "hash_match": None, "spark_rows": int(n_spark),
                    "oracle_rows": int(n_oracle),
                    "err": ("scale oracle: digest form — committed-oracle "
                            "pair COUNT compared (xxhash64 digest not "
                            "replayable in DuckDB); value hash pinned at "
                            "sf0.01/sf0.1 (tools/digest_oracles.py)" + note)}
                print(f"{'PASS' if ok else 'FAIL'} {name} "
                      f"(digest count {n_spark} vs {n_oracle})")
            status = "PASS" if ok else "FAIL"
        else:
            e_names, e_rows = run_staged(con, sql, shard=shard)
            if shard:  # shards concatenate; the committed final ORDERs
                e_rows = sorted(e_rows)
                g_rows = sorted(g_rows)
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
