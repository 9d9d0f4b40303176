#!/usr/bin/env python3
"""Dev-only big-SF oracle for the packing gates (doc_pack,
doc_pipeline_e2e): a sequential Python replay of the greedy packing
recurrence (and, for the e2e gate, the quality-rule ladder and
first-id md5 dedup in front of it).

NOT part of the library (driver-side python, like tools/check.py).

Why it exists: the committed DuckDB oracle replays the recurrence with a
recursive CTE whose depth is the max per-source doc count. DuckDB
re-executes the recursive leg's join each iteration, so at sf10 (25k
docs/source) the oracle is effectively quadratic (25k iterations x 500k
probe builds) and runs for hours, while the recurrence itself is a
trivial linear walk. At the driver's gate scale (sf0.01, depth ~25) the
SQL oracle stays the oracle of record; THIS replay extends the same
check to the soak scales. `--selftest <sfDir>` proves the replay
hash-equal to the committed SQL oracle where both are cheap.

Usage:
  python3 tools/pack_oracle.py --selftest /root/testdata/sf0.1
  python3 tools/pack_oracle.py <sfDir> <verifyOutDir> <correctness.json>
"""
import glob
import hashlib
import json
import re
import sys

import pyarrow.parquet as pq

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from check import table_hash

BUDGET = 512
WS = re.compile(r"[ \t\n\x0b\f\r]+")
STOP = {"the", "a", "an", "of", "and", "to", "with", "that", "be", "have"}
ALPHA = re.compile(r"[a-z]")


def norm_words(text):
    return WS.sub(" ", text.lower()).strip(" ").split(" ")


# the TokenCountExpr subword-budget scheme's regex twin (same pattern as
# the committed DuckDB oracle — python regex is per-CODE-POINT like RE2,
# so astral chars count once, matching the Scala codePointAt walk)
TOK = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]")


def token_count(text):
    total = 0
    for r in TOK.findall(text):
        c = r[0]
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):
            total += -(-len(r) // 6)
        elif "0" <= c <= "9":
            total += -(-len(r) // 3)
        else:
            total += 1
    return total


def keep(ws):
    """The doc_quality_rules first-fail ladder, keep iff every rule passes
    (mirrors QualityRules.classify / the SQL CASE)."""
    n = len(ws)
    if n < 50 or n > 100000:
        return False
    swl = sum(len(w) for w in ws)
    if swl / n < 3.0 or swl / n > 10.0:
        return False
    if sum(1 for w in ws if w in STOP) < 2:
        return False
    if sum(1 for w in ws if ALPHA.search(w)) / n < 0.8:
        return False
    if sum(1 for w in ws if w.startswith("#") or "..." in w or "{" in w) \
            / n > 0.1:
        return False
    return True


def pack(rows):
    """rows: (doc_id, source, n_tokens) sorted by (source, doc_id) ->
    (source, bin) -> [n_docs, bin_tokens, id_checksum]."""
    bins = {}
    cur_src, fill, b = object(), 0, 0
    for doc_id, src, toks in rows:
        if src != cur_src:
            cur_src, b, fill = src, 0, toks
        elif fill + toks > BUDGET:
            b, fill = b + 1, toks
        else:
            fill += toks
        st = bins.setdefault((src, b), [0, 0, 0])
        st[0] += 1
        st[1] += toks
        st[2] += doc_id
    return bins


def src_id_key(r):
    """None-safe (source, doc_id) sort key: packGreedy packs a NULL
    stratum as its own group, and Python 3 raises on None < str — Nones
    sort first, mirroring the SQL oracles' IS NOT DISTINCT FROM join."""
    return (r[1] is not None, r[1] or "", r[0])


def docs(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "source", "text"])
    out = []
    for i in range(t.num_rows):
        txt = t["text"][i].as_py()
        if txt is None:
            continue
        out.append((t["doc_id"][i].as_py(), t["source"][i].as_py(), txt))
    out.sort(key=src_id_key)
    return out


def oracle_rows(sf_dir, mode):
    e2e = mode == "e2e"
    rows = []
    if mode == "tokens":
        rows = [(doc_id, src, token_count(txt))
                for doc_id, src, txt in docs(sf_dir)]
    elif e2e:
        # rules-keep, then first doc_id per md5(text) (ids ascend within
        # each (source, doc_id)-sorted group, but dedup is CORPUS-wide:
        # pick global min id per hash, then re-walk in order)
        first = {}
        for doc_id, src, txt in docs(sf_dir):
            ws = norm_words(txt)
            if not keep(ws):
                continue
            h = hashlib.md5(txt.encode()).hexdigest()
            if h not in first or doc_id < first[h][0]:
                first[h] = (doc_id, src, len(ws))
        rows = sorted(first.values(), key=src_id_key)
    else:
        rows = [(doc_id, src, len(norm_words(txt)))
                for doc_id, src, txt in docs(sf_dir)]
    bins = pack(rows)
    names = ["source", "bin", "n_docs", "bin_tokens", "id_checksum"]
    data = [(src, b, st[0], st[1], st[2])
            for (src, b), st in sorted(
                bins.items(), key=lambda kv: src_id_key((kv[0][1], kv[0][0])))]
    return names, data


def check_query(sf_dir, out_dir, name, mode):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return None, f"no spark output for {name}"
    got = pq.read_table(files[0])
    g_rows = [tuple(c[i].as_py() for c in got.columns)
              for i in range(got.num_rows)]
    e_names, e_rows = oracle_rows(sf_dir, mode)
    ok_schema = sorted(got.schema.names) == sorted(e_names)
    ok_rows = len(g_rows) == len(e_rows)
    ok_hash = (table_hash(list(got.schema.names), g_rows)
               == table_hash(e_names, e_rows))
    return {"rows_match": ok_rows, "schema_match": ok_schema,
            "hash_match": ok_hash, "spark_rows": len(g_rows),
            "oracle_rows": len(e_rows),
            "err": None if (ok_rows and ok_schema and ok_hash)
            else "python replay mismatch"}, None


def selftest(sf_dir):
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    # committed SQL twins live next to any Verify out dir; regenerate via
    # the repo source of truth instead: read oracle_sql.json if present
    sqls = None
    for cand in glob.glob("/tmp/*/oracle_sql.json") + \
            glob.glob("tmp/*/oracle_sql.json"):
        d = json.load(open(cand))
        if "doc_pack" in d and "doc_pipeline_e2e" in d:
            sqls = d
            break
    assert sqls, "run graft.Verify once so oracle_sql.json exists"
    for name, mode in (("doc_pack", "pack"), ("doc_pipeline_e2e", "e2e"),
                       ("doc_pack_tokens", "tokens")):
        if name not in sqls:
            continue
        rel = con.sql(sqls[name])
        s_names, s_rows = list(rel.columns), rel.fetchall()
        p_names, p_rows = oracle_rows(sf_dir, mode)
        assert table_hash(s_names, s_rows) == table_hash(p_names, p_rows), \
            f"{name}: python replay != SQL oracle at {sf_dir}"
        print(f"selftest {name}: replay == SQL oracle "
              f"({len(p_rows)} rows) at {sf_dir}")


def main():
    if sys.argv[1] == "--selftest":
        selftest(sys.argv[2])
        return
    sf_dir, out_dir, corr = sys.argv[1], sys.argv[2], sys.argv[3]
    report = json.load(open(corr)) if glob.glob(corr) else {}
    fail = 0
    for name, mode in (("doc_pack", "pack"), ("doc_pipeline_e2e", "e2e"),
                       ("doc_pack_tokens", "tokens")):
        row, err = check_query(sf_dir, out_dir, name, mode)
        if err:
            print(f"SKIP {name}: {err}")
            continue
        ok = row["hash_match"] and row["rows_match"] and row["schema_match"]
        print(("PASS" if ok else "FAIL") + f" {name} "
              f"({row['spark_rows']} rows)")
        fail += 0 if ok else 1
        report[name] = row
    json.dump(report, open(corr, "w"), indent=2)
    open(corr, "a").write("\n")
    print(f"wrote {corr}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
