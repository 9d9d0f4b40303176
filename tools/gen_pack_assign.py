#!/usr/bin/env python3
"""Emit the greedy BPE-budget pack BOUNDARIES for a corpus, for the
non-recursive doc_pack_bpe oracle (tools/pack_assign_oracle.py).

Dev-only (driver-side python, the tools/gen_bpe_counts.py pattern):
the output is committed ORACLE DATA, not library input. Only the bin
boundaries are written — (source, bin, first_doc_id), one row per bin
(~13k rows at sf10 vs 500k doc-level assignments) — because membership
is derivable non-recursively in DuckDB with an ASOF join, and the
checker re-proves GREEDINESS itself with window functions, so nothing
in this file is trusted: a wrong boundary fails the checker, it cannot
pass a wrong Spark result.

Per-doc token counts come from the committed per-text table
(src/main/resources/graft/bpe_counts.tsv, itself certified against the
independent python BPE twin in tools/bpe_oracle.py); an unmatched text
FAILS, mirroring the committed SQL oracle's inner join contract.

Usage:
  python3 tools/gen_pack_assign.py tmp/sf10 tools/data/pack_assign_sf10.tsv.gz
"""
import gzip
import hashlib
import sys

import pyarrow.parquet as pq

BUDGET = 2048
COUNTS = "src/main/resources/graft/bpe_counts.tsv"


def main():
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    counts = {}
    with open(COUNTS) as f:
        for line in f:
            h, n = line.rstrip("\n").split("\t")
            counts[h] = int(n)
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "source", "text"])
    rows = []
    for i in range(t.num_rows):
        txt = t["text"][i].as_py()
        if txt is None:
            continue
        src = t["source"][i].as_py()
        assert src is not None, \
            "NULL source: the ASOF-join oracle form needs a sentinel first"
        h = hashlib.md5(txt.encode()).hexdigest()[:16]
        assert h in counts, f"text not in committed counts: doc {t['doc_id'][i]}"
        rows.append((t["doc_id"][i].as_py(), src, counts[h]))
    rows.sort(key=lambda r: (r[1], r[0]))

    bounds = []
    cur_src, fill, b = object(), 0, 0
    for doc_id, src, toks in rows:
        if src != cur_src:
            cur_src, b, fill = src, 0, toks
            bounds.append((src, b, doc_id))
        elif fill + toks > BUDGET:
            b, fill = b + 1, toks
            bounds.append((src, b, doc_id))
        else:
            fill += toks
    with gzip.open(out_path, "wt") as f:
        for src, b, doc_id in bounds:
            f.write(f"{src}\t{b}\t{doc_id}\n")
    print(f"{len(bounds)} bin boundaries over {len(rows)} docs -> {out_path}")


if __name__ == "__main__":
    main()
