#!/usr/bin/env python3
"""Generate the committed per-text BPE token-count table (round-17
verdict #4 — the emb_pca model-as-data pattern applied to the BPE
gates).

The byte-level merge loop is not SQL-expressible, so the DuckDB full
hash oracle for doc_tokens_bpe / doc_pack_bpe replays COMMITTED
per-text counts — derived offline by this committed tool from the
committed merge table via the same independent tokenizer
reimplementation the differential twin uses (tools/bpe_oracle.py) —
while the live Catalyst expression stays pinned by the
doc_tokens_bpe_sound certificate and the twin.

Writes src/main/resources/graft/bpe_counts.tsv with lines

    <md5(text)[:16]> TAB <n_tokens>

covering every distinct non-null text in the given corpora (default:
the three driver corpora under /root/testdata). The committed table is
keyed by TEXT, not doc_id, because the scale corpora
(tools/scale_testdata.py) replicate rows key-shifted with texts copied
VERBATIM — so sf1/sf10 coverage follows from sf0.1's. A 16-hex-char
(64-bit) md5 prefix keys ~6k fixed texts with negligible collision
mass; an actual collision with differing counts fails loud here, and
an unmatched text at oracle time fails the gate (LEFT JOIN null
diverges from the live count), never silently passes.

Usage: python3 tools/gen_bpe_counts.py [corpusDir ...]
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import pyarrow.parquet as pq

from bpe_oracle import load_merges, count_tokens

OUT = "src/main/resources/graft/bpe_counts.tsv"


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001",
                            "/root/testdata/sf0.01",
                            "/root/testdata/sf0.1"]
    ranks = load_merges()
    cache = {}
    out = {}
    for d in dirs:
        t = pq.read_table(f"{d}/documents.parquet", columns=["text"])
        for v in t.column("text"):
            text = v.as_py()
            if text is None:
                continue
            h = hashlib.md5(text.encode("utf-8")).hexdigest()[:16]
            n = count_tokens(text, ranks, cache)
            if h in out and out[h] != n:
                raise SystemExit(f"md5-prefix collision at {h}: "
                                 f"{out[h]} vs {n}")
            out[h] = n
    with open(OUT, "w") as f:
        for h in sorted(out):
            f.write(f"{h}\t{out[h]}\n")
    print(f"wrote {len(out)} entries to {OUT}")


if __name__ == "__main__":
    main()
