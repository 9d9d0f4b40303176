#!/usr/bin/env python3
"""Differential twin for the BPE token-count gates (round-15 verdict #3).

Dev-only (driver-side python). Independently re-implements the
committed tokenizer spec (see tools/train_bpe.py docstring) over the
same parquet + merge table, then compares against the Spark side two
ways:

  1. doc_tokens_bpe — recompute per-source (total_tokens, n_docs,
     max_tokens) and diff against the gate's dumped parquet.
  2. doc_pack_bpe — recompute per-doc counts, replay the greedy packing
     recurrence (the pack_oracle.py walk) and diff binStats.

Usage:
  python3 tools/bpe_oracle.py <sfDir> <verifyOutDir>

Exit 0 iff both match exactly.
"""
import sys
import glob
import pyarrow.parquet as pq

WS = set(b" \t\n\f\r")


def load_merges(path="src/main/resources/graft/bpe_merges.txt"):
    ranks = {}
    with open(path) as f:
        for line in f:
            t = line.strip()
            if not t or t.startswith("#"):
                continue
            a, b = t.split(" ")
            ranks[(bytes.fromhex(a), bytes.fromhex(b))] = len(ranks)
    return ranks


def pretokens(text_bytes):
    word = bytearray()
    for b in text_bytes:
        if b in WS:
            if word:
                yield bytes(word)
                word = bytearray()
        else:
            word.append(b)
    if word:
        yield bytes(word)


def word_tokens(word, ranks, cache):
    hit = cache.get(word)
    if hit is not None:
        return hit
    parts = [bytes([b]) for b in word]
    while len(parts) > 1:
        best = None
        for pair in zip(parts, parts[1:]):
            r = ranks.get(pair)
            if r is not None and (best is None or r < best[0]):
                best = (r, pair)
        if best is None:
            break
        pair = best[1]
        out, i = [], 0
        while i < len(parts):
            if i + 1 < len(parts) and (parts[i], parts[i + 1]) == pair:
                out.append(parts[i] + parts[i + 1])
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    cache[word] = len(parts)
    return len(parts)


def count_tokens(text, ranks, cache):
    return sum(word_tokens(w, ranks, cache)
               for w in pretokens(text.encode("utf-8")))


def read_gate(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    assert files, f"no spark output for {name} under {out_dir}"
    t = pq.read_table(files[0])
    return [tuple(c[i].as_py() for c in t.columns)
            for i in range(t.num_rows)], list(t.schema.names)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    ranks = load_merges()
    cache = {}
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "text"])
    rows = list(zip(docs.column("doc_id").to_pylist(),
                    docs.column("source").to_pylist(),
                    docs.column("text").to_pylist()))
    ok = True

    # --- doc_tokens_bpe: per-source aggregate ---
    agg = {}
    for _, src, text in rows:
        n = None if text is None else count_tokens(text, ranks, cache)
        tot, cnt, mx = agg.get(src, (0, 0, None))
        agg[src] = (tot + (n or 0), cnt + 1,
                    n if mx is None else (mx if n is None else max(mx, n)))
    want = sorted((s, t, c, m) for s, (t, c, m) in agg.items())
    got_rows, names = read_gate(out_dir, "doc_tokens_bpe")
    order = [names.index(c) for c in
             ["source", "total_tokens", "n_docs", "max_tokens"]]
    got = sorted(tuple(r[i] for i in order) for r in got_rows)
    if got != want:
        print(f"FAIL doc_tokens_bpe: {len(got)} spark rows vs "
              f"{len(want)} twin rows; first diff: "
              f"{next((g, w) for g, w in zip(got, want) if g != w)}")
        ok = False
    else:
        print(f"PASS doc_tokens_bpe ({len(got)} rows)")

    # --- doc_pack_bpe: replay the Pack.packGreedy recurrence ---
    # Walk each source's docs in ASCENDING doc_id order (spreadSmall is
    # physical layout only); bin 0 / fill=tk at the first doc, overflow
    # (fill+tk > budget) starts a new bin with fill=tk, else fill+=tk.
    budget = 2048
    per_source = {}
    for doc_id, src, text in rows:
        if text is None:
            continue
        per_source.setdefault(src, []).append(
            (doc_id, count_tokens(text, ranks, cache)))
    stats = {}
    for src, lst in per_source.items():
        lst.sort()
        bins = {}
        bin_id, fill = 0, None
        for doc_id, n in lst:
            if fill is None:
                fill = n
            elif fill + n > budget:
                bin_id += 1
                fill = n
            else:
                fill += n
            cnt, tot, chk = bins.get(bin_id, (0, 0, 0))
            bins[bin_id] = (cnt + 1, tot + n, chk + doc_id)
        for b, v in bins.items():
            stats[(src, b)] = v
    want_pack = sorted((s, b, c, t, k)
                       for (s, b), (c, t, k) in stats.items())
    got_rows, names = read_gate(out_dir, "doc_pack_bpe")
    order = [names.index(c) for c in
             ["source", "bin", "n_docs", "bin_tokens", "id_checksum"]]
    got_pack = sorted(tuple(r[i] for i in order) for r in got_rows)
    if got_pack != want_pack:
        print(f"FAIL doc_pack_bpe: {len(got_pack)} spark rows vs "
              f"{len(want_pack)} twin rows; first diff: "
              f"{next((g, w) for g, w in zip(got_pack, want_pack) if g != w)}")
        ok = False
    else:
        print(f"PASS doc_pack_bpe ({len(got_pack)} rows)")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
