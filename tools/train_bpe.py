#!/usr/bin/env python3
"""Offline byte-level BPE merge-table trainer (round-15 verdict #3).

Dev-only (driver-side python; the Scala library never depends on it).
Trains a SMALL deterministic merge table on the fixture corpus and
writes it as data, checked in at src/main/resources/graft/bpe_merges.txt
— the library applies it at scan time (pipeline/Bpe.scala); the sibling
bpe_oracle.py re-applies it independently as the differential twin.

Tokenizer spec (shared verbatim by Bpe.scala and bpe_oracle.py):
  1. Pre-tokenize: split text on runs of exactly {space, \\t, \\n, \\f,
     \\r} (the RE2 \\s class TextHash.tokenCount already pins — NOT
     Java's \\s, which adds \\x0B). Empty splits are dropped.
  2. Each pre-token's UTF-8 bytes are the initial symbol sequence.
  3. Merges apply in rank order: repeatedly find the LOWEST-RANK
     adjacent symbol pair present and fuse every non-overlapping
     occurrence left-to-right.
  4. The document's token count is the summed symbol count.

Training is classic greedy BPE over word frequencies with a total
order: most frequent pair first, ties broken by the lexicographically
smallest (left_bytes, right_bytes). Every step is integer arithmetic
over sorted dicts — byte-identical across runs and platforms.

Merge file format: one merge per line, `<hex(left)> <hex(right)>`,
rank = line number (0-based). Comments start with '#'.

Usage: python3 tools/train_bpe.py <documents.parquet> <out_merges.txt>
           [n_merges=512]
"""
import sys
import pyarrow.parquet as pq

WS = set(b" \t\n\f\r")


def pretokens(text: bytes):
    word = bytearray()
    for b in text:
        if b in WS:
            if word:
                yield bytes(word)
                word = bytearray()
        else:
            word.append(b)
    if word:
        yield bytes(word)


def pair_counts(vocab):
    counts = {}
    for word, freq in vocab.items():
        for a, b in zip(word, word[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def merge_word(word, pair, fused):
    out = []
    i = 0
    while i < len(word):
        if i + 1 < len(word) and (word[i], word[i + 1]) == pair:
            out.append(fused)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def main():
    docs_path, out_path = sys.argv[1], sys.argv[2]
    n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    tbl = pq.read_table(docs_path, columns=["text"])
    freq = {}
    for chunk in tbl.column("text").chunks:
        for v in chunk:
            t = v.as_py()
            if t is None:
                continue
            for w in pretokens(t.encode("utf-8")):
                freq[w] = freq.get(w, 0) + 1
    # symbol = bytes; initial words are per-byte tuples
    vocab = {tuple(bytes([b]) for b in w): f for w, f in freq.items()}
    merges = []
    for _ in range(n_merges):
        counts = pair_counts(vocab)
        if not counts:
            break
        # total order: max count, then lexicographically smallest pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        fused = best[0] + best[1]
        merges.append(best)
        vocab = {merge_word(w, best, fused): f for w, f in vocab.items()}
    with open(out_path, "w") as f:
        f.write("# byte-level BPE merges; rank = line order; "
                "hex(left) hex(right)\n")
        for a, b in merges:
            f.write(f"{a.hex()} {b.hex()}\n")
    n_tok = sum(len(w) * f for w, f in vocab.items())
    n_base = sum(len(w) * f for w, f in freq.items())
    print(f"wrote {len(merges)} merges; corpus {n_base} bytes -> "
          f"{n_tok} tokens ({n_base / max(1, n_tok):.2f} bytes/token)")


if __name__ == "__main__":
    main()
