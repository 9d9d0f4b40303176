#!/usr/bin/env python3
"""Dev-only dump-equality comparator: prove two graft.Verify output
trees row-identical per gate (sorted-row value hash over sorted column
names — the same normalization as tools/check.py).

Purpose: when a round's code changes are semantics-preserving (memo
sharing, partitioning config, constant folds), the previous round's
expensive large-SF DuckDB oracle record transfers to the new tree IFF
the new tree's dump is row-identical to the dump that record certified.
This tool is that proof.

Usage: python3 tools/compare_dumps.py <dumpA> <dumpB> [gate ...]
Exit 0 iff every gate present in either tree exists in both and hashes
equal (oracle_sql.json differences are reported but not failures —
oracles may legitimately gain entries between rounds).
"""
import glob
import hashlib
import json
import math
import os
import sys

import pyarrow.parquet as pq


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def gate_hash(d, name):
    files = sorted(glob.glob(f"{d}/{name}/*.parquet"))
    if not files:
        return None
    t = pq.read_table(files[0])
    names = list(t.schema.names)
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = [tuple(c[i].as_py() for c in t.columns)
            for i in range(t.num_rows)]
    lines = sorted("\x1f".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    h.update("\x1e".join(sorted(names)).encode())
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x1e")
    return t.num_rows, h.hexdigest()


def main():
    a, b = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    gates = sorted(
        {d for d in os.listdir(a) if os.path.isdir(f"{a}/{d}")} |
        {d for d in os.listdir(b) if os.path.isdir(f"{b}/{d}")})
    if only:
        gates = [g for g in gates if g in only]
    n_eq = n_diff = 0
    for g in gates:
        ha, hb = gate_hash(a, g), gate_hash(b, g)
        if ha is None or hb is None:
            print(f"MISSING {g}: a={'yes' if ha else 'no'} "
                  f"b={'yes' if hb else 'no'}")
            n_diff += 1
        elif ha == hb:
            n_eq += 1
        else:
            print(f"DIFF {g}: a={ha[0]} rows {ha[1][:16]} "
                  f"b={hb[0]} rows {hb[1][:16]}")
            n_diff += 1
    oa = json.load(open(f"{a}/oracle_sql.json"))
    ob = json.load(open(f"{b}/oracle_sql.json"))
    for k in sorted(set(oa) ^ set(ob)):
        print(f"ORACLE-ONLY-IN-{'A' if k in oa else 'B'} {k}")
    changed = sorted(k for k in set(oa) & set(ob) if oa[k] != ob[k])
    for k in changed:
        print(f"ORACLE-CHANGED {k}")
    print(f"== {n_eq} identical, {n_diff} differing ==")
    sys.exit(1 if n_diff else 0)


if __name__ == "__main__":
    main()
