#!/usr/bin/env python3
"""Dev-only scale amplifier: derive a larger scale factor from an existing
testdata dir by key-shifted replication (sf0.1 x 10 ~= sf1 row counts).

NOT part of the library (driver-side python). The testdata dirs themselves
are read-only; output goes to a scratch dir (e.g. /tmp/sf1). Every copy
shifts all join/identity keys by i * 1e8 so keys stay unique and foreign
keys stay consistent; dimension tables (region/nation) are not replicated.
Text/embedding payloads repeat verbatim, which makes the derived corpus
duplicate-heavy — deliberately so: clone cliques are exactly the regime the
dedup family must survive at scale.

Usage: python3 tools/scale_testdata.py <srcDir> <dstDir> [copies=10]
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT_KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
OFFSET = 100_000_000


def main():
    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for table, keys in SHIFT_KEYS.items():
        s = f"{src}/{table}.parquet"
        d = f"{dst}/{table}.parquet"
        if not keys:
            shutil.copyfile(s, d)
            print(f"{table}: copied (dimension)")
            continue
        tbl = pq.read_table(s)
        parts = []
        for i in range(copies):
            t = tbl
            for k in keys:
                idx = t.schema.get_field_index(k)
                shifted = pc.add(t.column(k), i * OFFSET)
                t = t.set_column(idx, t.schema.field(idx), shifted)
            parts.append(t)
        out = pa.concat_tables(parts)
        # version 2.6 keeps timestamp[ns] as TIMESTAMP(NANOS) — the events
        # reader depends on the nanos physical type
        pq.write_table(out, d, version="2.6")
        print(f"{table}: {tbl.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
