#!/usr/bin/env python3
"""Fit the committed PCA rotation artifact (integer micros).

Covariance-method PCA (the same closed form graft.pipeline.Pca.fit
computes) on the fixture embeddings corpus, k = 8 axes over dim = 64,
eigenvectors sign-pinned exactly like Pca.fit (largest-|component|
coordinate positive, first such index on ties). The fitted mean and
rotation are quantized to INTEGER MICROS (floor(v * 1e6 + 0.5)) and
committed as src/main/resources/graft/pca_rotation.txt — the artifact
the emb_pca gate and its DuckDB oracle both replay, so the projection
check is exact bigint arithmetic on both sides (the bpe_merges.txt
provenance pattern: a committed, builder-trained model-as-data).

Usage: tools/train_pca.py /root/testdata/sf0.01 [out.txt]
"""
import sys

import numpy as np
import pyarrow.parquet as pq

K, DIM = 8, 64


def main():
    sf_dir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else \
        "src/main/resources/graft/pca_rotation.txt"
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    x = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    assert x.shape[1] == DIM, x.shape
    n = x.shape[0]
    mean = x.sum(axis=0) / n
    cov = (x.T @ x) / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(-vals, kind="stable")  # descending, index tiebreak
    lines = [f"# fitted by tools/train_pca.py on {sf_dir} embeddings "
             f"(n={n}, k={K}, dim={DIM}); integer micros"]
    for i in range(DIM):
        lines.append(f"mu {i} {int(np.floor(mean[i] * 1e6 + 0.5))}")
    for j in range(K):
        v = vecs[:, order[j]].copy()
        # sign pin: largest-|component| coordinate positive, first on ties
        m = max(range(DIM), key=lambda i: (abs(v[i]), -i))
        if v[m] < 0:
            v = -v
        for i in range(DIM):
            lines.append(f"q {j} {i} {int(np.floor(v[i] * 1e6 + 0.5))}")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    ev = vals[order[:K]]
    print(f"wrote {out}: n={n}, top eigenvalues {np.round(ev, 4)}")


if __name__ == "__main__":
    main()
