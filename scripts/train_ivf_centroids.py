"""Provenance for qendpoint_spark.ops.ivf.FROZEN_CENTROIDS.

Trains the IVF coarse quantizer once (deterministic Lloyd: seeds = the
k lowest vec_ids, fixed iteration count) over the QUANTIZED sf0.01
embeddings and prints the integer centroid literals to paste into
ivf.py. The quantizer is a frozen artifact at serving time — the same
contract FAISS IVF indexes use — which is what makes the driver-gate
query (assignment + probe + top-k) exactly SQL-expressible.

Usage: python scripts/train_ivf_centroids.py [sf_dir] [k] [iters]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

QUANT = 1000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    con = duckdb.connect()
    if k <= 0:
        # default k ~= sqrt(n): the IVF balance point (probing nprobe
        # of sqrt(n) lists touches ~nprobe*sqrt(n) vectors, not n)
        (n,) = con.execute(
            f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'"
        ).fetchone()
        k = max(4, round(n**0.5))
    rows = con.execute(
        f"""SELECT vec_id,
                   list_transform(embedding, x -> round(x::DOUBLE * {QUANT})::BIGINT)
            FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"""
    ).fetchall()
    Q = np.array([r[1] for r in rows], dtype=np.int64)
    cent = Q[:k].astype(np.float64)  # deterministic seeds
    for _ in range(iters):
        d2 = ((Q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        cent = np.stack(
            [
                Q[assign == c].mean(axis=0) if (assign == c).any() else cent[c]
                for c in range(k)
            ]
        )
    frozen = np.rint(cent).astype(np.int64)
    d2 = ((Q[:, None, :] - frozen[None, :, :]) ** 2).sum(axis=2)
    sizes = np.bincount(d2.argmin(axis=1), minlength=k).tolist()
    print(f"# k={k} iters={iters} sf_dir={sf_dir} cluster_sizes={sizes}")
    print("FROZEN_CENTROIDS = [")
    for vec in frozen:
        print("    [" + ", ".join(map(str, vec.tolist())) + "],")
    print("]")


if __name__ == "__main__":
    main()
