"""Analyze block-sparse density of an instance's objective C under RCM.

Decides whether a block-sparse MXU SpMM (dense (bs x 128) tiles batched into
MXU matmuls) beats the gather-ELL path for a given graph: reports, per tile
shape, the number of nonempty tiles, the stored-entry blow-up vs nnz, and the
estimated FLOP cost at rank r.

Usage: python scripts/block_density.py <instance.(dat-s|mat)> [rank]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import reverse_cuthill_mckee

from ltr_lowrank_sdp_tpu.problem import load_problem

path = sys.argv[1]
r = int(sys.argv[2]) if len(sys.argv) > 2 else 25
prob = load_problem(path)
cone = prob.cones[0]
n = cone.n
rows, cols, vals = cone.c_rows, cone.c_cols, cone.c_vals
off = rows != cols
R = np.concatenate([rows, cols[off]])
Cc = np.concatenate([cols, rows[off]])
V = np.concatenate([vals, vals[off]])
A = sp.csr_matrix((V, (R, Cc)), shape=(n, n))
print(f"n={n} nnz(sym)={A.nnz} avg_deg={A.nnz/n:.1f}")

perm = reverse_cuthill_mckee(A, symmetric_mode=True)
Ap = A[perm][:, perm].tocoo()
bw = np.abs(Ap.row - Ap.col).max()
print(f"RCM bandwidth={bw}")

for bs_r, bs_c in [(8, 128), (16, 128), (32, 128), (64, 128), (128, 128),
                   (256, 256), (512, 512)]:
    br = Ap.row // bs_r
    bc = Ap.col // bs_c
    key = br.astype(np.int64) * ((n + bs_c - 1) // bs_c) + bc
    nblk = np.unique(key).size
    stored = nblk * bs_r * bs_c
    # flops of one S@Y at rank r via batched matmul vs gather path
    mxu_flops = 2 * stored * r
    gather_idx = Ap.nnz  # one Y-row gather per (padded) slot
    print(f"tile {bs_r:4d}x{bs_c}: blocks={nblk:8d} stored={stored/1e6:8.1f}M "
          f"blowup={stored/A.nnz:7.1f}x mxu_gflop={mxu_flops/1e9:7.2f} "
          f"mem={stored*4/1e9:6.2f}GB")
