"""Synthetic problem generators (tests, benchmarks, dryruns).

The MaxCut generator mirrors the Julia data generator's construction
(``lorads/data/gen_MaxCut.jl:213-243``): objective = graph Laplacian scaled,
constraints diag(X) = 1.
"""

from __future__ import annotations

import numpy as np

from .io.sdpa import SDPAData, SDPABlock
from .problem import SDPProblem, canonicalize


def random_maxcut_problem(n: int, avg_degree: int = 6, seed: int = 0,
                          name: str = "synthetic_maxcut") -> SDPProblem:
    """MaxCut SDP on a random graph: min <-L/4, X>, diag(X) = 1, X >= 0."""
    rng = np.random.default_rng(seed)
    n_edges = n * avg_degree // 2
    u = rng.integers(0, n, size=n_edges)
    v = rng.integers(0, n, size=n_edges)
    keep = u != v
    u, v = u[keep], v[keep]
    lo, hi = np.minimum(u, v), np.maximum(u, v)
    key = lo.astype(np.int64) * n + hi
    _, idx = np.unique(key, return_index=True)
    lo, hi = lo[idx], hi[idx]
    wts = np.ones(lo.size)

    deg = np.zeros(n)
    np.add.at(deg, lo, wts)
    np.add.at(deg, hi, wts)

    # C = -L/4 pre-negation; the reader negates objective entries, so build
    # the already-negated form directly: c = +L/4 off-diag -> stored C value
    c_rows = np.concatenate([np.arange(n), lo])
    c_cols = np.concatenate([np.arange(n), hi])
    c_vals = np.concatenate([-deg / 4.0, wts / 4.0])

    blk = SDPABlock(
        dim=n,
        c_rows=c_rows.astype(np.int32), c_cols=c_cols.astype(np.int32),
        c_vals=c_vals,
        a_rows=np.arange(n, dtype=np.int32),
        a_cols=np.arange(n, dtype=np.int32),
        a_vals=np.ones(n),
        a_cid=np.arange(n, dtype=np.int32),
    )
    data = SDPAData(n_constrs=n, blocks=[blk], b=np.ones(n))
    return canonicalize(data, name=name)


def random_multiblock_problem(dims=(14, 14, 10), m=12, seed=23,
                              name="synthetic_multiblock") -> SDPProblem:
    """Bounded, strictly feasible multi-block SDP.

    C_k is PSD (G G^T + I) so min <C, X> over X >= 0 is bounded below;
    b = A(X0) for random PSD X0 makes the problem strictly feasible.
    Blocks couple through the shared constraint space (every constraint
    touches every block) — the stress case for Gauss-Seidel vs Jacobi
    ADMM sweeps and for constraint sharding.
    """
    rng = np.random.default_rng(seed)
    blocks = []
    A_stacks = []
    for n in dims:
        G = rng.normal(size=(n, 3)) / np.sqrt(n)
        C = G @ G.T + np.eye(n)
        iu = np.triu_indices(n)
        # SDPABlock carries already-canonical (min-form) objective values
        # (the file READER does the SDPA-convention negation, canonicalize
        # does not) — store +C so the canonical problem is min <C, X>
        c_rows, c_cols, c_vals = iu[0], iu[1], C[iu]
        rows, cols, vals, cids = [], [], [], []
        for i in range(m):
            for _ in range(3):
                r = int(rng.integers(0, n))
                c = int(rng.integers(r, n))
                rows.append(r)
                cols.append(c)
                vals.append(float(rng.normal()))
                cids.append(i)
        blocks.append(SDPABlock(
            dim=n,
            c_rows=c_rows.astype(np.int32), c_cols=c_cols.astype(np.int32),
            c_vals=c_vals,
            a_rows=np.array(rows, np.int32), a_cols=np.array(cols, np.int32),
            a_vals=np.array(vals), a_cid=np.array(cids, np.int32)))
    prob0 = canonicalize(SDPAData(n_constrs=m, blocks=blocks, b=np.zeros(m)))
    b = np.zeros(m)
    for cone in prob0.cones:
        from .ops.coneops import dense_constraint_matrices

        F = rng.normal(size=(cone.n, 4))
        X0 = F @ F.T / 4.0
        A = dense_constraint_matrices(cone)
        b += np.einsum("mij,ij->m", A, X0)
    return canonicalize(SDPAData(n_constrs=m, blocks=blocks, b=b),
                        name=name)
