"""Batched-instance solves: vmap over a batch axis sharded across the mesh.

BASELINE.json config 5 ("64 Gset instances sharded across a pod slice"):
instances that share one constraint structure (e.g. MaxCut instances of the
same graph family and size — identical diag constraint pattern, different
objectives) batch along a leading axis.  The batch axis shards over the
``batch`` mesh axis with zero cross-instance communication; each device runs
its instances' ALM steps locally.

Heterogeneous instances are padded to a common (n, nnz) envelope by the
caller (zero-valued entries are exact no-ops in every operator).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.cubic import quartic_linesearch


class BatchedMaxCutProblem(NamedTuple):
    """A batch of MaxCut-family instances: diag constraints A_i = e_i e_i^T,
    per-instance sparse objective with one shared COO pattern envelope."""

    c_rows: jnp.ndarray     # (nnzC,) shared pattern
    c_cols: jnp.ndarray
    c_vals: jnp.ndarray     # (B, nnzC) per-instance values (0 padded)
    b: jnp.ndarray          # (B, n)
    n: int


def batched_from_problems(probs, dtype=jnp.float64) -> BatchedMaxCutProblem:
    """Stack diag-cone problems into one batch, padding the C pattern."""
    cones = [p.cones[0] for p in probs]
    n = max(c.n for c in cones)
    nnz = max(c.c_vals.size for c in cones)
    B = len(probs)
    rows = np.zeros((B, nnz), np.int32)
    cols = np.zeros((B, nnz), np.int32)
    vals = np.zeros((B, nnz))
    b = np.zeros((B, n))
    for i, (p, c) in enumerate(zip(probs, cones)):
        k = c.c_vals.size
        rows[i, :k] = c.c_rows
        cols[i, :k] = c.c_cols
        vals[i, :k] = c.c_vals
        bi = np.zeros(n)
        np.add.at(bi, c.diag_idx, c.diag_val * 0 + p.b[c.diag_cid])
        b[i] = bi
    # use the first instance's pattern as the shared envelope when identical;
    # otherwise keep per-instance patterns (gather indices are data anyway)
    return BatchedMaxCutProblem(
        c_rows=jnp.asarray(rows, jnp.int32),
        c_cols=jnp.asarray(cols, jnp.int32),
        c_vals=jnp.asarray(vals, dtype),
        b=jnp.asarray(b, dtype),
        n=n,
    )


def _single_alm_step(c_rows, c_cols, c_vals, b, R, dual, rho):
    """One steepest-descent ALM step with exact line search for a diag-cone
    (MaxCut) instance.  Used by the batched scenario solver; the full
    featured path remains the unbatched driver."""
    n, r = R.shape

    def constr(U, V):
        return jnp.sum(U * V, axis=1)  # diag constraints, val 1

    def apply_c(Y):
        wv = c_vals
        out = jnp.zeros_like(Y).at[c_rows].add(wv[:, None] * Y[c_cols])
        off = (c_rows != c_cols).astype(Y.dtype) * wv
        out = out.at[c_cols].add(off[:, None] * Y[c_rows])
        return out

    def obj(U, V):
        ur = U[c_rows]
        vc = V[c_cols]
        uc = U[c_cols]
        vr = V[c_rows]
        coef = jnp.where(c_rows != c_cols, 2.0 * c_vals, c_vals)
        return jnp.sum(coef * 0.5 * (jnp.sum(ur * vc, -1) + jnp.sum(uc * vr, -1)))

    cons = constr(R, R)
    w = -dual + rho * (cons - b)
    grad = 2.0 * (apply_c(R) + w[:, None] * R)
    D = -grad
    q0 = b - cons
    q1 = 2.0 * constr(R, D)
    p1 = 2.0 * obj(R, D)
    q2 = constr(D, D)
    p2 = obj(D, D)
    tau, _ = quartic_linesearch(rho, dual, p1, p2, q0, q1, q2)
    R = R + tau * D
    cons = cons + tau * q1 + tau * tau * q2
    dual = dual + rho * (b - cons)
    pinf = jnp.linalg.norm(b - cons) / (1.0 + jnp.sum(jnp.abs(b)))
    return R, dual, pinf


def batched_alm_steps(mesh: Mesh, prob: BatchedMaxCutProblem, R, dual, rho,
                      num_steps: int = 1):
    """Run ``num_steps`` batched ALM steps with the batch axis sharded.

    R: (B, n, r), dual: (B, n).  Returns (R, dual, pinf(B,)).
    """
    step = jax.vmap(_single_alm_step, in_axes=(0, 0, 0, 0, 0, 0, None))

    def many(R, dual):
        def body(i, carry):
            R, dual, _ = carry
            R, dual, pinf = step(
                prob.c_rows, prob.c_cols, prob.c_vals, prob.b, R, dual, rho
            )
            return R, dual, pinf

        pinf0 = jnp.zeros(R.shape[0], R.dtype)
        return jax.lax.fori_loop(0, num_steps, body, (R, dual, pinf0))

    sharding = NamedSharding(mesh, P("batch"))
    jitted = jax.jit(
        many,
        in_shardings=(sharding, sharding),
        out_shardings=(sharding, sharding, sharding),
    )
    return jitted(R, dual)
