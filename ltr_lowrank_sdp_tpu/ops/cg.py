"""Matrix-free conjugate gradients for the ADMM normal equations.

Reference: ``CGSolve`` (``linalg/lorads_cgs.c:128-290``).  Semantics kept:

* warm start from the previous factor;
* relative-residual stop  ||r||_2 / ||b||_1 < tol  (the reference's bNorm is
  an L1 norm, ``lorads_cgs.c:161``);
* residual recomputed from scratch every ``restart_freq`` (>= 20) steps;
* iteration count returned for the cgIter statistics.

The loop is a single ``lax.while_loop`` whose body is one operator
application — on TPU the matvec is the fused gather/segment kernel or an MXU
matmul (see :mod:`..ops.coneops`), so the whole ADMM update stays on-device.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class CGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray
    resid: jnp.ndarray
    converged: jnp.ndarray


def cg_solve(
    matvec: Callable,
    b,
    x0,
    tol,
    max_iter: int,
    restart_freq: int = 20,
) -> CGResult:
    """Solve M x = b with warm start x0; shapes are arbitrary pytree leaves
    of one array (we use (n, r) factor matrices directly)."""
    bnorm1 = jnp.sum(jnp.abs(b))
    bnorm1 = jnp.where(bnorm1 == 0.0, 1.0, bnorm1)

    r0 = b - matvec(x0)
    res0 = jnp.linalg.norm(r0)

    def cond(carry):
        x, r, p, qtr, k, res = carry
        return (res / bnorm1 >= tol) & (k < max_iter)

    def body(carry):
        x, r, p, qtr, k, res = carry
        Q = matvec(p)
        qtr_cur = jnp.vdot(r, r)
        ptq = jnp.vdot(p, Q)
        alpha = qtr_cur / ptq
        x = x + alpha * p
        r = r - alpha * Q

        # periodic residual recomputation for numerical hygiene
        def refresh(xr):
            x_, _ = xr
            rr = b - matvec(x_)
            return x_, rr

        do_refresh = ((k + 1) % restart_freq) == 0
        x, r = jax.lax.cond(do_refresh, refresh, lambda xr: xr, (x, r))

        qtr_new = jnp.vdot(r, r)
        beta = qtr_new / qtr_cur
        p = r + beta * p
        res = jnp.linalg.norm(r)
        return x, r, p, qtr_new, k + 1, res

    x, r, p, qtr, k, res = jax.lax.while_loop(
        cond, body, (x0, r0, r0, jnp.vdot(r0, r0), jnp.asarray(0, jnp.int32), res0)
    )
    return CGResult(x=x, iters=k, resid=res, converged=res / bnorm1 < tol)
