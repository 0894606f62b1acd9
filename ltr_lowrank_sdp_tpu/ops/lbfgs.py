"""Limited-memory BFGS two-loop recursion over flattened factor stacks.

The reference keeps a circular linked list of (s, y, beta) nodes over the
concatenation of all cones' factors (``lorads_alm.c:347-599``,
``setlbfgsHisTwo:842``); here the history is a ring buffer of fixed-size
arrays so the whole recursion is a pair of ``lax.fori_loop``s inside jit.
No H0 scaling is applied (H0 = I), matching the reference two-loop.

History update rule (reference ``SetyAsNegGrad`` + ``setlbfgsHisTwo``):
    s_new = tau * D
    y_new = grad_new - grad_old
    beta  = 1 / <y_new, s_new>
The direction falls back to -grad when the two-loop output is not a descent
direction (``LBFGSDirectionUseGrad``, ``lorads_alm.c:607``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LBFGSHistory(NamedTuple):
    s: jnp.ndarray       # (L, N) steps
    y: jnp.ndarray       # (L, N) gradient differences
    beta: jnp.ndarray    # (L,) 1/<y,s>
    head: jnp.ndarray    # int32 ring pointer: next slot to write
    count: jnp.ndarray   # int32 number of valid pairs (saturates at L)


def init_history(n_elems: int, length: int, dtype=jnp.float64) -> LBFGSHistory:
    return LBFGSHistory(
        s=jnp.zeros((length, n_elems), dtype),
        y=jnp.zeros((length, n_elems), dtype),
        beta=jnp.zeros((length,), dtype),
        head=jnp.asarray(0, jnp.int32),
        count=jnp.asarray(0, jnp.int32),
    )


def reset_history(hist: LBFGSHistory) -> LBFGSHistory:
    """Forget all pairs (reference: clearLBFGS = 0 restarts the recursion)."""
    return hist._replace(count=jnp.asarray(0, jnp.int32))


def push_pair(hist: LBFGSHistory, s, y) -> LBFGSHistory:
    """Insert a new (s, y) pair at the ring head.

    Cautious update: a pair with vanishing curvature <y,s> ~ 0 (stalled
    step, or the zero step pushed after a rejected line search) would give
    beta = 1/<y,s> ~ 1e15 and blow up the two-loop direction by 1e8x —
    harmless in the reference's doubles but fatal in float32, where the
    line-search coefficient rho*||A(DD^T)||^2 then overflows to inf and
    surfaces as a spurious Cardano num_err.  Such pairs get beta = 0,
    which makes them exact no-ops in both recursion loops."""
    ys = jnp.vdot(y, s)
    curv_ok = ys > 1e-8 * jnp.linalg.norm(y) * jnp.linalg.norm(s)
    beta = jnp.where(curv_ok, 1.0 / jnp.where(curv_ok, ys, 1.0), 0.0)
    L = hist.s.shape[0]
    return LBFGSHistory(
        s=hist.s.at[hist.head].set(s),
        y=hist.y.at[hist.head].set(y),
        beta=hist.beta.at[hist.head].set(beta),
        head=(hist.head + 1) % L,
        count=jnp.minimum(hist.count + 1, L),
    )


def direction(hist: LBFGSHistory, grad, n_valid=None):
    """Two-loop recursion: D = -H grad, with -grad fallback on non-descent.

    n_valid limits the usable pairs (the reference passes ``clearLBFGS`` so a
    freshly-restarted recursion uses fewer pairs than are stored).
    """
    L = hist.s.shape[0]
    if n_valid is None:
        n_valid = hist.count
    n_use = jnp.minimum(n_valid, hist.count)

    q0 = grad
    alphas0 = jnp.zeros((L,), grad.dtype)

    def loop1(k, carry):
        q, alphas = carry
        slot = (hist.head - 1 - k) % L
        valid = k < n_use
        alpha = jnp.where(valid, hist.beta[slot] * jnp.vdot(hist.s[slot], q), 0.0)
        q = q - alpha * hist.y[slot]
        return q, alphas.at[slot].set(alpha)

    q, alphas = jax.lax.fori_loop(0, L, loop1, (q0, alphas0))

    def loop2(k, q):
        # oldest -> newest among the valid pairs
        kk = n_use - 1 - k
        slot = (hist.head - 1 - kk) % L
        valid = k < n_use
        w = jnp.where(
            valid, alphas[slot] - hist.beta[slot] * jnp.vdot(hist.y[slot], q), 0.0
        )
        return q + w * hist.s[slot]

    q = jax.lax.fori_loop(0, L, loop2, q)
    D = -q

    # fallback: if <D, grad> >= 0 use steepest descent
    descent = jnp.vdot(D, grad) < 0.0
    use_lbfgs = (n_use > 0) & descent
    return jnp.where(use_lbfgs, D, -grad)
