"""HALLaR-class spectraplex solver (TPU-native).

Solves   min <C, X>   s.t.  A(X) = b,  tr(X) <= tau,  X >= 0
through the low-rank factorization X = YY^T with ||Y||_F^2 <= tau, using an
inexact augmented Lagrangian outer loop whose subproblems are minimized by a
monotone FISTA with adaptive backtracking (ADAP-FISTA class) over the
Frobenius ball, plus a Frank-Wolfe-style *escape step*: at an inner
stationary point the minimum eigenvector of the gradient matrix
S = C + A*(p + beta (A(X) - b)) is appended as a new column when
lambda_min(S) is sufficiently negative (rank grows by one — a recompile,
like the ALM solver's rank buckets).

Behavioral reference: the HALLaR Python prototype
(``hallar/py/main.py:67-214`` — AL loop, multiplier update
p += beta (A(YY^T) - b), stop on ||A(X) - b|| < eps_p;
``hallar/py/hlr.py:12-228`` — escape direction from the minimum eigenvector)
and the binary's documented parameters (``hallar/src/README.md:147-193``).
The dual certificate theta~ = max(-lambda_min(C + A*(p)), 0) bounds the
duality gap (``hallar/py/main.py:48-54``); with this module's multiplier
convention p <- p + beta (A(X) - b) the dual value is
dval = -b'p - tau * theta~ (the prototype's q is this p negated).

The inner FISTA is one fused ``lax.while_loop`` per dispatch.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.lanczos import lanczos_min_eig_vec


@dataclasses.dataclass(frozen=True)
class HallarParams:
    """Defaults follow the binary's option table (README:147-193)."""

    maxiter_hallar: int = 10000
    maxiter_fista: int = 10000
    eps_pfeas: float = 1e-5
    eps_gap: float = 1e-5
    beta0: float = 10.0
    beta_inc: float = 1.1
    beta_min: float = 10.0
    beta_max: float = 1e11
    L0_fista: float = 1.0
    L_inc_fista: float = 2.0
    err_tol_fista: float = 1e-8
    escape_tol: float = 1e-6
    max_rank: int = 0            # 0 -> ceil(sqrt(2 m)) + 1
    init_rank: int = 2
    time_limit: float = 3600.0
    lanczos_iters: int = 80
    dtype: str = "float64"
    # inner AL subproblem solver: "fista" (ADAP-FISTA, default) or "aipp"
    # (ADAP-AIPP: prox-point outer loop with lambda halving, each prox
    # subproblem solved by the same fused projected FISTA; reference
    # hallar/src/README.md:147-193 option table + hallar/py/hlr.py:147-191
    # prototype semantics)
    inner_solver: str = "fista"
    aipp_lambda0: float = 1.0
    aipp_max_prox: int = 30
    aipp_rho: float = 1e-6       # prox-residual stop ||W_{j-1}-W_j||/lam


@dataclasses.dataclass
class SpectraplexProblem:
    """min <C,X> s.t. A(X) = b, tr X <= tau, X >= 0 (single block).

    C and the A_i are symmetric COO stacks (upper triangle), like the
    LoRADS-path cones.
    """

    n: int
    m: int
    b: np.ndarray
    tau: float
    c_rows: np.ndarray
    c_cols: np.ndarray
    c_vals: np.ndarray
    a_rows: np.ndarray
    a_cols: np.ndarray
    a_vals: np.ndarray
    a_cid: np.ndarray

    @staticmethod
    def from_hslr(path: str) -> "SpectraplexProblem":
        from ..io.hslr import read_hslr

        return SpectraplexProblem.from_hslr_data(read_hslr(path))

    @staticmethod
    def from_hslr_data(data, tau: Optional[float] = None
                       ) -> "SpectraplexProblem":
        """Build from an :class:`~..io.hslr.HSLRData` (read_hslr /
        read_hybrid_sdpa); ``tau`` overrides the file's trace bound (the
        hybrid SDPA variant carries none)."""
        rows, cols, vals, cid = [], [], [], []
        for i, M in enumerate(data.A):
            D = M.dense()
            r, c = np.nonzero(np.triu(D))
            rows.append(r)
            cols.append(c)
            vals.append(D[r, c])
            cid.append(np.full(r.size, i))
        Cd = data.C.dense()
        cr, cc = np.nonzero(np.triu(Cd))
        tau_eff = data.tau if tau is None else tau
        if not np.isfinite(tau_eff):
            raise ValueError("trace bound required (file carries none)")
        return SpectraplexProblem(
            n=data.n, m=data.m, b=data.b, tau=tau_eff,
            c_rows=cr.astype(np.int32), c_cols=cc.astype(np.int32),
            c_vals=Cd[cr, cc],
            a_rows=np.concatenate(rows).astype(np.int32),
            a_cols=np.concatenate(cols).astype(np.int32),
            a_vals=np.concatenate(vals),
            a_cid=np.concatenate(cid).astype(np.int32),
        )

    @staticmethod
    def from_sdp_problem(prob, tau: float) -> "SpectraplexProblem":
        """Adapt a single-block canonical SDPProblem + trace bound."""
        cone = prob.cones[0]
        return SpectraplexProblem(
            n=cone.n, m=prob.m, b=prob.b, tau=tau,
            c_rows=cone.c_rows, c_cols=cone.c_cols, c_vals=cone.c_vals,
            a_rows=cone.a_rows, a_cols=cone.a_cols, a_vals=cone.a_vals,
            a_cid=cone.a_cid,
        )


@dataclasses.dataclass
class HallarResult:
    Y: np.ndarray
    p: np.ndarray            # dual vector
    theta: float             # dual of the trace constraint
    pobj: float
    dval: float
    pinf: float
    rel_gap: float
    iters: int
    final_rank: int
    solve_time: float
    converged: bool


class _Ops:
    """Fused conic operators on the single spectraplex block."""

    def __init__(self, prob: SpectraplexProblem, dtype):
        self.n = prob.n
        self.m = prob.m
        self.dtype = dtype
        self.b = jnp.asarray(prob.b, dtype)
        self.tau = float(prob.tau)
        ar, ac = prob.a_rows, prob.a_cols
        off = ar != ac
        self.a_rows = jnp.asarray(ar, jnp.int32)
        self.a_cols = jnp.asarray(ac, jnp.int32)
        self.a_dbl = jnp.asarray(np.where(off, 2.0, 1.0) * prob.a_vals, dtype)
        self.a_vals = jnp.asarray(prob.a_vals, dtype)
        self.a_off = jnp.asarray(np.where(off, prob.a_vals, 0.0), dtype)
        self.a_cid = jnp.asarray(prob.a_cid, jnp.int32)
        cr, cc = prob.c_rows, prob.c_cols
        offc = cr != cc
        self.c_rows = jnp.asarray(cr, jnp.int32)
        self.c_cols = jnp.asarray(cc, jnp.int32)
        self.c_dbl = jnp.asarray(np.where(offc, 2.0, 1.0) * prob.c_vals, dtype)
        self.c_vals = jnp.asarray(prob.c_vals, dtype)
        self.c_off = jnp.asarray(np.where(offc, prob.c_vals, 0.0), dtype)

    def AX(self, Y):
        e = jnp.sum(Y[self.a_rows] * Y[self.a_cols], axis=-1)
        return jax.ops.segment_sum(self.a_dbl * e, self.a_cid,
                                   num_segments=self.m)

    def CX(self, Y):
        return jnp.sum(self.c_dbl
                       * jnp.sum(Y[self.c_rows] * Y[self.c_cols], axis=-1))

    def SY(self, w, Y):
        """(C + A*(w)) @ Y."""
        wv = self.a_vals * w[self.a_cid]
        out = jnp.zeros_like(Y).at[self.a_rows].add(wv[:, None] * Y[self.a_cols])
        wo = self.a_off * w[self.a_cid]
        out = out.at[self.a_cols].add(wo[:, None] * Y[self.a_rows])
        out = out.at[self.c_rows].add(self.c_vals[:, None] * Y[self.c_cols])
        out = out.at[self.c_cols].add(self.c_off[:, None] * Y[self.c_rows])
        return out

    def project(self, Y):
        """Project onto the Frobenius ball ||Y||_F <= sqrt(tau)."""
        nrm = jnp.linalg.norm(Y)
        scale = jnp.minimum(1.0, jnp.sqrt(self.tau) / jnp.maximum(nrm, 1e-30))
        return Y * scale


def _make_fista(ops: _Ops, params: HallarParams):
    """Fused adaptive projected FISTA on the AL subproblem."""

    def al_val_grad(Y, p, beta):
        ax = ops.AX(Y)
        resid = ax - ops.b
        w = p + beta * resid
        val = ops.CX(Y) + jnp.vdot(p, resid) + 0.5 * beta * jnp.vdot(resid, resid)
        grad = 2.0 * ops.SY(w, Y)
        return val, grad

    def fista(Y0, p, beta, L0):
        def cond(st):
            Y, Z, tk, L, k, done = st
            return (~done) & (k < params.maxiter_fista)

        def body(st):
            Y, Z, tk, L, k, done = st
            fz, gz = al_val_grad(Z, p, beta)

            # backtracking on the projected step from Z
            def bt_cond(s):
                L, _, _ = s
                Yn = ops.project(Z - gz / L)
                fy, _ = al_val_grad(Yn, p, beta)
                diff = Yn - Z
                ub = fz + jnp.vdot(gz, diff) + 0.5 * L * jnp.vdot(diff, diff)
                return (fy > ub + 1e-12) & (L < 1e12)

            def bt_body(s):
                L, a, b = s
                return (L * params.L_inc_fista, a, b)

            L, _, _ = jax.lax.while_loop(bt_cond, bt_body, (L, 0.0, 0.0))
            Yn = ops.project(Z - gz / L)
            tn = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk))
            Zn = Yn + ((tk - 1.0) / tn) * (Yn - Y)
            # stationarity: prox-gradient mapping norm
            crit = L * jnp.linalg.norm(Yn - Z)
            done = crit <= params.err_tol_fista * (1.0 + jnp.linalg.norm(Yn))
            return (Yn, Zn, tn, jnp.maximum(L / params.L_inc_fista,
                                            params.L0_fista),
                    k + 1, done)

        st0 = (Y0, Y0, jnp.asarray(1.0, Y0.dtype),
               jnp.asarray(L0, Y0.dtype), jnp.asarray(0, jnp.int32),
               jnp.asarray(False))
        Y, Z, tk, L, k, done = jax.lax.while_loop(cond, body, st0)
        return Y, L, k

    return fista


def _make_aipp(ops: _Ops, params: HallarParams):
    """ADAP-AIPP on the AL subproblem (``inner_solver="aipp"``).

    Prox-point outer loop: each step minimizes
    ``lam * AL(Y; p, beta) + 1/2 ||Y - W||^2`` over the spectraplex ball
    with the same fused projected-FISTA machinery (the prox term makes the
    subproblem strongly convex, which is ADAP-AIPP's whole point on the
    nonconvex AL); a failed descent check halves ``lam`` and retries
    (``hallar/py/hlr.py:147-191`` prototype semantics, cleaned up); stops
    when the prox residual ``||W_prev - W||/lam`` is small.  Fully traced —
    one dispatch per (rank) signature like the FISTA path.
    """

    def al_val(Y, p, beta):
        ax = ops.AX(Y)
        resid = ax - ops.b
        return (ops.CX(Y) + jnp.vdot(p, resid)
                + 0.5 * beta * jnp.vdot(resid, resid))

    def prox_val_grad(Y, W, lam, p, beta):
        ax = ops.AX(Y)
        resid = ax - ops.b
        val = lam * (ops.CX(Y) + jnp.vdot(p, resid)
                     + 0.5 * beta * jnp.vdot(resid, resid))
        grad = lam * 2.0 * ops.SY(p + beta * resid, Y)
        diff = Y - W
        return (val + 0.5 * jnp.vdot(diff, diff), grad + diff)

    def prox_fista(Y0, W, lam, p, beta, L0):
        def cond(st):
            Y, Z, tk, L, k, done = st
            return (~done) & (k < params.maxiter_fista)

        def body(st):
            Y, Z, tk, L, k, done = st
            fz, gz = prox_val_grad(Z, W, lam, p, beta)

            def bt_cond(s):
                L, _, _ = s
                Yn = ops.project(Z - gz / L)
                fy, _ = prox_val_grad(Yn, W, lam, p, beta)
                diff = Yn - Z
                ub = fz + jnp.vdot(gz, diff) + 0.5 * L * jnp.vdot(diff, diff)
                return (fy > ub + 1e-12) & (L < 1e12)

            def bt_body(s):
                L, a, b = s
                return (L * params.L_inc_fista, a, b)

            L, _, _ = jax.lax.while_loop(bt_cond, bt_body, (L, 0.0, 0.0))
            Yn = ops.project(Z - gz / L)
            tn = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk))
            Zn = Yn + ((tk - 1.0) / tn) * (Yn - Y)
            crit = L * jnp.linalg.norm(Yn - Z)
            done = crit <= params.err_tol_fista * (1.0 + jnp.linalg.norm(Yn))
            return (Yn, Zn, tn,
                    jnp.maximum(L / params.L_inc_fista, params.L0_fista),
                    k + 1, done)

        st0 = (Y0, Y0, jnp.asarray(1.0, Y0.dtype),
               jnp.asarray(L0, Y0.dtype), jnp.asarray(0, jnp.int32),
               jnp.asarray(False))
        Y, _, _, L, k, _ = jax.lax.while_loop(cond, body, st0)
        return Y, L, k

    def aipp(Y0, p, beta, L0):
        dtype = Y0.dtype

        def cond(st):
            W, lam, L, j, total_k, done = st
            return (~done) & (j < params.aipp_max_prox)

        def body(st):
            W, lam, L, j, total_k, done = st
            Wn, Ln, k = prox_fista(W, W, lam, p, beta, L0=L)
            # descent acceptance (prototype hlr.py:174-178): the prox step
            # must not increase lam*g + 1/2||.-W||^2; a failure flags
            # local nonconvexity stronger than 1/lam -> halve lam, retry
            ok = (lam * al_val(Wn, p, beta)
                  + 0.5 * jnp.vdot(Wn - W, Wn - W)
                  <= lam * al_val(W, p, beta) + 1e-10)
            lam_n = jnp.where(ok, lam, lam * 0.5)
            W_out = jnp.where(ok, Wn, W)
            resid = jnp.linalg.norm(W_out - W) / lam
            done_n = ok & (resid <= params.aipp_rho
                           * (1.0 + jnp.linalg.norm(W_out)))
            return (W_out, lam_n, Ln, j + 1, total_k + k, done_n)

        st0 = (Y0, jnp.asarray(params.aipp_lambda0, dtype),
               jnp.asarray(L0, dtype), jnp.asarray(0, jnp.int32),
               jnp.asarray(0, jnp.int32), jnp.asarray(False))
        W, lam, L, j, total_k, done = jax.lax.while_loop(cond, body, st0)
        return W, L, total_k

    return aipp


def hallar_solve(prob: SpectraplexProblem,
                 params: Optional[HallarParams] = None,
                 Y0: Optional[np.ndarray] = None,
                 verbose: bool = False) -> HallarResult:
    params = params or HallarParams()
    dtype = jnp.dtype(params.dtype)
    ops = _Ops(prob, dtype)
    t0 = time.time()

    max_rank = params.max_rank or int(np.sqrt(2.0 * prob.m) + 1)
    max_rank = min(max_rank, prob.n)

    if Y0 is None:
        rng = np.random.default_rng(0)
        r = min(params.init_rank, max_rank)
        Y0 = rng.normal(size=(prob.n, r))
        Y0 *= np.sqrt(prob.tau) / max(np.linalg.norm(Y0), 1e-12)
    Y = jnp.asarray(Y0, dtype)
    p = jnp.zeros(prob.m, dtype)
    beta = params.beta0
    L = params.L0_fista

    fista_cache = {}

    mk_inner = (_make_aipp if params.inner_solver == "aipp"
                else _make_fista)

    def get_fista(r):
        if r not in fista_cache:
            fista_cache[r] = jax.jit(mk_inner(ops, params))
        return fista_cache[r]

    post = jax.jit(lambda Y, p, beta: (
        ops.AX(Y), ops.CX(Y), jnp.linalg.norm(Y) ** 2))

    converged = False
    pinf = np.inf
    rel_gap = np.inf
    pobj = np.inf
    dval = -np.inf
    theta = 0.0
    it = 0
    for it in range(params.maxiter_hallar):
        fista = get_fista(Y.shape[1])
        Y, L, k_inner = fista(Y, p, jnp.asarray(beta, dtype), L)
        ax, cx, ysq = post(Y, p, beta)
        resid = np.asarray(ax) - prob.b
        pinf_abs = float(np.linalg.norm(resid))
        pinf = pinf_abs / (1.0 + float(np.linalg.norm(prob.b)))
        pobj = float(cx)

        # escape direction: min eigvec of S = C + A*(p + beta resid)
        w = jnp.asarray(p) + beta * jnp.asarray(resid, dtype)

        def smv(v, w=w):
            return ops.SY(w, v[:, None])[:, 0]

        lam_esc, vmin = lanczos_min_eig_vec(
            smv, prob.n, jax.random.PRNGKey(it),
            num_iters=params.lanczos_iters, dtype=dtype)

        # dual certificate with the plain multiplier p
        def smv_p(v):
            return ops.SY(jnp.asarray(p), v[:, None])[:, 0]

        lam_p, _ = lanczos_min_eig_vec(
            smv_p, prob.n, jax.random.PRNGKey(10_000 + it),
            num_iters=params.lanczos_iters, dtype=dtype)
        theta = max(-lam_p, 0.0)
        # Lagrangian L(X,p) = <C + A*(p), X> - b.p for the multiplier
        # convention p <- p + beta (A(X) - b); minimizing over
        # {X >= 0, tr X <= tau} gives the dual value
        # -b.p - tau * max(-lambda_min(C + A*(p)), 0).
        dval = -float(np.dot(prob.b, np.asarray(p))) - prob.tau * theta
        rel_gap = abs(pobj - dval) / (1.0 + abs(pobj) + abs(dval))

        if verbose:
            print(f"hallar it {it}: pobj {pobj:.6e} dval {dval:.6e} "
                  f"pinf {pinf:.2e} gap {rel_gap:.2e} rank {Y.shape[1]} "
                  f"beta {beta:.1f} fista {int(k_inner)} lam_esc {lam_esc:.2e}")

        if pinf <= params.eps_pfeas and rel_gap <= params.eps_gap:
            converged = True
            break
        if time.time() - t0 > params.time_limit:
            break

        # rank escalation via escape direction
        slack = prob.tau - float(ysq)
        if (lam_esc < -params.escape_tol * (1.0 + abs(pobj))
                and Y.shape[1] < max_rank):
            step = np.sqrt(max(slack, 0.05 * prob.tau))
            Ynew = np.concatenate(
                [np.asarray(Y) * (1.0 if slack > 0 else np.sqrt(0.95)),
                 step * np.sqrt(0.05) * np.asarray(vmin)[:, None]], axis=1)
            Y = ops.project(jnp.asarray(Ynew, dtype))

        # multiplier + penalty updates
        p = np.asarray(p) + beta * resid
        p = jnp.asarray(p, dtype)
        beta = min(max(beta * params.beta_inc, params.beta_min),
                   params.beta_max)

    return HallarResult(
        Y=np.asarray(Y), p=np.asarray(p), theta=theta, pobj=pobj, dval=dval,
        pinf=pinf, rel_gap=rel_gap, iters=it + 1,
        final_rank=int(Y.shape[1]), solve_time=time.time() - t0,
        converged=converged,
    )


def build_mss_problem(edges: List[Tuple[int, int]], n: int
                      ) -> SpectraplexProblem:
    """Maximum stable set SDP (HALLaR prototype's example family,
    ``hallar/py/MSS_SDP.py``):  max <ee^T, X>  s.t. X_ij = 0 for edges,
    tr X = 1  ->  min <-ee^T, X>, A(X) = 0, tau = 1."""
    E = len(edges)
    a_rows = np.array([min(e) for e in edges], np.int32)
    a_cols = np.array([max(e) for e in edges], np.int32)
    iu = np.triu_indices(n)
    return SpectraplexProblem(
        n=n, m=E, b=np.zeros(E), tau=1.0,
        c_rows=iu[0].astype(np.int32), c_cols=iu[1].astype(np.int32),
        c_vals=-np.ones(iu[0].size),
        a_rows=a_rows, a_cols=a_cols, a_vals=np.ones(E),
        a_cid=np.arange(E, dtype=np.int32),
    )
