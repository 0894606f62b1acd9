"""Phase I: augmented Lagrangian method on X = RR^T — fully fused on device.

TPU-first re-design of ``LORADS_ALMOptimize`` / ``LORADS_ALMOptimize_reopt``
(``lorads_alm.c:959-1484``).  The entire outer iteration — the EMA stall
gate, the difficulty sub-loop wrapping the L-BFGS inner descent loop (exact
quartic line search via in-graph Cardano roots), the dual update, difficulty
grading, the rho-escalation do-while with its certificate recheck, rho-factor
dampening, and the DIMACS metric computation — compiles into ONE XLA
executable; the host dispatches once per outer iteration and only handles
trajectory recording, rank escalation (a shape change -> new executable) and
wall-clock limits.  This matters doubly under a remote-TPU tunnel where every
dispatch costs ~100 ms.

Control-law semantics are kept faithful to the reference, with scalar state
carried through ``lax.while_loop`` instead of C locals:

* EMA gate: alpha 0.1, threshold 0.005, interval 5 (``LUtilUpdateCheckEma``);
* difficulty grading EASY<=20<MEDIUM<=100<HARD<400<=SUPER accumulating
  rank_flag 0/2/3/4 (``:1383-1400``);
* MAX_ALM_SUB_ITER 5000 -> +10000 -> cap 25000 on repeated exhaustion;
* rho do-while: rho *= factor until certificate tolerance drops below the
  certificate value, factor dampened (sqrt(sqrt())) past 5e4/5e6/5e8;
* inner-loop caps: 800 per sub-loop pass; L-BFGS restart every 300 steps.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverParams
from ..ops.compsum import cvdot
from ..ops.cubic import quartic_linesearch
from ..ops import lbfgs as lbfgs_mod
from . import interrupt
from .common import (
    ProblemConsts,
    alm_gradient,
    flatten_factors,
    primal_infeas_l1,
    unflatten_factors,
)

EASY, MEDIUM, HARD, SUPER = 0, 1, 2, 3

# outer-step exit codes
CODE_CONTINUE = 0
CODE_CONVERGED = 1
CODE_NUM_ERR = 2
CODE_ESCALATE = 3
CODE_MAXITER = 4
CODE_YIELD = 5        # per-dispatch work budget exhausted; host re-dispatches

# Per-dispatch device-work budget in FLOPs.  A single fused dispatch must
# stay a few seconds long: very long dispatches cannot be interrupted for
# wall-clock limits and have been observed to trip remote-TPU (tunnel)
# RPC deadlines, surfacing as worker crashes on big instances.
DISPATCH_FLOP_BUDGET = 4e10


class ALMCarry(NamedTuple):
    R: Tuple[jnp.ndarray, ...]
    rlp: Optional[jnp.ndarray]
    dual: jnp.ndarray
    constr_sum: jnp.ndarray
    CR: Tuple[jnp.ndarray, ...]  # C @ R_k per cone, maintained incrementally
    grad: Tuple[jnp.ndarray, ...]
    grad_lp: Optional[jnp.ndarray]
    hist: lbfgs_mod.LBFGSHistory
    rho: jnp.ndarray
    obj_scale: jnp.ndarray       # scaleObjHis: C enters as obj_scale * C
    cert_val: jnp.ndarray
    cert_tol: jnp.ndarray
    pinf_l1: jnp.ndarray
    pinf_inf: jnp.ndarray
    gap: jnp.ndarray
    pobj: jnp.ndarray
    dobj: jnp.ndarray


class OuterCtrl(NamedTuple):
    """Scalar control state of the ALM outer loop (all traced)."""

    k: jnp.ndarray                  # outer iteration counter
    k0: jnp.ndarray
    last_outer_start: jnp.ndarray
    rank_flag: jnp.ndarray          # i32
    ema_cur: jnp.ndarray
    ema_old: jnp.ndarray
    ema_counter: jnp.ndarray
    cur_iter_counter: jnp.ndarray
    max_sub_iter: jnp.ndarray
    update_max_sub_counter: jnp.ndarray
    rho_update_factor: jnp.ndarray
    rho_factor_flag: jnp.ndarray
    inner_total: jnp.ndarray        # cumulative inner iterations
    code: jnp.ndarray               # exit code (CODE_*)
    resuming: jnp.ndarray           # i32: mid-outer-iteration resume (YIELD)
    budget_start: jnp.ndarray      # inner_total at dispatch entry
    best_pinf_inf: jnp.ndarray     # f32-floor detector: best l_inf so far
    p1_stall: jnp.ndarray          # i32: consecutive outers with <5% gain
    min_k: jnp.ndarray             # i32: no phase-1 exit before outer k
                                   # (forces real re-optimization after a
                                   # binding-rank escalation)


class PassStats(NamedTuple):
    local_iter: jnp.ndarray
    num_err: jnp.ndarray
    tau_small: jnp.ndarray
    early_exit: jnp.ndarray


@dataclasses.dataclass
class ALMOuterInfo:
    """Host-side summary after an ALM run.

    The scalar metric fields mirror the device carry at the last processed
    stats row; they let the driver make control decisions (handoff rho,
    reopt entry) without extra device->host syncs.  ``None`` means no row
    was processed (immediate MAXITER exit) — callers fall back to a fetch.
    """

    outer_iter: int = 0
    inner_iter: int = 0
    rank_flag: int = 0
    num_err: bool = False
    time_limit: bool = False
    interrupted: bool = False
    converged: bool = False
    escalate: bool = False          # rank-escalation request (CODE_ESCALATE)
    pobj: Optional[float] = None
    dobj: Optional[float] = None
    pinf_l1: Optional[float] = None
    pinf_inf: Optional[float] = None
    gap: Optional[float] = None
    rho: Optional[float] = None
    grams: Optional[list] = None    # R^T R per cone at the last stats row


def make_outer_ctrl(params: SolverParams, outer_iter: int,
                    last_outer_start: int, rho_update_factor: float,
                    inner_total: int = 0, dtype=jnp.float64,
                    min_k: int = 0) -> OuterCtrl:
    # numpy scalars: passed as jit ARGUMENTS they cost one host->device
    # transfer; jnp.asarray would instead bake each distinct VALUE into a
    # fresh one-op XLA program (a ~0.4s compile per new rho through the
    # remote-TPU tunnel, and these never persist in the compile cache)
    i32 = lambda v: np.asarray(v, np.int32)
    f = lambda v: np.asarray(v, jnp.dtype(dtype))
    return OuterCtrl(
        k=i32(outer_iter), k0=i32(outer_iter),
        last_outer_start=i32(last_outer_start),
        rank_flag=i32(0),
        ema_cur=f(0.0), ema_old=f(0.0), ema_counter=i32(1),
        cur_iter_counter=i32(1),
        max_sub_iter=i32(5000), update_max_sub_counter=i32(0),
        rho_update_factor=f(rho_update_factor), rho_factor_flag=i32(0),
        inner_total=i32(inner_total), code=i32(CODE_CONTINUE),
        resuming=i32(0), budget_start=i32(inner_total),
        best_pinf_inf=f(jnp.inf), p1_stall=i32(0), min_k=i32(min_k),
    )


class ALMPhase:
    """Compiled ALM phase for a fixed rank signature."""

    def __init__(self, cones, lp, b, consts: ProblemConsts,
                 params: SolverParams, shapes, n_lp: int):
        self.cones = cones
        self.lp = lp
        self.b = b
        self.consts = consts
        self.params = params
        self.shapes = tuple(tuple(s) for s in shapes)
        self.n_lp = n_lp
        self.has_lp = n_lp > 0
        self.n_elems = int(sum(np.prod(s) for s in shapes)) + n_lp
        # f32-only phase-1 over-tightness guard (see _inner_pass)
        self._p1_guard = jnp.dtype(b.dtype) == jnp.float32

        # per-dispatch inner-iteration budget from a FLOP estimate of one
        # inner descent step (3x constraint evaluations + 1 gradient apply)
        work = 1.0
        for ops, (n, r) in zip(cones, self.shapes):
            work += 3.0 * ops.constr_flops(r) + ops.apply_flops(r)
        self.inner_budget = int(
            min(max(DISPATCH_FLOP_BUDGET / work, 64), 200_000))
        self.inner_pass_cap = int(min(800, self.inner_budget))

        self._grad_cert_j = jax.jit(self._grad_cert)
        self._metrics_j = jax.jit(self._metrics)
        self._prepare_j = jax.jit(self._prepare_graph)
        self._outer_step_cache = {}

    def _phase_step_j(self, mode: str, early_stop: bool, is_rank_max: bool,
                      rank_thresh: float, max_alm_iter: int,
                      max_outer: int = 25):
        key = (mode, early_stop, is_rank_max, rank_thresh, max_alm_iter,
               max_outer)
        if key not in self._outer_step_cache:
            self._outer_step_cache[key] = jax.jit(partial(
                self._phase_step, mode=mode, early_stop=early_stop,
                is_rank_max=is_rank_max, rank_thresh=rank_thresh,
                max_alm_iter=max_alm_iter, max_outer=max_outer,
            ))
        return self._outer_step_cache[key]

    # ------------------------------------------------------------------ #
    # traced pieces
    # ------------------------------------------------------------------ #

    def _obj_and_constr(self, U, V, ulp, vlp):
        if self.has_lp:
            o = self.lp.obj_value(ulp, vlp)
            c = self.lp.constr_vals(ulp, vlp)
        else:
            o = jnp.asarray(0.0, self.b.dtype)
            c = jnp.zeros_like(self.b)
        for ops, u, v in zip(self.cones, U, V):
            o = o + ops.obj_value(u, v)
            c = c + ops.constr_vals(u, v)
        return o, c

    def _constr_only(self, U, V, ulp, vlp):
        if self.has_lp:
            c = self.lp.constr_vals(ulp, vlp)
        else:
            c = jnp.zeros_like(self.b)
        for ops, u, v in zip(self.cones, U, V):
            c = c + ops.constr_vals(u, v)
        return c

    def _grad_cert(self, carry: ALMCarry) -> ALMCarry:
        grads, grad_lp, gsq = alm_gradient(
            self.cones, self.lp, carry.R, carry.rlp, carry.dual,
            carry.constr_sum, self.b, carry.rho, carry.obj_scale,
            CR=carry.CR,
        )
        cert = jnp.sqrt(gsq) / (1.0 + self.consts.c_nrminf)
        return carry._replace(grad=grads, grad_lp=grad_lp, cert_val=cert)

    def _dual_and_grad(self, carry: ALMCarry) -> ALMCarry:
        dual = carry.dual + carry.rho * (self.b - carry.constr_sum)
        return self._grad_cert(carry._replace(dual=dual))

    def _metrics(self, carry: ALMCarry) -> ALMCarry:
        """Fresh objective / constraint values / DIMACS errors.

        Reporting is in the original objective: pObj = <C, X>,
        dObj = b'lambda / obj_scale (cf. ``objScale_dualvar``)."""
        obj, cvals = self._obj_and_constr(carry.R, carry.R, carry.rlp,
                                          carry.rlp)
        pobj = obj
        dobj = cvdot(self.b, carry.dual) / carry.obj_scale
        pinf = primal_infeas_l1(cvals, self.b, self.consts.b_nrm1)
        gap = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
        pinf_inf = pinf * (1.0 + self.consts.b_nrm1) / (
            1.0 + self.consts.b_nrminf)
        return carry._replace(
            constr_sum=cvals, pobj=pobj, dobj=dobj, pinf_l1=pinf,
            pinf_inf=pinf_inf, gap=gap,
        )

    def _prepare_graph(self, carry: ALMCarry) -> ALMCarry:
        carry = self._metrics(carry)
        CR = tuple(ops.apply_c(r) for ops, r in zip(self.cones, carry.R))
        carry = carry._replace(cert_tol=0.1 / carry.rho, CR=CR)
        return self._grad_cert(carry)

    # ---------------- inner descent loop (one sub-loop pass) ----------- #

    def _inner_pass(self, carry: ALMCarry, early_variant: bool,
                    p1_floor=False, allow_early=True):
        p = self.params
        dtype = self.b.dtype
        st0 = (
            carry,
            jnp.asarray(0, jnp.int32),     # local_iter
            jnp.asarray(0, jnp.int32),     # clear count
            jnp.asarray(False),            # num_err
            jnp.asarray(False),            # tau_small
            jnp.asarray(False),            # early_exit
        )

        def cond(st):
            c, local_iter, clear, num_err, tau_small, early = st
            return (
                (c.cert_val - c.cert_tol > p.end_alm_sub_tol)
                & (local_iter <= self.inner_pass_cap)
                & ~(num_err | tau_small | early)
            )

        def body(st):
            c, local_iter, clear, num_err, tau_small, early = st
            clear = jnp.where(local_iter % 300 == 0, 0, clear)
            grad_flat = flatten_factors(c.grad, c.grad_lp)
            D_flat = lbfgs_mod.direction(c.hist, grad_flat, n_valid=clear)
            # normalize the direction so the quartic coefficients (which
            # scale as ||D||^4) stay inside float32 range; the search
            # interval [0, ||D||] keeps the math identical to the
            # reference's unnormalized [0, 1] search
            d_nrm = jnp.linalg.norm(D_flat)
            d_safe = jnp.where(d_nrm > 0.0, d_nrm, 1.0)
            D_flat = D_flat / d_safe
            D, dlp = unflatten_factors(D_flat, self.shapes, self.has_lp)

            q0 = self.b - c.constr_sum
            # ONE C·D per cone yields both objective line-search terms
            # (<C,sym(RDᵀ)> = <R,C·D>, <C,sym(DDᵀ)> = <D,C·D> for symmetric
            # C) and the incremental CR update below — no per-entry
            # objective gathers on the inner path.
            CD = tuple(ops.apply_c(d) for ops, d in zip(self.cones, D))
            oRD = sum((jnp.vdot(r, cd) for r, cd in zip(c.R, CD)),
                      jnp.asarray(0.0, dtype))
            oDD = sum((jnp.vdot(d, cd) for d, cd in zip(D, CD)),
                      jnp.asarray(0.0, dtype))
            if self.has_lp:
                oRD = oRD + self.lp.obj_value(c.rlp, dlp)
                oDD = oDD + self.lp.obj_value(dlp, dlp)
                q1 = 2.0 * self.lp.constr_vals(c.rlp, dlp)
                q2 = self.lp.constr_vals(dlp, dlp)
            else:
                q1 = jnp.zeros_like(self.b)
                q2 = jnp.zeros_like(self.b)
            for ops, r, d in zip(self.cones, c.R, D):
                # fused pair: shared R/D gathers + one batched segment sum
                rd2, dd = ops.constr_vals_pair(r, d)
                q1 = q1 + rd2
                q2 = q2 + dd
            p1 = 2.0 * oRD * c.obj_scale
            p2 = oDD * c.obj_scale

            tau, root_num = quartic_linesearch(
                c.rho, c.dual, p1, p2, q0, q1, q2, tau_max=d_nrm)
            num_err = root_num == 0
            # tau is in normalized-direction units; the reference's
            # step-too-small test is on the unnormalized step tau/||D||
            tau_small = (~num_err) & (
                jnp.abs(tau) < p.end_tau_tol * d_safe)
            do_update = ~(num_err | tau_small)
            tau_eff = jnp.where(do_update, tau, 0.0)

            R_new = tuple(r + tau_eff * d for r, d in zip(c.R, D))
            rlp_new = c.rlp + tau_eff * dlp if self.has_lp else None

            # cheap exact constraint update A((R+tD)(R+tD)^T) =
            # A(RR^T) + t*q1 + t^2*q2 (reference lorads_alm.c:1351-1353) —
            # q1/q2 were already computed for the line search; a periodic
            # fresh recompute bounds float32 accumulation drift
            cvals_cheap = (c.constr_sum + tau_eff * q1
                           + (tau_eff * tau_eff) * q2)
            refresh = (local_iter % p.constr_refresh_every
                       ) == p.constr_refresh_every - 1
            cvals = jax.lax.cond(
                refresh,
                lambda _: self._constr_only(R_new, R_new, rlp_new, rlp_new),
                lambda _: cvals_cheap, None)

            # incremental C·R update rides the same drift-bounding refresh
            CR_new = jax.lax.cond(
                refresh,
                lambda _: tuple(ops.apply_c(r)
                                for ops, r in zip(self.cones, R_new)),
                lambda _: tuple(cr + tau_eff * cd
                                for cr, cd in zip(c.CR, CD)), None)

            grads, grad_lp, gsq = alm_gradient(
                self.cones, self.lp, R_new, rlp_new, c.dual, cvals, self.b,
                c.rho, c.obj_scale, CR=CR_new,
            )
            cert = jnp.sqrt(gsq) / (1.0 + self.consts.c_nrminf)
            grad_flat_new = flatten_factors(grads, grad_lp)
            hist = lbfgs_mod.push_pair(
                c.hist, tau_eff * D_flat, grad_flat_new - grad_flat)

            pinf = primal_infeas_l1(cvals, self.b, self.consts.b_nrm1)
            pinf_inf = pinf * (1.0 + self.consts.b_nrm1) / (
                1.0 + self.consts.b_nrminf)
            if not early_variant:
                # main-phase early exit inside the inner loop
                # (lorads_alm.c:1344-1357); gap is the stale outer value.
                # The pinf_l1 <= phase2Tol alternative (f32 compute only)
                # guards against an over-tight phase 1: the reference's
                # "l_inf" is pinf_l1*(1+|b|_1)/(1+|b|_inf), and when the
                # norm ratio is skewed (shmup4: 400x) the phase-1 bar
                # lands at or below the f32 optimization floor.  The
                # alternative only fires once ``p1_floor`` certifies a
                # REAL floor (l_inf stopped improving across rho
                # escalations): exiting the moment pinf_l1 meets the
                # final tolerance hands ADMM a rho far below the
                # reference's, which destabilizes the U/V proximal
                # solves (checker_1.5 diverged exactly this way).
                early = ((pinf_inf <= p.phase1_tol)
                         | (self._p1_guard & p1_floor
                            & (pinf <= p.phase2_tol))) & (
                    (c.gap <= p.phase1_tol) | (not p.high_acc_mode)
                ) & allow_early
            else:
                early = jnp.asarray(False)
            early = early & do_update

            c = c._replace(
                R=R_new, rlp=rlp_new, constr_sum=cvals, CR=CR_new,
                grad=grads, grad_lp=grad_lp, hist=hist, cert_val=cert,
                pinf_l1=pinf, pinf_inf=pinf_inf,
            )
            return (c, local_iter + 1, clear + 1, num_err, tau_small, early)

        carry, local_iter, clear, num_err, tau_small, early = (
            jax.lax.while_loop(cond, body, st0))

        # dual update + gradient refresh only on natural loop exit
        do_dual = ~(num_err | tau_small | early)
        carry = jax.lax.cond(do_dual, self._dual_and_grad, lambda c: c, carry)

        return carry, PassStats(
            local_iter=local_iter, num_err=num_err, tau_small=tau_small,
            early_exit=early,
        )

    # ---------------- fused outer iteration ---------------------------- #

    def _outer_step(self, carry: ALMCarry, ctrl: OuterCtrl, *, mode: str,
                    early_stop: bool, is_rank_max: bool, rank_thresh: float,
                    max_alm_iter: int):
        p = self.params
        dtype = self.b.dtype
        early_variant = (mode == "reopt")

        # --- outer loop-head bound checks ---
        if mode == "main":
            head_done = ctrl.k > max_alm_iter
        else:
            cond_ok = ((carry.pinf_inf <= p.phase1_tol)
                       | (self._p1_guard
                          & (carry.pinf_l1 <= p.phase2_tol))) & (
                (carry.gap <= max(p.phase1_tol, p.phase2_tol * 5))
                | (not p.high_acc_mode))
            head_done = ((ctrl.k > max_alm_iter) & cond_ok) | (
                ctrl.k > max_alm_iter + 50)

        def run_outer(args):
            carry, ctrl = args
            # per-outer-iteration resets (lorads_alm.c:1011-1018) — skipped
            # when resuming a budget-yielded sub-loop mid-iteration
            fresh = ctrl.resuming == 0
            grow = fresh & (ctrl.update_max_sub_counter >= 2)
            ctrl = ctrl._replace(
                ema_cur=jnp.where(fresh, 0.0, ctrl.ema_cur).astype(dtype),
                ema_old=jnp.where(fresh, 0.0, ctrl.ema_old).astype(dtype),
                ema_counter=jnp.where(fresh, 1, ctrl.ema_counter)
                .astype(jnp.int32),
                cur_iter_counter=jnp.where(fresh, 1, ctrl.cur_iter_counter)
                .astype(jnp.int32),
                max_sub_iter=jnp.where(
                    grow, jnp.minimum(ctrl.max_sub_iter + 10000, 25000),
                    ctrl.max_sub_iter),
                update_max_sub_counter=jnp.where(
                    grow, 0, ctrl.update_max_sub_counter),
                resuming=jnp.asarray(0, jnp.int32),
            )

            # ---- difficulty sub-loop ----
            def sub_cond(st):
                carry, ctrl, cont = st
                return cont & (ctrl.code == CODE_CONTINUE)

            def sub_body(st):
                carry, ctrl, cont = st
                # per-dispatch work budget: yield back to the host (which
                # simply re-dispatches) instead of running unboundedly
                budget_hit = (
                    ctrl.inner_total - ctrl.budget_start
                    >= self.inner_budget)
                return jax.lax.cond(
                    budget_hit, self._sub_yield,
                    partial(self._sub_normal, early_variant=early_variant,
                            rank_thresh=rank_thresh,
                            is_rank_max=is_rank_max),
                    (carry, ctrl))

            carry, ctrl, _ = jax.lax.while_loop(
                sub_cond, sub_body, (carry, ctrl, jnp.asarray(True)))
            return self._outer_tail(carry, ctrl, mode=mode,
                                    early_stop=early_stop,
                                    is_rank_max=is_rank_max,
                                    rank_thresh=rank_thresh)

        def head_exit(args):
            carry, ctrl = args
            ctrl = ctrl._replace(code=jnp.asarray(CODE_MAXITER, jnp.int32))
            return carry, ctrl

        carry, ctrl = jax.lax.cond(head_done, head_exit, run_outer,
                                   (carry, ctrl))
        return carry, ctrl

    @staticmethod
    def _sub_yield(args):
        carry, ctrl = args
        ctrl = ctrl._replace(
            code=jnp.asarray(CODE_YIELD, jnp.int32),
            resuming=jnp.asarray(1, jnp.int32))
        return carry, ctrl, jnp.asarray(False)

    def _sub_normal(self, args, *, early_variant, rank_thresh, is_rank_max):
        """One difficulty-sub-loop pass: EMA gate, stop checks, inner loop."""
        carry, ctrl = args
        p = self.params
        # EMA stall gate
        ema_cur = 0.1 * carry.cert_val + 0.9 * ctrl.ema_cur
        do_check = ctrl.ema_counter >= 5
        safe_old = jnp.where(ctrl.ema_old != 0.0, ctrl.ema_old, 1.0)
        change = (ema_cur - ctrl.ema_old) / safe_old
        within = (change >= -0.005) & (change <= 0.005)
        if_break = jnp.where(do_check & (ctrl.ema_old != 0.0),
                             within, True)
        ctrl = ctrl._replace(
            ema_cur=ema_cur,
            ema_old=jnp.where(do_check, ema_cur, ctrl.ema_old),
            ema_counter=jnp.where(do_check, 1, ctrl.ema_counter + 1),
        )
        stop_ema = (~if_break) & (not p.high_acc_mode)
        stop_iters = ctrl.cur_iter_counter >= ctrl.max_sub_iter
        stop_rank = (
            (ctrl.rank_flag >= rank_thresh)
            & (not is_rank_max)
            & (ctrl.k - ctrl.last_outer_start >= 3)
        )
        stop_cert = carry.cert_val <= carry.cert_tol
        stop = stop_ema | stop_iters | stop_rank | stop_cert
        ctrl = ctrl._replace(
            update_max_sub_counter=ctrl.update_max_sub_counter
            + stop_iters.astype(jnp.int32))

        def run_inner(args):
            carry, ctrl = args
            carry, stats = self._inner_pass(
                carry, early_variant, p1_floor=ctrl.p1_stall >= 3,
                allow_early=ctrl.k >= ctrl.min_k)
            local = stats.local_iter
            ctrl = ctrl._replace(
                cur_iter_counter=ctrl.cur_iter_counter + local,
                inner_total=ctrl.inner_total + local,
            )
            code = jnp.where(
                stats.num_err, CODE_NUM_ERR,
                jnp.where(stats.early_exit, CODE_CONVERGED,
                          CODE_CONTINUE)).astype(jnp.int32)
            ctrl = ctrl._replace(code=jnp.where(
                ctrl.code == CODE_CONTINUE, code, ctrl.code))
            # A tau-too-small exit is ungraded in the reference (goto
            # UpdateRho, lorads_alm.c:1066-1073) — in f64 it essentially
            # never fires, but in f32 the quartic line search routinely
            # collapses to tau ~ 0 (noise-dominated coefficients), and
            # leaving those passes fully ungraded froze rank_flag just
            # below the escalation threshold on theta102 (stuck at 12 <
            # 15 forever at rank 13 while the reference escalated to
            # 153).  f32 adaptation: grade a tau-small pass by the SAME
            # local-iteration brackets as a completed pass — a long
            # grind ending in a dead step accumulates difficulty — but
            # never let it RESET the flag (a quick tau-small exit is
            # normal f32 convergence at the current rho, not "easy").
            tau_stall = stats.tau_small & self._p1_guard
            graded = ~(stats.num_err | stats.early_exit
                       | (stats.tau_small & ~tau_stall))
            easy = (local <= 20) & ~tau_stall
            add = jnp.where(
                local <= 20, 0,
                jnp.where(local <= 100, 2,
                          jnp.where(local < 400, 3, 4)))
            new_flag = jnp.where(
                graded & easy, 0,
                ctrl.rank_flag + jnp.where(graded, add, 0))
            ctrl = ctrl._replace(rank_flag=new_flag.astype(jnp.int32))
            # tau_stall still ends the difficulty loop (reference goto)
            cont = graded & (~easy) & ~tau_stall
            return carry, ctrl, cont

        carry, ctrl, cont = jax.lax.cond(
            stop,
            lambda a: (a[0], a[1], jnp.asarray(False)),
            run_inner,
            (carry, ctrl),
        )
        return carry, ctrl, cont

    def _outer_tail(self, carry: ALMCarry, ctrl: OuterCtrl, *, mode: str,
                    early_stop: bool, is_rank_max: bool, rank_thresh: float):
        """Post-sub-loop work of one outer iteration: UpdateRho do-while,
        metrics, convergence/escalation codes.  Skipped entirely on a
        budget YIELD (the host re-dispatches mid-iteration)."""
        p = self.params

        def yield_path(args):
            return args

        def finish(args):
            carry, ctrl = args

            # ---- UpdateRho do-while (skip on num_err / converged) ----
            def update_rho(args):
                carry, ctrl = args

                def rho_once(carry):
                    new_rho = jnp.minimum(
                        carry.rho * ctrl.rho_update_factor,
                        p.rho_ceiling_alm)
                    carry = carry._replace(
                        rho=new_rho, cert_tol=0.1 / new_rho)
                    return self._grad_cert(carry)

                carry = rho_once(carry)

                def rho_cond(carry):
                    return (carry.cert_tol >= carry.cert_val) & (
                        carry.rho < p.rho_ceiling_alm)

                carry = jax.lax.while_loop(rho_cond, rho_once, carry)

                # factor dampening (lorads_alm.c:1410-1419)
                f = ctrl.rho_update_factor
                flag = ctrl.rho_factor_flag
                c4 = (carry.rho >= 5e4) & (flag < 4)
                c6 = (~c4) & (carry.rho >= 5e6) & (flag < 6)
                c8 = (~c4) & (~c6) & (carry.rho >= 5e8) & (flag < 8)
                damp = c4 | c6 | c8
                f = jnp.where(damp, jnp.sqrt(jnp.sqrt(f)), f)
                flag = jnp.where(c4, 4, jnp.where(c6, 6,
                                                  jnp.where(c8, 8, flag)))
                ctrl = ctrl._replace(rho_update_factor=f,
                                     rho_factor_flag=flag.astype(jnp.int32))
                return carry, ctrl

            carry, ctrl = jax.lax.cond(
                ctrl.code == CODE_CONTINUE, update_rho,
                lambda a: a, (carry, ctrl))

            ctrl = ctrl._replace(k=ctrl.k + 1)

            # ---- metrics + convergence / escalation codes ----
            carry = self._metrics(carry)

            # f32-floor tracking: an outer iteration that escalated rho
            # but failed to improve l_inf-infeasibility by >=5% counts
            # toward the floor; three in a row certify that the phase-1
            # bar is unreachable at this precision (see _inner_pass)
            improved = carry.pinf_inf <= 0.95 * ctrl.best_pinf_inf
            ctrl = ctrl._replace(
                p1_stall=jnp.where(improved, 0, ctrl.p1_stall + 1)
                .astype(jnp.int32),
                best_pinf_inf=jnp.minimum(ctrl.best_pinf_inf,
                                          carry.pinf_inf))

            def exit_code(carry, ctrl):
                code = ctrl.code
                if mode == "main":
                    # pinf_l1 alternative (f32 only, floor-gated): see
                    # the over-tight-phase-1 note in _inner_pass
                    conv = ((carry.pinf_inf <= p.phase1_tol)
                            | (self._p1_guard & (ctrl.p1_stall >= 3)
                               & (carry.pinf_l1 <= p.phase2_tol))) & (
                        (carry.gap <= p.phase1_tol) | (not p.high_acc_mode)
                    ) & (ctrl.k >= ctrl.min_k)
                    conv = conv | (
                        (carry.gap <= p.phase1_tol * 1e-3)
                        & (carry.pinf_l1 <= p.phase1_tol * 1e-3))
                else:
                    if early_stop:
                        conv = (
                            (carry.pinf_l1 <= p.phase1_tol)
                            & (carry.gap <= max(p.phase1_tol,
                                                p.phase2_tol * 5))
                            & (ctrl.k - ctrl.k0 > 1))
                    else:
                        conv = (
                            (carry.gap <= p.phase2_tol)
                            & (carry.pinf_l1 <= p.phase2_tol)
                            & (ctrl.k - ctrl.k0 > 1))
                code = jnp.where(
                    (code == CODE_CONTINUE) & conv, CODE_CONVERGED, code)
                # NaN metrics (NaN compares false everywhere, so without
                # this the outer loop would spin to maxiter on a blow-up)
                code = jnp.where(
                    jnp.isnan(carry.pinf_l1) | jnp.isnan(carry.gap)
                    | jnp.isnan(carry.pobj),
                    CODE_NUM_ERR, code)
                # rank-escalation request
                allow_esc = (not is_rank_max) and (
                    mode == "main" or len(self.cones) <= 10)
                if allow_esc:
                    esc = (
                        (ctrl.rank_flag >= rank_thresh)
                        & (ctrl.k - ctrl.last_outer_start >= 2))
                    code = jnp.where(
                        (code == CODE_CONTINUE) & esc, CODE_ESCALATE, code)
                return code.astype(jnp.int32)

            ctrl = ctrl._replace(code=exit_code(carry, ctrl))
            return carry, ctrl

        return jax.lax.cond(ctrl.code == CODE_YIELD, yield_path, finish,
                            (carry, ctrl))

    def _stats_row(self, carry: ALMCarry, ctrl: OuterCtrl):
        """Pack everything the host needs into one vector: 10 scalars
        followed by the flattened r x r Gram matrices (oracle rank)."""
        dtype = self.b.dtype
        scalars = jnp.stack([
            ctrl.code.astype(dtype), ctrl.k.astype(dtype),
            ctrl.inner_total.astype(dtype), ctrl.rank_flag.astype(dtype),
            carry.pobj, carry.dobj, carry.pinf_l1, carry.pinf_inf,
            carry.gap, carry.rho,
        ])
        grams = [jnp.matmul(r.T, r, preferred_element_type=dtype).ravel()
                 for r in carry.R]
        return jnp.concatenate([scalars] + grams)

    def _phase_step(self, carry: ALMCarry, ctrl: OuterCtrl, *, mode: str,
                    early_stop: bool, is_rank_max: bool, rank_thresh: float,
                    max_alm_iter: int, max_outer: int):
        """Run up to ``max_outer`` fused outer iterations in one dispatch.

        Returns (carry, ctrl, n_done, buf) where buf[j] is the packed stats
        row after outer iteration j — ONE host readback per dispatch.
        """
        row_len = 10 + sum(int(s[1]) * int(s[1]) for s in self.shapes)
        buf0 = jnp.zeros((max_outer, row_len), self.b.dtype)
        # fresh per-dispatch work budget
        ctrl = ctrl._replace(budget_start=ctrl.inner_total)

        def cond(st):
            carry, ctrl, j, buf = st
            return (ctrl.code == CODE_CONTINUE) & (j < max_outer)

        def body(st):
            carry, ctrl, j, buf = st
            carry, ctrl = self._outer_step(
                carry, ctrl, mode=mode, early_stop=early_stop,
                is_rank_max=is_rank_max, rank_thresh=rank_thresh,
                max_alm_iter=max_alm_iter)
            # a YIELD exits mid-iteration: don't record a stats row for it
            yielded = ctrl.code == CODE_YIELD
            buf = jax.lax.cond(
                yielded, lambda b: b,
                lambda b: b.at[j].set(self._stats_row(carry, ctrl)), buf)
            return carry, ctrl, j + jnp.where(yielded, 0, 1), buf

        carry, ctrl, j, buf = jax.lax.while_loop(
            cond, body, (carry, ctrl, jnp.asarray(0, jnp.int32), buf0))
        # clear a YIELD so the next dispatch resumes transparently (the
        # host just re-enters; `resuming` skips the per-iteration resets)
        ctrl = ctrl._replace(code=jnp.where(
            ctrl.code == CODE_YIELD, CODE_CONTINUE, ctrl.code)
            .astype(jnp.int32))
        return carry, ctrl, j, buf

    # ------------------------------------------------------------------ #
    # host driver
    # ------------------------------------------------------------------ #

    def prepare(self, carry: ALMCarry) -> ALMCarry:
        """ALG_START block: fresh constraint values, certificates, metrics."""
        return self._prepare_j(carry)

    def parse_rows(self, rows: np.ndarray, n_done: int,
                   info: "ALMOuterInfo", record_cb=None) -> int:
        """Unpack the packed per-outer-iteration stats rows into ``info``
        (+ trajectory callbacks).  Returns the last exit code seen."""
        gram_sizes = [int(s[1]) for s in self.shapes]
        code = CODE_CONTINUE
        for j in range(n_done):
            row = rows[j]
            code = int(row[0])
            info.outer_iter = int(row[1])
            info.inner_iter = int(row[2])
            info.rank_flag = int(row[3])
            info.pobj, info.dobj = float(row[4]), float(row[5])
            info.pinf_l1, info.pinf_inf = float(row[6]), float(row[7])
            info.gap, info.rho = float(row[8]), float(row[9])
            want_grams = (record_cb is not None or j == n_done - 1)
            if want_grams and code in (CODE_CONTINUE, CODE_CONVERGED):
                grams = []
                off = 10
                for r in gram_sizes:
                    grams.append(row[off: off + r * r].reshape(r, r))
                    off += r * r
                info.grams = grams
                if record_cb is not None:
                    record_cb(row, info.outer_iter, info.inner_iter, grams)
        return code

    def run(
        self,
        carry: ALMCarry,
        outer_iter_start: int,
        time_start: float,
        mode: str = "main",
        early_stop: bool = False,
        rho_update_factor: Optional[float] = None,
        max_alm_iter: Optional[int] = None,
        record_cb=None,
        is_rank_max: bool = True,
        last_outer_start: Optional[int] = None,
        rank_thresh: Optional[float] = None,
    ):
        """Dispatch fused outer iterations until a terminal code."""
        p = self.params
        if rho_update_factor is None:
            rho_update_factor = p.alm_rho_factor
        if max_alm_iter is None:
            max_alm_iter = p.max_alm_iter
        if rank_thresh is None:
            rank_thresh = p.rank_flag_threshold()
        if last_outer_start is None:
            last_outer_start = 1 if mode == "main" else outer_iter_start

        info = ALMOuterInfo(outer_iter=outer_iter_start)
        carry = self.prepare(carry)
        ctrl = make_outer_ctrl(p, outer_iter_start, last_outer_start,
                               rho_update_factor, dtype=self.b.dtype)
        step = self._phase_step_j(mode, early_stop, is_rank_max,
                                  float(rank_thresh), int(max_alm_iter))
        while True:
            carry, ctrl, n_done, buf = step(carry, ctrl)
            # ONE host readback per dispatch: the packed stats buffer
            rows = np.asarray(buf)
            code = self.parse_rows(rows, int(n_done), info, record_cb)
            if code == CODE_CONVERGED:
                info.converged = True
                return carry, info
            if code == CODE_NUM_ERR:
                info.num_err = True
                return carry, info
            if code == CODE_ESCALATE:
                info.escalate = True
                return carry, info
            if code == CODE_MAXITER:
                info.rank_flag = 0
                return carry, info
            if time.time() - time_start >= p.time_sec_limit:
                info.time_limit = True
                return carry, info
            if interrupt.interrupted():
                info.interrupted = True
                return carry, info


def make_alm_carry(
    R, rlp, m, n_elems, rho0, params: SolverParams, dtype=jnp.float64,
    dual=None, obj_scale=1.0,
) -> ALMCarry:
    # scalars are numpy (see make_outer_ctrl) — zero BUFFERS stay jnp so
    # no host memory or wire transfer is paid for large m
    big = np.asarray(1e30, jnp.dtype(dtype))
    return ALMCarry(
        R=R,
        rlp=rlp,
        dual=jnp.zeros(m, dtype) if dual is None else dual,
        constr_sum=jnp.zeros(m, dtype),
        CR=tuple(jnp.zeros_like(r) for r in R),  # prepare() fills this
        grad=tuple(jnp.zeros_like(r) for r in R),
        grad_lp=jnp.zeros_like(rlp) if rlp is not None else None,
        hist=lbfgs_mod.init_history(n_elems, params.lbfgs_list_length, dtype),
        rho=np.asarray(rho0, jnp.dtype(dtype)),
        obj_scale=np.asarray(obj_scale, jnp.dtype(dtype)),
        cert_val=np.asarray(0.0, jnp.dtype(dtype)),
        cert_tol=np.asarray(0.1 / rho0, jnp.dtype(dtype)),
        pinf_l1=big, pinf_inf=big, gap=big, pobj=big, dobj=big,
    )
