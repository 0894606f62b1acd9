"""Phase I: augmented Lagrangian method on X = RR^T.

TPU-first split of the reference control flow (``LORADS_ALMOptimize`` /
``LORADS_ALMOptimize_reopt``, ``lorads_alm.c:959-1484``):

* the **inner descent loop** (L-BFGS direction -> exact quartic line search
  -> factor update -> gradient) is one ``lax.while_loop`` compiled per rank
  signature — hundreds of steps run on-device with zero host sync;
* the **outer control laws** (EMA stall detection, difficulty grading,
  rho escalation with its do-while certificate recheck, rank-escalation
  triggers, trajectory recording) are cheap scalar logic on the host,
  exactly mirroring the reference's semantics.

Per inner step the kernel evaluations are: <C,.>/A(.) contractions for
(R, D) and (D, D) (line-search coefficients, ``ALMCalq12p12``), a fresh
A(RR^T) after the update, and one adjoint application for the gradient —
the same operator count as the reference inner loop.
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
from ..ops import coneops
from ..ops.cubic import quartic_linesearch
from ..ops import lbfgs as lbfgs_mod
from .common import (
    ProblemConsts,
    alm_gradient,
    flatten_factors,
    primal_infeas_l1,
    unflatten_factors,
)

EASY, MEDIUM, HARD, SUPER = 0, 1, 2, 3


class ALMCarry(NamedTuple):
    R: Tuple[jnp.ndarray, ...]
    rlp: Optional[jnp.ndarray]
    dual: jnp.ndarray
    constr_sum: jnp.ndarray
    grad: Tuple[jnp.ndarray, ...]
    grad_lp: Optional[jnp.ndarray]
    hist: lbfgs_mod.LBFGSHistory
    rho: jnp.ndarray
    obj_scale: jnp.ndarray       # scaleObjHis: C is used as obj_scale * C
    cert_val: jnp.ndarray
    cert_tol: jnp.ndarray
    pinf_l1: jnp.ndarray
    pinf_inf: jnp.ndarray
    gap: jnp.ndarray
    pobj: jnp.ndarray
    dobj: jnp.ndarray


class PassStats(NamedTuple):
    local_iter: jnp.ndarray
    num_err: jnp.ndarray
    tau_small: jnp.ndarray
    early_exit: jnp.ndarray
    last_tau: jnp.ndarray


@dataclasses.dataclass
class ALMOuterInfo:
    """Host-side per-outer-iteration info for logging / rank control."""

    outer_iter: int = 0
    inner_iter: int = 0
    rank_flag: int = 0
    num_err: bool = False
    time_limit: bool = False
    converged: bool = False


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

        self._inner_pass_main = jax.jit(partial(self._inner_pass, early_variant=False))
        self._inner_pass_reopt = jax.jit(partial(self._inner_pass, early_variant=True))
        self._grad_cert_j = jax.jit(self._grad_cert)
        self._metrics_j = jax.jit(self._metrics)
        self._dual_and_grad_j = jax.jit(self._dual_and_grad)
        self._constr_j = jax.jit(
            lambda c: self._obj_and_constr(c.R, c.R, c.rlp, c.rlp)[1]
        )

    # ------------------------------------------------------------------ #
    # jitted pieces
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

    def _grad_cert(self, carry: ALMCarry) -> ALMCarry:
        grads, grad_lp, gsq = alm_gradient(
            self.cones, self.lp, carry.R, carry.rlp, carry.dual,
            carry.constr_sum, self.b, carry.rho, carry.obj_scale,
        )
        cert = jnp.sqrt(gsq) / (1.0 + self.consts.c_nrminf)
        return carry._replace(grad=grads, grad_lp=grad_lp, cert_val=cert)

    def _dual_and_grad(self, carry: ALMCarry) -> ALMCarry:
        dual = carry.dual + carry.rho * (self.b - carry.constr_sum)
        carry = carry._replace(dual=dual)
        return self._grad_cert(carry)

    def _metrics(self, carry: ALMCarry) -> ALMCarry:
        """Fresh objective values, constraint values and DIMACS errors.

        The optimization internally weights C by ``obj_scale`` (reopt
        rescaling) but reporting is always in the original objective:
        pObj = <C, X>, dObj = b'lambda / obj_scale (the dual variable lives
        in the scaled problem, cf. ``objScale_dualvar``).
        """
        obj, cvals = self._obj_and_constr(carry.R, carry.R, carry.rlp, carry.rlp)
        pobj = obj
        dobj = jnp.vdot(self.b, carry.dual) / carry.obj_scale
        pinf = primal_infeas_l1(cvals, self.b, self.consts.b_nrm1)
        gap = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
        pinf_inf = pinf * (1.0 + self.consts.b_nrm1) / (1.0 + self.consts.b_nrminf)
        return carry._replace(
            constr_sum=cvals, pobj=pobj, dobj=dobj, pinf_l1=pinf,
            pinf_inf=pinf_inf, gap=gap,
        )

    def _inner_pass(self, carry: ALMCarry, early_variant: bool):
        """One sub-problem pass: L-BFGS descent loop + dual update."""
        p = self.params
        dtype = self.b.dtype
        st0 = (
            carry,
            jnp.asarray(0, jnp.int32),     # local_iter
            jnp.asarray(0, jnp.int32),     # clear count
            jnp.asarray(False),            # num_err
            jnp.asarray(False),            # tau_small
            jnp.asarray(False),            # early_exit
            jnp.asarray(0.0, dtype),       # last tau
        )

        def cond(st):
            c, local_iter, clear, num_err, tau_small, early, _tau = st
            run = (
                (c.cert_val - c.cert_tol > p.end_alm_sub_tol)
                & (local_iter <= 800)
                & ~(num_err | tau_small | early)
            )
            return run

        def body(st):
            c, local_iter, clear, num_err, tau_small, early, _tau = st
            clear = jnp.where(local_iter % 300 == 0, 0, clear)
            grad_flat = flatten_factors(c.grad, c.grad_lp)
            D_flat = lbfgs_mod.direction(c.hist, grad_flat, n_valid=clear)
            D, dlp = unflatten_factors(D_flat, self.shapes, self.has_lp)

            q0 = self.b - c.constr_sum
            oRD, cRD = self._obj_and_constr(c.R, D, c.rlp, dlp)
            oDD, cDD = self._obj_and_constr(D, D, dlp, dlp)
            p1 = 2.0 * oRD * c.obj_scale
            q1 = 2.0 * cRD
            p2 = oDD * c.obj_scale
            q2 = cDD

            tau, root_num = quartic_linesearch(
                c.rho, c.dual, p1, p2, q0, q1, q2
            )
            num_err = root_num == 0
            tau_small = (~num_err) & (jnp.abs(tau) < p.end_tau_tol)
            do_update = ~(num_err | tau_small)
            tau_eff = jnp.where(do_update, tau, 0.0)

            R_new = tuple(r + tau_eff * d for r, d in zip(c.R, D))
            rlp_new = c.rlp + tau_eff * dlp if self.has_lp else None

            # fresh constraint values (the reference recomputes them in its
            # per-step DIMACS update, alg_common.c:386-394)
            _, cvals = self._obj_and_constr(R_new, R_new, rlp_new, rlp_new)

            grads, grad_lp, gsq = alm_gradient(
                self.cones, self.lp, R_new, rlp_new, c.dual, cvals, self.b,
                c.rho, c.obj_scale,
            )
            cert = jnp.sqrt(gsq) / (1.0 + self.consts.c_nrminf)
            grad_flat_new = flatten_factors(grads, grad_lp)
            hist = lbfgs_mod.push_pair(
                c.hist, tau_eff * D_flat, grad_flat_new - grad_flat
            )

            pinf = primal_infeas_l1(cvals, self.b, self.consts.b_nrm1)
            pinf_inf = pinf * (1.0 + self.consts.b_nrm1) / (
                1.0 + self.consts.b_nrminf
            )
            if not early_variant:
                # main-phase early exit inside the inner loop
                # (lorads_alm.c:1344-1357); gap is the stale outer value.
                early = (pinf_inf <= p.phase1_tol) & (
                    (c.gap <= p.phase1_tol) | (not p.high_acc_mode)
                )
            else:
                early = jnp.asarray(False)
            early = early & do_update

            c = c._replace(
                R=R_new, rlp=rlp_new, constr_sum=cvals, grad=grads,
                grad_lp=grad_lp, hist=hist, cert_val=cert, pinf_l1=pinf,
                pinf_inf=pinf_inf,
            )
            return (
                c, local_iter + 1, clear + 1, num_err, tau_small, early, tau,
            )

        carry, local_iter, clear, num_err, tau_small, early, tau = (
            jax.lax.while_loop(cond, body, st0)
        )

        # dual update + gradient refresh only on natural loop exit
        do_dual = ~(num_err | tau_small | early)
        carry = jax.lax.cond(do_dual, self._dual_and_grad, lambda c: c, carry)

        return carry, PassStats(
            local_iter=local_iter, num_err=num_err, tau_small=tau_small,
            early_exit=early, last_tau=tau,
        )

    # ------------------------------------------------------------------ #
    # host-side outer driver
    # ------------------------------------------------------------------ #

    def prepare(self, carry: ALMCarry) -> ALMCarry:
        """(Re)initialize constraint values, gradient and certificates —
        the reference's ALG_START block."""
        cvals = self._constr_j(carry)
        carry = carry._replace(
            constr_sum=cvals,
            cert_tol=0.1 / carry.rho,
        )
        return self._grad_cert_j(carry)

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
        """Run the ALM outer loop until convergence / rank-escalation request.

        Returns (carry, info) where info.rank_flag >= threshold signals the
        caller to escalate rank and re-enter (the reference's AUG_RANK +
        goto ALG_START, ``lorads_alm.c:1456-1465``).
        """
        p = self.params
        if rho_update_factor is None:
            rho_update_factor = p.alm_rho_factor
        if max_alm_iter is None:
            max_alm_iter = p.max_alm_iter

        info = ALMOuterInfo(outer_iter=outer_iter_start)
        carry = self.prepare(carry)

        if rank_thresh is None:
            rank_thresh = p.rank_flag_threshold()
        max_sub_iter = 5000
        max_sub_iter_ceil = 25000
        update_max_sub_counter = 0
        rho_factor_flag = 0
        k = outer_iter_start
        k0 = outer_iter_start
        if last_outer_start is None:
            last_outer_start = 1 if mode == "main" else outer_iter_start
        rank_flag = 0
        difficulty = HARD

        while True:
            # ---- outer termination check (loop head) ----
            if mode == "main":
                if k > max_alm_iter:
                    break
            else:
                if (k > max_alm_iter) and (
                    float(carry.pinf_inf) <= p.phase1_tol
                    and (
                        float(carry.gap) <= max(p.phase1_tol, p.phase2_tol * 5)
                        or not p.high_acc_mode
                    )
                ):
                    break
                if k > max_alm_iter + 50:  # hard stop safeguard
                    break

            # per-outer-iteration EMA state (lorads_alm.c:1011-1018)
            ema_cur = 0.0
            ema_old = 0.0
            ema_counter = 1
            cur_iter_counter = 1
            if update_max_sub_counter >= 2:
                update_max_sub_counter = 0
                max_sub_iter = min(max_sub_iter + 10000, max_sub_iter_ceil)

            goto_update_rho = False
            while difficulty != EASY:
                # EMA stall gate
                ema_cur = 0.1 * float(carry.cert_val) + 0.9 * ema_cur
                if_break = True
                if ema_counter >= 5:
                    if ema_old != 0.0:
                        change = (ema_cur - ema_old) / ema_old
                        if_break = -0.005 <= change <= 0.005
                    ema_old = ema_cur
                    ema_counter = 1
                else:
                    ema_counter += 1
                if not if_break and not p.high_acc_mode:
                    break
                if cur_iter_counter >= max_sub_iter:
                    update_max_sub_counter += 1
                    break
                if (
                    rank_flag >= rank_thresh
                    and not is_rank_max
                    and (k - last_outer_start >= 3)
                ):
                    break
                if float(carry.cert_val) <= float(carry.cert_tol):
                    break

                fn = (
                    self._inner_pass_reopt if mode == "reopt"
                    else self._inner_pass_main
                )
                carry, stats = fn(carry)
                local_iter = int(stats.local_iter)
                info.inner_iter += local_iter
                cur_iter_counter += local_iter

                if bool(stats.num_err):
                    info.num_err = True
                    info.outer_iter = k
                    info.rank_flag = rank_flag
                    carry = self._metrics_j(carry)
                    return carry, info
                if bool(stats.early_exit):
                    info.outer_iter = k
                    info.converged = True
                    info.rank_flag = rank_flag
                    carry = self._metrics_j(carry)
                    return carry, info
                if bool(stats.tau_small):
                    goto_update_rho = True
                    break

                # difficulty grading (lorads_alm.c:1383-1400)
                if local_iter <= 20:
                    difficulty = EASY
                elif local_iter <= 100:
                    difficulty = MEDIUM
                    rank_flag += 2
                elif local_iter < 400:
                    difficulty = HARD
                    rank_flag += 3
                else:
                    difficulty = SUPER
                    rank_flag += 4
                if difficulty == EASY:
                    rank_flag = 0

            # ---- UpdateRho (lorads_alm.c:1403-1421) ----
            del goto_update_rho
            while True:
                new_rho = min(float(carry.rho) * rho_update_factor,
                              p.rho_ceiling_alm)
                carry = carry._replace(
                    rho=jnp.asarray(new_rho, self.b.dtype),
                    cert_tol=jnp.asarray(0.1 / new_rho, self.b.dtype),
                )
                carry = self._grad_cert_j(carry)
                if float(carry.cert_tol) < float(carry.cert_val):
                    break
                if new_rho >= p.rho_ceiling_alm:
                    break
            rho_val = float(carry.rho)
            if rho_val >= 5e4 and rho_factor_flag < 4:
                rho_update_factor = float(np.sqrt(np.sqrt(rho_update_factor)))
                rho_factor_flag = 4
            elif rho_val >= 5e6 and rho_factor_flag < 6:
                rho_update_factor = float(np.sqrt(np.sqrt(rho_update_factor)))
                rho_factor_flag = 6
            elif rho_val >= 5e8 and rho_factor_flag < 8:
                rho_update_factor = float(np.sqrt(np.sqrt(rho_update_factor)))
                rho_factor_flag = 8

            difficulty = HARD
            k += 1
            info.outer_iter = k

            # ---- per-outer metrics / exits ----
            carry = self._metrics_j(carry)
            pinf_l1 = float(carry.pinf_l1)
            pinf_inf = float(carry.pinf_inf)
            gap = float(carry.gap)

            if mode == "main":
                if pinf_inf <= p.phase1_tol and (
                    gap <= p.phase1_tol or not p.high_acc_mode
                ):
                    info.converged = True
                    break
                if (
                    gap <= p.phase1_tol * 1e-3
                    and pinf_l1 <= p.phase1_tol * 1e-3
                ):
                    info.converged = True
                    break
            else:
                if early_stop:
                    if (
                        pinf_l1 <= p.phase1_tol
                        and gap <= max(p.phase1_tol, p.phase2_tol * 5)
                        and (k - k0) > 1
                    ):
                        info.converged = True
                        break
                else:
                    if (
                        gap <= p.phase2_tol
                        and pinf_l1 <= p.phase2_tol
                        and (k - k0) > 1
                    ):
                        info.converged = True
                        break

            if record_cb is not None:
                record_cb(carry, k, info.inner_iter)
            if time.time() - time_start >= p.time_sec_limit:
                info.time_limit = True
                break

            # ---- rank escalation request (host decides; caller rebuilds) ----
            if rank_flag >= rank_thresh and not is_rank_max:
                if mode == "reopt" and len(self.cones) > 10:
                    pass
                elif k - last_outer_start >= 2:
                    info.rank_flag = rank_flag
                    info.outer_iter = k
                    return carry, info

        info.rank_flag = 0
        carry = self._metrics_j(carry)
        return carry, info


def make_alm_carry(
    R, rlp, m, n_elems, rho0, params: SolverParams, dtype=jnp.float64,
    dual=None, obj_scale=1.0,
) -> ALMCarry:
    big = jnp.asarray(1e30, dtype)
    return ALMCarry(
        R=R,
        rlp=rlp,
        dual=jnp.zeros(m, dtype) if dual is None else dual,
        constr_sum=jnp.zeros(m, dtype),
        grad=tuple(jnp.zeros_like(r) for r in R),
        grad_lp=jnp.zeros_like(rlp) if rlp is not None else None,
        hist=lbfgs_mod.init_history(n_elems, params.lbfgs_list_length, dtype),
        rho=jnp.asarray(rho0, dtype),
        obj_scale=jnp.asarray(obj_scale, dtype),
        cert_val=jnp.asarray(0.0, dtype),
        cert_tol=jnp.asarray(0.1 / rho0, dtype),
        pinf_l1=big, pinf_inf=big, gap=big, pobj=big, dobj=big,
    )
