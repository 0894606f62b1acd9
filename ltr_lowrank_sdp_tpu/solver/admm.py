"""Phase II: ADMM splitting on X = sym(UV^T) with per-cone CG updates.

Reference: ``LORADSADMMOptimize`` (``lorads_admm.c:84-209``) and the
variable-update kernels (``LORADSUpdateSDPVarOne:564``,
``LORADSUpdateLPVarOne:759``, ``linSysProduct:471``).

One ADMM iteration (a full Gauss-Seidel sweep over cones: U update by
matrix-free CG, then V update, then LP columns, then metrics) compiles to a
single XLA executable; the CG loops are ``lax.while_loop``s whose body is one
fused conic operator application.  The host loop applies the rho schedule,
divergence guards and stopping logic.

Faithfulness notes:

* The linear system for the U update is (I + A*_V A_V) u = -M2/rho with
  A_V(x) = A(sym(x V^T)); M1/M2/b_linsys match ``LORADSUpdateSDPVarOne``.
* The reference's per-iteration DIMACS update *overwrites* the running
  constraint-value state with values of the averaged factor (U+V)/2
  (``updateDimacsADMM`` -> ``primalInfeasibility`` ->
  ``LORADSInitConstrValAll``); subsequent cone updates therefore see the
  averaged bookkeeping.  We mirror that exactly — it is behavior-defining
  for iteration counts.
* LP columns use the closed-form update; we apply it as a vectorized Jacobi
  sweep over columns (the reference sweeps sequentially; columns interact
  only through shared constraints, and the averaged-bookkeeping overwrite
  above makes the residual difference one inner iteration deep).  A
  sequential ``lax.scan`` fallback can be added for pathological LP blocks.
"""

from __future__ import annotations

import dataclasses
import time
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverParams
from ..ops.cg import cg_solve
from .common import ProblemConsts, primal_infeas_l1


class ADMMCarry(NamedTuple):
    U: Tuple[jnp.ndarray, ...]
    V: Tuple[jnp.ndarray, ...]
    ulp: Optional[jnp.ndarray]
    vlp: Optional[jnp.ndarray]
    dual: jnp.ndarray
    constr_val: Tuple[jnp.ndarray, ...]   # per-cone (m,) bookkeeping
    constr_lp: Optional[jnp.ndarray]      # LP cone total contribution (m,)
    constr_sum: jnp.ndarray
    obj_scale: jnp.ndarray
    pobj: jnp.ndarray
    dobj: jnp.ndarray
    pinf_l1: jnp.ndarray
    pinf_inf: jnp.ndarray
    gap: jnp.ndarray


class IterStats(NamedTuple):
    cg_iters: jnp.ndarray


@dataclasses.dataclass
class ADMMInfo:
    iters: int = 0
    cg_iters_total: int = 0
    num_err: bool = False
    time_limit: bool = False
    converged: bool = False
    bad_iter: bool = False


class ADMMPhase:
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

        self._iteration_j = jax.jit(self._iteration)
        self._metrics_j = jax.jit(self._metrics)
        self._dual_update_j = jax.jit(self._dual_update)

    # ------------------------------------------------------------------ #

    def _cone_update(self, i, update_var, fixed_var, carry, rho, cg_tol,
                     cg_max_iter):
        """CG solve for one factor of one cone; returns (new_factor, iters)."""
        ops = self.cones[i]
        # M1 = rho*(constr_sum - constr_val_i - b) - lambda
        M1 = rho * (carry.constr_sum - carry.constr_val[i] - self.b) - carry.dual
        # M2 = (obj_scale*C + A*(M1)) V - rho V
        M2 = ops.apply_w(M1, fixed_var, obj_coef=carry.obj_scale,
                         include_obj=True) - rho * fixed_var
        b_lin = -M2 / rho

        def matvec(x):
            w = ops.constr_vals(x, fixed_var)
            return x + ops.apply_w(w, fixed_var, obj_coef=0.0,
                                   include_obj=False)

        res = cg_solve(matvec, b_lin, update_var, cg_tol, cg_max_iter,
                       self.params.cg_restart_freq)
        return res.x, res.iters

    def _iteration(self, carry: ADMMCarry, rho, cg_tol):
        """One full ADMM iteration: cone sweep + LP sweep + metrics."""
        p = self.params
        cg_max = p.cg_max_iter
        cg_total = jnp.asarray(0, jnp.int32)

        U = list(carry.U)
        V = list(carry.V)
        constr_val = list(carry.constr_val)
        for i, ops in enumerate(self.cones):
            # U update
            u_new, it1 = self._cone_update(i, U[i], V[i], carry, rho, cg_tol,
                                           cg_max)
            U[i] = u_new
            new_cv = ops.constr_vals(U[i], V[i])
            carry = carry._replace(
                constr_sum=carry.constr_sum - constr_val[i] + new_cv
            )
            constr_val[i] = new_cv
            carry = carry._replace(
                U=tuple(U), constr_val=tuple(constr_val)
            )
            # V update
            v_new, it2 = self._cone_update(i, V[i], U[i], carry, rho, cg_tol,
                                           cg_max)
            V[i] = v_new
            new_cv = ops.constr_vals(U[i], V[i])
            carry = carry._replace(
                constr_sum=carry.constr_sum - constr_val[i] + new_cv
            )
            constr_val[i] = new_cv
            carry = carry._replace(V=tuple(V), constr_val=tuple(constr_val))
            cg_total = cg_total + it1 + it2

        if self.has_lp:
            carry = self._lp_sweep(carry, rho)

        carry = self._metrics(carry)
        return carry, IterStats(cg_iters=cg_total)

    def _lp_sweep(self, carry: ADMMCarry, rho):
        """Vectorized closed-form LP column updates (u then v)."""
        lp = self.lp

        def one_side(x_upd, x_fix, carry):
            # global weight vector with own-column contribution removed
            # per column: M1_j = rho*(S - own_j - b) - lambda;
            # lpW_j = obj_scale*c_j + <A_col_j, M1_j>
            #       = obj_scale*c_j + <A_col_j, M1_glob> - rho*x_j*||A_col_j||^2
            M1g = rho * (carry.constr_sum - self.b) - carry.dual
            x_old = x_upd * x_fix
            base = lp.weighted_col_sums(M1g, obj_coef=carry.obj_scale)
            lpw = base - rho * x_old * lp.nrm2sq
            M2 = lpw * x_fix - rho * x_fix
            b_lin = -M2 / rho
            new = b_lin / (1.0 + lp.nrm2sq * x_fix * x_fix)
            return new

        ulp = one_side(carry.ulp, carry.vlp, carry)
        new_lpvals = lp.constr_vals(ulp, carry.vlp)
        carry = carry._replace(
            ulp=ulp,
            constr_sum=carry.constr_sum - carry.constr_lp + new_lpvals,
            constr_lp=new_lpvals,
        )
        vlp = one_side(carry.vlp, carry.ulp, carry)
        new_lpvals = lp.constr_vals(carry.ulp, vlp)
        carry = carry._replace(
            vlp=vlp,
            constr_sum=carry.constr_sum - carry.constr_lp + new_lpvals,
            constr_lp=new_lpvals,
        )
        return carry

    def _metrics(self, carry: ADMMCarry) -> ADMMCarry:
        """Objective + DIMACS from the averaged factors; overwrite the
        bookkeeping with averaged constraint values (reference semantics)."""
        Ravg = tuple(0.5 * (u + v) for u, v in zip(carry.U, carry.V))
        rlp_avg = 0.5 * (carry.ulp + carry.vlp) if self.has_lp else None

        obj = jnp.asarray(0.0, self.b.dtype)
        cvals = []
        for ops, r in zip(self.cones, Ravg):
            obj = obj + ops.obj_value(r, r)
            cvals.append(ops.constr_vals(r, r))
        constr_lp = carry.constr_lp
        if self.has_lp:
            obj = obj + self.lp.obj_value(rlp_avg, rlp_avg)
            constr_lp = self.lp.constr_vals(rlp_avg, rlp_avg)
        csum = sum(cvals) + (constr_lp if self.has_lp else 0.0)

        pobj = obj
        dobj = jnp.vdot(self.b, carry.dual) / carry.obj_scale
        pinf = primal_infeas_l1(csum, self.b, self.consts.b_nrm1)
        pinf_inf = pinf * (1.0 + self.consts.b_nrm1) / (1.0 + self.consts.b_nrminf)
        gap = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
        return carry._replace(
            constr_val=tuple(cvals), constr_lp=constr_lp, constr_sum=csum,
            pobj=pobj, dobj=dobj, pinf_l1=pinf, pinf_inf=pinf_inf, gap=gap,
        )

    def _dual_update(self, carry: ADMMCarry, rho):
        return carry._replace(
            dual=carry.dual + rho * (self.b - carry.constr_sum)
        )

    # ------------------------------------------------------------------ #

    def init_carry(self, U, V, ulp, vlp, dual, obj_scale) -> ADMMCarry:
        dtype = self.b.dtype
        big = jnp.asarray(1e30, dtype)
        carry = ADMMCarry(
            U=U, V=V, ulp=ulp, vlp=vlp, dual=dual,
            constr_val=tuple(jnp.zeros_like(self.b) for _ in self.cones),
            constr_lp=jnp.zeros_like(self.b) if self.has_lp else None,
            constr_sum=jnp.zeros_like(self.b),
            obj_scale=jnp.asarray(obj_scale, dtype),
            pobj=big, dobj=big, pinf_l1=big, pinf_inf=big, gap=big,
        )
        return self._metrics_j(carry)

    def run(self, carry: ADMMCarry, rho: float, iter_start: int,
            iter_ceiling: int, time_start: float, mode: str = "main",
            record_cb=None, rho_max: Optional[float] = None):
        """Host loop applying the reference rho schedule + stopping logic."""
        p = self.params
        if rho_max is None:
            rho_max = p.rho_max
        info = ADMMInfo()
        it = iter_start

        if float(carry.gap) <= p.phase2_tol and float(carry.pinf_l1) <= p.phase2_tol:
            info.converged = True
            return carry, rho, it, info

        rho = min(rho, rho_max)
        cur_rho_max = rho_max
        old_mean = 1e30
        buf = [0.0] * 10
        bad_pd = 0
        count = 0
        bad_pd_limit = 800 if mode == "main" else 200
        cg_tol_factor = 1e-2 if mode == "main" else 1e-4

        while (
            it <= p.max_admm_iter
            or float(carry.gap) >= p.phase2_tol
            or float(carry.pinf_l1) >= p.phase2_tol
        ):
            if it >= iter_ceiling:
                break
            cg_tol = min(float(carry.pinf_l1) * cg_tol_factor, 1e-8)
            carry, stats = self._iteration_j(
                carry, jnp.asarray(rho, self.b.dtype),
                jnp.asarray(cg_tol, self.b.dtype),
            )
            info.cg_iters_total += int(stats.cg_iters)
            info.iters = it

            pinf_l1 = float(carry.pinf_l1)
            pinf_inf = float(carry.pinf_inf)
            gap = float(carry.gap)
            if record_cb is not None:
                record_cb(carry, it, int(stats.cg_iters))

            if pinf_inf >= 1e10 or gap >= 1 - 1e-8:
                info.num_err = True
                return carry, rho, it, info

            # bad-iteration counters (lorads_admm.c:147-170)
            if gap <= p.phase2_tol * 5:
                bad_pd = max(0, bad_pd - 5)
            elif gap <= p.phase2_tol:
                bad_pd = max(0, bad_pd - 10)
            if gap >= p.phase1_tol * 1e2:
                bad_pd += 2
            if bad_pd >= bad_pd_limit:
                info.bad_iter = True
                return carry, rho, it, info

            buf[count % 10] = pinf_inf
            count += 1

            if mode == "main":
                if pinf_inf <= p.phase2_tol:
                    info.converged = gap <= p.phase2_tol
                    return carry, rho, it, info
            else:
                if pinf_l1 <= p.phase2_tol and gap <= p.phase2_tol:
                    info.converged = True
                    return carry, rho, it, info

            carry = self._dual_update_j(carry, jnp.asarray(rho, self.b.dtype))

            # rho schedule with plateau-triggered rhoMax escalation
            if (it + 1) % p.rho_freq == 0:
                rho *= p.rho_factor
                if rho >= cur_rho_max:
                    rho = cur_rho_max
                    if (it + 1) % (p.rho_freq * 100) == 0:
                        mean = float(np.mean(np.abs(buf)))
                        if mean / old_mean >= 0.65:
                            rho *= p.rho_factor ** round(
                                np.log(p.rho_freq * 100) / np.log(p.rho_freq)
                            )
                            cur_rho_max = rho
                        old_mean = mean
                if rho >= p.rho_ceiling_admm:
                    rho = p.rho_ceiling_admm

            if it % 50 == 0:
                if time.time() - time_start >= p.time_sec_limit:
                    info.time_limit = True
                    return carry, rho, it, info

            if gap <= p.phase2_tol * 1e-3 and pinf_l1 <= p.phase2_tol * 1e-3:
                info.converged = True
                return carry, rho, it, info
            it += 1

        info.converged = (
            float(carry.gap) <= p.phase2_tol
            and float(carry.pinf_l1) <= p.phase2_tol
        )
        return carry, rho, it, info
