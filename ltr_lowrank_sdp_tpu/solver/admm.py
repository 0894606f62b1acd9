"""Phase II: ADMM splitting on X = sym(UV^T) — device-fused in chunks.

Reference: ``LORADSADMMOptimize`` (``lorads_admm.c:84-209``) and the
variable-update kernels (``LORADSUpdateSDPVarOne:564``,
``LORADSUpdateLPVarOne:759``, ``linSysProduct:471``).

A *chunk* of ADMM iterations (Gauss-Seidel cone sweep with matrix-free CG
U/V updates, LP closed-form sweep, metrics, dual update, rho schedule with
plateau escalation, divergence/early-exit logic) compiles into one XLA
executable driven by a ``lax.while_loop``; the host dispatches once per
chunk, reads back a small per-iteration stats buffer for trajectory
logging, and enforces the wall-clock limit.  This removes the per-iteration
host round-trips that dominate under a remote-TPU tunnel.

Faithfulness notes:

* The linear system for the U update is (I + A*_V A_V) u = -M2/rho with
  A_V(x) = A(sym(x V^T)); M1/M2/b_linsys match ``LORADSUpdateSDPVarOne``.
* The reference's per-iteration DIMACS update *overwrites* the running
  constraint-value state with values of the averaged factor (U+V)/2
  (``updateDimacsADMM`` -> ``primalInfeasibility``); subsequent cone updates
  see the averaged bookkeeping.  We mirror that exactly.
* LP columns use the closed-form update as a vectorized Jacobi sweep (the
  reference sweeps sequentially; columns only interact through shared
  constraints and the averaged overwrite above).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverParams
from ..ops.cg import cg_solve
from ..ops.compsum import cvdot
from . import interrupt
from .common import ProblemConsts, primal_infeas_l1

CODE_RUN = 0
CODE_CONVERGED = 1
CODE_PINF_OK = 2      # main mode: pinf_inf under tol -> return (gap decides)
CODE_NUM_ERR = 3
CODE_BAD_ITER = 4
CODE_DONE = 5         # overall while-condition turned false
CODE_CEILING = 6

STAT_COLS = 7  # pobj dobj pinf_l1 pinf_inf gap rho cg_iters
HEADER_LEN = 10  # code it cg_total rho n_done gap pinf_l1 pinf_inf pobj dobj


class ADMMCarry(NamedTuple):
    U: Tuple[jnp.ndarray, ...]
    V: Tuple[jnp.ndarray, ...]
    ulp: Optional[jnp.ndarray]
    vlp: Optional[jnp.ndarray]
    dual: jnp.ndarray
    constr_val: Tuple[jnp.ndarray, ...]   # per-cone (m,) bookkeeping
    constr_lp: Optional[jnp.ndarray]      # LP cone contribution (m,)
    constr_sum: jnp.ndarray
    CV: Tuple[jnp.ndarray, ...]           # C @ V_k per cone (current V)
    obj_scale: jnp.ndarray
    pobj: jnp.ndarray
    dobj: jnp.ndarray
    pinf_l1: jnp.ndarray
    pinf_inf: jnp.ndarray
    gap: jnp.ndarray


class ADMMCtrl(NamedTuple):
    it: jnp.ndarray            # global iteration counter
    rho: jnp.ndarray
    cur_rho_max: jnp.ndarray
    old_mean: jnp.ndarray
    buf: jnp.ndarray           # (10,) pinf_inf ring buffer
    count: jnp.ndarray
    bad_pd: jnp.ndarray
    cg_total: jnp.ndarray
    code: jnp.ndarray
    cg_start: jnp.ndarray      # cg_total at dispatch entry (work budget)


@dataclasses.dataclass
class ADMMInfo:
    iters: int = 0
    cg_iters_total: int = 0
    num_err: bool = False
    time_limit: bool = False
    interrupted: bool = False
    converged: bool = False
    bad_iter: bool = False
    plateau: bool = False    # f32 near-feasible non-certifying plateau
                             # (main mode) — the driver's f64 polish signal
    # device metrics at the last chunk boundary (host mirrors; avoid
    # extra device->host syncs in the driver's control logic)
    last_gap: Optional[float] = None
    last_pinf: Optional[float] = None
    last_pinf_inf: Optional[float] = None
    last_pobj: Optional[float] = None
    last_dobj: Optional[float] = None
    # speculative certification blob (driver's _fused_final) read back
    # alongside the terminal chunk when a final_fn was chained
    final_blob: Optional[np.ndarray] = None


class ADMMPhase:
    def __init__(self, cones, lp, b, consts: ProblemConsts,
                 params: SolverParams, shapes, n_lp: int,
                 chunk_size: int = 25):
        self.cones = cones
        self.lp = lp
        self.b = b
        self.consts = consts
        self.params = params
        self.shapes = tuple(tuple(s) for s in shapes)
        self.n_lp = n_lp
        self.has_lp = n_lp > 0
        self.chunk = chunk_size

        # per-dispatch CG-iteration budget: bound the device work of one
        # fused chunk (long dispatches can't honor wall-clock limits and
        # stress remote-TPU RPC deadlines); one CG iteration = one
        # A(x V^T) + one (C + A*(w)) apply per cone
        from .alm import DISPATCH_FLOP_BUDGET

        work = 1.0
        for ops, (n, r) in zip(cones, self.shapes):
            work += ops.constr_flops(r) + ops.apply_flops(r)
        self.cg_budget = int(min(max(DISPATCH_FLOP_BUDGET / work, 100),
                                 2_000_000_000))

        self._metrics_j = jax.jit(self._metrics)
        self._chunk_cache = {}

    def _chunk_j(self, mode: str, iter_ceiling: int, chunk: int,
                 with_grams: bool):
        key = (mode, iter_ceiling, chunk, with_grams)
        if key not in self._chunk_cache:
            self._chunk_cache[key] = jax.jit(partial(
                self._chunk_step, mode=mode, iter_ceiling=iter_ceiling,
                chunk=chunk, with_grams=with_grams))
        return self._chunk_cache[key]

    # ------------------------------------------------------------------ #

    def _cone_update(self, i, update_var, fixed_var, C_fixed, carry, rho,
                     cg_tol):
        """CG solve for one factor of one cone; returns (factor, iters).

        ``C_fixed`` is C @ fixed_var, supplied by the caller: the U update
        reuses the carried C·V from the previous metrics pass, the V update
        computes C·U_new once and hands it onward — each ADMM iteration
        performs exactly two objective SpMMs and the adjoint work is pure
        elementwise for diag (MaxCut) cones.
        """
        ops = self.cones[i]
        M1 = rho * (carry.constr_sum - carry.constr_val[i] - self.b) - carry.dual
        M2 = (ops.apply_a(M1, fixed_var) + carry.obj_scale * C_fixed
              - rho * fixed_var)
        b_lin = -M2 / rho

        # CG-loop-invariant gathers of the fixed factor are hoisted once
        # per cone-update (ConeOps.cg_normal_matvec)
        matvec = ops.cg_normal_matvec(fixed_var)

        res = cg_solve(matvec, b_lin, update_var, cg_tol,
                       self.params.cg_max_iter, self.params.cg_restart_freq)
        return res.x, res.iters

    def _iteration(self, carry: ADMMCarry, rho, cg_tol):
        """One full ADMM iteration: cone sweep + LP sweep + metrics."""
        if self.params.admm_jacobi and len(self.cones) > 1:
            return self._iteration_jacobi(carry, rho, cg_tol)
        cg_total = jnp.asarray(0, jnp.int32)
        U = list(carry.U)
        V = list(carry.V)
        constr_val = list(carry.constr_val)
        CU = []
        for i, ops in enumerate(self.cones):
            u_new, it1 = self._cone_update(i, U[i], V[i], carry.CV[i],
                                           carry, rho, cg_tol)
            U[i] = u_new
            new_cv = ops.constr_vals(U[i], V[i])
            carry = carry._replace(
                U=tuple(U),
                constr_sum=carry.constr_sum - constr_val[i] + new_cv,
            )
            constr_val[i] = new_cv
            carry = carry._replace(constr_val=tuple(constr_val))

            C_u = ops.apply_c(U[i])
            v_new, it2 = self._cone_update(i, V[i], U[i], C_u,
                                           carry, rho, cg_tol)
            V[i] = v_new
            new_cv = ops.constr_vals(U[i], V[i])
            carry = carry._replace(
                V=tuple(V),
                constr_sum=carry.constr_sum - constr_val[i] + new_cv,
            )
            constr_val[i] = new_cv
            carry = carry._replace(constr_val=tuple(constr_val))
            cg_total = cg_total + it1 + it2
            CU.append(C_u)

        if self.has_lp:
            carry = self._lp_sweep(carry, rho)
        carry = self._metrics(carry, CU=tuple(CU))
        return carry, cg_total

    def _iteration_jacobi(self, carry: ADMMCarry, rho, cg_tol):
        """Jacobi (parallel) cone sweep — ``admm_jacobi=True``.

        The reference updates cones sequentially with a running constraint
        sum (Gauss-Seidel, ``lorads_alg_common.c:298-325``).  On a
        multi-block TPU problem the per-cone CG solves are independent given
        a *snapshot* of the constraint sum, so all U updates run
        concurrently in one XLA program (and likewise all V updates).
        Plain Jacobi diverges when blocks couple strongly through shared
        constraints (each block's proximal step assumes the others fixed,
        so the summed correction overshoots); the standard parallel-
        splitting remedy is under-relaxation by the block count,
        U <- U + (U* - U)/K — convergence verified empirically by
        tests/test_e2e.py::test_admm_jacobi_multiblock.
        """
        cg_total = jnp.asarray(0, jnp.int32)
        alpha = 1.0 / len(self.cones)

        # ---- U half-sweep against the entry snapshot ----
        new_U = []
        for i, ops in enumerate(self.cones):
            u_new, it1 = self._cone_update(i, carry.U[i], carry.V[i],
                                           carry.CV[i], carry, rho, cg_tol)
            new_U.append(carry.U[i] + alpha * (u_new - carry.U[i]))
            cg_total = cg_total + it1
        constr_val = [ops.constr_vals(u, v) for ops, u, v in
                      zip(self.cones, new_U, carry.V)]
        csum = sum(constr_val) + (carry.constr_lp if self.has_lp else 0.0)
        carry = carry._replace(U=tuple(new_U),
                               constr_val=tuple(constr_val),
                               constr_sum=csum)

        # ---- V half-sweep against the refreshed snapshot ----
        CU = [ops.apply_c(u) for ops, u in zip(self.cones, carry.U)]
        new_V = []
        for i, ops in enumerate(self.cones):
            v_new, it2 = self._cone_update(i, carry.V[i], carry.U[i],
                                           CU[i], carry, rho, cg_tol)
            new_V.append(carry.V[i] + alpha * (v_new - carry.V[i]))
            cg_total = cg_total + it2
        constr_val = [ops.constr_vals(u, v) for ops, u, v in
                      zip(self.cones, carry.U, new_V)]
        csum = sum(constr_val) + (carry.constr_lp if self.has_lp else 0.0)
        carry = carry._replace(V=tuple(new_V),
                               constr_val=tuple(constr_val),
                               constr_sum=csum)

        if self.has_lp:
            carry = self._lp_sweep(carry, rho)
        carry = self._metrics(carry, CU=tuple(CU))
        return carry, cg_total

    def _lp_sweep(self, carry: ADMMCarry, rho):
        lp = self.lp

        def one_side(x_upd, x_fix, carry):
            M1g = rho * (carry.constr_sum - self.b) - carry.dual
            x_old = x_upd * x_fix
            base = lp.weighted_col_sums(M1g, obj_coef=carry.obj_scale)
            lpw = base - rho * x_old * lp.nrm2sq
            M2 = lpw * x_fix - rho * x_fix
            return (-M2 / rho) / (1.0 + lp.nrm2sq * x_fix * x_fix)

        ulp = one_side(carry.ulp, carry.vlp, carry)
        new_lp = lp.constr_vals(ulp, carry.vlp)
        carry = carry._replace(
            ulp=ulp,
            constr_sum=carry.constr_sum - carry.constr_lp + new_lp,
            constr_lp=new_lp,
        )
        vlp = one_side(carry.vlp, carry.ulp, carry)
        new_lp = lp.constr_vals(carry.ulp, vlp)
        carry = carry._replace(
            vlp=vlp,
            constr_sum=carry.constr_sum - carry.constr_lp + new_lp,
            constr_lp=new_lp,
        )
        return carry

    def _metrics(self, carry: ADMMCarry, CU=None) -> ADMMCarry:
        """Objective + DIMACS from averaged factors; overwrite bookkeeping
        with the averaged constraint values (reference semantics).

        The averaged objective <C, Ravg Ravg^T> = 0.25 <U+V, CU + CV> needs
        C·U and C·V: ``CU`` rides in from the V update when called from the
        iteration; C·V is computed fresh here (it is carried to the next
        iteration's U update, so it is never an *extra* SpMM)."""
        Ravg = tuple(0.5 * (u + v) for u, v in zip(carry.U, carry.V))
        rlp_avg = 0.5 * (carry.ulp + carry.vlp) if self.has_lp else None

        CV = tuple(ops.apply_c(v) for ops, v in zip(self.cones, carry.V))
        if CU is None:
            CU = tuple(ops.apply_c(u) for ops, u in zip(self.cones, carry.U))
        obj = jnp.asarray(0.0, self.b.dtype)
        cvals = []
        for ops, u, v, cu, cv, r in zip(self.cones, carry.U, carry.V, CU,
                                        CV, Ravg):
            obj = obj + 0.25 * cvdot(u + v, cu + cv)
            cvals.append(ops.constr_vals(r, r))
        constr_lp = carry.constr_lp
        if self.has_lp:
            obj = obj + self.lp.obj_value(rlp_avg, rlp_avg)
            constr_lp = self.lp.constr_vals(rlp_avg, rlp_avg)
        csum = sum(cvals) + (constr_lp if self.has_lp else 0.0)
        carry = carry._replace(CV=CV)

        pobj = obj
        dobj = cvdot(self.b, carry.dual) / carry.obj_scale
        pinf = primal_infeas_l1(csum, self.b, self.consts.b_nrm1)
        pinf_inf = pinf * (1.0 + self.consts.b_nrm1) / (
            1.0 + self.consts.b_nrminf)
        gap = jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))
        return carry._replace(
            constr_val=tuple(cvals), constr_lp=constr_lp, constr_sum=csum,
            pobj=pobj, dobj=dobj, pinf_l1=pinf, pinf_inf=pinf_inf, gap=gap,
        )

    # ---------------- fused chunk ---------------- #

    def _chunk_step(self, carry: ADMMCarry, ctrl: ADMMCtrl, *, mode: str,
                    iter_ceiling: int, chunk: Optional[int] = None,
                    with_grams: bool = True):
        p = self.params
        dtype = self.b.dtype
        CH = self.chunk if chunk is None else chunk
        cg_tol_factor = 1e-2 if mode == "main" else 1e-4
        stats0 = jnp.zeros((CH, STAT_COLS), dtype)
        # fresh per-dispatch CG work budget
        ctrl = ctrl._replace(cg_start=ctrl.cg_total)
        # per-iteration (U+V)/2 Gram matrices for oracle-rank logging
        # (skipped when the caller disabled oracle logging)
        grams0 = tuple(
            jnp.zeros((CH, s[1], s[1]), dtype) for s in self.shapes
        ) if with_grams else ()

        def cond(st):
            carry, ctrl, j, stats, grams = st
            overall = (
                (ctrl.it <= p.max_admm_iter)
                | (carry.gap >= p.phase2_tol)
                | (carry.pinf_l1 >= p.phase2_tol))
            within_budget = ctrl.cg_total - ctrl.cg_start < self.cg_budget
            return ((j < CH) & (ctrl.code == CODE_RUN)
                    & overall & (ctrl.it < iter_ceiling) & within_budget)

        def body(st):
            carry, ctrl, j, stats, grams = st
            cg_tol = jnp.minimum(carry.pinf_l1 * cg_tol_factor, 1e-8)
            carry, cg_iters = self._iteration(carry, ctrl.rho, cg_tol)
            ctrl = ctrl._replace(cg_total=ctrl.cg_total + cg_iters)

            row = jnp.stack([
                carry.pobj, carry.dobj, carry.pinf_l1, carry.pinf_inf,
                carry.gap, ctrl.rho, cg_iters.astype(dtype),
            ])
            stats = stats.at[j].set(row)
            if with_grams:
                grams = tuple(
                    g.at[j].set(jnp.matmul(
                        (0.5 * (u + v)).T, 0.5 * (u + v),
                        preferred_element_type=dtype))
                    for g, u, v in zip(grams, carry.U, carry.V))

            # divergence guard + explicit NaN check (NaN compares false, so
            # the magnitude tests alone let a CG blow-up grind for
            # thousands of iterations; reference NaN residual check at
            # lorads_cgs.c:277-280)
            num_err = ((carry.pinf_inf >= 1e10) | (carry.gap >= 1 - 1e-8)
                       | jnp.isnan(carry.pinf_l1) | jnp.isnan(carry.gap)
                       | jnp.isnan(carry.pobj))

            # bad-iteration counters (lorads_admm.c:147-170)
            bad = ctrl.bad_pd
            bad = jnp.where(carry.gap <= p.phase2_tol * 5,
                            jnp.maximum(0, bad - 5), bad)
            bad = jnp.where(carry.gap >= p.phase1_tol * 1e2, bad + 2, bad)
            bad_limit = 800 if mode == "main" else 200
            bad_exit = bad >= bad_limit

            buf = ctrl.buf.at[ctrl.count % 10].set(carry.pinf_inf)
            count = ctrl.count + 1

            if mode == "main":
                pinf_exit = carry.pinf_inf <= p.phase2_tol
                # ALSO stop once the final certificate is met: the status
                # classification (main.c:592-602) accepts gap<=tol &
                # pinf_l1<=tol — the reference checks this pair only at
                # ADMM entry (lorads_admm.c:86) because in f64 its
                # norm-ratio l_inf exit fires soon after anyway; in f32
                # the l_inf bar can sit below the evaluation noise floor
                # (shmup4: ratio 400x => needs pinf_l1 ~ 2.5e-8) and
                # without this exit the loop grinds past its own
                # converged iterates while rho escalates into divergence.
                conv_exit = (carry.pinf_l1 <= p.phase2_tol) & (
                    carry.gap <= p.phase2_tol)
            else:
                pinf_exit = jnp.asarray(False)
                conv_exit = (carry.pinf_l1 <= p.phase2_tol) & (
                    carry.gap <= p.phase2_tol)
            early = (carry.gap <= p.phase2_tol * 1e-3) & (
                carry.pinf_l1 <= p.phase2_tol * 1e-3)

            code = jnp.where(
                num_err, CODE_NUM_ERR,
                jnp.where(bad_exit, CODE_BAD_ITER,
                          jnp.where(pinf_exit, CODE_PINF_OK,
                                    jnp.where(conv_exit | early,
                                              CODE_CONVERGED, CODE_RUN))))
            code = code.astype(jnp.int32)

            # dual update + rho schedule only when continuing
            def advance(args):
                carry, ctrl = args
                carry = carry._replace(
                    dual=carry.dual + ctrl.rho * (self.b - carry.constr_sum))
                it1 = ctrl.it + 1
                do_rho = (it1 % p.rho_freq) == 0 if mode == "main" else (
                    (ctrl.it % p.rho_freq) == 0)
                rho = jnp.where(do_rho, ctrl.rho * p.rho_factor, ctrl.rho)
                hit_max = do_rho & (rho >= ctrl.cur_rho_max)
                rho = jnp.where(hit_max, ctrl.cur_rho_max, rho)
                # plateau-triggered rhoMax escalation every rho_freq*100
                plateau_tick = hit_max & (
                    ((it1 if mode == "main" else ctrl.it)
                     % (p.rho_freq * 100)) == 0)
                mean = jnp.sum(jnp.abs(ctrl.buf)) / 10.0
                stalled = plateau_tick & (mean / ctrl.old_mean >= 0.65)
                bump = p.rho_factor ** round(
                    np.log(p.rho_freq * 100) / np.log(p.rho_freq))
                rho2 = jnp.where(stalled, rho * bump, rho)
                cur_rho_max = jnp.where(stalled, rho2, ctrl.cur_rho_max)
                old_mean = jnp.where(plateau_tick, mean, ctrl.old_mean)
                # f32 compute: CG inner products at rho >~ 1e6 overflow
                # float32 range (alpha = rTr/pAp with terms ~ (rho |x|)^2);
                # cap the penalty where the normal operator is still
                # representable — the f64 polish handles anything beyond
                ceiling = (min(p.rho_ceiling_admm, 3e5)
                           if jnp.dtype(dtype) == jnp.float32
                           else p.rho_ceiling_admm)
                rho2 = jnp.minimum(rho2, ceiling)
                ctrl = ctrl._replace(it=it1, rho=rho2,
                                     cur_rho_max=cur_rho_max,
                                     old_mean=old_mean)
                return carry, ctrl

            ctrl = ctrl._replace(bad_pd=bad.astype(jnp.int32), buf=buf,
                                 count=count.astype(jnp.int32))
            carry, ctrl = jax.lax.cond(
                code == CODE_RUN, advance, lambda a: a, (carry, ctrl))
            ctrl = ctrl._replace(code=code)
            return carry, ctrl, j + 1, stats, grams

        carry, ctrl, j, stats, grams = jax.lax.while_loop(
            cond, body,
            (carry, ctrl, jnp.asarray(0, jnp.int32), stats0, grams0))

        # classify the natural loop-exit cases
        overall = (
            (ctrl.it <= p.max_admm_iter)
            | (carry.gap >= p.phase2_tol)
            | (carry.pinf_l1 >= p.phase2_tol))
        ctrl = ctrl._replace(code=jnp.where(
            ctrl.code != CODE_RUN, ctrl.code,
            jnp.where(~overall, CODE_DONE,
                      jnp.where(ctrl.it >= iter_ceiling, CODE_CEILING,
                                CODE_RUN))).astype(jnp.int32))
        # single packed host blob: header + per-iteration stats + grams
        header = jnp.stack([
            ctrl.code.astype(dtype), ctrl.it.astype(dtype),
            ctrl.cg_total.astype(dtype), ctrl.rho, j.astype(dtype),
            carry.gap, carry.pinf_l1,
            carry.pinf_inf, carry.pobj, carry.dobj,
        ])
        blob = jnp.concatenate(
            [header, stats.ravel()] + [g.ravel() for g in grams])
        return carry, ctrl, blob

    def parse_blob(self, blob: np.ndarray, info: "ADMMInfo", record_cb,
                   chunk: Optional[int] = None, with_grams: bool = True):
        """Unpack one chunk blob into ``info`` (+ trajectory callbacks).

        Returns (code, it_now, last_rho)."""
        CH = self.chunk if chunk is None else chunk
        code = int(blob[0])
        it_now = int(blob[1])
        n_done = int(blob[4])
        if record_cb is not None and n_done:
            srows = blob[HEADER_LEN: HEADER_LEN + CH * STAT_COLS].reshape(
                CH, STAT_COLS)
            goff = HEADER_LEN + CH * STAT_COLS
            grows = []
            if with_grams:
                for s in self.shapes:
                    r = int(s[1])
                    grows.append(
                        blob[goff: goff + CH * r * r].reshape(CH, r, r))
                    goff += CH * r * r
            base_it = it_now - n_done
            for r_i in range(n_done):
                record_cb(srows[r_i],
                          [g[r_i] for g in grows],
                          base_it + r_i)
        info.iters = it_now
        info.cg_iters_total = int(blob[2])
        info.last_gap, info.last_pinf = float(blob[5]), float(blob[6])
        info.last_pinf_inf = float(blob[7])
        info.last_pobj, info.last_dobj = float(blob[8]), float(blob[9])
        return code, it_now, float(blob[3])

    # ------------------------------------------------------------------ #

    def init_carry(self, U, V, ulp, vlp, dual, obj_scale) -> ADMMCarry:
        dtype = self.b.dtype
        # numpy scalars (vs jnp.asarray): distinct VALUES would otherwise
        # each bake into a fresh one-op XLA program (see make_outer_ctrl)
        big = np.asarray(1e30, jnp.dtype(dtype))
        carry = ADMMCarry(
            U=U, V=V, ulp=ulp, vlp=vlp, dual=dual,
            constr_val=tuple(jnp.zeros_like(self.b) for _ in self.cones),
            constr_lp=jnp.zeros_like(self.b) if self.has_lp else None,
            constr_sum=jnp.zeros_like(self.b),
            CV=tuple(jnp.zeros_like(v) for v in V),  # _metrics fills this
            obj_scale=np.asarray(obj_scale, jnp.dtype(dtype)),
            pobj=big, dobj=big, pinf_l1=big, pinf_inf=big, gap=big,
        )
        return self._metrics_j(carry)

    def make_ctrl(self, rho: float, rho_max: float,
                  iter_start: int = 0) -> ADMMCtrl:
        dtype = jnp.dtype(self.b.dtype)
        return ADMMCtrl(
            it=np.asarray(iter_start, np.int32),
            rho=np.asarray(rho, dtype),
            cur_rho_max=np.asarray(rho_max, dtype),
            old_mean=np.asarray(1e30, dtype),
            buf=np.zeros(10, dtype),
            count=np.asarray(0, np.int32),
            bad_pd=np.asarray(0, np.int32),
            cg_total=np.asarray(0, np.int32),
            cg_start=np.asarray(0, np.int32),
            code=np.asarray(CODE_RUN, np.int32),
        )

    def run(self, carry: ADMMCarry, rho: float, iter_start: int,
            iter_ceiling: int, time_start: float, mode: str = "main",
            record_cb=None, rho_max: Optional[float] = None,
            entry_gap: Optional[float] = None,
            entry_pinf: Optional[float] = None,
            f64_check=None, ctrl0: Optional[ADMMCtrl] = None,
            with_grams: bool = True, final_fn=None):
        """Dispatch fused chunks until a terminal code.

        ``final_fn(carry, ctrl) -> blob`` optionally chains the driver's
        speculative certification pass (dual-infeasibility Lanczos + final
        Gram spectra) onto every chunk dispatch; the blob rides the same
        readback, so a chunk that ends the phase needs NO extra device
        round-trip for certification (the in-graph cond makes the
        speculation free when the chunk is not terminal).

        ``entry_gap``/``entry_pinf`` are host mirrors of ``carry.gap`` /
        ``carry.pinf_l1`` (known to the driver from the preceding ALM stats
        row); passing them skips a device sync on entry.

        ``f64_check(carry) -> (pobj, dobj, pinf_l1, pinf_inf, gap)`` is an
        optional float64 host re-evaluation of the averaged iterate.  Under
        float32 compute the device objective carries an O(sqrt(nnz))
        summation noise floor that can exceed phase2Tol on large instances
        — the device gap then *plateaus* above tolerance even though the
        true gap is already converged, and the loop would grind to maxiter.
        When the device metrics sit within 1e4x of tolerance, the host
        verifies in f64 and exits on true convergence.
        """
        p = self.params
        dtype = self.b.dtype
        if rho_max is None:
            rho_max = p.rho_max
        info = ADMMInfo()

        if entry_gap is None:
            entry_gap = float(carry.gap)
        if entry_pinf is None:
            entry_pinf = float(carry.pinf_l1)
        if entry_gap <= p.phase2_tol and entry_pinf <= p.phase2_tol:
            info.converged = True
            info.last_gap, info.last_pinf = entry_gap, entry_pinf
            return carry, rho, iter_start, info

        rho = min(rho, rho_max)
        ctrl = (ctrl0 if ctrl0 is not None
                else self.make_ctrl(rho, rho_max, iter_start))
        # dispatch+readback round trips cost ~25-1000 ms each through the
        # tunnel; without per-iteration Gram payloads a 4x larger chunk
        # amortizes them at no readback-size cost
        CH = self.chunk if with_grams else self.chunk * 4
        step = self._chunk_j(mode, int(iter_ceiling), CH, with_grams)
        last_f64_it = -10**9
        f64_every = 0
        # f32 plateau detector (main mode): consecutive chunks that are
        # near-feasible (pinf <= 100*tol) but never certify are the
        # precision-plateau signature — break early and let the driver's
        # f64 polish take over instead of grinding rho into oscillation
        plateau_chunks = 0
        plateau_prev_pinf = None
        f32 = jnp.dtype(dtype) == jnp.float32
        trace = os.environ.get("LTRSDP_TRACE_DISPATCH") == "1"
        while True:
            _td = time.perf_counter()
            carry, ctrl, blob = step(carry, ctrl)
            # ONE host readback per chunk (the speculative certification
            # blob, when chained, rides the same transfer)
            if final_fn is not None:
                fblob = final_fn(carry, ctrl)
                blob, fblob = jax.device_get((blob, fblob))
            else:
                blob = np.asarray(blob)
                fblob = None
            if trace:
                print(f"[dispatch] admm chunk {time.perf_counter()-_td:.3f}s"
                      f" it={int(blob[1])}", flush=True)
            code, it_now, last_rho = self.parse_blob(
                blob, info, record_cb, chunk=CH, with_grams=with_grams)
            last_gap, last_pinf = info.last_gap, info.last_pinf
            if code in (CODE_NUM_ERR, CODE_BAD_ITER, CODE_CONVERGED,
                        CODE_PINF_OK, CODE_DONE, CODE_CEILING):
                info.final_blob = fblob
            if code == CODE_NUM_ERR:
                info.num_err = True
                break
            if code == CODE_BAD_ITER:
                info.bad_iter = True
                break
            if code in (CODE_CONVERGED, CODE_PINF_OK, CODE_DONE):
                info.converged = (
                    last_gap <= p.phase2_tol and last_pinf <= p.phase2_tol)
                if code == CODE_CONVERGED:
                    info.converged = True if mode != "main" else info.converged
                break
            if code == CODE_CEILING:
                break
            if (f64_check is not None
                    and last_pinf <= p.phase2_tol
                    and last_gap <= 1e4 * p.phase2_tol
                    and it_now - last_f64_it >= f64_every):
                # plausibly converged but the f32 device gap can't resolve
                # it: re-evaluate the averaged iterate in f64 on the host
                pobj64, dobj64, pinf64, pinfi64, gap64 = f64_check(carry)
                last_f64_it = it_now
                if gap64 <= p.phase2_tol and pinf64 <= p.phase2_tol:
                    info.converged = True
                    info.last_gap, info.last_pinf = gap64, pinf64
                    # keep the whole host-mirror metric set in one precision
                    # (the driver may skip its end-of-solve fetch on these)
                    info.last_pinf_inf = pinfi64
                    info.last_pobj, info.last_dobj = pobj64, dobj64
                    break
                # back off while the true gap is still far from tolerance
                f64_every = self.chunk if gap64 <= 10 * p.phase2_tol \
                    else 4 * self.chunk
            # f32 precision-plateau detector — checked AFTER the f64_check
            # block (so a still-certifiable chunk is never cut off) and
            # only counting chunks whose pinf stopped improving: a
            # near-feasible iterate that keeps descending is converging,
            # not plateaued (advisor finding r3; large-n solves were
            # being diverted into ~10x-cost emulated-f64 ADMM mid-descent)
            if f32 and mode == "main":
                near = last_pinf <= 1e2 * p.phase2_tol
                non_improving = (plateau_prev_pinf is not None
                                 and last_pinf >= 0.98 * plateau_prev_pinf)
                plateau_chunks = (plateau_chunks + 1
                                  if (near and non_improving) else 0)
                plateau_prev_pinf = last_pinf
                if plateau_chunks >= max(2, (6 * 25) // CH):
                    info.plateau = True
                    break
            if time.time() - time_start >= p.time_sec_limit:
                info.time_limit = True
                break
            if interrupt.interrupted():
                info.interrupted = True
                break
        return carry, float(last_rho), it_now, info
