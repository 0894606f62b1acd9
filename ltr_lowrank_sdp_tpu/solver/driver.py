"""End-to-end solve orchestration: ALM -> ADMM -> reopt -> certification.

Mirrors the reference's ``main.c:370-645`` pipeline:

1. rank determination (heuristic / fixed / injected schedule),
2. Phase I ALM with dynamic rank escalation (recompile per rank bucket),
3. ALM -> ADMM handoff (U = V = R, rho *= heuristicFactor with the rhoMax
   clamp law of ``LORADS_ALMtoADMM``, ``lorads_solver.c:1351-1387``),
4. Phase II ADMM,
5. reopt rounds (level >= 1: objective rescaling by 5 + short ALM + ADMM;
   level >= 2: additional rounds driven by dual infeasibility, with U/V
   averaging between rounds — ``reopt``, ``lorads_solver.c:1497-1539`` and
   ``main.c:491-591``),
6. dual-infeasibility certification by Lanczos min-eig of the slack
   S = obj_scale*C - A*(lambda) (TPU-native ARPACK replacement),
7. status classification + trajectory JSON.

:class:`Solver` caches compiled phase executables per rank signature; reuse
one instance across repeated solves of the same problem (benchmark loops,
schedule comparisons) to avoid re-tracing.  Host scalar readbacks are
batched (each readback through a remote-TPU tunnel costs 10-100 ms).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OracleRankMethod, SolverParams, SolverStatus
from ..ops.gatherseg import static_table
from ..ops.coneops import build_cone_ops_internal
from ..ops.lanczos import lanczos_tridiag, tridiag_min_eig_resid
from ..problem import SDPProblem
from . import alm as alm_mod
from . import interrupt
from . import admm as admm_mod
from .alm import ALMPhase, ALMOuterInfo, make_alm_carry, make_outer_ctrl
from .admm import ADMMCarry, ADMMInfo, ADMMPhase
from .common import ProblemConsts, host_metrics_f64, init_factors
from .logging import TrajectoryLogger

import os as _os

# per-dispatch wall-time tracing (diagnosing tunnel/dispatch overheads):
# LTRSDP_TRACE_DISPATCH=1 prints one line per fused-segment round trip
_TRACE_DISPATCH = _os.environ.get("LTRSDP_TRACE_DISPATCH") == "1"
from .rank import RankState, make_rank_state, pad_factor_tuple


def _fetch(*xs) -> List[float]:
    """Batch scalar device->host reads into a single transfer."""
    vals = np.asarray(jnp.stack([jnp.asarray(x) for x in xs]))
    return [float(v) for v in vals]


def _gram_num_rank(gram: np.ndarray, eps: float = 1e-6) -> int:
    """Numerical rank of an r x r Gram: #eigenvalues > eps * lambda_max
    (the oracle-rank rule, ``count_significant_from_matrix``,
    ``lorads_logging.c:272-366``)."""
    w = np.linalg.eigvalsh(np.asarray(gram, np.float64))
    mx = float(w[-1]) if w.size else 0.0
    if mx <= 0.0:
        return 0
    return int(np.sum(w > eps * mx))


@dataclasses.dataclass
class SolveResult:
    status: SolverStatus
    pobj: float
    dobj: float
    pinf_l1: float
    pinf_inf: float
    gap: float
    dinf_l1: float
    dinf_inf: float
    solve_time: float
    alm_outer_iters: int
    alm_inner_iters: int
    admm_iters: int
    cg_iters: int
    final_ranks: List[int]
    oracle_rank: int
    logger: Optional[TrajectoryLogger] = None
    stage_times: Optional[Dict[str, float]] = None
    # primal factors per cone (X_k = sym(U_k V_k^T)), LP column factors and
    # dual multipliers of the returned iterate
    U: Optional[Tuple] = None
    V: Optional[Tuple] = None
    ulp: Optional[object] = None
    vlp: Optional[object] = None
    dual: Optional[object] = None
    # internal objective scaling at exit (scaleObjHis): the returned dual
    # is in SCALED units; slack diagnostics need S = obj_scale*C - A*(dual)
    obj_scale: float = 1.0

    @property
    def errors_ok(self) -> bool:
        return self.status in (
            SolverStatus.PRIMAL_DUAL_OPTIMAL, SolverStatus.PRIMAL_OPTIMAL
        )


class Solver:
    """Reusable solver: owns cone ops and compiled-phase caches."""

    def __init__(self, prob: SDPProblem, params: Optional[SolverParams] = None,
                 mesh=None, mesh_axis: str = "constr"):
        """``mesh``: optional ``jax.sharding.Mesh`` with axis ``mesh_axis``.

        Two sharding modes (SURVEY.md §5.8: "batched multi-instance solves
        shard the instance axis; single-huge-instance solves shard
        constraint rows (m-axis) and factor rows (n-axis)"):

        * ``mesh_axis="constr"`` — each cone's hot operators run
          constraint-sharded via explicit ``shard_map`` + one psum
          (``parallel/meshops.py``); factors stay replicated and the
          phases are unchanged (replicated boundary).  Right for many
          constraints over moderate n.
        * ``mesh_axis="row"`` — GSPMD factor-row sharding: the (n, r)
          factors are *placed* with ``NamedSharding(mesh, P(axis, None))``
          and the unchanged jitted phases run SPMD — XLA propagates the
          row sharding through the elementwise factor algebra (fully
          local), turns the scalar contractions into psums, and inserts
          gathers only where an operator genuinely needs remote rows
          (sparse C SpMM).  For MaxCut-family diag cones the constraint
          axis is the row axis, so A(RR^T)/A*(w) are local too.  Right
          for huge-n instances (delaunay_n20/rgg at n=1,048,576,
          ``lorads/README.md:191-192``).
        """
        self.prob = prob
        self.params = params or SolverParams()
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # Pure-feasibility problems (C = 0 everywhere, e.g. cphil12):
        # λ = 0 is an EXACT optimal dual — S = C - A*(0) = 0 ⪰ 0 and
        # dobj = 0 = <C, X> = pobj — so the solve reduces to primal
        # feasibility.  Tighten phase 1 to the l1-equivalent of the final
        # bar so the ALM phase alone can finish; solve() installs the zero
        # dual and the gap-driven stages reduce to pure pinf checks.  No
        # reference equivalent: LoRADS grinds its general dual-ascent path
        # here (cphil12: 2.0s CPU, ``lorads/README.md:242``).
        self.feas_only = float(prob.c_nrm1) == 0.0
        if self.feas_only:
            p0 = self.params
            p1 = p0.phase2_tol * (1.0 + prob.b_nrminf) / (1.0 + prob.b_nrm1)
            self.params = p0.replace(phase1_tol=min(p0.phase1_tol, p1))
        dt = self.params.dtype
        if dt == "auto":
            # float64 is emulated (slow) on TPU; float32 compute reaches the
            # reference's 1e-5 DIMACS targets (final metrics are re-verified
            # in float64 on the host, see solve()).
            dt = "float64" if jax.default_backend() == "cpu" else "float32"
        dtype = jnp.dtype(dt)
        self.dtype = dtype
        # internal (relabel-optimized) operators: factor rows and possibly
        # the constraint axis live in a solver-chosen order that makes the
        # hot-path gathers identity maps; conversions happen only at the
        # problem boundary (_factors_out / _dual_out)
        self.cones, self.lp, self.constr_order = build_cone_ops_internal(
            prob, dtype)
        self._factor_sharding = None
        if mesh is not None and mesh_axis == "row":
            from jax.sharding import NamedSharding, PartitionSpec

            self._factor_sharding = NamedSharding(
                mesh, PartitionSpec(mesh_axis, None))
        elif mesh is not None:
            from ..parallel.meshops import MeshConeOps

            self.cones = [
                MeshConeOps(c, ops, mesh, axis=mesh_axis, dtype=dtype)
                for c, ops in zip(prob.cones, self.cones)
            ]
        self.consts = ProblemConsts.from_problem(prob)
        b_np = np.asarray(prob.b)
        if self.constr_order is not None:
            b_np = b_np[self.constr_order]
        # static_table: small b embeds into the HLO, large b is
        # device-committed (see ops/gatherseg.py residency policy)
        self.b = static_table(b_np, dtype)
        self._phase_cache: Dict[Tuple[int, ...], Tuple[ALMPhase, ADMMPhase]] = {}

    def _place_factors(self, R):
        """Commit (n, r) factors to the row sharding (no-op otherwise).

        This single placement is the whole GSPMD integration: every array
        derived from the factors inside the jitted phases inherits the
        sharding through XLA's propagation."""
        if self._factor_sharding is None:
            return R
        return tuple(jax.device_put(r, self._factor_sharding) for r in R)

    # ---- boundary conversions (internal order <-> original order) ------ #

    def _factors_out(self, F) -> Tuple[np.ndarray, ...]:
        """Per-cone factor tuple: internal row order -> original order."""
        return tuple(ops.permute_rows_out(np.asarray(f))
                     for ops, f in zip(self.cones, F))

    def _dual_out(self, dual) -> np.ndarray:
        dual = np.asarray(dual)
        if self.constr_order is None:
            return dual
        out = np.empty_like(dual)
        out[self.constr_order] = dual
        return out

    def _phases64(self, ranks) -> ADMMPhase:
        """float64 ADMM phase over the same internal problem layout —
        the f64-polish engine (see ``SolverParams.f64_polish``)."""
        if not hasattr(self, "_phase64_cache"):
            self._phase64_cache = {}
        key = tuple(ranks)
        if key not in self._phase64_cache:
            if getattr(self, "_cones64", None) is None:
                cones64, lp64, order64 = build_cone_ops_internal(
                    self.prob, jnp.float64)
                # the internal relabeling derives from the problem
                # structure only, so the f64 build must agree with f32
                assert (order64 is None) == (self.constr_order is None)
                if order64 is not None:
                    assert np.array_equal(order64, self.constr_order)
                self._cones64, self._lp64 = cones64, lp64
                self._b64 = jnp.asarray(np.asarray(self.b), jnp.float64)
            shapes = [(n, r) for n, r in zip(self.prob.block_dims, ranks)]
            self._phase64_cache[key] = ADMMPhase(
                self._cones64, self._lp64, self._b64, self.consts,
                self.params, shapes, self.prob.n_lp_cols)
        return self._phase64_cache[key]

    def phases(self, ranks) -> Tuple[ALMPhase, ADMMPhase]:
        key = tuple(ranks)
        if key not in self._phase_cache:
            shapes = [(n, r) for n, r in zip(self.prob.block_dims, ranks)]
            alm = ALMPhase(self.cones, self.lp, self.b, self.consts,
                           self.params, shapes, self.prob.n_lp_cols)
            admm = ADMMPhase(self.cones, self.lp, self.b, self.consts,
                             self.params, shapes, self.prob.n_lp_cols)
            self._phase_cache[key] = (alm, admm)
        return self._phase_cache[key]

    # ------------------------------------------------------------------ #
    # fused main pass: ALM -> handoff -> ADMM -> certification, ONE
    # dispatch / ONE readback in the common no-reopt case.  Under a
    # remote-TPU tunnel each blocking readback costs ~30-40 ms; the classic
    # per-phase driver pays 5-8 of them even on an instance whose entire
    # solve is a few tens of milliseconds of device work.
    # ------------------------------------------------------------------ #

    def _final_len(self, ranks, k_scale: int = 1) -> int:
        total = 0
        for ops in self.cones:
            total += 2 * min(self._lanczos_k(ops, k_scale), ops.n)
        total += 1
        total += sum(int(r) * int(r) for r in ranks)
        return total

    def _handoff_admm(self, carry, ctrl, rho_max_in, *, admm,
                      with_grams: bool, admm_chunk: int):
        """Traced speculative handoff + first ADMM segment.

        Chained after an ALM ``_phase_step`` dispatch WITHOUT a host
        readback: the decision whether ADMM runs is a device value
        (``ctrl.code``), so the host can enqueue this unconditionally and
        block only once, at the very end of the chain.  When the ALM
        segment did not finish, the cond skips all work.  Kept as its own
        jit (rather than one fused mega-program with the ALM loop) because
        XLA compile time grows superlinearly in program size."""
        p = self.params
        dtype = self.dtype

        go_admm = (ctrl.code == alm_mod.CODE_CONVERGED) | (
            ctrl.code == alm_mod.CODE_MAXITER)

        # ---- handoff rho law (LORADS_ALMtoADMM, lorads_solver.c:1351) ----
        alm_rho = carry.rho
        over = alm_rho > rho_max_in
        clamped = jnp.minimum(
            jnp.sqrt(jnp.maximum(rho_max_in, alm_rho) / rho_max_in)
            * rho_max_in, alm_rho)
        admm_rho0 = jnp.where(over, clamped, alm_rho * p.heuristic_factor)
        rho_max_new = jnp.where(go_admm & over, admm_rho0, rho_max_in)
        admm_rho0 = jnp.minimum(admm_rho0, rho_max_new)

        if self.feas_only:
            # C = 0: the gap is an artifact of the internal ALM dual (the
            # reported dual will be the exact λ = 0) — only pinf binds
            entry_done = carry.pinf_l1 <= p.phase2_tol
        else:
            entry_done = (carry.gap <= p.phase2_tol) & (
                carry.pinf_l1 <= p.phase2_tol)
        run_admm = go_admm & ~entry_done

        def mk_carry() -> ADMMCarry:
            return ADMMCarry(
                U=carry.R, V=carry.R, ulp=carry.rlp, vlp=carry.rlp,
                dual=carry.dual,
                constr_val=tuple(jnp.zeros_like(self.b)
                                 for _ in self.cones),
                constr_lp=(jnp.zeros_like(self.b)
                           if admm.has_lp else None),
                constr_sum=jnp.zeros_like(self.b),
                CV=tuple(jnp.zeros_like(r) for r in carry.R),
                obj_scale=carry.obj_scale,
                pobj=carry.pobj, dobj=carry.dobj,
                pinf_l1=carry.pinf_l1, pinf_inf=carry.pinf_inf,
                gap=carry.gap)

        actrl0 = admm_mod.ADMMCtrl(
            it=jnp.asarray(0, jnp.int32), rho=admm_rho0,
            cur_rho_max=rho_max_new,
            old_mean=jnp.asarray(1e30, dtype), buf=jnp.zeros(10, dtype),
            count=jnp.asarray(0, jnp.int32),
            bad_pd=jnp.asarray(0, jnp.int32),
            cg_total=jnp.asarray(0, jnp.int32),
            cg_start=jnp.asarray(0, jnp.int32),
            code=jnp.asarray(admm_mod.CODE_RUN, jnp.int32))

        gram_elems = (sum(int(r.shape[1]) ** 2 for r in carry.R)
                      if with_grams else 0)
        admm_blob_len = admm_mod.HEADER_LEN + admm_chunk * (
            admm_mod.STAT_COLS + gram_elems)

        def do_admm(_):
            ac = admm._metrics(mk_carry())
            ac = ac._replace(pinf_l1=carry.pinf_l1,
                             pinf_inf=carry.pinf_inf, gap=carry.gap)
            return admm._chunk_step(
                ac, actrl0, mode="main", iter_ceiling=p.max_admm_iter,
                chunk=admm_chunk, with_grams=with_grams)

        def skip_admm(_):
            return (mk_carry(), actrl0,
                    jnp.zeros((admm_blob_len,), dtype))

        ac, actrl, admm_blob = jax.lax.cond(run_admm, do_admm, skip_admm,
                                            None)

        flags = jnp.stack([
            run_admm.astype(dtype),
            (go_admm & entry_done).astype(dtype),   # "converged at entry"
            rho_max_new, admm_rho0, go_admm.astype(dtype),
        ])
        return ac, actrl, admm_blob, flags

    def _fused_final(self, ac, actrl, flags, key):
        """Traced speculative certification segment (chained after
        _handoff_admm, same no-readback trick)."""
        dtype = self.dtype
        run_admm = flags[0] > 0
        skip_conv = flags[1] > 0
        terminal = ((actrl.code == admm_mod.CODE_CONVERGED)
                    | (actrl.code == admm_mod.CODE_PINF_OK)
                    | (actrl.code == admm_mod.CODE_DONE)
                    | (actrl.code == admm_mod.CODE_NUM_ERR)
                    | (actrl.code == admm_mod.CODE_BAD_ITER)
                    | (actrl.code == admm_mod.CODE_CEILING))
        do_final = skip_conv | (run_admm & terminal)
        flen = self._final_len([int(u.shape[1]) for u in ac.U])
        return jax.lax.cond(
            do_final,
            lambda _: self._final_traced(ac.U, ac.V, -ac.dual,
                                         ac.obj_scale, key),
            lambda _: jnp.zeros((flen,), dtype), None)

    def _handoff_admm_j(self, ranks, with_grams: bool, admm_chunk: int):
        key = (tuple(ranks), with_grams, admm_chunk)
        if not hasattr(self, "_ha_cache"):
            self._ha_cache = {}
        if key not in self._ha_cache:
            _, admm = self.phases(ranks)
            self._ha_cache[key] = jax.jit(partial(
                self._handoff_admm, admm=admm, with_grams=with_grams,
                admm_chunk=admm_chunk))
        return self._ha_cache[key]

    def _fused_final_j(self):
        if not hasattr(self, "_ff_fn"):
            self._ff_fn = jax.jit(self._fused_final)
        return self._ff_fn

    # ------------------------------------------------------------------ #

    def _lanczos_k(self, ops, k_scale: int = 1) -> int:
        base = min(max(32, 2 * int(np.sqrt(ops.n)) + 20), 100)
        return min(base * k_scale, 400, ops.n)

    def _final_traced(self, U, V, neg_lam, obj_scale, key, k_scale: int = 1):
        """The whole end-of-solve device pass as one traced function:
        every cone's dual-slack Lanczos recurrence, the LP dual column sums,
        and the (U+V)/2 Gram matrices for final oracle rank — ONE packed
        blob (single host readback).  Composable into the fused solve."""
        cones, lp, dtype = self.cones, self.lp, self.dtype
        parts = []
        for i, ops in enumerate(cones):
            def mv(y, ops=ops):
                out = ops.apply_w(neg_lam, y[:, None],
                                  obj_coef=obj_scale, include_obj=True)
                return out[:, 0]

            alphas, betas = lanczos_tridiag(
                mv, ops.n, jax.random.fold_in(key, i),
                num_iters=self._lanczos_k(ops, k_scale), dtype=dtype)
            parts.extend([alphas, betas])
        lp_term = (
            jnp.sum(jnp.abs(jnp.minimum(
                lp.weighted_col_sums(neg_lam, obj_coef=obj_scale), 0.0)))
            if lp is not None else jnp.asarray(0.0, dtype))
        parts.append(lp_term[None])
        for u, v in zip(U, V):
            g = jnp.matmul((0.5 * (u + v)).T, 0.5 * (u + v),
                           preferred_element_type=dtype)
            parts.append(g.ravel())
        return jnp.concatenate(parts)

    def _final_j(self, k_scale: int = 1):
        if getattr(self, "_final_fn", None) is None:
            self._final_fn = {}
        if k_scale not in self._final_fn:
            self._final_fn[k_scale] = jax.jit(
                partial(self._final_traced, k_scale=k_scale))
        return self._final_fn[k_scale]

    def _parse_final(self, blob: np.ndarray, ranks, obj_scale: float,
                     k_scale: int = 1):
        """Unpack a _final_traced blob -> (dinf_l1, grams, tight).

        ``tight`` is the ARPACK-style acceptance of every cone's Ritz pair
        (residual ``|beta_k u_k[-1]| <= 1e-2 |lambda_min|``, or the residual
        is too small to move dinf by a status-relevant amount); a loose
        estimate is re-run by :meth:`dual_infeasibility` with a larger k.
        """
        total = 0.0
        off = 0
        tight = True
        # below this, a wrong lambda_min cannot shift dinf_l1 by more than
        # 0.1 * phase2Tol — irrelevant to the 5*tol status thresholds
        floor = (0.1 * self.params.phase2_tol * obj_scale
                 * (self.consts.c_nrm1 + 1.0))
        for ops in self.cones:
            k = min(self._lanczos_k(ops, k_scale), ops.n)
            alphas = blob[off: off + k]
            betas = blob[off + k: off + 2 * k]
            off += 2 * k
            lam_min, resid = tridiag_min_eig_resid(alphas, betas)
            if k < ops.n and resid > max(1e-2 * abs(lam_min), floor):
                tight = False
            total += abs(min(lam_min, 0.0))
        total += float(blob[off])
        off += 1
        grams = []
        for r in ranks:
            r = int(r)
            grams.append(blob[off: off + r * r].reshape(r, r)
                         .astype(np.float64))
            off += r * r
        total /= obj_scale
        total /= self.consts.c_nrm1 + 1.0
        return total, grams, tight

    def dual_infeasibility(self, dual, obj_scale: float,
                           U=None, V=None):
        """l1 dual infeasibility via Lanczos min-eig of each slack block
        (``calculate_dual_infeasibility_solver``, ``lorads_solver.c:1396``).

        Returns (dinf_l1, grams): the per-cone (U+V)/2 Gram matrices ride the
        same dispatch for final oracle-rank logging (negligible extra work).
        Restarts the recurrence with doubled k (up to 4x / 400) while any
        cone's Ritz residual fails the 1e-2 acceptance test.
        """
        if U is None:
            U = tuple(jnp.zeros((ops.n, 1), self.dtype) for ops in self.cones)
        if V is None:
            V = U
        k_scale = 1
        while True:
            blob = np.asarray(self._final_j(k_scale)(
                U, V, -dual, np.asarray(obj_scale, jnp.dtype(self.dtype)),
                jax.random.PRNGKey(7)))
            dinf, grams, tight = self._parse_final(
                blob, [u.shape[1] for u in U], obj_scale, k_scale)
            if tight or k_scale >= 4:
                return dinf, grams
            k_scale *= 2

    # ------------------------------------------------------------------ #

    def solve(self, logger: Optional[TrajectoryLogger] = None,
              json_path: Optional[str] = None) -> SolveResult:
        prob, params, dtype = self.prob, self.params, self.dtype
        if logger is None:
            logger = TrajectoryLogger(params, problem_name=prob.name,
                                      verbose=False)
        logger.open()
        t0 = time.time()

        stages: Dict[str, float] = {}
        _last = [time.perf_counter()]

        def mark(name: str) -> None:
            now = time.perf_counter()
            stages[name] = stages.get(name, 0.0) + (now - _last[0])
            _last[0] = now

        rank_state = make_rank_state(prob, params)
        dims = prob.block_dims

        R, rlp = init_factors(rank_state.ranks, dims, prob.n_lp_cols,
                              jax.random.PRNGKey(params.seed), dtype)
        R = self._place_factors(R)
        rho0 = (1.0 / np.sqrt(sum(dims))
                if params.init_rho == 0 else params.init_rho)

        alm, admm = self.phases(rank_state.ranks)
        carry = make_alm_carry(R, rlp, prob.m, alm.n_elems, rho0, params,
                               dtype)

        alm_outer = 0
        alm_inner_total = 0
        admm_it = 0
        cg_total = 0
        rho_max_cur = params.rho_max
        time_limit = False
        num_err = False
        intr = False          # graceful SIGINT (interrupt.install_sigint_handler)
        # host mirrors of traced scalars the control flow needs — kept in
        # sync by construction so the driver never pays a device round-trip
        # for a control decision (obj_scale only ever changes here)
        obj_scale_h = 1.0
        rho_h = rho0

        def f64_check(admm_c):
            """Re-evaluate the averaged ADMM iterate in f64 on the host.

            Debugging aid only (costs a full factor transfer per call): the
            device metrics already use compensated double-single reductions
            (ops/compsum.py), so the f32 gap no longer plateaus above
            tolerance and this check is off by default."""
            U_h, V_h, ulp_h, vlp_h, dual_h = jax.device_get(
                (admm_c.U, admm_c.V, admm_c.ulp, admm_c.vlp, admm_c.dual))
            U_h, V_h = self._factors_out(U_h), self._factors_out(V_h)
            dual_h = self._dual_out(dual_h)
            Ravg = tuple(0.5 * (np.asarray(u, np.float64)
                                + np.asarray(v, np.float64))
                         for u, v in zip(U_h, V_h))
            rlp_avg = (0.5 * (np.asarray(ulp_h, np.float64)
                              + np.asarray(vlp_h, np.float64))
                       if ulp_h is not None else None)
            return host_metrics_f64(prob, Ravg, Ravg, rlp_avg, rlp_avg,
                                    dual_h, obj_scale_h)

        f64_checker = (f64_check if dtype != jnp.float64
                       and params.host_f64_verify else None)

        def alm_record(row, k, inner, grams):
            logger.record_alm_row(row, k, inner, grams,
                                  sum(rank_state.ranks), time.time() - t0)

        def admm_record(stat_row, grams, it):
            logger.record_admm_row(stat_row, grams, it,
                                   sum(rank_state.ranks), prob.n_cones,
                                   time.time() - t0)

        # ===== fused main pass: ALM -> handoff -> ADMM -> certification = #
        # One dispatch / one readback per segment; in the common case
        # (no rank escalation, no reopt) the entire solve is ONE readback.
        key7 = jax.random.PRNGKey(7)
        with_grams = not params.disable_oracle
        admm_chunk = 50
        carry = alm.prepare(carry)
        ctrl = make_outer_ctrl(params, 1, 1, params.alm_rho_factor,
                               dtype=dtype)
        info = ALMOuterInfo(outer_iter=1)
        ainfo = ADMMInfo()
        admm_carry = None
        admm_rho = rho0 * params.heuristic_factor
        alm_gap_h = alm_pinf_h = admm_gap_h = admm_pinf_h = None
        # extra host mirrors of the final ADMM carry metrics: when all are
        # known the end-of-solve scalar fetch is skipped entirely
        admm_pinfinf_h = admm_pobj_h = admm_dobj_h = None
        admm_bad_iter = False
        dinf_parsed = None   # (dinf_l1, grams) from a fused final blob

        def mk_final_fn():
            """Chainable speculative certification pass for classic ADMM
            chunk loops: same _fused_final, flags pinned to the
            'ADMM ran' case."""
            ff = self._fused_final_j()
            flags_run = np.asarray([1.0, 0.0, 0.0, 0.0, 1.0],
                                   jnp.dtype(dtype))
            return lambda c, ct: ff(c, ct, flags_run, key7)

        while True:
            # three chained ASYNC dispatches (ALM segment; speculative
            # handoff+ADMM; speculative certification) followed by ONE
            # blocking readback — each piece compiles as its own small
            # XLA program (a single fused program was observed to take
            # ~10x longer to compile for zero runtime gain)
            step = alm._phase_step_j(
                "main", False, rank_state.is_rank_max,
                float(rank_state.stall_threshold(params)),
                int(params.max_alm_iter))
            ha = self._handoff_admm_j(rank_state.ranks, with_grams,
                                      admm_chunk)
            _td = time.perf_counter()
            carry, ctrl, n_alm, alm_buf = step(carry, ctrl)
            ac, actrl, admm_blob, flags = ha(
                carry, ctrl, np.asarray(rho_max_cur, jnp.dtype(dtype)))
            final_blob = self._fused_final_j()(ac, actrl, flags, key7)
            # ONE blocking readback for everything the host must decide on
            (n_alm_h, alm_rows, admm_blob_h, final_blob_h,
             flags_h) = jax.device_get(
                 (n_alm, alm_buf, admm_blob, final_blob, flags))
            if _TRACE_DISPATCH:
                print(f"[dispatch] fused seg {time.perf_counter()-_td:.3f}s"
                      f" n_alm={int(n_alm_h)}", flush=True)
            code = alm.parse_rows(alm_rows, int(n_alm_h), info, alm_record)
            if info.rho is not None:
                rho_h = info.rho
            if code == alm_mod.CODE_NUM_ERR:
                num_err = True
                alm_inner_total += info.inner_iter
                alm_outer = info.outer_iter
                logger.log("*Numerical Fail in ALM; continuing with best "
                           "iterate\n")
                break
            if code == alm_mod.CODE_ESCALATE:
                alm_inner_total += info.inner_iter
                alm_outer = info.outer_iter
                changed = rank_state.escalate(params.rank_update_factor)
                if changed:
                    logger.log(f"increase the rank -> {rank_state.ranks}\n")
                    R_new = self._place_factors(
                        pad_factor_tuple(carry.R, rank_state.ranks))
                    alm, admm = self.phases(rank_state.ranks)
                    carry = make_alm_carry(
                        R_new, carry.rlp, prob.m, alm.n_elems, rho_h,
                        params, dtype, dual=carry.dual,
                        obj_scale=obj_scale_h)
                    carry = alm.prepare(carry)
                else:
                    # at the rank cap: disable further escalation requests
                    rank_state.fixed = True
                ctrl = make_outer_ctrl(params, alm_outer, alm_outer,
                                       params.alm_rho_factor, dtype=dtype)
                info = ALMOuterInfo(outer_iter=alm_outer)
                continue
            if code == alm_mod.CODE_CONTINUE:
                # max-outer / work-budget boundary: just re-dispatch
                if (time.time() - t0 > params.time_sec_limit
                        or interrupt.interrupted()):
                    time_limit = time.time() - t0 > params.time_sec_limit
                    intr = interrupt.interrupted()
                    alm_inner_total += info.inner_iter
                    alm_outer = info.outer_iter
                    break
                continue

            # ---- ALM finished (CONVERGED or MAXITER) ----
            alm_inner_total += info.inner_iter
            alm_outer = info.outer_iter
            if code == alm_mod.CODE_MAXITER:
                info.rank_flag = 0

            run_admm_f, skip_conv_f, rho_max_f, admm_rho0_f, _ = (
                float(v) for v in flags_h)
            rho_max_cur = rho_max_f
            admm_rho = admm_rho0_f
            admm_carry = ac
            do_final_f = bool(skip_conv_f)
            alm_gap_h, alm_pinf_h = info.gap, info.pinf_l1
            if run_admm_f:
                admm_code, admm_it, admm_rho = admm.parse_blob(
                    admm_blob_h, ainfo, admm_record, chunk=admm_chunk,
                    with_grams=with_grams)
                cg_total = ainfo.cg_iters_total
                admm_gap_h, admm_pinf_h = ainfo.last_gap, ainfo.last_pinf
                admm_pinfinf_h = ainfo.last_pinf_inf
                admm_pobj_h, admm_dobj_h = ainfo.last_pobj, ainfo.last_dobj
                admm_bad_iter = admm_code == admm_mod.CODE_BAD_ITER
                num_err = num_err or admm_code == admm_mod.CODE_NUM_ERR
                do_final_f = admm_code != admm_mod.CODE_RUN
                if admm_code == admm_mod.CODE_RUN:
                    # fused chunk/budget exhausted: continue with the
                    # classic chunked ADMM driver from the same state
                    if time.time() - t0 > params.time_sec_limit:
                        time_limit = True
                    else:
                        admm_carry, admm_rho, admm_it, ainfo2 = admm.run(
                            admm_carry, admm_rho, admm_it,
                            params.max_admm_iter, t0, mode="main",
                            record_cb=admm_record, rho_max=rho_max_cur,
                            entry_gap=admm_gap_h, entry_pinf=admm_pinf_h,
                            f64_check=f64_checker, ctrl0=actrl,
                            with_grams=with_grams,
                            final_fn=mk_final_fn())
                        cg_total = ainfo2.cg_iters_total
                        admm_bad_iter = ainfo2.bad_iter
                        time_limit = time_limit or ainfo2.time_limit
                        intr = intr or ainfo2.interrupted
                        num_err = num_err or ainfo2.num_err
                        admm_gap_h = ainfo2.last_gap
                        admm_pinf_h = ainfo2.last_pinf
                        admm_pinfinf_h = ainfo2.last_pinf_inf
                        admm_pobj_h = ainfo2.last_pobj
                        admm_dobj_h = ainfo2.last_dobj
                        if ainfo2.final_blob is not None:
                            dinf_parsed = self._parse_final(
                                ainfo2.final_blob, rank_state.ranks,
                                obj_scale_h)
            else:
                # ADMM skipped: ALM already met phase2 tolerances
                admm_gap_h, admm_pinf_h = info.gap, info.pinf_l1
                admm_pinfinf_h = info.pinf_inf
                admm_pobj_h, admm_dobj_h = info.pobj, info.dobj
            if do_final_f:
                dinf_parsed = self._parse_final(
                    final_blob_h, rank_state.ranks, obj_scale_h)
            break

        if time.time() - t0 > params.time_sec_limit:
            time_limit = True
        if admm_carry is None:
            # num-err / time-limit exit before the fused handoff ran:
            # materialize the handoff state classically
            alm_rho = rho_h
            admm_rho = alm_rho * params.heuristic_factor
            if alm_rho > rho_max_cur:
                admm_rho = min(
                    np.sqrt(max(rho_max_cur, alm_rho) / rho_max_cur)
                    * rho_max_cur, alm_rho)
                rho_max_cur = admm_rho
            U = tuple(r for r in carry.R)
            V = tuple(jnp.array(r) for r in carry.R)
            ulp = carry.rlp
            vlp = jnp.array(carry.rlp) if carry.rlp is not None else None
            admm_carry = admm.init_carry(U, V, ulp, vlp, carry.dual,
                                         obj_scale_h)
            admm_carry = admm_carry._replace(
                pinf_l1=carry.pinf_l1, pinf_inf=carry.pinf_inf,
                gap=carry.gap)
            alm_gap_h, alm_pinf_h = info.gap, info.pinf_l1
        mark("fused_main")

        # =============== pure-feasibility certificate =================== #
        if self.feas_only and not num_err:
            # install the exact optimal dual λ = 0 (see __init__): pobj is
            # exactly 0 (C has no entries), so dobj = gap = 0 and the
            # certification below measures dinf of the ZERO dual (= 0).
            # The reopt loops then run only while pinf > tol.
            zero = jnp.zeros_like(admm_carry.gap)
            admm_carry = admm_carry._replace(
                dual=jnp.zeros_like(admm_carry.dual),
                pobj=zero, dobj=zero, gap=zero)
            admm_pobj_h = admm_dobj_h = admm_gap_h = 0.0
            alm_gap_h = 0.0
            dinf_parsed = None      # stale: was computed for the ALM dual

        # =============== f64 polish ===================================== #
        # The f32 ADMM fixed point is accuracy-bounded by its f32 CG
        # residuals (~1e-5 relative): on skewed instances (shmup4) pinf_l1
        # plateaus a hair above phase2Tol while rho escalates into dual
        # oscillation.  When the iterate is NEAR tolerance but not certifed,
        # rerun a bounded float64 ADMM from the same iterate — emulated f64
        # on TPU is ~10x per flop, irrelevant for the small-n instances
        # where this fires, and it only runs when the solve would
        # otherwise fail.  No reference equivalent (the reference is
        # all-double, lorads_alg_common.c).
        def try_polish():
            nonlocal admm_carry, admm_rho, admm_it, cg_total, time_limit
            nonlocal intr, num_err, admm_gap_h, admm_pinf_h, admm_pinfinf_h
            nonlocal admm_pobj_h, admm_dobj_h, dinf_parsed
            p = params
            if not p.f64_polish or dtype == jnp.float64:
                return False
            if time_limit or num_err or intr:
                return False
            if None in (admm_gap_h, admm_pinf_h):
                d_gap, d_pinf = _fetch(admm_carry.gap, admm_carry.pinf_l1)
            else:
                d_gap, d_pinf = admm_gap_h, admm_pinf_h
            tol = p.phase2_tol
            if d_gap <= tol and d_pinf <= tol:
                return False            # already certified
            if d_pinf > 1e2 * tol:
                # too far: not a precision plateau.  The gap is NOT vetoed
                # — under f32 dual oscillation the last-chunk gap snapshot
                # is unreliable (it swings 1e-5..1e-1 per iteration);
                # near-feasibility is the plateau signal.
                return False
            admm64 = self._phases64([u.shape[1] for u in admm_carry.U])
            c64 = admm64.init_carry(
                tuple(jnp.asarray(u, jnp.float64) for u in admm_carry.U),
                tuple(jnp.asarray(v, jnp.float64) for v in admm_carry.V),
                None if admm_carry.ulp is None
                else jnp.asarray(admm_carry.ulp, jnp.float64),
                None if admm_carry.vlp is None
                else jnp.asarray(admm_carry.vlp, jnp.float64),
                jnp.asarray(admm_carry.dual, jnp.float64), obj_scale_h)
            ceiling = admm_it + min(3000, p.max_admm_iter)
            # re-enter at a moderate rho: the f32 phase may have escalated
            # rho to ~1e6 chasing its own noise, and f64 ADMM converges
            # fastest from a sane penalty
            rho_in = min(admm_rho, p.rho_max)
            c64, rho2, it2, pinfo = admm64.run(
                c64, rho_in, admm_it, ceiling, t0,
                mode="reopt", record_cb=admm_record,
                rho_max=max(rho_max_cur, p.rho_max),
                with_grams=with_grams)
            admm_it = it2
            cg_total += pinfo.cg_iters_total
            time_limit = time_limit or pinfo.time_limit
            intr = intr or pinfo.interrupted
            num_err = num_err or pinfo.num_err
            admm_rho = rho2
            admm_carry = admm_carry._replace(
                U=tuple(jnp.asarray(u, dtype) for u in c64.U),
                V=tuple(jnp.asarray(v, dtype) for v in c64.V),
                ulp=None if c64.ulp is None else jnp.asarray(c64.ulp, dtype),
                vlp=None if c64.vlp is None else jnp.asarray(c64.vlp, dtype),
                dual=jnp.asarray(c64.dual, dtype))
            # trust the f64 carry metrics as the host mirrors
            (admm_pobj_h, admm_dobj_h, admm_pinf_h, admm_pinfinf_h,
             admm_gap_h) = _fetch(c64.pobj, c64.dobj, c64.pinf_l1,
                                  c64.pinf_inf, c64.gap)
            dinf_parsed = None
            return True

        try_polish()
        mark("f64_polish")

        # =============== reopt rounds =================================== #
        def sync_alm_from_admm(c_alm, c_admm):
            Ravg = tuple(0.5 * (u + v) for u, v in zip(c_admm.U, c_admm.V))
            rlp_avg = (0.5 * (c_admm.ulp + c_admm.vlp)
                       if c_admm.ulp is not None else None)
            return c_alm._replace(
                R=Ravg, rlp=rlp_avg, dual=c_admm.dual,
                obj_scale=c_admm.obj_scale,
                pinf_l1=c_admm.pinf_l1, pinf_inf=c_admm.pinf_inf,
                gap=c_admm.gap, pobj=c_admm.pobj, dobj=c_admm.dobj)

        def do_reopt(c_alm, c_admm, reopt_alm_iter, reopt_admm_iter, level):
            nonlocal alm_outer, alm_inner_total, admm_it, cg_total
            nonlocal rho_max_cur, admm_rho, admm_bad_iter, time_limit, num_err
            nonlocal intr, alm, admm
            nonlocal obj_scale_h, alm_gap_h, alm_pinf_h
            nonlocal admm_gap_h, admm_pinf_h
            nonlocal admm_pinfinf_h, admm_pobj_h, admm_dobj_h, dinf_parsed
            # factors/duals are about to change: any previously parsed
            # certification blob is stale
            dinf_parsed = None
            p = params
            scale = 5.0
            c_alm = c_alm._replace(
                obj_scale=c_alm.obj_scale * scale, dual=c_alm.dual * scale)
            obj_scale_h *= scale
            if admm_rho <= rho_max_cur:
                c_alm = c_alm._replace(
                    rho=jnp.maximum(np.asarray(admm_rho, jnp.dtype(dtype)),
                                    c_alm.rho))
            # reopt ALM with in-loop rank escalation: the reference's reopt
            # ALM calls AUG_RANK and restarts at ALG_START when the
            # difficulty grades accumulate (``lorads_alm.c:1175-1185``) —
            # critical on theta-family instances whose optimal rank exceeds
            # the initial heuristic (the main phase can exit at a
            # too-low rank and only the reopt rounds can grow it).
            while True:
                max_alm = reopt_alm_iter - 1 + alm_outer
                carry2, info = alm.run(
                    c_alm, alm_outer, t0, mode="reopt", early_stop=True,
                    rho_update_factor=float(np.sqrt(p.alm_rho_factor)),
                    max_alm_iter=max_alm, record_cb=alm_record,
                    is_rank_max=rank_state.is_rank_max,
                    rank_thresh=rank_state.stall_threshold(params))
                alm_outer = info.outer_iter
                alm_inner_total += info.inner_iter
                num_err = num_err or info.num_err
                time_limit = time_limit or info.time_limit
                intr = intr or info.interrupted
                if info.rho is not None:
                    alm_rho2 = info.rho
                else:
                    alm_rho2 = _fetch(carry2.rho)[0]
                if not info.escalate or num_err or time_limit or intr:
                    break
                if not rank_state.escalate(params.rank_update_factor):
                    # at the rank cap: disable further requests, resume
                    rank_state.fixed = True
                    c_alm = carry2
                    continue
                logger.log(f"increase the rank -> {rank_state.ranks}\n")
                R_new = self._place_factors(
                    pad_factor_tuple(carry2.R, rank_state.ranks))
                alm, admm = self.phases(rank_state.ranks)
                c_alm = make_alm_carry(
                    R_new, carry2.rlp, prob.m, alm.n_elems, alm_rho2,
                    params, dtype, dual=carry2.dual,
                    obj_scale=obj_scale_h)
            alm_gap_h, alm_pinf_h = info.gap, info.pinf_l1
            scale2 = obj_scale_h
            rho_max_cur = max(
                np.sqrt(max(admm_rho, alm_rho2) / admm_rho) * admm_rho,
                rho_max_cur)
            U = tuple(r for r in carry2.R)
            V = tuple(jnp.array(r) for r in carry2.R)
            ulp2 = carry2.rlp
            vlp2 = jnp.array(carry2.rlp) if carry2.rlp is not None else None
            rho2 = alm_rho2 * p.heuristic_factor
            if alm_rho2 > rho_max_cur:
                rho2 = min(
                    np.sqrt(max(rho_max_cur, alm_rho2) / rho_max_cur)
                    * rho_max_cur, alm_rho2)
                rho_max_cur = rho2
            c_admm = admm.init_carry(U, V, ulp2, vlp2, carry2.dual, scale2)
            if (not admm_bad_iter) or level < 2:
                ceiling = min(admm_it * 4, admm_it + p.max_admm_iter)
                ceiling = max(ceiling, admm_it + reopt_admm_iter)
                # level >= 2 always re-averages U/V and recomputes dual
                # infeasibility after this call, so speculative in-chunk
                # certification would be paid for and discarded
                c_admm, rho2, admm_it2, ainfo = admm.run(
                    c_admm, rho2, admm_it, ceiling, t0, mode="reopt",
                    record_cb=admm_record, rho_max=rho_max_cur,
                    entry_gap=alm_gap_h, entry_pinf=alm_pinf_h,
                    f64_check=f64_checker,
                    with_grams=not params.disable_oracle,
                    final_fn=mk_final_fn() if level < 2 else None)
                cg_total += ainfo.cg_iters_total
                admm_bad_iter = ainfo.bad_iter
                time_limit = time_limit or ainfo.time_limit
                intr = intr or ainfo.interrupted
                num_err = num_err or ainfo.num_err
                admm_it = admm_it2
                admm_gap_h, admm_pinf_h = ainfo.last_gap, ainfo.last_pinf
                admm_pinfinf_h = ainfo.last_pinf_inf
                admm_pobj_h, admm_dobj_h = ainfo.last_pobj, ainfo.last_dobj
                if ainfo.final_blob is not None:
                    dinf_parsed = self._parse_final(
                        ainfo.final_blob, rank_state.ranks, obj_scale_h)
            admm_rho = rho2
            return carry2, c_admm

        p = params
        alm_reopt_min_iter = 3
        admm_reopt_min_iter = 1000 if p.high_acc_mode else 50

        if p.reopt_level >= 1 and not time_limit and not num_err \
                and not intr:
            cnt = 0
            while True:
                if None in (alm_gap_h, alm_pinf_h, admm_gap_h, admm_pinf_h):
                    a_gap, a_pinf, d_gap, d_pinf = _fetch(
                        carry.gap, carry.pinf_l1, admm_carry.gap,
                        admm_carry.pinf_l1)
                else:
                    a_gap, a_pinf = alm_gap_h, alm_pinf_h
                    d_gap, d_pinf = admm_gap_h, admm_pinf_h
                if not ((a_gap > p.phase2_tol or a_pinf > p.phase2_tol)
                        and (d_gap > p.phase2_tol or d_pinf > p.phase2_tol)):
                    break
                if cnt >= 1:
                    break
                carry = sync_alm_from_admm(carry, admm_carry)
                carry, admm_carry = do_reopt(
                    carry, admm_carry, alm_reopt_min_iter,
                    admm_reopt_min_iter, 1)
                cnt += 1
                if time.time() - t0 > p.time_sec_limit:
                    time_limit = True
                    break

        mark("reopt1")

        if self.feas_only and not num_err:
            # a reopt round may have re-evolved the internal dual;
            # re-install the exact λ = 0 certificate before certification
            zero = jnp.zeros_like(admm_carry.gap)
            admm_carry = admm_carry._replace(
                dual=jnp.zeros_like(admm_carry.dual),
                pobj=zero, dobj=zero, gap=zero)
            admm_pobj_h = admm_dobj_h = admm_gap_h = 0.0
            dinf_parsed = None

        # dual infeasibility certification (already computed inside the
        # fused dispatch when the main pass ended there)
        scale_now = obj_scale_h
        if dinf_parsed is not None and dinf_parsed[2]:
            dinf_l1, final_grams = dinf_parsed[:2]
        else:
            # no speculative blob, or its Lanczos residual check failed:
            # (re)certify with the restarting recurrence
            dinf_l1, final_grams = self.dual_infeasibility(
                admm_carry.dual, scale_now, admm_carry.U, admm_carry.V)
        dinf_inf = dinf_l1 * (1 + self.consts.c_nrm1) / (
            1 + self.consts.c_nrminf)
        mark("dinf")

        if p.reopt_level >= 2 and not time_limit and not num_err \
                and not intr:
            dual_cnt = 0
            while True:
                if None in (admm_gap_h, admm_pinf_h):
                    d_gap, d_pinf = _fetch(admm_carry.gap, admm_carry.pinf_l1)
                else:
                    d_gap, d_pinf = admm_gap_h, admm_pinf_h
                if not (dinf_l1 > p.phase2_tol or d_gap > p.phase2_tol
                        or d_pinf > p.phase2_tol):
                    break
                if dual_cnt >= 2:
                    break
                if (not p.high_acc_mode
                        and dinf_l1 <= 5 * p.phase2_tol
                        and d_gap <= 5 * p.phase2_tol
                        and d_pinf <= p.phase2_tol):
                    break
                carry = sync_alm_from_admm(carry, admm_carry)
                carry, admm_carry = do_reopt(carry, admm_carry, 3, 50, 2)
                Ravg = tuple(0.5 * (u + v)
                             for u, v in zip(admm_carry.U, admm_carry.V))
                admm_carry = admm_carry._replace(U=Ravg, V=Ravg)
                if admm_carry.ulp is not None:
                    lp_avg = 0.5 * (admm_carry.ulp + admm_carry.vlp)
                    admm_carry = admm_carry._replace(ulp=lp_avg, vlp=lp_avg)
                admm_carry = admm._metrics_j(admm_carry)
                # metrics changed on device: invalidate the host mirrors
                admm_gap_h = admm_pinf_h = None
                admm_pinfinf_h = admm_pobj_h = admm_dobj_h = None
                scale_now = obj_scale_h
                dinf_l1, final_grams = self.dual_infeasibility(
                    admm_carry.dual, scale_now, admm_carry.U, admm_carry.V)
                dinf_inf = dinf_l1 * (1 + self.consts.c_nrm1) / (
                    1 + self.consts.c_nrminf)
                dual_cnt += 1
                if time.time() - t0 > p.time_sec_limit:
                    time_limit = True
                    break

        mark("reopt2")

        if try_polish():
            # the polish moved the iterate: re-certify dual feasibility
            dinf_l1, final_grams = self.dual_infeasibility(
                admm_carry.dual, obj_scale_h, admm_carry.U, admm_carry.V)
            dinf_inf = dinf_l1 * (1 + self.consts.c_nrm1) / (
                1 + self.consts.c_nrminf)
        mark("polish2")

        # =============== status + outputs =============================== #
        # ONE batched device->host pull of the scalar metrics (device values
        # use compensated reductions, so they are trusted as-is); the full
        # factor transfer happens only when the caller asked for factors or
        # a host-side f64 re-verification
        want_factors = params.return_factors or (
            params.host_f64_verify and dtype != jnp.float64)
        if None in (admm_gap_h, admm_pinf_h, admm_pinfinf_h,
                    admm_pobj_h, admm_dobj_h):
            (gap, pinf_l1, pinf_inf, pobj, dobj) = _fetch(
                admm_carry.gap, admm_carry.pinf_l1, admm_carry.pinf_inf,
                admm_carry.pobj, admm_carry.dobj)
        else:
            # every scalar is already mirrored on the host from the last
            # ADMM blob header (or the ALM stats row): no readback needed
            gap, pinf_l1, pinf_inf = admm_gap_h, admm_pinf_h, admm_pinfinf_h
            pobj, dobj = admm_pobj_h, admm_dobj_h
        U_h = V_h = ulp_h = vlp_h = dual_h = None
        if want_factors:
            U_h, V_h, ulp_h, vlp_h, dual_h = jax.device_get(
                (admm_carry.U, admm_carry.V, admm_carry.ulp,
                 admm_carry.vlp, admm_carry.dual))
            # convert to the problem's original row / constraint order
            U_h, V_h = self._factors_out(U_h), self._factors_out(V_h)
            dual_h = self._dual_out(dual_h)
        if params.host_f64_verify and dtype != jnp.float64:
            # debugging aid: recompute the final DIMACS errors in f64 numpy
            Ravg = tuple(0.5 * (np.asarray(u, np.float64)
                                + np.asarray(v, np.float64))
                         for u, v in zip(U_h, V_h))
            rlp_avg = (0.5 * (np.asarray(ulp_h, np.float64)
                              + np.asarray(vlp_h, np.float64))
                       if ulp_h is not None else None)
            pobj, dobj, pinf_l1, pinf_inf, gap = host_metrics_f64(
                prob, Ravg, Ravg, rlp_avg, rlp_avg, dual_h, obj_scale_h)

        if dinf_l1 <= 5 * p.phase2_tol and gap <= 5 * p.phase2_tol and \
                pinf_l1 <= p.phase2_tol:
            status = SolverStatus.PRIMAL_DUAL_OPTIMAL
        elif gap <= 5 * p.phase2_tol and pinf_l1 <= p.phase2_tol:
            status = SolverStatus.PRIMAL_OPTIMAL
        else:
            status = SolverStatus.MAXITER
        if time_limit:
            status = SolverStatus.TIME_LIMIT

        solve_time = time.time() - t0
        if (params.oracle_rank_method == OracleRankMethod.NAIVE
                and any(c.n <= 2000 for c in prob.cones)):
            # full-matrix oracle (reference lorads_logging.c:406-451)
            oracle = logger.oracle_rank(admm_carry.U, 2, avg_with=admm_carry.V)
        else:
            # Gram spectra already rode the dual-infeasibility dispatch
            oracle = logger.oracle_from_grams(final_grams)

        if json_path:
            logger.write_json(
                json_path, oracle, pobj, dobj, pinf_l1, pinf_inf, gap,
                solve_time, rho_max_cur, p.heuristic_factor)
        logger.close()
        mark("outputs")

        return SolveResult(
            status=status, pobj=pobj, dobj=dobj, pinf_l1=pinf_l1,
            pinf_inf=pinf_inf, gap=gap, dinf_l1=dinf_l1, dinf_inf=dinf_inf,
            solve_time=solve_time, alm_outer_iters=alm_outer,
            alm_inner_iters=alm_inner_total, admm_iters=admm_it,
            cg_iters=cg_total, final_ranks=list(rank_state.ranks),
            oracle_rank=oracle, logger=logger, stage_times=stages,
            U=U_h, V=V_h, ulp=ulp_h, vlp=vlp_h, dual=dual_h,
            obj_scale=obj_scale_h)


def solve(
    prob: SDPProblem,
    params: Optional[SolverParams] = None,
    logger: Optional[TrajectoryLogger] = None,
    json_path: Optional[str] = None,
) -> SolveResult:
    """One-shot convenience wrapper; for repeated solves build a
    :class:`Solver` once and call ``.solve()``."""
    return Solver(prob, params).solve(logger=logger, json_path=json_path)
