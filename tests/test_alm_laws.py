"""Direct unit tests of the ALM control laws (synthetic carries, no solves).

Covers the branch points of:

* rho-factor dampening breakpoints  (``lorads_alm.c:1410-1419``)
* difficulty grading brackets + the f32 tau-stall grading adaptation
  (``lorads_alm.c:1252-1281``; ``alm.py:_sub_normal``)
* EMA stall gate — reference breaks the sub-loop when the EMA change is
  OUTSIDE the threshold band (``lorads_utils.c:564-590``,
  ``lorads_alm.c:1028-1032``)
* the f32 l_inf-floor escape gate (p1_stall tracking + the pinf_l1
  convergence alternative in ``_outer_tail``)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ltr_lowrank_sdp_tpu.config import SolverParams
from ltr_lowrank_sdp_tpu.ops.coneops import build_cone_ops
from ltr_lowrank_sdp_tpu.solver.alm import (
    ALMPhase, CODE_CONTINUE, CODE_CONVERGED, PassStats, make_alm_carry,
    make_outer_ctrl,
)
from ltr_lowrank_sdp_tpu.solver.common import ProblemConsts, init_factors
from ltr_lowrank_sdp_tpu.testing import random_maxcut_problem

N, R = 16, 3


def build_phase(params: SolverParams, row_nrm2: float = 1.0):
    """Tiny MaxCut ALMPhase + a prepared carry whose A(RR^T) row values
    are exactly ``row_nrm2`` (diag constraints -> pinf is controlled)."""
    import jax

    prob = random_maxcut_problem(N, avg_degree=4, seed=3)
    cones, lp = build_cone_ops(prob)
    consts = ProblemConsts.from_problem(prob)
    shapes = [(N, R)]
    phase = ALMPhase(cones, lp, jnp.asarray(prob.b), consts, params, shapes,
                     prob.n_lp_cols)
    Rf, rlp = init_factors([R], [N], 0, jax.random.PRNGKey(0))
    # normalize rows to sqrt(row_nrm2): diag(RR^T) = row_nrm2 exactly
    Rm = np.asarray(Rf[0])
    Rm = Rm / np.linalg.norm(Rm, axis=1, keepdims=True) * np.sqrt(row_nrm2)
    carry = make_alm_carry((jnp.asarray(Rm),), rlp, prob.m, phase.n_elems,
                           1.0, params)
    carry = phase.prepare(carry)
    return phase, carry


def outer_tail(phase, carry, ctrl, **kw):
    kw.setdefault("mode", "main")
    kw.setdefault("early_stop", False)
    kw.setdefault("is_rank_max", True)
    kw.setdefault("rank_thresh", 15.0)
    return phase._outer_tail(carry, ctrl, **kw)


# --------------------------------------------------------------------- #
# rho dampening breakpoints
# --------------------------------------------------------------------- #

@pytest.mark.parametrize("rho0,flag0,expect_flag,expect_damp", [
    (5e4, 0, 4, True),      # first breakpoint: rho >= 5e4, flag < 4
    (5e4, 4, 4, False),     # already latched at 4 -> no re-fire
    (5e6, 4, 6, True),      # second breakpoint
    (5e8, 6, 8, True),      # third breakpoint
    (5e8, 8, 8, False),     # fully latched
    (1e3, 0, 0, False),     # below every breakpoint
])
def test_rho_dampening_breakpoints(rho0, flag0, expect_flag, expect_damp):
    # raise the rho ceiling so the 5e8 breakpoint is reachable (the
    # default ceiling 1e8 clamps the do-while first)
    params = SolverParams(rho_ceiling_alm=1e12)
    phase, carry = build_phase(params, row_nrm2=1.5)
    # large cert_val -> the UpdateRho do-while exits after ONE multiply
    carry = carry._replace(
        rho=jnp.asarray(rho0 / 2.0, carry.rho.dtype),
        cert_val=jnp.asarray(1e6, carry.cert_val.dtype))
    f0 = 2.0
    ctrl = make_outer_ctrl(params, 3, 1, f0)
    ctrl = ctrl._replace(rho_factor_flag=np.asarray(flag0, np.int32))
    carry2, ctrl2 = outer_tail(phase, carry, ctrl)
    assert float(carry2.rho) == pytest.approx(rho0, rel=1e-12)
    assert int(ctrl2.rho_factor_flag) == expect_flag
    if expect_damp:
        assert float(ctrl2.rho_update_factor) == pytest.approx(
            f0 ** 0.25, rel=1e-6)
    else:
        assert float(ctrl2.rho_update_factor) == pytest.approx(f0)
    assert int(ctrl2.k) == 4    # outer counter advanced


def test_rho_dampening_skipped_when_not_continuing():
    """A converged/num-err outer iteration must NOT touch rho."""
    params = SolverParams()
    phase, carry = build_phase(params, row_nrm2=1.5)
    carry = carry._replace(cert_val=jnp.asarray(1e6, carry.cert_val.dtype))
    ctrl = make_outer_ctrl(params, 3, 1, 2.0)
    ctrl = ctrl._replace(code=np.asarray(CODE_CONVERGED, np.int32))
    rho_before = float(carry.rho)
    carry2, ctrl2 = outer_tail(phase, carry, ctrl)
    assert float(carry2.rho) == pytest.approx(rho_before)


# --------------------------------------------------------------------- #
# difficulty grading brackets (+ f32 tau-stall adaptation)
# --------------------------------------------------------------------- #

def sub_normal(phase, carry, ctrl, stats: PassStats, p1_guard=False):
    """Call _sub_normal with _inner_pass stubbed to return ``stats``."""
    phase._p1_guard = p1_guard
    phase._inner_pass = lambda c, ev, p1_floor=False, allow_early=True: \
        (c, stats)
    return phase._sub_normal((carry, ctrl), early_variant=False,
                             rank_thresh=15.0, is_rank_max=False)


def mkstats(local, num_err=False, tau_small=False, early=False):
    return PassStats(
        local_iter=jnp.asarray(local, jnp.int32),
        num_err=jnp.asarray(num_err),
        tau_small=jnp.asarray(tau_small),
        early_exit=jnp.asarray(early))


def ready_ctrl(params, flag=0):
    """A ctrl that passes every stop check (sub-loop will run_inner)."""
    ctrl = make_outer_ctrl(params, 3, 1, 2.0)
    return ctrl._replace(rank_flag=np.asarray(flag, np.int32))


@pytest.mark.parametrize("local,flag0,expect_flag,expect_cont", [
    (10, 7, 0, False),     # easy pass (<=20 iters) RESETS the flag
    (50, 7, 9, True),      # 21..100 -> +2, difficulty loop continues
    (150, 0, 3, True),     # 101..399 -> +3
    (450, 0, 4, True),     # >=400 -> +4
])
def test_difficulty_grading_brackets(local, flag0, expect_flag, expect_cont):
    params = SolverParams()
    phase, carry = build_phase(params)
    carry = carry._replace(cert_val=jnp.asarray(1.0, carry.cert_val.dtype),
                           cert_tol=jnp.asarray(1e-9, carry.cert_tol.dtype))
    ctrl = ready_ctrl(params, flag=flag0)
    carry2, ctrl2, cont = sub_normal(phase, carry, ctrl, mkstats(local))
    assert int(ctrl2.rank_flag) == expect_flag
    assert bool(cont) == expect_cont
    assert int(ctrl2.inner_total) == local


def test_tau_stall_grading_f32_vs_f64():
    """tau-small passes: ungraded in f64 (reference goto UpdateRho);
    graded-but-never-reset under the f32 guard, and always end the loop."""
    params = SolverParams()
    phase, carry = build_phase(params)
    carry = carry._replace(cert_val=jnp.asarray(1.0, carry.cert_val.dtype),
                           cert_tol=jnp.asarray(1e-9, carry.cert_tol.dtype))
    # f64 semantics: tau-small is ungraded, flag untouched
    _, ctrl2, cont = sub_normal(phase, carry, ready_ctrl(params, flag=5),
                                mkstats(450, tau_small=True), p1_guard=False)
    assert int(ctrl2.rank_flag) == 5
    assert not bool(cont)
    # f32 guard: a long grind ending in a dead step accumulates +4 ...
    _, ctrl2, cont = sub_normal(phase, carry, ready_ctrl(params, flag=5),
                                mkstats(450, tau_small=True), p1_guard=True)
    assert int(ctrl2.rank_flag) == 9
    assert not bool(cont)           # ... but still ends the difficulty loop
    # ... and a QUICK tau-small exit must never RESET the flag
    _, ctrl2, cont = sub_normal(phase, carry, ready_ctrl(params, flag=5),
                                mkstats(5, tau_small=True), p1_guard=True)
    assert int(ctrl2.rank_flag) == 5
    assert not bool(cont)


def test_num_err_and_early_exit_are_ungraded():
    params = SolverParams()
    phase, carry = build_phase(params)
    carry = carry._replace(cert_val=jnp.asarray(1.0, carry.cert_val.dtype),
                           cert_tol=jnp.asarray(1e-9, carry.cert_tol.dtype))
    from ltr_lowrank_sdp_tpu.solver.alm import CODE_NUM_ERR

    _, ctrl2, cont = sub_normal(phase, carry, ready_ctrl(params, flag=5),
                                mkstats(450, num_err=True))
    assert int(ctrl2.rank_flag) == 5 and int(ctrl2.code) == CODE_NUM_ERR
    _, ctrl2, cont = sub_normal(phase, carry, ready_ctrl(params, flag=5),
                                mkstats(450, early=True))
    assert int(ctrl2.rank_flag) == 5 and int(ctrl2.code) == CODE_CONVERGED


# --------------------------------------------------------------------- #
# EMA stall gate
# --------------------------------------------------------------------- #

def test_ema_gate_breaks_on_out_of_band_change():
    """Reference semantics: the sub-loop BREAKS when the EMA's relative
    change falls OUTSIDE ±0.005 (``lorads_alm.c:1029-1032``)."""
    params = SolverParams()
    phase, carry = build_phase(params)
    carry = carry._replace(cert_val=jnp.asarray(1.0, carry.cert_val.dtype),
                           cert_tol=jnp.asarray(1e-9, carry.cert_tol.dtype))
    # counter at the evaluation interval, old EMA far from current ->
    # change is out of band -> stop (inner pass NOT run)
    ctrl = ready_ctrl(params)._replace(
        ema_counter=np.asarray(5, np.int32),
        ema_old=np.asarray(100.0, np.float64),
        ema_cur=np.asarray(1.0, np.float64))
    _, ctrl2, cont = sub_normal(phase, carry, ctrl, mkstats(50))
    assert int(ctrl2.inner_total) == 0      # run_inner skipped
    assert not bool(cont)
    # bookkeeping at the check: old <- cur, counter resets to 1
    assert float(ctrl2.ema_old) == pytest.approx(float(ctrl2.ema_cur))
    assert int(ctrl2.ema_counter) == 1

    # in-band change -> the loop continues (inner pass runs)
    ema = 0.1 * 1.0 + 0.9 * 1.0005     # new ema, ~0.04% off old
    ctrl = ready_ctrl(params)._replace(
        ema_counter=np.asarray(5, np.int32),
        ema_old=np.asarray(ema * 1.0001, np.float64),
        ema_cur=np.asarray(1.0005, np.float64))
    _, ctrl2, _ = sub_normal(phase, carry, ctrl, mkstats(50))
    assert int(ctrl2.inner_total) == 50     # run_inner executed

    # before the interval (counter < 5) the check never fires
    ctrl = ready_ctrl(params)._replace(
        ema_counter=np.asarray(2, np.int32),
        ema_old=np.asarray(100.0, np.float64))
    _, ctrl2, _ = sub_normal(phase, carry, ctrl, mkstats(50))
    assert int(ctrl2.inner_total) == 50
    assert int(ctrl2.ema_counter) == 3


# --------------------------------------------------------------------- #
# f32 l_inf-floor escape gate
# --------------------------------------------------------------------- #

def test_p1_stall_tracks_5pct_improvement():
    params = SolverParams()
    # row_nrm2 = 1.5 -> every diag constraint misses by 0.5 -> fixed pinf
    phase, carry = build_phase(params, row_nrm2=1.5)
    carry = carry._replace(cert_val=jnp.asarray(1e6, carry.cert_val.dtype))
    pinf_inf_now = float(phase._metrics(carry).pinf_inf)

    # best so far much worse -> improved -> stall resets, best updates
    ctrl = make_outer_ctrl(params, 3, 1, 2.0)._replace(
        best_pinf_inf=np.asarray(10 * pinf_inf_now, np.float64),
        p1_stall=np.asarray(2, np.int32))
    _, ctrl2 = outer_tail(phase, carry, ctrl)
    assert int(ctrl2.p1_stall) == 0
    assert float(ctrl2.best_pinf_inf) == pytest.approx(pinf_inf_now,
                                                       rel=1e-9)

    # best so far within 5% -> NOT improved -> stall increments
    ctrl = make_outer_ctrl(params, 3, 1, 2.0)._replace(
        best_pinf_inf=np.asarray(pinf_inf_now * 1.01, np.float64),
        p1_stall=np.asarray(2, np.int32))
    _, ctrl2 = outer_tail(phase, carry, ctrl)
    assert int(ctrl2.p1_stall) == 3
    # best is a running min: a <5% gain still updates it (just not the
    # stall counter)
    assert float(ctrl2.best_pinf_inf) == pytest.approx(pinf_inf_now,
                                                       rel=1e-9)


def test_floor_gate_conv_alternative_requires_guard_and_stall():
    """phase-1 exit via the pinf_l1 alternative fires ONLY when the f32
    guard is on AND 3+ stalled outers certified a floor AND pinf_l1 is
    already below the FINAL tolerance."""
    # phase1_tol tighter than the achievable l_inf; phase2_tol above the
    # achieved pinf_l1 -> only the alternative can declare convergence
    params = SolverParams(phase1_tol=1e-9, phase2_tol=1e-1,
                          high_acc_mode=False)
    phase, carry = build_phase(params, row_nrm2=1.0 + 1e-4)
    carry = carry._replace(cert_val=jnp.asarray(1e6, carry.cert_val.dtype))
    m = phase._metrics(carry)
    assert float(m.pinf_inf) > params.phase1_tol     # phase-1 bar unreachable
    assert float(m.pinf_l1) <= params.phase2_tol     # final bar already met

    def run(guard, stall):
        phase._p1_guard = guard
        ctrl = make_outer_ctrl(params, 3, 1, 2.0)._replace(
            best_pinf_inf=np.asarray(float(m.pinf_inf), np.float64),
            p1_stall=np.asarray(stall, np.int32))
        _, ctrl2 = outer_tail(phase, carry, ctrl)
        return int(ctrl2.code)

    assert run(guard=True, stall=3) == CODE_CONVERGED     # gate fires
    assert run(guard=True, stall=1) == CODE_CONTINUE      # no floor yet
    assert run(guard=False, stall=3) == CODE_CONTINUE     # f64: never


def test_min_k_blocks_early_phase1_exit():
    """After a binding-rank escalation the driver sets min_k: no phase-1
    exit before k reaches it, even with pinf under tolerance."""
    # phase1_tol loose enough that the feasible iterate passes phase 1,
    # but NOT so loose that the gap<=tol*1e-3 super-convergence bypass
    # fires (gap stays O(1) here: dual = 0 -> dobj = 0)
    params = SolverParams(phase1_tol=1e-1, high_acc_mode=False)
    phase, carry = build_phase(params, row_nrm2=1.0)  # feasible iterate
    carry = carry._replace(cert_val=jnp.asarray(1e6, carry.cert_val.dtype))
    ctrl = make_outer_ctrl(params, 3, 1, 2.0, min_k=10)
    _, ctrl2 = outer_tail(phase, carry, ctrl)
    assert int(ctrl2.code) == CODE_CONTINUE
    ctrl = make_outer_ctrl(params, 12, 1, 2.0, min_k=10)
    _, ctrl2 = outer_tail(phase, carry, ctrl)
    assert int(ctrl2.code) == CODE_CONVERGED


def test_schedule_exhaustion_falls_back_to_heuristic():
    """An injected schedule is a PREFIX guide: once exhausted, continued
    stalling resumes the default rankUpdateFactor escalation instead of
    pinning the rank at the last entry (released-binary behavior past the
    schedule end is unobservable -- no source; SURVEY 2.2)."""
    from ltr_lowrank_sdp_tpu.solver.rank import RankState

    st = RankState(ranks=[13], rank_caps=[200], schedule=[13, 28])
    assert st.escalate(1.5)                  # 13 -> 28 (schedule entry)
    assert st.ranks == [28]
    assert st.escalate(1.5)                  # exhausted -> 28*1.5 = 42
    assert st.ranks == [42]
    assert st.escalate(1.5)                  # keeps escalating to the cap
    assert st.ranks == [63]
    st2 = RankState(ranks=[190], rank_caps=[200], schedule=[190])
    st2.escalate(1.5)
    assert st2.ranks == [200]                # cap still binds
