import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltr_lowrank_sdp_tpu.config import SolverParams
from ltr_lowrank_sdp_tpu.problem import load_problem, initial_ranks
from ltr_lowrank_sdp_tpu.ops.coneops import build_cone_ops
from ltr_lowrank_sdp_tpu.solver.alm import ALMPhase, make_alm_carry
from ltr_lowrank_sdp_tpu.solver.common import (
    ProblemConsts, init_factors,
)


def build_alm(prob, params, ranks):
    cones, lp = build_cone_ops(prob)
    consts = ProblemConsts.from_problem(prob)
    dims = prob.block_dims
    shapes = [(n, r) for n, r in zip(dims, ranks)]
    phase = ALMPhase(cones, lp, jnp.asarray(prob.b), consts, params, shapes,
                     prob.n_lp_cols)
    R, rlp = init_factors(ranks, dims, prob.n_lp_cols,
                          jax.random.PRNGKey(params.seed))
    rho0 = 1.0 / np.sqrt(sum(dims))
    carry = make_alm_carry(R, rlp, prob.m, phase.n_elems, rho0, params)
    return phase, carry


def test_alm_g11_reaches_phase1_tol(g11_path):
    prob = load_problem(g11_path)
    params = SolverParams(phase1_tol=1e-3)
    ranks, caps = initial_ranks(prob, params.times_log_rank)
    phase, carry = build_alm(prob, params, ranks)
    t0 = time.time()
    carry, info = phase.run(carry, 0, t0, mode="main", is_rank_max=False)
    assert not info.num_err
    # phase-1 exit criterion: l_inf primal infeasibility <= 1e-3
    assert float(carry.pinf_inf) <= 1.5e-3
    # MaxCut G11 optimum is around -629.16; ALM at coarse tol should be close
    assert float(carry.pobj) < -600.0
    # dual objective should be in the same ballpark (gap shrinking)
    assert float(carry.gap) < 0.3
