"""Pure-feasibility (C = 0) solves: λ = 0 is an exact optimal dual.

cphil12-shape special case (``lorads/README.md:242``): with a zero
objective the solve reduces to primal feasibility — the driver must
return the zero-dual certificate (dinf = gap = dobj = pobj = 0) instead
of grinding the dual-ascent path.
"""

import dataclasses

import numpy as np
import pytest

from ltr_lowrank_sdp_tpu.config import SolverParams
from ltr_lowrank_sdp_tpu.solver.driver import Solver
from ltr_lowrank_sdp_tpu.testing import random_maxcut_problem


def feasibility_problem(n=30, seed=0):
    """diag(X) = 1, X >= 0, zero objective (always feasible: X = I)."""
    prob = random_maxcut_problem(n, avg_degree=4, seed=seed)
    cones = [dataclasses.replace(
        c, c_vals=np.zeros_like(c.c_vals)) for c in prob.cones]
    prob = dataclasses.replace(
        prob, cones=cones, c_nrm1=0.0, c_nrm2=0.0, c_nrminf=0.0)
    return prob


def test_feasibility_zero_dual_certificate():
    prob = feasibility_problem()
    sv = Solver(prob, SolverParams(disable_oracle=True))
    assert sv.feas_only
    res = sv.solve()
    assert res.status.value == "primal_dual_optimal"
    assert res.pobj == 0.0
    assert res.dobj == 0.0
    assert res.gap == 0.0
    assert res.dinf_l1 == 0.0
    assert res.pinf_l1 <= sv.params.phase2_tol


def test_nonzero_objective_not_flagged():
    prob = random_maxcut_problem(30, avg_degree=4, seed=0)
    assert not Solver(prob, SolverParams()).feas_only
