"""End-to-end solves with DIMACS self-certification.

The reference has no unit tests; its correctness standard is DIMACS errors
under phase2Tol plus cross-solver objective agreement (SURVEY.md §4).  These
tests certify our solves the same way: primal infeasibility, duality gap and
Lanczos-certified dual infeasibility must all be small, which together pin
the objective to the true SDP optimum.
"""

import json

import numpy as np
import pytest

from ltr_lowrank_sdp_tpu.config import SolverParams, SolverStatus
from ltr_lowrank_sdp_tpu.problem import load_problem
from ltr_lowrank_sdp_tpu.solver.driver import solve


def test_g11_full_solve(g11_path, tmp_path):
    prob = load_problem(g11_path)
    params = SolverParams(phase1_tol=1e-2, heuristic_factor=10.0)
    json_path = str(tmp_path / "G11.json")
    res = solve(prob, params, json_path=json_path)
    assert res.pinf_l1 <= 1e-5
    assert res.gap <= 5e-5
    assert res.dinf_l1 <= 1e-3  # dual certification is looser at MaxCut scale
    assert res.status in (
        SolverStatus.PRIMAL_DUAL_OPTIMAL, SolverStatus.PRIMAL_OPTIMAL,
    )
    # objective value: G11 SDP bound (file convention) ~ -1258.3
    assert abs(res.pobj - (-1258.3)) / 1258.3 < 1e-3

    with open(json_path) as f:
        payload = json.load(f)
    assert "metrics" in payload and "trajectory" in payload
    assert payload["metrics"]["primal_obj"] == res.pobj
    assert len(payload["trajectory"]["phase_1"]["curr_rank"]) >= 1


def test_tiny_dense_sdp(tmp_path):
    """2x2 SDP with known solution: min tr(X) s.t. X_11 = 1, X>=0.

    Optimum: X = e1 e1^T, obj = 1.
    """
    text = """\
1
1
2
1.0
0 1 1 1 -1.0
0 1 2 2 -1.0
1 1 1 1 1.0
"""
    p = tmp_path / "tiny.dat-s"
    p.write_text(text)
    prob = load_problem(str(p))
    res = solve(prob, SolverParams())
    assert abs(res.pobj - 1.0) < 1e-4
    assert res.pinf_l1 < 1e-5
