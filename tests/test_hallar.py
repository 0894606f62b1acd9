import numpy as np
import pytest

from ltr_lowrank_sdp_tpu.hallar.solver import (
    HallarParams, SpectraplexProblem, build_mss_problem, hallar_solve,
)
from ltr_lowrank_sdp_tpu.io.hslr import read_hslr


HSLR_EXAMPLE = "/root/reference/hallar/src/examples/hybrid_hslr_format_v2.hslr"


def test_hslr_reader():
    import os

    if not os.path.exists(HSLR_EXAMPLE):
        pytest.skip("HSLR example not available")
    data = read_hslr(HSLR_EXAMPLE)
    assert data.m == 3
    assert data.n == 4
    np.testing.assert_allclose(data.b, [2, 4, 4])
    assert data.tau == 5.0
    # C = sparse identity + 10 * v v^T with v = (1, 10, 1, 1)
    C = data.C.dense()
    v = np.array([1.0, 10.0, 1.0, 1.0])
    np.testing.assert_allclose(C, np.eye(4) + np.outer(v, v), rtol=1e-12)
    # A_3 has an LR part V^T I V with V rows (1,0,1,0), (0,1,0,1)
    A3 = data.A[2].dense()
    expect = (np.outer([1, 0, 1, 0], [1, 0, 1, 0])
              + np.outer([0, 1, 0, 1], [0, 1, 0, 1]))
    expect[0, 2] -= 1
    expect[2, 0] -= 1
    expect[1, 3] -= 1
    expect[3, 1] -= 1
    np.testing.assert_allclose(A3, expect, rtol=1e-12)


def test_mss_small_cycle():
    """Max stable set of the 5-cycle: Lovász theta = sqrt(5) ~ 2.236."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]
    prob = build_mss_problem(edges, 5)
    params = HallarParams(eps_pfeas=1e-6, eps_gap=1e-4, maxiter_hallar=400,
                          init_rank=2, lanczos_iters=10)
    res = hallar_solve(prob, params)
    # pobj = -theta(C5)
    assert res.pinf <= 1e-5
    assert abs(-res.pobj - np.sqrt(5)) < 2e-3
    assert res.converged


def test_trace_constrained_min_eig():
    """min <C,X> over tr X <= 1, X >= 0 with no constraints is
    min(lambda_min(C), 0)."""
    rng = np.random.default_rng(0)
    n = 12
    C = rng.normal(size=(n, n))
    C = (C + C.T) / 2
    iu = np.triu_indices(n)
    prob = SpectraplexProblem(
        n=n, m=1, b=np.zeros(1), tau=1.0,
        c_rows=iu[0].astype(np.int32), c_cols=iu[1].astype(np.int32),
        c_vals=C[iu],
        # single all-zero constraint (solver needs m >= 1)
        a_rows=np.zeros(1, np.int32), a_cols=np.zeros(1, np.int32),
        a_vals=np.zeros(1), a_cid=np.zeros(1, np.int32),
    )
    res = hallar_solve(prob, HallarParams(eps_gap=1e-4, maxiter_hallar=200,
                                          lanczos_iters=24))
    lam_min = np.linalg.eigvalsh(C)[0]
    assert abs(res.pobj - min(lam_min, 0.0)) < 1e-3


def test_mss_cycle_aipp_inner():
    """ADAP-AIPP inner solver (inner_solver="aipp") reaches the same
    Lovász theta as the ADAP-FISTA path on the 5-cycle (hallar README
    option-table parity, VERDICT r2 H2)."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]
    prob = build_mss_problem(edges, 5)
    params = HallarParams(eps_pfeas=1e-6, eps_gap=1e-4, maxiter_hallar=400,
                          init_rank=2, lanczos_iters=10,
                          inner_solver="aipp")
    res = hallar_solve(prob, params)
    assert res.pinf <= 1e-5
    assert abs(-res.pobj - np.sqrt(5)) < 2e-3
    assert res.converged
