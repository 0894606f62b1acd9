"""Tests for the MaxCut .mat loader, cubic robustness at large scale, and
the host-side float64 metric recompute."""

import numpy as np
import pathlib

import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from ltr_lowrank_sdp_tpu.io.maxcut import maxcut_problem_from_adjacency
from ltr_lowrank_sdp_tpu.ops.cubic import cubic_roots, quartic_linesearch
from ltr_lowrank_sdp_tpu.solver.common import host_metrics_f64

MAT_DIR = pathlib.Path("/root/reference/lorads/data/Max_cut_matrix_files")


def _ring_adjacency(n):
    i = np.arange(n)
    rows = np.concatenate([i, (i + 1) % n])
    cols = np.concatenate([(i + 1) % n, i])
    return sp.csr_matrix((np.ones(2 * n), (rows, cols)), shape=(n, n))


def test_maxcut_from_adjacency_structure():
    n = 16
    prob = maxcut_problem_from_adjacency(_ring_adjacency(n), name="ring16")
    cone = prob.cones[0]
    assert cone.n == n and prob.m == n
    assert cone.kind_a == "diag"
    # C = -L/2: diag = -deg/2 = -1, off-diag = +1/2 per edge
    C = np.zeros((n, n))
    np.add.at(C, (cone.c_rows, cone.c_cols), cone.c_vals)
    off = cone.c_rows != cone.c_cols
    np.add.at(C, (cone.c_cols[off], cone.c_rows[off]), cone.c_vals[off])
    assert np.allclose(np.diag(C), -1.0)
    assert np.allclose(C.sum(axis=1), 0.0)  # Laplacian row sums


def test_maxcut_ring_sdp_solves():
    """The ring MaxCut SDP has known optimum: X = I rank pattern with
    cut bound; just check the solver certifies DIMACS optimality and the
    objective equals -n/2 * (1 - cos(pi*(1-1/n)-ish)) loosely via bounds."""
    from ltr_lowrank_sdp_tpu.config import SolverParams
    from ltr_lowrank_sdp_tpu.solver.driver import Solver

    n = 32
    prob = maxcut_problem_from_adjacency(_ring_adjacency(n), name="ring32")
    r = Solver(prob, SolverParams(disable_oracle=True)).solve()
    assert r.status.value in ("primal_dual_optimal", "primal_optimal")
    # SDP value for even ring = -n/2*(1+cos(pi/n))... bound: within [-2n, -n/2]
    assert -2 * n <= r.pobj <= -n / 2


def test_maxcut_directed_graph_symmetrized():
    """Directed adjacency (like the SuiteSparse p2p graphs) must symmetrize
    into a valid Laplacian-based objective."""
    n = 12
    rng = np.random.default_rng(0)
    rows = rng.integers(0, n, 30)
    cols = rng.integers(0, n, 30)
    keep = rows != cols
    A = sp.csr_matrix((np.ones(keep.sum()), (rows[keep], cols[keep])),
                      shape=(n, n))
    prob = maxcut_problem_from_adjacency(A, name="directed")
    cone = prob.cones[0]
    C = np.zeros((n, n))
    np.add.at(C, (cone.c_rows, cone.c_cols), cone.c_vals)
    off = cone.c_rows != cone.c_cols
    np.add.at(C, (cone.c_cols[off], cone.c_rows[off]), cone.c_vals[off])
    assert np.allclose(C, C.T)
    # reference uses D = diag(row sums of the RAW A) (gen_MaxCut.jl:221-226),
    # so for directed graphs the symmetrized C has row sums
    # -0.25*(deg_out - deg_in), not zero
    deg_out = np.asarray(A.sum(axis=1)).ravel()
    deg_in = np.asarray(A.sum(axis=0)).ravel()
    assert np.allclose(C.sum(axis=1), -0.25 * (deg_out - deg_in))


@pytest.mark.skipif(not (MAT_DIR / "delaunay_n10.mat").exists(),
                    reason="reference .mat data not available")
def test_load_maxcut_mat_file():
    from ltr_lowrank_sdp_tpu.problem import load_problem

    prob = load_problem(str(MAT_DIR / "delaunay_n10.mat"))
    cone = prob.cones[0]
    assert cone.n == 1024 and prob.m == 1024
    assert cone.kind_a == "diag"
    assert prob.name == "delaunay_n10"


def test_cubic_roots_huge_coefficients():
    """Unit-scale normalization keeps Cardano exact when raw coefficients
    would overflow f32 / lose discriminant bits (the failure observed on
    p2p-Gnutella04 before the fix)."""
    s = 1e12
    # roots of (x-1)(x-2)(x-3) scaled by s
    roots, num = cubic_roots(jnp.float64(s), jnp.float64(-6 * s),
                             jnp.float64(11 * s), jnp.float64(-6 * s))
    assert int(num) == 3
    assert np.allclose(sorted(np.asarray(roots)), [1.0, 2.0, 3.0], atol=1e-6)


def test_cubic_roots_huge_coefficients_f32():
    s = jnp.asarray(1e12, jnp.float32)
    roots, num = cubic_roots(s, -6 * s, 11 * s, -6 * s)
    assert int(num) == 3
    assert np.allclose(sorted(np.asarray(roots)), [1.0, 2.0, 3.0], atol=1e-3)


def test_quartic_linesearch_large_scale_factors():
    """Line search stays finite with factor magnitudes ~1e4 (m entries ~1e8
    in the quartic coefficients)."""
    rng = np.random.default_rng(1)
    m = 64
    q0 = jnp.asarray(rng.normal(size=m) * 1e4)
    q1 = jnp.asarray(rng.normal(size=m) * 1e4)
    q2 = jnp.asarray(rng.normal(size=m) * 1e4)
    lam = jnp.asarray(rng.normal(size=m))
    tau, num = quartic_linesearch(jnp.float64(0.01), lam,
                                  jnp.float64(-1e8), jnp.float64(-1e9),
                                  q0, q1, q2)
    assert int(num) > 0
    assert np.isfinite(float(tau)) and 0.0 <= float(tau) <= 1.0


def test_host_metrics_f64_matches_dense():
    """host_metrics_f64 must agree with a dense numpy evaluation."""
    from ltr_lowrank_sdp_tpu.testing import random_maxcut_problem

    prob = random_maxcut_problem(24, seed=5)
    rng = np.random.default_rng(2)
    U = rng.normal(size=(24, 4))
    dual = rng.normal(size=prob.m)
    pobj, dobj, pinf1, pinfi, gap = host_metrics_f64(
        prob, (U,), (U,), None, None, dual, 1.0)

    cone = prob.cones[0]
    C = np.zeros((24, 24))
    np.add.at(C, (cone.c_rows, cone.c_cols), cone.c_vals)
    off = cone.c_rows != cone.c_cols
    np.add.at(C, (cone.c_cols[off], cone.c_rows[off]), cone.c_vals[off])
    X = U @ U.T
    assert np.isclose(pobj, np.vdot(C, X))
    assert np.isclose(dobj, prob.b @ dual)
    resid = prob.b - np.diag(X) * np.asarray(cone.diag_val)[
        np.argsort(np.asarray(cone.diag_cid))]
    # the reference's "L1" DIMACS error is ||resid||_2 / (1 + ||b||_1)
    # (primalInfeasibility, lorads_alg_common.c:386-394); the Inf variant
    # is derived by the norm ratio (main.c:485)
    assert np.isclose(pinf1, np.linalg.norm(resid) / (1 + prob.b_nrm1))
    assert np.isclose(
        pinfi, pinf1 * (1 + prob.b_nrm1) / (1 + prob.b_nrminf))
