import jax
import jax.numpy as jnp
import numpy as np

from ltr_lowrank_sdp_tpu.ops.cubic import cubic_roots, quartic_linesearch
from ltr_lowrank_sdp_tpu.ops.lbfgs import (
    init_history, push_pair, direction, reset_history,
)
from ltr_lowrank_sdp_tpu.ops.cg import cg_solve
from ltr_lowrank_sdp_tpu.ops.lanczos import (
    lanczos_min_eig, oracle_rank_gram, oracle_rank_naive,
)


def test_cubic_roots_three_real():
    # (x-1)(x-2)(x-3) = x^3 -6x^2 +11x -6
    roots, num = cubic_roots(
        jnp.asarray(1.0), jnp.asarray(-6.0), jnp.asarray(11.0), jnp.asarray(-6.0)
    )
    assert int(num) == 3
    np.testing.assert_allclose(np.sort(np.asarray(roots)), [1, 2, 3], rtol=1e-9)


def test_cubic_roots_one_real():
    # x^3 + x + 1 has one real root ~ -0.6823
    roots, num = cubic_roots(
        jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(1.0)
    )
    assert int(num) == 1
    # reference clamps single negative roots at 0
    assert float(roots[0]) == 0.0


def test_quartic_linesearch_minimizes():
    """tau from the closed form must beat a fine grid search on [0,1]."""
    rng = np.random.default_rng(0)
    for _ in range(20):
        m = 5
        rho = float(rng.uniform(0.5, 10))
        lam = jnp.array(rng.normal(size=m))
        q0 = jnp.array(rng.normal(size=m))
        q1 = jnp.array(rng.normal(size=m))
        q2 = jnp.array(rng.normal(size=m))
        p1 = float(rng.normal())
        p2 = float(rng.normal())
        tau, num = quartic_linesearch(rho, lam, p1, p2, q0, q1, q2)
        assert int(num) > 0
        q0s = np.asarray(q0) + np.asarray(lam) / rho
        a = rho * float(q2 @ q2) / 2
        b = rho * float(q1 @ q2)
        c = p2 - rho * float(jnp.vdot(q0s, q2)) + rho * float(q1 @ q1) / 2
        d = p1 - rho * float(jnp.vdot(q0s, q1))

        def phi(x):
            return a * x**4 + b * x**3 + c * x**2 + d * x

        grid = np.linspace(0, 1, 2001)
        assert phi(float(tau)) <= phi(grid).min() + 1e-8


def test_lbfgs_on_quadratic():
    """L-BFGS directions + exact line search solve a convex quadratic."""
    rng = np.random.default_rng(1)
    n = 20
    Q = rng.normal(size=(n, n))
    Q = Q @ Q.T + np.eye(n)
    b = rng.normal(size=n)
    x = jnp.zeros(n)
    hist = init_history(n, 5)

    def grad(x):
        return jnp.array(Q) @ x - jnp.array(b)

    g = grad(x)
    for it in range(60):
        D = direction(hist, g)
        # exact step for quadratic
        tau = -float(jnp.vdot(D, g)) / float(D @ (jnp.array(Q) @ D))
        x_new = x + tau * D
        g_new = grad(x_new)
        hist = push_pair(hist, x_new - x, g_new - g)
        x, g = x_new, g_new
        if float(jnp.linalg.norm(g)) < 1e-9:
            break
    assert float(jnp.linalg.norm(g)) < 1e-8
    # convergence should be much faster than steepest descent thanks to pairs
    assert it < 55


def test_lbfgs_reset():
    hist = init_history(4, 2)
    hist = push_pair(hist, jnp.ones(4), jnp.ones(4))
    g = jnp.array([1.0, 2.0, 3.0, 4.0])
    hist2 = reset_history(hist)
    D = direction(hist2, g)
    np.testing.assert_allclose(np.asarray(D), -np.asarray(g))


def test_cg_spd():
    rng = np.random.default_rng(2)
    n, r = 30, 4
    M = rng.normal(size=(n, n))
    M = M @ M.T + n * np.eye(n)
    B = rng.normal(size=(n, r))

    def matvec(X):
        return jnp.array(M) @ X

    res = cg_solve(matvec, jnp.array(B), jnp.zeros((n, r)), 1e-12, 200)
    x_ref = np.linalg.solve(M, B)
    np.testing.assert_allclose(np.asarray(res.x), x_ref, rtol=1e-6, atol=1e-8)
    assert bool(res.converged)


def test_lanczos_min_eig():
    rng = np.random.default_rng(3)
    n = 80
    A = rng.normal(size=(n, n))
    A = (A + A.T) / 2

    def mv(v):
        return jnp.array(A) @ v

    est = lanczos_min_eig(mv, n, jax.random.PRNGKey(0), num_iters=70)
    true = np.linalg.eigvalsh(A)[0]
    np.testing.assert_allclose(float(est), true, rtol=1e-6)


def test_oracle_rank():
    rng = np.random.default_rng(4)
    n, r_true, r = 40, 3, 8
    F0 = rng.normal(size=(n, r_true))
    # embed rank-3 factor in rank-8 representation
    Q, _ = np.linalg.qr(rng.normal(size=(r, r)))
    F = np.hstack([F0, np.zeros((n, r - r_true))]) @ Q
    assert int(oracle_rank_gram(jnp.array(F))) == r_true
    assert int(oracle_rank_naive(jnp.array(F))) == r_true


def test_quartic_linesearch_tau_max_equivalence():
    """Searching [0, s] with D/s must equal searching [0, 1] with D.

    This is the float32 overflow guard: the ALM normalizes the L-BFGS
    direction and passes tau_max = ||D||; the minimizer must transform
    exactly (tau_hat = s * tau)."""
    rng = np.random.default_rng(3)
    m = 7
    rho = 2.0
    lam = jnp.array(rng.normal(size=m))
    q0 = jnp.array(rng.normal(size=m))
    q1 = jnp.array(rng.normal(size=m))
    q2 = jnp.array(rng.normal(size=m))
    p1, p2 = 0.3, -0.7
    tau1, n1 = quartic_linesearch(rho, lam, p1, p2, q0, q1, q2)
    s = 5.0  # pretend ||D|| = 5: q1/p1 scale by s, q2/p2 by s^2
    tau2, n2 = quartic_linesearch(
        rho, lam, p1 / s, p2 / s**2, q0, q1 / s, q2 / s**2, tau_max=s)
    assert int(n1) > 0 and int(n2) > 0
    np.testing.assert_allclose(float(tau2), s * float(tau1), rtol=1e-8)


def test_lbfgs_cautious_update_zero_curvature():
    """A zero / negative-curvature pair must be a no-op, not an inf beta."""
    hist = init_history(4, 2)
    g = jnp.asarray([1.0, -2.0, 0.5, 3.0])
    # zero step (rejected line search): s = 0, y = 0
    hist = push_pair(hist, jnp.zeros(4), jnp.zeros(4))
    assert np.isfinite(float(hist.beta[0]))
    d = direction(hist, g)
    np.testing.assert_allclose(np.asarray(d), -np.asarray(g))
    # negative curvature pair also skipped
    hist = push_pair(hist, jnp.ones(4), -jnp.ones(4))
    d = direction(hist, g)
    assert np.all(np.isfinite(np.asarray(d)))
    np.testing.assert_allclose(np.asarray(d), -np.asarray(g))


def test_quartic_linesearch_f32_huge_direction_no_overflow():
    """float32 coefficients of a unit direction stay finite where the
    unnormalized direction (||D|| ~ 1e8) would overflow rho*||q2||^2."""
    rng = np.random.default_rng(5)
    m = 16
    scale = 1e8  # ||D||
    q0 = jnp.asarray(rng.normal(size=m), jnp.float32)
    lam = jnp.asarray(rng.normal(size=m), jnp.float32)
    # normalized-direction contractions are O(1)
    q1 = jnp.asarray(rng.normal(size=m), jnp.float32)
    q2 = jnp.asarray(rng.normal(size=m), jnp.float32)
    tau, num = quartic_linesearch(
        jnp.float32(1e3), lam, jnp.float32(0.1), jnp.float32(0.2),
        q0, q1, q2, tau_max=jnp.float32(scale))
    assert int(num) > 0
    assert np.isfinite(float(tau))
