"""Exact quartic line search via closed-form cubic roots.

The ALM subproblem objective along a direction D is the exact quartic

    phi(tau) = a tau^4 + b tau^3 + c tau^2 + d tau

with coefficients assembled from the contractions
q0 = b_rhs - A(RR^T), q1 = 2 A(sym(RD^T)), q2 = A(DD^T),
p1 = 2<C, sym(RD^T)>, p2 = <C, DD^T>  (reference ``ALMCalq12p12``,
``lorads_alm.c:714-734``), minimized exactly on [0, 1] by solving
phi'(tau) = 0 with Cardano's formula (``LORADScubic_equation`` /
``ALMLineSearch``, ``lorads_alm.c:191-333``).

Everything here is branch-free jnp arithmetic (masked selects), so the line
search lives *inside* the jitted ALM inner loop — no host sync per step.
Returns ``root_num = 0`` on the degenerate discriminant case, which the
driver maps to a numerical-error exit like the reference does.
"""

from __future__ import annotations

import jax.numpy as jnp


def _nthroot3(x):
    """Real cube root (sign-preserving)."""
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def cubic_roots(a, b, c, d):
    """Real roots of a x^3 + b x^2 + c x + d = 0, Cardano/Shengjin style.

    Returns (roots[3], root_num) mirroring the reference's case analysis
    (including its clamping of the single-root cases at 0).  Invalid root
    slots are 0.

    Coefficients are pre-scaled to unit magnitude (roots are invariant):
    the discriminant combinations square them, so raw ALM coefficients of
    order 1e8+ would overflow float32 and lose the low bits that decide the
    delta sign in emulated float64.
    """
    scale = jnp.maximum(
        jnp.maximum(jnp.abs(a), jnp.abs(b)),
        jnp.maximum(jnp.abs(c), jnp.abs(d)))
    scale = jnp.where(scale > 0.0, scale, 1.0)
    a, b, c, d = a / scale, b / scale, c / scale, d / scale

    A = b * b - 3.0 * a * c
    B = b * c - 9.0 * a * d
    C = c * c - 3.0 * b * d
    delta = B * B - 4.0 * A * C

    safe_a = jnp.where(a == 0.0, 1.0, a)
    safe_b = jnp.where(b == 0.0, 1.0, b)
    safe_A = jnp.where(A == 0.0, 1.0, A)

    # case 1: A == B == 0 -> triple/linear root -c/b (clamped at 0)
    root_lin = jnp.maximum(0.0, -c / safe_b)

    # case 2: delta > 0 -> one real root (clamped at 0)
    sq_delta = jnp.sqrt(jnp.maximum(delta, 0.0))
    Y1 = A * b + 1.5 * a * (-B + sq_delta)
    Y2 = A * b + 1.5 * a * (-B - sq_delta)
    root_pos = jnp.maximum(0.0, (-b - _nthroot3(Y1) - _nthroot3(Y2)) / (3.0 * safe_a))

    # case 3: delta == 0 (A != 0, B != 0) -> double root
    K = B / safe_A
    root_dz1 = -b / safe_a + K
    root_dz2 = -K / 2.0

    # case 4: delta < 0 -> three real roots (trigonometric form)
    sqA = jnp.sqrt(jnp.maximum(A, 0.0))
    safe_sqA3 = jnp.where(A > 0.0, A * sqA, 1.0)
    T = (A * b - 1.5 * a * B) / safe_sqA3
    T = jnp.clip(T, -1.0, 1.0)
    theta = jnp.arccos(T)
    csth = jnp.cos(theta / 3.0)
    sn3th = jnp.sqrt(3.0) * jnp.sin(theta / 3.0)
    r1 = (-b - 2.0 * sqA * csth) / (3.0 * safe_a)
    r2 = (-b + sqA * (csth + sn3th)) / (3.0 * safe_a)
    r3 = (-b + sqA * (csth - sn3th)) / (3.0 * safe_a)

    case_lin = (A == 0.0) & (B == 0.0)
    case_pos = (~case_lin) & (delta > 0.0)
    case_dz = (~case_lin) & (delta == 0.0) & (A != 0.0) & (B != 0.0)
    case_tri = (~case_lin) & (delta < 0.0)

    zero = jnp.zeros_like(a)
    root0 = jnp.where(
        case_lin, root_lin,
        jnp.where(case_pos, root_pos,
                  jnp.where(case_dz, root_dz1,
                            jnp.where(case_tri, r1, zero))))
    root1 = jnp.where(case_dz, root_dz2, jnp.where(case_tri, r2, zero))
    root2 = jnp.where(case_tri, r3, zero)

    root_num = jnp.where(
        case_lin | case_pos, 1,
        jnp.where(case_dz, 2, jnp.where(case_tri, 3, 0)))
    return jnp.stack([root0, root1, root2]), root_num


def quartic_linesearch(rho, lam, p1, p2, q0, q1, q2, tau_max=1.0):
    """Exact minimizer of the ALM quartic on [0, tau_max].

    Args mirror ``ALMLineSearch`` (``lorads_alm.c:266-333``):
    q0 = b - A(RR^T) (WITHOUT the lambda/rho shift; applied here).

    ``tau_max`` generalizes the reference's fixed [0, 1] interval: callers
    that pre-normalize the direction D to unit Frobenius norm (so the
    quartic coefficients stay inside float32 range) pass tau_max = ||D||,
    which is exactly equivalent to the reference's unnormalized search.

    Returns (tau, root_num); root_num == 0 signals the Cardano degenerate
    case -> numerical-error exit in the driver.
    """
    q0s = q0 + lam / rho
    a = rho * jnp.vdot(q2, q2) / 2.0
    b = rho * jnp.vdot(q1, q2)
    c = p2 - rho * jnp.vdot(q0s, q2) + rho * jnp.vdot(q1, q1) / 2.0
    d = p1 - rho * jnp.vdot(q0s, q1)

    roots, root_num = cubic_roots(4.0 * a, 3.0 * b, 2.0 * c, d)

    def phi(x):
        return ((a * x + b) * x + c) * x * x + d * x

    tau_max = jnp.asarray(tau_max, a.dtype)
    f0 = jnp.zeros_like(a)
    f1 = phi(tau_max)
    valid = (roots > 1e-20) & (roots <= tau_max)
    valid = valid & (jnp.arange(3) < root_num)
    froots = jnp.where(valid, phi(roots), 1e30)

    cand_f = jnp.concatenate([jnp.stack([f0, f1]), froots])
    cand_tau = jnp.concatenate([jnp.stack([f0, tau_max]), roots])
    idx = jnp.argmin(cand_f)
    return cand_tau[idx], root_num
