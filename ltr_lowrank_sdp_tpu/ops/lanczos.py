"""Lanczos extremal-eigenvalue estimation (TPU-native ARPACK replacement).

The reference certifies dual feasibility with ARPACK's implicitly-restarted
Lanczos (``dsaupd_``/``dseupd_``, which="SA", tol 1e-2 —
``lorads_sdp_conic.c:1636-1699``).  On TPU we run a fixed-iteration Lanczos
with full reorthogonalization inside jit: the tridiagonal matrix is
eigendecomposed with ``jnp.linalg.eigh`` (tiny, k x k), and the matvec is the
same fused conic kernel used by the solver (S·y with S = C - A*(lambda)).

A fixed iteration count keeps shapes static; k ~ 64 with full reorth matches
ARPACK's 1e-2 tolerance easily on the spectra that arise here (slack matrices
whose minimum eigenvalue is near 0 at optimality).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def lanczos_tridiag(
    matvec: Callable,
    n: int,
    key,
    num_iters: int = 64,
    dtype=jnp.float64,
):
    """Lanczos recurrence with full reorthogonalization — jit-friendly.

    Returns ``(alphas, betas)`` of the k x k tridiagonal projection as device
    arrays.  Call this *inside* jit (the caller closes over the operator) so
    the whole recurrence is one dispatch; eigendecompose the tiny tridiagonal
    on the host with :func:`tridiag_min_eig`.
    """
    k = min(num_iters, n)
    v0 = jax.random.normal(key, (n,), dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    V = jnp.zeros((k, n), dtype).at[0].set(v0)
    alphas = jnp.zeros((k,), dtype)
    betas = jnp.zeros((k,), dtype)  # betas[j] = subdiag between j and j+1

    def body(j, carry):
        V, alphas, betas = carry
        v = V[j]
        w = matvec(v)
        alpha = jnp.vdot(v, w)
        w = w - alpha * v - jnp.where(j > 0, betas[j - 1], 0.0) * V[
            jnp.maximum(j - 1, 0)
        ] * jnp.where(j > 0, 1.0, 0.0)
        # full reorthogonalization (mask rows > j)
        mask = (jnp.arange(k) <= j)[:, None].astype(dtype)
        coeffs = (V * mask) @ w
        w = w - (coeffs[None, :] @ (V * mask))[0]
        beta = jnp.linalg.norm(w)
        safe = jnp.where(beta > 1e-30, beta, 1.0)
        vnext = w / safe
        V = jax.lax.cond(
            j + 1 < k, lambda V: V.at[j + 1].set(vnext), lambda V: V, V
        )
        return V, alphas.at[j].set(alpha), betas.at[j].set(beta)

    V, alphas, betas = jax.lax.fori_loop(0, k, body, (V, alphas, betas))
    return alphas, betas


def tridiag_min_eig(alphas, betas) -> float:
    """Smallest eigenvalue of the tridiagonal (k x k — host numpy; portable
    across TPU dtypes and avoids device eigh in emulated f64)."""
    return tridiag_min_eig_resid(alphas, betas)[0]


def tridiag_min_eig_resid(alphas, betas):
    """Smallest eigenvalue of the k x k tridiagonal AND its Lanczos
    residual bound.

    For the Ritz pair (theta, V u) of a k-step Lanczos recurrence the exact
    residual is ``||A (V u) - theta (V u)|| = |beta_k * u[k-1]|`` — computable
    from the tridiagonal alone (Paige).  ARPACK accepts at
    ``resid <= tol * |theta|`` with tol=1e-2 in the reference
    (``lorads_sdp_conic.c:1645``); the driver applies the same acceptance rule
    and restarts with a larger k when it fails (clustered spectra on the
    theta family can leave a fixed-k estimate loose).
    """
    import numpy as np

    a = np.asarray(alphas, np.float64)
    bta = np.asarray(betas, np.float64)
    k = a.shape[0]
    T = np.diag(a) + np.diag(bta[: k - 1], 1) + np.diag(bta[: k - 1], -1)
    evals, evecs = np.linalg.eigh(T)
    resid = float(abs(bta[k - 1] * evecs[k - 1, 0]))
    return float(evals[0]), resid


def lanczos_min_eig(
    matvec: Callable,
    n: int,
    key,
    num_iters: int = 64,
    dtype=jnp.float64,
):
    """Estimate the minimum eigenvalue of the symmetric operator ``matvec``.

    Convenience eager wrapper around :func:`lanczos_tridiag` +
    :func:`tridiag_min_eig`.  Hot callers should jit the recurrence
    themselves (one dispatch) and only bring the k-vectors to the host.
    """
    alphas, betas = lanczos_tridiag(matvec, n, key, num_iters, dtype)
    return tridiag_min_eig(alphas, betas)


def lanczos_min_eig_vec(matvec, n: int, key, num_iters: int = 64,
                        dtype=jnp.float64):
    """Minimum eigenvalue AND Ritz vector (for HALLaR escape directions).

    Same Lanczos recurrence as :func:`lanczos_min_eig` but the basis is kept
    and combined with the tridiagonal eigenvector on the host.
    """
    import numpy as np

    k = min(num_iters, n)
    v0 = jax.random.normal(key, (n,), dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    V = jnp.zeros((k, n), dtype).at[0].set(v0)
    alphas = jnp.zeros((k,), dtype)
    betas = jnp.zeros((k,), dtype)

    def body(j, carry):
        V, alphas, betas = carry
        v = V[j]
        w = matvec(v)
        alpha = jnp.vdot(v, w)
        w = w - alpha * v
        mask = (jnp.arange(k) <= j)[:, None].astype(dtype)
        coeffs = (V * mask) @ w
        w = w - (coeffs[None, :] @ (V * mask))[0]
        beta = jnp.linalg.norm(w)
        safe = jnp.where(beta > 1e-30, beta, 1.0)
        vnext = w / safe
        V = jax.lax.cond(j + 1 < k, lambda V: V.at[j + 1].set(vnext),
                         lambda V: V, V)
        return V, alphas.at[j].set(alpha), betas.at[j].set(beta)

    V, alphas, betas = jax.lax.fori_loop(0, k, body, (V, alphas, betas))

    a = np.asarray(alphas, np.float64)
    bta = np.asarray(betas, np.float64)
    T = np.diag(a) + np.diag(bta[: k - 1], 1) + np.diag(bta[: k - 1], -1)
    evals, evecs = np.linalg.eigh(T)
    lam = float(evals[0])
    ritz = np.asarray(V, np.float64).T @ evecs[:, 0]
    nrm = np.linalg.norm(ritz)
    if nrm > 0:
        ritz = ritz / nrm
    return lam, ritz


def oracle_rank_gram(factor, eps: float = 1e-6) -> int:
    """Numerical rank of X = F F^T via the r x r Gram matrix spectrum.

    Reference: ``count_significant_from_matrix`` /
    ``oracle_rank_from_factor`` (``lorads_logging.c:272-400``): count
    eigenvalues > eps * lambda_max.  The device computes the (tiny) Gram
    matrix; its eigendecomposition runs on the host.
    """
    import numpy as np

    G = np.asarray(factor.T @ factor, np.float64)
    evals = np.linalg.eigvalsh(G)
    lam_max = evals[-1]
    if lam_max <= 0:
        return 0
    return int(np.sum(evals > eps * lam_max))


def oracle_rank_avg(U, V, eps: float = 1e-6) -> int:
    """Oracle rank of ((U+V)/2)((U+V)/2)^T (ADMM phase variant)."""
    return oracle_rank_gram(0.5 * (U + V), eps)


def oracle_rank_naive(factor, eps: float = 1e-6, dim_cap: int = 2000) -> int:
    """Full-matrix oracle rank; falls back to the Gram method for n > cap
    (reference ``lorads_logging.c:406-451``)."""
    import numpy as np

    n = factor.shape[0]
    if n > dim_cap:
        return oracle_rank_gram(factor, eps)
    X = np.asarray(factor, np.float64)
    X = X @ X.T
    evals = np.linalg.eigvalsh(X)
    lam_max = evals[-1]
    if lam_max <= 0:
        return 0
    return int(np.sum(evals > eps * lam_max))
