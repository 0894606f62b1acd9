"""Shared solver machinery: factor pytrees, gradients, DIMACS metrics.

The solver variables are tuples of per-cone (n_k, r_k) factor matrices plus
an optional LP factor vector.  Everything here is shape-static for a given
rank signature; rank escalation rebuilds the jitted functions (one compiled
executable per rank bucket — the TPU answer to the reference's realloc-based
``AUG_RANK``, ``lorads_solver.c:1154-1254``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.coneops import ConeOps, LPOps, all_constr_vals, all_obj_value
from ..problem import SDPProblem

Factors = Tuple[jnp.ndarray, ...]


@dataclasses.dataclass(frozen=True)
class ProblemConsts:
    """Static problem constants captured by the jitted solver steps."""

    m: int
    b_nrm1: float
    b_nrm2: float
    b_nrminf: float
    c_nrm1: float
    c_nrm2: float
    c_nrminf: float

    @staticmethod
    def from_problem(prob: SDPProblem) -> "ProblemConsts":
        return ProblemConsts(
            m=prob.m,
            b_nrm1=prob.b_nrm1, b_nrm2=prob.b_nrm2, b_nrminf=prob.b_nrminf,
            c_nrm1=prob.c_nrm1, c_nrm2=prob.c_nrm2, c_nrminf=prob.c_nrminf,
        )


def flatten_factors(R: Factors, rlp=None) -> jnp.ndarray:
    parts = [r.ravel() for r in R]
    if rlp is not None:
        parts.append(rlp.ravel())
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def unflatten_factors(flat: jnp.ndarray, shapes, has_lp: bool):
    out = []
    idx = 0
    for shp in shapes:
        size = int(np.prod(shp))
        out.append(flat[idx: idx + size].reshape(shp))
        idx += size
    rlp = None
    if has_lp:
        rlp = flat[idx:]
    return tuple(out), rlp


def init_factors(
    ranks: Sequence[int],
    dims: Sequence[int],
    n_lp: int,
    key,
    dtype=jnp.float64,
):
    """Uniform(-1, 1)-ish random init (difference of two uniforms, matching
    the distribution of ``LORADS_RANDOM_rk_MAT``, ``lorads_solver.c:527``)."""
    keys = jax.random.split(key, len(ranks) + 1)
    R = tuple(
        jax.random.uniform(k, (n, r), dtype)
        - jax.random.uniform(jax.random.fold_in(k, 1), (n, r), dtype)
        for k, n, r in zip(keys[:-1], dims, ranks)
    )
    rlp = None
    if n_lp > 0:
        rlp = (
            jax.random.uniform(keys[-1], (n_lp,), dtype)
            - jax.random.uniform(jax.random.fold_in(keys[-1], 1), (n_lp,), dtype)
        )
    return R, rlp


def pad_rank_columns(F: jnp.ndarray, new_rank: int) -> jnp.ndarray:
    """Grow a factor to new_rank columns, padding with the scaled identity
    1/sqrt(r) diagonal used by the reference escalation (``lpRandomDiag``,
    ``lorads_solver.c:1096-1106``) so the new columns are an escape
    perturbation rather than stationary zeros."""
    n, old = F.shape
    aug = new_rank - old
    if aug <= 0:
        return F
    r = min(n, aug)
    pad = jnp.zeros((n, aug), F.dtype)
    # plain-float fill value: an np.float64 scalar would trip the scatter
    # dtype-promotion check under float32 compute
    pad = pad.at[jnp.arange(r), jnp.arange(r)].set(float(1.0 / np.sqrt(r)))
    return jnp.concatenate([F, pad], axis=1)


# --------------------------------------------------------------------------- #
# gradient / objective / DIMACS
# --------------------------------------------------------------------------- #


def alm_gradient(cones: List[ConeOps], lp: Optional[LPOps], R: Factors, rlp,
                 dual, constr_sum, b, rho, obj_scale=1.0, CR=None):
    """grad of L_rho = 2 (obj_scale*C + A*(w)) R with
    w = -lambda + rho (A(X) - b).

    Reference ``ALMSetGrad`` (``lorads_alm.c:32-61``).  Returns
    (grad_factors, grad_lp, ||grad||^2).

    When ``CR`` (a tuple of precomputed C·R_k per cone) is given, the
    objective term reuses it instead of re-applying C — the ALM inner loop
    maintains CR incrementally (C·(R+τD) = C·R + τ·C·D).
    """
    w = -dual + rho * (constr_sum - b)
    if CR is None:
        grads = tuple(
            2.0 * ops.apply_w(w, r, obj_coef=obj_scale, include_obj=True)
            for ops, r in zip(cones, R)
        )
    else:
        grads = tuple(
            2.0 * (obj_scale * cr
                   + ops.apply_w(w, r, include_obj=False))
            for ops, r, cr in zip(cones, R, CR)
        )
    norm_sq = sum(jnp.vdot(g, g) for g in grads)
    grad_lp = None
    if lp is not None and rlp is not None:
        col = lp.weighted_col_sums(w, obj_coef=obj_scale)
        grad_lp = 2.0 * col * rlp
        norm_sq = norm_sq + jnp.vdot(grad_lp, grad_lp)
    return grads, grad_lp, norm_sq


def primal_infeas_l1(constr_sum, b, b_nrm1):
    """||b - A(X)||_2 / (1 + ||b||_1) — the reference's 'L1' DIMACS error
    (``primalInfeasibility``, ``lorads_alg_common.c:386-394``)."""
    return jnp.linalg.norm(b - constr_sum) / (1.0 + b_nrm1)


def pd_gap(pobj, dobj):
    return jnp.abs(pobj - dobj) / (1.0 + jnp.abs(pobj) + jnp.abs(dobj))


def dual_objective(b, dual, scale_obj):
    return jnp.vdot(b, dual) / scale_obj


def host_metrics_f64(prob, U, V, ulp, vlp, dual, obj_scale: float):
    """Final DIMACS metrics recomputed in float64 numpy on the host.

    When the device solve runs in float32 (the TPU default), its self-
    reported residuals sit at the f32 noise floor and can under- or
    over-state the truth; the reference computes everything in double.
    One pass over the COO data per cone is cheap relative to a solve.

    Returns (pobj, dobj, pinf_l1, pinf_inf, gap).
    """
    import numpy as np

    m = prob.m
    cvals = np.zeros(m)
    pobj = 0.0
    for cone, u, v in zip(prob.cones, U, V):
        u = np.asarray(u, np.float64)
        v = np.asarray(v, np.float64)
        # objective <C, sym(uv^T)>
        e = 0.5 * (np.sum(u[cone.c_rows] * v[cone.c_cols], axis=1)
                   + np.sum(u[cone.c_cols] * v[cone.c_rows], axis=1))
        mult = np.where(cone.c_rows != cone.c_cols, 2.0, 1.0)
        pobj += float(np.sum(mult * cone.c_vals * e))
        # constraint values
        if cone.kind_a == "diag":
            de = np.sum(u[cone.diag_idx] * v[cone.diag_idx], axis=1)
            np.add.at(cvals, cone.diag_cid, cone.diag_val * de)
        else:
            ae = 0.5 * (np.sum(u[cone.a_rows] * v[cone.a_cols], axis=1)
                        + np.sum(u[cone.a_cols] * v[cone.a_rows], axis=1))
            amult = np.where(cone.a_rows != cone.a_cols, 2.0, 1.0)
            np.add.at(cvals, cone.a_cid, amult * cone.a_vals * ae)
    if prob.lp is not None and ulp is not None:
        x = np.asarray(ulp, np.float64) * np.asarray(vlp, np.float64)
        pobj += float(prob.lp.c @ x)
        np.add.at(cvals, prob.lp.cid, prob.lp.vals * x[prob.lp.col])

    b = np.asarray(prob.b, np.float64)
    dual64 = np.asarray(dual, np.float64)
    dobj = float(b @ dual64) / float(obj_scale)
    resid = b - cvals
    # the reference's "L1" DIMACS error is ||resid||_2 / (1 + ||b||_1) and
    # the Inf variant is derived by the norm ratio (main.c:485,523-525)
    pinf_l1 = float(np.linalg.norm(resid)) / (1.0 + prob.b_nrm1)
    pinf_inf = pinf_l1 * (1.0 + prob.b_nrm1) / (1.0 + prob.b_nrminf)
    gap = abs(pobj - dobj) / (1.0 + abs(pobj) + abs(dobj))
    return pobj, dobj, pinf_l1, pinf_inf, gap
