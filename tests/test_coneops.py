import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltr_lowrank_sdp_tpu.io.sdpa import SDPAData, SDPABlock
from ltr_lowrank_sdp_tpu.problem import canonicalize, ConeData
from ltr_lowrank_sdp_tpu.ops.coneops import (
    ConeOps,
    dense_constraint_matrices,
    dense_objective_matrix,
)


def random_cone(rng, n, m, nnz_per=3, diag_only=False, force_kind=None):
    rows, cols, vals, cids = [], [], [], []
    for i in range(m):
        for _ in range(nnz_per):
            r = rng.integers(0, n)
            c = rng.integers(r, n) if not diag_only else r
            rows.append(r)
            cols.append(c)
            vals.append(rng.normal())
            cids.append(i)
    ncz = max(1, n)
    c_rows = rng.integers(0, n, size=2 * n)
    c_cols = np.maximum(c_rows, rng.integers(0, n, size=2 * n))
    c_vals = rng.normal(size=2 * n)
    blk = SDPABlock(
        dim=n,
        c_rows=c_rows.astype(np.int32),
        c_cols=c_cols.astype(np.int32),
        c_vals=c_vals,
        a_rows=np.array(rows, np.int32),
        a_cols=np.array(cols, np.int32),
        a_vals=np.array(vals),
        a_cid=np.array(cids, np.int32),
    )
    data = SDPAData(n_constrs=m, blocks=[blk], b=rng.normal(size=m))
    prob = canonicalize(data)
    cone = prob.cones[0]
    if force_kind:
        cone.kind_a = force_kind
    return cone


def reference_eval(cone: ConeData, U, V, w):
    """Dense numpy reference for all three operators."""
    A = dense_constraint_matrices(cone)
    C = dense_objective_matrix(cone)
    X = 0.5 * (U @ V.T + V @ U.T)
    constr = np.einsum("mij,ij->m", A, X)
    obj = np.sum(C * X)
    S = C + np.einsum("m,mij->ij", w, A)
    return constr, obj, S


@pytest.mark.parametrize("kind", ["sparse", "dense"])
def test_cone_ops_match_dense_reference(kind):
    rng = np.random.default_rng(0)
    n, m, r = 12, 7, 3
    cone = random_cone(rng, n, m, force_kind=kind)
    ops = ConeOps(cone)
    U = rng.normal(size=(n, r))
    V = rng.normal(size=(n, r))
    w = rng.normal(size=m)
    Y = rng.normal(size=(n, r))

    constr_ref, obj_ref, S_ref = reference_eval(cone, U, V, w)

    constr = np.asarray(ops.constr_vals(jnp.array(U), jnp.array(V)))
    np.testing.assert_allclose(constr, constr_ref, rtol=1e-12, atol=1e-12)

    obj = float(ops.obj_value(jnp.array(U), jnp.array(V)))
    np.testing.assert_allclose(obj, obj_ref, rtol=1e-12)

    out = np.asarray(ops.apply_w(jnp.array(w), jnp.array(Y), obj_coef=1.0))
    np.testing.assert_allclose(out, S_ref @ Y, rtol=1e-11, atol=1e-11)

    out0 = np.asarray(ops.apply_w(jnp.array(w), jnp.array(Y), obj_coef=0.0))
    np.testing.assert_allclose(out0, (S_ref - dense_objective_matrix(cone)) @ Y,
                               rtol=1e-11, atol=1e-11)


def test_diag_fast_path():
    rng = np.random.default_rng(1)
    n = 10
    m = 10
    cone = random_cone(rng, n, m, nnz_per=1, diag_only=True)
    assert cone.kind_a == "diag"
    ops = ConeOps(cone)
    r = 4
    U = rng.normal(size=(n, r))
    V = rng.normal(size=(n, r))
    w = rng.normal(size=m)
    Y = rng.normal(size=(n, r))
    constr_ref, obj_ref, S_ref = reference_eval(cone, U, V, w)
    np.testing.assert_allclose(
        np.asarray(ops.constr_vals(jnp.array(U), jnp.array(V))), constr_ref,
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(ops.apply_w(jnp.array(w), jnp.array(Y))), S_ref @ Y,
        rtol=1e-11, atol=1e-11,
    )


def test_adjointness():
    """<A(sym(UV^T)), w> == <sym(UV^T), A*(w)> for U=V (X = UU^T)."""
    rng = np.random.default_rng(2)
    n, m, r = 15, 9, 4
    cone = random_cone(rng, n, m)
    ops = ConeOps(cone)
    U = rng.normal(size=(n, r))
    w = rng.normal(size=m)
    lhs = float(jnp.vdot(ops.constr_vals(jnp.array(U), jnp.array(U)),
                         jnp.array(w)))
    # <X, A*(w)> = tr(A*(w) U U^T) = vdot(U, A*(w) U)
    AwU = ops.apply_w(jnp.array(w), jnp.array(U), obj_coef=0.0)
    rhs = float(jnp.vdot(jnp.array(U), AwU))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_gradient_matches_autodiff():
    """2(C + A*(w))R must equal the gradient of the weighted objective."""
    rng = np.random.default_rng(3)
    n, m, r = 10, 6, 3
    cone = random_cone(rng, n, m)
    ops = ConeOps(cone)
    R = jnp.array(rng.normal(size=(n, r)))
    w = jnp.array(rng.normal(size=m))

    def f(R_):
        return ops.obj_value(R_, R_) + jnp.vdot(w, ops.constr_vals(R_, R_))

    g_auto = jax.grad(f)(R)
    g_manual = 2.0 * ops.apply_w(w, R, obj_coef=1.0)
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_manual),
                               rtol=1e-10, atol=1e-10)
