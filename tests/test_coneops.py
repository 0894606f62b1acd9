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


def test_relabeled_ops_match_original_order():
    """relabel=True ConeOps must agree with original-order ops after the
    boundary permutations (driver hot path runs entirely in internal
    order)."""
    rng = np.random.default_rng(3)
    n, m = 40, 25
    cone = random_cone(rng, n, m, nnz_per=4)
    ops0 = ConeOps(cone, jnp.float64)
    ops1 = ConeOps(cone, jnp.float64, relabel=True)
    U = rng.normal(size=(n, 5))
    V = rng.normal(size=(n, 5))
    w = rng.normal(size=m)
    Ui, Vi = ops1.permute_rows_in(U), ops1.permute_rows_in(V)
    np.testing.assert_allclose(
        np.asarray(ops1.constr_vals(jnp.array(Ui), jnp.array(Vi))),
        np.asarray(ops0.constr_vals(jnp.array(U), jnp.array(V))), atol=1e-10)
    np.testing.assert_allclose(
        float(ops1.obj_value(jnp.array(Ui), jnp.array(Vi))),
        float(ops0.obj_value(jnp.array(U), jnp.array(V))), atol=1e-10)
    out1 = ops1.permute_rows_out(
        np.asarray(ops1.apply_w(jnp.array(w), jnp.array(Ui), obj_coef=2.0)))
    out0 = np.asarray(ops0.apply_w(jnp.array(w), jnp.array(U), obj_coef=2.0))
    np.testing.assert_allclose(out1, out0, atol=1e-10)
    # split halves agree with the fused kernel
    np.testing.assert_allclose(
        np.asarray(ops1.apply_a(jnp.array(w), jnp.array(Ui)))
        + 2.0 * np.asarray(ops1.apply_c(jnp.array(Ui))),
        out1[np.asarray(ops1.row_order)] if ops1.row_order is not None
        else out1, atol=1e-10)


def test_maxcut_diag_identity_relabel():
    """Single-cone diag (MaxCut) problems get the zero-gather fast path:
    constraint relabel active, both hot ops elementwise, results matching
    the original-order operators after the boundary permutations."""
    from ltr_lowrank_sdp_tpu.ops.coneops import (
        build_cone_ops, build_cone_ops_internal)
    from ltr_lowrank_sdp_tpu.io.sdpa import SDPAData, SDPABlock
    from ltr_lowrank_sdp_tpu.problem import canonicalize

    rng = np.random.default_rng(7)
    n = 30
    # MaxCut-shaped instance: diag constraints + sparse symmetric C
    c_rows = rng.integers(0, n, size=3 * n).astype(np.int32)
    c_cols = np.maximum(c_rows, rng.integers(0, n, size=3 * n)).astype(np.int32)
    blk = SDPABlock(
        dim=n, c_rows=c_rows, c_cols=c_cols, c_vals=rng.normal(size=3 * n),
        a_rows=np.arange(n, dtype=np.int32),
        a_cols=np.arange(n, dtype=np.int32),
        a_vals=np.ones(n), a_cid=np.arange(n, dtype=np.int32),
    )
    prob = canonicalize(SDPAData(n_constrs=n, blocks=[blk], b=np.ones(n)))
    assert prob.cones[0].kind_a == "diag"
    cones0, _ = build_cone_ops(prob, jnp.float64)
    cones1, _, constr_order = build_cone_ops_internal(prob, jnp.float64)
    ops0, ops1 = cones0[0], cones1[0]
    assert ops1.diag_identity and constr_order is not None
    U = rng.normal(size=(n, 4))
    V = rng.normal(size=(n, 4))
    w = rng.normal(size=n)
    Ui, Vi = ops1.permute_rows_in(U), ops1.permute_rows_in(V)
    cv_int = np.asarray(ops1.constr_vals(jnp.array(Ui), jnp.array(Vi)))
    cv0 = np.asarray(ops0.constr_vals(jnp.array(U), jnp.array(V)))
    np.testing.assert_allclose(cv_int, cv0[constr_order], atol=1e-12)
    w_int = w[constr_order]
    out1 = ops1.permute_rows_out(np.asarray(
        ops1.apply_w(jnp.array(w_int), jnp.array(Ui), obj_coef=1.0)))
    out0 = np.asarray(ops0.apply_w(jnp.array(w), jnp.array(U), obj_coef=1.0))
    np.testing.assert_allclose(out1, out0, atol=1e-12)
