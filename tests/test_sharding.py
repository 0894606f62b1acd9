"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltr_lowrank_sdp_tpu.parallel.mesh import make_mesh
from ltr_lowrank_sdp_tpu.parallel.sharded_ops import (
    shard_cone_entries, sharded_constr_vals, sharded_apply_w,
)
from ltr_lowrank_sdp_tpu.ops.coneops import ConeOps
from tests.test_coneops import random_cone


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, batch=1)


def test_sharded_ops_match_single_device(mesh8):
    rng = np.random.default_rng(0)
    n, m, r = 32, 21, 5
    cone = random_cone(rng, n, m, force_kind="sparse")
    ops = ConeOps(cone)
    data = shard_cone_entries(cone, mesh8.shape["constr"])

    U = jnp.array(rng.normal(size=(n, r)))
    V = jnp.array(rng.normal(size=(n, r)))
    w = jnp.array(rng.normal(size=m))
    Y = jnp.array(rng.normal(size=(n, r)))

    cv = sharded_constr_vals(mesh8, data, U, V)
    cv_ref = ops.constr_vals(U, V)
    np.testing.assert_allclose(np.asarray(cv), np.asarray(cv_ref),
                               rtol=1e-12, atol=1e-12)

    out = sharded_apply_w(mesh8, data, w, Y)
    out_ref = ops.apply_w(w, Y, obj_coef=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-12, atol=1e-12)


def test_batched_alm_step_sharded():
    from ltr_lowrank_sdp_tpu.parallel.batch import (
        BatchedMaxCutProblem, batched_alm_steps,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, batch=8, axis_names=("batch", "constr"))

    rng = np.random.default_rng(1)
    B, n, r, nnz = 8, 24, 4, 60
    rows = rng.integers(0, n, size=(B, nnz)).astype(np.int32)
    cols = np.maximum(rows, rng.integers(0, n, size=(B, nnz)).astype(np.int32))
    vals = rng.normal(size=(B, nnz))
    prob = BatchedMaxCutProblem(
        c_rows=jnp.asarray(rows), c_cols=jnp.asarray(cols),
        c_vals=jnp.asarray(vals), b=jnp.ones((B, n)), n=n,
    )
    R = jnp.array(rng.normal(size=(B, n, r)))
    dual = jnp.zeros((B, n))
    R1, dual1, pinf = batched_alm_steps(mesh, prob, R, dual, 1.0,
                                        num_steps=25)
    # every instance's infeasibility must drop after 25 ALM steps
    cons0 = jnp.sum(R * R, axis=2)
    pinf0 = jnp.linalg.norm(1.0 - cons0, axis=1) / (1.0 + n)
    assert np.all(np.asarray(pinf) < np.asarray(pinf0))
    assert float(jnp.max(pinf)) < 0.5 * float(jnp.max(pinf0))
