"""Batched-instance data parallelism on the virtual 8-device CPU mesh.

(Single-cone sharded-operator parity lives in ``test_meshops.py``; the
historical ``parallel.sharded_ops`` compat layer was folded into
``parallel.meshops`` and removed.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltr_lowrank_sdp_tpu.parallel.mesh import make_mesh


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
