"""Compensated double-single reductions vs f64 ground truth."""

import jax.numpy as jnp
import numpy as np

from ltr_lowrank_sdp_tpu.ops.compsum import csum, cvdot, two_prod, two_sum


def test_two_sum_exact():
    a = jnp.float32(1e8)
    b = jnp.float32(1.5)
    s, e = two_sum(a, b)
    assert float(s) + float(e) == 1e8 + 1.5


def test_two_prod_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    b = jnp.asarray(rng.standard_normal(1000), jnp.float32)
    p, e = two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    err = np.abs(np.asarray(p, np.float64) + np.asarray(e, np.float64)
                 - exact)
    assert err.max() == 0.0


def test_csum_cancellation():
    # heavy cancellation: sum |x| >> |sum x|
    rng = np.random.default_rng(1)
    x64 = rng.standard_normal(1 << 20)
    x32 = x64.astype(np.float32)
    truth = float(np.sum(x32.astype(np.float64)))
    got = float(csum(jnp.asarray(x32)))
    naive = float(np.float32(np.sum(x32, dtype=np.float32)))
    scale = float(np.sum(np.abs(x32)))
    assert abs(got - truth) <= 1e-10 * scale
    # sanity: the compensated sum is (almost always strictly) better
    assert abs(got - truth) <= abs(naive - truth) + 1e-12 * scale


def test_cvdot_matches_f64():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4096, 25)).astype(np.float32)
    y = rng.standard_normal((4096, 25)).astype(np.float32)
    truth = float(np.vdot(x.astype(np.float64), y.astype(np.float64)))
    got = float(cvdot(jnp.asarray(x), jnp.asarray(y)))
    scale = float(np.sum(np.abs(x.astype(np.float64) * y)))
    assert abs(got - truth) <= 1e-9 * scale


def test_csum_edge_shapes():
    assert float(csum(jnp.zeros((0,), jnp.float32))) == 0.0
    assert float(csum(jnp.asarray([3.0], jnp.float32))) == 3.0
    assert float(csum(jnp.asarray([1.0, 2.0, 3.0], jnp.float32))) == 6.0
