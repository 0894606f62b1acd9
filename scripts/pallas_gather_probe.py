"""Probe: can Mosaic gather rows of a VMEM-resident array by a dynamic
index vector, and how fast vs the XLA HBM gather?

Decides the design of a Pallas SpMM kernel: the XLA gather costs ~7ns per
index (HBM random access); if VMEM-resident gathers run at ~1 row/cycle the
SpMM hot kernel gets ~10x faster.

Usage: python scripts/pallas_gather_probe.py [n_rows] [n_idx] [r]
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
M = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
R = int(sys.argv[3]) if len(sys.argv) > 3 else 32

key = jax.random.PRNGKey(0)
Y = jax.random.normal(key, (N, R), jnp.float32)
idx = jax.random.randint(jax.random.fold_in(key, 1), (M,), 0, N, jnp.int32)

def timeit(f, *a, reps=50):
    o = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / reps * 1e3

res = {"N": N, "M": M, "R": R}

# --- baseline: XLA gather + row-sum (forces materialization) ---
f_xla = jax.jit(lambda y, i: y[i].sum(axis=0))
res["xla_gather_ms"] = round(timeit(f_xla, Y, idx), 3)

# --- pallas: whole Y in VMEM, gather by jnp.take, reduce in-kernel ---
TILE = 8192  # index tile per grid step

def kern(idx_ref, y_ref, out_ref, acc_ref):
    i = pl.program_id(0)
    rows = jnp.take(y_ref[:], idx_ref[:], axis=0)   # (TILE, R) dynamic gather
    part = jnp.sum(rows, axis=0, keepdims=True)     # (1, R)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += part

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]

try:
    f_pl = jax.jit(lambda y, i: pl.pallas_call(
        kern,
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda g: (g,), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, R), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, R), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, R), jnp.float32)],
    )(i, y))
    got = np.asarray(f_pl(Y, idx))
    want = np.asarray(f_xla(Y, idx))
    res["pallas_ok"] = bool(np.allclose(got, want, rtol=2e-2, atol=1e-1))
    res["pallas_gather_ms"] = round(timeit(f_pl, Y, idx), 3)
except Exception as e:  # noqa: BLE001
    res["pallas_error"] = f"{type(e).__name__}: {str(e)[:400]}"

print(json.dumps(res))
