import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from ltr_lowrank_sdp_tpu.problem import load_problem
from ltr_lowrank_sdp_tpu.ops.coneops import build_cone_ops

if len(sys.argv) < 2:
    sys.exit("usage: microbench.py <instance.(dat-s|mat)> "
             "(or set SDP_INSTANCE)")
path = sys.argv[1] if len(sys.argv) > 1 else os.environ["SDP_INSTANCE"]
prob = load_problem(path)
dt = jnp.float32
cones, _ = build_cone_ops(prob, dt)
ops = cones[0]
n, r = ops.n, 25
key = jax.random.PRNGKey(0)
U = jax.random.normal(key, (n, r), dt)
w = jax.random.normal(key, (prob.m,), dt)

def timeit(f, *a, reps=50):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/reps*1e3

res = {}
res["nnz_C"] = ops.c_sparse.nnz
res["padded_slots"] = ops.c_sparse.spmm.padded_slots if ops.c_sparse.spmm else 0
res["kind_a"] = ops.kind_a
f1 = jax.jit(lambda u: ops.constr_vals(u, u))
res["constr_vals_ms"] = timeit(f1, U)
f2 = jax.jit(lambda u: ops.apply_c(u))
res["apply_c_ms"] = timeit(f2, U)
f3 = jax.jit(lambda ww, u: ops.apply_w(ww, u, obj_coef=1.0, include_obj=True))
res["apply_w_ms"] = timeit(f3, w, U)
f4 = jax.jit(lambda u: ops.obj_value(u, u))
res["obj_value_ms"] = timeit(f4, U)
# raw gather bandwidth reference: Y[idx] with nnz random idx
idx = jnp.asarray(np.random.randint(0, n, ops.c_sparse.nnz), jnp.int32)
f5 = jax.jit(lambda u: u[idx].sum(0))
res["raw_gather_ms"] = timeit(f5, U)
# dense matmul reference at same flops
f6 = jax.jit(lambda a_, b_: a_ @ b_)
A = jax.random.normal(key, (4096, 4096), dt); B = jax.random.normal(key, (4096, r), dt)
res["dense_4096_ms"] = timeit(f6, A, B)
print(json.dumps({k: (round(v,3) if isinstance(v,float) else v) for k,v in res.items()}))
