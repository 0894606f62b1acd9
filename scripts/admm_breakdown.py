"""Time the pieces of one ADMM iteration on a real instance.

Usage: python scripts/admm_breakdown.py <instance> [rank]
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from ltr_lowrank_sdp_tpu.problem import load_problem
from ltr_lowrank_sdp_tpu.config import SolverParams
from ltr_lowrank_sdp_tpu.solver.driver import Solver

path = sys.argv[1]
r = int(sys.argv[2]) if len(sys.argv) > 2 else 25
prob = load_problem(path)
params = SolverParams(disable_oracle=True, dtype="auto")
sv = Solver(prob, params)
alm, admm = sv.phases([r] * len(prob.cones))
dt = sv.dtype
key = jax.random.PRNGKey(0)
U = tuple(jax.random.normal(jax.random.fold_in(key, i), (c.n, r), dt) * 0.1
          for i, c in enumerate(sv.cones))
V = tuple(jnp.array(u) for u in U)
dual = jnp.zeros(prob.m, dt)
carry = admm.init_carry(U, V, None, None, dual, 1.0)
rho = jnp.asarray(10.0, dt)
cg_tol = jnp.asarray(1e-6, dt)

def timeit(f, *a, reps=20):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*a)
    jax.block_until_ready(o)
    return round((time.perf_counter()-t0)/reps*1e3, 3)

res = {}
it_j = jax.jit(lambda c: admm._iteration(c, rho, cg_tol))
res["full_iteration_ms"] = timeit(it_j, carry)
met_j = jax.jit(admm._metrics)
res["metrics_ms"] = timeit(met_j, carry)
cone_j = jax.jit(lambda c: admm._cone_update(0, c.U[0], c.V[0], c.CV[0],
                                             c, rho, cg_tol))
res["cone_update_ms"] = timeit(cone_j, carry)
ops = sv.cones[0]
f_cv = jax.jit(lambda u, v: ops.constr_vals(u, v))
res["constr_vals_ms"] = timeit(f_cv, U[0], V[0])
f_ac = jax.jit(ops.apply_c)
res["apply_c_ms"] = timeit(f_ac, U[0])
w = jnp.zeros(prob.m, dt)
f_aa = jax.jit(lambda ww, y: ops.apply_a(ww, y))
res["apply_a_ms"] = timeit(f_aa, w, U[0])
g_j = jax.jit(lambda u, v: jnp.matmul((0.5*(u+v)).T, 0.5*(u+v),
                                      preferred_element_type=dt))
res["gram_ms"] = timeit(g_j, U[0], V[0])
# one CG matvec
def matvec(x):
    wloc = ops.constr_vals(x, V[0])
    return x + ops.apply_a(wloc, V[0])
mv_j = jax.jit(matvec)
res["cg_matvec_ms"] = timeit(mv_j, U[0])
res["diag_identity"] = ops.diag_identity
res["kind_a"] = ops.kind_a
print(json.dumps(res))
