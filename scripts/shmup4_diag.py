"""shmup4 dual-infeasibility diagnosis (VERDICT r4 weak #2).

Solves shmup4 with default params, then decomposes the final dual
infeasibility EXACTLY on the host in f64 (dense eigendecomposition of
every SDP slack block + the LP slack negativity) so we can see which
component keeps the solve at ``primal_optimal`` (dinf_l1 5.1e-4 in r4)
and at what magnitude.  Also prints the stage-time breakdown of the
207s solve.

Usage: python scripts/shmup4_diag.py [--dat path] [--time-limit 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def dense_slack(cone, w, obj_scale):
    """S = obj_scale * C - A*(w), dense f64 (upper-tri entry lists)."""
    S = np.zeros((cone.n, cone.n))
    r, c, v = cone.c_rows, cone.c_cols, cone.c_vals
    np.add.at(S, (r, c), obj_scale * v)
    r, c, v, cid = cone.a_rows, cone.a_cols, cone.a_vals, cone.a_cid
    np.add.at(S, (r, c), -v * w[cid])
    off = S.T.copy()
    np.fill_diagonal(off, 0.0)
    return S + off


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dat", default="/root/reference/lorads/data/"
                    "General_SDP/shmup4.dat-s")
    ap.add_argument("--time-limit", type=float, default=400.0)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--param", action="append", default=[],
                    help="extra SolverParams overrides key=value")
    args = ap.parse_args()

    from ltr_lowrank_sdp_tpu.config import SolverParams
    from ltr_lowrank_sdp_tpu.problem import load_problem
    from ltr_lowrank_sdp_tpu.solver.driver import Solver

    overrides = {}
    for kv in args.param:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        overrides[k] = v

    prob = load_problem(args.dat)
    params = SolverParams(disable_oracle=True, return_factors=True,
                          time_sec_limit=args.time_limit, **overrides)
    sv = Solver(prob, params)
    t0 = time.time()
    res = sv.solve()
    wall = time.time() - t0
    print(f"status={res.status.value} wall={wall:.1f}s "
          f"pobj={res.pobj:.6e} gap={res.gap:.3e} "
          f"pinf_l1={res.pinf_l1:.3e} dinf_l1={res.dinf_l1:.3e} "
          f"ranks={res.final_ranks}")
    print("stage_times:", {k: round(v, 2)
                           for k, v in (res.stage_times or {}).items()})
    print(f"alm_outer={res.alm_outer_iters} alm_inner={res.alm_inner_iters} "
          f"admm={res.admm_iters} cg={res.cg_iters}")

    # ---- exact f64 dual-infeasibility decomposition ----
    # S_k = obj_scale*C_k - A_k*(w) with w the (scaled-units) dual;
    # mirrors driver._final_traced / _parse_final exactly, then rescales
    # by /obj_scale/(1+||C||_1) like the solver's reported dinf_l1
    w = np.asarray(res.dual, np.float64)
    obj_scale = float(res.obj_scale)
    comps = {}
    total = 0.0
    for i, cone in enumerate(prob.cones):
        S = dense_slack(cone, w, obj_scale)
        lam = np.linalg.eigvalsh(S)
        comps[f"sdp{i}_n{cone.n}"] = {
            "lam_min": float(lam[0]),
            "contrib": float(abs(min(lam[0], 0.0)) / obj_scale
                             / (prob.c_nrm1 + 1.0)),
        }
        total += abs(min(lam[0], 0.0))
    if prob.lp is not None:
        slack = obj_scale * prob.lp.c.astype(np.float64).copy()
        np.add.at(slack, prob.lp.col, -prob.lp.vals * w[prob.lp.cid])
        lp_neg = float(np.abs(np.minimum(slack, 0.0)).sum())
        comps["lp"] = {"min_slack": float(slack.min()),
                       "neg_l1_contrib": lp_neg / obj_scale
                       / (prob.c_nrm1 + 1.0),
                       "n_neg": int((slack < 0).sum())}
        total += lp_neg
    dinf = total / obj_scale / (prob.c_nrm1 + 1.0)
    print("components:", json.dumps(comps, indent=1))
    print(f"host f64 dinf_l1 = {dinf:.6e}  (solver reported "
          f"{res.dinf_l1:.6e}); 5*tol bar = {5 * params.phase2_tol:.1e}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"wall": wall, "status": res.status.value,
                       "stage_times": res.stage_times, "components": comps,
                       "dinf_host_f64": dinf,
                       "dinf_reported": res.dinf_l1}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
