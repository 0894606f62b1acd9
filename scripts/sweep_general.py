"""Sweep the bundled General_SDP + MC instances on the current backend.

Prints one JSON line per instance: warm solve time, status, DIMACS errors,
and the LoRADS CPU baseline (reference ``lorads/README.md`` Mittelmann table
:233-263) for speedup context.  Used to qualify instances for bench.py.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

DATA = "/root/reference/lorads/data"

# (name, path, lorads_cpu_sec from lorads/README.md:241-260, overrides)
INSTANCES = [
    ("checker_1.5", f"{DATA}/General_SDP/checker_1.5.dat-s", 4.8, {}),
    ("cphil12", f"{DATA}/General_SDP/cphil12.dat-s", 2.0, {}),
    ("ice_2.0", f"{DATA}/General_SDP/ice_2.0.dat-s", 8.0, {}),
    ("p_auss2_3.0", f"{DATA}/General_SDP/p_auss2_3.0.dat-s", 5.6, {}),
    ("shmup4", f"{DATA}/General_SDP/shmup4.dat-s", 117.0, {}),
    ("theta102", f"{DATA}/General_SDP/theta102.dat-s", 197.0, {}),
    ("MC_500", f"{DATA}/Matrix_Completion_SDP/MC_500.dat-s", None,
     {"heuristic_factor": 10.0}),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="subset of instance names")
    ap.add_argument("--time-limit", type=float, default=300.0)
    args = ap.parse_args()

    known = {name for name, *_ in INSTANCES}
    unknown = [n for n in args.names if n not in known]
    if unknown:
        sys.exit(f"unknown instance name(s): {unknown}; "
                 f"choose from {sorted(known)}")

    from ltr_lowrank_sdp_tpu.config import SolverParams
    from ltr_lowrank_sdp_tpu.problem import load_problem
    from ltr_lowrank_sdp_tpu.solver.driver import Solver

    for name, path, base, overrides in INSTANCES:
        if args.names and name not in args.names:
            continue
        prob = load_problem(path)
        params = SolverParams(disable_oracle=True, dtype="auto",
                              return_factors=False,
                              time_sec_limit=args.time_limit, **overrides)
        try:
            sv = Solver(prob, params)
            sv.solve()                     # cold (compile)
            t0 = time.time()
            res = sv.solve()
            warm = time.time() - t0
            err_max = max(res.pinf_l1, res.pinf_inf, res.gap,
                          res.dinf_l1, res.dinf_inf)
            print(json.dumps({
                "name": name, "warm_sec": round(warm, 3),
                "status": res.status.value,
                "pobj": res.pobj, "gap": res.gap,
                "pinf_l1": res.pinf_l1, "dinf_l1": res.dinf_l1,
                "err_max": err_max,
                "ranks": res.final_ranks,
                "alm": [res.alm_outer_iters, res.alm_inner_iters],
                "admm": res.admm_iters, "cg": res.cg_iters,
                "lorads_cpu_sec": base,
                "speedup": (round(base / warm, 3) if base else None),
            }), flush=True)
        except Exception as e:  # keep sweeping
            print(json.dumps({"name": name, "error": repr(e)}), flush=True)


if __name__ == "__main__":
    main()
