import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time, sys
from ltr_lowrank_sdp_tpu.config import SolverParams
from ltr_lowrank_sdp_tpu.problem import load_problem
from ltr_lowrank_sdp_tpu.solver.driver import Solver

if len(sys.argv) < 2:
    sys.exit("usage: profile_amz.py <instance.(dat-s|mat)>")
path = sys.argv[1]
prob = load_problem(path)
params = SolverParams(disable_oracle=True, dtype="auto", phase1_tol=1e+1, heuristic_factor=100.0)
sv = Solver(prob, params)
res = sv.solve()
t0 = time.time()
res = sv.solve()
warm = time.time() - t0
print(json.dumps({
    "warm": round(warm,2), "status": res.status.value,
    "alm_outer": res.alm_outer_iters, "alm_inner": res.alm_inner_iters,
    "admm": res.admm_iters, "cg": res.cg_iters,
    "stages": {k: round(v,2) for k,v in (res.stage_times or {}).items()},
    "ranks": res.final_ranks, "gap": res.gap, "pinf": res.pinf_l1, "dinf": res.dinf_l1,
}))
