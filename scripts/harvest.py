#!/usr/bin/env python
"""Dataset harvesting: sweep instances, solve with trajectory logging, and
process graphs — the reference's ``dataset/run_lorads.sh`` +
``dataset/run_parser.sh`` combined into one Python driver.

For every ``*.dat-s`` under --instances it
1. solves with per-family parameter heuristics (name/size regex rules of
   ``run_lorads.sh:26-77``), writing ``sol_json/<name>.json`` (the oracle
   rank trajectory = training labels) and ``logs/<name>.log``;
2. processes the instance into graph features at ``proc/<name>.npz``.

Skips existing outputs; per-instance timeouts guard runaway solves.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def family_params(name: str, n: int, timeout: float):
    """Per-family solver presets (``dataset/run_lorads.sh:26-77``)."""
    from ltr_lowrank_sdp_tpu.config import SolverParams

    kw = dict(phase1_tol=1e-3, heuristic_factor=1.0, times_log_rank=2.0,
              rho_max=5000.0, time_sec_limit=timeout)
    maxcut_pats = (r"^[Gg][0-9]", r"^maxcut", r"^mcp", r"^p2p", r"^delaunay",
                   r"^rgg", r"^vsp", r"^cs[0-9]", r"^cit", r"^fe_",
                   r"^amazon", r"[0-9]+a$")
    if any(re.search(p, name) for p in maxcut_pats):
        if n >= 40000:
            kw.update(phase1_tol=1e1, heuristic_factor=100.0)
        else:
            kw.update(phase1_tol=1e-2, heuristic_factor=10.0)
    elif re.match(r"^[Mm][Cc]_", name):
        mc = re.search(r"(?:MC_|mc_)([0-9]+)", name)
        if mc:
            mc_n = int(mc.group(1))
            if mc_n >= 10000:
                kw.update(heuristic_factor=2.5, times_log_rank=1.0)
            elif mc_n >= 1000:
                kw.update(heuristic_factor=5.0)
    elif re.search(r"_mb$", name) or re.search(r"mc$", name):
        kw.update(phase1_tol=1e-2, heuristic_factor=10.0)
    return SolverParams(**kw)


def main(argv=None):
    ap = argparse.ArgumentParser(description="harvest solver trajectories")
    ap.add_argument("--instances", default="dataset/instances")
    ap.add_argument("--root", default="dataset")
    ap.add_argument("--timeout", type=float, default=3600.0)
    ap.add_argument("--parse-timeout", type=float, default=900.0)
    ap.add_argument("--skip-solve", action="store_true")
    ap.add_argument("--skip-parse", action="store_true")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args(argv)

    from ltr_lowrank_sdp_tpu.problem import load_problem
    from ltr_lowrank_sdp_tpu.solver.driver import solve
    from ltr_lowrank_sdp_tpu.solver.logging import TrajectoryLogger
    from ltr_lowrank_sdp_tpu.data.processor import process_sdpa_to_graph

    for sub in ("sol_json", "logs", "proc"):
        os.makedirs(os.path.join(args.root, sub), exist_ok=True)

    files = sorted(glob.glob(os.path.join(args.instances, "**", "*.dat-s"),
                             recursive=True))
    print(f"{len(files)} instances")
    for path in files:
        name = os.path.basename(path).replace(".dat-s", "")
        json_out = os.path.join(args.root, "sol_json", f"{name}.json")
        log_out = os.path.join(args.root, "logs", f"{name}.log")
        proc_out = os.path.join(args.root, "proc", f"{name}.npz")

        if not args.skip_solve and (args.overwrite
                                    or not os.path.exists(json_out)):
            try:
                prob = load_problem(path)
                n = max(prob.block_dims) if prob.block_dims else 0
                params = family_params(name, n, args.timeout)
                logger = TrajectoryLogger(
                    params, problem_name=name, file_path=path,
                    log_file=log_out, verbose=False)
                t0 = time.time()
                res = solve(prob, params, logger=logger, json_path=json_out)
                print(f"[solve] {name}: {res.status.value} "
                      f"{time.time() - t0:.1f}s gap {res.gap:.1e}")
            except Exception:
                print(f"[solve] {name}: FAILED")
                traceback.print_exc()

        if not args.skip_parse and (args.overwrite
                                    or not os.path.exists(proc_out)):
            try:
                t0 = time.time()
                process_sdpa_to_graph(path, proc_out)
                print(f"[parse] {name}: {time.time() - t0:.1f}s")
            except Exception:
                print(f"[parse] {name}: FAILED")
                traceback.print_exc()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
