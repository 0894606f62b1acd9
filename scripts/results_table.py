"""Render benchmark/results/results.json into the RESULTS.md speedup table.

The headline artifact of the rank-schedule pipeline (reference claim: up to
3x from predicted schedules, ``/root/reference/README.md:3``; speedup
computed exactly as the reference does, t_default / t_sched,
``/root/reference/benchmark.py:419-421``).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="benchmark/results/results.json")
    ap.add_argument("--out", default="RESULTS.md")
    ap.add_argument("--device", default="TPU v5 lite (1 chip)")
    args = ap.parse_args()

    with open(args.results) as f:
        results = json.load(f)

    lines = [
        "# Schedule-vs-default benchmark (GNN rank predictor)",
        "",
        "Both timings are this repo's TPU-native solver on the same chip: "
        "`default` = LoRADS dynamic-rank heuristics; `sched` = the rank "
        "schedule predicted by the GATv2+LSTM model "
        "(artifacts in `benchmark/r_sched/`, produced by "
        "`scripts/predict_all.py` from the committed checkpoint — the same "
        "comparison as the reference's `benchmark.py` "
        "(speedup = t_default/t_sched, reference `benchmark.py:419-421`).",
        "",
        f"Device: {args.device}.  Produced by `python benchmark.py "
        "--checkpoint <ckpt>`; raw rows in `benchmark/results/results.json`.",
        "",
        "| instance | subtype | n | default s | default status | sched s | "
        "sched status | speedup | obj rel.diff |",
        "|---|---|---:|---:|---|---:|---|---:|---:|",
    ]
    speedups = []
    for name, row in sorted(results.items()):
        d, s = row.get("default"), row.get("schedule")
        if not d:
            continue
        sp = row.get("speedup")
        if s and sp and s.get("status") in ("primal_dual_optimal",
                                           "primal_optimal"):
            speedups.append(sp)
        lines.append(
            f"| {name} | {row.get('subtype','')} | {row.get('n','')} "
            f"| {d['solve_time_sec']:.2f} | {d['status']} "
            + (f"| {s['solve_time_sec']:.2f} | {s['status']} | {sp:.2f}x "
               f"| {row.get('obj_rel_diff', float('nan')):.1e} |"
               if s else "| — | — | — | — |")
        )
    if speedups:
        g = math.exp(sum(math.log(s) for s in speedups) / len(speedups))
        lines += ["",
                  f"**Geometric-mean speedup (certified sched rows): "
                  f"{g:.2f}x over {len(speedups)} instances.**"]
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out} ({len(speedups)} speedup rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
