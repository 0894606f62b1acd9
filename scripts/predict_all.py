"""Predict rank schedules for every benchmark instance -> benchmark/r_sched/.

One model load, one prediction per instance with a processed graph in
``dataset/proc`` (falling back to on-the-fly processing for .dat-s files),
writing the committed artifacts ``bench.py``'s schedule mode consumes
(``benchmark/r_sched/<name>.json``, reference artifact shape
``benchmark.py:123-133``: {"rank_schedule": [...], "schedule_length": N}).

Run on CPU so the TPU stays free:  JAX_PLATFORMS=cpu python scripts/predict_all.py -c runs/r5
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--checkpoint", default="runs/r5")
    ap.add_argument("--instances", default="benchmark/instances")
    ap.add_argument("--out", default="benchmark/r_sched")
    ap.add_argument("--root", default="dataset")
    args = ap.parse_args()

    from ltr_lowrank_sdp_tpu.data.loader import _load_graph_file
    from ltr_lowrank_sdp_tpu.data.processor import process_sdpa_to_graph
    from ltr_lowrank_sdp_tpu.models.checkpoint import (
        load_model, predict_schedule_for_graph,
    )

    model, params, _ = load_model(args.checkpoint)
    os.makedirs(args.out, exist_ok=True)
    for path in sorted(glob.glob(os.path.join(args.instances, "*", "*.dat-s"))):
        name = os.path.basename(path)[: -len(".dat-s")]
        cached = os.path.join(args.root, "proc", name + ".npz")
        if os.path.exists(cached):
            graph = _load_graph_file(cached)
        else:
            graph = process_sdpa_to_graph(path, None)
        sched, L = predict_schedule_for_graph(model, params, graph)
        artifact = {
            "name": name,
            "rank_schedule": [int(r) for r in sched],
            "schedule_length": int(L),
            "checkpoint": args.checkpoint,
        }
        with open(os.path.join(args.out, name + ".json"), "w") as f:
            json.dump(artifact, f, indent=2)
        print(f"{name:>24}: L={L} {sched}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
