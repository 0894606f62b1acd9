"""Upsert measured BENCH_ROW lines into bench_state.json.

Usage: python scripts/merge_bench_row.py row1.json [row2.json ...]
   or: python bench.py --one theta102 | python scripts/merge_bench_row.py -

Accepts raw ``BENCH_ROW {...}`` lines or bare row JSON; keeps the state
file's note/device/kernel fields, replaces any existing row of the same
instance name.
"""

from __future__ import annotations

import json
import os
import sys

STATE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_state.json")


def parse_rows(text: str):
    rows = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("BENCH_ROW "):
            line = line[len("BENCH_ROW "):]
        if not line.startswith("{"):
            continue
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            pass
    return rows


def main(argv):
    rows = []
    for arg in argv or ["-"]:
        text = sys.stdin.read() if arg == "-" else open(arg).read()
        rows.extend(parse_rows(text))
    if not rows:
        print("no rows parsed", file=sys.stderr)
        return 1
    with open(STATE) as f:
        state = json.load(f)
    by_name = {r["name"]: r for r in state.get("instances", [])}
    for row in rows:
        name = row.get("name")
        if not name:
            continue
        if "A_RRt_gflops" in row:
            for k in ("A_RRt_gflops", "A_RRt_usec", "A_RRt_shape"):
                if row.get(k) is not None:
                    state[k] = row[k]
            print(f"kernel probe: {row.get('A_RRt_gflops')} GFLOP/s")
            continue
        if "warm_sec" not in row:
            print(f"skip {name}: no measurement ({row.get('skipped')})")
            continue
        row.pop("from_cache", None)
        by_name[name] = row
        print(f"upsert {name}: {row['warm_sec']}s speedup "
              f"{row.get('speedup')}x mode={row.get('mode')}")
    state["instances"] = list(by_name.values())
    with open(STATE, "w") as f:
        json.dump(state, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
