#!/usr/bin/env python3
"""Regenerate BANDS.json from the last 3 round boards (dev tool).

The maintenance procedure pinned by SCALING.md §"Bench self-adjudication":
after each round whose driver bench ran clean (rc=0), band(q) = min over
q's observations on the LAST 3 round boards, where one board's
observation is min(sweep value, in-run retime if present). A query absent
from all three boards (line-cap-dropped — i.e. among the fastest — or
newly registered) keeps its existing band; a new query gets its band on
the first board that shows it. The 3-round window lets legitimately
faster plans TIGHTEN their band (stale loose bands under-flag future
regressions) and ages out minima from retired plan shapes, while
min-of-observations keeps the band the reproducible best so the 1.8x
mover test stays meaningful.

Usage: python3 tools/refresh_bands.py BENCH_r17.json BENCH_r18.json BENCH_r19.json
Writes BANDS.json (sorted, one entry per line, the committed format).
"""
import json, sys


def observations(path):
    d = json.load(open(path))
    p = d.get("parsed") or {}
    qs = p.get("queries") or {}
    obs = {}
    for k, v in qs.items():
        if k.endswith("rt"):
            continue
        rt = qs.get(k + "rt")
        obs[k] = min(v, rt) if rt is not None else v
    return obs


def main(boards):
    try:
        old = json.load(open("BANDS.json"))
    except FileNotFoundError:
        old = {}
    merged = dict(old)
    fresh = {}
    for b in boards:
        for k, v in observations(b).items():
            fresh[k] = min(fresh[k], v) if k in fresh else v
    merged.update(fresh)  # observed queries refresh; cap-dropped keep old
    with open("BANDS.json", "w") as f:
        f.write("{\n")
        items = sorted(merged.items())
        f.write(",\n".join(f'"{k}":{round(v, 2)}' for k, v in items))
        f.write("\n}\n")
    tightened = sum(1 for k in fresh if k in old and fresh[k] < old[k])
    loosened = sum(1 for k in fresh if k in old and fresh[k] > old[k])
    print(f"bands: {len(merged)} total, {len(fresh)} refreshed from "
          f"{len(boards)} boards ({tightened} tightened, {loosened} "
          f"loosened), {len(merged) - len(fresh)} carried")


if __name__ == "__main__":
    main(sys.argv[1:])
