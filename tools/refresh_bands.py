#!/usr/bin/env python3
"""Regenerate BANDS.json from the last 3 round boards (dev tool).

The maintenance procedure pinned by SCALING.md §"Bench self-adjudication":
after each round whose driver bench ran clean (rc=0), band(q) = min over
q's observations on the LAST 3 round boards, where one board's
observation is min(sweep value, in-run retime if present). A query absent
from all three boards keeps its existing band; a new query gets its band
on the first board that shows it. The 3-round window lets legitimately
faster plans TIGHTEN their band (stale loose bands under-flag future
regressions) and ages out minima from retired plan shapes, while
min-of-observations keeps the band the reproducible best so the 1.8x
mover test stays meaningful.

Board formats accepted, preferring the full-board detail artifact
(r21, VERDICT r20 #3 — the capped JSON line drops the fastest ~half of
the board, so cap-dropped queries had no band history):

  - bench_detail_rNN.json / bench_detail.json: {"premium": p,
    "queries": {"qNN": {"t": sweep, "band": b|null, "rt": r|null}}}
  - BENCH_rNN.json (legacy): {"parsed": {"queries": {"qNN": t,
    "qNNrt": r}, "premium": p?}}

HOT-BOARD EXCLUSION (r21, VERDICT r20 #1): a board whose premium
(median sweep/band) exceeds 1.25 ran under correlated host load; its
SWEEP values are inflated and would age every band looser (the silent
failure mode: r20's refresh aged 70 bands looser from r18's hot board).
Such a board contributes only its RETIME observations (taken after the
load transient), never its sweep values.

Usage: python3 tools/refresh_bands.py <board> <board> <board>
Writes BANDS.json (sorted, one entry per line, the committed format).
"""
import json, sys

HOT_PREMIUM = 1.25


def observations(path):
    d = json.load(open(path))
    # format detection by top-level marker (ADVICE r21): a detail artifact
    # always carries "total_adj"; an empty or unrecognized board is an
    # ERROR, never a silent zero-observation contribution
    if "total_adj" in d:
        if not d.get("queries"):
            raise SystemExit(f"{path}: detail artifact with an empty "
                             "queries map — refusing to contribute zero "
                             "observations silently")
        # detail-artifact format
        premium = d.get("premium")
        hot = premium is not None and premium > HOT_PREMIUM
        obs = {}
        for k, v in d["queries"].items():
            rt = v.get("rt")
            if hot:
                if rt is not None:
                    obs[k] = rt
            else:
                obs[k] = min(v["t"], rt) if rt is not None else v["t"]
        if hot:
            print(f"[hot] {path}: premium={premium} > {HOT_PREMIUM} — "
                  f"sweep values excluded, {len(obs)} retimes kept")
        return obs
    # legacy capped-line format
    if "parsed" not in d:
        raise SystemExit(f"{path}: neither a detail artifact (total_adj) "
                         "nor a legacy board (parsed) — unrecognized format")
    p = d.get("parsed") or {}
    qs = p.get("queries") or {}
    if not qs:
        raise SystemExit(f"{path}: legacy board with an empty queries map")
    premium = p.get("premium")
    hot = premium is not None and premium > HOT_PREMIUM
    obs = {}
    for k, v in qs.items():
        if k.endswith("rt"):
            continue
        rt = qs.get(k + "rt")
        if hot:
            if rt is not None:
                obs[k] = rt
        else:
            obs[k] = min(v, rt) if rt is not None else v
    if hot:
        print(f"[hot] {path}: premium={premium} > {HOT_PREMIUM} — "
              f"sweep values excluded, {len(obs)} retimes kept")
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
