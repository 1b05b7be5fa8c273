#!/usr/bin/env python
"""Nesting-corrected per-op SELF-time miner for jax.profiler traces.

xprof_kernels.py sums raw event durations, which double-counts nested
spans (`while` bodies, fused subcomputations appear inside their parent's
interval on the same lane).  This tool rebuilds the nesting with a stack
sweep per lane and attributes each op its SELF time = duration minus the
durations of its direct children, so the per-name totals add up to the
interval-union device-busy time (hws/xprof_util.py).

Usage: python scripts/xprof_selftime.py TRACE_DIR [--steps N] [--top 40]
       [--group]    # collapse trailing .N numbering
"""
import argparse
import glob
import gzip
import json
import re
from collections import defaultdict


def sweep(trace_dir: str):
    """Correct stack sweep: returns {name: self_us}."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    lanes = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == "XLA Ops"):
            lanes.add((e["pid"], e["tid"]))
    per_lane = defaultdict(list)
    for e in events:
        if (e.get("ph") == "X"
                and (e.get("pid"), e.get("tid")) in lanes):
            per_lane[(e["pid"], e["tid"])].append(
                (e["ts"], e["ts"] + e.get("dur", 0.0), e.get("name", "?")))
    self_us = defaultdict(float)
    for evs in per_lane.values():
        evs.sort(key=lambda x: (x[0], -x[1]))
        # stack entries: [end, name, dur, child_sum]
        stack = []
        for s, t, n in evs:
            while stack and stack[-1][0] <= s + 1e-9:
                e_, n_, d_, c_ = stack.pop()
                self_us[n_] += d_ - c_
            if stack:
                stack[-1][3] += t - s
            stack.append([t, n, t - s, 0.0])
        while stack:
            e_, n_, d_, c_ = stack.pop()
            self_us[n_] += d_ - c_
    return dict(self_us)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=1)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--group", action="store_true")
    args = ap.parse_args()
    times = sweep(args.trace_dir)
    if args.group:
        g = defaultdict(float)
        for n, t in times.items():
            g[re.sub(r"[._]\d+$", "", n)] += t
        times = dict(g)
    entries = sorted(((t, n) for n, t in times.items()), reverse=True)
    total = sum(t for t, _ in entries)
    print(f"== self-time total {total/1e3:.1f} ms / {args.steps} steps "
          f"= {total/args.steps/1e3:.2f} ms/step ==")
    for t, n in entries[:args.top]:
        print(f"  {t/args.steps/1e3:9.3f} ms/step {100*t/total:5.1f}%  "
              f"{n[:110]}")


if __name__ == "__main__":
    main()
