#!/usr/bin/env python
"""Per-HLO device-time profile of the Held-Suarez step (measured, on-chip).

Captures a jax.profiler trace of N steps and mines the 'XLA Ops' device
lane of the chrome trace: prints every fusion/op by summed self time -
the MEASURED kernel-level picture that the byte-count roofline model
(benchmark/profiler.py) approximates.  This is the framework's answer to
the reference's GEOS log mining (geos_log_parser.py): measured, not
scraped.

Usage: python scripts/xprof_kernels.py [--npx 48] [--npz 72] [--steps 5]
                                       [--pallas] [--top 40]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_op_times(trace_dir: str):
    """{op name: total us} from the XLA Ops lane of the newest trace."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # find the (pid, tid) of the 'XLA Ops' device lane(s)
    op_lanes = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == "XLA Ops"):
            op_lanes.add((e["pid"], e["tid"]))
    times = defaultdict(float)
    for e in events:
        if (e.get("ph") == "X"
                and (e.get("pid"), e.get("tid")) in op_lanes):
            times[e.get("name", "?")] += e.get("dur", 0.0)
    return dict(times)


def categorize(name: str) -> str:
    n = name.lower()
    if "pallas" in n or "custom-call" in n:
        return "pallas/custom"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion"
    for k in ("copy", "transpose", "reshape", "bitcast", "concatenate",
              "slice", "pad", "gather", "scatter", "select", "broadcast",
              "reduce", "convert", "iota", "dot", "convolution",
              "all-reduce", "all-gather", "collective", "dynamic"):
        if k in n:
            return k
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npx", type=int, default=48)
    ap.add_argument("--npz", type=int, default=72)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--nsplit", type=int, default=6)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--outdir", default="")
    args = ap.parse_args()

    import jax

    from geosongpu_tpu.core.config import DycoreConfig
    from geosongpu_tpu.harness.checkpoint import enable_compilation_cache
    from geosongpu_tpu.models.held_suarez import build_model

    try:
        enable_compilation_cache()
    except Exception:
        pass

    cfg = DycoreConfig(npx=args.npx, npz=args.npz, dt=600.0,
                       n_split=args.nsplit, pallas_dycore=args.pallas)
    model = build_model(cfg)
    state = model.init(perturb=1e-3)
    state = model.step_fn(state)
    jax.block_until_ready(state)

    outdir = args.outdir or tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(outdir):
        x = state
        for _ in range(args.steps):
            x = model.step_fn(x)
        jax.block_until_ready(x)

    times = device_op_times(outdir)
    entries = sorted(((t, n) for n, t in times.items()), reverse=True)
    total = sum(t for t, _ in entries)
    print(f"\n== XLA Ops device time: {total/1e3:.2f} ms / {args.steps} "
          f"steps = {total/args.steps/1e3:.3f} ms/step ==\n")

    cats = defaultdict(float)
    for t, n in entries:
        cats[categorize(n)] += t
    print("-- by category --")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {c:<16s} {t/args.steps/1e3:8.3f} ms/step {100*t/total:5.1f}%")

    print(f"\n-- top {args.top} ops --")
    for t, n in entries[:args.top]:
        print(f"  {t/args.steps/1e3:8.4f} ms/step {100*t/total:5.1f}%  "
              f"{n[:100]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
