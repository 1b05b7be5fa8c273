"""Command-line entry points.

`python -m geosongpu_tpu.cli ci NAME ACTION` is the analog of the
reference's `tcn-ci` console script (/root/reference/src/tcn/ci/dispatch.py:7-22:
name, action, --artifact, --setup_only, CI_WORKSPACE env).
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="geosongpu-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    ci = sub.add_parser("ci", help="run a CI experiment pipeline")
    ci.add_argument("experiment_name")
    ci.add_argument("experiment_action", nargs="?", default="All",
                    choices=["All", "Validation", "Benchmark"])
    ci.add_argument("--artifact", default=".", help="artifact directory")
    ci.add_argument("--setup_only", action="store_true")
    ci.add_argument("--workspace", default=None,
                    help="override CI_WORKSPACE (else env var)")
    ci.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (jax.config)")

    run = sub.add_parser("run", help="run a model directly")
    run.add_argument("experiment_name")
    run.add_argument("--steps", type=int, default=None)
    run.add_argument("--cpu", action="store_true")

    args = p.parse_args(argv)

    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.cmd == "ci":
        from .harness.task import dispatch

        ws = args.workspace or os.environ.get(
            "CI_WORKSPACE", os.path.join(os.getcwd(), ".ci_workspace"))
        dispatch(args.experiment_name, args.experiment_action,
                 artifact_directory=args.artifact,
                 setup_only=args.setup_only, workspace=ws)
        return 0

    if args.cmd == "run":
        from .core.config import ExperimentConfig
        from .harness.task import get_config

        raw = get_config(args.experiment_name)
        cfg = ExperimentConfig.from_dict(
            {"name": args.experiment_name, **raw["experiment"]})
        steps = args.steps or cfg.run.steps
        if cfg.model == "aquaplanet":
            from .models.aquaplanet import build_model
        else:
            from .models.held_suarez import build_model
        model = build_model(cfg.dycore)
        state = model.init(perturb=1e-3)
        import time

        t0 = time.perf_counter()
        state = model.step_fn(state)  # warm-up/compile
        state.u.block_until_ready()
        print(f"compile: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        final = model.run(state, steps)
        final.u.block_until_ready()
        dt = time.perf_counter() - t0
        import numpy as np

        print(f"{steps} steps in {dt:.2f}s "
              f"({dt/steps*1e3:.1f} ms/step); "
              f"ps range {float(final.ps.min()):.0f}..{float(final.ps.max()):.0f} Pa; "
              f"max|u| {float(np.abs(final.u).max()):.2f} m/s")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
