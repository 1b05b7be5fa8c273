"""Scaling-efficiency + comm-transport benchmark task.

The reference A/B-tests its MPI transport with OSU microbenchmarks and
archives the results (/root/reference/sw_stack/.../osu-bench.sh:15-86,
results/mpi_gpu_rdma/24W7.json).  TPU analog: ppermute ring bandwidth +
psum latency sweep over the visible devices, plus a weak-scaling run of
the Held-Suarez step over growing submeshes (1, 2, 4, ... devices along
the intra-face y axis), reporting parallel efficiency - the >= 80%
BASELINE.md target.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

from ...core.config import DycoreConfig, MeshConfig
from ..environment import Environment
from ..progress import Progress
from ..registry import Registry
from ..task import TaskBase


@Registry.register
class ScalingBench(TaskBase):
    def run_action(self, config, env: Environment) -> None:
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from ...models.held_suarez import build_model
        from ...parallel.mesh import comm_microbench

        ws = env.CI_WORKSPACE
        os.makedirs(ws, exist_ok=True)
        devs = jax.devices()
        results = {"devices": str(devs), "n_devices": len(devs)}

        # ---- comm microbench (OSU analog) -------------------------------
        if len(devs) > 1:
            results["comm"] = comm_microbench(repeats=10)

        # ---- weak scaling: fixed per-device rows ------------------------
        sizes = [n for n in (1, 2, 4, 8) if n <= len(devs)]
        rows_per_dev = 8
        scaling = []
        for nd in sizes:
            npx = rows_per_dev * nd
            cfg = DycoreConfig(npx=npx, npz=16, dt=600.0, n_split=3)
            model = build_model(cfg)
            st = model.init(perturb=1e-3)
            mesh = Mesh(np.asarray(devs[:nd]), axis_names=("y",))

            def spec(x):
                if x.ndim >= 3 and x.shape[0] == 6 and x.shape[1] % nd == 0:
                    return NamedSharding(mesh, P(None, "y"))
                return NamedSharding(mesh, P())

            st = jax.tree.map(lambda x: jax.device_put(x, spec(x)), st)
            step = jax.jit(model.step_fn.__wrapped__)
            s = step(st)
            jax.tree.map(lambda x: x.block_until_ready(), s)
            t0 = time.perf_counter()
            for _ in range(3):
                s = step(s)
            jax.tree.map(lambda x: x.block_until_ready(), s)
            dt = (time.perf_counter() - t0) / 3
            scaling.append({"n_devices": nd, "npx": npx, "step_s": dt,
                            "gridpoints_per_s": cfg.grid_points / dt})
        # weak-scaling efficiency vs 1 device (same per-device work)
        if scaling:
            base = scaling[0]["gridpoints_per_s"]
            for entry in scaling:
                entry["efficiency"] = (entry["gridpoints_per_s"] /
                                       (base * entry["n_devices"]))
        results["weak_scaling"] = scaling

        path = os.path.join(ws, "scaling_bench.json")
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
        env.set("scaling.results", results)
        for entry in scaling:
            Progress.log(
                f"{entry['n_devices']} dev: c{entry['npx']} "
                f"{entry['step_s']*1e3:.1f} ms/step, "
                f"eff {entry['efficiency']*100:.0f}%")

    def check(self, config, env: Environment) -> bool:
        results = env.get("scaling.results")
        if not results:
            return False
        os.makedirs(env.artifact_directory, exist_ok=True)
        src = os.path.join(env.CI_WORKSPACE, "scaling_bench.json")
        import shutil

        shutil.copy(src, os.path.join(env.artifact_directory,
                                      "scaling_bench.json"))
        sc = results.get("weak_scaling", [])
        return all(np.isfinite(e["step_s"]) and e["step_s"] > 0 for e in sc)
