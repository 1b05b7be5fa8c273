"""Held-Suarez pipeline task: the flagship workload.

Parity with /root/reference/src/tcn/ci/pipeline/held_suarez.py (the
reference clones+builds GEOS, swaps rc/nml configs per resolution, sruns
across nodes, then archives+mines logs; held_suarez.py:272-434).  Here the
model is in-repo and jitted, so the task reduces to: build -> init ->
warm-up (the reference's separate "cache build" run, held_suarez.py:297-308)
-> timed steps -> structured benchmark record + validation gates.
"""
from __future__ import annotations

import os
import time

import numpy as np

from ...benchmark.timing import BenchmarkRecord, StepTimer, report
from ...core.config import DycoreConfig, ExperimentConfig
from ..environment import Environment
from ..exceptions import CICheckException
from ..progress import Progress
from ..registry import Registry
from ..task import PipelineAction, TaskBase


@Registry.register
class HeldSuarez(TaskBase):
    def _build(self, env: Environment):
        import jax

        from ...models.held_suarez import build_model

        cfg: ExperimentConfig = env.config
        assert cfg is not None, "held_suarez experiment needs a config tree"
        return build_model(cfg.dycore), cfg

    def run_action(self, config, env: Environment) -> None:
        import jax

        model, cfg = self._build(env)
        backend = jax.default_backend()
        ws = env.CI_WORKSPACE
        os.makedirs(ws, exist_ok=True)

        # bracket the run with the hardware sampler when enabled, like the
        # reference's GPU wrapper (HARDWARE_SAMPLING=1,
        # gpu-wrapper-slurm-mps.sh.tpl:8-19,60-68)
        sampler = None
        if env.get("HARDWARE_SAMPLING") in ("1", "true", "True"):
            from ...hws.server import Sampler

            sampler = Sampler(rate_s=0.1)

        rec = BenchmarkRecord(
            experiment=env.experiment_name,
            backend=backend,
            grid={"npx": cfg.dycore.npx, "npz": cfg.dycore.npz},
        )

        t0 = time.perf_counter()
        state = model.init(perturb=1e-3)
        state.u.block_until_ready()
        rec.setup_time_s = time.perf_counter() - t0

        # warm-up = the reference's cache-build run (JIT compile here)
        t0 = time.perf_counter()
        for _ in range(max(1, cfg.run.warmup_steps)):
            state = model.step_fn(state)
        state.u.block_until_ready()
        rec.compile_time_s = time.perf_counter() - t0

        timer = StepTimer()
        for _ in range(cfg.run.steps):
            timer.start()
            state = model.step_fn(state)
            state.u.block_until_ready()
            timer.stop()
            if sampler is not None:
                sampler.sample_once()
        rec.step_time_s = timer.times
        if sampler is not None:
            rec.extra["hws_dump"] = sampler.dump(ws)

        rec.save(os.path.join(ws, f"benchmark_{env.experiment_name}.json"))
        np.savez_compressed(
            os.path.join(ws, f"state_{env.experiment_name}.npz"),
            u=np.asarray(state.u), v=np.asarray(state.v),
            delp=np.asarray(state.delp), pt=np.asarray(state.pt),
            ps=np.asarray(state.ps))
        env.set("hs.record", rec)
        env.set("hs.final_state", state)
        env.set("hs.model", model)

    def check(self, config, env: Environment) -> bool:
        state = env.get("hs.final_state")
        rec: BenchmarkRecord = env.get("hs.record")
        model = env.get("hs.model")
        if state is None or rec is None:
            return False

        # validation gates (analog of the reference's log-grep + tolerance
        # checks, physics_standalone.py:128-144 / held_suarez.py:379-434)
        u = np.asarray(state.u)
        pt = np.asarray(state.pt)
        ps = np.asarray(state.ps)
        if not (np.isfinite(u).all() and np.isfinite(pt).all()):
            raise CICheckException("non-finite fields after run")
        if not (ps.min() > 5.0e4 and ps.max() < 1.2e5):
            raise CICheckException(f"unphysical ps range: {ps.min()}..{ps.max()}")
        w = np.asarray(model.grid.area)[model.grid.interior][..., None]
        mass = float((w * np.asarray(state.delp)).sum())
        mass0 = float(w.sum() * (1.0e5 - model.config.ptop))
        if abs(mass - mass0) / mass0 > 1e-3:
            raise CICheckException(f"mass drift {abs(mass-mass0)/mass0:.2e}")

        # archive artifacts + report
        os.makedirs(env.artifact_directory, exist_ok=True)
        rep = report([rec])
        out = os.path.join(env.artifact_directory, "report_benchmark.out")
        with open(out, "w") as f:
            f.write(rep + "\n")
        Progress.log(rep)
        return True
