"""Aquaplanet pipeline task.

Parity with /root/reference/src/tcn/ci/pipeline/aquaplanet.py:31-235 (the
reference rewrites GEOS's gcm_run.j in place, submits via sbatch and polls;
validation = 1 ts cache + 12 h run, benchmark = 1-day runs).  Here: build
-> init -> warm-up -> timed steps -> moist validation gates + benchmark
record.
"""
from __future__ import annotations

import os
import time

import numpy as np

from ...benchmark.timing import BenchmarkRecord, StepTimer, report
from ...core.config import ExperimentConfig
from ..environment import Environment
from ..exceptions import CICheckException
from ..progress import Progress
from ..registry import Registry
from ..task import TaskBase


@Registry.register
class Aquaplanet(TaskBase):
    def run_action(self, config, env: Environment) -> None:
        import jax

        from ...models.aquaplanet import build_model

        cfg: ExperimentConfig = env.config
        model = build_model(cfg.dycore)
        ws = env.CI_WORKSPACE
        os.makedirs(ws, exist_ok=True)

        rec = BenchmarkRecord(
            experiment=env.experiment_name,
            backend=jax.default_backend(),
            grid={"npx": cfg.dycore.npx, "npz": cfg.dycore.npz},
        )
        t0 = time.perf_counter()
        state = model.init(perturb=1e-3)
        state.u.block_until_ready()
        rec.setup_time_s = time.perf_counter() - t0

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
        rec.step_time_s = timer.times

        rec.save(os.path.join(ws, f"benchmark_{env.experiment_name}.json"))
        np.savez_compressed(
            os.path.join(ws, f"state_{env.experiment_name}.npz"),
            u=np.asarray(state.u), v=np.asarray(state.v),
            delp=np.asarray(state.delp), pt=np.asarray(state.pt),
            q=np.asarray(state.q), ps=np.asarray(state.ps))
        env.set("aq.record", rec)
        env.set("aq.final_state", state)
        env.set("aq.model", model)

    def check(self, config, env: Environment) -> bool:
        state = env.get("aq.final_state")
        rec: BenchmarkRecord = env.get("aq.record")
        if state is None or rec is None:
            return False
        q = np.asarray(state.q)
        pt = np.asarray(state.pt)
        ps = np.asarray(state.ps)
        if not (np.isfinite(q).all() and np.isfinite(pt).all()):
            raise CICheckException("non-finite moist fields")
        if q[..., 0].min() < -1e-6:
            raise CICheckException(f"negative vapor: {q[..., 0].min()}")
        if q[..., 0].max() > 0.06:
            raise CICheckException(f"unphysical vapor: {q[..., 0].max()}")
        if not (ps.min() > 5.0e4 and ps.max() < 1.2e5):
            raise CICheckException(f"unphysical ps: {ps.min()}..{ps.max()}")

        os.makedirs(env.artifact_directory, exist_ok=True)
        rep = report([rec])
        with open(os.path.join(env.artifact_directory,
                               "report_benchmark.out"), "w") as f:
            f.write(rep + "\n")
        Progress.log(rep)
        return True
