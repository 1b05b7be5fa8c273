"""Profiler hooks + roofline accounting.

Parity with the reference's three tracing mechanisms (SURVEY.md SS5):
NVTX/cudaProfiler instrumentation (templates/cuda_profiler.py:28-74) maps
to `jax.profiler` traces/annotations; the log-mined hierarchical timers
map to the structured records in benchmark/timing.py; and on top we add
the roofline position BASELINE.md asks for (achieved HBM bytes/s vs peak).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional

# Peak HBM bandwidth per chip [bytes/s] (public nameplate numbers)
HBM_PEAK = {
    "tpu_v5e": 819e9,
    "tpu_v5p": 2765e9,
    "tpu_v4": 1228e9,
    "cpu": 50e9,
}


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an xprof trace (NVTX/cudaProfiler start/stop analog)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotation(name: str):
    """Named region visible in the trace viewer (NVTX range analog)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class TimedRegion:
    """Accumulating wall-clock timer per label with device sync - the
    TimedCUDAProfiler analog (templates/cuda_profiler.py:59-74)."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def __call__(self, label: str, sync_arrays=None):
        import jax

        t0 = time.perf_counter()
        yield
        if sync_arrays is not None:
            jax.tree.map(lambda x: x.block_until_ready()
                         if hasattr(x, "block_until_ready") else x,
                         sync_arrays)
        self.times.setdefault(label, []).append(time.perf_counter() - t0)

    def report(self) -> str:
        lines = []
        for k, v in sorted(self.times.items()):
            lines.append(f"{k}: n={len(v)} total={sum(v)*1e3:.2f} ms "
                         f"mean={sum(v)/len(v)*1e3:.3f} ms")
        return "\n".join(lines)


@dataclass
class Roofline:
    label: str
    bytes_accessed: float
    seconds: float
    chip: str = "tpu_v5e"

    @property
    def achieved_bw(self) -> float:
        return self.bytes_accessed / self.seconds

    @property
    def fraction_of_peak(self) -> float:
        return self.achieved_bw / HBM_PEAK.get(self.chip, 819e9)

    def __str__(self) -> str:
        return (f"{self.label}: {self.achieved_bw/1e9:.1f} GB/s = "
                f"{self.fraction_of_peak*100:.1f}% of {self.chip} HBM peak")


def dycore_step_bytes(npx: int, npz: int, ntracers: int = 1,
                      n_split: int = 6) -> float:
    """Byte-traffic model of one model step: per substep the working set
    (~25 padded fields) is read/written ~3x by the fused stencil passes,
    plus the remap.  This is the denominator for the roofline position the
    BASELINE targets ask for (advection >= 70% of HBM roofline)."""
    cells = 6 * npx * npx * npz
    fields = 20 + 4 * ntracers
    per_substep = fields * 4 * 3 * cells  # f32, ~3 passes
    remap = (8 + ntracers) * 4 * 4 * cells
    return n_split * per_substep + remap


def step_roofline(npx: int, npz: int, seconds: float, ntracers: int = 1,
                  n_split: int = 6, chip: str = "tpu_v5e") -> Roofline:
    return Roofline(
        label=f"c{npx}-L{npz} step",
        bytes_accessed=dycore_step_bytes(npx, npz, ntracers, n_split),
        seconds=seconds,
        chip=chip,
    )
