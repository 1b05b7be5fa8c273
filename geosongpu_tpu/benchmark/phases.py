"""Hierarchical per-phase timing of the dycore step.

The reference mines a full component tree (DYN/MOIST/RADIATION/...) out of
GEOS logs and renders it as sunburst/Sankey plots
(/root/reference/src/tcn/benchmark/geos_log_parser.py:79-269,
benchmark/report.py:38-72).  The TPU framework owns the model, so the tree
is MEASURED, not scraped: each phase runs as its own jitted function in a
chained loop (output feeds input, one device sync per repetition block) so
a phase's number is its real pipelined device time, not a host-sync
artifact - measured host<->device sync on the tunnel costs ~ms and
corrupts per-call timing, so never time with per-call blocking.

Produces a PhaseTree: step -> {halo_fill, substep x n_split, remap, hs
forcing} with derived percentages, serialized into BenchmarkRecord.extra
and rendered by benchmark/plots.py as the sunburst analog.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp


def _chain_time(fn: Callable, args, inner: int = 30, reps: int = 5) -> float:
    """Median seconds per call; calls chained (out -> in), one sync per
    block of `inner` calls."""
    out = fn(*args)
    jax.block_until_ready(out)
    n_args = len(args)
    ts = []
    for _ in range(reps):
        cur = args
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*cur)
            cur = out if isinstance(out, tuple) and len(out) == n_args else args
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / inner)
    ts.sort()
    return ts[len(ts) // 2]


@dataclass
class PhaseTree:
    """Measured phase breakdown of one model step (seconds)."""

    full_step_s: float
    phases: Dict[str, float]  # leaf name -> s per STEP (already x n_split)

    @property
    def accounted_s(self) -> float:
        return sum(self.phases.values())

    def to_dict(self) -> dict:
        tot = self.full_step_s
        return {
            "full_step_ms": 1e3 * tot,
            "phases_ms": {k: 1e3 * v for k, v in self.phases.items()},
            "phases_pct": {k: (100.0 * v / tot if tot else 0.0)
                           for k, v in self.phases.items()},
            "unaccounted_ms": 1e3 * max(0.0, tot - self.accounted_s),
        }

    def render(self) -> str:
        d = self.to_dict()
        lines = [f"step {d['full_step_ms']:.2f} ms"]
        for k, v in sorted(d["phases_ms"].items(), key=lambda kv: -kv[1]):
            lines.append(f"  {k:<22s} {v:8.2f} ms  {d['phases_pct'][k]:5.1f}%")
        lines.append(f"  {'(unaccounted)':<22s} {d['unaccounted_ms']:8.2f} ms")
        return "\n".join(lines)


def measure_phases(model, state, inner: int = 30) -> PhaseTree:
    """Measure the phase tree of a HeldSuarez-style model on the current
    backend.  Phases are timed as independent jitted functions with
    chained inputs; `substep` is scaled by n_split to per-step cost."""
    from ..dycore.sw import d_sw_substep, fill_substep
    from ..dycore.sw_pallas import d_sw_substep_pallas
    from ..ops.remap import remap_field
    from ..physics.held_suarez import held_suarez_forcing

    cfg = model.config
    ops, m = model.ctx.ops, model.ctx.metrics
    dt_ac = cfg.dt / (cfg.k_split * cfg.n_split)

    full = _chain_time(lambda s: model.step_fn(s), (state,), inner=inner)

    @jax.jit
    def fill_then_slice(u, v, delp, pt):
        st = fill_substep(ops, u, v, delp, pt, None)
        h, n = ops.h, ops.n
        return (st.pu[:, h:h + n + 1, h:h + n],
                st.pv[:, h:h + n, h:h + n + 1],
                st.pd_x[:, h:h + n, h:h + n],
                st.pt_x[:, h:h + n, h:h + n])

    fill_t = _chain_time(fill_then_slice,
                         (state.u, state.v, state.delp, state.pt),
                         inner=inner)

    sub_fn = (d_sw_substep_pallas if cfg.pallas_dycore else d_sw_substep)

    @jax.jit
    def one_substep(u, v, delp, pt):
        st = fill_substep(ops, u, v, delp, pt, None)
        kw = dict(kt=cfg.pallas_kt or None) if cfg.pallas_dycore else {}
        o = sub_fn(st, m, ops, dt_ac, cfg.ptop, hord=cfg.hord,
                   d2_bg=cfg.d2_bg, advect_tracers=False, **kw)
        return o.u, o.v, o.delp, o.pt

    sub_t = _chain_time(one_substep,
                        (state.u, state.v, state.delp, state.pt),
                        inner=inner)

    pe1 = cfg.ptop + jnp.concatenate(
        [jnp.zeros_like(state.delp[..., :1]),
         jnp.cumsum(state.delp, axis=-1)], axis=-1)
    pe2 = model.ctx.ak + model.ctx.bk * pe1[..., -1:]

    @jax.jit
    def remap_one(pt):
        return remap_field(pt, pe1, pe2, cfg.kord)

    remap_t = _chain_time(remap_one, (state.pt,), inner=inner)
    # per step: pt + tracers + w/delz (NH) + u and v staggered columns
    n_remaps = 1 + cfg.ntracers + (2 if not cfg.hydrostatic else 0) + 2

    @jax.jit
    def forcing(u, v, pt):
        u2, v2, pt2 = held_suarez_forcing(u, v, pt, state.delp, model.lats,
                                          cfg.ptop, cfg.dt)
        return u2, v2, pt2

    forcing_t = _chain_time(forcing, (state.u, state.v, state.pt),
                            inner=inner)

    n_sub = cfg.k_split * cfg.n_split
    return PhaseTree(
        full_step_s=full,
        phases={
            "halo_fill (xN)": fill_t * n_sub,
            "substep-minus-fill (xN)": max(sub_t - fill_t, 0.0) * n_sub,
            "vertical remap": remap_t * n_remaps * cfg.k_split,
            "hs_forcing": forcing_t,
        },
    )
