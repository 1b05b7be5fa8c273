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


# leaves whose time is already inside another leaf (the substep stage
# split, the NH solve inside the substep): reported, not accounted
_DETAIL_PREFIXES = ("substep: ", "nh vertical")


@dataclass
class PhaseTree:
    """Measured phase breakdown of one model step (seconds)."""

    full_step_s: float
    phases: Dict[str, float]  # leaf name -> s per STEP (already x n_split)

    @property
    def accounted_s(self) -> float:
        return sum(v for k, v in self.phases.items()
                   if not k.startswith(_DETAIL_PREFIXES))

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


def measure_phases(model, state, inner: int = 30,
                   forcing_fn: Optional[Callable] = None) -> PhaseTree:
    """Measure the phase tree of a dycore-driven model on the current
    backend.  Phases are timed as independent jitted functions with
    chained inputs; `substep` is scaled by n_split to per-step cost.

    The substep leaf is further split into its c_sw / transport / wind
    stages (jnp path; the fused Pallas path keeps one leaf - its stages
    are single kernels, mined per-HLO by scripts/xprof_kernels.py), and
    the tracer z_tracer pass and NH vertical solve get their own leaves -
    the reference's tree is multi-level
    (/root/reference/src/tcn/benchmark/geos_log_parser.py:79-269).

    forcing_fn(u, v, pt, delp) -> (u, v, pt): the model's column physics;
    defaults to Held-Suarez forcing."""
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
                   d2_bg=cfg.d2_bg, advect_tracers=False,
                   hord_mt=cfg.hord_mt, hord_tm=cfg.hord_tm, **kw)
        return o.u, o.v, o.delp, o.pt

    sub_t = _chain_time(one_substep,
                        (state.u, state.v, state.delp, state.pt),
                        inner=inner)

    # ---- substep stage split (jnp path) ---------------------------------
    stage_phases: Dict[str, float] = {}
    n_sub = cfg.k_split * cfg.n_split
    if not cfg.pallas_dycore:
        from ..dycore.sw import (_hydrostatic_fields, c_sw, transport_part,
                                 wind_part)

        st0 = fill_substep(ops, state.u, state.v, state.delp, state.pt,
                           None)

        @jax.jit
        def stage_csw_pair(pu, pv):
            st = st0._replace(pu=pu, pv=pv)
            return c_sw(st, m, 0.5 * dt_ac, cfg.ptop)

        @jax.jit
        def stage_csw(pu, pv):
            # single-output variant: (uct, vct) shapes are transposed
            # relative to (pu, pv), so the chained-input trick would feed
            # mismatched shapes - time with fixed args instead
            return stage_csw_pair(pu, pv)[0]  # uct

        csw_t = _chain_time(stage_csw, (st0.pu, st0.pv), inner=inner)
        uct, vct = stage_csw_pair(st0.pu, st0.pv)[:2]
        crx = uct * dt_ac * m.rdxc
        cry = vct * dt_ac * m.rdyc
        xfx = uct * dt_ac * m.dy
        yfx = vct * dt_ac * m.dx

        @jax.jit
        def stage_transport(pdx, pdy):
            st = st0._replace(pd_x=pdx, pd_y=pdy)
            dn, ptn, *_ = transport_part(st, m, crx, cry, xfx, yfx,
                                         cfg.hord, False,
                                         hord_tm=cfg.hord_tm)
            return dn, ptn

        tr_t = _chain_time(stage_transport, (st0.pd_x, st0.pd_y),
                           inner=inner)
        delp_n, pt_n = stage_transport(st0.pd_x, st0.pd_y)
        h_ = ops.h
        isl = (slice(None), slice(h_, h_ + ops.ny), slice(h_, h_ + ops.nx))

        @jax.jit
        def stage_wind(pu, pv):
            st = st0._replace(pu=pu, pv=pv)
            # post-transport re-fill + hydrostatic fields belong to the
            # wind stage of the production substep (sw.d_sw_substep)
            dfp = ops.fill(delp_n[isl], "x")
            ptf = ops.fill(pt_n[isl], "x")
            pkz_n, phi_n = _hydrostatic_fields(dfp, ptf, cfg.ptop)
            return wind_part(st, m, uct, vct, crx, cry, ptf, pkz_n,
                             phi_n, None, dt_ac, cfg.hord, cfg.d2_bg,
                             hord_mt=cfg.hord_mt)

        wind_t = _chain_time(stage_wind, (st0.pu, st0.pv), inner=inner)
        stage_phases = {
            "substep: c_sw (xN)": csw_t * n_sub,
            "substep: transport (xN)": tr_t * n_sub,
            "substep: wind_part (xN)": wind_t * n_sub,
        }

    # ---- tracer z_tracer pass + NH vertical solve -----------------------
    if cfg.z_tracer and cfg.ntracers and state.q is not None:
        from ..dycore.fv_dynamics import _advect_tracers_accumulated

        Ny = ops.ny + 2 * ops.h
        Nx = ops.nx + 2 * ops.h
        F, K = state.delp.shape[0], state.delp.shape[-1]
        tacc = (jnp.zeros((F, Ny, Nx + 1, K)), jnp.zeros((F, Ny + 1, Nx, K)),
                jnp.zeros((F, Ny, Nx + 1, K)), jnp.zeros((F, Ny + 1, Nx, K)))
        dt_ac = cfg.dt / (cfg.k_split * cfg.n_split)

        @jax.jit
        def stage_tracer(q):
            return _advect_tracers_accumulated(q, state.delp, tacc, ops, m,
                                               cfg.hord, cfg.q_split, dt_ac,
                                               pallas=cfg.pallas_dycore)

        stage_phases["tracer transport"] = _chain_time(
            stage_tracer, (state.q,), inner=inner) * cfg.k_split

    if not cfg.hydrostatic:
        from ..dycore.nh_solver import vertical_acoustic_solve

        delz0 = jnp.maximum(jnp.abs(state.delz) + 1.0, 1.0)
        w_if0 = jnp.zeros(state.delp.shape[:-1]
                          + (state.delp.shape[-1] + 1,))

        @jax.jit
        def stage_nh(w_if, delz):
            return vertical_acoustic_solve(w_if, delz, state.pt,
                                           state.delp, dt_ac, cfg.ptop)

        stage_phases["nh vertical solve (xN)"] = _chain_time(
            stage_nh, (w_if0, delz0), inner=inner) * n_sub

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

    if forcing_fn is None:
        def forcing_fn(u, v, pt, delp):
            return held_suarez_forcing(u, v, pt, delp, model.lats,
                                       cfg.ptop, cfg.dt)

    @jax.jit
    def forcing(u, v, pt):
        return forcing_fn(u, v, pt, state.delp)

    forcing_t = _chain_time(forcing, (state.u, state.v, state.pt),
                            inner=inner)

    phases = {
        "halo_fill (xN)": fill_t * n_sub,
        "substep-minus-fill (xN)": max(sub_t - fill_t, 0.0) * n_sub,
        "vertical remap": remap_t * n_remaps * cfg.k_split,
        "forcing/physics": forcing_t,
    }
    phases.update(stage_phases)
    return PhaseTree(full_step_s=full, phases=phases)
