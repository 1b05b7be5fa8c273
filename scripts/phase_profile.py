#!/usr/bin/env python
"""Per-phase wall timing of the Held-Suarez step on the current backend.

Times each dycore phase as its OWN jitted function (halo fill, c_sw+d_sw
substep, NH solve, vertical remap, tracer transport, HS forcing) plus the
full fused step, so the phase breakdown the reference mines from GEOS logs
(/root/reference/src/tcn/benchmark/geos_log_parser.py:79-269) exists here
as structured measurement, not log scraping.

Usage:  python scripts/phase_profile.py [--cpu] [--npx 48] [--npz 72]
Prints one JSON dict of phase -> ms (median of reps, pipelined dispatch).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, reps=10, inner=5):
    """Median wall time of `fn(*args)` with pipelined dispatch."""
    out = fn(*args)  # compile
    jax_block(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        jax_block(out)
        ts.append((time.perf_counter() - t0) / inner)
    ts.sort()
    return 1e3 * ts[len(ts) // 2]


def jax_block(tree):
    import jax

    jax.tree.map(lambda x: x.block_until_ready()
                 if hasattr(x, "block_until_ready") else x, tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--npx", type=int, default=48)
    ap.add_argument("--npz", type=int, default=72)
    ap.add_argument("--nsplit", type=int, default=6)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from geosongpu_tpu.core.config import DycoreConfig
    from geosongpu_tpu.dycore.fv_dynamics import fv_dynamics_step
    from geosongpu_tpu.dycore.sw import d_sw_substep, fill_substep
    from geosongpu_tpu.harness.checkpoint import enable_compilation_cache
    from geosongpu_tpu.models.held_suarez import build_model
    from geosongpu_tpu.ops.remap import remap_field
    from geosongpu_tpu.physics.held_suarez import held_suarez_forcing

    try:
        enable_compilation_cache()
    except Exception:
        pass

    cfg = DycoreConfig(npx=args.npx, npz=args.npz, dt=600.0,
                       n_split=args.nsplit)
    model = build_model(cfg)
    state = model.init(perturb=1e-3)
    ctx = model.ctx
    ops, m = ctx.ops, ctx.metrics
    dt_ac = cfg.dt / (cfg.k_split * cfg.n_split)

    results = {}

    # -- full step ---------------------------------------------------------
    results["full_step"] = timeit(model.step_fn, (state,))

    # -- halo fill only ----------------------------------------------------
    @jax.jit
    def fill_only(u, v, delp, pt):
        s = fill_substep(ops, u, v, delp, pt, None)
        return s.pu, s.pv, s.pd_x, s.pd_y, s.pt_x, s.pt_y

    results["halo_fill"] = timeit(
        fill_only, (state.u, state.v, state.delp, state.pt))

    # -- one acoustic substep (fill + c_sw + d_sw) --------------------------
    @jax.jit
    def one_substep(u, v, delp, pt):
        s = fill_substep(ops, u, v, delp, pt, None)
        out = d_sw_substep(s, m, ops, dt_ac, cfg.ptop, hord=cfg.hord,
                           d2_bg=cfg.d2_bg, advect_tracers=False)
        return out.u, out.v, out.delp, out.pt

    results["substep"] = timeit(
        one_substep, (state.u, state.v, state.delp, state.pt))

    # -- vertical remap of one field ----------------------------------------
    pe1 = cfg.ptop + jnp.concatenate(
        [jnp.zeros_like(state.delp[..., :1]),
         jnp.cumsum(state.delp, axis=-1)], axis=-1)
    pe2 = ctx.ak + ctx.bk * pe1[..., -1:]

    @jax.jit
    def remap_one(pt, pe1, pe2):
        return remap_field(pt, pe1, pe2, cfg.kord)

    results["remap_one_field"] = timeit(remap_one, (state.pt, pe1, pe2))

    # -- HS forcing ----------------------------------------------------------
    @jax.jit
    def forcing(u, v, pt, delp):
        return held_suarez_forcing(u, v, pt, delp, model.lats, cfg.ptop,
                                   cfg.dt)

    results["hs_forcing"] = timeit(
        forcing, (state.u, state.v, state.pt, state.delp))

    # derived view
    results["substeps_total(est)"] = results["substep"] * cfg.n_split
    results["_config"] = f"c{args.npx}-L{args.npz} n_split={cfg.n_split}"
    results["_backend"] = str(jax.devices()[0])
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
