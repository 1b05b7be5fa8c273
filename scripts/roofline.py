#!/usr/bin/env python
"""Measured per-kernel roofline artifact (BASELINE.md: "advection kernels
>= 70% of HBM roofline; halo-exchange overlap % reported per run").

Joins three measured/derived quantities per named dycore kernel:

  * device time: mined from a real jax.profiler trace of N steps (the
    pallas kernels are named - dsw_csw1/csw2/transport/wind, remap_banded
    - so their closed_calls are attributable);
  * flops: XLA HLO cost analysis of the SAME stage function jitted on the
    CPU backend (exact op counts of the computation, not a hand model);
  * bytes: the kernel's in+out window volumes (what a perfectly fused
    kernel must move through HBM), incl. the J-tile overlap re-reads.

and reports achieved GB/s vs HBM peak and GFLOP/s vs VPU peak.  Writes
results/roofline_r{N}.json.  Role parity: the reference archives OSU
transport measurements (results/mpi_gpu_rdma/24W7.json) - this is the
compute-side analog.

Usage: python scripts/roofline.py [--npx 48] [--npz 72] [--steps 5]
                                  [--out results/roofline_r3.json]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xprof_kernels import device_op_times  # noqa: E402

# public nameplate peaks (v5e); VPU f32 derived as 8x128 lanes x 4 ALUs
# x 2 flops (FMA) x ~0.94 GHz - treated as the nominal ceiling
HBM_PEAK = 819e9
VPU_PEAK = 7.7e12

# big (K-field) in/out window counts per kernel, hydrostatic HS config
KERNEL_IO = {
    "dsw_csw1": (6, 6),
    "dsw_csw2": (7, 6),
    "dsw_transport": (8, 4),
    "dsw_wind": (9, 2),
    "remap_banded": (3, 1),
}
N_METRICS = 16


def stage_flops(cfg, model):
    """Exact flop counts of each kernel's computation via XLA cost
    analysis of the same stage functions, lowered on CPU."""
    import jax

    from geosongpu_tpu.dycore.sw import (_hydrostatic_fields, a_grid_winds,
                                         c_sw_part1, c_sw_part2,
                                         fill_substep, transport_part,
                                         wind_part)
    from geosongpu_tpu.dycore.sw_pallas import _metrics_args, _metrics_from
    from geosongpu_tpu.ops.remap import remap_field_banded
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    state = model.init(perturb=1e-3)
    ops, m = model.ctx.ops, model.ctx.metrics
    with jax.default_device(cpu):
        st = fill_substep(ops, state.u, state.v, state.delp, state.pt, None)
        dt_ac = cfg.dt / (cfg.k_split * cfg.n_split)
        mets = _metrics_args(m)

        def fl(fn, *args):
            c = jax.jit(fn).lower(*args).compile()
            ca = c.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return float(ca.get("flops", 0.0))

        out = {}
        ua, va = a_grid_winds(st.pu, st.pv, m)
        out["dsw_csw1"] = fl(
            lambda s_: c_sw_part1(s_, m, 0.5 * dt_ac, ua, va), st)
        uc, vc, delp_h, pt_h, ke, vort = c_sw_part1(st, m, 0.5 * dt_ac,
                                                    ua, va)
        pkz_h, phi_h = _hydrostatic_fields(delp_h, pt_h, cfg.ptop)

        def k2(uc_, vc_):
            uct, vct = c_sw_part2(uc_, vc_, pt_h, pkz_h, phi_h, ke, vort,
                                  m, 0.5 * dt_ac)
            return (uct, vct, uct * dt_ac * m.rdxc, vct * dt_ac * m.rdyc,
                    uct * dt_ac * m.dy, vct * dt_ac * m.dx)

        out["dsw_csw2"] = fl(k2, uc, vc)
        uct, vct, crx, cry, xfx, yfx = k2(uc, vc)
        out["dsw_transport"] = fl(
            lambda s_: transport_part(s_, m, crx, cry, xfx, yfx, cfg.hord,
                                      False)[:2], st)
        delp_n, pt_n, *_ = transport_part(st, m, crx, cry, xfx, yfx,
                                          cfg.hord, False)
        pkz_n, phi_n = _hydrostatic_fields(delp_n, pt_n, cfg.ptop)
        out["dsw_wind"] = fl(
            lambda s_: wind_part(s_, m, uct, vct, crx, cry, pt_n, pkz_n,
                                 phi_n, None, dt_ac, cfg.hord, cfg.d2_bg),
            st)
        pe1 = cfg.ptop + jnp.concatenate(
            [jnp.zeros_like(state.delp[..., :1]),
             jnp.cumsum(state.delp, axis=-1)], axis=-1)
        pe2 = model.ctx.ak + model.ctx.bk * pe1[..., -1:]
        out["remap_banded"] = fl(
            lambda q: remap_field_banded(q, pe1, pe2, cfg.kord,
                                         band=cfg.remap_band), state.pt)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npx", type=int, default=48)
    ap.add_argument("--npz", type=int, default=72)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--nsplit", type=int, default=6)
    ap.add_argument("--out", default="results/roofline_r5.json")
    args = ap.parse_args()

    import jax

    from geosongpu_tpu.core.config import DycoreConfig
    from geosongpu_tpu.dycore.sw_pallas import _JTILE_OVERLAP
    from geosongpu_tpu.harness.checkpoint import enable_compilation_cache
    from geosongpu_tpu.models.held_suarez import build_model

    try:
        enable_compilation_cache()
    except Exception:
        pass

    cfg = DycoreConfig(npx=args.npx, npz=args.npz, dt=600.0,
                       n_split=args.nsplit, pallas_dycore=True)
    model = build_model(cfg)
    state = model.init(perturb=1e-3)
    state = model.step_fn(state)
    jax.block_until_ready(state)

    outdir = tempfile.mkdtemp(prefix="roofline_")
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        x = state
        for _ in range(args.steps):
            x = model.step_fn(x)
        jax.block_until_ready(x)
    wall_step = (time.perf_counter() - t0) / args.steps

    times = device_op_times(outdir)  # us totals over args.steps
    flops = stage_flops(cfg, model)

    n, h, K = cfg.npx, cfg.halo, cfg.npz
    N = n + 2 * h
    cells_pad = 6 * N * (N + 1) * K

    # J-tile input re-read factor (auto rule mirrored from sw_pallas)
    lanes = (K + 127) // 128 * 128
    rows = (96 * 1024 * 1024) // (26 * (N + 2) * lanes * 4)
    jt = 0 if rows >= N else max(12, int(rows) - 2 * _JTILE_OVERLAP)
    reread = 1.0 if not jt else (jt + 2 * _JTILE_OVERLAP) / jt

    calls = {
        "dsw_csw1": cfg.k_split * cfg.n_split,
        "dsw_csw2": cfg.k_split * cfg.n_split,
        "dsw_transport": cfg.k_split * cfg.n_split,
        "dsw_wind": cfg.k_split * cfg.n_split,
        # pt + tracers + u + v staggered-column remaps per k_split
        "remap_banded": cfg.k_split * (1 + cfg.ntracers + 2),
    }

    entries = {}
    for kname, (n_in, n_out) in KERNEL_IO.items():
        t_us = sum(v for op, v in times.items() if kname in op)
        if t_us <= 0.0:
            continue
        secs = t_us / 1e6 / args.steps          # per step
        per_call = ((n_in * reread + n_out) * cells_pad * 4
                    + N_METRICS * 6 * N * N * 4 * reread)
        gbytes = per_call * calls[kname] / 1e9
        gflops = flops.get(kname, 0.0) * calls[kname] / 1e9
        entries[kname] = {
            "device_ms_per_step": 1e3 * secs,
            "calls_per_step": calls[kname],
            "modeled_gbytes_per_step": round(gbytes, 4),
            "flops_per_call_xla": flops.get(kname, 0.0),
            "achieved_gb_s": round(gbytes / secs, 1),
            "pct_hbm_roofline": round(100 * gbytes / secs / (HBM_PEAK / 1e9), 1),
            "achieved_gflop_s": round(gflops / secs, 1),
            "pct_vpu_roofline": round(100 * gflops / secs / (VPU_PEAK / 1e9), 1),
        }

    total_us = sum(times.values())
    artifact = {
        "config": {"npx": args.npx, "npz": args.npz,
                   "n_split": args.nsplit, "steps": args.steps,
                   "jtile": jt, "reread_factor": round(reread, 3)},
        "peaks": {"hbm_bytes_s": HBM_PEAK, "vpu_f32_flop_s": VPU_PEAK,
                  "note": "v5e nameplate HBM; VPU = 8x128 lanes x 4 ALUs "
                          "x 2 (FMA) x 0.94 GHz nominal"},
        "wall_ms_per_step": round(1e3 * wall_step, 3),
        "device_ms_per_step_total": round(total_us / 1e3 / args.steps, 3),
        "kernels": entries,
        "method": "device time from named pallas closed_calls in a real "
                  "xprof trace; flops from XLA cost_analysis of the same "
                  "stage functions; bytes = in/out window volumes x call "
                  "counts (incl. J-tile re-reads)",
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
