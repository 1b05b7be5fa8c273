#!/usr/bin/env python
"""Term-wise edge-error probe for the balanced zonal flow.

For the analytically balanced state, each ingredient of the D-grid wind
update has a known analytic value.  This script evaluates the discrete
fields through the actual sw.py call chain and prints RMS error per zone
(interior / edge band / corner disks), per term - pinpointing which
discretization carries the O(1) face-edge inconsistency seen in
scripts/corner_experiment.py.
"""
import sys

import numpy as np

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from test_balanced_flow import _balanced_state, _zonal_cov, U0  # noqa: E402

from geosongpu_tpu.core.config import DycoreConfig  # noqa: E402
from geosongpu_tpu.core.grid import OMEGA, RADIUS  # noqa: E402
from geosongpu_tpu.core.topology import NFACES, face_point  # noqa: E402
from geosongpu_tpu.dycore import sw  # noqa: E402
from geosongpu_tpu.dycore.fv_dynamics import build_context  # noqa: E402
from geosongpu_tpu.models.held_suarez import build_model  # noqa: E402
from scripts.corner_experiment import zones  # noqa: E402


def report(name, err, npx, h, stag=""):
    """err: unpadded interior [6, rows, cols]; zone RMS."""
    rows = err.shape[1]
    zi, ze, zc = zones(npx, rows)
    if err.shape[2] != npx:  # x-staggered: clip last col for the mask
        err = err[:, :, :npx]
    vals = [float(np.sqrt((err[:, z[:rows, :err.shape[2]]] ** 2).mean()))
            for z in (zi, ze, zc)]
    print(f"  {name:<26} int {vals[0]:>10.3e}  edge {vals[1]:>10.3e} "
          f" corner {vals[2]:>10.3e}")


def main():
    npx = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    npz = 4
    cfg = DycoreConfig(npx=npx, npz=npz, dt=120.0, n_split=1, d2_bg=0.0,
                       ntracers=0)
    model = build_model(cfg)
    st = _balanced_state(model)
    ctx = model.ctx
    m = ctx.metrics
    ops = ctx.ops
    h, n = ops.h, ops.n

    s = sw.fill_substep(ops, st.u, st.v, st.delp, st.pt, None)

    # ---- c_sw: advective winds ----------------------------------------
    ua, va = sw.a_grid_winds(s.pu, s.pv, m)
    if ctx.chart is not None:
        ua, va = ctx.chart.apply_agrid(ua, va, s.pu, s.pv)
    uc, vc, delp_h, pt_h, ke, vort = sw.c_sw_part1(s, m, 0.5 * cfg.dt,
                                                   ua, va)

    # analytic normal winds at interfaces: covariant zonal comps projected
    dxi = (np.pi / 2) / n
    cen = (np.arange(-h, n + h) + 0.5) * dxi - np.pi / 4
    ifc = np.arange(-h, n + h + 1) * dxi - np.pi / 4

    # uc lives at x-interfaces [6, N, N+1]; its analytic value is the
    # NORMAL component = (cov_x - cosa cov_y) rsina at (ifc_i, cen_j)
    uc_true = np.zeros((NFACES, n + 2 * h, n + 2 * h + 1))
    vc_true = np.zeros((NFACES, n + 2 * h + 1, n + 2 * h))
    for f in range(NFACES):
        X1 = np.broadcast_to(ifc[None, :], uc_true.shape[1:])
        Y1 = np.broadcast_to(cen[:, None], uc_true.shape[1:])
        cx = _zonal_cov(f, X1, Y1, "x")
        cy = _zonal_cov(f, X1, Y1, "y")
        uc_true[f] = ((cx - np.asarray(m.cosa_i)[f, :, :, 0] * cy)
                      * np.asarray(m.rsina_i)[f, :, :, 0])
        X2 = np.broadcast_to(cen[None, :], vc_true.shape[1:])
        Y2 = np.broadcast_to(ifc[:, None], vc_true.shape[1:])
        cx2 = _zonal_cov(f, X2, Y2, "x")
        cy2 = _zonal_cov(f, X2, Y2, "y")
        vc_true[f] = ((cy2 - np.asarray(m.cosa_j)[f, :, :, 0] * cx2)
                      * np.asarray(m.rsina_j)[f, :, :, 0])

    print(f"npx={npx} - RMS error vs analytic, by zone")
    iu = (slice(None), slice(h, h + n), slice(h, h + n + 1))
    iv = (slice(None), slice(h, h + n + 1), slice(h, h + n))
    report("uc (C-wind interp)",
           np.asarray(uc)[..., 0][iu] - uc_true[iu], npx, h)
    report("vc (C-wind interp)",
           np.asarray(vc)[..., 0][iv] - vc_true[iv], npx, h)

    # ---- center KE and vorticity --------------------------------------
    pc = np.zeros((NFACES, n, n, 3))
    for f in range(NFACES):
        CJ, CI = np.meshgrid(cen[h:h + n], cen[h:h + n], indexing="ij")
        pc[f] = face_point(f, CI, CJ)
    sinlat = pc[..., 2]
    coslat2 = 1.0 - sinlat ** 2
    ke_true = 0.5 * U0 ** 2 * coslat2
    vort_true = (2 * OMEGA + 2 * U0 / RADIUS) * sinlat
    ic = (slice(None), slice(h, h + n), slice(h, h + n))
    report("ke (centers)", np.asarray(ke)[..., 0][ic] - ke_true, npx, h)
    report("vort_abs (centers)",
           np.asarray(vort)[..., 0][ic] - vort_true, npx, h)

    # ---- full advective winds (after c_sw_part2 PGF/KE update): for the
    # balanced state they should still equal the analytic normal winds ---
    uct, vct, _, _, _ = sw.c_sw(s, m, 0.5 * cfg.dt, cfg.ptop, chart=ctx.chart)
    report("uc* (time-centered)",
           np.asarray(uct)[..., 0][iu] - uc_true[iu], npx, h)
    report("vc* (time-centered)",
           np.asarray(vct)[..., 0][iv] - vc_true[iv], npx, h)

    # ---- corner KE from ub/vb ------------------------------------------
    ub = 0.5 * (uct[:, :-1, :] + uct[:, 1:, :])
    ub = sw._pad_edge(ub, 1)
    vb = 0.5 * (vct[:, :, :-1] + vct[:, :, 1:])
    vb = sw._pad_edge(vb, 2)
    ke_c = 0.5 * m.rsin2_cn * (ub * ub + vb * vb
                               + 2.0 * m.cosa_cn * ub * vb)
    # analytic KE at corner points
    corn = np.zeros((NFACES, n + 1, n + 1, 3))
    for f in range(NFACES):
        SJ, SI = np.meshgrid(ifc[h:h + n + 1], ifc[h:h + n + 1],
                             indexing="ij")
        corn[f] = face_point(f, SI, SJ)
    kec_true = 0.5 * U0 ** 2 * (1.0 - corn[..., 2] ** 2)
    icn = (slice(None), slice(h, h + n + 1), slice(h, h + n + 1))
    report("ke_c (corners)",
           np.asarray(ke_c)[..., 0][icn] - kec_true, npx, h)

    # ---- PPM vorticity interface values ---------------------------------
    crx = uct * cfg.dt * m.rdxc
    cry = vct * cfg.dt * m.rdyc
    from geosongpu_tpu.ops.ppm import ppm_flux
    vort_u = ppm_flux(vort, cry, axis=1, hord=cfg.hord)
    # analytic at u-points (y-interfaces)
    vu_true = np.zeros((NFACES, n + 1, n))
    for f in range(NFACES):
        YJ, XI = np.meshgrid(ifc[h:h + n + 1], cen[h:h + n], indexing="ij")
        pz = face_point(f, XI, YJ)[..., 2]
        vu_true[f] = (2 * OMEGA + 2 * U0 / RADIUS) * pz
    report("vort_u (PPM y-iface)",
           np.asarray(vort_u)[..., 0][iv] - vu_true, npx, h)


if __name__ == "__main__":
    main()
