#!/usr/bin/env python
"""Zone-decomposed balanced-flow imbalance: where does the error live?

Splits the t=0 |du/dt| of the analytically balanced zonal flow
(tests/test_balanced_flow.py) into three zones per face:
  interior  - further than `band` cells from every face edge
  edge      - within `band` cells of an edge but away from the 8 cube
              corner neighborhoods
  corner    - within the fixed-physical-size corner disks
and prints RMS per zone at several resolutions.  A clean 2nd-order
scheme decays every zone ~4x per doubling; an O(1) inconsistency on the
edge band shows up as flat edge RMS and sqrt(1/n) "far field" decay.
"""
import sys

import numpy as np

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

from test_balanced_flow import _balanced_state  # noqa: E402

from geosongpu_tpu.core.config import DycoreConfig  # noqa: E402
from geosongpu_tpu.dycore.fv_dynamics import fv_dynamics_step  # noqa: E402
from geosongpu_tpu.models.held_suarez import build_model  # noqa: E402


def zones(npx, rows, band=3, corner_cells_at_c12=3.0):
    iy, ix = np.meshgrid(np.arange(rows), np.arange(npx), indexing="ij")
    dc = np.minimum.reduce([
        np.hypot(iy, ix), np.hypot(iy, ix - npx),
        np.hypot(iy - npx, ix), np.hypot(iy - npx, ix - npx)])
    corner = dc < corner_cells_at_c12 * npx / 12.0
    de = np.minimum.reduce([iy, rows - 1 - iy, ix, npx - 1 - ix])
    edge = (de < band) & ~corner
    interior = ~corner & ~edge
    return interior, edge, corner


def tendency(npx, npz=8):
    cfg = DycoreConfig(npx=npx, npz=npz, dt=120.0, n_split=1, d2_bg=0.0,
                       ntracers=0)
    model = build_model(cfg)
    s0 = _balanced_state(model)
    s1 = jax.jit(lambda s: fv_dynamics_step(s, model.ctx))(s0)
    return np.asarray(s1.u - s0.u, np.float64) / cfg.dt


def main():
    res = [int(a) for a in sys.argv[1:]] or [12, 24, 48]
    print(f"{'npx':>4} {'interior':>12} {'edge':>12} {'corner':>12} "
          f"{'max':>12}")
    prev = None
    for npx in res:
        dudt = tendency(npx)
        zi, ze, zc = zones(npx, npx + 1)
        r = [float(np.sqrt((dudt[:, z] ** 2).mean())) for z in (zi, ze, zc)]
        mx = float(np.abs(dudt).max())
        ratio = ""
        if prev is not None:
            ratio = "  x " + "/".join(f"{a / b:.2f}" for a, b in zip(r, prev))
        print(f"{npx:>4} {r[0]:>12.3e} {r[1]:>12.3e} {r[2]:>12.3e} "
              f"{mx:>12.3e}{ratio}")
        prev = r


if __name__ == "__main__":
    main()
