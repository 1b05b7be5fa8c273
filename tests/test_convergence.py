"""Grid-convergence evidence for the transport scheme: the cosine-bell
solid-body error must shrink close to 2nd order between c12 and c24."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosongpu_tpu.core.grid import RADIUS, build_grid
from geosongpu_tpu.core.topology import face_point
from geosongpu_tpu.ops.fvtp2d import ddx, ddy, fvtp2d
from geosongpu_tpu.parallel.halo import build_halo_ops

import sys
import os

sys.path.insert(0, os.path.dirname(__file__))
from test_advection import _solid_body_cgrid_winds  # noqa: E402


def _l2_error(n, steps_per_rev=None):
    h = 3
    g = build_grid(n, h)
    ops = build_halo_ops(n, h)
    period = 12 * 86400.0
    om = 2 * np.pi / period
    uc, vc = _solid_body_cgrid_winds(n, om * np.array([0.0, 0.0, 1.0]))
    puc, pvc = ops.fill_cgrid(jnp.asarray(uc), jnp.asarray(vc))
    nsteps = steps_per_rev or (6 * n)  # fixed Courant across resolutions
    dt = period / 4 / nsteps  # quarter revolution

    area = jnp.asarray(g.area)[..., None]
    crx = (puc * dt / jnp.asarray(g.dxc))[..., None]
    cry = (pvc * dt / jnp.asarray(g.dyc))[..., None]
    xfx = (puc * dt * jnp.asarray(g.dy))[..., None]
    yfx = (pvc * dt * jnp.asarray(g.dx))[..., None]

    @jax.jit
    def step(q):
        qx = ops.fill(q[..., None], "x")
        qy = ops.fill(q[..., None], "y")
        fx, fy = fvtp2d(qx, qy, crx, cry, xfx, yfx, area)
        return ops.interior(qx + (ddx(fx) + ddy(fy)) / area)[..., 0]

    # bell initial condition + quarter-revolution analytic solution
    d = (np.arange(n) + 0.5) / n * (np.pi / 2) - np.pi / 4
    centers = np.zeros((6, n, n, 3))
    for f in range(6):
        J, I = np.meshgrid(d, d, indexing="ij")
        centers[f] = face_point(f, I, J)

    def bell(center):
        ang = np.arccos(np.clip(
            np.einsum("...k,k->...", centers, center), -1, 1))
        r0 = 0.5
        return np.where(ang < r0, 0.5 * (1 + np.cos(np.pi * ang / r0)),
                        0.0).astype(np.float32)

    p0 = face_point(0, 0.0, 0.0)
    q = jnp.asarray(bell(p0))
    for _ in range(nsteps):
        q = step(q)
    # quarter revolution about z: the bell center rotates 90 degrees
    th = np.pi / 2
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0],
                    [0, 0, 1]])
    expect = bell(rot @ p0)
    w = np.asarray(g.area)[g.interior]
    err = np.asarray(q) - expect
    return float(np.sqrt((w * err ** 2).sum() / (w * expect ** 2).sum()))


def test_advection_converges_with_resolution():
    e12 = _l2_error(12)
    e24 = _l2_error(24)
    ratio = e12 / e24
    # monotone PPM on this flow: between 1st and ~2.5 order; require a
    # clear reduction (>= 2x) and record the observed order
    assert ratio > 2.0, (e12, e24, ratio)
    order = np.log2(ratio)
    print(f"L2: c12 {e12:.4f} -> c24 {e24:.4f}, observed order {order:.2f}")
    assert e24 < 0.25
