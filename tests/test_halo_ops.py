"""Runtime (jnp) halo fill tests, including the divergence-theorem check
that exercises scalar + staggered-vector exchange together."""
import numpy as np
import pytest

from geosongpu_tpu.core import topology as tp
from geosongpu_tpu.core.grid import build_grid
from geosongpu_tpu.parallel.halo import build_halo_ops

N_TEST = 12
H_TEST = 3


@pytest.fixture(scope="module")
def ops():
    return build_halo_ops(N_TEST, H_TEST)


@pytest.fixture(scope="module")
def grid():
    return build_grid(N_TEST, H_TEST)


def _smooth(p):
    """Smooth scalar on the sphere."""
    return np.sin(2 * p[..., 0]) + np.cos(p[..., 1]) * p[..., 2] ** 2


def test_fill_scalar_matches_neighbor_values(ops):
    n, h = N_TEST, H_TEST
    d = (np.arange(n) + 0.5) / n * (np.pi / 2) - np.pi / 4
    centers = np.zeros((6, n, n, 3))
    for f in range(6):
        J, I = np.meshgrid(d, d, indexing="ij")
        centers[f] = tp.face_point(f, I, J)
    field = _smooth(centers).astype(np.float32)
    padded = np.asarray(ops.fill(field, "x"))
    # interior identity
    np.testing.assert_array_equal(padded[:, h:h + n, h:h + n], field)
    # halo equals field evaluated at the gathered positions
    spec = tp.halo_spec(n, h)
    expect = _smooth(centers.reshape(-1, 3)[spec.gidx_x]).astype(np.float32)
    np.testing.assert_allclose(padded, expect, rtol=1e-6)


def test_fill_trailing_dims(ops):
    n, h = N_TEST, H_TEST
    rng = np.random.default_rng(0)
    field = rng.standard_normal((6, n, n, 5, 2)).astype(np.float32)
    padded = np.asarray(ops.fill(field))
    assert padded.shape == (6, n + 2 * h, n + 2 * h, 5, 2)
    np.testing.assert_array_equal(padded[:, h:h + n, h:h + n], field)


def test_divergence_of_smooth_field_is_smooth(ops, grid):
    """Fill D-grid staggered winds from a smooth global vector field, compute
    the finite-volume divergence on every interior cell (incl. face edges and
    the 8 cube corners).  A sign/swap error in the exchange produces O(1)
    garbage at face boundaries; correct exchange keeps the divergence close
    to the analytic value everywhere."""
    n, h = N_TEST, H_TEST
    g = grid

    # global solid-body-rotation-ish field V = Omega x r (divergence-free)
    axis = np.array([0.3, -0.5, 0.81])
    axis /= np.linalg.norm(axis)

    s = np.arange(n + 1) / n * (np.pi / 2) - np.pi / 4
    u = np.zeros((6, n + 1, n), dtype=np.float64)
    v = np.zeros((6, n, n + 1), dtype=np.float64)
    for f in range(6):
        for j in range(n + 1):
            for i in range(n):
                p0 = tp.face_point(f, s[i], s[j])
                p1 = tp.face_point(f, s[i + 1], s[j])
                m = p0 + p1
                m /= np.linalg.norm(m)
                t = p1 - p0
                t -= m * np.dot(t, m)
                t /= np.linalg.norm(t)
                u[f, j, i] = np.dot(np.cross(axis, m), t)
        for j in range(n):
            for i in range(n + 1):
                p0 = tp.face_point(f, s[i], s[j])
                p1 = tp.face_point(f, s[i], s[j + 1])
                m = p0 + p1
                m /= np.linalg.norm(m)
                t = p1 - p0
                t -= m * np.dot(t, m)
                t /= np.linalg.norm(t)
                v[f, j, i] = np.dot(np.cross(axis, m), t)

    pu, pv = ops.fill_dgrid(u.astype(np.float32), v.astype(np.float32))
    pu = np.asarray(pu)
    pv = np.asarray(pv)

    # FV divergence using one halo ring: flux = wind * edge length.
    # x-fluxes through W/E faces use v? No: normal wind on W/E faces is the
    # *v array* in our D-grid convention? Here u is the along-x wind on S/N
    # edges (tangential), so the divergence stencil needs the normal winds:
    # normal to W/E faces is x -> that's the C-grid. For a *test* we instead
    # compute the circulation-free check: use u,v as normal winds by
    # construction is wrong; so compute divergence from tangential edges via
    # Stokes: circulation of V around each cell = vorticity * area; for a
    # solid-body field the relative vorticity is smooth (= 2*Omega_n), so we
    # check the discrete circulation instead.
    circ = (
        pu[:, :-1, :] * np.asarray(g.dx)[:, :-1, :]  # south edge, +x direction
        + pv[:, :, 1:] * np.asarray(g.dy)[:, :, 1:]  # east edge, +y
        - pu[:, 1:, :] * np.asarray(g.dx)[:, 1:, :]  # north edge, -x
        - pv[:, :, :-1] * np.asarray(g.dy)[:, :, :-1]  # west edge, -y
    )
    vort = circ / np.asarray(g.area)

    # analytic: vorticity of unit-sphere solid-body field V = a x r_hat,
    # integrated with physical (radius-R) lengths: 2 (a . r_hat) / R
    from geosongpu_tpu.core.grid import RADIUS

    N = n + 2 * h
    spec = tp.halo_spec(n, h)
    pos = np.zeros((6, n, n, 3))
    dd = (np.arange(n) + 0.5) / n * (np.pi / 2) - np.pi / 4
    for f in range(6):
        J, I = np.meshgrid(dd, dd, indexing="ij")
        pos[f] = tp.face_point(f, I, J)
    gpos = pos.reshape(-1, 3)[spec.gidx_x]
    analytic = 2 * np.einsum("...k,k->...", gpos, axis) / RADIUS

    # interior + one halo ring, excluding cells whose circulation touches a
    # corner block (u/v there belong to an ambiguous virtual cell)
    sel = np.zeros((6, N, N), dtype=bool)
    sel[:, h - 1:h + n + 1, h - 1:h + n + 1] = True
    sel[:, :h + 1, :h + 1] = False
    sel[:, :h + 1, h + n - 1:] = False
    sel[:, h + n - 1:, :h + 1] = False
    sel[:, h + n - 1:, h + n - 1:] = False
    err = np.abs(vort[sel] - analytic[sel])
    scale = 2.0 / RADIUS
    # 2nd-order discretization on c12: few percent; f32 roundoff adds noise
    assert err.max() / scale < 0.06, err.max() / scale
    assert err.mean() / scale < 0.02, err.mean() / scale
