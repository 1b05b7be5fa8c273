"""Topology/halo-table unit tests.

The reference has no unit tests for its (external) halo machinery - it
validates by running the full model on the cluster (SURVEY.md SS4).  Here the
gather tables are validated geometrically on a laptop-sized grid.
"""
import numpy as np
import pytest

from geosongpu_tpu.core import topology as tp

N_TEST = 8
H_TEST = 3


def _cell_centers(n):
    d = (np.arange(n) + 0.5) / n * (np.pi / 2) - np.pi / 4
    out = np.zeros((6, n, n, 3))
    for f in range(6):
        J, I = np.meshgrid(d, d, indexing="ij")
        out[f] = tp.face_point(f, I, J)
    return out


def test_edge_table_symmetric():
    et = tp.edge_table()
    assert len(et) == 24
    for (f, e), link in et.items():
        back = et[(link.neighbor, link.nedge)]
        assert back.neighbor == f and back.nedge == e
        assert back.parity == link.parity


def test_every_face_has_four_distinct_neighbors():
    et = tp.edge_table()
    for f in range(6):
        nbrs = {et[(f, e)].neighbor for e in tp.EDGES}
        assert len(nbrs) == 4 and f not in nbrs


@pytest.mark.parametrize("order", ["x", "y"])
def test_halo_gather_continuity(order):
    """Gathered halo positions continue the face grid with ~cell-size steps,
    including through the two-hop corner blocks."""
    n, h = N_TEST, H_TEST
    spec = tp.halo_spec(n, h)
    pos = _cell_centers(n).reshape(-1, 3)
    gidx = spec.gidx_x if order == "x" else spec.gidx_y
    gpos = pos[gidx]
    cell = (np.pi / 2) / n

    def ang(a, b):
        return np.arccos(np.clip(np.sum(a * b, -1), -1, 1))

    if order == "x":
        d = ang(gpos[:, :, :-1], gpos[:, :, 1:])
    else:
        d = ang(gpos[:, :-1, :], gpos[:, 1:, :])
    assert d.max() < 2.2 * cell
    assert d.min() > 0.3 * cell


def test_halo_interior_is_identity():
    n, h = N_TEST, H_TEST
    spec = tp.halo_spec(n, h)
    jj, ii = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    for f in range(6):
        expect = (f * n + jj) * n + ii
        np.testing.assert_array_equal(spec.gidx_x[f, h:h + n, h:h + n], expect)
        np.testing.assert_array_equal(spec.gidx_y[f, h:h + n, h:h + n], expect)


def _staggered_geometry(n):
    s = np.arange(n + 1) / n * (np.pi / 2) - np.pi / 4
    u_pos = np.zeros((6, n + 1, n, 3))
    u_tan = np.zeros((6, n + 1, n, 3))
    v_pos = np.zeros((6, n, n + 1, 3))
    v_tan = np.zeros((6, n, n + 1, 3))
    for f in range(6):
        for j in range(n + 1):
            for i in range(n):
                p0 = tp.face_point(f, s[i], s[j])
                p1 = tp.face_point(f, s[i + 1], s[j])
                m = p0 + p1
                m /= np.linalg.norm(m)
                u_pos[f, j, i] = m
                t = p1 - p0
                t -= m * np.dot(t, m)
                u_tan[f, j, i] = t / np.linalg.norm(t)
        for j in range(n):
            for i in range(n + 1):
                p0 = tp.face_point(f, s[i], s[j])
                p1 = tp.face_point(f, s[i], s[j + 1])
                m = p0 + p1
                m /= np.linalg.norm(m)
                v_pos[f, j, i] = m
                t = p1 - p0
                t -= m * np.dot(t, m)
                v_tan[f, j, i] = t / np.linalg.norm(t)
    return u_pos, u_tan, v_pos, v_tan


def test_staggered_tables_sign_consistency():
    """Every gathered D-grid halo wind must point along the local coordinate
    direction implied by the surrounding (gathered) cell centers; a sign or
    u<->v swap error flips the projection."""
    n, h = N_TEST, H_TEST
    N = n + 2 * h
    spec = tp.halo_spec(n, h)
    u_pos, u_tan, v_pos, v_tan = _staggered_geometry(n)
    pos = _cell_centers(n).reshape(-1, 3)
    stag_pos = np.concatenate([u_pos.reshape(-1, 3), v_pos.reshape(-1, 3)])
    stag_tan = np.concatenate([u_tan.reshape(-1, 3), v_tan.reshape(-1, 3)])

    gupos = stag_pos[spec.u_idx]
    gutan = stag_tan[spec.u_idx]
    np.testing.assert_allclose(gupos[:, h:h + n + 1, h:h + n], u_pos)
    cpos_x = pos[spec.gidx_x]
    for f in range(6):
        for PJ in range(N + 1):
            for PI in range(1, N - 1):
                if h <= PJ <= h + n and h <= PI < h + n:
                    continue
                cj = PJ if PJ < N else N - 1
                xdir = cpos_x[f, cj, PI + 1] - cpos_x[f, cj, PI - 1]
                m = gupos[f, PJ, PI]
                xdir -= m * np.dot(xdir, m)
                nrm = np.linalg.norm(xdir)
                if nrm < 1e-9:
                    continue
                dot = np.dot(gutan[f, PJ, PI], xdir / nrm) * spec.u_sgn[f, PJ, PI]
                assert dot > 0.5, (f, PJ, PI, dot)

    gvpos = stag_pos[spec.v_idx]
    gvtan = stag_tan[spec.v_idx]
    np.testing.assert_allclose(gvpos[:, h:h + n, h:h + n + 1], v_pos)
    cpos_y = pos[spec.gidx_y]
    for f in range(6):
        for PJ in range(1, N - 1):
            for PI in range(N + 1):
                if h <= PI <= h + n and h <= PJ < h + n:
                    continue
                ci = PI if PI < N else N - 1
                ydir = cpos_y[f, PJ + 1, ci] - cpos_y[f, PJ - 1, ci]
                m = gvpos[f, PJ, PI]
                ydir -= m * np.dot(ydir, m)
                nrm = np.linalg.norm(ydir)
                if nrm < 1e-9:
                    continue
                dot = np.dot(gvtan[f, PJ, PI], ydir / nrm) * spec.v_sgn[f, PJ, PI]
                assert dot > 0.5, (f, PJ, PI, dot)
