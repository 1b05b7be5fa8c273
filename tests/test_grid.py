import numpy as np

from geosongpu_tpu.core.grid import RADIUS, build_grid


def test_areas_tile_the_sphere():
    g = build_grid(12, 3)
    tot = g.area[g.interior].sum(dtype=np.float64)
    assert abs(tot / (4 * np.pi * RADIUS**2) - 1) < 1e-5


def test_metric_halo_continuity():
    """Halo metric values are the neighbor's true values: the ratio across a
    face edge stays near 1 (the equiangular grid is edge-symmetric)."""
    g = build_grid(12, 3)
    h, n = g.h, g.n
    r = g.area[:, h:h + n, h + n] / g.area[:, h:h + n, h + n - 1]
    np.testing.assert_allclose(r, 1.0, atol=1e-5)
    r = g.dx[:, h:h + n, h + n] / g.dx[:, h:h + n, h + n - 1]
    assert (np.abs(r - 1) < 0.2).all()


def test_center_distances_positive_and_bounded():
    g = build_grid(12, 3)
    h, n = g.h, g.n
    inner_dxc = g.dxc[:, h:h + n, h:h + n + 1]
    cell = (np.pi / 2) / n * RADIUS
    assert inner_dxc.min() > 0.3 * cell
    assert inner_dxc.max() < 2.0 * cell


def test_coriolis_range():
    g = build_grid(8, 3)
    assert np.abs(g.fcor).max() <= 2 * 7.292e-5 + 1e-9
    # north polar face center should be ~ +f_max
    h, n = g.h, g.n
    assert g.fcor[4, h + n // 2, h + n // 2] > 1.3e-4
    assert g.fcor[5, h + n // 2, h + n // 2] < -1.3e-4


def test_vertical_coordinates():
    from geosongpu_tpu.core.vertical import hybrid_coordinate, sigma_coordinate

    for fn in (sigma_coordinate, hybrid_coordinate):
        ak, bk = fn(32, ptop=100.0)
        assert ak.shape == (33,) and bk.shape == (33,)
        pe = ak + bk * 1.0e5
        assert pe[0] == 100.0 and abs(pe[-1] - 1.0e5) < 1e-3
        assert (np.diff(pe) > 0).all(), "interfaces must increase downward"
        pe_low = ak + bk * 5.0e4  # low surface pressure still monotone
        assert (np.diff(pe_low) > 0).all()
