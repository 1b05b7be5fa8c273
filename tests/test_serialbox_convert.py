"""Serialbox converter: rank-layout x 6-tile assembly, sentinel cleaning,
savepoint-specific halo trims, per-savepoint output files.

Serialbox itself is not installable here (reference gates on
SERIALBOX_PYTHON, serialbox_dat_to_netcdf.py:75-79), so the converter's
serializer is dependency-injected and these tests drive the full assembly
path through a fake serializer producing known rank subdomains - the
converter is proven correct before recorded GEOS savepoints exist.
Reference behaviors covered: :51 (sentinel), :91-93 (rank count from
layout x 6), :150-161 (FVDynamics/Driver trims).
"""
import numpy as np
import pytest

from geosongpu_tpu.validation.serialbox_convert import (assemble_ranks,
                                                        clean_sentinels,
                                                        convert,
                                                        layout_from_nml,
                                                        trim_halo)


class _FakeSavepoint:
    def __init__(self, name):
        self.name = name


class _FakeSerializer:
    """rank r's subdomain of a global per-tile field that encodes
    (tile, y, x) so assembly errors are detectable."""

    def __init__(self, rank, lx, ly, ny, nx, halo, savepoints):
        self.rank = rank
        self.lx, self.ly = lx, ly
        self.ny, self.nx = ny, nx
        self.halo = halo
        self._sps = [_FakeSavepoint(n) for n in savepoints]

    def savepoint_list(self):
        return list(self._sps)

    def fields_at_savepoint(self, sp):
        return ["u", "ps"]

    def read(self, field, sp):
        tile = self.rank // (self.lx * self.ly)
        rr = self.rank % (self.lx * self.ly)
        by, bx = divmod(rr, self.lx)
        y0, x0 = by * self.ny, bx * self.nx
        yy, xx = np.meshgrid(np.arange(self.ny), np.arange(self.nx),
                             indexing="ij")
        data = (1000.0 * tile + 10.0 * (yy + y0) + (xx + x0)).astype(
            np.float64)
        if field == "u":
            data = np.repeat(data[..., None], 3, axis=-1)  # 3 levels
        if "FVDynamics" in sp.name:
            # fake per-rank halo: pad with sentinel values that the trim
            # must remove entirely
            h = self.halo
            data = np.pad(data, [(h, h), (h, h)] + [(0, 0)] * (data.ndim - 2),
                          constant_values=1.0e40)
        return data


def _factory(lx, ly, ny, nx, halo, savepoints):
    def make(rank):
        return _FakeSerializer(rank, lx, ly, ny, nx, halo, savepoints)

    return make


def _expected(tile, NY, NX):
    yy, xx = np.meshgrid(np.arange(NY), np.arange(NX), indexing="ij")
    return 1000.0 * tile + 10.0 * yy + xx


def test_clean_sentinels_and_trim():
    a = np.full((8, 8), 1.0e40)
    a[4, 4] = 2.0
    c = clean_sentinels(a)
    assert c[0, 0] == 0.0 and c[4, 4] == 2.0
    t = trim_halo(np.arange(100.0).reshape(10, 10), 3)
    assert t.shape == (4, 4)


def test_layout_from_nml(tmp_path):
    p = tmp_path / "input.nml"
    p.write_text("&fv_core_nml\n  npx = 49\n  layout = 3, 4\n/\n")
    assert layout_from_nml(str(p)) == (3, 4)


def test_assemble_ranks_orders_blocks():
    lx, ly, ny, nx = 2, 2, 3, 4
    blocks = []
    for by in range(ly):
        for bx in range(lx):
            yy, xx = np.meshgrid(np.arange(ny), np.arange(nx),
                                 indexing="ij")
            blocks.append(10.0 * (yy + by * ny) + (xx + bx * nx))
    out = assemble_ranks(blocks, lx, ly)
    np.testing.assert_array_equal(out, _expected(0, ny * ly, nx * lx))


@pytest.mark.parametrize("lx,ly", [(1, 1), (2, 2), (2, 1)])
def test_convert_assembles_all_tiles(tmp_path, lx, ly):
    ny, nx, halo = 6, 6, 3
    sps = ["Driver-In-FVDynamics", "Plain-Out"]
    paths = convert("unused", str(tmp_path), layout=(lx, ly), halo=halo,
                    fmt="npz",
                    serializer_factory=_factory(lx, ly, ny, nx, halo, sps))
    assert len(paths) == 2
    for path in paths:
        d = np.load(path)
        NY, NX = ny * ly, nx * lx
        assert d["ps"].shape == (6, NY, NX)
        assert d["u"].shape == (6, NY, NX, 3)
        for tile in range(6):
            np.testing.assert_array_equal(d["ps"][tile],
                                          _expected(tile, NY, NX))
        # driver savepoint had sentinel halos: trim must have removed all
        assert np.abs(d["u"]).max() < 1.0e40


def test_convert_savepoint_filter(tmp_path):
    sps = ["Driver-In-FVDynamics", "Plain-Out"]
    paths = convert("unused", str(tmp_path), layout=(1, 1), fmt="npz",
                    savepoint="Plain",
                    serializer_factory=_factory(1, 1, 4, 4, 3, sps))
    assert len(paths) == 1 and "Plain" in paths[0]


def test_convert_parses_real_bytes(tmp_path):
    """End-to-end through REAL files: write a serialbox-style binary dump
    (MetaData/ArchiveMetaData json + raw little-endian .dat records) for
    a 6-tile x (2, 1) rank layout, then run the converter with the
    binary-directory serializer - every value crosses the disk as bytes,
    unlike the injected in-memory fake above.  Layout/stitching/sentinel
    semantics match the reference converter
    (/root/reference/src/tcn/validation/serialbox/serialbox_dat_to_netcdf.py:91-161)."""
    import numpy as np

    from geosongpu_tpu.validation.serialbox_binary import (
        binary_serializer_factory, write_fixture)
    from geosongpu_tpu.validation.serialbox_convert import convert

    lx, ly = 2, 1
    ny, nx, nz = 4, 3, 2
    rng = np.random.RandomState(7)
    dat = tmp_path / "dump"
    # global truth per tile: [ny*ly, nx*lx, nz]
    truth = rng.randn(6, ny * ly, nx * lx, nz)
    truth[0, 0, 0, 0] = 1.0e40       # sentinel -> 0 on conversion
    for tile in range(6):
        for by in range(ly):
            for bx in range(lx):
                rank = tile * lx * ly + by * lx + bx
                block = truth[tile, by * ny:(by + 1) * ny,
                              bx * nx:(bx + 1) * nx]
                write_fixture(str(dat), f"Generator_rank{rank}",
                              ["MoistPhysics-In", "MoistPhysics-Out"],
                              {"t_field": [block[..., 0], block[..., 1]],
                               "q3d": [block, block * 2.0]})

    out = tmp_path / "out"
    written = convert(str(dat), str(out), layout=(lx, ly), fmt="npz",
                      serializer_factory=binary_serializer_factory(
                          str(dat)))
    assert len(written) == 2
    d_in = np.load([w for w in written if "In" in w][0])
    expect = truth.copy()
    expect[np.abs(expect) >= 1.0e40] = 0.0
    np.testing.assert_allclose(d_in["t_field"], expect[..., 0], rtol=0)
    np.testing.assert_allclose(d_in["q3d"], expect, rtol=0)
    d_out = np.load([w for w in written if "Out" in w][0])
    np.testing.assert_allclose(d_out["q3d"], expect * 2.0, rtol=0)
    # the fixture really is files-on-disk in the serialbox layout
    assert (dat / "MetaData-Generator_rank0.json").exists()
    assert (dat / "ArchiveMetaData-Generator_rank0.json").exists()
    assert (dat / "Generator_rank0_q3d.dat").exists()
