"""HS94 climatology gate, smoke-sized, in the slow pytest lane.

Round-2 verdict: "a gate that never runs is not a gate" - the full
40+20-day c12 gate runs weekly (.github/workflows/hs_climatology_weekly
.yml); this reduced 14+6-day configuration proves the same physics
pipeline (spin-up -> zonal-mean sampling -> published-structure checks)
end-to-end in the test suite.  Gate role parity:
/root/reference/src/tcn/ci/pipeline/held_suarez.py:379-434.
"""
import os

import numpy as np
import pytest

from geosongpu_tpu.harness.task import dispatch


@pytest.mark.slow
def test_hs_climatology_smoke_gate(tmp_path):
    env = dispatch("hs_climatology_smoke", "Validation",
                   artifact_directory=str(tmp_path / "art"),
                   workspace=str(tmp_path / "ws"))
    art = tmp_path / "art" / "hs_climatology.npz"
    assert art.exists()
    d = np.load(art)
    assert d["ubar"].shape[0] == 24
    assert np.isfinite(d["ubar"]).all() and np.isfinite(d["tbar"]).all()


def test_hs94_gate_logic_fast():
    """Unit-level gate check with synthetic climatologies: a published-
    structure climate passes; broken structures fail for the right
    reasons (no 20-minute spin-up needed)."""
    from geosongpu_tpu.harness.environment import Environment
    from geosongpu_tpu.harness.exceptions import CICheckException
    from geosongpu_tpu.harness.tasks.climatology import HSClimatology

    nbins, npz = 24, 16
    edges = np.linspace(-np.pi / 2, np.pi / 2, nbins + 1)
    latc = np.degrees(0.5 * (edges[:-1] + edges[1:]))
    sig = (np.arange(npz) + 0.5) / npz

    # HS94-like structure: midlatitude jets aloft, tropical surface
    # easterlies, warm equator, T(500) ~ 265 K, eddy flux peak ~35 deg
    ubar = (28.0 * np.exp(-((np.abs(latc)[:, None] - 45) / 12) ** 2)
            * np.exp(-((sig[None, :] - 0.25) / 0.25) ** 2))
    ubar[np.abs(latc) < 15, -2:] = -3.0
    tbar = (315 - 60 * np.sin(np.radians(latc))[:, None] ** 2
            ) * sig[None, :] ** 0.28
    uv = (60.0 * np.sign(latc)[:, None]
          * np.exp(-((np.abs(latc)[:, None] - 35) / 10) ** 2)
          * np.exp(-((sig[None, :] - 0.3) / 0.2) ** 2))

    def env_with(u, t, e):
        env = Environment(experiment_name="x", experiment_action="Validation",
                          artifact_directory=".", config=None)
        env.set("CI_WORKSPACE", ".")
        env.set("clim.ubar", u)
        env.set("clim.tbar", t)
        env.set("clim.uv_eddy", e)
        env.set("clim.edges", edges)
        return env

    task = HSClimatology()
    assert task.check({"jet_floor_ms": 10.0}, env_with(ubar, tbar, uv))

    with pytest.raises(CICheckException):   # no eddies
        task.check({"jet_floor_ms": 10.0},
                   env_with(ubar, tbar, np.zeros_like(uv)))
    with pytest.raises(CICheckException):   # isothermal midtroposphere
        task.check({"jet_floor_ms": 10.0},
                   env_with(ubar, np.full_like(tbar, 150.0), uv))
    with pytest.raises(CICheckException):   # equatorial jet
        bad_u = np.roll(ubar, -8, axis=0)
        bad_u[np.abs(latc) < 15, -2:] = -3.0
        task.check({"jet_floor_ms": 10.0}, env_with(bad_u, tbar, uv))
