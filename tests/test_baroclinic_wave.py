"""Jablonowski-Williamson (2006) baroclinic-wave gates.

External-truth trajectory tests: the expected values cite JW06 (Q. J. R.
Meteorol. Soc. 132, 2943-2975), not this repo.  The fast lane checks the
analytic balance discretely; the slow lane runs the published wave
through the dispatchable experiment (harness/tasks/baroclinic.py).

Measured round-5 calibration (this solver):
  c48-L26: steady 4-day max dev 310 Pa; wave ps_min by day:
    d4 99689, d6 99321, d9 96768, d10 94900  (JW06 Fig. 5: ~994 hPa at
    day 6, 930-970 at day 9)
  c24-L26: d4 99584, d9 96753, d10 95171
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosongpu_tpu.core.config import DycoreConfig
from geosongpu_tpu.models.baroclinic_wave import build_model


def test_jw_initial_state_is_discretely_balanced():
    """The JW06 analytic state must be near-steady under one bare
    dycore step: the paper's own balance check (their eq. set is an
    exact steady solution; discrete error at c24 measured
    du/dt ~ 1e-4 m/s^2 max, column-mass dps/dt ~ 0.05 Pa/s)."""
    from geosongpu_tpu.dycore.fv_dynamics import fv_dynamics_step

    cfg = DycoreConfig(npx=24, npz=26, dt=120.0, n_split=1, ntracers=0)
    m = build_model(cfg)
    s0 = m.init(perturb=False)
    s1 = jax.jit(lambda s: fv_dynamics_step(s, m.ctx))(s0)
    dudt = np.abs(np.asarray(s1.u - s0.u)).max() / cfg.dt
    dpsdt = np.abs(np.asarray(s1.delp - s0.delp).sum(-1)).max() / cfg.dt
    assert dudt < 1.0e-3, f"du/dt {dudt:.2e} m/s^2"
    assert dpsdt < 0.5, f"column dps/dt {dpsdt:.2e} Pa/s"


def test_jw_steady_state_holds_one_day():
    """JW06 section 3: the unperturbed state holds.  One day at c24;
    measured drift ~5 hPa/day peak (gate 2x)."""
    cfg = DycoreConfig(npx=24, npz=26, dt=900.0, n_split=6, ntracers=0)
    m = build_model(cfg)
    s = m.run(m.init(perturb=False), 96)
    dev = np.abs(np.asarray(s.ps) - 1.0e5).max()
    umax = float(jnp.abs(s.u).max())
    assert np.isfinite(dev)
    assert dev < 1200.0, f"steady-state ps drift {dev:.0f} Pa in 1 day"
    assert umax < 40.0, f"max|u| {umax:.1f} (initial jet is 35 m/s)"


@pytest.mark.slow
def test_jw_wave_grows_on_published_schedule():
    """JW06 section 4 through the dispatchable experiment: quiet through
    day 4, explosive deepening by day 10 (c24 smoke lane; the c48
    config runs the published day-9 gate on real hardware)."""
    import tempfile

    from geosongpu_tpu.harness.task import dispatch

    with tempfile.TemporaryDirectory() as td:
        # raises CICheckException on any gate failure
        dispatch("jw_baroclinic_smoke", "Validation",
                 artifact_directory=td, workspace=td)