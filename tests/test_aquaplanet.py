"""Aquaplanet moist-model smoke tests (reference geos_aq analog)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosongpu_tpu.core.config import DycoreConfig
from geosongpu_tpu.models.aquaplanet import build_model, sst_qobs


@pytest.fixture(scope="module")
def model():
    cfg = DycoreConfig(npx=8, npz=12, dt=1200.0, n_split=4, ntracers=3)
    return build_model(cfg)


def test_sst_profile():
    lat = jnp.linspace(-np.pi / 2, np.pi / 2, 101)
    sst = np.asarray(sst_qobs(lat))
    assert abs(sst[50] - 300.16) < 0.2       # equator ~ 27C
    assert abs(sst[0] - 273.16) < 1e-3        # poles at freezing
    assert (np.diff(sst[:51]) >= -1e-6).all()  # monotone toward equator


def test_moist_init_physical(model):
    st = model.init()
    qv = np.asarray(st.q[..., 0])
    assert qv.min() >= 0.0 and qv.max() < 0.03


def test_short_run_stable_and_moist(model):
    st = model.init(perturb=0.01)
    s = st
    for _ in range(12):
        s = model.step_fn(s)
    assert bool(jnp.isfinite(s.pt).all()) and bool(jnp.isfinite(s.q).all())
    qv = np.asarray(s.q[..., 0])
    assert qv.min() > -1e-6 and qv.max() < 0.05
    # surface evaporation must moisten the lowest layer somewhere
    assert float(jnp.mean(s.q[..., 0]) - jnp.mean(st.q[..., 0])) > 0.0
    ps = np.asarray(s.ps)
    assert ps.min() > 9.0e4 and ps.max() < 1.1e5
