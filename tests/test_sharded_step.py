"""Full face-sharded dynamics step (ppermute halo path) vs single-device."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosongpu_tpu.core.config import DycoreConfig
from geosongpu_tpu.dycore.fv_dynamics import fv_dynamics_step
from geosongpu_tpu.dycore.sharded import build_sharded_step, face_mesh
from geosongpu_tpu.models.held_suarez import build_model

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 6, reason="needs 6 (virtual) devices")


def test_sharded_step_matches_single_device():
    cfg = DycoreConfig(npx=12, npz=8, dt=600.0, n_split=3)
    model = build_model(cfg)
    st = model.init(perturb=0.05)

    ref = jax.jit(lambda s: fv_dynamics_step(s, model.ctx))(st)

    step, place = build_sharded_step(model.ctx)
    out = step(place(st))

    # not bit-identical (XLA fuses the two programs differently) but must
    # agree to f32 ULP-level reassociation noise
    np.testing.assert_allclose(np.asarray(out.delp), np.asarray(ref.delp),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.pt), np.asarray(ref.pt),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v),
                               rtol=1e-4, atol=1e-5)


def test_sharded_multi_step_stable():
    cfg = DycoreConfig(npx=12, npz=8, dt=600.0, n_split=3)
    model = build_model(cfg)
    st = model.init(perturb=0.05)
    step, place = build_sharded_step(model.ctx)
    s = place(st)
    for _ in range(4):
        s = step(s)
    assert bool(jnp.isfinite(s.pt).all())
    assert bool(jnp.isfinite(s.u).all())
