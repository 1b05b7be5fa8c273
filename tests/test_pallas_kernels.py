"""Pallas kernel validation: the dual-implementation 0.01% gate applied to
the fused TPU kernel vs the jnp reference (the reference's serial-vs-OACC
contract, physics_standalone.py:132-144, for our own two builds)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosongpu_tpu.ops.pallas.microphysics import gfdl_microphysics_pallas
from geosongpu_tpu.physics.standalone import gfdl_microphysics


def _data(seed=0, ncol=300, K=32):
    rng = np.random.default_rng(seed)
    p = np.linspace(2000.0, 1e5, K)[None].repeat(ncol, 0).astype(np.float32)
    t = (220 + 80 * (p / 1e5) ** 0.28 + rng.normal(0, 2, (ncol, K))
         ).astype(np.float32)
    qv = np.clip(0.9 * 0.622 * 611.2 *
                 np.exp(17.67 * (t - 273.16) / (t - 30.06)) / p,
                 1e-7, 0.03).astype(np.float32)
    ql = np.clip(rng.normal(3e-4, 3e-4, (ncol, K)), 0, None).astype(np.float32)
    qi = np.clip(rng.normal(5e-5, 5e-5, (ncol, K)), 0, None).astype(np.float32)
    qr = np.clip(rng.normal(1e-4, 1e-4, (ncol, K)), 0, None).astype(np.float32)
    delp = np.gradient(p, axis=1).astype(np.float32)
    return tuple(map(jnp.asarray, (t, qv, ql, qr, qi, p, delp)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_jnp_within_gate(seed):
    args = _data(seed)
    interpret = jax.default_backend() != "tpu"
    ref = gfdl_microphysics(*args, 600.0)
    out = gfdl_microphysics_pallas(*args, 600.0, interpret=interpret)
    for name, a, b in zip(("t", "qv", "ql", "qr", "qi", "precip"),
                          (ref.t, ref.qv, ref.ql, ref.qr, ref.qi, ref.precip),
                          out):
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        scale = np.sqrt(np.mean(a ** 2)) or 1.0
        rel = np.sqrt(np.mean((b - a) ** 2)) / scale
        assert rel < 1e-4, (name, rel)


def test_pallas_nondivisible_columns():
    """Column counts that don't divide the block size must round-trip."""
    args = _data(seed=3, ncol=123, K=16)
    interpret = jax.default_backend() != "tpu"
    out = gfdl_microphysics_pallas(*args, 600.0, interpret=interpret)
    assert out[0].shape == (123, 16)
    assert bool(jnp.isfinite(out[0]).all())
