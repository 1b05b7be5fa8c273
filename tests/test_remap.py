import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosongpu_tpu.ops.remap import remap_field


def test_identity_remap():
    """Remapping onto the same grid must reproduce the field exactly."""
    rng = np.random.default_rng(0)
    K = 32
    pe = np.sort(rng.uniform(100.0, 1.0e5, size=(50, K + 1)), axis=-1)
    pe[:, 0] = 100.0
    pe[:, -1] = 1.0e5
    q = rng.standard_normal((50, K)).astype(np.float32)
    out = remap_field(jnp.asarray(q), jnp.asarray(pe, jnp.float32),
                      jnp.asarray(pe, jnp.float32))
    # f32 cumulative-integral cancellation bounds accuracy at ~1e-4 relative
    # to the column scale (p_surf/dp amplification of eps)
    np.testing.assert_allclose(np.asarray(out), q, rtol=1e-3, atol=1e-3)


def test_conservation():
    """Column integral of q dp is conserved for any target coordinate with
    the same endpoints."""
    rng = np.random.default_rng(1)
    K = 24
    ncol = 40
    pe1 = np.sort(rng.uniform(100.0, 1.0e5, size=(ncol, K + 1)), axis=-1)
    pe1[:, 0] = 100.0
    pe1[:, -1] = 1.0e5
    pe2 = np.sort(rng.uniform(100.0, 1.0e5, size=(ncol, K + 1)), axis=-1)
    pe2[:, 0] = 100.0
    pe2[:, -1] = 1.0e5
    q = (2.0 + rng.standard_normal((ncol, K))).astype(np.float32)
    out = np.asarray(remap_field(jnp.asarray(q), jnp.asarray(pe1, jnp.float32),
                                 jnp.asarray(pe2, jnp.float32)))
    m1 = np.sum(q * np.diff(pe1, axis=-1), axis=-1)
    m2 = np.sum(out * np.diff(pe2, axis=-1), axis=-1)
    np.testing.assert_allclose(m2, m1, rtol=5e-5)


def test_smooth_profile_accuracy():
    """Remapping a smooth profile between two smooth coordinates should be
    much better than 1st order."""
    K = 64
    x1 = np.linspace(0, 1, K + 1) ** 1.3
    x2 = np.linspace(0, 1, K + 1) ** 0.8
    pe1 = (100.0 + (1e5 - 100.0) * x1)[None, :]
    pe2 = (100.0 + (1e5 - 100.0) * x2)[None, :]
    pm1 = 0.5 * (pe1[:, 1:] + pe1[:, :-1])
    pm2 = 0.5 * (pe2[:, 1:] + pe2[:, :-1])
    # monotone profile: the CW limiter is inactive, so the remap shows its
    # full 2nd/3rd-order accuracy
    f = lambda p: np.exp(p / 1e5) + 0.5 * (p / 1e5) ** 2
    q = f(pm1).astype(np.float32)
    out = np.asarray(remap_field(jnp.asarray(q), jnp.asarray(pe1, jnp.float32),
                                 jnp.asarray(pe2, jnp.float32)))
    err = np.abs(out - f(pm2)).max()
    assert err < 1e-3, err

    # oscillatory profile: limiter clips the smooth extremum to ~1st order
    # locally (classic monotone-PPM behavior) - just bound it loosely
    g = lambda p: np.sin(3 * p / 1e5)
    q2 = g(pm1).astype(np.float32)
    out2 = np.asarray(remap_field(jnp.asarray(q2), jnp.asarray(pe1, jnp.float32),
                                  jnp.asarray(pe2, jnp.float32)))
    assert np.abs(out2 - g(pm2)).max() < 3e-2


def test_monotone_no_overshoot():
    """A step profile must not produce new extrema."""
    K = 32
    pe1 = np.linspace(100.0, 1e5, K + 1)[None, :]
    x = np.linspace(0, 1, K + 1) ** 1.5
    pe2 = (100.0 + (1e5 - 100.0) * x)[None, :]
    q = np.where(np.arange(K) < K // 2, 1.0, 0.0)[None, :].astype(np.float32)
    out = np.asarray(remap_field(jnp.asarray(q), jnp.asarray(pe1, jnp.float32),
                                 jnp.asarray(pe2, jnp.float32)))
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6


def test_banded_remap_matches_full():
    """Banded overlap form is exact while deformation < band layers."""
    import numpy as np
    import jax.numpy as jnp

    from geosongpu_tpu.ops.remap import remap_field, remap_field_banded

    rng = np.random.default_rng(3)
    K = 24
    dp1 = rng.uniform(0.5, 1.5, (5, 7, K)).astype(np.float32)
    pe1 = np.concatenate([np.zeros((5, 7, 1), np.float32),
                          np.cumsum(dp1, -1)], -1)
    # target interfaces: perturb interior interfaces by < 1 layer
    pe2 = pe1.copy()
    pe2[..., 1:-1] += rng.uniform(-0.4, 0.4, (5, 7, K - 1)).astype(np.float32)
    pe2.sort(axis=-1)
    q = rng.standard_normal((5, 7, K)).astype(np.float32) + 5.0

    full = remap_field(jnp.asarray(q), jnp.asarray(pe1), jnp.asarray(pe2))
    for band in (2, 4, 10):
        b = remap_field_banded(jnp.asarray(q), jnp.asarray(pe1),
                               jnp.asarray(pe2), band=band)
        np.testing.assert_allclose(np.asarray(b), np.asarray(full),
                                   rtol=2e-5, atol=2e-5)


def test_banded_remap_conserves_mass():
    import numpy as np
    import jax.numpy as jnp

    from geosongpu_tpu.ops.remap import remap_field_banded

    rng = np.random.default_rng(4)
    K = 32
    dp1 = rng.uniform(0.5, 1.5, (4, K)).astype(np.float32)
    pe1 = np.concatenate([np.zeros((4, 1), np.float32),
                          np.cumsum(dp1, -1)], -1)
    pe2 = pe1.copy()
    pe2[..., 1:-1] += rng.uniform(-0.3, 0.3, (4, K - 1)).astype(np.float32)
    pe2.sort(axis=-1)
    q = rng.standard_normal((4, K)).astype(np.float32) + 3.0
    out = np.asarray(remap_field_banded(
        jnp.asarray(q), jnp.asarray(pe1), jnp.asarray(pe2), band=6))
    m1 = (q * dp1).sum(-1)
    m2 = (out * (pe2[..., 1:] - pe2[..., :-1])).sum(-1)
    np.testing.assert_allclose(m2, m1, rtol=1e-5)
