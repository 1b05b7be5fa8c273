"""Nonhydrostatic vertical acoustic solver tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geosongpu_tpu.dycore.nh_solver import (hydrostatic_delz, _thomas,
                                            vertical_acoustic_solve)


def test_thomas_solves_tridiagonal():
    rng = np.random.default_rng(0)
    M = 24
    a = rng.uniform(-0.3, -0.1, (8, M)).astype(np.float32)
    c = rng.uniform(-0.3, -0.1, (8, M)).astype(np.float32)
    b = (1.0 + np.abs(a) + np.abs(c)).astype(np.float32)  # diag dominant
    x_true = rng.standard_normal((8, M)).astype(np.float32)
    # build d = T @ x
    d = b * x_true
    d[:, 1:] += a[:, 1:] * x_true[:, :-1]
    d[:, :-1] += c[:, :-1] * x_true[:, 1:]
    x = np.asarray(_thomas(*map(jnp.asarray, (a, b, c, d))))
    np.testing.assert_allclose(x, x_true, rtol=2e-4, atol=2e-4)


def _column(K=32, ncol=16, t0=280.0):
    ptop = 100.0
    pe = np.linspace(ptop, 1.0e5, K + 1)
    delp = np.diff(pe)[None, :].repeat(ncol, 0).astype(np.float32)
    pt = np.full((ncol, K), t0, np.float32)
    # pt as potential temperature for isothermal T=t0
    pk_mid = (0.5 * (pe[1:] + pe[:-1]) / 1e5) ** 0.2857
    pt = (t0 / pk_mid)[None, :].repeat(ncol, 0).astype(np.float32)
    return jnp.asarray(delp), jnp.asarray(pt), ptop


def test_balanced_column_stays_at_rest():
    delp, pt, ptop = _column()
    delz = hydrostatic_delz(delp, pt, ptop)
    K = delp.shape[-1]
    w = jnp.zeros(delp.shape[:-1] + (K + 1,), jnp.float32)
    w2, dz2 = vertical_acoustic_solve(w, delz, pt, delp, 60.0, ptop)
    # p' == 0 in discrete balance -> no motion beyond roundoff
    assert float(jnp.abs(w2).max()) < 5e-3
    np.testing.assert_allclose(np.asarray(dz2), np.asarray(delz), rtol=2e-4)


def test_perturbed_column_relaxes_and_is_stable():
    delp, pt, ptop = _column()
    delz0 = hydrostatic_delz(delp, pt, ptop)
    delz = delz0 * (1.0 + 0.05 * jnp.sin(
        jnp.arange(delz0.shape[-1]) / 3.0))  # squeezed/stretched layers
    K = delp.shape[-1]
    w = jnp.zeros(delp.shape[:-1] + (K + 1,), jnp.float32)

    # large dt: implicit scheme must stay bounded where explicit would blow
    dt = 120.0
    for _ in range(50):
        w, delz = vertical_acoustic_solve(w, delz, pt, delp, dt, ptop)
    assert bool(jnp.isfinite(w).all()) and bool(jnp.isfinite(delz).all())
    assert float(jnp.abs(w).max()) < 50.0
    assert float(delz.min()) > 0.0
    # perturbation should not have grown
    dev0 = float(jnp.abs(delz0 * 1.05 - delz0).max())
    dev = float(jnp.abs(delz - delz0).max())
    assert dev < 3 * dev0


def test_column_height_conserved_by_interior_motion():
    """Rigid lid/ground: total column height change only through boundary
    w == 0, so sum(delz) is invariant."""
    delp, pt, ptop = _column()
    delz = hydrostatic_delz(delp, pt, ptop) * 1.02
    K = delp.shape[-1]
    w = jnp.zeros(delp.shape[:-1] + (K + 1,), jnp.float32)
    h0 = np.asarray(jnp.sum(delz, -1))
    for _ in range(10):
        w, delz = vertical_acoustic_solve(w, delz, pt, delp, 60.0, ptop)
    h1 = np.asarray(jnp.sum(delz, -1))
    np.testing.assert_allclose(h1, h0, rtol=1e-5)
