"""Vertical-column primitives tuned for TPU.

jnp.cumsum along the minor (K) axis lowers to an O(K^2) VPU
reduce-window on TPU - measured 1.1 ms per call on [6,48,48,72] at
c48-L72, several calls per step (pressure integrals, geopotential,
omga).  A K-cumsum is a triangular MATMUL, and the MXU runs it at
~180 TF/s f32: out[..., l] = sum_{k<=l} x[..., k] = x @ triu(1).

These helpers are the required form for every vertical integral in the
dycore; plain jnp.cumsum along K is a performance bug here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cumsum_k(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive forward cumsum along the last axis via MXU matmul.

    precision=HIGHEST: the default TPU matmul precision decomposes f32
    into bf16 passes - fine for ML weights, NOT for pressure integrals
    (1e-2 relative error on pe would swamp the PGF)."""
    K = x.shape[-1]
    tri = jnp.triu(jnp.ones((K, K), x.dtype))
    return jax.lax.dot_general(
        x, tri, (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def rcumsum_k(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive REVERSE cumsum (suffix sum) along the last axis."""
    K = x.shape[-1]
    tri = jnp.tril(jnp.ones((K, K), x.dtype))
    return jax.lax.dot_general(
        x, tri, (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def interfaces_from_delp(delp: jnp.ndarray, ptop: float) -> jnp.ndarray:
    """Interface pressures pe [..., K+1] from layer thickness [..., K]."""
    return ptop + jnp.concatenate(
        [jnp.zeros_like(delp[..., :1]), cumsum_k(delp)], axis=-1)
