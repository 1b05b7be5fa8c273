import jax
import jax.numpy as jnp
import numpy as np

from geosongpu_tpu.ops.column_patterns import (broadcast_bottom,
                                               broadcast_top, first_k_above,
                                               value_at_k, while_in_column)


def test_while_in_column_converges():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    out = jax.jit(lambda x: while_in_column(x, 0.05, max_iter=500))(q)
    spread = np.asarray(out.max(-1) - out.min(-1))
    assert (spread <= 0.05 + 1e-6).all()
    # column means preserved at interior-conserving smoothing? not exactly
    # (boundary scheme) - just finiteness + monotone shrink
    assert np.isfinite(np.asarray(out)).all()


def test_broadcasts():
    q = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    t = np.asarray(broadcast_top(q))
    b = np.asarray(broadcast_bottom(q))
    assert (t == t[..., :1]).all() and (t[..., 0] == np.asarray(q)[..., 0]).all()
    assert (b[..., 0] == np.asarray(q)[..., -1]).all()


def test_value_at_k():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((5, 7, 12)), jnp.float32)
    k = jnp.asarray(rng.integers(0, 12, (5, 7)), jnp.int32)
    out = np.asarray(value_at_k(q, k))
    expect = np.take_along_axis(np.asarray(q), np.asarray(k)[..., None],
                                axis=-1)[..., 0]
    np.testing.assert_allclose(out, expect)


def test_first_k_above():
    q = jnp.asarray([[0.0, 0.1, 0.5, 0.2], [0.0, 0.0, 0.0, 0.0]])
    out = np.asarray(first_k_above(q, 0.3))
    assert out[0] == 2 and out[1] == 4
