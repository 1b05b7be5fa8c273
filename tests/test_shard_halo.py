"""shard_map/ppermute halo exchange vs the single-device concat fill."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from geosongpu_tpu.parallel.halo import build_halo_ops
from geosongpu_tpu.parallel.shard_halo import build_plan, shard_halo_fill

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 6, reason="needs 6 (virtual) devices")

N_TEST, H_TEST = 12, 3


def test_ppermute_fill_matches_concat_fill():
    n, h = N_TEST, H_TEST
    ops = build_halo_ops(n, h)
    plan = build_plan(n, h)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((6, n, n, 4)), jnp.float32)

    expect_x = np.asarray(ops.fill(q, "x"))
    expect_y = np.asarray(ops.fill(q, "y"))

    mesh = Mesh(np.asarray(jax.devices()[:6]), axis_names=("face",))

    def local_fn(block):
        # block [1, n, n, 4] on each device
        px, py = shard_halo_fill(block[0], plan, "face")
        return px[None], py[None]

    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=P("face"), out_specs=(P("face"), P("face")))
    qs = jax.device_put(q, NamedSharding(mesh, P("face")))
    px, py = jax.jit(fn)(qs)
    np.testing.assert_array_equal(np.asarray(px), expect_x)
    np.testing.assert_array_equal(np.asarray(py), expect_y)
