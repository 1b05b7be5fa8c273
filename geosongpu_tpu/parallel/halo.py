"""Runtime halo exchange as XLA gathers.

The reference rides MPI point-to-point halo exchange living in the external
NDSL stack over OpenMPI/UCX/GDRCopy (SURVEY.md SS2.9 item 5,
/root/reference/sw_stack/discover/sles15/HISTORY.md).  Here the exchange is a
*data-parallel gather* with the static tables from core/topology.py:

* single device: one XLA gather, fused into the surrounding program;
* sharded (faces / subtiles on a mesh): the SPMD partitioner lowers the same
  gather to collectives over ICI; a `shard_map` + `ppermute` fast path for
  face-sharded meshes lives in parallel/mesh.py.

All functions are pure and jit-friendly; tables are closed over as constants.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.topology import NFACES, HaloSpec, halo_spec


@dataclass(frozen=True)
class HaloOps:
    """Device-resident halo gather tables + fill ops for one (n, h)."""

    n: int
    h: int
    gidx_x: jax.Array
    gidx_y: jax.Array
    vswap_x: jax.Array
    vsy_x: jax.Array
    vsx_x: jax.Array
    vswap_y: jax.Array
    vsy_y: jax.Array
    vsx_y: jax.Array
    u_idx: jax.Array
    u_sgn: jax.Array
    u_sgn_n: jax.Array
    v_idx: jax.Array
    v_sgn: jax.Array
    v_sgn_n: jax.Array

    # -- scalar, cell-centered -----------------------------------------
    def fill(self, field: jax.Array, direction: str = "x") -> jax.Array:
        """[6, n, n, ...] -> padded [6, N, N, ...].

        direction picks the corner-block table: 'x' for x-direction stencils
        (rows continue through S/N-hop-first corners), 'y' for y-direction.
        """
        n = self.n
        gidx = self.gidx_x if direction == "x" else self.gidx_y
        flat = field.reshape((NFACES * n * n,) + field.shape[3:])
        return jnp.take(flat, gidx, axis=0)

    # -- cell-centered vector ------------------------------------------
    def fill_vector(self, vy: jax.Array, vx: jax.Array, direction: str = "x"
                    ) -> Tuple[jax.Array, jax.Array]:
        """Pad a cell-centered vector (y-comp, x-comp), applying the
        signed-permutation frame change in the halo."""
        if direction == "x":
            sw, sy, sx = self.vswap_x, self.vsy_x, self.vsx_x
        else:
            sw, sy, sx = self.vswap_y, self.vsy_y, self.vsx_y
        py = self.fill(vy, direction)
        px = self.fill(vx, direction)
        extra = (1,) * (py.ndim - 3)
        sw = sw.reshape(sw.shape + extra)
        sy = sy.reshape(sy.shape + extra).astype(py.dtype)
        sx = sx.reshape(sx.shape + extra).astype(px.dtype)
        out_y = sy * jnp.where(sw, px, py)
        out_x = sx * jnp.where(sw, py, px)
        return out_y, out_x

    # -- D-grid staggered winds ----------------------------------------
    def fill_dgrid(self, u: jax.Array, v: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
        """u [6, n+1, n, ...], v [6, n, n+1, ...] ->
        padded u [6, N+1, N, ...], v [6, N, N+1, ...] with the MPP
        DGRID_NE-style u<->v swap/sign handling baked into the tables."""
        n = self.n
        trail = u.shape[3:]
        flat = jnp.concatenate([
            u.reshape((NFACES * (n + 1) * n,) + trail),
            v.reshape((NFACES * n * (n + 1),) + trail),
        ], axis=0)
        extra = (1,) * len(trail)
        pu = jnp.take(flat, self.u_idx, axis=0)
        pu = pu * self.u_sgn.reshape(self.u_sgn.shape + extra).astype(u.dtype)
        pv = jnp.take(flat, self.v_idx, axis=0)
        pv = pv * self.v_sgn.reshape(self.v_sgn.shape + extra).astype(v.dtype)
        return pu, pv

    # -- C-grid staggered normal winds ---------------------------------
    def fill_cgrid(self, uc: jax.Array, vc: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
        """uc [6, n, n+1, ...]: x-normal wind on W/E interfaces (v-point
        locations); vc [6, n+1, n, ...]: y-normal wind on S/N interfaces
        (u-point locations).  Same index tables as the D-grid exchange, but
        the *normal* component signs (a normal comp at a u-point is a
        y-component, so it gathers with the y sign)."""
        n = self.n
        trail = uc.shape[3:]
        # concat order must match table construction: u-point array first
        flat = jnp.concatenate([
            vc.reshape((NFACES * (n + 1) * n,) + trail),
            uc.reshape((NFACES * n * (n + 1),) + trail),
        ], axis=0)
        extra = (1,) * len(trail)
        pvc = jnp.take(flat, self.u_idx, axis=0)
        pvc = pvc * self.u_sgn_n.reshape(self.u_sgn_n.shape + extra).astype(vc.dtype)
        puc = jnp.take(flat, self.v_idx, axis=0)
        puc = puc * self.v_sgn_n.reshape(self.v_sgn_n.shape + extra).astype(uc.dtype)
        return puc, pvc

    def interior(self, padded: jax.Array) -> jax.Array:
        """Strip the halo of a padded cell-centered array."""
        h, n = self.h, self.n
        return padded[:, h:h + n, h:h + n]


def build_halo_ops(n: int, h: int) -> HaloOps:
    spec: HaloSpec = halo_spec(n, h)
    as_dev = lambda a: jnp.asarray(a)
    return HaloOps(
        n=n, h=h,
        gidx_x=as_dev(spec.gidx_x.reshape(-1)).reshape(spec.gidx_x.shape),
        gidx_y=as_dev(spec.gidx_y),
        vswap_x=as_dev(spec.vswap_x),
        vsy_x=as_dev(spec.vsy_x),
        vsx_x=as_dev(spec.vsx_x),
        vswap_y=as_dev(spec.vswap_y),
        vsy_y=as_dev(spec.vsy_y),
        vsx_y=as_dev(spec.vsx_y),
        u_idx=as_dev(spec.u_idx),
        u_sgn=as_dev(spec.u_sgn),
        u_sgn_n=as_dev(spec.u_sgn_n),
        v_idx=as_dev(spec.v_idx),
        v_sgn=as_dev(spec.v_sgn),
        v_sgn_n=as_dev(spec.v_sgn_n),
    )
