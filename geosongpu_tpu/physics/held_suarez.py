"""Held & Suarez (1994) idealized physics forcing.

The reference's flagship workload is the GEOS Held-Suarez configuration
(`geos_hs`, /root/reference/src/tcn/ci/data/experiments.yaml:8-29, driven by
src/tcn/ci/pipeline/held_suarez.py); there the forcing lives inside the
external Fortran/gtFV3 model.  Here it is a pure column update, applied
implicitly (unconditionally stable for any dt):

    T'  = (T + dt kt Teq) / (1 + dt kt)
    u'  = u / (1 + dt kv)

with the standard HS94 coefficients.  Latitude enters through precomputed
grid arrays; sigma = p / ps is dynamic.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.grid import Grid, KAPPA

SECONDS_PER_DAY = 86400.0
SIGMA_B = 0.7
KF = 1.0 / SECONDS_PER_DAY
KA = 1.0 / (40.0 * SECONDS_PER_DAY)
KS = 1.0 / (4.0 * SECONDS_PER_DAY)
DELTA_T_Y = 60.0
DELTA_THETA_Z = 10.0
T_MIN = 200.0
P00 = 1.0e5


class HSLatitudes(NamedTuple):
    lat_c: jnp.ndarray  # [6, n, n] cell centers (interior)
    lat_u: jnp.ndarray  # [6, n+1, n] u-points
    lat_v: jnp.ndarray  # [6, n, n+1]


def hs_latitudes(grid: Grid) -> HSLatitudes:
    h, n = grid.h, grid.n
    lat = np.asarray(grid.lat)
    lat_c = lat[:, h:h + n, h:h + n]
    # staggered latitudes from padded neighbors (2-pt average)
    lat_u = 0.5 * (lat[:, h - 1:h + n, h:h + n] + lat[:, h:h + n + 1, h:h + n])
    lat_v = 0.5 * (lat[:, h:h + n, h - 1:h + n] + lat[:, h:h + n, h:h + n + 1])
    return HSLatitudes(
        lat_c=jnp.asarray(lat_c, jnp.float32),
        lat_u=jnp.asarray(lat_u, jnp.float32),
        lat_v=jnp.asarray(lat_v, jnp.float32),
    )


def t_equilibrium(lat: jnp.ndarray, p_mid: jnp.ndarray) -> jnp.ndarray:
    """HS94 radiative-equilibrium temperature; lat [..., 1] vs p [..., K]."""
    sin2 = jnp.sin(lat) ** 2
    cos2 = 1.0 - sin2
    pr = p_mid / P00
    t = (315.0 - DELTA_T_Y * sin2 - DELTA_THETA_Z * jnp.log(pr) * cos2) * pr ** KAPPA
    return jnp.maximum(T_MIN, t)


def _k_boundary(sigma):
    return jnp.maximum(0.0, (sigma - SIGMA_B) / (1.0 - SIGMA_B))


SPONGE_P = 400.0        # Pa: Rayleigh sponge on winds above this pressure
SPONGE_TAU = 2.0 * SECONDS_PER_DAY


def held_suarez_forcing(u, v, pt, delp, lats: HSLatitudes, ptop: float,
                        dt: float):
    """Apply one dt of HS94 forcing.  u/v are D-grid staggered; pt is
    potential temperature (converted to T via the layer Exner internally).
    A weak model-top Rayleigh sponge (standard practice; HS94 itself has
    none) keeps upper-level gravity-wave noise bounded in long runs.

    Returns (u', v', pt')."""
    from ..ops.vertical import interfaces_from_delp

    pe = interfaces_from_delp(delp, ptop)
    p_mid = 0.5 * (pe[..., 1:] + pe[..., :-1])
    ps = pe[..., -1:]
    sigma = p_mid / ps
    pk = (p_mid / P00) ** KAPPA  # midpoint Exner (T = pt * pk to this order)

    # temperature relaxation
    t = pt * pk
    teq = t_equilibrium(lats.lat_c[..., None], p_mid)
    kt = KA + (KS - KA) * _k_boundary(sigma) * jnp.cos(lats.lat_c[..., None]) ** 4
    t_new = (t + dt * kt * teq) / (1.0 + dt * kt)
    pt_new = t_new / pk

    # boundary-layer Rayleigh friction on the staggered winds; sigma at the
    # staggered points approximated by the cell-mean sigma profile adjacent
    # (2-pt average along the staggering direction)
    def _sponge(p):
        return (1.0 / SPONGE_TAU) * jnp.maximum(
            0.0, (SPONGE_P - p) / SPONGE_P) ** 2

    sig_u = 0.5 * (jnp.concatenate([sigma[:, :1], sigma], axis=1)
                   + jnp.concatenate([sigma, sigma[:, -1:]], axis=1))
    p_u = 0.5 * (jnp.concatenate([p_mid[:, :1], p_mid], axis=1)
                 + jnp.concatenate([p_mid, p_mid[:, -1:]], axis=1))
    kv_u = KF * _k_boundary(sig_u) + _sponge(p_u)
    u_new = u / (1.0 + dt * kv_u)

    sig_v = 0.5 * (jnp.concatenate([sigma[:, :, :1], sigma], axis=2)
                   + jnp.concatenate([sigma, sigma[:, :, -1:]], axis=2))
    p_v = 0.5 * (jnp.concatenate([p_mid[:, :, :1], p_mid], axis=2)
                 + jnp.concatenate([p_mid, p_mid[:, :, -1:]], axis=2))
    kv_v = KF * _k_boundary(sig_v) + _sponge(p_v)
    v_new = v / (1.0 + dt * kv_v)

    return u_new, v_new, pt_new
