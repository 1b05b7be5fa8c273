"""2-D flux-form transport operator (Lin & Rood 1996 directional splitting).

The TPU equivalent of gtFV3's FvTp2d stencil chain (the reference CI only
*configures* that external code - GTFV3_BACKEND=dace:gpu,
/root/reference/src/tcn/ci/pipeline/gtfv3_config.py:13; here we own it).

Scheme: each direction's flux is computed from the field fully advected in
the *other* direction (advective inner update), which restores the 2-D
cross terms of the splitting to 2nd order:

    q_i = inner y-advection of q   ->  fx = PPM_x(q_i) * x_area_flux
    q_j = inner x-advection of q   ->  fy = PPM_y(q_j) * y_area_flux

All arrays are padded [6, J, I, K]; only interior fluxes are valid (the
inner updates cover the halo strips the outer PPM stencil needs - halo
width 3 is exactly sufficient, as in FV3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .ppm import ppm_flux

_AX_Y = 1  # j axis in [6, J, I, K]
_AX_X = 2  # i axis


class Fluxes2D(NamedTuple):
    fx: jnp.ndarray  # area-weighted q-flux through W/E interfaces [6, J, I+1, K]
    fy: jnp.ndarray  # through S/N interfaces [6, J+1, I, K]


def _ddx(iface: jnp.ndarray) -> jnp.ndarray:
    """Convergence along x: F[i] - F[i+1] per cell."""
    return iface[:, :, :-1] - iface[:, :, 1:]


def _ddy(iface: jnp.ndarray) -> jnp.ndarray:
    return iface[:, :-1, :] - iface[:, 1:, :]


def fvtp2d(
    q: jnp.ndarray,        # padded cell means [6, J, I, K]
    crx: jnp.ndarray,      # Courant at x-interfaces [6, J, I+1, K]
    cry: jnp.ndarray,      # Courant at y-interfaces [6, J+1, I, K]
    xfx: jnp.ndarray,      # area flux (swept area) through x-interfaces, same shape as crx
    yfx: jnp.ndarray,      # area flux through y-interfaces, same shape as cry
    area: jnp.ndarray,     # padded cell areas [6, J, I] (or broadcastable with K)
    hord: int = 8,
) -> Fluxes2D:
    """Return area-weighted tracer fluxes; the caller updates
    q_new = (q*delta + fx_conv + fy_conv) / delta_new for whatever density
    weighting it uses (pure area for advection tests, delp*area for mass)."""
    if area.ndim == 3:
        area = area[..., None]

    # inner advective updates (full dt, upstream PPM, mass-consistent denom)
    fyy = ppm_flux(q, cry, axis=_AX_Y, hord=hord) * yfx
    ra_y = area + _ddy(yfx)
    q_i = (q * area + _ddy(fyy)) / ra_y

    fxx = ppm_flux(q, crx, axis=_AX_X, hord=hord) * xfx
    ra_x = area + _ddx(xfx)
    q_j = (q * area + _ddx(fxx)) / ra_x

    fx = ppm_flux(q_i, crx, axis=_AX_X, hord=hord) * xfx
    fy = ppm_flux(q_j, cry, axis=_AX_Y, hord=hord) * yfx
    return Fluxes2D(fx=fx, fy=fy)


def advect_scalar(
    q: jnp.ndarray,
    crx: jnp.ndarray,
    cry: jnp.ndarray,
    xfx: jnp.ndarray,
    yfx: jnp.ndarray,
    area: jnp.ndarray,
    hord: int = 8,
) -> jnp.ndarray:
    """One conservative 2-D advection step of a cell-mean scalar (constant
    density): returns the updated *interior-valid* padded field (halo values
    are stale; caller re-fills)."""
    if area.ndim == 3:
        area = area[..., None]
    fx, fy = fvtp2d(q, crx, cry, xfx, yfx, area, hord)
    return q + (_ddx(fx) + _ddy(fy)) / area
