"""Moist-physics standalone column kernels.

The reference validates seven OpenACC Fortran physics kernels against their
serial builds at 0.01% (/root/reference/src/tcn/ci/pipeline/physics_standalone.py:13-146;
kernel list :149-339: MoistRadCoup, GFDLMicrophysics, Buoyancy, CupGfSh,
EvapSublPdfLoop, FillQ2Zero, AerActivation).  The Fortran sources live in
external orphan branches, so these are TPU-native *re-derivations of the
same physical roles* using standard formulations - not ports.  Each kernel
is a pure column function over [..., K] arrays (K minor => wide VPU ops;
vertical scans are lax scans/cumsums), jit- and vmap-friendly.

Validation mirrors the reference's serial-vs-OACC gate: each kernel runs on
the default backend (jit) and on the CPU backend over 5 synthetic datasets
and must agree within 0.01% (harness/tasks/physics_standalone.py).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .thermo import (CP_AIR, EPS, GRAV, HLV, HLS, RDGAS, T_ICE, dqsat_dt,
                     qsat, qsat_ice, t_virtual)


# --------------------------------------------------------------------------
# FillQ2Zero: conservative removal of negative tracer values
# --------------------------------------------------------------------------

def fill_q2_zero(q: jnp.ndarray, delp: jnp.ndarray) -> jnp.ndarray:
    """Eliminate negative mixing ratios by borrowing mass from the layer
    below (top-down pass), then clip any residual negative in the bottom
    layer.  Column mass of q*delp is conserved except for the final clip.
    Arrays [..., K]."""
    K = q.shape[-1]

    def body(carry, k):
        q_above_deficit = carry  # mass deficit [Pa kg/kg] owed from above
        qk = q[..., k] + q_above_deficit / delp[..., k]
        deficit = jnp.minimum(qk, 0.0) * delp[..., k]
        qk = jnp.maximum(qk, 0.0)
        return deficit, qk

    deficit0 = jnp.zeros_like(q[..., 0])
    _, cols = jax.lax.scan(body, deficit0, jnp.arange(K))
    return jnp.moveaxis(cols, 0, -1)


# --------------------------------------------------------------------------
# Buoyancy: parcel buoyancy profile
# --------------------------------------------------------------------------

def buoyancy(t: jnp.ndarray, qv: jnp.ndarray, p: jnp.ndarray,
             t_parcel: jnp.ndarray, qv_parcel: jnp.ndarray) -> jnp.ndarray:
    """Parcel buoyancy B = g (Tv_p - Tv_e)/Tv_e per layer [m/s^2]."""
    tv_env = t_virtual(t, qv)
    tv_par = t_virtual(t_parcel, qv_parcel)
    return GRAV * (tv_par - tv_env) / tv_env


# --------------------------------------------------------------------------
# EvapSublPdfLoop: condensate evaporation/sublimation with a subgrid PDF
# --------------------------------------------------------------------------

def evap_subl_pdf(t: jnp.ndarray, qv: jnp.ndarray, ql: jnp.ndarray,
                  qi: jnp.ndarray, p: jnp.ndarray, dt: float,
                  pdf_width: float = 0.1) -> Tuple[jnp.ndarray, ...]:
    """Evaporate cloud liquid / sublimate cloud ice into subsaturated air.

    Subgrid variability: a symmetric triangular RH PDF of half-width
    `pdf_width`; the clear (subsaturated) fraction drives evaporation with
    a 900 s timescale.  Returns (t', qv', ql', qi')."""
    qs_l = qsat(t, p)
    qs_i = qsat_ice(t, p)
    rh = qv / jnp.maximum(qs_l, 1e-12)
    # clear-sky fraction from triangular PDF centered at rh
    clear = jnp.clip((1.0 - rh + pdf_width) / (2.0 * pdf_width), 0.0, 1.0)
    tau = 900.0
    f = 1.0 - jnp.exp(-dt / tau)

    evap = jnp.minimum(ql, ql * clear * f)
    evap = jnp.minimum(evap, jnp.maximum(qs_l - qv, 0.0))
    subl = jnp.minimum(qi, qi * clear * f)
    subl = jnp.minimum(subl, jnp.maximum(qs_i - qv, 0.0))

    qv2 = qv + evap + subl
    ql2 = ql - evap
    qi2 = qi - subl
    t2 = t - (HLV * evap + HLS * subl) / CP_AIR
    return t2, qv2, ql2, qi2


# --------------------------------------------------------------------------
# AerActivation: aerosol activation (lognormal CCN spectrum)
# --------------------------------------------------------------------------

def aer_activation(num_aer: jnp.ndarray, w: jnp.ndarray, t: jnp.ndarray,
                   p: jnp.ndarray, sigma_g: float = 2.0,
                   s_crit0: float = 0.003) -> jnp.ndarray:
    """Activated cloud droplet number [same units as num_aer].

    Twomey/ARG-style: maximum supersaturation from the updraft, activated
    fraction = lognormal CDF of critical supersaturation."""
    # max supersaturation ~ w^(3/4) scaling (ARG)
    smax = jnp.clip(0.01 * jnp.maximum(w, 0.0) ** 0.75, 1e-5, 0.1)
    # activated fraction: erf form of lognormal CDF
    ln_ratio = jnp.log(s_crit0 / smax)
    ln_sig = jnp.log(sigma_g)
    frac = 0.5 * (1.0 - jax.lax.erf(ln_ratio / (jnp.sqrt(2.0) * 1.5 * ln_sig)))
    return num_aer * frac


# --------------------------------------------------------------------------
# GFDLMicrophysics (1M-lite): the flagship column kernel
# --------------------------------------------------------------------------

class MicrophysicsOut(NamedTuple):
    t: jnp.ndarray
    qv: jnp.ndarray
    ql: jnp.ndarray
    qr: jnp.ndarray
    qi: jnp.ndarray
    precip: jnp.ndarray  # surface rain flux accumulated over dt [kg/m^2]


def gfdl_microphysics(t, qv, ql, qr, qi, p, delp, dt) -> MicrophysicsOut:
    """Single-moment warm/cold rain lite: saturation adjustment,
    autoconversion, accretion, rain evaporation, rain sedimentation
    (semi-Lagrangian single pass), with latent heating.  Vertical index
    runs TOA -> surface (matching the dycore layout)."""
    # --- saturation adjustment (one Newton iteration) -------------------
    qs0 = qsat(t, p)
    dq = (qv - qs0) / (1.0 + (HLV / CP_AIR) * dqsat_dt(t, p))
    cond = jnp.where(dq > 0, dq, jnp.maximum(dq, -ql))  # condense or evap
    qv = qv - cond
    ql = ql + cond
    t = t + HLV / CP_AIR * cond

    # --- ice: freeze liquid below -40C, melt ice above 0C ----------------
    freeze = jnp.where(t < T_ICE - 40.0, ql, 0.0)
    melt = jnp.where(t > T_ICE, qi, 0.0)
    ql = ql - freeze + melt
    qi = qi + freeze - melt
    t = t + (HLS - HLV) / CP_AIR * (freeze - melt)

    # --- warm rain: autoconversion + accretion ---------------------------
    ql_crit = 5.0e-4
    tau_auto = 1800.0
    auto = jnp.maximum(ql - ql_crit, 0.0) * (1.0 - jnp.exp(-dt / tau_auto))
    acc = ql * (1.0 - jnp.exp(-dt * 2.2 * jnp.maximum(qr, 0.0) ** 0.875))
    to_rain = jnp.minimum(ql, auto + acc)
    ql = ql - to_rain
    qr = qr + to_rain

    # --- rain sedimentation: fall one pass with constant speed ----------
    # flux form: mass flux out of layer k = min(qr*delp, vt*dt/dz * qr*delp)
    vt = 5.0  # m/s bulk rain fall speed
    rho = p / (RDGAS * jnp.maximum(t, 150.0))
    dz = delp / (rho * GRAV)
    cr = jnp.clip(vt * dt / jnp.maximum(dz, 1.0), 0.0, 1.0)
    out_flux = qr * cr * delp              # [Pa kg/kg] leaving each layer
    in_flux = jnp.concatenate(
        [jnp.zeros_like(out_flux[..., :1]), out_flux[..., :-1]], axis=-1)
    qr = qr + (in_flux - out_flux) / delp
    precip = out_flux[..., -1] / GRAV      # surface flux [kg/m^2 per dt]

    # --- rain evaporation in subsaturated air ---------------------------
    qs1 = qsat(t, p)
    subsat = jnp.maximum(qs1 - qv, 0.0)
    evap = jnp.minimum(qr, 0.5 * subsat * (1.0 - jnp.exp(-dt / 3600.0)))
    qr = qr - evap
    qv = qv + evap
    t = t - HLV / CP_AIR * evap

    return MicrophysicsOut(t=t, qv=qv, ql=ql, qr=qr, qi=qi, precip=precip)


# --------------------------------------------------------------------------
# MoistRadCoup: condensate -> radiative cloud properties
# --------------------------------------------------------------------------

def moist_rad_coup(ql: jnp.ndarray, qi: jnp.ndarray, p: jnp.ndarray,
                   t: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Diagnose cloud fraction and effective radii for radiation coupling
    (Sundqvist-style fraction, T-dependent ice radius)."""
    q_cond = ql + qi
    cf = jnp.clip(1.0 - jnp.exp(-q_cond / 2.0e-5), 0.0, 1.0)
    re_liq = jnp.full_like(ql, 10.0e-6)
    re_ice = jnp.clip((t - 180.0) * 0.5e-6, 10.0e-6, 60.0e-6)
    return {"cloud_fraction": cf, "re_liquid": re_liq, "re_ice": re_ice,
            "condensate": q_cond}


# --------------------------------------------------------------------------
# CupGfSh: shallow convection (bulk mass-flux lite)
# --------------------------------------------------------------------------

def cup_gf_sh(t, qv, p, delp, dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shallow cumulus mixing: where the lowest layer is buoyantly unstable
    w.r.t. the layer above (virtual potential temperature decreasing with
    height), mix T and qv over the unstable depth with a 3 h timescale.
    Returns (t', qv')."""
    theta_v = t_virtual(t, qv) * (1.0e5 / p) ** (RDGAS / CP_AIR)
    # instability: theta_v below > theta_v above (K increases downward)
    unstable = theta_v[..., 1:] > theta_v[..., :-1] + 0.1
    # mixing coefficient per interface
    f = (1.0 - jnp.exp(-dt / 10800.0)) * 0.5
    mix = jnp.where(unstable, f, 0.0)

    def mix_field(a):
        flux = mix * (a[..., 1:] - a[..., :-1])  # downgradient (upward)
        da = jnp.zeros_like(a)
        da = da.at[..., :-1].add(flux * delp[..., 1:] /
                                 (delp[..., :-1] + delp[..., 1:]))
        da = da.at[..., 1:].add(-flux * delp[..., :-1] /
                                (delp[..., :-1] + delp[..., 1:]))
        return a + da

    return mix_field(t), mix_field(qv)
