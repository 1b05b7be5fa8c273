"""Independent second implementations of the Buoyancy and
EvapSublPdfLoop standalone kernels, as fused Pallas column kernels.

The reference's physics contract compares two SOURCES of each kernel
(serial vs OpenACC Fortran,
/root/reference/src/tcn/ci/pipeline/physics_standalone.py:40-55), not two
backends of one source.  Like ops/pallas/microphysics.py, these are
re-derivations with their own thermodynamic expressions:

* buoyancy: via the DENSITY ratio at equal pressure
  (B = g (rho_env / rho_parcel - 1)) with the virtual-temperature factor
  built from its own gas constants (Rv/Rd - 1), instead of the primary's
  (Tv_p - Tv_e)/Tv_e with thermo.t_virtual's (1/EPS - 1) form;
* evap/subl PDF: its own inlined Bolton / Murphy-Koop-simplified
  saturation pressures and Clausius-Clapeyron-free algebra, the clear-sky
  fraction written as the integral of the triangular RH PDF
  (0.5 + (1 - rh)/(2 w), clipped) rather than the primary's
  ((1 - rh + w)/(2 w)) form, and the evaporation limiters composed in a
  different (min-associativity-equivalent) order.

Both run as real fused Pallas kernels (one HBM read + write per field,
interpreter mode off-TPU) and are gated against the jnp primaries at the
reference's 0.01% dual-build contract in the physics standalone tasks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_COLS = 256

# own constants (not imported from physics.thermo)
_RD = 287.04
_RV = 461.50
_G = 9.80665
_CP = 1004.64
_T0 = 273.16
_LV = 2.501e6
_LS = 2.834e6


def _blocks(ncol):
    return -(-ncol // BLOCK_COLS)


def _pad_cols(a, nblk):
    need = nblk * BLOCK_COLS - a.shape[0]
    return a if need == 0 else jnp.pad(a, ((0, need), (0, 0)), mode="edge")


def _call(kernel, arrs, n_out, interpret):
    ncol, K = arrs[0].shape
    nblk = _blocks(ncol)
    arrs = [_pad_cols(a, nblk) for a in arrs]
    spec = pl.BlockSpec((BLOCK_COLS, K), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[spec] * len(arrs),
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((nblk * BLOCK_COLS, K),
                                        jnp.float32)] * n_out,
        interpret=interpret,
    )(*arrs)
    return [o[:ncol] for o in outs]


# --------------------------------------------------------------------------
# Buoyancy twin
# --------------------------------------------------------------------------

def _buoy_kernel(t_ref, qv_ref, p_ref, tp_ref, qp_ref, b_out):
    fac = _RV / _RD - 1.0
    # density at equal pressure: rho = p / (Rd T (1 + fac q));
    # B = g (rho_env / rho_par - 1) = g (T_par (1+fac q_par)
    #                                   / (T_env (1+fac q_env)) - 1)
    num = tp_ref[:] * (1.0 + fac * qp_ref[:])
    den = t_ref[:] * (1.0 + fac * qv_ref[:])
    b_out[:] = _G * (num / den - 1.0)


def buoyancy_pallas(t, qv, p, t_parcel, qv_parcel, interpret=False):
    (b,) = _call(_buoy_kernel, [jnp.asarray(a, jnp.float32) for a in
                                (t, qv, p, t_parcel, qv_parcel)],
                 1, interpret)
    return b


# --------------------------------------------------------------------------
# EvapSublPdfLoop twin
# --------------------------------------------------------------------------

def _evap_kernel(t_ref, qv_ref, ql_ref, qi_ref, p_ref,
                 t_out, qv_out, ql_out, qi_out, *, dt, pdf_width):
    t = t_ref[:]
    qv = qv_ref[:]
    ql = ql_ref[:]
    qi = qi_ref[:]
    p = p_ref[:]
    eps = _RD / _RV
    tc = t - _T0
    es_l = 611.2 * jnp.exp(17.67 * tc / (tc + 243.5))
    es_l = jnp.minimum(es_l, 0.9 * p)
    qs_l = eps * es_l / (p - (1.0 - eps) * es_l)
    es_i = 611.2 * jnp.exp(21.87 * tc / (tc + 265.5))
    es_i = jnp.minimum(es_i, 0.9 * p)
    qs_i = eps * es_i / (p - (1.0 - eps) * es_i)

    rh = qv / jnp.maximum(qs_l, 1e-12)
    # clear fraction = integral of the triangular RH PDF above saturation,
    # written as 1/2 + (1 - rh)/(2 w)
    clear = jnp.clip(0.5 + (1.0 - rh) / (2.0 * pdf_width), 0.0, 1.0)
    f = 1.0 - jnp.exp(-dt / 900.0)

    # limiter order: cap by subsaturation first, then by available
    # condensate (min is associative - same value, different source)
    evap = jnp.minimum(jnp.maximum(qs_l - qv, 0.0),
                       ql * clear * f)
    evap = jnp.minimum(evap, ql)
    subl = jnp.minimum(jnp.maximum(qs_i - qv, 0.0),
                       qi * clear * f)
    subl = jnp.minimum(subl, qi)

    qv_out[:] = qv + evap + subl
    ql_out[:] = ql - evap
    qi_out[:] = qi - subl
    t_out[:] = t - (_LV * evap + _LS * subl) / _CP


def evap_subl_pdf_pallas(t, qv, ql, qi, p, dt, pdf_width=0.1,
                         interpret=False):
    import functools

    k = functools.partial(_evap_kernel, dt=dt, pdf_width=pdf_width)
    outs = _call(k, [jnp.asarray(a, jnp.float32) for a in
                     (t, qv, ql, qi, p)], 4, interpret)
    return tuple(outs)
