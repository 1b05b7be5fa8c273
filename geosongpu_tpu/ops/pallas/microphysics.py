"""Pallas TPU kernel: fused GFDL-1M microphysics column update.

The jnp reference implementation (physics/standalone.py:gfdl_microphysics)
is ~80 elementwise ops + two vertical sedimentation recurrences; XLA fuses
it into a few passes over HBM.  This kernel fuses the *entire* chain into
one HBM read + one write per field: a grid over column blocks, each
block's [BLOCK_COLS, K] panes resident in VMEM, all arithmetic on the VPU,
and the implicit-upstream sedimentation recurrence unrolled over the
static K as single-lane updates in-register.

This is a genuinely independent second implementation (its own saturation
functions, its own recurrence formulation), gated against the jnp path at
the reference's dual-build 0.01% contract
(/root/reference/src/tcn/ci/pipeline/physics_standalone.py:132-144) in
tests and the GFDLMicrophysics task.  On non-TPU backends the kernel runs
in interpreter mode.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...physics.standalone import (C_ACC, C_REVP, HLF, QL_CRIT, RHO0,
                                   TAU_AUTO, TAU_WBF, VT_ICE_MAX,
                                   VT_RAIN_MAX)
from ...physics.thermo import (CP_AIR, EPS, GRAV, HLS, HLV, RDGAS, T_ICE)

BLOCK_COLS = 256


def _qsat(t, p):
    tc = t - T_ICE
    es = 611.2 * jnp.exp(17.67 * tc / (tc + 243.5))
    es = jnp.minimum(es, 0.9 * p)
    return EPS * es / (p - (1.0 - EPS) * es)


def _qsat_ice(t, p):
    tc = t - T_ICE
    es = 611.2 * jnp.exp(21.87 * tc / (tc + 265.5))
    es = jnp.minimum(es, 0.9 * p)
    return EPS * es / (p - (1.0 - EPS) * es)


def _dqsat_dt(t, p):
    return _qsat(t, p) * HLV / (461.50 * t * t)


def _mp_kernel(t_ref, qv_ref, ql_ref, qr_ref, qi_ref, p_ref, delp_ref,
               t_out, qv_out, ql_out, qr_out, qi_out, precip_out, *, dt):
    t = t_ref[:]
    qv = qv_ref[:]
    ql = ql_ref[:]
    qr = qr_ref[:]
    qi = qi_ref[:]
    p = p_ref[:]
    delp = delp_ref[:]

    rho = p / (RDGAS * jnp.maximum(t, 150.0))
    dz = delp / (rho * GRAV)

    # 1. saturation adjustment (2 Newton steps)
    for _ in range(2):
        qs0 = _qsat(t, p)
        dq = (qv - qs0) / (1.0 + (HLV / CP_AIR) * _dqsat_dt(t, p))
        cond = jnp.where(dq > 0, dq, jnp.maximum(dq, -ql))
        qv = qv - cond
        ql = ql + cond
        t = t + HLV / CP_AIR * cond

    # 2. freezing / melting
    tc = t - T_ICE
    frz_hom = jnp.where(tc < -40.0, ql, 0.0)
    bigg = ql * (1.0 - jnp.exp(
        -dt * 1.0e-4 * (jnp.exp(0.66 * jnp.maximum(-tc, 0.0)) - 1.0)))
    frz = jnp.minimum(ql, jnp.where((tc < 0.0) & (tc >= -40.0), bigg, 0.0)
                      + frz_hom)
    melt = jnp.where(tc > 0.0,
                     jnp.minimum(qi, CP_AIR * jnp.maximum(tc, 0.0) / HLF),
                     0.0)
    ql = ql - frz + melt
    qi = qi + frz - melt
    t = t + (HLF / CP_AIR) * (frz - melt)

    # 3. WBF deposition / ice sublimation
    qs_i = _qsat_ice(t, p)
    gam_i = 1.0 + (HLS / CP_AIR) * _dqsat_dt(t, p)
    ice_presence = 1.0 - jnp.exp(-qi / 1.0e-6)
    dep = jnp.where(tc < 0.0,
                    jnp.maximum(qv - qs_i, 0.0) / gam_i * ice_presence
                    * (1.0 - jnp.exp(-dt / TAU_WBF)), 0.0)
    sub = jnp.minimum(qi, jnp.maximum(qs_i - qv, 0.0) / gam_i
                      * (1.0 - jnp.exp(-dt / TAU_WBF)))
    qv = qv - dep + sub
    qi = qi + dep - sub
    t = t + (HLS / CP_AIR) * (dep - sub)

    # 4. warm rain
    auto = jnp.maximum(ql - QL_CRIT, 0.0) * (1.0 - jnp.exp(-dt / TAU_AUTO))
    acc = ql * (1.0 - jnp.exp(
        -dt * C_ACC * jnp.maximum(rho * qr, 0.0) ** 0.875))
    to_rain = jnp.minimum(ql, auto + acc)
    ql = ql - to_rain
    qr = qr + to_rain

    # 5. sedimentation: implicit upstream, the K recurrence unrolled as
    # static single-lane updates (K is the lane dim; all indices static)
    def sediment(q, vt):
        c = vt * dt / jnp.maximum(dz, 1.0)
        K = q.shape[-1]
        cols = []
        in_flux = jnp.zeros_like(q[:, :1])
        for k in range(K):
            qk = (q[:, k:k + 1] * delp[:, k:k + 1] + in_flux) \
                / (1.0 + c[:, k:k + 1])
            in_flux = qk * c[:, k:k + 1]
            cols.append(qk / delp[:, k:k + 1])
        return jnp.concatenate(cols, axis=1), in_flux

    vt_r = jnp.clip(36.34 * jnp.maximum(rho * qr, 0.0) ** 0.2
                    * jnp.sqrt(RHO0 / rho), 0.0, VT_RAIN_MAX)
    qr, rain_out = sediment(qr, vt_r)
    vt_i = jnp.clip(3.29 * jnp.maximum(rho * qi, 0.0) ** 0.16,
                    0.0, VT_ICE_MAX)
    qi, ice_out = sediment(qi, vt_i)
    precip_out[:] = (rain_out + ice_out) / GRAV

    # 6. rain evaporation
    qs1 = _qsat(t, p)
    gam_l = 1.0 + (HLV / CP_AIR) * _dqsat_dt(t, p)
    subsat = jnp.maximum(qs1 - qv, 0.0)
    vent = 1.0 - jnp.exp(
        -dt * C_REVP * jnp.maximum(rho * qr, 0.0) ** 0.525)
    evap = jnp.minimum(qr, subsat / gam_l * vent)
    qr = qr - evap
    qv = qv + evap
    t = t - HLV / CP_AIR * evap

    t_out[:] = t
    qv_out[:] = qv
    ql_out[:] = ql
    qr_out[:] = qr
    qi_out[:] = qi


@functools.partial(jax.jit, static_argnames=("dt", "interpret"))
def gfdl_microphysics_pallas(t, qv, ql, qr, qi, p, delp, dt,
                             interpret: bool = False):
    """Inputs [..., K] (any leading shape); returns the MicrophysicsOut
    tuple fields (t', qv', ql', qr', qi', precip)."""
    lead = t.shape[:-1]
    K = t.shape[-1]
    ncol = 1
    for s in lead:
        ncol *= s
    flat = lambda a: a.reshape(ncol, K)
    # pad columns to a block multiple
    nblk = pl.cdiv(ncol, BLOCK_COLS)
    pad = nblk * BLOCK_COLS - ncol

    def prep(a):
        a = flat(a)
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad, K))], axis=0)
        return a

    args = [prep(a) for a in (t, qv, ql, qr, qi, p, delp)]

    spec = pl.BlockSpec((BLOCK_COLS, K), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_specs = [spec] * 5 + [
        pl.BlockSpec((BLOCK_COLS, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)]
    outs = pl.pallas_call(
        functools.partial(_mp_kernel, dt=float(dt)),
        name="gfdl_microphysics",
        grid=(nblk,),
        in_specs=[spec] * 7,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((nblk * BLOCK_COLS, K), jnp.float32)] * 5
        + [jax.ShapeDtypeStruct((nblk * BLOCK_COLS, 1), jnp.float32)],
        interpret=interpret,
    )(*args)

    def unflat(a, scalar=False):
        a = a[:ncol]
        return a.reshape(lead) if scalar else a.reshape(lead + (K,))

    t2, qv2, ql2, qr2, qi2 = (unflat(o) for o in outs[:5])
    precip = unflat(outs[5][:, 0], scalar=True)
    return t2, qv2, ql2, qr2, qi2, precip
