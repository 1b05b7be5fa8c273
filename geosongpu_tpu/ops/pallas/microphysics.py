"""Pallas TPU kernel: fused GFDL-lite microphysics column update.

The jnp reference implementation (physics/standalone.py:gfdl_microphysics)
is ~50 elementwise ops + a vertical sedimentation shift; XLA fuses it into
a few passes over HBM.  This kernel fuses the *entire* chain into one HBM
read + one write per field: a grid over column blocks, each block's
[BLOCK_COLS, K] panes resident in VMEM, all arithmetic on the VPU, and the
sedimentation shift done in-register (K is the lane dimension).

Validation mirrors the reference's dual-build gate
(/root/reference/src/tcn/ci/pipeline/physics_standalone.py:132-144): the
pallas and jnp paths must agree within 0.01% (tests + the
GFDLMicrophysicsPallas task).  On non-TPU backends the kernel runs in
interpreter mode.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...physics.thermo import (CP_AIR, EPS, GRAV, HLS, HLV, RDGAS, T_ICE)

BLOCK_COLS = 256


def _qsat(t, p):
    tc = t - T_ICE
    es = 611.2 * jnp.exp(17.67 * tc / (tc + 243.5))
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

    # saturation adjustment (one Newton step)
    qs0 = _qsat(t, p)
    dq = (qv - qs0) / (1.0 + (HLV / CP_AIR) * _dqsat_dt(t, p))
    cond = jnp.where(dq > 0, dq, jnp.maximum(dq, -ql))
    qv = qv - cond
    ql = ql + cond
    t = t + HLV / CP_AIR * cond

    # freeze / melt
    freeze = jnp.where(t < T_ICE - 40.0, ql, 0.0)
    melt = jnp.where(t > T_ICE, qi, 0.0)
    ql = ql - freeze + melt
    qi = qi + freeze - melt
    t = t + (HLS - HLV) / CP_AIR * (freeze - melt)

    # warm rain
    auto = jnp.maximum(ql - 5.0e-4, 0.0) * (1.0 - jnp.exp(-dt / 1800.0))
    acc = ql * (1.0 - jnp.exp(-dt * 2.2 * jnp.maximum(qr, 0.0) ** 0.875))
    to_rain = jnp.minimum(ql, auto + acc)
    ql = ql - to_rain
    qr = qr + to_rain

    # sedimentation: shift the out-flux down one level (K is minor/lanes)
    rho = p / (RDGAS * jnp.maximum(t, 150.0))
    dz = delp / (rho * GRAV)
    cr = jnp.clip(5.0 * dt / jnp.maximum(dz, 1.0), 0.0, 1.0)
    out_flux = qr * cr * delp
    # in_flux[k] = out_flux[k-1]; implement as a lane shift via slicing
    zeros = jnp.zeros_like(out_flux[:, :1])
    in_flux = jnp.concatenate([zeros, out_flux[:, :-1]], axis=1)
    qr = qr + (in_flux - out_flux) / delp
    precip_out[:] = out_flux[:, -1:] / GRAV

    # rain evaporation
    qs1 = _qsat(t, p)
    subsat = jnp.maximum(qs1 - qv, 0.0)
    evap = jnp.minimum(qr, 0.5 * subsat * (1.0 - jnp.exp(-dt / 3600.0)))
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
