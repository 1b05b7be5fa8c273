"""Pallas TPU execution of the standalone physics column kernels.

The reference's physics gate builds THE SAME Fortran source twice (serial
and OpenACC) and requires 0.01% agreement
(/root/reference/src/tcn/ci/pipeline/physics_standalone.py:40-55,132-144).
The TPU analog of that dual build: the same column function executed
through two different compilers - jnp traced into XLA vs the body fused
into a Pallas/Mosaic kernel (whole chain in VMEM, one HBM pass).  This
module provides the generic wrapper; the flagship GFDL microphysics
additionally has a fully independent second implementation
(ops/pallas/microphysics.py), as does fill_q2_zero here (the jnp path
uses lax.scan, the kernel an unrolled static-lane recurrence).

All kernels are column-pure over [..., K] with K minor (lanes); blocks
are [BLOCK_COLS, K] panes.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_COLS = 256


def column_kernel_call(fn: Callable[[Dict], Dict], data: Dict[str, jax.Array],
                       interpret: bool = False) -> Dict[str, jax.Array]:
    """Run `fn({name: [ncol, K]}) -> {name: [ncol, K] or [ncol]}` as one
    fused Pallas kernel over column blocks."""
    names = sorted(data)
    ncol, K = data[names[0]].shape
    nblk = pl.cdiv(ncol, BLOCK_COLS)
    pad = nblk * BLOCK_COLS - ncol

    def prep(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0)
        return a

    args = [prep(jnp.asarray(data[k])) for k in names]
    out_shapes = jax.eval_shape(fn, dict(data))
    out_names = sorted(out_shapes)

    def kernel(*refs):
        ins = {k: r[:] for k, r in zip(names, refs[:len(names)])}
        outs = fn(ins)
        for k, r in zip(out_names, refs[len(names):]):
            o = outs[k]
            r[:] = o if o.ndim == 2 else o[:, None]

    def spec(shape):
        cols = shape[1] if len(shape) == 2 else 1
        return pl.BlockSpec((BLOCK_COLS, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[spec(a.shape) for a in args],
        out_specs=[spec(out_shapes[k].shape) for k in out_names],
        out_shape=[jax.ShapeDtypeStruct(
            (nblk * BLOCK_COLS,
             out_shapes[k].shape[1] if len(out_shapes[k].shape) == 2 else 1),
            jnp.float32) for k in out_names],
        interpret=interpret,
    )(*args)

    result = {}
    for k, o in zip(out_names, outs):
        o = o[:ncol]
        if len(out_shapes[k].shape) == 1:
            o = o[:, 0]
        result[k] = o
    return result


def _fillq_kernel(q_ref, delp_ref, out_ref):
    """Independent fill_q2_zero: the jnp reference runs a lax.scan
    (physics/standalone.py:fill_q2_zero); here the top-down borrowing
    recurrence is unrolled over the static K as single-lane updates."""
    q = q_ref[:]
    delp = delp_ref[:]
    K = q.shape[1]
    deficit = jnp.zeros_like(q[:, :1])
    cols = []
    for k in range(K):
        qk = q[:, k:k + 1] + deficit / delp[:, k:k + 1]
        deficit = jnp.minimum(qk, 0.0) * delp[:, k:k + 1]
        cols.append(jnp.maximum(qk, 0.0))
    out_ref[:] = jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fill_q2_zero_pallas(q, delp, interpret: bool = False):
    ncol, K = q.shape
    nblk = pl.cdiv(ncol, BLOCK_COLS)
    pad = nblk * BLOCK_COLS - ncol

    def prep(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad, K))], axis=0)
        return a

    spec = pl.BlockSpec((BLOCK_COLS, K), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fillq_kernel,
        grid=(nblk,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nblk * BLOCK_COLS, K), jnp.float32),
        interpret=interpret,
    )(prep(jnp.asarray(q)), prep(jnp.asarray(delp)))
    return out[:ncol]
