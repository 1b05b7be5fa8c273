"""Fused Pallas kernel for the banded vertical remap.

The full overlap-form remap (ops/remap.py remap_field) is O(K^2)
elementwise VPU work - measured ~10 ms of the c48-L72 step.  The banded
form is O(K * band) but in jnp/XLA its 2*band+1 shifted copies
materialize in HBM and LOSE to the fused O(K^2) form (measured 32->41 ms
step regression).  In Pallas the shifted copies live in VMEM/registers,
so the flop reduction is realized.

The remap is column-local, so blocks tile the J axis freely (no halo):
grid = (6 faces, n/jt rows); everything else is elementwise along lanes
(K).  Numerics are the SAME code path as ops/remap.remap_field_banded
(shared body), gated against the full form in tests/test_remap.py and in
the HeldSuarez task check().
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..remap import remap_fields_banded


def remap_multi_banded_pallas(qs, pe1: jnp.ndarray, pe2: jnp.ndarray,
                              kord: int = 8, band: int = 10,
                              jt: Optional[int] = None,
                              interpret: Optional[bool] = None):
    """remap_fields_banded fused into one VMEM pass per (face, row-block):
    N fields sharing one (pe1, pe2) pair remap through one kernel, with
    the overlap geometry computed once (it is about half the per-field
    work - see ops/remap.remap_fields_banded).

    qs: list of [..., J, I, K]; pe1/pe2 [..., J, I, K+1].  Leading dims
    are flattened into the grid's face axis.  Returns a list."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, J, I, K = qs[0].shape
    F = 1
    for d in lead:
        F *= d
    n = len(qs)
    q3s = [q.reshape(F, J, I, K) for q in qs]
    p13 = pe1.reshape(F, J, I, K + 1)
    p23 = pe2.reshape(F, J, I, K + 1)
    if jt is None:
        # live (jt, I, 128-padded-K) f32 buffers must fit VMEM; measured
        # at c192-L72: ~36 live buffers through the banded chain (the 18-
        # buffer estimate overflowed scoped vmem by 12%), so budget
        # conservatively; each extra field adds ~8 live buffers
        budget = 36 * 1024 * 1024
        per_row = I * max(K, 128) * 4 * (10 + 8 * n)
        jt = max(1, min(J, budget // per_row))
    while J % jt:
        jt -= 1

    def kernel(*refs):
        q_refs = refs[:n]
        pe1_ref, pe2_ref = refs[n], refs[n + 1]
        outs = remap_fields_banded([r[:] for r in q_refs],
                                   pe1_ref[:], pe2_ref[:], kord, band=band)
        for r, o in zip(refs[n + 2:], outs):
            r[:] = o

    def spec(kk):
        return pl.BlockSpec((1, jt, I, kk), lambda f, j: (f, j, 0, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        name="remap_banded",
        grid=(F, J // jt),
        in_specs=[spec(K)] * n + [spec(K + 1), spec(K + 1)],
        out_specs=[spec(K)] * n,
        out_shape=[jax.ShapeDtypeStruct((F, J, I, K), jnp.float32)] * n,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(*q3s, p13, p23)
    return [o.reshape(*lead, J, I, K) for o in outs]


def remap_field_banded_pallas(q: jnp.ndarray, pe1: jnp.ndarray,
                              pe2: jnp.ndarray, kord: int = 8,
                              band: int = 10, jt: Optional[int] = None,
                              interpret: Optional[bool] = None
                              ) -> jnp.ndarray:
    """Single-field form of remap_multi_banded_pallas."""
    return remap_multi_banded_pallas([q], pe1, pe2, kord, band, jt,
                                     interpret)[0]
