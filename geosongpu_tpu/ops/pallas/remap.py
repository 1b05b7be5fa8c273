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

from ..remap import remap_field_banded


def remap_field_banded_pallas(q: jnp.ndarray, pe1: jnp.ndarray,
                              pe2: jnp.ndarray, kord: int = 8,
                              band: int = 10, jt: Optional[int] = None,
                              interpret: Optional[bool] = None
                              ) -> jnp.ndarray:
    """remap_field_banded fused into one VMEM pass per (face, row-block).

    q [..., J, I, K]; pe1/pe2 [..., J, I, K+1].  Leading dims are
    flattened into the grid's face axis."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, J, I, K = q.shape
    F = 1
    for d in lead:
        F *= d
    q3 = q.reshape(F, J, I, K)
    p13 = pe1.reshape(F, J, I, K + 1)
    p23 = pe2.reshape(F, J, I, K + 1)
    if jt is None:
        # live (jt, I, 128-padded-K) f32 buffers must fit VMEM; measured
        # at c192-L72: ~36 live buffers through the banded chain (the 18-
        # buffer estimate overflowed scoped vmem by 12%), so budget
        # conservatively
        budget = 36 * 1024 * 1024
        per_row = I * max(K, 128) * 4 * 18
        jt = max(1, min(J, budget // per_row))
    while J % jt:
        jt -= 1

    def kernel(q_ref, pe1_ref, pe2_ref, out_ref):
        out_ref[:] = remap_field_banded(
            q_ref[:], pe1_ref[:], pe2_ref[:], kord, band=band)

    def spec(kk):
        return pl.BlockSpec((1, jt, I, kk), lambda f, j: (f, j, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        name="remap_banded",
        grid=(F, J // jt),
        in_specs=[spec(K), spec(K + 1), spec(K + 1)],
        out_specs=spec(K),
        out_shape=jax.ShapeDtypeStruct((F, J, I, K), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(q3, p13, p23)
    return out.reshape(*lead, J, I, K)
