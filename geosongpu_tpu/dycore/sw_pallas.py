"""Pallas TPU execution of the d_sw acoustic substep chain.

The jnp dycore (dycore/sw.py) is correct but XLA materializes dozens of
stencil intermediates per substep in HBM (measured at c48-L72: one jnp
fvtp2d costs ~0.84 ms vs ~0.03 ms for the same math fused in VMEM).  This
module runs the three horizontal phases of the substep - c_sw, transport,
wind update - as fused Pallas kernels, one face per grid step, the whole
stencil chain living in VMEM.  It is the fused-backend role of the
reference's DSL dycore (GTFV3_BACKEND=dace:gpu,
/root/reference/src/tcn/ci/pipeline/gtfv3_config.py:13), designed
TPU-first rather than translated.

Design rules:

* Kernel bodies ARE the sw.py functions (c_sw_part1/2, transport_part,
  wind_part) called on size-1-face blocks - zero numerical divergence by
  construction; the pallas-vs-jnp agreement gate in
  tests/test_pallas_dycore.py enforces the reference's dual-build 0.01%
  contract (physics_standalone.py:132-144) on the whole dycore.
* Blocks are (1, J, I, kt): face axis size 1, vertical tiled by `kt`.
  Every kernel is purely horizontal - the vertically-coupled pieces
  (hydrostatic integrals, NH tridiagonal solve) run between kernels as
  plain XLA (single fused cumsum/scan passes).
* y-stencils slice the untiled J axis (free reindexing), x-stencils are
  sublane shifts, K columns ride the lanes untouched.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..parallel.halo import HaloOps
from .sw import (PaddedMetrics, SWState, SubstepOut, _hydrostatic_fields,
                 c_sw_part1, c_sw_part2, nh_perturbation_fields,
                 transport_part, wind_part)

_METRIC_FIELDS = tuple(PaddedMetrics._fields)


def _cumsum_hs(v, reverse: bool = False):
    """Hillis-Steele prefix sum along the LANE (K) axis: log2(K) shifted
    adds on the VPU.  Inside Mosaic this beats the triangular-matmul form
    (ops/vertical.py) - the MXU dot on a [rows, 72]x[72, 72] problem per
    J-window measured ~60% slower than 7 lane-shift adds.  Summation
    order differs from the matmul by f32 rounding only (~1e-7 relative);
    the pallas-vs-jnp dycore gate (1e-4) covers it."""
    K = v.shape[-1]
    pad0 = ((0, 0),) * (v.ndim - 1)
    d = 1
    while d < K:
        if reverse:
            v = v + jnp.pad(v, pad0 + ((0, d),))[..., d:]
        else:
            v = v + jnp.pad(v, pad0 + ((d, 0),))[..., :K]
        d *= 2
    return v


def _hydro_fields_kernel(delp, pt, ptop):
    """In-kernel twin of sw._hydrostatic_fields: HS lane cumsum + pk via
    exp(kappa * (peln - ln P00)) so the pow's internal log is shared with
    the peln the pkz formula needs anyway (2 transcendentals, not 3)."""
    from .sw import CP_AIR, KAPPA, P00

    pad0 = ((0, 0),) * (delp.ndim - 1)
    pe = ptop + jnp.pad(_cumsum_hs(delp), pad0 + ((1, 0),))
    peln = jnp.log(pe)
    pk_iface = jnp.exp(KAPPA * (peln - float(np.log(P00))))
    dpk = pk_iface[..., 1:] - pk_iface[..., :-1]
    pkz = dpk / (KAPPA * (peln[..., 1:] - peln[..., :-1]))
    dphi = CP_AIR * pt * dpk
    phi_below_incl = _cumsum_hs(dphi, reverse=True)
    return pkz, phi_below_incl - 0.5 * dphi


def _nh_pert_kernel(delp_new, pt_new, delz_new, ptop):
    """In-kernel twin of sw.nh_perturbation_fields (same cumsum/transc.
    treatment as _hydro_fields_kernel)."""
    from .sw import GRAV, KAPPA, P00, RDGAS

    pad0 = ((0, 0),) * (delp_new.ndim - 1)
    pe1 = ptop + jnp.pad(_cumsum_hs(delp_new), pad0 + ((1, 0),))
    peln1 = jnp.log(pe1)
    pk1 = jnp.exp(KAPPA * (peln1 - float(np.log(P00))))
    pkz1 = (pk1[..., 1:] - pk1[..., :-1]) / (
        KAPPA * (peln1[..., 1:] - peln1[..., :-1]))
    p_mid1 = 0.5 * (pe1[..., 1:] + pe1[..., :-1])
    t1 = pt_new * pkz1
    rho1 = delp_new / (GRAV * jnp.maximum(delz_new, 1.0))
    pprime = rho1 * RDGAS * t1 - p_mid1
    dphi_diff = GRAV * delz_new - RDGAS * t1 * delp_new / p_mid1
    phip_incl = _cumsum_hs(dphi_diff, reverse=True)
    phiprime = phip_incl - 0.5 * dphi_diff
    return pprime, phiprime, rho1


# overlap rows per J-tile: covers the deepest per-kernel stencil reach
# (the whole substep chain fits in halo h=3; +1 guards the row-edge
# replication helpers).  Tile boundaries at the true array edges keep the
# edge treatment aligned, so valid output bands are bit-identical to the
# whole-face kernel (asserted in tests/test_pallas_dycore.py).
_JTILE_OVERLAP = 4


def _auto_jt(Ny: int, Nx: int, K: int, kt) -> int:
    """Seed J-tile height: whole-face (0) when a face fits VMEM, else a
    conservative band calibrated against the c192 vmem dumps (the worst
    kernel costs ~48 lane-padded row-panes per input row).  The element-
    window path re-sizes per kernel from its own window count."""
    lanes = ((kt or K) + 127) // 128 * 128
    per_row = 48 * (Nx + 2) * lanes * 4
    rows = (104 * 1024 * 1024) // per_row
    return 0 if rows >= Ny else max(12, int(rows) - 2 * _JTILE_OVERLAP)


def _face_call_jtiled(body, args, out_shapes, kt, interpret, jt,
                      name=None):
    """J-tile a whole-face kernel: run `body` on overlapping row bands
    [s-R, e+R) and keep each tile's valid band [s, e).  This is what lets
    the fused substep kernels run c192-L72: a whole-face VMEM block set
    (~18 live fields x 11 MB) overflows VMEM, a 3-row-halo'd band does
    not.  Staggered (rows N+1) arrays ride along with one extra row; the
    last tile absorbs it."""
    n_c = min(a.shape[1] for a in args)   # center (N) row count
    outs = [[] for _ in out_shapes]
    R = _JTILE_OVERLAP
    s = 0
    while s < n_c:
        e = min(n_c, s + jt)
        a0, b0 = max(0, s - R), min(n_c, e + R)
        targs = [a[:, a0:b0 + (a.shape[1] - n_c)] for a in args]
        tshapes = [(sh[0], b0 - a0 + (sh[1] - n_c)) + tuple(sh[2:])
                   for sh in out_shapes]
        touts = _face_call(body, targs, tshapes, kt, interpret, jt=0,
                           name=name)
        for i, (o, sh) in enumerate(zip(touts, out_shapes)):
            e_i = e + (sh[1] - n_c) if e == n_c else e
            outs[i].append(o[:, s - a0:e_i - a0])
        s = e
    return tuple(jnp.concatenate(ol, axis=1) for ol in outs)


def _face_call_element(body, args, out_shapes, kt, jt, name=None):
    """J-tile with OVERLAPPING Element-indexed windows inside one
    pallas_call: grid (F, T), every input windowed to jt + 2R rows at
    element start clip(t*jt - R, 0, n_c - W) (window edges coincide with
    array edges at the boundary tiles, so the in-kernel edge treatment
    stays exact); outputs are jt-row element blocks at
    min(t*jt, n_c - jt) - later tiles overwrite any overlap with rows
    that are valid there (the TPU grid is sequential).  The kernel
    routes each output through a VMEM scratch and selects its valid band
    with a dynamic pl.ds row offset (Mosaic rules: value-level
    dynamic_slice does not lower; ref-level dynamic indexing on untiled
    dims does; a spec must be all-Element or all-Blocked; and the last
    two block dims must divide (8, 128) or equal the array dims).

    That last rule is why the [*, 1] metric fields are PACKED into one
    [F, N+1, N+1, nm] array (one 128-lane padding for all of them, the
    round-3 VMEM lesson) instead of riding as lane-squeezed 3-D blocks
    whose J window would be an illegal sublane block size.  Replaces the
    per-tile Python loop for compiled kernels - the loop materializes
    ~40 sliced operands per tile per kernel, measured as a ~10k-small-op
    storm costing >100 ms/step at c192."""
    from jax._src.pallas.core import Element

    R = _JTILE_OVERLAP
    n_c = min(a.shape[1] for a in args)
    K = max(a.shape[-1] for a in args)
    if jt + 2 * R >= n_c or (kt and kt != K):
        return _face_call(body, args, out_shapes, kt, False, jt=0,
                          name=name)
    F = args[0].shape[0]
    n_out = len(out_shapes)

    # partition: K-fields ride as their own windows; everything else
    # (the [*, 1] metrics) packs into one trailing-dim array
    is_kfield = [a.ndim == 4 and a.shape[-1] == K for a in args]
    kargs_all = [a for a, isk in zip(args, is_kfield) if isk]
    mets = [a for a, isk in zip(args, is_kfield) if not isk]
    # identity-dedup the K-field windows: chart mode passes ONE corrected
    # fill as both the x- and y-order operand (sw.fill_substep) - a
    # single DMA'd window serves both positions (less HBM traffic AND
    # less VMEM, which feeds straight into a taller J-tile below)
    kargs, kpos = [], []
    for a in kargs_all:
        for i, u in enumerate(kargs):
            if a is u:
                kpos.append(i)
                break
        else:
            kpos.append(len(kargs))
            kargs.append(a)

    # per-kernel J-tile height: the caller's jt is calibrated for the
    # heaviest kernel (transport); kernels with fewer unique windows
    # afford taller tiles, shrinking the (jt+2R)/jt overlap re-read.
    # Pane model: ~2 VMEM panes per window per row (double-buffered DMA)
    # + ~24 panes of body temporaries, each (Im+2) x 128-padded-lanes.
    lanes = (K + 127) // 128 * 128
    im_all = max(a.shape[2] for a in args)
    n_win = len(kargs) + (1 if mets else 0) + n_out
    per_row = (2 * n_win + 24) * (im_all + 2) * lanes * 4
    rows = (100 * 1024 * 1024) // per_row
    jt = min(max(jt, int(rows) - 2 * R), n_c - 2 * R)
    Wc = jt + 2 * R
    T = -(-n_c // jt)
    met_shapes = [m.shape for m in mets]
    Jm, Im = n_c + 1, max(s[2] for s in met_shapes) if met_shapes else 0
    if mets:
        assert all(s[1] in (n_c, n_c + 1) and s[3] == 1
                   for s in met_shapes), met_shapes
        packed = jnp.concatenate(
            [jnp.pad(m[..., 0], ((0, 0), (0, Jm - m.shape[1]),
                                 (0, Im - m.shape[2])))[..., None]
             for m in mets], axis=-1)          # [F, Jm, Im, nm]
        nm = packed.shape[-1]

    def start_in(t):
        return jnp.clip(t * jt - R, 0, n_c - Wc)

    def start_out(t):
        return jnp.minimum(t * jt, n_c - jt)

    def espec(shape_rows, cols, lanes, start_fn):
        return pl.BlockSpec(
            (Element(1), Element(shape_rows), Element(cols),
             Element(lanes)),
            lambda f, t: (f, start_fn(t), 0, 0),
            memory_space=pltpu.VMEM)

    in_specs = [espec(Wc + (a.shape[1] - n_c), a.shape[2], K, start_in)
                for a in kargs]
    if mets:
        in_specs.append(espec(Wc + 1, Im, nm, start_in))
    out_exts = [sh[1] - n_c for sh in out_shapes]
    out_specs = [espec(jt + ex, sh[2], K, start_out)
                 for sh, ex in zip(out_shapes, out_exts)]

    def kernel(*refs):
        t = pl.program_id(1)
        s_loc = start_out(t) - start_in(t)
        n_k = len(kargs)
        kviews = [refs[i][:] for i in range(n_k)]
        mviews = []
        if mets:
            pwin = refs[n_k][:]                # [1, Wc+1, Im, nm]
            for i, s in enumerate(met_shapes):
                rows = Wc + (s[1] - n_c)
                mviews.append(pwin[:, :rows, :s[2], i:i + 1])
        ins = []
        ki = mi = 0
        for isk in is_kfield:
            if isk:
                ins.append(kviews[kpos[ki]]); ki += 1
            else:
                ins.append(mviews[mi]); mi += 1
        outs = body(*ins)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        off = n_k + (1 if mets else 0)
        scrs = refs[off + n_out:]
        for r, o, scr, ex in zip(refs[off:off + n_out], outs, scrs,
                                 out_exts):
            scr[:] = o
            r[:] = scr[:, pl.ds(s_loc, jt + ex)]

    scratch = [pltpu.VMEM((1, Wc + ex, sh[2], K), jnp.float32)
               for sh, ex in zip(out_shapes, out_exts)]
    call_args = list(kargs) + ([packed] if mets else [])
    vma = frozenset().union(*(jax.typeof(a).vma for a in args))
    return pl.pallas_call(
        kernel,
        name=name or "face_kernel",
        grid=(F, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32, vma=vma)
                   for s in out_shapes],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(*call_args)


def _face_call(body, args, out_shapes, kt: Optional[int], interpret: bool,
               jt: Optional[int] = None, name: Optional[str] = None):
    """pallas_call over grid (faces, K/kt).

    args: list of [F, J, I, Kx] arrays (Kx == K, tiled; Kx == 1 or a
    non-K trailing dim < kt: replicated per K-tile).  F is the local face
    (slot) count: 6 single-device / faces-local sharding, 1 inside a
    face-sharded shard_map block.  Static parameters must already be
    closed over in `body`, which receives jnp views (with the size-1 face
    axis kept) and returns a tuple matching out_shapes.
    jt: J-tile row count (halo-overlapped bands); None/0 = whole face.

    Compiled J-tiling uses overlapping Element-indexed windows in ONE
    pallas_call (grid axis over tiles); the interpreter path falls back
    to the per-tile Python loop (Element indexing is a Mosaic feature).
    The loop variant materializes ~40 sliced operands per tile per
    kernel - measured as a ~10k-small-op storm costing >100 ms/step at
    c192."""
    if jt and jt < min(a.shape[1] for a in args):
        if not interpret:
            return _face_call_element(body, args, out_shapes, kt, jt,
                                      name=name)
        return _face_call_jtiled(body, args, out_shapes, kt, interpret, jt,
                                 name=name)
    F = args[0].shape[0]
    K = max(a.shape[-1] for a in args)
    kt = kt or K

    # identity-dedup: chart mode passes one corrected fill as both the
    # x- and y-order operand; a single block serves both positions
    uniq, pos = [], []
    for a in args:
        for i, u in enumerate(uniq):
            if a is u:
                pos.append(i)
                break
        else:
            pos.append(len(uniq))
            uniq.append(a)

    # [*, 1]-trailing (metric) inputs: a 4-D window would pad the size-1
    # lane dim to 128 - measured at c192: every 2-D metric window then
    # costs as much as a full K-field window (5.5 MB x 16 metrics blew
    # VMEM).  Squeeze them to 3-D blocks (lanes = I) and re-expand inside
    # the kernel.
    squeezed = [a.ndim == 4 and a.shape[-1] == 1 and K != 1 for a in uniq]
    uargs = [a[..., 0] if sq else a for a, sq in zip(uniq, squeezed)]
    n_u = len(uargs)

    def spec(shape):
        if len(shape) == 4 and shape[-1] == K and K != 1:
            return pl.BlockSpec(
                (1, shape[1], shape[2], kt),
                lambda f, k: (f, 0, 0, k), memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (1,) + tuple(shape[1:]),
            lambda f, k: (f,) + (0,) * (len(shape) - 1),
            memory_space=pltpu.VMEM)

    def kernel(*refs):
        uviews = [r[:][..., None] if sq else r[:]
                  for r, sq in zip(refs[:n_u], squeezed)]
        ins = [uviews[p] for p in pos]
        outs = body(*ins)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        for r, o in zip(refs[n_u:], outs):
            r[:] = o

    # inside shard_map the outputs vary over the same mesh axes as the
    # inputs (per-device blocks); propagate the vma so check_vma passes
    vma = frozenset().union(*(jax.typeof(a).vma for a in uargs))
    return pl.pallas_call(
        kernel,
        name=name or "face_kernel",
        grid=(F, K // kt),
        in_specs=[spec(a.shape) for a in uargs],
        out_specs=[spec(s) for s in out_shapes],
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32, vma=vma)
                   for s in out_shapes],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(*uargs)


def tracer_interval_advect_pallas(qxs, qys, pd_x, uacc, vacc, dt,
                                  mfx, mfy, m: PaddedMetrics, hord: int,
                                  interpret=None, kt=None):
    """One z_tracer subcycle (fv_dynamics._advect_tracers_accumulated):
    interval delp update + per-tracer fvtp2d with the accumulated
    Courant/area/mass fluxes, fused as face kernels.  The XLA form
    materializes the full PPM stencil chain per tracer in HBM - measured
    ~12 ms/step at c192-L72 for one tracer.

    uacc/vacc are the per-subcycle accumulated advective winds; the
    Courant / area-flux factors are rebuilt in-VMEM from the static
    metrics (two windows instead of four - same trick as the substep
    kernels).

    Returns (delp_new_padded, [q_new_padded per tracer]); the caller
    slices interiors."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    F, Ny, _, K = pd_x.shape
    Nx = pd_x.shape[2]
    jt = _auto_jt(Ny, Nx, K, kt)

    def kq(qx, qy, pdx, ua_, va_, mfx_, mfy_, *mets):
        from ..ops.fvtp2d import ddx, ddy, fvtp2d
        mm = _metrics_from(mets)
        crx_ = ua_ * dt * mm.rdxc
        cry_ = va_ * dt * mm.rdyc
        xfx_ = ua_ * dt * mm.dy
        yfx_ = va_ * dt * mm.dx
        delp_new = pdx + (ddx(mfx_) + ddy(mfy_)) * mm.rarea
        qf = fvtp2d(qx, qy, crx_, cry_, xfx_, yfx_, mm.area, hord=hord,
                    mfx=mfx_, mfy=mfy_)
        qdp = qx * pdx + (ddx(qf.fx) + ddy(qf.fy)) * mm.rarea
        return delp_new, qdp / delp_new

    dnew = None
    q_new = []
    for qx, qy in zip(qxs, qys):
        dnew, qn = _face_call(
            kq, [qx, qy, pd_x, uacc, vacc, mfx, mfy]
            + _metrics_args(m),
            [(F, Ny, Nx, K), (F, Ny, Nx, K)], kt, interpret, jt=jt,
            name="dsw_tracer_acc")
        q_new.append(qn)
    return dnew, q_new


def _metrics_args(m: PaddedMetrics):
    return [getattr(m, f) for f in _METRIC_FIELDS]


def _metrics_from(views):
    return PaddedMetrics(*views)


def d_sw_substep_pallas(
    s: SWState,
    m: PaddedMetrics,
    ops: HaloOps,
    dt: float,
    ptop: float,
    hord: int = 8,
    d2_bg: float = 0.015,
    advect_tracers: bool = True,
    hord_mt: int = 0,
    hord_tm: int = 0,
    kt: Optional[int] = None,
    jt: Optional[int] = None,
    interpret: Optional[bool] = None,
    chart=None,
    stag_tabs=None,
    vtx_damp: float = 0.0,
) -> SubstepOut:
    """Drop-in replacement for sw.d_sw_substep with the horizontal phases
    fused into Pallas kernels.  Bit-compatible math (same functions), with
    only fusion/scheduling differences; gated at 1e-4 relative in tests.

    jt=None: auto J-tiling - whole-face blocks when they fit VMEM, halo-
    overlapped row bands otherwise (c192-L72 and up).
    interpret=None: auto - compiled kernels on TPU, interpreter elsewhere
    (CPU tests / the virtual multi-chip mesh)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, ny, nx = ops.h, ops.ny, ops.nx
    islice = (slice(None), slice(h, h + ny), slice(h, h + nx))
    isliceu = (slice(None), slice(h, h + ny + 1), slice(h, h + nx))
    islicev = (slice(None), slice(h, h + ny), slice(h, h + nx + 1))
    F = s.pd_x.shape[0]   # 6 faces, or the local slot count under sharding
    Ny, Nx = ny + 2 * h, nx + 2 * h
    K = s.pd_x.shape[-1]
    nonhydro = s.pz_x is not None
    nm = len(_METRIC_FIELDS)
    if jt is None:
        jt = _auto_jt(Ny, Nx, K, kt)

    # ---- A-grid winds in the glue (XLA): averaging + halo basis/chart
    # machinery + the cube-corner chart reconstruction - kept OUTSIDE the
    # kernels so the corner patch contractions never meet J-tiling -------
    from .sw import a_grid_winds, damping_divergence

    ua, va = a_grid_winds(s.pu, s.pv, m)
    if chart is not None:
        ua, va = chart.apply_agrid(ua, va, s.pu, s.pv)

    # ---- kernel 1: c_sw part 1 (C winds, half-step mass/pt, ke, vort) ---
    def k1(pu, pv, uaa, vaa, pdx, pdy, ptx, pty, *mets):
        st = SWState(pu=pu, pv=pv, pd_x=pdx, pd_y=pdy, pt_x=ptx, pt_y=pty,
                     pq_x=None, pq_y=None)
        return c_sw_part1(st, _metrics_from(mets), 0.5 * dt, uaa, vaa)

    uc, vc, delp_h, pt_h, ke, vort = _face_call(
        k1,
        [s.pu, s.pv, ua, va, s.pd_x, s.pd_y, s.pt_x, s.pt_y]
        + _metrics_args(m),
        [(F, Ny, Nx + 1, K), (F, Ny + 1, Nx, K), (F, Ny, Nx, K),
         (F, Ny, Nx, K), (F, Ny, Nx, K), (F, Ny, Nx, K)],
        kt, interpret, jt=jt, name="dsw_csw1")
    if chart is not None:
        # one-sided corner resample of the center vorticity (its corner-
        # block circulation closes over two owners; see sw.c_sw)
        vort = chart.apply_scalar(vort, "derived")

    # ---- kernel 2: c_sw part 2 (time-centered advective winds) ----------
    # COMPILED whole-K kernels integrate the hydrostatic fields of the
    # half state INSIDE the kernel (cumsum-matmul on the MXU + pk/peln
    # transcendentals): K rides whole in the lanes of every J-tile,
    # columns are row-independent, and the XLA glue version cost two
    # extra full-array HBM round trips per substep (measured ~6 ms/
    # substep at c192).  The interpreter demotes the in-kernel dot
    # precision (measured 1e-5 relative on phi, amplified by the PGF),
    # and a K-tile never sees the whole column - both keep the glue form.
    fold_vertical = (not interpret) and (not kt or kt == K)

    def k2(*a):
        if fold_vertical:
            uc_, vc_, dh, pt_h_, ke_, vo = a[:6]
            mm = _metrics_from(a[6:])
            pkz, phi = _hydro_fields_kernel(dh, pt_h_, ptop)
            phi = phi + mm.phis   # terrain (zero for flat experiments)
        else:
            uc_, vc_, pt_h_, pkz, phi, ke_, vo = a[:7]
            mm = _metrics_from(a[7:])
        uct, vct = c_sw_part2(uc_, vc_, pt_h_, pkz, phi, ke_, vo, mm,
                              0.5 * dt)
        return uct, vct

    if fold_vertical:
        k2_in = [uc, vc, delp_h, pt_h, ke, vort]
    else:
        pkz_h, phi_h = _hydrostatic_fields(delp_h, pt_h, ptop)
        phi_h = phi_h + m.phis
        k2_in = [uc, vc, pt_h, pkz_h, phi_h, ke, vort]
    uct, vct = _face_call(
        k2, k2_in + _metrics_args(m),
        [(F, Ny, Nx + 1, K), (F, Ny + 1, Nx, K)],
        kt, interpret, jt=jt, name="dsw_csw2")

    # exchange-form damping divergence in the glue when selected
    # (npx <= 96; see DycoreConfig.damping_exchange) - rides into k4 as
    # one window.  Large grids use the in-kernel blend (zero glue).
    div_cg = damping_divergence(s.pu, s.pv, ua, va, uct, vct, m, ops,
                                stag_tabs) \
        if stag_tabs is not None else None
    use_divn = div_cg is not None

    # Courant / area-flux factors: NOT kernel outputs - the downstream
    # kernels (k3/k3b/k4) rebuild them in-VMEM from uct/vct with the
    # SAME expressions (bit-identical f32 mults), which drops four
    # full-array HBM writes + reads per substep.  The z_tracer
    # accumulation likewise carries uct/vct and multiplies the static
    # metric factors once per remap interval (see SubstepOut).
    def _courant(uct_, vct_, mm):
        return (uct_ * dt * mm.rdxc, vct_ * dt * mm.rdyc,
                uct_ * dt * mm.dy, vct_ * dt * mm.dx)

    # ---- kernel 3: all PPM transport ------------------------------------
    def k3(pdx, pdy, ptx, pty, uct_, vct_, *rest):
        if nonhydro:
            pwx, pwy, pzx, pzy = rest[:4]
            mets = rest[4:]
        else:
            pwx = pwy = pzx = pzy = None
            mets = rest
        mm = _metrics_from(mets)
        crx_, cry_, xfx_, yfx_ = _courant(uct_, vct_, mm)
        st = SWState(pu=None, pv=None,  # unused by transport_part
                     pd_x=pdx, pd_y=pdy, pt_x=ptx, pt_y=pty,
                     pq_x=None, pq_y=None,
                     pw_x=pwx, pw_y=pwy, pz_x=pzx, pz_y=pzy)
        delp_new, pt_new, w_adv, delz_adv, _q, mf = transport_part(
            st, mm, crx_, cry_, xfx_, yfx_, hord, False,
            hord_tm=hord_tm)
        outs = (delp_new, pt_new, mf.fx, mf.fy)
        if nonhydro:
            outs = outs + (w_adv, delz_adv)
        return outs

    t_in = [s.pd_x, s.pd_y, s.pt_x, s.pt_y, uct, vct]
    t_out = [(F, Ny, Nx, K), (F, Ny, Nx, K), (F, Ny, Nx + 1, K),
             (F, Ny + 1, Nx, K)]
    if nonhydro:
        t_in += [s.pw_x, s.pw_y, s.pz_x, s.pz_y]
        t_out += [(F, Ny, Nx, K), (F, Ny, Nx, K)]
    outs = _face_call(k3, t_in + _metrics_args(m), t_out, kt, interpret,
                      jt=jt, name="dsw_transport")
    delp_new, pt_new, mfx_pad, mfy_pad = outs[:4]
    w_adv, delz_adv = (outs[4], outs[5]) if nonhydro else (None, None)

    # ---- kernel 3b: tracers (per tracer, reusing the mass fluxes) -------
    if s.pq_x is not None and advect_tracers:
        def k3b(qx, qy, pdx, dnew, uct_, vct_, mfx, mfy, *mets):
            from ..ops.fvtp2d import ddx, ddy, fvtp2d
            mm = _metrics_from(mets)
            crx_, cry_, xfx_, yfx_ = _courant(uct_, vct_, mm)
            qf = fvtp2d(qx, qy, crx_, cry_, xfx_, yfx_, mm.area, hord=hord,
                        mfx=mfx, mfy=mfy)
            return (qx * pdx + (ddx(qf.fx) + ddy(qf.fy)) * mm.rarea) / dnew

        qs = []
        for t in range(s.pq_x.shape[-1]):
            (qt,) = _face_call(
                k3b,
                [s.pq_x[..., t], s.pq_y[..., t], s.pd_x, delp_new,
                 uct, vct, mfx_pad, mfy_pad] + _metrics_args(m),
                [(F, Ny, Nx, K)], kt, interpret, jt=jt, name="dsw_tracer")
            qs.append(qt)
        q_new = jnp.stack(qs, axis=-1)
    else:
        q_new = None

    # ---- re-fill transported halos before the backward PGF (the
    # transport stencil exhausts them; see sw.d_sw_substep) --------------
    def refill(a):
        out = ops.fill(a, "x")
        if chart is not None:
            out = chart.apply_scalar(out, "x")
        return out

    delp_f = refill(delp_new[islice])
    pt_f = refill(pt_new[islice])

    # ---- vertical glue: NH implicit solve + perturbation fields ---------
    if nonhydro:
        from .nh_solver import vertical_acoustic_solve

        zeros_if = jnp.zeros_like(w_adv[..., :1])
        w_if = jnp.concatenate(
            [zeros_if, 0.5 * (w_adv[..., :-1] + w_adv[..., 1:]), zeros_if],
            axis=-1)
        w_if, delz_new = vertical_acoustic_solve(
            w_if, delz_adv, pt_new, delp_new, dt, ptop)
        delz_new = jnp.maximum(delz_new, 1.0)
        w_new = 0.5 * (w_if[..., :-1] + w_if[..., 1:])
        delz_f = refill(delz_new[islice])
    else:
        w_new = delz_new = None

    # ---- kernel 4: D-grid wind update -----------------------------------
    # like k2, the compiled whole-K kernel integrates the backward-PGF
    # column fields (pkz/phi and the NH perturbations) INSIDE the kernel
    # from the refilled delp/pt(/delz)
    use_vort = chart is not None
    fold_k4 = fold_vertical

    def k4(pu, pv, uct, vct, *rest):
        if fold_k4:
            delp_fb, pt_fb = rest[:2]
            rest = rest[2:]
        else:
            pt_fb, pkz, phi = rest[:3]
            rest = rest[3:]
        if use_vort:
            vrt = rest[0]
            rest = rest[1:]
        else:
            vrt = None
        if use_divn:
            dn = rest[0]
            rest = rest[1:]
        else:
            dn = None
        if nonhydro:
            nh_in = rest[:1] if fold_k4 else tuple(rest[:3])
            mets = rest[(1 if fold_k4 else 3):]
        else:
            nh_in = None
            mets = rest
        mm = _metrics_from(mets)
        crx_, cry_ = uct * dt * mm.rdxc, vct * dt * mm.rdyc
        if fold_k4:
            pkz, phi = _hydro_fields_kernel(delp_fb, pt_fb, ptop)
            phi = phi + mm.phis
            nh = _nh_pert_kernel(delp_fb, pt_fb, nh_in[0], ptop) \
                if nonhydro else None
        else:
            nh = nh_in
        st = SWState(pu=pu, pv=pv, pd_x=None, pd_y=None, pt_x=None,
                     pt_y=None, pq_x=None, pq_y=None)
        return wind_part(st, mm, uct, vct, crx_, cry_,
                         pt_fb, pkz, phi, nh, dt, hord, d2_bg,
                         hord_mt=hord_mt, vort=vrt, div_c_in=dn,
                         vtx_damp=vtx_damp)

    if fold_k4:
        w_in = [s.pu, s.pv, uct, vct, delp_f, pt_f]
        if use_vort:
            w_in += [vort]
        if use_divn:
            w_in += [div_cg]
        if nonhydro:
            w_in += [delz_f]
    else:
        pkz, phi_mid = _hydrostatic_fields(delp_f, pt_f, ptop)
        phi_mid = phi_mid + m.phis
        w_in = [s.pu, s.pv, uct, vct, pt_f, pkz, phi_mid]
        if use_vort:
            w_in += [vort]
        if use_divn:
            w_in += [div_cg]
        if nonhydro:
            w_in += list(nh_perturbation_fields(delp_f, pt_f, delz_f,
                                                ptop))
    u_new, v_new = _face_call(
        k4, w_in + _metrics_args(m),
        [(F, Ny + 1, Nx, K), (F, Ny, Nx + 1, K)], kt, interpret, jt=jt,
        name="dsw_wind")

    return SubstepOut(
        u=u_new[isliceu],
        v=v_new[islicev],
        delp=delp_new[islice],
        pt=pt_new[islice],
        q=None if q_new is None else q_new[islice],
        w=None if w_new is None else w_new[islice],
        delz=None if delz_new is None else delz_new[islice],
        mfx=mfx_pad[:, h:h + ny, h:h + nx + 1],
        mfy=mfy_pad[:, h:h + ny + 1, h:h + nx],
        uc=uct[:, h:h + ny, h:h + nx + 1],
        vc=vct[:, h:h + ny + 1, h:h + nx],
        uct_pad=uct,
        vct_pad=vct,
        mfx_pad=mfx_pad,
        mfy_pad=mfy_pad,
        pd_fill=delp_f,
        pt_fill=pt_f,
        pz_fill=delz_f if nonhydro else None,
    )
