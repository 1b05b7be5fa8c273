"""Typed configuration tree for the TPU dycore + experiments.

Replaces the reference's layered config sprawl - experiments.yaml + env-var
vault + dataclass presets rendered to shell `export` blocks + .rc/.nml file
swapping (/root/reference/src/tcn/ci/pipeline/gtfv3_config.py:6-32,
src/tcn/ci/pipeline/held_suarez.py:142-218) - with one serializable tree:
experiment -> model -> mesh -> run lengths (SURVEY.md SS5 "Config/flag
system" lesson).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class DycoreConfig:
    """Numerical configuration of the finite-volume dynamical core."""

    npx: int = 48           # cells per cube-face edge (c48 -> npx=48)
    npz: int = 32           # vertical layers
    ptop: float = 100.0     # model-top pressure [Pa]
    dt: float = 600.0       # physics/remap timestep [s]
    k_split: int = 1        # vertical remap loops per dt
    n_split: int = 6        # dynamics substeps per remap loop
    hord: int = 8           # tracer horizontal advection: 8=monotone PPM,
                            # 6=unlimited 4th-order
    hord_mt: int = 0        # momentum/vorticity-flux PPM variant; 0 =
                            # follow `hord`.  FV3 production runs hord_mt=6
                            # (unlimited - the limiter is pure VPU flops and
                            # momentum needs no monotonicity); gated by the
                            # stability suite + climatology smoke
    hord_tm: int = 0        # delp/pt/w/delz PPM variant; 0 = follow `hord`
    kord: int = 8           # vertical remap PPM variant (monotone)
    d2_bg: float = 0.015    # 2nd-order divergence damping coefficient
    vtx_damp: float = 0.0   # optional vorticity damping
    hydrostatic: bool = True
    ntracers: int = 1
    halo: int = 3
    z_tracer: bool = True   # advect tracers once per remap interval with
                            # accumulated mass fluxes (FV3 z_tracer); False
                            # sub-cycles tracers every acoustic substep
    q_split: int = 2        # tracer subcycles per remap interval (Courant
                            # control for the accumulated fluxes)
    pallas_microphysics: bool = False  # fused Pallas TPU kernel for the
                                       # GFDL-lite microphysics column chain
    pallas_dycore: bool = False  # run the d_sw substep chain as fused
                                 # Pallas kernels (dycore/sw_pallas.py);
                                 # same math, VMEM-fused scheduling
    pallas_kt: int = 0           # vertical tile for the dycore kernels
                                 # (0 = whole column per block)
    pallas_jt: int = 0           # J-row tile for the dycore kernels:
                                 # 0 = auto (whole face when it fits VMEM,
                                 # halo-overlapped row bands otherwise -
                                 # what lets c192-L72 run the fused path);
                                 # >0 = explicit rows per tile
    remap_band: int = 6   # banded vertical remap half-width in layers.
                          # Measured Lagrangian deformation (|omga| dt /
                          # delp) is ~0.01 layers through c48 spin-up and
                          # O(1) layer in mature storm-track eddies; the
                          # HeldSuarez check gates BOTH the measured
                          # deformation (< band/2) and banded-vs-full
                          # agreement on a coordinate displaced by
                          # band/2 layers, every run.
                          # On TPU this selects the fused Pallas kernel
                          # (ops/pallas/remap.py): exact while Lagrangian
                          # deformation stays within the band (gated every
                          # run in the HS task check), O(K*band) work.
                          # Off-TPU the full O(K^2) overlap form is used
                          # regardless (the jnp banded form materializes
                          # its shifted copies and is slower than full),
                          # so CPU goldens/tests are band-independent.
                          # 0 = full form everywhere.
    vertical: str = "hybrid"  # "sigma" | "hybrid"
    dtype: str = "float32"  # reference runs PACE_FLOAT_PRECISION=32
                            # (/root/reference/src/tcn/ci/pipeline/gtfv3_config.py:11)
    w_sponge_p: float = 0.0   # NH mode: Rayleigh-damp w where p < this
                              # [Pa] (model-top acoustic/gravity-wave
                              # sponge; 0 = off)
    w_sponge_tau: float = 3600.0  # sponge e-folding time [s]
    edge_symmetrize: bool = True  # average the two prognosed copies of
                                  # every shared face-edge staggered wind
                                  # after each step (kills shared-edge
                                  # rounding drift; exact-arithmetic
                                  # no-op)
    chart_corners: bool = True  # cube-corner chart consistency: corner
                                # L-regions of every fill resampled onto
                                # the analytically-extended chart
                                # (core/chart_corners.py) and the basis
                                # metrics evaluated there; fixes the
                                # corner-block chimera AND halves scalar
                                # halo fills (x-fill == y-fill after
                                # correction).  False = round-3 behavior.
    damping_exchange: str = "auto"  # damping-divergence formulation:
                             # "exchange" = owner-side normal fields +
                             # staggered chart resample (dual structure
                             # everywhere except the corner disks - full
                             # D-grid checkerboard control; costs one
                             # staggered exchange per substep);
                             # "blend" = in-kernel dual/cell blend over
                             # the edge bands (zero glue; the bands are
                             # checkerboard-blind, which at c12 covers
                             # most of the face and was measured to let
                             # grid-scale noise grow to NaN by ~day 50);
                             # "auto" = exchange for npx <= 96 (glue is
                             # cheap there and measured FASTER at c48),
                             # blend above.
    rim_split: bool = False  # split the c_sw stage into an interior
                             # core computed from LOCAL (un-exchanged)
                             # winds and rim bands from the exchanged
                             # fills: the D-grid wind ppermute then
                             # overlaps with the core compute instead of
                             # gating the whole substep (bit-identical
                             # stitch; requires overlap_fills so the
                             # scalar pads don't gate either).  SURVEY
                             # 7.3's halo/compute-overlap obligation for
                             # the wind exchange.
    overlap_fills: bool = False  # pipeline scalar halo exchanges across
                                 # acoustic substeps: substep i+1's
                                 # delp/pt/w/delz fills are issued right
                                 # after substep i's transport, dataflow-
                                 # independent of its wind update, so
                                 # XLA's latency-hiding scheduler overlaps
                                 # the ppermutes with compute (identical
                                 # numerics; used by the sharded paths)

    @property
    def grid_points(self) -> int:
        return 6 * self.npx * self.npx * self.npz


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout: how the cubed sphere maps onto TPU chips.

    The reference's analog is the MPI layout matrix (1x1/3x4/4x4 per face;
    /root/reference/src/tcn/ci/README.md:7-12).  Axes:
      face: 1 or 6   - shard the 6 faces
      x, y: subtile decomposition within a face
    Total devices = face * x * y.
    """

    face: int = 1
    x: int = 1
    y: int = 1

    @property
    def n_devices(self) -> int:
        return self.face * self.x * self.y


@dataclass(frozen=True)
class RunConfig:
    steps: int = 8
    warmup_steps: int = 1
    checkpoint_every: int = 0   # 0 = off
    log_every: int = 0


@dataclass(frozen=True)
class ExperimentConfig:
    name: str = "held_suarez_c48"
    model: str = "held_suarez"  # "held_suarez" | "aquaplanet"
    dycore: DycoreConfig = field(default_factory=DycoreConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    run: RunConfig = field(default_factory=RunConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "ExperimentConfig":
        d = dict(d)
        for key, sub in (("dycore", DycoreConfig), ("mesh", MeshConfig), ("run", RunConfig)):
            if key in d and isinstance(d[key], dict):
                d[key] = sub(**d[key])
        return cls(**d)
