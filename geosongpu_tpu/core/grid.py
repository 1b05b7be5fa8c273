"""Equiangular gnomonic cubed-sphere geometry and metric terms.

Builds the static metric arrays the finite-volume solver needs, padded with
`h` halo cells of *true neighbor-face geometry* using the gather tables from
`topology.py` (the same trick FV3 uses: halo metric arrays carry the
neighbor's real dx/dy/area so stencils can run straight across face edges).

The reference repo never builds a grid itself - resolution/layout are pure
configuration handed to the external gtFV3 model (cf.
/root/reference/src/tcn/ci/data/experiments.yaml and
src/tcn/ci/pipeline/held_suarez.py:142-218).  The TPU framework owns the
solver, so it owns the geometry too.

Notes:
* Direction-dependent metric arrays (dx vs dy) swap under the halo gather
  when the neighbor face's axes are rotated relative to ours
  (HaloSpec.vec_swap).
* The four h x h halo corner blocks have no unique owner on a cubed sphere;
  they are filled with nearest-edge values and masked.  Stencils that need
  corner data use `fill_corners_*` from parallel/halo.py.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from .topology import NFACES, HaloSpec, halo_spec, face_point

RADIUS = 6.3712e6  # m, GFDL/GEOS Earth radius
OMEGA = 7.292e-5  # 1/s
GRAV = 9.80665
RDGAS = 287.04
CP_AIR = 1004.64
KAPPA = RDGAS / CP_AIR


def _local_coords(n: int, h: int = 0):
    """Equiangular coords: centers (n+2h) and interfaces (n+2h+1) incl. halo."""
    dxi = (np.pi / 2) / n
    c = (np.arange(-h, n + h) + 0.5) * dxi - np.pi / 4
    s = np.arange(-h, n + h + 1) * dxi - np.pi / 4
    return c, s


def _gc_dist(p, q):
    """Great-circle distance (radius 1) between unit vectors (broadcast)."""
    cross = np.linalg.norm(np.cross(p, q), axis=-1)
    dot = np.sum(p * q, axis=-1)
    return np.arctan2(cross, dot)


def _spherical_quad_area(p00, p10, p11, p01):
    """Area (radius 1) of a spherical quadrilateral via corner excess."""

    def corner_angle(a, b, c):
        # angle at b between arcs b->a and b->c
        ta = a - b * np.sum(a * b, axis=-1, keepdims=True)
        tc = c - b * np.sum(c * b, axis=-1, keepdims=True)
        ta /= np.linalg.norm(ta, axis=-1, keepdims=True)
        tc /= np.linalg.norm(tc, axis=-1, keepdims=True)
        return np.arccos(np.clip(np.sum(ta * tc, axis=-1), -1.0, 1.0))

    ang = (
        corner_angle(p01, p00, p10)
        + corner_angle(p00, p10, p11)
        + corner_angle(p10, p11, p01)
        + corner_angle(p11, p01, p00)
    )
    return ang - 2 * np.pi


@dataclass(frozen=True)
class Grid:
    """Static cubed-sphere metric data (numpy float32/float64 at build; the
    model converts to jnp on first use and closes over it under jit).

    Shapes use N = n + 2h (padded) unless noted; index order [face, j, i].
    """

    n: int
    h: int
    spec: HaloSpec
    # positions
    lat: np.ndarray  # [6, N, N] cell-center latitude (rad), halo-true
    lon: np.ndarray  # [6, N, N]
    # metrics (meters / m^2), halo-true except corner blocks
    area: np.ndarray  # [6, N, N] cell area
    rarea: np.ndarray  # 1/area
    dx: np.ndarray  # [6, N+1, N] length of cell edges along x (at S/N edges, j-interfaces)
    dy: np.ndarray  # [6, N, N+1] length of cell edges along y (at W/E edges, i-interfaces)
    dxc: np.ndarray  # [6, N, N+1] center-to-center distance across W/E interfaces
    dyc: np.ndarray  # [6, N+1, N] center-to-center distance across S/N interfaces
    fcor: np.ndarray  # [6, N, N] Coriolis parameter at centers
    fcor_c: np.ndarray  # [6, N+1, N+1] Coriolis at cell corners (for D-grid vorticity)
    corner_mask: np.ndarray  # [6, N, N] True on unownable halo corner blocks
    # grid non-orthogonality (the equiangular gnomonic axes are not
    # perpendicular away from face centers): cos of the angle between the
    # local xi/eta directions at the staggered flux points, halo-true
    # (cosa flips sign under odd frame maps: padded with sgn_t*sgn_n)
    cosa_i: np.ndarray  # [6, N, N+1] at x-interfaces (v-point locations)
    rsina_i: np.ndarray  # 1/sqrt(1-cosa_i^2)
    cosa_j: np.ndarray  # [6, N+1, N] at y-interfaces (u-point locations)
    rsina_j: np.ndarray
    cosa_c: np.ndarray   # [6, N, N] at cell centers (pseudo-scalar padded)
    rsin2_c: np.ndarray  # 1/sin^2 at centers
    cosa_cn: np.ndarray  # [6, N+1, N+1] at cell corners
    rsin2_cn: np.ndarray

    @property
    def interior(self):
        """Slice selecting the interior of a padded [.., N, N, ..] array."""
        h, n = self.h, self.n
        return (slice(None), slice(h, h + n), slice(h, h + n))


def _gather_padded(vals_ffi: np.ndarray, spec: HaloSpec) -> np.ndarray:
    """Gather an unpadded [6, n, n] per-cell array into padded [6, N, N]
    (corner blocks use the x-order table; metric fields are smooth enough
    that the x/y corner difference is immaterial for geometry)."""
    n = spec.n
    flat = vals_ffi.reshape(NFACES * n * n, *vals_ffi.shape[3:])
    return flat[spec.gidx_x]


def _gather_staggered(u_like: np.ndarray, v_like: np.ndarray, spec: HaloSpec):
    """Pad edge-located (staggered) positive scalars - e.g. edge lengths -
    using the D-grid tables *without* the sign: our halo x-edge may be the
    neighbor's y-edge, and the staggered tables encode exactly that."""
    flat = np.concatenate([u_like.reshape(-1), v_like.reshape(-1)])
    return flat[spec.u_idx], flat[spec.v_idx]


@functools.lru_cache(maxsize=8)
def build_grid(n: int, h: int = 3) -> Grid:
    spec = halo_spec(n, h)
    N = n + 2 * h
    c, s = _local_coords(n, 0)

    # --- per-face unpadded geometry -------------------------------------
    # corner positions [6, n+1, n+1, 3]
    corners = np.zeros((NFACES, n + 1, n + 1, 3))
    centers = np.zeros((NFACES, n, n, 3))
    for f in range(NFACES):
        SJ, SI = np.meshgrid(s, s, indexing="ij")
        corners[f] = face_point(f, SI, SJ)
        CJ, CI = np.meshgrid(c, c, indexing="ij")
        centers[f] = face_point(f, CI, CJ)

    area_c = _spherical_quad_area(
        corners[:, :-1, :-1],
        corners[:, :-1, 1:],
        corners[:, 1:, 1:],
        corners[:, 1:, :-1],
    ) * RADIUS**2
    # staggered edge lengths: x-directed edges at eta-interfaces (u-points,
    # [6, n+1, n]) and y-directed edges at xi-interfaces (v-points,
    # [6, n, n+1]) - padded exactly via the staggered halo tables
    dx_stag = _gc_dist(corners[:, :, :-1], corners[:, :, 1:]) * RADIUS
    dy_stag = _gc_dist(corners[:, :-1, :], corners[:, 1:, :]) * RADIUS

    # --- padded arrays ---------------------------------------------------
    pos_pad = _gather_padded(centers, spec)  # [6,N,N,3] true neighbor centers
    area_pad = _gather_padded(area_c, spec)
    dx_pad, dy_pad = _gather_staggered(dx_stag, dy_stag, spec)

    # center-to-center distances (computed from true positions; exact even
    # across face edges).  At the 8 cube corners the diagonal "fourth cell"
    # does not exist, so adjacent padded slots can hold the *same* physical
    # cell -> zero distance; clamp to half a cell so Courant numbers stay
    # finite (those interfaces carry no interior-reaching fluxes).
    cell = (np.pi / 2) / n * RADIUS
    dxc = np.zeros((NFACES, N, N + 1))
    dxc[:, :, 1:N] = _gc_dist(pos_pad[:, :, :-1], pos_pad[:, :, 1:]) * RADIUS
    dxc[:, :, 0] = dxc[:, :, 1]
    dxc[:, :, N] = dxc[:, :, N - 1]
    dxc = np.maximum(dxc, 0.5 * cell)
    dyc = np.zeros((NFACES, N + 1, N))
    dyc[:, 1:N, :] = _gc_dist(pos_pad[:, :-1, :], pos_pad[:, 1:, :]) * RADIUS
    dyc[:, 0, :] = dyc[:, 1, :]
    dyc[:, N, :] = dyc[:, N - 1, :]
    dyc = np.maximum(dyc, 0.5 * cell)

    lat = np.arcsin(np.clip(pos_pad[..., 2], -1.0, 1.0))
    lon = np.arctan2(pos_pad[..., 1], pos_pad[..., 0])
    fcor = 2 * OMEGA * pos_pad[..., 2]

    # --- non-orthogonality at the staggered flux points ------------------
    def _basis_cos(f, xi, eta):
        """cos(angle between local xi and eta directions) at (xi, eta)."""
        c_, a_, b_ = __import__(
            "geosongpu_tpu.core.topology", fromlist=["FACE_FRAMES"]
        ).FACE_FRAMES[f]
        t1 = np.tan(xi)[..., None]
        t2 = np.tan(eta)[..., None]
        p = c_ + t1 * a_ + t2 * b_
        nrm2 = np.sum(p * p, axis=-1, keepdims=True)
        # d/dxi of normalize(p): sec^2(xi) * (a - (a.p) p / |p|^2) / |p|
        sec1 = (1.0 + np.tan(xi) ** 2)[..., None]
        sec2 = (1.0 + np.tan(eta) ** 2)[..., None]
        e1 = sec1 * (a_ - np.sum(a_ * p, -1, keepdims=True) * p / nrm2)
        e2 = sec2 * (b_ - np.sum(b_ * p, -1, keepdims=True) * p / nrm2)
        e1 /= np.linalg.norm(e1, axis=-1, keepdims=True)
        e2 /= np.linalg.norm(e2, axis=-1, keepdims=True)
        return np.sum(e1 * e2, axis=-1)

    # unpadded staggered-point cosa: x-interfaces (v-points) and
    # y-interfaces (u-points)
    cosa_vp = np.zeros((NFACES, n, n + 1))
    cosa_up = np.zeros((NFACES, n + 1, n))
    CJ, SI = np.meshgrid(c, s, indexing="ij")
    SJ, CI = np.meshgrid(s, c, indexing="ij")
    for f in range(NFACES):
        cosa_vp[f] = _basis_cos(f, SI, CJ)
        cosa_up[f] = _basis_cos(f, CI, SJ)
    # pad via the staggered tables with the pseudo-scalar sign sgn_t*sgn_n
    stag_flat = np.concatenate([cosa_up.reshape(-1), cosa_vp.reshape(-1)])
    cosa_j_pad = stag_flat[spec.u_idx] * (spec.u_sgn * spec.u_sgn_n)
    cosa_i_pad = stag_flat[spec.v_idx] * (spec.v_sgn * spec.v_sgn_n)
    rsina_i = 1.0 / np.sqrt(np.maximum(1.0 - cosa_i_pad ** 2, 0.25))
    rsina_j = 1.0 / np.sqrt(np.maximum(1.0 - cosa_j_pad ** 2, 0.25))

    # cell-CENTER cosa (for the contravariant KE |V|^2 = rsin2 (u^2 + v^2
    # - 2 cosa u v) from covariant comps; FV3's sin_sg/rsin2 role): halo
    # values carry the pseudo-scalar parity vsy*vsx of the frame change,
    # because halo winds are stored as relabeled neighbor components
    cosa_cc = np.zeros((NFACES, n, n))
    CJ2, CI2 = np.meshgrid(c, c, indexing="ij")
    for f in range(NFACES):
        cosa_cc[f] = _basis_cos(f, CI2, CJ2)
    cosa_c = cosa_cc.reshape(-1)[spec.gidx_x] * (
        spec.vsy_x * spec.vsx_x).astype(np.float64)
    rsin2_c = 1.0 / np.maximum(1.0 - cosa_c ** 2, 0.25)

    # cell-CORNER cosa (for the corner KE from C-grid normal comps:
    # |V|^2 = rsin2 (ub^2 + vb^2 + 2 cosa ub vb)): interior corners exact,
    # halo corners from the padded center values (consumed only within
    # stencil reach of the interior)
    cosa_cn = 0.25 * (np.pad(cosa_c, ((0, 0), (1, 1), (1, 1)), mode="edge")
                      [:, :-1, :-1]
                      + np.pad(cosa_c, ((0, 0), (1, 1), (1, 1)),
                               mode="edge")[:, :-1, 1:]
                      + np.pad(cosa_c, ((0, 0), (1, 1), (1, 1)),
                               mode="edge")[:, 1:, :-1]
                      + np.pad(cosa_c, ((0, 0), (1, 1), (1, 1)),
                               mode="edge")[:, 1:, 1:])
    SJ2, SI2 = np.meshgrid(s, s, indexing="ij")
    for f in range(NFACES):
        cosa_cn[f, h:h + n + 1, h:h + n + 1] = _basis_cos(f, SI2, SJ2)
    rsin2_cn = 1.0 / np.maximum(1.0 - cosa_cn ** 2, 0.25)

    # corner Coriolis from interface positions: build padded corner z by
    # gathering per-face corner grids is overkill; interior corners are exact,
    # halo corners approximated from center average (used only via vorticity
    # in halo, which d_sw does not consume beyond depth 1).
    zc = np.zeros((NFACES, N + 1, N + 1))
    # average of 4 surrounding padded centers (clipped at boundaries)
    zp = pos_pad[..., 2]
    zpad = np.pad(zp, ((0, 0), (1, 1), (1, 1)), mode="edge")
    zc = 0.25 * (zpad[:, :-1, :-1] + zpad[:, :-1, 1:] + zpad[:, 1:, :-1] + zpad[:, 1:, 1:])
    # overwrite interior corners with exact values
    zc[:, h : h + n + 1, h : h + n + 1] = corners[..., 2]
    fcor_c = 2 * OMEGA * zc

    f32 = lambda a: np.asarray(a, dtype=np.float32)
    return Grid(
        n=n,
        h=h,
        spec=spec,
        lat=f32(lat),
        lon=f32(lon),
        area=f32(area_pad),
        rarea=f32(1.0 / area_pad),
        dx=f32(dx_pad),
        dy=f32(dy_pad),
        dxc=f32(dxc),
        dyc=f32(dyc),
        fcor=f32(fcor),
        fcor_c=f32(fcor_c),
        corner_mask=spec.corner_mask,
        cosa_i=f32(cosa_i_pad),
        rsina_i=f32(rsina_i),
        cosa_j=f32(cosa_j_pad),
        rsina_j=f32(rsina_j),
        cosa_c=f32(cosa_c),
        rsin2_c=f32(rsin2_c),
        cosa_cn=f32(cosa_cn),
        rsin2_cn=f32(rsin2_cn),
    )
