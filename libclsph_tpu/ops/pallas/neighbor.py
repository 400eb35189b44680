"""Fused Pallas TPU kernels for the SPH neighbour passes.

The XLA block-tile path (ops/tiles.py) pays two taxes the compiler
cannot remove:

1. every query block scans all ``max_candidates`` slots even though the
   mean live count is ~half that (masked compute is still compute);
2. the (nb, B, B) pair tensors for every kernel term round-trip
   through HBM between fusion boundaries.

These kernels fix both.

Layout: per-coordinate *planes* of the Morton-sorted fields in two
shapes — query planes column-shaped (nb, B, 1) and candidate planes
row-shaped (nb, 1, B). Both block cleanly under Mosaic's (8, 128)
tiling rules (the unit dims are whole-array), and the (B, B) pairwise
tile is a single VPU broadcast subtract with **no in-kernel
transposes**: query particles ride the sublanes, candidates the lanes.

The grid is (nb, M): query block i stays resident in VMEM while
candidate slot m sweeps. The candidate block index comes from the
scalar-prefetched ``cand`` table (pltpu.PrefetchScalarGridSpec) and
feeds the BlockSpec index_map — the candidate DMA itself is
data-dependent. Slots at or beyond ``count[i]`` skip all compute via
``pl.when`` (their DMA still streams a dummy block; 1.5 KB, free).

Physics computed is identical to ops/tiles.py (and therefore to
compute_density_with_grid / compute_internal_forces_with_grid,
forces.cl:14-111), including the spiky r->0 singular branch and the
i != j exclusions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import smoothing
from ...core.params import PrecomputedKernelValues, SimulationParameters


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


class PlanePytree(NamedTuple):
    """Morton-sorted particle fields in kernel-ready layouts.

    ``*_c``: (nb, B, 1) column layout (query side);
    ``*_r``: (nb, 1, B) row layout (candidate side).
    ``pm`` = mass * pressure / rho^2 (the symmetrised-pressure factor,
    Kelager 4.11), ``mr`` = mass / rho — both premultiplied host-side so
    the pair tile does no divides; sentinel rows carry zeros, which
    doubles as the validity mask for the force terms.
    """

    px_c: jnp.ndarray
    py_c: jnp.ndarray
    pz_c: jnp.ndarray
    vx_c: jnp.ndarray
    vy_c: jnp.ndarray
    vz_c: jnp.ndarray
    pm_c: jnp.ndarray
    gid_c: jnp.ndarray
    px_r: jnp.ndarray
    py_r: jnp.ndarray
    pz_r: jnp.ndarray
    vx_r: jnp.ndarray
    vy_r: jnp.ndarray
    vz_r: jnp.ndarray
    pm_r: jnp.ndarray
    mr_r: jnp.ndarray
    real_r: jnp.ndarray  # f32 0/1
    gid_r: jnp.ndarray

    @property
    def nb(self):
        return self.px_c.shape[0]

    @property
    def b(self):
        return self.px_c.shape[1]


def make_planes(position, velocity, density, pressure, real, block_size,
                mass=1.0, gid_offset=0):
    n = position.shape[0]
    nb = n // block_size
    col = lambda a: a.reshape(nb, block_size, 1)
    row = lambda a: a.reshape(nb, 1, block_size)
    gid = jnp.arange(n, dtype=jnp.int32) + gid_offset
    realf = real.astype(jnp.float32)
    safe_rho = jnp.where(density > 0, density, 1.0)
    pm = jnp.where(real, mass * pressure / (safe_rho * safe_rho), 0.0)
    mr = jnp.where(real, mass / safe_rho, 0.0)
    return PlanePytree(
        px_c=col(position[:, 0]),
        py_c=col(position[:, 1]),
        pz_c=col(position[:, 2]),
        vx_c=col(velocity[:, 0]),
        vy_c=col(velocity[:, 1]),
        vz_c=col(velocity[:, 2]),
        pm_c=col(pm),
        gid_c=col(gid),
        px_r=row(position[:, 0]),
        py_r=row(position[:, 1]),
        pz_r=row(position[:, 2]),
        vx_r=row(velocity[:, 0]),
        vy_r=row(velocity[:, 1]),
        vz_r=row(velocity[:, 2]),
        pm_r=row(pm),
        mr_r=row(mr),
        real_r=row(realf),
        gid_r=row(gid),
    )


def _q_spec(b):
    return pl.BlockSpec((1, b, 1), lambda i, m_, cand_, count_: (i, 0, 0))


def _c_spec(b):
    return pl.BlockSpec((1, 1, b), lambda i, m_, cand_, count_: (cand_[i, m_], 0, 0))


def _o_spec(b):
    return pl.BlockSpec((1, b, 1), lambda i, m_, cand_, count_: (i, 0, 0))


# ----------------------------------------------------------------------
# density
# ----------------------------------------------------------------------


def _density_kernel(
    cand_ref,  # scalar prefetch: (nb, M) int32
    count_ref,  # scalar prefetch: (nb,) int32
    qx, qy, qz,  # query planes (1, B, 1)
    cx, cy, cz, creal,  # candidate planes (1, 1, B)
    out,  # (1, B, 1) accumulated sum of W
    *,
    h: float,
    poly6: float,
):
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out[...] = jnp.zeros_like(out)

    @pl.when(m < count_ref[i])
    def _():
        dx = qx[0] - cx[0]  # (B, 1) - (1, B) -> (B, B)
        dy = qy[0] - cy[0]
        dz = qz[0] - cz[0]
        r2 = dx * dx + dy * dy + dz * dz
        # poly6 needs only r^2; the reference's floor(r/h) cutoff factor
        # (smoothing.cl:1-4) is exactly the r<h predicate
        t = h * h - r2
        mask = jnp.where(r2 < h * h, poly6, 0.0) * creal[0]
        w = mask * (t * t * t)
        out[...] += jnp.sum(w, axis=1, keepdims=True).reshape(1, -1, 1)


def fused_density(
    planes: PlanePytree,
    cand: jnp.ndarray,
    count: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    real_flat: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns the flat (n,) density over the sorted order."""
    nb, b = planes.nb, planes.b
    m = cand.shape[1]
    interpret = _interpret_default() if interpret is None else interpret

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, m),
        in_specs=[_q_spec(b)] * 3 + [_c_spec(b)] * 4,
        out_specs=_o_spec(b),
    )

    wsum = pl.pallas_call(
        functools.partial(
            _density_kernel, h=float(params.h), poly6=float(terms.poly_6)
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, b, 1), jnp.float32),
        interpret=interpret,
    )(
        cand,
        count,
        planes.px_c,
        planes.py_c,
        planes.pz_c,
        planes.px_r,
        planes.py_r,
        planes.pz_r,
        planes.real_r,
    )
    density = params.particle_mass * wsum.reshape(-1)
    return jnp.where(real_flat, density, params.fluid_density)


# ----------------------------------------------------------------------
# forces
# ----------------------------------------------------------------------


def _forces_kernel(
    cand_ref,
    count_ref,
    # query planes (1, B, 1): pos, vel, mass*press/rho^2, gid(f32-safe int)
    qx, qy, qz, qvx, qvy, qvz, qpm, qgid,
    # candidate planes (1, 1, B): pos, vel, mass*press/rho^2, mass/rho, gid
    cx, cy, cz, cvx, cvy, cvz, cpm, cmr, cgid,
    # outputs (1, B, 1) each: pressure xyz, viscosity xyz, normal xyz, lap
    opx, opy, opz, ovx, ovy, ovz, onx, ony, onz, olap,
    *,
    h: float,
    spiky: float,
    visc: float,
    poly6_grad: float,
    poly6_lap: float,
    eps: float,
):
    # NOTE: per-candidate scalars arrive premultiplied (cpm = m*p/rho^2,
    # cmr = m/rho, zeroed on sentinel rows so no separate 'real' mask or
    # divides are needed in the pair tile). Masks are carried as f32
    # multiplications; the support cutoff is the r2 < h2 predicate
    # (identical to the reference's 1-clamp(floor(r/h)) factor).
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        for o in (opx, opy, opz, ovx, ovy, ovz, onx, ony, onz, olap):
            o[...] = jnp.zeros_like(o)

    @pl.when(m < count_ref[i])
    def _():
        h2 = h * h
        dx = qx[0] - cx[0]  # (B, B)
        dy = qy[0] - cy[0]
        dz = qz[0] - cz[0]
        r2 = dx * dx + dy * dy + dz * dz
        incl = (r2 < h2).astype(jnp.float32)  # support cutoff
        not_self = incl * (qgid[0] != cgid[0]).astype(jnp.float32)

        near0 = r2 < eps * eps
        inv_r = jax.lax.rsqrt(jnp.where(near0, 1.0, r2))
        r = r2 * inv_r
        hr = h - r

        def acc(o, mat):
            o[...] += jnp.sum(mat, axis=1, keepdims=True).reshape(1, -1, 1)

        # pressure (Kelager 4.11, forces.cl:69-76)
        p_coeff = (cpm[0] + qpm[0]) * not_self
        near0f = near0.astype(jnp.float32)
        spiky_s = (spiky * (1.0 - near0f)) * hr * hr * inv_r
        a_reg = p_coeff * spiky_s
        # coincident-pair singular branch (smoothing.cl:23-25): the
        # constant spiky value on every component
        sing = jnp.sum(p_coeff * (spiky * near0f), axis=1, keepdims=True)
        acc(opx, a_reg * dx)
        acc(opy, a_reg * dy)
        acc(opz, a_reg * dz)
        opx[...] += sing.reshape(1, -1, 1)
        opy[...] += sing.reshape(1, -1, 1)
        opz[...] += sing.reshape(1, -1, 1)

        # viscosity (forces.cl:78-84); cmr = m/rho_j
        b_mat = (not_self * visc) * cmr[0] * hr
        acc(ovx, b_mat * (cvx[0] - qvx[0]))
        acc(ovy, b_mat * (cvy[0] - qvy[0]))
        acc(ovz, b_mat * (cvz[0] - qvz[0]))

        # colour field normal + laplacian (forces.cl:87-96), self included
        t = h2 - r2
        u = (incl * cmr[0]) * t
        g_mat = (poly6_grad * u) * t
        acc(onx, g_mat * dx)
        acc(ony, g_mat * dy)
        acc(onz, g_mat * dz)
        l_mat = (poly6_lap * u) * (3.0 * h2 - 7.0 * r2)
        acc(olap, l_mat)


def fused_forces(
    planes: PlanePytree,
    cand: jnp.ndarray,
    count: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    real_flat: jnp.ndarray,
    density: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns the flat (n, 3) acceleration over the sorted order
    (combine step of forces.cl:110-122 applied to the raw sums)."""
    nb, b = planes.nb, planes.b
    m = cand.shape[1]
    interpret = _interpret_default() if interpret is None else interpret

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, m),
        in_specs=[_q_spec(b)] * 8 + [_c_spec(b)] * 9,
        out_specs=[_o_spec(b)] * 10,
    )

    out_shapes = [jax.ShapeDtypeStruct((nb, b, 1), jnp.float32)] * 10
    outs = pl.pallas_call(
        functools.partial(
            _forces_kernel,
            h=float(params.h),
            spiky=float(terms.spiky),
            visc=float(terms.viscosity),
            poly6_grad=float(terms.poly_6_gradient),
            poly6_lap=float(terms.poly_6_laplacian),
            eps=smoothing.EPSILON,
        ),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(
        cand,
        count,
        planes.px_c, planes.py_c, planes.pz_c,
        planes.vx_c, planes.vy_c, planes.vz_c,
        planes.pm_c, planes.gid_c,
        planes.px_r, planes.py_r, planes.pz_r,
        planes.vx_r, planes.vy_r, planes.vz_r,
        planes.pm_r, planes.mr_r, planes.gid_r,
    )
    press = jnp.stack([o.reshape(-1) for o in outs[0:3]], axis=1)
    visct = jnp.stack([o.reshape(-1) for o in outs[3:6]], axis=1)
    norm = jnp.stack([o.reshape(-1) for o in outs[6:9]], axis=1)
    lap = outs[9].reshape(-1)

    rho = density
    total = -rho[:, None] * press + visct * params.dynamic_viscosity
    nlen = jnp.linalg.norm(norm, axis=-1, keepdims=True)
    apply_st = nlen > params.surface_tension_threshold
    st = -params.surface_tension * lap[:, None] * norm / jnp.where(apply_st, nlen, 1.0)
    total = total + jnp.where(apply_st, st, 0.0)
    accel = total / rho[:, None] + jnp.asarray(
        params.constant_acceleration, dtype=jnp.float32
    )
    return jnp.where(real_flat[:, None], accel, 0.0)
