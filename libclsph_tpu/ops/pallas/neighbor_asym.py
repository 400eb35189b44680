"""Asymmetric-tile Pallas kernels: 32-candidate x 128-query pair tiles.

Variant of ops/pallas/neighbor.py (same physics, same candidate
machinery) that flips the tile orientation and refines candidate
granularity:

* queries ride the LANES (128), candidates the SUBLANES (32) — so the
  ten per-query reductions run over sublanes (a handful of vector adds)
  instead of cross-lane shuffles;
* each 128-particle candidate block is processed as four 32-particle
  sub-tiles, and a sub-tile whose closest pair is outside the support
  radius skips ~80% of its arithmetic (`pl.when(any(r2 < h^2))`) —
  the dilated-AABB candidate test is block-granular, so ~30% of
  sub-tiles are empty in dense runs;
* layouts: query packs (nb, F, B) row-oriented (block (1, F, B));
  candidate packs (nb, F, 4, 32, 1) column-oriented (block
  (1, F, 4, 32, 1)); outputs (nb, F_out, B).

Select with ``StepConfig(pallas_variant="asym")``.

Measured on TPU v5e (water dam-break): SLOWER than the row variant
(488 vs 405 ms/step at 1M, 48 vs 33 ms at 64k) — the 4-way sub-tile
loop defeats Mosaic's software pipelining more than the finer
granularity saves. Kept as a correct, tested alternative for shapes
where candidate sparsity dominates (e.g. very non-uniform density).
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
from .neighbor import (
    MAX_PARTICLES_F32_ID,
    _chunked_call,
    _interleave,
    _interpret_default,
    _query_chunk,
)

SUB = 32  # candidate sub-tile height (sublanes)


class AsymPlanes(NamedTuple):
    q_pos: jnp.ndarray  # (nb, 3, B) rows: px py pz
    c_pos: jnp.ndarray  # (nb, 4, S, SUB, 1) cols: px py pz realmask
    q_force: jnp.ndarray  # (nb, 8, B) px py pz vx vy vz pm gid
    c_force: jnp.ndarray  # (nb, 9, S, SUB, 1) px py pz vx vy vz pm mr gid

    @property
    def nb(self):
        return self.q_pos.shape[0]

    @property
    def b(self):
        return self.q_pos.shape[2]


def make_planes(
    position, velocity, density, pressure, real, block_size, mass=1.0, gid_offset=0
) -> AsymPlanes:
    n = position.shape[0]
    nb = n // block_size
    s = block_size // SUB
    if n + gid_offset >= MAX_PARTICLES_F32_ID:
        raise ValueError("particle ids exceed exact-f32 range")
    realf = real.astype(jnp.float32)
    safe_rho = jnp.where(density > 0, density, 1.0)
    pm = jnp.where(real, mass * pressure / (safe_rho * safe_rho), 0.0)
    mr = jnp.where(real, mass / safe_rho, 0.0)
    gidf = (jnp.arange(n, dtype=jnp.int32) + gid_offset).astype(jnp.float32)

    px, py, pz = position[:, 0], position[:, 1], position[:, 2]
    vx, vy, vz = velocity[:, 0], velocity[:, 1], velocity[:, 2]

    def pack_q(fields):
        return _interleave(fields, nb, block_size)

    def pack_c(fields):
        a = _interleave(fields, nb, block_size)
        return a.reshape(nb, len(fields), s, SUB)[..., None]

    return AsymPlanes(
        q_pos=pack_q([px, py, pz]),
        c_pos=pack_c([px, py, pz, realf]),
        q_force=pack_q([px, py, pz, vx, vy, vz, pm, gidf]),
        c_force=pack_c([px, py, pz, vx, vy, vz, pm, mr, gidf]),
    )


def _q_spec(f, b):
    return pl.BlockSpec((1, f, b), lambda i, m_, cand_, count_: (i, 0, 0))


def _c_spec_k(f, s, cpg, k, nc_last):
    """Dead candidate slots may hold tiles.REFINE_SENTINEL — clamp the
    DMA index (data unused: compute skips slots >= count)."""
    return pl.BlockSpec(
        (1, f, s, SUB, 1),
        lambda i, m_, cand_, count_: (
            jnp.minimum(cand_[i, m_ * cpg + k], nc_last), 0, 0, 0, 0
        ),
    )


CANDS_PER_STEP = 2


# ----------------------------------------------------------------------
# density
# ----------------------------------------------------------------------


def _density_kernel(cand_ref, count_ref, q, *cs_and_out, h: float, poly6: float, s: int):
    cs, out = cs_and_out[:-1], cs_and_out[-1]
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out[...] = jnp.zeros_like(out)

    h2 = h * h
    qx = q[0, 0:1, :]  # (1, B)
    qy = q[0, 1:2, :]
    qz = q[0, 2:3, :]

    for k, c in enumerate(cs):
        slot = m * len(cs) + k

        @pl.when(slot < count_ref[i])
        def _(c=c):
            for sub in range(s):
                dx = qx - c[0, 0, sub]  # (1,B) - (SUB,1) -> (SUB, B)
                dy = qy - c[0, 1, sub]
                dz = qz - c[0, 2, sub]
                r2 = dx * dx + dy * dy + dz * dz
                incl = r2 < h2

                @pl.when(jnp.any(incl))
                def _(r2=r2, incl=incl, c=c, sub=sub):
                    t = h2 - r2
                    mask = jnp.where(incl, poly6, 0.0) * c[0, 3, sub]
                    w = mask * (t * t * t)
                    out[...] += jnp.sum(w, axis=0, keepdims=True)[None]


def fused_density(
    planes: AsymPlanes,
    cand: jnp.ndarray,
    count: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    real_flat: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    nb, b = planes.nb, planes.b
    s = b // SUB
    m = cand.shape[1]
    interpret = _interpret_default() if interpret is None else interpret
    cpg = CANDS_PER_STEP
    mp = -(-m // cpg) * cpg
    if mp != m:
        cand = jnp.concatenate([cand, jnp.zeros((nb, mp - m), cand.dtype)], axis=1)
    chunk = _query_chunk(nb, mp)

    kernel = functools.partial(
        _density_kernel, h=float(params.h), poly6=float(terms.poly_6), s=s
    )

    def run_chunk(args):
        cand_c, count_c, q = args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(chunk, mp // cpg),
            in_specs=[_q_spec(3, b)]
            + [
                _c_spec_k(4, s, cpg, k, planes.c_pos.shape[0] - 1)
                for k in range(cpg)
            ],
            out_specs=pl.BlockSpec(
                (1, 1, b), lambda i, m_, cand_, count_: (i, 0, 0)
            ),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((chunk, 1, b), jnp.float32),
            interpret=interpret,
        )(cand_c, count_c, q, *([planes.c_pos] * cpg))

    wsum = _chunked_call(run_chunk, chunk, nb, 1, cand, count, planes.q_pos)
    density = params.particle_mass * wsum.reshape(-1)
    return jnp.where(real_flat, density, params.fluid_density)


# ----------------------------------------------------------------------
# forces
# ----------------------------------------------------------------------

_QX, _QY, _QZ, _QVX, _QVY, _QVZ, _QPM, _QGID = range(8)
_CX, _CY, _CZ, _CVX, _CVY, _CVZ, _CPM, _CMR, _CGID = range(9)
(_OPX, _OPY, _OPZ, _OVX, _OVY, _OVZ, _ONX, _ONY, _ONZ, _OLAP) = range(10)


def _forces_tile(q, c, sub, out, *, h, spiky, visc, poly6_grad, poly6_lap, eps):
    h2 = h * h
    qrow = lambda k: q[0, k : k + 1, :]  # (1, B)
    ccol = lambda k: c[0, k, sub]  # (SUB, 1)

    dx = qrow(_QX) - ccol(_CX)  # (SUB, B)
    dy = qrow(_QY) - ccol(_CY)
    dz = qrow(_QZ) - ccol(_CZ)
    r2 = dx * dx + dy * dy + dz * dz
    incl_b = r2 < h2

    @pl.when(jnp.any(incl_b))
    def _():
        incl = incl_b.astype(jnp.float32)
        not_self = incl * (qrow(_QGID) != ccol(_CGID)).astype(jnp.float32)

        near0 = r2 < eps * eps
        inv_r = jax.lax.rsqrt(jnp.where(near0, 1.0, r2))
        r = r2 * inv_r
        hr = h - r

        def acc(k, mat):
            out[0, k] += jnp.sum(mat, axis=0)

        # pressure (Kelager 4.11, forces.cl:69-76)
        p_coeff = (ccol(_CPM) + qrow(_QPM)) * not_self
        near0f = near0.astype(jnp.float32)
        spiky_s = (spiky * (1.0 - near0f)) * hr * hr * inv_r
        a_reg = p_coeff * spiky_s
        sing = jnp.sum(p_coeff * (spiky * near0f), axis=0)
        acc(_OPX, a_reg * dx)
        acc(_OPY, a_reg * dy)
        acc(_OPZ, a_reg * dz)
        out[0, _OPX] += sing
        out[0, _OPY] += sing
        out[0, _OPZ] += sing

        # viscosity (forces.cl:78-84)
        b_mat = (not_self * visc) * ccol(_CMR) * hr
        acc(_OVX, b_mat * (ccol(_CVX) - qrow(_QVX)))
        acc(_OVY, b_mat * (ccol(_CVY) - qrow(_QVY)))
        acc(_OVZ, b_mat * (ccol(_CVZ) - qrow(_QVZ)))

        # colour field (forces.cl:87-96), self included
        t = h2 - r2
        u = (incl * ccol(_CMR)) * t
        g_mat = (poly6_grad * u) * t
        acc(_ONX, g_mat * dx)
        acc(_ONY, g_mat * dy)
        acc(_ONZ, g_mat * dz)
        l_mat = (poly6_lap * u) * (3.0 * h2 - 7.0 * r2)
        acc(_OLAP, l_mat)


def _forces_kernel(
    cand_ref, count_ref, q, *cs_and_out,
    h, spiky, visc, poly6_grad, poly6_lap, eps, s,
):
    cs, out = cs_and_out[:-1], cs_and_out[-1]
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out[...] = jnp.zeros_like(out)

    for k, c in enumerate(cs):
        slot = m * len(cs) + k

        @pl.when(slot < count_ref[i])
        def _(c=c):
            for sub in range(s):
                _forces_tile(
                    q, c, sub, out,
                    h=h, spiky=spiky, visc=visc,
                    poly6_grad=poly6_grad, poly6_lap=poly6_lap, eps=eps,
                )


def fused_forces(
    planes: AsymPlanes,
    cand: jnp.ndarray,
    count: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    real_flat: jnp.ndarray,
    density: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    nb, b = planes.nb, planes.b
    s = b // SUB
    m = cand.shape[1]
    interpret = _interpret_default() if interpret is None else interpret
    cpg = CANDS_PER_STEP
    mp = -(-m // cpg) * cpg
    if mp != m:
        cand = jnp.concatenate([cand, jnp.zeros((nb, mp - m), cand.dtype)], axis=1)
    chunk = _query_chunk(nb, mp)

    kernel = functools.partial(
        _forces_kernel,
        h=float(params.h),
        spiky=float(terms.spiky),
        visc=float(terms.viscosity),
        poly6_grad=float(terms.poly_6_gradient),
        poly6_lap=float(terms.poly_6_laplacian),
        eps=smoothing.EPSILON,
        s=s,
    )

    def run_chunk(args):
        cand_c, count_c, q = args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(chunk, mp // cpg),
            in_specs=[_q_spec(8, b)]
            + [
                _c_spec_k(9, s, cpg, k, planes.c_force.shape[0] - 1)
                for k in range(cpg)
            ],
            out_specs=pl.BlockSpec(
                (1, 10, b), lambda i, m_, cand_, count_: (i, 0, 0)
            ),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((chunk, 10, b), jnp.float32),
            interpret=interpret,
        )(cand_c, count_c, q, *([planes.c_force] * cpg))

    sums = _chunked_call(run_chunk, chunk, nb, 1, cand, count, planes.q_force)
    # sums: (nb, 10, B)

    flat = lambda k: sums[:, k].reshape(-1)
    press = jnp.stack([flat(_OPX), flat(_OPY), flat(_OPZ)], axis=1)
    visct = jnp.stack([flat(_OVX), flat(_OVY), flat(_OVZ)], axis=1)
    norm = jnp.stack([flat(_ONX), flat(_ONY), flat(_ONZ)], axis=1)
    lap = flat(_OLAP)

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
