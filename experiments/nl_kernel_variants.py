"""Isolated force-kernel timing at 1M: flat2d/TPS8 vs tile3d/TPS1.

Feeds PRE-GATHERED tile streams so the kernel time is measured without
the gather. Run on TPU: python experiments/nl_kernel_variants.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libclsph_tpu.core.params import derive_parameters
from libclsph_tpu.core.state import init_state
from libclsph_tpu.engine.step import StepConfig, substep_jit
from libclsph_tpu.ops import grid as grid_ops
from libclsph_tpu.ops import tiles as tiles_ops
from libclsph_tpu.ops.pallas import neighbor_nl as nl
from libclsph_tpu.ops.pallas.neighbor import _forces_core
from libclsph_tpu import __name__ as _  # noqa

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
MAXSUB = 192

fluid = dict(fluid_density=998.29, dynamic_viscosity=3.5, restitution=0, k=100,
             surface_tension_threshold=7.065, surface_tension=0.0728,
             particles_inside_influence_radius=20)
sim = dict(particles_count=N, particle_mass=0.05, simulation_time=3,
           target_fps=60, simulation_scale=0.1,
           constant_acceleration=dict(x=0, y=-9.8, z=0))
params = derive_parameters(fluid, sim)
terms = params.precomputed()
cfg = StepConfig(neighbor_impl="pallas", pallas_variant="nl",
                 max_candidates=96, max_candidates_sub=MAXSUB)

state = init_state(params)
dt = jnp.float32(params.max_dt)
for _i in range(3):
    state, dt, ovf = substep_jit(state, dt, params, None, cfg)


@jax.jit
def prep(state):
    grid = grid_ops.compute_bounds(state.position, params)
    codes = grid_ops.locate_in_grid(state.position, grid)
    np_ = tiles_ops.padded_count(N, cfg.block_size)
    pad = np_ - N
    if pad:
        far = grid.max_point + 1000.0 * params.h
        state = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
            ), state)
        state = state.replace(position=state.position.at[N:].set(far))
        codes = jnp.concatenate(
            [codes, jnp.full((pad,), tiles_ops.SENTINEL_CODE, jnp.uint32)])
    state, _, _ = grid_ops.sort_by_cell(state, codes)
    real = jnp.arange(state.position.shape[0], dtype=jnp.int32) < N
    blocked = tiles_ops.make_blocked(
        state.position, state.velocity, state.density, state.pressure,
        real, cfg.block_size)
    bmin, bmax = tiles_ops.split_block_bounds(blocked.position, blocked.real)
    cand, count, _ = tiles_ops.candidate_blocks_auto(bmin, bmax, params.h, 96)
    sub_lo, sub_hi = tiles_ops.subblock_bounds(blocked.position, blocked.real, 4)
    cand_sub, count_sub, _ = tiles_ops.refine_candidates(
        cand, count, bmin, bmax, sub_lo, sub_hi, params.h, 4, MAXSUB)
    q_pos, q_force = nl.make_query_planes(
        state.position, state.velocity, state.density, state.pressure,
        real, 128, mass=params.particle_mass)
    _, c_force = nl.make_csub_packs(
        state.position, state.velocity, state.density, state.pressure,
        real, mass=params.particle_mass)
    cs, count_tiles = nl._pad_groups(cand_sub, count_sub)
    tiles_in = nl.gather_tiles(c_force, cs)
    return q_force, tiles_in, count_tiles


q_force, tiles_in, count_tiles = jax.block_until_ready(prep(state))
nb = q_force.shape[0]
mg8 = tiles_in.shape[0] // (nb * 9 * 8)  # TPS=8 steps
n_tiles = tiles_in.shape[0] // 9
print(f"nb={nb} tiles/block={n_tiles // nb} live mean={float(count_tiles.mean()):.1f}",
      file=sys.stderr)

kern_kwargs = dict(
    h=float(params.h), spiky=float(terms.spiky), visc=float(terms.viscosity),
    poly6_grad=float(terms.poly_6_gradient), poly6_lap=float(terms.poly_6_laplacian),
    eps=1e-8,
)


def forces_flat2d_tps(tps):
    def kernel(count_ref, q, c, out, **kw):
        i = pl.program_id(0)
        m = pl.program_id(1)

        @pl.when(m == 0)
        def _():
            out[...] = jnp.zeros_like(out)

        for s in range(tps):
            @pl.when(m * tps + s < count_ref[i])
            def _(s=s):
                _forces_core(
                    lambda k: q[0, k],
                    lambda k, s=s: c[s * 9 + k: s * 9 + k + 1, :], out, **kw)

    mg = n_tiles // nb // tps
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, mg),
        in_specs=[
            pl.BlockSpec((1, 8, 128, 1), lambda i, m, c_: (i, 0, 0, 0)),
            pl.BlockSpec((tps * 9, 128), lambda i, m, c_: (i * mg + m, 0)),
        ],
        out_specs=pl.BlockSpec((1, 10, 128, 1), lambda i, m, c_: (i, 0, 0, 0)),
    )

    @jax.jit
    def run(count_tiles, q_force, tiles_in):
        return pl.pallas_call(
            functools.partial(kernel, **kern_kwargs),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, 10, 128, 1), jnp.float32),
        )(count_tiles, q_force, tiles_in)

    return run


def forces_tile3d():
    def kernel(count_ref, q, c, out, **kw):
        i = pl.program_id(0)
        m = pl.program_id(1)

        @pl.when(m == 0)
        def _():
            out[...] = jnp.zeros_like(out)

        @pl.when(m < count_ref[i])
        def _():
            _forces_core(
                lambda k: q[0, k], lambda k: c[0, k: k + 1, :], out, **kw)

    mg = n_tiles // nb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, mg),
        in_specs=[
            pl.BlockSpec((1, 8, 128, 1), lambda i, m, c_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 9, 128), lambda i, m, c_: (i * mg + m, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 10, 128, 1), lambda i, m, c_: (i, 0, 0, 0)),
    )

    @jax.jit
    def run(count_tiles, q_force, tiles3d):
        return pl.pallas_call(
            functools.partial(kernel, **kern_kwargs),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, 10, 128, 1), jnp.float32),
        )(count_tiles, q_force, tiles3d)

    return run


tiles3d = jax.block_until_ready(
    jax.jit(lambda t: t.reshape(n_tiles, 9, 128))(tiles_in))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _ = np.asarray(out.ravel()[:8])
    t = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    _ = np.asarray(out.ravel()[:8])
    print(f"{name:24s} {(time.perf_counter() - t) / reps * 1000:8.2f} ms", flush=True)


timeit("forces flat2d TPS=8", forces_flat2d_tps(8), count_tiles, q_force, tiles_in)
timeit("forces tile3d TPS=1", forces_tile3d(), count_tiles, q_force, tiles3d)


# ---- asm variant timing on the same refined lists ----
from libclsph_tpu.ops.pallas.neighbor_nl import (  # noqa: E402
    fused_forces_asm, fused_density_asm, make_cparent_packs,
)


@jax.jit
def prep_asm(state):
    grid = grid_ops.compute_bounds(state.position, params)
    codes = grid_ops.locate_in_grid(state.position, grid)
    np_ = tiles_ops.padded_count(N, cfg.block_size)
    pad = np_ - N
    if pad:
        far = grid.max_point + 1000.0 * params.h
        state = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
            ), state)
        state = state.replace(position=state.position.at[N:].set(far))
        codes = jnp.concatenate(
            [codes, jnp.full((pad,), tiles_ops.SENTINEL_CODE, jnp.uint32)])
    state, _, _ = grid_ops.sort_by_cell(state, codes)
    real = jnp.arange(state.position.shape[0], dtype=jnp.int32) < N
    blocked = tiles_ops.make_blocked(
        state.position, state.velocity, state.density, state.pressure,
        real, cfg.block_size)
    bmin, bmax = tiles_ops.split_block_bounds(blocked.position, blocked.real)
    cand, count, _ = tiles_ops.candidate_blocks_auto(bmin, bmax, params.h, 96)
    sub_lo, sub_hi = tiles_ops.subblock_bounds(blocked.position, blocked.real, 4)
    cand_sub, count_sub, _ = tiles_ops.refine_candidates(
        cand, count, bmin, bmax, sub_lo, sub_hi, params.h, 4, MAXSUB)
    _, q_force2 = nl.make_query_planes(
        state.position, state.velocity, state.density, state.pressure,
        real, 128, mass=params.particle_mass)
    _, c_parent = make_cparent_packs(
        state.position, state.velocity, state.density, state.pressure,
        real, mass=params.particle_mass)
    dens = state.density
    return q_force2, c_parent, cand_sub, count_sub, real, dens


q_force2, c_parent, cand_sub2, count_sub2, real2, dens2 = jax.block_until_ready(
    prep_asm(state))


@jax.jit
def run_asm_forces(q_force2, c_parent, cand_sub2, count_sub2, real2, dens2):
    return fused_forces_asm(q_force2, c_parent, cand_sub2, count_sub2,
                            params, terms, real2, dens2)


@jax.jit
def run_asm_density(q_pos, c_pos_parent, cand_sub2, count_sub2, real2):
    return fused_density_asm(q_pos, c_pos_parent, cand_sub2, count_sub2,
                             params, terms, real2)


timeit("forces asm e2e", run_asm_forces, q_force2, c_parent, cand_sub2,
       count_sub2, real2, dens2)


# ---- MXU-accumulation force tile: replace the 10 cross-lane
# reductions (~8 vec-ops each) with ONE dot_general against stacked
# candidate rows (A @ R^T is the native MXU form, no transposes).
from libclsph_tpu.ops.pallas.neighbor import (  # noqa: E402
    _CGID, _CMR, _CPM, _CVX, _CVY, _CVZ, _CX, _CY, _CZ,
    _OLAP, _ONX, _ONY, _ONZ, _OPX, _OPY, _OPZ, _OVX, _OVY, _OVZ,
    _QGID, _QPM, _QVX, _QVY, _QVZ, _QX, _QY, _QZ,
)


def _forces_core_mxu(col, row, out, *, h, spiky, visc, poly6_grad,
                     poly6_lap, eps):
    h2 = h * h
    dx = col(_QX) - row(_CX)
    dy = col(_QY) - row(_CY)
    dz = col(_QZ) - row(_CZ)
    r2 = dx * dx + dy * dy + dz * dz
    incl_b = r2 < h2

    @pl.when(jnp.any(incl_b))
    def _():
        incl = incl_b.astype(jnp.float32)
        not_self = incl * (col(_QGID) != row(_CGID)).astype(jnp.float32)
        near0 = r2 < eps * eps
        inv_r = jax.lax.rsqrt(jnp.where(near0, 1.0, r2))
        r = r2 * inv_r
        hr = h - r
        near0f = near0.astype(jnp.float32)

        p_coeff = (row(_CPM) + col(_QPM)) * not_self
        spiky_s = (spiky * (1.0 - near0f)) * hr * hr * inv_r
        a_reg = p_coeff * spiky_s            # pressure coefficients
        sing = p_coeff * (spiky * near0f)    # coincident-pair branch
        b_mat = (not_self * visc) * row(_CMR) * hr
        t = jnp.where(incl_b, h2 - r2, 0.0)
        u = (incl * row(_CMR)) * t
        g_mat = (poly6_grad * u) * t
        l_mat = (poly6_lap * u) * (3.0 * h2 - 7.0 * r2)

        b = a_reg.shape[0]
        lhs = jnp.concatenate([a_reg, b_mat, g_mat, l_mat + sing], axis=0)
        ones = jnp.ones_like(row(_CX))
        rhs = jnp.concatenate(
            [row(_CX), row(_CY), row(_CZ),
             row(_CVX), row(_CVY), row(_CVZ), ones], axis=0)  # (7, 128)
        res = jax.lax.dot_general(
            lhs, rhs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (4B, 7)
        ra, rb, rg, rl = res[:b], res[b:2*b], res[2*b:3*b], res[3*b:]
        sum_a = ra[:, 6:7]
        sum_sing_l = rl[:, 6:7]  # sum(l) + sum(sing)
        # need sum(l) and sum(sing) separately: put sing also against a
        # velocity column it can't collide with? Instead recover:
        # sing summed = dot(sing, ones); l summed = dot(l, ones).
        # They were merged — split by a second tiny reduction on sing:
        sum_sing = jnp.sum(sing, axis=1, keepdims=True)
        sum_l = sum_sing_l - sum_sing
        # pressure: x_i*sum(a) - sum(a x_j) + sum(sing) per component
        out[0, _OPX] += col(_QX) * sum_a - ra[:, 0:1] + sum_sing
        out[0, _OPY] += col(_QY) * sum_a - ra[:, 1:2] + sum_sing
        out[0, _OPZ] += col(_QZ) * sum_a - ra[:, 2:3] + sum_sing
        # viscosity: sum(b v_j) - v_i sum(b)
        sum_b = rb[:, 6:7]
        out[0, _OVX] += rb[:, 3:4] - col(_QVX) * sum_b
        out[0, _OVY] += rb[:, 4:5] - col(_QVY) * sum_b
        out[0, _OVZ] += rb[:, 5:6] - col(_QVZ) * sum_b
        # colour normal: x_i sum(g) - sum(g x_j); laplacian: sum(l)
        sum_g = rg[:, 6:7]
        out[0, _ONX] += col(_QX) * sum_g - rg[:, 0:1]
        out[0, _ONY] += col(_QY) * sum_g - rg[:, 1:2]
        out[0, _ONZ] += col(_QZ) * sum_g - rg[:, 2:3]
        out[0, _OLAP] += sum_l


def forces_flat2d_mxu(tps):
    def kernel(count_ref, q, c, out, **kw):
        i = pl.program_id(0)
        m = pl.program_id(1)

        @pl.when(m == 0)
        def _():
            out[...] = jnp.zeros_like(out)

        for s in range(tps):
            @pl.when(m * tps + s < count_ref[i])
            def _(s=s):
                _forces_core_mxu(
                    lambda k: q[0, k],
                    lambda k, s=s: c[s * 9 + k: s * 9 + k + 1, :], out, **kw)

    mg = n_tiles // nb // tps
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, mg),
        in_specs=[
            pl.BlockSpec((1, 8, 128, 1), lambda i, m, c_: (i, 0, 0, 0)),
            pl.BlockSpec((tps * 9, 128), lambda i, m, c_: (i * mg + m, 0)),
        ],
        out_specs=pl.BlockSpec((1, 10, 128, 1), lambda i, m, c_: (i, 0, 0, 0)),
    )

    @jax.jit
    def run(count_tiles, q_force, tiles_in):
        return pl.pallas_call(
            functools.partial(kernel, **kern_kwargs),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, 10, 128, 1), jnp.float32),
        )(count_tiles, q_force, tiles_in)

    return run


ref_out = forces_flat2d_tps(8)(count_tiles, q_force, tiles_in)
mxu_out = forces_flat2d_mxu(8)(count_tiles, q_force, tiles_in)
r1 = np.asarray(ref_out).reshape(-1)
r2_ = np.asarray(mxu_out).reshape(-1)
scale = np.abs(r1).max()
print(f"mxu max abs err vs direct: {np.abs(r1 - r2_).max():.3e} (scale {scale:.3e})",
      flush=True)
timeit("forces flat2d MXU", forces_flat2d_mxu(8), count_tiles, q_force, tiles_in)


# ---- mxu2: row-layout combines. dot_general(rhs, lhs) -> (7, 4B)
# keeps every post-dot value lane-major ((1,B) = 1 vreg vs (B,1) = 16
# nearly-empty vregs); query fields arrive in BOTH layouts (columns for
# pair math, rows for combines); out accumulator is (10, B) rows.
def _forces_core_mxu2(col, row, qrow, out, *, h, spiky, visc, poly6_grad,
                      poly6_lap, eps):
    h2 = h * h
    dx = col(_QX) - row(_CX)
    dy = col(_QY) - row(_CY)
    dz = col(_QZ) - row(_CZ)
    r2 = dx * dx + dy * dy + dz * dz
    incl_b = r2 < h2

    @pl.when(jnp.any(incl_b))
    def _():
        incl = incl_b.astype(jnp.float32)
        not_self = incl * (col(_QGID) != row(_CGID)).astype(jnp.float32)
        near0 = r2 < eps * eps
        inv_r = jax.lax.rsqrt(jnp.where(near0, 1.0, r2))
        r = r2 * inv_r
        hr = h - r
        near0f = near0.astype(jnp.float32)

        p_coeff = (row(_CPM) + col(_QPM)) * not_self
        spiky_s = (spiky * (1.0 - near0f)) * hr * hr * inv_r
        a_reg = p_coeff * spiky_s
        sing = p_coeff * (spiky * near0f)
        b_mat = (not_self * visc) * row(_CMR) * hr
        t = jnp.where(incl_b, h2 - r2, 0.0)
        u = (incl * row(_CMR)) * t
        g_mat = (poly6_grad * u) * t
        l_mat = (poly6_lap * u) * (3.0 * h2 - 7.0 * r2)

        b = a_reg.shape[0]
        lhs = jnp.concatenate([a_reg, b_mat, g_mat, l_mat + sing, sing],
                              axis=0)  # (5B, 128)
        ones = jnp.ones_like(row(_CX))
        rhs = jnp.concatenate(
            [row(_CX), row(_CY), row(_CZ),
             row(_CVX), row(_CVY), row(_CVZ), ones], axis=0)  # (7, 128)
        res = jax.lax.dot_general(
            rhs, lhs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (7, 5B) lane-major
        ra = res[:, 0:b]         # (7, B): rows = [Σa·cx.., Σa·cv.., Σa]
        rb = res[:, b:2*b]
        rg = res[:, 2*b:3*b]
        rls = res[:, 3*b:4*b]
        rs = res[:, 4*b:5*b]
        qx, qy, qz = qrow[0, 0:1], qrow[0, 1:2], qrow[0, 2:3]  # (1, B)
        qvx, qvy, qvz = qrow[0, 3:4], qrow[0, 4:5], qrow[0, 5:6]
        sum_a = ra[6:7]
        sum_b = rb[6:7]
        sum_g = rg[6:7]
        sum_sing = rs[6:7]
        sum_l = rls[6:7] - sum_sing
        out[0, _OPX:_OPX+1, :] += qx * sum_a - ra[0:1] + sum_sing
        out[0, _OPY:_OPY+1, :] += qy * sum_a - ra[1:2] + sum_sing
        out[0, _OPZ:_OPZ+1, :] += qz * sum_a - ra[2:3] + sum_sing
        out[0, _OVX:_OVX+1, :] += rb[3:4] - qvx * sum_b
        out[0, _OVY:_OVY+1, :] += rb[4:5] - qvy * sum_b
        out[0, _OVZ:_OVZ+1, :] += rb[5:6] - qvz * sum_b
        out[0, _ONX:_ONX+1, :] += qx * sum_g - rg[0:1]
        out[0, _ONY:_ONY+1, :] += qy * sum_g - rg[1:2]
        out[0, _ONZ:_ONZ+1, :] += qz * sum_g - rg[2:3]
        out[0, _OLAP:_OLAP+1, :] += sum_l


def forces_flat2d_mxu2(tps):
    def kernel(count_ref, q, qrow, c, out, **kw):
        i = pl.program_id(0)
        m = pl.program_id(1)

        @pl.when(m == 0)
        def _():
            out[...] = jnp.zeros_like(out)

        for s in range(tps):
            @pl.when(m * tps + s < count_ref[i])
            def _(s=s):
                _forces_core_mxu2(
                    lambda k: q[0, k],
                    lambda k, s=s: c[s * 9 + k: s * 9 + k + 1, :],
                    qrow, out, **kw)

    mg = n_tiles // nb // tps
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, mg),
        in_specs=[
            pl.BlockSpec((1, 8, 128, 1), lambda i, m, c_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, m, c_: (i, 0, 0)),
            pl.BlockSpec((tps * 9, 128), lambda i, m, c_: (i * mg + m, 0)),
        ],
        out_specs=pl.BlockSpec((1, 10, 128), lambda i, m, c_: (i, 0, 0)),
    )

    @jax.jit
    def run(count_tiles, q_force, q_row, tiles_in):
        return pl.pallas_call(
            functools.partial(kernel, **kern_kwargs),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, 10, 128), jnp.float32),
        )(count_tiles, q_force, q_row, tiles_in)

    return run


q_row = jax.block_until_ready(jax.jit(lambda q: q[..., 0])(q_force))
mxu2_out = forces_flat2d_mxu2(8)(count_tiles, q_force, q_row, tiles_in)
r3 = np.asarray(mxu2_out).reshape(nb, 10, 128, 1).reshape(-1)
print(f"mxu2 max abs err vs direct: {np.abs(r1 - r3).max():.3e}", flush=True)
timeit("forces flat2d MXU2", forces_flat2d_mxu2(8), count_tiles, q_force,
       q_row, tiles_in)
