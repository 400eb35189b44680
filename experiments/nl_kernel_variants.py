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
