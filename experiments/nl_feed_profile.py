"""Phase budget of the nl substep at 1M on TPU: packs, gather,
transpose, kernels, refine, plus the full pipeline, each as its own
jit with a real host fetch. Run: python experiments/nl_feed_profile.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libclsph_tpu.core.params import derive_parameters
from libclsph_tpu.core.state import init_state
from libclsph_tpu.engine.step import StepConfig, substep_jit, _density_forces_pallas_nl
from libclsph_tpu.ops import grid as grid_ops
from libclsph_tpu.ops import tiles as tiles_ops
from libclsph_tpu.ops.pallas import neighbor_nl as nl

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
print("warm flags:", int(ovf), file=sys.stderr)


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
    return state, real, cand_sub, count_sub


state_s, real, cand_sub, count_sub = jax.block_until_ready(prep(state))
print("live sub mean:", float(count_sub.mean()), "max:", int(count_sub.max()),
      file=sys.stderr)


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:4])
    t = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:4])
    print(f"{name:36s} {(time.perf_counter() - t) / reps * 1000:8.2f} ms",
          flush=True)


mass = params.particle_mass


@jax.jit
def mk_packs(state_s, real):
    q_pos, q_force = nl.make_query_planes(
        state_s.position, state_s.velocity, state_s.density, state_s.pressure,
        real, 128, mass=mass)
    c_pos, c_force = nl.make_csub_packs(
        state_s.position, state_s.velocity, state_s.density, state_s.pressure,
        real, mass=mass)
    return q_pos, q_force, c_pos, c_force


q_pos, q_force, c_pos, c_force = jax.block_until_ready(mk_packs(state_s, real))
cand_p, count_tiles = jax.block_until_ready(
    jax.jit(lambda c, n: nl._pad_groups(c, n))(cand_sub, count_sub))


@jax.jit
def take_only(c_force, cand_p):
    dead = c_force.shape[0] - 1
    idx = jnp.minimum(cand_p, dead)
    return jnp.take(c_force, idx, axis=0)


@jax.jit
def gt_force(c_force, cand_p):
    return nl.gather_tiles(c_force, cand_p, f_out=9)


@jax.jit
def gt_pos(c_pos, cand_p):
    return nl.gather_tiles(c_pos, cand_p)


tiles_f = jax.block_until_ready(gt_force(c_force, cand_p))
tiles_p = jax.block_until_ready(gt_pos(c_pos, cand_p))


@jax.jit
def dens_kernel(q_pos, tiles_p, count_tiles, real):
    nb = q_pos.shape[0]
    mg = tiles_p.shape[0] // (nb * 4 * nl.TPS)
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    kernel = functools.partial(
        nl._density_kernel, h=float(params.h), poly6=float(terms.poly_6),
        r2_mxu=False)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, mg),
        in_specs=[
            pl.BlockSpec((1, 3, 128, 1), lambda i, m, c_: (i, 0, 0, 0)),
            pl.BlockSpec((nl.TPS * 4, 128), lambda i, m, c_: (i * mg + m, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, m, c_: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
    )(count_tiles, q_pos, tiles_p)


@jax.jit
def force_kernel(q_force, tiles_f, count_tiles, real, dens):
    nb = q_force.shape[0]
    mg = tiles_f.shape[0] // (nb * 9 * nl.TPS)
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from libclsph_tpu.core import smoothing
    kernel = functools.partial(
        nl._forces_kernel, h=float(params.h), spiky=float(terms.spiky),
        visc=float(terms.viscosity), poly6_grad=float(terms.poly_6_gradient),
        poly6_lap=float(terms.poly_6_laplacian), eps=smoothing.EPSILON,
        r2_mxu=False)
    q_row = q_force[..., 0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, mg),
        in_specs=[
            pl.BlockSpec((1, 8, 128, 1), lambda i, m, c_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i, m, c_: (i, 0, 0)),
            pl.BlockSpec((nl.TPS * 9, 128), lambda i, m, c_: (i * mg + m, 0)),
        ],
        out_specs=pl.BlockSpec((1, 10, 128), lambda i, m, c_: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 10, 128), jnp.float32),
    )(count_tiles, q_force, q_row, tiles_f)


@jax.jit
def full_nl(state_s, real):
    return _density_forces_pallas_nl(state_s, real, params, cfg)


@jax.jit
def refine_only(state_s, real):
    blocked = tiles_ops.make_blocked(
        state_s.position, state_s.velocity, state_s.density, state_s.pressure,
        real, cfg.block_size)
    bmin, bmax = tiles_ops.split_block_bounds(blocked.position, blocked.real)
    cand, count, _ = tiles_ops.candidate_blocks_auto(bmin, bmax, params.h, 96)
    sub_lo, sub_hi = tiles_ops.subblock_bounds(blocked.position, blocked.real, 4)
    return tiles_ops.refine_candidates(
        cand, count, bmin, bmax, sub_lo, sub_hi, params.h, 4, MAXSUB)


timeit("make packs (q+c, both passes)", mk_packs, state_s, real)
timeit("take only (F=12 force pack)", take_only, c_force, cand_p)
timeit("gather_tiles force (take+tr)", gt_force, c_force, cand_p)
timeit("gather_tiles pos (take+tr)", gt_pos, c_pos, cand_p)
timeit("density kernel only", dens_kernel, q_pos, tiles_p, count_tiles, real)
timeit("force kernel only", force_kernel, q_force, tiles_f, count_tiles, real,
       state_s.density)
timeit("cand+refine (from state)", refine_only, state_s, real)
timeit("FULL density+forces nl", full_nl, state_s, real)
timeit("FULL substep", lambda s, d: substep_jit(s, d, params, None, cfg)[0],
       state, dt)
