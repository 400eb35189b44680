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
SCENE = sys.argv[2] if len(sys.argv) > 2 else None  # e.g. 'cube'
WARM = int(sys.argv[3]) if len(sys.argv) > 3 else 3
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

scene_dev = None
if SCENE:
    from libclsph_tpu.ops import collisions as collisions_ops
    from libclsph_tpu.scene.scene import Scene

    scene_dev = collisions_ops.build_device_scene(
        Scene.load(SCENE + ".obj", params.h * 2, scenes_dir="scenes")
    )

state = init_state(params)
dt = jnp.float32(params.max_dt)
for _i in range(WARM):
    state, dt, ovf = substep_jit(state, dt, params, scene_dev, cfg)
print("warm flags:", int(ovf), "dt:", float(dt), file=sys.stderr)


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
def gr_force(c_force, cand_p):
    return nl.gather_raw(c_force, cand_p)


@jax.jit
def gr_pos(c_pos, cand_p):
    return nl.gather_raw(c_pos, cand_p)


if N <= 2_000_000:  # unchunked raw streams OOM at 4M
    raw_f = jax.block_until_ready(gr_force(c_force, cand_p))
    raw_p = jax.block_until_ready(gr_pos(c_pos, cand_p))


@jax.jit
def dens_kernel(q_pos, c_pos, cand_p, count_sub, real):
    return nl.fused_density_nl(
        q_pos, c_pos, cand_p, count_sub, params, terms, real)


@jax.jit
def force_kernel(q_force, c_force, cand_p, count_sub, real, dens):
    return nl.fused_forces_nl(
        q_force, c_force, cand_p, count_sub, params, terms, real, dens)


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
if N <= 2_000_000:  # unchunked take: 9.7 GB at 4M
    timeit("take only (F=12 force pack)", take_only, c_force, cand_p)
    timeit("gather_raw force (F=12)", gr_force, c_force, cand_p)
    timeit("gather_raw pos (F=4)", gr_pos, c_pos, cand_p)
timeit("density gather+kernel", dens_kernel, q_pos, c_pos, cand_sub, count_sub,
       real)
timeit("force gather+kernel", force_kernel, q_force, c_force, cand_sub,
       count_sub, real, state_s.density)
timeit("cand+refine (from state)", refine_only, state_s, real)
timeit("FULL density+forces nl", full_nl, state_s, real)
timeit("FULL substep", lambda s, d: substep_jit(s, d, params, scene_dev, cfg)[0],
       state, dt)
