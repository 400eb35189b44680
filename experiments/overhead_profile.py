"""TPU timing of the non-kernel substep overheads at 1M and variants:

- candidate_blocks_auto (hierarchical search; sort-compaction inside)
- refine_candidates (sort-compaction of (nb, M*4) keys)
- refine with lax.top_k instead of sort
- refine with M=64 instead of 96
- handle_collisions (8 single gathers) vs 4x 2-wide lax.gather
- sort_by_cell, advect

Run on TPU: python experiments/overhead_profile.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libclsph_tpu.core.params import derive_parameters
from libclsph_tpu.core.state import init_state
from libclsph_tpu.engine.step import StepConfig, substep_jit
from libclsph_tpu.ops import collisions as collisions_ops
from libclsph_tpu.ops import grid as grid_ops
from libclsph_tpu.ops import tiles as tiles_ops
from libclsph_tpu.scene.scene import Scene

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

fluid = dict(fluid_density=998.29, dynamic_viscosity=3.5, restitution=0, k=100,
             surface_tension_threshold=7.065, surface_tension=0.0728,
             particles_inside_influence_radius=20)
sim = dict(particles_count=N, particle_mass=0.05, simulation_time=3,
           target_fps=60, simulation_scale=0.1,
           constant_acceleration=dict(x=0, y=-9.8, z=0))
params = derive_parameters(fluid, sim)
cfg = StepConfig(neighbor_impl="pallas", pallas_variant="asm",
                 max_candidates=96, max_candidates_sub=192)

state = init_state(params)
dt = jnp.float32(params.max_dt)
scene = Scene.load("cube.obj", params.h * 2, scenes_dir="scenes")
scene_dev = collisions_ops.build_device_scene(scene)
for _i in range(3):
    state, dt, ovf = substep_jit(state, dt, params, scene_dev, cfg)
print("warm ok, flags:", int(ovf), file=sys.stderr)


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
    return state, real, blocked, bmin, bmax


state_s, real, blocked, bmin, bmax = jax.block_until_ready(prep(state))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:4])
    t = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:4])
    print(f"{name:34s} {(time.perf_counter() - t) / reps * 1000:8.2f} ms",
          flush=True)


@jax.jit
def cand96(bmin, bmax):
    return tiles_ops.candidate_blocks_auto(bmin, bmax, params.h, 96)


@jax.jit
def cand64(bmin, bmax):
    return tiles_ops.candidate_blocks_auto(bmin, bmax, params.h, 64)


cand, count, _ = jax.block_until_ready(cand96(bmin, bmax))
cand64v, count64, ovf64 = jax.block_until_ready(cand64(bmin, bmax))
print("cand64 overflow:", bool(ovf64), file=sys.stderr)


def make_refine(max_sub, use_topk):
    @jax.jit
    def run(blocked, cand, count, bmin, bmax):
        sub_lo, sub_hi = tiles_ops.subblock_bounds(
            blocked.position, blocked.real, 4)
        if not use_topk:
            return tiles_ops.refine_candidates(
                cand, count, bmin, bmax, sub_lo, sub_hi, params.h, 4, max_sub)
        # top_k-based compaction (drop-in for the jnp.sort)
        nb, m = cand.shape
        g_lo = jnp.take(sub_lo.reshape(-1, 4, 3), cand, axis=0)
        g_hi = jnp.take(sub_hi.reshape(-1, 4, 3), cand, axis=0)
        lo = (bmin - params.h)[:, :, None, None, :]
        hi = (bmax + params.h)[:, :, None, None, :]
        ov = jnp.any(
            jnp.all((lo <= g_hi[:, None]) & (hi >= g_lo[:, None]), axis=-1),
            axis=1)
        live = (jnp.arange(m, dtype=jnp.int32) < count[:, None])[:, :, None]
        ok = ov & live
        ids = cand[:, :, None] * 4 + jnp.arange(4, dtype=jnp.int32)
        keys = jnp.where(ok, ids, tiles_ops.REFINE_SENTINEL).reshape(nb, -1)
        neg, _idx = jax.lax.top_k(-keys, max_sub)
        return -neg, jnp.minimum(ok.reshape(nb, -1).sum(1), max_sub), False

    return run


timeit("candidate_blocks_auto M=96", cand96, bmin, bmax)
timeit("candidate_blocks_auto M=64", cand64, bmin, bmax)
timeit("refine sort (M=96, cap 192)", make_refine(192, False),
       blocked, cand, count, bmin, bmax)
timeit("refine sort (M=64, cap 192)", make_refine(192, False),
       blocked, cand64v, count64, bmin, bmax)
timeit("refine topk (M=96, cap 192)", make_refine(192, True),
       blocked, cand, count, bmin, bmax)

# ---- collisions
vel = state_s.velocity


@jax.jit
def collide(pos, vel):
    return collisions_ops.handle_collisions(
        scene_dev, pos, pos, vel, params.restitution, jnp.float32(1e-3))


timeit("handle_collisions (cube)", collide, state_s.position, vel)


@jax.jit
def sort_only(state):
    grid = grid_ops.compute_bounds(state.position, params)
    codes = grid_ops.locate_in_grid(state.position, grid)
    return grid_ops.sort_by_cell(state, codes)[0].position


timeit("bounds+locate+sort", sort_only, state)
