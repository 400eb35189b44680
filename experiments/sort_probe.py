"""Tail-phase timing at 1M: sort, bounds+locate, packs, advect+collide
+adaptive-dt — the non-kernel substep residue. Run ON TPU."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libclsph_tpu.core.params import derive_parameters
from libclsph_tpu.core.state import init_state
from libclsph_tpu.engine.step import StepConfig, substep_jit, _advect_collide
from libclsph_tpu.ops import grid as grid_ops
from libclsph_tpu.ops import integrate as integrate_ops
from libclsph_tpu.ops import tiles as tiles_ops
from libclsph_tpu.ops.pallas import neighbor_nl as nl

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

fluid = dict(fluid_density=998.29, dynamic_viscosity=3.5, restitution=0, k=100,
             surface_tension_threshold=7.065, surface_tension=0.0728,
             particles_inside_influence_radius=20)
sim = dict(particles_count=N, particle_mass=0.05, simulation_time=3,
           target_fps=60, simulation_scale=0.1,
           constant_acceleration=dict(x=0, y=-9.8, z=0))
params = derive_parameters(fluid, sim)
cfg = StepConfig(neighbor_impl="pallas", pallas_variant="nl",
                 max_candidates=96, max_candidates_sub=128,
                 max_candidates_hit=96)
state = init_state(params)
dt = jnp.float32(params.max_dt)
for _ in range(3):
    state, dt, _ = substep_jit(state, dt, params, None, cfg)


@jax.jit
def stage_bounds_locate(state):
    grid = grid_ops.compute_bounds(state.position, params)
    return grid_ops.locate_in_grid(state.position, grid)


@jax.jit
def stage_sort(state, codes):
    return grid_ops.sort_by_cell(state, codes)


@jax.jit
def stage_packs(state, real):
    q = nl.make_query_planes(state.position, state.velocity, state.density,
                             state.pressure, real, 128,
                             mass=params.particle_mass)
    c = nl.make_csub_packs(state.position, state.velocity, state.density,
                           state.pressure, real, mass=params.particle_mass)
    return q, c


@jax.jit
def stage_advect_dt(state, dt):
    new_state = _advect_collide(state, None, dt, params)
    return new_state, integrate_ops.compute_time_step(
        new_state.velocity, new_state.acceleration, params)


codes = stage_bounds_locate(state)
real = jnp.ones((N,), bool)


def timeit(name, fn, *args, reps=6):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    np.asarray(jax.tree.leaves(out)[0]).sum()
    t1 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    t2 = time.perf_counter()
    print(f"{name:28s} {(t2 - t1) / reps * 1000:8.2f} ms")


timeit("bounds + locate", stage_bounds_locate, state)
timeit("sort_by_cell (7-field state)", stage_sort, state, codes)
timeit("query+cand packs", stage_packs, state, real)
timeit("advect + dt (no scene)", stage_advect_dt, state, dt)

# ---- compaction-primitive shootout: the refine/compact stages pack
# live candidate ids to a max_sub prefix. Today: full row sort.
nb = N // 128
rng = np.random.default_rng(0)
for width, cap in [(3072, 96), (512, 128), (128, 96)]:
    keys = rng.integers(0, 2**29, size=(nb, width)).astype(np.int32)
    live = rng.random((nb, width)) < (60.0 / width)
    keys = np.where(live, keys, 2**30)
    kj = jnp.asarray(keys)

    @jax.jit
    def via_sort(k, cap=cap):
        return jnp.sort(k, axis=1)[:, :cap]

    @jax.jit
    def via_topk(k, cap=cap):
        v, _ = jax.lax.top_k(-k, cap)
        return -v

    @jax.jit
    def via_scatter(k, cap=cap):
        ok = k < 2**30
        pos = jnp.cumsum(ok, axis=1) - 1
        rows = jnp.broadcast_to(
            jnp.arange(k.shape[0], dtype=jnp.int32)[:, None], k.shape
        )
        slot = jnp.where(ok & (pos < cap), pos, cap)
        out = jnp.full((k.shape[0], cap + 1), 2**30, jnp.int32)
        return out.at[rows, slot].set(k, mode="drop")[:, :cap]

    timeit(f"sort    ({nb}x{width})->{cap}", via_sort, kj)
    timeit(f"top_k   ({nb}x{width})->{cap}", via_topk, kj)
    timeit(f"scatter ({nb}x{width})->{cap}", via_scatter, kj)
