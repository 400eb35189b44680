"""Stage timing for the q32 force path at 1M: density hit_groups=4
overhead, compact_hits at (nb*4, mp), gather volume, and the q32 force
kernel vs the q128 one. Run ON TPU."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libclsph_tpu.core.params import derive_parameters
from libclsph_tpu.core.state import init_state
from libclsph_tpu.engine.step import StepConfig, substep_jit
from libclsph_tpu.ops import grid as grid_ops
from libclsph_tpu.ops import tiles as tiles_ops
from libclsph_tpu.ops.pallas import neighbor_nl as nl

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
MAXSUB = 128
MAXHIT = 96
CAP32 = 48

fluid = dict(fluid_density=998.29, dynamic_viscosity=3.5, restitution=0, k=100,
             surface_tension_threshold=7.065, surface_tension=0.0728,
             particles_inside_influence_radius=20)
sim = dict(particles_count=N, particle_mass=0.05, simulation_time=3,
           target_fps=60, simulation_scale=0.1,
           constant_acceleration=dict(x=0, y=-9.8, z=0))
params = derive_parameters(fluid, sim)
cfg = StepConfig(neighbor_impl="pallas", pallas_variant="nl",
                 max_candidates=96, max_candidates_sub=MAXSUB,
                 max_candidates_hit=MAXHIT)
state = init_state(params)
dt = jnp.float32(params.max_dt)
for _ in range(3):
    state, dt, _ = substep_jit(state, dt, params, None, cfg)

terms = params.precomputed()


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
    state, sorted_codes, _ = grid_ops.sort_by_cell(state, codes)
    real = jnp.arange(state.position.shape[0], dtype=jnp.int32) < N
    return state, real


state_s, real = prep(state)
blocked = jax.jit(lambda s, r: tiles_ops.make_blocked(
    s.position, s.velocity, s.density, s.pressure, r, cfg.block_size))(state_s, real)
bmin, bmax = jax.jit(tiles_ops.split_block_bounds)(blocked.position, blocked.real)
cand, count, _ = jax.jit(lambda a, b: tiles_ops.candidate_blocks_auto(
    a, b, params.h, 96))(bmin, bmax)
sub = cfg.block_size // nl.SUB
cand_sub, count_sub, _ = jax.jit(lambda *a: tiles_ops.refine_candidates_exact(
    *a, params.h, sub, MAXSUB))(cand, count, bmin, bmax, blocked.position)
q_pos, q_force = jax.jit(lambda s, r: nl.make_query_planes(
    s.position, s.velocity, s.density, s.pressure, r, 128,
    mass=params.particle_mass))(state_s, real)
c_pos_pack, c_force_pack = jax.jit(lambda s, r: nl.make_csub_packs(
    s.position, s.velocity, s.density, s.pressure, r,
    mass=params.particle_mass))(state_s, real)


@jax.jit
def stage_density_h1(q, c, cs, cn, real):
    return nl.fused_density_nl(q, c, cs, cn, params, terms, real,
                               want_hits=True)


@jax.jit
def stage_density_h4(q, c, cs, cn, real):
    return nl.fused_density_nl(q, c, cs, cn, params, terms, real,
                               want_hits=True, hit_groups=nl.QG)


@jax.jit
def stage_compact_q128(cs, hits):
    return tiles_ops.compact_hits(cs, hits[:, :cs.shape[1]], MAXHIT)


@jax.jit
def stage_compact_q32(cs, hits4):
    cs4 = jnp.repeat(cs, nl.QG, axis=0)
    return tiles_ops.compact_hits(cs4, hits4[:, :cs.shape[1]], CAP32)


@jax.jit
def stage_forces_q128(qf, cf, cs, cn, real, density):
    return nl.fused_forces_nl(qf, cf, cs, cn, params, terms, real, density)


@jax.jit
def stage_forces_q32(qf, cf, cs32, cn32, real, density):
    return nl.fused_forces_nl32(qf, cf, cs32, cn32, params, terms, real,
                                density)


density, hits1 = stage_density_h1(q_pos, c_pos_pack, cand_sub, count_sub, real)
_, hits4 = stage_density_h4(q_pos, c_pos_pack, cand_sub, count_sub, real)
ch128, cn128, _ = stage_compact_q128(cand_sub, hits1)
ch32, cn32, ovf32 = stage_compact_q32(cand_sub, hits4)
print("q32 hit counts: mean %.1f max %d ovf %s" % (
    np.asarray(cn32).mean(), np.asarray(cn32).max(), bool(ovf32)),
    file=sys.stderr)


def timeit(name, fn, *args, reps=6):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    t1 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    t2 = time.perf_counter()
    print(f"{name:30s} {(t2 - t1) / reps * 1000:8.2f} ms")


timeit("density hits G=1", stage_density_h1, q_pos, c_pos_pack, cand_sub,
       count_sub, real)
timeit("density hits G=4", stage_density_h4, q_pos, c_pos_pack, cand_sub,
       count_sub, real)
timeit("compact q128 (nb,mp)->96", stage_compact_q128, cand_sub, hits1)
timeit("compact q32 (4nb,mp)->48", stage_compact_q32, cand_sub, hits4)
timeit("forces q128 (hit list)", stage_forces_q128, q_force, c_force_pack,
       ch128, cn128, real, density)
timeit("forces q32 (hit lists)", stage_forces_q32, q_force, c_force_pack,
       ch32, cn32, real, density)
