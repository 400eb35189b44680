"""Stage-by-stage TPU timing of the nl pipeline at 1M particles.

Times each stage as a separate jitted function returning a scalar
digest (forces execution through the tunnel; block_until_ready alone
is unreliable on this image). Run ON TPU: python experiments/nl_profile.py
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
from libclsph_tpu.ops import grid as grid_ops
from libclsph_tpu.ops import tiles as tiles_ops
from libclsph_tpu.ops.pallas import neighbor_nl as nl

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
MAXSUB = 128
MAXHIT = 96
QROWS = 128

fluid = dict(fluid_density=998.29, dynamic_viscosity=3.5, restitution=0, k=100,
             surface_tension_threshold=7.065, surface_tension=0.0728,
             particles_inside_influence_radius=20)
sim = dict(particles_count=N, particle_mass=0.05, simulation_time=3,
           target_fps=60, simulation_scale=0.1,
           constant_acceleration=dict(x=0, y=-9.8, z=0))
params = derive_parameters(fluid, sim)
cfg = StepConfig(neighbor_impl="pallas", pallas_variant="nl",
                 max_candidates=96, max_candidates_sub=MAXSUB,
                 nl_query_rows=QROWS)

print(f"n={N} platform={jax.devices()[0].platform}", file=sys.stderr)
state = init_state(params)
dt = jnp.float32(params.max_dt)
for _ in range(3):
    state, dt, ovf = substep_jit(state, dt, params, None, cfg)
print("warm substeps done, flags:", int(ovf), file=sys.stderr)

# ---- build the stage inputs once (sorted state)
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


@jax.jit
def stage_cand(bmin, bmax):
    cand, count, ovf = tiles_ops.candidate_blocks_auto(bmin, bmax, params.h, 96)
    return cand, count, ovf


cand, count, _ = stage_cand(bmin, bmax)
sub = cfg.block_size // nl.SUB


@jax.jit
def stage_refine(blocked, cand, count, bmin, bmax):
    return tiles_ops.refine_candidates_exact(
        cand, count, bmin, bmax, blocked.position, params.h, sub, MAXSUB)


cand_sub, count_sub, _ = stage_refine(blocked, cand, count, bmin, bmax)
q_pos, q_force = jax.jit(lambda s, r: nl.make_query_planes(
    s.position, s.velocity, s.density, s.pressure, r, QROWS,
    mass=params.particle_mass))(state_s, real)
c_pos_pack, c_force_pack = jax.jit(lambda s, r: nl.make_csub_packs(
    s.position, s.velocity, s.density, s.pressure, r,
    mass=params.particle_mass))(state_s, real)

cs_padded, count_tiles = jax.jit(nl._pad_groups)(cand_sub, count_sub)


@jax.jit
def stage_gather_force(pack, cs):
    return nl.gather_tiles(pack, cs)


@jax.jit
def stage_density(q_pos, c_pos_pack, cand_sub, count_sub, real):
    return nl.fused_density_nl(q_pos, c_pos_pack, cand_sub, count_sub,
                               params, terms, real)


@jax.jit
def stage_density_hits(q_pos, c_pos_pack, cand_sub, count_sub, real):
    return nl.fused_density_nl(q_pos, c_pos_pack, cand_sub, count_sub,
                               params, terms, real, want_hits=True)


@jax.jit
def stage_compact(cand_sub, hits):
    return tiles_ops.compact_hits(cand_sub, hits[:, :cand_sub.shape[1]], MAXHIT)


@jax.jit
def stage_forces(q_force, c_force_pack, cand_sub, count_sub, real, density):
    return nl.fused_forces_nl(q_force, c_force_pack, cand_sub, count_sub,
                              params, terms, real, density)


density = stage_density(q_pos, c_pos_pack, cand_sub, count_sub, real)
_, hits = stage_density_hits(q_pos, c_pos_pack, cand_sub, count_sub, real)
cand_hit, count_hit, ovf_hit = stage_compact(cand_sub, hits)


def timeit(name, fn, *args, reps=6):
    out = fn(*args)  # compile
    digest = jax.tree.leaves(out)[0]
    float(jnp.sum(digest.astype(jnp.float32))) if digest.dtype != jnp.bool_ else bool(digest)
    t1 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    digest = jax.tree.leaves(out)[0]
    _ = np.asarray(digest)
    t2 = time.perf_counter()
    print(f"{name:28s} {(t2 - t1) / reps * 1000:8.2f} ms")


timeit("bounds+locate+sort (prep)", prep, state)
timeit("make_blocked", jax.jit(lambda s, r: tiles_ops.make_blocked(
    s.position, s.velocity, s.density, s.pressure, r, cfg.block_size)),
    state_s, real)
timeit("candidate_blocks (96)", stage_cand, bmin, bmax)
timeit("refine_candidates", stage_refine, blocked, cand, count, bmin, bmax)
timeit("fused_density_nl e2e", stage_density, q_pos, c_pos_pack, cand_sub, count_sub, real)
timeit("density + hit flags e2e", stage_density_hits, q_pos, c_pos_pack,
       cand_sub, count_sub, real)
timeit("compact_hits", stage_compact, cand_sub, hits)
timeit("forces (admitted list)", stage_forces, q_force, c_force_pack, cand_sub,
       count_sub, real, density)
timeit("forces (true-hit list)", stage_forces, q_force, c_force_pack, cand_hit,
       count_hit, real, density)

cnp = np.asarray(count)
csn = np.asarray(count_sub)
chn = np.asarray(count_hit)
print(f"cand128: mean {cnp.mean():.1f} max {cnp.max()}")
print(f"cand_sub: mean {csn.mean():.1f} max {csn.max()} "
      f"-> pairs/particle {csn.mean() * 32:.0f}")
print(f"cand_hit: mean {chn.mean():.1f} max {chn.max()} ovf {bool(ovf_hit)} "
      f"-> pairs/particle {chn.mean() * 32:.0f}")
