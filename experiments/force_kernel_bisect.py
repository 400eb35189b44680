"""Bisect the q128 force kernel's per-tile cost at 1M: time the
pallas_call alone on a prebuilt raw stream, then variants (no inner
any-guard, dot modes, density kernel for reference). Run ON TPU."""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libclsph_tpu.core import smoothing
from libclsph_tpu.core.params import derive_parameters
from libclsph_tpu.core.state import init_state
from libclsph_tpu.engine.step import StepConfig, substep_jit
from libclsph_tpu.ops import grid as grid_ops
from libclsph_tpu.ops import tiles as tiles_ops
from libclsph_tpu.ops.pallas import neighbor_nl as nl
from libclsph_tpu.ops.pallas.neighbor import (
    _forces_core_rowout, _density_core_rowout,
)

N = 1_000_000
MAXSUB = 128
MAXHIT = 96

fluid = dict(fluid_density=998.29, dynamic_viscosity=3.5, restitution=0, k=100,
             surface_tension_threshold=7.065, surface_tension=0.0728,
             particles_inside_influence_radius=20)
sim = dict(particles_count=N, particle_mass=0.05, simulation_time=3,
           target_fps=60, simulation_scale=0.1,
           constant_acceleration=dict(x=0, y=-9.8, z=0))
params = derive_parameters(fluid, sim)
terms = params.precomputed()
cfg = StepConfig(neighbor_impl="pallas", pallas_variant="nl",
                 max_candidates=96, max_candidates_sub=MAXSUB,
                 max_candidates_hit=MAXHIT)
state = init_state(params)
dt = jnp.float32(params.max_dt)
for _ in range(3):
    state, dt, _ = substep_jit(state, dt, params, None, cfg)


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
    return state, real


state_s, real = prep(state)
blocked = jax.jit(lambda s, r: tiles_ops.make_blocked(
    s.position, s.velocity, s.density, s.pressure, r, 128))(state_s, real)
bmin, bmax = jax.jit(tiles_ops.split_block_bounds)(blocked.position, blocked.real)
cand, count, _ = jax.jit(lambda a, b: tiles_ops.candidate_blocks_auto(
    a, b, params.h, 96))(bmin, bmax)
cand_sub, count_sub, _ = jax.jit(lambda *a: tiles_ops.refine_candidates_exact(
    *a, params.h, 4, MAXSUB))(cand, count, bmin, bmax, blocked.position)
q_pos, q_force = jax.jit(lambda s, r: nl.make_query_planes(
    s.position, s.velocity, s.density, s.pressure, r, 128,
    mass=params.particle_mass))(state_s, real)
c_pos_pack, c_force_pack = jax.jit(lambda s, r: nl.make_csub_packs(
    s.position, s.velocity, s.density, s.pressure, r,
    mass=params.particle_mass))(state_s, real)

# hit-compacted force list (the production input)
density, hits = jax.jit(lambda *a: nl.fused_density_nl(
    *a, params, terms, real, want_hits=True))(
    q_pos, c_pos_pack, cand_sub, count_sub)
cand_hit, count_hit, _ = jax.jit(lambda cs, h_: tiles_ops.compact_hits(
    cs, h_[:, :cs.shape[1]], MAXHIT))(cand_sub, hits)

cand_p, count_tiles = jax.jit(nl._pad_groups)(cand_hit, count_hit)
mp = cand_p.shape[1]
mg = mp // (nl.TPS * nl.GROUP)
raw_force = jax.jit(nl.gather_raw)(c_force_pack, cand_p)
nb = q_force.shape[0]
print(f"nb={nb} mp={mp} mg={mg} count mean {np.asarray(count_hit).mean():.1f}",
      file=sys.stderr)


def make_forces_kernel(guard, dot_mode):
    def kern(count_ref, q, qrow, c, out, *, h, spiky, visc, poly6_grad,
             poly6_lap, eps):
        i = pl.program_id(0)
        m = pl.program_id(1)

        @pl.when(m == 0)
        def _():
            out[...] = jnp.zeros_like(out)

        import libclsph_tpu.ops.pallas.neighbor as nbm
        old = nbm._DOT_MODE
        nbm._DOT_MODE = dot_mode
        try:
            for s in range(nl.TPS):

                @pl.when(m * nl.TPS + s < count_ref[i])
                def _(s=s):
                    tile = nl._tile_from_raw(c, s, 3)
                    _forces_core_rowout(
                        lambda k: q[0, k],
                        lambda k: tile[k: k + 1, :],
                        qrow, out,
                        h=h, spiky=spiky, visc=visc,
                        poly6_grad=poly6_grad, poly6_lap=poly6_lap, eps=eps,
                        r2_mxu=False,
                    )
        finally:
            nbm._DOT_MODE = old

    return functools.partial(
        kern, h=float(params.h), spiky=float(terms.spiky),
        visc=float(terms.viscosity),
        poly6_grad=float(terms.poly_6_gradient),
        poly6_lap=float(terms.poly_6_laplacian), eps=smoothing.EPSILON,
    )


def call_forces(kernel, raw, q, count_tiles):
    fs = raw.shape[1]
    f_q, b = q.shape[1], q.shape[2]
    q_row = q[..., 0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, mg),
        in_specs=[
            pl.BlockSpec((1, f_q, b, 1), lambda i, m, n_: (i, 0, 0, 0)),
            pl.BlockSpec((1, f_q, b), lambda i, m, n_: (i, 0, 0)),
            pl.BlockSpec((nl.TPS * nl.GROUP, fs),
                         lambda i, m, n_: (i * mg + m, 0)),
        ],
        out_specs=pl.BlockSpec((1, 10, b), lambda i, m, n_: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 10, b), jnp.float32),
    )(count_tiles, q, q_row, raw)


def timeit(name, fn, *args, reps=4):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    t1 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    t2 = time.perf_counter()
    print(f"{name:34s} {(t2 - t1) / reps * 1000:8.2f} ms")


timeit("gather_raw force (cap %d)" % mp,
       jax.jit(lambda cp, ci: nl.gather_raw(cp, ci)), c_force_pack, cand_p)

for mode in ("highest", "split3", "default"):
    k = make_forces_kernel(True, mode)
    timeit(f"forces kernel-only dot={mode}",
           jax.jit(lambda raw, q, ct, k=k: call_forces(k, raw, q, ct)),
           raw_force, q_force, count_tiles)

# zero-count control: pure grid/DMA bookkeeping, no compute
zero_counts = jnp.zeros_like(count_tiles)
k = make_forces_kernel(True, "highest")
timeit("forces kernel-only count=0 (DMA)",
       jax.jit(lambda raw, q, ct, k=k: call_forces(k, raw, q, ct)),
       raw_force, q_force, zero_counts)
