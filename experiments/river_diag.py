"""Diagnose the river-at-1M candidate-capacity escalation: run the
substep loop directly, printing block candidate counts / refined
counts / flags / position extents each step."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libclsph_tpu.core.params import derive_parameters
from libclsph_tpu.core.state import ParticleState
from libclsph_tpu.engine.step import StepConfig, substep_jit
from libclsph_tpu.models.presets import FLUIDS, simulation_config
from libclsph_tpu.ops import collisions as collisions_ops
from libclsph_tpu.ops import grid as grid_ops
from libclsph_tpu.ops import tiles as tiles_ops
from libclsph_tpu.scene.scene import Scene

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30

p = derive_parameters(
    dict(FLUIDS["water"]), simulation_config(particles_count=N)
)
scene = Scene.load("river.obj", p.h * 2, scenes_dir="scenes")
sdev = collisions_ops.build_device_scene(scene)

lo, hi = np.array([-5.52, -1.45, -1.2]), np.array([5.52, 1.7, 1.2])
dx = float(np.cbrt(p.initial_volume / N))
nx = max(1, int((hi[0] - lo[0]) / dx))
nz = max(1, int((hi[2] - lo[2]) / dx))
i = np.arange(N)
pos = np.stack(
    [(i % nx) * dx + lo[0], (i // (nx * nz)) * dx + lo[1],
     ((i // nx) % nz) * dx + lo[2]], 1
).astype(np.float32)
print("h", p.h, "dx", dx, "top", pos[:, 1].max(), flush=True)

state = ParticleState(
    position=jnp.asarray(pos),
    velocity=jnp.zeros((N, 3), jnp.float32),
    intermediate_velocity=jnp.zeros((N, 3), jnp.float32),
    acceleration=jnp.zeros((N, 3), jnp.float32),
    density=jnp.zeros((N,), jnp.float32),
    pressure=jnp.zeros((N,), jnp.float32),
    grid_index=jnp.zeros((N,), jnp.uint32),
)
cfg = StepConfig(neighbor_impl="pallas", max_candidates=96,
                 max_candidates_sub=192)
dt = jnp.float32(p.max_dt)


@jax.jit
def counts_probe(state):
    grid = grid_ops.compute_bounds(state.position, p)
    codes = grid_ops.locate_in_grid(state.position, grid)
    np_ = tiles_ops.padded_count(N, cfg.block_size)
    pad = np_ - N
    st = state
    if pad:
        far = grid.max_point + 1000.0 * p.h
        st = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
            ), st)
        st = st.replace(position=st.position.at[N:].set(far))
        codes = jnp.concatenate(
            [codes, jnp.full((pad,), tiles_ops.SENTINEL_CODE, jnp.uint32)])
    st, _, _ = grid_ops.sort_by_cell(st, codes)
    real = jnp.arange(st.position.shape[0], dtype=jnp.int32) < N
    blocked = tiles_ops.make_blocked(
        st.position, st.velocity, st.density, st.pressure, real,
        cfg.block_size)
    bmin, bmax = tiles_ops.split_block_bounds(blocked.position, blocked.real)
    cand, count, ovf = tiles_ops.candidate_blocks_auto(bmin, bmax, p.h, 96)
    sub_lo, sub_hi = tiles_ops.subblock_bounds(blocked.position, blocked.real, 4)
    cand_sub, count_sub, ovf2 = tiles_ops.refine_candidates(
        cand, count, bmin, bmax, sub_lo, sub_hi, p.h, 4, 192)
    ext = jnp.max(bmax - bmin, axis=0)
    return (count.max(), count.mean(), count_sub.max(),
            jnp.asarray(count_sub, jnp.float32).mean(), ovf, ovf2, ext,
            grid.grid_size)


for s in range(STEPS):
    if s % 4 == 0:
        cm, cmean, sm, smean, o1, o2, ext, gs = [
            np.asarray(x) for x in counts_probe(state)
        ]
        pp = np.asarray(state.position)
        vv = np.asarray(state.velocity)
        rho = np.asarray(state.density)
        print(f"step {s}: blockmax {cm} mean {cmean:.1f} submax {sm} "
              f"submean {smean:.1f} ovf {o1}/{o2} dt {float(dt):.6f} "
              f"maxv {np.abs(vv).max():.2f} maxrho {rho.max():.0f} "
              f"y[{pp[:,1].min():.2f},{pp[:,1].max():.2f}]", flush=True)
    state, dt, flags = substep_jit(state, dt, p, sdev, cfg)
    f = int(flags)
    if f:
        print(f"FLAGS at step {s}:", f, flush=True)
