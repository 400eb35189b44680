"""Which capacity-overflow source fires at each escalation stage of
the river 1M workload? Prints level-1 superblock counts, level-2 block
counts, and refine subblock counts at several (max_candidates,
max_candidates_sub) settings."""

import sys

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

N = 1_048_576
p = derive_parameters(dict(FLUIDS["water"]), simulation_config(particles_count=N))
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

state = ParticleState(
    position=jnp.asarray(pos),
    velocity=jnp.zeros((N, 3), jnp.float32),
    intermediate_velocity=jnp.zeros((N, 3), jnp.float32),
    acceleration=jnp.zeros((N, 3), jnp.float32),
    density=jnp.zeros((N,), jnp.float32),
    pressure=jnp.zeros((N,), jnp.float32),
    grid_index=jnp.zeros((N,), jnp.uint32),
)
dt = jnp.float32(p.max_dt)
cfg0 = StepConfig(neighbor_impl="pallas")
# advance a few steps with the default config so the state matches the
# engine's first escalation point
for _ in range(3):
    state, dt, _f = substep_jit(state, dt, p, sdev, cfg0)


def probe(max_c, max_sub):
    @jax.jit
    def run(state):
        grid = grid_ops.compute_bounds(state.position, p)
        codes = grid_ops.locate_in_grid(state.position, grid)
        st, _, _ = grid_ops.sort_by_cell(state, codes)
        real = jnp.ones((N,), bool)
        blocked = tiles_ops.make_blocked(
            st.position, st.velocity, st.density, st.pressure, real, 128)
        bmin, bmax = tiles_ops.split_block_bounds(blocked.position, blocked.real)
        nb = bmin.shape[0]
        # ---- level-1 internals (mirror candidate_blocks_hierarchical)
        SUPER = tiles_ops.SUPER
        nsb = nb // SUPER
        n_boxes = bmin.shape[1]
        mb_min = bmin.reshape(nsb, SUPER, n_boxes, 3)
        mb_max = bmax.reshape(nsb, SUPER, n_boxes, 3)
        mem_lo = jnp.min(mb_min, axis=2)
        mem_hi = jnp.max(mb_max, axis=2)
        centers = 0.5 * (mem_lo + mem_hi)
        gap = jnp.linalg.norm(centers[:, 1:] - centers[:, :-1], axis=-1)
        split = jnp.argmax(gap, axis=1) + 1
        mem_idx = jnp.arange(SUPER)[None, :]
        big = jnp.float32(3.0e38)

        def sb_box(mask):
            m = mask[..., None]
            return (jnp.min(jnp.where(m, mem_lo, big), axis=1),
                    jnp.max(jnp.where(m, mem_hi, -big), axis=1))

        lo1, hi1 = sb_box(mem_idx < split[:, None])
        lo2, hi2 = sb_box(mem_idx >= split[:, None])
        sb_min = jnp.stack([lo1, lo2], axis=1)
        sb_max = jnp.stack([hi1, hi2], axis=1)
        h = p.h
        ov1 = jnp.zeros((nsb, nsb), bool)
        for a in range(2):
            for c in range(2):
                ov1 = ov1 | jnp.all(
                    (sb_min[:, None, a, :] - h <= sb_max[None, :, c, :])
                    & (sb_max[:, None, a, :] + h >= sb_min[None, :, c, :]),
                    axis=-1)
        sb_count = jnp.sum(ov1, axis=1)
        # ---- full auto path at the given caps
        super_cand = max(tiles_ops.SUPER_CAND, max_c)
        cand, count, ovf = tiles_ops.candidate_blocks_hierarchical(
            bmin, bmax, p.h, max_c, super_cand=super_cand)
        sub_lo, sub_hi = tiles_ops.subblock_bounds(
            blocked.position, blocked.real, 4)
        cand_sub, count_sub, ovf2 = tiles_ops.refine_candidates(
            cand, count, bmin, bmax, sub_lo, sub_hi, p.h, 4, max_sub)
        return (sb_count.max(), count.max(), count_sub.max(), ovf, ovf2)

    sbm, cm, sm, o1, o2 = [np.asarray(x) for x in run(state)]
    print(f"caps {max_c}/{max_sub} (super_cand {max(128, max_c)}): "
          f"sb_count max {sbm}, block count max {cm}, sub count max {sm}, "
          f"ovf {o1} ovf2 {o2}", flush=True)


for mc, ms in [(96, 192), (192, 384), (384, 768), (768, 1536)]:
    probe(mc, ms)
