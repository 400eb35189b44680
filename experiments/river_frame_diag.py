"""Isolate the river-1M frame-3 worker crash: drive frame_jit directly
(as the engine fast path does), printing per-dispatch progress.

    python experiments/river_frame_diag.py [cap] [scene] [frames]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libclsph_tpu.core.params import derive_parameters
from libclsph_tpu.core.state import ParticleState
from libclsph_tpu.engine.step import StepConfig, frame_jit
from libclsph_tpu.models.presets import FLUIDS, simulation_config
from libclsph_tpu.ops import collisions as collisions_ops
from libclsph_tpu.scene.scene import Scene

CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SCENE = sys.argv[2] if len(sys.argv) > 2 else "river"
FRAMES = int(sys.argv[3]) if len(sys.argv) > 3 else 5
N = 1_048_576

p = derive_parameters(dict(FLUIDS["water"]), simulation_config(particles_count=N))
sdev = None
if SCENE != "none":
    sdev = collisions_ops.build_device_scene(
        Scene.load(SCENE + ".obj", p.h * 2, scenes_dir="scenes")
    )

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
cfg = StepConfig(neighbor_impl="pallas", substeps_per_dispatch=CAP,
                 max_candidates=96, max_candidates_sub=192)
dt = jnp.float32(p.frame_time * p.simulation_scale)

for f in range(FRAMES):
    timeleft = jnp.float32(p.frame_time)
    d = 0
    while float(timeleft) > 0.0:
        t0 = time.perf_counter()
        state, dt, timeleft, flags = frame_jit(
            state, dt, timeleft, p, sdev, cfg
        )
        tl = float(timeleft)
        print(
            f"frame {f} dispatch {d}: {time.perf_counter()-t0:.1f}s "
            f"timeleft {tl:.5f} dt {float(dt):.6f} flags {int(flags)}",
            flush=True,
        )
        d += 1
    pp = np.asarray(state.position)
    print(f"frame {f} done; pos y [{pp[:,1].min():.2f}, {pp[:,1].max():.2f}] "
          f"x [{pp[:,0].min():.2f}, {pp[:,0].max():.2f}]", flush=True)
