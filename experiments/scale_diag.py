"""Step-by-step dynamics probe at large N (cube-lattice dam-break,
like bench.py): dt / flags / max velocity / max density / candidate
counts per substep. Usage: python experiments/scale_diag.py N [steps]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from libclsph_tpu.core.params import derive_parameters
from libclsph_tpu.core.state import init_state
from libclsph_tpu.engine.step import StepConfig, substep_jit
from libclsph_tpu.models.presets import FLUIDS, simulation_config

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_194_304
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

p = derive_parameters(dict(FLUIDS["water"]), simulation_config(particles_count=N))
state = init_state(p)
cfg = StepConfig(neighbor_impl="pallas", max_candidates=96,
                 max_candidates_sub=192)
dt = jnp.float32(p.max_dt)

for s in range(STEPS):
    state, dt, flags = substep_jit(state, dt, p, None, cfg)
    v = np.asarray(state.velocity)
    rho = np.asarray(state.density)
    print(f"step {s}: dt {float(dt):.6f} flags {int(flags)} "
          f"maxv {np.abs(v).max():.3f} maxrho {rho.max():.0f} "
          f"minrho {rho.min():.0f} nan {np.isnan(v).any()}", flush=True)
