"""Emitter example — interactive fluid editing via pre_frame.

The reference documents that a pre_frame callback returning true
writes the (mutated) particle array back to the device
(sph_simulation.cpp:730-748), which "doubles as an interactive
fluid-editing hook (e.g., emitters/drains implementable in user
code)". This example implements a shower-head emitter that recycles
settled particles back to the nozzle each frame.

    python examples/emitter.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from libclsph_tpu.core.params import derive_parameters
from libclsph_tpu.engine.simulation import SPHSimulation
from libclsph_tpu.engine.step import StepConfig
from libclsph_tpu.models.presets import WATER, simulation_config


def main():
    sim = SPHSimulation(step_config=StepConfig(neighbor_impl="tiles"))
    sim.parameters = derive_parameters(
        dict(WATER), simulation_config(particles_count=2048, simulation_time=0.25)
    )
    sim.precomputed_terms = sim.parameters.precomputed()
    sim.initial_volume = sim.parameters.initial_volume
    sim.load_scene(
        "box.obj", scenes_dir=os.path.join(os.path.dirname(__file__), "..", "scenes")
    )

    rng = np.random.default_rng(0)
    recycled = [0]

    def emitter(arrays, params, is_full_frame):
        pos, vel = arrays["position"], arrays["velocity"]
        # particles that fell past the recycling plane get teleported
        # back up to the nozzle with a downward jet velocity
        settled = pos[:, 1] < -0.2
        k = int(settled.sum())
        if k == 0:
            return False
        idx = np.where(settled)[0][:64]  # recycle at most 64/frame
        pos[idx] = rng.normal([0.0, 2.0, 0.0], [0.05, 0.02, 0.05], (len(idx), 3))
        vel[idx] = [0.0, -2.0, 0.0]
        arrays["intermediate_velocity"][idx] = vel[idx]
        recycled[0] += len(idx)
        return True  # write mutations back to the device

    sim.pre_frame = emitter
    sim.simulate()
    print(f"recycled {recycled[0]} particles through the emitter")


if __name__ == "__main__":
    main()
