"""64k end-to-end s/frame (the reference's de-facto demo bar:
/root/reference/README.md:9-10 + example/opengl.cpp + 64k default at
simulation_properties/default.json).

Full production engine: adaptive substepping, frame_jit fast path,
async native .geo export — the same flow as the CLI. Reports
median/p90/mean s/frame over the run (the mean carries the impact
frames where the CFL dt shrinks — the reference's substepping
economics are identical).

    python experiments/e2e_64k.py [--n 65536] [--frames 30] [--no-export]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from libclsph_tpu.core.params import derive_parameters
from libclsph_tpu.engine.simulation import SPHSimulation
from libclsph_tpu.engine.step import StepConfig
from libclsph_tpu.models.presets import WATER, simulation_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--no-export", action="store_true")
    ap.add_argument("--out", default="/tmp/e2e64k_")
    args = ap.parse_args()
    root = os.path.join(os.path.dirname(__file__), "..")

    from libclsph_tpu.io.geo_format import have_native

    if not args.no_export and not have_native():
        sys.exit("build the native serializer first (BASELINE.md trap #1): "
                 "python native/setup.py build_ext --inplace")

    sim = SPHSimulation(step_config=StepConfig(
        neighbor_impl="pallas", pallas_variant="nl",
        max_candidates=96, max_candidates_sub=192, max_candidates_hit=96,
        force_query_rows=32, force_sub16=True, density_sub16=True,
        max_candidates_hit16=64, force_sub8=True, max_candidates_hit8=80,
        sort_interval=4, cand_interval=4,
    ))
    sim.parameters = derive_parameters(
        dict(WATER),
        simulation_config(
            particles_count=args.n,
            simulation_time=args.frames / 60.0,
        ),
    )
    sim.precomputed_terms = sim.parameters.precomputed()
    sim.initial_volume = sim.parameters.initial_volume
    sim.checkpoint_path = "/tmp/e2e64k_none.npz"
    sim.load_scene("cube.obj", scenes_dir=os.path.join(root, "scenes"))

    frame_times = []
    last = [time.perf_counter()]

    def post(arrays, params, is_full):
        now = time.perf_counter()
        frame_times.append(now - last[0])
        last[0] = now
        return False

    sim.post_frame = post
    if not args.no_export:
        from libclsph_tpu.io.houdini import HoudiniFileSaver

        saver = HoudiniFileSaver(args.out)
        sim.save_frame = lambda arrays, p: saver.write_frame_to_file(arrays, p)

    t0 = time.perf_counter()
    sim.simulate()
    wall = time.perf_counter() - t0

    steady = np.asarray(frame_times[1:]) if len(frame_times) > 1 else np.asarray(frame_times)
    print(json.dumps({
        "metric": "s/frame 64k water dam-break onto cube.obj (end-to-end)",
        "n": args.n,
        "frames": len(frame_times),
        "export": not args.no_export,
        "first_frame_s": round(frame_times[0], 2) if frame_times else None,
        "median_s_per_frame": round(float(np.median(steady)), 3),
        "p90_s_per_frame": round(float(np.percentile(steady, 90)), 3),
        "mean_s_per_frame": round(float(steady.mean()), 3),
        "fps_median": round(1.0 / float(np.median(steady)), 2),
        "wall_s": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
