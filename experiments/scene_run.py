"""Flow-through scene workload runner (BASELINE.md matrix #5).

Runs the full production engine (frame_jit loop, capacity autotune,
async Houdini .geo export) on a mesh scene with the particle lattice
placed INSIDE the scene (the default cube lattice of
core/state.py:62-78 is sized for dam-breaks and overflows long channels
like river.obj). Reports wall-clock per frame and per substep.

    python experiments/scene_run.py river --n 1048576 --frames 3
    python experiments/scene_run.py labyrinth --n 1048576 --frames 3

The lattice fills a box fit to the scene bounding box (shrunk by
--margin on x/z, resting at --y0), preserving the fluid's rest spacing
(particle count fixes total volume; the box just reshapes it).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# scene-interior lattice boxes (x/z extent fraction of scene bbox, y0).
# y0 sits just above the bed: dropping 1M particles from height floors
# the adaptive dt at DT_MIN on impact (~1.7k substeps/frame) — valid
# physics but not a throughput workload.
PLACEMENTS = {
    "river": dict(frac=(0.92, 0.8), y0=-1.45),
    "labyrinth": dict(frac=(0.9, 0.9), y0=-1.45),
    "box": dict(frac=(0.8, 0.8), y0=-1.45),
    "cube": None,
    "monkeybox": dict(frac=(0.8, 0.8), y0=0.5),
}


def scene_bbox(path):
    vs = []
    for line in open(path):
        if line.startswith("v "):
            vs.append([float(x) for x in line.split()[1:4]])
    a = np.array(vs, np.float32)
    return a.min(0), a.max(0)


def lattice_in_box(n, volume, lo, hi):
    """n particles at rest spacing (total volume fixed) filling the
    footprint [lo, hi] in x/z upward from lo.y, x-fastest ordering."""
    dx = float(np.cbrt(volume / n))  # rest spacing
    nx = max(1, int((hi[0] - lo[0]) / dx))
    nz = max(1, int((hi[2] - lo[2]) / dx))
    i = np.arange(n)
    x = (i % nx) * dx + lo[0]
    z = ((i // nx) % nz) * dx + lo[2]
    y = (i // (nx * nz)) * dx + lo[1]
    return np.stack([x, y, z], axis=1).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--n", type=int, default=1_048_576)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--fluid", default="water", choices=["water", "mucus"])
    ap.add_argument("--out", default=None, help="frame output prefix (default none)")
    ap.add_argument("--impl", default=None)
    ap.add_argument("--max-candidates", type=int, default=96)
    ap.add_argument("--max-candidates-sub", type=int, default=192)
    args = ap.parse_args()

    import jax

    from libclsph_tpu.core.state import ParticleState
    from libclsph_tpu.engine.simulation import SPHSimulation
    from libclsph_tpu.engine.step import StepConfig
    from libclsph_tpu.io.houdini import HoudiniFileSaver
    from libclsph_tpu.models.presets import FLUIDS, simulation_config
    from libclsph_tpu.core.params import derive_parameters
    import jax.numpy as jnp

    impl = args.impl or ("pallas" if jax.default_backend() == "tpu" else "tiles")
    cfg = StepConfig(
        neighbor_impl=impl,
        max_candidates=args.max_candidates,
        max_candidates_sub=args.max_candidates_sub,
    )
    sim = SPHSimulation(step_config=cfg)
    p = derive_parameters(
        dict(FLUIDS[args.fluid]),
        simulation_config(
            particles_count=args.n,
            simulation_time=args.frames / 60.0,
        ),
    )
    sim.parameters = p
    sim.precomputed_terms = p.precomputed()
    sim.initial_volume = p.initial_volume
    sim.checkpoint_path = "/tmp/scene_run_nonexistent.npz"  # no resume
    sim.load_scene(args.scene + ".obj", scenes_dir="scenes")

    placement = PLACEMENTS.get(args.scene)
    if placement is not None:
        lo, hi = scene_bbox(f"scenes/{args.scene}.obj")
        fx, fz = placement["frac"]
        cx, cz = (lo[0] + hi[0]) / 2, (lo[2] + hi[2]) / 2
        lo_box = np.array(
            [cx - fx * (hi[0] - lo[0]) / 2, placement["y0"], cz - fz * (hi[2] - lo[2]) / 2]
        )
        hi_box = np.array(
            [cx + fx * (hi[0] - lo[0]) / 2, hi[1], cz + fz * (hi[2] - lo[2]) / 2]
        )
        pos = lattice_in_box(args.n, p.initial_volume, lo_box, hi_box)
        print(
            f"lattice: {args.n} particles in [{lo_box.round(2)}..{hi_box.round(2)}] "
            f"top y={pos[:,1].max():.2f}",
            file=sys.stderr,
        )
        n = args.n
        custom = ParticleState(
            position=jnp.asarray(pos),
            velocity=jnp.zeros((n, 3), jnp.float32),
            intermediate_velocity=jnp.zeros((n, 3), jnp.float32),
            acceleration=jnp.zeros((n, 3), jnp.float32),
            density=jnp.zeros((n,), jnp.float32),
            pressure=jnp.zeros((n,), jnp.float32),
            grid_index=jnp.zeros((n,), jnp.uint32),
        )
        sim.init_particles = lambda: custom

    if args.out:
        saver = HoudiniFileSaver(args.out)
        sim.save_frame = lambda arrays, params: saver.write_frame_to_file(
            arrays, params
        )

    frame_times = []
    t_last = time.perf_counter()

    def post_frame(arrays, params, full):
        nonlocal t_last
        now = time.perf_counter()
        frame_times.append(now - t_last)
        t_last = now
        return False

    sim.post_frame = post_frame

    t0 = time.perf_counter()
    duration = sim.simulate()
    steady = frame_times[1:] or frame_times
    dt_final = 1.0 / 60.0 / 10.0  # not exact; report frame economics
    result = {
        "metric": f"{args.fluid} {args.scene} flow-through @ {args.n}",
        "frames": len(frame_times),
        "first_frame_s": round(frame_times[0], 2) if frame_times else None,
        "steady_s_per_frame": round(sum(steady) / len(steady), 2),
        "total_s": round(duration, 2),
        "impl": impl,
        "export": bool(args.out),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
