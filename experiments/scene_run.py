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

# scene-interior lattice footprints (x/z extent fraction of the scene
# bbox) and per-scene particle-mass overrides. Placement is
# TERRAIN-AWARE: particles stack upward from the scene's support
# surface under each (x, z) column (ray-cast against the mesh), never
# intersecting geometry — a flat slab embeds inside sloped floors /
# interior baffles and the DF response ejects embedded particles at
# O(100 m/s), exploding the dynamics instantly (measured).
# River mass: the sloped channel holds ~1.2 m of fluid above the
# floor; default 0.05 kg/particle at 1M is 52.5 m^3, which physically
# overflows it — 0.025 kg keeps the free surface below the wall tops.
PLACEMENTS = {
    "river": dict(frac=(0.92, 0.8), mass=0.025),
    "labyrinth": dict(frac=(0.9, 0.9)),
    "box": dict(frac=(0.8, 0.8)),
    "cube": None,
    "monkeybox": dict(frac=(0.8, 0.8)),
}
CLEARANCE = 0.04  # gap between the support surface and the first layer


def load_tris(path):
    vs, fs = [], []
    for line in open(path):
        if line.startswith("v "):
            vs.append([float(x) for x in line.split()[1:4]])
        elif line.startswith("f "):
            fs.append([int(t.split("/")[0]) - 1 for t in line.split()[1:4]])
    v = np.array(vs, np.float32)
    return v, v[np.array(fs, np.int32)]  # (F, 3, 3)


def support_height(tris, xs, zs, default):
    """Highest mesh surface under each (x, z) column (vertical
    ray-cast, vectorised over faces); ``default`` where nothing is hit."""
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    # 2D barycentric in the x-z projection
    v0 = (b - a)[:, [0, 2]]
    v1 = (c - a)[:, [0, 2]]
    den = v0[:, 0] * v1[:, 1] - v0[:, 1] * v1[:, 0]  # (F,)
    ok_f = np.abs(den) > 1e-9  # skip vertical faces
    sup = np.full((len(xs),), default, np.float32)
    p = np.stack([xs, zs], axis=1)  # (C, 2)
    for f in np.nonzero(ok_f)[0]:
        d = p - a[f, [0, 2]]
        u = (d[:, 0] * v1[f, 1] - d[:, 1] * v1[f, 0]) / den[f]
        w = (v0[f, 0] * d[:, 1] - v0[f, 1] * d[:, 0]) / den[f]
        inside = (u >= -1e-6) & (w >= -1e-6) & (u + w <= 1 + 1e-6)
        y = a[f, 1] + u * (b[f, 1] - a[f, 1]) + w * (c[f, 1] - a[f, 1])
        sup = np.where(inside & (y > sup), y, sup)
    return sup


def terrain_lattice(n, volume, scene_path, frac):
    """n particles at rest spacing stacked on the scene's support
    surface: per-(x,z) column base from a vertical ray-cast, filled
    bottom-up layer by layer."""
    dx = float(np.cbrt(volume / n))  # rest spacing
    verts, tris = load_tris(scene_path)
    lo, hi = verts.min(0), verts.max(0)
    fx, fz = frac
    cx, cz = (lo[0] + hi[0]) / 2, (lo[2] + hi[2]) / 2
    x0, x1 = cx - fx * (hi[0] - lo[0]) / 2, cx + fx * (hi[0] - lo[0]) / 2
    z0, z1 = cz - fz * (hi[2] - lo[2]) / 2, cz + fz * (hi[2] - lo[2]) / 2
    nx = max(1, int((x1 - x0) / dx))
    nz = max(1, int((z1 - z0) / dx))
    gx = x0 + np.arange(nx) * dx
    gz = z0 + np.arange(nz) * dx
    cols_x = np.repeat(gx, nz)
    cols_z = np.tile(gz, nx)
    base = support_height(tris, cols_x, cols_z, lo[1]) + CLEARANCE
    layers = -(-n // (nx * nz))
    k = np.arange(layers)
    y = base[None, :] + k[:, None] * dx  # (layers, C)
    x = np.broadcast_to(cols_x, y.shape)
    z = np.broadcast_to(cols_z, y.shape)
    pos = np.stack([x, y, z], axis=-1).reshape(-1, 3)[:n]
    return pos.astype(np.float32)


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
    ap.add_argument("--legacy-config", action="store_true",
                    help="the r2-proven q128+autotune scene config "
                    "(A/B control for the r4 unified c16 defaults)")
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
    if args.legacy_config:
        # The r2-proven scene config: q128 + hit compaction, engine
        # autotune grows capacities as the water column deepens.
        # Measured r3 (native .geo writer built, uncontended host):
        # river 8.22 s/frame at 1M -> 5.80 with cand_interval 4.
        cfg = StepConfig(
            neighbor_impl=impl,
            max_candidates=args.max_candidates,
            max_candidates_sub=args.max_candidates_sub,
            sort_interval=4,
            cand_interval=4,
        )
    else:
        # r4 UNIFIED defaults — identical to the CLI/bench: the c16
        # kernels + cadence; deep-column overflows escalate to the
        # 16-granular tier-2 pool (c16_all) via the engine autotune
        # instead of a global capacity doubling.
        cfg = StepConfig(
            neighbor_impl=impl,
            max_candidates=args.max_candidates,
            max_candidates_sub=args.max_candidates_sub,
            max_candidates_hit=128,
            force_query_rows=32, force_sub16=True, density_sub16=True,
            max_candidates_hit16=64,
            force_sub8=True, max_candidates_hit8=80,
            sort_interval=4,
            cand_interval=4,  # Verlet reuse (predictive in-loop
            # staleness: frame_jit rebuilds when displacement-since-
            # anchor exceeds the slack budget)
        )
    sim = SPHSimulation(step_config=cfg)
    placement = PLACEMENTS.get(args.scene)
    mass = (placement or {}).get("mass", 0.05)
    p = derive_parameters(
        dict(FLUIDS[args.fluid]),
        simulation_config(
            particles_count=args.n,
            particle_mass=mass,
            simulation_time=args.frames / 60.0,
        ),
    )
    sim.parameters = p
    sim.precomputed_terms = p.precomputed()
    sim.initial_volume = p.initial_volume
    sim.checkpoint_path = "/tmp/scene_run_nonexistent.npz"  # no resume
    sim.load_scene(args.scene + ".obj", scenes_dir="scenes")

    if placement is not None:
        pos = terrain_lattice(
            args.n, p.initial_volume, f"scenes/{args.scene}.obj",
            placement["frac"],
        )
        print(
            f"lattice: {args.n} particles on terrain, mass {mass}, "
            f"y [{pos[:,1].min():.2f}, {pos[:,1].max():.2f}]",
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
