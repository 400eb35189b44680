"""BASELINE matrix #4 as specified: shower.obj emitter onto monkey.obj
at 256k particles.

The reference's emitter mechanism is the pre_frame write-back hook
(sph_simulation.cpp:730-748): a callback that mutates the host particle
array and returns true re-uploads it. This harness drives the
production engine with a shower-head emitter whose nozzle sites come
from the actual shower.obj tray geometry (scenes/shower.obj): particles
that settle into the monkey.obj catch box are recycled to the nozzle
with a downward jet, so the steady state is a continuous 256k-particle
shower onto the obstacle — the matrix's "mesh-collision heavy" case
(monkey.obj: obstacle + catch box).

Prints one JSON line: median/mean s/frame, substeps, particle-steps/s.

    python experiments/emitter_run.py [--n 262144] [--frames 12]
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
from libclsph_tpu.scene.obj_loader import load_obj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--out", default=None, help="frame prefix (.geo export)")
    ap.add_argument("--recycle-frac", type=float, default=0.05,
                    help="max fraction of particles recycled per frame "
                    "(bounds the re-injection stack above the tray)")
    args = ap.parse_args()
    root = os.path.join(os.path.dirname(__file__), "..")

    # nozzle sites from the shower.obj tray: the perforated tray is the
    # band of quad vertices at y ~ 0.8 (scenes/generate.py shower
    # section); emission points are that vertex cloud, deduplicated on
    # a coarse grid — the water falls through the tray gaps onto the
    # monkey.obj obstacle below
    shower = load_obj(os.path.join(root, "scenes", "shower.obj"))
    v = np.asarray(shower.vertices)
    tray = v[np.abs(v[:, 1] - 0.81) < 0.03]
    key = np.round(tray[:, [0, 2]] / 0.02).astype(np.int64)
    _, first = np.unique(key, axis=0, return_index=True)
    sites = tray[np.sort(first)].copy()
    sites[:, 1] = 0.75  # emit just under the tray plane
    print(f"shower.obj: {len(v)} verts -> {len(sites)} nozzle sites",
          file=sys.stderr)

    sim = SPHSimulation(step_config=StepConfig(
        neighbor_impl="pallas", pallas_variant="nl",
        max_candidates=96, max_candidates_sub=192, max_candidates_hit=96,
        force_query_rows=32, force_sub16=True, density_sub16=True,
        max_candidates_hit16=64, force_sub8=True, max_candidates_hit8=80,
        # per-frame pre_frame uploads invalidate carried device state,
        # so the engine runs the per-frame rebuild schedule anyway;
        # cadence within a frame still applies
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
    sim.load_scene("monkey.obj", scenes_dir=os.path.join(root, "scenes"))

    # ---- initial state: a shower ALREADY in progress (r4 verdict #5 —
    # the default dam lattice spawns ~2.4 m above the recycle plane and
    # needs ~32 frames of free fall before the first recycle; the r4 run
    # measured a block drop, not the steady state). Build a falling
    # column from just above the recycle plane up toward the tray, with
    # the monkey.obj AABB (dilated) carved out, everything moving at the
    # nozzle jet velocity — recycling engages by frame ~3.
    import jax.numpy as jnp

    from libclsph_tpu.core.state import ParticleState

    p = sim.parameters
    spacing = (p.initial_volume / args.n) ** (1.0 / 3.0)
    half = 1.2  # column cross-section (covers the tray footprint)
    xs = np.arange(-half, half, spacing)
    zs = np.arange(-half, half, spacing)
    mk_lo = np.array([-0.75, -1.25, -0.64])  # monkey AABB + 0.1 dilation
    mk_hi = np.array([0.75, 0.05, 0.64])
    pts = []
    total = 0
    # start BELOW the recycle plane (-1.4): a shower in progress has
    # water already exiting the frame, so recycling engages on the
    # first post-step frame instead of after ~4 frames of free fall
    y = -1.55
    while total < args.n:
        xx, zz = np.meshgrid(xs, zs, indexing="ij")
        layer = np.stack(
            [xx.ravel(), np.full(xx.size, y), zz.ravel()], axis=1
        )
        inside = np.all((layer > mk_lo) & (layer < mk_hi), axis=1)
        kept = layer[~inside]
        pts.append(kept)
        total += len(kept)
        y += spacing
    pos = np.concatenate(pts)[: args.n].astype(np.float32)
    jet = np.tile(np.float32([0.0, -1.5, 0.0]), (args.n, 1))
    sim.init_particles = lambda: ParticleState(
        position=jnp.asarray(pos),
        velocity=jnp.asarray(jet),
        intermediate_velocity=jnp.asarray(jet),
        acceleration=jnp.zeros((args.n, 3), jnp.float32),
        density=jnp.zeros((args.n,), jnp.float32),
        pressure=jnp.zeros((args.n,), jnp.float32),
        grid_index=jnp.zeros((args.n,), jnp.uint32),
    )
    print(f"column init: y in [-1.55, {y:.2f}], spacing {spacing:.4f}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    recycled = [0]
    recycled_per_frame = []
    frame_times = []
    last = [time.perf_counter()]
    budget = max(1, int(args.n * args.recycle_frac))
    # re-injection lattice: a rest-spacing grid over the tray footprint
    # (the tray is perforated over its whole area — point nozzles would
    # stack hundreds of recycled particles inside one smoothing radius
    # and the Tait EOS (rho/rho0)^7 explodes them across the Morton
    # grid limit; measured rc=1 in r5_deliver.log emitter-256k-v2)
    gx = np.arange(-1.0, 1.0, spacing)
    tray_grid = np.stack(
        [a.ravel() for a in np.meshgrid(gx, gx, indexing="ij")], axis=1
    )
    per_layer = len(tray_grid)

    def emitter(arrays, params, is_full_frame):
        now = time.perf_counter()
        frame_times.append(now - last[0])
        last[0] = now
        pos, vel = arrays["position"], arrays["velocity"]
        # recycle particles that fell past the obstacle (monkey.obj is
        # the bare blob, no catch box — the continuous shower IS the
        # steady state) back under the tray with the jet velocity
        settled = pos[:, 1] < -1.4
        idx = np.where(settled)[0][:budget]
        recycled_per_frame.append(len(idx))
        if len(idx) == 0:
            return False
        k = len(idx)
        cells = np.concatenate([
            rng.permutation(per_layer)
            for _ in range(-(-k // per_layer))
        ])[:k]
        layer = np.arange(k) // per_layer
        pts = tray_grid[cells] + rng.uniform(
            -0.2 * spacing, 0.2 * spacing, (k, 2)
        )
        pos[idx, 0] = pts[:, 0]
        pos[idx, 2] = pts[:, 1]
        pos[idx, 1] = 0.75 + layer * spacing
        vel[idx] = [0.0, -1.5, 0.0]
        arrays["intermediate_velocity"][idx] = vel[idx]
        recycled[0] += k
        return True

    sim.pre_frame = emitter
    if args.out:
        from libclsph_tpu.io.houdini import HoudiniFileSaver

        saver = HoudiniFileSaver(args.out)
        sim.save_frame = lambda arrays, p: saver.write_frame_to_file(arrays, p)

    t0 = time.perf_counter()
    sim.simulate()
    wall = time.perf_counter() - t0

    ft = np.asarray(frame_times[1:])  # drop the compile frame
    steady = sum(1 for r in recycled_per_frame if r > 0)
    out = {
        "metric": "s/frame shower.obj emitter onto monkey.obj",
        "n": args.n,
        "frames": len(frame_times),
        "recycled": recycled[0],
        "recycled_per_frame": recycled_per_frame,
        "frames_with_recycling": steady,
        "median_s_per_frame": round(float(np.median(ft)), 3) if len(ft) else None,
        "mean_s_per_frame": round(float(ft.mean()), 3) if len(ft) else None,
        "first_frame_s": round(frame_times[0], 1) if frame_times else None,
        "wall_s": round(wall, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
