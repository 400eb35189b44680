"""Headless CLI — the reference's example/particles.cpp as a console
entry point.

Same four positional arguments (particles.cpp:13-16):

    python -m libclsph_tpu.cli <fluid> <sim_properties> <scene> <out_prefix>

resolving ``fluid_properties/<fluid>.json``,
``simulation_properties/<sim>.json`` and ``scenes/<scene>`` exactly like
the reference (particles.cpp:23-25, :67), printing the same parameter
table (:42-65), wiring the Houdini frame saver + checkpoint callback
(:32-40), and timing the run (:102-109). Extra flags are additive
capabilities (no interactive confirm by default; ``--confirm``
restores it).
"""

from __future__ import annotations

import argparse
import os
import dataclasses
import sys

from .engine.simulation import SPHSimulation
from .engine.step import StepConfig
from .io.houdini import HoudiniFileSaver


def build_arg_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="sph",
        description="TPU-native SPH fluid simulation (libclsph-tpu)",
    )
    ap.add_argument("fluid", help="fluid properties name (fluid_properties/<name>.json)")
    ap.add_argument(
        "simulation", help="simulation properties name (simulation_properties/<name>.json)"
    )
    ap.add_argument("scene", help="scene OBJ name (scenes/<name>[.obj])")
    ap.add_argument("out_prefix", help="frames folder prefix")
    ap.add_argument("--partio", action="store_true", help="write .bgeo instead of .geo")
    ap.add_argument(
        "--neighbor-impl", choices=["tiles", "pallas", "exact"], default=None,
        help="default: 'pallas' on TPU, 'tiles' elsewhere",
    )
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--max-candidates", type=int, default=64)
    ap.add_argument("--tile-mode", choices=["direct", "mxu"], default="direct")
    ap.add_argument(
        "--pallas-variant", choices=["nl", "asm", "row", "fine", "asym"],
        default="nl",
        help="pallas kernel family (nl = gathered subblock lists, the "
        "fastest measured at 64k-4M; asm = in-kernel assembly)",
    )
    ap.add_argument("--nl-query-rows", type=int, default=128)
    ap.add_argument("--max-candidates-sub", type=int, default=192)
    ap.add_argument("--max-candidates-hit", type=int, default=128)
    ap.add_argument(
        "--no-hit-compact", action="store_true",
        help="disable the force pass's true-hit candidate compaction",
    )
    ap.add_argument(
        "--force-query-rows", type=int, default=32, choices=[32, 128],
        help="force-pass query granularity (32 = per-subgroup hit lists)",
    )
    ap.add_argument(
        "--force-sub16", action=argparse.BooleanOptionalAction, default=True,
        help="16-wide candidate subblocks for the q32 force pass",
    )
    ap.add_argument(
        "--max-candidates-hit16", type=int, default=64,
        help="per-subgroup capacity for the 16-wide force pass",
    )
    ap.add_argument(
        "--density-sub16", action=argparse.BooleanOptionalAction, default=True,
        help="16-wide candidate subblocks for the density pass too",
    )
    ap.add_argument(
        "--force-sub8", action=argparse.BooleanOptionalAction, default=True,
        help="8-wide candidate subblocks for the q32 force pass "
        "(requires --density-sub16; single-chip only)",
    )
    ap.add_argument(
        "--max-candidates-hit8", type=int, default=80,
        help="per-subgroup capacity for the 8-wide force pass",
    )
    ap.add_argument(
        "--tier2-frac", type=int, default=0,
        help="two-tier candidate-capacity routing (0 = off)",
    )
    ap.add_argument(
        "--sort-interval", type=int, default=4,
        help="re-sort particles every k-th substep (single-chip only)",
    )
    ap.add_argument(
        "--cand-interval", type=int, default=4,
        help="rebuild candidate lists every k-th substep (Verlet-list "
        "reuse; device-guarded, single-chip only; must divide "
        "--sort-interval)",
    )
    ap.add_argument(
        "--cand-slack", type=float, default=0.25,
        help="candidate-reuse refine dilation as a fraction of h",
    )
    ap.add_argument(
        "--confirm", action="store_true",
        help="ask for confirmation before simulating (reference behaviour)",
    )
    ap.add_argument(
        "--import-legacy", metavar="LAST_FRAME_BIN", default=None,
        help="resume from a reference-format last_frame.bin checkpoint",
    )
    ap.add_argument(
        "--mesh", type=int, default=0, metavar="N",
        help="run data-parallel over the first N devices (0 = single device)",
    )
    ap.add_argument(
        "--exchange", choices=["all_gather", "halo", "ring"],
        default="all_gather",
        help="multi-chip neighbour exchange strategy (with --mesh)",
    )
    ap.add_argument(
        "--halo-max", type=int, default=0,
        help="surface-block budget for halo/ring exchange (0 = all blocks)",
    )
    ap.add_argument(
        "--halo-hops", type=int, default=1,
        help="ring exchange: ppermute hops per direction",
    )
    ap.add_argument(
        "--pretune", choices=["auto", "on", "off"], default="auto",
        help="init-state capacity probe before the first compile "
        "(engine/pretune.py); auto = on for >= 200k particles",
    )
    ap.add_argument("--root", default=".", help="directory holding fluid_properties/ etc.")
    return ap


def main(argv=None) -> int:
    args = build_arg_parser().parse_args(argv)

    if args.neighbor_impl is None:
        import jax

        args.neighbor_impl = (
            "pallas" if jax.default_backend() == "tpu" else "tiles"
        )
    cfg = StepConfig(
        neighbor_impl=args.neighbor_impl,
        block_size=args.block_size,
        max_candidates=args.max_candidates,
        tile_mode=args.tile_mode,
        pallas_variant=args.pallas_variant,
        nl_query_rows=args.nl_query_rows,
        max_candidates_sub=args.max_candidates_sub,
        max_candidates_hit=args.max_candidates_hit,
        hit_compact=not args.no_hit_compact,
        force_query_rows=args.force_query_rows,
        force_sub16=args.force_sub16,
        max_candidates_hit16=args.max_candidates_hit16,
        density_sub16=args.density_sub16,
        force_sub8=args.force_sub8 and not args.mesh,
        max_candidates_hit8=args.max_candidates_hit8,
        tier2_frac=args.tier2_frac,
        sort_interval=args.sort_interval,
        cand_interval=args.cand_interval,
        cand_slack=args.cand_slack,
    )
    ap = build_arg_parser()
    if args.mesh and cfg.cand_interval != 1 and cfg.neighbor_impl != "pallas":
        # the sharded candidate carry is an nl-kernel feature; with the
        # tiles impl quietly rebuild every substep (defaults) or error
        # on an explicit request
        if args.cand_interval != ap.get_default("cand_interval"):
            print("--cand-interval > 1 with --mesh requires "
                  "--neighbor-impl pallas", file=sys.stderr)
            return -1
        cfg = dataclasses.replace(cfg, cand_interval=1)
    if (
        cfg.cand_interval > 1
        and cfg.sort_interval % cfg.cand_interval
        and args.cand_interval == ap.get_default("cand_interval")
    ):
        # the user pinned --sort-interval but left --cand-interval at
        # its default: clamp the default down to a divisor instead of
        # failing the divisibility check below
        import math

        cfg = dataclasses.replace(
            cfg,
            cand_interval=math.gcd(cfg.cand_interval, cfg.sort_interval),
        )
    if cfg.cand_interval > 1 and cfg.sort_interval % cfg.cand_interval:
        print("--cand-interval must divide --sort-interval", file=sys.stderr)
        return -1
    if cfg.cand_interval > 1 and (
        cfg.neighbor_impl != "pallas" or cfg.pallas_variant != "nl"
        or cfg.nl_query_rows < cfg.block_size
    ):
        # candidate reuse is a perf feature of the production nl shape;
        # quietly rebuild every substep on other shapes
        cfg = dataclasses.replace(cfg, cand_interval=1)
    if cfg.density_sub16 and (
        cfg.neighbor_impl != "pallas"
        or min(cfg.block_size, cfg.nl_query_rows) < 128
    ):
        # the 16-granular density path needs the pallas nl shape at
        # whole-128 query rows; quietly fall back elsewhere
        cfg = dataclasses.replace(cfg, density_sub16=False)
    if cfg.force_sub8 and not cfg.density_sub16:
        # sub-8 rides the 16-granular tables; follows the same fallback
        cfg = dataclasses.replace(cfg, force_sub8=False)
    mesh = None
    if args.mesh:
        import jax

        from .parallel.mesh import make_mesh

        devices = jax.devices()[: args.mesh]
        if len(devices) < args.mesh:
            print(
                f"only {len(devices)} device(s) available, requested {args.mesh}",
                file=sys.stderr,
            )
            return -1
        mesh = make_mesh(devices)
    simulation = SPHSimulation(
        step_config=cfg, mesh=mesh, exchange=args.exchange,
        halo_max=args.halo_max, halo_hops=args.halo_hops,
        pretune={"auto": "auto", "on": True, "off": False}[args.pretune],
    )
    saver = HoudiniFileSaver(args.out_prefix, use_partio=args.partio)

    try:
        simulation.load_settings(
            os.path.join(args.root, "fluid_properties", args.fluid + ".json"),
            os.path.join(args.root, "simulation_properties", args.simulation + ".json"),
        )
    except Exception as ex:  # same failure path as particles.cpp:27-30
        print(ex, file=sys.stderr)
        return -1

    if args.mesh and args.exchange in ("halo", "ring") and not args.halo_max:
        # default surface budget: every local block may be surface
        from .ops.tiles import padded_count

        n = simulation.parameters.particles_count
        chunk = args.mesh * args.block_size
        padded = -(-n // chunk) * chunk
        simulation.halo_max = padded // chunk

    def save_frame(arrays, params):
        saver.write_frame_to_file(arrays, params)

    simulation.save_frame = save_frame

    p = simulation.parameters
    print(
        f"""
Loaded parameters
-----------------
Simulation time:           {p.simulation_time:g}
Target FPS:                {p.target_fps:g}
Simulation scale:          {p.simulation_scale:g}
Write intermediate frames: {'true' if simulation.write_intermediate_frames else 'false'}
Serialize frames:          {'true' if simulation.serialize else 'false'}

Particle count:            {p.particles_count}
Particle mass:             {p.particle_mass:g}
Total mass:                {p.total_mass:g}
Initial volume:            {simulation.initial_volume:g}

Fluid density:             {p.fluid_density:g}
Dynamic viscosity:         {p.dynamic_viscosity:g}
Surface tension threshold: {p.surface_tension_threshold:g}
Surface tension:           {p.surface_tension:g}
Stiffness (k):             {p.K:g}
Restitution:               {p.restitution:g}

Kernel support radius (h): {p.h:g}

Saving to folder:          {args.out_prefix}frames/"""
    )

    scene_name = args.scene if args.scene.endswith(".obj") else args.scene + ".obj"
    try:
        simulation.load_scene(scene_name, scenes_dir=os.path.join(args.root, "scenes"))
    except Exception as ex:
        print(f"Unable to load scene: {args.scene} ({ex})", file=sys.stderr)
        return -1

    if args.import_legacy:
        from .io.checkpoint import save_checkpoint
        from .io.legacy import read_legacy_checkpoint

        try:
            arrays = read_legacy_checkpoint(
                args.import_legacy, simulation.parameters.particles_count
            )
        except (OSError, ValueError) as ex:
            print(ex, file=sys.stderr)
            return 1
        save_checkpoint(simulation.checkpoint_path, arrays, simulation.parameters)
        print(f"Imported legacy checkpoint {args.import_legacy}")

    if args.confirm:
        print(
            "\nRevise simulation parameters. Press q to quit, any other "
            "key to proceed with simulation"
        )
        if input().strip().lower() == "q":
            return 0

    try:
        duration = simulation.simulate()
    except RuntimeError as ex:
        # e.g. stale checkpoint (reference aborts similarly on a
        # wrong-size last_frame.bin, particles.cpp:89-92)
        print(ex, file=sys.stderr)
        return 1
    print(f"Duration : {duration:g}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
