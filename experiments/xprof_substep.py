"""Per-op device-time breakdown of the production substep via xprof.

Takes a jax.profiler trace of K chained substeps at the given config,
then parses the xplane protobuf with tensorboard_plugin_profile and
prints the top HLO ops / named fusions by total device time. This is
the ONLY reliable per-stage attribution on this image: separately
dispatched stage timings are inflated ~40-60 ms each by the device
tunnel (see experiments/nl_profile.py results in r3_results.jsonl —
stages summed to 780 ms against a 245 ms whole substep).

Usage: python experiments/xprof_substep.py [--n N] [--steps K]
           [bench.py config flags...]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def parse_xplane(trace_dir):
    """Return [(op_name, total_us, occurrences)] from the newest xplane
    file, using the TPU (device) planes only."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    path = paths[-1]
    from xplane_lite import read_xspace

    totals = defaultdict(lambda: [0.0, 0])
    by_src = defaultdict(lambda: [0.0, 0])
    for pname, lines in read_xspace(path):
        # device planes: '/device:TPU:0' (+ ':TensorCore'), not host threads
        if "TPU" not in pname and "GPU" not in pname and "Device" not in pname:
            continue
        for lname, events in lines:
            # XLA op lines carry per-op events; step/module lines duplicate
            if "XLA Modules" in lname or "Steps" in lname:
                continue
            for op, stats, dur_ps in events:
                key = (pname, lname, op)
                totals[key][0] += dur_ps / 1e6
                totals[key][1] += 1
                src = stats.get(29) or stats.get("source_info") or ""
                tf_op = stats.get("tf_op") or ""
                skey = f"{src}  [{tf_op[:60]}]" if (src or tf_op) else "(none)"
                by_src[skey][0] += dur_ps / 1e6
                by_src[skey][1] += 1
    return path, totals, by_src


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--scene", default="cube")
    ap.add_argument("--nl-query-rows", type=int, default=128)
    ap.add_argument("--max-candidates-sub", type=int, default=128)
    ap.add_argument("--max-candidates-hit", type=int, default=96)
    ap.add_argument("--force-query-rows", type=int, default=128, choices=[32, 128])
    ap.add_argument("--force-sub16", action="store_true")
    ap.add_argument("--density-sub16", action="store_true")
    ap.add_argument("--max-candidates-hit16", type=int, default=64)
    ap.add_argument("--force-sub8", action="store_true")
    ap.add_argument("--max-candidates-hit8", type=int, default=96)
    ap.add_argument("--sort-interval", type=int, default=1)
    ap.add_argument("--cand-interval", type=int, default=1)
    ap.add_argument("--cand-slack", type=float, default=0.25)
    ap.add_argument("--tier2-frac", type=int, default=0)
    ap.add_argument("--trace-dir", default="/tmp/xprof_substep")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse-only", action="store_true",
                    help="skip the run; parse the newest existing trace")
    args = ap.parse_args()

    if not args.parse_only:
        from bench import build_params
        from libclsph_tpu.core.state import init_state
        from libclsph_tpu.engine.step import (
            StepConfig, substep_jit, substep_reuse_jit,
        )
        from libclsph_tpu.ops import collisions as collisions_ops
        from libclsph_tpu.scene.scene import Scene

        params = build_params(args.n)
        cfg = StepConfig(
            neighbor_impl="pallas",
            pallas_variant="nl",
            nl_query_rows=args.nl_query_rows,
            max_candidates_sub=args.max_candidates_sub,
            max_candidates_hit=args.max_candidates_hit,
            force_query_rows=args.force_query_rows,
            force_sub16=args.force_sub16,
            density_sub16=args.density_sub16,
            max_candidates_hit16=args.max_candidates_hit16,
            force_sub8=args.force_sub8,
            max_candidates_hit8=args.max_candidates_hit8,
            tier2_frac=args.tier2_frac,
            sort_interval=args.sort_interval,
            cand_interval=args.cand_interval,
            cand_slack=args.cand_slack,
        )
        scene_dev = None
        if args.scene != "none":
            scene = Scene.load(
                args.scene + ".obj", params.h * 2, scenes_dir="scenes"
            )
            scene_dev = collisions_ops.build_device_scene(scene)

        def run(state, dt, i, tables):
            """bench.py's cadence: rebuild every cand_interval-th substep,
            reuse the carried tables otherwise."""
            do_sort = i % args.sort_interval == 0
            if cfg.cand_interval <= 1:
                s, d, _ = substep_jit(
                    state, dt, params, scene_dev, cfg, do_sort=do_sort
                )
                return s, d, None
            if i % cfg.cand_interval == 0:
                s, d, _, t = substep_jit(
                    state, dt, params, scene_dev, cfg, do_sort=do_sort
                )
            else:
                s, d, _, t = substep_reuse_jit(
                    state, dt, params, scene_dev, cfg, tables
                )
            return s, d, t

        state = init_state(params)
        dt = jnp.float32(params.max_dt)
        tables = None
        warm = max(3, args.cand_interval)
        for i in range(warm):
            state, dt, tables = run(state, dt, i, tables)
        jax.block_until_ready(state.position)
        print("warm; tracing...", file=sys.stderr)

        t0 = time.perf_counter()
        with jax.profiler.trace(args.trace_dir):
            for i in range(args.steps):
                state, dt, tables = run(state, dt, i, tables)
            jax.block_until_ready(state.position)
        wall = time.perf_counter() - t0
        print(f"traced {args.steps} substeps in {wall:.2f}s "
              f"({1000 * wall / args.steps:.1f} ms/substep wall)",
              file=sys.stderr)

    path, totals, by_src = parse_xplane(args.trace_dir)
    print(f"# parsed {path}", file=sys.stderr)

    steps0 = max(args.steps, 1)
    print("== by source line ==")
    src_rows = sorted(by_src.items(), key=lambda kv: -kv[1][0])
    for src, (us, cnt) in src_rows[: args.top]:
        print(f"{us / 1000 / steps0:9.3f} ms/step x{cnt:<6d} {src[:140]}")
    print("== by op ==")

    # aggregate over planes/lines by op name
    by_op = defaultdict(lambda: [0.0, 0])
    for (_plane, _line, op), (us, cnt) in totals.items():
        by_op[op][0] += us
        by_op[op][1] += cnt
    rows = sorted(by_op.items(), key=lambda kv: -kv[1][0])
    total_us = sum(v[0] for v in by_op.values())
    steps = max(args.steps, 1)
    out = []
    for op, (us, cnt) in rows[: args.top]:
        out.append({
            "op": op[:120],
            "ms_per_step": round(us / 1000 / steps, 3),
            "pct": round(100 * us / total_us, 1),
            "count": cnt,
        })
        print(f"{us / 1000 / steps:9.3f} ms/step {100 * us / total_us:5.1f}%"
              f"  x{cnt:<5d} {op[:110]}")
    print(json.dumps({
        "total_ms_per_step": round(total_us / 1000 / steps, 2),
        "top": out[:25],
    }))


if __name__ == "__main__":
    main()
