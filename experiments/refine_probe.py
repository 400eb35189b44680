"""Probe the refined-candidate count distributions at bench scale.

Builds the bench 1M dam-break, settles it a few substeps, then runs
both subblock refinement variants (tiles.refine_candidates AABB test vs
tiles.refine_candidates_exact particle test) on the same coarse
candidate lists and prints count_sub stats + overflow flags. Diagnoses
which level overflows in bench warmup and how much pair volume the
exact test actually removes.

Usage: python experiments/refine_probe.py [--n N] [--settle K]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_params
from libclsph_tpu.core.state import init_state
from libclsph_tpu.engine.step import StepConfig, substep_jit
from libclsph_tpu.ops import collisions as collisions_ops
from libclsph_tpu.ops import grid as grid_ops
from libclsph_tpu.ops import tiles as tiles_ops
from libclsph_tpu.ops.pallas import neighbor_nl as nl
from libclsph_tpu.scene.scene import Scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--settle", type=int, default=3)
    ap.add_argument("--max-candidates", type=int, default=96)
    ap.add_argument("--max-candidates-sub", type=int, default=192)
    args = ap.parse_args()

    params = build_params(args.n)
    scene = Scene.load("cube.obj", params.h * 2, scenes_dir="scenes")
    scene_dev = collisions_ops.build_device_scene(scene)
    cfg = StepConfig(
        neighbor_impl="pallas",
        max_candidates=args.max_candidates,
        max_candidates_sub=args.max_candidates_sub,
        refine_mode="aabb",
    )
    state = init_state(params)
    dt = jnp.float32(params.max_dt)
    for _ in range(args.settle):
        state, dt, flags = substep_jit(state, dt, params, scene_dev, cfg)
    print("settle flags:", int(flags), file=sys.stderr)

    @jax.jit
    def probe(position):
        n = params.particles_count
        np_ = tiles_ops.padded_count(n, cfg.block_size)
        pad = np_ - n
        grid = grid_ops.compute_bounds(position, params)
        codes = grid_ops.locate_in_grid(position, grid)
        if pad:
            far = grid.max_point + 1000.0 * params.h
            position = jnp.concatenate(
                [position, jnp.broadcast_to(far, (pad, 3))], axis=0
            )
            codes = jnp.concatenate(
                [codes, jnp.full((pad,), tiles_ops.SENTINEL_CODE, jnp.uint32)]
            )
        order = jnp.argsort(codes)
        position = position[order]
        real = jnp.arange(np_, dtype=jnp.int32) < jnp.int32(n)
        nb = np_ // cfg.block_size
        pos_b = position.reshape(nb, cfg.block_size, 3)
        real_b = real.reshape(nb, cfg.block_size).astype(bool)
        bmin, bmax = tiles_ops.split_block_bounds(pos_b, real_b)
        cand, count, ovf = tiles_ops.candidate_blocks_auto(
            bmin, bmax, params.h, cfg.max_candidates
        )
        sub = cfg.block_size // nl.SUB
        # AABB variant
        sub_lo, sub_hi = tiles_ops.subblock_bounds(pos_b, real_b, sub)
        _, cnt_aabb, ovf_aabb = tiles_ops.refine_candidates(
            cand, count, bmin, bmax, sub_lo, sub_hi, params.h, sub,
            cfg.max_candidates_sub,
        )
        # exact variant
        qlo, qhi = tiles_ops.subblock_bounds(pos_b, real_b, sub)
        qlo = qlo.reshape(nb, sub, 3)
        qhi = qhi.reshape(nb, sub, 3)
        _, cnt_ex, ovf_ex = tiles_ops.refine_candidates_exact(
            cand, count, qlo, qhi, pos_b, params.h, sub,
            cfg.max_candidates_sub,
        )
        return count, ovf, cnt_aabb, ovf_aabb, cnt_ex, ovf_ex

    count, ovf, cnt_aabb, ovf_aabb, cnt_ex, ovf_ex = map(
        np.asarray, jax.device_get(probe(state.position))
    )

    def stats(name, c, ovf_flag):
        print(
            f"{name}: mean={c.mean():.1f} p50={np.percentile(c, 50):.0f} "
            f"p99={np.percentile(c, 99):.0f} max={c.max()} ovf={bool(ovf_flag)}"
        )

    stats(f"coarse blocks (cap {args.max_candidates})", count, ovf)
    stats(f"aabb subblocks (cap {args.max_candidates_sub})", cnt_aabb, ovf_aabb)
    stats(f"exact subblocks (cap {args.max_candidates_sub})", cnt_ex, ovf_ex)
    print(
        "pair slots/particle: aabb="
        f"{cnt_aabb.mean() * nl.SUB:.0f} exact={cnt_ex.mean() * nl.SUB:.0f}"
    )


if __name__ == "__main__":
    main()
