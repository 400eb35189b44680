"""Measure the pair-volume landscape at bench scale.

On a settled 1M dam-break state, for the production refined candidate
lists, computes the TRUE-hit volume (a candidate subblock "hits" a
query group if any pair is within h) at several granularities:

  (q128, c32): current kernel shape
  (q128, c16): finer candidate subblocks
  (q32,  c32): finer query groups
  (q32,  c16): both

plus the exact-refine admitted counts — the gap between admitted and
true-hit is what a hit-compacted force pass would skip.

Usage: python experiments/volume_probe.py [--n N]
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
    ap.add_argument("--max-candidates-sub", type=int, default=256)
    ap.add_argument("--impl", default="pallas", choices=["pallas", "tiles"],
                    help="settle-step impl (tiles for CPU runs)")
    args = ap.parse_args()

    params = build_params(args.n)
    scene = Scene.load("cube.obj", params.h * 2, scenes_dir="scenes")
    scene_dev = collisions_ops.build_device_scene(scene)
    cfg = StepConfig(
        neighbor_impl=args.impl, max_candidates=args.max_candidates,
        max_candidates_sub=args.max_candidates_sub, refine_mode="aabb",
    )
    state = init_state(params)
    dt = jnp.float32(params.max_dt)
    for _ in range(args.settle):
        state, dt, flags = substep_jit(state, dt, params, scene_dev, cfg)
    print("settle flags:", int(flags), file=sys.stderr)

    n = params.particles_count
    bs = cfg.block_size
    np_ = tiles_ops.padded_count(n, bs)
    pad = np_ - n
    msub = args.max_candidates_sub
    h = params.h

    @jax.jit
    def prep(position):
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
        nb = np_ // bs
        pos_b = position.reshape(nb, bs, 3)
        real_b = real.reshape(nb, bs).astype(bool)
        bmin, bmax = tiles_ops.split_block_bounds(pos_b, real_b)
        cand, count, ovf = tiles_ops.candidate_blocks_auto(
            bmin, bmax, params.h, cfg.max_candidates
        )
        sub = bs // nl.SUB
        # exact refine with CONTIGUOUS 32-row query boxes (current WIP)
        qlo, qhi = tiles_ops.subblock_bounds(pos_b, real_b, sub)
        cs_row, cnt_row, ovf_row = tiles_ops.refine_candidates_exact(
            cand, count, qlo.reshape(nb, sub, 3), qhi.reshape(nb, sub, 3),
            pos_b, params.h, sub, msub,
        )
        # exact refine with GAP-SPLIT query boxes
        cs_gap, cnt_gap, ovf_gap = tiles_ops.refine_candidates_exact(
            cand, count, bmin, bmax, pos_b, params.h, sub, msub,
        )
        return pos_b, real_b, cs_row, cnt_row, ovf_row, cnt_gap, ovf_gap

    pos_b, real_b, cs_row, cnt_row, ovf_row, cnt_gap, ovf_gap = prep(
        state.position
    )
    cr = np.asarray(cnt_row)
    cg = np.asarray(cnt_gap)
    print(
        f"exact q128 (32-row boxes): mean={cr.mean():.1f} max={cr.max()}"
        f" ovf={bool(ovf_row)} slots/p={cr.mean() * 32:.0f}"
    )
    print(
        f"exact q128 (gap-split boxes): mean={cg.mean():.1f} max={cg.max()}"
        f" ovf={bool(ovf_gap)} slots/p={cg.mean() * 32:.0f}"
    )

    # ---- TRUE-hit volumes from the refined lists (chunked pair sweep)
    nb = pos_b.shape[0]
    nsub = nb * 4

    @jax.jit
    def true_hits(pos_b, real_b, cs, cnt):
        pos_flat = pos_b.reshape(-1, 3)
        real_flat = real_b.reshape(-1)
        # sentinel-safe subblock gather
        psub = jnp.where(
            real_flat[:, None], pos_flat, jnp.float32(nl.FAR)
        ).reshape(nsub, 32, 3)
        dead = jnp.full((1, 32, 3), jnp.float32(nl.FAR))
        psub = jnp.concatenate([psub, dead], axis=0)
        live = jnp.arange(msub)[None, :] < cnt[:, None]
        idx = jnp.where(live, cs, nsub)

        def per_block(args):
            qpos, qreal, ids = args  # (bs,3), (bs,), (msub,)
            cpos = psub[ids]  # (msub, 32, 3)
            qp = jnp.where(qreal[:, None], qpos, jnp.float32(nl.FAR))
            d = qp[:, None, None, :] - cpos[None, :, :, :]  # (bs,msub,32,3)
            r2 = jnp.sum(d * d, axis=-1)
            hit = r2 < h * h  # (bs, msub, 32)
            # (q128, c32): any pair in (128, 32)
            h_q128_c32 = jnp.sum(jnp.any(hit, axis=(0, 2)))
            # (q128, c16)
            h16 = jnp.any(hit.reshape(bs, msub, 2, 16), axis=(0, 3))
            h_q128_c16 = jnp.sum(h16)
            # (q32, c32): per 32-row query group
            hq = jnp.any(hit.reshape(4, 32, msub, 32), axis=(1, 3))
            h_q32_c32 = jnp.sum(hq, axis=1)  # (4,) per-subgroup counts
            hq16 = jnp.any(hit.reshape(4, 32, msub, 2, 16), axis=(1, 4))
            h_q32_c16 = jnp.sum(hq16, axis=(1, 2))  # (4,) per subgroup
            # true pair count (live pairs within h)
            npairs = jnp.sum(jnp.where(qreal[:, None, None] > 0, hit, False))
            # ---- stage-2 subgroup-refine ADMITTED volumes: what a
            # per-subgroup density pass would run at if its lists came
            # from re-testing the q128-admitted subblocks against each
            # 32-row query subgroup (cheap second refine, no new gather)
            qg = jnp.where(qreal[:, None], qpos, jnp.nan).reshape(4, 32, 3)
            qlo_g = jnp.nan_to_num(jnp.nanmin(qg, axis=1), nan=nl.FAR)
            qhi_g = jnp.nan_to_num(jnp.nanmax(qg, axis=1), nan=-nl.FAR)
            live = ids < nsub
            # (a) box-box rounded distance: subblock AABB vs subgroup box
            slo = jnp.min(cpos, axis=1)  # (msub, 3); dead -> FAR box
            shi = jnp.max(cpos, axis=1)
            gap = jnp.maximum(
                jnp.maximum(
                    qlo_g[:, None, :] - shi[None, :, :],
                    slo[None, :, :] - qhi_g[:, None, :],
                ),
                0.0,
            )
            gap = jnp.minimum(gap, 1.0e6)
            bb = jnp.sum(gap * gap, axis=-1) <= h * h  # (4, msub)
            adm_bb = jnp.sum(bb & live[None, :], axis=1)
            # (b) exact point-to-subgroup-box (stage-1's rounded-box
            # test with subgroup query boxes)
            dfc = jnp.maximum(
                jnp.maximum(
                    qlo_g[:, None, None, :] - cpos[None, :, :, :],
                    cpos[None, :, :, :] - qhi_g[:, None, None, :],
                ),
                0.0,
            )
            dfc = jnp.minimum(dfc, 1.0e6)
            ex = jnp.any(
                jnp.sum(dfc * dfc, axis=-1) <= h * h, axis=-1
            )  # (4, msub)
            adm_ex = jnp.sum(ex & live[None, :], axis=1)
            return (h_q128_c32, h_q128_c16, h_q32_c32, h_q32_c16, npairs,
                    adm_bb, adm_ex)

        return jax.lax.map(
            per_block, (pos_b, real_b, idx), batch_size=16
        )

    h_c32, h_c16, h_q32c32, h_q32c16, npairs, adm_bb, adm_ex = map(
        np.asarray, true_hits(pos_b, real_b, cs_row, cnt_row)
    )
    nblocks_real = n // bs
    print(f"true pairs/particle: {npairs.sum() / n:.1f}")
    print(
        f"true-hit (q128,c32): mean={h_c32[:nblocks_real].mean():.1f}"
        f" slots/p={h_c32[:nblocks_real].mean() * 32:.0f}"
    )
    print(
        f"true-hit (q128,c16): mean={h_c16[:nblocks_real].mean():.1f}"
        f" slots/p={h_c16[:nblocks_real].mean() * 16:.0f}"
    )
    print(
        f"true-hit (q32,c32): mean={h_q32c32[:nblocks_real].mean():.1f}"
        f" max={h_q32c32[:nblocks_real].max()}"
        f" p99={np.percentile(h_q32c32[:nblocks_real], 99):.0f}"
        f" slots/p={h_q32c32[:nblocks_real].mean() * 32:.0f}"
    )
    print(
        f"true-hit (q32,c16): mean={h_q32c16[:nblocks_real].mean():.1f}"
        f" max={h_q32c16[:nblocks_real].max()}"
        f" p99={np.percentile(h_q32c16[:nblocks_real], 99):.0f}"
        f" slots/p={h_q32c16[:nblocks_real].mean() * 16:.0f}"
    )
    bb = adm_bb[:nblocks_real]
    ex = adm_ex[:nblocks_real]
    print(
        f"stage-2 admitted (q32, box-box): mean={bb.mean():.1f}"
        f" max={bb.max()} slots/p={bb.mean() * 32:.0f}"
    )
    print(
        f"stage-2 admitted (q32, exact-point): mean={ex.mean():.1f}"
        f" max={ex.max()} slots/p={ex.mean() * 32:.0f}"
    )


if __name__ == "__main__":
    main()
