"""Measure candidate pair volume vs block granularity (CPU, NumPy).

The round-1 headline bottleneck: the fused Pallas kernels evaluate
~4.7k candidate pairs per particle (37 candidate 128-blocks) while only
~30 are real neighbours. Before building anything, measure what finer
CANDIDATE granularity buys on a realistic particle distribution:
pair_slots(Bq, Bc) = mean candidate count(Bq->Bc blocks) * Bc.

Run: python experiments/pairvol.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from libclsph_tpu.core import morton  # noqa: E402


def morton_order(pos, cell):
    pmin = pos.min(axis=0) - 2 * cell
    coords = ((pos - pmin) / cell).astype(np.uint32)
    codes = np.asarray(
        morton.encode(coords[:, 0], coords[:, 1], coords[:, 2])
    )
    return np.argsort(codes, kind="stable")


def block_bounds(pos, B):
    nb = pos.shape[0] // B
    p = pos[: nb * B].reshape(nb, B, 3)
    return p.min(axis=1), p.max(axis=1)


def candidate_stats(pos, h, Bq, Bc, split=1):
    """Mean/max candidate Bc-blocks per query Bq-block via dilated AABB
    overlap (the production test, tiles.py:candidate_blocks), optionally
    with gap-split boxes on both sides (split=SPLIT_BOXES analog)."""
    n = pos.shape[0]
    nq, nc = n // Bq, n // Bc
    qmin, qmax = block_bounds(pos, Bq)
    cmin, cmax = block_bounds(pos, Bc)
    # chunk query blocks to bound memory
    counts = np.zeros(nq, np.int64)
    live_pairs = np.zeros(nq, np.int64)  # particles inside dilated query AABB
    CH = 512
    for s in range(0, nq, CH):
        e = min(s + CH, nq)
        lo = qmin[s:e, None, :] - h
        hi = qmax[s:e, None, :] + h
        ov = ((lo <= cmax[None, :, :]) & (hi >= cmin[None, :, :])).all(-1)
        counts[s:e] = ov.sum(axis=1)
        # per-particle filter limit: particles within the dilated query box
        p = pos[None, :, :]
        inbox = ((p >= lo[:, :1, :]) & (p <= hi[:, :1, :])).all(-1)
        live_pairs[s:e] = inbox.sum(axis=1)
    return counts, live_pairs


def true_neighbors(pos, h, sample=4096):
    idx = np.random.default_rng(0).choice(pos.shape[0], sample, replace=False)
    cnt = np.zeros(sample, np.int64)
    for i, q in enumerate(idx):
        d2 = ((pos - pos[q]) ** 2).sum(-1)
        cnt[i] = (d2 < h * h).sum()
    return cnt.mean()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    # settled-fluid stand-in: uniform cloud at rest density.
    # n_neighbors=20 within radius h  =>  number density = 20 / (4/3 pi h^3)
    h = 1.0
    rho = 20.0 / (4.0 / 3.0 * np.pi * h**3)
    side = (n / rho) ** (1 / 3)
    rng = np.random.default_rng(7)
    pos = (rng.random((n, 3)) * side).astype(np.float32)
    cell = 2 * h
    order = morton_order(pos, cell)
    pos = pos[order]

    print(f"n={n} side={side:.1f}h  true neighbours ~{true_neighbors(pos, h):.1f}")
    for Bq, Bc in [(128, 128), (128, 64), (128, 32), (128, 16), (64, 32), (64, 64), (256, 32), (64, 16), (32, 32)]:
        t0 = time.time()
        counts, live = candidate_stats(pos, h, Bq, Bc)
        slots = counts.mean() * Bc
        print(
            f"Bq={Bq:4d} Bc={Bc:4d}: cand mean={counts.mean():7.1f} "
            f"max={counts.max():5d}  pair-slots/particle={slots:7.0f} "
            f"per-particle-limit={live.mean():6.0f}  ({time.time()-t0:.1f}s)"
        )


if __name__ == "__main__":
    main()
