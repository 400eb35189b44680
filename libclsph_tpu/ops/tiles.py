"""Block-tile neighbour pass — the TPU production path.

Design (TPU-first, no counterpart in the reference): after the Morton
sort, consecutive particles are spatially coherent, so we partition the
sorted array into fixed blocks of ``B`` particles and compute
block-level axis-aligned bounding boxes. Two blocks can interact only
if their AABBs, dilated by the support radius h, overlap — a dense
(nb x nb) test that yields a padded per-block candidate list. The
density/force passes then reduce over candidate blocks with dense
(B x B) pairwise tiles.

Why this beats a literal port of the reference's 27-cell gather
(forces.cl:24-30) on TPU:

* every gather is a *contiguous block slice*, not a ragged per-cell
  range — static shapes, unit-stride DMA;
* the pairwise work is dense (B, B) tiles that XLA maps onto the
  MXU/VPU; in ``mxu`` mode the heavy directional sums are literally
  (B,B) @ (B,3) matmuls via
    sum_j A_ij (x_i - x_j) = rowsum(A) * x_i - A @ X;
* correctness does not depend on the tiling: the smoothing kernels'
  hard support cutoff (smoothing.cl) zeroes every candidate beyond h,
  and the dilated-AABB test guarantees every true r<h neighbour is in
  some candidate block. Results equal the exact path up to float
  summation order.

Padding convention: particle arrays are padded to a multiple of B with
sentinel particles whose Morton key is the maximal 30-bit code, so they
sort to the tail; the sentinel mask rides along as ``real``.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import smoothing
from ..core.params import PrecomputedKernelValues, SimulationParameters

# Python int (not a jnp scalar): module-level jnp arrays get captured
# as jaxpr constants, and jax 0.9's dispatch mishandles executables
# with 3+ hoisted constants on repeat calls (buffer-count mismatch).
SENTINEL_CODE = (1 << 30) - 1

# Hierarchical candidate search constants (see candidate_blocks_auto):
# above ~1024 blocks the dense nb x nc overlap matrix (and its
# 67M-element scatter at 1M particles: measured 348 ms/step) costs more
# than the physics, so a superblock prefilter takes over. The env
# override exists for tests that must compile the hierarchical path at
# small n (tests/test_tpu_smoke.py).
HIERARCHICAL_THRESHOLD = int(
    os.environ.get("LIBCLSPH_TPU_HIER_THRESHOLD", "1024")
)
SUPER = 16  # blocks per superblock
# padded candidate superblocks per superblock. Slab-shaped fluids
# (river/labyrinth channels at 1M) measure sb_count up to ~141 — the
# Morton curve over a high-aspect grid produces stringy superblock
# runs whose split boxes overlap ~28% of all superblocks — so the
# default sits above that; candidate_blocks_hierarchical clamps it to
# nsb. Level 2 is chunked, so capacity costs memory only per chunk.
SUPER_CAND = 192


class TileConfig(NamedTuple):
    block_size: int = 128  # B — particles per tile
    max_candidates: int = 64  # padded candidate blocks per block
    mode: str = "direct"  # 'direct' (exact rvec) | 'mxu' (matmul r^2)


def num_blocks(n: int, block_size: int) -> int:
    return -(-n // block_size)


def padded_count(n: int, block_size: int) -> int:
    """Particles after sentinel padding: a whole number of blocks AND a
    whole number of SUPER-block groups, so the hierarchical candidate
    search (which needs nb % SUPER == 0) is always available."""
    nb = num_blocks(n, block_size)
    nb = -(-nb // SUPER) * SUPER
    return nb * block_size


def block_bounds(pos_blocked: jnp.ndarray, real_blocked: jnp.ndarray):
    """Per-block AABB over real particles. pos (nb, B, 3), real (nb, B)."""
    big = jnp.float32(3.0e38)
    m = real_blocked[..., None]
    bmin = jnp.min(jnp.where(m, pos_blocked, big), axis=1)
    bmax = jnp.max(jnp.where(m, pos_blocked, -big), axis=1)
    return bmin, bmax


# boxes per block in split_block_bounds. With B=128 the candidate count
# is already near its tiling bound (~(2 + 2h/s)^3 = 33 intersecting
# blocks; measured mean 34-37 at 1M), so extra split boxes mostly trim
# the elongated TAIL (max 64 -> 57 with 4 boxes) — cheap insurance
# against capacity overflows rather than a big mean win.
SPLIT_BOXES = 4


def split_block_bounds(
    pos_blocked: jnp.ndarray, real_blocked: jnp.ndarray, n_boxes: int = SPLIT_BOXES
):
    """``n_boxes`` AABBs per block, split at the largest intra-block
    spatial gaps.

    The Morton curve jumps across octant boundaries, so a fixed-size
    block can contain several distant particle runs; a single AABB then
    spans the gaps and overlaps far more blocks than the particles do
    (observed 210 overlaps vs ~10 real at 64k with one box). Splitting
    at the top n_boxes-1 position jumps keeps each segment compact.

    Returns (bmin, bmax) of shape (nb, n_boxes, 3). Empty segments
    produce inverted boxes that overlap nothing.
    """
    big = jnp.float32(3.0e38)
    nb, b, _ = pos_blocked.shape
    # jump[k] = |p[k+1] - p[k]| between consecutive sorted particles
    jump = jnp.linalg.norm(pos_blocked[:, 1:] - pos_blocked[:, :-1], axis=-1)
    jump = jnp.where(real_blocked[:, 1:] & real_blocked[:, :-1], jump, -1.0)
    # top (n_boxes - 1) gaps -> split points (ascending)
    _, top_idx = jax.lax.top_k(jump, n_boxes - 1)  # (nb, n_boxes-1)
    splits = jnp.sort(top_idx + 1, axis=1)  # first index of each next segment
    idx = jnp.arange(b, dtype=jnp.int32)[None, :]
    # segment id of each particle = number of split points <= its index
    seg = jnp.sum(idx[:, :, None] >= splits[:, None, :], axis=-1)  # (nb, B)

    mins, maxs = [], []
    for sgi in range(n_boxes):
        m = ((seg == sgi) & real_blocked)[..., None]
        mins.append(jnp.min(jnp.where(m, pos_blocked, big), axis=1))
        maxs.append(jnp.max(jnp.where(m, pos_blocked, -big), axis=1))
    return jnp.stack(mins, axis=1), jnp.stack(maxs, axis=1)


def candidate_blocks(
    bmin: jnp.ndarray,
    bmax: jnp.ndarray,
    h: float,
    max_candidates: int,
    cand_bmin: jnp.ndarray | None = None,
    cand_bmax: jnp.ndarray | None = None,
    self_index: jnp.ndarray | None = None,
):
    """Padded candidate-block lists from dilated split-AABB overlap.

    ``bmin``/``bmax``: (nb, S, 3) split boxes from
    :func:`split_block_bounds` (query side); candidate side defaults to
    the query set. ``self_index``: each query block's own index in the
    candidate table (defaults to identity when the sets coincide) — the
    own block is always emitted in slot 0 so a capacity overflow can
    never drop a particle's self-interaction.

    Returns (cand (nb, M) int32, count (nb,) int32, overflowed () bool).
    ``overflowed`` means some true neighbour blocks were dropped; the
    engine reacts by re-running with a larger cap (engine/autotune).
    Blocks with no real particles (empty AABBs) never overlap anything.
    """
    if cand_bmin is None:
        cand_bmin, cand_bmax = bmin, bmax
    nb = bmin.shape[0]
    nc = cand_bmin.shape[0]
    if self_index is None:
        self_index = jnp.arange(nb, dtype=jnp.int32)

    lo = bmin - h  # (nb, S, 3)
    hi = bmax + h
    # any-of-SxS split-box overlap combinations, accumulated per pair
    # to bound memory
    overlap = jnp.zeros((nb, nc), bool)
    for a in range(bmin.shape[1]):
        for c in range(cand_bmin.shape[1]):
            overlap = overlap | jnp.all(
                (lo[:, None, a, :] <= cand_bmax[None, :, c, :])
                & (hi[:, None, a, :] >= cand_bmin[None, :, c, :]),
                axis=-1,
            )
    # reserve slot 0 for the own block
    is_self = (
        jnp.arange(nc, dtype=jnp.int32)[None, :] == self_index[:, None]
    )
    others = overlap & ~is_self
    pos = jnp.cumsum(others.astype(jnp.int32), axis=1)  # 1-based slots
    row_count = pos[:, -1] + 1
    valid = others & (pos < max_candidates)
    slot = jnp.where(valid, pos, max_candidates)
    rows = jnp.broadcast_to(jnp.arange(nb, dtype=jnp.int32)[:, None], (nb, nc))
    cols = jnp.broadcast_to(jnp.arange(nc, dtype=jnp.int32)[None, :], (nb, nc))
    cand = jnp.zeros((nb, max_candidates + 1), jnp.int32)
    cand = cand.at[:, 0].set(self_index)
    cand = cand.at[rows, slot].set(cols, mode="drop")
    count = jnp.minimum(row_count, max_candidates)
    return cand[:, :max_candidates], count, jnp.any(row_count > max_candidates)


def candidate_blocks_hierarchical(
    bmin: jnp.ndarray,
    bmax: jnp.ndarray,
    h: float,
    max_candidates: int,
    super_cand: int = SUPER_CAND,
):
    """Two-level candidate search for large block counts (query set ==
    candidate set only — the single-chip path).

    Level 1 tests query *blocks* against candidate *superblocks* (the
    AABB union of SUPER consecutive blocks); level 2 expands each
    query's candidate superblocks into a block shortlist and applies
    the precise split-AABB test there. Conservative in the same way as
    :func:`candidate_blocks` (supersets never change the physics —
    smoothing-kernel cutoffs zero extras).
    """
    nb = bmin.shape[0]
    if nb % SUPER:
        raise ValueError(f"nb={nb} not a multiple of SUPER={SUPER}")
    nsb = nb // SUPER
    n_boxes = bmin.shape[1]

    # Superblock AABBs, split at the largest inter-member gaps: like
    # blocks (split_block_bounds), superblocks straddle Morton jumps —
    # on non-power-of-two grids a contiguous code range crosses
    # unoccupied code gaps, so runs are stringy/sheety and un-split
    # union boxes overlap far more superblocks than the particles do
    # (at 4M: 2-box splits still overflowed a 192 cap). 4 boxes at the
    # top-3 member-centre gaps keep the level-1 count bounded.
    mb_min = bmin.reshape(nsb, SUPER, n_boxes, 3)
    mb_max = bmax.reshape(nsb, SUPER, n_boxes, 3)
    mem_lo = jnp.min(mb_min, axis=2)  # (nsb, SUPER, 3) member boxes
    mem_hi = jnp.max(mb_max, axis=2)
    centers = 0.5 * (mem_lo + mem_hi)
    gap = jnp.linalg.norm(centers[:, 1:] - centers[:, :-1], axis=-1)
    sb_split = 4
    _, top_idx = jax.lax.top_k(gap, sb_split - 1)  # (nsb, 3)
    splits = jnp.sort(top_idx + 1, axis=1)
    mem_idx = jnp.arange(SUPER, dtype=jnp.int32)[None, :]
    seg = jnp.sum(
        mem_idx[:, :, None] >= splits[:, None, :], axis=-1
    )  # (nsb, SUPER) segment id
    big = jnp.float32(3.0e38)
    sb_lo_boxes, sb_hi_boxes = [], []
    for g in range(sb_split):
        m = (seg == g)[..., None]
        sb_lo_boxes.append(jnp.min(jnp.where(m, mem_lo, big), axis=1))
        sb_hi_boxes.append(jnp.max(jnp.where(m, mem_hi, -big), axis=1))
    sb_min = jnp.stack(sb_lo_boxes, axis=1)  # (nsb, sb_split, 3)
    sb_max = jnp.stack(sb_hi_boxes, axis=1)

    # ---- level 1: superblock x superblock (tiny nsb^2 matrix); every
    # block of a query superblock inherits its candidate-superblock
    # list. The OWN superblock takes slot 0 unconditionally (like
    # candidate_blocks' self slot): a truncated list must never drop a
    # block's self-interaction — at 4M that zeroed densities and
    # NaN'd the force combine's 1/rho.
    ov1 = jnp.zeros((nsb, nsb), bool)
    for a in range(sb_split):
        for c in range(sb_split):
            ov1 = ov1 | jnp.all(
                (sb_min[:, None, a, :] - h <= sb_max[None, :, c, :])
                & (sb_max[:, None, a, :] + h >= sb_min[None, :, c, :]),
                axis=-1,
            )
    super_cand = min(super_cand, nsb)  # counts cannot exceed nsb
    sb_ids = jnp.arange(nsb, dtype=jnp.int32)
    others1 = ov1 & (sb_ids[None, :] != sb_ids[:, None])
    pos1 = jnp.cumsum(others1.astype(jnp.int32), axis=1)  # 1-based
    row_count1 = pos1[:, -1] + 1  # + self
    valid1 = others1 & (pos1 < super_cand)
    slot1 = jnp.where(valid1, pos1, super_cand)
    rows1 = jnp.broadcast_to(sb_ids[:, None], (nsb, nsb))
    cols1 = jnp.broadcast_to(sb_ids[None, :], (nsb, nsb))
    sb_cand_sb = jnp.zeros((nsb, super_cand + 1), jnp.int32)
    sb_cand_sb = sb_cand_sb.at[:, 0].set(sb_ids)
    sb_cand_sb = sb_cand_sb.at[rows1, slot1].set(cols1, mode="drop")
    sb_cand_sb = sb_cand_sb[:, :super_cand]  # (nsb, Msb)
    sb_count_sb = jnp.minimum(row_count1, super_cand)
    sb_overflow = jnp.any(row_count1 > super_cand)

    # ---- level 2: refine the superblock shortlists to block lists.
    # Blocks-from-superblocks is the same refinement problem as
    # subblocks-from-blocks, so it reuses refine_candidates and
    # inherits its flat 128-lane box pack + chunking (the previous
    # in-line version gathered (nsb, K, S, 3) boxes, which the (8,128)
    # tiling pads ~32x — multi-GB transients that scaled with the
    # capacity). Member boxes are per-block UNIONS (mem_lo/mem_hi);
    # the query side keeps its split boxes.
    cand_rep = jnp.repeat(sb_cand_sb, SUPER, axis=0)  # (nb, Msb)
    count_rep = jnp.repeat(sb_count_sb, SUPER, axis=0)
    # self-priority: level-2 ids are BLOCK ids, the query's own id is
    # its row index — biased so a truncated list keeps self-interaction
    # (advisor r2 finding #4)
    cand, count, overflow = refine_candidates(
        cand_rep, count_rep, bmin, bmax,
        mem_lo.reshape(-1, 3), mem_hi.reshape(-1, 3),
        h, SUPER, max_candidates,
        self_lo=jnp.arange(nb, dtype=jnp.int32), self_width=1,
    )
    return cand, count, overflow | sb_overflow


def subblock_bounds(pos_blocked: jnp.ndarray, real_blocked: jnp.ndarray, sub: int):
    """Per-subblock AABBs: each B-particle block split into ``sub``
    consecutive runs of B/sub particles. pos (nb, B, 3) -> (nb*sub, 3).
    Empty subblocks produce inverted boxes that overlap nothing."""
    nb, b, _ = pos_blocked.shape
    big = jnp.float32(3.0e38)
    p = pos_blocked.reshape(nb * sub, b // sub, 3)
    m = real_blocked.reshape(nb * sub, b // sub, 1)
    return (
        jnp.min(jnp.where(m, p, big), axis=1),
        jnp.max(jnp.where(m, p, -big), axis=1),
    )


# sentinel id for dead slots in refined candidate tables; consumers map
# it to a dedicated dead row (ops/pallas/neighbor_nl.py)
REFINE_SENTINEL = 2**30  # Python int, not jnp (see SENTINEL_CODE note)

# Self-priority bias for truncation-safe sorts (see _self_priority_sort):
# subtracting it from the query's own candidate ids makes them sort
# FIRST, so a capacity-truncated list can never drop a particle's
# self-interaction (which would zero its density and NaN the force
# combine's 1/rho on the flagged step before the engine re-runs it).
SELF_BIAS = 2**29


def _self_priority_sort(keys, self_lo, self_width, max_out):
    """Compact live candidate ids to the first ``max_out`` slots, ids in
    [self_lo, self_lo + self_width) guaranteed to survive truncation.
    ``keys`` (nb, K) candidate ids (dead = REFINE_SENTINEL); ``self_lo``
    (nb,) or None (no self priority).

    Two implementations (LIBCLSPH_TPU_COMPACT, read per trace):
    * ``sort``: ascending row sort with self ids biased first — output
      slot order is globally ascending (after self ids).
    * ``scatter``: two row cumsums compute each live id's destination
      (self ids first, then encounter order) + ONE 2D scatter. No
      O(K log K) sort — the (nb, sub*m) truncation sorts were ~13 ms of
      the 1M substep (xprof, r3_results.jsonl). Output order is
      plane-encounter order, still live-first + self-first; consumers
      (kernel count bounds, tier-2's [:c1] slice, gather locality)
      only require live-first + self-priority, not ascending.
    """
    if os.environ.get("LIBCLSPH_TPU_COMPACT", "sort") == "scatter":
        nb, _k = keys.shape
        live = keys != REFINE_SENTINEL
        if self_lo is not None:
            is_self = (
                live
                & (keys >= self_lo[:, None])
                & (keys < self_lo[:, None] + self_width)
            )
        else:
            is_self = jnp.zeros_like(live)
        is_other = live & ~is_self
        c_self = jnp.cumsum(is_self, axis=1, dtype=jnp.int32)
        c_other = jnp.cumsum(is_other, axis=1, dtype=jnp.int32)
        dest = jnp.where(is_self, c_self - 1, c_self[:, -1:] + c_other - 1)
        ok = live & (dest < max_out)
        # colliding writes (everything truncated or dead) land in the
        # trash column max_out and all write SENTINEL — order-safe
        dest = jnp.where(ok, dest, max_out)
        vals = jnp.where(ok, keys, REFINE_SENTINEL)
        out = jnp.full((nb, max_out + 1), REFINE_SENTINEL, keys.dtype)
        out = out.at[
            jnp.arange(nb, dtype=jnp.int32)[:, None], dest
        ].set(vals, mode="promise_in_bounds")
        return out[:, :max_out]
    if self_lo is not None:
        is_self = (keys >= self_lo[:, None]) & (
            keys < self_lo[:, None] + self_width
        )
        keys = jnp.where(is_self, keys - SELF_BIAS, keys)
    out = jnp.sort(keys, axis=1)[:, :max_out]
    if self_lo is not None:
        out = jnp.where(out < 0, out + SELF_BIAS, out)
    return out

# transient budget for refine's gathered (rows, 128) box stream.
# 2 GB runs the 1M refine as ONE dispatch (the 1.15 GB gather fits):
# the lax.map chunk loop's carry copies were serializing ~9 ms/substep
# at 1M (xprof r3, q1-refine1d row); 4M still chunks (4.8 GB transient).
REFINE_CHUNK_BYTES = (
    int(os.environ.get("LIBCLSPH_TPU_REFINE_CHUNK_MB", "2048")) << 20
)


def refine_candidates(
    cand: jnp.ndarray,
    count: jnp.ndarray,
    qmin: jnp.ndarray,
    qmax: jnp.ndarray,
    sub_lo: jnp.ndarray,
    sub_hi: jnp.ndarray,
    h: float,
    sub: int,
    max_sub: int,
    self_lo: jnp.ndarray | None = None,
    self_width: int = 1,
):
    """Refine block-granularity candidate lists to subblock granularity.

    The round-1 kernels evaluate whole 128-particle candidate blocks
    (~4.7k pair tests/particle at 1M vs ~30 real neighbours); testing
    each candidate block's ``sub`` 32-particle subblocks against the
    dilated query boxes drops most of that volume (the candidate-side
    block extent shrinks by sub^(1/3)) for a tiny (nb, M*sub) test.

    ``cand`` (nb, M) / ``count`` (nb,): block-granularity lists (from
    candidate_blocks*); ``qmin``/``qmax`` (nb, S, 3): query split boxes;
    ``sub_lo``/``sub_hi`` (nc*sub, 3): candidate subblock boxes (from
    :func:`subblock_bounds`, possibly of a gathered global table).

    Layout (the LAYOUT RULE of ops/pallas/neighbor_nl.py): the per-slot
    box gather reads a FLAT (nc, 128)-lane pack — lane s*6+f holds
    subblock s's [lo.xyz | hi.xyz][f] — so its (rows, 128) output is
    padding-free under the (8, 128) tiling. A naive (rows, sub, 3)
    gather pads 42.7x (12 GB at 4M — instant OOM, measured). Overlap
    per subblock = all 6 of its lane predicates pass, counted with one
    (rows, 128) @ (128, sub) MXU product per split box; the whole test
    is lax.map-chunked over query rows under REFINE_CHUNK_BYTES.

    Returns (cand_sub (nb, max_sub) int32 subblock ids with dead slots
    = REFINE_SENTINEL, count_sub (nb,), overflowed () bool). Compaction
    is the sort trick from candidate_blocks_hierarchical: ascending row
    sort packs passing ids to the front. ``self_lo``/``self_width``:
    optional per-row self-id range biased to survive capacity
    truncation (:func:`_self_priority_sort`).
    """
    nb, m = cand.shape
    s_split = qmin.shape[1]
    if sub * 6 > 128:
        raise ValueError("sub too large for the 128-lane box pack")
    nc = sub_lo.shape[0] // sub
    # flat box pack (nc, 128)
    bp = jnp.concatenate(
        [sub_lo.reshape(nc, sub, 3), sub_hi.reshape(nc, sub, 3)], axis=2
    ).reshape(nc, sub * 6)
    bp = jnp.pad(bp, ((0, 0), (0, 128 - sub * 6)))

    lane = jnp.arange(128, dtype=jnp.int32)
    f6 = lane % 6
    fc = jnp.where(f6 < 3, f6, f6 - 3)  # world axis per lane
    is_lo = f6 < 3  # lane holds a subblock lo field
    # selector: count subblock s's 6 lanes (invalid lanes select nothing)
    sel = (
        (lane[:, None] // 6 == jnp.arange(sub)[None, :]) & (lane[:, None] < sub * 6)
    ).astype(jnp.float32)
    # per-lane query compare values, one per split box: lo lanes need
    # qmax + h >= g, hi lanes need qmin - h <= g
    qc = jnp.where(
        is_lo,
        jnp.take(qmax + h, fc, axis=-1),
        jnp.take(qmin - h, fc, axis=-1),
    )  # (nb, S, 128)
    live = jnp.arange(m, dtype=jnp.int32) < count[:, None]  # (nb, m)
    candc = jnp.where(live, cand, 0)

    def run(args):
        candc_c, qc_c, live_c, cand_c = args
        rows = candc_c.shape[0]
        g = jnp.take(bp, candc_c.reshape(-1), axis=0).reshape(rows, m, 128)
        ok = jnp.zeros((rows, sub, m), bool)
        for s in range(s_split):
            qs = qc_c[:, s, None, :]  # (rows, 1, 128)
            pred = jnp.where(is_lo, g <= qs, g >= qs)
            counts = jnp.einsum(
                "rml,ls->rsm",
                pred.astype(jnp.float32),
                sel,
                preferred_element_type=jnp.float32,
            )
            ok = ok | (counts == 6.0)
        ok = ok & live_c[:, None, :]
        ids = cand_c[:, None, :] * sub + jnp.arange(sub, dtype=jnp.int32)[
            None, :, None
        ]
        keys = jnp.where(ok, ids, REFINE_SENTINEL)  # (rows, sub, m)
        count_c = jnp.sum(ok, axis=(1, 2))
        return keys, count_c

    chunk = max(1, min(nb, REFINE_CHUNK_BYTES // (m * 128 * 4)))
    if chunk == nb:
        keys, count_sub = run((candc, qc, live, cand))
    else:
        nch = -(-nb // chunk)
        pad = nch * chunk - nb

        def cc(a):
            if pad:
                a = jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
                )
            return a.reshape((nch, chunk) + a.shape[1:])

        keys, count_sub = jax.lax.map(run, (cc(candc), cc(qc), cc(live), cc(cand)))
        keys = keys.reshape((-1, sub, m))[:nb]
        count_sub = count_sub.reshape(-1)[:nb]

    # (nb, sub, m) -> (nb, sub*m) via lane concat (order irrelevant: the
    # ascending sort packs live ids to the front either way)
    keys = jnp.concatenate([keys[:, s, :] for s in range(sub)], axis=1)
    cand_sub = _self_priority_sort(keys, self_lo, self_width, max_sub)
    overflow = jnp.any(count_sub > max_sub)
    return cand_sub, jnp.minimum(count_sub, max_sub), overflow


def refine_candidates_exact(
    cand: jnp.ndarray,
    count: jnp.ndarray,
    qlo: jnp.ndarray,
    qhi: jnp.ndarray,
    pos_blocked: jnp.ndarray,
    h: float,
    sub: int,
    max_sub: int,
    self_lo: jnp.ndarray | None = None,
    self_width: int = 1,
):
    """Exact-position subblock refinement — the round-3 production path.

    :func:`refine_candidates` tests candidate subblock *AABBs* against
    dilated query boxes; box-box overlap admits subblocks whose box
    corner clips the query box but whose particles are all farther than
    h from every query particle. This variant tests every candidate
    block PARTICLE against the query boxes instead, with the exact
    point-to-box distance (the "rounded box" test): a subblock survives
    only iff >= 1 of its particles lies within h of some query box —
    sum_axis max(lo-p, p-hi, 0)^2 <= h^2. The candidate-side slack
    vanishes entirely AND the dilated-box corner slack (a point inside
    the Minkowski box but > h from the box itself — ~11% of admitted
    volume at 1M) goes with it; what remains is the query-side box
    slack (distance to the box underestimates distance to the query
    particles). Supersets never change the physics — the smoothing
    kernels' hard r<h cutoff zeroes every extra pair (smoothing.cl:1-4)
    — so this only shrinks kernel work.

    ``cand`` (nb, M) / ``count`` (nb,): block-granularity lists;
    ``qlo``/``qhi`` (nb, S, 3): query boxes (gap-split boxes from
    :func:`split_block_bounds`); ``pos_blocked`` (nbc, B, 3): candidate
    block positions in sorted order (sentinel particles sit at far
    coordinates, outside every box, so no real-mask is needed).

    Layout (the LAYOUT RULE): the per-slot position gather reads a FLAT
    (nbc, 3*B) field-major pack — lanes [px*B | py*B | pz*B] — so its
    (rows, M, 3B) output is padding-free under the (8, 128) tiling.
    Each particle's 3 per-axis squared deficits are summed with one
    (rows*M, 3B) @ (3B, B) MXU product per query box; the deficits are
    NOT bf16-exact under the MXU's DEFAULT operand truncation, so the
    h^2 threshold is inflated by 1% — strictly conservative (can only
    admit extra subblocks near the boundary, never reject a true
    neighbour; the admitted shell is ~0.5% of h). Chunked over query
    rows under REFINE_CHUNK_BYTES.

    Returns (cand_sub (nb, max_sub) int32 with dead slots =
    REFINE_SENTINEL, count_sub (nb,), overflowed () bool).
    ``self_lo``/``self_width``: optional truncation-safe self range
    (:func:`_self_priority_sort`).
    """
    nb, m = cand.shape
    s_boxes = qlo.shape[1]
    nbc, b, _ = pos_blocked.shape
    # flat field-major position pack (nbc, 3B)
    pp = pos_blocked.swapaxes(1, 2).reshape(nbc, 3 * b)
    # sel[l, p] = 1 iff lane l belongs to particle p (l % B == p)
    lane = jnp.arange(3 * b, dtype=jnp.int32)
    sel = (lane[:, None] % b == jnp.arange(b)[None, :]).astype(jnp.float32)
    # per-lane UNdilated box bounds, field-major like the pack
    lo_l = jnp.repeat(qlo, b, axis=-1)  # (nb, S, 3B)
    hi_l = jnp.repeat(qhi, b, axis=-1)
    live = jnp.arange(m, dtype=jnp.int32) < count[:, None]  # (nb, m)
    candc = jnp.where(live, cand, 0)
    # bf16-truncation guard for the deficit matmul (see docstring)
    h2_cut = float(h) * float(h) * 1.01

    def run(args):
        candc_c, lo_c, hi_c, live_c, cand_c = args
        rows = candc_c.shape[0]
        g = jnp.take(pp, candc_c.reshape(-1), axis=0).reshape(rows, m, 3 * b)
        inside = jnp.zeros((rows, m, b), bool)
        for s in range(s_boxes):
            # per-axis deficit: 0 inside the box slab, distance outside
            deficit = jnp.maximum(
                jnp.maximum(lo_c[:, s, None, :] - g, g - hi_c[:, s, None, :]),
                0.0,
            )
            # clamp: sentinel/far particles would square to inf
            deficit = jnp.minimum(deficit, 1.0e6)
            d2 = jnp.einsum(
                "rml,lp->rmp", deficit * deficit, sel,
                preferred_element_type=jnp.float32,
            )
            inside = inside | (d2 <= h2_cut)
        inside = inside & live_c[:, :, None]
        # subblock survives iff any member particle is inside
        ok = jnp.any(inside.reshape(rows, m, sub, b // sub), axis=-1)
        ok = ok.swapaxes(1, 2)  # (rows, sub, m)
        ids = cand_c[:, None, :] * sub + jnp.arange(sub, dtype=jnp.int32)[
            None, :, None
        ]
        keys = jnp.where(ok, ids, REFINE_SENTINEL)
        count_c = jnp.sum(ok, axis=(1, 2))
        return keys, count_c

    args = (candc, lo_l, hi_l, live, cand)
    chunk = max(1, min(nb, REFINE_CHUNK_BYTES // (m * 3 * b * 4)))
    if chunk == nb:
        keys, count_sub = run(args)
    else:
        nch = -(-nb // chunk)
        pad = nch * chunk - nb

        def cc(a):
            if pad:
                a = jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
                )
            return a.reshape((nch, chunk) + a.shape[1:])

        keys, count_sub = jax.lax.map(run, tuple(cc(a) for a in args))
        keys = keys.reshape((-1, sub, m))[:nb]
        count_sub = count_sub.reshape(-1)[:nb]

    keys = jnp.concatenate([keys[:, s, :] for s in range(sub)], axis=1)
    cand_sub = _self_priority_sort(keys, self_lo, self_width, max_sub)
    overflow = jnp.any(count_sub > max_sub)
    return cand_sub, jnp.minimum(count_sub, max_sub), overflow


def route_overflow(count: jnp.ndarray, c1: int, nb2: int):
    """Two-tier capacity routing: rows whose candidate count exceeds
    the base capacity ``c1`` are routed to a fixed pool of ``nb2``
    tier-2 slots, processed separately at a larger capacity.

    Why: gather volume and kernel DMA scale with the STATIC capacity,
    not the actual counts (dead slots are fetched either way), so a
    global capacity regrowth doubles the dominant cost for every block
    when only a few dense ones overflow — the 4M dam-break's failure
    mode (BASELINE.md r2: regrowth to 192 cost 2x all gather volumes
    while the hydrostatically compressed bottom blocks alone needed
    it). Routing the heavy tail to nb2 = nb/8 slots at 2x capacity
    costs ~25% extra volume instead of +100%.

    Returns (idx (nb2,) int32 routed row ids, used (nb2,) bool slot
    validity, count1 (nb,) tier-1 counts with routed rows zeroed,
    pool_overflow () bool — more heavy rows than slots; the engine
    responds by halving tier2_frac). ``idx`` rows are distinct (top_k
    picks positions), so scatter-merges over them are well defined;
    unused slots point at arbitrary rows and MUST be masked with
    ``used``.
    """
    heavy = count > c1
    vals, idx = jax.lax.top_k(jnp.where(heavy, count, -1), nb2)
    used = vals > 0
    count1 = jnp.where(heavy, 0, count)
    pool_overflow = jnp.sum(heavy.astype(jnp.int32)) > nb2
    return idx.astype(jnp.int32), used, count1, pool_overflow


def compact_hits(cand_sub: jnp.ndarray, hits: jnp.ndarray, max_hit: int,
                 self_lo: jnp.ndarray | None = None, self_width: int = 1):
    """Compact a refined candidate list to its TRUE-HIT subblocks.

    ``hits`` (nb, M) float counters from the density kernel's hit-flag
    rows (neighbor.py _density_core_rowout): slot j > 0 iff subblock
    cand_sub[i, j] has >= 1 particle within the support radius of some
    particle of query block i. Dropping no-hit subblocks from the FORCE
    pass is physics-exact — every force term carries the hard r < h
    cutoff clamp, so a no-hit subblock contributes exactly 0.0
    (measured at 1M: 2084 admitted -> 1677 true-hit slots/particle).

    Returns (cand_hit (nb, max_hit), count_hit (nb,), overflowed).
    ``self_lo``/``self_width``: optional truncation-safe self range
    (:func:`_self_priority_sort`).
    """
    live = hits > 0.0
    ids = jnp.where(live, cand_sub, REFINE_SENTINEL)
    cand_hit = _self_priority_sort(ids, self_lo, self_width, max_hit)
    count_hit = jnp.sum(live, axis=1, dtype=jnp.int32)
    overflow = jnp.any(count_hit > max_hit)
    return cand_hit, jnp.minimum(count_hit, max_hit), overflow


def candidate_blocks_auto(bmin, bmax, h, max_candidates):
    """Pick the dense or hierarchical search by problem size.

    The level-1 superblock cap scales with max_candidates (so the
    engine's capacity autotune also relieves level-1 overflow) AND
    with nsb/3: a handful of superblocks are Morton "sheet runs"
    (gapless snakes over 2D cell sheets on non-power-of-two grids —
    splitting can't shrink them) whose counts grow with the superblock
    total: measured max 162/340/467 at nsb 512/1024/2048 on cube
    lattices. Level 2 is chunked, so the bigger cap costs level-2
    test volume (~linear in the cap), not peak memory.
    """
    nb = bmin.shape[0]
    if nb > HIERARCHICAL_THRESHOLD and nb % SUPER == 0:
        nsb = nb // SUPER
        super_cand = max(SUPER_CAND, max_candidates, -(-nsb // 3))
        return candidate_blocks_hierarchical(
            bmin, bmax, h, max_candidates, super_cand=super_cand
        )
    return candidate_blocks(bmin, bmax, h, max_candidates)


class BlockedFields(NamedTuple):
    """Morton-sorted per-particle fields reshaped to (nb, B, ...)."""

    position: jnp.ndarray  # (nb, B, 3)
    velocity: jnp.ndarray  # (nb, B, 3)
    density: jnp.ndarray  # (nb, B)
    pressure: jnp.ndarray  # (nb, B)
    real: jnp.ndarray  # (nb, B) bool
    gid: jnp.ndarray  # (nb, B) int32 global sorted index


def make_blocked(
    position, velocity, density, pressure, real, block_size: int, gid_offset=0
):
    """``gid_offset`` makes gids globally unique across shards (each
    shard passes shard_index * local_n) so self-exclusion works against
    an all-gathered candidate table."""
    n = position.shape[0]
    nb = n // block_size
    gid = jnp.arange(n, dtype=jnp.int32) + gid_offset
    rs = lambda a: a.reshape((nb, block_size) + a.shape[1:])
    return BlockedFields(
        position=rs(position),
        velocity=rs(velocity),
        density=rs(density),
        pressure=rs(pressure),
        real=rs(real),
        gid=rs(gid),
    )


def _pair_r2_direct(qp, cp):
    rvec = qp[:, :, None, :] - cp[:, None, :, :]  # (nb, B, B, 3)
    return rvec, jnp.sum(rvec * rvec, axis=-1)


def _pair_r2_mxu(qp, cp):
    """r^2 via the matmul identity, centred per pair for precision.

    Centering on the query block's first particle keeps coordinates at
    the scale of a block extent (~h), so the |q|^2+|c|^2-2qc
    cancellation stays far below the 1e-4 parity budget.
    """
    center = qp[:, :1, :]
    q = qp - center
    c = cp - center
    qq = jnp.sum(q * q, axis=-1)  # (nb, B)
    cc = jnp.sum(c * c, axis=-1)
    qc = jnp.einsum("nbd,ncd->nbc", q, c, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    r2 = qq[:, :, None] + cc[:, None, :] - 2.0 * qc
    return jnp.maximum(r2, 0.0)


def density_pass(
    blocked: BlockedFields,
    cand: jnp.ndarray,
    count: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    cfg: TileConfig,
    cand_fields: BlockedFields | None = None,
) -> jnp.ndarray:
    """Tile-parallel poly6 density (forces.cl:14-42 semantics).

    ``cand_fields`` is the block table candidate indices refer to —
    defaults to ``blocked`` (single-chip); under shard_map it is the
    all-gathered global block table (parallel/sharded_step.py).
    Returns flat (n,) density over the sorted order (sentinels get
    rest density to keep downstream divisions finite).
    """
    cf = cand_fields if cand_fields is not None else blocked
    h = params.h
    qp = blocked.position

    def step(acc, m):
        # dead slots may hold REFINE_SENTINEL (hierarchical search);
        # clamp the gather index — jnp.take's default fill mode would
        # return NaN rows, and even masked physics NaN-poisons the
        # einsums downstream (0 * NaN = NaN in force_pass)
        c = jnp.minimum(cand[:, m], cf.position.shape[0] - 1)  # (nb,)
        cp = jnp.take(cf.position, c, axis=0)  # (nb, B, 3)
        creal = jnp.take(cf.real, c, axis=0)  # (nb, B)
        if cfg.mode == "mxu":
            r2 = _pair_r2_mxu(qp, cp)
        else:
            _, r2 = _pair_r2_direct(qp, cp)
        r = jnp.sqrt(r2)
        w = smoothing.poly_6(r, h, terms)  # (nb, B, B)
        ok = (m < count)[:, None, None] & creal[:, None, :]
        contrib = jnp.sum(jnp.where(ok, w, 0.0), axis=2)  # (nb, B)
        return acc + contrib, None

    acc0 = jnp.zeros(qp.shape[:2], jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, jnp.arange(cfg.max_candidates))
    density = params.particle_mass * acc
    density = jnp.where(blocked.real, density, params.fluid_density)
    return density.reshape(-1)


def force_pass(
    blocked: BlockedFields,
    cand: jnp.ndarray,
    count: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    cfg: TileConfig,
    cand_fields: BlockedFields | None = None,
) -> jnp.ndarray:
    """Tile-parallel internal forces + gravity (forces.cl:44-126).

    ``cand_fields`` as in :func:`density_pass`. Returns flat (n, 3)
    acceleration over the sorted order.
    """
    cf = cand_fields if cand_fields is not None else blocked
    h = params.h
    mass = params.particle_mass
    qp = blocked.position
    qv = blocked.velocity
    qrho = blocked.density
    qpress = blocked.pressure
    self_coeff = (qpress / qrho**2)[:, :, None]  # p_i / rho_i^2

    def step(carry, m):
        press_acc, visc_acc, norm_acc, lap_acc = carry
        # clamp dead-slot sentinels (see density_pass step note)
        c = jnp.minimum(cand[:, m], cf.position.shape[0] - 1)
        cp = jnp.take(cf.position, c, axis=0)
        cv = jnp.take(cf.velocity, c, axis=0)
        crho = jnp.take(cf.density, c, axis=0)
        cpress = jnp.take(cf.pressure, c, axis=0)
        creal = jnp.take(cf.real, c, axis=0)
        cgid = jnp.take(cf.gid, c, axis=0)

        if cfg.mode == "mxu":
            r2 = _pair_r2_mxu(qp, cp)
        else:
            _, r2 = _pair_r2_direct(qp, cp)
        r = jnp.sqrt(r2)  # (nb, B, B)

        ok = (m < count)[:, None, None] & creal[:, None, :]
        is_self = blocked.gid[:, :, None] == cgid[:, None, :]
        not_self = ok & ~is_self

        cut = smoothing.support_mask(r, h)  # (nb, B, B)
        near0 = r < smoothing.EPSILON
        safe_r = jnp.where(near0, 1.0, r)

        # ---- pressure: A_ij = p_coeff * spiky_scale(r)/r, term = rowsum(A)x_i - A X_j
        p_coeff = (cpress / crho**2)[:, None, :] + self_coeff  # (nb, B, B)
        spiky_s = cut * terms.spiky * (h - r) ** 2 / safe_r
        a_mat = jnp.where(not_self & ~near0, mass * p_coeff * spiky_s, 0.0)
        # Positions are centred on the query block before the matmul so
        # rowsum(A)x - A X does not cancel catastrophically in f32.
        qpc = qp - qp[:, :1, :]
        cpc = cp - qp[:, :1, :]
        press = jnp.sum(a_mat, axis=2)[:, :, None] * qpc - jnp.einsum(
            "nij,njd->nid", a_mat, cpc, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32
        )
        # singular branch (smoothing.cl:23-25): coincident distinct pair
        sing = jnp.where(not_self & near0, mass * p_coeff * terms.spiky, 0.0)
        press = press + jnp.sum(sing, axis=2)[:, :, None]

        # ---- viscosity: B_ij = (m/rho_j) visc_lap(r); term = B V_j - rowsum(B) v_i
        b_mat = jnp.where(
            not_self, (mass / crho)[:, None, :] * cut * terms.viscosity * (h - r), 0.0
        )
        visc = jnp.einsum(
            "nij,njd->nid", b_mat, cv, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32
        ) - jnp.sum(b_mat, axis=2)[:, :, None] * qv

        # ---- colour field (self included)
        g_mat = jnp.where(
            ok,
            (mass / crho)[:, None, :]
            * cut
            * terms.poly_6_gradient
            * (h * h - r2) ** 2,
            0.0,
        )
        norm = jnp.sum(g_mat, axis=2)[:, :, None] * qpc - jnp.einsum(
            "nij,njd->nid", g_mat, cpc, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32
        )
        l_mat = jnp.where(
            ok,
            (mass / crho)[:, None, :]
            * cut
            * terms.poly_6_laplacian
            * (h * h - r2)
            * (3.0 * h * h - 7.0 * r2),
            0.0,
        )
        lap = jnp.sum(l_mat, axis=2)

        return (press_acc + press, visc_acc + visc, norm_acc + norm, lap_acc + lap), None

    nb, bsz = qp.shape[:2]
    z3 = jnp.zeros((nb, bsz, 3), jnp.float32)
    z1 = jnp.zeros((nb, bsz), jnp.float32)
    (press, visc, norm, lap), _ = jax.lax.scan(
        step, (z3, z3, z3, z1), jnp.arange(cfg.max_candidates)
    )

    total = -qrho[:, :, None] * press + visc * params.dynamic_viscosity
    nlen = jnp.linalg.norm(norm, axis=-1, keepdims=True)
    apply_st = nlen > params.surface_tension_threshold
    st = (
        -params.surface_tension
        * lap[:, :, None]
        * norm
        / jnp.where(apply_st, nlen, 1.0)
    )
    total = total + jnp.where(apply_st, st, 0.0)
    accel = total / qrho[:, :, None] + jnp.asarray(
        params.constant_acceleration, dtype=jnp.float32
    )
    return accel.reshape(-1, 3)
