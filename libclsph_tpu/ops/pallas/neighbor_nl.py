"""Gathered-subblock ("neighbour list") Pallas kernels — round-2
production path.

Round 1's fused kernels (neighbor.py) DMA whole 128-particle candidate
blocks through scalar-prefetched index maps; the candidate superset is
~4.7k pair tests per particle at 1M against ~30 real neighbours,
because the candidate-side granularity is a full Morton block. Mosaic
cannot DMA at finer (32-lane) granularity — lane-dim blocks must be
128 — so this module moves the irregular access OUT of the kernel:

1. candidate lists are refined to 32-particle subblocks against the
   dilated query boxes (tiles.refine_candidates) — the candidate-side
   extent shrinks ~4^(1/3), cutting pair volume ~35%, and finer query
   blocks (StepConfig.nl_query_rows) cut it further (~55% at 32 rows);
2. XLA pre-gathers subblock field packs and lane-packs GROUP=4
   subblocks into each 128-lane tile: a dense tile stream — no
   data-dependent DMA remains in the kernel;
3. the kernel is a plain dense sweep over (query block, candidate
   tile) with the per-block tile count scalar-prefetched for the
   compute skip. Pair math is shared with neighbor.py
   (_density_core/_forces_core).

LAYOUT RULE (hard-won): every large intermediate must be padding-free
under the TPU's (8, 128) tiled layout. A (rows, F, SUB) gather output
pads 32->128 lanes and 9->16 sublanes = 7.1x HBM expansion (measured:
11.5 GB at 1M — instant OOM). So the candidate pack stores FLAT rows
(nc+1, F*SUB), the gather is chunked, and the kernel consumes a flat
2D (nb*mg*F, 128) tile stream whose dims are exact tile multiples.

Physics identical to ops/tiles.py / neighbor.py (and therefore to
compute_density_with_grid / compute_internal_forces_with_grid,
forces.cl:14-111), including the spiky r->0 singular branch and the
i != j exclusion.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import smoothing
from ...core.params import PrecomputedKernelValues, SimulationParameters
from .neighbor import (
    MAX_PARTICLES_F32_ID,
    _density_core_rowout,
    _emit_hit_flags,
    _forces_core_rowout,
    _interleave,
    _interpret_default,
    _reduce_dot,
)

LANES = 128
SUB = 32  # candidate subblock size
GROUP = LANES // SUB  # subblocks packed per tile
SUB16 = 16  # fine candidate half-subblocks (force_sub16 path)
GROUP16 = LANES // SUB16  # 16-wide subblocks packed per tile
# candidate tiles consumed per grid step. The flat 2D tile stream is
# blocked (TPS*F, 128); TPS=8 makes the sublane extent divisible by 8
# (Mosaic's tiling rule) for both F=4 (32 rows) and F=9 (72 rows),
# while the per-tile pl.when compute skip stays tile-granular.
TPS = 8
# Python float, not jnp (jnp module-level scalars become hoisted jaxpr
# constants; see tiles.SENTINEL_CODE note)
FAR = 1.0e8  # dead-row position: never within any support radius
# transient budget for the gather's (rows, M, F*SUB) intermediate
GATHER_CHUNK_BYTES = 256 << 20
# budget for the materialised raw candidate stream fed to one
# pallas_call. The stream scales with CAPACITY (nb * max_candidates_sub
# rows), not live counts — unchunked it is 2.4 GB at 1M/q128 and OOMs
# outright at 4M or with fine query rows (q32 = 4x nb). _nl_call
# lax.maps gather+kernel over query-block chunks under this budget.
# The lax.map serialisation costs ~25 ms/substep at 1M, so the budget
# is set above the headline workload's stream (single chunk at 1M
# q128) and chunking only engages where the alternative is an OOM.
NL_CHUNK_BYTES = int(os.environ.get("LIBCLSPH_TPU_NL_CHUNK_MB", "3072")) << 20
# fold the density pass's candidate table into one grid step per query
# block (see fused_density_nl); "0" restores the r3 8-tile steps
_DENSITY_FOLD = os.environ.get("LIBCLSPH_TPU_DENSITY_FOLD", "1") != "0"


def make_query_planes(position, velocity, density, pressure, real, block_size,
                      mass=1.0, gid_offset=0, center=None):
    """Column-oriented query packs (see neighbor.py layouts):
    q_pos (nb, 3, B, 1), q_force (nb, 8, B, 1).

    ``center``: optional (3,) world point subtracted from positions.
    The pair math only sees differences, so any center is physically
    neutral; the MXU-r2 path (neighbor._r2_mxu) needs coordinates
    centred to keep the |q|^2+|c|^2-2qc cancellation benign. Query and
    candidate packs MUST use the same center."""
    n = position.shape[0]
    nb = n // block_size
    # (gid_offset may be a traced shard index under shard_map; the
    # exact-f32 range check only applies to concrete offsets)
    if isinstance(gid_offset, int) and n + gid_offset >= MAX_PARTICLES_F32_ID:
        raise ValueError("particle ids exceed exact-f32 range")
    if center is not None:
        position = position - center
    safe_rho = jnp.where(density > 0, density, 1.0)
    pm = jnp.where(real, mass * pressure / (safe_rho * safe_rho), 0.0)
    gidf = (jnp.arange(n, dtype=jnp.int32) + gid_offset).astype(jnp.float32)
    px, py, pz = position[:, 0], position[:, 1], position[:, 2]
    vx, vy, vz = velocity[:, 0], velocity[:, 1], velocity[:, 2]

    def pack(fields):
        return _interleave(fields, nb, block_size)[..., None]

    return pack([px, py, pz]), pack([px, py, pz, vx, vy, vz, pm, gidf])


def make_csub_packs(position, velocity, density, pressure, real,
                    mass=1.0, gid_offset=0, gid=None, center=None):
    """Row-oriented candidate subblock packs in the flat padding-free
    layout (see module docstring), each with ONE trailing dead row
    (index nc) that refined sentinel slots map to:

    c_pos   (nc+1, 4*SUB)  — px py pz realmask
    c_force (nc+1, 12*SUB) — px py pz vx vy vz pm mr gid + 3 zero pads

    The force pack is padded from 9 to 12 fields so each row is a
    whole number of 128-lane vregs (12*32 = 384): XLA's row gather
    runs ~2x faster on lane-aligned rows (measured 27 -> 19 ms per
    force pass at 1M on v5e; the pad bytes are free at the gather's
    row-descriptor rate). gather_tiles trims the pads during the
    lane-pack transpose.

    ``gid``: explicit flat int32 particle-id plane (e.g. of a gathered
    multi-shard table, parallel/sharded_step.py); defaults to
    arange + gid_offset. Ids must stay below 2^24 for exact f32.
    """
    n = position.shape[0]
    nc = n // SUB
    if gid is None and isinstance(gid_offset, int) and (
        n + gid_offset >= MAX_PARTICLES_F32_ID
    ):
        raise ValueError("particle ids exceed exact-f32 range")
    if center is not None:
        position = position - center
    realf = real.astype(jnp.float32)
    safe_rho = jnp.where(density > 0, density, 1.0)
    pm = jnp.where(real, mass * pressure / (safe_rho * safe_rho), 0.0)
    mr = jnp.where(real, mass / safe_rho, 0.0)
    if gid is None:
        gidf = (jnp.arange(n, dtype=jnp.int32) + gid_offset).astype(jnp.float32)
    else:
        gidf = gid.astype(jnp.float32)
    px, py, pz = position[:, 0], position[:, 1], position[:, 2]
    vx, vy, vz = velocity[:, 0], velocity[:, 1], velocity[:, 2]

    def pack(fields, pad_to=None):
        f = len(fields)
        a = _interleave(fields, nc, SUB).reshape(nc, f * SUB)
        if pad_to is not None and pad_to > f:
            a = jnp.pad(a, ((0, 0), (0, (pad_to - f) * SUB)))
            f = pad_to
        dead = jnp.zeros((1, f * SUB), jnp.float32)
        dead = dead.at[:, : 3 * SUB].set(FAR)  # positions first
        return jnp.concatenate([a, dead], axis=0)

    c_pos = pack([px, py, pz, realf])
    c_force = pack([px, py, pz, vx, vy, vz, pm, mr, gidf], pad_to=12)
    return c_pos, c_force


def gather_raw(cpack: jnp.ndarray, cand_sub: jnp.ndarray) -> jnp.ndarray:
    """Gather candidate subblock rows WITHOUT lane-packing: (nc+1,
    F*SUB) flat pack and (nb, M) refined ids -> (nb*M, F*SUB) raw row
    stream in slot order. The kernels assemble (F, 128) tiles from 4
    raw rows in-registers (:func:`_tile_from_raw`): XLA's row gather
    runs at ~130 GB/s on lane-aligned rows, but the lane-pack
    TRANSPOSE that gather_tiles does afterwards runs at ~30 GB/s (~145
    ms/substep at 1M, measured) — in-kernel assembly costs ~10% of
    kernel time instead. F*SUB must be a whole number of 128-lane
    vregs (pad the pack)."""
    fs = cpack.shape[1]
    if fs % LANES:
        raise ValueError("raw pack rows must be whole 128-lane vregs")
    dead = cpack.shape[0] - 1
    idx = jnp.minimum(cand_sub, dead)
    out = jnp.take(cpack, idx.reshape(-1), axis=0)
    return out


def _tile_from_raw(craw, t, nv):
    """Assemble one (4*nv, 128) candidate tile from raw gathered rows.

    ``craw``: (TPS*GROUP, 128*nv) block of raw pack rows (row = one
    subblock, lanes = [f0:32 | f1:32 | ...]); tile t uses rows
    t*GROUP..t*GROUP+3. For each 128-lane vreg column this is a 4x4
    block transpose with 32-lane cells — dest[f, s*32:] =
    src[s, f*32:] — done as 4 (sublane-roll, lane-roll, select)
    rounds, diagonal d at a time.
    """
    ct = craw[t * GROUP : (t + 1) * GROUP, :]  # (4, 128*nv)
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 1) // SUB
    row_i = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 0)
    rows = []
    for v in range(nv):
        cv = ct[:, v * LANES : (v + 1) * LANES]  # (4, 128)
        out = jnp.zeros_like(cv)
        for d in range(GROUP):
            r = pltpu.roll(cv, (GROUP - d) % GROUP, axis=0)
            r = pltpu.roll(r, d * SUB, axis=1)
            out = jnp.where((lane_q - row_i) % GROUP == d, r, out)
        rows.append(out)
    return jnp.concatenate(rows, axis=0)  # (4*nv, 128), field-major


def gather_tiles(cpack: jnp.ndarray, cand_sub: jnp.ndarray,
                 f_out: int | None = None) -> jnp.ndarray:
    """RETIRED feed path, kept as the reference implementation for the
    production gather_raw + _tile_from_raw in-kernel assembly (their
    tile-for-tile equality is pinned by
    tests/test_nl_layout.py::test_gather_raw_assembly_matches_gather_tiles)
    and for experiments/. Its XLA lane-pack transpose runs at ~30 GB/s
    (~145 ms/substep at 1M, measured) — that cost is why the kernels
    assemble in-register instead.

    Gather + lane-pack candidate subblocks: (nc+1, F*SUB) flat pack
    and (nb, M) refined ids (dead slots >= pack rows) -> the flat 2D
    (nb * M/GROUP * F_OUT, LANES) tile stream consumed sequentially by
    the kernel grid. ``f_out`` trims gather-alignment pad fields (the
    pack may carry zero pads so its rows are whole 128-lane vregs).
    Chunked over query blocks so the (rows, M, F*SUB) gather transient
    stays under GATHER_CHUNK_BYTES."""
    nb, m = cand_sub.shape
    fs = cpack.shape[1]
    f = fs // SUB
    f_out = f if f_out is None else f_out
    dead = cpack.shape[0] - 1
    idx = jnp.minimum(cand_sub, dead)
    mg = m // GROUP

    def run(ix):
        rows = ix.shape[0]
        g = jnp.take(cpack, ix, axis=0)  # (rows, M, F*SUB)
        g = g.reshape(rows, mg, GROUP, f, SUB)[:, :, :, :f_out]
        g = g.swapaxes(2, 3)
        return g.reshape(rows * mg * f_out, LANES)

    chunk_rows = max(1, GATHER_CHUNK_BYTES // (m * fs * 4))
    if nb <= chunk_rows:
        return run(idx)
    nch = -(-nb // chunk_rows)
    rows = -(-nb // nch)
    pad = nch * rows - nb
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.full((pad, m), dead, idx.dtype)], axis=0
        )
    out = jax.lax.map(run, idx.reshape(nch, rows, m))
    return out.reshape(-1, LANES)[: nb * mg * f_out]


def _pad_groups(cand_sub, count, group=GROUP, tps=TPS):
    """Pad the refined table to a whole number of (group*tps)-subblock
    grid steps and convert counts to tile units. ``group``: subblocks
    lane-packed per tile (GROUP for 32-wide, GROUP16 for 16-wide,
    GROUP8 for 8-wide); ``tps``: tiles per grid step (the sub-8 force
    pass adapts it to the capacity so the window is not padded up to
    8 tiles — streamed bytes scale with the PADDED capacity)."""
    from ...ops.tiles import REFINE_SENTINEL

    nb, m = cand_sub.shape
    step = group * tps
    mp = -(-m // step) * step
    if mp != m:
        pad = jnp.full((nb, mp - m), REFINE_SENTINEL, cand_sub.dtype)
        cand_sub = jnp.concatenate([cand_sub, pad], axis=1)
    count_tiles = -(-count // group)
    return cand_sub, count_tiles


def _nl_call(kernel, q, cpack, cand_sub, count_tiles, out_rows, interpret,
             with_qrow=False, group=GROUP, tps=TPS):
    """Shared driver for the nl kernels: lax.map over query-block
    chunks, each chunk = row gather (gather_raw) + one pallas_call over
    (chunk, mg) grid steps. Chunking bounds the raw-stream transient to
    NL_CHUNK_BYTES; XLA frees each chunk's stream before the next.
    ``group``: candidate subblocks per 128-lane tile (GROUP at 32-wide,
    GROUP16 at 16-wide). ``tps``: candidate tiles per grid step — the
    caller may fold the whole padded table into ONE step per query
    block (measured r4: per-grid-step pipeline bookkeeping costs more
    than the bigger VMEM window; see _forces_kernel_q32x4_c16)."""
    nb = q.shape[0]
    f_q, b = q.shape[1], q.shape[2]
    fs = cpack.shape[1]
    mp = cand_sub.shape[1]
    mg = mp // (tps * group)
    dead = cpack.shape[0] - 1
    chunk = max(1, min(nb, NL_CHUNK_BYTES // (mp * fs * 4)))
    q_row = q[..., 0] if with_qrow else None

    def run_chunk(args):
        if with_qrow:
            cand_c, count_c, qc, qrow_c = args
        else:
            cand_c, count_c, qc = args
            qrow_c = None
        raw = gather_raw(cpack, cand_c)
        in_specs = [
            pl.BlockSpec((1, f_q, b, 1), lambda i, m, n_: (i, 0, 0, 0)),
        ]
        extra = ()
        if with_qrow:
            in_specs.append(
                pl.BlockSpec((1, f_q, b), lambda i, m, n_: (i, 0, 0))
            )
            extra = (qrow_c,)
        in_specs.append(
            pl.BlockSpec((tps * group, fs), lambda i, m, n_: (i * mg + m, 0))
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cand_c.shape[0], mg),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, out_rows, b), lambda i, m, n_: (i, 0, 0)
            ),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (cand_c.shape[0], out_rows, b), jnp.float32
            ),
            interpret=interpret,
        )(count_c, qc, *extra, raw)

    args = (cand_sub, count_tiles, q) + ((q_row,) if with_qrow else ())
    if chunk == nb:
        return run_chunk(args)
    nch = -(-nb // chunk)
    pad = nch * chunk - nb
    fills = (dead, 0, 0, 0)

    def cc(a, fill):
        if pad:
            tail = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
            a = jnp.concatenate([a, tail], axis=0)
        return a.reshape((nch, chunk) + a.shape[1:])

    out = jax.lax.map(
        run_chunk, tuple(cc(a, f) for a, f in zip(args, fills))
    )
    return out.reshape((-1,) + out.shape[2:])[:nb]


def _density_kernel(count_ref, q, c, out, *, h, poly6, r2_mxu, hit_rows=0,
                    hit_groups=1, hit_sub=SUB, c16=False, hit2_h=None,
                    hit2_rows=0, hit2_row0=0, tps=TPS):
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out[...] = jnp.zeros_like(out)

    for s in range(tps):

        @pl.when(m * tps + s < count_ref[i])
        def _(s=s):
            if c16:
                # (nc16-granular pos pack: 8 fields x 16 lanes, one
                # vreg per row; rows 0..3 = px py pz realmask)
                tile = _transpose16_half(
                    c[s * GROUP16 : (s + 1) * GROUP16, :]
                )
            else:
                tile = _tile_from_raw(c, s, 1)  # (4, 128)
            # flag slots per tile = 128 lanes / hit_sub (4 at 32-wide,
            # 8 at 16-wide flags for the force_sub16 path)
            hit_slot = (
                (m * tps + s) * (LANES // hit_sub) if hit_rows else None
            )
            _density_core_rowout(
                lambda k: q[0, k],
                lambda k: tile[k : k + 1, :],
                out,
                h=h, poly6=poly6, r2_mxu=r2_mxu,
                hit_slot=hit_slot, hit_rows=hit_rows, sub=hit_sub,
                hit_groups=hit_groups,
                hit2_h=hit2_h, hit2_slot=m * tps + s,
                hit2_rows=hit2_rows, hit2_row0=hit2_row0,
            )


def fused_density_nl(
    q_pos: jnp.ndarray,
    c_pos_pack: jnp.ndarray,
    cand_sub: jnp.ndarray,
    count: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    real_flat: jnp.ndarray,
    *,
    interpret: bool | None = None,
    r2_mxu: bool = False,
    want_hits: bool = False,
    hit_groups: int = 1,
    hit_sub: int = SUB,
    c16: bool = False,
    hit2_h: float | None = None,
):
    """Flat (n,) density over the sorted order. ``cand_sub``/``count``
    from tiles.refine_candidates; packs from make_query_planes /
    make_csub_packs.

    ``want_hits``: also return float hit counters (> 0 iff the slot's
    subblock has a true pair inside the support radius), slot-aligned
    with the padded ``cand_sub`` — the force pass's hit-compaction
    input (see _density_core_rowout). Shape (nb, mp) at the default
    ``hit_groups=1``; with hit_groups=G the counters are per
    QUERY-SUBGROUP of bq/G rows, shape (nb*G, mp) with group-major
    rows, feeding the q32-granular force pass (fused_forces_nl32).

    ``hit_sub``: flag granularity in particles. 16 emits one flag per
    HALF-subblock (slot j of the returned (rows, mp*2) table covers
    particles [cand_sub[i, j//2]*32 + (j%2)*16, ..+16)), feeding the
    16-wide force pass (fused_forces_nl32_c16).

    ``c16``: the candidate table/pack are natively 16-granular
    (density_sub16 path: ids from refine at sub=8 per block, pack from
    make_c16_pos_pack) — flags are then slot-aligned with ``cand_sub``
    itself and ``hit_sub`` is implied 16.

    ``hit2_h``: when given (requires want_hits), ALSO emit per-TILE
    dilated hit counters — slot t of the extra (nb*hit_groups, ntiles)
    return value counts pairs of subgroup g within ``hit2_h`` of
    candidate tile t (= slots [t*8, (t+1)*8) of the padded c16 table).
    These gate the Verlet-reuse density pass
    (:func:`fused_density_gated16`): built at the dilated threshold,
    they stay supersets of the true tile hits while the carried lists'
    staleness guard holds. Returns (density, hits, hits2)."""
    interpret = _interpret_default() if interpret is None else interpret
    group = GROUP16 if c16 else GROUP
    if c16 and hit_sub != 8:
        # c16 tables imply 16-wide flags unless the sub-8 force pass
        # asked for half-slot (8-wide) flags
        hit_sub = SUB16
    if hit2_h is not None and not (want_hits and c16):
        raise ValueError("hit2_h requires want_hits and the c16 path")
    cand_sub, count_tiles = _pad_groups(cand_sub, count, group=group)
    mp = cand_sub.shape[1]
    bq = q_pos.shape[2]  # query width = out lane extent
    # flag slots across the padded table (16-granular tables are one
    # slot per candidate id at hit_sub=16, two half-slots at 8)
    slots = mp * (SUB16 // hit_sub) if c16 else mp * (SUB // hit_sub)
    hit_rows = 0
    out_rows = 8
    hit2_rows = 0
    hit2_row0 = 0
    ntiles = mp // group
    if want_hits:
        hit_rows = -(-slots // bq)
        flag_rows = hit_groups * hit_rows
        if hit2_h is not None:
            hit2_rows = -(-ntiles // bq)
            hit2_row0 = 1 + flag_rows
            flag_rows += hit_groups * hit2_rows
        # density row 0 + flag rows, rounded to whole (8, 128) tiles
        out_rows = max(8, -(-(1 + flag_rows) // 8) * 8)
    # fold the whole padded table into ONE grid step per query block
    # when the candidate window fits VMEM comfortably: per-grid-step
    # pipeline bookkeeping is the measured cost (r4 hit16cap probe),
    # not window size. 1024 rows = a 512 KB double-buffered window.
    tps = TPS
    if _DENSITY_FOLD and ntiles * group <= 1024:
        tps = ntiles
    kernel = functools.partial(
        _density_kernel, h=float(params.h), poly6=float(terms.poly_6),
        r2_mxu=r2_mxu, hit_rows=hit_rows, hit_groups=hit_groups,
        hit_sub=hit_sub, c16=c16,
        hit2_h=None if hit2_h is None else float(hit2_h),
        hit2_rows=hit2_rows, hit2_row0=hit2_row0, tps=tps,
    )
    wsum = _nl_call(
        kernel, q_pos, c_pos_pack, cand_sub, count_tiles, out_rows,
        interpret, group=group, tps=tps,
    )
    density = params.particle_mass * wsum[:, 0, :].reshape(-1)
    density = jnp.where(real_flat, density, params.fluid_density)
    if not want_hits:
        return density
    nb = wsum.shape[0]
    hits = wsum[:, 1 : 1 + hit_groups * hit_rows, :].reshape(
        nb * hit_groups, hit_rows * bq
    )
    if hit2_h is None:
        return density, hits[:, :slots]
    hits2 = wsum[
        :, hit2_row0 : hit2_row0 + hit_groups * hit2_rows, :
    ].reshape(nb * hit_groups, hit2_rows * bq)
    return density, hits[:, :slots], hits2[:, :ntiles]


# ----------------------------------------------------------------------
# Gated reuse-substep density (two-level Verlet): on candidate-reuse
# substeps the density pass need not sweep the whole carried refined
# list — the BUILD substep's density emitted per-(query-subgroup,
# candidate-tile) hit flags at the DILATED threshold (1+slack)h
# (fused_density_nl hit2_h), and those stay supersets of the true tile
# hits while the carried lists' staleness guard holds (a pair can close
# by at most 2*Dmax <= slack*h since the anchor). This kernel runs one
# (32, 128) panel per FLAGGED (subgroup, tile) instead of the (128,128)
# panel per live tile: measured tile-hit volume is ~half the admitted
# q128 volume, and the per-slot VPU cost is identical. Gather volume is
# unchanged (the full carried list is still fetched — the flags gate
# COMPUTE, not DMA). Outputs are bit-compatible with fused_density_nl's
# c16 (density, hits) pair, so the downstream force compaction is
# untouched.
# ----------------------------------------------------------------------


def pack_tile_nibbles(hits2: jnp.ndarray, nb: int) -> jnp.ndarray:
    """(nb*QG, ntiles) dilated per-tile hit counters (group-major rows,
    fused_density_nl hit2_h) -> (nb, ntiles/8) int32 nibble words for
    the gated kernel's scalar prefetch: bit (t % 8) * 4 + g of word
    t // 8 is set iff subgroup g of the block has a (dilated) pair in
    candidate tile t. ntiles must be a multiple of 8 (it is: the padded
    table is a whole number of TPS=8-tile grid steps)."""
    ntiles = hits2.shape[1]
    if ntiles % TPS:
        raise ValueError("ntiles must be a multiple of the 8-tile step")
    b = (hits2 > 0.0).reshape(nb, QG, ntiles).astype(jnp.int32)
    t = jnp.arange(ntiles, dtype=jnp.int32)
    bits = jnp.zeros((nb, ntiles), jnp.int32)
    for g in range(QG):
        bits = bits | (b[:, g, :] << ((t % 8) * 4 + g))
    # disjoint bit patterns: the word-sum is an OR
    return jnp.sum(bits.reshape(nb, ntiles // 8, 8), axis=2)


def _density_kernel_gated16(count_ref, mask_ref, q, c, out, hq_scr, *, h,
                            poly6, hit_rows):
    """Grid (nb, mg); tile t = m*TPS + s maps to nibble word
    mask_ref[i, m], bits (s*4 + g). One (Q32, 128) panel per set bit;
    per-subgroup hit rows accumulate in the ``hq_scr`` scratch so the
    flag compression runs ONCE per tile (per-panel emission measured
    +31% at 64k — the s_mat matmul is as big as the density dot)."""
    from .neighbor import _emit_hit_flags_from_hq

    i = pl.program_id(0)
    m = pl.program_id(1)
    h2 = h * h

    @pl.when(m == 0)
    def _():
        out[...] = jnp.zeros_like(out)

    # mask_ref is FLAT (nb*mg,): a 2-D (nb, mg) SMEM prefetch operand
    # gets lane-padded to (nb, 128) int32 — 4 MB at 1M, over the 1 MB
    # SMEM budget (measured: the padded alloc failed AOT compile)
    word = mask_ref[i * pl.num_programs(1) + m]
    for s in range(TPS):
        nib = (word >> (s * 4)) & 15

        @pl.when((nib != 0) & (m * TPS + s < count_ref[i]))
        def _(s=s, nib=nib):
            hq_scr[...] = jnp.zeros_like(hq_scr)
            tile = _transpose16_half(
                c[s * GROUP16 : (s + 1) * GROUP16, :]
            )  # (8, 128): rows 0..3 = px py pz realmask
            row = lambda k: tile[k : k + 1, :]
            ones = jnp.ones_like(row(0))
            for g in range(QG):

                @pl.when(((nib >> g) & 1) != 0)
                def _(g=g):
                    col = lambda k: q[0, k, g * Q32 : (g + 1) * Q32]
                    dx = col(0) - row(0)
                    dy = col(1) - row(1)
                    dz = col(2) - row(2)
                    r2 = dx * dx + dy * dy + dz * dz
                    incl = r2 < h2

                    @pl.when(jnp.any(incl))
                    def _():
                        t_ = jnp.maximum(h2 - r2, 0.0)
                        w = (poly6 * row(3)) * (t_ * t_ * t_)
                        res = _reduce_dot(
                            ones, w, (((1,), (1,)), ((), ())),
                            lhs_exact=True, mode="split3",
                        )  # (1, 32)
                        res128 = jnp.concatenate(
                            [res, jnp.zeros((1, LANES - Q32), jnp.float32)],
                            axis=1,
                        )
                        if g:
                            res128 = pltpu.roll(res128, g * Q32, axis=1)
                        out[0, 0:1, :] += res128
                        hq_scr[g : g + 1, :] = jnp.any(
                            incl, axis=0, keepdims=True
                        ).astype(jnp.float32)

            # exact per-slot hit flags for ALL subgroups of this tile,
            # slot-aligned with the carried c16 table (feeds
            # compact_hits exactly like the ungated kernel's
            # hit_groups=QG planes; gated-off panels stay 0)
            _emit_hit_flags_from_hq(
                hq_scr[0:QG, :], out, (m * TPS + s) * GROUP16,
                hit_rows, SUB16, QG, 1, LANES,
            )


def fused_density_gated16(
    q_pos: jnp.ndarray,
    c16_pos_pack: jnp.ndarray,
    cand_sub: jnp.ndarray,
    count: jnp.ndarray,
    mask: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    real_flat: jnp.ndarray,
    *,
    interpret: bool | None = None,
):
    """Reuse-substep density over the carried 16-granular candidate
    table, gated per (query subgroup, candidate tile) by ``mask``
    (:func:`pack_tile_nibbles` of the build substep's dilated flags).
    Returns (density, hits) bit-compatible with
    ``fused_density_nl(..., want_hits=True, hit_groups=QG, c16=True)``
    over the same table — gated-off panels contribute exactly 0 to both
    (no pair within h exists there while the staleness guard holds)."""
    interpret = _interpret_default() if interpret is None else interpret
    cand_sub, count_tiles = _pad_groups(cand_sub, count, group=GROUP16)
    mp = cand_sub.shape[1]
    bq = q_pos.shape[2]
    mg = mp // (TPS * GROUP16)
    if mask.shape[1] != mg:
        raise ValueError(
            f"mask words {mask.shape[1]} != grid steps {mg} of the "
            "padded table"
        )
    hit_rows = -(-mp // bq)
    out_rows = max(8, -(-(1 + QG * hit_rows) // 8) * 8)
    kernel = functools.partial(
        _density_kernel_gated16, h=float(params.h),
        poly6=float(terms.poly_6), hit_rows=hit_rows,
    )
    nb = q_pos.shape[0]
    fs = c16_pos_pack.shape[1]
    dead = c16_pos_pack.shape[0] - 1
    chunk = max(1, min(nb, NL_CHUNK_BYTES // (mp * fs * 4)))

    def run_chunk(args):
        cand_c, count_c, mask_c, qc = args
        raw = gather_raw(c16_pos_pack, cand_c)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(cand_c.shape[0], mg),
            # (mask flattened below: 2-D SMEM operands lane-pad to 128)
            in_specs=[
                pl.BlockSpec((1, 3, bq, 1), lambda i, m, *_: (i, 0, 0, 0)),
                pl.BlockSpec(
                    (TPS * GROUP16, fs), lambda i, m, *_: (i * mg + m, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, out_rows, bq), lambda i, m, *_: (i, 0, 0)
            ),
            scratch_shapes=[pltpu.VMEM((8, LANES), jnp.float32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (cand_c.shape[0], out_rows, bq), jnp.float32
            ),
            interpret=interpret,
        )(count_c, mask_c.reshape(-1), qc, raw)

    args = (cand_sub, count_tiles, mask, q_pos)
    if chunk == nb:
        wsum = run_chunk(args)
    else:
        nch = -(-nb // chunk)
        pad = nch * chunk - nb
        fills = (dead, 0, 0, 0)

        def cc(a, fill):
            if pad:
                tail = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
                a = jnp.concatenate([a, tail], axis=0)
            return a.reshape((nch, chunk) + a.shape[1:])

        wsum = jax.lax.map(
            run_chunk, tuple(cc(a, f) for a, f in zip(args, fills))
        )
        wsum = wsum.reshape((-1,) + wsum.shape[2:])[:nb]

    density = params.particle_mass * wsum[:, 0, :].reshape(-1)
    density = jnp.where(real_flat, density, params.fluid_density)
    hits = wsum[:, 1 : 1 + QG * hit_rows, :].reshape(
        nb * QG, hit_rows * bq
    )
    return density, hits[:, :mp]


def _forces_kernel(count_ref, q, qrow, c, out, *, h, spiky, visc,
                   poly6_grad, poly6_lap, eps, r2_mxu):
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out[...] = jnp.zeros_like(out)

    for s in range(TPS):

        @pl.when(m * TPS + s < count_ref[i])
        def _(s=s):
            tile = _tile_from_raw(c, s, 3)  # (12, 128); rows 9-11 pads
            _forces_core_rowout(
                lambda k: q[0, k],
                lambda k: tile[k : k + 1, :],
                qrow, out,
                h=h, spiky=spiky, visc=visc,
                poly6_grad=poly6_grad, poly6_lap=poly6_lap, eps=eps,
                r2_mxu=r2_mxu,
            )


def fused_forces_nl(
    q_force: jnp.ndarray,
    c_force_pack: jnp.ndarray,
    cand_sub: jnp.ndarray,
    count: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    real_flat: jnp.ndarray,
    density: jnp.ndarray,
    *,
    interpret: bool | None = None,
    r2_mxu: bool = False,
) -> jnp.ndarray:
    """Flat (n, 3) acceleration over the sorted order (combine step of
    forces.cl:110-122 applied to the raw sums)."""
    interpret = _interpret_default() if interpret is None else interpret
    cand_sub, count_tiles = _pad_groups(cand_sub, count)
    kernel = functools.partial(
        _forces_kernel,
        h=float(params.h),
        spiky=float(terms.spiky),
        visc=float(terms.viscosity),
        poly6_grad=float(terms.poly_6_gradient),
        poly6_lap=float(terms.poly_6_laplacian),
        eps=smoothing.EPSILON,
        r2_mxu=r2_mxu,
    )
    sums = _nl_call(
        kernel, q_force, c_force_pack, cand_sub, count_tiles, 10, interpret,
        with_qrow=True,
    )
    return _combine_forces(sums, params, real_flat, density)


def _combine_forces(sums, params, real_flat, density):
    """Combine step of forces.cl:110-122 applied to the raw pass sums
    ((nb, 10, b): pressure/viscosity/colour-normal/laplacian)."""
    from .neighbor import (
        _OLAP, _ONX, _ONY, _ONZ, _OPX, _OPY, _OPZ, _OVX, _OVY, _OVZ,
    )

    flat = lambda k: sums[:, k].reshape(-1)
    press = jnp.stack([flat(_OPX), flat(_OPY), flat(_OPZ)], axis=1)
    visct = jnp.stack([flat(_OVX), flat(_OVY), flat(_OVZ)], axis=1)
    norm = jnp.stack([flat(_ONX), flat(_ONY), flat(_ONZ)], axis=1)
    lap = flat(_OLAP)

    # rho == 0 can only happen when a capacity truncation dropped a
    # particle's own subblock (the step flags it and the engine
    # re-runs); guard the division so the flagged state stays finite
    # instead of NaN-poisoning downstream reductions
    rho = jnp.where(density > 0, density, 1.0)
    total = -rho[:, None] * press + visct * params.dynamic_viscosity
    nlen = jnp.linalg.norm(norm, axis=-1, keepdims=True)
    apply_st = nlen > params.surface_tension_threshold
    st = -params.surface_tension * lap[:, None] * norm / jnp.where(apply_st, nlen, 1.0)
    total = total + jnp.where(apply_st, st, 0.0)
    accel = total / rho[:, None] + jnp.asarray(
        params.constant_acceleration, dtype=jnp.float32
    )
    return jnp.where(real_flat[:, None], accel, 0.0)


# ----------------------------------------------------------------------
# q32 force pass: (32, 128) pair panels against per-QUERY-SUBGROUP
# hit-compacted candidate lists.
#
# The true-hit pair volume at 1M is 1677 slots/particle at (q128, c32)
# granularity but 807 at (q32, c32) (experiments/volume_probe.py) —
# and the kernels are VPU-bound on pair-panel math, so halving the
# volume halves the dominant cost. The density kernel's subgroup hit
# flags (hit_groups=4) provide per-32-row candidate lists with NO
# extra refine work; this kernel consumes them with (32, 128) panels:
# the query side is a 32-sublane slice of the existing column pack
# (BlockSpec index i%4 picks the subgroup — queries were ALWAYS on
# sublanes, so the slice is free), candidates stay on 128 lanes
# (today's tile assembly unchanged). Per-slot VPU cost is identical —
# a (32, 128) op is exactly 4 of the 16 vregs of a (128, 128) op.
#
# Reduction layout: the per-tile dot packs [a_reg | b_mat | g_mat |
# l_mat] as its 4x32 = 128 lhs rows, so ONE dot yields every
# cancellation-prone sum, and the (7, 128) results accumulate in an
# f32 scratch; the per-group finalize does the Kelager combines once
# and lane-rolls the (1, 32) outputs to the subgroup's lane range of
# the SHARED (nb, 10, 128) out block — downstream combine code is
# untouched.
# ----------------------------------------------------------------------

Q32 = 32  # query subgroup rows
QG = LANES // Q32  # subgroups per 128-row query block


def _forces_pair_q32(col, row, qrow, acc, *, h, spiky, visc, poly6_grad,
                     poly6_lap, eps, r2_mxu=False):
    """One (32 query, 128 candidate) force pair tile, accumulating raw
    sums into the ``acc`` (8, 128) f32 scratch (rows 0..6 = the dot's
    (7, 128) result, row 7 lanes 0..31 = the singular-branch sum).
    Physics identical to _forces_core_rowout; same tile-centred
    cancellation control (c0 = the parent query block's first
    particle — block-scale centring, see _forces_core_rowout)."""
    from .neighbor import (
        _CGID, _CMR, _CPM, _CVX, _CVY, _CVZ, _CX, _CY, _CZ,
        _QGID, _QPM, _QVX, _QVY, _QVZ, _QX, _QY, _QZ,
        _r2_mxu, _reduce_dot,
    )

    h2 = h * h
    if r2_mxu:
        r2 = _r2_mxu(col, row)
    else:
        dx = col(_QX) - row(_CX)
        dy = col(_QY) - row(_CY)
        dz = col(_QZ) - row(_CZ)
        r2 = dx * dx + dy * dy + dz * dz
    incl_b = r2 < h2

    @pl.when(jnp.any(incl_b))
    def _():
        near0 = r2 < eps * eps
        # inv_r doubles as the spiky near-zero guard: selecting 0 at
        # near0 zeroes spiky_s (the r->0 splat rides the gated singular
        # branch below), and r = r2 * inv_r = 0 there — the reference's
        # r. Self-exclusion is free on the VPU path: a self pair's
        # lanes are bitwise-identical, so r2 == 0 exactly -> near0;
        # the MXU-r2 variant keeps the explicit gid test (its
        # reconstruction error can exceed eps^2 — see
        # _forces_core_rowout).
        inv_r = jnp.where(near0, 0.0, jax.lax.rsqrt(r2))
        r = r2 * inv_r
        hr = jnp.maximum(h - r, 0.0)
        t = jnp.maximum(h2 - r2, 0.0)
        b_mat = (visc * row(_CMR)) * hr
        u = row(_CMR) * t

        p_coeff = row(_CPM) + col(_QPM)
        if r2_mxu:
            p_coeff = p_coeff * (
                col(_QGID) != row(_CGID)
            ).astype(jnp.float32)
        spiky_s = spiky * (hr * hr) * inv_r
        a_reg = p_coeff * spiky_s
        g_mat = (poly6_grad * u) * t
        # 3h^2 - 7r^2 == 7t - 4h^2 inside the support; both forms
        # vanish with u outside it (see _forces_core_rowout)
        l_mat = (7.0 * poly6_lap / poly6_grad) * g_mat - (
            4.0 * h2 * poly6_lap
        ) * u

        c0 = [qrow[0, k, 0] for k in range(6)]
        ones = jnp.ones_like(row(_CX))
        rhs = jnp.concatenate(
            [row(_CX) - c0[0], row(_CY) - c0[1], row(_CZ) - c0[2],
             row(_CVX) - c0[3], row(_CVY) - c0[4], row(_CVZ) - c0[5],
             ones], axis=0)  # (7, 128)
        # lhs rows: [a_reg | b_mat | g_mat | l_mat] = 4*32 = 128 — one
        # dot covers every sum incl. the colour laplacian (its only
        # used result row is ones); lanes of res follow the lhs rows.
        lhs = jnp.concatenate([a_reg, b_mat, g_mat, l_mat], axis=0)
        res = _reduce_dot(rhs, lhs, (((1,), (1,)), ((), ())))  # (7, 128)
        acc[0:7, :] += res

        # coincident-pair singular branch (spiky r->0 splat,
        # smoothing.cl:21-29): a DISTINCT non-self pair at r < eps
        # essentially never exists outside degenerate initialisations,
        # and its contribution is identically zero otherwise — gate the
        # gid test, the narrow dot and the accumulate behind the cheap
        # any(near0) (true only in tiles holding the query's own
        # subblock) instead of paying them every pair tile.
        @pl.when(jnp.any(near0))
        def _():
            not_self = (col(_QGID) != row(_CGID)).astype(jnp.float32)
            sing = (p_coeff * not_self) * (
                spiky * near0.astype(jnp.float32)
            )
            sing_sum = _reduce_dot(
                ones, sing, (((1,), (1,)), ((), ())), lhs_exact=True,
                mode="split3",
            )  # (1, 32)
            acc[7:8, :] += jnp.concatenate(
                [sing_sum, jnp.zeros((1, LANES - Q32), jnp.float32)],
                axis=1,
            )


def _forces_finalize_q32(acc, qrow, out, g):
    """Per-subgroup combine (forces.cl:110-122 structure, identical to
    _forces_core_rowout's post-dot step) from the accumulated raw sums,
    then lane-roll the (1, 32) outputs into the subgroup's lane range
    [g*32, (g+1)*32) of the shared (1, 10, 128) out block. All rolls
    are full-128-lane (Mosaic's dynamic-rotate shape rule)."""
    from .neighbor import (
        _OLAP, _ONX, _ONY, _ONZ, _OPX, _OPY, _OPZ, _OVX, _OVY, _OVZ,
    )

    c0 = [qrow[0, k, 0] for k in range(6)]
    shift_q = (LANES - g * Q32) % LANES  # bring subgroup lanes to 0..31

    def qrow_g(k):
        return pltpu.roll(qrow[0, k : k + 1, :], shift_q, axis=1)

    def seg(r, o):
        # acc row r, lane segment [o, o+32) brought to lanes 0..31
        row = acc[r : r + 1, :]
        return pltpu.roll(row, LANES - o, axis=1) if o else row

    qx = qrow_g(0) - c0[0]
    qy = qrow_g(1) - c0[1]
    qz = qrow_g(2) - c0[2]
    qvx = qrow_g(3) - c0[3]
    qvy = qrow_g(4) - c0[4]
    qvz = qrow_g(5) - c0[5]
    # dot lane layout: [a_reg | b_mat | g_mat | l_mat] x 32
    sum_a, sum_b, sum_g, sum_l = (seg(6, o) for o in (0, 32, 64, 96))
    sum_sing = acc[7:8, :]
    vals = [None] * 10
    vals[_OPX] = qx * sum_a - seg(0, 0) + sum_sing
    vals[_OPY] = qy * sum_a - seg(1, 0) + sum_sing
    vals[_OPZ] = qz * sum_a - seg(2, 0) + sum_sing
    vals[_OVX] = seg(3, 32) - qvx * sum_b
    vals[_OVY] = seg(4, 32) - qvy * sum_b
    vals[_OVZ] = seg(5, 32) - qvz * sum_b
    vals[_ONX] = qx * sum_g - seg(0, 64)
    vals[_ONY] = qy * sum_g - seg(1, 64)
    vals[_ONZ] = qz * sum_g - seg(2, 64)
    vals[_OLAP] = sum_l

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    maskg = (lane >= g * Q32) & (lane < (g + 1) * Q32)
    shift_back = g * Q32
    for r, v in enumerate(vals):
        rolled = pltpu.roll(v, shift_back, axis=1)
        out[0, r : r + 1, :] += jnp.where(maskg, rolled, 0.0)


def _forces_kernel_q32(count_ref, q, qrow, c, out, acc, *, h, spiky, visc,
                       poly6_grad, poly6_lap, eps, r2_mxu):
    i = pl.program_id(0)
    m = pl.program_id(1)
    g = jax.lax.rem(i, QG)

    @pl.when((m == 0) & (g == 0))
    def _():
        out[...] = jnp.zeros_like(out)

    @pl.when(m == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    for s in range(TPS):

        @pl.when(m * TPS + s < count_ref[i])
        def _(s=s):
            tile = _tile_from_raw(c, s, 3)  # (12, 128); rows 9-11 pads
            _forces_pair_q32(
                lambda k: q[0, k],
                lambda k: tile[k : k + 1, :],
                qrow, acc,
                h=h, spiky=spiky, visc=visc,
                poly6_grad=poly6_grad, poly6_lap=poly6_lap, eps=eps,
                r2_mxu=r2_mxu,
            )

    @pl.when(m == pl.num_programs(1) - 1)
    def _():
        _forces_finalize_q32(acc, qrow, out, g)


def _nl32_call(kernel, q, cpack, cand_sub, count_tiles, out_rows, interpret,
               group=GROUP, with_gid_planes=False):
    """Driver for the q32 force kernel: grid (nb*QG, mg) where 4
    consecutive i's share one query block (and one out block — the
    finalize writes disjoint lane ranges). Chunked like _nl_call, with
    chunks kept QG-aligned so subgroups never straddle a chunk.
    ``group``: candidate subblocks per 128-lane tile (GROUP for the
    32-wide pack, GROUP16 for the 16-wide one). ``with_gid_planes``:
    also feed :func:`make_gid_planes` rows as a VMEM side input (the
    self_from_ids gid reconstruction)."""
    nb4 = cand_sub.shape[0]
    nb = q.shape[0]
    if nb4 != nb * QG:
        raise ValueError("cand rows must be nb*QG (per-subgroup lists)")
    f_q, b = q.shape[1], q.shape[2]
    fs = cpack.shape[1]
    mp = cand_sub.shape[1]
    mg = mp // (TPS * group)
    dead = cpack.shape[0] - 1
    q_row = q[..., 0]
    chunk = max(1, min(nb4, NL_CHUNK_BYTES // (mp * fs * 4)))
    chunk = max(QG, (chunk // QG) * QG)

    def run_chunk(args):
        cand_c, count_c, qc, qrow_c = args
        in_specs = [
            pl.BlockSpec(
                (1, f_q, Q32, 1),
                lambda i, m, *_: (i // QG, 0, i % QG, 0),
            ),
            pl.BlockSpec(
                (1, f_q, b), lambda i, m, *_: (i // QG, 0, 0)
            ),
            pl.BlockSpec(
                (TPS * group, fs), lambda i, m, *_: (i * mg + m, 0)
            ),
        ]
        extra = ()
        if with_gid_planes:
            in_specs.append(
                pl.BlockSpec((1, TPS, LANES), lambda i, m, *_: (i, m, 0))
            )
            extra = (make_gid_planes(cand_c, mg),)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cand_c.shape[0], mg),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, out_rows, b), lambda i, m, *_: (i // QG, 0, 0)
            ),
            scratch_shapes=[pltpu.VMEM((8, LANES), jnp.float32)],
        )
        raw = gather_raw(cpack, cand_c)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (cand_c.shape[0] // QG, out_rows, b), jnp.float32
            ),
            interpret=interpret,
        )(count_c, qc, qrow_c, raw, *extra)

    if chunk >= nb4:
        return run_chunk((cand_sub, count_tiles, q, q_row))
    nch = -(-nb4 // chunk)
    pad4 = nch * chunk - nb4
    padq = pad4 // QG

    def cc(a, fill, pad):
        if pad:
            tail = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
            a = jnp.concatenate([a, tail], axis=0)
        return a.reshape((nch, -1) + a.shape[1:])

    out = jax.lax.map(
        run_chunk,
        (
            cc(cand_sub, dead, pad4),
            cc(count_tiles, 0, pad4),
            cc(q, 0, padq),
            cc(q_row, 0, padq),
        ),
    )
    return out.reshape((-1,) + out.shape[2:])[:nb]


def fused_forces_nl32(
    q_force: jnp.ndarray,
    c_force_pack: jnp.ndarray,
    cand_hit32: jnp.ndarray,
    count_hit32: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    real_flat: jnp.ndarray,
    density: jnp.ndarray,
    *,
    interpret: bool | None = None,
    r2_mxu: bool = False,
) -> jnp.ndarray:
    """Flat (n, 3) acceleration from per-QUERY-SUBGROUP hit lists
    (``cand_hit32``/``count_hit32`` shaped (nb*QG, cap): subgroup g of
    query block i is row i*QG+g — the layout fused_density_nl's
    hit_groups=QG counters compact to). Physics identical to
    fused_forces_nl at ~half the pair volume (807 vs 1677
    slots/particle at 1M, experiments/volume_probe.py)."""
    interpret = _interpret_default() if interpret is None else interpret
    cand_hit32, count_tiles = _pad_groups(cand_hit32, count_hit32)
    kernel = functools.partial(
        _forces_kernel_q32,
        h=float(params.h),
        spiky=float(terms.spiky),
        visc=float(terms.viscosity),
        poly6_grad=float(terms.poly_6_gradient),
        poly6_lap=float(terms.poly_6_laplacian),
        eps=smoothing.EPSILON,
        r2_mxu=r2_mxu,
    )
    sums = _nl32_call(
        kernel, q_force, c_force_pack, cand_hit32, count_tiles, 10, interpret
    )
    return _combine_forces(sums, params, real_flat, density)


# ----------------------------------------------------------------------
# 16-wide candidate subblocks for the q32 force pass (force_sub16).
#
# Mosaic's DMA floor is 128 lanes, but nothing stops the CANDIDATE
# granularity from being finer than 32 once the irregular access lives
# in XLA's row gather: a 16-particle subblock is one flat (16*F)-lane
# pack row, 8 of them lane-pack into a 128-lane tile, and the in-kernel
# assembly is the same roll/select block transpose at 8x8 with 16-lane
# cells. Measured true-hit volume at 1M-like states: (q32, c16) = 552
# slots/particle vs 770 at (q32, c32) (experiments/volume_probe.py,
# p99 count 48 / max 55 per subgroup -> default capacity 64). The hit
# flags come from the same density pass at hit_sub=16 — the flag
# matmul's selector just uses 16-lane quarters.
# ----------------------------------------------------------------------


def make_c16_force_pack(position, velocity, density, pressure, real,
                        mass=1.0, gid_offset=0, gid=None, center=None,
                        with_gid=True):
    """Force-field pack at 16-particle subblock rows.

    ``with_gid=True`` (the sharded layout, where table-row gids are
    exchange-carried and NOT derivable from slot arithmetic):
    (nc16+1, 16*16) flat rows [px py pz vx vy vz pm mr gid + 7 zero
    pads] x 16 lanes each — 256 lanes = 2 whole vregs per row (the
    gather_raw layout rule). Field order identical to make_csub_packs'
    force pack.

    ``with_gid=False`` (single-chip production): 8 fields x 16 lanes =
    EXACTLY one 128-lane vreg per row, no pad lanes — HALF the gather
    + kernel DMA volume of the 9-field layout (2.05 -> 1.02 GB/substep
    at 1M, xprof r3). The kernel then reconstructs candidate gids from
    the hit-list slot ids (fused_forces_nl32_c16 self_from_ids=True);
    valid only when pack row r, lane l holds global particle r*16+l.
    """
    n = position.shape[0]
    nc = n // SUB16
    if gid is None and isinstance(gid_offset, int) and (
        n + gid_offset >= MAX_PARTICLES_F32_ID
    ):
        raise ValueError("particle ids exceed exact-f32 range")
    if center is not None:
        position = position - center
    safe_rho = jnp.where(density > 0, density, 1.0)
    pm = jnp.where(real, mass * pressure / (safe_rho * safe_rho), 0.0)
    mr = jnp.where(real, mass / safe_rho, 0.0)
    px, py, pz = position[:, 0], position[:, 1], position[:, 2]
    vx, vy, vz = velocity[:, 0], velocity[:, 1], velocity[:, 2]
    fields = [px, py, pz, vx, vy, vz, pm, mr]
    if with_gid:
        if gid is None:
            gidf = (
                jnp.arange(n, dtype=jnp.int32) + gid_offset
            ).astype(jnp.float32)
        else:
            gidf = gid.astype(jnp.float32)
        fields.append(gidf)
    nf = len(fields)
    pad_to = 16 if with_gid else 8
    a = _interleave(fields, nc, SUB16).reshape(nc, nf * SUB16)
    if pad_to != nf:
        a = jnp.pad(a, ((0, 0), (0, (pad_to - nf) * SUB16)))
    dead = jnp.zeros((1, pad_to * SUB16), jnp.float32)
    dead = dead.at[:, : 3 * SUB16].set(FAR)
    return jnp.concatenate([a, dead], axis=0)


def make_c16_pos_pack(position, real, center=None):
    """Position pack at 16-particle subblock rows for the c16 density
    pass: (nc16+1, 8*16) flat rows [px py pz realmask + 4 zero pads]
    x 16 lanes — one whole vreg per row. Field order matches
    make_csub_packs' pos pack (density core rows 0..3)."""
    n = position.shape[0]
    nc = n // SUB16
    if center is not None:
        position = position - center
    realf = real.astype(jnp.float32)
    px, py, pz = position[:, 0], position[:, 1], position[:, 2]
    a = _interleave([px, py, pz, realf], nc, SUB16).reshape(nc, 4 * SUB16)
    a = jnp.pad(a, ((0, 0), (0, 4 * SUB16)))  # 128 lanes
    dead = jnp.zeros((1, 8 * SUB16), jnp.float32)
    dead = dead.at[:, : 3 * SUB16].set(FAR)
    return jnp.concatenate([a, dead], axis=0)


def _tile_from_raw16(craw, t):
    """Assemble one (9, 128) candidate tile from 16-wide pack rows.

    ``craw``: (TPS*GROUP16, 256) block of c16 pack rows; tile t uses
    rows t*GROUP16..t*GROUP16+7. Each 128-lane half holds 8 fields x 16
    lanes; the assembly is an 8x8 block transpose with 16-lane cells
    per half (same roll/select rounds as :func:`_tile_from_raw`).
    Output rows 0..8 = [px py pz vx vy vz pm mr gid] (half0's 8 fields
    + half1's first field); pad fields are dropped."""
    ct = craw[t * GROUP16 : (t + 1) * GROUP16, :]  # (8, 256)
    halves = [
        _transpose16_half(ct[:, v * LANES : (v + 1) * LANES])
        for v in range(2)
    ]
    # rows: half0 = fields 0..7, half1 row 0 = field 8 (gid)
    return jnp.concatenate([halves[0], halves[1][0:1]], axis=0)


def _transpose16_half(cv):
    """8x8 block transpose with 16-lane cells on one (8, 128) vreg
    column: dest[f, s*16:(s+1)*16] = src[s, f*16:(f+1)*16]."""
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (GROUP16, LANES), 1) // SUB16
    row_i = jax.lax.broadcasted_iota(jnp.int32, (GROUP16, LANES), 0)
    out = jnp.zeros_like(cv)
    for d in range(GROUP16):
        r = pltpu.roll(cv, (GROUP16 - d) % GROUP16, axis=0)
        r = pltpu.roll(r, d * SUB16, axis=1)
        out = jnp.where((lane_q - row_i) % GROUP16 == d, r, out)
    return out


def make_gid_planes(cand_padded, mg, sub=SUB16, tps=TPS):
    """Per-tile candidate gid rows for the self_from_ids force path:
    (nb4, mp) padded hit-list ids -> (nb4, mg*tps, 128) f32 where
    plane [i, m*tps+s, l] = cand[i, (m*tps+s)*(128//sub) + l//sub] *
    sub + l % sub — the global particle id of lane l in tile s. A tiny
    VMEM side input (4 KB/grid step) replacing the gathered gid field:
    the id table CANNOT ride scalar prefetch (SMEM is 1 MB; the table
    is 8 MB at 1M). Sentinel ids (2^30) map to 2^33/2^34 (powers of
    two: f32-exact), never equal to a real gid (< 2^24 by the pack
    guard). ``sub``: candidate subblock width (16 for the c16 force
    pass, 8 for sub-8)."""
    nb4, mp = cand_padded.shape
    lanes = (
        cand_padded.astype(jnp.float32)[:, :, None] * float(sub)
        + jnp.arange(sub, dtype=jnp.float32)[None, None, :]
    )
    return lanes.reshape(nb4, mg * tps, LANES)


def _forces_kernel_q32x4_c16(count_ref, q, qrow, *rest, h, spiky, visc,
                             poly6_grad, poly6_lap, eps, r2_mxu,
                             self_from_ids=False):
    """All-4-subgroup variant of :func:`_forces_kernel_q32_c16`: grid
    (nb, mg) instead of (nb*QG, mg) — one step streams the QG candidate
    blocks (4 input specs) and accumulates into a per-subgroup scratch
    quadrant, quartering the grid-step count. Measured rationale: +1
    grid step per subgroup row cost ~22 ms/substep at 1M
    (r4_results.jsonl hit16cap128 probe) — per-step pipeline
    bookkeeping dominates the small steps."""
    if self_from_ids:
        cs = rest[:QG]
        gids = rest[QG : 2 * QG]
        out, acc = rest[2 * QG :]
    else:
        cs = rest[:QG]
        gids = (None,) * QG
        out, acc = rest[QG:]
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out[...] = jnp.zeros_like(out)
        acc[...] = jnp.zeros_like(acc)

    for g in range(QG):
        acc_g = acc.at[g * 8 : (g + 1) * 8, :]
        for s in range(TPS):

            @pl.when(m * TPS + s < count_ref[i * QG + g])
            def _(g=g, s=s, acc_g=acc_g):
                if self_from_ids:
                    tile = _transpose16_half(
                        cs[g][s * GROUP16 : (s + 1) * GROUP16, :]
                    )
                    gid_row = gids[g][0, s : s + 1, :]
                    row = lambda k: (
                        gid_row if k == 8 else tile[k : k + 1, :]
                    )
                else:
                    tile = _tile_from_raw16(cs[g], s)
                    row = lambda k: tile[k : k + 1, :]
                _forces_pair_q32(
                    # q is the (1, b, LANES) column pack (sublane s =
                    # particle, lane k = field): a 1-lane slice IS the
                    # (32, 1) query column. The old (1, f_q, b, 1)
                    # operand tile-padded its trailing 1 to 128 lanes —
                    # a 128x relayout copy (12 GB OOM at 4M, ~4.3 GB
                    # hidden temp at 1M; measured, see ROUND4_NOTES).
                    lambda k: q[0, g * Q32 : (g + 1) * Q32, k : k + 1],
                    row, qrow, acc_g,
                    h=h, spiky=spiky, visc=visc,
                    poly6_grad=poly6_grad, poly6_lap=poly6_lap, eps=eps,
                    r2_mxu=r2_mxu,
                )

    @pl.when(m == pl.num_programs(1) - 1)
    def _():
        for g in range(QG):
            _forces_finalize_q32(
                acc.at[g * 8 : (g + 1) * 8, :], qrow, out, g
            )


def _forces_kernel_q32_c16(count_ref, q, qrow, c, *rest, h, spiky, visc,
                           poly6_grad, poly6_lap, eps, r2_mxu,
                           self_from_ids=False):
    if self_from_ids:
        c_gid, out, acc = rest
    else:
        c_gid = None
        out, acc = rest
    i = pl.program_id(0)
    m = pl.program_id(1)
    g = jax.lax.rem(i, QG)

    @pl.when((m == 0) & (g == 0))
    def _():
        out[...] = jnp.zeros_like(out)

    @pl.when(m == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    for s in range(TPS):

        @pl.when(m * TPS + s < count_ref[i])
        def _(s=s):
            if self_from_ids:
                # 8-field pack: one vreg per row; gid row from the
                # precomputed plane instead of a gathered field
                tile = _transpose16_half(
                    c[s * GROUP16 : (s + 1) * GROUP16, :]
                )  # (8, 128)
                gid_row = c_gid[0, s : s + 1, :]
                row = lambda k: (
                    gid_row if k == 8 else tile[k : k + 1, :]
                )
            else:
                tile = _tile_from_raw16(c, s)  # (9, 128)
                row = lambda k: tile[k : k + 1, :]
            _forces_pair_q32(
                lambda k: q[0, k],
                row, qrow, acc,
                h=h, spiky=spiky, visc=visc,
                poly6_grad=poly6_grad, poly6_lap=poly6_lap, eps=eps,
                r2_mxu=r2_mxu,
            )

    @pl.when(m == pl.num_programs(1) - 1)
    def _():
        _forces_finalize_q32(acc, qrow, out, g)


def _nl32x4_call(kernel, q, cpack, cand_sub, count_tiles, out_rows,
                 interpret, group=GROUP16, with_gid_planes=False):
    """Driver for the all-4-subgroup q32 force kernel: grid (nb, mg)
    with QG candidate-stream input specs per step (see
    _forces_kernel_q32x4_c16). Chunked like _nl32_call."""
    nb4 = cand_sub.shape[0]
    nb = q.shape[0]
    if nb4 != nb * QG:
        raise ValueError("cand rows must be nb*QG (per-subgroup lists)")
    f_q, b = q.shape[1], q.shape[2]
    fs = cpack.shape[1]
    mp = cand_sub.shape[1]
    mg = mp // (TPS * group)
    dead = cpack.shape[0] - 1
    q_row = q[..., 0]
    # column pack (nb, b, LANES): sublane = particle-in-block, lane =
    # field index. Tile-aligned under T(8, 128) — the 4-D (nb, f_q, b,
    # 1) operand layout pads its trailing 1 to 128 lanes with a 128x
    # relayout copy (measured: 1 GB temp for an 8 MB operand; 12 GB
    # chunk copies OOMed the 4M substep). 16x lane padding is explicit
    # here (f_q=8 of 128 lanes used) but 8x smaller and copy-free.
    q_cols = jnp.pad(
        jnp.swapaxes(q_row, 1, 2), ((0, 0), (0, 0), (0, LANES - f_q))
    )
    chunk4 = max(1, min(nb4, NL_CHUNK_BYTES // (mp * fs * 4)))
    chunk = max(1, chunk4 // QG)

    def run_chunk(args):
        cand_c, count_c, qc, qrow_c = args
        nbc = qc.shape[0]
        in_specs = [
            pl.BlockSpec((1, b, LANES), lambda i, m, *_: (i, 0, 0)),
            pl.BlockSpec((1, f_q, b), lambda i, m, *_: (i, 0, 0)),
        ]
        for g in range(QG):
            in_specs.append(
                pl.BlockSpec(
                    (TPS * group, fs),
                    lambda i, m, *_, g=g: ((i * QG + g) * mg + m, 0),
                )
            )
        extra = ()
        if with_gid_planes:
            for g in range(QG):
                in_specs.append(
                    pl.BlockSpec(
                        (1, TPS, LANES),
                        lambda i, m, *_, g=g: (i * QG + g, m, 0),
                    )
                )
            gid_planes = make_gid_planes(cand_c, mg)
            extra = (gid_planes,) * QG
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbc, mg),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, out_rows, b), lambda i, m, *_: (i, 0, 0)
            ),
            scratch_shapes=[pltpu.VMEM((8 * QG, LANES), jnp.float32)],
        )
        raw = gather_raw(cpack, cand_c)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (nbc, out_rows, b), jnp.float32
            ),
            interpret=interpret,
        )(count_c, qc, qrow_c, *((raw,) * QG), *extra)

    if chunk >= nb:
        return run_chunk((cand_sub, count_tiles, q_cols, q_row))
    nch = -(-nb // chunk)
    padq = nch * chunk - nb
    pad4 = padq * QG

    def cc(a, fill, pad):
        if pad:
            tail = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
            a = jnp.concatenate([a, tail], axis=0)
        return a.reshape((nch, -1) + a.shape[1:])

    out = jax.lax.map(
        run_chunk,
        (
            cc(cand_sub, dead, pad4),
            cc(count_tiles, 0, pad4),
            cc(q_cols, 0, padq),
            cc(q_row, 0, padq),
        ),
    )
    return out.reshape((-1,) + out.shape[2:])[:nb]


# grid-step layout for the q32/c16 force pass: 'x4' (default — one
# step per query block, QG candidate streams; 4x fewer grid steps) |
# 'q32' (the r3 per-subgroup-row grid, kept for A/B)
_FORCE_GRID = os.environ.get("LIBCLSPH_TPU_FORCE_GRID", "x4")


def fused_forces_nl32_c16(
    q_force: jnp.ndarray,
    c16_force_pack: jnp.ndarray,
    cand_hit16: jnp.ndarray,
    count_hit16: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    real_flat: jnp.ndarray,
    density: jnp.ndarray,
    *,
    interpret: bool | None = None,
    r2_mxu: bool = False,
) -> jnp.ndarray:
    """fused_forces_nl32 over 16-wide candidate subblocks:
    ``cand_hit16``/``count_hit16`` (nb*QG, cap16) hold 16-granular ids
    (32-id * 2 + half, from the density pass's hit_sub=16 flags);
    ``c16_force_pack`` from :func:`make_c16_force_pack`. Physics
    identical at ~0.72x the (q32, c32) pair volume (552 vs 770
    slots/particle, experiments/volume_probe.py).

    The pack layout picks the self-exclusion mode: a 128-lane pack
    (with_gid=False) enables the in-kernel gid reconstruction
    (self_from_ids — half the candidate DMA); a 256-lane pack carries a
    gathered gid plane (the sharded/exchanged-table layout)."""
    interpret = _interpret_default() if interpret is None else interpret
    self_from_ids = c16_force_pack.shape[1] == 8 * SUB16
    cand_hit16, count_tiles = _pad_groups(
        cand_hit16, count_hit16, group=GROUP16
    )
    kw = dict(
        h=float(params.h),
        spiky=float(terms.spiky),
        visc=float(terms.viscosity),
        poly6_grad=float(terms.poly_6_gradient),
        poly6_lap=float(terms.poly_6_laplacian),
        eps=smoothing.EPSILON,
        r2_mxu=r2_mxu,
        self_from_ids=self_from_ids,
    )
    if _FORCE_GRID == "x4":
        sums = _nl32x4_call(
            functools.partial(_forces_kernel_q32x4_c16, **kw),
            q_force, c16_force_pack, cand_hit16, count_tiles, 10,
            interpret, group=GROUP16, with_gid_planes=self_from_ids,
        )
    else:
        sums = _nl32_call(
            functools.partial(_forces_kernel_q32_c16, **kw),
            q_force, c16_force_pack, cand_hit16, count_tiles, 10,
            interpret, group=GROUP16, with_gid_planes=self_from_ids,
        )
    return _combine_forces(sums, params, real_flat, density)


# ----------------------------------------------------------------------
# 8-wide candidate subblocks for the q32 force pass (force_sub8, r5).
#
# Sub-16 granularity halved the dead-lane share of the force stream
# (770 -> 552 true-hit lanes/particle at 1M, experiments/
# volume_probe.py); sub-8 cuts it again toward the ~30-40 physical
# neighbours. Mosaic's 128-lane DMA floor constrains the STREAM, not
# the register granularity: the pack stores one 8-particle subblock
# per 64-lane row (8 fields x 8 lanes), XLA's row gather fetches hit
# rows and PAIRS consecutive hits into 128-lane stream rows (a
# reshape; bandwidth-checked by experiments/gather8_probe.py), and the
# kernel assembles (8, 128) field tiles of 16 subblocks with a
# 15-round roll/select transpose. The hit-slot order is pre-permuted
# so tile t's stream row r carries hits (t*16 + r, t*16 + 8 + r): with
# that pairing the in-kernel (row, lane) mapping is a single diagonal
# family dd = C%8 - f (see _transpose8_pair) — the naive consecutive
# pairing needs a per-(row, cell) shift that roll/select can't
# express in one family.
#
# Stream economics per query subgroup: capacity x 256 B/slot (vs
# 512 B/slot at 16-wide); tiles-per-step adapts to the capacity
# (tps = tiles when <= 8) so the window is not padded up to 8
# grid-step tiles — streamed bytes scale with PADDED capacity
# (the r4 hit16cap128 probe: +22 ms/substep of pure dead-capacity
# streaming at identical live compute).
# ----------------------------------------------------------------------

SUB8 = 8
GROUP8 = LANES // SUB8  # 8-wide subblocks per 128-lane tile

# gather strategy for the 64-lane pack rows: 'pairadd' (two takes on
# 128-lane zero-padded lo/hi packs + add) | 'half64' (one take on the
# (nc8+1, 64) pack + pair-reshape). XLA lane-pads the 64-lane take and
# relayouts the pair reshape (experiments/gather8_probe.py: 33 vs 38
# GB/s useful), so pairadd is the default — measured 163.4 vs 169.3
# ms/substep at 1M (r5_results.jsonl sub8c80 rows).
_GATHER8 = os.environ.get("LIBCLSPH_TPU_GATHER8", "pairadd")


def make_c8_force_pack(position, velocity, density, pressure, real,
                       mass=1.0, center=None):
    """Force-field pack at 8-particle subblock rows: (nc8+1, 8*8=64)
    flat rows [px py pz vx vy vz pm mr] x 8 lanes each — half a
    128-lane vreg per row; gather_raw8 pairs two hit rows per stream
    row. Field order matches make_c16_force_pack(with_gid=False).
    Self-exclusion is always by reconstructed gids (gid planes):
    valid only when pack row r, lane l holds global particle r*8+l."""
    n = position.shape[0]
    nc = n // SUB8
    if center is not None:
        position = position - center
    safe_rho = jnp.where(density > 0, density, 1.0)
    pm = jnp.where(real, mass * pressure / (safe_rho * safe_rho), 0.0)
    mr = jnp.where(real, mass / safe_rho, 0.0)
    px, py, pz = position[:, 0], position[:, 1], position[:, 2]
    vx, vy, vz = velocity[:, 0], velocity[:, 1], velocity[:, 2]
    fields = [px, py, pz, vx, vy, vz, pm, mr]
    a = _interleave(fields, nc, SUB8).reshape(nc, 8 * SUB8)
    dead = jnp.zeros((1, 8 * SUB8), jnp.float32)
    dead = dead.at[:, : 3 * SUB8].set(FAR)
    return jnp.concatenate([a, dead], axis=0)


def gather_raw8(cpack, cand_sub):
    """Gather 64-lane pack rows and pair them into 128-lane stream
    rows: (nc8+1, 64) pack + (nb, M) PAIR-PERMUTED ids (M even) ->
    (nb*M/2, 128) where lanes 0..63 = permuted slot 2k and 64..127 =
    slot 2k+1."""
    dead = cpack.shape[0] - 1
    idx = jnp.minimum(cand_sub, dead)
    w = cpack.shape[1]
    if _GATHER8 == "pairadd":
        lo = jnp.pad(cpack, ((0, 0), (0, w)))
        hi = jnp.pad(cpack, ((0, 0), (w, 0)))
        flat = idx.reshape(-1, 2)
        return (
            jnp.take(lo, flat[:, 0], axis=0)
            + jnp.take(hi, flat[:, 1], axis=0)
        )
    g = jnp.take(cpack, idx.reshape(-1), axis=0)
    return g.reshape(-1, 2 * w)


def _pair_perm8(cand_p):
    """Reorder each 16-slot tile group [0..15] -> [0,8,1,9,...,7,15]
    so consecutive PAIRS (stream rows) hold slots (r, r+8): stream row
    r of tile t then carries dest cells r and r+8, making the
    in-kernel transpose a pure diagonal family (_transpose8_pair).
    Accumulation order over hit slots is physics-neutral (f32 sums in
    slot order change, covered by the summation-order tolerance)."""
    nb, mp = cand_p.shape
    g = cand_p.reshape(nb, mp // GROUP8, 2, SUB8)
    return g.swapaxes(-1, -2).reshape(nb, mp)


def _transpose8_pair(cv):
    """(8, 128) paired raw rows -> (8, 128) field rows.

    src[r, h*64 + f*8 + p] holds field f, particle p of dest cell
    C = r + 8h (h in {0, 1} the pair half, from the _pair_perm8
    order); dest[f, C*8 + p] = src[C % 8, (C // 8)*64 + f*8 + p].
    15 diagonal rounds dd = C%8 - f in [-7, 7]: sublane roll by
    (-dd) mod 8, lane roll by (8*dd) mod 128."""
    cell = jax.lax.broadcasted_iota(jnp.int32, (SUB8, LANES), 1) // SUB8
    row = jax.lax.broadcasted_iota(jnp.int32, (SUB8, LANES), 0)
    key = cell % 8 - row
    out = jnp.zeros_like(cv)
    for dd in range(-7, 8):
        r = pltpu.roll(cv, (-dd) % 8, axis=0)
        r = pltpu.roll(r, (dd % 16) * SUB8, axis=1)
        out = jnp.where(key == dd, r, out)
    return out


def _forces_kernel_q32x4_c8(count_ref, q, qrow, *rest, h, spiky, visc,
                            poly6_grad, poly6_lap, eps, r2_mxu, tps):
    """All-4-subgroup force kernel over 8-wide candidate subblocks
    (the sub-8 analog of :func:`_forces_kernel_q32x4_c16`): grid
    (nb, mg), ``tps`` tiles of 16 subblocks per step, stream rows
    pre-paired by _pair_perm8 + gather_raw8, gids always from planes
    (no gathered gid field — half the candidate DMA)."""
    cs = rest[:QG]
    gids = rest[QG : 2 * QG]
    out, acc = rest[2 * QG :]
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out[...] = jnp.zeros_like(out)
        acc[...] = jnp.zeros_like(acc)

    for g in range(QG):
        acc_g = acc.at[g * 8 : (g + 1) * 8, :]
        for s in range(tps):

            @pl.when(m * tps + s < count_ref[i * QG + g])
            def _(g=g, s=s, acc_g=acc_g):
                tile = _transpose8_pair(cs[g][s * 8 : (s + 1) * 8, :])
                gid_row = gids[g][0, s : s + 1, :]
                row = lambda k: gid_row if k == 8 else tile[k : k + 1, :]
                _forces_pair_q32(
                    lambda k: q[0, g * Q32 : (g + 1) * Q32, k : k + 1],
                    row, qrow, acc_g,
                    h=h, spiky=spiky, visc=visc,
                    poly6_grad=poly6_grad, poly6_lap=poly6_lap, eps=eps,
                    r2_mxu=r2_mxu,
                )

    @pl.when(m == pl.num_programs(1) - 1)
    def _():
        for g in range(QG):
            _forces_finalize_q32(
                acc.at[g * 8 : (g + 1) * 8, :], qrow, out, g
            )


def _nl32x4_call8(kernel, q, cpack, cand_sub, count_tiles, out_rows,
                  interpret, tps):
    """Driver for the sub-8 all-4-subgroup force kernel: grid (nb, mg)
    with QG paired-row candidate streams + QG gid planes per step.
    Chunked like _nl32x4_call."""
    nb4 = cand_sub.shape[0]
    nb = q.shape[0]
    if nb4 != nb * QG:
        raise ValueError("cand rows must be nb*QG (per-subgroup lists)")
    f_q, b = q.shape[1], q.shape[2]
    mp = cand_sub.shape[1]
    mg = mp // (tps * GROUP8)
    dead = cpack.shape[0] - 1
    q_row = q[..., 0]
    q_cols = jnp.pad(
        jnp.swapaxes(q_row, 1, 2), ((0, 0), (0, 0), (0, LANES - f_q))
    )
    rows_step = tps * SUB8  # paired 128-lane stream rows per grid step
    chunk4 = max(1, min(nb4, NL_CHUNK_BYTES // (mp * SUB8 * 8 * 4)))
    chunk = max(1, chunk4 // QG)

    def run_chunk(args):
        cand_c, count_c, qc, qrow_c = args
        nbc = qc.shape[0]
        in_specs = [
            pl.BlockSpec((1, b, LANES), lambda i, m, *_: (i, 0, 0)),
            pl.BlockSpec((1, f_q, b), lambda i, m, *_: (i, 0, 0)),
        ]
        for g in range(QG):
            in_specs.append(
                pl.BlockSpec(
                    (rows_step, LANES),
                    lambda i, m, *_, g=g: ((i * QG + g) * mg + m, 0),
                )
            )
        for g in range(QG):
            in_specs.append(
                pl.BlockSpec(
                    (1, tps, LANES),
                    lambda i, m, *_, g=g: (i * QG + g, m, 0),
                )
            )
        gid_planes = make_gid_planes(cand_c, mg, sub=SUB8, tps=tps)
        raw = gather_raw8(cpack, _pair_perm8(cand_c))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbc, mg),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, out_rows, b), lambda i, m, *_: (i, 0, 0)
            ),
            scratch_shapes=[pltpu.VMEM((8 * QG, LANES), jnp.float32)],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (nbc, out_rows, b), jnp.float32
            ),
            interpret=interpret,
        )(count_c, qc, qrow_c, *((raw,) * QG), *((gid_planes,) * QG))

    if chunk >= nb:
        return run_chunk((cand_sub, count_tiles, q_cols, q_row))
    nch = -(-nb // chunk)
    padq = nch * chunk - nb
    pad4 = padq * QG

    def cc(a, fill, pad):
        if pad:
            tail = jnp.full((pad,) + a.shape[1:], fill, a.dtype)
            a = jnp.concatenate([a, tail], axis=0)
        return a.reshape((nch, -1) + a.shape[1:])

    out = jax.lax.map(
        run_chunk,
        (
            cc(cand_sub, dead, pad4),
            cc(count_tiles, 0, pad4),
            cc(q_cols, 0, padq),
            cc(q_row, 0, padq),
        ),
    )
    return out.reshape((-1,) + out.shape[2:])[:nb]


def fused_forces_nl32_c8(
    q_force: jnp.ndarray,
    c8_force_pack: jnp.ndarray,
    cand_hit8: jnp.ndarray,
    count_hit8: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    real_flat: jnp.ndarray,
    density: jnp.ndarray,
    *,
    interpret: bool | None = None,
    r2_mxu: bool = False,
) -> jnp.ndarray:
    """fused_forces_nl32_c16 at 8-wide candidate subblocks:
    ``cand_hit8``/``count_hit8`` (nb*QG, cap8) hold 8-granular ids
    (16-id * 2 + half, from the density pass's hit_sub=8 flags);
    ``c8_force_pack`` from :func:`make_c8_force_pack`. Physics
    identical (every force term carries the hard r<h cutoff) at a
    finer streamed granularity. Single-chip only: self-exclusion is
    by slot-arithmetic gid reconstruction, which requires pack row r,
    lane l = global particle r*8+l (the sharded/exchanged-table
    layout carries gathered gids instead — use sub16 there)."""
    interpret = _interpret_default() if interpret is None else interpret
    if c8_force_pack.shape[1] != 8 * SUB8:
        raise ValueError("c8 pack rows must be 8 fields x 8 lanes")
    cap = cand_hit8.shape[1]
    # ONE grid step per query block (mg == 1, tps = whole window):
    # Mosaic requires a block's trailing dims to be divisible by
    # (8, 128) OR equal to the array dims — the (1, tps, 128) gid
    # plane block is only legal when tps == the plane's full second
    # dim. mg == 1 also matches the measured grid-step economics (the
    # r4 x4/fold restructures: per-step bookkeeping dominates small
    # steps). Window VMEM stays modest (cap 320 -> 80 KB/stream).
    tps = -(-cap // GROUP8)
    cand_p, count_tiles = _pad_groups(
        cand_hit8, count_hit8, group=GROUP8, tps=tps
    )
    kw = dict(
        h=float(params.h),
        spiky=float(terms.spiky),
        visc=float(terms.viscosity),
        poly6_grad=float(terms.poly_6_gradient),
        poly6_lap=float(terms.poly_6_laplacian),
        eps=smoothing.EPSILON,
        r2_mxu=r2_mxu,
        tps=tps,
    )
    sums = _nl32x4_call8(
        functools.partial(_forces_kernel_q32x4_c8, **kw),
        q_force, c8_force_pack, cand_p, count_tiles, 10, interpret, tps,
    )
    return _combine_forces(sums, params, real_flat, density)


#
# The XLA pre-gather above costs ~125 ms/substep at 1M (jnp.take runs
# at ~36 GB/s effective and the lane-packing transpose adds as much
# again). This variant keeps the irregular access INSIDE the kernel,
# where it is nearly free: candidate data stays at parent 128-block
# granularity (nbc+1, F, 128) — a layout Mosaic CAN DMA data-dependently
# (BlockSpec index maps driven by the scalar-prefetched subblock table,
# exactly like neighbor.py) — and each compute tile is assembled from
# four parent blocks with dynamic lane rolls (pltpu.roll) + masked
# selects (~16 vreg ops per ~1000-cycle pair tile).
#
# Each grid step processes ATPS tiles (GROUP*ATPS parent-block input
# specs): with one tile per step the per-step pipeline bookkeeping
# dominates (~0.2 us x 8x more steps than the nl kernels — measured
# +146 ms/substep at 1M); at ATPS=8 the step count matches nl's TPS=8
# and the bookkeeping amortises identically.
# ----------------------------------------------------------------------

# asm tiles per grid step; env-overridable for tuning sweeps
ATPS = int(os.environ.get("LIBCLSPH_TPU_ATPS", "8"))


def make_cparent_packs(position, velocity, density, pressure, real,
                       block_size=128, mass=1.0, gid_offset=0, gid=None,
                       center=None):
    """Parent-block candidate packs (nbc+1, F, B) row-oriented (the
    neighbor.py candidate layout), with ONE trailing dead block
    (positions FAR, everything else 0) that clamped sentinel slots
    resolve to:

    c_pos   (nbc+1, 4, B) — px py pz realmask
    c_force (nbc+1, 9, B) — px py pz vx vy vz pm mr gid
    """
    n = position.shape[0]
    nbc = n // block_size
    if gid is None and isinstance(gid_offset, int) and (
        n + gid_offset >= MAX_PARTICLES_F32_ID
    ):
        raise ValueError("particle ids exceed exact-f32 range")
    if center is not None:
        position = position - center
    realf = real.astype(jnp.float32)
    safe_rho = jnp.where(density > 0, density, 1.0)
    pm = jnp.where(real, mass * pressure / (safe_rho * safe_rho), 0.0)
    mr = jnp.where(real, mass / safe_rho, 0.0)
    if gid is None:
        gidf = (jnp.arange(n, dtype=jnp.int32) + gid_offset).astype(jnp.float32)
    else:
        gidf = gid.astype(jnp.float32)
    px, py, pz = position[:, 0], position[:, 1], position[:, 2]
    vx, vy, vz = velocity[:, 0], velocity[:, 1], velocity[:, 2]

    def pack(fields):
        f = len(fields)
        a = _interleave(fields, nbc, block_size)  # (nbc, F, B)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, f, block_size), 1)
        dead = jnp.where(lane < 3, FAR, 0.0)  # position rows first
        return jnp.concatenate([a, dead], axis=0)

    c_pos = pack([px, py, pz, realf])
    c_force = pack([px, py, pz, vx, vy, vz, pm, mr, gidf])
    return c_pos, c_force


def _pad_group(cand_sub):
    """Pad the refined table to whole (GROUP*ATPS)-subblock grid steps."""
    from ...ops.tiles import REFINE_SENTINEL

    nb, m = cand_sub.shape
    step = GROUP * ATPS
    mp = -(-m // step) * step
    if mp != m:
        pad = jnp.full((nb, mp - m), REFINE_SENTINEL, cand_sub.dtype)
        cand_sub = jnp.concatenate([cand_sub, pad], axis=1)
    return cand_sub


def _c_parent_spec(f, b, s, nbc_dead):
    """Candidate input spec for assembly slot ``s`` of a grid step
    (s < GROUP*ATPS): DMA the PARENT block of the (m*GROUP*ATPS+s)-th
    refined subblock; sentinel slots clamp to the trailing dead block."""
    return pl.BlockSpec(
        (1, f, b),
        lambda i, m, cand_, count_: (
            jnp.minimum(cand_[i, m * (GROUP * ATPS) + s] // GROUP, nbc_dead),
            0, 0,
        ),
    )


def _assemble_tile(cand_ref, count_ref, i, base, cs, f, n_pos):
    """Build the (F, LANES) candidate tile for subblock slots
    [base, base+GROUP): lane quarter s comes from parent ref cs[s],
    rotated so its subblock's lanes land in [s*SUB, (s+1)*SUB); dead
    slots keep the FAR/0 background. (i/base are passed in:
    pl.program_id cannot be bound inside a pl.when body.)"""
    lane = jax.lax.broadcasted_iota(jnp.int32, (f, LANES), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (f, LANES), 0)
    tile = jnp.where(rowi < n_pos, FAR, 0.0)
    for s in range(GROUP):
        slot = base + s
        sid = cand_ref[i, slot]
        quarter = jax.lax.rem(sid, GROUP)
        shift = jax.lax.rem(jnp.int32(s) - quarter + GROUP, GROUP) * SUB
        rolled = pltpu.roll(cs[s][0], shift, axis=1)
        mask = (lane >= s * SUB) & (lane < (s + 1) * SUB) & (slot < count_ref[i])
        tile = jnp.where(mask, rolled, tile)
    return tile


def _density_kernel_asm(cand_ref, count_ref, q, *cs_and_out, h, poly6,
                        r2_mxu, hit_rows=0):
    cs, out = cs_and_out[:-1], cs_and_out[-1]
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out[...] = jnp.zeros_like(out)

    for t in range(ATPS):
        base = (m * ATPS + t) * GROUP

        @pl.when(base < count_ref[i])
        def _(t=t, base=base):
            tile = _assemble_tile(
                cand_ref, count_ref, i, base,
                cs[t * GROUP : (t + 1) * GROUP], 4, 3,
            )
            _density_core_rowout(
                lambda k: q[0, k], lambda k: tile[k : k + 1, :], out,
                h=h, poly6=poly6, r2_mxu=r2_mxu,
                hit_slot=base if hit_rows else None,
                hit_rows=hit_rows, sub=SUB,
            )


def _forces_kernel_asm(cand_ref, count_ref, q, qrow, *cs_and_out, h, spiky,
                       visc, poly6_grad, poly6_lap, eps, r2_mxu):
    cs, out = cs_and_out[:-1], cs_and_out[-1]
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out[...] = jnp.zeros_like(out)

    for t in range(ATPS):
        base = (m * ATPS + t) * GROUP

        @pl.when(base < count_ref[i])
        def _(t=t, base=base):
            tile = _assemble_tile(
                cand_ref, count_ref, i, base,
                cs[t * GROUP : (t + 1) * GROUP], 9, 3,
            )
            _forces_core_rowout(
                lambda k: q[0, k], lambda k: tile[k : k + 1, :], qrow, out,
                h=h, spiky=spiky, visc=visc,
                poly6_grad=poly6_grad, poly6_lap=poly6_lap, eps=eps,
                r2_mxu=r2_mxu,
            )


def _asm_call(kernel, q, cpack, cand_sub, count, out_rows, interpret,
              with_qrow=False):
    """Shared driver: chunked (SMEM-bounded) two-axis grid over
    (query block, candidate tile) with 4 parent-block inputs.
    ``out_rows``: sublane rows of the lane-major (1, out_rows, b)
    accumulator; ``with_qrow`` adds the row-layout query copy the
    force core's combines need."""
    from .neighbor import _query_chunk

    nbq = q.shape[0]
    f_q, b = q.shape[1], q.shape[2]
    nbc_dead = cpack.shape[0] - 1
    f_c, bc = cpack.shape[1], cpack.shape[2]
    cand_sub = _pad_group(cand_sub)
    mp = cand_sub.shape[1]
    mg = mp // (GROUP * ATPS)
    chunk = max(1, min(nbq, _query_chunk(nbq, mp)))
    q_row = q[..., 0]  # (nbq, f_q, b)

    def run_chunk(args):
        cand_c, count_c, qc, qrow_c = args
        in_specs = [
            pl.BlockSpec((1, f_q, b, 1), lambda i, m, c_, n_: (i, 0, 0, 0)),
        ]
        extra = ()
        if with_qrow:
            in_specs.append(
                pl.BlockSpec((1, f_q, b), lambda i, m, c_, n_: (i, 0, 0))
            )
            extra = (qrow_c,)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(chunk, mg),
            in_specs=in_specs
            + [_c_parent_spec(f_c, bc, s, nbc_dead) for s in range(GROUP * ATPS)],
            out_specs=pl.BlockSpec(
                (1, out_rows, b), lambda i, m, c_, n_: (i, 0, 0)
            ),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((chunk, out_rows, b), jnp.float32),
            interpret=interpret,
        )(cand_c, count_c, qc, *extra, *([cpack] * (GROUP * ATPS)))

    if chunk == nbq:
        return run_chunk((cand_sub, count, q, q_row))
    nch = -(-nbq // chunk)
    pad = nch * chunk - nbq

    def cc(a):
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
            )
        return a.reshape((nch, chunk) + a.shape[1:])

    out = jax.lax.map(run_chunk, (cc(cand_sub), cc(count), cc(q), cc(q_row)))
    return out.reshape((-1,) + out.shape[2:])[:nbq]


def fused_density_asm(q_pos, c_pos_parent, cand_sub, count, params, terms,
                      real_flat, *, interpret=None, r2_mxu=False,
                      want_hits=False):
    """Flat (n,) density via in-kernel assembly (see module section).
    ``want_hits`` as in :func:`fused_density_nl` (hit counters aligned
    with the GROUP*ATPS-padded candidate table)."""
    interpret = _interpret_default() if interpret is None else interpret
    hit_rows = 0
    if want_hits:
        bq = q_pos.shape[2]
        mp = -(-cand_sub.shape[1] // (GROUP * ATPS)) * (GROUP * ATPS)
        hit_rows = -(-mp // bq)
        if hit_rows > 7:
            raise ValueError(
                f"refined capacity {mp} exceeds the 7x{bq} hit-flag "
                "rows of the density accumulator"
            )
    kernel = functools.partial(
        _density_kernel_asm, h=float(params.h), poly6=float(terms.poly_6),
        r2_mxu=r2_mxu, hit_rows=hit_rows,
    )
    wsum = _asm_call(kernel, q_pos, c_pos_parent, cand_sub, count, 8, interpret)
    density = params.particle_mass * wsum[:, 0, :].reshape(-1)
    density = jnp.where(real_flat, density, params.fluid_density)
    if not want_hits:
        return density
    nb = wsum.shape[0]
    hits = wsum[:, 1 : 1 + hit_rows, :].reshape(nb, hit_rows * bq)
    return density, hits[:, :mp]


def fused_forces_asm(q_force, c_force_parent, cand_sub, count, params, terms,
                     real_flat, density, *, interpret=None, r2_mxu=False):
    """Flat (n, 3) acceleration via in-kernel assembly."""
    interpret = _interpret_default() if interpret is None else interpret
    kernel = functools.partial(
        _forces_kernel_asm,
        h=float(params.h),
        spiky=float(terms.spiky),
        visc=float(terms.viscosity),
        poly6_grad=float(terms.poly_6_gradient),
        poly6_lap=float(terms.poly_6_laplacian),
        eps=smoothing.EPSILON,
        r2_mxu=r2_mxu,
    )
    sums = _asm_call(kernel, q_force, c_force_parent, cand_sub, count, 10,
                     interpret, with_qrow=True)
    return _combine_forces(sums, params, real_flat, density)
