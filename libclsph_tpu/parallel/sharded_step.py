"""Multi-chip SPH substep via ``shard_map`` over a device mesh.

New capability over the strictly single-device reference (SURVEY.md
§2.3): spatial (Morton-range) data decomposition across chips.

Per-shard algorithm (axis "dp"):

1.  Global bounds via ``lax.pmin``/``lax.pmax`` (the distributed
    findMinMaxPosition, sph_simulation.cpp:634-728 — two blocking host
    reads there, two ICI collectives here).
2.  Local Morton sort of the shard's particles. Shards are seeded with
    a host-side global Morton partition (parallel/mesh.py), so each
    shard stays spatially compact and its tiles coherent.
3.  Neighbour search, two exchange strategies (see _local_substep):
    ``all_gather`` gathers every shard's block tables (simple, traffic
    ~N per step); ``halo`` publishes only each shard's *surface*
    blocks, so traffic scales with the boundary area instead of the
    volume. Both are validated equivalent to the single-chip step.
4.  Adaptive-dt (sph_simulation.cpp:246-262) with ``lax.pmax`` over
    shard-local maxima inside the on-device retry loop, so all chips
    agree on dt with zero host synchronisation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
# NOTE: the new jax.shard_map enforces varying-manual-axes typing that
# would require pvary annotations throughout the tile machinery; the
# experimental entry point with check_rep=False keeps the classic
# semantics.
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import morton
from ..core.params import SimulationParameters
from ..core.state import ParticleState
from ..engine.step import (
    FLAG_CAND_STALE,
    FLAG_CAPACITY,
    FLAG_CAPACITY_HIT,
    FLAG_CAPACITY_SUB,
    FLAG_CAPACITY_T2,
    FLAG_EXCHANGE,
    FLAG_GRID_DIM,
    StepConfig,
    nl_two_tier_passes,
    _advect_collide,
)
from ..ops import collisions as collisions_ops
from ..ops import grid as grid_ops
from ..ops import integrate as integrate_ops
from ..ops import interactions as interactions_ops
from ..ops import tiles as tiles_ops
from .mesh import AXIS


def _compact_mask(mask: jnp.ndarray, cap: int):
    """Indices of True entries, padded to ``cap`` slots.

    Returns (idx (cap,) int32, valid (cap,) bool, overflow () bool).
    """
    nb = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    total = pos[-1] + 1
    ok = mask & (pos < cap)
    slot = jnp.where(ok, pos, cap)
    idx = jnp.zeros((cap + 1,), jnp.int32).at[slot].set(
        jnp.arange(nb, dtype=jnp.int32), mode="drop"
    )[:cap]
    valid = jnp.arange(cap, dtype=jnp.int32) < total
    return idx, valid, total > cap


def _nl_passes(
    state_s: ParticleState,
    blocked: tiles_ops.BlockedFields,
    bmin: jnp.ndarray,
    bmax: jnp.ndarray,
    cand: jnp.ndarray,
    count: jnp.ndarray,
    pos_fields: tiles_ops.BlockedFields,
    force_fields,
    valid_s: jnp.ndarray,
    gid_offset: jnp.ndarray,
    params: SimulationParameters,
    terms,
    config: StepConfig,
    center=None,
    self_index=None,
    cand_in=None,
    h_search=None,
):
    """Run the production nl Pallas kernels (ops/pallas/neighbor_nl.py)
    against an exchanged candidate block table — the sharded analog of
    engine.step._density_forces_pallas_nl. ``pos_fields`` /
    ``force_fields(blocked)`` provide the candidate-side tables
    (all-gathered or local+halo). Returns (density, pressure, accel,
    nl_flags int32, cand_tables) where ``cand_tables`` is the
    (cand_sub, count_sub) refined-list pair for Verlet reuse (None on
    the tier-2 path). ``center``: shared coordinate centre for the
    MXU-r2 path (config.pair_r2), identical on every shard (from the
    global pmin/pmax bounds).

    ``cand_in``: carried (cand_sub, count_sub) from a build substep —
    skips the refine entirely (StepConfig.cand_interval; the ids index
    the COMBINED candidate table, whose layout is stable across reuse
    substeps because sorts and surface sets are pinned to build
    substeps). ``h_search``: refine threshold override (the build
    substep's (1 + cand_slack) * h dilation)."""
    from ..ops.pallas import neighbor_nl as nl

    r2_mxu = config.pair_r2 == "mxu"
    if not r2_mxu:
        center = None

    cfg = config.tile_config()
    q_rows = min(config.nl_query_rows, cfg.block_size)
    q_rep = cfg.block_size // q_rows
    # two-tier overflow routing (engine/step.py StepConfig.tier2_frac):
    # refine at the tier-2 width, route heavy rows per shard — all
    # shard-local ops, no extra collectives
    use_t2 = config.tier2_frac > 0 and q_rep == 1
    dsub16 = config.density_sub16
    if dsub16 and (
        q_rep > 1
        or q_rows != 128
        or config.force_query_rows != 32
        or not config.force_sub16
        or not config.hit_compact
    ):
        raise ValueError(
            "density_sub16 requires whole-block query rows with "
            "force_query_rows=32 + force_sub16 + hit_compact "
            "(engine/step.py rationale; tier2 composes since r4 — "
            "both tiers run the 16-granular kernels)"
        )
    sub = cfg.block_size // (nl.SUB16 if dsub16 else nl.SUB)
    cap_sub = config.max_candidates_sub * (
        config.tier2_mult if use_t2 else 1
    )
    h_refine = params.h if h_search is None else h_search
    if q_rep > 1:
        cand_q = jnp.repeat(cand, q_rep, axis=0)
        count_q = jnp.repeat(count, q_rep, axis=0)
    else:
        cand_q, count_q = cand, count
    # truncation-safe self range: the query's own block index in the
    # exchanged candidate table (tiles._self_priority_sort)
    self_lo = None
    if self_index is not None:
        self_lo = jnp.repeat(self_index, q_rep) * sub
    if cand_in is not None:
        if use_t2 or q_rep > 1:
            raise ValueError(
                "sharded candidate reuse requires the plain nl shape "
                "(whole-block query rows, no tier2)"
            )
        cand_sub, count_sub = cand_in
        ovf = jnp.zeros((), jnp.bool_)
    elif config.refine_mode == "exact":
        # same refinement as engine.step._density_forces_pallas_nl:
        # candidate-table PARTICLES vs gap-split dilated query boxes
        if q_rep > 1:
            nq = blocked.position.shape[0] * q_rep
            qlo, qhi = tiles_ops.split_block_bounds(
                blocked.position.reshape(nq, q_rows, 3),
                blocked.real.reshape(nq, q_rows),
            )
        else:
            qlo, qhi = bmin, bmax
        cand_sub, count_sub, ovf = tiles_ops.refine_candidates_exact(
            cand_q, count_q, qlo, qhi, pos_fields.position, h_refine, sub,
            cap_sub, self_lo=self_lo, self_width=sub,
        )
    else:
        sub_lo, sub_hi = tiles_ops.subblock_bounds(
            pos_fields.position, pos_fields.real, sub
        )
        if q_rep > 1:
            qlo, qhi = tiles_ops.subblock_bounds(
                blocked.position, blocked.real, q_rep
            )
            qlo, qhi = qlo[:, None, :], qhi[:, None, :]
        else:
            qlo, qhi = bmin, bmax
        cand_sub, count_sub, ovf = tiles_ops.refine_candidates(
            cand_q, count_q, qlo, qhi, sub_lo, sub_hi, h_refine, sub,
            cap_sub, self_lo=self_lo, self_width=sub,
        )
    mass = params.particle_mass

    def packs(cf):
        return nl.make_csub_packs(
            cf.position.reshape(-1, 3),
            cf.velocity.reshape(-1, 3),
            cf.density.reshape(-1),
            cf.pressure.reshape(-1),
            cf.real.reshape(-1),
            mass=mass,
            gid=cf.gid.reshape(-1),
            center=center,
        )

    def pack_c16(cf):
        return nl.make_c16_force_pack(
            cf.position.reshape(-1, 3),
            cf.velocity.reshape(-1, 3),
            cf.density.reshape(-1),
            cf.pressure.reshape(-1),
            cf.real.reshape(-1),
            mass=mass,
            gid=cf.gid.reshape(-1),
            center=center,
        )

    q_pos, _ = nl.make_query_planes(
        state_s.position, state_s.velocity, state_s.density, state_s.pressure,
        valid_s, q_rows, mass=mass, gid_offset=gid_offset, center=center,
    )
    if dsub16:
        c_pos_pack = nl.make_c16_pos_pack(
            pos_fields.position.reshape(-1, 3),
            pos_fields.real.reshape(-1),
            center=center,
        )
    else:
        c_pos_pack, _ = packs(pos_fields)
    if use_t2:
        # tier routing is shard-local: heavy QUERY rows of this shard
        # route to its own tier-2 pool; only the force-pack closure
        # performs collectives (the same ONE exchange as single-tier)
        def make_q_force(density, pressure):
            return nl.make_query_planes(
                state_s.position, state_s.velocity, density, pressure,
                valid_s, q_rows, mass=mass, gid_offset=gid_offset,
                center=center,
            )[1]

        def make_c_force_pack(density, pressure):
            blk = blocked._replace(
                density=density.reshape(blocked.density.shape),
                pressure=pressure.reshape(blocked.pressure.shape),
            )
            return packs(force_fields(blk))[1]

        def make_c16_pack(density, pressure):
            blk = blocked._replace(
                density=density.reshape(blocked.density.shape),
                pressure=pressure.reshape(blocked.pressure.shape),
            )
            return pack_c16(force_fields(blk))

        return nl_two_tier_passes(
            q_pos, c_pos_pack, make_q_force, make_c_force_pack,
            valid_s, params, terms, config, r2_mxu,
            cand_sub, count_sub, self_lo, sub,
            ovf.astype(jnp.int32) * FLAG_CAPACITY_SUB,
            fix_density=lambda d: jnp.where(
                valid_s, d, params.fluid_density
            ),
            make_c16_pack=make_c16_pack,
        ) + (None,)
    # q32 force pass (engine/step.py force_query_rows rationale):
    # per-QUERY-SUBGROUP hit lists halve the true-hit pair volume
    force_q32 = (
        config.force_query_rows == 32
        and config.hit_compact
        and q_rows == 128
    )
    sub16 = force_q32 and config.force_sub16
    if force_q32:
        density, hits = nl.fused_density_nl(
            q_pos, c_pos_pack, cand_sub, count_sub, params, terms, valid_s,
            r2_mxu=r2_mxu, want_hits=True, hit_groups=nl.QG,
            hit_sub=nl.SUB16 if sub16 else nl.SUB, c16=dsub16,
        )
        if dsub16:
            # 16-granular ids straight from the refine: flags are
            # slot-aligned, no interleave (engine/step.py rationale)
            cand_f, count_f, ovf_h = tiles_ops.compact_hits(
                jnp.repeat(cand_sub, nl.QG, axis=0),
                hits[:, : cand_sub.shape[1]],
                config.max_candidates_hit16,
                self_lo=(
                    None if self_lo is None else jnp.repeat(self_lo, nl.QG)
                ),
                self_width=sub,
            )
        elif sub16:
            sent = tiles_ops.REFINE_SENTINEL
            twice = jnp.where(cand_sub == sent, sent, cand_sub * 2)
            ids16 = jnp.stack(
                [twice, jnp.where(cand_sub == sent, sent, twice + 1)],
                axis=-1,
            ).reshape(cand_sub.shape[0], -1)
            cand_f, count_f, ovf_h = tiles_ops.compact_hits(
                jnp.repeat(ids16, nl.QG, axis=0),
                hits[:, : ids16.shape[1]],
                config.max_candidates_hit16,
                self_lo=(
                    None if self_lo is None
                    else jnp.repeat(self_lo * 2, nl.QG)
                ),
                self_width=2 * sub,
            )
        else:
            cap32 = max(32, config.max_candidates_hit // 2)
            cand_f, count_f, ovf_h = tiles_ops.compact_hits(
                jnp.repeat(cand_sub, nl.QG, axis=0),
                hits[:, : cand_sub.shape[1]],
                cap32,
                self_lo=(
                    None if self_lo is None else jnp.repeat(self_lo, nl.QG)
                ),
                self_width=sub,
            )
    elif config.hit_compact:
        density, hits = nl.fused_density_nl(
            q_pos, c_pos_pack, cand_sub, count_sub, params, terms, valid_s,
            r2_mxu=r2_mxu, want_hits=True,
        )
        cand_f, count_f, ovf_h = tiles_ops.compact_hits(
            cand_sub, hits[:, : cand_sub.shape[1]], config.max_candidates_hit,
            self_lo=self_lo, self_width=sub,
        )
    else:
        ovf_h = jnp.zeros((), jnp.bool_)
        density = nl.fused_density_nl(
            q_pos, c_pos_pack, cand_sub, count_sub, params, terms, valid_s,
            r2_mxu=r2_mxu,
        )
        cand_f, count_f = cand_sub, count_sub
    pressure = interactions_ops.tait_pressure(density, params)
    pressure = jnp.where(valid_s, pressure, 0.0)
    density = jnp.where(valid_s, density, params.fluid_density)

    blocked = blocked._replace(
        density=density.reshape(blocked.density.shape),
        pressure=pressure.reshape(blocked.pressure.shape),
    )
    _, q_force = nl.make_query_planes(
        state_s.position, state_s.velocity, density, pressure,
        valid_s, q_rows, mass=mass, gid_offset=gid_offset, center=center,
    )
    _, c_force_pack = packs(force_fields(blocked))
    if sub16:
        accel = nl.fused_forces_nl32_c16(
            q_force, pack_c16(force_fields(blocked)), cand_f, count_f,
            params, terms, valid_s, density, r2_mxu=r2_mxu,
        )
    elif force_q32:
        accel = nl.fused_forces_nl32(
            q_force, c_force_pack, cand_f, count_f, params, terms,
            valid_s, density, r2_mxu=r2_mxu,
        )
    else:
        accel = nl.fused_forces_nl(
            q_force, c_force_pack, cand_f, count_f, params, terms,
            valid_s, density, r2_mxu=r2_mxu,
        )
    # granular capacity bits so the engine autotune grows only the
    # overflowing table (engine/step.py FLAG_CAPACITY* rationale)
    nl_flags = (
        ovf.astype(jnp.int32) * FLAG_CAPACITY_SUB
        + ovf_h.astype(jnp.int32) * FLAG_CAPACITY_HIT
    )
    return density, pressure, accel, nl_flags, (cand_sub, count_sub)


def _local_substep(
    state: ParticleState,
    dt: jnp.ndarray,
    params: SimulationParameters,
    scene: Optional[collisions_ops.DeviceScene],
    config: StepConfig,
    n_shards: int,
    exchange: str = "all_gather",
    halo_max: int = 0,
    halo_hops: int = 1,
    do_sort=True,
    cand_in=None,
):
    """Body run per shard under shard_map. state arrays are the local
    shard (n_local = padded_n / n_shards rows).

    ``exchange``:
    * ``all_gather`` — every shard gathers every block (simple,
      bandwidth ~N per step);
    * ``halo`` — each shard publishes only its *surface* blocks (those
      whose dilated AABB reaches another shard's spatial region) via
      all_gather; traffic ~ boundary area instead of volume.
      ``halo_max`` bounds the per-shard surface set (overflow reported
      like the candidate cap);
    * ``ring`` — point-to-point ppermute exchange of surface blocks
      over the Morton ring, ``halo_hops`` hops in each direction;
      traffic independent of n_shards. Raises FLAG_EXCHANGE when a
      spatially-neighbouring shard is out of hop range.

    Cadence (StepConfig.sort_interval / cand_interval, the sharded twin
    of engine.step.substep's): ``do_sort`` True sorts locally, False
    statically skips, a traced bool gates on device. ``cand_in`` is the
    carried candidate dict of a build substep ({cand_sub, count_sub,
    anchor} + {surf_idx, surf_valid} for halo/ring) — reuse substeps
    skip the search/refine AND the surface-set/box exchange, keeping
    only the per-substep FIELD exchanges. Sound because shard ownership
    is static (particles never migrate between shards — the halo
    machinery covers cross-shard neighbours), local order is pinned by
    the skipped sorts, and the carried surface sets/refined lists were
    built with the (1 + cand_slack) h dilation whose staleness guard
    (global pmax of displacement-since-anchor) is re-checked here every
    reuse substep.
    """
    cfg = config.tile_config()
    terms = params.precomputed()
    n_local = state.position.shape[0]
    shard = jax.lax.axis_index(AXIS)
    reuse_on = config.cand_interval > 1
    is_reuse = cand_in is not None
    if reuse_on and config.neighbor_impl != "pallas":
        raise ValueError("sharded candidate reuse requires the pallas impl")
    if is_reuse and do_sort is not False:
        raise ValueError(
            "sharded reuse substeps must statically skip the sort "
            "(the carried ids index the build substep's local order)"
        )
    # build-substep search dilation for the reuse window (the same
    # superset + staleness-guard argument as engine/step.py)
    h_search = (
        params.h * (1.0 + config.cand_slack) if reuse_on else params.h
    )

    # ---- 1. global bounds (pmin/pmax over real particles only);
    # sentinel padding rows are detected by their far-away positions
    # (pad_for_mesh places them at 1e32)
    big = jnp.float32(3.0e38)
    valid = jnp.isfinite(state.position).all(axis=1) & (
        jnp.abs(state.position).max(axis=1) < 1.0e30
    )
    local_min = jnp.min(
        jnp.where(valid[:, None], state.position, big), axis=0
    )
    local_max = jnp.max(
        jnp.where(valid[:, None], state.position, -big), axis=0
    )
    pos_min = jax.lax.pmin(local_min, AXIS)
    pos_max = jax.lax.pmax(local_max, AXIS)
    cell = jnp.float32(params.cell_side)
    gmin = pos_min - 2.0 * cell
    gmax = pos_max + 2.0 * cell
    grid = grid_ops.GridInfo(
        min_point=gmin,
        max_point=gmax,
        grid_size=((gmax - gmin) / cell).astype(jnp.int32),
        cell_side=cell,
    )
    # 10-bit Morton limit guard (sph_simulation.cpp:722-724); also
    # flags a grid that outgrew a reduced radix key width
    grid_bad = jnp.any(grid.grid_size >= morton.MAX_GRID_DIM) | (
        grid_ops.grid_exceeds_sort_bits(grid.grid_size)
    )

    # ---- 2. local Morton sort (pinned to build substeps under reuse)
    if do_sort is True:
        codes = grid_ops.locate_in_grid(state.position, grid)
        codes = jnp.where(valid, codes, tiles_ops.SENTINEL_CODE)
        state_s, _, order = grid_ops.sort_by_cell(state, codes)
        valid_s = jnp.take(valid, order, axis=0)
    elif do_sort is False:  # statically skipped (reuse substeps)
        state_s, valid_s = state, valid
    else:  # traced scalar: gate the sort on device
        codes = grid_ops.locate_in_grid(state.position, grid)
        codes = jnp.where(valid, codes, tiles_ops.SENTINEL_CODE)
        state_s = jax.lax.cond(
            do_sort,
            lambda s, c: grid_ops.sort_by_cell(s, c)[0],
            lambda s, c: s.replace(grid_index=c),
            state, codes,
        )
        # recompute validity in whichever order the branch produced
        valid_s = jnp.isfinite(state_s.position).all(axis=1) & (
            jnp.abs(state_s.position).max(axis=1) < 1.0e30
        )

    # staleness guard for carried candidate state: pairs (incl. remote
    # ones) close by at most 2 * the GLOBAL max displacement since the
    # build anchor — pmax makes the check global
    stale_flag = jnp.int32(0)
    if is_reuse:
        d2 = jnp.sum((state_s.position - cand_in["anchor"]) ** 2, axis=1)
        d2max = jax.lax.pmax(
            jnp.max(jnp.where(valid_s, d2, 0.0)), AXIS
        )
        stale = 4.0 * d2max > (config.cand_slack * params.h) ** 2
        stale_flag = stale.astype(jnp.int32) * FLAG_CAND_STALE

    # ---- 3. blocked fields + global candidate table
    blocked = tiles_ops.make_blocked(
        state_s.position,
        state_s.velocity,
        state_s.density,
        state_s.pressure,
        valid_s,
        cfg.block_size,
        gid_offset=shard * n_local,
    )
    bmin, bmax = tiles_ops.split_block_bounds(blocked.position, blocked.real)

    # all-gather block tables over ICI (full tables only in
    # all_gather mode; halo/ring modes exchange surface blocks below)
    gather = lambda a: jax.lax.all_gather(a, AXIS, tiled=True)
    if exchange not in ("halo", "ring"):
        if not is_reuse:
            g_bmin = gather(bmin)
            g_bmax = gather(bmax)
        g_blocked_pos = gather(blocked.position)
        g_real = gather(blocked.real)
        g_gid = gather(blocked.gid)

    nb_local = bmin.shape[0]
    exchange_bad = jnp.asarray(False)

    if exchange == "ring":
        # -------- ppermute ring halo exchange (SURVEY §2.3 plan) ------
        # Point-to-point neighbour exchange: each shard sends ONE
        # fixed-size surface-block packet per hop per direction over
        # the Morton ring, so per-step traffic is O(halo_hops *
        # halo_max) — independent of n_shards (the all_gather modes
        # broadcast O(n_shards * size)). Shards outside hop range that
        # would have contributed raise FLAG_EXCHANGE (increase
        # halo_hops), checked conservatively against shard AABBs.
        s_n = n_shards
        hdil = jnp.float32(h_search)
        # forward/backward hop budgets with disjoint reach (full ring
        # coverage when 2*halo_hops >= S-1)
        r_fwd = min(halo_hops, s_n // 2)
        r_bwd = min(halo_hops, s_n - 1 - r_fwd)

        fwd_perm = [(i, (i + 1) % s_n) for i in range(s_n)]
        bwd_perm = [(i, (i - 1) % s_n) for i in range(s_n)]

        def ring_exchange(payload):
            """2R point-to-point sends; hop k forward delivers shard
            (me-k)'s packet, backward (me+k)'s — a fixed, deterministic
            order both the box table and the field tables share."""
            received = []
            buf = payload
            for _ in range(r_fwd):
                buf = jax.lax.ppermute(buf, AXIS, fwd_perm)
                received.append(buf)
            buf = payload
            for _ in range(r_bwd):
                buf = jax.lax.ppermute(buf, AXIS, bwd_perm)
                received.append(buf)
            return received

        self_index = jnp.arange(nb_local, dtype=jnp.int32)
        inf = jnp.float32(3.0e38)
        if is_reuse:
            # carried surface set: the combined-table layout must match
            # the build substep's for the carried refined ids to stay
            # valid; the staleness guard above bounds all drift
            surf_idx = cand_in["surf_idx"]
            surf_valid = cand_in["surf_valid"]
            cand = count = None
            overflow = jnp.zeros((), jnp.bool_)
        else:
            sh_min = gather(local_min[None, :])  # (S, 3) — tiny
            sh_max = gather(local_max[None, :])
            jidx = jnp.arange(s_n, dtype=jnp.int32)
            fwd_d = jnp.mod(jidx - shard, s_n)
            bwd_d = jnp.mod(shard - jidx, s_n)
            near = ((fwd_d >= 1) & (fwd_d <= r_fwd)) | (
                (bwd_d >= 1) & (bwd_d <= r_bwd)
            )
            sh_overlap = jnp.all(
                (local_min[None, :] - hdil <= sh_max)
                & (local_max[None, :] + hdil >= sh_min),
                axis=-1,
            )
            exchange_bad = jnp.any(sh_overlap & ~near & (jidx != shard))

            # surface blocks: dilated split boxes reaching a near shard
            near_lo = jnp.where(near[:, None], sh_min, inf)
            near_hi = jnp.where(near[:, None], sh_max, -inf)
            reach = jnp.any(
                jnp.all(
                    (bmin[:, :, None, :] - hdil <= near_hi[None, None, :, :])
                    & (bmax[:, :, None, :] + hdil >= near_lo[None, None, :, :]),
                    axis=-1,
                ),
                axis=(1, 2),
            )
            surf_idx, surf_valid, surf_ovf = _compact_mask(reach, halo_max)

            boxes = ring_exchange(
                dict(
                    bmin=jnp.where(
                        surf_valid[:, None, None],
                        jnp.take(bmin, surf_idx, axis=0), inf,
                    ),
                    bmax=jnp.where(
                        surf_valid[:, None, None],
                        jnp.take(bmax, surf_idx, axis=0), -inf,
                    ),
                )
            )
            comb_bmin = jnp.concatenate(
                [bmin] + [b["bmin"] for b in boxes], axis=0
            )
            comb_bmax = jnp.concatenate(
                [bmax] + [b["bmax"] for b in boxes], axis=0
            )
            cand, count, cand_ovf = tiles_ops.candidate_blocks(
                bmin, bmax, h_search, cfg.max_candidates,
                comb_bmin, comb_bmax, self_index=self_index,
            )
            overflow = cand_ovf | surf_ovf

        def take_blocks(a):
            return jnp.take(a, surf_idx, axis=0)

        def combined_fields(blk):
            recv = ring_exchange(
                dict(
                    position=take_blocks(blk.position),
                    velocity=take_blocks(blk.velocity),
                    density=take_blocks(blk.density),
                    pressure=take_blocks(blk.pressure),
                    real=take_blocks(blk.real) & surf_valid[:, None],
                    gid=take_blocks(blk.gid),
                )
            )
            cat = lambda k: jnp.concatenate(
                [getattr(blk, k)] + [r[k] for r in recv], axis=0
            )
            return tiles_ops.BlockedFields(
                position=cat("position"),
                velocity=cat("velocity"),
                density=cat("density"),
                pressure=cat("pressure"),
                real=cat("real"),
                gid=cat("gid"),
            )

        pos_fields = combined_fields(blocked)
        force_fields = combined_fields
    elif exchange == "halo":
        # -------- surface-block halo exchange --------
        self_index = jnp.arange(nb_local, dtype=jnp.int32)
        inf = jnp.float32(3.0e38)
        row_shard = jnp.arange(n_shards * halo_max, dtype=jnp.int32) // halo_max
        mine = row_shard == shard
        if is_reuse:
            surf_idx = cand_in["surf_idx"]
            surf_valid = cand_in["surf_valid"]
            cand = count = None
            overflow = jnp.zeros((), jnp.bool_)
        else:
            # shard spatial boxes (from the real-particle bounds above)
            sh_min = gather(local_min[None, :])  # (n_shards, 3)
            sh_max = gather(local_max[None, :])
            # does block b's dilated bbox reach any REMOTE shard's box?
            hdil = jnp.float32(h_search)
            other = jnp.arange(n_shards) != shard  # (n_shards,)
            # bmin/bmax are (nb_l, 2, 3) split boxes
            reach = jnp.any(
                other[None, None, :]
                & jnp.all(
                    (bmin[:, :, None, :] - hdil <= sh_max[None, None, :, :])
                    & (bmax[:, :, None, :] + hdil >= sh_min[None, None, :, :]),
                    axis=-1,
                ),
                axis=(1, 2),
            )  # (nb_l,)
            surf_idx, surf_valid, surf_ovf = _compact_mask(reach, halo_max)

            s_bmin = jnp.where(
                surf_valid[:, None, None], jnp.take(bmin, surf_idx, axis=0),
                inf,
            )
            s_bmax = jnp.where(
                surf_valid[:, None, None], jnp.take(bmax, surf_idx, axis=0),
                -inf,
            )
            g_s_bmin = gather(s_bmin)  # (n_shards*halo_max, 2, 3)
            g_s_bmax = gather(s_bmax)
            # my own surface rows must not duplicate my local blocks
            g_s_bmin = jnp.where(mine[:, None, None], inf, g_s_bmin)
            g_s_bmax = jnp.where(mine[:, None, None], -inf, g_s_bmax)

            comb_bmin = jnp.concatenate([bmin, g_s_bmin], axis=0)
            comb_bmax = jnp.concatenate([bmax, g_s_bmax], axis=0)
            cand, count, cand_ovf = tiles_ops.candidate_blocks(
                bmin, bmax, h_search, cfg.max_candidates,
                comb_bmin, comb_bmax, self_index=self_index,
            )
            overflow = cand_ovf | surf_ovf

        def take_blocks(a):
            return jnp.take(a, surf_idx, axis=0)

        def combined_fields(blk):
            surf = tiles_ops.BlockedFields(
                position=gather(take_blocks(blk.position)),
                velocity=gather(take_blocks(blk.velocity)),
                density=gather(take_blocks(blk.density)),
                pressure=gather(take_blocks(blk.pressure)),
                real=gather(take_blocks(blk.real) & surf_valid[:, None]),
                gid=gather(take_blocks(blk.gid)),
            )
            # invalidate my own rows in the gathered table
            surf = surf._replace(real=surf.real & ~mine[:, None])
            return tiles_ops.BlockedFields(
                *[
                    jnp.concatenate([lo, hi], axis=0)
                    for lo, hi in zip(blk, surf)
                ]
            )

        pos_fields = combined_fields(blocked)
        force_fields = combined_fields
    else:
        self_index = shard * nb_local + jnp.arange(nb_local, dtype=jnp.int32)
        if is_reuse:
            cand = count = None
            overflow = jnp.zeros((), jnp.bool_)
        else:
            cand, count, overflow = tiles_ops.candidate_blocks(
                bmin, bmax, h_search, cfg.max_candidates, g_bmin, g_bmax,
                self_index=self_index,
            )

        pos_fields = tiles_ops.BlockedFields(
            position=g_blocked_pos,
            velocity=g_blocked_pos,  # unused in density
            density=g_real.astype(jnp.float32),  # unused in density
            pressure=g_real.astype(jnp.float32),  # unused
            real=g_real,
            gid=g_gid,
        )

        def force_fields(blk):
            return tiles_ops.BlockedFields(
                position=g_blocked_pos,
                velocity=gather(blk.velocity),
                density=gather(blk.density),
                pressure=gather(blk.pressure),
                real=g_real,
                gid=g_gid,
            )

    # ---- density + forces over the exchanged candidate tables,
    # by the configured backend (tiles, or the nl Pallas kernels)
    cand_out = None
    if config.neighbor_impl == "pallas":
        density, pressure, accel, nl_flags, cand_tables = _nl_passes(
            state_s, blocked, bmin, bmax, cand, count,
            pos_fields, force_fields, valid_s,
            shard * n_local, params, terms, config,
            center=0.5 * (pos_min + pos_max),
            self_index=self_index,
            cand_in=(
                (cand_in["cand_sub"], cand_in["count_sub"])
                if is_reuse else None
            ),
            h_search=h_search if reuse_on else None,
        )
        cap_flags = overflow.astype(jnp.int32) * FLAG_CAPACITY + nl_flags
        if reuse_on:
            if is_reuse:
                cand_out = cand_in  # pass the carry through unchanged
            else:
                cand_out = dict(
                    cand_sub=cand_tables[0],
                    count_sub=cand_tables[1],
                    anchor=state_s.position,
                )
                if exchange in ("halo", "ring"):
                    cand_out["surf_idx"] = surf_idx
                    cand_out["surf_valid"] = surf_valid
    else:
        density = tiles_ops.density_pass(
            blocked, cand, count, params, terms, cfg, cand_fields=pos_fields
        )
        pressure = interactions_ops.tait_pressure(density, params)
        pressure = jnp.where(valid_s, pressure, 0.0)
        density = jnp.where(valid_s, density, params.fluid_density)
        blocked = blocked._replace(
            density=density.reshape(blocked.density.shape),
            pressure=pressure.reshape(blocked.pressure.shape),
        )
        accel = tiles_ops.force_pass(
            blocked, cand, count, params, terms, cfg,
            cand_fields=force_fields(blocked),
        )
        cap_flags = overflow.astype(jnp.int32) * FLAG_CAPACITY
    accel = jnp.where(valid_s[:, None], accel, 0.0)

    state_s = state_s.replace(
        density=density, pressure=pressure, acceleration=accel
    )

    # ---- 4. adaptive-dt advect+collide with global pmax agreement
    def global_dt(velocity, acceleration):
        mv2 = jnp.max(
            jnp.where(valid_s, jnp.sum(velocity * velocity, axis=-1), 0.0)
        )
        ma2 = jnp.max(
            jnp.where(valid_s, jnp.sum(acceleration * acceleration, axis=-1), 0.0)
        )
        mv2 = jax.lax.pmax(mv2, AXIS)
        ma2 = jax.lax.pmax(ma2, AXIS)
        max_vel = jnp.sqrt(mv2)
        max_accel = jnp.maximum(jnp.sqrt(ma2), 1e-12)
        dt_new = (jnp.sqrt(2.0 * max_accel * params.h + mv2) - max_vel) / (
            2.0 * max_accel
        )
        return jnp.clip(dt_new, integrate_ops.DT_MIN, params.max_dt)

    def advance(dt_try):
        new_state = _advect_collide(state_s, scene, dt_try, params)
        # freeze sentinels in place
        new_state = jax.tree.map(
            lambda new, old: jnp.where(
                valid_s.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
            ),
            new_state,
            state_s,
        )
        return new_state, global_dt(new_state.velocity, new_state.acceleration)

    first_state, first_dt = advance(dt)
    if config.adaptive_dt:

        def cond(carry):
            _, dt_used, dt_new = carry
            return dt_used - dt_new > integrate_ops.DT_RETRY_EPS

        def body(carry):
            _, _, dt_new = carry
            st, dt_next = advance(dt_new)
            return st, dt_new, dt_next

        final_state, _, dt_out = jax.lax.while_loop(
            cond, body, (first_state, dt, first_dt)
        )
    else:
        final_state, dt_out = first_state, first_dt

    flags = (
        cap_flags
        + grid_bad.astype(jnp.int32) * FLAG_GRID_DIM
        + exchange_bad.astype(jnp.int32) * FLAG_EXCHANGE
        + stale_flag
    )
    # cross-shard combine must be a bitwise OR, not a plain max: two
    # shards flagging DIFFERENT bits (e.g. CAPACITY_SUB=8 on one,
    # CAPACITY_HIT=16 on another) would lose the smaller bit under
    # pmax of the packed field. pmax per bit == OR.
    bit = jnp.arange(8, dtype=jnp.int32)
    bits = jax.lax.pmax((flags >> bit) & 1, AXIS)
    flags = jnp.sum(bits << bit)
    if reuse_on:
        return final_state, dt_out, flags, cand_out
    return final_state, dt_out, flags


def _local_frame(
    state: ParticleState,
    dt: jnp.ndarray,
    timeleft: jnp.ndarray,
    params: SimulationParameters,
    scene: Optional[collisions_ops.DeviceScene],
    config: StepConfig,
    n_shards: int,
    exchange: str,
    halo_max: int,
    halo_hops: int,
):
    """A frame's substep loop on device under shard_map — the sharded
    twin of engine.step.frame_jit (sph_simulation.cpp:384-409): carries
    (state, dt, timeleft, flags, k) through a lax.while_loop whose body
    is the full _local_substep (collectives included), bounded by
    config.substeps_per_dispatch. The host fetches ONE scalar per
    dispatch instead of one dt per substep.

    Carries the single-chip cadence features under the mesh
    (StepConfig.sort_interval / cand_interval): re-sorts and candidate
    rebuilds run every k-th substep, with frame_jit's PREDICTIVE
    staleness check (global pmax of displacement-since-anchor) forcing
    a rebuild before any reuse substep could miss pairs."""
    cap = jnp.int32(config.substeps_per_dispatch)
    interval = int(config.sort_interval)
    ci = int(config.cand_interval)
    run = partial(
        _local_substep, params=params, scene=scene, config=config,
        n_shards=n_shards, exchange=exchange, halo_max=halo_max,
        halo_hops=halo_hops,
    )

    if ci > 1:
        if interval % ci:
            raise ValueError(
                "sort_interval must be a multiple of cand_interval "
                "(re-sorts must coincide with candidate rebuilds)"
            )
        n_local = state.position.shape[0]
        cfgt = config.tile_config()
        nb_local = n_local // cfgt.block_size
        # the refine's output width is min(cap, sub * M): the sort-
        # compaction can't emit more slots than the candidate key plane
        # has (tiles._self_priority_sort slices the sorted keys)
        sub = cfgt.block_size // (16 if config.density_sub16 else 32)
        width = min(
            config.max_candidates_sub, sub * config.max_candidates
        )
        tables0 = dict(
            cand_sub=jnp.zeros((nb_local, width), jnp.int32),
            count_sub=jnp.zeros((nb_local,), jnp.int32),
            anchor=jnp.zeros((n_local, 3), jnp.float32),
        )
        if exchange in ("halo", "ring"):
            tables0["surf_idx"] = jnp.zeros((halo_max,), jnp.int32)
            tables0["surf_valid"] = jnp.zeros((halo_max,), jnp.bool_)

        slack2 = jnp.float32((config.cand_slack * params.h) ** 2)

        def cond(carry):
            _, _, tl, _, k, _ = carry
            return (tl > 0.0) & (k < cap)

        def body(carry):
            st, dt_cur, tl, flags, k, tables = carry

            def run_build(op):
                s, d = op
                do_sort = True if interval <= 1 else (k % interval == 0)
                return run(s, d, do_sort=do_sort)

            def run_reuse(op):
                s, d = op
                return run(s, d, do_sort=False, cand_in=tables)

            # PREDICTIVE staleness (engine/step.frame_jit rationale):
            # decide rebuild-vs-reuse BEFORE the substep from the
            # GLOBAL displacement since the carried anchor, so fast
            # flows degrade to rebuild-every-substep instead of
            # flagging mid-frame
            d2 = jnp.sum((st.position - tables["anchor"]) ** 2, axis=1)
            ok = jnp.abs(st.position).max(axis=1) < 1.0e30
            d2max = jax.lax.pmax(
                jnp.max(jnp.where(ok, d2, 0.0)), AXIS
            )
            stale_now = 4.0 * d2max > slack2
            st, dt_next, step_flags, tables = jax.lax.cond(
                (k % ci == 0) | stale_now, run_build, run_reuse,
                (st, dt_cur),
            )
            tl = tl - dt_next
            dt_next = jnp.where(tl < dt_next, tl, dt_next)
            return st, dt_next, tl, flags | step_flags, k + 1, tables

        state, dt, timeleft, flags, _, _ = jax.lax.while_loop(
            cond, body,
            (state, dt, timeleft, jnp.int32(0), jnp.int32(0), tables0),
        )
        return state, dt, timeleft, flags

    def cond(carry):
        _, _, tl, _, k = carry
        return (tl > 0.0) & (k < cap)

    def body(carry):
        st, dt_cur, tl, flags, k = carry
        do_sort = True if interval <= 1 else (k % interval == 0)
        st, dt_next, step_flags = run(st, dt_cur, do_sort=do_sort)
        tl = tl - dt_next
        dt_next = jnp.where(tl < dt_next, tl, dt_next)
        return st, dt_next, tl, flags | step_flags, k + 1

    state, dt, timeleft, flags, _ = jax.lax.while_loop(
        cond, body, (state, dt, timeleft, jnp.int32(0), jnp.int32(0))
    )
    return state, dt, timeleft, flags


def make_sharded_frame(
    mesh: Mesh,
    params: SimulationParameters,
    scene: Optional[collisions_ops.DeviceScene],
    config: StepConfig,
    exchange: str = "all_gather",
    halo_max: int = 0,
    halo_hops: int = 1,
):
    """Build the jitted sharded FRAME dispatch (see :func:`_local_frame`);
    call as ``frame(state, dt, timeleft) -> (state, dt, timeleft, flags)``."""
    n_shards = mesh.shape[AXIS]
    pspec = P(AXIS)
    state_specs = ParticleState(
        position=pspec,
        velocity=pspec,
        intermediate_velocity=pspec,
        acceleration=pspec,
        density=pspec,
        pressure=pspec,
        grid_index=pspec,
    )
    fn = shard_map(
        partial(
            _local_frame,
            params=params,
            scene=scene,
            config=config,
            n_shards=n_shards,
            exchange=exchange,
            halo_max=halo_max,
            halo_hops=halo_hops,
        ),
        mesh=mesh,
        in_specs=(state_specs, P(), P()),
        out_specs=(state_specs, P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)


def make_sharded_substep(
    mesh: Mesh,
    params: SimulationParameters,
    scene: Optional[collisions_ops.DeviceScene],
    config: StepConfig,
    exchange: str = "all_gather",
    halo_max: int = 0,
    halo_hops: int = 1,
):
    """Build the jitted sharded substep for a mesh.

    Expects state arrays pre-padded so N_padded is divisible by
    (n_shards * block_size); see :func:`pad_for_mesh`. ``exchange`` /
    ``halo_max``: see :func:`_local_substep`.

    Candidate reuse is pinned off here: this per-substep entry point
    serves the engine's SLOW path, whose host callbacks may mutate
    positions between substeps — which would silently stale any carried
    tables (the same rationale as the single-chip slow path). The
    device-side frame loop (:func:`make_sharded_frame`) carries the
    full cadence.
    """
    import dataclasses

    if config.cand_interval > 1:
        config = dataclasses.replace(config, cand_interval=1)
    n_shards = mesh.shape[AXIS]
    pspec = P(AXIS)
    state_specs = ParticleState(
        position=pspec,
        velocity=pspec,
        intermediate_velocity=pspec,
        acceleration=pspec,
        density=pspec,
        pressure=pspec,
        grid_index=pspec,
    )

    fn = shard_map(
        partial(
            _local_substep,
            params=params,
            scene=scene,
            config=config,
            n_shards=n_shards,
            exchange=exchange,
            halo_max=halo_max,
            halo_hops=halo_hops,
        ),
        mesh=mesh,
        in_specs=(state_specs, P()),
        out_specs=(state_specs, P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)


def pad_for_mesh(
    state: ParticleState, params: SimulationParameters, mesh: Mesh, config: StepConfig
) -> ParticleState:
    """Pad + Morton-partition the state across the mesh (host side).

    Sentinel rows get non-finite-ish far positions; they are detected
    on device by magnitude and frozen.
    """
    from .mesh import morton_partition

    n = state.position.shape[0]
    n_shards = mesh.shape[AXIS]
    chunk = n_shards * config.block_size
    n_pad = (-n) % chunk

    order = morton_partition(np.asarray(state.position), n_shards)
    state = jax.tree.map(lambda a: jnp.take(a, jnp.asarray(order), axis=0), state)

    if n_pad:
        far = jnp.float32(1.0e32)

        def pad(a):
            fill = jnp.zeros((n_pad,) + a.shape[1:], a.dtype)
            return jnp.concatenate([a, fill], axis=0)

        state = jax.tree.map(pad, state)
        state = state.replace(
            position=state.position.at[n:].set(far),
            density=state.density.at[n:].set(params.fluid_density),
        )
    return state


def dryrun(n_devices: int) -> None:
    """Driver hook: build an n_devices mesh, jit the FULL sharded step,
    run one step on tiny shapes, sanity-check the result."""
    import jax

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}"
    )
    mesh = Mesh(np.asarray(devices), (AXIS,))

    from ..core.params import derive_parameters
    from ..core.state import init_state

    fluid = dict(
        fluid_density=998.29,
        dynamic_viscosity=3.5,
        restitution=0,
        k=100,
        surface_tension_threshold=7.065,
        surface_tension=0.0728,
        particles_inside_influence_radius=20,
    )
    sim = dict(
        particles_count=2048,
        particle_mass=0.05,
        simulation_time=3,
        target_fps=60,
        simulation_scale=0.1,
        constant_acceleration=dict(x=0, y=-9.8, z=0),
    )
    params = derive_parameters(fluid, sim)
    config = StepConfig(neighbor_impl="tiles", block_size=64, max_candidates=32)

    state = init_state(params)
    state = pad_for_mesh(state, params, mesh, config)
    sharding = NamedSharding(mesh, P(AXIS))
    state = jax.tree.map(lambda a: jax.device_put(a, sharding), state)

    step = make_sharded_substep(mesh, params, None, config)
    out_state, dt, flags = step(state, jnp.float32(params.max_dt))
    assert not int(flags)
    jax.block_until_ready(out_state.position)

    pos = np.asarray(out_state.position)
    real = np.abs(pos).max(axis=1) < 1.0e30
    assert real.sum() == params.particles_count, (
        real.sum(),
        params.particles_count,
    )
    assert np.isfinite(pos[real]).all()
    rho = np.asarray(out_state.density)[real]
    assert rho.min() > 0, rho.min()
    assert float(dt) > 0

    # also exercise the production Pallas kernels + the point-to-point
    # ppermute ring exchange under the mesh (full ring coverage), WITH
    # a DF collision scene (a 2-triangle floor under the lattice) so
    # the sharded collision path (collisionsv2.cl:249-336 under the
    # mesh) is certified too
    from ..scene.obj_loader import ObjMesh
    from ..scene.scene import Scene

    floor = ObjMesh(
        vertices=np.asarray(
            [[-2, -0.5, -2], [2, -0.5, -2], [2, -0.5, 2], [-2, -0.5, 2]],
            np.float32,
        ),
        triangles=np.asarray([[0, 2, 1], [0, 3, 2]], np.int32),
    )
    dev_scene = collisions_ops.build_device_scene(
        Scene.from_mesh(floor, params.h * 2.0)
    )
    nb_local = state.position.shape[0] // n_devices // config.block_size
    config_p = StepConfig(
        neighbor_impl="pallas", pallas_variant="nl",
        block_size=config.block_size, max_candidates=config.max_candidates,
        max_candidates_sub=96,
        # two-tier overflow routing compiled + executed under the mesh
        # (engine/step.nl_two_tier_passes via the sharded caller)
        tier2_frac=8, tier2_mult=2,
    )
    step_ring = make_sharded_substep(
        mesh, params, dev_scene, config_p, exchange="ring",
        halo_max=nb_local, halo_hops=(n_devices + 1) // 2,
    )
    out2, dt2, flags2 = step_ring(state, jnp.float32(params.max_dt))
    assert not int(flags2), int(flags2)
    pos2 = np.asarray(out2.position)
    real2 = np.abs(pos2).max(axis=1) < 1.0e30
    assert real2.sum() == params.particles_count
    assert np.isfinite(pos2[real2]).all()
    assert float(dt2) > 0

    # and the device-side frame loop (make_sharded_frame): a whole
    # frame's substeps in one dispatch, one scalar fetched back
    frame = make_sharded_frame(mesh, params, dev_scene, config_p)
    out3, dt3, timeleft3, flags3 = frame(
        state, jnp.float32(params.max_dt), jnp.float32(params.frame_time)
    )
    assert not int(flags3), int(flags3)
    assert float(timeleft3) <= 0.0 or float(dt3) > 0.0
    pos3 = np.asarray(out3.position)
    real3 = np.abs(pos3).max(axis=1) < 1.0e30
    assert real3.sum() == params.particles_count
    assert np.isfinite(pos3[real3]).all()

    # the CADENCED sharded frame (r4): sort_interval + cand_interval
    # under the mesh — skipped local sorts, carried refined lists, the
    # predictive global staleness check (engine/step.frame_jit's twin)
    config_c = StepConfig(
        neighbor_impl="pallas", pallas_variant="nl",
        block_size=config.block_size, max_candidates=config.max_candidates,
        max_candidates_sub=96, max_candidates_hit=96,
        sort_interval=2, cand_interval=2, cand_slack=0.3,
    )
    frame_c = make_sharded_frame(mesh, params, dev_scene, config_c)
    out4, dt4, timeleft4, flags4 = frame_c(
        state, jnp.float32(params.max_dt), jnp.float32(params.frame_time)
    )
    assert not int(flags4), int(flags4)
    assert float(timeleft4) <= 0.0 or float(dt4) > 0.0
    pos4 = np.asarray(out4.position)
    real4 = np.abs(pos4).max(axis=1) < 1.0e30
    assert real4.sum() == params.particles_count
    assert np.isfinite(pos4[real4]).all()
