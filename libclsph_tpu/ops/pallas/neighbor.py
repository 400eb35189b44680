"""Fused Pallas TPU kernels for the SPH neighbour passes.

The XLA block-tile path (ops/tiles.py) pays taxes the compiler cannot
remove: every query block scans all ``max_candidates`` slots (masked
compute is still compute), and the (nb, B, B) pair tensors round-trip
through HBM between fusion boundaries. These kernels fix both, and
additionally pack each side's fields into a single array so one grid
step issues ONE candidate DMA instead of ten.

Layouts (B = block size, nb = number of Morton-sorted blocks):

* query pack   (nb, F, B, 1) — F field planes, *column* oriented:
  ``q[0, k]`` is a (B, 1) sublane vector that broadcasts against
  candidate rows with no in-kernel transpose;
* candidate pack (nb, F, B) — row oriented: ``c[0, k:k+1, :]`` is a
  (1, B) lane vector;
* output pack (nb, F, B, 1) — column oriented accumulators.

All three tile legally under Mosaic's (8, 128) rules because their
trailing unit / F dimensions are whole-array.

The grid is (chunk, M): the query block stays VMEM-resident while the
candidate slot sweeps; the candidate block index comes from the
scalar-prefetched ``cand`` table (pltpu.PrefetchScalarGridSpec), which
drives the BlockSpec index_map — the candidate DMA is data-dependent.
Slots at or beyond ``count[i]`` skip all compute via ``pl.when``.
Because the prefetched table lives in SMEM (~1 MB), large runs are
chunked over query blocks (QUERY_CHUNK) with the candidate pack shared
across chunks.

Particle ids ride in an f32 plane as *values* (exact below 2^24; TPU
denormal flushing forbids the bitcast trick) and self-exclusion
compares those values. Per-candidate scalars arrive premultiplied
(pm = m p/rho^2, mr = m/rho, zeroed on sentinel rows) so the pair tile
does no divides.

Physics is identical to ops/tiles.py (and therefore to
compute_density_with_grid / compute_internal_forces_with_grid,
forces.cl:14-111), including the spiky r->0 singular branch and the
i != j exclusions.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import smoothing
from ...core.params import PrecomputedKernelValues, SimulationParameters


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


# SMEM budget for the scalar-prefetched candidate table
QUERY_CHUNK = 512


def _query_chunk(nb: int, m: int) -> int:
    """Query blocks per pallas_call: bounded by SMEM (the prefetched
    cand slice is chunk x m int32; SMEM is ~1 MB, keep cand <= 512 KB)."""
    return max(8, min(nb, QUERY_CHUNK, (128 * 1024) // max(m, 1)))

MAX_PARTICLES_F32_ID = 1 << 24  # ids stored exactly as f32 values

# f32 emulation depth for the FORCE core's reduction dot. Mosaic
# supports only DEFAULT (one bf16 pass — truncates the operands to
# 8-bit mantissas, ~4e-3 relative error: fails the 1e-4 parity budget,
# caught by test_tpu_smoke on the chip) and HIGHEST (6-pass full f32).
# "split3" (the TPU default since r3) emulates the missing middle
# tier: operands are split in-kernel as f32 = hi(bf16) + lo and three
# DEFAULT passes (hi.hi + hi.lo + lo.hi) reconstruct ~2^-18 term
# accuracy at half HIGHEST's MXU cost. The force combine's
# x_i*sum(a) - sum(a x_j) cancellation amplifies that by
# (block extent)/h; measured at bench scale (64k settled dam-break vs
# the f64 oracle, experiments/fidelity_64k.py, r3): accel RMS rel
# 1.6e-6 / max 2.0e-5 vs HIGHEST's 4.5e-7 / 3.1e-6 — both far inside
# the 1e-4 parity budget, and split3 is ~6 ms/substep faster at 1M.
# OFF TPU the default stays "highest": in interpret mode the bf16
# splits are pure extra truncation with zero hardware payoff, and the
# CPU suite's pallas-vs-tiles equivalence tolerances stay strict.
# split3's own numerics are pinned by the fidelity experiment, the
# on-chip budget test (test_tpu_smoke.test_mosaic_split3_production_
# budget) and the host-side truncation-budget test (test_nl_layout).
# Set LIBCLSPH_TPU_DOT_MODE to force either mode anywhere.
# (The DENSITY dot always uses a 2-pass split: its sum has no
# cancellation, so 2^-18 term error is unconditionally safe —
# measured density RMS rel 9.7e-7 under both modes.)
_DOT_MODE = os.environ.get("LIBCLSPH_TPU_DOT_MODE")


def _dot_mode():
    global _DOT_MODE
    if _DOT_MODE is None:
        _DOT_MODE = (
            "split3" if jax.default_backend() == "tpu" else "highest"
        )
    return _DOT_MODE


def _reduce_dot(lhs, rhs, dims, lhs_exact=False, mode=None):
    """f32-accurate dot_general (see _DOT_MODE note above).
    ``lhs_exact``: lhs is bf16-representable (e.g. ones), so its lo
    half is zero and the split needs only two passes."""
    mode = _dot_mode() if mode is None else mode
    if mode == "highest":
        return jax.lax.dot_general(
            lhs, rhs, dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if mode == "default":  # experiment only: breaks 1e-4 parity
        return jax.lax.dot_general(
            lhs, rhs, dims, preferred_element_type=jnp.float32
        )
    d = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    rhi = rhs.astype(jnp.bfloat16).astype(jnp.float32)
    rlo = rhs - rhi
    if lhs_exact:
        return d(lhs, rhi) + d(lhs, rlo)
    lhi = lhs.astype(jnp.bfloat16).astype(jnp.float32)
    llo = lhs - lhi
    return d(lhi, rhi) + (d(lhi, rlo) + d(llo, rhi))


# pack interleave construction: "concat" (default) builds the
# block-major (rows, F, width) form as a concatenation of reshaped
# VIEWS of the flat field vectors — XLA writes each stripe directly in
# the Pallas consumer's layout. The older "transpose" form
# (stack -> reshape -> swapaxes) made XLA materialise the field-major
# tensor and then relayout-copy it for the Pallas operand (~3.2 ms per
# 32 MB query pack at 1M, xprof r3 copy-start.31). Knob kept for A/B.
_PACK_BUILD = os.environ.get("LIBCLSPH_TPU_PACK_BUILD", "concat")


def _interleave(fields, rows, width):
    """[(rows*width,)] * F field vectors -> (rows, F, width)."""
    if _PACK_BUILD == "transpose":
        a = jnp.stack(fields, axis=0)
        return a.reshape(len(fields), rows, width).swapaxes(0, 1)
    return jnp.concatenate(
        [f.reshape(rows, 1, width) for f in fields], axis=1
    )


class PlanePack(NamedTuple):
    """Packed kernel operands (see module docstring for layouts)."""

    q_pos: jnp.ndarray  # (nb, 3, B, 1) px py pz
    c_pos: jnp.ndarray  # (nb, 4, B)    px py pz realmask
    q_force: jnp.ndarray  # (nb, 8, B, 1) px py pz vx vy vz pm gid
    c_force: jnp.ndarray  # (nb, 9, B)    px py pz vx vy vz pm mr gid

    @property
    def nb(self):
        return self.q_pos.shape[0]

    @property
    def b(self):
        return self.q_pos.shape[2]


def make_planes(
    position, velocity, density, pressure, real, block_size, mass=1.0, gid_offset=0,
    q_div=1,
) -> PlanePack:
    """``q_div`` > 1 packs the *query* side at block_size/q_div
    granularity (the 'fine' kernel variant): finer query blocks share
    their parent 128-block's candidate list but let the in-kernel
    empty-tile early-out skip the ~80% of (sub-query, candidate) tiles
    whose pairs are all outside the support radius.

    Measured on v5e: ~2x SLOWER than q_div=1 (1167 vs 600 ms at 1M) —
    4x more grid steps means 4x the per-step pipeline/DMA bookkeeping,
    which dominates the skipped arithmetic. Kept as a tested variant;
    see ROUND1_NOTES.md for the full dead-end list."""
    n = position.shape[0]
    nb = n // block_size
    if n + gid_offset >= MAX_PARTICLES_F32_ID:
        raise ValueError("particle ids exceed exact-f32 range")
    realf = real.astype(jnp.float32)
    safe_rho = jnp.where(density > 0, density, 1.0)
    pm = jnp.where(real, mass * pressure / (safe_rho * safe_rho), 0.0)
    mr = jnp.where(real, mass / safe_rho, 0.0)
    gidf = (jnp.arange(n, dtype=jnp.int32) + gid_offset).astype(jnp.float32)

    px, py, pz = position[:, 0], position[:, 1], position[:, 2]
    vx, vy, vz = velocity[:, 0], velocity[:, 1], velocity[:, 2]

    def pack(fields, col, div=1):
        a = _interleave(fields, nb * div, block_size // div)
        return a[..., None] if col else a

    return PlanePack(
        q_pos=pack([px, py, pz], col=True, div=q_div),
        c_pos=pack([px, py, pz, realf], col=False),
        q_force=pack([px, py, pz, vx, vy, vz, pm, gidf], col=True, div=q_div),
        c_force=pack([px, py, pz, vx, vy, vz, pm, mr, gidf], col=False),
    )


def _q_spec(f, b):
    return pl.BlockSpec((1, f, b, 1), lambda i, m_, cand_, count_: (i, 0, 0, 0))


def _c_spec_k(f, b, cpg, k, nc_last, q_div=1):
    """Candidate spec for slot m*cpg + k (multi-candidate grid steps).
    With q_div > 1, query block i uses its parent block's candidates.
    Dead candidate slots may hold tiles.REFINE_SENTINEL (the
    hierarchical search's sort-compaction sentinel) — clamp the DMA
    index to the last block (its data is never used: the kernels skip
    compute for slots >= count)."""
    return pl.BlockSpec(
        (1, f, b),
        lambda i, m_, cand_, count_: (
            jnp.minimum(cand_[i // q_div, m_ * cpg + k], nc_last), 0, 0
        ),
    )


def _chunked_call(run_chunk, chunk, nb_q, q_div, cand, count, q):
    """Apply run_chunk over query-block chunks (SMEM-bounded cand
    table). Query rows chunk by ``chunk``; the candidate table rows (at
    parent granularity when q_div > 1) chunk by ``chunk // q_div``."""
    if chunk == nb_q:
        return run_chunk((cand, count, q))
    nch = -(-nb_q // chunk)
    pad_q = nch * chunk - nb_q
    pad_c = pad_q // q_div

    def cc(a, pad, rows):
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
            )
        return a.reshape((nch, rows) + a.shape[1:])

    out = jax.lax.map(
        run_chunk,
        (
            cc(cand, pad_c, chunk // q_div),
            cc(count, pad_c, chunk // q_div),
            cc(q, pad_q, chunk),
        ),
    )
    return out.reshape((-1,) + out.shape[2:])[:nb_q]


# ----------------------------------------------------------------------
# density
# ----------------------------------------------------------------------


# candidate blocks processed per grid step (amortises per-step
# pipeline/DMA bookkeeping over several pair tiles); env-overridable
# for tuning sweeps
CANDS_PER_STEP = int(os.environ.get("LIBCLSPH_TPU_CPG", "4"))


def _density_tile(q, c, out, *, h, poly6):
    """q/c refs in the (1, F, B, 1) / (1, F, B) layouts above."""
    _density_core(
        lambda k: q[0, k], lambda k: c[0, k : k + 1, :], out, h=h, poly6=poly6
    )


def _density_core(col, row, out, *, h, poly6):
    """Layout-agnostic pair tile: ``col(k)`` -> (B, 1) query field,
    ``row(k)`` -> (1, B) candidate field."""
    h2 = h * h
    dx = col(0) - row(0)  # (B, 1) - (1, B) -> (B, B)
    dy = col(1) - row(1)
    dz = col(2) - row(2)
    r2 = dx * dx + dy * dy + dz * dz
    incl = r2 < h2

    @pl.when(jnp.any(incl))
    def _():
        # the reference's floor(r/h) cutoff factor (smoothing.cl:1-4)
        # is exactly the r<h predicate; poly6 needs only r^2.
        # t is zeroed BEFORE cubing: far-away rows (sentinel padding /
        # dead gathered slots) have r2 large enough that (h2-r2)^3
        # overflows f32, and 0 * inf would poison the sum with NaN.
        t = jnp.where(incl, h2 - r2, 0.0)
        w = (poly6 * row(3)) * (t * t * t)
        out[...] += jnp.sum(w, axis=1, keepdims=True)[None]


def _density_kernel(
    cand_ref, count_ref, q, *cs_and_out, h: float, poly6: float, q_div: int = 1
):
    cs, out = cs_and_out[:-1], cs_and_out[-1]
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out[...] = jnp.zeros_like(out)

    for k, c in enumerate(cs):
        slot = m * len(cs) + k

        @pl.when(slot < count_ref[i // q_div])
        def _(c=c):
            _density_tile(q, c, out, h=h, poly6=poly6)


def fused_density(
    planes: PlanePack,
    cand: jnp.ndarray,
    count: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    real_flat: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns the flat (n,) density over the sorted order."""
    nb, b = planes.c_pos.shape[0], planes.c_pos.shape[2]
    nb_q, b_q = planes.q_pos.shape[0], planes.q_pos.shape[2]
    q_div = nb_q // nb
    m = cand.shape[1]
    interpret = _interpret_default() if interpret is None else interpret

    kernel = functools.partial(
        _density_kernel, h=float(params.h), poly6=float(terms.poly_6), q_div=q_div
    )

    cpg = CANDS_PER_STEP
    mp = -(-m // cpg) * cpg
    if mp != m:
        cand = jnp.concatenate(
            [cand, jnp.zeros((nb, mp - m), cand.dtype)], axis=1
        )
    chunk = max(q_div, _query_chunk(nb_q, mp) // q_div * q_div)

    def run_chunk(args):
        cand_c, count_c, q = args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(chunk, mp // cpg),
            in_specs=[_q_spec(3, b_q)]
            + [
                _c_spec_k(4, b, cpg, k, planes.c_pos.shape[0] - 1, q_div)
                for k in range(cpg)
            ],
            out_specs=pl.BlockSpec(
                (1, b_q, 1), lambda i, m_, cand_, count_: (i, 0, 0)
            ),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((chunk, b_q, 1), jnp.float32),
            interpret=interpret,
        )(cand_c, count_c, q, *([planes.c_pos] * cpg))

    wsum = _chunked_call(run_chunk, chunk, nb_q, q_div, cand, count, planes.q_pos)
    density = params.particle_mass * wsum.reshape(-1)
    return jnp.where(real_flat, density, params.fluid_density)


# ----------------------------------------------------------------------
# forces
# ----------------------------------------------------------------------

# query pack rows
_QX, _QY, _QZ, _QVX, _QVY, _QVZ, _QPM, _QGID = range(8)
# candidate pack rows
_CX, _CY, _CZ, _CVX, _CVY, _CVZ, _CPM, _CMR, _CGID = range(9)
# output rows: pressure xyz, viscosity xyz, normal xyz, laplacian
(_OPX, _OPY, _OPZ, _OVX, _OVY, _OVZ, _ONX, _ONY, _ONZ, _OLAP) = range(10)


def _forces_tile(q, c, out, *, h, spiky, visc, poly6_grad, poly6_lap, eps):
    """q/c refs in the (1, F, B, 1) / (1, F, B) layouts above."""
    _forces_core(
        lambda k: q[0, k],
        lambda k: c[0, k : k + 1, :],
        out,
        h=h, spiky=spiky, visc=visc,
        poly6_grad=poly6_grad, poly6_lap=poly6_lap, eps=eps,
    )


def _forces_core(col, row, out, *, h, spiky, visc, poly6_grad, poly6_lap, eps):
    """Layout-agnostic pair tile: ``col(k)`` -> (B, 1) query field,
    ``row(k)`` -> (1, B) candidate field."""
    h2 = h * h

    dx = col(_QX) - row(_CX)  # (B, B)
    dy = col(_QY) - row(_CY)
    dz = col(_QZ) - row(_CZ)
    r2 = dx * dx + dy * dy + dz * dz
    incl_b = r2 < h2  # support cutoff

    # The dilated-AABB candidate test admits corner-touching blocks with
    # no pair actually inside the support radius; skip their ~80% of
    # the tile work.
    @pl.when(jnp.any(incl_b))
    def _():
        incl = incl_b.astype(jnp.float32)
        not_self = incl * (col(_QGID) != row(_CGID)).astype(jnp.float32)

        near0 = r2 < eps * eps
        inv_r = jax.lax.rsqrt(jnp.where(near0, 1.0, r2))
        r = r2 * inv_r
        hr = h - r

        def acc(k, mat):
            out[0, k] += jnp.sum(mat, axis=1, keepdims=True)

        # pressure (Kelager 4.11, forces.cl:69-76)
        p_coeff = (row(_CPM) + col(_QPM)) * not_self
        near0f = near0.astype(jnp.float32)
        spiky_s = (spiky * (1.0 - near0f)) * hr * hr * inv_r
        a_reg = p_coeff * spiky_s
        # coincident-pair singular branch (smoothing.cl:23-25): the
        # constant spiky value lands on every component
        sing = jnp.sum(p_coeff * (spiky * near0f), axis=1, keepdims=True)
        acc(_OPX, a_reg * dx)
        acc(_OPY, a_reg * dy)
        acc(_OPZ, a_reg * dz)
        out[0, _OPX] += sing
        out[0, _OPY] += sing
        out[0, _OPZ] += sing

        # viscosity (forces.cl:78-84); cmr = m/rho_j
        b_mat = (not_self * visc) * row(_CMR) * hr
        acc(_OVX, b_mat * (row(_CVX) - col(_QVX)))
        acc(_OVY, b_mat * (row(_CVY) - col(_QVY)))
        acc(_OVZ, b_mat * (row(_CVZ) - col(_QVZ)))

        # colour field normal + laplacian (forces.cl:87-96), self incl.
        t = h2 - r2
        u = (incl * row(_CMR)) * t
        g_mat = (poly6_grad * u) * t
        acc(_ONX, g_mat * dx)
        acc(_ONY, g_mat * dy)
        acc(_ONZ, g_mat * dz)
        l_mat = (poly6_lap * u) * (3.0 * h2 - 7.0 * r2)
        acc(_OLAP, l_mat)


def _r2_mxu(col, row):
    """Pair r2 in ONE MXU dot: r2 = |q|^2 + |c|^2 - 2 q.c, via the
    augmented product [qx qy qz |q|^2 1] (B, 5) x
    [-2cx; -2cy; -2cz; 1; |c|^2] (5, B). dx/dy/dz never materialise —
    the rowout cores only ever use them through r2. HIGHEST precision
    (6-pass f32 on the bf16 MXU; raw bf16 would truncate coordinates).

    The expansion cancels catastrophically when |q| is large, so pack
    builders subtract the domain centre first (make_* ``center=``);
    with centred coords the absolute r2 error is ~|p|^2 * 6e-8 —
    negligible against h^2 for any domain the 1024-cell Morton guard
    admits. Clamped at 0: coincident pairs may round slightly negative.
    """
    qx, qy, qz = col(0), col(1), col(2)  # (B, 1)
    cx, cy, cz = row(0), row(1), row(2)  # (1, B)
    qn = qx * qx + qy * qy + qz * qz
    lhs = jnp.concatenate(
        [qx, qy, qz, qn, jnp.ones_like(qx)], axis=1
    )  # (B, 5)
    rhs = jnp.concatenate(
        [-2.0 * cx, -2.0 * cy, -2.0 * cz, jnp.ones_like(cx),
         cx * cx + cy * cy + cz * cz], axis=0
    )  # (5, B)
    r2 = jax.lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(r2, 0.0)


def _density_core_rowout(col, row, out, *, h, poly6, r2_mxu=False,
                         hit_slot=None, hit_rows=0, sub=32, hit_groups=1,
                         hit2_h=None, hit2_slot=None, hit2_rows=0,
                         hit2_row0=0):
    """Row-output density tile: the lane reduction is ONE MXU
    dot_general against a ones row and the accumulator is lane-major
    (a (B, 1) column op costs 16 nearly-empty vregs on TPU; a (1, B)
    row op costs one). ``out``: (1, 8, B) ref, row 0 accumulates.
    ``r2_mxu`` moves the pair-distance work onto the MXU too
    (:func:`_r2_mxu`) — same physics to ~1e-6 absolute r2.

    ``hit_slot``: when given (a traced int32 scalar: the first
    candidate-subblock slot this tile covers), emit per-subblock TRUE
    HIT flags — ``any(r2 < h^2)`` over the (Bq, sub) pair panel — into
    out rows 1..hit_rows: the flag for slot j lands at row 1 + j//Bq,
    lane j%Bq (Bq = the query width = out's lane extent). The flags
    feed the force pass's hit-compacted candidate lists
    (engine/step.py): a subblock with no flag has no pair inside the
    support radius, so every force-kernel term it would contribute is
    exactly 0 (all terms carry the hr/t cutoff clamps) — dropping it
    is physics-exact, not an approximation. The B/sub per-quarter ORs
    compress through one 0/1 matmul (counts <= B are exact in bf16)
    and land on their slot lanes with one dynamic roll.

    ``hit_groups``: emit flags at QUERY-SUBGROUP granularity — the
    query block's Bq rows are split into hit_groups runs of Bq/G rows
    and each gets its own flag plane (subgroup g's plane occupies out
    rows 1 + g*hit_rows .. 1 + (g+1)*hit_rows). Measured at 1M, the
    true-hit pair volume at (q32, c32) is 807 slots/particle vs 1677
    at (q128, c32) (experiments/volume_probe.py) — subgroup flags let
    the force pass run at that volume with NO extra refine work. The
    per-subgroup any() compresses through one extra 0/1 matmul
    (selector (G, Bq) @ incl (Bq, Bc): counts <= Bq are exact in the
    MXU's f32 accumulation)."""
    h2 = h * h
    if r2_mxu:
        r2 = _r2_mxu(col, row)
        incl = r2 < h2
    else:
        dx = col(0) - row(0)
        dy = col(1) - row(1)
        dz = col(2) - row(2)
        r2 = dx * dx + dy * dy + dz * dz
        incl = r2 < h2

    @pl.when(jnp.any(incl))
    def _():
        t = jnp.maximum(h2 - r2, 0.0)  # the r<h cutoff clamp
        w = (poly6 * row(3)) * (t * t * t)  # (B, B)
        ones = jnp.ones_like(row(0))
        res = _reduce_dot(
            ones, w, (((1,), (1,)), ((), ())), lhs_exact=True, mode="split3"
        )  # (1, B)
        out[0, 0:1, :] += res

        if hit_slot is not None:
            _emit_hit_flags(
                incl, out, hit_slot, hit_rows, sub, hit_groups, row0=1
            )

    if hit2_h is not None:
        # DILATED per-TILE hit flags (one flag per 128-lane candidate
        # tile per query subgroup) for the Verlet-reuse density gating
        # (fused_density_gated16): flag = any pair within hit2_h. Own
        # gate — tiles with only dilated-shell pairs are skipped by the
        # exact any(incl) gate above but must still flag here.
        incl2 = r2 < hit2_h * hit2_h
        bc = incl.shape[1]

        @pl.when(jnp.any(incl2))
        def _():
            _emit_hit_flags(
                incl2, out, hit2_slot, hit2_rows, bc, hit_groups,
                row0=hit2_row0,
            )


def _emit_hit_flags(incl, out, hit_slot, hit_rows, sub, hit_groups, row0,
                    out_width=None):
    """Compress a (Bq, Bc) pair-inclusion panel to per-(query-subgroup,
    candidate-run-of-``sub``-lanes) hit counters and accumulate them at
    slot ``hit_slot`` of the flag planes in ``out`` rows
    [row0, row0 + hit_groups*hit_rows) (see _density_core_rowout).
    ``out_width``: lane extent of the out rows when it differs from the
    panel's query width (the gated q32 density panels write flags into
    128-lane rows); requires Bc == out_width."""
    bq, bc = incl.shape  # query width, cand lanes
    bq_out = bq if out_width is None else out_width  # out lane extent
    if out_width is not None and bc != out_width:
        raise ValueError("out_width requires Bc == out_width")
    if hit_groups == 1:
        # any over query rows -> (1, Bc) lane vector of pair hits
        hq = jnp.any(incl, axis=0, keepdims=True).astype(jnp.float32)
    else:
        # per-subgroup hit counts: selector (G, Bq) @ incl
        # (Bq, Bc) — 0/1 operands, f32 accumulate: exact
        qg = bq // hit_groups
        g_row = jax.lax.broadcasted_iota(
            jnp.int32, (hit_groups, bq), 0
        )
        g_lane = jax.lax.broadcasted_iota(
            jnp.int32, (hit_groups, bq), 1
        )
        gsel = (g_lane // qg == g_row).astype(jnp.float32)
        hq = jax.lax.dot_general(
            gsel, incl.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, Bc) counts; > 0 iff subgroup g hit lane c
    _emit_hit_flags_from_hq(
        hq, out, hit_slot, hit_rows, sub, hit_groups, row0, bq_out
    )


def _emit_hit_flags_from_hq(hq, out, hit_slot, hit_rows, sub, hit_groups,
                            row0, bq_out):
    """Flag-placement tail of :func:`_emit_hit_flags` from a
    precomputed (hit_groups, Bc) per-subgroup hit-count panel (the
    gated density kernel accumulates hq across its per-subgroup panels
    and emits once per tile)."""
    bc = hq.shape[1]
    group = bc // sub
    lane = jax.lax.broadcasted_iota(jnp.int32, (bc, bc), 0)
    quarter = jax.lax.broadcasted_iota(jnp.int32, (bc, bc), 1)
    s_mat = (lane // sub == quarter).astype(jnp.float32)
    # counts per subblock quarter, landing in lanes 0..group-1
    q4 = jax.lax.dot_general(
        hq, s_mat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (G, group)
    # roll on the full 128-lane row (Mosaic's dynamic rotate
    # requires lane-aligned shapes), then narrow to the out
    # width: q4 is nonzero only in lanes 0..group-1 and the
    # roll amount is <= bq_out - group, so the flags always land
    # inside [0, bq_out) with no wrap
    rolled = pltpu.roll(q4, hit_slot % bq_out, axis=1)[:, :bq_out]
    # subgroup g's plane = rows [g*hit_rows, (g+1)*hit_rows),
    # the slot's row within each plane = hit_slot // bq_out. Built
    # as a static per-group select + concat: pltpu.repeat has
    # TILE semantics ([g0, g1, .., g0, g1, ..]), NOT jnp.repeat
    # element semantics — using it here silently scattered q32
    # flags into the wrong planes whenever the candidate
    # capacity exceeded bq (hit_rows > 1), dropping force pairs
    # with no overflow flag (caught by
    # test_physics.test_q32_forces_wide_capacity).
    row_in_plane = jax.lax.broadcasted_iota(
        jnp.int32, (hit_rows, bq_out), 0
    )
    keep = row_in_plane == hit_slot // bq_out
    planes = [
        jnp.where(keep, rolled[g : g + 1], 0.0)
        for g in range(hit_groups)
    ]
    start = row0
    out[0, start : start + hit_groups * hit_rows, :] += (
        planes[0]
        if hit_groups == 1
        else jnp.concatenate(planes, axis=0)
    )


def _forces_core_rowout(col, row, qrow, out, *, h, spiky, visc, poly6_grad,
                        poly6_lap, eps, r2_mxu=False):
    """Row-output force tile: all ten cross-lane reductions become ONE
    MXU ``dot_general(rhs, lhs)`` whose result is lane-major, so every
    post-dot combine is a cheap (1, B) row op (the direct version's
    reductions + (B, 1) column accumulations cost ~40% of the kernel).

    ``qrow``: (1, F, B) row-layout copy of the query fields (the
    column pack can't provide (1, B) rows without a transpose);
    ``out``: (1, 10, B) row-major accumulator. Physics identical to
    :func:`_forces_core` up to f32 summation order (dot in HIGHEST
    precision).

    ``r2_mxu`` computes r2 on the MXU (:func:`_r2_mxu`). Measured
    SLOWER on v5e (+~30 ms/pass at 1M): the r2 dot contracts only K=5,
    so the 128x128 systolic array runs latency-bound and HIGHEST
    precision multiplies that by 6 — kept as a documented variant.

    Both paths use the op-diet form: ``hrp = max(h-r, 0)`` and
    ``t = max(h2-r2, 0)`` vanish outside the support radius on their
    own, making the explicit incl masks redundant (the reference's
    cutoff factor, smoothing.cl:1-4, is exactly this clamp); and the
    viscosity term drops self-exclusion because a self pair
    contributes v_j - v_i = 0 (forces.cl:78-84)."""
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
        # inv_r doubles as the spiky near-zero guard (smoothing.cl:19):
        # selecting 0 at near0 zeroes spiky_s below (the r->0 splat
        # rides the gated singular branch instead), and r = r2 * inv_r
        # is then 0 there — exactly the reference's r.
        inv_r = jnp.where(near0, 0.0, jax.lax.rsqrt(r2))
        r = r2 * inv_r
        hr = jnp.maximum(h - r, 0.0)
        t = jnp.maximum(h2 - r2, 0.0)
        b_mat = (visc * row(_CMR)) * hr
        u = row(_CMR) * t

        # pressure (Kelager 4.11). Self-exclusion is free on the VPU
        # path: a self pair's query and candidate lanes hold
        # bitwise-identical coordinates, so r2 == 0 exactly -> near0 ->
        # spiky_s = 0, and every other pressure pair is a true i != j
        # pair. (The MXU-r2 variant reconstructs r2 with ~|p|^2 * 6e-8
        # absolute error, which can exceed eps^2 = 1e-14 — it keeps the
        # explicit gid test.)
        p_coeff = row(_CPM) + col(_QPM)
        if r2_mxu:
            p_coeff = p_coeff * (
                col(_QGID) != row(_CGID)
            ).astype(jnp.float32)
        spiky_s = spiky * (hr * hr) * inv_r
        a_reg = p_coeff * spiky_s
        g_mat = (poly6_grad * u) * t
        # 3h^2 - 7r^2 == 7t - 4h^2 inside the support (t = h2 - r2
        # there), and both forms vanish with the u factor outside it,
        # so the laplacian is a 2-op combination of g_mat and u
        l_mat = (7.0 * poly6_lap / poly6_grad) * g_mat - (
            4.0 * h2 * poly6_lap
        ) * u

        b = a_reg.shape[0]
        lhs = jnp.concatenate([a_reg, b_mat, g_mat], axis=0)
        ones = jnp.ones_like(row(_CX))
        # Tile-centred coordinates/velocities: the x_i sum(a) - sum(a x_j)
        # identity below is exact under any shift c, but its FLOAT error
        # scales with |x - c| (the two large terms cancel to an O(h)
        # difference). Centring on the query block's first particle
        # keeps |x - c| at block scale, which the split3 _reduce_dot
        # needs to stay inside the parity budget (uncentred, its 2^-18
        # term error is amplified by |x|/h — measured 5e-3 absolute on
        # accel at domain scale).
        c0 = [qrow[0, k, 0] for k in range(6)]
        rhs = jnp.concatenate(
            [row(_CX) - c0[0], row(_CY) - c0[1], row(_CZ) - c0[2],
             row(_CVX) - c0[3], row(_CVY) - c0[4], row(_CVZ) - c0[5],
             ones], axis=0)  # (7, B)
        res = _reduce_dot(
            rhs, lhs, (((1,), (1,)), ((), ()))
        )  # (7, 3B) lane-major: [sum(M cx), .., sum(M cv), sum(M)]
        ra = res[:, 0:b]
        rb = res[:, b : 2 * b]
        rg = res[:, 2 * b : 3 * b]
        # the colour-field laplacian only needs a plain lane sum (no
        # x_i*sum - sum(x_j) cancellation), so it reduces in one narrow
        # 2-pass split dot instead of riding the 6-pass HIGHEST dot
        sum_l = _reduce_dot(
            ones, l_mat, (((1,), (1,)), ((), ())),
            lhs_exact=True, mode="split3",
        )  # (1, B)
        qx = qrow[0, 0:1] - c0[0]  # (1, B), tile-centred
        qy = qrow[0, 1:2] - c0[1]
        qz = qrow[0, 2:3] - c0[2]
        qvx = qrow[0, 3:4] - c0[3]
        qvy = qrow[0, 4:5] - c0[4]
        qvz = qrow[0, 5:6] - c0[5]
        sum_a, sum_b, sum_g = ra[6:7], rb[6:7], rg[6:7]
        # sum_j a_ij (x_i - x_j) = x_i sum(a) - sum(a x_j)
        out[0, _OPX : _OPX + 1, :] += qx * sum_a - ra[0:1]
        out[0, _OPY : _OPY + 1, :] += qy * sum_a - ra[1:2]
        out[0, _OPZ : _OPZ + 1, :] += qz * sum_a - ra[2:3]
        out[0, _OVX : _OVX + 1, :] += rb[3:4] - qvx * sum_b
        out[0, _OVY : _OVY + 1, :] += rb[4:5] - qvy * sum_b
        out[0, _OVZ : _OVZ + 1, :] += rb[5:6] - qvz * sum_b
        out[0, _ONX : _ONX + 1, :] += qx * sum_g - rg[0:1]
        out[0, _ONY : _ONY + 1, :] += qy * sum_g - rg[1:2]
        out[0, _ONZ : _ONZ + 1, :] += qz * sum_g - rg[2:3]
        out[0, _OLAP : _OLAP + 1, :] += sum_l

        # coincident-pair singular branch (spiky r->0 splat,
        # smoothing.cl:23-25): a DISTINCT pair at r < eps essentially
        # never exists outside degenerate initialisations (self pairs
        # DO hit near0 every tile that contains the query's own
        # subblock, but contribute 0 here) — gate the gid test, the
        # narrow dot and the accumulates behind the cheap any(near0)
        # so the common tile never pays them. The splat lands on every
        # pressure component (smoothing.cl:23-25).
        @pl.when(jnp.any(near0))
        def _():
            not_self = (col(_QGID) != row(_CGID)).astype(jnp.float32)
            sing = (p_coeff * not_self) * (
                spiky * near0.astype(jnp.float32)
            )
            sum_sing = _reduce_dot(
                ones, sing, (((1,), (1,)), ((), ())),
                lhs_exact=True, mode="split3",
            )  # (1, B)
            out[0, _OPX : _OPX + 1, :] += sum_sing
            out[0, _OPY : _OPY + 1, :] += sum_sing
            out[0, _OPZ : _OPZ + 1, :] += sum_sing


def _forces_kernel(
    cand_ref,
    count_ref,
    q,  # (1, 8, Bq, 1)
    *cs_and_out,  # cpg x (1, 9, B) candidate packs + (1, 10, Bq, 1) out
    h: float,
    spiky: float,
    visc: float,
    poly6_grad: float,
    poly6_lap: float,
    eps: float,
    q_div: int = 1,
):
    cs, out = cs_and_out[:-1], cs_and_out[-1]
    i = pl.program_id(0)
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        out[...] = jnp.zeros_like(out)

    for k, c in enumerate(cs):
        slot = m * len(cs) + k

        @pl.when(slot < count_ref[i // q_div])
        def _(c=c):
            _forces_tile(
                q, c, out,
                h=h, spiky=spiky, visc=visc,
                poly6_grad=poly6_grad, poly6_lap=poly6_lap, eps=eps,
            )


def fused_forces(
    planes: PlanePack,
    cand: jnp.ndarray,
    count: jnp.ndarray,
    params: SimulationParameters,
    terms: PrecomputedKernelValues,
    real_flat: jnp.ndarray,
    density: jnp.ndarray,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns the flat (n, 3) acceleration over the sorted order
    (combine step of forces.cl:110-122 applied to the raw sums)."""
    nb, b = planes.c_force.shape[0], planes.c_force.shape[2]
    nb_q, b_q = planes.q_force.shape[0], planes.q_force.shape[2]
    q_div = nb_q // nb
    m = cand.shape[1]
    interpret = _interpret_default() if interpret is None else interpret

    kernel = functools.partial(
        _forces_kernel,
        h=float(params.h),
        spiky=float(terms.spiky),
        visc=float(terms.viscosity),
        poly6_grad=float(terms.poly_6_gradient),
        poly6_lap=float(terms.poly_6_laplacian),
        eps=smoothing.EPSILON,
        q_div=q_div,
    )

    cpg = CANDS_PER_STEP
    mp = -(-m // cpg) * cpg
    if mp != m:
        cand = jnp.concatenate(
            [cand, jnp.zeros((nb, mp - m), cand.dtype)], axis=1
        )
    chunk = max(q_div, _query_chunk(nb_q, mp) // q_div * q_div)

    def run_chunk(args):
        cand_c, count_c, q = args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(chunk, mp // cpg),
            in_specs=[_q_spec(8, b_q)]
            + [
                _c_spec_k(9, b, cpg, k, planes.c_force.shape[0] - 1, q_div)
                for k in range(cpg)
            ],
            out_specs=pl.BlockSpec(
                (1, 10, b_q, 1), lambda i, m_, cand_, count_: (i, 0, 0, 0)
            ),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((chunk, 10, b_q, 1), jnp.float32),
            interpret=interpret,
        )(cand_c, count_c, q, *([planes.c_force] * cpg))

    sums = _chunked_call(run_chunk, chunk, nb_q, q_div, cand, count, planes.q_force)
    # sums: (nb_q, 10, b_q, 1)

    flat = lambda k: sums[:, k].reshape(-1)
    press = jnp.stack([flat(_OPX), flat(_OPY), flat(_OPZ)], axis=1)
    visct = jnp.stack([flat(_OVX), flat(_OVY), flat(_OVZ)], axis=1)
    norm = jnp.stack([flat(_ONX), flat(_ONY), flat(_ONZ)], axis=1)
    lap = flat(_OLAP)

    rho = density
    total = -rho[:, None] * press + visct * params.dynamic_viscosity
    nlen = jnp.linalg.norm(norm, axis=-1, keepdims=True)
    apply_st = nlen > params.surface_tension_threshold
    st = -params.surface_tension * lap[:, None] * norm / jnp.where(apply_st, nlen, 1.0)
    total = total + jnp.where(apply_st, st, 0.0)
    accel = total / rho[:, None] + jnp.asarray(
        params.constant_acceleration, dtype=jnp.float32
    )
    return jnp.where(real_flat[:, None], accel, 0.0)
