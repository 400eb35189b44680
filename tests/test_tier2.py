"""Two-tier candidate-capacity routing (tiles.route_overflow +
engine/step._nl_two_tier_tail): physics equivalence vs a single-tier
run at the full capacity, flag semantics, and the autotune escalation.

Why it exists: gather volume and kernel DMA scale with the STATIC
candidate capacity, so a global capacity regrowth doubles every
block's cost when only the dense tail overflows (the 4M dam-break's
failure mode, BASELINE.md). Routing the heavy rows to a small tier-2
pool keeps the bulk at the base capacity.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libclsph_tpu.engine.step import (
    FLAG_CAPACITY_T2,
    StepConfig,
    substep_jit,
)
from libclsph_tpu.ops import grid as grid_ops
from libclsph_tpu.ops import tiles as tiles_ops

from conftest import WATER, make_params
from test_physics import make_state, random_cloud


def clustered_cloud(rng, params, n, frac=0.2):
    """Random cloud with ``frac`` of the particles packed into a ball
    of radius h: their Morton blocks see far more refined candidate
    subblocks than the rest — a heavy tail like the hydrostatically
    compressed bottom of a tall dam break."""
    pos, vel = random_cloud(rng, params, n)
    k = int(n * frac)
    ball = (rng.random((k, 3)).astype(np.float32) - 0.5) * params.h
    pos[:k] = ball + pos[n - 1]
    return pos, vel


def refined_counts(state, params, max_sub=512):
    """Per-block refined candidate counts via the production pipeline
    (mirrors engine/step._density_forces_pallas_nl's prologue)."""
    from libclsph_tpu.ops.pallas import neighbor_nl as nl

    grid = grid_ops.compute_bounds(state.position, params)
    codes = grid_ops.locate_in_grid(state.position, grid)
    state, _, _ = grid_ops.sort_by_cell(state, codes)
    n = state.position.shape[0]
    real = jnp.ones((n,), bool)
    blocked = tiles_ops.make_blocked(
        state.position, state.velocity, state.density, state.pressure,
        real, 128,
    )
    bmin, bmax = tiles_ops.split_block_bounds(blocked.position, blocked.real)
    cand, count, ovf = tiles_ops.candidate_blocks(bmin, bmax, params.h, 128)
    assert not bool(ovf)
    sub = 128 // nl.SUB
    nb = blocked.position.shape[0]
    self_lo = jnp.arange(nb, dtype=jnp.int32) * sub
    _, count_sub, ovf2 = tiles_ops.refine_candidates_exact(
        cand, count, bmin, bmax, blocked.position, params.h, sub, max_sub,
        self_lo=self_lo, self_width=sub,
    )
    assert not bool(ovf2)
    return np.asarray(count_sub)


def test_route_overflow_unit():
    count = jnp.asarray([3, 50, 7, 90, 2, 60, 1, 4], jnp.int32)
    idx, used, count1, pool_ovf = tiles_ops.route_overflow(count, 10, 4)
    idx, used, count1 = map(np.asarray, (idx, used, count1))
    # the three heavy rows occupy the first pool slots, heaviest first
    assert list(idx[:3]) == [3, 5, 1]
    assert list(used) == [True, True, True, False]
    np.testing.assert_array_equal(count1, [3, 0, 7, 0, 2, 0, 1, 4])
    assert not bool(pool_ovf)
    # pool smaller than the heavy set -> overflow flagged
    _, _, _, pool_ovf = tiles_ops.route_overflow(count, 10, 2)
    assert bool(pool_ovf)


@pytest.mark.parametrize(
    "force_query_rows,force_sub16,density_sub16",
    [(128, False, False), (32, False, False), (32, True, False),
     (32, True, True)],
    ids=["q128", "q32", "q32-c16", "c16-all"],
)
def test_tier2_matches_single_tier(
    rng, force_query_rows, force_sub16, density_sub16
):
    """A two-tier run (small base cap + routed heavy tail) reproduces
    the single-tier run at the full capacity bit-for-bit: both tiers
    execute the identical kernels over identical sorted candidate
    lists — the routing only changes WHICH dispatch a block's
    accumulation happens in. The q32-c16 case additionally covers the
    16-wide tier-1 force path (hit_sub=16 flags + make_c16_pack); the
    c16-all case is the r4 unified scale config where BOTH tiers run
    the fully 16-granular kernels (density_sub16 + tier2)."""
    n = 4096
    params = make_params(WATER, n=n)
    pos, vel = clustered_cloud(rng, params, n)
    state = make_state(pos, vel)

    counts = refined_counts(make_state(pos, vel), params)
    if density_sub16:
        # the c16 refine runs at sub=8 per block: 16-wide subblock
        # counts are ~2x the 32-wide ones
        counts = counts * 2
    c_max = int(counts.max())
    # base cap below the heavy rows but above the light median
    c1 = max(32, int(np.median(counts)) + 8)
    assert (counts > c1).any(), "test cloud produced no heavy blocks"
    assert (counts <= c1).sum() > len(counts) // 2, "cloud too uniform"
    mult = 2
    while c1 * mult < c_max:
        mult *= 2

    base = dict(
        neighbor_impl="pallas", pallas_variant="nl", adaptive_dt=False,
        max_candidates_hit=2 * c1, force_query_rows=force_query_rows,
        force_sub16=force_sub16, density_sub16=density_sub16,
        max_candidates_hit16=4 * c1,
    )
    s1, _, f1 = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(max_candidates_sub=c1 * mult, **base),
    )
    s2, _, f2 = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(
            max_candidates_sub=c1, tier2_frac=4, tier2_mult=mult, **base
        ),
    )
    assert not bool(f1) and not bool(f2)
    np.testing.assert_array_equal(
        np.asarray(s1.density), np.asarray(s2.density)
    )
    a1, a2 = np.asarray(s1.acceleration), np.asarray(s2.acceleration)
    np.testing.assert_allclose(a1, a2, atol=1e-5 * np.abs(a1).max())


def test_tier2_pool_overflow_flag(rng):
    """More heavy rows than tier-2 slots -> FLAG_CAPACITY_T2 (the
    engine responds by halving tier2_frac)."""
    n = 4096
    params = make_params(WATER, n=n)
    pos, vel = clustered_cloud(rng, params, n, frac=0.5)
    state = make_state(pos, vel)
    counts = refined_counts(make_state(pos, vel), params)
    c1 = max(32, int(np.median(counts)))
    heavy = int((counts > c1).sum())
    assert heavy >= 2
    nb = len(counts)
    cfg = StepConfig(
        neighbor_impl="pallas", pallas_variant="nl", adaptive_dt=False,
        max_candidates_sub=c1, max_candidates_hit=2 * c1,
        tier2_frac=nb,  # nb2 == 1 slot
        tier2_mult=16,
    )
    _, _, flags = substep_jit(state, jnp.float32(1e-9), params, None, cfg)
    assert int(flags) & FLAG_CAPACITY_T2


def test_autotune_escalation():
    """The engine's capacity autotune enables tier-2 routing on the
    first subblock overflow, grows the multiplier on the next, and
    halves the pool fraction on pool exhaustion."""
    from libclsph_tpu.engine.step import (
        FLAG_CAPACITY_SUB,
    )
    from test_engine import make_sim

    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as td:
        sim = make_sim(pathlib.Path(td), n=512, sim_time=0.017)
        sim.step_config = StepConfig(
            neighbor_impl="pallas", pallas_variant="nl",
            max_candidates_sub=32,
        )
        sim._grow_capacity(FLAG_CAPACITY_SUB)
        assert sim.step_config.tier2_frac == 8
        assert sim.step_config.max_candidates_sub == 32  # NOT doubled
        sim._grow_capacity(FLAG_CAPACITY_SUB)
        assert sim.step_config.tier2_mult == 4
        sim._grow_capacity(FLAG_CAPACITY_T2)
        assert sim.step_config.tier2_frac == 4


def test_hit16_overflow_downgrades_to_q_granular():
    """A 16-granular hit-table overflow is the deep-column signature
    where the c16 kernels were measured to lose to the q-granular
    scale config (river 25.5 vs 5.80 s/frame, r4_deliver.log): the
    autotune must flip force/density_sub16 OFF instead of doubling
    hit16 globally (+22 ms/substep of dead-capacity streaming at
    1M-cube, r4_results.jsonl hit16cap128). A further overflow on the
    q path then grows max_candidates_hit as before."""
    from libclsph_tpu.engine.step import FLAG_CAPACITY_HIT
    from test_engine import make_sim

    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as td:
        sim = make_sim(pathlib.Path(td), n=512, sim_time=0.017)
        sim.step_config = StepConfig(
            neighbor_impl="pallas", pallas_variant="nl",
            force_query_rows=32, force_sub16=True, density_sub16=True,
            max_candidates_hit16=64,
        )
        sim._grow_capacity(FLAG_CAPACITY_HIT)
        cfg = sim.step_config
        assert not cfg.force_sub16 and not cfg.density_sub16
        assert cfg.max_candidates_hit16 == 64  # NOT doubled
        assert cfg.max_candidates_hit == 96
        sim._grow_capacity(FLAG_CAPACITY_HIT)
        assert sim.step_config.max_candidates_hit == 192
