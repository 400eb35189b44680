"""Density / pressure / force passes vs the independent NumPy oracle,
for both neighbour backends, plus physical invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libclsph_tpu.core.state import ParticleState
from libclsph_tpu.engine.step import StepConfig, substep_jit
from libclsph_tpu.ops import grid as grid_ops
from libclsph_tpu.ops import integrate as integrate_ops

from conftest import WATER, MUCUS, make_params
import oracle


def random_cloud(rng, params, n, spread=2.0):
    """A random blob scaled so particles have O(n_neighbors) neighbours."""
    side = (params.initial_volume) ** (1 / 3) * spread
    pos = (rng.random((n, 3)) - 0.5) * side
    vel = (rng.random((n, 3)) - 0.5) * 2.0
    return pos.astype(np.float32), vel.astype(np.float32)


def make_state(pos, vel):
    n = pos.shape[0]
    return ParticleState(
        position=jnp.asarray(pos),
        velocity=jnp.asarray(vel),
        intermediate_velocity=jnp.asarray(vel),
        acceleration=jnp.zeros((n, 3), jnp.float32),
        density=jnp.zeros((n,), jnp.float32),
        pressure=jnp.zeros((n,), jnp.float32),
        grid_index=jnp.zeros((n,), jnp.uint32),
    )


def run_density_forces(state, params, impl):
    """Drive one substep with dt tiny and adaptive off; recover the
    density/pressure/accel the pass computed."""
    cfg = StepConfig(neighbor_impl=impl, adaptive_dt=False)
    out, _, overflow = substep_jit(state, jnp.float32(1e-9), params, None, cfg)
    assert not bool(overflow), "neighbour capacity overflow in test setup"
    return out


def match_order(pos):
    """Permutation that orders rows by (quantized) position.

    Quantising before lexsort keeps tie-breaking stable between the
    pre-step positions and positions advected by the 1e-9 dummy dt
    (which can turn an exact 0.0 into -1e-24 and flip sort order).
    """
    import numpy as _np

    q = _np.round(_np.asarray(pos, dtype=_np.float64), 6)
    return _np.lexsort(q.T)


def oracle_density_forces(pos, vel, params):
    rho, p = oracle.density_pressure(
        pos.astype(np.float64),
        params.particle_mass,
        params.h,
        params.fluid_density,
        params.K,
    )
    acc = oracle.accelerations(
        pos.astype(np.float64),
        vel.astype(np.float64),
        rho,
        p,
        params.particle_mass,
        params.h,
        params.dynamic_viscosity,
        params.surface_tension,
        params.surface_tension_threshold,
        np.asarray(params.constant_acceleration),
    )
    return rho, p, acc


@pytest.mark.parametrize("impl", ["exact", "tiles"])
@pytest.mark.parametrize("fluid", [WATER, MUCUS])
def test_density_forces_match_oracle(rng, impl, fluid):
    params = make_params(fluid, n=300)
    pos, vel = random_cloud(rng, params, 300)
    state = make_state(pos, vel)

    out = run_density_forces(state, params, impl)
    rho_o, p_o, acc_o = oracle_density_forces(pos, vel, params)

    # substep sorted the particles — match rows via position ordering
    order_sim = match_order(out.position)
    # positions moved by <= |v|*1e-9; sort original positions identically
    order_ref = match_order(pos)

    rho_sim = np.asarray(out.density)[order_sim]
    rho_ref = rho_o[order_ref]
    rms = np.sqrt(np.mean((rho_sim - rho_ref) ** 2)) / np.mean(rho_ref)
    assert rms < 1e-4, f"density RMS err {rms}"

    p_sim = np.asarray(out.pressure)[order_sim]
    np.testing.assert_allclose(p_sim, p_o[order_ref], rtol=5e-3, atol=1e-3)

    acc_sim = np.asarray(out.acceleration)[order_sim]
    acc_ref = acc_o[order_ref]
    scale = np.abs(acc_ref).max()
    np.testing.assert_allclose(acc_sim, acc_ref, atol=2e-3 * scale)


@pytest.mark.parametrize("impl", ["exact", "tiles"])
def test_lattice_density_forces_match_oracle(impl):
    # The structured (degenerate-geometry) case: the init lattice, with
    # many exactly-equal distances and particles on cell boundaries.
    params = make_params(WATER, n=216)
    from libclsph_tpu.core.state import init_state

    state = init_state(params)
    pos = np.asarray(state.position)
    vel = np.zeros_like(pos)

    out = run_density_forces(state, params, impl)
    rho_o, p_o, acc_o = oracle_density_forces(pos, vel, params)

    order_sim = match_order(out.position)
    order_ref = match_order(pos)
    rho_sim = np.asarray(out.density)[order_sim]
    rho_ref = rho_o[order_ref]
    rms = np.sqrt(np.mean((rho_sim - rho_ref) ** 2)) / np.mean(rho_ref)
    assert rms < 1e-4


def test_exact_vs_tiles_identical(rng):
    params = make_params(WATER, n=2000)
    pos, vel = random_cloud(rng, params, 2000)
    state = make_state(pos, vel)
    out_e = run_density_forces(state, params, "exact")
    out_t = run_density_forces(state, params, "tiles")
    order_e = match_order(out_e.position)
    order_t = match_order(out_t.position)
    np.testing.assert_allclose(
        np.asarray(out_e.density)[order_e],
        np.asarray(out_t.density)[order_t],
        rtol=2e-6,
    )
    acc_e = np.asarray(out_e.acceleration)[order_e]
    acc_t = np.asarray(out_t.acceleration)[order_t]
    scale = np.abs(acc_e).max()
    np.testing.assert_allclose(acc_e, acc_t, atol=1e-5 * scale)


class TestGrid:
    def test_sorted_cell_ranges_cover_all(self, rng, water_params):
        pos = (rng.random((500, 3)).astype(np.float32) - 0.5) * 3
        grid = grid_ops.compute_bounds(jnp.asarray(pos), water_params)
        codes = grid_ops.locate_in_grid(jnp.asarray(pos), grid)
        sorted_codes = jnp.sort(codes)
        start, end = grid_ops.cell_ranges(sorted_codes, sorted_codes)
        counts = np.asarray(end - start)
        # every particle's own cell range contains it
        assert (counts >= 1).all()
        # total unique coverage equals N
        u, c = np.unique(np.asarray(sorted_codes), return_counts=True)
        s2, e2 = grid_ops.cell_ranges(sorted_codes, jnp.asarray(u))
        np.testing.assert_array_equal(np.asarray(e2 - s2), c)

    def test_bounds_padding(self, water_params):
        pos = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]], jnp.float32)
        g = grid_ops.compute_bounds(pos, water_params)
        cell = water_params.cell_side
        np.testing.assert_allclose(
            np.asarray(g.min_point), [0 - 2 * cell, 0 - 2 * cell, 0 - 2 * cell],
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(g.max_point), [1 + 2 * cell, 2 + 2 * cell, 3 + 2 * cell],
            rtol=1e-6,
        )
        # particles never land in coord 0 cells (reference relies on this)
        codes = grid_ops.locate_in_grid(pos, g)
        from libclsph_tpu.core import morton

        x, y, z = morton.decode(codes)
        assert (np.asarray(x) >= 1).all()


class TestIntegrate:
    def test_leapfrog_matches_oracle(self, rng):
        pos = rng.random((10, 3))
        vin = rng.random((10, 3))
        acc = rng.random((10, 3))
        dt = 0.01
        adv = integrate_ops.advect(
            jnp.asarray(pos, jnp.float32),
            jnp.asarray(vin, jnp.float32),
            jnp.asarray(acc, jnp.float32),
            jnp.float32(dt),
        )
        vel, inter = integrate_ops.reconstruct_velocities(
            jnp.asarray(vin, jnp.float32), adv.next_velocity
        )
        o_pos, o_vel, o_next = oracle.leapfrog(pos, vin, acc, dt)
        np.testing.assert_allclose(np.asarray(adv.new_position), o_pos, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(vel), o_vel, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(inter), o_next, rtol=1e-5)

    def test_time_step_matches_oracle(self, rng, water_params):
        vel = rng.random((50, 3)) * 3
        acc = rng.random((50, 3)) * 20
        dt = integrate_ops.compute_time_step(
            jnp.asarray(vel, jnp.float32),
            jnp.asarray(acc, jnp.float32),
            water_params,
        )
        o = oracle.time_step(
            vel, acc, water_params.h, integrate_ops.DT_MIN, water_params.max_dt
        )
        assert float(dt) == pytest.approx(o, rel=1e-4)

    def test_time_step_clamps(self, water_params):
        # huge accel -> floor; zero accel/vel -> ceiling
        dt_lo = integrate_ops.compute_time_step(
            jnp.zeros((1, 3)), jnp.full((1, 3), 1e12), water_params
        )
        assert float(dt_lo) == pytest.approx(integrate_ops.DT_MIN)
        dt_hi = integrate_ops.compute_time_step(
            jnp.zeros((1, 3)), jnp.zeros((1, 3)), water_params
        )
        assert float(dt_hi) == pytest.approx(water_params.max_dt)


class TestInvariants:
    def test_momentum_conservation_no_gravity(self, rng):
        """Pressure+viscosity are antisymmetric pairwise: with gravity
        and surface tension off, total momentum change is ~0."""
        params = make_params(
            dict(WATER, surface_tension=0.0),
            n=500,
            constant_acceleration=dict(x=0, y=0, z=0),
        )
        pos, vel = random_cloud(rng, params, 500)
        state = make_state(pos, vel)
        out = run_density_forces(state, params, "tiles")
        acc = np.asarray(out.acceleration, dtype=np.float64)
        rho = np.asarray(out.density, dtype=np.float64)
        # force_i = m * acc_i (equal masses): sum of forces ~ 0
        total_f = (acc * params.particle_mass).sum(axis=0)
        scale = np.abs(acc * params.particle_mass).sum(axis=0).max()
        assert np.abs(total_f).max() < 1e-3 * scale

    def test_rest_density_near_reference(self):
        """A big uniform lattice interior should sit near rho0 by
        construction of h (n_neighbors inside the support radius)."""
        params = make_params(WATER, n=4096)
        from libclsph_tpu.core.state import init_state

        state = init_state(params)
        out = run_density_forces(state, params, "tiles")
        rho = np.asarray(out.density)
        # interior particles: top quartile of density
        interior = np.quantile(rho, 0.9)
        assert 0.5 * params.fluid_density < interior < 1.5 * params.fluid_density


class TestHierarchicalCandidates:
    def test_matches_dense(self, rng):
        """Two-level candidate search covers the dense search's
        candidate sets. Since its level 2 tests member-UNION boxes
        (the flat 128-lane refine pack holds one lo/hi per member
        block, not the 4 split boxes), it may add a few conservative
        extras — supersets never change the physics (kernel cutoffs
        zero them, and the subblock refine stage prunes most before
        the kernels); the inflation must stay small."""
        from libclsph_tpu.ops import tiles as T
        from libclsph_tpu.core.state import init_state

        params = make_params(WATER, n=64 * 64)
        state = init_state(params)
        # jiggle so blocks aren't degenerate
        pos = np.asarray(state.position) + rng.normal(0, 1e-3, (params.particles_count, 3)).astype(np.float32)
        grid = grid_ops.compute_bounds(jnp.asarray(pos), params)
        codes = grid_ops.locate_in_grid(jnp.asarray(pos), grid)
        order = np.argsort(np.asarray(codes), kind="stable")
        pos_sorted = jnp.asarray(pos[order])

        blocked_pos = pos_sorted.reshape(-1, 64, 3)
        real = jnp.ones(blocked_pos.shape[:2], bool)
        bmin, bmax = T.split_block_bounds(blocked_pos, real)

        cand_d, count_d, ovf_d = T.candidate_blocks(bmin, bmax, params.h, 512)
        cand_h, count_h, ovf_h = T.candidate_blocks_hierarchical(
            bmin, bmax, params.h, 512, super_cand=64
        )
        assert not bool(ovf_d) and not bool(ovf_h)
        nb = bmin.shape[0]
        extras = 0
        for i in range(nb):
            sd = set(np.asarray(cand_d[i, : int(count_d[i])]).tolist())
            sh = set(np.asarray(cand_h[i, : int(count_h[i])]).tolist())
            assert sd <= sh, (i, sd - sh)  # never misses a candidate
            extras += len(sh - sd)
        assert extras <= 0.3 * int(np.sum(np.asarray(count_d))), extras


class TestDiagnostics:
    def test_neighbor_stats(self, rng):
        from libclsph_tpu.utils.diagnostics import neighbor_stats, density_summary

        params = make_params(WATER, n=1000)
        pos = (rng.random((1000, 3)).astype(np.float32) - 0.5) * 0.5
        stats = neighbor_stats(jnp.asarray(pos), params, block_size=64)
        assert int(stats.count_max) >= 1
        assert float(stats.count_mean) <= float(stats.count_max)
        assert not bool(stats.overflowed)
        assert int(stats.occupancy_max) >= 1

        s = density_summary(np.full(100, 998.0, np.float32), params)
        assert s["frac_within_10pct_rest"] == 1.0
        assert not s["any_nonfinite"]


@pytest.mark.parametrize(
    "variant,q_rows,pair_r2",
    [("row", 128, "vpu"), ("asym", 128, "vpu"),
     ("nl", 128, "vpu"), ("nl", 64, "vpu"), ("nl", 32, "vpu"),
     ("asm", 128, "vpu"), ("asm", 32, "vpu"),
     # MXU-r2 path: r2 rounds at ~|p|^2*6e-8 absolute, so densities
     # land within the framework's 1e-4 physics-fidelity target rather
     # than the vpu path's 1e-5 (BASELINE.md fidelity row)
     ("nl", 128, "mxu"), ("nl", 32, "mxu"), ("asm", 128, "mxu")],
)
def test_pallas_variants_match_tiles(rng, variant, q_rows, pair_r2):
    params = make_params(WATER, n=1024)
    pos, vel = random_cloud(rng, params, 1024)
    state = make_state(pos, vel)
    cfg_t = StepConfig(neighbor_impl="tiles", adaptive_dt=False)
    st, _, _ = substep_jit(state, jnp.float32(1e-9), params, None, cfg_t)
    cfg_p = StepConfig(
        neighbor_impl="pallas", pallas_variant=variant,
        nl_query_rows=q_rows, pair_r2=pair_r2, adaptive_dt=False
    )
    sp, _, ovf = substep_jit(state, jnp.float32(1e-9), params, None, cfg_p)
    assert not bool(ovf)
    rho_rtol = 1e-5 if pair_r2 == "vpu" else 2e-4
    acc_atol = 1e-4 if pair_r2 == "vpu" else 5e-4
    np.testing.assert_allclose(
        np.asarray(st.density), np.asarray(sp.density), rtol=rho_rtol
    )
    a1, a2 = np.asarray(st.acceleration), np.asarray(sp.acceleration)
    np.testing.assert_allclose(a1, a2, atol=acc_atol * np.abs(a1).max())


@pytest.mark.parametrize("variant", ["nl", "asm"])
@pytest.mark.parametrize("q_rows", [128, 64])
def test_hit_compaction_matches_full(rng, variant, q_rows):
    """The force pass on hit-compacted candidate lists reproduces the
    full-list pass: a no-hit subblock (no pair within the support
    radius) contributes exactly 0 to every force term, so dropping it
    only changes f32 summation order."""
    params = make_params(WATER, n=2048)
    pos, vel = random_cloud(rng, params, 2048)
    state = make_state(pos, vel)
    base = dict(
        neighbor_impl="pallas", pallas_variant=variant,
        nl_query_rows=q_rows, adaptive_dt=False,
    )
    s_full, _, _ = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(hit_compact=False, **base),
    )
    s_hit, _, ovf = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(hit_compact=True, **base),
    )
    assert not bool(ovf)
    # density is computed before compaction — identical bits
    np.testing.assert_array_equal(
        np.asarray(s_full.density), np.asarray(s_hit.density)
    )
    a1, a2 = np.asarray(s_full.acceleration), np.asarray(s_hit.acceleration)
    np.testing.assert_allclose(a1, a2, atol=1e-5 * np.abs(a1).max())


def test_hit_flags_semantics(rng):
    """The density kernel's TRUE-HIT flags equal a brute-force pair
    test: slot j of query block i flags iff subblock cand_sub[i, j]
    has >= 1 particle within h of some particle of block i."""
    from libclsph_tpu.core.state import ParticleState as _PS
    from libclsph_tpu.ops import tiles as tiles_ops
    from libclsph_tpu.ops.pallas import neighbor_nl as nl

    n = 1024
    params = make_params(WATER, n=n)
    pos, vel = random_cloud(rng, params, n)
    state = make_state(pos, vel)
    grid = grid_ops.compute_bounds(state.position, params)
    codes = grid_ops.locate_in_grid(state.position, grid)
    state, _, _ = grid_ops.sort_by_cell(state, codes)
    real = jnp.ones((n,), bool)
    B = 128
    blocked = tiles_ops.make_blocked(
        state.position, state.velocity, state.density, state.pressure, real, B
    )
    bmin, bmax = tiles_ops.split_block_bounds(blocked.position, blocked.real)
    cand, count, _ = tiles_ops.candidate_blocks(bmin, bmax, params.h, 64)
    sub = B // nl.SUB
    cand_sub, count_sub, _ = tiles_ops.refine_candidates_exact(
        cand, count, bmin, bmax, blocked.position, params.h, sub, 96
    )
    terms = params.precomputed()
    q_pos, _ = nl.make_query_planes(
        state.position, state.velocity, state.density, state.pressure,
        real, B, mass=params.particle_mass,
    )
    c_pos, _ = nl.make_csub_packs(
        state.position, state.velocity, state.density, state.pressure,
        real, mass=params.particle_mass,
    )
    _, hits = nl.fused_density_nl(
        q_pos, c_pos, cand_sub, count_sub, params, terms, real,
        want_hits=True,
    )
    hits = np.asarray(hits)
    p = np.asarray(state.position).reshape(-1, B, 3)
    psub = np.asarray(state.position).reshape(-1, nl.SUB, 3)
    cs, cn = np.asarray(cand_sub), np.asarray(count_sub)
    h2 = params.h * params.h
    for i in range(cs.shape[0]):
        for j in range(cs.shape[1]):
            sid = cs[i, j]
            if j >= cn[i] or sid >= psub.shape[0]:
                assert hits[i, j] == 0.0, (i, j)
                continue
            d2 = ((p[i][:, None, :] - psub[sid][None, :, :]) ** 2).sum(-1)
            assert (hits[i, j] > 0) == bool((d2 < h2).any()), (i, j)

    # compact_hits keeps exactly the flagged slots and reports overflow
    # (compare as sorted sets: the scatter compaction impl is live-first
    # but not ascending — see tiles._self_priority_sort)
    ch, cnh, ovf = tiles_ops.compact_hits(cand_sub, jnp.asarray(hits), 96)
    want = np.sort(np.where(hits > 0, cs, tiles_ops.REFINE_SENTINEL), axis=1)
    np.testing.assert_array_equal(np.sort(np.asarray(ch), axis=1), want[:, :96])
    np.testing.assert_array_equal(np.asarray(cnh), (hits > 0).sum(1))
    assert not bool(ovf)
    tiny_cap = max(1, int((hits > 0).sum(1).max()) - 1)
    _, _, ovf2 = tiles_ops.compact_hits(cand_sub, jnp.asarray(hits), tiny_cap)
    assert bool(ovf2)


def test_force_q32_matches_q128(rng):
    """The q32 force pass (per-query-subgroup hit lists + (32, 128)
    pair panels, neighbor_nl.fused_forces_nl32) reproduces the
    whole-block force pass up to f32 summation order."""
    params = make_params(WATER, n=2048)
    pos, vel = random_cloud(rng, params, 2048)
    state = make_state(pos, vel)
    base = dict(
        neighbor_impl="pallas", pallas_variant="nl", adaptive_dt=False,
        max_candidates_sub=96, max_candidates_hit=64,
    )
    s128, _, _ = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(force_query_rows=128, **base),
    )
    s32, _, ovf = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(force_query_rows=32, **base),
    )
    assert not bool(ovf)
    np.testing.assert_array_equal(
        np.asarray(s128.density), np.asarray(s32.density)
    )
    a1 = np.asarray(s128.acceleration)
    a2 = np.asarray(s32.acceleration)
    np.testing.assert_allclose(a1, a2, atol=1e-5 * np.abs(a1).max())


def test_force_sub16_matches_q128(rng):
    """The 16-wide q32 force pass (hit_sub=16 flags + 16-particle
    candidate rows, neighbor_nl.fused_forces_nl32_c16) reproduces the
    whole-block force pass up to f32 summation order."""
    params = make_params(WATER, n=2048)
    pos, vel = random_cloud(rng, params, 2048)
    state = make_state(pos, vel)
    base = dict(
        neighbor_impl="pallas", pallas_variant="nl", adaptive_dt=False,
        max_candidates_sub=96, max_candidates_hit=64,
    )
    s128, _, f128 = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(force_query_rows=128, **base),
    )
    s16, _, f16 = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(force_query_rows=32, force_sub16=True, **base),
    )
    assert not bool(f128) and not bool(f16)
    np.testing.assert_array_equal(
        np.asarray(s128.density), np.asarray(s16.density)
    )
    a1 = np.asarray(s128.acceleration)
    a2 = np.asarray(s16.acceleration)
    np.testing.assert_allclose(a1, a2, atol=1e-5 * np.abs(a1).max())


def test_density_sub16_matches_q128(rng):
    """The full-c16 path (density_sub16: 16-granular refine ids, c16
    pos pack + c16 density kernel, slot-aligned hit flags, c16 force)
    reproduces the q128/c32 production physics."""
    params = make_params(WATER, n=2048)
    pos, vel = random_cloud(rng, params, 2048)
    state = make_state(pos, vel)
    base = dict(
        neighbor_impl="pallas", pallas_variant="nl", adaptive_dt=False,
    )
    s128, _, f128 = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(max_candidates_sub=96, max_candidates_hit=64, **base),
    )
    s16, _, f16 = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(
            max_candidates_sub=144, force_query_rows=32, force_sub16=True,
            density_sub16=True, **base,
        ),
    )
    assert not bool(f128) and not bool(f16)
    d1 = np.asarray(s128.density)
    d2 = np.asarray(s16.density)
    # the c16 density kernel sums the same pairs in a different tile
    # order -> f32 summation-order tolerance (not bitwise)
    np.testing.assert_allclose(d1, d2, rtol=1e-6)
    a1 = np.asarray(s128.acceleration)
    a2 = np.asarray(s16.acceleration)
    np.testing.assert_allclose(a1, a2, atol=1e-5 * np.abs(a1).max())


def test_force_sub8_matches_q128(rng):
    """The 8-wide q32 force pass (hit_sub=8 flags, paired 8-particle
    candidate rows + 15-round in-register transpose,
    neighbor_nl.fused_forces_nl32_c8) reproduces the whole-block force
    pass up to f32 summation order."""
    params = make_params(WATER, n=2048)
    pos, vel = random_cloud(rng, params, 2048)
    state = make_state(pos, vel)
    base = dict(
        neighbor_impl="pallas", pallas_variant="nl", adaptive_dt=False,
    )
    s128, _, f128 = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(max_candidates_sub=96, max_candidates_hit=64, **base),
    )
    s8, _, f8 = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(
            max_candidates_sub=144, force_query_rows=32, force_sub16=True,
            density_sub16=True, force_sub8=True, max_candidates_hit8=96,
            **base,
        ),
    )
    assert not bool(f128) and not bool(f8)
    np.testing.assert_allclose(
        np.asarray(s128.density), np.asarray(s8.density), rtol=1e-6
    )
    a1 = np.asarray(s128.acceleration)
    a2 = np.asarray(s8.acceleration)
    np.testing.assert_allclose(a1, a2, atol=1e-5 * np.abs(a1).max())


def test_force_sub8_tier2_matches_plain(rng):
    """sub-8 under two-tier routing (both tiers on the c8 kernels)
    reproduces the plain sub-8 pass."""
    params = make_params(WATER, n=2048)
    pos, vel = random_cloud(rng, params, 2048)
    state = make_state(pos, vel)
    base = dict(
        neighbor_impl="pallas", pallas_variant="nl", adaptive_dt=False,
        force_query_rows=32, force_sub16=True, density_sub16=True,
        force_sub8=True, max_candidates_hit8=96,
    )
    s1, _, f1 = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(max_candidates_sub=144, **base),
    )
    s2, _, f2 = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(max_candidates_sub=96, tier2_frac=4, **base),
    )
    assert not bool(f1) and not bool(f2)
    np.testing.assert_allclose(
        np.asarray(s1.density), np.asarray(s2.density), rtol=1e-6
    )
    a1 = np.asarray(s1.acceleration)
    a2 = np.asarray(s2.acceleration)
    np.testing.assert_allclose(a1, a2, atol=1e-5 * np.abs(a1).max())


def test_force_sub8_invalid_configs():
    """force_sub8 outside its supported shape must raise, not silently
    fall back."""
    params = make_params(WATER, n=512)
    state = make_state(
        np.zeros((512, 3), np.float32), np.zeros((512, 3), np.float32)
    )
    for bad, msg in [
        (dict(), "force_sub8"),  # needs density_sub16
        (
            dict(
                force_query_rows=32, force_sub16=True, density_sub16=True,
                density_gate=True, cand_interval=2,
            ),
            "force_sub8",
        ),
    ]:
        cfg = StepConfig(
            neighbor_impl="pallas", pallas_variant="nl", adaptive_dt=False,
            force_sub8=True, **bad,
        )
        with pytest.raises(ValueError, match=msg):
            substep_jit(state, jnp.float32(1e-9), params, None, cfg)


def test_density_sub16_invalid_configs():
    """density_sub16 outside its supported shape must raise, not
    silently fall back (config-divergence guard)."""
    params = make_params(WATER, n=512)
    state = make_state(
        np.zeros((512, 3), np.float32), np.zeros((512, 3), np.float32)
    )
    for bad in [
        dict(force_query_rows=128),  # needs the q32 c16 force kernel
        dict(force_query_rows=32, tier2_frac=8),  # t2 panels are 32-wide
        dict(force_query_rows=32, force_sub16=False),
    ]:
        cfg = StepConfig(
            neighbor_impl="pallas", pallas_variant="nl", adaptive_dt=False,
            density_sub16=True,
            **{"force_sub16": True, **bad},
        )
        with pytest.raises(ValueError, match="density_sub16"):
            substep_jit(state, jnp.float32(1e-9), params, None, cfg)


def test_force_sub16_capacity_overflow_flags(rng):
    """A too-small max_candidates_hit16 must raise FLAG_CAPACITY_HIT
    (the engine then doubles hit16, not hit) — truncation is never
    silent."""
    from test_tier2 import clustered_cloud
    from libclsph_tpu.engine.step import FLAG_CAPACITY_HIT

    params = make_params(WATER, n=2048)
    pos, vel = clustered_cloud(rng, params, 2048)
    state = make_state(pos, vel)
    _, _, flags = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(
            neighbor_impl="pallas", pallas_variant="nl", adaptive_dt=False,
            max_candidates_sub=192, max_candidates_hit=192,
            force_query_rows=32, force_sub16=True, max_candidates_hit16=32,
        ),
    )
    assert int(flags) & FLAG_CAPACITY_HIT


def test_q32_forces_wide_capacity(rng):
    """q32 vs q128 forces at max_candidates_sub > 128 — the hit-flag
    planes then span hit_rows=2 output rows per subgroup, a layout the
    kernel must build with element-repeat semantics: pltpu.repeat's
    TILE semantics silently scattered subgroup flags into the wrong
    planes (dropping force pairs with NO overflow flag) whenever the
    capacity exceeded the 128-lane query width, e.g. after a capacity
    autotune regrowth (neighbor._density_core_rowout)."""
    from test_tier2 import clustered_cloud

    params = make_params(WATER, n=2048)
    pos, vel = clustered_cloud(rng, params, 2048)
    state = make_state(pos, vel)
    base = dict(
        neighbor_impl="pallas", pallas_variant="nl", adaptive_dt=False,
        max_candidates_sub=192, max_candidates_hit=192,
    )
    s128, _, f128 = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(force_query_rows=128, **base),
    )
    s32, _, f32_ = substep_jit(
        state, jnp.float32(1e-9), params, None,
        StepConfig(force_query_rows=32, **base),
    )
    assert not bool(f128) and not bool(f32_)
    np.testing.assert_array_equal(
        np.asarray(s128.density), np.asarray(s32.density)
    )
    a1 = np.asarray(s128.acceleration)
    a2 = np.asarray(s32.acceleration)
    # the overlap-clustered cloud drives |a| to ~1e10 with heavy
    # cancellation; q32 sums pairs in a different order, so the bar is
    # loose in f32 ulps yet ~1000x below the dropped-pair failure mode
    # this test exists to catch (which was ~1x relative)
    np.testing.assert_allclose(a1, a2, atol=1e-4 * np.abs(a1).max())


def test_subgroup_hit_flags_semantics(rng):
    """hit_groups=4 density flags equal a brute-force per-subgroup
    pair test: row i*4+g, slot j flags iff subblock cand_sub[i, j] has
    >= 1 particle within h of some particle of ROWS [g*32, (g+1)*32)
    of query block i."""
    from libclsph_tpu.ops import tiles as tiles_ops
    from libclsph_tpu.ops.pallas import neighbor_nl as nl

    n = 1024
    params = make_params(WATER, n=n)
    pos, vel = random_cloud(rng, params, n)
    state = make_state(pos, vel)
    grid = grid_ops.compute_bounds(state.position, params)
    codes = grid_ops.locate_in_grid(state.position, grid)
    state, _, _ = grid_ops.sort_by_cell(state, codes)
    real = jnp.ones((n,), bool)
    B = 128
    blocked = tiles_ops.make_blocked(
        state.position, state.velocity, state.density, state.pressure, real, B
    )
    bmin, bmax = tiles_ops.split_block_bounds(blocked.position, blocked.real)
    cand, count, _ = tiles_ops.candidate_blocks(bmin, bmax, params.h, 64)
    sub = B // nl.SUB
    cand_sub, count_sub, _ = tiles_ops.refine_candidates_exact(
        cand, count, bmin, bmax, blocked.position, params.h, sub, 96
    )
    terms = params.precomputed()
    q_pos, _ = nl.make_query_planes(
        state.position, state.velocity, state.density, state.pressure,
        real, B, mass=params.particle_mass,
    )
    c_pos, _ = nl.make_csub_packs(
        state.position, state.velocity, state.density, state.pressure,
        real, mass=params.particle_mass,
    )
    d1 = nl.fused_density_nl(
        q_pos, c_pos, cand_sub, count_sub, params, terms, real
    )
    d4, hits4 = nl.fused_density_nl(
        q_pos, c_pos, cand_sub, count_sub, params, terms, real,
        want_hits=True, hit_groups=nl.QG,
    )
    # the flag planes must not perturb the density row
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d4))
    hits4 = np.asarray(hits4)
    pq = np.asarray(state.position).reshape(-1, nl.Q32, 3)  # (nb*4, 32, 3)
    psub = np.asarray(state.position).reshape(-1, nl.SUB, 3)
    cs, cn = np.asarray(cand_sub), np.asarray(count_sub)
    h2 = params.h * params.h
    for i in range(cs.shape[0]):
        for g in range(nl.QG):
            row = i * nl.QG + g
            for j in range(cs.shape[1]):
                sid = cs[i, j]
                if j >= cn[i] or sid >= psub.shape[0]:
                    assert hits4[row, j] == 0.0, (i, g, j)
                    continue
                d2 = (
                    (pq[row][:, None, :] - psub[sid][None, :, :]) ** 2
                ).sum(-1)
                assert (hits4[row, j] > 0) == bool((d2 < h2).any()), (i, g, j)


@pytest.mark.parametrize("n", [100, 129, 2049])
def test_odd_particle_counts(n):
    """Non-power-of-two and sub-block counts pad correctly through the
    whole substep (both tile backends)."""
    from libclsph_tpu.core.state import init_state

    params = make_params(WATER, n=n)
    state = init_state(params)
    dt = jnp.float32(params.max_dt)
    for impl in ["tiles", "pallas"]:
        cfg = StepConfig(neighbor_impl=impl)
        s2, _, _ = substep_jit(state, dt, params, None, cfg)
        assert np.isfinite(np.asarray(s2.position)).all()
        assert s2.position.shape[0] == n
        assert float(s2.density.min()) > 0


def test_grid_dim_guard(rng):
    """An exploded domain (extent > 1024 Morton cells) must raise the
    FLAG_GRID_DIM bit instead of silently aliasing cell codes — the
    analog of the reference's hard abort (sph_simulation.cpp:722-724)."""
    from libclsph_tpu.engine.step import FLAG_GRID_DIM

    params = make_params(WATER, n=256)
    pos, vel = random_cloud(rng, params, 256)
    # one runaway particle stretches the grid past the 10-bit limit
    pos[0] = (2000.0 * params.cell_side, 0.0, 0.0)
    state = make_state(pos, vel)
    cfg = StepConfig(neighbor_impl="tiles", adaptive_dt=False)
    _, _, flags = substep_jit(state, jnp.float32(1e-9), params, None, cfg)
    assert int(flags) & FLAG_GRID_DIM

    # a healthy domain does not raise it
    pos2, vel2 = random_cloud(rng, params, 256)
    _, _, flags2 = substep_jit(
        make_state(pos2, vel2), jnp.float32(1e-9), params, None, cfg
    )
    assert not (int(flags2) & FLAG_GRID_DIM)


def test_engine_raises_on_grid_explosion():
    """SPHSimulation._needs_rerun raises on FLAG_GRID_DIM."""
    from libclsph_tpu.engine.simulation import SPHSimulation
    from libclsph_tpu.engine.step import FLAG_CAPACITY, FLAG_GRID_DIM

    sim = SPHSimulation()
    with pytest.raises(RuntimeError, match="1024"):
        sim._needs_rerun(FLAG_GRID_DIM)
    assert sim._needs_rerun(0) is False


def test_scatter_compaction_matches_sort(rng, monkeypatch):
    """LIBCLSPH_TPU_COMPACT=scatter keeps the same LIVE ID SET per row
    as the sort implementation (order differs by design: encounter
    order vs ascending), is live-first, and preserves self-priority
    under truncation."""
    from libclsph_tpu.ops import tiles as tiles_ops

    nb, K = 64, 96
    sent = tiles_ops.REFINE_SENTINEL
    ids = rng.integers(0, 500, (nb, K)).astype(np.int32)
    ids = np.where(rng.random((nb, K)) < 0.6, sent, ids)
    # de-dup live ids per row (real refine lists are duplicate-free)
    for r in range(nb):
        live = ids[r] != sent
        vals, idx = np.unique(ids[r][live], return_index=True)
        row = np.full(K, sent, np.int32)
        row[np.flatnonzero(live)[idx]] = vals
        ids[r] = row
    self_lo = rng.integers(0, 480, nb).astype(np.int32)
    width = 16

    def run(impl, cap):
        monkeypatch.setenv("LIBCLSPH_TPU_COMPACT", impl)
        out = tiles_ops._self_priority_sort(
            jnp.asarray(ids), jnp.asarray(self_lo), width, cap
        )
        return np.asarray(jax.jit(lambda x: x)(out))

    # no truncation: identical live sets, scatter is live-first
    cap = K
    a = run("sort", cap)
    b = run("scatter", cap)
    for r in range(nb):
        sa = set(a[r][a[r] != sent].tolist())
        sb = set(b[r][b[r] != sent].tolist())
        assert sa == sb, r
        nlive = len(sb)
        assert (b[r][:nlive] != sent).all() and (b[r][nlive:] == sent).all()

    # truncation: every self id still survives in both
    cap_t = 8
    bt = run("scatter", cap_t)
    at = run("sort", cap_t)
    for r in range(nb):
        selfs = {
            v
            for v in ids[r].tolist()
            if v != sent and self_lo[r] <= v < self_lo[r] + width
        }
        if len(selfs) <= cap_t:
            assert selfs <= set(bt[r].tolist()), r
            assert selfs <= set(at[r].tolist()), r
