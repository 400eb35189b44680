"""Candidate-list reuse across substeps (StepConfig.cand_interval).

The build substep runs the candidate search/refine with h dilated to
(1 + cand_slack) h and returns the refined tables; reuse substeps
consume them unchanged. Physics-exactness rests on two facts verified
here: (1) the kernels keep the exact r < h cutoff, so a superset list
yields the same sums (equivalence test), and (2) the on-device guard
flags reuse once the max displacement since the build exceeds
cand_slack * h / 2 (staleness test). The reference rebuilds its grid
every substep (sph_simulation.cpp:200-263); reuse is a TPU-side
optimisation the adaptive-dt CFL bound makes safe to guard.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from libclsph_tpu.core.params import derive_parameters
from libclsph_tpu.core.state import init_state
from libclsph_tpu.engine.step import (
    FLAG_CAND_STALE,
    StepConfig,
    substep_jit,
    substep_reuse_jit,
)

N = 4096


@pytest.fixture(scope="module")
def params():
    fluid = dict(
        fluid_density=998.29, dynamic_viscosity=3.5, restitution=0, k=100,
        surface_tension_threshold=7.065, surface_tension=0.0728,
        particles_inside_influence_radius=20,
    )
    sim = dict(
        particles_count=N, particle_mass=0.05, simulation_time=3,
        target_fps=60, simulation_scale=0.1,
        constant_acceleration=dict(x=0, y=-9.8, z=0),
    )
    return derive_parameters(fluid, sim)


def _settled(params, cfg):
    state = init_state(params)
    dt = jnp.float32(params.max_dt)
    for _ in range(3):
        state, dt, flags = substep_jit(state, dt, params, None, cfg)
    assert not int(flags)
    return state


CONFIGS = {
    "plain": dict(max_candidates_sub=64),
    "c16": dict(
        force_query_rows=32, force_sub16=True, density_sub16=True,
        max_candidates_sub=96,
    ),
    # r4: candidate reuse composes with two-tier routing (the carry is
    # the tier-2-width table; routing re-derives per substep from the
    # carried counts)
    "t2": dict(max_candidates_sub=56, tier2_frac=2, tier2_mult=2),
    # (the settled lattice has near-uniform counts, so the base cap
    # must sit above the bulk — only a tail may route to the pool)
    "c16-t2": dict(
        force_query_rows=32, force_sub16=True, density_sub16=True,
        max_candidates_sub=88, tier2_frac=2, tier2_mult=2,
    ),
}


@pytest.mark.parametrize("variant", sorted(CONFIGS))
def test_reuse_matches_rebuild(params, variant):
    """A reuse substep must produce the same density/accel as a fresh
    rebuild on the same state (superset lists + exact cutoff)."""
    base = StepConfig(
        neighbor_impl="pallas", pallas_variant="nl",
        max_candidates=64, max_candidates_hit=64,
        **CONFIGS[variant],
    )
    reuse_cfg = dataclasses.replace(base, cand_interval=2, cand_slack=0.3)
    state = _settled(params, base)
    tiny = jnp.float32(1e-9)  # keep positions (and the anchor) fixed

    s1, d1, f1, tables = substep_jit(
        state, tiny, params, None, reuse_cfg, do_sort=True
    )
    assert not int(f1)
    # the c16 carry grows a 4th leaf (gated-density nibbles)
    cand_sub, count_sub, anchor = tables[:3]
    assert anchor.shape[0] >= N

    s2r, _, f2r, tables2 = substep_reuse_jit(
        s1, tiny, params, None, reuse_cfg, tables
    )
    assert not int(f2r), "guard must not fire for ~zero motion"
    # the carry passes through unchanged (anchor preserved for k > 2)
    assert tables2[2] is tables[2] or bool(
        jnp.all(tables2[2] == tables[2])
    )

    s2f, _, f2f = substep_jit(s1, tiny, params, None, base, do_sort=False)
    assert not int(f2f)
    np.testing.assert_allclose(
        np.asarray(s2r.density), np.asarray(s2f.density), rtol=2e-5
    )
    scale = float(jnp.max(jnp.abs(s2f.acceleration)))
    np.testing.assert_allclose(
        np.asarray(s2r.acceleration), np.asarray(s2f.acceleration),
        atol=2e-5 * scale, rtol=2e-4,
    )


def test_density_gate_matches_ungated(params):
    """Gated reuse density (StepConfig.density_gate): on reuse substeps
    the density kernel skips (subgroup, tile) panels with no DILATED
    hit at build time. While the staleness guard holds those panels
    contribute exactly 0, so the gated and ungated reuse substeps must
    agree — including after real drift within the slack budget."""
    base = StepConfig(
        neighbor_impl="pallas", pallas_variant="nl",
        max_candidates=64, max_candidates_hit=64,
        force_query_rows=32, force_sub16=True, density_sub16=True,
        max_candidates_sub=96, cand_interval=2, cand_slack=0.3,
        density_gate=True,  # opt-in since the r4 measurement (a loser)
    )
    ungated = dataclasses.replace(base, density_gate=False)
    state = _settled(params, dataclasses.replace(base, cand_interval=1))
    dt = jnp.float32(params.max_dt)

    s1g, d1g, f1g, tg = substep_jit(state, dt, params, None, base,
                                    do_sort=True)
    s1u, d1u, f1u, tu = substep_jit(state, dt, params, None, ungated,
                                    do_sort=True)
    assert not int(f1g) and not int(f1u)
    assert len(tg) == 4 and len(tu) == 3
    np.testing.assert_array_equal(
        np.asarray(s1g.density), np.asarray(s1u.density)
    )

    # reuse substep AFTER real drift (one dt of motion, within slack)
    s2g, _, f2g, tg2 = substep_reuse_jit(s1g, d1g, params, None, base, tg)
    s2u, _, f2u, _ = substep_reuse_jit(s1u, d1u, params, None, ungated, tu)
    assert not int(f2g) and not int(f2u)
    # the nibble mask passes through the reuse carry unchanged
    assert bool(jnp.all(tg2[3] == tg[3]))
    np.testing.assert_allclose(
        np.asarray(s2g.density), np.asarray(s2u.density), rtol=1e-6
    )
    scale = float(jnp.max(jnp.abs(s2u.acceleration)))
    np.testing.assert_allclose(
        np.asarray(s2g.acceleration), np.asarray(s2u.acceleration),
        atol=1e-6 * scale, rtol=1e-5,
    )
    # the gate must actually gate (some nibbles clear) on a settled
    # cloud — otherwise the perf feature is a no-op
    import numpy as _np

    words = _np.asarray(tg[3])
    dense_bits = _np.unpackbits(
        words.astype(">u4").view(_np.uint8)
    ).sum()
    assert dense_bits < words.size * 32 * 0.9


def test_pack_tile_nibbles():
    from libclsph_tpu.ops.pallas import neighbor_nl as nl

    nb, ntiles = 3, 16
    rng = np.random.default_rng(7)
    hits2 = jnp.asarray(
        (rng.random((nb * nl.QG, ntiles)) < 0.3).astype(np.float32)
    )
    words = np.asarray(nl.pack_tile_nibbles(hits2, nb))
    ref = np.asarray(hits2).reshape(nb, nl.QG, ntiles) > 0
    for i in range(nb):
        for t in range(ntiles):
            for g in range(nl.QG):
                bit = (words[i, t // 8] >> ((t % 8) * 4 + g)) & 1
                assert bool(bit) == bool(ref[i, g, t])


def test_stale_guard_fires(params):
    base = StepConfig(
        neighbor_impl="pallas", pallas_variant="nl",
        max_candidates=64, max_candidates_sub=64, max_candidates_hit=64,
    )
    reuse_cfg = dataclasses.replace(base, cand_interval=2, cand_slack=0.3)
    state = _settled(params, base)
    tiny = jnp.float32(1e-9)
    s1, d1, f1, tables = substep_jit(
        state, tiny, params, None, reuse_cfg, do_sort=True
    )
    # move one particle past slack * h / 2 since the anchor
    shift = 0.6 * reuse_cfg.cand_slack * float(params.h)
    pos = s1.position.at[0, 0].add(shift)
    s1m = s1.replace(position=pos)
    _, _, f2, _ = substep_reuse_jit(s1m, tiny, params, None, reuse_cfg, tables)
    assert int(f2) & FLAG_CAND_STALE


def test_sharded_engine_rejects_cand_interval():
    from libclsph_tpu.engine.simulation import SPHSimulation

    with pytest.raises(ValueError, match="cand_interval"):
        SPHSimulation(step_config=StepConfig(cand_interval=2), mesh=object())


def test_frame_jit_reuse_matches_rebuild(params):
    """One whole device-side frame (frame_jit's lax.cond rebuild/reuse
    schedule) with cand_interval=2 stays flag-clean and lands within
    numerical-noise distance of the rebuild-every-substep frame."""
    from libclsph_tpu.engine.step import frame_jit

    base = StepConfig(
        neighbor_impl="pallas", pallas_variant="nl",
        max_candidates=64, max_candidates_sub=64, max_candidates_hit=64,
        sort_interval=2,
    )
    reuse_cfg = dataclasses.replace(base, cand_interval=2, cand_slack=0.3)
    state = _settled(params, base)
    dt = jnp.float32(params.max_dt)
    timeleft = jnp.float32(4.5 * params.max_dt)  # a few substeps

    s_a, _, tl_a, f_a = frame_jit(state, dt, timeleft, params, None, base)
    s_b, _, tl_b, f_b = frame_jit(state, dt, timeleft, params, None, reuse_cfg)
    assert not int(f_a) and not int(f_b)
    np.testing.assert_allclose(float(tl_a), float(tl_b), atol=1e-6)
    # same substep count + same dt schedule; supersets only perturb
    # summation order, so trajectories agree to fp noise
    np.testing.assert_allclose(
        np.asarray(s_a.position), np.asarray(s_b.position), atol=1e-4
    )


def test_reuse_requires_static_sort_skip(params):
    cfg = StepConfig(
        neighbor_impl="pallas", pallas_variant="nl", cand_interval=2,
    )
    state = init_state(params)
    dt = jnp.float32(params.max_dt)
    _, _, _, tables = substep_jit(state, dt, params, None, cfg, do_sort=True)
    with pytest.raises(ValueError, match="skip the sort"):
        substep_reuse_jit(state, dt, params, None, cfg, tables, do_sort=True)
