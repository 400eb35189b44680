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
    cand_sub, count_sub, anchor = tables
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
