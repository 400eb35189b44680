"""Init-state capacity pre-tune (engine/pretune.py, round 5).

The probe's true-hit counts are checked against a brute-force numpy
oracle, and the policy against the two regimes that matter: a benign
lattice (config unchanged) and a degenerate deep-column cloud (the
river failure mode: c16 hit tables would overflow, so the pre-tune
must downgrade to the q-granular kernels BEFORE the first compile
instead of crash-recompiling mid-frame — VERDICT r4 #4; the reference
analog sizes workgroups before the loop, sph_simulation.cpp:339-361).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_params

from libclsph_tpu.core.state import ParticleState, init_state
from libclsph_tpu.engine.pretune import _probe_counts, pretune_config
from libclsph_tpu.engine.step import StepConfig


def c16_config(**over):
    base = dict(
        neighbor_impl="pallas",
        pallas_variant="nl",
        nl_query_rows=128,
        force_query_rows=32,
        hit_compact=True,
        force_sub16=True,
        density_sub16=True,
        max_candidates_sub=192,
        max_candidates_hit16=64,
    )
    base.update(over)
    return StepConfig(**base)


def state_from_positions(pos):
    n = pos.shape[0]
    z3 = jnp.zeros((n, 3), jnp.float32)
    z1 = jnp.zeros((n,), jnp.float32)
    return ParticleState(
        position=jnp.asarray(pos, jnp.float32),
        velocity=z3,
        intermediate_velocity=z3,
        acceleration=z3,
        density=z1,
        pressure=z1,
        grid_index=jnp.zeros((n,), jnp.uint32),
    )


def oracle_hit_counts(pos_sorted, n_real, h, block=128):
    """Brute-force per-32-query-subgroup true-hit counts at 16- and
    32-wide candidate granularity (no candidate machinery: all
    subblocks tested — an upper bound the probe must match exactly
    when its candidate caps are not truncating)."""
    np_ = pos_sorted.shape[0]
    real = np.arange(np_) < n_real
    nsub = np_ // 16
    cpos = pos_sorted.reshape(nsub, 16, 3)
    creal = real.reshape(nsub, 16)
    max16 = max32 = 0
    for q0 in range(0, np_, 32):
        q = pos_sorted[q0 : q0 + 32]
        qr = real[q0 : q0 + 32]
        if not qr.any():
            continue
        # float32 end-to-end so boundary pairs (r ~ h) round exactly as
        # the probe's f32 arithmetic does
        d2 = (
            ((q[:, None, None, :] - cpos[None]) ** 2)
            .astype(np.float32)
            .sum(-1, dtype=np.float32)
        )  # (32, nsub, 16)
        ok = (d2 < np.float32(h) * np.float32(h)) & creal[None] & qr[:, None, None]
        hit16 = ok.any(axis=(0, 2))  # (nsub,)
        max16 = max(max16, int(hit16.sum()))
        max32 = max(max32, int(np.unique(np.where(hit16)[0] // 2).size))
    return max16, max32


@pytest.mark.parametrize("n", [2048])
def test_probe_matches_oracle(n, rng):
    params = make_params(n=n)
    # a mildly clumped cloud (two gaussian blobs) so counts vary
    pos = np.concatenate(
        [
            rng.normal(0.0, 4 * params.h, (n // 2, 3)),
            rng.normal(0.35, 3 * params.h, (n - n // 2, 3)),
        ]
    ).astype(np.float32)
    state = state_from_positions(pos)
    cfg = c16_config()
    stats = _probe_counts(state, params, cfg, cap_blocks=64, cap_sub=512)
    # oracle needs the probe's own sorted order: replicate pad+sort
    from libclsph_tpu.ops import grid as grid_ops
    from libclsph_tpu.ops import tiles as tiles_ops

    grid = grid_ops.compute_bounds(state.position, params)
    codes = np.asarray(grid_ops.locate_in_grid(state.position, grid))
    np_pad = tiles_ops.padded_count(n, cfg.block_size)
    far = (np.asarray(grid.max_point) + 1000.0 * params.h).astype(np.float32)
    pos_p = np.concatenate([pos, np.broadcast_to(far, (np_pad - n, 3))])
    codes_p = np.concatenate(
        [codes, np.full(np_pad - n, tiles_ops.SENTINEL_CODE, np.uint32)]
    )
    order = np.argsort(codes_p, kind="stable")
    max16, max32 = oracle_hit_counts(pos_p[order], n, params.h)
    assert int(stats["hit16_max"]) == max16
    assert int(stats["hit32_max"]) == max32
    assert not bool(stats["grid_bad"])


def test_pretune_keeps_benign_lattice():
    params = make_params(n=4096)
    state = init_state(params)
    cfg = c16_config()
    out, stats = pretune_config(state, params, cfg)
    assert stats is not None
    assert out.force_sub16 and out.density_sub16
    assert out == cfg


def test_pretune_downgrades_deep_columns(rng):
    # degenerate tall thin column: every particle within h of a plane
    # -> hit16 counts far above the 64-slot cap; the pre-tune must pick
    # the q-granular config up front and size its per-subgroup cap
    n = 4096
    params = make_params(n=n)
    pos = np.zeros((n, 3), np.float32)
    pos[:, 1] = rng.uniform(0, 0.3 * params.h, n)  # razor-thin sheet
    pos[:, 0] = rng.uniform(0, 0.5 * params.h, n)
    pos[:, 2] = rng.uniform(0, 0.5 * params.h, n)
    state = state_from_positions(pos)
    cfg = c16_config()
    out, stats = pretune_config(state, params, cfg)
    assert stats["hit16_max"] > cfg.max_candidates_hit16
    assert out.force_sub16 is False and out.density_sub16 is False
    # q-path per-subgroup cap (max(32, hit//2)) must fit the measured max
    assert max(32, out.max_candidates_hit // 2) >= stats["hit32_max"]


def test_pretune_skips_non_c16_shapes():
    params = make_params(n=1024)
    state = init_state(params)
    cfg = StepConfig(neighbor_impl="tiles")
    out, stats = pretune_config(state, params, cfg)
    assert out == cfg and stats is None
