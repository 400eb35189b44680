"""Golden-trajectory regression tests.

A short dam-break trajectory's statistical digest is compared against
stored golden values (originally cross-validated against the NumPy
oracle per-step in test_physics.py). Catches silent numerics drift in
any pass. Tolerances are loose enough for cross-platform (CPU/TPU)
float reordering but tight enough to catch physics changes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from libclsph_tpu.core.state import init_state
from libclsph_tpu.engine.step import StepConfig, substep_jit

from conftest import WATER, MUCUS, make_params

# digest after 20 substeps of a 512-particle free-space dam break
# (water preset, adaptive dt): [mean_y, std_pos, mean_rho, max_speed, dt]
GOLDEN_WATER = dict(
    mean_y=0.1232980,
    std_pos=0.1074209,
    mean_rho=894.3395,
    max_speed=0.4676643,
    dt=0.00166667,
)
GOLDEN_MUCUS = dict(
    mean_y=0.1232244,
    std_pos=0.1065247,
    mean_rho=922.1239,
    max_speed=0.5900418,
    dt=0.00166667,
)


def digest(fluid, impl):
    params = make_params(fluid, n=512)
    state = init_state(params)
    cfg = StepConfig(neighbor_impl=impl)
    dt = jnp.float32(params.max_dt)
    for _ in range(20):
        state, dt, ovf = substep_jit(state, dt, params, None, cfg)
        assert not bool(ovf)
    pos = np.asarray(state.position, dtype=np.float64)
    return dict(
        mean_y=float(pos[:, 1].mean()),
        std_pos=float(pos.std()),
        mean_rho=float(np.asarray(state.density).mean()),
        max_speed=float(
            np.linalg.norm(np.asarray(state.velocity), axis=1).max()
        ),
        dt=float(dt),
    )


@pytest.mark.parametrize("impl", ["tiles", "pallas"])
def test_water_digest(impl):
    d = digest(WATER, impl)
    for k, v in GOLDEN_WATER.items():
        assert d[k] == pytest.approx(v, rel=2e-3), (k, d)


@pytest.mark.parametrize("impl", ["tiles", "pallas"])
def test_mucus_digest(impl):
    d = digest(MUCUS, impl)
    for k, v in GOLDEN_MUCUS.items():
        assert d[k] == pytest.approx(v, rel=2e-3), (k, d)


# digest after 40 substeps of a 512-particle dam break ONTO cube.obj
# (DF collisions active: the block lands on the y=-0.5 top face) —
# catches drift in the collision/DF numerics that the free-space
# digests cannot see (r2 verdict weak #8)
GOLDEN_WATER_CUBE = dict(
    mean_y=0.1066925,
    min_y=-0.0197475,
    std_pos=0.1020319,
    mean_rho=970.0597,
    max_speed=0.8391598,
    dt=0.00166667,
)


@pytest.mark.parametrize("impl", ["tiles", "pallas"])
def test_water_cube_collision_digest(impl):
    from libclsph_tpu.ops import collisions as C
    from libclsph_tpu.scene.scene import Scene

    params = make_params(WATER, n=512)
    scene = Scene.load("cube.obj", params.h * 2, scenes_dir="scenes")
    dev = C.build_device_scene(scene)
    state = init_state(params)
    cfg = StepConfig(neighbor_impl=impl)
    dt = jnp.float32(params.max_dt)
    for _ in range(40):
        state, dt, ovf = substep_jit(state, dt, params, dev, cfg)
        assert not bool(ovf)
    pos = np.asarray(state.position, dtype=np.float64)
    d = dict(
        mean_y=float(pos[:, 1].mean()),
        min_y=float(pos[:, 1].min()),
        std_pos=float(pos.std()),
        mean_rho=float(np.asarray(state.density).mean()),
        max_speed=float(
            np.linalg.norm(np.asarray(state.velocity), axis=1).max()
        ),
        dt=float(dt),
    )
    for k, v in GOLDEN_WATER_CUBE.items():
        assert d[k] == pytest.approx(v, rel=2e-3, abs=2e-4), (k, d)


def test_hierarchical_path_digest_matches_dense(monkeypatch):
    """End-to-end: the hierarchical candidate search must produce the
    same trajectory as the dense search (r2 verdict weak #8: golden
    coverage of the 1M-regime machinery). Uses a lowered threshold so
    the superblock path engages at test scale; a distinct n keeps the
    jit cache from serving the dense-path executable."""
    from libclsph_tpu.ops import tiles as tiles_ops

    n = 640
    params = make_params(WATER, n=n)
    cfg = StepConfig(neighbor_impl="tiles")
    dt0 = jnp.float32(params.max_dt)

    def run():
        state = init_state(params)
        dt = dt0
        for _ in range(20):
            state, dt, ovf = substep_jit(state, dt, params, None, cfg)
            assert not bool(ovf)
        return state

    s_dense = run()
    monkeypatch.setattr(tiles_ops, "HIERARCHICAL_THRESHOLD", 2)
    # distinct config -> fresh trace under the patched threshold
    cfg = StepConfig(neighbor_impl="tiles", max_candidates=65)
    s_hier = run()
    np.testing.assert_allclose(
        np.asarray(s_dense.position), np.asarray(s_hier.position), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_dense.density), np.asarray(s_hier.density), rtol=1e-4
    )
