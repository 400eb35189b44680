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
