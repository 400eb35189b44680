import os

# Multi-chip sharding tests run on a virtual 8-device CPU mesh — the
# standard way to exercise TPU-mesh code paths without TPU hardware.
# Note: env vars alone are NOT enough here — this image's sitecustomize
# registers a TPU-tunnel PJRT backend that outranks JAX_PLATFORMS, so
# we must also force the platform through jax.config.
# LIBCLSPH_TPU_ALLOW_TPU=1 skips the forcing so the Mosaic smoke tests
# (tests/test_tpu_smoke.py) can run on the real chip.
_ALLOW_TPU = os.environ.get("LIBCLSPH_TPU_ALLOW_TPU") == "1"
if not _ALLOW_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ALLOW_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from libclsph_tpu.core.params import derive_parameters  # noqa: E402

WATER = dict(
    fluid_density=998.29,
    dynamic_viscosity=3.5,
    restitution=0,
    k=100,
    surface_tension_threshold=7.065,
    surface_tension=0.0728,
    particles_inside_influence_radius=20,
)
MUCUS = dict(
    fluid_density=1000,
    dynamic_viscosity=36,
    restitution=0.5,
    k=5,
    surface_tension_threshold=5,
    surface_tension=6,
    particles_inside_influence_radius=40,
)
DEFAULT_SIM = dict(
    particles_count=64000,
    particle_mass=0.05,
    simulation_time=3,
    target_fps=60,
    simulation_scale=0.1,
    write_all_frames=False,
    serialize=False,
    constant_acceleration=dict(x=0, y=-9.8, z=0),
)


def make_params(fluid=WATER, n=1024, **overrides):
    sim = dict(DEFAULT_SIM, particles_count=n, **overrides)
    return derive_parameters(dict(fluid), sim)


@pytest.fixture
def water_params():
    return make_params(WATER, n=1024)


@pytest.fixture
def mucus_params():
    return make_params(MUCUS, n=512)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


# ---- slow markers (README "quick set"): the heavy equivalence /
# engine / mesh suites are marked slow so `-m "not slow"` gives an
# iteration loop that fits this box's single core; the full suite
# stays the merge gate.
_SLOW_MODULES = {
    "test_cand_reuse", "test_tier2", "test_golden", "test_engine",
    "test_parallel", "test_render",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__
        if mod in _SLOW_MODULES or (
            mod == "test_physics" and item.cls is None
        ):
            item.add_marker(pytest.mark.slow)
