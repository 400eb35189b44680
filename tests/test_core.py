"""Unit tests: Morton codes, smoothing kernels, params, state init."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from libclsph_tpu.core import morton, smoothing
from libclsph_tpu.core.params import (
    PrecomputedKernelValues,
    derive_parameters,
)
from libclsph_tpu.core.state import init_lattice_positions

from conftest import WATER, DEFAULT_SIM, make_params
import oracle


class TestMorton:
    def test_roundtrip(self, rng):
        coords = rng.integers(0, 1024, size=(1000, 3)).astype(np.uint32)
        codes = morton.encode(
            jnp.asarray(coords[:, 0]),
            jnp.asarray(coords[:, 1]),
            jnp.asarray(coords[:, 2]),
        )
        x, y, z = morton.decode(codes)
        np.testing.assert_array_equal(np.asarray(x), coords[:, 0])
        np.testing.assert_array_equal(np.asarray(y), coords[:, 1])
        np.testing.assert_array_equal(np.asarray(z), coords[:, 2])

    def test_known_values(self):
        # Interleave pattern: x bit0, y bit1, z bit2 (util.h:41-62).
        assert int(morton.encode(jnp.uint32(1), jnp.uint32(0), jnp.uint32(0))) == 1
        assert int(morton.encode(jnp.uint32(0), jnp.uint32(1), jnp.uint32(0))) == 2
        assert int(morton.encode(jnp.uint32(0), jnp.uint32(0), jnp.uint32(1))) == 4
        assert int(morton.encode(jnp.uint32(3), jnp.uint32(3), jnp.uint32(3))) == 63
        assert (
            int(morton.encode(jnp.uint32(1023), jnp.uint32(1023), jnp.uint32(1023)))
            == (1 << 30) - 1
        )

    def test_ordering_locality(self):
        # morton(x,y,z) of adjacent cells share high bits: just sanity
        # that encode is monotone along each axis within a dyadic block.
        codes = [int(morton.encode(jnp.uint32(x), jnp.uint32(0), jnp.uint32(0))) for x in range(8)]
        assert codes == sorted(codes)

    def test_neighbor_codes(self):
        code = morton.encode(jnp.uint32(5), jnp.uint32(6), jnp.uint32(7))
        neigh = np.asarray(morton.neighbor_codes(code))
        assert neigh.shape == (27,)
        expected = set()
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    expected.add(
                        int(
                            morton.encode(
                                jnp.uint32(5 + dx), jnp.uint32(6 + dy), jnp.uint32(7 + dz)
                            )
                        )
                    )
        assert set(int(c) for c in neigh) == expected


class TestSmoothing:
    def test_poly6_analytic(self, water_params):
        h = water_params.h
        terms = water_params.precomputed()
        # W(0) = 315/(64 pi h^9) * h^6 = 315/(64 pi h^3)
        w0 = float(smoothing.poly_6(jnp.float32(0.0), h, terms))
        assert w0 == pytest.approx(315.0 / (64.0 * math.pi * h**3), rel=1e-5)
        # support cutoff: exactly zero beyond h (at r==h f32 rounding
        # of h itself may land a hair inside the support)
        assert float(smoothing.poly_6(jnp.float32(1.001 * h), h, terms)) == 0.0
        assert float(smoothing.poly_6(jnp.float32(2 * h), h, terms)) == 0.0

    def test_poly6_integrates_to_one(self, water_params):
        # \int W dV = 1 over the support sphere (radial quadrature).
        h = water_params.h
        terms = water_params.precomputed()
        r = np.linspace(0, h, 20001)
        w = np.asarray(smoothing.poly_6(jnp.asarray(r, jnp.float64), h, terms))
        integral = np.trapezoid(w * 4 * np.pi * r**2, r)
        assert integral == pytest.approx(1.0, rel=1e-4)

    def test_spiky_gradient_singularity(self, water_params):
        h = water_params.h
        terms = water_params.precomputed()
        g = np.asarray(
            smoothing.spiky_gradient(jnp.zeros((3,), jnp.float32), h, terms)
        )
        np.testing.assert_allclose(g, np.full(3, terms.spiky), rtol=1e-6)

    def test_spiky_gradient_direction(self, water_params):
        h = water_params.h
        terms = water_params.precomputed()
        rv = jnp.asarray([0.3 * h, 0.0, 0.0], jnp.float32)
        g = np.asarray(smoothing.spiky_gradient(rv, h, terms))
        expected = terms.spiky * (h - 0.3 * h) ** 2
        np.testing.assert_allclose(g, [expected, 0.0, 0.0], rtol=1e-5)

    def test_viscosity_laplacian(self, water_params):
        h = water_params.h
        terms = water_params.precomputed()
        v = float(smoothing.viscosity_laplacian(jnp.float32(0.5 * h), h, terms))
        assert v == pytest.approx(terms.viscosity * 0.5 * h, rel=1e-5)
        assert float(smoothing.viscosity_laplacian(jnp.float32(h), h, terms)) == 0.0


class TestParams:
    def test_derived_quantities(self):
        p = make_params(WATER, n=64000)
        assert p.total_mass == pytest.approx(64000 * 0.05)
        assert p.initial_volume == pytest.approx(p.total_mass / 998.29)
        expected_h = (
            3.0 * 20 * (p.initial_volume / 64000) / (4.0 * math.pi)
        ) ** (1.0 / 3.0)
        assert p.h == pytest.approx(expected_h, rel=1e-12)

    def test_precomputed_match_reference_formulas(self):
        p = make_params(WATER, n=1000)
        t = p.precomputed()
        h = p.h
        assert t.poly_6 == pytest.approx(315.0 / (64.0 * math.pi * h**9))
        assert t.poly_6_gradient == pytest.approx(-945.0 / (32.0 * math.pi * h**9))
        assert t.spiky == pytest.approx(-45.0 / (math.pi * h**6))
        assert t.viscosity == pytest.approx(45.0 / (math.pi * h**6))

    def test_restitution_validation(self):
        bad = dict(WATER, restitution=1.5)
        with pytest.raises(ValueError):
            derive_parameters(bad, dict(DEFAULT_SIM))

    def test_oracle_agrees_on_coefficients(self):
        p = make_params(WATER, n=1000)
        c = oracle.coefficients(p.h)
        t = p.precomputed()
        assert t.poly_6 == pytest.approx(c["poly6"])
        assert t.spiky == pytest.approx(c["spiky"])


class TestLattice:
    def test_cube_layout(self):
        p = make_params(WATER, n=27)
        pos = init_lattice_positions(p)
        side = p.initial_volume ** (1 / 3)
        spacing = side / 3
        # first particle at (-side/2, 0, -side/2); x-fastest ordering
        np.testing.assert_allclose(pos[0], [-side / 2, 0.0, -side / 2], atol=1e-6)
        np.testing.assert_allclose(pos[1] - pos[0], [spacing, 0, 0], atol=1e-6)
        np.testing.assert_allclose(pos[3] - pos[0], [0, spacing, 0], atol=1e-6)
        np.testing.assert_allclose(pos[9] - pos[0], [0, 0, spacing], atol=1e-6)


class TestProfiling:
    def test_step_timer(self):
        from libclsph_tpu.utils.profiling import StepTimer
        import jax.numpy as jnp

        t = StepTimer()
        for i in range(3):
            t.lap(jnp.float32(i))
        s = t.summary()
        assert s["count"] == 3
        assert s["mean_ms"] >= 0.0
        assert s["max_ms"] >= s["min_ms"]

    def test_trace_writes_dir(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from libclsph_tpu.utils.profiling import annotate, trace

        with trace(str(tmp_path)):
            with annotate("phase"):
                jax.block_until_ready(jnp.ones(8) * 2)
        import os

        assert os.listdir(tmp_path)  # trace artifacts written
