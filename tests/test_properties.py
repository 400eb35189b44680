"""Property-based tests (hypothesis) for the pure numerics."""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from libclsph_tpu.core import morton, smoothing
from libclsph_tpu.ops import grid as grid_ops
from libclsph_tpu.ops import interactions

from conftest import WATER, make_params

params = make_params(WATER, n=256)
terms = params.precomputed()

coords = st.integers(min_value=0, max_value=1023)


@settings(max_examples=50, deadline=None)
@given(coords, coords, coords)
def test_morton_roundtrip_any_coords(x, y, z):
    code = morton.encode(jnp.uint32(x), jnp.uint32(y), jnp.uint32(z))
    dx, dy, dz = morton.decode(code)
    assert (int(dx), int(dy), int(dz)) == (x, y, z)


@settings(max_examples=50, deadline=None)
@given(st.floats(min_value=0.0, max_value=10.0, allow_nan=False))
def test_smoothing_kernels_support(r_frac):
    """All kernels are zero outside the support radius and finite
    inside it."""
    r = jnp.float32(r_frac * params.h)
    w = float(smoothing.poly_6(r, params.h, terms))
    v = float(smoothing.viscosity_laplacian(r, params.h, terms))
    assert np.isfinite(w) and np.isfinite(v)
    if r_frac > 1.001:
        assert w == 0.0 and v == 0.0
    if r_frac < 0.999:
        assert w > 0.0 and v >= 0.0


@settings(max_examples=30, deadline=None)
@given(st.floats(min_value=1.0, max_value=5000.0, allow_nan=False))
def test_tait_eos_monotone(rho):
    """Pressure is non-decreasing in density (strictly once
    (rho/rho0)^7 is representable in f32) and zero at rest density."""
    p1 = float(interactions.tait_pressure(jnp.float32(rho), params))
    p2 = float(interactions.tait_pressure(jnp.float32(rho * 1.01), params))
    assert p2 >= p1
    if rho > 0.3 * params.fluid_density:
        assert p2 > p1
    p0 = float(interactions.tait_pressure(jnp.float32(params.fluid_density), params))
    assert abs(p0) < 1e-3 * params.K


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-5, 5, allow_nan=False, width=32),
            st.floats(-5, 5, allow_nan=False, width=32),
            st.floats(-5, 5, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=64,
    )
)
def test_cell_ranges_partition_sorted_array(pts):
    """For any particle cloud, the per-cell [start, end) ranges of the
    sorted code array exactly partition it."""
    pos = jnp.asarray(np.asarray(pts, dtype=np.float32))
    g = grid_ops.compute_bounds(pos, params)
    codes = grid_ops.locate_in_grid(pos, g)
    sorted_codes = jnp.sort(codes)
    u = np.unique(np.asarray(sorted_codes))
    start, end = grid_ops.cell_ranges(sorted_codes, jnp.asarray(u))
    s, e = np.asarray(start), np.asarray(end)
    # ranges are disjoint, ordered, and cover all n particles
    assert (e > s).all()
    assert (s[1:] >= e[:-1]).all()
    assert (e - s).sum() == len(pts)
