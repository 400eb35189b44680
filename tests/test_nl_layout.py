"""Layout + numerics contracts of the nl kernel feed path.

1. gather_raw + in-kernel 4x4 block-transpose assembly (_tile_from_raw,
   the production feed) must produce the same tiles as the retired
   gather_tiles XLA lane-pack path — pinned here so gather_tiles stays
   a valid reference implementation for experiments.
2. The split bf16 reduction dots (_reduce_dot mode='split3') are only
   exercised at full f32 precision in CI (Pallas interpret mode on
   CPU); this file emulates the TPU MXU's bf16 operand truncation in
   NumPy and asserts the density / colour-laplacian sums stay inside
   their parity budgets (advisor r2 findings #1, #2).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from libclsph_tpu.core import smoothing
from libclsph_tpu.ops.pallas import neighbor_nl as nl

from conftest import WATER, make_params


def _emulated_tile_from_raw(raw_rows, f_out):
    """NumPy emulation of _tile_from_raw's 4x4 block transpose with
    32-lane cells: dest[f, s*32:(s+1)*32] = raw[s, f*32:(f+1)*32]."""
    tile = np.zeros((f_out, nl.LANES), np.float32)
    for f in range(f_out):
        for s in range(nl.GROUP):
            tile[f, s * nl.SUB : (s + 1) * nl.SUB] = raw_rows[
                s, f * nl.SUB : (f + 1) * nl.SUB
            ]
    return tile


def test_tile_from_raw16_matches_transpose(rng):
    """The 16-wide assembly (_tile_from_raw16: 8x8 block transpose with
    16-lane cells per 128-lane half) equals the index-level contract:
    tile[f, s*16:(s+1)*16] = raw[s, f*16:(f+1)*16] for the 9 real
    fields of make_c16_force_pack."""
    import jax
    from jax.experimental import pallas as pl

    raw = rng.standard_normal(
        (nl.TPS * nl.GROUP16, 16 * nl.SUB16)
    ).astype(np.float32)

    def kernel(c_ref, out_ref):
        for t in range(nl.TPS):
            out_ref[t] = nl._tile_from_raw16(c_ref, t)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (nl.TPS, 9, nl.LANES), jnp.float32
        ),
        interpret=True,
    )(jnp.asarray(raw))
    out = np.asarray(out)
    for t in range(nl.TPS):
        rows = raw[t * nl.GROUP16 : (t + 1) * nl.GROUP16]
        want = np.zeros((9, nl.LANES), np.float32)
        for f in range(9):
            for s in range(nl.GROUP16):
                want[f, s * nl.SUB16 : (s + 1) * nl.SUB16] = rows[
                    s, f * nl.SUB16 : (f + 1) * nl.SUB16
                ]
        np.testing.assert_array_equal(out[t], want)


def test_c16_pack_field_layout(rng):
    """make_c16_force_pack row r, lanes [f*16, (f+1)*16) hold field f
    of particles [r*16, (r+1)*16) — same field order as the 32-wide
    force pack — and the dead row's positions sit at FAR."""
    n = 64
    params = make_params(WATER, n=n)
    pos = rng.standard_normal((n, 3)).astype(np.float32)
    vel = rng.standard_normal((n, 3)).astype(np.float32)
    dens = np.full((n,), params.fluid_density, np.float32)
    press = rng.standard_normal((n,)).astype(np.float32)
    real = jnp.ones((n,), bool)
    pack = np.asarray(nl.make_c16_force_pack(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(dens),
        jnp.asarray(press), real, mass=params.particle_mass,
    ))
    assert pack.shape == (n // 16 + 1, 256)
    r, f = 2, 4  # particles 32..47, field vy
    np.testing.assert_array_equal(
        pack[r, f * 16 : (f + 1) * 16], vel[32:48, 1]
    )
    np.testing.assert_array_equal(pack[1, 0:16], pos[16:32, 0])  # px
    assert (pack[-1, : 3 * 16] == nl.FAR).all()  # dead row positions
    assert (pack[:, 9 * 16 :][:-1] == 0).all()  # pad fields zero


def test_gather_raw_assembly_matches_gather_tiles(rng):
    """The raw-row feed + in-register assembly equals gather_tiles'
    pre-packed tile stream field-for-field."""
    n = 512
    params = make_params(WATER, n=n)
    pos = (rng.random((n, 3)).astype(np.float32) - 0.5) * 0.5
    vel = rng.random((n, 3)).astype(np.float32)
    rho = np.full(n, params.fluid_density, np.float32)
    press = rng.random(n).astype(np.float32)
    real = np.ones(n, bool)
    c_pos, c_force = nl.make_csub_packs(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(rho),
        jnp.asarray(press), jnp.asarray(real), mass=params.particle_mass,
    )
    nc = n // nl.SUB
    m = 2 * nl.GROUP * nl.TPS  # two grid steps' worth of slots
    nb = 3
    cand = rng.integers(0, nc, size=(nb, m)).astype(np.int32)
    cand[0, 5:] = 2**30  # dead slots resolve to the dead row
    cand_j = jnp.asarray(cand)

    for pack, f_out in [(c_pos, 4), (c_force, 9)]:
        fs = pack.shape[1] // nl.SUB
        tiles = np.asarray(nl.gather_tiles(pack, cand_j, f_out=f_out))
        tiles = tiles.reshape(nb, m // nl.GROUP, f_out, nl.LANES)
        raw = np.asarray(nl.gather_raw(pack, cand_j)).reshape(nb, m, fs * nl.SUB)
        for i in range(nb):
            for t in range(m // nl.GROUP):
                rows = raw[i, t * nl.GROUP : (t + 1) * nl.GROUP]
                np.testing.assert_array_equal(
                    tiles[i, t], _emulated_tile_from_raw(rows, f_out)
                )


def _bf(x):
    return np.asarray(
        jnp.asarray(x, jnp.float32).astype(jnp.bfloat16).astype(jnp.float32)
    )


def _emulated_split3_ones_dot(w):
    """ones @ w as the TPU executes _reduce_dot(lhs_exact, 'split3'):
    both passes run on the bf16 MXU, so the hi AND lo operands are
    truncated to bf16 (the lo pass's extra truncation is the 2^-18
    term error the in-code analysis budgets for)."""
    whi = _bf(w)
    wlo = _bf(w - whi)
    ones = np.ones((1, w.shape[0]), np.float32)
    return ones @ whi + ones @ wlo  # f32 accumulation, like the MXU


@pytest.mark.parametrize("case", ["density", "laplacian"])
def test_split3_dot_budget_under_bf16_truncation(rng, case):
    """Density row sums within 1e-5 relative, colour-laplacian within
    1e-4 (its (3h^2-7r^2) factor is signed -> some cancellation), both
    under emulated bf16 operand truncation."""
    params = make_params(WATER, n=4096)
    terms = params.precomputed()
    h = params.h
    b = 128
    # realistic pair panel: ~30 of 128 candidates inside the support
    # radius per query row
    r2 = (rng.random((b, b)).astype(np.float32) * (2.0 * h) ** 2)
    incl = r2 < h * h
    t = np.maximum(h * h - r2, 0.0).astype(np.float32)
    if case == "density":
        w = (terms.poly_6 * t**3).astype(np.float32)
        budget = 1e-5
    else:
        mr = params.particle_mass / params.fluid_density
        w = (terms.poly_6_laplacian * mr * t * (3 * h * h - 7 * r2)).astype(
            np.float32
        ) * incl
        budget = 1e-4
    exact = w.astype(np.float64).sum(axis=0)  # (b,) column sums in f64
    got = _emulated_split3_ones_dot(w)[0]
    scale = np.abs(exact).max()
    assert scale > 0
    np.testing.assert_allclose(got, exact, atol=budget * scale)
