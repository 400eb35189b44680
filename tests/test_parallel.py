"""Multi-chip sharded step on the virtual 8-device CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from libclsph_tpu.core.state import init_state
from libclsph_tpu.engine.step import StepConfig, substep_jit
from libclsph_tpu.parallel.mesh import AXIS, make_mesh, morton_partition
from libclsph_tpu.parallel.sharded_step import (
    dryrun,
    make_sharded_substep,
    pad_for_mesh,
)

from conftest import WATER, make_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def shard_state(state, mesh):
    sharding = NamedSharding(mesh, P(AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), state)


class TestShardedStep:
    def test_dryrun(self):
        dryrun(8)

    def test_matches_single_chip(self):
        """The sharded step must produce the same physics as the
        single-chip tiles step (up to f32 summation order)."""
        params = make_params(WATER, n=1024)
        cfg = StepConfig(
            neighbor_impl="tiles", block_size=64, max_candidates=32,
            adaptive_dt=False,
        )
        state0 = init_state(params)
        dt = jnp.float32(params.max_dt)

        # single chip
        s1, dt1, _ = substep_jit(state0, dt, params, None, cfg)

        # sharded
        mesh = make_mesh(jax.devices()[:8])
        sp = pad_for_mesh(state0, params, mesh, cfg)
        sp = shard_state(sp, mesh)
        step = make_sharded_substep(mesh, params, None, cfg)
        s8, dt8, ovf8 = step(sp, dt)
        assert not bool(ovf8)

        pos8 = np.asarray(s8.position)
        real = np.abs(pos8).max(axis=1) < 1e30
        assert real.sum() == params.particles_count

        # compare via position-sorted rows
        def key(pos):
            q = np.round(np.asarray(pos, np.float64), 6)
            return np.lexsort(q.T)

        p1 = np.asarray(s1.position)
        o1 = key(p1)
        p8 = pos8[real]
        o8 = key(p8)
        np.testing.assert_allclose(p1[o1], p8[o8], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s1.density)[o1],
            np.asarray(s8.density)[real][o8],
            rtol=1e-5,
        )
        a1 = np.asarray(s1.acceleration)[o1]
        a8 = np.asarray(s8.acceleration)[real][o8]
        scale = np.abs(a1).max()
        np.testing.assert_allclose(a1, a8, atol=5e-4 * scale)
        assert float(dt1) == pytest.approx(float(dt8), rel=1e-5)

    @pytest.mark.parametrize("exchange", ["all_gather", "halo"])
    def test_pallas_nl_matches_single_chip(self, exchange):
        """The production nl Pallas kernels under a mesh (interpret
        mode on CPU) must reproduce the single-chip nl physics for both
        exchange strategies."""
        params = make_params(WATER, n=1024)
        cfg = StepConfig(
            neighbor_impl="pallas", pallas_variant="nl", block_size=64,
            max_candidates=32, max_candidates_sub=96, adaptive_dt=False,
        )
        state0 = init_state(params)
        dt = jnp.float32(params.max_dt)
        s1, dt1, f1 = substep_jit(state0, dt, params, None, cfg)
        assert not bool(f1)

        mesh = make_mesh(jax.devices()[:8])
        sp = pad_for_mesh(state0, params, mesh, cfg)
        sp = shard_state(sp, mesh)
        nb_local = sp.position.shape[0] // 8 // 64
        kw = dict(exchange=exchange)
        if exchange == "halo":
            kw["halo_max"] = nb_local
        step = make_sharded_substep(mesh, params, None, cfg, **kw)
        s8, dt8, f8 = step(sp, dt)
        assert not bool(f8)

        pos8 = np.asarray(s8.position)
        real = np.abs(pos8).max(axis=1) < 1e30
        assert real.sum() == params.particles_count

        def key(pos):
            q = np.round(np.asarray(pos, np.float64), 6)
            return np.lexsort(q.T)

        o1 = key(np.asarray(s1.position))
        o8 = key(pos8[real])
        np.testing.assert_allclose(
            np.asarray(s1.position)[o1], pos8[real][o8], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s1.density)[o1],
            np.asarray(s8.density)[real][o8],
            rtol=1e-5,
        )
        a1 = np.asarray(s1.acceleration)[o1]
        a8 = np.asarray(s8.acceleration)[real][o8]
        np.testing.assert_allclose(a1, a8, atol=5e-4 * np.abs(a1).max())
        assert float(dt1) == pytest.approx(float(dt8), rel=1e-5)

    @pytest.mark.parametrize(
        "force_sub16,density_sub16",
        [(False, False), (True, False), (True, True)],
        ids=["c32", "c16-force", "c16-all"],
    )
    def test_pallas_nl_q32_matches_single_chip(
        self, force_sub16, density_sub16
    ):
        """The q32 force pass (per-query-subgroup hit lists,
        force_query_rows=32) under a mesh reproduces the single-chip
        q32 physics — the sharded engine keeps feature parity with the
        single-chip production path, incl. the 16-wide candidate paths
        (force_sub16 / density_sub16: exchanged-table c16 packs +
        16-granular ids)."""
        params = make_params(WATER, n=2048)
        cfg = StepConfig(
            neighbor_impl="pallas", pallas_variant="nl", block_size=128,
            max_candidates=32,
            max_candidates_sub=144 if density_sub16 else 96,
            max_candidates_hit=64,
            force_query_rows=32, adaptive_dt=False,
            force_sub16=force_sub16, density_sub16=density_sub16,
        )
        state0 = init_state(params)
        dt = jnp.float32(params.max_dt)
        s1, dt1, f1 = substep_jit(state0, dt, params, None, cfg)
        assert not bool(f1)

        mesh = make_mesh(jax.devices()[:8])
        sp = pad_for_mesh(state0, params, mesh, cfg)
        sp = shard_state(sp, mesh)
        step = make_sharded_substep(mesh, params, None, cfg)
        s8, dt8, f8 = step(sp, dt)
        assert not bool(f8)

        pos8 = np.asarray(s8.position)
        real = np.abs(pos8).max(axis=1) < 1e30
        assert real.sum() == params.particles_count

        def key(pos):
            q = np.round(np.asarray(pos, np.float64), 6)
            return np.lexsort(q.T)

        o1 = key(np.asarray(s1.position))
        o8 = key(pos8[real])
        np.testing.assert_allclose(
            np.asarray(s1.density)[o1],
            np.asarray(s8.density)[real][o8],
            rtol=1e-5,
        )
        a1 = np.asarray(s1.acceleration)[o1]
        a8 = np.asarray(s8.acceleration)[real][o8]
        np.testing.assert_allclose(a1, a8, atol=5e-4 * np.abs(a1).max())
        assert float(dt1) == pytest.approx(float(dt8), rel=1e-5)

    @pytest.mark.parametrize(
        "force_query_rows,c16_all",
        [(128, False), (32, False), (32, True)],
        ids=["q128", "q32", "c16-all"],
    )
    def test_pallas_nl_tier2_matches_sharded_single_tier(
        self, rng, force_query_rows, c16_all
    ):
        """Two-tier capacity routing under a mesh (engine/step.py
        nl_two_tier_passes via the sharded caller) reproduces the
        sharded single-tier run at the full capacity bit-for-bit on
        density: both execute identical kernels over identical sorted
        candidate lists, per shard — the routing only changes which
        dispatch a block's accumulation happens in."""
        from test_tier2 import clustered_cloud, refined_counts
        from test_physics import make_state

        n = 2048
        params = make_params(WATER, n=n)
        pos, vel = clustered_cloud(rng, params, n)
        state0 = make_state(pos, vel)

        # heavy-row bar from the single-chip refined counts (proxy: the
        # ball cluster makes its blocks heavy in any decomposition)
        counts = refined_counts(make_state(pos, vel), params)
        if c16_all:
            counts = counts * 2  # 16-wide subblock counts are ~2x
        c1 = max(32, int(np.median(counts)) + 8)
        assert (counts > c1).any(), "test cloud produced no heavy blocks"
        mult = 2
        while c1 * mult < int(counts.max()) * 2:
            mult *= 2

        base = dict(
            neighbor_impl="pallas", pallas_variant="nl", block_size=128,
            max_candidates=64, max_candidates_hit=2 * c1,
            force_query_rows=force_query_rows, adaptive_dt=False,
            force_sub16=c16_all, density_sub16=c16_all,
            max_candidates_hit16=4 * c1,
        )
        mesh = make_mesh(jax.devices()[:8])
        dt = jnp.float32(params.max_dt)

        cfg_full = StepConfig(max_candidates_sub=c1 * mult, **base)
        sp = pad_for_mesh(state0, params, mesh, cfg_full)
        sp = shard_state(sp, mesh)
        s_full, dt_full, f_full = make_sharded_substep(
            mesh, params, None, cfg_full
        )(sp, dt)
        assert not bool(f_full)

        cfg_t2 = StepConfig(
            max_candidates_sub=c1, tier2_frac=4, tier2_mult=mult, **base
        )
        s_t2, dt_t2, f_t2 = make_sharded_substep(
            mesh, params, None, cfg_t2
        )(sp, dt)
        assert not bool(f_t2)

        np.testing.assert_array_equal(
            np.asarray(s_full.density), np.asarray(s_t2.density)
        )
        a1 = np.asarray(s_full.acceleration)
        a2 = np.asarray(s_t2.acceleration)
        np.testing.assert_allclose(a1, a2, atol=1e-5 * np.abs(a1).max())
        assert float(dt_full) == pytest.approx(float(dt_t2), rel=1e-6)

    def test_sharded_collisions_match_single_chip(self):
        """The sharded DF collision path (DeviceScene routed through
        _advect_collide under shard_map) must equal the single-chip
        path — collisionsv2.cl:249-336 semantics under the mesh."""
        from libclsph_tpu.ops import collisions as C
        from libclsph_tpu.scene.scene import Scene

        params = make_params(WATER, n=1024)
        scene = Scene.load("cube.obj", params.h * 2, scenes_dir="scenes")
        dev_scene = C.build_device_scene(scene)
        cfg = StepConfig(
            neighbor_impl="tiles", block_size=64, max_candidates=32,
            adaptive_dt=False,
        )
        # drop the lattice so its bottom layer sits just above the
        # cube's top face (y=-0.5) moving down: the DF response fires
        # for the contact layer within one substep
        state0 = init_state(params)
        pos = np.array(state0.position)  # writable copy
        pos[:, 1] -= pos[:, 1].min() + 0.49
        down = np.tile(np.float32([0.0, -1.0, 0.0]), (pos.shape[0], 1))
        state0 = state0.replace(
            position=jnp.asarray(pos),
            velocity=jnp.asarray(down),
            intermediate_velocity=jnp.asarray(down),
        )
        dt = jnp.float32(params.max_dt)

        s1, dt1, f1 = substep_jit(state0, dt, params, dev_scene, cfg)
        s1_free, _, _ = substep_jit(state0, dt, params, None, cfg)
        # the scene actually deflected particles (the test tests something)
        assert np.abs(
            np.asarray(s1.position) - np.asarray(s1_free.position)
        ).max() > 1e-6

        mesh = make_mesh(jax.devices()[:8])
        sp = shard_state(pad_for_mesh(state0, params, mesh, cfg), mesh)
        step = make_sharded_substep(mesh, params, dev_scene, cfg)
        s8, dt8, f8 = step(sp, dt)
        assert not bool(f8)

        pos8 = np.asarray(s8.position)
        real = np.abs(pos8).max(axis=1) < 1e30
        assert real.sum() == params.particles_count

        def key(pos):
            q = np.round(np.asarray(pos, np.float64), 6)
            return np.lexsort(q.T)

        o1 = key(np.asarray(s1.position))
        o8 = key(pos8[real])
        np.testing.assert_allclose(
            np.asarray(s1.position)[o1], pos8[real][o8], atol=1e-5
        )
        v1 = np.asarray(s1.velocity)[o1]
        v8 = np.asarray(s8.velocity)[real][o8]
        np.testing.assert_allclose(v1, v8, atol=1e-4 * np.abs(v1).max())
        assert float(dt1) == pytest.approx(float(dt8), rel=1e-5)

    def test_sharded_frame_matches_substep_loop(self):
        """make_sharded_frame (whole frame's substep loop on device,
        one scalar fetch per dispatch) must reproduce the per-substep
        dispatch loop."""
        from libclsph_tpu.parallel.sharded_step import make_sharded_frame

        params = make_params(WATER, n=512)
        cfg = StepConfig(
            neighbor_impl="tiles", block_size=64, max_candidates=32,
        )
        mesh = make_mesh(jax.devices()[:8])
        state0 = shard_state(pad_for_mesh(init_state(params), params, mesh, cfg), mesh)
        dt0 = jnp.float32(params.max_dt)
        frame_time = params.frame_time

        # host-loop reference (the old per-substep path)
        step = make_sharded_substep(mesh, params, None, cfg)
        st, dt, timeleft = state0, dt0, frame_time
        nsub = 0
        while timeleft > 0.0:
            st, dt_dev, _ = step(st, dt)
            dt_f = float(dt_dev)
            timeleft -= dt_f
            dt = jnp.float32(min(dt_f, timeleft) if timeleft < dt_f else dt_f)
            nsub += 1

        frame = make_sharded_frame(mesh, params, None, cfg)
        stf, dtf, tlf = state0, dt0, jnp.float32(frame_time)
        ndisp = 0
        while float(tlf) > 0.0:
            stf, dtf, tlf, flags = frame(stf, dtf, tlf)
            ndisp += 1
            assert not int(flags)
        assert nsub > 1  # the frame really loops substeps
        assert ndisp < nsub  # and the host paid fewer dispatches

        np.testing.assert_allclose(
            np.asarray(st.position), np.asarray(stf.position), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(st.velocity), np.asarray(stf.velocity), atol=1e-6
        )
        # final dt is the frame's (tiny, possibly negative) time
        # remainder — the reference's overshoot-rewind semantics
        # (sph_simulation.cpp:391-394); f32-vs-f64 timeleft accumulation
        # makes it match only absolutely
        assert float(dt) == pytest.approx(float(dtf), abs=1e-7)

    @pytest.mark.parametrize("exchange", ["all_gather", "ring"])
    def test_sharded_frame_cadence_matches_plain(self, exchange):
        """The cadenced sharded frame (sort_interval + cand_interval
        under the mesh, r4) must land within fp-noise distance of the
        rebuild-every-substep sharded frame: skipped sorts only change
        processing order, and the carried (dilated) candidate lists are
        supersets whose extras the exact r<h cutoff zeroes. The ring
        case additionally pins the carried SURFACE sets (the combined
        candidate table layout must stay stable across reuse substeps).
        """
        from libclsph_tpu.parallel.sharded_step import make_sharded_frame

        params = make_params(WATER, n=512)
        base = StepConfig(
            neighbor_impl="pallas", pallas_variant="nl",
            block_size=64, max_candidates=32,
            max_candidates_sub=96, max_candidates_hit=96,
        )
        cad = dataclasses.replace(
            base, sort_interval=2, cand_interval=2, cand_slack=0.3
        )
        mesh = make_mesh(jax.devices()[:8])
        state0 = shard_state(
            pad_for_mesh(init_state(params), params, mesh, base), mesh
        )
        dt0 = jnp.float32(params.max_dt)
        nb_local = state0.position.shape[0] // 8 // base.block_size
        kw = {}
        if exchange == "ring":
            kw = dict(halo_max=nb_local, halo_hops=4)

        def run(cfg):
            frame = make_sharded_frame(
                mesh, params, None, cfg, exchange=exchange, **kw
            )
            st, dt, tl = state0, dt0, jnp.float32(params.frame_time)
            while float(tl) > 0.0:
                st, dt, tl, flags = frame(st, dt, tl)
                assert not int(flags), int(flags)
            return st

        st_a = run(base)
        st_b = run(cad)

        # the cadenced run sorts less often, so final ROW ORDER differs
        # (per shard); compare as position-keyed sets like the other
        # mesh tests
        def keyed(st):
            pos = np.asarray(st.position)
            real = np.abs(pos).max(axis=1) < 1e30
            order = np.lexsort(np.round(pos[real], 5).T)
            return pos[real][order], np.asarray(st.velocity)[real][order]

        pa, va = keyed(st_a)
        pb, vb = keyed(st_b)
        np.testing.assert_allclose(pa, pb, atol=1e-4)
        np.testing.assert_allclose(va, vb, atol=1e-3)

    def test_multiple_steps_stable(self):
        params = make_params(WATER, n=512)
        cfg = StepConfig(neighbor_impl="tiles", block_size=64, max_candidates=32)
        mesh = make_mesh(jax.devices()[:4])
        state = pad_for_mesh(init_state(params), params, mesh, cfg)
        state = shard_state(state, mesh)
        step = make_sharded_substep(mesh, params, None, cfg)
        dt = jnp.float32(params.max_dt)
        for _ in range(5):
            state, dt, _ovf = step(state, dt)
        pos = np.asarray(state.position)
        real = np.abs(pos).max(axis=1) < 1e30
        assert np.isfinite(pos[real]).all()
        assert real.sum() == params.particles_count


class TestMortonPartition:
    def test_partition_is_permutation(self, rng):
        pos = rng.random((1000, 3)).astype(np.float32)
        order = morton_partition(pos, 8)
        assert sorted(order.tolist()) == list(range(1000))

    def test_shards_spatially_compact(self, rng):
        """After partitioning, per-shard bounding volumes should be much
        smaller than the global volume."""
        pos = rng.random((4096, 3)).astype(np.float32)
        order = morton_partition(pos, 8)
        shards = np.array_split(pos[order], 8)
        vol = lambda p: np.prod(p.max(0) - p.min(0) + 1e-9)
        total = vol(pos)
        mean_shard = np.mean([vol(s) for s in shards])
        assert mean_shard < total / 3


class TestHaloExchange:
    def test_halo_matches_all_gather(self):
        """Surface-block halo exchange must produce identical physics to
        the full all-gather exchange."""
        params = make_params(WATER, n=1024)
        cfg = StepConfig(
            neighbor_impl="tiles", block_size=64, max_candidates=32,
            adaptive_dt=False,
        )
        mesh = make_mesh(jax.devices()[:8])
        state0 = pad_for_mesh(init_state(params), params, mesh, cfg)
        state0 = shard_state(state0, mesh)
        dt = jnp.float32(params.max_dt)

        step_ag = make_sharded_substep(mesh, params, None, cfg)
        s_ag, dt_ag, ovf_ag = step_ag(state0, dt)
        assert not bool(ovf_ag)

        nb_local = state0.position.shape[0] // 8 // 64
        step_halo = make_sharded_substep(
            mesh, params, None, cfg, exchange="halo", halo_max=nb_local
        )
        s_h, dt_h, ovf_h = step_halo(state0, dt)
        assert not bool(ovf_h)

        np.testing.assert_allclose(
            np.asarray(s_ag.density), np.asarray(s_h.density), rtol=1e-6
        )
        a1 = np.asarray(s_ag.acceleration)
        a2 = np.asarray(s_h.acceleration)
        scale = np.abs(a1).max()
        np.testing.assert_allclose(a1, a2, atol=2e-5 * scale)
        assert float(dt_ag) == pytest.approx(float(dt_h), rel=1e-6)

    def test_ring_matches_all_gather(self):
        """ppermute ring exchange with full ring coverage (2*hops >=
        n_shards-1) must produce identical physics to all_gather."""
        params = make_params(WATER, n=1024)
        cfg = StepConfig(
            neighbor_impl="tiles", block_size=64, max_candidates=32,
            adaptive_dt=False,
        )
        mesh = make_mesh(jax.devices()[:8])
        state0 = pad_for_mesh(init_state(params), params, mesh, cfg)
        state0 = shard_state(state0, mesh)
        dt = jnp.float32(params.max_dt)

        step_ag = make_sharded_substep(mesh, params, None, cfg)
        s_ag, dt_ag, f_ag = step_ag(state0, dt)
        assert not int(f_ag)

        nb_local = state0.position.shape[0] // 8 // 64
        step_ring = make_sharded_substep(
            mesh, params, None, cfg, exchange="ring",
            halo_max=nb_local, halo_hops=4,
        )
        s_r, dt_r, f_r = step_ring(state0, dt)
        assert not int(f_r)

        np.testing.assert_allclose(
            np.asarray(s_ag.density), np.asarray(s_r.density), rtol=1e-6
        )
        a1 = np.asarray(s_ag.acceleration)
        a2 = np.asarray(s_r.acceleration)
        np.testing.assert_allclose(a1, a2, atol=2e-5 * np.abs(a1).max())
        assert float(dt_ag) == pytest.approx(float(dt_r), rel=1e-6)

    def test_ring_pallas_nl_matches(self):
        """Ring exchange + the production nl Pallas kernels."""
        params = make_params(WATER, n=1024)
        cfg = StepConfig(
            neighbor_impl="pallas", pallas_variant="nl", block_size=64,
            max_candidates=32, max_candidates_sub=96, adaptive_dt=False,
        )
        state0 = init_state(params)
        dt = jnp.float32(params.max_dt)
        s1, dt1, f1 = substep_jit(state0, dt, params, None, cfg)
        assert not int(f1)

        mesh = make_mesh(jax.devices()[:8])
        sp = pad_for_mesh(state0, params, mesh, cfg)
        sp = shard_state(sp, mesh)
        nb_local = sp.position.shape[0] // 8 // 64
        step = make_sharded_substep(
            mesh, params, None, cfg, exchange="ring",
            halo_max=nb_local, halo_hops=4,
        )
        s8, dt8, f8 = step(sp, dt)
        assert not int(f8)

        pos8 = np.asarray(s8.position)
        real = np.abs(pos8).max(axis=1) < 1e30
        assert real.sum() == params.particles_count

        def key(pos):
            q = np.round(np.asarray(pos, np.float64), 6)
            return np.lexsort(q.T)

        o1 = key(np.asarray(s1.position))
        o8 = key(pos8[real])
        np.testing.assert_allclose(
            np.asarray(s1.density)[o1],
            np.asarray(s8.density)[real][o8],
            rtol=1e-5,
        )
        assert float(dt1) == pytest.approx(float(dt8), rel=1e-5)

    def test_ring_insufficient_hops_flagged(self):
        """A compact blob split over 8 shards overlaps beyond 1 hop:
        FLAG_EXCHANGE must be raised instead of silently dropping
        neighbours."""
        from libclsph_tpu.engine.step import FLAG_EXCHANGE

        params = make_params(WATER, n=1024)
        cfg = StepConfig(
            neighbor_impl="tiles", block_size=64, max_candidates=32,
            adaptive_dt=False,
        )
        mesh = make_mesh(jax.devices()[:8])
        state0 = pad_for_mesh(init_state(params), params, mesh, cfg)
        state0 = shard_state(state0, mesh)
        nb_local = state0.position.shape[0] // 8 // 64
        step = make_sharded_substep(
            mesh, params, None, cfg, exchange="ring",
            halo_max=nb_local, halo_hops=1,
        )
        _, _, flags = step(state0, jnp.float32(params.max_dt))
        assert int(flags) & FLAG_EXCHANGE

    def test_halo_overflow_reported(self):
        params = make_params(WATER, n=1024)
        cfg = StepConfig(
            neighbor_impl="tiles", block_size=64, max_candidates=32,
            adaptive_dt=False,
        )
        mesh = make_mesh(jax.devices()[:8])
        state0 = pad_for_mesh(init_state(params), params, mesh, cfg)
        state0 = shard_state(state0, mesh)
        # halo_max=1 cannot hold the surface set of a dense blob
        step = make_sharded_substep(
            mesh, params, None, cfg, exchange="halo", halo_max=1
        )
        _, _, ovf = step(state0, jnp.float32(params.max_dt))
        assert bool(ovf)


class TestShardedEngine:
    def test_simulation_on_mesh(self, tmp_path):
        """Full SPHSimulation frame loop over the 8-device mesh."""
        import json as _json

        from libclsph_tpu.engine.simulation import SPHSimulation

        (tmp_path / "fluid_properties").mkdir()
        (tmp_path / "simulation_properties").mkdir()
        (tmp_path / "fluid_properties" / "water.json").write_text(
            _json.dumps(WATER)
        )
        (tmp_path / "simulation_properties" / "t.json").write_text(
            _json.dumps(
                dict(
                    particles_count=512,
                    particle_mass=0.05,
                    simulation_time=0.017,
                    target_fps=60,
                    simulation_scale=0.1,
                    write_all_frames=False,
                    serialize=False,
                    constant_acceleration=dict(x=0, y=-9.8, z=0),
                )
            )
        )
        mesh = make_mesh(jax.devices()[:8])
        sim = SPHSimulation(
            step_config=StepConfig(
                neighbor_impl="tiles", block_size=64, max_candidates=32
            ),
            mesh=mesh,
        )
        sim.load_settings(
            str(tmp_path / "fluid_properties" / "water.json"),
            str(tmp_path / "simulation_properties" / "t.json"),
        )
        sim.checkpoint_path = str(tmp_path / "ck.npz")
        saved = []
        sim.save_frame = lambda arrays, p: saved.append(arrays["position"].copy())
        sim.simulate()
        # initial + 2 frames (0, 1/60 < 0.017), each with exactly the
        # real particles
        assert len(saved) == 3
        assert saved[0].shape == (512, 3)
        assert np.isfinite(saved[-1]).all()
        assert saved[-1][:, 1].mean() < saved[0][:, 1].mean()  # fell

    def test_ring_halo_hops_autotune_on_crossing_stream(self, tmp_path):
        """Long-horizon ring soundness (r4 verdict #6): a sheared
        stream whose layers slide across >= 2 shard boundaries must
        COMPLETE under exchange='ring' halo_hops=1 — FLAG_EXCHANGE now
        grows halo_hops and re-runs the frame (engine autotune, r5)
        instead of raising. Shard ownership is static, so bulk cross-
        boundary flow is exactly the regime where 1-hop reach decays."""
        import json as _json

        from libclsph_tpu.engine.simulation import SPHSimulation

        (tmp_path / "f.json").write_text(_json.dumps(WATER))
        (tmp_path / "s.json").write_text(
            _json.dumps(
                dict(
                    particles_count=1024,
                    particle_mass=0.05,
                    simulation_time=0.05,
                    target_fps=60,
                    simulation_scale=0.1,
                    write_all_frames=False,
                    serialize=False,
                    constant_acceleration=dict(x=0, y=0, z=0),
                )
            )
        )
        mesh = make_mesh(jax.devices()[:8])
        cfg = StepConfig(
            neighbor_impl="tiles", block_size=64, max_candidates=32
        )
        sim = SPHSimulation(
            step_config=cfg, mesh=mesh, exchange="ring", halo_hops=1,
        )
        params = sim.load_settings(
            str(tmp_path / "f.json"), str(tmp_path / "s.json")
        )
        sim.checkpoint_path = str(tmp_path / "none.npz")
        nb_local = None  # default halo_max=0 => all local blocks

        # strong x-shear across y: layers slide multiple shard widths
        # over the run (cloud side ~0.37 m, dv ~8 m/s across it)
        base = init_state(params)
        y = np.asarray(base.position)[:, 1]
        shear = 9.0
        vel = np.zeros((params.particles_count, 3), np.float32)
        vel[:, 0] = shear * (y - y.mean())
        sheared = base.replace(
            velocity=jnp.asarray(vel),
            intermediate_velocity=jnp.asarray(vel),
        )
        sim.init_particles = lambda: sheared

        saved = []
        sim.save_frame = lambda arrays, p: saved.append(
            arrays["position"].copy()
        )
        sim.simulate()  # must not raise
        assert sim.halo_hops > 1, "stream never outran 1-hop reach"
        assert np.isfinite(saved[-1]).all()
        # the shear actually moved material sideways
        assert (
            np.ptp(saved[-1][:, 0]) > 1.25 * np.ptp(saved[0][:, 0])
        )

    def test_intermediate_frames_on_mesh(self, tmp_path):
        """write_all_frames on a mesh runs the per-substep path with
        sub-frame callbacks (sph_simulation.cpp:378-409 semantics) —
        previously silently per-frame only (r2 verdict missing #2)."""
        import json as _json

        from libclsph_tpu.engine.simulation import SPHSimulation

        (tmp_path / "f.json").write_text(_json.dumps(WATER))
        (tmp_path / "s.json").write_text(
            _json.dumps(
                dict(
                    particles_count=512,
                    particle_mass=0.05,
                    simulation_time=0.016,
                    target_fps=60,
                    simulation_scale=0.1,
                    write_all_frames=True,
                    serialize=False,
                    constant_acceleration=dict(x=0, y=-9.8, z=0),
                )
            )
        )
        mesh = make_mesh(jax.devices()[:8])
        sim = SPHSimulation(
            step_config=StepConfig(
                neighbor_impl="tiles", block_size=64, max_candidates=32
            ),
            mesh=mesh,
        )
        sim.load_settings(str(tmp_path / "f.json"), str(tmp_path / "s.json"))
        sim.checkpoint_path = str(tmp_path / "ck.npz")
        saved = []
        pre_calls = []
        sim.save_frame = lambda arrays, p: saved.append(arrays["position"].copy())
        sim.pre_frame = (
            lambda arrays, p, full: pre_calls.append(full) or False
        )
        sim.simulate()
        # initial save + one save per SUBSTEP (not per frame)
        assert len(saved) > 2
        # per-substep pre_frame callbacks ran with is_full_frame=False
        assert pre_calls and not all(pre_calls)
        assert all(s.shape == (512, 3) for s in saved)
        assert np.isfinite(saved[-1]).all()


class TestShardedRadixSort:
    @pytest.mark.parametrize("impl", ["radix", "radix-fused"])
    def test_sharded_step_radix_backend_bitexact(self, impl, monkeypatch):
        """The radix backends are stable drop-ins for lax.sort inside
        the shard_mapped step too: per-shard results are bit-identical
        to the XLA-sort sharded step."""
        from libclsph_tpu.ops import grid as grid_ops

        params = make_params(WATER, n=1024)
        cfg = StepConfig(
            neighbor_impl="tiles", block_size=64, max_candidates=32,
            adaptive_dt=False,
        )
        state0 = init_state(params)
        dt = jnp.float32(params.max_dt)
        mesh = make_mesh(jax.devices()[:8])
        sp = shard_state(pad_for_mesh(state0, params, mesh, cfg), mesh)

        s_xla, dt_xla, _ = make_sharded_substep(mesh, params, None, cfg)(sp, dt)
        monkeypatch.setattr(grid_ops, "_SORT_IMPL", impl)
        calls = []
        real_sort = grid_ops.radix_sort.radix_sort_key_val

        def spy(*a, **kw):
            calls.append(kw)
            return real_sort(*a, **kw)

        monkeypatch.setattr(grid_ops.radix_sort, "radix_sort_key_val", spy)
        s_rx, dt_rx, _ = make_sharded_substep(mesh, params, None, cfg)(sp, dt)
        assert calls and calls[0]["fused"] == (impl == "radix-fused")

        np.testing.assert_array_equal(
            np.asarray(s_xla.position), np.asarray(s_rx.position)
        )
        np.testing.assert_array_equal(
            np.asarray(s_xla.density), np.asarray(s_rx.density)
        )
        assert float(dt_xla) == float(dt_rx)


def test_bench_mesh_smoke(monkeypatch, capsys):
    """bench.py --mesh N (the v5e-8 scaling harness, VERDICT r3 #6) on
    the virtual CPU mesh: the sharded frame loop runs flag-clean and
    the jaxpr collective audit sees the exchange traffic — one command
    that produces the multi-chip number the day hardware exists."""
    import json
    import os
    import runpy
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    monkeypatch.chdir(root)
    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--n", "4096", "--steps", "3", "--mesh", "8",
        "--block-size", "64", "--max-candidates", "64",
        "--max-candidates-sub", "96", "--json-only",
        "--cand-interval", "2", "--sort-interval", "2",
    ])
    runpy.run_path(os.path.join(root, "bench.py"), run_name="__main__")
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["detail"]["timed_flags"] == 0
    colls = rec["detail"]["collectives_per_frame_dispatch"]
    assert colls.get("all_gather", 0) > 0  # the exchange
    assert colls.get("pmax", 0) > 0  # dt/bounds agreement
    assert rec["value"] > 0
