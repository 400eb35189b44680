"""Host-side simulation orchestration — the ``sph_simulation`` class.

API parity with the reference (libclsph/sph_simulation.h:8-28):
``load_settings(fluid_json, sim_json)``, ``simulate()``, ``parameters``,
``precomputed_terms``, ``pre_frame`` / ``save_frame`` / ``post_frame``
callbacks, ``write_intermediate_frames``, ``serialize``,
``current_scene``, ``initial_volume``.

The structural differences are the TPU-native wins:

* the whole substep — including grid rebuild, sort and the adaptive-dt
  retry loop — is one jitted device program (engine/step.py), and when
  no per-substep callbacks are installed the *entire frame* substep
  loop runs on device (`frame_jit`), so device<->host traffic is one
  state fetch per saved frame instead of 4+ blocking reads per substep
  (sph_simulation.cpp:202/:259);
* frame export runs on a background thread exactly like the
  reference's ``std::thread`` overlap (sph_simulation.cpp:370-430);
* callbacks receive host NumPy views of the SoA state and may mutate
  them; returning True uploads the modified state back to the device —
  the same contract as executePreFrameOpperation
  (sph_simulation.cpp:730-768).
"""

from __future__ import annotations

import dataclasses
import time as _time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import params as params_mod
from ..core.params import PrecomputedKernelValues, SimulationParameters
from ..core.state import ParticleState, init_state
from ..io import checkpoint as ckpt_mod
from ..io.async_saver import AsyncSaver
from ..ops import collisions as collisions_ops
from ..scene.scene import Scene
from ..utils.logging import get_logger
from .step import (
    FLAG_CAND_STALE,
    FLAG_CAPACITY,
    FLAG_CAPACITY_HIT,
    FLAG_CAPACITY_SUB,
    FLAG_CAPACITY_T2,
    FLAG_EXCHANGE,
    FLAG_GRID_DIM,
    FLAGS_ALL_CAPACITY,
    StepConfig,
    frame_jit,
    substep_jit,
)

MAX_CAPACITY_RETRIES = 6

log = get_logger(__name__)

# host-side callback signatures:
#   pre_frame(arrays: dict, params, is_full_frame) -> bool (True = write back)
#   save_frame(arrays: dict, params) -> None
#   post_frame(arrays: dict, params, is_full_frame) -> bool
Callback = Callable[[dict, SimulationParameters, bool], bool]
SaveCallback = Callable[[dict, SimulationParameters], None]
# device-side view hook: device_view(state: ParticleState, params, True)
# receives the DEVICE-resident state each frame (no host fetch) — e.g.
# io/render.PointRenderer renders on the accelerator and only the
# pixels cross to the host (the TPU-native form of the reference's GL
# viewer, example/opengl.cpp:121-148)
DeviceView = Callable[[ParticleState, SimulationParameters, bool], None]


class SPHSimulation:
    def __init__(
        self,
        step_config: Optional[StepConfig] = None,
        mesh=None,
        exchange: str = "all_gather",
        halo_max: int = 0,
        halo_hops: int = 1,
        pretune: bool | str = "auto",
    ):
        """``mesh``: a 1-D ``jax.sharding.Mesh`` to run multi-chip —
        the state is Morton-partitioned across devices and every
        substep runs under shard_map (parallel/sharded_step.py).
        ``exchange`` ('all_gather' | 'halo' | 'ring') / ``halo_max`` /
        ``halo_hops`` pick the neighbour-exchange strategy.
        ``pretune``: run the init-state capacity probe
        (engine/pretune.py) before the first compile so deep-column
        scenes don't pay a mid-run capacity recompile. ``'auto'``
        (default) probes when a recompile would be expensive
        (particles_count >= 200k); True/False force it. Single-chip
        only (the sharded path keeps the reactive autotune).
        """
        self.parameters: Optional[SimulationParameters] = None
        self.precomputed_terms: Optional[PrecomputedKernelValues] = None
        self.initial_volume: float = 0.0
        self.write_intermediate_frames = False
        self.serialize = False
        self.current_scene: Optional[Scene] = None
        self.pre_frame: Optional[Callback] = None
        self.save_frame: Optional[SaveCallback] = None
        self.post_frame: Optional[Callback] = None
        self.device_view: Optional[DeviceView] = None
        self.step_config = step_config or StepConfig()
        if (
            self.step_config.cand_interval > 1
            and mesh is not None
            and self.step_config.neighbor_impl != "pallas"
        ):
            raise ValueError(
                "sharded cand_interval > 1 requires the pallas impl "
                "(the carried refined lists are an nl-kernel feature)"
            )
        self.capacity_retries = 0
        self.pretune = pretune
        self.checkpoint_path = ckpt_mod.DEFAULT_CHECKPOINT
        self.mesh = mesh
        self.exchange = exchange
        self.halo_max = halo_max
        self.halo_hops = halo_hops
        # filled by simulate()
        self.state: Optional[ParticleState] = None
        self.device_scene = None

    # ------------------------------------------------------------------
    def load_settings(self, fluid_file_name: str, parameters_file_name: str):
        """Parse the two JSON configs (sph_simulation.cpp:434-532)."""
        p = params_mod.load_parameters(fluid_file_name, parameters_file_name)
        self.parameters = p
        self.precomputed_terms = p.precomputed()
        self.initial_volume = p.initial_volume
        self.write_intermediate_frames = p.write_all_frames
        self.serialize = p.serialize
        return p

    def load_scene(self, filename: str, scenes_dir: str = "scenes"):
        """scene::load with threshold 2h (example/particles.cpp:67)."""
        assert self.parameters is not None, "call load_settings first"
        self.current_scene = Scene.load(
            filename, self.parameters.h * 2.0, scenes_dir=scenes_dir
        )
        return self.current_scene

    # ------------------------------------------------------------------
    def init_particles(self) -> ParticleState:
        """Checkpoint resume or cube lattice (sph_simulation.cpp:52-98)."""
        p = self.parameters
        arrays = None
        try:
            arrays = ckpt_mod.load_checkpoint(self.checkpoint_path, p)
        except ValueError as e:
            raise RuntimeError(str(e))
        if arrays is not None:
            log.info("resuming from %s", self.checkpoint_path)
            return ParticleState(
                position=jnp.asarray(arrays["position"]),
                velocity=jnp.asarray(arrays["velocity"]),
                intermediate_velocity=jnp.asarray(arrays["intermediate_velocity"]),
                acceleration=jnp.asarray(arrays["acceleration"]),
                density=jnp.asarray(arrays["density"]),
                pressure=jnp.asarray(arrays["pressure"]),
                grid_index=jnp.asarray(arrays["grid_index"]),
            )
        side = self.initial_volume ** (1.0 / 3.0)
        log.info(
            "volume: %g side_length: %g", self.initial_volume, side
        )
        return init_state(p)

    # ------------------------------------------------------------------
    def _fetch(self, state: ParticleState) -> dict:
        return ckpt_mod.state_to_arrays(jax.block_until_ready(state))

    def _upload(self, arrays: dict) -> ParticleState:
        return ParticleState(
            position=jnp.asarray(arrays["position"], jnp.float32),
            velocity=jnp.asarray(arrays["velocity"], jnp.float32),
            intermediate_velocity=jnp.asarray(
                arrays["intermediate_velocity"], jnp.float32
            ),
            acceleration=jnp.asarray(arrays["acceleration"], jnp.float32),
            density=jnp.asarray(arrays["density"], jnp.float32),
            pressure=jnp.asarray(arrays["pressure"], jnp.float32),
            grid_index=jnp.asarray(arrays["grid_index"], jnp.uint32),
        )

    def _grow_capacity(self, flags: int):
        """Neighbour-capacity autotune: a substep reported that a
        static candidate/cell capacity truncated real neighbours.
        Double ONLY the overflowing table(s) — the capacity bits are
        reported separately (engine/step.py FLAG_CAPACITY*) because a
        coupled doubling re-grows every gather volume at once (measured
        ~25% throughput loss at 2M when a block-cap overflow also
        doubled the sub/hit tables). Recompile (new StepConfig = new
        jit cache entry); the caller re-runs the frame from its saved
        pre-frame state, so no corrupted step is ever kept."""
        cfg = self.step_config
        self.capacity_retries += 1
        if self.capacity_retries > MAX_CAPACITY_RETRIES:
            raise RuntimeError(
                "neighbour capacity keeps overflowing; the particle "
                "distribution is degenerate (all particles in one cell?)"
            )
        if cfg.neighbor_impl in ("tiles", "pallas"):
            updates = {}
            # two-tier routing is available on the production shape
            # (nl kernels at whole-block query rows, engine/step.py)
            can_t2 = (
                cfg.neighbor_impl == "pallas"
                and cfg.pallas_variant == "nl"
                and cfg.nl_query_rows >= cfg.block_size
                # r4: tier2 composes with density_sub16 (c16_all mode
                # — both tiers run the 16-granular kernels) and with
                # candidate reuse (the carry is the tier-2-width table)
            )
            if flags & FLAG_CAPACITY:
                updates["max_candidates"] = cfg.max_candidates * 2
            if flags & FLAG_CAPACITY_SUB:
                if can_t2 and cfg.tier2_frac == 0:
                    # first overflow: route the heavy tail to a tier-2
                    # pool instead of doubling EVERY block's gather/DMA
                    # volume (tiles.route_overflow)
                    updates["tier2_frac"] = 8
                elif cfg.tier2_frac > 0:
                    updates["tier2_mult"] = cfg.tier2_mult * 2
                else:
                    updates["max_candidates_sub"] = cfg.max_candidates_sub * 2
            if flags & FLAG_CAPACITY_T2:
                updates["tier2_frac"] = max(1, cfg.tier2_frac // 2)
            if flags & FLAG_CAPACITY_HIT:
                if cfg.force_sub8 and cfg.max_candidates_hit8 < 160:
                    # sub-8 hit shortfall: grow in 32-slot (2-tile)
                    # steps — capacity IS streamed bytes, and a
                    # doubling measured +33 ms/substep at 2M. Past 160
                    # slots the distribution is in the deep-column
                    # regime; fall through to the c16->q downgrade.
                    updates["max_candidates_hit8"] = (
                        cfg.max_candidates_hit8 + 32
                    )
                elif cfg.force_sub16 and cfg.force_query_rows == 32:
                    # Deep-column signature: the 16-granular hit tables
                    # overflowing their cap marks the regime where the
                    # c16 kernels were MEASURED to lose to the
                    # q-granular scale config — river at 1M ran 25.5
                    # s/frame after a global hit16 doubling vs 5.80 on
                    # the q128 path (r4_deliver.log), and the doubling
                    # itself costs +22 ms/substep of dead-capacity
                    # streaming even at 1M-cube (r4_results.jsonl
                    # hit16cap128). Downgrade to the q-granular kernels
                    # instead of doubling; the frame re-runs from its
                    # saved pre-frame state either way, and a later
                    # q-table overflow grows max_candidates_hit below.
                    updates["force_sub16"] = False
                    updates["density_sub16"] = False
                    updates["force_sub8"] = False
                else:
                    updates["max_candidates_hit"] = cfg.max_candidates_hit * 2
            cfg = dataclasses.replace(cfg, **updates)
            grown = updates
        else:
            cfg = dataclasses.replace(cfg, cell_capacity=cfg.cell_capacity * 2)
            grown = {"cell_capacity": cfg.cell_capacity}
        log.warning(
            "neighbour capacity overflow - growing %s and re-running frame",
            grown,
        )
        self.step_config = cfg

    def _needs_rerun(self, flags) -> bool:
        """Interpret the substep's status bitfield. Returns True when
        the frame must be re-run (neighbour capacity grown); raises on
        unrecoverable conditions."""
        f = int(flags)
        if f & FLAG_GRID_DIM:
            raise RuntimeError(
                "simulation grid too large: a grid axis reached the "
                "1024-cell Morton limit (reference aborts here too, "
                "sph_simulation.cpp:722-724) or outgrew a reduced "
                "LIBCLSPH_TPU_SORT_BITS key width; check dt / fluid "
                "stiffness, or raise the sort bits"
            )
        rerun = False
        if f & FLAG_EXCHANGE:
            # ring exchange under-reach is a capacity condition like any
            # other: grow halo_hops and re-run the frame (r5; previously
            # raised). Hop budgets saturate at full ring coverage
            # ((S+1)//2 per direction) where the reach check can no
            # longer fire — long flow-through runs under static shard
            # ownership decay toward that bound by design
            # (parallel/sharded_step.py ownership note).
            n_shards = self.mesh.devices.size if self.mesh is not None else 1
            max_hops = (n_shards + 1) // 2
            if self.halo_hops >= max_hops:
                raise RuntimeError(
                    "ring halo exchange out of reach at full ring "
                    "coverage — this indicates an exchange bug, not a "
                    "capacity shortfall"
                )
            # no capacity_retries charge: growth is already bounded by
            # max_hops (at most log2(S) growths ever)
            self.halo_hops = min(max_hops, max(self.halo_hops * 2, 1))
            log.warning(
                "ring exchange under-reach - growing halo_hops to %d "
                "and re-running frame", self.halo_hops,
            )
            rerun = True
        if f & FLAGS_ALL_CAPACITY:
            self._grow_capacity(f)
            rerun = True
        if f & FLAG_CAND_STALE:
            # reused candidate lists outran their slack margin mid-
            # frame: the flagged substep may have missed pairs, so the
            # frame re-runs from its saved state with a doubled margin
            # (same exactness protocol as a capacity overflow)
            self.capacity_retries += 1
            if self.capacity_retries > MAX_CAPACITY_RETRIES:
                raise RuntimeError(
                    "candidate-reuse slack keeps overflowing; set "
                    "cand_interval=1 for this workload"
                )
            cfg = self.step_config
            self.step_config = dataclasses.replace(
                cfg, cand_slack=cfg.cand_slack * 2
            )
            log.warning(
                "candidate reuse outran its slack margin - growing "
                "cand_slack to %g and re-running frame",
                self.step_config.cand_slack,
            )
            rerun = True
        return rerun

    def _save(self, saver: AsyncSaver, arrays: dict):
        p = self.parameters
        save_cb = self.save_frame
        ckpt = self.checkpoint_path if self.serialize else None

        def run():
            save_cb(arrays, p)
            if ckpt:
                ckpt_mod.save_checkpoint(ckpt, arrays, p)

        saver.submit(run)

    def _save_deferred(self, saver: AsyncSaver, state, fetch):
        """Like _save, but the device->host fetch itself runs on the
        saver thread, overlapping the transfer with the next frame's
        dispatch (the functional step never mutates ``state``'s
        buffers, so the snapshot stays valid; frame_jit deliberately
        has no donate_argnums). Through a tunneled device the fetch is
        seconds per 1M frame — previously paid inline in the loop."""
        p = self.parameters
        save_cb = self.save_frame
        ckpt = self.checkpoint_path if self.serialize else None

        def run():
            arrays = fetch(state)
            save_cb(arrays, p)
            if ckpt:
                ckpt_mod.save_checkpoint(ckpt, arrays, p)

        saver.submit(run)

    # ------------------------------------------------------------------
    def _simulate_sharded(self) -> float:
        """Multi-chip frame loop: substeps run under shard_map over
        ``self.mesh``.

        Mirrors the single-chip loop's two paths:
        * fast path (no ``write_intermediate_frames``) — the whole
          frame substep loop runs on device (`make_sharded_frame`, the
          shard_map twin of `frame_jit`): the host fetches ONE timeleft
          scalar per dispatch instead of one dt per substep;
        * slow path — per-substep dispatch honouring per-substep
          ``pre_frame`` / ``save_frame`` / ``post_frame`` callbacks
          (sph_simulation.cpp:378-409 semantics), like the single-chip
          engine.
        """
        from ..parallel.mesh import particle_sharding
        from ..parallel.sharded_step import (
            make_sharded_frame,
            make_sharded_substep,
            pad_for_mesh,
        )

        # cadence (sort_interval / cand_interval) runs under the mesh
        # since r4: shard ownership is static (particles never migrate
        # between shards — pad_for_mesh partitions once and the halo
        # machinery covers cross-shard neighbours), so skipped local
        # sorts and carried candidate state are exactly as safe as on
        # a single chip (parallel/sharded_step._local_substep).
        p = self.parameters
        t_start = _time.perf_counter()
        self.device_scene = collisions_ops.build_device_scene(self.current_scene)
        saver = AsyncSaver()

        if self.exchange in ("halo", "ring") and not self.halo_max:
            # default surface budget: every local block may be surface
            # (the CLI applies the same substitution; halo_max=0 would
            # otherwise overflow the surface set on every substep)
            chunk = self.mesh.devices.size * self.step_config.block_size
            padded = -(-p.particles_count // chunk) * chunk
            self.halo_max = padded // chunk

        state = self.init_particles()
        state = pad_for_mesh(state, p, self.mesh, self.step_config)
        sharding = particle_sharding(self.mesh)
        state = jax.tree.map(lambda a: jax.device_put(a, sharding), state)

        def build(maker):
            return maker(
                self.mesh, p, self.device_scene, self.step_config,
                exchange=self.exchange, halo_max=self.halo_max,
                halo_hops=self.halo_hops,
            )

        def fetch_real(st) -> dict:
            arrays = ckpt_mod.state_to_arrays(jax.block_until_ready(st))
            real = np.abs(arrays["position"]).max(axis=1) < 1.0e30
            return {k: v[real] for k, v in arrays.items()}

        def reupload(arrays):
            # re-partition the mutated state across the mesh
            st = self._upload(arrays)
            st = pad_for_mesh(st, p, self.mesh, self.step_config)
            return jax.tree.map(lambda a: jax.device_put(a, sharding), st)

        timeperframe = p.frame_time
        dt = jnp.float32(timeperframe * p.simulation_scale)
        sim_time = 0.0
        current_frame = 2

        fast_path = not self.write_intermediate_frames
        frame_fn = build(make_sharded_frame) if fast_path else None
        step = build(make_sharded_substep) if not fast_path else None

        if self.device_view:  # initial frame (like the initial save)
            self.device_view(state, p, True)
        if self.save_frame:
            self._save(saver, fetch_real(state))

        while sim_time < p.simulation_time:
            log.info("Simulating frame %d (%gs)", current_frame, sim_time)
            if fast_path and self.pre_frame:
                arrays = fetch_real(state)
                if self.pre_frame(arrays, p, True):
                    state = reupload(arrays)

            if fast_path:
                while True:
                    st_try, dt_try = state, dt
                    timeleft = jnp.float32(timeperframe)
                    rerun = False
                    while float(timeleft) > 0.0:
                        st_try, dt_try, timeleft, flags = frame_fn(
                            st_try, dt_try, timeleft
                        )
                        if self._needs_rerun(flags):
                            frame_fn = build(make_sharded_frame)
                            rerun = True
                            break
                    if not rerun:
                        state, dt = st_try, dt_try
                        break
            else:
                timeleft = timeperframe
                while timeleft > 0.0:
                    if self.pre_frame:
                        arrays = fetch_real(state)
                        if self.pre_frame(arrays, p, False):
                            state = reupload(arrays)
                    # substep-granular retry: the jitted step never
                    # commits on overflow (state input unchanged)
                    while True:
                        new_state, dt_dev, flags = step(state, dt)
                        if not self._needs_rerun(flags):
                            state = new_state
                            break
                        step = build(make_sharded_substep)
                    dt_f = float(dt_dev)
                    timeleft -= dt_f
                    dt = jnp.float32(
                        min(dt_f, timeleft) if timeleft < dt_f else dt_f
                    )
                    log.debug("frame time remaining: %g", timeleft)
                    if self.save_frame:
                        self._save_deferred(saver, state, fetch_real)
                    if self.post_frame:
                        arrays = fetch_real(state)
                        if self.post_frame(arrays, p, False):
                            state = reupload(arrays)

            sim_time += timeperframe
            current_frame += 1
            if self.device_view:
                self.device_view(state, p, True)
            if self.save_frame:
                # the saver thread fetches + owns its own snapshot
                self._save_deferred(saver, state, fetch_real)
            if self.post_frame:
                arrays = fetch_real(state)
                if self.post_frame(arrays, p, True):
                    state = reupload(arrays)

        saver.close()
        self.state = state
        return _time.perf_counter() - t_start

    # ------------------------------------------------------------------
    def simulate(self) -> float:
        """The frame loop (sph_simulation.cpp:265-432). Returns the
        simulated wall-clock seconds."""
        assert self.parameters is not None, "call load_settings first"
        if self.mesh is not None:
            return self._simulate_sharded()
        p = self.parameters

        t_start = _time.perf_counter()
        self.device_scene = collisions_ops.build_device_scene(self.current_scene)
        state = self.init_particles()
        want_pretune = (
            self.pretune is True
            or (self.pretune == "auto" and p.particles_count >= 200_000)
        )
        if want_pretune:
            from . import pretune as pretune_mod

            self.step_config, _stats = pretune_mod.pretune_config(
                state, p, self.step_config
            )
        saver = AsyncSaver()

        timeperframe = p.frame_time
        dt = jnp.float32(timeperframe * p.simulation_scale)
        sim_time = 0.0
        current_frame = 2  # reference starts at 2 (sph_simulation.cpp:365)

        arrays = None  # host cache of the current state
        if self.device_view:  # initial frame (like the initial save)
            self.device_view(state, p, True)
        if self.save_frame:
            self._save(saver, self._fetch(state))

        fast_path = not self.write_intermediate_frames

        while sim_time < p.simulation_time:
            log.info("Simulating frame %d (%gs)", current_frame, sim_time)

            if fast_path and self.pre_frame:
                if arrays is None:
                    arrays = self._fetch(state)
                if self.pre_frame(arrays, p, True):
                    state = self._upload(arrays)

            if fast_path:
                # whole frame on device — substeps_per_dispatch steps
                # per dispatch (bounded against dt-floor blowups); one
                # scalar (timeleft) read back per dispatch
                while True:
                    st_try, dt_try = state, dt
                    timeleft = jnp.float32(p.frame_time)
                    rerun = False
                    while float(timeleft) > 0.0:
                        st_try, dt_try, timeleft, flags = frame_jit(
                            st_try, dt_try, timeleft, p,
                            self.device_scene, self.step_config,
                        )
                        if self._needs_rerun(flags):
                            rerun = True
                            break
                    if not rerun:
                        state, dt = st_try, dt_try
                        break
                arrays = None
            else:
                timeleft = timeperframe
                while timeleft > 0.0:
                    if self.pre_frame:
                        if arrays is None:
                            arrays = self._fetch(state)
                        if self.pre_frame(arrays, p, False):
                            state = self._upload(arrays)
                    while True:
                        # the slow (per-substep callback) path rebuilds
                        # candidates every substep — host callbacks can
                        # mutate positions between substeps, which would
                        # silently stale any carried tables
                        out = substep_jit(
                            state, dt, p, self.device_scene, self.step_config
                        )
                        new_state, dt_dev, flags = out[:3]
                        if not self._needs_rerun(flags):
                            state = new_state
                            break
                    arrays = None
                    dt_f = float(dt_dev)
                    timeleft -= dt_f
                    dt = jnp.float32(min(dt_f, timeleft) if timeleft < dt_f else dt_f)
                    log.debug("frame time remaining: %g", timeleft)
                    if self.save_frame:
                        self._save_deferred(saver, state, self._fetch)
                        # the saver thread fetches its own snapshot
                        arrays = None
                    if self.post_frame:
                        if arrays is None:
                            arrays = self._fetch(state)
                        if self.post_frame(arrays, p, False):
                            state = self._upload(arrays)
                            arrays = None

            sim_time += timeperframe
            current_frame += 1

            if self.device_view:
                self.device_view(state, p, True)
            if fast_path and self.save_frame:
                # the saver thread fetches + owns its own snapshot
                self._save_deferred(saver, state, self._fetch)
                arrays = None
            if fast_path and self.post_frame:
                if arrays is None:
                    arrays = self._fetch(state)
                if self.post_frame(arrays, p, True):
                    state = self._upload(arrays)
                    arrays = None

        saver.close()
        self.state = state
        return _time.perf_counter() - t_start
