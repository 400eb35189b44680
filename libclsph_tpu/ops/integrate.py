"""Leapfrog advection and adaptive time-step computation.

Advection follows ``advect`` (libclsph/kernels/advection.cl:6-18) and
the velocity reconstruction of advection_collision (sphb.cl:128-223).
The time-step rule follows computeTimeStep (sph_simulation.cpp:536-605)
but runs **on device**: the reference performs two 2-stage OpenCL
reductions with blocking host reads per retry; here the max-reductions
are jnp folds inside the jitted substep, so the adaptive-dt retry loop
(sph_simulation.cpp:246-262) becomes a ``lax.while_loop`` with zero
host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.params import SimulationParameters

DT_MIN = 1e-5  # clamp floor (sph_simulation.cpp:600)
DT_RETRY_EPS = 1e-5  # retry threshold (sph_simulation.cpp:260)


class AdvectionResult(NamedTuple):
    old_position: jnp.ndarray
    new_position: jnp.ndarray
    next_velocity: jnp.ndarray


def advect(
    position: jnp.ndarray,
    intermediate_velocity: jnp.ndarray,
    acceleration: jnp.ndarray,
    dt: jnp.ndarray,
) -> AdvectionResult:
    """Leapfrog: v+ = v_inter + a dt; x+ = x + v+ dt (advection.cl:6-18)."""
    next_velocity = intermediate_velocity + acceleration * dt
    new_position = position + next_velocity * dt
    return AdvectionResult(position, new_position, next_velocity)


def reconstruct_velocities(
    intermediate_velocity_before: jnp.ndarray, next_velocity: jnp.ndarray
):
    """Full-step velocity = average of half-step velocities (sphb.cl:214-218).

    Returns (velocity, new_intermediate_velocity).
    """
    velocity = (intermediate_velocity_before + next_velocity) * 0.5
    return velocity, next_velocity


def compute_time_step(
    velocity: jnp.ndarray, acceleration: jnp.ndarray, params: SimulationParameters
) -> jnp.ndarray:
    """CFL-style dt from max velocity/acceleration (sph_simulation.cpp:536-605).

    dt = (sqrt(2 a_max h + v_max^2) - v_max) / (2 a_max),
    clamped to [1e-5, frame_time * simulation_scale].
    """
    max_vel2 = jnp.max(jnp.sum(velocity * velocity, axis=-1))
    max_accel = jnp.sqrt(jnp.max(jnp.sum(acceleration * acceleration, axis=-1)))
    max_vel = jnp.sqrt(max_vel2)
    # Guard a_max == 0 (pure coasting): dt formula degenerates, clamp below.
    safe_accel = jnp.maximum(max_accel, 1e-12)
    dt = (jnp.sqrt(2.0 * safe_accel * params.h + max_vel2) - max_vel) / (
        2.0 * safe_accel
    )
    return jnp.clip(dt, DT_MIN, params.max_dt)
