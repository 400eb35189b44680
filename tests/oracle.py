"""Slow, independent NumPy oracle for the SPH numerics.

A straight O(N^2) float64 transcription of the governing equations the
reference implements (Mueller-03 SPH with Tait EOS, Kelager-06 (4.11)
symmetrised pressure, colour-field surface tension, leapfrog) — used as
the golden source for unit/integration tests. Deliberately written in
the most naive possible style, with no shared code with the framework.
"""

from __future__ import annotations

import math

import numpy as np


def coefficients(h: float) -> dict:
    return dict(
        poly6=315.0 / (64.0 * math.pi * h**9),
        poly6_grad=-945.0 / (32.0 * math.pi * h**9),
        poly6_lap=-945.0 / (32.0 * math.pi * h**9),
        spiky=-45.0 / (math.pi * h**6),
        visc=45.0 / (math.pi * h**6),
    )


def density_pressure(pos, mass, h, rho0, K):
    n = len(pos)
    c = coefficients(h)
    rho = np.zeros(n)
    for i in range(n):
        for j in range(n):
            r = np.linalg.norm(pos[i] - pos[j])
            if r < h:
                rho[i] += mass * c["poly6"] * (h * h - r * r) ** 3
    p = K * ((rho / rho0) ** 7 - 1.0)
    return rho, p


def accelerations(
    pos, vel, rho, p, mass, h, mu, sigma, sigma_threshold, gravity, eps=1e-7
):
    n = len(pos)
    c = coefficients(h)
    acc = np.zeros((n, 3))
    for i in range(n):
        press = np.zeros(3)
        visc = np.zeros(3)
        normal = np.zeros(3)
        lap = 0.0
        for j in range(n):
            rv = pos[i] - pos[j]
            r = np.linalg.norm(rv)
            if r >= h:
                continue
            if j != i:
                coeff = p[j] / rho[j] ** 2 + p[i] / rho[i] ** 2
                if r < eps:
                    sg = np.full(3, c["spiky"])
                else:
                    sg = c["spiky"] * (rv / r) * (h - r) ** 2
                press += coeff * mass * sg
                visc += (vel[j] - vel[i]) * (mass / rho[j]) * c["visc"] * (h - r)
            normal += mass / rho[j] * c["poly6_grad"] * rv * (h * h - r * r) ** 2
            lap += (
                mass
                / rho[j]
                * c["poly6_lap"]
                * (h * h - r * r)
                * (3 * h * h - 7 * r * r)
            )
        total = -rho[i] * press + mu * visc
        nlen = np.linalg.norm(normal)
        if nlen > sigma_threshold:
            total += -sigma * lap * normal / nlen
        acc[i] = total / rho[i] + gravity
    return acc


def leapfrog(pos, v_inter, acc, dt):
    v_next = v_inter + acc * dt
    new_pos = pos + v_next * dt
    vel = (v_inter + v_next) / 2.0
    return new_pos, vel, v_next


def time_step(vel, acc, h, dt_min, dt_max):
    max_v2 = max((v @ v for v in vel), default=0.0)
    max_a = math.sqrt(max((a @ a for a in acc), default=0.0))
    max_v = math.sqrt(max_v2)
    dt = (math.sqrt(2 * max(max_a, 1e-12) * h + max_v2) - max_v) / (
        2 * max(max_a, 1e-12)
    )
    return float(np.clip(dt, dt_min, dt_max))
