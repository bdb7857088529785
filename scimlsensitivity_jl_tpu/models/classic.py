"""Classic benchmark problems (the reference's canonical test fleet:
Lotka-Volterra, Robertson, Lorenz, linear scalar, bouncing ball — SURVEY §4).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..problems import ODEProblem

__all__ = [
    "lotka_volterra",
    "lotka_volterra_problem",
    "robertson",
    "robertson_problem",
    "lorenz",
    "lorenz_problem",
]


def lotka_volterra(u, p, t):
    x, y = u[0], u[1]
    a, b, c, d = p[0], p[1], p[2], p[3]
    return jnp.stack([a * x - b * x * y, -c * y + d * x * y])


def lotka_volterra_problem(tspan=(0.0, 10.0)):
    return ODEProblem(
        lotka_volterra,
        jnp.array([1.0, 1.0]),
        tspan,
        jnp.array([1.5, 1.0, 3.0, 1.0]),
    )


def robertson(u, p, t):
    y1, y2, y3 = u[0], u[1], u[2]
    k1, k2, k3 = p[0], p[1], p[2]
    return jnp.stack([
        -k1 * y1 + k3 * y2 * y3,
        k1 * y1 - k2 * y2 ** 2 - k3 * y2 * y3,
        k2 * y2 ** 2,
    ])


def robertson_problem(tspan=(0.0, 1e4)):
    return ODEProblem(
        robertson, jnp.array([1.0, 0.0, 0.0]), tspan, jnp.array([0.04, 3e7, 1e4])
    )


def lorenz(u, p, t):
    x, y, z = u[0], u[1], u[2]
    sigma, rho, beta = p[0], p[1], p[2]
    return jnp.stack([sigma * (y - x), x * (rho - z) - y, x * y - beta * z])


def lorenz_problem(tspan=(0.0, 10.0), rho=28.0):
    return ODEProblem(
        lorenz, jnp.array([1.0, 0.0, 0.0]), tspan,
        jnp.array([10.0, rho, 8.0 / 3.0]),
    )
