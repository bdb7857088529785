"""Method-of-lines PDE model fleet (reference examples:
docs/src/examples/pde/pde_constrained.md — 1-D heat-equation parameter
estimation; docs/src/examples/pde/brusselator.md — 2-D Brusselator).

TPU-first notes: fields are written as shift/stencil expressions over the
full grid (XLA fuses them into a handful of kernels; the MXU is not the
bottleneck — HBM streaming is), states stay flat vectors / (N, N, 2)
arrays so every sensealg's flat-state machinery applies unchanged, and
large grids can ride `NamedSharding` through the solver loops
(tests/test_parallel.py sharded-state adjoint).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..problems import ODEProblem

__all__ = [
    "heat1d_field",
    "heat1d_problem",
    "brusselator_2d_field",
    "brusselator_2d_problem",
]


def _d2dx(u, dx):
    """2nd-order central second derivative, zero at the boundary rows (the
    reference's d2dx, pde_constrained.md)."""
    interior = (u[2:] - 2.0 * u[1:-1] + u[:-2]) / (dx * dx)
    z = jnp.zeros((1,), u.dtype)
    return jnp.concatenate([z, interior, z])


def heat1d_field(dx):
    """u̇ = 2 a₀ u + a₁ ∂²u/∂x² with p = [a₀, a₁] (the reference's
    PDE-constrained optimization target, pde_constrained.md:45-50)."""

    def field(u, p, t):
        return 2.0 * p[0] * u + p[1] * _d2dx(u, dx)

    return field


def heat1d_problem(nx: int = 200, Lx: float = 10.0, T: float = 0.5,
                   p=None, dtype=jnp.float64):
    x = jnp.linspace(0.0, Lx, nx, dtype=dtype)
    dx = float(x[1] - x[0])
    u0 = jnp.exp(-((x - 3.0) ** 2))
    p = jnp.asarray([1.0, 1.0], dtype) if p is None else p
    return ODEProblem(heat1d_field(dx), u0, (0.0, T), p), x


def brusselator_2d_field(n: int, alpha: float = 10.0):
    """2-D Brusselator on an n×n periodic grid (brusselator.md):

        u̇ = B + u²v − (A+1)u + α∇²u + f(x,y,t)
        v̇ = Au − u²v + α∇²v

    state (n, n, 2); p = [A, B]. The forcing f matches the reference (a
    disc source switched on at t ≥ 1.1)."""
    dx = 1.0 / n
    inv_dx2 = 1.0 / (dx * dx)
    xs = jnp.linspace(0.0, 1.0, n, endpoint=False)
    X, Y = jnp.meshgrid(xs, xs, indexing="ij")

    def lap(w):
        return (
            jnp.roll(w, 1, 0) + jnp.roll(w, -1, 0)
            + jnp.roll(w, 1, 1) + jnp.roll(w, -1, 1) - 4.0 * w
        ) * inv_dx2

    def field(state, p, t):
        u, v = state[..., 0], state[..., 1]
        A, B = p[0], p[1]
        force = jnp.where(
            ((X - 0.3) ** 2 + (Y - 0.6) ** 2 <= 0.01) & (t >= 1.1), 5.0, 0.0
        )
        du = B + u * u * v - (A + 1.0) * u + alpha * lap(u) + force
        dv = A * u - u * u * v + alpha * lap(v)
        return jnp.stack([du, dv], axis=-1)

    return field


def brusselator_2d_problem(n: int = 32, T: float = 2.0, p=None,
                           alpha: float = 10.0, dtype=jnp.float64):
    xs = jnp.linspace(0.0, 1.0, n, endpoint=False, dtype=dtype)
    X, Y = jnp.meshgrid(xs, xs, indexing="ij")
    u0 = 22.0 * (Y * (1.0 - Y)) ** 1.5
    v0 = 27.0 * (X * (1.0 - X)) ** 1.5
    state0 = jnp.stack([u0, v0], axis=-1)
    p = jnp.asarray([3.4, 1.0], dtype) if p is None else p
    return ODEProblem(brusselator_2d_field(n, alpha), state0, (0.0, T), p)
