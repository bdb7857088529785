"""Rosenbrock23 — Shampine's 2(3) Rosenbrock-W method (ode23s family).

The reference's workhorse for small stiff systems (BASELINE config 2 uses it
on Robertson; the reference delegates to OrdinaryDiffEq's Rosenbrock23 —
SURVEY §2 "Native components" item 4). One Jacobian and one LU per step,
three triangular solves; J = ∂f/∂u via `jax.jacfwd` (n forward columns in
one batched sweep) and the time derivative ∂f/∂t via one `jax.jvp` — no
finite-difference Jacobians anywhere.

Scheme (d = 1/(2+√2), W = I - h·d·J):
    k1 = W⁻¹ (f(y) + h·d·T)
    F1 = f(t+h/2, y + h/2·k1)
    k2 = k1 + W⁻¹ (F1 - k1)
    y1 = y + h·k2
    F2 = f(t+h, y1)
    k3 = W⁻¹ (F2 - e32·(k2 - F1) - 2·(k1 - f(y)) + h·d·T),  e32 = 6+√2
    err = h/6 · (k1 - 2k2 + k3)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

__all__ = ["Rosenbrock23"]


class Rosenbrock23:
    order = 2  # propagating order (2nd, with 3rd-order error estimate)
    fsal = True
    n_stages = 3
    name = "Rosenbrock23"

    def __init__(self, autodiff=True):
        self.autodiff = autodiff
        self.d = 1.0 / (2.0 + math.sqrt(2.0))
        self.e32 = 6.0 + math.sqrt(2.0)

    def __repr__(self):
        return "Rosenbrock23()"

    def step(self, fvec, t, dt, u, f0):
        d = self.d
        n = u.shape[0]
        jac_fn = getattr(fvec, "jac", None)  # analytic hook (see sdirk.py)
        J = (jac_fn(u, t) if jac_fn is not None
             else jax.jacfwd(lambda uu: fvec(uu, t))(u))
        # ∂f/∂t via one jvp in the time direction (the reference threads
        # Rosenbrock time-derivative Duals through its VJP backends,
        # derivative_wrappers.jl:444-469 — here it is a single native jvp).
        _, T = jax.jvp(lambda tt: fvec(u, tt), (t,), (jnp.ones_like(t),))

        W = jnp.eye(n, dtype=u.dtype) - dt * d * J
        lu = lu_factor(W)

        hdT = dt * d * T
        k1 = lu_solve(lu, f0 + hdT)
        F1 = fvec(u + 0.5 * dt * k1, t + 0.5 * dt)
        k2 = k1 + lu_solve(lu, F1 - k1)
        u1 = u + dt * k2
        F2 = fvec(u1, t + dt)
        k3 = lu_solve(lu, F2 - self.e32 * (k2 - F1) - 2.0 * (k1 - f0) + hdT)
        # Filter the estimate through W⁻¹ (Shampine's stabilized error
        # estimate): without it the raw h³-difference picks up the stiff
        # residual and pins dt at the explicit-stability scale.
        err = lu_solve(lu, (dt / 6.0) * (k1 - 2.0 * k2 + k3))
        return u1, F2, err
