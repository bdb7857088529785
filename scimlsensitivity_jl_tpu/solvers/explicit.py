"""Explicit Runge-Kutta steppers (Tsit5, Dopri5, BS3, Heun, Midpoint, Euler).

One generic tableau-driven step; the stage loop is unrolled in Python at
trace time (stage counts are tiny and static) so XLA sees straight-line code
it can fuse — no per-stage dispatch like the reference's solver stack.
"""

from __future__ import annotations

import jax.numpy as jnp

from .tableaus import BOSH3, DOPRI5, EULER, HEUN, MIDPOINT, TSIT5, ButcherTableau

__all__ = ["ExplicitRK", "Tsit5", "Dopri5", "BS3", "Heun", "Midpoint", "Euler"]


class ExplicitRK:
    """Tableau-driven ERK stepper.

    step(fvec, t, dt, u, f0) -> (u1, f1, err):
      u1  : propagated state,
      f1  : fvec(u1, t+dt) (reused FSAL-style by the driver and the dense
            output),
      err : embedded local-error vector (zeros when the tableau has no
            embedded method — then only fixed-step use is meaningful).
    """

    def __init__(self, tableau: ButcherTableau, name: str):
        self.tableau = tableau
        self.order = tableau.order
        self.fsal = tableau.fsal
        self.n_stages = len(tableau.b)
        self.name = name

    def __repr__(self):
        return f"{self.name}()"

    def step(self, fvec, t, dt, u, f0):
        tab = self.tableau
        ks = [f0]
        for i, row in enumerate(tab.a):
            du = None
            for aij, k in zip(row, ks):
                if aij == 0.0:
                    continue
                contrib = (dt * aij) * k
                du = contrib if du is None else du + contrib
            ui = u if du is None else u + du
            ti = t + tab.c[i + 1] * dt
            ks.append(fvec(ui, ti))

        u1 = u
        for bi, k in zip(tab.b, ks):
            if bi == 0.0:
                continue
            u1 = u1 + (dt * bi) * k

        if tab.fsal:
            # Last stage was evaluated at (t+dt, u1): reuse as f1.
            f1 = ks[-1]
        else:
            f1 = fvec(u1, t + dt)

        if tab.b_err:
            err = jnp.zeros_like(u)
            for ei, k in zip(tab.b_err, ks):
                if ei == 0.0:
                    continue
                err = err + (dt * ei) * k
        else:
            err = jnp.zeros_like(u)
        return u1, f1, err


def Tsit5():
    return ExplicitRK(TSIT5, "Tsit5")


def Dopri5():
    return ExplicitRK(DOPRI5, "Dopri5")


def BS3():
    return ExplicitRK(BOSH3, "BS3")


def Heun():
    return ExplicitRK(HEUN, "Heun")


def Midpoint():
    return ExplicitRK(MIDPOINT, "Midpoint")


def Euler():
    return ExplicitRK(EULER, "Euler")
