"""SDE solvers: Euler-Maruyama (Ito), EulerHeun (Stratonovich), Milstein
(Ito, diagonal noise).

Fixed-grid `lax.scan` time loops (the reference pins SDE adjoints to the
forward grid via tstops anyway — sensitivity_interface.jl:478-491); noise is
counter-based (ops/brownian.py) so every pass regenerates identical
increments. Steppers work on flat states with

    step(fvec, gvec, t, dt, u, dw) -> u1

where gvec(u, t) is (n,) for diagonal/scalar noise and (n, m) for general
noise with dw of shape (m,).

Ito <-> Stratonovich drift conversion (reference: src/sde_tools.jl
StochasticTransformedFunction) is provided as a pure drift transform built
from one jvp of g.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "EulerMaruyama",
    "EulerHeun",
    "Milstein",
    "SRA1",
    "ImplicitEM",
    "AdaptiveEM",
    "ito_to_stratonovich_drift",
    "stratonovich_to_ito_drift",
]


def _gg_jvp(gvec, u, t, v):
    """(∂g/∂u)·v for diagonal g: one jvp."""
    return jax.jvp(lambda uu: gvec(uu, t), (u,), (v,))[1]


def _diffusion_term(g_val, dw):
    """g·dW for diagonal (n,) or general (n, m) diffusion."""
    if g_val.ndim == 1:
        return g_val * dw
    return g_val @ dw


class EulerMaruyama:
    """Strong order 0.5 Ito scheme: u1 = u + f·dt + g·ΔW."""

    name = "EulerMaruyama"
    interpretation = "ito"
    order = 1

    def __repr__(self):
        return "EulerMaruyama()"

    def step(self, fvec, gvec, t, dt, u, dw):
        return u + dt * fvec(u, t) + _diffusion_term(gvec(u, t), dw)


class EulerHeun:
    """Stratonovich Heun scheme: predictor-corrector in the diffusion."""

    name = "EulerHeun"
    interpretation = "stratonovich"
    order = 1

    def __repr__(self):
        return "EulerHeun()"

    def step(self, fvec, gvec, t, dt, u, dw):
        g0 = gvec(u, t)
        ubar = u + dt * fvec(u, t) + _diffusion_term(g0, dw)
        g1 = gvec(ubar, t + dt)
        return u + dt * fvec(u, t) + 0.5 * _diffusion_term(g0 + g1, dw)


class Milstein:
    """Strong order 1.0 Ito scheme for diagonal noise:
    u1 = EM + 0.5·g·(∂g/∂u diag)·(ΔW² - dt). Derivative via one jvp."""

    name = "Milstein"
    interpretation = "ito"
    order = 1

    def __repr__(self):
        return "Milstein()"

    def step(self, fvec, gvec, t, dt, u, dw):
        g0 = gvec(u, t)
        if g0.ndim != 1:
            raise NotImplementedError("Milstein implemented for diagonal noise")
        dg = _gg_jvp(gvec, u, t, g0)  # (∂g/∂u)·g ; diagonal: g·g'
        return (
            u + dt * fvec(u, t) + g0 * dw + 0.5 * dg * (dw ** 2 - dt)
        )


class SRA1:
    """Rößler SRA1 for additive noise: strong order 1.5, weak order 2.0
    (the scheme StochasticDiffEq reaches for on additive-noise problems —
    reference SDE test matrix uses SOSRA/SRA1-class methods for its
    additive-noise adjoint tests). Needs the iterated integral
    ΔZ = ∫(W(s) − W(t))ds, generated counter-based alongside ΔW
    (ops/brownian.py grid_iterated); the driver supplies it when
    `needs_dz` is set.

    Tableau (Rößler 2010, SIAM J. Numer. Anal. 48(3), SRA1):
        c0 = (0, 3/4),  c1 = (1, 0)
        A0 = [[0,0],[3/4,0]],  B0 = [[0,0],[3/2,0]]
        α  = (1/3, 2/3),  β1 = (1, 0),  β2 = (−1, 1)
    with stage diffusion argument χ = ΔZ/h:
        H2 = u + (3/4)h f(u,t) + (3/2)·g(t+h)·χ
        u1 = u + h[f(u,t)/3 + 2f(H2, t+3h/4)/3]
               + g(t+h)·(ΔW − χ) + g(t)·χ

    g may depend on t (and formally on u — the order claims hold for
    additive noise, ∂g/∂u = 0)."""

    name = "SRA1"
    interpretation = "ito"
    order = 2
    needs_dz = True

    def __repr__(self):
        return "SRA1()"

    def step(self, fvec, gvec, t, dt, u, dw, dz):
        chi = dz / dt
        f1 = fvec(u, t)
        g_end = gvec(u, t + dt)
        g_start = gvec(u, t)
        H2 = u + 0.75 * dt * f1 + 1.5 * _diffusion_term(g_end, chi)
        f2 = fvec(H2, t + 0.75 * dt)
        return (
            u
            + dt * (f1 / 3.0 + 2.0 * f2 / 3.0)
            + _diffusion_term(g_end, dw - chi)
            + _diffusion_term(g_start, chi)
        )


def ito_to_stratonovich_drift(fvec, gvec):
    """f̃ = f - ½ (∂g/∂u)·g (diagonal noise) — the drift correction applied
    when an Ito problem meets a Stratonovich-converging scheme
    (reference: src/sde_tools.jl:2-27, backsolve_adjoint.jl:327-345)."""

    def f_corr(u, t):
        g0 = gvec(u, t)
        if g0.ndim == 1:
            corr = 0.5 * _gg_jvp(gvec, u, t, g0)
        else:
            # Σ_j (∂g_j/∂u)·g_j over noise columns.
            def col(j):
                return jax.jvp(lambda uu: gvec(uu, t)[:, j], (u,),
                               (g0[:, j],))[1]

            corr = 0.5 * jnp.sum(
                jax.vmap(col)(jnp.arange(g0.shape[1])), axis=0
            )
        return fvec(u, t) - corr

    return f_corr


def stratonovich_to_ito_drift(fvec, gvec):
    """Inverse correction: f̃ = f + ½ (∂g/∂u)·g."""

    def f_corr(u, t):
        g0 = gvec(u, t)
        if g0.ndim == 1:
            corr = 0.5 * _gg_jvp(gvec, u, t, g0)
        else:
            def col(j):
                return jax.jvp(lambda uu: gvec(uu, t)[:, j], (u,),
                               (g0[:, j],))[1]

            corr = 0.5 * jnp.sum(
                jax.vmap(col)(jnp.arange(g0.shape[1])), axis=0
            )
        return fvec(u, t) + corr

    return f_corr


class ImplicitEM:
    """Drift-implicit Euler-Maruyama (stiff SDEs, reference ImplicitEM slot):
    u1 = u + dt·f(u1) + g(u)·ΔW, solved by a fixed-iteration Newton with the
    step-frozen W = I - dt·J."""

    name = "ImplicitEM"
    interpretation = "ito"
    order = 1

    def __init__(self, newton_iters: int = 6):
        self.newton_iters = newton_iters

    def __repr__(self):
        return "ImplicitEM()"

    def step(self, fvec, gvec, t, dt, u, dw):
        from jax.scipy.linalg import lu_factor, lu_solve

        n = u.shape[0]
        rhs_expl = u + _diffusion_term(gvec(u, t), dw)
        J = jax.jacfwd(lambda uu: fvec(uu, t + dt))(u)
        lu = lu_factor(jnp.eye(n, dtype=u.dtype) - dt * J)

        def body(_, u1):
            r = u1 - dt * fvec(u1, t + dt) - rhs_expl
            return u1 - lu_solve(lu, r)

        u0_guess = u + dt * fvec(u, t) + _diffusion_term(gvec(u, t), dw)
        return jax.lax.fori_loop(0, self.newton_iters, body, u0_guess)


class AdaptiveEM:
    """Adaptive Euler-Maruyama on a VirtualBrownianTree.

    The payoff of counter-based noise (ops/brownian.py): step-doubling error
    control with CONSISTENT Brownian increments — the full step and the two
    half steps all read W from the same tree, so rejections and re-steps see
    the same path (torchsde-style adaptivity; impossible with stored
    per-step increments). Conforms to the ODE-stepper interface so the
    adaptive drivers can run it: drift fvec comes through `step`, diffusion
    and the tree are held by the stepper.

    err = |u_two_halves - u_full| (strong step-doubling estimate); the
    propagated state is the two-half-step solution.
    """

    name = "AdaptiveEM"
    interpretation = "ito"
    order = 1
    n_stages = 3

    def __init__(self, gvec, vbt):
        self.gvec = gvec
        self.vbt = vbt

    def step(self, fvec, t, dt, u, f0):
        g = self.gvec
        w0 = self.vbt(t)
        wm = self.vbt(t + 0.5 * dt)
        w1 = self.vbt(t + dt)
        dW = w1 - w0
        dW1 = wm - w0
        dW2 = w1 - wm

        u_full = u + dt * f0 + _diffusion_term(g(u, t), dW)
        uh = u + 0.5 * dt * f0 + _diffusion_term(g(u, t), dW1)
        u_two = uh + 0.5 * dt * fvec(uh, t + 0.5 * dt) + _diffusion_term(
            g(uh, t + 0.5 * dt), dW2
        )
        err = u_two - u_full
        f1 = fvec(u_two, t + dt)
        return u_two, f1, err
