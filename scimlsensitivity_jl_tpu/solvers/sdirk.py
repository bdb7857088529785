"""ESDIRK solvers with modified-Newton stages (TRBDF2, Kvaerno3).

The reference's stiff menu (TRBDF2, Kvaerno5, ... via OrdinaryDiffEq —
SURVEY §2 item 4). Each implicit stage solves

    kᵢ = f(t + cᵢh,  u + h·Σ_{j<i} aᵢⱼkⱼ + h·γ·kᵢ)

by modified Newton with the step-frozen W = I - h·γ·J factored once (one
`jax.jacfwd` + one LU per step, reused across stages and iterations — the
standard stiff-solver economization). Newton runs a fixed iteration count
with convergence masking, so the step stays a straight-line XLA program
(reverse-mode differentiable under the scan driver, unlike a nested
while_loop).

ESDIRK: first stage explicit (k₁ = f₀, FSAL), diagonal γ elsewhere;
stiffly accurate (b = last row) so f1 = k_last.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

__all__ = ["ESDIRK", "TRBDF2", "Kvaerno3", "SDIRK4"]


class ESDIRKTableau(NamedTuple):
    a: Tuple[Tuple[float, ...], ...]  # full rows incl. diagonal, a[i] has i+2 entries
    b_err: Tuple[float, ...]  # b - b_hat
    c: Tuple[float, ...]
    gamma: float
    order: int
    first_explicit: bool = True  # ESDIRK: k1 = f0; SDIRK: stage 1 implicit


_SQRT2 = math.sqrt(2.0)
_G_TR = 2.0 - _SQRT2  # TRBDF2 gamma (c2)
_D_TR = _G_TR / 2.0
_W_TR = _SQRT2 / 4.0

TRBDF2_TAB = ESDIRKTableau(
    a=(
        (_D_TR, _D_TR),
        (_W_TR, _W_TR, _D_TR),
    ),
    # b = (w, w, d) stiffly accurate; bhat = ((1-w)/3, (3w+1)/3, d/3)
    b_err=(
        _W_TR - (1.0 - _W_TR) / 3.0,
        _W_TR - (3.0 * _W_TR + 1.0) / 3.0,
        _D_TR - _D_TR / 3.0,
    ),
    c=(0.0, _G_TR, 1.0),
    gamma=_D_TR,
    order=2,
)

# Kvaerno (2004) ESDIRK 3(2): gamma = 0.4358665215084590
_G_K3 = 0.4358665215084590
_A31_K3 = 0.490563388419108
_A32_K3 = 0.073570090080892
_B1_K3 = 0.308809969973036
_B2_K3 = 1.490563388254106
_B3_K3 = -1.235239879727145

KVAERNO3_TAB = ESDIRKTableau(
    a=(
        (_G_K3, _G_K3),
        (_A31_K3, _A32_K3, _G_K3),
        (_B1_K3, _B2_K3, _B3_K3, _G_K3),
    ),
    # b = row 4 (stiffly accurate); bhat = row 3 extended with 0.
    b_err=(
        _B1_K3 - _A31_K3,
        _B2_K3 - _A32_K3,
        _B3_K3 - _G_K3,
        _G_K3,
    ),
    c=(0.0, 2.0 * _G_K3, 1.0, 1.0),
    gamma=_G_K3,
    order=3,
)


# Hairer-Wanner SDIRK4 (Solving ODEs II, Table 6.5): 5-stage, L-stable,
# order 4 with embedded order-3 estimate; gamma = 1/4, all stages implicit,
# stiffly accurate (b = last row). Order conditions Σb·c^k = 1/(k+1) for
# k=0..3 verified numerically in tests.
_B_S4 = (25 / 24, -49 / 48, 125 / 16, -85 / 12, 1 / 4)
_BH_S4 = (59 / 48, -17 / 96, 225 / 32, -85 / 12, 0.0)

SDIRK4_TAB = ESDIRKTableau(
    a=(
        (1 / 4,),
        (1 / 2, 1 / 4),
        (17 / 50, -1 / 25, 1 / 4),
        (371 / 1360, -137 / 2720, 15 / 544, 1 / 4),
        _B_S4,
    ),
    b_err=tuple(b - bh for b, bh in zip(_B_S4, _BH_S4)),
    c=(1 / 4, 3 / 4, 11 / 20, 1 / 2, 1.0),
    gamma=1 / 4,
    order=4,
    first_explicit=False,
)


class ESDIRK:
    """mass_matrix: optional constant M for M·u' = f — stages solve
    M·kᵢ = f(·) by modified Newton on g(k) = M·k - f(base + h·γ·k) with the
    step-frozen W = M - h·γ·J (index-1 semi-explicit DAEs supported; the
    reference's mass-matrix solver surface, adjoint_common.jl:110-139).
    The first stage must then be implicit, so ESDIRK tableaus (explicit first
    stage) reject singular M."""

    def __init__(self, tableau: ESDIRKTableau, name: str, newton_iters: int = 8,
                 newton_tol: float = 1e-12, mass_matrix=None):
        self.tableau = tableau
        self.order = tableau.order
        self.fsal = True
        self.n_stages = len(tableau.c)
        self.name = name
        self.newton_iters = newton_iters
        self.newton_tol = newton_tol
        self.mass_matrix = mass_matrix

    def with_mass_matrix(self, M):
        if self.tableau.first_explicit:
            raise NotImplementedError(
                f"{self.name} has an explicit first stage: singular mass "
                "matrices need an all-implicit SDIRK (use SDIRK4)"
            )
        return ESDIRK(self.tableau, self.name, self.newton_iters,
                      self.newton_tol, mass_matrix=M)

    def __repr__(self):
        return f"{self.name}()"

    def step(self, fvec, t, dt, u, f0):
        tab = self.tableau
        n = u.shape[0]
        gam = tab.gamma
        M = self.mass_matrix

        # Analytic Jacobian hook: a rhs carrying `.jac(u, t)` supplies ∂f/∂u
        # directly — the adjoint passes attach -J(y(t))ᵀ here so stiff
        # reverse solves don't differentiate through the vjp-valued RHS
        # (reference reuses the analytic adjoint Jacobian the same way,
        # quadrature_adjoint.jl:170-192).
        jac_fn = getattr(fvec, "jac", None)
        J = (jac_fn(u, t) if jac_fn is not None
             else jax.jacfwd(lambda uu: fvec(uu, t))(u))
        eyeM = jnp.eye(n, dtype=u.dtype) if M is None else jnp.asarray(M, u.dtype)
        W = eyeM - dt * gam * J
        lu = lu_factor(W)

        ks = [f0] if tab.first_explicit else []
        c_off = 1 if tab.first_explicit else 0
        bad_stage = jnp.asarray(False)
        alphas = jnp.asarray([1.0, 0.5, 0.25], u.real.dtype)
        for i, row in enumerate(tab.a):
            ti = t + tab.c[i + c_off] * dt
            base = u
            for aij, k in zip(row[:-1], ks):
                base = base + (dt * aij) * k

            # Damped modified Newton on g(k) = M·k - f(ti, base + h·γ·k),
            # warm-started from the previous stage derivative; the residual
            # is checked afterwards so diverged stages force step rejection
            # instead of silently passing the error test.
            def resid(k):
                Mk = k if M is None else eyeM @ k
                return Mk - fvec(base + (dt * gam) * k, ti)

            def newton_body(_, k):
                g = resid(k)
                delta = lu_solve(lu, g)
                cand = k[None, :] - alphas[:, None] * delta[None, :]
                gn = jax.vmap(lambda kk: jnp.linalg.norm(resid(kk)))(cand)
                gn = jnp.where(jnp.isnan(gn), jnp.inf, gn)
                return cand[jnp.argmin(gn)]

            k = jax.lax.fori_loop(0, self.newton_iters, newton_body,
                                  ks[-1] if ks else f0)
            rfin = jnp.linalg.norm(resid(k))
            kn = jnp.linalg.norm(k)
            bad_stage = bad_stage | ~(rfin <= 1e-6 * (1.0 + kn)) \
                | ~jnp.all(jnp.isfinite(k))
            ks.append(k)

        # Stiffly accurate: u1 = base of a virtual next stage = u + h·Σ b k.
        u1 = u
        for bi, k in zip(tab.a[-1], ks):
            u1 = u1 + (dt * bi) * k
        f1 = ks[-1]  # b == last row and c_last == 1  =>  k_last = f(t+dt, u1)

        err = jnp.zeros_like(u)
        for ei, k in zip(tab.b_err, ks):
            err = err + (dt * ei) * k
        if M is not None:
            # Index-1 DAE: algebraic components are slaved to the constraint
            # — their raw embedded error is O(1/h) noise (and O(Δ/γ) right
            # after a state jump restores consistency, e.g. adjoint-λ jumps
            # at save times), so exclude them BEFORE the W⁻¹ filter or the
            # filter smears them into the differential rows and every dt
            # rejects (standard practice, Hairer-Wanner VII.1).
            alg = jnp.sum(jnp.abs(eyeM), axis=1) == 0
            err = jnp.where(alg, 0.0, err)
        # Hosea-Shampine filtered estimate: the embedded method is not
        # L-stable, so damp the stiff components through W⁻¹.
        err = lu_solve(lu, err)
        if M is not None:
            err = jnp.where(alg, 0.0, err)
        # Non-converged Newton => reject the step (inf error).
        err = jnp.where(bad_stage, jnp.full_like(err, jnp.inf), err)
        return u1, f1, err


def TRBDF2(**kw):
    return ESDIRK(TRBDF2_TAB, "TRBDF2", **kw)


def Kvaerno3(**kw):
    return ESDIRK(KVAERNO3_TAB, "Kvaerno3", **kw)


def SDIRK4(**kw):
    return ESDIRK(SDIRK4_TAB, "SDIRK4", **kw)
