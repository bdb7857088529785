"""Problem types.

TPU-native analogues of SciMLBase's problem structs as consumed by the
reference (SciMLSensitivity.jl works on ODEProblem / SDEProblem / RODEProblem /
NonlinearProblem / SteadyStateProblem). All right-hand sides are pure,
out-of-place functions over pytrees — the JAX idiom — rather than the
reference's in-place `f(du,u,p,t)` mutation style.

    ODEProblem(f, u0, tspan, p)          f(u, p, t) -> du
    SDEProblem(f, g, u0, tspan, p)       g(u, p, t) -> diffusion (diagonal:
                                         same shape as u; general: matrix)
    RODEProblem(f, u0, tspan, p)         f(u, p, t, W) -> du
    NonlinearProblem(f, u0, p)           f(u, p) -> residual (solve f=0)
    SteadyStateProblem(f, u0, p)         f(u, p, t) -> du (solve f(u,p,∞)=0)
    DAEProblem / mass_matrix             ODEProblem(..., mass_matrix=M) solves
                                         M u' = f(u, p, t)

`remake` mirrors SciMLBase.remake (reference uses it pervasively, e.g.
src/forward_sensitivity.jl:856-881) to rebuild a problem with fields replaced.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "AbstractProblem",
    "ODEProblem",
    "SDEProblem",
    "RODEProblem",
    "NonlinearProblem",
    "SteadyStateProblem",
    "DDEProblem",
    "remake",
]


def _register_problem(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields, meta_fields)
    return cls


class AbstractProblem:
    pass


@dataclass(frozen=True)
class ODEProblem(AbstractProblem):
    """Initial value problem  u' = f(u, p, t)  (or M u' = f for mass-matrix DAEs).

    Mirrors SciMLBase.ODEProblem as used throughout the reference
    (e.g. src/concrete_solve.jl:523).

    f : callable (u, p, t) -> du, pure, pytree-valued.
    u0: pytree initial state.
    tspan: (t0, t1) floats or scalars.
    p : pytree parameters (may be None).
    mass_matrix: optional (n, n) array over the *flattened* state — `None`
        means identity (a plain ODE). Singular M = semi-explicit DAE
        (reference: src/adjoint_common.jl:110-139).
    jac: optional analytic Jacobian (u, p, t) -> (n, n) over flattened state,
        the analogue of `f.jac` (reference: src/quadrature_adjoint.jl:170-192).
    vjp / paramjac: optional user-supplied VJP overrides, the analogue of
        `f.vjp` / `f.paramjac` fast paths (reference:
        src/derivative_wrappers.jl:284-433). vjp(λ, u, p, t) -> λᵀ∂f/∂u;
        paramjac(λ, u, p, t) -> λᵀ∂f/∂p (as a pytree like p).
    """

    f: Callable
    u0: Any
    tspan: tuple
    p: Any = None
    mass_matrix: Optional[jnp.ndarray] = None
    jac: Optional[Callable] = None
    vjp: Optional[Callable] = None
    paramjac: Optional[Callable] = None

    def with_f(self, f):
        return dataclasses.replace(self, f=f)


@dataclass(frozen=True)
class SDEProblem(AbstractProblem):
    """SDE  du = f(u,p,t) dt + g(u,p,t) dW.

    noise: "diagonal" (g returns a pytree shaped like u, elementwise),
    "scalar" (g returns like u, single shared Wiener process), or
    "general" (flattened-state matrix g: (n, m) for m Wiener processes).
    interpretation: "ito" or "stratonovich" — the *problem's* intended
    calculus; solvers declare which one they converge to and adjoints insert
    the Ito↔Stratonovich drift correction when needed
    (reference: src/sde_tools.jl:2-27, src/backsolve_adjoint.jl:327-345).
    """

    f: Callable
    g: Callable
    u0: Any
    tspan: tuple
    p: Any = None
    noise: str = "diagonal"
    interpretation: str = "ito"
    noise_dim: Optional[int] = None  # m for general noise
    # user-supplied driving path (DiffEqNoiseProcess NoiseGrid analogue):
    # a NoiseGrid(ts, W) on the solve grid, or a callable W(t) (e.g. a
    # VirtualBrownianTree); None -> framework-generated counter-based noise
    noise_process: Any = None


@dataclass(frozen=True)
class RODEProblem(AbstractProblem):
    """Random ODE  u' = f(u, p, t, W(t)) with W a driving Wiener path
    (reference: src/interpolating_adjoint.jl:615-746).

    noise_process: user-supplied path — NoiseGrid(ts, W) on the solve grid
    or a callable W(t) (see SDEProblem); None → framework-generated."""

    f: Callable
    u0: Any
    tspan: tuple
    p: Any = None
    noise_dim: Optional[int] = None
    noise_process: Any = None


@dataclass(frozen=True)
class DDEProblem(AbstractProblem):
    """Delay differential equation
    u'(t) = f(u(t), (u(t-τ₁), ...), p, t)  (the reference's neural-DDE
    surface, test/Core4/layers_dde.jl; reference delegates to DelayDiffEq).

    f: (u, hist, p, t) -> du where hist is a tuple of delayed states.
    lags: tuple whose entries are positive floats (constant lags, static)
        OR callables `lag(u, p, t) -> scalar` (STATE-DEPENDENT lags —
        DelayDiffEq's `dependent_lags`; gradients flow through the lag via
        the interpolant's time argument). A callable lag must stay ≥ dt at
        runtime — smaller values make the step implicit and NaN-poison the
        solution (retcode 3).
    history: callable t -> u for t <= t0 (defaults to constant u0).
    max_lag: upper bound on every lag, sizing the pre-t0 history buffer;
        required when any lag is callable (defaults to max constant lag).
    dist_kernels: tuple of callables `K(s, p) -> scalar` for DISTRIBUTED
        lags (integro-differential terms): each contributes
        I_j(t) = ∫₀^{max_lag} K_j(s, p) · u(t−s) ds, appended AFTER the
        discrete delayed states in f's hist tuple:
        f(u, (u(t−τ₁), ..., I₁, ...), p, t). The integral is a trapezoid
        over the dt node grid (O(dt²), matching the scheme's global order
        on smooth kernels); requires max_lag (the truncation window) to be
        an integer multiple of dt. Gradients flow through K, u, and p via
        the discrete adjoint like everything else.
    """

    f: Callable
    u0: Any
    tspan: tuple
    p: Any = None
    lags: tuple = ()
    history: Optional[Callable] = None
    max_lag: Optional[float] = None
    dist_kernels: tuple = ()


@dataclass(frozen=True)
class NonlinearProblem(AbstractProblem):
    """Root-finding problem f(u, p) = 0 (reference: steadystate_adjoint.jl)."""

    f: Callable
    u0: Any
    p: Any = None


@dataclass(frozen=True)
class SteadyStateProblem(AbstractProblem):
    """Steady state of an ODE: solve f(u, p, t=∞) = 0."""

    f: Callable
    u0: Any
    p: Any = None

    def to_nonlinear(self) -> NonlinearProblem:
        f = self.f
        inf = jnp.inf
        return NonlinearProblem(lambda u, p: f(u, p, inf), self.u0, self.p)


for _cls, _data, _meta in [
    (ODEProblem, ("u0", "tspan", "p", "mass_matrix"), ("f", "jac", "vjp", "paramjac")),
    (DDEProblem, ("u0", "tspan", "p"), ("f", "lags", "history", "max_lag",
                                        "dist_kernels")),
    # noise_process rides as a data field: NoiseGrid is an array pytree;
    # a callable path is an opaque leaf (fine eagerly, not jit-traversable)
    (SDEProblem, ("u0", "tspan", "p", "noise_process"), ("f", "g", "noise", "interpretation", "noise_dim")),
    (RODEProblem, ("u0", "tspan", "p", "noise_process"),
     ("f", "noise_dim")),
    (NonlinearProblem, ("u0", "p"), ("f",)),
    (SteadyStateProblem, ("u0", "p"), ("f",)),
]:
    _register_problem(_cls, list(_data), list(_meta))


def remake(prob, **kwargs):
    """Rebuild a problem with some fields replaced (SciMLBase.remake analogue)."""
    return dataclasses.replace(prob, **kwargs)


def SecondOrderODEProblem(f, du0, u0, tspan, p=None, **kwargs):
    """u'' = f(u', u, p, t) as a first-order system over the pytree state
    (du, u) — the SciMLBase.SecondOrderODEProblem / DynamicalODEProblem
    analogue (adjoints through it tested in the reference at
    test/Core6/second_order_odes.jl:9; there the partitioned state is an
    ArrayPartition, here it is a native pytree tuple, so every sensealg
    works unchanged and gradients come back per-leaf: (ddu0, du0grad)).

    f : callable (v, u, p, t) -> dv  (the acceleration), pytree-valued
    du0 / u0 : initial velocity / position (matching pytrees)
    Returns an ODEProblem with u0=(du0, u0); sol.ys leaves are stacked
    (velocity, position) trajectories.
    """
    def first_order(z, pp, t):
        v, u = z
        return (f(v, u, pp, t), v)

    return ODEProblem(first_order, (du0, u0), tspan, p, **kwargs)


__all__.append("SecondOrderODEProblem")
