"""Public reverse-problem constructors (layer L3 surface).

The reference exports `ODEAdjointProblem` / `SDEAdjointProblem` /
`RODEAdjointProblem` / `AdjointSensitivityIntegrand`
(/root/reference/src/SciMLSensitivity.jl:94-97; e.g.
interpolating_adjoint.jl:307, quadrature_adjoint.jl:216-328) so users can
build, inspect, and solve the reverse problem themselves with any solver.
Here the same surface returns an `AdjointProblemSpec`:

    spec = ODEAdjointProblem(sol, InterpolatingAdjoint(), t=ts,
                             dgdu_discrete=dg)
    adj_sol = solve(spec.prob, Tsit5(), callback=spec.callback,
                    tstops=spec.tstops, rtol=..., atol=...)
    du0, dp = spec.extract(adj_sol.u_final)

`spec.prob` is a plain ODEProblem over the augmented reverse state with
REVERSED tspan (t1, t0) — the in-repo solvers integrate backward natively —
and `spec.callback` is an ordinary PresetTimeCallback injecting the discrete
loss cotangents into λ at each data time (the ReverseLossCallback made
user-visible, reference adjoint_common.jl:709-821).

State layouts by sensealg family (matching the sealed custom_vjp rules in
adjoints/continuous.py):

    InterpolatingAdjoint : z = [λ(n); q(npf)], y(t) from sol's interpolant
    QuadratureAdjoint    : z = λ(n) only — integrate dG/dp afterwards with
                           `AdjointSensitivityIntegrand`
    BacksolveAdjoint     : z = [λ(n); q(npf); u(n)], u re-integrated backward
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..callbacks import PresetTimeCallback
from ..ops.interp import dense_eval
from ..ops.vjp import make_vjp_kernels
from ..problems import ODEProblem
from ..sensealg import (BacksolveAdjoint, InterpolatingAdjoint,
                        QuadratureAdjoint)
from ..utils.pytree import ravel_pytree

__all__ = [
    "AdjointProblemSpec",
    "ODEAdjointProblem",
    "SDEAdjointProblem",
    "RODEAdjointProblem",
    "AdjointSensitivityIntegrand",
]


@dataclass
class AdjointProblemSpec:
    """A user-solvable reverse problem: `prob` (reversed tspan), the λ-jump
    `callback` (may be None), the data-time `tstops`, and `extract` mapping
    the reverse solution's final state to (dG/du0, dG/dp) pytrees."""

    prob: ODEProblem
    callback: Optional[Any]
    tstops: jnp.ndarray
    n: int
    npf: int
    extract: Callable
    sensealg: Any


def _cost_jumps(sol, kern, p, ts, dgdu_discrete, n, dtype):
    """λ jumps at data times from the discrete cost derivative."""
    if dgdu_discrete is None:
        return jnp.zeros((ts.shape[0], n), dtype)

    def jump(i):
        ti = ts[i]
        ui = kern.unravel_u(dense_eval(sol.dense, ti))
        return ravel_pytree(dgdu_discrete(ui, p, ti, i))[0]

    return jax.vmap(jump)(jnp.arange(ts.shape[0]))


def ODEAdjointProblem(
    sol,
    sensealg=None,
    t=None,
    dgdu_discrete: Optional[Callable] = None,
    dgdu_continuous: Optional[Callable] = None,
    dgdp_continuous: Optional[Callable] = None,
    g: Optional[Callable] = None,
) -> AdjointProblemSpec:
    """Build the reversed augmented adjoint problem for an ODE solution
    (reference: interpolating_adjoint.jl:307-451, backsolve_adjoint.jl /
    quadrature_adjoint.jl ODEAdjointProblem).

    sol must carry dense output for the Interpolating/Quadrature designs
    (`solve(..., dense=True)`); Backsolve re-integrates u and only needs
    sol.u_final. Solutions with event records are not supported here — use
    `adjoint_sensitivities(callback=...)` or `jax.grad` over solve.
    """
    sensealg = sensealg if sensealg is not None else InterpolatingAdjoint()
    if getattr(sol, "events", None) is not None:
        raise NotImplementedError(
            "ODEAdjointProblem on event solutions: the reverse event-jump "
            "VJPs are applied by adjoint_sensitivities(callback=...) / "
            "jax.grad over solve, not by the standalone problem"
        )
    prob = sol.prob
    p = prob.p
    u0 = prob.u0
    t0, t1 = prob.tspan
    u0vec, unravel_u = ravel_pytree(u0)
    pflat, unravel_p = ravel_pytree(p)
    n, npf = u0vec.shape[0], pflat.shape[0]
    dtype = u0vec.dtype
    if getattr(prob, "mass_matrix", None) is not None:
        raise NotImplementedError(
            "ODEAdjointProblem on mass-matrix DAEs: use "
            "adjoint_sensitivities (the projected-jump machinery is not "
            "exposed as a standalone problem)"
        )

    kern = make_vjp_kernels(prob.f, u0, p, user_jac=prob.jac,
                            user_vjp=prob.vjp, user_paramjac=prob.paramjac)

    ts = jnp.asarray(sol.ts if t is None else t, dtype)
    needs_dense = not isinstance(sensealg, BacksolveAdjoint)
    if needs_dense and sol.dense is None:
        raise ValueError(
            "ODEAdjointProblem with an interpolating design needs "
            "solve(..., dense=True)")

    if g is not None:
        if dgdu_continuous is None:
            dgdu_continuous = jax.grad(g, argnums=0)
        if dgdp_continuous is None and npf > 0:
            dgdp_continuous = jax.grad(g, argnums=1)

    def cost_u(yvec, tt):
        if dgdu_continuous is None:
            return jnp.zeros(n, dtype)
        return ravel_pytree(dgdu_continuous(unravel_u(yvec), p, tt))[0]

    def cost_p(yvec, tt):
        if dgdp_continuous is None:
            return jnp.zeros(npf, dtype)
        return ravel_pytree(dgdp_continuous(unravel_u(yvec), p, tt))[0]

    lam_jumps = _cost_jumps(sol, kern, p, ts, dgdu_discrete, n, dtype)

    # Fold jumps at/after the reverse start (t1) into z0 and jumps at the
    # reverse END (t0) into `extract` — preset callbacks fire at interior
    # step ends, not at the integration endpoints. Interior jumps become a
    # PresetTimeCallback (the user-visible ReverseLossCallback).
    at_end = jnp.abs(ts - jnp.asarray(t1, dtype)) <= 1e-12 * max(
        1.0, abs(float(t1)))
    at_start = jnp.abs(ts - jnp.asarray(t0, dtype)) <= 1e-12 * max(
        1.0, abs(float(t0)))
    lam_init = jnp.sum(jnp.where(at_end[:, None], lam_jumps, 0.0), axis=0)
    lam_final = jnp.sum(jnp.where(at_start[:, None], lam_jumps, 0.0), axis=0)
    interior = ~(at_end | at_start)

    def jump_affect(z, p_, tt):
        i = jnp.argmin(jnp.abs(ts - tt))
        return z.at[:n].add(jnp.where(interior[i], 1.0, 0.0) * lam_jumps[i])

    import numpy as _np

    ts_host = _np.asarray(ts, float)
    interior_host = _np.asarray(interior)
    cb_times = ts_host[interior_host] if interior_host.any() else None
    cb = (PresetTimeCallback(ts=cb_times, affect=jump_affect)
          if cb_times is not None and dgdu_discrete is not None else None)

    if isinstance(sensealg, QuadratureAdjoint):
        def aug_f(z, p_, tt):
            y = dense_eval(sol.dense, tt)
            return -kern.vjp_u(y, p_, tt, z) - cost_u(y, tt)

        z0 = lam_init
        adj_prob = ODEProblem(aug_f, z0, (t1, t0), p)

        def extract(z):
            return unravel_u(z + lam_final), unravel_p(jnp.zeros(npf, dtype))

        note = ("QuadratureAdjoint: λ(t0) = dG/du0; integrate "
                "AdjointSensitivityIntegrand for dG/dp")
    elif isinstance(sensealg, BacksolveAdjoint):
        def aug_f(z, p_, tt):
            lam, u_cur = z[:n], z[n + npf:]
            fval, ubar, pbar = kern.f_and_vjp(u_cur, p_, tt, lam)
            return jnp.concatenate([
                -ubar - cost_u(u_cur, tt),
                -ravel_pytree(pbar)[0] - cost_p(u_cur, tt),
                fval,
            ])

        u_end = ravel_pytree(sol.u_final)[0]
        z0 = jnp.concatenate([lam_init, jnp.zeros(npf, dtype), u_end])
        adj_prob = ODEProblem(aug_f, z0, (t1, t0), p)

        def extract(z):
            return unravel_u(z[:n] + lam_final), unravel_p(z[n:n + npf])

        note = "BacksolveAdjoint: z = [λ; q; u]"
    else:  # InterpolatingAdjoint (default) — joined [λ; q]
        def aug_f(z, p_, tt):
            lam = z[:n]
            y = dense_eval(sol.dense, tt)
            _, ubar, pbar = kern.f_and_vjp(y, p_, tt, lam)
            return jnp.concatenate([
                -ubar - cost_u(y, tt),
                -ravel_pytree(pbar)[0] - cost_p(y, tt),
            ])

        z0 = jnp.concatenate([lam_init, jnp.zeros(npf, dtype)])
        adj_prob = ODEProblem(aug_f, z0, (t1, t0), p)

        def extract(z):
            return unravel_u(z[:n] + lam_final), unravel_p(z[n:n + npf])

        note = "InterpolatingAdjoint: z = [λ; q]"

    spec = AdjointProblemSpec(
        prob=adj_prob, callback=cb,
        tstops=ts_host[interior_host] if interior_host.any() else _np.zeros(0),
        n=n, npf=npf, extract=extract, sensealg=sensealg,
    )
    spec.note = note
    return spec


def AdjointSensitivityIntegrand(sol, adj_sol, sensealg=None):
    """ρ(t) = λ(t)ᵀ ∂f/∂p as a callable over forward time — the exported
    integrand object of QuadratureAdjoint (reference:
    quadrature_adjoint.jl:216-328, integrand evaluation :486-508). Integrate
    it over [t0, t1] (any scheme) to get dG/dp as a flat vector.

    adj_sol: the solution of `ODEAdjointProblem(sol, QuadratureAdjoint())`'s
    problem, solved with dense=True."""
    prob = sol.prob
    p = prob.p
    u0vec, unravel_u = ravel_pytree(prob.u0)
    if sol.dense is None or adj_sol.dense is None:
        raise ValueError("AdjointSensitivityIntegrand needs dense=True on "
                         "both the forward and adjoint solutions")
    kern = make_vjp_kernels(prob.f, prob.u0, p, user_jac=prob.jac,
                            user_vjp=prob.vjp, user_paramjac=prob.paramjac)

    def rho(t):
        y = dense_eval(sol.dense, t)
        lam = dense_eval(adj_sol.dense, t)
        return ravel_pytree(kern.vjp_p(y, p, t, lam))[0]

    return rho


def SDEAdjointProblem(sol, *args, **kwargs):
    """TPU-first deviation, documented: SDE adjoints here are EXACT DISCRETE
    adjoints over the replayable counter-based noise (adjoints/sde.py) — a
    reversed-noise continuous SDE reverse problem (reference
    backsolve_adjoint.jl:274-419) would re-discretize what is already a
    discrete pullback. Use `adjoint_sensitivities(sol, ...)` (replay-based)
    or `jax.grad` over `solve`."""
    raise NotImplementedError(SDEAdjointProblem.__doc__)


def RODEAdjointProblem(sol, *args, **kwargs):
    """See SDEAdjointProblem — same replay-based design for RODEs
    (reference interpolating_adjoint.jl:615-746)."""
    raise NotImplementedError(SDEAdjointProblem.__doc__)
