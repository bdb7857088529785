"""Continuous forward sensitivity (reference: src/forward_sensitivity.jl).

The augmented ODE over z = [u; S] with Ṡₖ = J·Sₖ + ∂f/∂pₖ
(reference RHS semantics :152-209). On TPU each column is a single
`jax.jvp` of f in the direction (Sₖ, eₖ) — which computes J·Sₖ + ∂f/∂pₖ·eₖ
in one sweep — vmapped over columns into one batched tangent propagation
(the analogue of the reference's J·M one-sweep "matrix mode" :185-207,
without ever materializing J).

Two surfaces:
  * `ODEForwardSensitivityProblem` / `extract_local_sensitivities` — the
    direct API (reference :420, :730), p-directions only like the reference.
  * the ForwardSensitivity sensealg under reverse AD — the custom_vjp
    backward contracts the saved sensitivities with the cotangent. Unlike
    the reference (which has no u0 path here), the tangent block also
    carries n u0-directions so du0 is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.vjp import make_vjp_kernels
from ..problems import ODEProblem
from ..utils.pytree import ravel_pytree
from .common import forward_saveat_solve, match_cotangents
from .continuous import AuxOut, SolveOptions

__all__ = [
    "make_forward_sensitivity_solve_fn",
    "ODEForwardSensitivityProblem",
    "extract_local_sensitivities",
]


def _augmented_fvec(kern, p, n, n_dirs, u0_dirs: int):
    """RHS over z = [u ; S.flatten()] with S of shape (n_dirs, n).

    The first `u0_dirs` rows are u0-directions (no parameter seed); the rest
    are parameter directions seeded with the identity on flat p.
    """
    pflat, unravel_p = ravel_pytree(p)
    npf = pflat.shape[0]
    n_pdirs = n_dirs - u0_dirs
    eye_p = jnp.eye(npf, dtype=pflat.dtype)

    def aug(z, t):
        u = z[:n]
        S = z[n:].reshape(n_dirs, n)

        def one(sk, ek_flat):
            _, df = jax.jvp(
                lambda u_, p_: kern.fvec(u_, p_, t),
                (u, p),
                (sk, unravel_p(ek_flat)),
            )
            return df

        seeds = jnp.concatenate(
            [jnp.zeros((u0_dirs, npf), pflat.dtype), eye_p[:n_pdirs]], axis=0
        ) if npf > 0 else jnp.zeros((n_dirs, 0), z.dtype)
        dS = jax.vmap(one)(S, seeds)
        du = kern.fvec(u, p, t)
        return jnp.concatenate([du, dS.reshape(-1)])

    return aug, npf


def make_forward_sensitivity_solve_fn(f, solver, sensealg, opts: SolveOptions, t0, t1):
    """ForwardSensitivity as a solve rule: forward pass solves [u; S] with
    S spanning u0- and p-directions; the vjp contracts S with the cotangent
    (discrete version of dL/dp = Σᵢ Δᵢᵀ S(tᵢ))."""

    def _run(u0, p, saveat):
        u0vec, unravel_u = ravel_pytree(u0)
        pflat, _ = ravel_pytree(p)
        n = u0vec.shape[0]
        npf = pflat.shape[0]
        n_dirs = n + npf
        kern = make_vjp_kernels(f, u0, p)
        aug, _ = _augmented_fvec(kern, p, n, n_dirs, u0_dirs=n)
        S0 = jnp.concatenate(
            [jnp.eye(n, dtype=u0vec.dtype), jnp.zeros((npf, n), u0vec.dtype)]
        )
        z0 = jnp.concatenate([u0vec, S0.reshape(-1)])
        fwd, _ = forward_saveat_solve(
            solver, aug, z0, t0, t1, jnp.asarray(saveat, u0vec.dtype),
            rtol=opts.rtol, atol=opts.atol, dt0=opts.dt0,
            max_steps=opts.max_steps, tstops=opts.tstops, store_dense=opts.dense,
        )
        return fwd, unravel_u, n, npf

    def _u_dense(fwd, n):
        # The dense buffer holds the augmented [u; S] state; slice the
        # interpolation nodes down to the u block so sol(t) returns u(t).
        if fwd.dense is None:
            return None
        d = fwd.dense
        return d._replace(ys=d.ys[:, :n], fs=d.fs[:, :n])

    def _primal(u0, p, saveat):
        fwd, unravel_u, n, npf = _run(u0, p, saveat)
        ys = jax.vmap(unravel_u)(fwd.ys_save[:, :n])
        aux = AuxOut(
            dense=_u_dense(fwd, n),
            t_final=fwd.t_final,
            u_final=fwd.u_final[:n],
            stats=fwd.stats,
        )
        return ys, aux

    solve_fn = jax.custom_vjp(_primal)

    def _fwd(u0, p, saveat):
        fwd, unravel_u, n, npf = _run(u0, p, saveat)
        ys = jax.vmap(unravel_u)(fwd.ys_save[:, :n])
        aux = AuxOut(dense=_u_dense(fwd, n), t_final=fwd.t_final,
                     u_final=fwd.u_final[:n], stats=fwd.stats)
        S_save = fwd.ys_save[:, n:].reshape(fwd.ys_save.shape[0], n + npf, n)
        return (ys, aux), (u0, p, saveat, S_save, n, npf)

    def _bwd(res, cot):
        u0, p, saveat, S_save, n, npf = res
        d_ys, _ = cot
        _, unravel_u = ravel_pytree(u0)
        _, unravel_p = ravel_pytree(p)
        lam = jax.vmap(lambda s: ravel_pytree(s)[0])(d_ys)  # (nt, n)
        # dL/d(dir_k) = Σ_t Δ_t · S_t[k]
        contracted = jnp.einsum("ti,tki->k", lam, S_save)
        du0, dp = match_cotangents(unravel_u(contracted[:n]),
                                   unravel_p(contracted[n:]), (u0, p))
        return du0, dp, jnp.zeros_like(saveat)

    solve_fn.defvjp(_fwd, _bwd)
    return solve_fn


def ODEForwardSensitivityProblem(f, u0, tspan, p, sensealg=None) -> ODEProblem:
    """Build the augmented problem over [u; S] with p-directions only —
    reference: src/forward_sensitivity.jl:420-597. Solve it with `solve`
    and unpack with `extract_local_sensitivities`."""
    u0vec, unravel_u = ravel_pytree(u0)
    pflat, unravel_p = ravel_pytree(p)
    n = u0vec.shape[0]
    npf = pflat.shape[0]
    kern = make_vjp_kernels(f, u0, p)
    aug, _ = _augmented_fvec(kern, p, n, npf, u0_dirs=0)

    def f_aug(z, p_, t):
        # p_ rides along for API parity; the closure's kern re-reads it so
        # parameter overrides via remake(p=...) rebuild the problem instead.
        return aug(z, t)

    z0 = jnp.concatenate([u0vec, jnp.zeros(npf * n, u0vec.dtype)])
    prob = ODEProblem(f_aug, z0, tspan, p)
    object.__setattr__(prob, "_fwd_sens_meta", (n, npf, unravel_u, unravel_p))
    return prob


def extract_local_sensitivities(sol, i=None):
    """Split an ODEForwardSensitivityProblem solution into (u, [S_k]) —
    reference: src/forward_sensitivity.jl:730-852.

    Without `i`: returns (u_timeseries (nt, n), S (nt, npf, n)).
    With integer `i`: that time index only.
    """
    meta = getattr(sol.prob, "_fwd_sens_meta", None)
    if meta is not None:
        n, npf, _, _ = meta
    else:
        # Derive from shapes (the meta attribute does not survive pytree
        # round-trips through jit): ncols = n*(npf+1), npf from prob.p.
        npf = ravel_pytree(sol.prob.p)[0].shape[0]
        n = sol.ys.shape[-1] // (npf + 1)
    ys = sol.ys  # (nt, n*(npf+1)) flat rows
    u = ys[:, :n]
    S = ys[:, n:].reshape(ys.shape[0], npf, n)
    if i is not None:
        return u[i], S[i]
    return u, S
