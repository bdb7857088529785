"""SteadyStateAdjoint — implicit-function-theorem adjoint (reference:
src/steadystate_adjoint.jl).

For u* with f(u*, p) = 0 and a loss L(u*):
    solve (∂f/∂u)ᵀ λ = ∂L/∂u            (:82-160)
    dL/dp = -λᵀ ∂f/∂p                    (:162-174)
    dL/du0 = 0                           (the root doesn't depend on the guess)

Dense-Jacobian path for n <= dense_cutoff (reference `needs_jac` n<=50,
:66-72); matrix-free path builds the transposed operator from one `jax.vjp`
of f — the VecJacOperator analogue (:119-149) — and runs GMRES.

Also hosts solve_nonlinear: Newton forward + this rule as custom_vjp, the
combined NonlinearSolve-and-differentiate surface. The
UnconstrainedOptimizationAdjoint (reference sensitivity_algorithms.jl:1397,
concrete_solve.jl:2679-2826) is this same rule applied to ∇φ(u, p) = 0 —
`solve_unconstrained_optimization` differentiates an argmin by IFT.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..ops.nonlinear import newton_solve
from ..problems import NonlinearProblem, SteadyStateProblem
from ..sensealg import SteadyStateAdjoint
from ..utils.pytree import ravel_pytree

__all__ = ["NonlinearSolution", "solve_nonlinear", "solve_unconstrained_optimization"]


@dataclass
class NonlinearSolution:
    u: Any
    resid: jnp.ndarray
    retcode: jnp.ndarray  # 0 converged, 1 not
    iters: jnp.ndarray
    prob: Any = None


jax.tree_util.register_dataclass(
    NonlinearSolution,
    data_fields=["u", "resid", "retcode", "iters", "prob"],
    meta_fields=[],
)


def solve_nonlinear(
    prob,
    *,
    sensealg: SteadyStateAdjoint = SteadyStateAdjoint(),
    tol: float = 1e-10,
    max_iters: int = 50,
    verbose: bool = False,
) -> NonlinearSolution:
    """Solve f(u, p) = 0 by damped Newton; gradients via the IFT adjoint."""
    if isinstance(prob, SteadyStateProblem):
        nlprob = prob.to_nonlinear()
    elif isinstance(prob, NonlinearProblem):
        nlprob = prob
    else:
        raise TypeError(f"expected NonlinearProblem/SteadyStateProblem, got {type(prob)}")

    f = nlprob.f
    dense_cutoff = sensealg.dense_cutoff
    linsolve = sensealg.linsolve

    @jax.custom_vjp
    def _root(u0, p):
        u0vec, unravel_u = ravel_pytree(u0)
        fv = lambda uv: ravel_pytree(f(unravel_u(uv), p))[0]
        res = newton_solve(fv, u0vec, tol=tol, max_iters=max_iters,
                           dense_cutoff=dense_cutoff)
        return unravel_u(res.u), (res.resid_norm, res.iters, res.converged)

    def _fwd(u0, p):
        out = _root(u0, p)
        ustar, _ = out
        return out, (ustar, p, u0)

    def _bwd(res_, cot):
        ustar, p, u0 = res_
        d_u, _ = cot
        uvec, unravel_u = ravel_pytree(ustar)
        gbar = ravel_pytree(d_u)[0]
        n = uvec.shape[0]

        fv = lambda uv, p_: ravel_pytree(f(unravel_u(uv), p_))[0]

        use_dense = (linsolve == "direct") or (
            linsolve is None and n <= dense_cutoff
        )
        if use_dense:
            J = jax.jacfwd(lambda uv: fv(uv, p))(uvec)
            lam = jnp.linalg.solve(J.T, gbar)
        else:
            # (∂f/∂u)ᵀ·v through one vjp of f — matrix-free.
            _, pullback = jax.vjp(lambda uv: fv(uv, p), uvec)

            def mtv(v):
                return pullback(v)[0]

            restart = min(30, n)
            lam, _ = jax.scipy.sparse.linalg.gmres(
                mtv, gbar,
                tol=sensealg.linsolve_reltol,
                restart=restart,
                maxiter=min(100, max(10, -(-n // restart))),
            )
            # Residual check (reference fallback-chain semantics:
            # steadystate_adjoint.jl:162-174 wraps vjp/linear-solve failure
            # with fallback + warning; a stiff/ill-conditioned (∂f/∂u)ᵀ must
            # never yield a silently wrong gradient).
            resid = jnp.linalg.norm(mtv(lam) - gbar)
            ok = resid <= sensealg.check_reltol * jnp.maximum(
                jnp.linalg.norm(gbar), jnp.asarray(1e-30, gbar.dtype)
            )
            if verbose:
                jax.lax.cond(
                    ok,
                    lambda: None,
                    lambda: jax.debug.print(
                        "[scimlsensitivity] SteadyStateAdjoint: GMRES did not "
                        "converge (resid={r}); "
                        + ("falling back to dense solve"
                           if n <= sensealg.dense_fallback_cutoff
                           else "NaN-poisoning the gradient"),
                        r=resid,
                    ),
                )
            if n <= sensealg.dense_fallback_cutoff:
                def _dense_fallback(_):
                    J = jax.jacfwd(lambda uv: fv(uv, p))(uvec)
                    return jnp.linalg.solve(J.T, gbar)

                lam = jax.lax.cond(ok, lambda _: lam, _dense_fallback, None)
            else:
                lam = jnp.where(ok, lam, jnp.full_like(lam, jnp.nan))

        # dL/dp = -λᵀ ∂f/∂p (:162-174)
        _, pb_p = jax.vjp(lambda p_: fv(uvec, p_), p)
        (pbar,) = pb_p(lam)
        dp = jax.tree_util.tree_map(jnp.negative, pbar)
        du0 = jax.tree_util.tree_map(jnp.zeros_like, u0)
        return du0, dp

    _root.defvjp(_fwd, _bwd)
    ustar, (resid, iters, converged) = _root(nlprob.u0, nlprob.p)
    return NonlinearSolution(
        u=ustar,
        resid=resid,
        retcode=jnp.where(converged, 0, 1).astype(jnp.int32),
        iters=iters,
        prob=prob,
    )


def solve_unconstrained_optimization(
    objective: Callable,
    u0,
    p,
    *,
    sensealg: SteadyStateAdjoint = SteadyStateAdjoint(),
    tol: float = 1e-10,
    max_iters: int = 100,
    verbose: bool = False,
) -> NonlinearSolution:
    """Differentiate argmin_u φ(u, p) by treating ∇_u φ = 0 as a steady state
    (UnconstrainedOptimizationAdjoint, reference concrete_solve.jl:2691)."""
    grad_f = jax.grad(objective, argnums=0)
    prob = NonlinearProblem(lambda u, p_: grad_f(u, p_), u0, p)
    return solve_nonlinear(prob, sensealg=sensealg, tol=tol, max_iters=max_iters,
                           verbose=verbose)
