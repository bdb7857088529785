"""Newton solver for nonlinear problems f(u, p) = 0.

The stand-in for the external NonlinearSolve.jl layer the reference's
SteadyStateAdjoint sits on (SURVEY §2 item 6). Damped Newton with a
fixed-shape backtracking line search inside a `lax.while_loop`; dense LU for
the linear solve (small n) or matrix-free Newton-Krylov (GMRES) above a
cutoff — mirroring the reference's `needs_jac` heuristic
(steadystate_adjoint.jl:66-72).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["NewtonResult", "newton_solve"]


class NewtonResult(NamedTuple):
    u: jnp.ndarray
    resid_norm: jnp.ndarray
    iters: jnp.ndarray
    converged: jnp.ndarray


def newton_solve(
    fvec: Callable,  # (uvec) -> residual vec
    u0: jnp.ndarray,
    *,
    tol: float = 1e-10,
    max_iters: int = 50,
    dense_cutoff: int = 50,
    line_search_steps: int = 4,
    gmres_restart: int = 20,
) -> NewtonResult:
    n = u0.shape[0]
    dtype = u0.dtype
    use_dense = n <= dense_cutoff

    def step_dir(u, r):
        if use_dense:
            J = jax.jacfwd(fvec)(u)
            return jnp.linalg.solve(J, r)
        # Matrix-free: J·v via jvp, GMRES.
        def mv(v):
            return jax.jvp(fvec, (u,), (v,))[1]

        d, _ = jax.scipy.sparse.linalg.gmres(
            mv, r, tol=1e-10, restart=min(gmres_restart, n), maxiter=5
        )
        return d

    def cond(c):
        u, r_norm, it, done = c
        return (~done) & (it < max_iters)

    def body(c):
        u, r_norm, it, _ = c
        r = fvec(u)
        d = step_dir(u, r)
        # Backtracking: try alpha = 1, 1/2, 1/4, ... pick first that reduces
        # the residual (evaluated as a fixed batched sweep).
        alphas = 0.5 ** jnp.arange(line_search_steps, dtype=dtype)
        cand = u[None, :] - alphas[:, None] * d[None, :]
        r_cand = jax.vmap(lambda uu: jnp.linalg.norm(fvec(uu)))(cand)
        best = jnp.argmin(r_cand)
        u_new = cand[best]
        r_new = r_cand[best]
        done = r_new <= tol * (1.0 + jnp.linalg.norm(u_new))
        bad = ~jnp.isfinite(r_new)
        u_new = jnp.where(bad, u, u_new)
        return (u_new, r_new, it + 1, done | bad)

    r0 = jnp.linalg.norm(fvec(u0))
    init = (u0, r0, jnp.asarray(0, jnp.int32),
            r0 <= tol * (1.0 + jnp.linalg.norm(u0)))
    u, r_norm, iters, done = jax.lax.while_loop(cond, body, init)
    return NewtonResult(u=u, resid_norm=r_norm, iters=iters, converged=done)
