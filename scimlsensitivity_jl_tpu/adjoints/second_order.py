"""Second-order sensitivities (reference: src/second_order.jl).

The reference computes Hessians forward-over-reverse:
`ForwardDiff.jacobian(p -> Zygote.gradient(loss, p))` (:1-11) and
Hessian-vector products by seeding one Dual partial (:15-28), with
`ForwardDiffOverAdjoint` (sensitivity_algorithms.jl:1760) composing forward
mode over a *continuous* adjoint so the inner pass stays O(1)-ish in memory.

Two execution paths here:

  * DirectAdjoint (default): `jax.jacfwd(jax.grad(...))` through the
    bounded-scan solver — exact discrete forward-over-reverse, O(max_steps)
    memory for the inner reverse.
  * Continuous adjoints (GaussAdjoint/InterpolatingAdjoint): `jax.custom_vjp`
    rules block jvp, so the adjoint gradient is re-expressed as an EXPLICIT
    forward-solve + reverse-λ-solve program (no custom_vjp wrapping) built
    from the same L1/L2 kernels; every piece (while_loop, dense gather,
    quadrature hook) is jvp-differentiable, so `jacfwd` over it is the
    ForwardDiffOverAdjoint composition — Hessians without O(max_steps)
    DirectAdjoint residuals.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..problems import remake
from ..sensealg import (
    DirectAdjoint,
    GaussAdjoint,
    GaussKronrodAdjoint,
    InterpolatingAdjoint,
    QuadratureAdjoint,
)
from ..solve import solve
from ..utils.pytree import ravel_pytree

__all__ = ["second_order_sensitivities", "second_order_sensitivity_product"]

_CONTINUOUS = (GaussAdjoint, InterpolatingAdjoint)
# QuadratureAdjoint/GaussKronrodAdjoint are rejected for second order: the
# jvp-differentiable gradient program runs one fixed Gauss-hook quadrature,
# so their abstol/reltol/max_depth knobs would be silently ignored
# (ADVICE r2) — requesting them must fail loudly, not quietly downgrade.
_CONTINUOUS_REJECT = (GaussKronrodAdjoint, QuadratureAdjoint)


def _unwrap_fdoa(sensealg):
    """ForwardDiffOverAdjoint(adjalg) -> its wrapped continuous adjoint
    (reference sensitivity_algorithms.jl:1760: forward over the adjoint)."""
    from ..sensealg import ForwardDiffOverAdjoint

    if isinstance(sensealg, ForwardDiffOverAdjoint):
        return sensealg.adjalg or GaussAdjoint()
    return sensealg


def _check_second_order_sensealg(sensealg):
    if isinstance(sensealg, _CONTINUOUS_REJECT):
        raise NotImplementedError(
            f"{type(sensealg).__name__} quadrature-control knobs "
            "(abstol/reltol/max_depth) have no effect in the fixed "
            "Gauss-hook Hessian program; use GaussAdjoint or "
            "InterpolatingAdjoint (equivalent gradients), or DirectAdjoint "
            "for the discrete path"
        )


def _loss_of_p(loss, prob, solver, sensealg, solve_kwargs):
    def run(p):
        sol = solve(remake(prob, p=p), solver, sensealg=sensealg, **solve_kwargs)
        return loss(sol)

    return run


def _continuous_adjoint_grad_fn(loss, prob, solver, solve_kwargs):
    """dL/dp (flat) as an explicit, jvp-differentiable adjoint program:
    forward saveat solve -> loss cotangents at save times -> reverse λ solve
    with per-accepted-step Gauss quadrature of λᵀ∂f/∂p (the GaussAdjoint
    formulation, reference gauss_adjoint.jl:806-851, composed under forward
    mode as in ForwardDiffOverAdjoint)."""
    from ..ops.interp import dense_eval, hermite_eval
    from ..ops.vjp import make_vjp_kernels
    from ..solution import ODESolution
    from ..solvers.explicit import Tsit5
    from .common import forward_saveat_solve, reverse_joined_solve
    from .continuous import _extend_times, _gl_nodes, _ravel_rows

    solver = solver or Tsit5()
    t0, t1 = prob.tspan
    u0vec, unravel_u = ravel_pytree(prob.u0)
    dtype = u0vec.dtype
    n = u0vec.shape[0]
    kw = dict(solve_kwargs)
    saveat = kw.pop("saveat", None)
    if saveat is None:
        saveat = jnp.asarray([t0, t1], dtype)
    else:
        saveat = jnp.asarray(saveat, dtype)
    rtol = kw.pop("rtol", 1e-7)
    atol = kw.pop("atol", 1e-9)
    max_steps = kw.pop("max_steps", 4096)
    adj_rtol = kw.pop("adj_rtol", None) or rtol
    adj_atol = kw.pop("adj_atol", None) or atol
    adj_max_steps = kw.pop("adj_max_steps", None) or max_steps
    bwd_solver = kw.pop("bwd_solver", None) or solver
    dt0 = kw.pop("dt0", None)
    if kw:
        raise NotImplementedError(
            f"forward-over-continuous-adjoint does not support {sorted(kw)}; "
            "use sensealg=DirectAdjoint() for these options"
        )
    if getattr(solver, "mass_matrix", None) is not None:
        raise NotImplementedError(
            "forward-over-continuous-adjoint: ODEs only (no mass matrices)"
        )

    _, unravel_p = ravel_pytree(prob.p)
    xg, wg = _gl_nodes(7, dtype)

    def grad_fn(pflat):
        p = unravel_p(pflat)
        kern = make_vjp_kernels(prob.f, prob.u0, p)
        fvec = lambda uv, t: kern.fvec(uv, p, t)
        fwd, _ = forward_saveat_solve(
            solver, fvec, u0vec, t0, t1, saveat,
            rtol=rtol, atol=atol, dt0=dt0, max_steps=max_steps,
            store_dense=True,
        )
        ys = jax.vmap(unravel_u)(fwd.ys_save)
        sol = ODESolution(ts=saveat, ys=ys, stats=fwd.stats,
                          retcode=fwd.stats.retcode, prob=prob,
                          solver=solver, unravel_u=unravel_u)
        d_ys = jax.grad(
            lambda yy: loss(dataclasses.replace(sol, ys=yy))
        )(ys)
        jumps_rows = _ravel_rows(d_ys)
        times, jumps = _extend_times(t0, t1, saveat, jumps_rows)
        dense = fwd.dense

        def aug_rhs(lam, t):
            return -kern.vjp_u(dense_eval(dense, t), p, t, lam)

        def gauss_hook(rec, qflat):
            ta, tb, lam_a, fa, lam_b, fb = rec
            width = tb - ta

            def node(xj):
                tj = ta + width * xj
                lam_j = hermite_eval(tj, ta, tb, lam_a, fa, lam_b, fb)
                yj = dense_eval(dense, tj)
                return ravel_pytree(kern.vjp_p(yj, p, tj, lam_j))[0]

            contribs = jax.vmap(node)(xg)
            return qflat - width * jnp.einsum("j,jk->k", wg, contribs)

        lam, qflat, worst, _ = reverse_joined_solve(
            bwd_solver, aug_rhs, times, jumps,
            jnp.zeros(n, dtype), n,
            rtol=adj_rtol, atol=adj_atol, max_steps=adj_max_steps,
            hook=gauss_hook, hook_carry=jnp.zeros(pflat.shape[0], dtype),
        )
        bad = jnp.maximum(fwd.stats.retcode, worst) != 0
        return jnp.where(bad, jnp.full_like(qflat, jnp.nan), qflat)

    return grad_fn


def second_order_sensitivities(loss, prob, solver=None, *, sensealg=None,
                               **solve_kwargs):
    """Hessian of `loss(sol)` wrt prob.p (flattened), forward-over-reverse.

    loss: callable ODESolution -> scalar. sensealg selects the inner reverse:
    DirectAdjoint (default, discrete) or a continuous adjoint
    (GaussAdjoint/InterpolatingAdjoint — the ForwardDiffOverAdjoint path).
    """
    sensealg = _unwrap_fdoa(sensealg) or DirectAdjoint()
    _check_second_order_sensealg(sensealg)
    pflat, unravel_p = ravel_pytree(prob.p)

    if isinstance(sensealg, _CONTINUOUS):
        grad_fn = _continuous_adjoint_grad_fn(loss, prob, solver, solve_kwargs)
        return jax.jacfwd(grad_fn)(pflat)

    run = _loss_of_p(loss, prob, solver, sensealg, solve_kwargs)

    def run_flat(pf):
        return run(unravel_p(pf))

    return jax.jacfwd(jax.grad(run_flat))(pflat)


def second_order_sensitivity_product(loss, prob, v, solver=None, *,
                                     sensealg=None, **solve_kwargs):
    """Hessian-vector product H·v wrt prob.p without materializing H —
    one jvp of the gradient in direction v (reference :15-28)."""
    sensealg = _unwrap_fdoa(sensealg) or DirectAdjoint()
    _check_second_order_sensealg(sensealg)
    pflat, unravel_p = ravel_pytree(prob.p)
    vflat = ravel_pytree(v)[0] if not isinstance(v, jnp.ndarray) else jnp.asarray(v)

    if isinstance(sensealg, _CONTINUOUS):
        grad_fn = _continuous_adjoint_grad_fn(loss, prob, solver, solve_kwargs)
        _, hv = jax.jvp(grad_fn, (pflat,), (vflat,))
        return hv

    run = _loss_of_p(loss, prob, solver, sensealg, solve_kwargs)

    def grad_flat(pf):
        return jax.grad(lambda x: run(unravel_p(x)))(pf)

    _, hv = jax.jvp(grad_flat, (pflat,), (vflat,))
    return hv
