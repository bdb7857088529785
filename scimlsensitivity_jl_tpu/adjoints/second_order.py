"""Second-order sensitivities (reference: src/second_order.jl).

The reference computes Hessians forward-over-reverse:
`ForwardDiff.jacobian(p -> Zygote.gradient(loss, p))` (:1-11) and
Hessian-vector products by seeding one Dual partial (:15-28).

In JAX, `jax.custom_vjp` rules block jvp, so forward-over-reverse must run
through the one solve path differentiable in *both* modes: the bounded-scan
DirectAdjoint. `jax.jacfwd(jax.grad(...))` over it is exactly
forward-over-reverse; Hv products are one `jax.jvp` of the gradient in the
direction v — the same one-Dual-partial trick, native.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..problems import remake
from ..sensealg import DirectAdjoint
from ..solve import solve
from ..utils.pytree import ravel_pytree

__all__ = ["second_order_sensitivities", "second_order_sensitivity_product"]


def _loss_of_p(loss, prob, solver, sensealg, solve_kwargs):
    def run(p):
        sol = solve(remake(prob, p=p), solver, sensealg=sensealg, **solve_kwargs)
        return loss(sol)

    return run


def second_order_sensitivities(loss, prob, solver=None, *, sensealg=None,
                               **solve_kwargs):
    """Hessian of `loss(sol)` wrt prob.p (flattened), forward-over-reverse.

    loss: callable ODESolution -> scalar.
    """
    sensealg = sensealg or DirectAdjoint()
    run = _loss_of_p(loss, prob, solver, sensealg, solve_kwargs)
    pflat, unravel_p = ravel_pytree(prob.p)

    def run_flat(pf):
        return run(unravel_p(pf))

    return jax.jacfwd(jax.grad(run_flat))(pflat)


def second_order_sensitivity_product(loss, prob, v, solver=None, *,
                                     sensealg=None, **solve_kwargs):
    """Hessian-vector product H·v wrt prob.p without materializing H —
    one jvp of the gradient in direction v (reference :15-28)."""
    sensealg = sensealg or DirectAdjoint()
    run = _loss_of_p(loss, prob, solver, sensealg, solve_kwargs)
    pflat, unravel_p = ravel_pytree(prob.p)
    vflat = ravel_pytree(v)[0] if not isinstance(v, jnp.ndarray) else jnp.asarray(v)

    def grad_flat(pf):
        return jax.grad(lambda x: run(unravel_p(x)))(pf)

    _, hv = jax.jvp(grad_flat, (pflat,), (vflat,))
    return hv
