"""Events / callbacks (reference: DiffEqCallbacks surface + the event-adjoint
machinery of src/callback_tracking.jl).

ContinuousCallback: condition(u, p, t) -> scalar; the event fires when the
sign changes within an accepted step. The event time is localized on the
step's dense interpolant by bisection + Newton polish (the Newton step keeps
τ(u) differentiable, which is what makes discrete-forward gradients through
events exact — the reference reaches the same property via `convert_tspan`
Duals, concrete_solve.jl:1351-1364).

DiscreteCallback: condition(u, p, t) -> bool, checked at accepted step ends.

affect(u, p, t) -> u⁺ is a pure state map (the functional analogue of the
reference's mutating affect!(integrator)). Events are recorded into a
fixed-size buffer (t*, u⁻, event-index) — the TrackedAffect record
(callback_tracking.jl:60-142) as scan-friendly arrays — and the reverse
passes apply the event-jump VJP

    λ⁻ = (∂A/∂u)ᵀλ⁺ − ∇g·(∂A/∂u·f⁻ − f⁺)ᵀλ⁺ / ġ,   ġ = ∇g·f⁻ + ∂g/∂t

(the implicit event-time correction, Eq. 13 of arXiv:1905.10403; reference
ImplicitCorrection callback_tracking.jl:15-58, reverse affect :319-458).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "ContinuousCallback",
    "DiscreteCallback",
    "CallbackSet",
    "EventRecord",
    "build_event_set",
]


@dataclass(frozen=True)
class ContinuousCallback:
    condition: Callable  # (u, p, t) -> scalar, event at zero crossing
    affect: Callable     # (u, p, t) -> u_new ; with modifies_p=True:
    #                      (u, p, t) -> (u_new, p_new) (the reference's
    #                      parameter-swapping events, callback_tracking.jl
    #                      :395-421 — implemented by lifting p into the
    #                      integration state, so every adjoint differentiates
    #                      through the swap with no extra machinery)
    direction: int = 0
    modifies_p: bool = False


@dataclass(frozen=True)
class DiscreteCallback:
    condition: Callable  # (u, p, t) -> bool
    affect: Callable     # (u, p, t) -> u_new ; modifies_p as for
    #                      ContinuousCallback
    modifies_p: bool = False


@dataclass(frozen=True)
class CallbackSet:
    continuous: Tuple[ContinuousCallback, ...] = ()
    discrete: Tuple[DiscreteCallback, ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "continuous", tuple(self.continuous))
        object.__setattr__(self, "discrete", tuple(self.discrete))


def as_callback_set(cb) -> Optional[CallbackSet]:
    if cb is None:
        return None
    if isinstance(cb, CallbackSet):
        return cb
    if isinstance(cb, ContinuousCallback):
        return CallbackSet(continuous=(cb,))
    if isinstance(cb, DiscreteCallback):
        return CallbackSet(discrete=(cb,))
    if isinstance(cb, (list, tuple)):
        cont = tuple(c for c in cb if isinstance(c, ContinuousCallback))
        disc = tuple(c for c in cb if isinstance(c, DiscreteCallback))
        return CallbackSet(continuous=cont, discrete=disc)
    raise TypeError(f"not a callback: {cb!r}")


class EventRecord(NamedTuple):
    """Fixed-size forward event log (TrackedAffect analogue)."""

    ts: jnp.ndarray      # (max_events,) event times (padded with +/-inf)
    u_pre: jnp.ndarray   # (max_events, n) left states
    idx: jnp.ndarray     # (max_events,) which callback fired (cont then disc)
    count: jnp.ndarray   # scalar int


class EventSet(NamedTuple):
    """Flat-state event functions for the integrator."""

    cond: Optional[Callable]       # (uvec, t) -> (k_cont,)
    affect: Callable               # (uvec, t, j) -> uvec  (j over all cbs)
    disc_cond: Optional[Callable]  # (uvec, t) -> (k_disc,) bool
    n_cont: int
    n_disc: int
    max_events: int
    directions: Any = None         # (k_cont,) in {-1, 0, +1}
    affect_p: Any = None           # (uvec, p, t, j) -> uvec (explicit p)


def build_event_set(cbs: CallbackSet, p, unravel_u, max_events: int) -> EventSet:
    """Lower a CallbackSet to flat-state functions, closing over p."""
    conts = cbs.continuous
    discs = cbs.discrete
    n_cont = len(conts)
    n_disc = len(discs)
    all_affects = [c.affect for c in conts] + [d.affect for d in discs]

    if n_cont:
        def cond(uvec, t):
            u = unravel_u(uvec)
            return jnp.stack([jnp.asarray(c.condition(u, p, t)) for c in conts])
    else:
        cond = None

    if n_disc:
        def disc_cond(uvec, t):
            u = unravel_u(uvec)
            return jnp.stack([jnp.asarray(d.condition(u, p, t)) for d in discs])
    else:
        disc_cond = None

    def affect_p(uvec, p_, t, j):
        from jax.flatten_util import ravel_pytree

        u = unravel_u(uvec)
        branches = [
            (lambda a: (lambda: ravel_pytree(a(u, p_, t))[0]))(a)
            for a in all_affects
        ]
        return jax.lax.switch(j, branches)

    def affect(uvec, t, j):
        return affect_p(uvec, p, t, j)

    directions = jnp.asarray([c.direction for c in conts], jnp.int32) \
        if n_cont else None
    return EventSet(cond=cond, affect=affect, disc_cond=disc_cond,
                    n_cont=n_cont, n_disc=n_disc, max_events=max_events,
                    directions=directions, affect_p=affect_p)


def any_modifies_p(cbs: CallbackSet) -> bool:
    return any(getattr(c, "modifies_p", False)
               for c in tuple(cbs.continuous) + tuple(cbs.discrete))


def lift_p_into_state(prob, cbs: CallbackSet):
    """Rewrite (prob, callbacks) so that p becomes part of the integration
    state: z = (u, p), f_z = (f(u,p,t), 0), conditions/affects read p from
    the state, and p-modifying affects write it. Returns (prob_z, cbs_z).

    Gradients wrt the original p emerge as the p-part of du0 on the lifted
    problem — the state-extension formulation of the reference's
    param-swap event tracking (callback_tracking.jl reset_p / PSwap)."""
    import jax.tree_util as jtu

    from .problems import ODEProblem

    f = prob.f

    def f_z(z, _p, t):
        u, pp = z
        du = f(u, pp, t)
        return (du, jtu.tree_map(jnp.zeros_like, pp))

    def lift_cont(cb: ContinuousCallback) -> ContinuousCallback:
        cond = cb.condition
        aff = cb.affect
        if cb.modifies_p:
            def affect_z(z, _p, t):
                return aff(z[0], z[1], t)  # returns (u_new, p_new)
        else:
            def affect_z(z, _p, t):
                return (aff(z[0], z[1], t), z[1])
        return ContinuousCallback(
            condition=lambda z, _p, t: cond(z[0], z[1], t),
            affect=affect_z, direction=cb.direction,
        )

    def lift_disc(cb: DiscreteCallback) -> DiscreteCallback:
        cond = cb.condition
        aff = cb.affect
        if cb.modifies_p:
            def affect_z(z, _p, t):
                return aff(z[0], z[1], t)
        else:
            def affect_z(z, _p, t):
                return (aff(z[0], z[1], t), z[1])
        return DiscreteCallback(
            condition=lambda z, _p, t: cond(z[0], z[1], t), affect=affect_z
        )

    cbs_z = CallbackSet(
        continuous=tuple(lift_cont(c) for c in cbs.continuous),
        discrete=tuple(lift_disc(c) for c in cbs.discrete),
    )
    prob_z = ODEProblem(f_z, (prob.u0, prob.p), prob.tspan, None)
    return prob_z, cbs_z
