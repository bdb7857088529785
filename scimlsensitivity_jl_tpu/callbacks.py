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
    "VectorContinuousCallback",
    "PresetTimeCallback",
    "PeriodicCallback",
    "TerminateSteadyState",
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
    terminal: bool = False  # terminate!(integrator) analogue: the affect is
    #                         applied, then integration stops at τ with
    #                         retcode RETCODE_TERMINATED; sol.t_final = τ is
    #                         differentiable under DirectAdjoint /
    #                         ForwardDiffSensitivity (Newton-polished τ)


@dataclass(frozen=True)
class DiscreteCallback:
    condition: Callable  # (u, p, t) -> bool
    affect: Callable     # (u, p, t) -> u_new ; modifies_p as for
    #                      ContinuousCallback
    modifies_p: bool = False
    terminal: bool = False


@dataclass(frozen=True)
class VectorContinuousCallback:
    """Vector of zero-crossing conditions sharing one indexed affect
    (reference: SciMLBase VectorContinuousCallback; tracked per component by
    callback_tracking.jl:144-185). condition(u, p, t) -> (len,) array;
    affect(u, p, t, idx) -> u_new with the static component index. Lowered
    to `len` scalar ContinuousCallbacks at solve time, so detection,
    records, and every adjoint treat each component as its own event."""

    condition: Callable
    affect: Callable
    len: int
    direction: int = 0
    modifies_p: bool = False
    terminal: bool = False

    def lower(self) -> tuple:
        def comp(i):
            return ContinuousCallback(
                condition=lambda u, p, t, i=i: jnp.asarray(
                    self.condition(u, p, t))[i],
                affect=lambda u, p, t, i=i: self.affect(u, p, t, i),
                direction=self.direction,
                modifies_p=self.modifies_p,
                terminal=self.terminal,
            )

        return tuple(comp(i) for i in range(self.len))


@dataclass(frozen=True)
class PresetTimeCallback:
    """Apply `affect` at the given times (DiffEqCallbacks.PresetTimeCallback
    — the dosing-event surface; the reference's reverse pass inserts these
    as PresetTimeCallback too, adjoint_common.jl:824-868). Lowered at solve
    time to a DiscreteCallback firing when the step end lands on a preset
    time, with the times forced as tstops so step ends DO land there."""

    ts: Any              # 1-D array-like of concrete event times
    affect: Callable     # (u, p, t) -> u_new
    modifies_p: bool = False
    terminal: bool = False

    def lower(self, t0, t1):
        import numpy as _onp

        t0, t1 = float(t0), float(t1)  # needs a concrete tspan
        ts = _onp.atleast_1d(_onp.asarray(self.ts, float))
        lo, hi = (min(t0, t1), max(t0, t1))
        ts = ts[(ts > lo) & (ts <= hi)]  # t0 itself can't be a step end
        # numpy, NOT jnp: solve may be (re)traced under an outer jit, where
        # jnp.asarray would yield a tracer that poisons the tstops merge;
        # a numpy constant broadcasts against the traced t just fine.
        ts_arr = _onp.sort(ts)

        def condition(u, p, t):
            # step ends hit tstops up to ~1 ulp (t_new = t + (stop - t))
            tol = 64.0 * jnp.finfo(jnp.result_type(t, float)).eps * \
                jnp.maximum(1.0, jnp.abs(t))
            return jnp.any(jnp.abs(t - ts_arr) <= tol)

        cb = DiscreteCallback(condition=condition, affect=self.affect,
                              modifies_p=self.modifies_p,
                              terminal=self.terminal)
        return cb, ts_arr


@dataclass(frozen=True)
class PeriodicCallback:
    """Apply `affect` every `period` time units, first at t0 + period
    (DiffEqCallbacks.PeriodicCallback). Lowered to PresetTimeCallback over
    the tspan at solve time."""

    affect: Callable
    period: float
    modifies_p: bool = False
    terminal: bool = False

    def lower(self, t0, t1):
        import numpy as _onp

        span = abs(float(t1) - float(t0))
        k = int(_onp.floor(span / float(self.period) + 1e-12))
        sign = 1.0 if float(t1) >= float(t0) else -1.0
        ts = float(t0) + sign * float(self.period) * _onp.arange(1, k + 1)
        return PresetTimeCallback(ts=ts, affect=self.affect,
                                  modifies_p=self.modifies_p,
                                  terminal=self.terminal).lower(t0, t1)


@dataclass(frozen=True)
class TerminateSteadyState:
    """Terminate when du/dt has converged: all |f(u,p,t)| <= abstol +
    reltol·|u| at an accepted step end (DiffEqCallbacks.TerminateSteadyState).
    Lowered at solve time to a terminal DiscreteCallback closing over the
    problem's RHS. min_t guards against spuriously-flat transients."""

    abstol: float = 1e-8
    reltol: float = 1e-6
    min_t: Optional[float] = None

    def lower(self, f, unused_t0=None):
        from jax.flatten_util import ravel_pytree

        def condition(u, p, t):
            du, _ = ravel_pytree(f(u, p, t))
            uv, _ = ravel_pytree(u)
            ok = jnp.all(jnp.abs(du) <= self.abstol
                         + self.reltol * jnp.abs(uv))
            if self.min_t is not None:
                ok = ok & (t >= self.min_t)
            return ok

        return DiscreteCallback(condition=condition,
                                affect=lambda u, p, t: u, terminal=True)


@dataclass(frozen=True)
class CallbackSet:
    continuous: Tuple[ContinuousCallback, ...] = ()
    discrete: Tuple[DiscreteCallback, ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "continuous", tuple(self.continuous))
        object.__setattr__(self, "discrete", tuple(self.discrete))


def lower_time_callbacks(cb, f, t0, t1):
    """Lower the solve-time-context callbacks (PresetTime/Periodic into
    tstop-pinned DiscreteCallbacks; TerminateSteadyState closes over the
    problem RHS). Returns (lowered, extra_tstops ndarray or None).
    Accepts a single callback, a list/tuple, or a CallbackSet."""
    import numpy as _onp

    items = list(cb) if isinstance(cb, (list, tuple)) else [cb]
    if isinstance(cb, CallbackSet):
        items = list(cb.continuous) + list(cb.discrete)
    out, stops = [], []
    for c in items:
        if isinstance(c, (PresetTimeCallback, PeriodicCallback)):
            dc, ts = c.lower(t0, t1)
            out.append(dc)
            stops.append(_onp.asarray(ts))
        elif isinstance(c, TerminateSteadyState):
            out.append(c.lower(f))
        else:
            out.append(c)
    extra = _onp.sort(_onp.unique(_onp.concatenate(stops))) if stops else None
    return out, extra


def as_callback_set(cb) -> Optional[CallbackSet]:
    if cb is None:
        return None
    if isinstance(cb, CallbackSet):
        return cb
    if isinstance(cb, VectorContinuousCallback):
        return CallbackSet(continuous=cb.lower())
    if isinstance(cb, ContinuousCallback):
        return CallbackSet(continuous=(cb,))
    if isinstance(cb, DiscreteCallback):
        return CallbackSet(discrete=(cb,))
    if isinstance(cb, (list, tuple)):
        cont, disc = [], []
        for c in cb:
            if isinstance(c, VectorContinuousCallback):
                cont.extend(c.lower())
            elif isinstance(c, ContinuousCallback):
                cont.append(c)
            elif isinstance(c, DiscreteCallback):
                disc.append(c)
            else:
                raise TypeError(
                    f"not a callback (or needs lower_time_callbacks): {c!r}"
                )
        return CallbackSet(continuous=tuple(cont), discrete=tuple(disc))
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
    terminals: Any = None          # (k_cont + k_disc,) bool, or None


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
    term_flags = [bool(getattr(c, "terminal", False))
                  for c in tuple(conts) + tuple(discs)]
    terminals = jnp.asarray(term_flags) if any(term_flags) else None
    return EventSet(cond=cond, affect=affect, disc_cond=disc_cond,
                    n_cont=n_cont, n_disc=n_disc, max_events=max_events,
                    directions=directions, affect_p=affect_p,
                    terminals=terminals)


def any_modifies_p(cbs: CallbackSet) -> bool:
    return any(getattr(c, "modifies_p", False)
               for c in tuple(cbs.continuous) + tuple(cbs.discrete))


def _closure_tracers(fn, _depth=0):
    """Find jax Tracers captured in `fn`'s closure (recursing through
    captured functions / containers, depth-bounded)."""
    import functools

    import jax

    if _depth > 4:
        return []
    found = []

    def _scan_value(v, d):
        # only AD-trace tracers break the custom_vjp boundary; tracers
        # from an enclosing jit/vmap (DynamicJaxprTracer/BatchTracer)
        # inline into the same trace and are fine
        if isinstance(v, jax.core.Tracer) and type(v).__name__ in (
                "JVPTracer", "LinearizeTracer"):
            found.append(v)
        elif isinstance(v, (list, tuple)):
            for x in v:
                _scan_value(x, d)
        elif isinstance(v, dict):
            for x in v.values():
                _scan_value(x, d)
        elif isinstance(v, functools.partial):
            for x in v.args:
                _scan_value(x, d)
            for x in v.keywords.values():
                _scan_value(x, d)
            found.extend(_closure_tracers(v.func, d + 1))
        elif callable(v) and hasattr(v, "__closure__"):
            found.extend(_closure_tracers(v, d + 1))

    cells = getattr(fn, "__closure__", None) or ()
    for cell in cells:
        try:
            _scan_value(cell.cell_contents, _depth)
        except ValueError:  # empty cell
            pass
    return found


def check_callback_closures(cbs: CallbackSet) -> None:
    """Loud guard for the custom_vjp boundary: callback conditions/affects
    whose Python closures capture TRACED values (e.g. the loss's own
    parameter argument) cannot cross a continuous-adjoint custom_vjp rule —
    JAX raises a cryptic UnexpectedTracerError deep inside the driver (this
    bit r4 in both the while and scan drivers). Traced values must be
    threaded through the problem's params: condition/affect receive
    (u, p, t). Only DirectAdjoint (plain discrete AD through the solver,
    no custom_vjp boundary) supports closure capture; every sensealg in
    solve.py's _CONTINUOUS_RULES — including ForwardDiffSensitivity,
    whose jvp re-solve crosses the same boundary — is checked here."""
    for c in tuple(cbs.continuous) + tuple(cbs.discrete):
        for role in ("condition", "affect"):
            fn = getattr(c, role, None)
            if fn is not None and _closure_tracers(fn):
                raise ValueError(
                    f"the {role} of a {type(c).__name__} closure-captures "
                    "a traced value (a jax Tracer, e.g. the argument being "
                    "differentiated). Continuous adjoints run through a "
                    "custom_vjp rule, and closure-captured tracers cannot "
                    "cross that boundary. Thread the value through the "
                    "problem's params instead — condition/affect receive "
                    "(u, p, t) — or use sensealg=DirectAdjoint() (exact "
                    "discrete AD, no custom_vjp boundary)."
                )


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
            affect=affect_z, direction=cb.direction, terminal=cb.terminal,
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
            condition=lambda z, _p, t: cond(z[0], z[1], t), affect=affect_z,
            terminal=cb.terminal,
        )

    cbs_z = CallbackSet(
        continuous=tuple(lift_cont(c) for c in cbs.continuous),
        discrete=tuple(lift_disc(c) for c in cbs.discrete),
    )
    prob_z = ODEProblem(f_z, (prob.u0, prob.p), prob.tspan, None)
    return prob_z, cbs_z


def lift_p_into_state_sde(prob, callbacks: tuple):
    """SDE analogue of `lift_p_into_state`: rewrite (SDEProblem, callbacks)
    so p rides the integration state z = (u, p) with ZERO noise rows —
    drift (f(u,p,t), 0), diffusion (g(u,p,t), 0) — and p-modifying affects
    write the p-part. The p-rows are driftless and noiseless, so the SDE
    solution and every discrete adjoint are unchanged except for the dose
    jumps (reference param-swap events, callback_tracking.jl:395-421; the
    reference has no SDE modifies_p path at all).

    Returns (prob_z, callbacks_z, n_u) with n_u the flat dim of the
    original state (for un-lifting the solution rows)."""
    import jax.tree_util as jtu
    from jax.flatten_util import ravel_pytree as _ravel

    from .problems import SDEProblem

    if getattr(prob, "noise_process", None) is not None:
        raise NotImplementedError(
            "modifies_p SDE callbacks + user noise_process: the p-lift "
            "changes the state (and noise) dimension, which a fixed user "
            "path cannot follow — use framework noise or fold p into the "
            "state manually"
        )
    f, g = prob.f, prob.g
    n_u = _ravel(prob.u0)[0].shape[0]
    np_flat = _ravel(prob.p)[0].shape[0] if prob.p is not None else 0

    def f_z(z, _p, t):
        u, pp = z
        return (f(u, pp, t), jtu.tree_map(jnp.zeros_like, pp))

    if prob.noise == "general":
        def g_z(z, _p, t):
            u, pp = z
            G = jnp.asarray(g(u, pp, t))
            return jnp.concatenate(
                [G, jnp.zeros((np_flat, G.shape[1]), G.dtype)], axis=0
            )
    else:  # diagonal / scalar: g returns a pytree shaped like u
        def g_z(z, _p, t):
            u, pp = z
            return (g(u, pp, t), jtu.tree_map(jnp.zeros_like, pp))

    def wrap_affect(aff, modifies_p):
        if modifies_p:
            def affect_z(z, _p, t):
                return aff(z[0], z[1], t)  # returns (u_new, p_new)
        else:
            def affect_z(z, _p, t):
                return (aff(z[0], z[1], t), z[1])
        return affect_z

    def lift_cb(c):
        if isinstance(c, ContinuousCallback):
            cond = c.condition
            return ContinuousCallback(
                condition=lambda z, _p, t, cond=cond: cond(z[0], z[1], t),
                affect=wrap_affect(c.affect, c.modifies_p),
                direction=c.direction, terminal=c.terminal,
            )
        if isinstance(c, DiscreteCallback):
            cond = c.condition
            return DiscreteCallback(
                condition=lambda z, _p, t, cond=cond: cond(z[0], z[1], t),
                affect=wrap_affect(c.affect, c.modifies_p),
                terminal=c.terminal,
            )
        if isinstance(c, PresetTimeCallback):
            return PresetTimeCallback(
                ts=c.ts, affect=wrap_affect(c.affect, c.modifies_p),
                terminal=c.terminal,
            )
        if isinstance(c, PeriodicCallback):
            return PeriodicCallback(
                affect=wrap_affect(c.affect, c.modifies_p),
                period=c.period, terminal=c.terminal,
            )
        raise NotImplementedError(
            f"modifies_p lift: unsupported SDE callback type "
            f"{type(c).__name__}"
        )

    prob_z = SDEProblem(
        f=f_z, g=g_z, u0=(prob.u0, prob.p), tspan=prob.tspan, p=None,
        noise=prob.noise, interpretation=prob.interpretation,
        noise_dim=prob.noise_dim,
    )
    return prob_z, tuple(lift_cb(c) for c in callbacks), n_u
