"""Per-step event detection and application, shared by the adaptive
while_loop driver (integrate) and the reverse-differentiable scan driver
(integrate_scan → DirectAdjoint).

ContinuousCallback crossings are found on the accepted step's Hermite
interpolant: interior sampling (the interp_points device of DiffEq's
ContinuousCallback) brackets each condition's first sign change, bisection +
Newton polish localizes τ, and the step is truncated to the earliest event.
SIMULTANEOUS events (several conditions crossing within √eps of the same θ,
or several discrete conditions true at one step end) are all applied, in
callback order, each recorded with its own pre-affect state so the reverse
pass can compose the jump VJPs last-recorded-first (the reference handles
duplicated event times via dedup + duplicated PresetTime entries,
callback_tracking.jl:126-130, adjoint_common.jl:824-868).

Everything here is differentiable: τ stays differentiable through the final
Newton steps (implicit-function gradient), which is what makes discrete
gradients through events exact under jvp (ForwardDiffSensitivity) and under
reverse AD over the scan driver (DirectAdjoint).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.interp import hermite_eval

__all__ = ["StepEvents", "process_step_events", "init_event_buffers"]


class StepEvents(NamedTuple):
    fired: jnp.ndarray      # scalar bool — any event on this step
    t_e: jnp.ndarray        # event time (== step end if none)
    u_pre: jnp.ndarray      # pre-affect state at t_e (first event)
    f_pre: jnp.ndarray
    u_post: jnp.ndarray     # state after ALL simultaneous affects
    f_post: jnp.ndarray
    events: tuple           # updated (ev_ts, ev_upre, ev_idx, ev_count)
    terminated: jnp.ndarray = None  # scalar bool — a terminal cb fired


def init_event_buffers(event_set, t1, n, dtype, tdtype):
    me = event_set.max_events
    return (
        jnp.full((me,), t1, tdtype),
        jnp.zeros((me, n), dtype),
        jnp.full((me,), -1, jnp.int32),
        jnp.asarray(0, jnp.int32),
    )


def process_step_events(event_set, fvec, t_a, dt_eff, u_a, f_a, u_b, f_b,
                        accept, events, tdtype):
    """Detect/apply events on the accepted step [t_a, t_a + dt_eff].

    Returns a StepEvents with the truncation target (t_e, u_pre, f_pre), the
    post-affect continuation state, and the updated record buffers. All
    fields are valid only where `fired & accept`; the caller merges with
    jnp.where.
    """
    t_b = t_a + dt_eff
    k_cont = event_set.n_cont
    k_disc = event_set.n_disc
    K = k_cont + k_disc
    ev_ts, ev_upre, ev_idx, ev_count = events
    n = u_a.shape[0]
    eps = jnp.finfo(tdtype).eps

    def _detect(args):
        u_a_, f_a_, u_b_, f_b_ = args
        theta_min = jnp.asarray(2.0, tdtype)
        crossed = jnp.zeros((max(k_cont, 1),), bool)
        thetas = jnp.full((max(k_cont, 1),), 2.0, tdtype)

        if k_cont > 0:
            NSMP = 8
            th_grid = jnp.linspace(
                jnp.asarray(0.0, tdtype), jnp.asarray(1.0, tdtype), NSMP + 1
            )

            def g_at(th):
                tt = t_a + th * dt_eff
                uu = hermite_eval(tt, t_a, t_b, u_a_, f_a_, u_b_, f_b_)
                return event_set.cond(uu, tt)  # (k_cont,)

            g_smp = jax.vmap(g_at)(th_grid)  # (NSMP+1, k_cont)
            gl, gr = g_smp[:-1], g_smp[1:]
            pair = (gl * gr < 0) | ((gr == 0) & (gl != 0))
            # Refractory guard: right after an event whose affect leaves the
            # condition at ~0 (e.g. parameter swaps), the θ=0 sample sits at
            # polish-residual level — don't count a "crossing" out of that
            # numerical zero.
            g_scale = jnp.max(jnp.abs(g_smp), axis=0)
            tol_g = jnp.sqrt(eps) * (g_scale + 1e-300)
            pair = pair.at[0].set(pair[0] & (jnp.abs(g_smp[0]) > tol_g))
            if event_set.directions is not None:
                dirs = event_set.directions[None, :]
                pair = pair & (
                    (dirs == 0)
                    | ((dirs == -1) & (gl > 0))
                    | ((dirs == 1) & (gl < 0))
                )
            crossed = jnp.any(pair, axis=0)   # (k_cont,)
            m_first = jnp.argmax(pair, axis=0)

            def locate(gk_fn, crossed_k, m_k):
                def gtheta(th):
                    tt = t_a + th * dt_eff
                    uu = hermite_eval(tt, t_a, t_b, u_a_, f_a_, u_b_, f_b_)
                    return gk_fn(uu, tt)

                def bis(_, lohi):
                    lo, hi = lohi
                    mid = 0.5 * (lo + hi)
                    gm = gtheta(mid)
                    ga = gtheta(lo)
                    same = gm * ga >= 0
                    return (jnp.where(same, mid, lo),
                            jnp.where(same, hi, mid))

                lo0 = th_grid[m_k]
                hi0 = th_grid[m_k + 1]
                lo, hi = jax.lax.fori_loop(0, 40, bis, (lo0, hi0))
                th = 0.5 * (lo + hi)
                for _ in range(2):  # Newton polish keeps τ differentiable
                    g_v, dg = jax.jvp(gtheta, (th,), (jnp.ones_like(th),))
                    th = th - jnp.where(jnp.abs(dg) > 1e-30, g_v / dg, 0.0)
                th = jnp.clip(th, 0.0, 1.0)
                return jnp.where(crossed_k, th, jnp.asarray(2.0, tdtype))

            thetas = jnp.stack([
                locate(
                    lambda uu, tt, i=i: event_set.cond(uu, tt)[i],
                    crossed[i],
                    m_first[i],
                )
                for i in range(k_cont)
            ])
            theta_min = jnp.min(thetas)

        any_c = theta_min <= 1.0

        def _cont_fire(_):
            t_e = t_a + theta_min * dt_eff
            # sub-f32 states: the (>= f32) event time promotes the Hermite
            # result; restore the state dtype so the cond branches agree
            u_pre0 = hermite_eval(t_e, t_a, t_b, u_a_, f_a_, u_b_,
                                  f_b_).astype(u_a_.dtype)
            f_pre0 = fvec(u_pre0, t_e).astype(u_a_.dtype)
            # apply ALL conditions crossing within √eps of θ_min, in
            # callback order, composing the state
            tol_th = jnp.sqrt(eps)
            fires = jnp.zeros((K,), bool)
            u_pres = jnp.zeros((K, n), u_a_.dtype)
            state = u_pre0
            for j in range(k_cont):
                fire_j = crossed[j] & (thetas[j] <= theta_min + tol_th)
                u_pres = u_pres.at[j].set(state)
                state = jax.lax.cond(
                    fire_j,
                    lambda s, jj=j: event_set.affect(s, t_e, jj),
                    lambda s: s,
                    state,
                )
                fires = fires.at[j].set(fire_j)
            state = state.astype(u_a_.dtype)
            return (t_e, u_pre0, f_pre0, state,
                    fvec(state, t_e).astype(u_a_.dtype), fires, u_pres)

        def _disc_check(_):
            fires = jnp.zeros((K,), bool)
            u_pres = jnp.zeros((K, n), u_a_.dtype)
            state = u_b_
            if k_disc > 0:
                dc = event_set.disc_cond(u_b_, t_b)  # (k_disc,) bool
                for jd in range(k_disc):
                    j = k_cont + jd
                    fire_j = dc[jd]
                    u_pres = u_pres.at[j].set(state)
                    state = jax.lax.cond(
                        fire_j,
                        lambda s, jj=j: event_set.affect(s, t_b, jj),
                        lambda s: s,
                        state,
                    )
                    fires = fires.at[j].set(fire_j)
            state = state.astype(u_a_.dtype)
            return (t_b, u_b_, f_b_, state,
                    fvec(state, t_b).astype(u_a_.dtype), fires, u_pres)

        return jax.lax.cond(any_c, _cont_fire, _disc_check, None)

    def _no_detect(args):
        return (t_b, u_b, f_b, u_b, f_b,
                jnp.zeros((K,), bool), jnp.zeros((K, n), u_a.dtype))

    t_e, u_pre0, f_pre0, u_post, f_post, fires, u_pres = jax.lax.cond(
        accept, _detect, _no_detect, (u_a, f_a, u_b, f_b)
    )
    any_fired = accept & jnp.any(fires)

    # record each fired callback (same t_e, its own pre-affect state) —
    # unrolled over the static callback count
    for j in range(K):
        fire = accept & fires[j]
        slot = jnp.minimum(ev_count, ev_ts.shape[0] - 1)
        ev_ts = ev_ts.at[slot].set(jnp.where(fire, t_e, ev_ts[slot]))
        ev_upre = ev_upre.at[slot].set(
            jnp.where(fire, u_pres[j], ev_upre[slot])
        )
        ev_idx = ev_idx.at[slot].set(
            jnp.where(fire, jnp.asarray(j, jnp.int32), ev_idx[slot])
        )
        ev_count = ev_count + fire.astype(jnp.int32)

    if event_set.terminals is not None:
        terminated = accept & jnp.any(fires & event_set.terminals)
    else:
        terminated = jnp.asarray(False)

    # State outputs restored to the integration state's dtype: interpolation
    # at the (>= f32) event time promotes sub-f32 states, which would
    # otherwise collide with the bf16/f16 loop carry in the drivers' merges.
    sd = u_a.dtype
    return StepEvents(
        fired=any_fired,
        t_e=t_e,
        u_pre=u_pre0.astype(sd),
        f_pre=f_pre0.astype(sd),
        u_post=u_post.astype(sd),
        f_post=f_post.astype(sd),
        events=(ev_ts, ev_upre, ev_idx, ev_count),
        terminated=terminated,
    )
