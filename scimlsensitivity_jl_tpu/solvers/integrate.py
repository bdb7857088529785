"""Adaptive time-stepping driver.

The core IVP engine (SURVEY §7 build-order item 1): a `lax.while_loop` over
step attempts with a PI step-size controller, fixed-shape dense-output
buffers, `tstops` honored by clipping dt, and an optional per-accepted-step
hook (used by GaussAdjoint quadrature accumulation and event detection —
the XLA-native replacement for DiffEqCallbacks' IntegratingSumCallback /
PresetTimeCallback, reference: src/gauss_adjoint.jl:806-851,
src/adjoint_common.jl:824-868).

Everything is traced once and compiled: no data-dependent Python control
flow; the loop carry is a flat NamedTuple of arrays.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.interp import DenseOutput

__all__ = [
    "IntegrateResult",
    "Stats",
    "integrate",
    "integrate_scan",
    "integrate_fixed",
    "hairer_norm",
    "initial_step_size",
    "RETCODE_SUCCESS",
    "RETCODE_MAXITERS",
    "RETCODE_DTMIN",
]

RETCODE_SUCCESS = 0
RETCODE_MAXITERS = 1
RETCODE_DTMIN = 2
# 3 = DDE lag violation (adjoints/dde.py)
RETCODE_EVENT_OVERFLOW = 4  # more event firings than max_events record slots
# Deliberate early stop by a terminal callback (reference retcode
# Terminated) — a SUCCESS variant, not a failure: values/gradients stay
# valid (saveat rows strictly after t_final hold the terminal state).
RETCODE_TERMINATED = 5


class Stats(NamedTuple):
    n_accepted: jnp.ndarray
    n_rejected: jnp.ndarray
    n_fevals: jnp.ndarray  # approximate: stages * attempts
    retcode: jnp.ndarray


class IntegrateResult(NamedTuple):
    dense: DenseOutput
    t_final: jnp.ndarray
    u_final: jnp.ndarray
    stats: Stats
    hook_carry: Any
    events: Any = None  # (ev_ts, ev_upre, ev_idx, ev_count) when events on


def hairer_norm(x):
    """RMS norm used by the Hairer-Wanner error controller (complex-safe)."""
    return jnp.sqrt(jnp.mean(jnp.abs(x) ** 2))


def initial_step_size(fvec, t0, u0, f0, order, rtol, atol, tdir):
    """Hairer-Norsett-Wanner automatic initial dt (Solving ODEs I, II.4)."""
    sc = atol + jnp.abs(u0) * rtol
    d0 = hairer_norm(u0 / sc)
    d1 = hairer_norm(f0 / sc)
    small = jnp.asarray(1e-6, jnp.zeros((), u0.dtype).real.dtype)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), small, 0.01 * d0 / d1)
    u1 = u0 + tdir * h0 * f0
    f1 = fvec(u1, t0 + tdir * h0)
    d2 = hairer_norm((f1 - f0) / sc) / h0
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(small, h0 * 1e-3),
        (0.01 / dmax) ** (1.0 / (order + 1.0)),
    )
    return tdir * jnp.minimum(100.0 * h0, h1)


class _Carry(NamedTuple):
    t: jnp.ndarray
    u: jnp.ndarray
    f: jnp.ndarray
    dt: jnp.ndarray  # signed proposal for the next attempt
    err_prev: jnp.ndarray
    n_acc: jnp.ndarray
    n_rej: jnp.ndarray
    n_iter: jnp.ndarray
    status: jnp.ndarray  # -1 running, else retcode
    ts: jnp.ndarray
    ys: jnp.ndarray
    fs: jnp.ndarray
    hook_carry: Any
    events: Any = None  # (ev_ts, ev_upre, ev_idx, ev_count) or None
    sstate: Any = None  # stateful-stepper state (multistep history)


def _next_stop(t, t1, tstops, tdir, tdtype):
    """Nearest upcoming stop strictly ahead of t (including t1)."""
    if tstops is None or tstops.shape[0] == 0:
        return t1
    key = tstops * tdir
    ahead = key > t * tdir + jnp.asarray(1e-12, tdtype) * jnp.maximum(1.0, jnp.abs(t))
    before_end = key < t1 * tdir
    masked = jnp.where(ahead & before_end, key, jnp.inf)
    nxt = jnp.min(masked)
    return jnp.where(jnp.isfinite(nxt), nxt * tdir, t1)


def integrate(
    stepper,
    fvec: Callable,
    t0,
    t1,
    u0,
    *,
    rtol=1e-7,
    atol=1e-9,
    dt0=None,
    max_steps: int = 4096,
    tstops: Optional[jnp.ndarray] = None,
    hook: Optional[Callable] = None,
    hook_carry: Any = None,
    controller=(0.7, 0.4),  # PI coefficients (beta1, beta2) scaled by 1/(order+1) below
    safety=0.9,
    factor_min=0.2,
    factor_max=10.0,
    store_dense: bool = True,
    err_weights: Optional[jnp.ndarray] = None,
    stop_transform: Optional[Callable] = None,
    event_set=None,
    dtmax=None,
    fixed_dt=None,
) -> IntegrateResult:
    """Adaptively integrate du/dt = fvec(u, t) from t0 to t1 (t1 < t0 allowed).

    fixed_dt: when set, march the fixed grid t0 + k·fixed_dt instead of
        adapting — every step is accepted, the controller is bypassed, and
        steps still clip to tstops/saveat exactly (resuming with fixed_dt
        after a stop, the reference's fixed-dt-with-tstops semantics). No
        error control: instability surfaces as NaN states (never a silent
        wrong answer — downstream adjoint rules NaN-poison). This is how
        continuous adjoints ride a fixed-grid forward solve
        (reference: solve(...; adaptive=false, dt=...) composes with every
        sensealg).

    fvec: (uvec, t) -> duvec over flat state vectors.
    stepper: object with `.order` (int), `.step(fvec, t, dt, u, f0) ->
        (u1, f1, err)`; `err` is the embedded local-error vector.
    hook: optional `(step_record, carry) -> carry` called on accepted steps,
        step_record = (t_old, t_new, y0, f0, y1, f1).
    Stateful steppers (multistep methods, e.g. FBDF): a stepper with
        `stateful = True` provides `init_state(fvec, t0, u0, f0, rtol, atol)`
        and `step(fvec, t, dt, u, f0, state) -> (u1, f1, err, state')`; the
        state advances only on accepted steps, and `controller_order(state)`
        (if present) supplies the dynamic order for the PI exponents.
    stop_transform: optional `(t, u, carry) -> (u', carry', fired)` invoked
        whenever an accepted step lands exactly on a tstop — the
        PresetTimeCallback analogue (reference: src/adjoint_common.jl:824-868).
        When `fired`, f is re-evaluated at u' and a zero-width dense row is
        appended carrying the post-event state, so the interpolant represents
        both sides of the discontinuity. Size max_steps to include one extra
        row per firing stop.
    """
    u0 = jnp.asarray(u0)
    dtype = u0.dtype
    # Time/controller variables live in the REAL dtype (complex states
    # supported) promoted to at least float32: with bf16/f16 states the
    # STATE arithmetic stays low-precision (MXU-native) but t-accumulation
    # and error ratios would be destroyed by an 8-bit mantissa (t ≈ 1.0 has
    # bf16 spacing ~0.008 — larger than typical dt).
    tdtype = jnp.promote_types(jnp.zeros((), dtype).real.dtype, jnp.float32)
    t0 = jnp.asarray(t0, tdtype)
    t1 = jnp.asarray(t1, tdtype)
    tdir = jnp.where(t1 >= t0, jnp.asarray(1.0, tdtype), jnp.asarray(-1.0, tdtype))
    n = u0.shape[0]
    order = stepper.order
    rtol = jnp.asarray(rtol, tdtype)
    atol = jnp.asarray(atol, tdtype)
    if tstops is not None:
        tstops = jnp.asarray(tstops, tdtype)

    f0 = fvec(u0, t0).astype(dtype)
    if fixed_dt is not None:
        dt = tdir * jnp.abs(jnp.asarray(fixed_dt, tdtype))
    elif dt0 is None:
        # frozen like the controller: the realized grid is not differentiated
        dt = jax.lax.stop_gradient(
            initial_step_size(fvec, t0, u0, f0, order, rtol, atol, tdir)
        )
    else:
        dt = tdir * jnp.abs(jnp.asarray(dt0, tdtype))

    # When the caller doesn't need dense output (e.g. the λ-only reverse
    # solves), keep the interpolation buffers at minimal size so each
    # segment's while_loop carries O(n) not O(max_steps·n) state.
    buf_len = max_steps + 1 if store_dense else 2
    ts_buf = jnp.full((buf_len,), t1, tdtype)
    ts_buf = ts_buf.at[0].set(t0)
    ys_buf = jnp.tile(u0[None, :], (buf_len, 1))
    fs_buf = jnp.tile(f0[None, :], (buf_len, 1))

    beta1 = controller[0] / (order + 1.0)
    beta2 = controller[1] / (order + 1.0)

    if event_set is not None:
        from .events import init_event_buffers

        ev0 = init_event_buffers(event_set, t1, n, dtype, tdtype)
    else:
        ev0 = None

    stateful = getattr(stepper, "stateful", False)
    sstate0 = (
        stepper.init_state(fvec, t0, u0, f0, rtol, atol) if stateful else None
    )
    # Multistep stability: honor the stepper's own growth bound.
    factor_max = min(factor_max, getattr(stepper, "factor_max", factor_max))

    init = _Carry(
        t=t0,
        u=u0,
        f=f0,
        dt=dt,
        err_prev=jnp.asarray(1.0, tdtype),
        n_acc=jnp.asarray(0, jnp.int32),
        n_rej=jnp.asarray(0, jnp.int32),
        n_iter=jnp.asarray(0, jnp.int32),
        status=jnp.asarray(-1, jnp.int32),
        ts=ts_buf,
        ys=ys_buf,
        fs=fs_buf,
        hook_carry=hook_carry,
        events=ev0,
        sstate=sstate0,
    )

    def cond(c: _Carry):
        return c.status < 0

    def body(c: _Carry):
        # Clip dt to the next stop (t1 or a tstop) so stops are hit exactly.
        stop = _next_stop(c.t, t1, tstops, tdir, tdtype)
        remaining = stop - c.t
        dt_eff = jnp.where(jnp.abs(c.dt) >= jnp.abs(remaining), remaining, c.dt)

        if stateful:
            u1, f1, err, sstate_new = stepper.step(
                fvec, c.t, dt_eff, c.u, c.f, c.sstate
            )
        else:
            u1, f1, err = stepper.step(fvec, c.t, dt_eff, c.u, c.f)
            sstate_new = None
        # sub-f32 states: stage arithmetic ran promoted (dt is tdtype);
        # restore the carry/storage dtype
        u1 = u1.astype(dtype)
        f1 = f1.astype(dtype)
        sc = atol + rtol * jnp.maximum(jnp.abs(c.u), jnp.abs(u1))
        if err_weights is None:
            err_norm = hairer_norm(err / sc)
        else:
            # RMS over the weighted components only (weight-0 rows — pure
            # quadrature accumulators — must not dilute the mean).
            cnt = jnp.maximum(jnp.sum(err_weights > 0), 1)
            err_norm = jnp.sqrt(
                jnp.sum(jnp.abs(err_weights * (err / sc)) ** 2) / cnt
            )
        bad = ~jnp.isfinite(err_norm)
        err_norm = jnp.where(bad, jnp.asarray(2.0, tdtype), err_norm)
        accept = (err_norm <= 1.0) & ~bad

        # PI controller on |dt| (Soderlind): factor from this + previous error.
        err_cl = jnp.maximum(err_norm, jnp.asarray(1e-10, tdtype))
        if stateful and hasattr(stepper, "controller_order"):
            # variable-order methods: exponent follows the current order
            ordd = stepper.controller_order(sstate_new).astype(tdtype)
            b1 = controller[0] / (ordd + 1.0)
            b2 = controller[1] / (ordd + 1.0)
        else:
            b1, b2 = beta1, beta2
        factor = safety * err_cl ** (-b1) * c.err_prev ** (b2)
        factor = jnp.where(bad, jnp.asarray(factor_min, tdtype), factor)
        factor = jnp.clip(factor, factor_min, factor_max)
        # Forward-mode (jvp) flows through this driver (ForwardDiffSensitivity,
        # ForwardSensitivity); freeze the controller so tangents measure the
        # scheme on the realized grid, not controller feedback (same policy as
        # integrate_scan — controller coupling contaminates gradients on
        # stiff problems).
        dt_next = jax.lax.stop_gradient(dt_eff * factor)
        if dtmax is not None:
            dt_next = jnp.clip(dt_next, -abs(dtmax), abs(dtmax))
        if fixed_dt is not None:
            # fixed-grid mode: every step accepted (no error control — NaN
            # states propagate and poison, never a silent rejection loop),
            # next step is the grid dt (clipped to the next stop above).
            accept = jnp.asarray(True)
            dt_next = tdir * jnp.abs(jnp.asarray(fixed_dt, tdtype))

        t_new = jnp.where(accept, c.t + dt_eff, c.t)
        u_new = jnp.where(accept, u1, c.u)
        f_new = jnp.where(accept, f1, c.f)

        # ---- event handling (ContinuousCallback sign change on this step,
        # then DiscreteCallback at the step end; simultaneous events are
        # composed in callback order and each recorded) -------------------
        events_carry = c.events
        event_fired = jnp.asarray(False)
        event_term = jnp.asarray(False)
        u_post_pair = None  # (t_e, u_post, f_post) extra row when fired
        if event_set is not None:
            from .events import process_step_events

            se = process_step_events(
                event_set, fvec, c.t, dt_eff, c.u, c.f, u1, f1,
                accept, c.events, tdtype,
            )
            event_fired = se.fired
            event_term = se.terminated
            # truncate the accepted step to the event point (pre-affect)
            t_new = jnp.where(event_fired, se.t_e, t_new)
            u_new = jnp.where(event_fired, se.u_pre, u_new)
            f_new = jnp.where(event_fired, se.f_pre, f_new)
            u_post_pair = (se.t_e, se.u_post, se.f_post)
            events_carry = se.events

        # Single-row conditional writes (a full-buffer `where` would move
        # O(max_steps·n) bytes of HBM every attempt).
        idx = jnp.minimum(c.n_acc + 1, buf_len - 1)
        ts = c.ts.at[idx].set(jnp.where(accept, t_new, c.ts[idx]))
        ys = c.ys.at[idx].set(jnp.where(accept, u_new, c.ys[idx]))
        fs = c.fs.at[idx].set(jnp.where(accept, f_new, c.fs[idx]))
        n_acc = c.n_acc + accept.astype(jnp.int32)
        n_rej = c.n_rej + (~accept).astype(jnp.int32)
        err_prev = jnp.where(accept, err_cl, c.err_prev)

        if event_set is not None:
            # post-affect state continues the integration; zero-width dense
            # row carries the right-hand side of the discontinuity.
            t_e, u_post, f_post = u_post_pair
            idx2 = jnp.minimum(n_acc + 1, buf_len - 1)
            ts = ts.at[idx2].set(jnp.where(event_fired, t_e, ts[idx2]))
            ys = ys.at[idx2].set(jnp.where(event_fired, u_post, ys[idx2]))
            fs = fs.at[idx2].set(jnp.where(event_fired, f_post, fs[idx2]))
            n_acc = n_acc + event_fired.astype(jnp.int32)
            u_new = jnp.where(event_fired, u_post, u_new)
            f_new = jnp.where(event_fired, f_post, f_new)

        if hook is not None:
            rec = (c.t, t_new, c.u, c.f, u_new, f_new)
            new_hc = hook(rec, c.hook_carry)
            hook_carry = jax.tree_util.tree_map(
                lambda new, old: jnp.where(accept, new, old), new_hc, c.hook_carry
            )
        else:
            hook_carry = c.hook_carry

        if stop_transform is not None:
            # This accepted step landed exactly on a stop iff dt was clipped
            # (and no event truncated it first).
            hit_stop = accept & (jnp.abs(c.dt) >= jnp.abs(remaining)) & ~event_fired

            # The re-evaluated f seeds the FIRST stage of the step BEYOND
            # the stop. When fvec gathers a dense buffer with a zero-width
            # discontinuity row AT the stop (reverse adjoint solves at event
            # times), evaluating exactly at t_new returns the right-limit
            # side — the wrong side for the region ahead in reverse time.
            # Nudge the evaluation one stop-matching tolerance INTO the
            # integration direction so the gather lands on the correct
            # branch (t-error O(64 eps), same order as the stop matcher;
            # fixes a per-event O(1e-5) systematic q error in the joined
            # [λ; q] InterpolatingAdjoint reverse — Gauss/GK quadrature
            # nodes are interior and never saw it).
            t_eval = t_new + tdir * (
                jnp.asarray(64.0, tdtype) * jnp.finfo(tdtype).eps
                * jnp.maximum(1.0, jnp.abs(t_new))
            )

            def _apply(args):
                u_, f_, hc_ = args
                u_p, hc_p, fired = stop_transform(t_new, u_, hc_)
                # cast: fvec may promote (bf16 state at f32 time)
                f_p = jax.lax.cond(
                    fired,
                    lambda: fvec(u_p, t_eval).astype(f_.dtype),
                    lambda: f_,
                )
                return u_p, f_p, hc_p, fired

            def _skip(args):
                u_, f_, hc_ = args
                return u_, f_, hc_, jnp.asarray(False)

            u_new, f_new, hook_carry, fired = jax.lax.cond(
                hit_stop, _apply, _skip, (u_new, f_new, hook_carry)
            )
            wrote = hit_stop & fired
            # Post-event state as a zero-width dense row at the same time.
            idx2 = jnp.minimum(n_acc + 1, buf_len - 1)
            ts = ts.at[idx2].set(jnp.where(wrote, t_new, ts[idx2]))
            ys = ys.at[idx2].set(jnp.where(wrote, u_new, ys[idx2]))
            fs = fs.at[idx2].set(jnp.where(wrote, f_new, fs[idx2]))
            n_acc = n_acc + wrote.astype(jnp.int32)

        done = accept & ((t1 - t_new) * tdir <= jnp.abs(t1) * 1e-14 + 1e-300)
        dt_floor = jnp.asarray(1e-14, tdtype) * jnp.maximum(1.0, jnp.abs(t_new))
        underflow = (jnp.abs(dt_next) < dt_floor) & ~done
        out_of_steps = ((n_acc >= max_steps) | (c.n_iter + 1 >= 4 * max_steps)) & ~done
        status = jnp.where(
            event_term,  # deliberate stop wins over everything
            RETCODE_TERMINATED,
            jnp.where(
                done,
                RETCODE_SUCCESS,
                jnp.where(
                    out_of_steps,
                    RETCODE_MAXITERS,
                    jnp.where(underflow, RETCODE_DTMIN,
                              jnp.asarray(-1, jnp.int32)),
                ),
            ),
        ).astype(jnp.int32)

        if stateful:
            sstate_next = jax.tree_util.tree_map(
                lambda new, old: jnp.where(accept, new, old),
                sstate_new, c.sstate,
            )
            # Discontinuities (events, stop_transform jumps) invalidate
            # multistep history: restart from order 1 at the post-jump state.
            restart = event_fired
            if stop_transform is not None:
                restart = restart | wrote
            reset = stepper.reset_state(sstate_next, t_new, u_new)
            sstate_next = jax.tree_util.tree_map(
                lambda r, s: jnp.where(restart, r, s), reset, sstate_next
            )
        else:
            sstate_next = None

        return _Carry(
            t=t_new,
            u=u_new,
            f=f_new,
            dt=dt_next,
            err_prev=err_prev,
            n_acc=n_acc,
            n_rej=n_rej,
            n_iter=c.n_iter + 1,
            status=status,
            ts=ts,
            ys=ys,
            fs=fs,
            hook_carry=hook_carry,
            events=events_carry,
            sstate=sstate_next,
        )

    final = jax.lax.while_loop(cond, body, init)

    # Pad the tail of ts with the final time so searchsorted stays in range.
    valid = jnp.arange(buf_len) <= final.n_acc
    ts = jnp.where(valid, final.ts, final.t)
    n_dense_steps = jnp.minimum(final.n_acc, buf_len - 1)
    dense = DenseOutput(ts=ts, ys=final.ys, fs=final.fs, n_steps=n_dense_steps, tdir=tdir)
    retcode = final.status
    if event_set is not None:
        # More firings than record slots: the extra affects WERE applied to
        # the trajectory but are not in the record buffers, so every
        # record-consuming reverse pass (continuous adjoints, direct-API
        # event corrections) would be silently wrong. Flag loudly; the
        # bwd rules NaN-poison on any nonzero retcode. Raise max_events=
        # for legitimately event-dense (e.g. chattering) trajectories.
        overflow = final.events[3] > final.events[0].shape[0]
        ok = (retcode == RETCODE_SUCCESS) | (retcode == RETCODE_TERMINATED)
        retcode = jnp.where(overflow & ok,
                            jnp.asarray(RETCODE_EVENT_OVERFLOW, jnp.int32),
                            retcode)
    stats = Stats(
        n_accepted=final.n_acc,
        n_rejected=final.n_rej,
        n_fevals=final.n_iter * jnp.asarray(getattr(stepper, "n_stages", 1), jnp.int32),
        retcode=retcode,
    )
    return IntegrateResult(
        dense=dense, t_final=final.t, u_final=final.u, stats=stats,
        hook_carry=final.hook_carry, events=final.events,
    )


def integrate_scan(
    stepper,
    fvec: Callable,
    t0,
    t1,
    u0,
    *,
    rtol=1e-7,
    atol=1e-9,
    dt0=None,
    max_steps: int = 512,
    tstops: Optional[jnp.ndarray] = None,
    hook: Optional[Callable] = None,
    hook_carry: Any = None,
    safety=0.9,
    factor_min=0.2,
    factor_max=10.0,
    always_accept: bool = False,
    event_set=None,
    unroll: bool = False,
    remat: bool = False,
    store_dense: bool = False,
    stop_transform: Optional[Callable] = None,
    err_weights: Optional[jnp.ndarray] = None,
) -> IntegrateResult:
    """Adaptive integration with a *fixed* trip count (`lax.scan` with
    masking) — reverse-mode differentiable, unlike the while_loop driver.

    unroll=True fully unrolls the scan into straight-line XLA (no loop
    HLO): real PI-controlled adaptivity at fixed-grid dispatch latency on
    hardware where any loop construct carries a flat per-dispatch cost.
    Compile time grows with max_steps — bound it (≤ ~256).

    always_accept=True makes the controller PREVISIBLE: every step is taken
    and the error only steers the NEXT step's size (Gaines-Lyons-compatible
    adaptivity for SDE paths — rejecting on the realized ΔW would bias the
    accepted increments' quadratic variation).

    This is the execution engine of DirectAdjoint, the
    discretize-then-optimize reverse path standing in for the reference's
    TrackerAdjoint/ReverseDiffAdjoint/ZygoteAdjoint family
    (src/concrete_solve.jl:1722-2415): XLA unrolls the reverse pass over the
    scan, storing O(max_steps) residuals. Always runs `max_steps` iterations
    (masked no-ops once finished), so size max_steps to the problem.

    store_dense=True carries (max_steps+1)-row interpolation buffers through
    the scan (single-row conditional writes — LINEAR in the buffer, so
    reverse AD keeps O(steps·n) residuals, not O(steps²·n)): `sol(t)`
    works on DirectAdjoint solutions and its gradient flows through the
    Hermite gather by plain AD. Off by default (outputs are captured by
    the hook).
    """
    if getattr(stepper, "stateful", False):
        raise NotImplementedError(
            f"{stepper!r} is a multistep (stateful) stepper; it needs the "
            "adaptive while_loop driver (integrate). Use a one-step stiff "
            "solver (Rosenbrock23/TRBDF2/SDIRK4/Seulex) here."
        )
    u0 = jnp.asarray(u0)
    dtype = u0.dtype
    # time/controller dtype promoted to >= f32 (see the while driver)
    tdtype = jnp.promote_types(jnp.zeros((), dtype).real.dtype, jnp.float32)
    t0 = jnp.asarray(t0, tdtype)
    t1 = jnp.asarray(t1, tdtype)
    tdir = jnp.where(t1 >= t0, jnp.asarray(1.0, tdtype),
                     jnp.asarray(-1.0, tdtype))
    order = stepper.order
    rtol = jnp.asarray(rtol, tdtype)
    atol = jnp.asarray(atol, tdtype)
    if tstops is not None:
        tstops = jnp.asarray(tstops, tdtype)

    f0 = fvec(u0, t0).astype(dtype)
    if dt0 is None:
        # frozen like the controller: the realized grid is not differentiated
        dt = jax.lax.stop_gradient(
            initial_step_size(fvec, t0, u0, f0, order, rtol, atol, tdir)
        )
    else:
        dt = tdir * jnp.abs(jnp.asarray(dt0, tdtype))

    beta1 = 0.7 / (order + 1.0)
    beta2 = 0.4 / (order + 1.0)

    if event_set is not None:
        from .events import init_event_buffers, process_step_events

        ev0 = init_event_buffers(event_set, t1, u0.shape[0], dtype, tdtype)
    else:
        ev0 = None

    n_state = u0.shape[0]
    if store_dense:
        buf_len = max_steps + 1
        ts_buf0 = jnp.full((buf_len,), t1, tdtype).at[0].set(t0)
        ys_buf0 = jnp.tile(u0[None, :], (buf_len, 1))
        fs_buf0 = jnp.tile(f0[None, :], (buf_len, 1))
        dense0 = (ts_buf0, ys_buf0, fs_buf0)
    else:
        dense0 = None

    def body(carry, _):
        t, u, f, dt, err_prev, n_acc, n_rej, status, hc, ev, dbufs = carry
        running = status < 0

        stop = _next_stop(t, t1, tstops, tdir, tdtype)
        remaining = stop - t
        dt_eff = jnp.where(jnp.abs(dt) >= jnp.abs(remaining), remaining, dt)

        u1, f1, err = stepper.step(fvec, t, dt_eff, u, f)
        u1 = u1.astype(dtype)
        f1 = f1.astype(dtype)
        sc = atol + rtol * jnp.maximum(jnp.abs(u), jnp.abs(u1))
        if err_weights is None:
            err_norm = hairer_norm(err / sc).astype(tdtype)
        else:
            # weighted RMS over error-controlled rows only (same rule as
            # the while driver: pure-quadrature rows must not dilute it)
            cnt = jnp.maximum(jnp.sum(err_weights > 0), 1)
            err_norm = jnp.sqrt(
                jnp.sum(jnp.abs(err_weights * (err / sc)) ** 2) / cnt
            ).astype(tdtype)
        bad = ~jnp.isfinite(err_norm)
        err_norm = jnp.where(bad, jnp.asarray(2.0, tdtype), err_norm)
        if always_accept:
            accept = running & ~bad
        else:
            accept = (err_norm <= 1.0) & ~bad & running

        err_cl = jnp.maximum(err_norm, jnp.asarray(1e-10, tdtype))
        factor = safety * err_cl ** (-beta1) * err_prev ** (beta2)
        factor = jnp.where(bad, jnp.asarray(factor_min, tdtype), factor)
        factor = jnp.clip(factor, factor_min, factor_max)
        # Differentiating THROUGH the controller couples every step to the
        # whole error history and blows gradients up by orders of magnitude;
        # the meaningful discrete gradient treats the realized step sequence
        # as fixed (same choice the reference's discrete adjoints make by
        # taping value-dependent control flow as constants).
        dt_next = jax.lax.stop_gradient(jnp.where(running, dt_eff * factor, dt))

        t_new = jnp.where(accept, t + dt_eff, t)
        u_new = jnp.where(accept, u1, u)
        f_new = jnp.where(accept, f1, f)

        ev_fired = jnp.asarray(False)
        if event_set is not None:
            # Events in the reverse-differentiable scan driver (DirectAdjoint
            # with callbacks): the step truncates to τ and continues from the
            # post-affect state; gradients flow through the Newton-polished τ
            # and the affect map — the discrete analogue of the reference's
            # AD-through-solver event handling (concrete_solve.jl:1351-1364).
            # Save convention at event-coincident times: save times are
            # merged into tstops, so a save time can never fall strictly
            # inside an (event-truncated) step; a save EXACTLY at τ records
            # the post-affect state — the right limit, same as the
            # while_loop driver — so both execution engines agree.
            se = process_step_events(
                event_set, fvec, t, dt_eff, u, f, u1, f1, accept, ev, tdtype
            )
            t_new = jnp.where(se.fired, se.t_e, t_new)
            u_new = jnp.where(se.fired, se.u_post, u_new)
            f_new = jnp.where(se.fired, se.f_post, f_new)
            ev = se.events
            ev_fired = se.fired
            # terminal callback: freeze the loop at (τ, u_post); later
            # iterations are masked no-ops (running=False), so plain AD
            # through this scan differentiates t_final = τ and
            # u_final = A(u(τ)) exactly (Newton-polished τ)
            status = jnp.where(se.terminated,
                               jnp.asarray(RETCODE_TERMINATED, jnp.int32),
                               status)

        n_acc = n_acc + accept.astype(jnp.int32)
        n_rej = n_rej + (running & ~accept).astype(jnp.int32)
        err_prev = jnp.where(accept, err_cl, err_prev)

        if hook is not None:
            rec = (t, t_new, u, f, u_new, f_new)
            new_hc = hook(rec, hc)
            hc = jax.tree_util.tree_map(
                lambda new, old: jnp.where(accept, new, old), new_hc, hc
            )

        if store_dense:
            ts_b, ys_b, fs_b = dbufs
            idx = jnp.minimum(n_acc, max_steps)
            if event_set is not None:
                # mirror the while driver's discontinuity representation:
                # the accepted row holds the PRE-affect state at τ (the
                # right limit of the continuous branch), then a zero-width
                # row carries the post-affect state — interpolation inside
                # the event-containing interval must not cross the jump
                u_row = jnp.where(ev_fired, se.u_pre, u_new)
                f_row = jnp.where(ev_fired, se.f_pre, f_new)
            else:
                u_row, f_row = u_new, f_new
            ts_b = ts_b.at[idx].set(jnp.where(accept, t_new, ts_b[idx]))
            ys_b = ys_b.at[idx].set(jnp.where(accept, u_row, ys_b[idx]))
            fs_b = fs_b.at[idx].set(jnp.where(accept, f_row, fs_b[idx]))
        if event_set is not None:
            # The zero-width post-affect row counts toward n_accepted in
            # BOTH drivers' stats whether or not dense output is stored
            # (the while driver increments per firing unconditionally).
            wrote_ev = accept & ev_fired
            n_acc = n_acc + wrote_ev.astype(jnp.int32)
            if store_dense:
                idx2 = jnp.minimum(n_acc, max_steps)
                ts_b = ts_b.at[idx2].set(
                    jnp.where(wrote_ev, t_new, ts_b[idx2]))
                ys_b = ys_b.at[idx2].set(
                    jnp.where(wrote_ev, u_new, ys_b[idx2]))
                fs_b = fs_b.at[idx2].set(
                    jnp.where(wrote_ev, f_new, fs_b[idx2]))
        if store_dense:
            dbufs = (ts_b, ys_b, fs_b)

        if stop_transform is not None:
            # Accepted step landed exactly on a stop (dt was clipped and no
            # event truncated it): apply the transform (λ-jump injection in
            # the reverse adjoint solves) and re-evaluate f one matching
            # tolerance INTO the integration direction — same semantics and
            # dense-gather side convention as the while driver.
            hit_stop = accept & (jnp.abs(dt) >= jnp.abs(remaining)) & ~ev_fired
            t_eval = t_new + tdir * (
                jnp.asarray(64.0, tdtype) * jnp.finfo(tdtype).eps
                * jnp.maximum(1.0, jnp.abs(t_new))
            )

            def _apply_stop(args):
                u_, f_, hc_ = args
                u_p, hc_p, fired_ = stop_transform(t_new, u_, hc_)
                f_p = jax.lax.cond(
                    fired_,
                    lambda: fvec(u_p, t_eval).astype(f_.dtype),
                    lambda: f_,
                )
                return u_p, f_p, hc_p, fired_

            def _skip_stop(args):
                u_, f_, hc_ = args
                return u_, f_, hc_, jnp.asarray(False)

            u_new, f_new, hc, fired = jax.lax.cond(
                hit_stop, _apply_stop, _skip_stop, (u_new, f_new, hc)
            )
            wrote = hit_stop & fired
            n_acc = n_acc + wrote.astype(jnp.int32)
            if store_dense:
                # zero-width dense row carrying the post-transform state
                ts_b, ys_b, fs_b = dbufs
                idx2 = jnp.minimum(n_acc, max_steps)
                ts_b = ts_b.at[idx2].set(jnp.where(wrote, t_new, ts_b[idx2]))
                ys_b = ys_b.at[idx2].set(jnp.where(wrote, u_new, ys_b[idx2]))
                fs_b = fs_b.at[idx2].set(jnp.where(wrote, f_new, fs_b[idx2]))
                dbufs = (ts_b, ys_b, fs_b)

        done = accept & ((t1 - t_new) * tdir <= jnp.abs(t1) * 1e-14 + 1e-300)
        # status < 0 guard: a terminal event this step (status already
        # RETCODE_TERMINATED) must not be overwritten by reaching t1
        status = jnp.where((status < 0) & done, RETCODE_SUCCESS,
                           status).astype(jnp.int32)
        return (t_new, u_new, f_new, dt_next, err_prev, n_acc, n_rej, status,
                hc, ev, dbufs), None

    init = (
        t0, u0, f0, dt, jnp.asarray(1.0, tdtype),
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
        jnp.asarray(-1, jnp.int32), hook_carry, ev0, dense0,
    )
    # remat: recompute the step in the backward pass instead of storing
    # every stage residual — O(1) residual memory per step in exchange for
    # one extra forward evaluation (jax.checkpoint over the scan body; the
    # SURVEY §5 checkpoint/remat mapping for long trajectories).
    body_fn = jax.checkpoint(body, prevent_cse=False) if remat else body
    (t, u, f, dt, _, n_acc, n_rej, status, hc, ev_fin, dbufs), _ = \
        jax.lax.scan(
            body_fn, init, None, length=max_steps,
            unroll=True if unroll else 1
        )
    status = jnp.where(status < 0, RETCODE_MAXITERS, status).astype(jnp.int32)

    if store_dense:
        ts_b, ys_b, fs_b = dbufs
        valid = jnp.arange(max_steps + 1) <= n_acc
        ts_b = jnp.where(valid, ts_b, t)
        dense = DenseOutput(
            ts=ts_b, ys=ys_b, fs=fs_b,
            n_steps=jnp.minimum(n_acc, max_steps), tdir=tdir,
        )
    else:
        # 2-row stub covering only the endpoints — enough for u_final
        # plumbing; callers must not expose it as `sol.dense`
        dense = DenseOutput(
            ts=jnp.stack([t0, t]),
            ys=jnp.stack([u0, u]),
            fs=jnp.stack([f0, f]),
            n_steps=jnp.asarray(1, jnp.int32),
            tdir=tdir,
        )
    stats = Stats(
        n_accepted=n_acc,
        n_rejected=n_rej,
        n_fevals=jnp.asarray(max_steps * getattr(stepper, "n_stages", 1), jnp.int32),
        retcode=status,
    )
    return IntegrateResult(dense=dense, t_final=t, u_final=u, stats=stats,
                           hook_carry=hc, events=ev_fin)


def integrate_fixed(
    stepper,
    fvec: Callable,
    ts_grid: jnp.ndarray,
    u0,
    *,
    hook: Optional[Callable] = None,
    hook_carry: Any = None,
) -> IntegrateResult:
    """Fixed-grid integration over the (static-length) time grid `ts_grid`.

    Used where step placement must be deterministic and replayable: SDE solves
    whose reverse pass must see the identical Brownian grid (reference pins
    the reverse solve to the forward grid via tstops,
    src/sensitivity_interface.jl:478-491), and LSS/NILSS trajectory
    discretizations. Implemented as `lax.scan` — cheaper than a while_loop
    when the trip count is static.
    """
    if getattr(stepper, "stateful", False):
        raise NotImplementedError(
            f"{stepper!r} is a multistep (stateful) stepper; it needs the "
            "adaptive while_loop driver (integrate)."
        )
    u0 = jnp.asarray(u0)
    ts_grid = jnp.asarray(ts_grid, u0.dtype)
    f0 = fvec(u0, ts_grid[0])
    tdir = jnp.where(ts_grid[-1] >= ts_grid[0], 1.0, -1.0).astype(u0.dtype)

    def scan_body(carry, t_pair):
        u, f, hc = carry
        t, t_next = t_pair
        dt = t_next - t
        u1, f1, _ = stepper.step(fvec, t, dt, u, f)
        if hook is not None:
            hc = hook((t, t_next, u, f, u1, f1), hc)
        return (u1, f1, hc), (u1, f1)

    (u_final, f_final, hc), (ys, fs) = jax.lax.scan(
        scan_body, (u0, f0, hook_carry), (ts_grid[:-1], ts_grid[1:])
    )
    ys = jnp.concatenate([u0[None], ys], axis=0)
    fs = jnp.concatenate([f0[None], fs], axis=0)
    n_steps = jnp.asarray(ts_grid.shape[0] - 1, jnp.int32)
    dense = DenseOutput(ts=ts_grid, ys=ys, fs=fs, n_steps=n_steps, tdir=tdir)
    stats = Stats(
        n_accepted=n_steps,
        n_rejected=jnp.asarray(0, jnp.int32),
        n_fevals=n_steps,
        retcode=jnp.asarray(RETCODE_SUCCESS, jnp.int32),
    )
    return IntegrateResult(
        dense=dense, t_final=ts_grid[-1], u_final=u_final, stats=stats, hook_carry=hc
    )
