"""Shared adjoint machinery (layer L2).

The TPU-native replacement for src/adjoint_common.jl: instead of
preallocated tape caches (`AdjointDiffCache`, :10-35) there are pure
closures traced once by jit; what survives is the *semantics* —

  * the forward solve with save-time capture (`saveat` folded into tstops so
    save times are hit exactly; a per-accepted-step hook records them,
    replacing PresetTimeCallback — reference: src/adjoint_common.jl:824-868),
  * the reverse segment scan that injects discrete loss gradients into λ at
    each data time (`ReverseLossCallback`, reference:
    src/adjoint_common.jl:709-821), implemented as a `lax.scan` over
    inter-save segments with an adaptive `while_loop` solve inside each.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.interp import DenseOutput
from ..solvers.integrate import Stats, integrate

__all__ = [
    "ForwardResult",
    "forward_saveat_solve",
    "reverse_joined_solve",
    "reverse_pinned_solve",
    "save_hook_factory",
]


def reverse_pinned_solve(
    stepper,
    make_interval_rhs: Callable,
    dense: DenseOutput,
    times: jnp.ndarray,
    lam_jumps: jnp.ndarray,
    z_init: jnp.ndarray,
    n_lam: int,
    *,
    rtol,
    atol,
    hook: Optional[Callable] = None,
    hook_carry: Any = None,
    t_span=None,
    jump_unroll: int = 3,
    err_weights=None,
    guard: float = 100.0,
    collect_lam_nodes: bool = False,
):
    """Reverse solve PINNED to the forward's accepted grid: one `stepper`
    step per stored forward interval, walking the dense buffer backward by
    index.

    The forward grid already contains every save time (they are merged into
    tstops) and was sized by the controller for the forward dynamics — whose
    linearization the adjoint integrates — so the reverse pass needs neither
    a controller nor interval searches:

      * NO per-stage dense-output search: the interval's Hermite rows
        (y_i, f_i, y_{i+1}, f_{i+1}) are directly indexed,
      * NO step-size controller / rejection branch / next-stop scan,
      * the embedded local error is still COMPUTED and monitored: any step
        whose weighted error exceeds `guard` (in units of the accepted
        tolerance) flags retcode 2, NaN-poisoning the gradient downstream —
        pinned never silently degrades (set pinned_reverse=False on the
        sensealg to fall back to the adaptive reverse).

    This is the reference's grid-pinning taken to its conclusion: SDE
    adjoints are pinned to the forward grid via tstops
    (sensitivity_interface.jl:478-491) and Backsolve snaps at checkpoints
    (backsolve_adjoint.jl:523-546); here the ODE reverse rides the forward
    grid exactly, which on a TPU removes every search/controller op from
    the hot while_loop body.

    make_interval_rhs(i) -> rhs(z, t): the augmented reverse RHS over
    interval i, interpolating y from directly-indexed rows. `times`
    ascending with `lam_jumps` rows added into z[:n_lam] when the walk
    reaches a node matching times[k] (same pointer-matcher semantics as
    reverse_joined_solve). hook(rec, carry): per-interval, rec =
    (ta, tb, lam_a, fa, lam_b, fb, i_interval) — ta > tb walking backward.

    Returns (z_at_t0, hook_carry, retcode, lam_nodes) where lam_nodes is
    the (buf_len, nz) per-node reverse state when collect_lam_nodes else
    None.
    """
    dtype = z_init.dtype
    tdtype = jnp.promote_types(jnp.zeros((), dtype).real.dtype, jnp.float32)
    times = jnp.asarray(times, tdtype)
    m = times.shape[0]
    n_steps = dense.n_steps  # dynamic
    t_hi = dense.ts[n_steps]
    eps = jnp.finfo(tdtype).eps
    rtol = jnp.asarray(rtol, tdtype)
    atol = jnp.asarray(atol, tdtype)

    # start-of-reverse consumption: all jump rows at/above t_hi fire now
    tol0 = 64.0 * eps * jnp.maximum(jnp.abs(t_hi), 1.0)

    def _consume(state):
        z, k = state
        kc = jnp.maximum(k, 0)
        return z.at[:n_lam].add(lam_jumps[kc]), k - 1

    z0, k0 = jax.lax.while_loop(
        lambda s: (s[1] >= 0) & (times[jnp.maximum(s[1], 0)] >= t_hi - tol0),
        _consume,
        (z_init, jnp.asarray(m - 1, jnp.int32)),
    )

    if collect_lam_nodes:
        lam_buf0 = jnp.zeros((dense.ts.shape[0], z_init.shape[0]), dtype)
        lam_buf0 = lam_buf0.at[jnp.minimum(n_steps, lam_buf0.shape[0] - 1)
                               ].set(z0)
    else:
        lam_buf0 = None

    def apply_jumps(t, z, k):
        tol = 64.0 * eps * jnp.maximum(
            jnp.maximum(jnp.abs(t), jnp.abs(t_hi)), 1.0)
        fired = jnp.asarray(False)
        for _ in range(jump_unroll):
            kc = jnp.maximum(k, 0)
            match = (k >= 0) & (jnp.abs(times[kc] - t) <= tol)
            z = z.at[:n_lam].add(jnp.where(match, lam_jumps[kc], 0.0))
            k = k - match.astype(k.dtype)
            fired = fired | match
        return z, k, fired

    def body(carry):
        i, z, f, k, worst, hc, lam_buf = carry
        ta = dense.ts[i + 1]
        tb = dense.ts[i]
        dt = tb - ta  # negative of the forward step width
        rhs = make_interval_rhs(i)
        z1, f1, err = stepper.step(rhs, ta, dt, z, f)
        z1 = z1.astype(dtype)
        f1 = f1.astype(dtype)
        # zero-width rows (event discontinuity markers) step nowhere
        zero_w = jnp.abs(dt) <= 64.0 * eps * jnp.maximum(jnp.abs(ta), 1.0)
        z1 = jnp.where(zero_w, z, z1)
        f1 = jnp.where(zero_w, f, f1)
        sc = atol + rtol * jnp.maximum(jnp.abs(z), jnp.abs(z1))
        if err_weights is None:
            e = jnp.sqrt(jnp.mean(jnp.abs(err / sc) ** 2))
        else:
            cnt = jnp.maximum(jnp.sum(err_weights > 0), 1)
            e = jnp.sqrt(jnp.sum(jnp.abs(err_weights * err / sc) ** 2) / cnt)
        worst = jnp.maximum(worst, jnp.where(zero_w, 0.0, e))
        if hook is not None:
            hc = hook((ta, tb, z, f, z1, f1, i), hc)
        z2, k2, fired = apply_jumps(tb, z1, k)
        # refresh the FSAL derivative after a jump (rhs is linear in z, but
        # the post-jump z changes it)
        f2 = jax.lax.cond(fired, lambda zz: rhs(zz, tb).astype(dtype),
                          lambda zz: f1, z2)
        if lam_buf is not None:
            lam_buf = lam_buf.at[i].set(z2)
        return i - 1, z2, f2, k2, worst, hc, lam_buf

    i0 = n_steps - 1
    rhs0 = make_interval_rhs(jnp.maximum(i0, 0))
    f0 = rhs0(z0, t_hi).astype(dtype)
    init = (i0, z0, f0, k0, jnp.zeros((), tdtype), hook_carry, lam_buf0)
    _, z_fin, _, k_fin, worst, hc, lam_buf = jax.lax.while_loop(
        lambda c: c[0] >= 0, body, init
    )
    # any jump rows below the final node (t0 duplicates) — consume
    def _consume_rest(state):
        z, k = state
        kc = jnp.maximum(k, 0)
        return z.at[:n_lam].add(lam_jumps[kc]), k - 1

    z_fin, _ = jax.lax.while_loop(
        lambda s: s[1] >= 0, _consume_rest, (z_fin, k_fin)
    )
    retcode = jnp.where(worst > guard, jnp.asarray(2, jnp.int32),
                        jnp.asarray(0, jnp.int32))
    return z_fin, hc, retcode, lam_buf


def reverse_joined_solve(
    stepper,
    aug_rhs: Callable,
    times: jnp.ndarray,
    lam_jumps: jnp.ndarray,
    z_init: jnp.ndarray,
    n_lam: int,
    *,
    rtol,
    atol,
    max_steps: int,
    dt0=None,
    hook: Optional[Callable] = None,
    hook_carry: Any = None,
    snap_values: Optional[jnp.ndarray] = None,
    snap_start: Optional[int] = None,
    collect_dense: bool = False,
    err_weights=None,
    event_times: Optional[jnp.ndarray] = None,
    event_count=None,
    event_apply: Optional[Callable] = None,
    t_span=None,
    jump_unroll: int = 3,
    event_unroll: int = 3,
    unroll_scan: bool = False,
):
    """ONE adaptive reverse solve over [t_hi -> t_lo] with the
    discrete loss cotangents `lam_jumps[k]` added into z[:n_lam] exactly when
    the integrator lands on times[k] (ReverseLossCallback jumps applied via
    the driver's stop_transform — no per-segment loop restarts, so the
    controller state and initial-dt search are paid once, not per segment).

    times ascending, shape (m,); lam_jumps (m, n_lam). Duplicated times fire
    all their jumps at once. snap_values (m, k)+snap_start: overwrite
    z[snap_start:snap_start+k] with snap_values[j] at times[j] (Backsolve's
    checkpoint snap). hook: per-accepted-step hook over the user carry.
    t_span=(t_lo, t_hi): the actual integration span — required when `times`
    carries out-of-span sentinel rows (dense-output cotangent merging pads
    invalid dense rows with times below t_lo so they never match a stop);
    defaults to (times[0], times[-1]). jump_unroll: max number of coincident
    jump rows consumed per stop (3 covers saveat + the t0/t1 extension; the
    dense-node merge raises it because save times are also step nodes).

    Returns (z_at_t0_after_all_jumps, hook_carry, retcode, dense).
    """
    dtype = z_init.dtype
    tdtype = jnp.promote_types(jnp.zeros((), dtype).real.dtype, jnp.float32)
    times = jnp.asarray(times, tdtype)
    m = times.shape[0]
    if t_span is None:
        t_hi = times[-1]
        t_lo = times[0]
    else:
        t_lo = jnp.asarray(t_span[0], tdtype)
        t_hi = jnp.asarray(t_span[1], tdtype)
    eps = jnp.finfo(tdtype).eps

    def apply_at(t, z, k):
        # Unrolled (not a while_loop — nested whiles explode TPU compile
        # times): jump_unroll=3 covers a saveat point duplicated by the t0/t1
        # extension (saveat is validated strictly monotone); callers that
        # merge extra jump rows at save times (dense-node cotangents) raise
        # jump_unroll accordingly.
        tol = 64.0 * eps * jnp.maximum(jnp.maximum(jnp.abs(t), jnp.abs(t_hi)), 1.0)
        for _ in range(jump_unroll):
            kc = jnp.maximum(k, 0)
            match = (k >= 0) & (jnp.abs(times[kc] - t) <= tol)
            z = z.at[:n_lam].add(jnp.where(match, lam_jumps[kc], 0.0))
            if snap_values is not None:
                kk = snap_values.shape[1]
                cur = jax.lax.dynamic_slice(z, (snap_start,), (kk,))
                z = jax.lax.dynamic_update_slice(
                    z, jnp.where(match, snap_values[kc], cur), (snap_start,)
                )
            k = k - match.astype(k.dtype)
        return z, k

    have_events = event_apply is not None and event_times is not None

    # ---- start-of-reverse consumption (while_loops, NOT the bounded
    # unrolled matcher — we're outside the integration loop here, so a
    # dynamic trip count is fine and the row count is unbounded): every
    # jump row at-or-above t_hi fires NOW. For a normal solve that is the
    # t1 row (+ coincident saveat), identical to the old behavior; for a
    # TERMINATED solve (t_hi = t_final < t1) it also folds the held
    # saveat rows — outputs frozen at u(t_final) — onto the reverse start.
    # Events recorded at t_hi fire now too (post-state cotangents first,
    # then the event reverse transform): previously an event firing
    # exactly at t1 (e.g. a discrete/preset callback at the final step
    # end) had its reverse jump silently DROPPED — the in-loop matcher
    # only sees stops the integrator lands on, and it starts at t_hi.
    tol0 = 64.0 * eps * jnp.maximum(jnp.abs(t_hi), 1.0)

    def _consume_jumps(state):
        z, k = state
        kc = jnp.maximum(k, 0)
        z = z.at[:n_lam].add(lam_jumps[kc])
        if snap_values is not None:
            z = jax.lax.dynamic_update_slice(z, snap_values[kc],
                                             (snap_start,))
        return z, k - 1

    z0, k0 = jax.lax.while_loop(
        lambda s: (s[1] >= 0) & (times[jnp.maximum(s[1], 0)]
                                 >= t_hi - tol0),
        _consume_jumps,
        (z_init, jnp.asarray(m - 1, jnp.int32)),
    )

    ke0 = (jnp.asarray(event_count, jnp.int32) - 1) if have_events else jnp.asarray(-1, jnp.int32)
    if have_events:
        ev_t = jnp.asarray(event_times, tdtype)

        def _consume_events(state):
            z, hc, ke = state
            kec = jnp.maximum(ke, 0)
            z, hc = event_apply(kec, t_hi, z, hc)
            return z, hc, ke - 1

        z0, hook_carry, ke0 = jax.lax.while_loop(
            lambda s: (s[2] >= 0) & (ev_t[jnp.maximum(s[2], 0)]
                                     >= t_hi - tol0),
            _consume_events,
            (z0, hook_carry, ke0),
        )

    def stop_transform(t, z, carry):
        hc, k, ke = carry
        z2, k2 = apply_at(t, z, k)
        fired = k2 != k
        if have_events:
            tol = 64.0 * eps * jnp.maximum(
                jnp.maximum(jnp.abs(t), jnp.abs(t_hi)), 1.0
            )
            # Unrolled (not a while_loop): `event_unroll` events may share a
            # time (callers pass max(3, n_cont + n_disc) — the forward
            # engine composes and records at most one firing per callback
            # per instant); they are applied last-recorded-first, the
            # correct reverse composition order (the reference
            # dedups/duplicates at atol 1e-14, callback_tracking.jl:126-130,
            # adjoint_common.jl:824-868).
            ke2 = ke
            for _ in range(event_unroll):
                kec = jnp.maximum(ke2, 0)
                match = (ke2 >= 0) & (jnp.abs(event_times[kec] - t) <= tol)

                def _apply_ev(args, kec=kec):
                    z_, hc_ = args
                    return event_apply(kec, t, z_, hc_)

                z2, hc = jax.lax.cond(match, _apply_ev, lambda a: a, (z2, hc))
                ke2 = ke2 - match.astype(ke2.dtype)
                fired = fired | match
        else:
            ke2 = ke
        return z2, (hc, k2, ke2), fired

    if hook is not None:
        wrapped_hook = lambda rec, carry: (hook(rec, carry[0]), carry[1], carry[2])
    else:
        wrapped_hook = lambda rec, carry: carry

    all_stops = times if not have_events else jnp.sort(
        jnp.concatenate([times, jnp.asarray(event_times, tdtype)])
    )

    if unroll_scan:
        # Straight-line-XLA reverse: fixed trip count, masked adaptivity,
        # fully unrolled (no loop HLO) — the latency-floor execution mode
        # for the continuous adjoints on dispatch-bound runtimes. Same
        # stop_transform jump injection as the while driver.
        from ..solvers.integrate import integrate_scan

        res = integrate_scan(
            stepper,
            aug_rhs,
            t_hi,
            t_lo,
            z0,
            rtol=rtol,
            atol=atol,
            dt0=dt0,
            max_steps=max_steps + m + 4,
            tstops=all_stops,
            hook=wrapped_hook,
            hook_carry=(hook_carry, k0, ke0),
            stop_transform=stop_transform,
            store_dense=collect_dense,
            err_weights=err_weights,
            unroll=True,
        )
    else:
        res = integrate(
            stepper,
            aug_rhs,
            t_hi,
            t_lo,
            z0,
            rtol=rtol,
            atol=atol,
            dt0=dt0,
            max_steps=max_steps + m + 4,
            tstops=all_stops,
            hook=wrapped_hook,
            hook_carry=(hook_carry, k0, ke0),
            stop_transform=stop_transform,
            store_dense=collect_dense,
            err_weights=err_weights,
        )
    hc, _k, _ke = res.hook_carry
    return res.u_final, hc, res.stats.retcode, res.dense


class ForwardResult(NamedTuple):
    ys_save: jnp.ndarray  # (nt, n) states at saveat
    dense: DenseOutput
    t_final: jnp.ndarray
    u_final: jnp.ndarray
    stats: Stats
    events: Any = None  # (ev_ts, ev_upre, ev_idx, ev_count) when callbacks on


def save_hook_factory(saveat: jnp.ndarray, tdir, dtype):
    """Build the accepted-step hook that captures u at each save time.

    Because `saveat` is merged into tstops, the controller clips dt so the
    solver lands on each save time exactly (up to fp roundoff); the hook
    records the state the first time t_new reaches saveat[k].
    """
    nt = saveat.shape[0]
    eps = jnp.finfo(dtype).eps

    def hook(rec, carry):
        t_old, t_new, y0, f0, y1, f1 = rec
        buf, k = carry
        k_c = jnp.minimum(k, nt - 1)
        target = saveat[k_c]
        tol = 64.0 * eps * jnp.maximum(jnp.maximum(jnp.abs(target), jnp.abs(t_new)), 1.0)
        hit = (k < nt) & ((t_new - target) * tdir >= -tol)
        buf = buf.at[k_c].set(jnp.where(hit, y1, buf[k_c]))
        return (buf, k + hit.astype(k.dtype))

    return hook


def forward_saveat_solve(
    stepper,
    fvec: Callable,
    u0vec: jnp.ndarray,
    t0,
    t1,
    saveat: jnp.ndarray,
    *,
    rtol,
    atol,
    dt0=None,
    max_steps: int,
    tstops: Optional[jnp.ndarray] = None,
    store_dense: bool = True,
    extra_hook: Optional[Callable] = None,
    extra_hook_carry: Any = None,
    event_set=None,
    dtmax=None,
    fixed_dt=None,
    unroll_scan: bool = False,
) -> Tuple[ForwardResult, Any]:
    """Forward solve capturing saveat states exactly; optionally composes a
    second per-step hook (event tracking, Gauss accumulation).

    unroll_scan=True runs the masked-scan driver fully unrolled
    (straight-line XLA, no loop HLO) instead of the while driver — the
    latency-floor execution mode; max_steps bounds the fixed trip count."""
    dtype = u0vec.dtype
    tdtype = jnp.promote_types(jnp.zeros((), dtype).real.dtype, jnp.float32)
    t0 = jnp.asarray(t0, tdtype)
    t1 = jnp.asarray(t1, tdtype)
    saveat = jnp.asarray(saveat, tdtype)
    tdir = jnp.where(t1 >= t0, 1.0, -1.0).astype(tdtype)
    nt = saveat.shape[0]
    n = u0vec.shape[0]

    all_stops = saveat if tstops is None else jnp.sort(
        jnp.concatenate([saveat, jnp.asarray(tstops, tdtype)])
    )

    # Pre-capture any save times at/before t0 (normally just saveat[0] == t0).
    eps = jnp.finfo(tdtype).eps
    tol0 = 64.0 * eps * jnp.maximum(jnp.abs(t0), 1.0)
    pre = (saveat - t0) * tdir <= tol0
    k0 = jnp.sum(pre).astype(jnp.int32)
    buf0 = jnp.where(pre[:, None], u0vec[None, :], jnp.zeros((nt, n), dtype))

    hook_s = save_hook_factory(saveat, tdir, tdtype)
    if extra_hook is None:
        hook = lambda rec, c: (hook_s(rec, c[0]), c[1])
        carry0 = ((buf0, k0), None)
    else:
        hook = lambda rec, c: (hook_s(rec, c[0]), extra_hook(rec, c[1]))
        carry0 = ((buf0, k0), extra_hook_carry)

    if unroll_scan:
        from ..solvers.integrate import integrate_scan

        if dtmax is not None or fixed_dt is not None:
            raise NotImplementedError(
                "unroll=True (scan driver) does not take dtmax/fixed_dt; "
                "use the while driver (unroll=False) for those"
            )
        res = integrate_scan(
            stepper,
            fvec,
            t0,
            t1,
            u0vec,
            rtol=rtol,
            atol=atol,
            dt0=dt0,
            max_steps=max_steps,
            tstops=all_stops,
            hook=hook,
            hook_carry=carry0,
            store_dense=store_dense,
            event_set=event_set,
            unroll=True,
        )
    else:
        res = integrate(
            stepper,
            fvec,
            t0,
            t1,
            u0vec,
            rtol=rtol,
            atol=atol,
            dt0=dt0,
            max_steps=max_steps,
            tstops=all_stops,
            hook=hook,
            hook_carry=carry0,
            store_dense=store_dense,
            event_set=event_set,
            dtmax=dtmax,
            fixed_dt=fixed_dt,
        )
    (save_buf, _k), extra_carry = res.hook_carry
    # Save times never reached (terminal-event stop; also MaxIters/DtMin
    # truncation) would otherwise stay zero-initialized — hold the final
    # state instead, matching the dense-output clamp (sol(t > t_final) =
    # u(t_final)); failed solves still flag via retcode (and terminal stops
    # via RETCODE_TERMINATED). Differentiable: under jvp the `where` routes
    # u_final tangents into the held rows.
    reached = jnp.arange(nt) < _k
    save_buf = jnp.where(reached[:, None], save_buf, res.u_final[None, :])
    fwd = ForwardResult(
        ys_save=save_buf,
        dense=res.dense,
        t_final=res.t_final,
        u_final=res.u_final,
        stats=res.stats,
        events=res.events,
    )
    return fwd, extra_carry




def match_cotangents(du0, dp, primals):
    """custom_vjp contract: cotangent dtypes match the primals'. Complex
    states with real parameters otherwise leak complex-with-zero-imag
    gradients to jax.grad (the real gradient IS the real part — the vjp
    kernels already performed the conjugate contraction)."""
    u0_p, p_p = primals

    def m(c, x):
        x = jnp.asarray(x)
        if jnp.iscomplexobj(c) and not jnp.iscomplexobj(x):
            c = c.real
        return c.astype(x.dtype)

    return (jax.tree_util.tree_map(m, du0, u0_p),
            jax.tree_util.tree_map(m, dp, p_p))
