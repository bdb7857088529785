"""Constant-lag DDE solve (method of steps on a fixed grid).

The reference handles DDEs through DelayDiffEq + discrete AD through the
solver (neural-DDE tests, test/Core4/layers_dde.jl). TPU-native design: a
fixed grid with dt dividing every lag, the node-history buffer carried
through a `lax.scan`, delayed states gathered by index (u(t-τ) = node i-k
with linear midpoint interpolation for RK stages), history function for
t <= t0. Gradients are exact discrete adjoints via plain reverse AD through
the scan — no tape, no special-casing of the delay terms (the gather is
differentiable).

Integration scheme: classical RK4 with delayed states frozen per-step at
their interval-interpolated values — formally order min(4, 1+order of delay
interpolation) = 2; use a fine grid. (Higher-order overlapping continuous
RK for DDEs is a round-2 refinement.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..problems import DDEProblem
from ..solution import ODESolution
from ..solvers.integrate import Stats
from ..utils.pytree import ravel_pytree

__all__ = ["solve_dde"]


def solve_dde(prob: DDEProblem, *, dt, saveat=None, sensealg=None) -> ODESolution:
    if not prob.lags:
        raise ValueError("DDEProblem needs at least one lag")
    t0, t1 = float(prob.tspan[0]), float(prob.tspan[1])
    dt_f = float(dt)
    lag_steps = []
    for lag in prob.lags:
        k = lag / dt_f
        if abs(k - round(k)) > 1e-8:
            raise ValueError(f"dt must divide every lag; lag {lag} / dt {dt_f}")
        lag_steps.append(int(round(k)))
    n_steps = max(int(round((t1 - t0) / dt_f)), 1)

    u0vec, unravel_u = ravel_pytree(prob.u0)
    dtype = u0vec.dtype
    n = u0vec.shape[0]
    p = prob.p
    f_user = prob.f
    history = prob.history
    max_lag = max(lag_steps)

    # pre-history nodes at t0 - max_lag .. t0 (from the history function)
    def hist_at(t):
        if history is None:
            return u0vec
        return ravel_pytree(history(t))[0]

    pre_ts = [t0 - (max_lag - i) * dt_f for i in range(max_lag)]
    pre_nodes = jnp.stack([hist_at(t) for t in pre_ts] + [u0vec]) \
        if max_lag > 0 else u0vec[None]
    # full node buffer: indices 0..max_lag are history..u0; then solution
    buf = jnp.zeros((max_lag + n_steps + 1, n), dtype)
    buf = buf.at[: max_lag + 1].set(pre_nodes)

    dt_a = jnp.asarray(dt_f, dtype)

    def delayed(buf, i_node, offset):
        """Delayed states (tuple) at node-time t0 + (i_node+offset)*dt,
        offset in [0,1): linear interpolation between delayed nodes."""
        outs = []
        for k in lag_steps:
            base = max_lag + i_node - k
            a = buf[base]
            b = buf[base + 1]
            outs.append(unravel_u(a + offset * (b - a)))
        return tuple(outs)

    def fvec(uvec, buf, i_node, offset, t):
        h = delayed(buf, i_node, offset)
        return ravel_pytree(f_user(unravel_u(uvec), h, p, t))[0]

    def body(carry, i):
        buf = carry
        uvec = buf[max_lag + i]
        t = jnp.asarray(t0, dtype) + dt_a * i.astype(dtype)
        # RK4 with interval-interpolated delayed states
        k1 = fvec(uvec, buf, i, 0.0, t)
        k2 = fvec(uvec + 0.5 * dt_a * k1, buf, i, 0.5, t + 0.5 * dt_a)
        k3 = fvec(uvec + 0.5 * dt_a * k2, buf, i, 0.5, t + 0.5 * dt_a)
        k4 = fvec(uvec + dt_a * k3, buf, i, 1.0, t + dt_a)
        u1 = uvec + (dt_a / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        buf = jax.lax.dynamic_update_slice(buf, u1[None], (max_lag + i + 1, 0))
        return buf, None

    buf, _ = jax.lax.scan(body, buf, jnp.arange(n_steps))

    if saveat is None:
        saveat = jnp.asarray([t0, t1], dtype)
    else:
        saveat = jnp.asarray(saveat, dtype)
    save_idx = jnp.clip(
        jnp.rint((saveat - t0) / dt_f).astype(jnp.int32), 0, n_steps
    )
    ys_save = buf[max_lag + save_idx]
    ys = jax.vmap(unravel_u)(ys_save)

    stats = Stats(
        n_accepted=jnp.asarray(n_steps, jnp.int32),
        n_rejected=jnp.asarray(0, jnp.int32),
        n_fevals=jnp.asarray(4 * n_steps, jnp.int32),
        retcode=jnp.asarray(0, jnp.int32),
    )
    return ODESolution(
        ts=saveat, ys=ys, stats=stats, retcode=stats.retcode, prob=prob,
        solver="MethodOfStepsRK4", sensealg=sensealg, dense=None,
        unravel_u=unravel_u, u_final=buf[-1],
    )
