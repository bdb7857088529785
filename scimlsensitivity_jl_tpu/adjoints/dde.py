"""Constant-lag DDE solve (method of steps on a fixed grid).

The reference handles DDEs through DelayDiffEq + discrete AD through the
solver (neural-DDE tests, test/Core4/layers_dde.jl). TPU-native design: a
fixed grid, node-history (u, u̇) buffers carried through a `lax.scan`,
delayed states evaluated by CUBIC-HERMITE interpolation on the stored nodes
(the same continuous extension the dense ODE output uses), history function
for t ≤ t0. Gradients are exact discrete adjoints via plain reverse AD
through the scan — the Hermite gather is differentiable.

Round-2 upgrades over the order-2 v1:
  * delayed states come from the O(h⁴) Hermite extension instead of linear
    interpolation, so classical RK4 keeps ~order 4 globally (verified by a
    convergence-slope test);
  * dt no longer needs to divide the lags — any lag ≥ dt is located by
    index arithmetic on the uniform grid (lag < dt would make the step
    implicit — the overlapping case DelayDiffEq fixed-point iterates — and
    is rejected with a clear error).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.interp import hermite_eval
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
    for lag in prob.lags:
        if lag < dt_f - 1e-12:
            raise ValueError(
                f"lag {lag} < dt {dt_f}: overlapping delays make the step "
                "implicit; shrink dt below the smallest lag"
            )
    n_steps = max(int(round((t1 - t0) / dt_f)), 1)

    u0vec, unravel_u = ravel_pytree(prob.u0)
    dtype = u0vec.dtype
    n = u0vec.shape[0]
    p = prob.p
    f_user = prob.f
    history = prob.history
    # history nodes cover [t0 - max_lag - dt, t0]
    import math

    m_hist = int(math.ceil(max(prob.lags) / dt_f + 1e-9)) + 1

    def hist_at(t):
        if history is None:
            return u0vec
        return ravel_pytree(history(t))[0]

    def hist_dot(t):
        if history is None:
            return jnp.zeros_like(u0vec)
        t = jnp.asarray(t, dtype)
        return jax.jvp(hist_at, (t,), (jnp.ones_like(t),))[1]

    t_base = t0 - m_hist * dt_f  # time of node index 0
    pre_ts = [t_base + i * dt_f for i in range(m_hist)]
    pre_u = jnp.stack([hist_at(t) for t in pre_ts] + [u0vec])
    pre_f = jnp.stack([hist_dot(t) for t in pre_ts]
                      + [jnp.zeros_like(u0vec)])
    # u' jumps at t0 (history slope vs f(u0); the classic DDE breaking
    # point — downstream breaks t0+k*lag keep u' continuous). The t0 node
    # therefore carries TWO derivatives: fbuf[m_hist] holds the solution
    # side (step 0's k1); the history side is kept here and selected when
    # a query interval ends at t0.
    f_hist_t0 = hist_dot(t0)
    # node buffers: 0..m_hist = history..u0 ; then the solution nodes.
    # f-node of the CURRENT step is written as its k1 inside the step, so
    # Hermite queries never read an unwritten derivative (exact-node queries
    # evaluate at the right endpoint, where the f weight vanishes).
    ubuf = jnp.zeros((m_hist + n_steps + 1, n), dtype)
    ubuf = ubuf.at[: m_hist + 1].set(pre_u)
    fbuf = jnp.zeros((m_hist + n_steps + 1, n), dtype)
    fbuf = fbuf.at[: m_hist + 1].set(pre_f)

    dt_a = jnp.asarray(dt_f, dtype)
    t_base_a = jnp.asarray(t_base, dtype)
    lags_a = [jnp.asarray(lag, dtype) for lag in prob.lags]

    def delayed(ubuf, fbuf, tq):
        """Delayed states (tuple) at query time tq via Hermite on the
        uniform node grid; exact-node queries land on the right endpoint of
        the LEFT interval, so only already-written derivatives are read."""
        outs = []
        for lag in lags_a:
            td = tq - lag
            x = (td - t_base_a) / dt_a
            base = jnp.clip(
                jnp.floor(x - 1e-9).astype(jnp.int32), 0,
                ubuf.shape[0] - 2,
            )
            ta = t_base_a + base.astype(dtype) * dt_a
            f1 = jnp.where(base + 1 == m_hist, f_hist_t0, fbuf[base + 1])
            val = hermite_eval(td, ta, ta + dt_a, ubuf[base], fbuf[base],
                               ubuf[base + 1], f1)
            outs.append(unravel_u(val))
        return tuple(outs)

    def fvec(uvec, ubuf, fbuf, t):
        h = delayed(ubuf, fbuf, t)
        return ravel_pytree(f_user(unravel_u(uvec), h, p, t))[0]

    def body(carry, i):
        ubuf, fbuf = carry
        uvec = ubuf[m_hist + i]
        t = jnp.asarray(t0, dtype) + dt_a * i.astype(dtype)
        k1 = fvec(uvec, ubuf, fbuf, t)
        # publish this node's derivative before the interior-stage queries
        fbuf = jax.lax.dynamic_update_slice(fbuf, k1[None], (m_hist + i, 0))
        k2 = fvec(uvec + 0.5 * dt_a * k1, ubuf, fbuf, t + 0.5 * dt_a)
        k3 = fvec(uvec + 0.5 * dt_a * k2, ubuf, fbuf, t + 0.5 * dt_a)
        k4 = fvec(uvec + dt_a * k3, ubuf, fbuf, t + dt_a)
        u1 = uvec + (dt_a / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        ubuf = jax.lax.dynamic_update_slice(ubuf, u1[None], (m_hist + i + 1, 0))
        return (ubuf, fbuf), None

    (ubuf, fbuf), _ = jax.lax.scan(body, (ubuf, fbuf), jnp.arange(n_steps))

    if saveat is None:
        saveat = jnp.asarray([t0, t1], dtype)
    else:
        saveat = jnp.asarray(saveat, dtype)
    save_idx = jnp.clip(
        jnp.rint((saveat - t0) / dt_f).astype(jnp.int32), 0, n_steps
    )
    ys_save = ubuf[m_hist + save_idx]
    ys = jax.vmap(unravel_u)(ys_save)

    stats = Stats(
        n_accepted=jnp.asarray(n_steps, jnp.int32),
        n_rejected=jnp.asarray(0, jnp.int32),
        n_fevals=jnp.asarray(4 * n_steps, jnp.int32),
        retcode=jnp.asarray(0, jnp.int32),
    )
    return ODESolution(
        ts=saveat, ys=ys, stats=stats, retcode=stats.retcode, prob=prob,
        solver="MethodOfStepsRK4Hermite", sensealg=sensealg, dense=None,
        unravel_u=unravel_u, u_final=ubuf[-1],
    )
