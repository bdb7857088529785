"""Dense output: fixed-shape interpolation buffers + Hermite evaluation.

The reference relies on OrdinaryDiffEq's dense solution object `sol(t)` for
continuous adjoints (`split_states` interpolates y = u(t) on every reverse
step — reference: src/interpolating_adjoint.jl:190-243, SURVEY §3.1 "dominant
memory traffic"). Under XLA everything must be fixed-shape, so dense output is
a `(max_steps+1)`-row coefficient buffer written by the integrator loop and
evaluated by `searchsorted` + cubic-Hermite interpolation — O(log n) gather
per query, vectorizable with vmap over query times.

Cubic Hermite on (y0, f0, y1, f1) has O(h^4) local error: exact enough for
the 3rd/5th-order pairs we ship, and uniform across explicit and Rosenbrock
steppers (same trade diffrax makes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["DenseOutput", "hermite_eval", "dense_eval", "dense_eval_many"]


class DenseOutput(NamedTuple):
    """Piecewise cubic-Hermite interpolant over accepted solver steps.

    ts: (max_steps+1,) node times; rows past `n_steps` hold the final time.
    ys: (max_steps+1, n) state at nodes (flattened).
    fs: (max_steps+1, n) derivative du/dt at nodes.
    n_steps: number of accepted steps (dynamic scalar int).
    tdir: +1. / -1. integration direction.
    """

    ts: jnp.ndarray
    ys: jnp.ndarray
    fs: jnp.ndarray
    n_steps: jnp.ndarray
    tdir: jnp.ndarray


def hermite_eval(t, t0, t1, y0, f0, y1, f1):
    """Cubic Hermite value at t on the step [t0, t1] (guards h -> 0)."""
    h = t1 - t0
    safe_h = jnp.where(h == 0, jnp.ones_like(h), h)
    theta = jnp.where(h == 0, jnp.zeros_like(h), (t - t0) / safe_h)
    # Standard cubic Hermite basis written for fused evaluation:
    # y = (1-θ)y0 + θ y1 + θ(θ-1)[(1-2θ)(y1-y0) + (θ-1)h f0 + θ h f1]
    dy = y1 - y0
    w = theta * (theta - 1.0)
    y = (
        (1.0 - theta) * y0
        + theta * y1
        + w * ((1.0 - 2.0 * theta) * dy + (theta - 1.0) * safe_h * f0 + theta * safe_h * f1)
    )
    return jnp.where(h == 0, y0, y)


def hermite_deriv_eval(t, t0, t1, y0, f0, y1, f1):
    """d/dt of the cubic Hermite at t (used for event-time derivatives)."""
    h = t1 - t0
    safe_h = jnp.where(h == 0, jnp.ones_like(h), h)
    theta = jnp.where(h == 0, jnp.zeros_like(h), (t - t0) / safe_h)
    dy = y1 - y0
    # dy/dθ of the expression in hermite_eval, then / h.
    ddtheta = (
        -y0
        + y1
        + (2.0 * theta - 1.0) * ((1.0 - 2.0 * theta) * dy + (theta - 1.0) * safe_h * f0 + theta * safe_h * f1)
        + theta * (theta - 1.0) * (-2.0 * dy + safe_h * f0 + safe_h * f1)
    )
    return jnp.where(h == 0, f0, ddtheta / safe_h)


def _locate(dense: DenseOutput, t):
    """Index i of the step interval containing t, clipped to valid steps."""
    # ts is monotone in tdir; map to ascending. For typical buffers a
    # vectorized mask-sum beats searchsorted's serial binary search on TPU
    # (8+ dependent gather rounds vs one VPU compare+reduce) — this sits in
    # the hot loop of every interpolating reverse pass (SURVEY §3.1
    # "dominant memory traffic"; measured 3x on the spiral reverse). The
    # linear scan is O(buffer) though, so very large max_steps buffers
    # (stiff solves) keep the O(log) search.
    keys = dense.ts * dense.tdir
    if keys.shape[0] <= 1024:
        i = jnp.sum((keys <= t * dense.tdir).astype(jnp.int32)) - 1
    else:
        i = jnp.searchsorted(keys, t * dense.tdir, side="right") - 1
    return jnp.clip(i, 0, jnp.maximum(dense.n_steps - 1, 0))


def dense_eval(dense: DenseOutput, t):
    """Evaluate the interpolant at scalar time t -> flat state vector."""
    i = _locate(dense, t)
    # Row gathers, NOT a 2-row lax.dynamic_slice: the fused
    # jvp-over-reverse-pass programs (second-order Hv/Hessian) trip an
    # XLA-CPU fusion-compiler RET_CHECK ("Incorrect number of arguments" /
    # llvm_module != nullptr) on dynamic-slice fusions inside while_loop
    # bodies; gather lowers cleanly on both CPU and TPU at the same cost.
    t0_, t1_ = dense.ts[i], dense.ts[i + 1]
    y0_, y1_ = dense.ys[i], dense.ys[i + 1]
    f0_, f1_ = dense.fs[i], dense.fs[i + 1]
    return hermite_eval(t, t0_, t1_, y0_, f0_, y1_, f1_)


def dense_eval_many(dense: DenseOutput, ts):
    """Vectorized evaluation at a 1-D array of times -> (len(ts), n)."""
    return jax.vmap(lambda t: dense_eval(dense, t))(ts)
