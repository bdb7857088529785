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
from ..solvers.integrate import IntegrateResult, Stats, integrate

__all__ = ["ForwardResult", "forward_saveat_solve", "reverse_segment_scan", "save_hook_factory"]


class ForwardResult(NamedTuple):
    ys_save: jnp.ndarray  # (nt, n) states at saveat
    dense: DenseOutput
    t_final: jnp.ndarray
    u_final: jnp.ndarray
    stats: Stats


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
) -> Tuple[ForwardResult, Any]:
    """Forward solve capturing saveat states exactly; optionally composes a
    second per-step hook (event tracking, Gauss accumulation)."""
    dtype = u0vec.dtype
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    saveat = jnp.asarray(saveat, dtype)
    tdir = jnp.where(t1 >= t0, 1.0, -1.0).astype(dtype)
    nt = saveat.shape[0]
    n = u0vec.shape[0]

    all_stops = saveat if tstops is None else jnp.sort(
        jnp.concatenate([saveat, jnp.asarray(tstops, dtype)])
    )

    # Pre-capture any save times at/before t0 (normally just saveat[0] == t0).
    eps = jnp.finfo(dtype).eps
    tol0 = 64.0 * eps * jnp.maximum(jnp.abs(t0), 1.0)
    pre = (saveat - t0) * tdir <= tol0
    k0 = jnp.sum(pre).astype(jnp.int32)
    buf0 = jnp.where(pre[:, None], u0vec[None, :], jnp.zeros((nt, n), dtype))

    hook_s = save_hook_factory(saveat, tdir, dtype)
    if extra_hook is None:
        hook = lambda rec, c: (hook_s(rec, c[0]), c[1])
        carry0 = ((buf0, k0), None)
    else:
        hook = lambda rec, c: (hook_s(rec, c[0]), extra_hook(rec, c[1]))
        carry0 = ((buf0, k0), extra_hook_carry)

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
    )
    (save_buf, _k), extra_carry = res.hook_carry
    fwd = ForwardResult(
        ys_save=save_buf,
        dense=res.dense,
        t_final=res.t_final,
        u_final=res.u_final,
        stats=res.stats,
    )
    return fwd, extra_carry


def reverse_segment_scan(
    stepper,
    aug_rhs: Callable,
    saveat: jnp.ndarray,
    lam_jumps: jnp.ndarray,
    z_init: jnp.ndarray,
    n_lam: int,
    *,
    rtol,
    atol,
    max_steps_per_segment: int,
    seg_hook: Optional[Callable] = None,
    seg_hook_carry: Any = None,
    boundary_fn: Optional[Callable] = None,
    collect_dense: bool = False,
    err_weights=None,
):
    """Integrate the augmented adjoint state backwards over inter-save
    segments, adding the discrete loss cotangent `lam_jumps[i]` into the
    leading `n_lam` entries of z at each save time (the ReverseLossCallback
    jump, reference: src/adjoint_common.jl:754-789).

    aug_rhs(z, t) -> dz ; segments walked i = nt-1 .. 1, each an adaptive
    solve from saveat[i] to saveat[i-1].

    boundary_fn(z, i) -> z  : applied after the λ jump at segment start
        (Backsolve's checkpoint snap of the trailing u block).
    seg_hook / seg_hook_carry : per-accepted-step hook threaded through every
        segment (Gauss quadrature accumulation).
    collect_dense : also return each segment's dense interpolant, stacked in
        walk order (segment j covers [saveat[nt-1-j-1], saveat[nt-1-j]]) —
        QuadratureAdjoint needs the dense reverse λ.

    Returns (z_at_t0_after_final_jump, hook_carry, worst_retcode, seg_dense).
    """
    nt = saveat.shape[0]

    def body(carry, i):
        z, hc, worst = carry
        z = z.at[:n_lam].add(lam_jumps[i])
        if boundary_fn is not None:
            z = boundary_fn(z, i)
        t_hi = saveat[i]
        t_lo = saveat[i - 1]
        res = integrate(
            stepper,
            aug_rhs,
            t_hi,
            t_lo,
            z,
            rtol=rtol,
            atol=atol,
            max_steps=max_steps_per_segment,
            hook=seg_hook,
            hook_carry=hc,
            store_dense=collect_dense,
            err_weights=err_weights,
        )
        worst = jnp.maximum(worst, res.stats.retcode)
        out = res.dense if collect_dense else None
        return (res.u_final, res.hook_carry, worst), out

    init = (z_init, seg_hook_carry, jnp.asarray(0, jnp.int32))
    (z, hc, worst), seg_dense = jax.lax.scan(body, init, jnp.arange(nt - 1, 0, -1))
    z = z.at[:n_lam].add(lam_jumps[0])
    return z, hc, worst, seg_dense
