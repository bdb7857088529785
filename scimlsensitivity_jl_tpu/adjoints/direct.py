"""DirectAdjoint: discrete reverse AD through the solver loop.

The discretize-then-optimize reverse path — the stand-in for the
reference's discrete-AD sensealgs (TrackerAdjoint :1911-2139,
ReverseDiffAdjoint :2204-2355, ZygoteAdjoint :1722-1770, EnzymeAdjoint
:1845-1895 in src/concrete_solve.jl). Where those tape the solver loop with
an operator-overloading AD, here the loop is a masked fixed-trip `lax.scan`
(`integrate_scan`) that XLA differentiates exactly: the gradient of the
*discrete* scheme, including the adaptive controller's accepted steps.

No custom_vjp — plain JAX AD flows through.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.vjp import make_vjp_kernels
from ..solvers.integrate import integrate_scan
from ..utils.pytree import ravel_pytree
from .common import save_hook_factory
from .continuous import AuxOut, SolveOptions

__all__ = ["make_direct_solve_fn", "make_fixed_grid_solve_fn"]


def make_fixed_grid_solve_fn(f, solver, opts: SolveOptions, t0, t1, *,
                             n_steps: int, unroll: bool = False):
    """Fixed-grid solve, fully differentiable (discrete adjoint through the
    step graph). With `unroll=True` the step loop is unrolled at trace time
    into straight-line XLA — on hardware where loop constructs carry a fixed
    dispatch cost (or for small step counts where fusion across steps wins),
    this is the fastest execution mode. saveat times must lie on the grid.
    """

    # Static grid math happens at the Python level (factory args), never on
    # traced values: under jit even constants become tracers.
    dt_py = (float(t1) - float(t0)) / n_steps
    ts_nodes_py = [float(t0) + dt_py * i for i in range(n_steps + 1)]

    def solve_fn(u0, p, saveat):
        u0vec, unravel_u = ravel_pytree(u0)
        dtype = u0vec.dtype
        kern = make_vjp_kernels(f, u0, p)
        fvec = lambda uv, t: kern.fvec(uv, p, t)
        dt = jnp.asarray(dt_py, dtype)
        saveat = jnp.asarray(saveat, dtype)
        nt = saveat.shape[0]

        # save indices: concrete validation when possible, traced gather
        # otherwise
        save_idx = jnp.clip(
            jnp.rint((saveat - float(t0)) / dt_py).astype(jnp.int32),
            0, n_steps,
        )
        import numpy as _np

        try:
            steps_f = (_np.asarray(saveat) - float(t0)) / dt_py
            if not _np.allclose(steps_f, _np.rint(steps_f), atol=1e-4):
                raise ValueError(
                    "fixed-grid saveat times must lie on the dt grid; "
                    f"got offsets {steps_f}"
                )
        except jax.errors.TracerArrayConversionError:
            pass

        if unroll:
            nodes = [u0vec]
            u = u0vec
            fcur = fvec(u, jnp.asarray(ts_nodes_py[0], dtype))
            for i in range(n_steps):
                u, fcur, _ = solver.step(
                    fvec, jnp.asarray(ts_nodes_py[i], dtype), dt, u, fcur
                )
                nodes.append(u)
            all_nodes = jnp.stack(nodes)  # (n_steps+1, n)
            u_final = u
        else:
            def body(carry, i):
                u, fcur = carry
                t_i = jnp.asarray(t0, dtype) + dt * i.astype(dtype)
                u, fcur, _ = solver.step(fvec, t_i, dt, u, fcur)
                return (u, fcur), u

            (u_final, _), stacked = jax.lax.scan(
                body, (u0vec, fvec(u0vec, jnp.asarray(t0, dtype))),
                jnp.arange(n_steps),
            )
            all_nodes = jnp.concatenate([u0vec[None], stacked], axis=0)

        ys_save = all_nodes[save_idx]
        ys = jax.vmap(unravel_u)(ys_save)
        from ..solvers.integrate import Stats

        stats = Stats(
            n_accepted=jnp.asarray(n_steps, jnp.int32),
            n_rejected=jnp.asarray(0, jnp.int32),
            n_fevals=jnp.asarray(n_steps * getattr(solver, "n_stages", 1), jnp.int32),
            retcode=jnp.asarray(0, jnp.int32),
        )
        aux = AuxOut(dense=None, t_final=jnp.asarray(t1, u0vec.dtype), u_final=u_final, stats=stats)
        return ys, aux

    return solve_fn


def make_direct_solve_fn(f, solver, sensealg, opts: SolveOptions, t0, t1,
                         unroll: bool = False):
    max_steps = sensealg.max_steps or opts.max_steps
    if unroll and max_steps > 256:
        raise ValueError(
            "solve(adaptive=True, unroll=True) emits max_steps straight-line "
            f"solver steps; max_steps={max_steps} would explode compile "
            "time. Bound max_steps (or sensealg.max_steps) to ≤ 256."
        )

    def solve_fn(u0, p, saveat):
        u0vec, unravel_u = ravel_pytree(u0)
        dtype = u0vec.dtype
        kern = make_vjp_kernels(f, u0, p)
        fvec = lambda uv, t: kern.fvec(uv, p, t)
        saveat = jnp.asarray(saveat, dtype)
        t0a = jnp.asarray(t0, dtype)
        t1a = jnp.asarray(t1, dtype)
        tdir = jnp.where(t1a >= t0a, 1.0, -1.0).astype(dtype)
        nt = saveat.shape[0]
        n = u0vec.shape[0]

        stops = saveat if opts.tstops is None else jnp.sort(
            jnp.concatenate([saveat, jnp.asarray(opts.tstops, dtype)])
        )

        eps = jnp.finfo(dtype).eps
        tol0 = 64.0 * eps * jnp.maximum(jnp.abs(t0a), 1.0)
        pre = (saveat - t0a) * tdir <= tol0
        k0 = jnp.sum(pre).astype(jnp.int32)
        buf0 = jnp.where(pre[:, None], u0vec[None, :], jnp.zeros((nt, n), dtype))

        if opts.callback is not None:
            from ..callbacks import build_event_set

            es = build_event_set(opts.callback, p, unravel_u, opts.max_events)
        else:
            es = None

        hook = save_hook_factory(saveat, tdir, dtype)
        res = integrate_scan(
            solver, fvec, t0a, t1a, u0vec,
            rtol=opts.rtol, atol=opts.atol, dt0=opts.dt0,
            max_steps=max_steps, tstops=stops,
            hook=hook, hook_carry=(buf0, k0),
            event_set=es, unroll=unroll, remat=sensealg.remat,
            store_dense=opts.dense,
        )
        ys_save, k_fin = res.hook_carry
        # Save times never reached (terminal-event stop): hold the final
        # state, matching the dense clamp; exact under plain AD (the
        # `where` routes u_final's residuals into the held rows).
        reached = jnp.arange(nt) < k_fin
        ys_save = jnp.where(reached[:, None], ys_save, res.u_final[None, :])
        # Truncated solves (MaxIters/DtMin — NOT the deliberate
        # RETCODE_TERMINATED stop) poison values AND the plain-AD
        # discrete-adjoint gradients. The poison must be additive AND tied
        # to a p-connected value: unreached save rows are zero-init buffer
        # entries with no path to p, so a bare NaN constant would poison
        # the values while the gradient stayed silently zero. Riding on
        # 0·u_final routes a NaN cotangent into the scan carry (NaN·0 = NaN).
        from ..solvers.integrate import RETCODE_TERMINATED

        failed = (res.stats.retcode != 0) & \
            (res.stats.retcode != RETCODE_TERMINATED)
        nan_term = (jnp.where(failed, jnp.nan, 0.0)
                    * (1.0 + 0.0 * jnp.sum(res.u_final))).astype(ys_save.dtype)
        ys_save = ys_save + nan_term
        ys = jax.vmap(unravel_u)(ys_save)
        # dense=True: sol(t) gradients flow through the Hermite gather by
        # plain AD (discrete adjoint); without it, expose no dense (the
        # driver's 2-row stub would silently mis-evaluate)
        dense = res.dense
        if opts.dense and dense is not None:
            dense = dense._replace(ys=dense.ys + nan_term)  # sol(t) poisons too
        aux = AuxOut(dense=dense if opts.dense else None,
                     t_final=res.t_final, u_final=res.u_final + nan_term,
                     stats=res.stats, events=res.events)
        return ys, aux

    return solve_fn
