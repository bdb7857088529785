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

    def solve_fn(u0, p, saveat):
        u0vec, unravel_u = ravel_pytree(u0)
        dtype = u0vec.dtype
        kern = make_vjp_kernels(f, u0, p)
        fvec = lambda uv, t: kern.fvec(uv, p, t)
        t0a = jnp.asarray(t0, dtype)
        t1a = jnp.asarray(t1, dtype)
        dt = (t1a - t0a) / n_steps
        ts_nodes = t0a + dt * jnp.arange(n_steps + 1)
        saveat = jnp.asarray(saveat, dtype)
        nt = saveat.shape[0]
        n = u0vec.shape[0]

        import numpy as _np

        steps_f = (_np.asarray(saveat) - float(t0a)) / float(dt)
        save_steps = _np.rint(steps_f).astype(int)
        if not _np.allclose(steps_f, save_steps, atol=1e-6):
            raise ValueError(
                "fixed-grid saveat times must lie on the dt grid; "
                f"got offsets {steps_f}"
            )

        if unroll:
            outs = [None] * nt
            save_map = {int(s): k for k, s in enumerate(save_steps)}
            u = u0vec
            fcur = fvec(u, ts_nodes[0])
            if 0 in save_map:
                outs[save_map[0]] = u
            for i in range(n_steps):
                u, fcur, _ = solver.step(fvec, ts_nodes[i], dt, u, fcur)
                if (i + 1) in save_map:
                    outs[save_map[i + 1]] = u
            ys_save = jnp.stack(outs)
            u_final = u
        else:
            save_steps_j = jnp.asarray(save_steps)

            def body(carry, i):
                u, fcur, buf = carry
                u, fcur, _ = solver.step(fvec, ts_nodes[i], dt, u, fcur)
                k = jnp.clip(jnp.searchsorted(save_steps_j, i + 1), 0, nt - 1)
                hit = save_steps_j[k] == i + 1
                buf = buf.at[k].set(jnp.where(hit, u, buf[k]))
                return (u, fcur, buf), None

            buf0 = jnp.zeros((nt, n), dtype)
            k0 = jnp.clip(jnp.searchsorted(jnp.asarray(save_steps), 0), 0, nt - 1)
            buf0 = buf0.at[k0].set(
                jnp.where(jnp.asarray(save_steps)[k0] == 0, u0vec, buf0[k0])
            )
            (u_final, _, ys_save), _ = jax.lax.scan(
                body, (u0vec, fvec(u0vec, ts_nodes[0]), buf0),
                jnp.arange(n_steps),
            )

        ys = jax.vmap(unravel_u)(ys_save)
        from ..solvers.integrate import Stats

        stats = Stats(
            n_accepted=jnp.asarray(n_steps, jnp.int32),
            n_rejected=jnp.asarray(0, jnp.int32),
            n_fevals=jnp.asarray(n_steps * getattr(solver, "n_stages", 1), jnp.int32),
            retcode=jnp.asarray(0, jnp.int32),
        )
        aux = AuxOut(dense=None, t_final=t1a, u_final=u_final, stats=stats)
        return ys, aux

    return solve_fn


def make_direct_solve_fn(f, solver, sensealg, opts: SolveOptions, t0, t1):
    max_steps = sensealg.max_steps or opts.max_steps

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

        hook = save_hook_factory(saveat, tdir, dtype)
        res = integrate_scan(
            solver, fvec, t0a, t1a, u0vec,
            rtol=opts.rtol, atol=opts.atol, dt0=opts.dt0,
            max_steps=max_steps, tstops=stops,
            hook=hook, hook_carry=(buf0, k0),
        )
        ys_save, _ = res.hook_carry
        ys = jax.vmap(unravel_u)(ys_save)
        aux = AuxOut(dense=None, t_final=res.t_final, u_final=res.u_final,
                     stats=res.stats)
        return ys, aux

    return solve_fn
