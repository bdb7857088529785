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

__all__ = ["make_direct_solve_fn"]


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
