"""The VJP/JVP engine (layer L1).

Replaces the reference's entire per-backend dispatch zoo in
src/derivative_wrappers.jl (1,537 LoC): `vecjacobian!` (:256) routing to
Zygote/Enzyme/ReverseDiff/Tracker/Mooncake/Reactant, `jacobianvec!` (:209),
and the full-Jacobian Bool path (:435-554). On TPU there is one AD engine —
XLA-traced `jax.vjp` / `jax.jvp` — so the whole layer is a handful of pure
closures. `jax.vjp` computes exactly what the EnzymeVJP path does in one
sweep: f(u,p,t) plus λᵀ∂f/∂u plus λᵀ∂f/∂p (derivative_wrappers.jl:982-1145).

User-supplied fast paths `prob.vjp` / `prob.paramjac` / `prob.jac` override
the AD route, mirroring the f.vjp/f.paramjac/f.jac hooks
(derivative_wrappers.jl:284-433, quadrature_adjoint.jl:170-192).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..sensealg import AutoVJP, FiniteDiffVJP, JacVJP, VJPChoice
from ..utils.pytree import ravel_pytree, tree_zeros_like

__all__ = ["VJPKernels", "make_vjp_kernels", "make_flat_field"]


class FlatField(NamedTuple):
    """f lifted to flat state vectors: fvec(uvec, t) -> duvec, closing over p."""

    fvec: Callable
    unravel_u: Callable
    n: int


def make_flat_field(f: Callable, u0, p) -> FlatField:
    u0vec, unravel_u = ravel_pytree(u0)

    def fvec(uvec, t):
        du = f(unravel_u(uvec), p, t)
        return ravel_pytree(du)[0]

    return FlatField(fvec=fvec, unravel_u=unravel_u, n=u0vec.shape[0])


class VJPKernels(NamedTuple):
    """Derivative products of a vector field f(u, p, t) over flat states.

    All functions operate on the flat state vector; parameter cotangents are
    pytrees shaped like p (JAX-native replacement for the reference's
    canonicalize/repack machinery, src/parameters_handling.jl).
    """

    # (uvec, p, t, lamvec) -> (fvec_val, lam^T df/du  [flat], lam^T df/dp [p-tree])
    f_and_vjp: Callable
    # (uvec, p, t, lamvec) -> lam^T df/du   (state-only, for Quadrature/Gauss λ solve)
    vjp_u: Callable
    # (uvec, p, t, lamvec) -> lam^T df/dp   (p-tree, for quadrature integrands)
    vjp_p: Callable
    # (uvec, p, t, duvec, dp_tree) -> (fvec_val, J·du + ∂f/∂p·dp) (forward mode)
    jvp: Callable
    # (uvec, p, t) -> dense (n, n) df/du over flat state
    jac_u: Callable
    # (uvec, p, t) -> fvec value
    fvec: Callable
    unravel_u: Callable
    n: int


def make_vjp_kernels(
    f: Callable,
    u0,
    p_example,
    *,
    vjp_choice: VJPChoice = AutoVJP(),
    user_jac: Optional[Callable] = None,
    user_vjp: Optional[Callable] = None,
    user_paramjac: Optional[Callable] = None,
) -> VJPKernels:
    """Build the derivative-product kernels for f(u, p, t) -> du (pytree)."""
    u0vec, unravel_u = ravel_pytree(u0)
    n = u0vec.shape[0]

    def f_flat(uvec, p, t):
        # du lives in the calling state's dtype: mixed-precision fields
        # (bf16 states x f32 params promote f's output) would otherwise
        # dtype-mismatch every vjp cotangent; the drivers store f in the
        # state dtype anyway, so this cast realizes the same scheme.
        return ravel_pytree(f(unravel_u(uvec), p, t))[0].astype(uvec.dtype)

    def fvec(uvec, p, t):
        return f_flat(uvec, p, t)

    use_jac_path = isinstance(vjp_choice, JacVJP)
    use_fd = isinstance(vjp_choice, FiniteDiffVJP)
    fd_eps = getattr(vjp_choice, "eps", 1e-6)

    def _fd_jac_u(uvec, p, t):
        def col(j):
            e = jnp.zeros_like(uvec).at[j].set(fd_eps)
            return (f_flat(uvec + e, p, t) - f_flat(uvec - e, p, t)) / (2 * fd_eps)

        return jax.vmap(col)(jnp.arange(uvec.shape[0])).T

    def _fd_f_and_vjp(uvec, p, t, lamvec):
        fval = f_flat(uvec, p, t)
        J = _fd_jac_u(uvec, p, t)
        ubar = J.T @ lamvec
        pflat, unravel_p = ravel_pytree(p)

        def pcol(j):
            e = jnp.zeros_like(pflat).at[j].set(fd_eps)
            return (f_flat(uvec, unravel_p(pflat + e), t)
                    - f_flat(uvec, unravel_p(pflat - e), t)) / (2 * fd_eps)

        pJ = jax.vmap(pcol)(jnp.arange(pflat.shape[0]))  # (np, n)
        pbar = unravel_p(pJ @ lamvec)
        return fval, ubar, pbar

    def _auto_f_and_vjp(uvec, p, t, lamvec):
        fval, pullback = jax.vjp(lambda u_, p_: f_flat(u_, p_, t), uvec, p)
        # cotangent rides in f's OUTPUT dtype (promoted inputs — e.g. a
        # dense_eval'd bf16 state at an f32 time — promote f)
        ubar, pbar = pullback(lamvec.astype(fval.dtype))
        return fval, ubar, pbar

    def _jac_f_and_vjp(uvec, p, t, lamvec):
        # Reference `Bool` path: materialize J and pJ then contract
        # (derivative_wrappers.jl:435-554). J^T λ via dot; p side via one vjp
        # on p only (a dense dfdp would need flattened p — keep it a vjp).
        J = jac_u(uvec, p, t)
        ubar = J.T @ lamvec
        fval, pullback = jax.vjp(lambda p_: f_flat(uvec, p_, t), p)
        (pbar,) = pullback(lamvec.astype(fval.dtype))
        return fval, ubar, pbar

    if user_vjp is not None or user_paramjac is not None:

        def f_and_vjp(uvec, p, t, lamvec):
            fval, ubar_auto, pbar_auto = _auto_f_and_vjp(uvec, p, t, lamvec)
            lam_tree = unravel_u(lamvec)
            u_tree = unravel_u(uvec)
            if user_vjp is not None:
                ubar = ravel_pytree(user_vjp(lam_tree, u_tree, p, t))[0]
            else:
                ubar = ubar_auto
            if user_paramjac is not None:
                pbar = user_paramjac(lam_tree, u_tree, p, t)
            else:
                pbar = pbar_auto
            return fval, ubar, pbar

    elif use_fd:
        f_and_vjp = _fd_f_and_vjp
    elif use_jac_path:
        f_and_vjp = _jac_f_and_vjp
    else:
        f_and_vjp = _auto_f_and_vjp

    def vjp_u(uvec, p, t, lamvec):
        if user_vjp is not None:
            return ravel_pytree(user_vjp(unravel_u(lamvec), unravel_u(uvec), p, t))[0]
        if use_fd:
            return _fd_jac_u(uvec, p, t).T @ lamvec
        if use_jac_path:
            return jac_u(uvec, p, t).T @ lamvec
        fout, pullback = jax.vjp(lambda u_: f_flat(u_, p, t), uvec)
        (ubar,) = pullback(lamvec.astype(fout.dtype))
        return ubar

    def vjp_p(uvec, p, t, lamvec):
        if user_paramjac is not None:
            return user_paramjac(unravel_u(lamvec), unravel_u(uvec), p, t)
        if use_fd:
            return _fd_f_and_vjp(uvec, p, t, lamvec)[2]
        fout, pullback = jax.vjp(lambda p_: f_flat(uvec, p_, t), p)
        (pbar,) = pullback(lamvec.astype(fout.dtype))
        return pbar

    def jvp(uvec, p, t, duvec, dp_tree):
        if dp_tree is None:
            dp_tree = tree_zeros_like(p)
        fval, dfval = jax.jvp(
            lambda u_, p_: f_flat(u_, p_, t), (uvec, p), (duvec, dp_tree)
        )
        return fval, dfval

    if user_jac is not None:

        def jac_u(uvec, p, t):
            return jnp.asarray(user_jac(unravel_u(uvec), p, t))

    else:

        def jac_u(uvec, p, t):
            # Forward-mode Jacobian: n jvp columns, vmapped; for small/stiff
            # systems this is the standard choice (chunked ForwardDiff in the
            # reference, derivative_wrappers.jl:129-207).
            return jax.jacfwd(lambda u_: f_flat(u_, p, t))(uvec)

    return VJPKernels(
        f_and_vjp=f_and_vjp,
        vjp_u=vjp_u,
        vjp_p=vjp_p,
        jvp=jvp,
        jac_u=jac_u,
        fvec=fvec,
        unravel_u=unravel_u,
        n=n,
    )
