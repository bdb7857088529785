"""Least-squares shadowing, forward and adjoint (reference: src/lss.jl).

For chaotic long-time averages ⟨g⟩ = (1/T)∫g dt, the IVP sensitivity
diverges; LSS replaces it with the well-conditioned least-squares problem
over the whole trajectory (Wang, Hu & Blonigan 2014). Discretization follows
the reference's midpoint scheme (lss.jl:258-343):

  nodes u_j at ts (from the solved trajectory), midpoints u_mid,
  B block-bidiagonal with blocks  ∓I/dtᵢ - J(u_midᵢ)/2,
  E block-columns dudtᵢ (TimeDilation only),
  Schur system  S = B·diag(wB⁻¹)·Bᵀ [+ E·diag(wE⁻¹)·Eᵀ],
  per-parameter  w = S⁻¹ b,  v = wB⁻¹·Bᵀw,  η = wE⁻¹·Eᵀw,

with regularizers CosWindowing / Cos2Windowing / TimeDilation(t0skip,t1skip)
(lss.jl:361-514). TPU-first: every Jacobian/∂f/∂p block is built in one
vmapped sweep, all parameters solved in one batched dense solve — the
LAPACK-loop structure of the reference collapses into three einsums and one
`jnp.linalg.solve`.

AdjointLSS (lss.jl:517-727, TimeDilation only, as in the reference):
  b_adj = E·h + B·(wB⁻¹ ⊙ ∂g/∂u nodes /Nt),  wa = S⁻¹ b_adj,
  res = mean dgdp + Σ (∂f/∂p)ᵀ wa  over the skip window.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.vjp import make_vjp_kernels
from ...sensealg import (
    AdjointLSS,
    Cos2Windowing,
    CosWindowing,
    ForwardLSS,
    TimeDilation,
)
from ...utils.pytree import ravel_pytree

__all__ = ["ForwardLSSProblem", "AdjointLSSProblem", "shadow_forward", "shadow_adjoint"]


@dataclass
class _LSSData:
    sensealg: Any
    ts: jnp.ndarray          # (Nt,)
    us: jnp.ndarray          # (Nt, n) node states (flattened)
    umid: jnp.ndarray        # (Ndt, n)
    dudt: jnp.ndarray        # (Ndt, n)
    dt: jnp.ndarray          # (Ndt,)
    S: jnp.ndarray           # Schur matrix (Ndt·n, Ndt·n)
    B: jnp.ndarray           # (Ndt·n, Nt·n)
    E: Optional[jnp.ndarray]  # (Ndt·n, Ndt) or None
    wBinv: jnp.ndarray       # (Nt·n,)
    wEinv: Optional[jnp.ndarray]  # (Ndt,)
    p: Any
    kern: Any
    g: Optional[Callable]
    dgdu: Optional[Callable]
    dgdp: Optional[Callable]
    n: int
    npf: int
    unravel_p: Callable


def _build_lss(sol, sensealg, dgdu, dgdp, g):
    if g is None:
        g = getattr(sensealg, "g", None)
    regularizer = sensealg.LSSregularizer
    if isinstance(regularizer, TimeDilation) and g is None:
        raise ValueError("TimeDilation LSS requires the objective g")
    prob = sol.prob
    p = prob.p
    if p is None:
        raise ValueError("parameter sensitivities need parameters")
    u0vec, unravel_u = ravel_pytree(prob.u0)
    pflat, unravel_p = ravel_pytree(p)
    n = u0vec.shape[0]
    npf = pflat.shape[0]
    kern = make_vjp_kernels(prob.f, prob.u0, p, user_jac=prob.jac)

    ts = jnp.asarray(sol.ts)
    us = jax.vmap(lambda y: ravel_pytree(y)[0])(sol.ys)  # (Nt, n)
    Nt = ts.shape[0]
    Ndt = Nt - 1
    dt = ts[1:] - ts[:-1]
    umid = 0.5 * (us[1:] + us[:-1])
    dudt = (us[1:] - us[:-1]) / dt[:, None]
    dT = ts[-1] - ts[0]

    # Jacobians at midpoints, one batched sweep.
    tmid = 0.5 * (ts[1:] + ts[:-1])
    J = jax.vmap(lambda u, t: kern.jac_u(u, p, t))(umid, tmid)  # (Ndt,n,n)

    eye = jnp.eye(n, dtype=us.dtype)
    Bl = -eye[None] / dt[:, None, None] - J / 2.0  # block (i, i)
    Br = eye[None] / dt[:, None, None] - J / 2.0   # block (i, i+1)
    ar = jnp.arange(Ndt)
    B4 = jnp.zeros((Ndt, n, Nt, n), us.dtype)
    B4 = B4.at[ar, :, ar, :].set(Bl)
    B4 = B4.at[ar, :, ar + 1, :].set(Br)
    B = B4.reshape(Ndt * n, Nt * n)

    # node weights wB⁻¹ (lss.jl wB!): 2Δt / (dt-sum at node)
    denom = jnp.concatenate([dt[:1], dt[1:] + dt[:-1], dt[-1:]])
    wBinv = jnp.repeat(2.0 * dT / denom, n)

    if isinstance(regularizer, TimeDilation):
        wEinv = dT / (regularizer.alpha ** 2 * dt)
        E4 = jnp.zeros((Ndt, n, Ndt), us.dtype)
        E4 = E4.at[ar, :, ar].set(dudt)
        E = E4.reshape(Ndt * n, Ndt)
        S = B @ (wBinv[:, None] * B.T) + E @ (wEinv[:, None] * E.T)
    else:
        wEinv = None
        E = None
        S = B @ (wBinv[:, None] * B.T)

    return _LSSData(
        sensealg=sensealg, ts=ts, us=us, umid=umid, dudt=dudt, dt=dt, S=S,
        B=B, E=E, wBinv=wBinv, wEinv=wEinv, p=p, kern=kern, g=g, dgdu=dgdu,
        dgdp=dgdp, n=n, npf=npf, unravel_p=unravel_p,
    )


def _dgdu_nodes(data: _LSSData):
    """∂g/∂u at every node, (Nt, n)."""
    p = data.p
    if data.dgdu is not None:
        f = lambda u, t, i: ravel_pytree(data.dgdu(u, p, t, i))[0]
        return jax.vmap(f)(data.us, data.ts, jnp.arange(data.ts.shape[0]))
    if data.g is None:
        raise ValueError("need g or dgdu_continuous")
    gr = jax.grad(lambda u, t: data.g(u, p, t))
    return jax.vmap(gr)(data.us, data.ts)


def _dgdp_nodes(data: _LSSData, us, ts):
    if data.dgdp is not None:
        p = data.p
        f = lambda u, t, i: ravel_pytree(data.dgdp(u, p, t, i))[0]
        return jax.vmap(f)(us, ts, jnp.arange(ts.shape[0]))
    if data.g is not None:
        def gp(u, t):
            return ravel_pytree(jax.grad(
                lambda pp: data.g(u, pp, t), argnums=0
            )(data.p))[0]

        return jax.vmap(gp)(us, ts)
    return jnp.zeros((us.shape[0], data.npf), us.dtype)


class ForwardLSSProblem:
    """Mirror of reference ForwardLSSProblem(sol, sensealg; dgdu_continuous,
    g) (lss.jl:143-245)."""

    def __init__(self, sol, sensealg: ForwardLSS, t=None, dgdu_discrete=None,
                 dgdp_discrete=None, dgdu_continuous=None,
                 dgdp_continuous=None, g=None):
        dgdu = dgdu_discrete if dgdu_discrete is not None else (
            (lambda u, p, tt, i: dgdu_continuous(u, p, tt))
            if dgdu_continuous is not None else None
        )
        dgdp = dgdp_discrete if dgdp_discrete is not None else (
            (lambda u, p, tt, i: dgdp_continuous(u, p, tt))
            if dgdp_continuous is not None else None
        )
        self.data = _build_lss(sol, sensealg, dgdu, dgdp, g)
        self.sensealg = sensealg


class AdjointLSSProblem:
    def __init__(self, sol, sensealg: AdjointLSS, t=None, dgdu_discrete=None,
                 dgdp_discrete=None, dgdu_continuous=None,
                 dgdp_continuous=None, g=None):
        if not isinstance(sensealg.LSSregularizer, TimeDilation):
            raise NotImplementedError(
                "AdjointLSS supports the TimeDilation regularizer "
                "(as in the reference, lss.jl:676)"
            )
        dgdu = dgdu_discrete if dgdu_discrete is not None else (
            (lambda u, p, tt, i: dgdu_continuous(u, p, tt))
            if dgdu_continuous is not None else None
        )
        dgdp = dgdp_discrete if dgdp_discrete is not None else (
            (lambda u, p, tt, i: dgdp_continuous(u, p, tt))
            if dgdp_continuous is not None else None
        )
        self.data = _build_lss(sol, sensealg, dgdu, dgdp, g)
        self.sensealg = sensealg


def _fp_blocks(data: _LSSData, us, ts):
    """∂f/∂p at given states, (m, n, npf) in one batched sweep."""
    p = data.p

    def one(u, t):
        def fp(pf):
            return data.kern.fvec(u, data.unravel_p(pf), t)

        return jax.jacfwd(fp)(ravel_pytree(p)[0])

    return jax.vmap(one)(us, ts)


def shadow_forward(prob: ForwardLSSProblem):
    """d⟨g⟩/dp via forward LSS (lss.jl:361-514), all parameters batched."""
    data = prob.data
    reg = data.sensealg.LSSregularizer
    n, npf = data.n, data.npf
    ts, dt = data.ts, data.dt
    Nt = ts.shape[0]
    Ndt = Nt - 1
    tmid = 0.5 * (ts[1:] + ts[:-1])

    b = _fp_blocks(data, data.umid, tmid).reshape(Ndt * n, npf)
    w = jnp.linalg.solve(data.S, b)                     # (Ndt·n, npf)
    v = (data.wBinv[:, None] * (data.B.T @ w)).reshape(Nt, n, npf)

    gu = _dgdu_nodes(data)                              # (Nt, n)
    gp = _dgdp_nodes(data, data.us, ts)                 # (Nt, npf)
    vdot = jnp.einsum("ji,jik->jk", gu, v) + gp         # (Nt, npf)

    if isinstance(reg, (CosWindowing, Cos2Windowing)):
        dT = ts[-1] - ts[0]
        win = (ts - ts[0]) * (2.0 * jnp.pi / dT)
        win = 1.0 - jnp.cos(win)
        if isinstance(reg, Cos2Windowing):
            win = win ** 2
        win = win / jnp.sum(win)
        return jnp.einsum("j,jk->k", win, vdot)

    # TimeDilation with skip window (lss.jl:369-418)
    eta = (data.wEinv[:, None] * (data.E.T @ w))        # (Ndt, npf)
    ts_np = np.asarray(ts)
    n0 = int(np.searchsorted(ts_np, ts_np[0] + reg.t0skip, side="left"))
    n1 = int(np.searchsorted(ts_np, ts_np[-1] - reg.t1skip, side="left"))
    n1 = min(n1, Nt - 1)
    n_nodes = n1 - n0 + 1
    n_mid = n1 - n0

    res = jnp.mean(vdot[n0:n1 + 1], axis=0)
    gmid = jax.vmap(lambda u, t: data.g(u, data.p, t))(
        data.umid[n0:n1], tmid[n0:n1]
    )
    eta_w = eta[n0:n1]
    res = res - jnp.einsum("jk,j->k", eta_w, gmid) / n_mid
    res = res + jnp.sum(eta_w, axis=0) * jnp.sum(gmid) / n_mid ** 2
    return res


def shadow_adjoint(prob: AdjointLSSProblem):
    """d⟨g⟩/dp via adjoint LSS (lss.jl:676-727)."""
    data = prob.data
    reg = data.sensealg.LSSregularizer
    n, npf = data.n, data.npf
    ts, dt = data.ts, data.dt
    Nt = ts.shape[0]
    Ndt = Nt - 1
    tmid = 0.5 * (ts[1:] + ts[:-1])

    gu = _dgdu_nodes(data)                              # (Nt, n)
    wB_corr = data.wBinv * gu.reshape(-1) / Nt          # (Nt·n,)

    gmid = jax.vmap(lambda u, t: data.g(u, data.p, t))(data.umid, tmid)
    h = -(gmid - jnp.mean(gmid)) / Ndt
    h = data.wEinv * h                                  # (Ndt,)

    b_adj = data.E @ h + data.B @ wB_corr               # (Ndt·n,)
    wa = jnp.linalg.solve(data.S, b_adj).reshape(Ndt, n)

    ts_np = np.asarray(ts)
    n0 = int(np.searchsorted(ts_np, ts_np[0] + reg.t0skip, side="left"))
    n1 = int(np.searchsorted(ts_np, ts_np[-1] - reg.t1skip, side="left"))
    n1 = min(n1, Nt - 1)

    gp = _dgdp_nodes(data, data.umid[n0:n1], tmid[n0:n1])
    res = jnp.mean(gp, axis=0) if gp.shape[0] else jnp.zeros(npf, ts.dtype)

    fp = _fp_blocks(data, data.umid[n0:n1], tmid[n0:n1])  # (m, n, npf)
    res = res + jnp.einsum("jik,ji->k", fp, wa[n0:n1])
    return res
