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
vmapped sweep, and the Schur system — which is block-TRIDIAGONAL with n×n
blocks (B has two blocks per block-row; the node weights are scalar) — is
never materialized dense: a block-Thomas elimination (`lax.scan` over the
trajectory, one batched n×n solve per block, all parameter RHS columns
together) solves it in O(Nt·n²) memory instead of the reference's dense
lu(S) at O(Nt²·n²) (lss.jl:336-343) — long chaotic trajectories (Nt ≳ 10⁴,
the regime LSS exists for) fit on one chip.

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
    Bl: jnp.ndarray          # (Ndt, n, n) block (i, i) of B
    Br: jnp.ndarray          # (Ndt, n, n) block (i, i+1) of B
    Sd: jnp.ndarray          # (Ndt, n, n) Schur diagonal blocks
    Su: jnp.ndarray          # (Ndt-1, n, n) Schur super-diagonal blocks
    wBinv: jnp.ndarray       # (Nt,) scalar node weights
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

    # node weights wB⁻¹ (lss.jl wB!): 2Δt / (dt-sum at node) — SCALAR per
    # node, which is what keeps S block-tridiagonal with dense n×n blocks.
    denom = jnp.concatenate([dt[:1], dt[1:] + dt[:-1], dt[-1:]])
    wBinv = 2.0 * dT / denom  # (Nt,)

    # S = B diag(wB⁻¹⊗I) Bᵀ (+ E diag(wE⁻¹) Eᵀ), assembled BLOCKWISE:
    #   S[i,i]   = w_i Bl_i Bl_iᵀ + w_{i+1} Br_i Br_iᵀ (+ wE_i d_i d_iᵀ)
    #   S[i,i+1] = w_{i+1} Br_i Bl_{i+1}ᵀ
    BlT = jnp.swapaxes(Bl, 1, 2)
    BrT = jnp.swapaxes(Br, 1, 2)
    Sd = (wBinv[:-1, None, None] * (Bl @ BlT)
          + wBinv[1:, None, None] * (Br @ BrT))
    Su = wBinv[1:-1, None, None] * (Br[:-1] @ BlT[1:])

    if isinstance(regularizer, TimeDilation):
        wEinv = dT / (regularizer.alpha ** 2 * dt)
        Sd = Sd + wEinv[:, None, None] * jnp.einsum(
            "ij,ik->ijk", dudt, dudt)
    else:
        wEinv = None

    return _LSSData(
        sensealg=sensealg, ts=ts, us=us, umid=umid, dudt=dudt, dt=dt,
        Bl=Bl, Br=Br, Sd=Sd, Su=Su,
        wBinv=wBinv, wEinv=wEinv, p=p, kern=kern, g=g, dgdu=dgdu,
        dgdp=dgdp, n=n, npf=npf, unravel_p=unravel_p,
    )


def _schur_solve(data: _LSSData, rhs):
    """Solve S x = rhs for the block-tridiagonal SPD Schur matrix by block
    -Thomas elimination (two lax.scans; SPD ⇒ stable without pivoting).
    rhs: (Ndt, n, k) — all k RHS columns solved together."""
    Sd, Su = data.Sd, data.Su
    Ndt, n, _ = Sd.shape
    SlT = Su  # lower block (i+1, i) = Su[i]ᵀ; keep transposed form

    def fwd_scan(carry, inp):
        Cprev_G, yprev = carry           # G_{i-1} (n,n), y_{i-1} (n,k)
        Sd_i, Su_i, Sl_i, b_i = inp      # Sl_i = S[i, i-1] = Su[i-1]ᵀ
        C = Sd_i - Sl_i @ Cprev_G
        rhs_i = b_i - Sl_i @ yprev
        aug = jnp.linalg.solve(C, jnp.concatenate([Su_i, rhs_i], axis=1))
        G = aug[:, :n]
        y = aug[:, n:]
        return (G, y), (G, y)

    k = rhs.shape[-1]
    zeros_nn = jnp.zeros((n, n), Sd.dtype)
    # pad Su/Sl to length Ndt (G of the last row is unused; Sl_0 = 0)
    Su_pad = jnp.concatenate([Su, zeros_nn[None]], axis=0)
    Sl_pad = jnp.concatenate(
        [zeros_nn[None], jnp.swapaxes(Su, 1, 2)], axis=0)
    (_, _), (Gs, ys) = jax.lax.scan(
        fwd_scan,
        (zeros_nn, jnp.zeros((n, k), Sd.dtype)),
        (Sd, Su_pad, Sl_pad, rhs),
    )

    def bwd_scan(x_next, inp):
        G_i, y_i = inp
        x_i = y_i - G_i @ x_next
        return x_i, x_i

    _, xs_rev = jax.lax.scan(
        bwd_scan, jnp.zeros((n, k), Sd.dtype),
        (Gs, ys), reverse=True,
    )
    return xs_rev  # (Ndt, n, k)


def _Bt_w(data: _LSSData, w):
    """Bᵀ w blockwise: node j gets Bl_jᵀ w_j + Br_{j-1}ᵀ w_{j-1}.
    w: (Ndt, n, k) -> (Nt, n, k)."""
    left = jnp.einsum("iab,iak->ibk", data.Bl, w)    # (Ndt, n, k)
    right = jnp.einsum("iab,iak->ibk", data.Br, w)
    n, k = left.shape[1], left.shape[2]
    z = jnp.zeros((1, n, k), left.dtype)
    return jnp.concatenate([left, z], axis=0) + jnp.concatenate(
        [z, right], axis=0)


def _B_x(data: _LSSData, x_nodes):
    """B x blockwise: row i = Bl_i x_i + Br_i x_{i+1}.
    x_nodes: (Nt, n) -> (Ndt, n)."""
    return (jnp.einsum("iab,ib->ia", data.Bl, x_nodes[:-1])
            + jnp.einsum("iab,ib->ia", data.Br, x_nodes[1:]))


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

    b = _fp_blocks(data, data.umid, tmid)               # (Ndt, n, npf)
    w = _schur_solve(data, b)                           # (Ndt, n, npf)
    v = data.wBinv[:, None, None] * _Bt_w(data, w)      # (Nt, n, npf)

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
    # Eᵀw blockwise: (Eᵀw)_i = dudt_i · w_i
    eta = data.wEinv[:, None] * jnp.einsum(
        "ij,ijk->ik", data.dudt, w)                     # (Ndt, npf)
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
    wB_corr = data.wBinv[:, None] * gu / Nt             # (Nt, n)

    gmid = jax.vmap(lambda u, t: data.g(u, data.p, t))(data.umid, tmid)
    h = -(gmid - jnp.mean(gmid)) / Ndt
    h = data.wEinv * h                                  # (Ndt,)

    # E h blockwise (row i = dudt_i·h_i) + B wB_corr blockwise
    b_adj = data.dudt * h[:, None] + _B_x(data, wB_corr)  # (Ndt, n)
    wa = _schur_solve(data, b_adj[:, :, None])[..., 0]    # (Ndt, n)

    ts_np = np.asarray(ts)
    n0 = int(np.searchsorted(ts_np, ts_np[0] + reg.t0skip, side="left"))
    n1 = int(np.searchsorted(ts_np, ts_np[-1] - reg.t1skip, side="left"))
    n1 = min(n1, Nt - 1)

    gp = _dgdp_nodes(data, data.umid[n0:n1], tmid[n0:n1])
    res = jnp.mean(gp, axis=0) if gp.shape[0] else jnp.zeros(npf, ts.dtype)

    fp = _fp_blocks(data, data.umid[n0:n1], tmid[n0:n1])  # (m, n, npf)
    res = res + jnp.einsum("jik,ji->k", fp, wa[n0:n1])
    return res
