"""NILSS — non-intrusive least-squares shadowing (reference: src/nilss.jl;
Ni & Wang, JCP 2017).

The trajectory is split into `nseg` segments of `nstep` saved points each.
Per segment, one augmented tangent solve propagates [u; W; v*]: `nus`
homogeneous tangents W (Ẇ = J·W) and one inhomogeneous tangent v* per
parameter (v̇* = J·v* + ∂f/∂pᵢ) — all directions in a single vmapped-jvp
augmented ODE (the `nus` extension of ForwardSensitivity, reference
forward_sensitivity.jl:586-596). At interfaces, tangents are projected ⊥ f
and re-orthonormalized by QR (renormalize!, nilss.jl:442-466); a small KKT
least-squares over the per-segment coefficients a recovers the bounded
shadowing direction v = v* + W·a (compute_Cinv!/d!/B!/a!, nilss.jl:467-525).

Sensitivity (shadow_forward, nilss.jl:591-637):
  d⟨g⟩/dp = Σ_seg [ ∫ (∂g/∂u)·v dt  +  ξ_end·(⟨g⟩ - g_end)/dtsave ] / T

TPU-first notes: the time quadratures C, d, and the gradient accumulations
are trapezoid-weighted einsums over (nstep, …) arrays; all parameters share
the homogeneous basis so the KKT solves are batched over parameters in one
dense solve.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.vjp import make_vjp_kernels
from ...sensealg import NILSS
from ...utils.pytree import ravel_pytree
from ..common import forward_saveat_solve
from ..forward import _augmented_fvec

__all__ = ["NILSSProblem", "nilss_shadow_forward"]


@dataclass
class NILSSProblem:
    """Mirror of reference NILSSProblem(prob, NILSS(nseg, nstep); g)
    (nilss.jl:74-254)."""

    prob: Any
    sensealg: NILSS
    g: Optional[Callable] = None
    dgdu_continuous: Optional[Callable] = None

    def __post_init__(self):
        if self.g is None:
            self.g = getattr(self.sensealg, "g", None)
        if self.g is None:
            # The time-dilation terms (⟨g⟩ average and segment-end ξ·(⟨g⟩-g))
            # need g itself, not just its gradient — the reference's
            # check_for_g makes the same demand (nilss.jl:565-589).
            raise ValueError(
                "NILSS needs the objective g itself (dgdu_continuous alone "
                "is insufficient: the time-dilation terms evaluate g)"
            )


def nilss_shadow_forward(nprob: NILSSProblem, solver=None, *, rtol=1e-8,
                         atol=1e-10, max_steps_per_segment=2048):
    """d⟨g⟩/dp over tspan for all parameters (batched)."""
    from ...solvers.explicit import Tsit5

    solver = solver or Tsit5()
    prob = nprob.prob
    sensealg = nprob.sensealg
    g = nprob.g
    p = prob.p
    t0, t1 = float(prob.tspan[0]), float(prob.tspan[1])
    nseg, nstep = sensealg.nseg, sensealg.nstep

    u0vec, unravel_u = ravel_pytree(prob.u0)
    pflat, unravel_p = ravel_pytree(p)
    dtype = u0vec.dtype
    n = u0vec.shape[0]
    npf = pflat.shape[0]
    nus = sensealg.nus if sensealg.nus is not None else n - 1
    kern = make_vjp_kernels(prob.f, prob.u0, p)

    T_seg = (t1 - t0) / nseg
    dtsave = T_seg / (nstep - 1)

    # augmented field over [u; S] with S = (nus + npf, n): first nus rows
    # homogeneous, last npf rows parameter-seeded.
    n_dirs = nus + npf
    aug, _ = _augmented_fvec(kern, p, n, n_dirs, u0_dirs=nus)

    # initial tangents: W random normalized columns, v* = 0 (nilss.jl:201-210)
    key = jax.random.PRNGKey(sensealg.rng_seed)
    W0 = jax.random.normal(key, (nus, n), dtype)
    W0 = W0 / jnp.linalg.norm(W0, axis=1, keepdims=True)
    V0 = jnp.zeros((npf, n), dtype)

    # quadrature weights (trapezoid over a segment, nilss.jl:215-218)
    wq = jnp.ones(nstep, dtype).at[0].mul(0.5).at[-1].mul(0.5)

    def solve_segment(u0_seg, W_seg, V_seg, t_a, t_b):
        z0 = jnp.concatenate([u0_seg, W_seg.reshape(-1), V_seg.reshape(-1)])
        saveat = jnp.linspace(t_a, t_b, nstep)
        fwd, _ = forward_saveat_solve(
            solver, aug, z0, t_a, t_b, saveat,
            rtol=rtol, atol=atol, max_steps=max_steps_per_segment,
            store_dense=False,
        )
        zs = fwd.ys_save  # (nstep, n*(1+n_dirs))
        u = zs[:, :n]
        S = zs[:, n:].reshape(nstep, n_dirs, n)
        return u, S[:, :nus, :], S[:, nus:, :], fwd.stats.retcode

    def project(vecs, dudt):
        """Remove the f-direction component at every saved point.
        vecs: (nstep, k, n); dudt: (nstep, n)."""
        denom = jnp.einsum("ti,ti->t", dudt, dudt)
        coef = jnp.einsum("tki,ti->tk", vecs, dudt) / denom[:, None]
        return vecs - coef[:, :, None] * dudt[None].transpose(1, 0, 2)

    # ---- sequential segment sweep --------------------------------------
    us, Ws, Vs, Wp_s, Vp_s, duds, Rs, bs, retcodes = [], [], [], [], [], [], [], [], []
    u_seg, W_seg, V_seg = u0vec, W0, V0
    for iseg in range(nseg):
        t_a = t0 + iseg * T_seg
        t_b = t0 + (iseg + 1) * T_seg
        u, W, V, rc = solve_segment(u_seg, W_seg, V_seg, t_a, t_b)
        retcodes.append(rc)
        dudt = jax.vmap(lambda uu, tt: kern.fvec(uu, p, tt))(
            u, jnp.linspace(t_a, t_b, nstep)
        )
        W_perp = project(W, dudt)   # (nstep, nus, n)
        V_perp = project(V, dudt)   # (nstep, npf, n)
        us.append(u); Ws.append(W); Vs.append(V)
        Wp_s.append(W_perp); Vp_s.append(V_perp); duds.append(dudt)

        if iseg < nseg - 1:
            # QR of the projected homogeneous end-tangents (renormalize!)
            Q, R = jnp.linalg.qr(W_perp[-1].T)   # Q (n, nus), R (nus, nus)
            bseg = Q.T @ V_perp[-1].T            # (nus, npf)
            Rs.append(R)
            bs.append(bseg)
            u_seg = u[-1]
            W_seg = Q.T                          # rows = new tangents
            V_seg = (V_perp[-1].T - Q @ bseg).T  # (npf, n)

    u_all = jnp.stack(us)            # (nseg, nstep, n)
    W_all = jnp.stack(Ws)            # (nseg, nstep, nus, n)
    V_all = jnp.stack(Vs)            # (nseg, nstep, npf, n)
    Wp_all = jnp.stack(Wp_s)
    Vp_all = jnp.stack(Vp_s)
    dudt_all = jnp.stack(duds)

    # ---- least squares for a (compute_Cinv!/d!/B!/a!) -------------------
    # C_iseg[i,j] = Σ_t wq · (w_i·w_j) ; d_iseg[i, param] = Σ_t wq · (w_i·v*)
    C = jnp.einsum("stin,stjn,t->sij", Wp_all, Wp_all, wq)  # (nseg,nus,nus)
    d = jnp.einsum("stin,stkn,t->sik", Wp_all, Vp_all, wq)  # (nseg,nus,npf)
    Cinv = jnp.linalg.inv(C)

    Nv = nseg * nus
    Cinv_big = jnp.zeros((Nv, Nv), dtype)
    for s in range(nseg):
        Cinv_big = Cinv_big.at[s * nus:(s + 1) * nus, s * nus:(s + 1) * nus].set(Cinv[s])
    d_big = d.reshape(Nv, npf)

    if nseg > 1:
        Bm = jnp.zeros(((nseg - 1) * nus, Nv), dtype)
        for s in range(nseg - 1):
            Bm = Bm.at[s * nus:(s + 1) * nus, s * nus:(s + 1) * nus].set(-Rs[s])
            Bm = Bm.at[s * nus:(s + 1) * nus, (s + 1) * nus:(s + 2) * nus].set(
                jnp.eye(nus, dtype=dtype)
            )
        b_big = jnp.concatenate([b for b in bs], axis=0)  # ((nseg-1)·nus, npf)
        lbd = jnp.linalg.solve(
            -(Bm @ Cinv_big @ Bm.T), Bm @ Cinv_big @ d_big + b_big
        )
        a = -Cinv_big @ (Bm.T @ lbd + d_big)
    else:
        a = -Cinv_big @ d_big
    a = a.reshape(nseg, nus, npf)

    # ---- assemble v and the gradient (shadow_forward nilss.jl:591-637) --
    v = V_all + jnp.einsum("sik,stin->stkn", a, W_all)  # (nseg,nstep,npf,n)

    ts_all = jnp.stack([
        jnp.linspace(t0 + s * T_seg, t0 + (s + 1) * T_seg, nstep)
        for s in range(nseg)
    ])
    if nprob.dgdu_continuous is not None:
        dg = jax.vmap(jax.vmap(
            lambda uu, tt: ravel_pytree(nprob.dgdu_continuous(uu, p, tt))[0]
        ))(u_all, ts_all)
        gs = jax.vmap(jax.vmap(lambda uu, tt: g(uu, p, tt)))(u_all, ts_all) \
            if g is not None else None
    else:
        dg = jax.vmap(jax.vmap(jax.grad(lambda uu, tt: g(uu, p, tt))))(u_all, ts_all)
        gs = jax.vmap(jax.vmap(lambda uu, tt: g(uu, p, tt)))(u_all, ts_all)

    Ttot = (nstep - 1) * nseg
    gavg = jnp.einsum("st,t->", gs, wq) / Ttot

    res = jnp.einsum("stkn,stn,t->k", v, dg, wq) / Ttot
    # segment-end time-dilation term ξ (compute_xi, nilss.jl:549-563)
    xi_end = jnp.einsum("skn,sn->sk", v[:, -1], dudt_all[:, -1]) / jnp.einsum(
        "sn,sn->s", dudt_all[:, -1], dudt_all[:, -1]
    )[:, None]
    res = res + jnp.sum(
        xi_end * (gavg - gs[:, -1])[:, None], axis=0
    ) / (dtsave * Ttot)

    worst = jnp.max(jnp.stack(retcodes))
    res = jnp.where(worst != 0, jnp.full_like(res, jnp.nan), res)
    return res
