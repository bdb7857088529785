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

`segment_parallel=True` switches the tangent stage to a two-pass
transfer-operator design the sequential reference cannot express
(nilss.jl's forward_sense loop is inherently serial): pass 1 solves the
primal once for the segment-start states; pass 2 solves, per segment, the
FULL tangent transfer basis [u; Φ (n homogeneous rows); V*₀ (npf
param-seeded rows, zero init)] — independent across segments, so the
segment axis vmaps on one chip or shard_maps over a device Mesh
(`mesh=`). Because tangent propagation is linear in its initial value,
the interface QR recursion collapses to small dense algebra on the
segment-end transfer matrices: W_s(t) = W_init_s·Φ_s(t),
V_s(t) = V_init_s·Φ_s(t) + V*₀_s(t). Costs n (not nus) homogeneous
directions per segment — the price of parallelism; segments are short by
construction so Φ_s stays well-conditioned.
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
                         atol=1e-10, max_steps_per_segment=2048,
                         segment_parallel: bool = False, mesh=None):
    """d⟨g⟩/dp over tspan for all parameters (batched).

    segment_parallel=True runs the tangent stage with the two-pass
    transfer-operator design (segments vmapped, or shard_mapped over
    `mesh`'s first axis when a `jax.sharding.Mesh` is given — nseg must
    then be divisible by the mesh size)."""
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

    if segment_parallel:
        # ---- pass 1: primal boundary sweep (one solve, nseg+1 saves) ----
        bounds = jnp.linspace(t0, t1, nseg + 1)
        prim, _ = forward_saveat_solve(
            solver, lambda u, t: kern.fvec(u, p, t), u0vec, t0, t1,
            bounds, rtol=rtol, atol=atol,
            max_steps=max_steps_per_segment * nseg, store_dense=False,
        )
        u_starts = prim.ys_save[:-1]          # (nseg, n)
        rc0 = prim.stats.retcode

        # ---- pass 2: per-segment transfer solves (PARALLEL) -------------
        # Φ rows: row k = tangent from seed e_k, so W(t) = W_init·Φ(t);
        # V*₀ rows: param-seeded, zero initial tangent.
        aug_full, _ = _augmented_fvec(kern, p, n, n + npf, u0_dirs=n)
        eyeS = jnp.concatenate(
            [jnp.eye(n, dtype=dtype), jnp.zeros((npf, n), dtype)]
        )
        t_as = t0 + T_seg * jnp.arange(nseg, dtype=dtype)

        def seg_transfer(u_start, t_a):
            z0 = jnp.concatenate([u_start, eyeS.reshape(-1)])
            saveat = t_a + jnp.linspace(0.0, T_seg, nstep).astype(dtype)
            fwd, _ = forward_saveat_solve(
                solver, aug_full, z0, t_a, t_a + T_seg, saveat,
                rtol=rtol, atol=atol, max_steps=max_steps_per_segment,
                store_dense=False,
            )
            zs = fwd.ys_save
            u = zs[:, :n]
            S = zs[:, n:].reshape(nstep, n + npf, n)
            return u, S[:, :n, :], S[:, n:, :], fwd.stats.retcode

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]
            nd = int(np.prod(mesh.devices.shape))
            if nseg % nd != 0:
                raise ValueError(
                    f"segment_parallel over a mesh needs nseg divisible by "
                    f"the mesh size; got nseg={nseg}, devices={nd}"
                )
            sweep = jax.shard_map(
                lambda us_, ts_: jax.vmap(seg_transfer)(us_, ts_),
                mesh=mesh, in_specs=(P(axis), P(axis)),
                out_specs=(P(axis), P(axis), P(axis), P(axis)),
                check_vma=False,
            )
        else:
            sweep = jax.vmap(seg_transfer)
        u_all, Phi_all, Vst_all, rcs = sweep(u_starts, t_as)

        seg_ts = t_as[:, None] + jnp.linspace(0.0, T_seg, nstep)[None]
        dudt_all = jax.vmap(jax.vmap(
            lambda uu, tt: kern.fvec(uu, p, tt)
        ))(u_all, seg_ts.astype(dtype))

        # ---- interface recursion on segment-END transfer values ---------
        # (renormalize!, nilss.jl:442-466 — now O(n·nus) dense algebra)
        def proj_rows(vecs, de):
            return vecs - ((vecs @ de) / (de @ de))[:, None] * de[None]

        W_init_list, V_init_list, Rs, bs = [], [], [], []
        W_init, V_init = W0, V0
        for s in range(nseg):
            W_init_list.append(W_init)
            V_init_list.append(V_init)
            if s < nseg - 1:
                W_end = W_init @ Phi_all[s, -1]
                V_end = V_init @ Phi_all[s, -1] + Vst_all[s, -1]
                de = dudt_all[s, -1]
                W_perp_end = proj_rows(W_end, de)
                V_perp_end = proj_rows(V_end, de)
                Q, R = jnp.linalg.qr(W_perp_end.T)  # Q (n,nus), R (nus,nus)
                bseg = Q.T @ V_perp_end.T           # (nus, npf)
                Rs.append(R)
                bs.append(bseg)
                W_init = Q.T
                V_init = (V_perp_end.T - Q @ bseg).T

        W_inits = jnp.stack(W_init_list)  # (nseg, nus, n)
        V_inits = jnp.stack(V_init_list)  # (nseg, npf, n)
        W_all = jnp.einsum("sjk,stkm->stjm", W_inits, Phi_all)
        V_all = jnp.einsum("sjk,stkm->stjm", V_inits, Phi_all) + Vst_all
        Wp_all = jax.vmap(project)(W_all, dudt_all)
        Vp_all = jax.vmap(project)(V_all, dudt_all)
        worst = jnp.maximum(rc0, jnp.max(rcs))
    else:
        # ---- sequential segment sweep (reference forward_sense) ---------
        us, Ws, Vs, Wp_s, Vp_s, duds, Rs, bs, retcodes = \
            [], [], [], [], [], [], [], [], []
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
                Q, R = jnp.linalg.qr(W_perp[-1].T)   # Q (n,nus), R (nus,nus)
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
        worst = jnp.max(jnp.stack(retcodes))

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

    res = jnp.where(worst != 0, jnp.full_like(res, jnp.nan), res)
    return res
