"""NILSAS — non-intrusive least-squares adjoint shadowing
(reference: src/nilsas.jl; Ni & Talnikar, JCP 2019).

Adjoint counterpart of NILSS: walking segments backward, each segment solves
M homogeneous adjoints W (Ẇ = -JᵀW) plus one inhomogeneous adjoint v*
(forced by ∂g/∂u), with QR re-orthonormalization at interfaces
(renormalize!, nilsas.jl:349-377) and running quadratures

  C = ∫wᵢ·wⱼ, dwv = ∫w·v*, dwf = ∫w·f, dvf = ∫v*·f,
  dJs = ∫∂g/∂p, dvfs/dwfs = ∫-λᵀ∂f/∂p         (RHS, nilsas.jl:227-303)

terminal condition: last homogeneous adjoint aligned with f(u_T), others
random orthogonal (terminate_conditions, nilsas.jl:150-185). The small KKT
system `nilsas_min` (nilsas.jl:422-476) recovers the per-segment
coefficients a; gradient = Σ(dvfs + dJs + dwfs·a)/T (shadow_adjoint,
nilsas.jl:477-505).

TPU-first deviations: the primal y(t) comes from the dense forward
interpolant rather than a backward re-integration (same quantity, better
stability), all M+1 adjoint VJPs per RHS eval are one vmapped pullback, and
quadrature rows ride in the integrated state with zero error-weight.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ...ops.interp import dense_eval
from ...ops.vjp import make_vjp_kernels
from ...sensealg import NILSAS
from ...solvers.integrate import integrate
from ...utils.pytree import ravel_pytree

__all__ = ["NILSASProblem", "nilsas_shadow_adjoint"]


@dataclass
class NILSASProblem:
    """Mirror of reference NILSASProblem(prob, NILSAS(nseg, nstep, M); g)."""

    prob: Any
    sensealg: NILSAS
    g: Optional[Callable] = None
    dgdu_continuous: Optional[Callable] = None
    dgdp_continuous: Optional[Callable] = None

    def __post_init__(self):
        if self.g is None:
            self.g = getattr(self.sensealg, "g", None)
        if self.g is None and self.dgdu_continuous is None:
            raise ValueError("NILSAS needs the objective g (or dgdu_continuous)")


def nilsas_shadow_adjoint(nprob: NILSASProblem, solver=None, *, rtol=1e-8,
                          atol=1e-10, fwd_rtol=1e-11, fwd_atol=1e-13,
                          max_steps=16384, max_steps_per_segment=4096,
                          segment_parallel: bool = False, mesh=None):
    """segment_parallel=True switches the adjoint stage to the two-pass
    transfer-operator design (the adjoint analogue of NILSS's): each
    segment solves the FULL backward transfer basis [v*₀; Φ (n identity-
    seeded homogeneous adjoints)] plus the bilinear quadrature carriers
    G=∫ΦΦᵀ, h=∫Φv*₀, pf=∫Φf, GP=∫(-Φᵀ∂f/∂p) — independent across
    segments (vmapped, or shard_mapped over `mesh`'s first axis; nseg must
    divide by the mesh size). Because adjoint propagation is linear in the
    terminal value, the right-to-left interface QR recursion collapses to
    dense algebra on segment-end transfer values, and every recorded
    quadrature is a bilinear form: C=W₀GW₀ᵀ, dwv=W₀(h+Gv₀), dwf=W₀pf,
    dvf=vf+v₀·pf, gW=W₀GP, gv=gv₀+v₀·GP. Costs n (not M) homogeneous
    adjoints per segment — the price of parallelism."""
    from ...solve import solve as _solve
    from ...solvers.explicit import Tsit5

    solver = solver or Tsit5()
    prob = nprob.prob
    sensealg = nprob.sensealg
    g = nprob.g
    p = prob.p
    t0, t1 = float(prob.tspan[0]), float(prob.tspan[1])
    nseg, M = sensealg.nseg, sensealg.M
    T_seg = (t1 - t0) / nseg

    u0vec, unravel_u = ravel_pytree(prob.u0)
    pflat, unravel_p = ravel_pytree(p)
    dtype = u0vec.dtype
    n = u0vec.shape[0]
    npf = pflat.shape[0]
    kern = make_vjp_kernels(prob.f, prob.u0, p)

    # dense forward trajectory over the whole span
    sol = _solve(prob, solver, rtol=fwd_rtol, atol=fwd_atol, dense=True,
                 max_steps=max_steps)
    dense = sol.dense
    fwd_retcode = sol.stats.retcode

    if nprob.dgdu_continuous is not None:
        dgdu = lambda y, t: ravel_pytree(nprob.dgdu_continuous(unravel_u(y), p, t))[0]
    else:
        dgdu = lambda y, t: ravel_pytree(
            jax.grad(lambda uu: g(uu, p, t))(unravel_u(y)))[0]
    if nprob.dgdp_continuous is not None:
        dgdp = lambda y, t: ravel_pytree(nprob.dgdp_continuous(unravel_u(y), p, t))[0]
    elif g is not None:
        def dgdp(y, t):
            try:
                return ravel_pytree(
                    jax.grad(lambda pp: g(unravel_u(y), pp, t))(p))[0]
            except Exception:
                return jnp.zeros(npf, dtype)
    else:
        dgdp = lambda y, t: jnp.zeros(npf, dtype)

    # state layout: [v*(n); W(M·n); gv(npf); gW(M·npf); C(M²); dwv(M);
    #                dwf(M); dvf(1); dJs(npf)]
    oW = n
    ogv = oW + M * n
    ogW = ogv + npf
    oC = ogW + M * npf
    odwv = oC + M * M
    odwf = odwv + M
    odvf = odwf + M
    odJs = odvf + 1
    ntot = odJs + npf

    def aug_rhs(z, t):
        y = dense_eval(dense, t)
        vstar = z[:n]
        W = z[oW:ogv].reshape(M, n)
        lams = jnp.concatenate([vstar[None], W], axis=0)  # (M+1, n)

        fval = kern.fvec(y, p, t)

        def pull(lam):
            _, ubar, pbar = kern.f_and_vjp(y, p, t, lam)
            return ubar, ravel_pytree(pbar)[0]

        ubars, pbars = jax.vmap(pull)(lams)
        gu = dgdu(y, t)

        dv = -ubars[0] - gu
        dW = -ubars[1:]
        dgv = -pbars[0]
        dgW = -pbars[1:]

        # quadrature derivatives (signs as in the reference backward RHS)
        dC = -(W @ W.T)
        ddwv = -(W @ vstar)
        ddwf = -(W @ fval)
        ddvf = -jnp.dot(vstar, fval)[None]
        ddJs = -dgdp(y, t)

        return jnp.concatenate([
            dv, dW.reshape(-1), dgv, dgW.reshape(-1), dC.reshape(-1),
            ddwv, ddwf, ddvf, ddJs,
        ])

    # error-control weights: adjoint states only
    wts = jnp.zeros(ntot, dtype).at[:ogv].set(1.0)

    # terminal condition (terminate_conditions, nilsas.jl:150-185)
    y_T = dense_eval(dense, jnp.asarray(t1, dtype))
    f_T = kern.fvec(y_T, p, jnp.asarray(t1, dtype))
    f_unit = f_T / jnp.linalg.norm(f_T)
    key = jax.random.PRNGKey(sensealg.rng_seed)
    if M > 1:
        Wr = jax.random.normal(key, (n, M - 1), dtype)
        Wr = Wr - f_unit[:, None] * (f_unit @ Wr)[None, :]
        Q0, _ = jnp.linalg.qr(Wr)
        W_init = jnp.concatenate([Q0[:, :M - 1], f_unit[:, None]], axis=1)  # (n, M)
    else:
        W_init = f_unit[:, None]
    vstar_init = jnp.zeros(n, dtype)

    def pack(vstar, W_cols):
        z = jnp.zeros(ntot, dtype)
        z = z.at[:n].set(vstar)
        z = z.at[oW:ogv].set(W_cols.T.reshape(-1))  # rows = adjoints
        return z

    z = pack(vstar_init, W_init)

    Rs = jnp.zeros((nseg, M, M), dtype)
    bs = jnp.zeros((nseg, M), dtype)
    C_seg = jnp.zeros((nseg, M, M), dtype)
    dwv_seg = jnp.zeros((nseg, M), dtype)
    dwf_seg = jnp.zeros((nseg, M), dtype)
    dvf_seg = jnp.zeros((nseg,), dtype)
    dJs_seg = jnp.zeros((nseg, npf), dtype)
    dvfs_seg = jnp.zeros((nseg, npf), dtype)
    dwfs_seg = jnp.zeros((nseg, M, npf), dtype)
    worst = jnp.asarray(fwd_retcode, jnp.int32)

    if segment_parallel:
        # ---- per-segment transfer solves (PARALLEL over segments) -------
        # state: [v*₀(n); Φ(n²); gv₀(npf); GP(n·npf); G(n²); h(n); pf(n);
        #         vf(1); dJs(npf)] — Φ rows seeded with the identity, so
        #         any terminal adjoint value reconstructs by linearity.
        pW = n
        pgv = pW + n * n
        pGP = pgv + npf
        pG = pGP + n * npf
        ph = pG + n * n
        ppf = ph + n
        pvf = ppf + n
        pdJ = pvf + 1
        ptot = pdJ + npf

        def aug_rhs_T(zz, t):
            y = dense_eval(dense, t)
            vstar = zz[:n]
            Phi = zz[pW:pgv].reshape(n, n)
            lams = jnp.concatenate([vstar[None], Phi], axis=0)  # (n+1, n)
            fval = kern.fvec(y, p, t)

            def pull(lam):
                _, ubar, pbar = kern.f_and_vjp(y, p, t, lam)
                return ubar, ravel_pytree(pbar)[0]

            ubars, pbars = jax.vmap(pull)(lams)
            gu = dgdu(y, t)
            return jnp.concatenate([
                -ubars[0] - gu,
                (-ubars[1:]).reshape(-1),
                -pbars[0],
                (-pbars[1:]).reshape(-1),
                (-(Phi @ Phi.T)).reshape(-1),
                -(Phi @ vstar),
                -(Phi @ fval),
                -jnp.dot(vstar, fval)[None],
                -dgdp(y, t),
            ])

        wtsT = jnp.zeros(ptot, dtype).at[:pgv].set(1.0)
        z0T = jnp.zeros(ptot, dtype).at[pW:pgv].set(
            jnp.eye(n, dtype=dtype).reshape(-1)
        )
        t_his = t0 + T_seg * (jnp.arange(nseg, dtype=dtype) + 1.0)

        def seg_transfer(t_hi):
            res = integrate(
                solver, aug_rhs_T, t_hi, t_hi - T_seg, z0T,
                rtol=rtol, atol=atol, max_steps=max_steps_per_segment,
                store_dense=False, err_weights=wtsT,
            )
            return res.u_final, res.stats.retcode

        if mesh is not None:
            import numpy as _onp
            from jax.sharding import PartitionSpec as P

            axisname = mesh.axis_names[0]
            nd = int(_onp.prod(mesh.devices.shape))
            if nseg % nd != 0:
                raise ValueError(
                    f"segment_parallel over a mesh needs nseg divisible by "
                    f"the mesh size; got nseg={nseg}, devices={nd}"
                )
            sweep = jax.shard_map(
                lambda ts_: jax.vmap(seg_transfer)(ts_),
                mesh=mesh, in_specs=P(axisname),
                out_specs=(P(axisname), P(axisname)), check_vma=False,
            )
        else:
            sweep = jax.vmap(seg_transfer)
        zT, rcs = sweep(t_his)
        worst = jnp.maximum(worst, jnp.max(rcs))

        # ---- right-to-left interface recursion on segment-END transfer
        # values (renormalize!, nilsas.jl:349-377 — now dense algebra) ----
        W_rows = W_init.T   # (M, n) terminal homogeneous adjoints (rows)
        v_row = vstar_init  # (n,)
        for iseg in range(nseg - 1, -1, -1):
            ze = zT[iseg]
            Phi_e = ze[pW:pgv].reshape(n, n)
            G = ze[pG:ph].reshape(n, n)
            GP = ze[pGP:pG].reshape(n, npf)

            C_seg = C_seg.at[iseg].set(W_rows @ G @ W_rows.T)
            dwv_seg = dwv_seg.at[iseg].set(
                W_rows @ (ze[ph:ppf] + G @ v_row)
            )
            dwf_seg = dwf_seg.at[iseg].set(W_rows @ ze[ppf:pvf])
            dvf_seg = dvf_seg.at[iseg].set(ze[pvf] + v_row @ ze[ppf:pvf])
            dvfs_seg = dvfs_seg.at[iseg].set(ze[pgv:pGP] + v_row @ GP)
            dwfs_seg = dwfs_seg.at[iseg].set(W_rows @ GP)
            dJs_seg = dJs_seg.at[iseg].set(ze[pdJ:])

            W_end = W_rows @ Phi_e          # (M, n)
            v_end = ze[:n] + v_row @ Phi_e  # (n,)
            Q, R = jnp.linalg.qr(W_end.T)   # (n, M)
            b = Q.T @ v_end
            Rs = Rs.at[iseg].set(R)
            bs = bs.at[iseg].set(b)
            W_rows = Q.T
            v_row = v_end - Q @ b
    else:
        for iseg in range(nseg - 1, -1, -1):
            t_a = t0 + (iseg + 1) * T_seg
            t_b = t0 + iseg * T_seg
            res = integrate(
                solver, aug_rhs, t_a, t_b, z,
                rtol=rtol, atol=atol, max_steps=max_steps_per_segment,
                store_dense=False, err_weights=wts,
            )
            worst = jnp.maximum(worst, res.stats.retcode)
            ze = res.u_final
            vstar = ze[:n]
            W = ze[oW:ogv].reshape(M, n).T  # (n, M) columns = adjoints

            Q, R = jnp.linalg.qr(W)
            b = Q.T @ vstar

            Rs = Rs.at[iseg].set(R)
            bs = bs.at[iseg].set(b)
            C_seg = C_seg.at[iseg].set(ze[oC:odwv].reshape(M, M))
            dwv_seg = dwv_seg.at[iseg].set(ze[odwv:odwf])
            dwf_seg = dwf_seg.at[iseg].set(ze[odwf:odvf])
            dvf_seg = dvf_seg.at[iseg].set(ze[odvf])
            dJs_seg = dJs_seg.at[iseg].set(ze[odJs:])
            dvfs_seg = dvfs_seg.at[iseg].set(ze[ogv:ogW])
            dwfs_seg = dwfs_seg.at[iseg].set(ze[ogW:oC].reshape(M, npf))

            z = pack(vstar - Q @ b, Q)

    # ---- nilsas_min (nilsas.jl:422-476) --------------------------------
    K = nseg
    Cinv = jnp.linalg.inv(C_seg)  # (K, M, M)
    Cinv_big = jnp.zeros((M * K, M * K), dtype)
    for i in range(K):
        Cinv_big = Cinv_big.at[i * M:(i + 1) * M, i * M:(i + 1) * M].set(Cinv[i])

    Bm = jnp.zeros((M * K - M + 1, M * K), dtype)
    for i in range(K - 1):
        Bm = Bm.at[i * M:(i + 1) * M, i * M:(i + 1) * M].set(jnp.eye(M, dtype=dtype))
        Bm = Bm.at[i * M:(i + 1) * M, (i + 1) * M:(i + 2) * M].set(-Rs[i + 1])
    for i in range(K):
        Bm = Bm.at[-1, i * M:(i + 1) * M].set(dwf_seg[i])

    d = dwv_seg.reshape(-1)
    b_vec = jnp.concatenate([bs[1:].reshape(-1), -jnp.sum(dvf_seg)[None]])

    lam = jnp.linalg.solve(-(Bm @ Cinv_big @ Bm.T), Bm @ Cinv_big @ d + b_vec)
    a = (-Cinv_big @ (Bm.T @ lam + d)).reshape(K, M)

    # ---- gradient (shadow_adjoint, nilsas.jl:489-505) -------------------
    res_grad = jnp.sum(dvfs_seg, axis=0) + jnp.sum(dJs_seg, axis=0)
    res_grad = res_grad + jnp.einsum("smk,sm->k", dwfs_seg, a)
    res_grad = res_grad / (nseg * T_seg)
    res_grad = jnp.where(worst != 0, jnp.full_like(res_grad, jnp.nan), res_grad)
    return res_grad
