"""Continuous adjoint sensealgs as `jax.custom_vjp` rules on solve (layer L3).

Each sensealg family from the reference becomes one custom_vjp whose backward
pass is *another solve* — the architectural translation of SURVEY §7:

  InterpolatingAdjoint  — reverse solve of [λ; q] with y(t) from the dense
                          forward interpolant (src/interpolating_adjoint.jl);
                          checkpointing re-solves each inter-save interval
                          on demand (:43-126, :206-278).
  BacksolveAdjoint      — reverse solve of [λ; q; u], the ODE itself
                          integrated backwards; checkpoint snap of u at each
                          save time (src/backsolve_adjoint.jl:523-572).
  GaussAdjoint          — reverse solve of λ only; dG/dp accumulated during
                          the solve by per-accepted-step Gauss quadrature
                          (integrating-callback design,
                          src/gauss_adjoint.jl:806-851).
  QuadratureAdjoint     — reverse solve of λ only, kept dense; dG/dp by
                          batched composite Gauss–Legendre panels per
                          inter-save segment afterwards
                          (src/quadrature_adjoint.jl:527-633 — the adaptive
                          quadgk is replaced by fixed-shape panel quadrature,
                          all nodes across all segments evaluated in one
                          vmapped sweep: the TPU-friendly formulation).
  ForwardDiffSensitivity— discrete forward mode: the backward rule re-solves
                          with jax.jacfwd THROUGH the adaptive while_loop and
                          contracts J with the cotangent
                          (src/concrete_solve.jl:1259-1720).

Sign conventions (continuous adjoint with discrete cost injections):
  dλ/dt = -(∂f/∂u)ᵀλ,   λ(t_i⁻) += Δᵢ   (ReverseLossCallback jump)
  dq/dt = -λᵀ∂f/∂p  integrated T→t0 from q(T)=0  ⇒  q(t0) = ∫ λᵀ∂f/∂p dt = dL/dp
  dL/du0 = λ(t0).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_derivatives import CustomVJPPrimal, SymbolicZero

from ..ops.interp import dense_eval, hermite_eval
from ..ops.quadrature import gauss_kronrod_01
from ..ops.vjp import make_vjp_kernels
from ..sensealg import (
    BacksolveAdjoint,
    ForwardDiffSensitivity,
    GaussAdjoint,
    GaussKronrodAdjoint,
    InterpolatingAdjoint,
    QuadratureAdjoint,
)
from ..solvers.integrate import Stats, integrate
from ..utils.pytree import ravel_pytree
from .common import (forward_saveat_solve, match_cotangents,
                     reverse_joined_solve, reverse_pinned_solve)

__all__ = ["SolveOptions", "AuxOut", "make_ode_solve_fn"]


class SolveOptions(NamedTuple):
    rtol: float = 1e-7
    atol: float = 1e-9
    dt0: Any = None
    max_steps: int = 4096
    tstops: Any = None
    dense: bool = False  # user-requested dense output
    # adjoint-pass controls (reference exposes separate tolerances via
    # adjoint_sensitivities kwargs; sensitivity_interface.jl:373)
    adj_rtol: Any = None
    adj_atol: Any = None
    adj_max_steps: Any = None
    callback: Any = None     # CallbackSet (events)
    max_events: int = 32
    dtmax: Any = None
    verbose: bool = False
    # fixed-grid forward (solve(..., adaptive=False, dt=...) with a
    # continuous sensealg): forward marches this dt, reverse stays adaptive
    # at adj_rtol/adj_atol (or pins to the forward grid per pinned_reverse)
    fixed_dt: Any = None
    # straight-line-XLA execution: forward AND reverse run the fully
    # unrolled masked-scan driver (no loop HLO) — the latency-floor mode
    # for dispatch-bound runtimes; requires an explicit-RK pair, no
    # checkpointing/DAE (solve() guards)
    unroll: bool = False


def _rc_ok(retcode):
    """Map the deliberate RETCODE_TERMINATED stop to success BEFORE the
    max-with-reverse-worst combination (so a terminal stop doesn't poison
    gradients, and — combined via max AFTER this — can't mask a genuine
    reverse-solve failure either)."""
    from ..solvers.integrate import RETCODE_TERMINATED

    return jnp.where(retcode == RETCODE_TERMINATED,
                     jnp.zeros_like(retcode), retcode)


class AuxOut(NamedTuple):
    dense: Any
    t_final: jnp.ndarray
    u_final: jnp.ndarray
    stats: Stats
    events: Any = None


def _ravel_rows(tree_with_time_axis):
    """pytree with leading time axis -> (nt, n) flat matrix."""
    return jax.vmap(lambda s: ravel_pytree(s)[0])(tree_with_time_axis)


# -- symbolic-zero cotangent helpers (defvjp(..., symbolic_zeros=True)) ----
# Cotangents on unused outputs arrive as SymbolicZero, so each bwd rule can
# *statically* skip the machinery for outputs the user never consumed —
# crucially, the dense-output jump merging below only costs anything when
# `sol(t)` actually appears in the differentiated program.


def _is_symzero(x):
    return isinstance(x, SymbolicZero)


def _has_cotangent(tree):
    return any(
        not _is_symzero(leaf)
        for leaf in jax.tree_util.tree_leaves(tree, is_leaf=_is_symzero)
    )


def _materialize(x):
    return jnp.zeros(x.shape, x.dtype) if _is_symzero(x) else x


def _materialize_tree(tree):
    return jax.tree_util.tree_map(_materialize, tree, is_leaf=_is_symzero)


def _unwrap_primal(tree):
    """Strip per-leaf CustomVJPPrimal wrappers the fwd rule receives under
    defvjp(..., symbolic_zeros=True)."""
    is_p = lambda l: isinstance(l, CustomVJPPrimal)
    return jax.tree_util.tree_map(
        lambda l: l.value if is_p(l) else l, tree, is_leaf=is_p
    )


def _gl_nodes(order: int, dtype):
    """Gauss-Legendre nodes/weights on [0, 1] (host-side, static)."""
    x, w = np.polynomial.legendre.leggauss(order)
    x01 = 0.5 * (x + 1.0)
    w01 = 0.5 * w
    return jnp.asarray(x01, dtype), jnp.asarray(w01, dtype)


def _extend_times(t0, t1, saveat, lam_jumps):
    """Prepend t0 / append t1 with zero jumps so the reverse pass covers the
    full tspan even when saveat doesn't (degenerate zero-length segments are
    handled by the driver in a single no-op step)."""
    dtype = saveat.dtype
    n = lam_jumps.shape[1]
    times = jnp.concatenate(
        [jnp.asarray(t0, dtype)[None], saveat, jnp.asarray(t1, dtype)[None]]
    )
    zero = jnp.zeros((1, n), lam_jumps.dtype)
    jumps = jnp.concatenate([zero, lam_jumps, zero], axis=0)
    return times, jumps



def _semi_explicit_split(M_fwd):
    """Classify a singular constant mass matrix as semi-explicit index-1:
    algebraic variables = zero rows of M (the reference's column analysis on
    Mᵀ, adjoint_common.jl:110-139); requires the differential block M[d,d]
    nonsingular and no differential-algebraic coupling M[d,a].
    Returns (a_idx, d_idx) as numpy index arrays."""
    import numpy as _onp

    Mnp = _onp.asarray(M_fwd, dtype=float)
    row_zero = _onp.all(Mnp == 0.0, axis=1)
    a_idx = _onp.where(row_zero)[0]
    d_idx = _onp.where(~row_zero)[0]
    if a_idx.size and _onp.any(Mnp[_onp.ix_(d_idx, a_idx)] != 0.0):
        raise NotImplementedError(
            "mass matrix couples differential rows to algebraic variables "
            "(M[d,a] != 0): not semi-explicit index-1 after row "
            "classification — rewrite the system in semi-explicit form"
        )
    Mdd = Mnp[_onp.ix_(d_idx, d_idx)]
    if d_idx.size and abs(float(_onp.linalg.det(Mdd))) < 1e-300:
        raise ValueError(
            "the differential block of the mass matrix must be nonsingular "
            "(reference adjoint_common.jl:131-133)"
        )
    return a_idx, d_idx


def _dae_project_jumps(M_fwd, kern, p, dense, times, jumps, dtype):
    """Project discrete loss cotangents onto the differential adjoint of a
    semi-explicit index-1 DAE with general (possibly non-diagonal)
    differential mass block (reference ReverseLossCallback projection,
    adjoint_common.jl:790-817):
        ŵ        = J_aaᵀ \\ v_a            (embedded in the algebraic rows)
        λ-jump_d = M_ddᵀ \\ (v_d − (Jᵀŵ)_d) ;  λ-jump_a = 0
        q-jump   = −f_pᵀ ŵ
    Returns (alg mask, du0_map λ↦Mᵀλ, λ-jumps (m,n), q-jumps (m,np))."""
    import numpy as _onp

    Mnp = _onp.asarray(M_fwd, dtype=float)
    a_idx, d_idx = _semi_explicit_split(Mnp)
    n = Mnp.shape[0]
    alg_j = jnp.asarray(_onp.all(Mnp == 0.0, axis=1))
    MddT = jnp.asarray(Mnp[_onp.ix_(d_idx, d_idx)].T, dtype)
    MT = jnp.asarray(Mnp.T, dtype)

    def du0_map(lam):
        # dL/du0 = Mᵀ λ(t0); algebraic columns of M are zero, so the
        # algebraic rows of the result vanish automatically.
        return MT @ lam

    def project_jump(tk, v):
        y = dense_eval(dense, tk)
        J = jax.jacfwd(lambda uu: kern.fvec(uu, p, tk))(y)
        Jaa = J[a_idx][:, a_idx]
        w = jnp.linalg.solve(Jaa.T, v[a_idx])
        cot = jnp.zeros_like(v).at[a_idx].set(w)
        _, ubar, pbar = kern.f_and_vjp(y, p, tk, cot)
        lam_d = jnp.linalg.solve(MddT, (v - ubar)[d_idx])
        lamj = jnp.zeros_like(v).at[d_idx].set(lam_d)
        return lamj, -ravel_pytree(pbar)[0]

    lamjs, qjs = jax.vmap(project_jump)(times, jumps)
    return alg_j, du0_map, lamjs, qjs


def _dae_lam_fix(M_fwd, kern, p, gu_fn=None):
    """Pointwise algebraic-consistency restoration for interpolated DAE
    adjoint states. The λ-only quadrature paths (Gauss per-step hook,
    QuadratureAdjoint's post-hoc GK) evaluate λ BETWEEN reverse nodes by
    Hermite interpolation — but the algebraic rows of the adjoint DAE are
    constrained, not integrated:

        J_aaᵀ λ_a = −(∂f_d/∂u_a)ᵀ λ_d

    and their dense-output slopes are constraint residuals, not dλ_a/dt,
    so interpolated λ_a carries O(h) error straight into ∫λᵀ∂f/∂p (the
    fuzz-matrix find: ~1e-2 relative gradient error on random index-1
    systems while the joined-state InterpolatingAdjoint was at 1e-9).
    Re-solving the constraint at each quadrature node makes λ_a exact
    given λ_d. gu_fn(yvec, t) -> ∂g/∂u adds a continuous-cost term to the
    constraint RHS (the algebraic rows of the adjoint DAE with running
    cost: J_aaᵀ λ_a = −(Jᵀλ_d)_a − (∂g/∂u)_a, Cao–Li–Petzold). Returns
    fix(yvec, t, λ) -> λ, or None when M has no algebraic (zero) rows."""
    import numpy as _onp

    a_idx, d_idx = _semi_explicit_split(_onp.asarray(M_fwd, dtype=float))
    if a_idx.size == 0:
        return None
    a_idx = jnp.asarray(a_idx)

    def fix(yj, tj, lam):
        lam_d = lam.at[a_idx].set(0.0)
        rhs = kern.vjp_u(yj, p, tj, lam_d)[a_idx]     # (Jᵀ λ_d)_a
        if gu_fn is not None:
            rhs = rhs + gu_fn(yj, tj)[a_idx]
        J = jax.jacfwd(lambda uu: kern.fvec(uu, p, tj))(yj)
        Jaa = J[a_idx][:, a_idx]
        lam_a = jnp.linalg.solve(Jaa.T, -rhs)
        return lam_d.at[a_idx].set(lam_a)

    return fix


def _dae_reverse_stepper(bwd_solver, bwd_stepper):
    """Reverse stepper for DAE adjoints: honor an explicit bwd_solver;
    otherwise prefer stiffly-accurate SDIRK stages, which enforce the
    algebraic adjoint constraint pointwise and re-consistify λ within one
    step after each jump. Extrapolation (Seulex) works forward but its
    stiff-transient error estimate makes the post-jump reverse layers
    pathologically slow."""
    from ..solvers.sdirk import ESDIRK as _ESDIRK
    from ..solvers.sdirk import SDIRK4 as _SDIRK4

    if bwd_solver is not None:
        return bwd_solver
    return bwd_stepper if isinstance(bwd_stepper, _ESDIRK) else _SDIRK4()


def make_gauss_quad_hook(kern, p, dense, sensealg, t0, t1, dtype, npf,
                         extra_p=None, lam_fix=None, pinned=False):
    """Per-accepted-step quadrature hook for a λ-only reverse solve,
    accumulating dG/dp = ∫ λᵀ∂f/∂p (+ optional ∂g/∂p) dt in the hook carry.

    GaussAdjoint  -> fixed Gauss-Legendre nodes (IntegratingSumCallback
                     design, reference gauss_adjoint.jl:806-851).
    GaussKronrodAdjoint -> true GK(7,15) pair with embedded error estimate
                     and conditional in-place bisection up to max_depth
                     (IntegratingGKSumCallback, gauss_adjoint.jl:815-825);
                     refinement only executes on steps whose pair disagrees
                     (lax.cond in the sequential reverse loop).

    extra_p(yvec, t) -> (npf,): continuous-cost ∂g/∂p integrand term (the
    direct adjoint_sensitivities API). Returns (hook, carry0, finish) where
    finish(carry) -> qflat (and, for GK, warns if the accumulated quadrature
    error exceeds tolerance)."""
    # quadrature accumulates in >= f32 (bf16 running sums lose the mantissa;
    # also keeps the hook carry dtype stable when vjp_p promotes)
    dtype = jnp.promote_types(dtype, jnp.float32)
    is_gk = isinstance(sensealg, GaussKronrodAdjoint)

    def _node_fn(ta, tb, lam_a, fa, lam_b, fb, iv=None):
        # λᵀ∂f/∂p at a quadrature node inside the accepted step [ta, tb]
        # (λ from the step's own Hermite; y from the forward interpolant —
        # searched in the generic mode, directly indexed at interval `iv`
        # in the pinned mode where reverse steps ARE forward intervals).
        if pinned:
            ya_, yb_ = dense.ys[iv], dense.ys[iv + 1]
            fya_, fyb_ = dense.fs[iv], dense.fs[iv + 1]
            tya_, tyb_ = dense.ts[iv], dense.ts[iv + 1]

            def y_of(tj):
                return hermite_eval(tj, tya_, tyb_, ya_, fya_, yb_, fyb_)
        else:
            def y_of(tj):
                return dense_eval(dense, tj)

        def node(tj):
            lam_j = hermite_eval(tj, ta, tb, lam_a, fa, lam_b, fb)
            yj = y_of(tj)
            if lam_fix is not None:
                lam_j = lam_fix(yj, tj, lam_j)
            out = ravel_pytree(kern.vjp_p(yj, p, tj, lam_j))[0]
            if extra_p is not None:
                out = out + extra_p(yj, tj)
            return out

        return node

    def _unpack(rec):
        if pinned:
            ta, tb, lam_a, fa, lam_b, fb, iv = rec
            return ta, tb, lam_a, fa, lam_b, fb, iv
        ta, tb, lam_a, fa, lam_b, fb = rec
        return ta, tb, lam_a, fa, lam_b, fb, None

    if is_gk:
        xk, wk, wg_emb = gauss_kronrod_01(7, dtype)
        T_total = jnp.abs(jnp.asarray(t1, dtype) - jnp.asarray(t0, dtype))

        def gk_step(ta, tb, lam_a, fa, lam_b, fb, iv=None):
            node = _node_fn(ta, tb, lam_a, fa, lam_b, fb, iv)

            def panel(pa, pb):
                width = pb - pa  # negative walking backwards
                vals = jax.vmap(lambda xj: node(pa + width * xj))(xk)
                # q += ∫ (-λᵀ∂f/∂p) dt in forward orientation
                est = -width * jnp.einsum("j,jk->k", wk, vals)
                err = jnp.abs(width) * jnp.linalg.norm(
                    jnp.einsum("j,jk->k", wk - wg_emb, vals)
                )
                return est, err

            def refine(pa, pb, depth):
                est, err = panel(pa, pb)
                if depth <= 0:
                    return est, err
                tol = jnp.maximum(
                    sensealg.abstol * jnp.abs(pb - pa) / T_total,
                    sensealg.reltol * jnp.linalg.norm(est),
                )

                def split(_):
                    pm = 0.5 * (pa + pb)
                    e_l, r_l = refine(pa, pm, depth - 1)
                    e_r, r_r = refine(pm, pb, depth - 1)
                    return e_l + e_r, r_l + r_r

                return jax.lax.cond(
                    err > tol, split, lambda _: (est, err), None
                )

            return refine(ta, tb, sensealg.max_depth)

        def gauss_hook(rec, carry):
            qflat, errsum = carry
            ta, tb, lam_a, fa, lam_b, fb, iv = _unpack(rec)
            est, err = gk_step(ta, tb, lam_a, fa, lam_b, fb, iv)
            return (qflat + est, errsum + err)

        q0 = (jnp.zeros(npf, dtype), jnp.zeros((), dtype))

        def finish_q(qcarry):
            qflat, errsum = qcarry
            tol = jnp.maximum(
                sensealg.abstol,
                sensealg.reltol * jnp.linalg.norm(qflat),
            )
            jax.lax.cond(
                errsum > tol,
                lambda: jax.debug.print(
                    "GaussKronrodAdjoint: accumulated quadrature error "
                    "estimate {e} exceeds tolerance {t}; tighten "
                    "adj_rtol/adj_atol or raise max_depth", e=errsum, t=tol
                ),
                lambda: None,
            )
            return qflat

        return gauss_hook, q0, finish_q

    xg, wgl = _gl_nodes(getattr(sensealg, "n_nodes", 7), dtype)

    def gauss_hook(rec, qflat):
        # tb "<" ta going backwards
        ta, tb, lam_a, fa, lam_b, fb, iv = _unpack(rec)
        node = _node_fn(ta, tb, lam_a, fa, lam_b, fb, iv)
        width = tb - ta
        contribs = jax.vmap(lambda xj: node(ta + width * xj))(xg)
        # q += ∫_{ta}^{tb} (-λᵀ∂f/∂p) dt ; width < 0 going backwards.
        return qflat - width * jnp.einsum("j,jk->k", wgl, contribs)

    return gauss_hook, jnp.zeros(npf, dtype), (lambda qcarry: qcarry)


def adaptive_gk_dp(kern, p, dense, lam_dense, sensealg, dtype, npf, q_init,
                   extra_p=None, lam_fix=None):
    """QuadratureAdjoint's post-reverse dG/dp: h-adaptive Gauss–Kronrod over
    the recorded λ dense output (the TPU formulation of quadgk,
    quadrature_adjoint.jl:536-633). Base partition: one GK(7,15) panel per
    recorded reverse step — the reverse solver's own adapted grid, which
    (a) contains every λ-jump time (data times and event times are reverse
    tstops, so no panel straddles a discontinuity) and (b) already
    concentrates nodes where the stiff integrand varies (a coarser
    data-segment seed under-resolves Robertson-class problems within the
    bounded refinement budget — regression-tested in test_stiff/test_dae).
    A budgeted worklist then bisects the interval with the largest embedded
    error until Σerr ≤ max(abstol, reltol·‖q‖), bounded by max_depth splits
    per interval. extra_p(yvec, t) -> (npf,) adds a continuous-cost ∂g/∂p
    integrand term."""
    xk15, wk15, wg7 = gauss_kronrod_01(7, dtype)

    def integrand(tj):
        lam_j = dense_eval(lam_dense, tj)
        yj = dense_eval(dense, tj)
        if lam_fix is not None:
            lam_j = lam_fix(yj, tj, lam_j)
        out = ravel_pytree(kern.vjp_p(yj, p, tj, lam_j))[0]
        if extra_p is not None:
            out = out + extra_p(yj, tj)
        return out

    def gk_panel(ta, tb):
        w_t = tb - ta  # negative (reverse orientation); 0 on padding rows
        vals = jax.vmap(lambda xj: integrand(ta + w_t * xj))(xk15)
        # forward-orientation integral over the panel: -(tb-ta)·Σ w·v
        est = -w_t * jnp.einsum("j,jk->k", wk15, vals)
        err = jnp.abs(w_t) * jnp.linalg.norm(
            jnp.einsum("j,jk->k", wk15 - wg7, vals)
        )
        return est, err

    grid = lam_dense.ts
    msub = grid.shape[0] - 1
    ests, errs = jax.vmap(
        lambda k: gk_panel(grid[k], grid[k + 1])
    )(jnp.arange(msub))
    q = jnp.sum(ests, axis=0) + q_init

    depth_cap = max(int(sensealg.max_depth), 0)
    R = int(min(4 * (2 ** depth_cap), 512)) if depth_cap > 0 else 0
    if npf == 0 or R == 0:
        return q

    tsd = grid.dtype
    a0 = jnp.concatenate([grid[:msub], jnp.zeros(R, tsd)])
    b0 = jnp.concatenate([grid[1:msub + 1], jnp.zeros(R, tsd)])
    err0 = jnp.concatenate([errs, jnp.zeros(R, errs.dtype)])
    dep0 = jnp.zeros(msub + R, jnp.int32).at[msub:].set(depth_cap)

    def _tol(qq):
        return jnp.maximum(
            sensealg.abstol, sensealg.reltol * jnp.linalg.norm(qq)
        )

    def cond_fn(st):
        _a, _b, err, dep, qq, _cnt, it = st
        refinable = jnp.where(dep < depth_cap, err, 0.0)
        return (
            (it < R)
            & (jnp.sum(err) > _tol(qq))
            & (jnp.max(refinable) > 0.0)
        )

    def body_fn(st):
        a, b, err, dep, qq, cnt, it = st
        i = jnp.argmax(jnp.where(dep < depth_cap, err, -1.0))
        ai, bi = a[i], b[i]
        tm = 0.5 * (ai + bi)
        e_par, _ = gk_panel(ai, bi)
        e_l, r_l = gk_panel(ai, tm)
        e_r, r_r = gk_panel(tm, bi)
        qq = qq + (e_l + e_r - e_par)
        d_new = dep[i] + 1
        a = a.at[i].set(ai).at[cnt].set(tm)
        b = b.at[i].set(tm).at[cnt].set(bi)
        err = err.at[i].set(r_l).at[cnt].set(r_r)
        dep = dep.at[i].set(d_new).at[cnt].set(d_new)
        return a, b, err, dep, qq, cnt + 1, it + 1

    st = jax.lax.while_loop(
        cond_fn, body_fn,
        (a0, b0, err0, dep0, q,
         jnp.asarray(msub, jnp.int32), jnp.asarray(0, jnp.int32)),
    )
    return st[4]


def _make_event_apply(kern, p, event_set, fwd_events, n, npf,
                      q_slice=None, u_snap_start=None, q_in_hc=False,
                      run_cost=None):
    """Reverse event-jump transform (reference: callback_tracking.jl reverse
    affect! :319-458 + ImplicitCorrection :15-58; Eq. 13 of arXiv:1905.10403):

        λ⁻ = (∂A/∂u)ᵀλ⁺ − ∇g·((∂A/∂u·f⁻ − f⁺)·λ⁺ + g_run⁻ − g_run⁺)/ġ
        dq += (∂A/∂p)ᵀλ⁺            (parameter-modifying events)

    Discrete callbacks skip the implicit-time correction (their firing time
    is grid-determined). For Backsolve, the trailing u-block is snapped to
    the recorded pre-event state (the reference's event-time checkpoint).

    run_cost (optional, the direct API's continuous cost g(uvec, t)):
    a running cost ∫ g dt has a MOVING-BOUNDARY term at each continuous
    event — the integrand jumps by g(u⁻) − g(u⁺) across the affect (and
    the integral simply STOPS at a terminal event: g⁺ = 0), so dG gains
    (g⁻ − g⁺)·dτ/d(·); folded into the same implicit-τ correction.
    """
    ev_ts, ev_upre, ev_idx, ev_count = fwd_events
    affect_p = event_set.affect_p
    cond = event_set.cond
    n_cont = event_set.n_cont

    def apply(i, t, z, hc):
        u_pre = ev_upre[i]
        j = ev_idx[i]
        lam = jax.lax.dynamic_slice(z, (0,), (n,))
        _, pull = jax.vjp(lambda uu, pp: affect_p(uu, pp, t, j), u_pre, p)
        ubar, pbar = pull(lam)
        pbar_flat = ravel_pytree(pbar)[0]

        if n_cont > 0:
            def with_corr(lam_base):
                f_m = kern.fvec(u_pre, p, t)
                u_post = affect_p(u_pre, p, t, j)
                f_p = kern.fvec(u_post, p, t)
                if event_set.terminals is not None:
                    # Terminal continuous event: the trajectory STOPS at τ,
                    # so downstream outputs (u_final, held saveat rows) are
                    # A(u(τ)) with NO post-event evolution — the implicit-τ
                    # correction pairs against f⁺ = 0, not f(u_post):
                    # du_final/dp = A_u(u_p + f⁻ dτ/dp) + A_p,
                    # dτ/dp = -g_u u_p / ġ.
                    f_p = jnp.where(event_set.terminals[j],
                                    jnp.zeros_like(f_p), f_p)
                _, Af_m = jax.jvp(
                    lambda uu: affect_p(uu, p, t, j), (u_pre,), (f_m,)
                )
                jc = jnp.minimum(j, n_cont - 1)
                gj = lambda uu, tt: cond(uu, tt)[jc]
                gu = jax.grad(gj, argnums=0)(u_pre, t)
                gt = jax.grad(gj, argnums=1)(u_pre, t)
                gdot = gu @ f_m + gt
                term = (Af_m - f_p) @ lam
                if run_cost is not None:
                    g_m = jnp.asarray(run_cost(u_pre, t))
                    g_pp = jnp.asarray(run_cost(u_post, t))
                    if event_set.terminals is not None:
                        g_pp = jnp.where(event_set.terminals[j],
                                         jnp.zeros_like(g_pp), g_pp)
                    term = term + (g_m - g_pp)
                corr = jnp.where(jnp.abs(gdot) > 1e-300, term / gdot, 0.0)
                return lam_base - gu * corr

            lam_new = jax.lax.cond(
                j < n_cont, with_corr, lambda lb: lb, ubar
            )
        else:
            lam_new = ubar

        z = jax.lax.dynamic_update_slice(z, lam_new, (0,))
        if q_slice is not None and npf > 0:
            q_cur = jax.lax.dynamic_slice(z, (q_slice,), (npf,))
            z = jax.lax.dynamic_update_slice(z, q_cur + pbar_flat, (q_slice,))
        if u_snap_start is not None:
            z = jax.lax.dynamic_update_slice(z, u_pre, (u_snap_start,))
        if q_in_hc:
            # hc is the q accumulator, or (q, quadrature_error) for the
            # GaussKronrod hook carry.
            if isinstance(hc, tuple):
                hc = (hc[0] + pbar_flat,) + hc[1:]
            else:
                hc = hc + pbar_flat
        return z, hc

    return apply


def _event_kwargs(events, event_set, event_apply):
    """reverse_joined_solve kwargs applying the recorded forward events
    (single source for the record layout + same-time unroll bound).
    events: the (ev_ts, ev_upre, ev_idx, ev_count) record tuple."""
    return dict(
        event_times=events[0], event_count=events[3],
        event_unroll=max(3, event_set.n_cont + event_set.n_disc),
        event_apply=event_apply,
    )


def _make_dae_event_apply(kern, p, event_set, fwd_events, n, npf, M_fwd,
                          dtype, q_slice=None, q_in_hc=False, run_cost=None):
    """Event-jump transform composed with the semi-explicit index-1 DAE
    cotangent projection (round-2 VERDICT missing #5; reference composes
    callback_tracking.jl's reverse affect with the algebraic projection of
    adjoint_common.jl:790-817).

    The adjoint state is first mapped to its raw-cotangent representative
    ν⁺ = (M_ddᵀλ⁺_d on the differential rows, 0 on the algebraic rows) —
    the canonical dL/du with slaved δu_a — then pulled back through the
    affect, v = (∂A/∂u)ᵀν⁺ (+ the implicit-τ correction for continuous
    conditions, evaluated with the DAE-consistent u̇ rather than f), and
    finally routed through the constraint exactly like a save-time jump:

        ŵ    = J_aaᵀ \\ v_a
        λ⁻_d = M_ddᵀ \\ (v_d − (Jᵀŵ)_d) ;  λ⁻_a = 0
        dq  += (∂A/∂p)ᵀν⁺ − f_pᵀ ŵ

    (an identity affect therefore maps λ⁺ to itself). J at the PRE-event
    state (the reverse pass continues into t < τ); λ_a is re-consistified
    pointwise by the stiffly-accurate reverse stepper.
    """
    import numpy as _onp

    Mnp = _onp.asarray(M_fwd, dtype=float)
    a_idx, d_idx = _semi_explicit_split(Mnp)
    Mdd = jnp.asarray(Mnp[_onp.ix_(d_idx, d_idx)], dtype)
    MddT = Mdd.T

    ev_ts, ev_upre, ev_idx, ev_count = fwd_events
    affect_p = event_set.affect_p
    cond = event_set.cond
    n_cont = event_set.n_cont

    def udot(u, t):
        # DAE-consistent u̇: M_dd u̇_d = f_d ; J_aa u̇_a = −J_ad u̇_d − ∂f_a/∂t
        fval = kern.fvec(u, p, t)
        J = jax.jacfwd(lambda uu: kern.fvec(uu, p, t))(u)
        ft = jax.jacfwd(lambda tt: kern.fvec(u, p, tt))(jnp.asarray(t))
        ud_d = jnp.linalg.solve(Mdd, fval[d_idx])
        ud_a = jnp.linalg.solve(
            J[a_idx][:, a_idx], -(J[a_idx][:, d_idx] @ ud_d) - ft[a_idx]
        )
        return jnp.zeros_like(u).at[d_idx].set(ud_d).at[a_idx].set(ud_a)

    def apply(i, t, z, hc):
        u_pre = ev_upre[i]
        j = ev_idx[i]
        lam = jax.lax.dynamic_slice(z, (0,), (n,))
        nu = jnp.zeros_like(lam).at[d_idx].set(MddT @ lam[d_idx])
        _, pull = jax.vjp(lambda uu, pp: affect_p(uu, pp, t, j), u_pre, p)
        ubar, pbar = pull(nu)
        pbar_flat = ravel_pytree(pbar)[0]

        if n_cont > 0:
            def with_corr(lam_base):
                ud_m = udot(u_pre, t)
                u_post = affect_p(u_pre, p, t, j)
                ud_p = udot(u_post, t)
                _, Aud_m = jax.jvp(
                    lambda uu: affect_p(uu, p, t, j), (u_pre,), (ud_m,)
                )
                jc = jnp.minimum(j, n_cont - 1)
                gj = lambda uu, tt: cond(uu, tt)[jc]
                gu = jax.grad(gj, argnums=0)(u_pre, t)
                gt = jax.grad(gj, argnums=1)(u_pre, t)
                gdot = gu @ ud_m + gt
                term = (Aud_m - ud_p) @ nu
                if run_cost is not None:
                    g_m = jnp.asarray(run_cost(u_pre, t))
                    g_pp = jnp.asarray(run_cost(u_post, t))
                    if event_set.terminals is not None:
                        g_pp = jnp.where(event_set.terminals[j],
                                         jnp.zeros_like(g_pp), g_pp)
                    term = term + (g_m - g_pp)
                corr = jnp.where(jnp.abs(gdot) > 1e-300, term / gdot, 0.0)
                return lam_base - gu * corr

            v = jax.lax.cond(j < n_cont, with_corr, lambda lb: lb, ubar)
        else:
            v = ubar

        Jpre = jax.jacfwd(lambda uu: kern.fvec(uu, p, t))(u_pre)
        w = jnp.linalg.solve(Jpre[a_idx][:, a_idx].T, v[a_idx])
        cot = jnp.zeros_like(v).at[a_idx].set(w)
        _, ubar2, pbar2 = kern.f_and_vjp(u_pre, p, t, cot)
        lam_d = jnp.linalg.solve(MddT, (v - ubar2)[d_idx])
        lam_new = jnp.zeros_like(v).at[d_idx].set(lam_d)
        dq = pbar_flat - ravel_pytree(pbar2)[0]

        z = jax.lax.dynamic_update_slice(z, lam_new, (0,))
        if q_slice is not None and npf > 0:
            q_cur = jax.lax.dynamic_slice(z, (q_slice,), (npf,))
            z = jax.lax.dynamic_update_slice(z, q_cur + dq, (q_slice,))
        if q_in_hc:
            if isinstance(hc, tuple):
                hc = (hc[0] + dq,) + hc[1:]
            else:
                hc = hc + dq
        return z, hc

    return apply


def make_ode_solve_fn(f, solver, sensealg, opts: SolveOptions, t0, t1, *,
                      user_jac=None, user_vjp=None, user_paramjac=None,
                      bwd_solver=None, symbolic_zeros: bool = True):
    """Build `fn(u0_tree, p_tree, saveat) -> (ys_tree, AuxOut)` with the
    custom_vjp rule chosen by `sensealg`.

    f: (u, p, t) -> du over pytrees. solver: forward stepper. bwd_solver:
    stepper for the adjoint pass (defaults to `solver`).

    symbolic_zeros=False builds the rule WITHOUT defvjp(symbolic_zeros=True)
    — the fallback for contexts where JAX does not support it (shard_map,
    as of jax 0.7). There, unused-output cotangents arrive as materialized
    zeros, so the dense-output/event-record consumption checks are
    statically undecidable: u_final and saveat cotangents still work
    (zero additions are exact), but gradients THROUGH sol(t) dense output
    are not available inside shard_map (use ForwardDiffSensitivity or
    DirectAdjoint there).
    """
    bwd_stepper = bwd_solver or solver
    vjp_choice = getattr(sensealg, "autojacvec", None)

    from ..solvers.explicit import ExplicitRK as _ERK

    def _pinned_on(event_set, M_fwd):
        """Pinned-reverse eligibility (see reverse_pinned_solve): explicit
        -RK reverse stepper, no events (event rows need the in-loop matcher
        of the adaptive driver), no DAE mass structure.

        Auto (None) enables pinning for InterpolatingAdjoint only — its
        joined [λ; q] stage pullbacks cost the same per step either way, so
        riding the (fewer) forward intervals wins ~1.2x measured on the v5e.
        The λ-only quadrature designs (Gauss/GK) pay their per-accepted-step
        hook once per interval, and the forward grid is typically DENSER
        than the reverse controller's own grid near saveat clusters — pinned
        is a measured 0.9x there, so it stays opt-in."""
        want = getattr(sensealg, "pinned_reverse", None)
        if want is False:
            return False
        if opts.unroll:
            # unrolled mode: the adaptive masked-scan reverse IS the fast
            # path (no loop HLO at all); pinning would reintroduce a scan
            return False
        eligible = (isinstance(bwd_stepper, _ERK) and M_fwd is None
                    and event_set is None)
        if want is True and not eligible:
            raise NotImplementedError(
                "pinned_reverse=True needs an explicit-RK reverse stepper "
                "and no events/DAE mass structure; leave it None (auto) or "
                "set False"
            )
        if want is None:
            return eligible and type(sensealg) is InterpolatingAdjoint
        return eligible

    def _make_interval_rhs_lam(kern, p, dense, n):
        def make(i):
            ta_, tb_ = dense.ts[i], dense.ts[i + 1]
            y0_, y1_ = dense.ys[i], dense.ys[i + 1]
            f0_, f1_ = dense.fs[i], dense.fs[i + 1]

            def rhs(lam, t):
                y = hermite_eval(t, ta_, tb_, y0_, f0_, y1_, f1_)
                return -kern.vjp_u(y, p, t, lam)

            return rhs
        return make

    def _make_interval_rhs_joined(kern, p, dense, n):
        def make(i):
            ta_, tb_ = dense.ts[i], dense.ts[i + 1]
            y0_, y1_ = dense.ys[i], dense.ys[i + 1]
            f0_, f1_ = dense.fs[i], dense.fs[i + 1]

            def rhs(z, t):
                lam = z[:n]
                y = hermite_eval(t, ta_, tb_, y0_, f0_, y1_, f1_)
                _, ubar, pbar = kern.f_and_vjp(y, p, t, lam)
                return jnp.concatenate([-ubar, -ravel_pytree(pbar)[0]])

            return rhs
        return make

    gauss_ckpt = isinstance(
        sensealg, (GaussAdjoint, GaussKronrodAdjoint)
    ) and getattr(sensealg, "checkpointing", False)
    needs_dense = (
        isinstance(sensealg, QuadratureAdjoint)
        or (isinstance(sensealg, (GaussAdjoint, GaussKronrodAdjoint)) and not gauss_ckpt)
        or (isinstance(sensealg, InterpolatingAdjoint) and not sensealg.checkpointing)
    )
    store_dense = bool(needs_dense or opts.dense)

    adj_rtol = opts.adj_rtol if opts.adj_rtol is not None else opts.rtol
    adj_atol = opts.adj_atol if opts.adj_atol is not None else opts.atol
    adj_max_steps = opts.adj_max_steps if opts.adj_max_steps is not None else opts.max_steps

    def _kern(u0, p):
        kw = {}
        if vjp_choice is not None:
            kw["vjp_choice"] = vjp_choice
        return make_vjp_kernels(
            f, u0, p, user_jac=user_jac, user_vjp=user_vjp,
            user_paramjac=user_paramjac, **kw
        )

    def _forward(u0, p, saveat):
        u0vec, unravel_u = ravel_pytree(u0)
        kern = _kern(u0, p)
        fvec = lambda uv, t: kern.fvec(uv, p, t)
        if opts.callback is not None:
            from ..callbacks import build_event_set

            event_set = build_event_set(
                opts.callback, p, unravel_u, opts.max_events
            )
        else:
            event_set = None
        fwd, _ = forward_saveat_solve(
            solver, fvec, u0vec, t0, t1, saveat,
            rtol=opts.rtol, atol=opts.atol, dt0=opts.dt0,
            max_steps=opts.max_steps, tstops=opts.tstops,
            store_dense=store_dense,
            event_set=event_set,
            dtmax=opts.dtmax,
            fixed_dt=opts.fixed_dt,
            unroll_scan=opts.unroll,
        )
        return fwd, unravel_u, kern, event_set

    # ------------------------------------------------------------------
    # primal
    # ------------------------------------------------------------------

    def _primal(u0, p, saveat):
        fwd, unravel_u, _, _ = _forward(u0, p, saveat)
        ys = jax.vmap(unravel_u)(fwd.ys_save)
        aux = AuxOut(
            dense=fwd.dense if store_dense else None,
            t_final=fwd.t_final,
            u_final=fwd.u_final,
            stats=fwd.stats,
            events=fwd.events,
        )
        return ys, aux

    solve_fn = jax.custom_vjp(_primal)

    def _fwd_rule(u0, p, saveat):
        # symbolic_zeros=True wraps each primal leaf in CustomVJPPrimal
        u0 = _unwrap_primal(u0)
        p = _unwrap_primal(p)
        saveat = _unwrap_primal(saveat)
        fwd, unravel_u, _, _ = _forward(u0, p, saveat)
        ys = jax.vmap(unravel_u)(fwd.ys_save)
        aux = AuxOut(
            dense=fwd.dense if store_dense else None,
            t_final=fwd.t_final,
            u_final=fwd.u_final,
            stats=fwd.stats,
            events=fwd.events,
        )
        return (ys, aux), (u0, p, saveat, fwd)

    # ------------------------------------------------------------------
    # backward rules, one per sensealg family
    # ------------------------------------------------------------------

    def _common_bwd_setup(res, cot):
        u0, p, saveat, fwd = res
        d_ys, d_aux = cot
        u0vec, unravel_u = ravel_pytree(u0)
        pflat, unravel_p = ravel_pytree(p)
        kern = _kern(u0, p)
        n = u0vec.shape[0]
        npf = pflat.shape[0]
        saveat_t = jnp.asarray(saveat, u0vec.dtype)

        have_d_ys = _has_cotangent(d_ys)
        if have_d_ys:
            lam_jumps = _ravel_rows(_materialize_tree(d_ys))
        else:
            lam_jumps = jnp.zeros((saveat_t.shape[0], n), u0vec.dtype)

        # dL/dt_i = Δ_i · f(u(t_i), p, t_i): exact save-time gradient (the
        # reference reaches it via convert_tspan Duals,
        # src/concrete_solve.jl:1351-1364). DAE states keep the zero (du_a/dt
        # needs implicit differentiation of the constraint — documented gap).
        is_dae = getattr(solver, "mass_matrix", None) is not None
        if have_d_ys and not is_dae:
            d_saveat = jax.vmap(
                lambda y, t_, dl: jnp.real(jnp.sum(dl * kern.fvec(y, p, t_)))
            )(fwd.ys_save, saveat_t.real.astype(
                jnp.promote_types(u0vec.real.dtype, jnp.float32)
            ), lam_jumps).astype(saveat.dtype)
            # save times past a terminal stop hold u(t_final): the held
            # output doesn't move with its nominal save time — dL/dt_i = 0
            ttype = jnp.promote_types(u0vec.real.dtype, jnp.float32)
            tf = jnp.asarray(fwd.t_final, ttype)
            tol_r = 64.0 * jnp.finfo(ttype).eps * jnp.maximum(
                jnp.abs(tf), 1.0
            )
            sv_r = saveat_t.real.astype(ttype)
            tdir_r = jnp.where(jnp.asarray(t1, ttype)
                               >= jnp.asarray(t0, ttype), 1.0, -1.0)
            reached = (sv_r - tf) * tdir_r <= tol_r
            d_saveat = jnp.where(reached, d_saveat, 0.0)
        else:
            d_saveat = jnp.zeros_like(saveat)

        times, jumps = _extend_times(t0, t1, saveat_t, lam_jumps)

        # cotangent on sol.u_final: a λ jump at t1 (u_final IS the flat
        # state there) — previously silently dropped (round-2 VERDICT #1).
        d_uf = d_aux.u_final
        if not _is_symzero(d_uf):
            jumps = jumps.at[-1].add(jnp.asarray(d_uf, jumps.dtype))

        if symbolic_zeros and _has_cotangent(d_aux.events):
            raise NotImplementedError(
                "gradients through sol.events (raw event records) are not "
                "supported; consume sol.ys / sol(t) / sol.u_final instead"
            )

        if opts.callback is not None:
            from ..callbacks import build_event_set

            event_set = build_event_set(opts.callback, p, unravel_u,
                                        opts.max_events)
        else:
            event_set = None

        # Backsolve snap rows aligned with `times`
        snap_vals = jnp.concatenate(
            [u0vec[None], fwd.ys_save, fwd.u_final[None]], axis=0
        )

        q_extra = jnp.zeros(npf, u0vec.dtype)
        jump_unroll = 3

        dd = d_aux.dense
        if (symbolic_zeros and dd is not None and fwd.dense is not None
                and _has_cotangent(dd)):
            # Cotangents on the dense interpolant (sol(t) consumption): each
            # dense node u_k is an output at time t_k — inject a λ jump
            # there; node slopes f_k = f(u_k, p, t_k) contribute f_uᵀΔf to
            # the jump and f_pᵀΔf directly to dp. Node *times* are not
            # differentiated: the realized step grid is frozen
            # framework-wide (stop_gradient on the controller);
            # ForwardDiffSensitivity differentiates the full discrete
            # program when grid sensitivity matters. Reference behavior:
            # the rrule backpass consumes Δ on interpolated outputs
            # (src/concrete_solve.jl:713-770).
            is_ckpt = gauss_ckpt or (
                isinstance(sensealg, InterpolatingAdjoint)
                and sensealg.checkpointing
            )
            if is_ckpt:
                raise NotImplementedError(
                    "gradients through sol(t) (dense output) are not "
                    "supported with checkpointing=True; use the dense "
                    "(non-checkpointed) variant or ForwardDiffSensitivity"
                )
            if is_dae:
                raise NotImplementedError(
                    "gradients through sol(t) are not supported for DAE "
                    "(singular-mass) adjoints; use ForwardDiffSensitivity"
                )
            if event_set is not None:
                raise NotImplementedError(
                    "gradients through sol(t) combined with callbacks are "
                    "not supported by the continuous adjoints (jump/event "
                    "composition order at coincident times); use "
                    "ForwardDiffSensitivity or DirectAdjoint"
                )
            if float(t1) < float(t0):
                raise NotImplementedError(
                    "gradients through sol(t) need a forward-time solve "
                    "(t1 >= t0)"
                )
            K = fwd.dense.ts.shape[0]
            # merge in the TIME dtype (>= f32): sub-f32 states must not
            # round the node times — the pinned reverse matches jumps
            # against the TRUE dense.ts values (a bf16-rounded node time is
            # ~1e-3 off and silently drops every dense-node jump)
            tdt = jnp.promote_types(times.dtype, jnp.float32)
            times = times.astype(tdt)
            valid = jnp.arange(K) <= fwd.dense.n_steps
            d_nys = jnp.where(valid[:, None], _materialize(dd.ys), 0.0)
            node_states = fwd.dense.ys
            node_ts_real = jnp.asarray(fwd.dense.ts, tdt)
            # padding rows all hold t_final — remap them to sentinels far
            # below t0 so they can never match (or stall) a reverse stop
            span = jnp.maximum(
                jnp.abs(jnp.asarray(t1, tdt) - jnp.asarray(t0, tdt)), 1.0
            )
            sentinel = (jnp.asarray(t0, tdt)
                        - (2.0 + jnp.arange(K, dtype=tdt)) * span)
            node_ts = jnp.where(valid, node_ts_real, sentinel)
            if not _is_symzero(dd.fs):
                d_nfs = jnp.where(valid[:, None], dd.fs, 0.0)
                # the stored slopes are in the state dtype, but f's OUTPUT
                # dtype may promote (bf16 states x f32 params): the vjp
                # cotangent must match f's output dtype
                f_dt = jax.eval_shape(
                    lambda yy: kern.fvec(yy, p, node_ts_real[0]),
                    node_states[0],
                ).dtype
                d_nfs = d_nfs.astype(f_dt)

                def node_jump(tk, yk, dyk, dfk):
                    _, ubar, pbar = kern.f_and_vjp(yk, p, tk, dfk)
                    return dyk + ubar, ravel_pytree(pbar)[0]

                njumps, nq = jax.vmap(node_jump)(
                    node_ts_real, node_states, d_nys, d_nfs
                )
                q_extra = q_extra + jnp.sum(nq, axis=0)
            else:
                njumps = d_nys
            all_t = jnp.concatenate([node_ts, times])
            all_j = jnp.concatenate([njumps.astype(jumps.dtype), jumps])
            all_s = jnp.concatenate(
                [node_states.astype(snap_vals.dtype), snap_vals]
            )
            order = jnp.argsort(all_t, stable=True)
            times, jumps, snap_vals = all_t[order], all_j[order], all_s[order]
            # every save time is also a step node → one extra coincident row
            jump_unroll = 4

        return (u0, p, saveat, fwd, u0vec, unravel_u, unravel_p, kern, n,
                npf, times, jumps, event_set, d_saveat, q_extra, snap_vals,
                jump_unroll)

    def _returns(unravel_u, unravel_p, lam0, qflat, saveat, retcode=None,
                 primals=None, d_saveat=None):
        if d_saveat is None:
            d_saveat = jnp.zeros_like(saveat)
        if retcode is not None:
            # A truncated forward solve (MaxIters/DtMin) makes the adjoint
            # silently wrong — poison the gradients so training loops notice
            # (the reference surfaces this via retcode checks + warnings;
            # here NaNs are the jit-compatible alarm).
            bad = retcode != 0
            if opts.verbose:
                # reverse-pass failures never reach the solve-time retcode
                # (they happen at gradient time), so the notice must live in
                # the bwd rule itself
                jax.lax.cond(
                    bad,
                    lambda: jax.debug.print(
                        "adjoint: non-success retcode {} in the forward or "
                        "reverse solve (1=MaxIters, 2=DtMin, 3=Backsolve "
                        "u-reconstruction drift — see BacksolveAdjoint."
                        "recon_guard); gradients are "
                        "NaN-poisoned. For stiff problems try looser "
                        "adj_rtol/adj_atol or a larger adj_max_steps "
                        "(the reverse pass often needs ~2x the forward "
                        "steps).", retcode
                    ),
                    lambda: None,
                )
            lam0 = jnp.where(bad, jnp.full_like(lam0, jnp.nan), lam0)
            qflat = jnp.where(bad, jnp.full_like(qflat, jnp.nan), qflat)
            d_saveat = jnp.where(bad, jnp.full_like(d_saveat, jnp.nan),
                                 d_saveat)
        du0 = unravel_u(lam0)
        dp = unravel_p(qflat)
        if primals is not None:
            du0, dp = match_cotangents(du0, dp, primals)
        return du0, dp, d_saveat

    # -- InterpolatingAdjoint (dense) / checkpointing variant ------------

    def _bwd_interpolating(res, cot):
        (u0, p, saveat, fwd, u0vec, unravel_u, unravel_p, kern,
         n, npf, times, jumps, event_set, d_saveat, q_extra, snap_vals,
         jump_unroll) = _common_bwd_setup(res, cot)

        if isinstance(sensealg, InterpolatingAdjoint) and not sensealg.checkpointing:
            dense = fwd.dense

            def aug_rhs(z, t):
                lam = z[:n]
                y = dense_eval(dense, t)
                _, ubar, pbar = kern.f_and_vjp(y, p, t, lam)
                return jnp.concatenate([-ubar, -ravel_pytree(pbar)[0]])

            def _aug_jac(z, t):
                # ∂(rhs)/∂z over [λ; q]: [[-Jᵀ, 0], [-J_pᵀ, 0]] — q never
                # feeds back (analytic adjoint Jacobian, see the λ-only
                # branches; reference quadrature_adjoint.jl:170-192)
                y = dense_eval(dense, t)
                pflat_, unr_p = ravel_pytree(p)
                Ju = kern.jac_u(y, p, t)
                Jp = jax.jacrev(
                    lambda pf: kern.fvec(y, unr_p(pf), t))(pflat_)
                left = jnp.concatenate([-Ju.T, -Jp.T], axis=0)
                return jnp.concatenate(
                    [left, jnp.zeros((n + npf, npf), left.dtype)], axis=1)

            aug_rhs.jac = _aug_jac

            M_fwd = getattr(solver, "mass_matrix", None)
            if M_fwd is not None:
                # Continuous adjoint for semi-explicit index-1 DAEs (general
                # — possibly non-diagonal — differential mass block,
                # reference adjoint_common.jl:110-139, :790-817 /
                # Cao-Li-Petzold 2003): the adjoint DAE
                #     Mᵀ λ' = -Jᵀ λ,   q' = -f_pᵀ λ
                # is integrated backward by the SAME mass-matrix SDIRK with
                # the augmented mass blockdiag(Mᵀ, I); stiffly-accurate
                # all-implicit stages enforce the algebraic adjoint
                # constraint 0 = (Jᵀλ)_alg pointwise. Discrete loss
                # cotangents v at save times are projected onto the
                # differential adjoint (the jump lives on μ = Mᵀλ):
                #     ŵ    = J_aaᵀ \ v_a    (embedded in alg rows)
                #     λ_d += M_ddᵀ \ (v_d - (Jᵀ ŵ)_d) ,  λ_a := 0
                #     dp  += -f_pᵀ ŵ
                # which routes cost on algebraic components through the
                # implicit function u_a(u_d, p) defined by 0 = f_a.
                alg_j, du0_map, lamjs, qjs = _dae_project_jumps(
                    M_fwd, kern, p, dense, times, jumps, u0vec.dtype
                )
                jumps_aug = jnp.concatenate([lamjs, qjs], axis=1)
                dae_ev_kwargs = {}
                if event_set is not None:
                    dae_ev_kwargs = _event_kwargs(
                        fwd.events, event_set,
                        _make_dae_event_apply(
                            kern, p, event_set, fwd.events, n, npf, M_fwd,
                            u0vec.dtype, q_slice=n,
                        ),
                        )

                import numpy as _onp

                M_aug = _onp.eye(n + npf)
                M_aug[:n, :n] = _onp.asarray(M_fwd, dtype=float).T
                dae_stepper = _dae_reverse_stepper(
                    bwd_solver, bwd_stepper
                ).with_mass_matrix(jnp.asarray(M_aug, u0vec.dtype))
                z0 = jnp.zeros(n + npf, u0vec.dtype)
                wts = jnp.concatenate(
                    [jnp.ones(n, u0vec.dtype), jnp.zeros(npf, u0vec.dtype)]
                )
                z, _, worst, _ = reverse_joined_solve(
                    dae_stepper, aug_rhs, times, jumps_aug, z0, n + npf,
                    rtol=adj_rtol, atol=adj_atol,
                    max_steps=adj_max_steps, dt0=opts.dt0,
                    err_weights=wts, t_span=(t0, fwd.t_final),
                    **dae_ev_kwargs,
                )
                # dG/du0 pairs through μ = Mᵀλ; algebraic initial values are
                # slaved to the constraint (consistent-initialization
                # adjoints, concrete_solve.jl:611-687, are future work) so
                # their cotangent is 0 by convention.
                du0vec = du0_map(z[:n])
                return _returns(unravel_u, unravel_p, du0vec, z[n:], saveat,
                                jnp.maximum(_rc_ok(fwd.stats.retcode), worst),
                                primals=(u0, p), d_saveat=d_saveat)

            z0 = jnp.zeros(n + npf, u0vec.dtype)
            # q rows are pure quadrature (no feedback into λ): exclude them
            # from error control or their atol-relative error forces
            # microscopic steps on stiff problems.
            wts = jnp.concatenate(
                [jnp.ones(n, u0vec.dtype), jnp.zeros(npf, u0vec.dtype)]
            )
            if _pinned_on(event_set, None):
                z, _, worst, _ = reverse_pinned_solve(
                    bwd_stepper, _make_interval_rhs_joined(kern, p, dense, n),
                    dense, times, jumps, z0, n,
                    rtol=adj_rtol, atol=adj_atol,
                    err_weights=wts, jump_unroll=jump_unroll,
                )
                if (getattr(sensealg, "pinned_reverse", None) is None
                        and getattr(sensealg, "pinned_fallback", True)):
                    # AUTO pinning must never fail where the adaptive
                    # reverse succeeds: on stiff problems the adjoint
                    # legitimately needs finer steps than the forward grid
                    # (round-4 regression: 2-D Brusselator NaN-poisoned).
                    # When the pinned pass flags its error guard, rerun the
                    # adaptive joined reverse inside lax.cond — the stiff
                    # case pays one wasted pinned sweep, the common case
                    # keeps the measured 1.23× pinned win. Explicit
                    # pinned_reverse=True keeps the loud NaN-poison
                    # (the user asked for exactly that design).
                    # COST under vmap: cond lowers to select, so BOTH
                    # passes run per batch element — ensemble users set
                    # pinned_fallback=False to keep the single pass.
                    def _fallback(_):
                        za, _hc, wa, _d = reverse_joined_solve(
                            bwd_stepper, aug_rhs, times, jumps, z0, n,
                            rtol=adj_rtol, atol=adj_atol,
                            max_steps=adj_max_steps,
                            err_weights=wts, t_span=(t0, fwd.t_final),
                            jump_unroll=jump_unroll,
                        )
                        return za, wa

                    z, worst = jax.lax.cond(
                        worst != 0, _fallback,
                        lambda _: (z, jnp.asarray(0, jnp.int32)), None
                    )
                return _returns(unravel_u, unravel_p, z[:n], z[n:] + q_extra,
                                saveat,
                                jnp.maximum(_rc_ok(fwd.stats.retcode), worst),
                                primals=(u0, p), d_saveat=d_saveat)
            ev_kwargs = {}
            if event_set is not None:
                ev_kwargs = _event_kwargs(
                    fwd.events, event_set,
                    _make_event_apply(
                        kern, p, event_set, fwd.events, n, npf, q_slice=n
                    ),
                    )
            z, _, worst, _ = reverse_joined_solve(
                bwd_stepper, aug_rhs, times, jumps, z0, n,
                rtol=adj_rtol, atol=adj_atol,
                max_steps=adj_max_steps,
                err_weights=wts, t_span=(t0, fwd.t_final), jump_unroll=jump_unroll,
                unroll_scan=opts.unroll,
                **ev_kwargs,
            )
            return _returns(unravel_u, unravel_p, z[:n], z[n:] + q_extra,
                            saveat,
                            jnp.maximum(_rc_ok(fwd.stats.retcode), worst),
                            primals=(u0, p), d_saveat=d_saveat)

        # Checkpointed: re-solve each inter-save interval forward from the
        # stored save values, then run the local adjoint over the fresh local
        # interpolant (reference cursor logic interpolating_adjoint.jl:206-278
        # becomes a nested solve inside the reverse scan).
        #
        # Events: the local re-solve runs WITH the event machinery so the
        # interval's trajectory re-fires its events exactly (for p-modifying
        # events the lifted state stores p at each checkpoint, so pre-event p
        # restoration — the reference's reset_p,
        # interpolating_adjoint.jl:748-823 — falls out of the checkpoint
        # values themselves); the reverse leg lands on each recorded event
        # time inside the interval and applies the event-jump VJP there.
        ckpt_vals = snap_vals  # aligned with `times` (no dense merge here)
        fvec = lambda uv, t: kern.fvec(uv, p, t)
        if opts.fixed_dt is not None:
            # Fixed-grid forward: one inter-save interval can contain the
            # whole grid's steps (saveat=endpoints), and opts.max_steps was
            # already shrunk to ~n_grid in solve(); the //8 heuristic would
            # MAXITERS-poison any interval longer than max_steps//8 fixed
            # steps with no way for the caller to raise the budget. Size the
            # local re-solve to the full grid budget — only one interval's
            # buffer is live at a time inside the reverse scan.
            seg_max_steps = opts.max_steps
        else:
            seg_max_steps = max(opts.max_steps // 8, 64)

        if event_set is not None:
            ev_ts_all, _ev_upre, _ev_idx, ev_count = fwd.events
            event_apply = _make_event_apply(
                kern, p, event_set, fwd.events, n, npf, q_slice=n
            )
            tdt = times.dtype
            eps_t = jnp.finfo(tdt).eps

            ev_unroll = max(3, event_set.n_cont + event_set.n_disc)

            def _match_events(t, zz, ke):
                """Apply all same-time recorded events at time t (the
                forward engine composes at most one firing per callback
                per instant, so n_cont + n_disc bounds the coincidences)."""
                tol = 64.0 * eps_t * jnp.maximum(jnp.abs(t), 1.0)
                fired = jnp.asarray(False)
                for _ in range(ev_unroll):
                    kc = jnp.maximum(ke, 0)
                    match = (ke >= 0) & (jnp.abs(ev_ts_all[kc] - t) <= tol)

                    def _ap(args, kc=kc):
                        z_, _ = event_apply(kc, t, args[0], None)
                        return (z_, args[1])

                    zz, _ = jax.lax.cond(match, _ap, lambda a: a, (zz, None))
                    ke = ke - match.astype(ke.dtype)
                    fired = fired | match
                return zz, ke, fired

            ke_init = jnp.asarray(ev_count, jnp.int32) - 1
        else:
            ke_init = jnp.asarray(-1, jnp.int32)

        # Terminal stops (retcode Terminated at the dynamic t_final < t1):
        # intervals entirely at/after t_final are FROZEN — outputs there
        # hold u(t_final), so their cotangents are pure λ jumps with no
        # dynamics — and the boundary interval clamps its top to t_final
        # (the reference's Terminated tspan shrink,
        # interpolating_adjoint.jl:347-353, applied per checkpoint
        # interval). For a normal solve t_final == t1 and nothing changes.
        ttdt = times.dtype
        tf_r = jnp.asarray(fwd.t_final, ttdt)
        tdir_r = jnp.where(
            jnp.asarray(t1, ttdt) >= jnp.asarray(t0, ttdt),
            jnp.asarray(1.0, ttdt), jnp.asarray(-1.0, ttdt),
        )
        tol_tf = 64.0 * jnp.finfo(ttdt).eps * jnp.maximum(jnp.abs(tf_r), 1.0)

        def body(carry, i):
            z, worst, ke = carry
            z = z.at[:n].add(jumps[i])
            t_hi = times[i]
            t_lo = times[i - 1]
            frozen = (t_lo - tf_r) * tdir_r >= -tol_tf
            t_hi_c = jnp.where((t_hi - tf_r) * tdir_r > 0, tf_r, t_hi)

            def live(args):
                z, ke, worst = args
                if event_set is not None:
                    # boundary cases: an event recorded exactly at this save
                    # time, or the terminal event at t_final
                    z, ke, _ = _match_events(t_hi_c, z, ke)
                local = integrate(
                    solver, fvec, t_lo, t_hi_c, ckpt_vals[i - 1],
                    rtol=opts.rtol, atol=opts.atol, max_steps=seg_max_steps,
                    store_dense=True, event_set=event_set,
                    fixed_dt=opts.fixed_dt,
                )

                def aug_rhs(zz, t):
                    lam = zz[:n]
                    y = dense_eval(local.dense, t)
                    _, ubar, pbar = kern.f_and_vjp(y, p, t, lam)
                    return jnp.concatenate([-ubar, -ravel_pytree(pbar)[0]])

                wts = jnp.concatenate(
                    [jnp.ones(n, u0vec.dtype), jnp.zeros(npf, u0vec.dtype)]
                )
                if event_set is not None:
                    def stop_tr(t, zz, kec):
                        zz, kec, fired = _match_events(t, zz, kec)
                        return zz, kec, fired

                    resr = integrate(
                        bwd_stepper, aug_rhs, t_hi_c, t_lo, z,
                        rtol=adj_rtol, atol=adj_atol,
                        max_steps=adj_max_steps,
                        store_dense=False, err_weights=wts,
                        tstops=ev_ts_all, stop_transform=stop_tr,
                        hook_carry=ke,
                    )
                    ke = resr.hook_carry
                else:
                    resr = integrate(
                        bwd_stepper, aug_rhs, t_hi_c, t_lo, z,
                        rtol=adj_rtol, atol=adj_atol,
                        max_steps=adj_max_steps,
                        store_dense=False, err_weights=wts,
                    )
                # the local re-solve of an interval ending at a terminal
                # stop legitimately reports Terminated — that is success
                worst = jnp.maximum(
                    worst, jnp.maximum(_rc_ok(local.stats.retcode),
                                       resr.stats.retcode))
                return resr.u_final, ke, worst

            z, ke, worst = jax.lax.cond(
                frozen, lambda args: args, live, (z, ke, worst)
            )
            return (z, worst, ke), None

        nt_ext = times.shape[0]
        z0 = jnp.zeros(n + npf, u0vec.dtype)
        (z, worst, _ke), _ = jax.lax.scan(
            body, (z0, jnp.asarray(0, jnp.int32), ke_init),
            jnp.arange(nt_ext - 1, 0, -1),
        )
        z = z.at[:n].add(jumps[0])
        return _returns(unravel_u, unravel_p, z[:n], z[n:], saveat,
                        jnp.maximum(_rc_ok(fwd.stats.retcode), worst),
                        primals=(u0, p), d_saveat=d_saveat)

    # -- BacksolveAdjoint ------------------------------------------------

    def _bwd_backsolve(res, cot):
        (u0, p, saveat, fwd, u0vec, unravel_u, unravel_p, kern,
         n, npf, times, jumps, event_set, d_saveat, q_extra, snap_all,
         jump_unroll) = _common_bwd_setup(res, cot)

        def aug_rhs(z, t):
            lam = z[:n]
            y = z[n + npf:]
            fval, ubar, pbar = kern.f_and_vjp(y, p, t, lam)
            return jnp.concatenate([-ubar, -ravel_pytree(pbar)[0], fval])

        z0 = jnp.concatenate([jnp.zeros(n + npf, u0vec.dtype), fwd.u_final])

        if sensealg.checkpointing:
            # Snap the trailing u block back to the stored forward value at
            # each save time (backsolve_adjoint.jl:523-546); when dense-node
            # cotangent rows were merged in, every forward step node snaps
            # too (strictly more stable).
            snap_values = snap_all
            snap_start = n + npf
        else:
            snap_values = None
            snap_start = None

        wts = jnp.concatenate(
            [jnp.ones(n, u0vec.dtype), jnp.zeros(npf, u0vec.dtype),
             jnp.ones(n, u0vec.dtype)]
        )
        ev_kwargs = {}
        if event_set is not None:
            ev_kwargs = _event_kwargs(
                fwd.events, event_set,
                _make_event_apply(
                    kern, p, event_set, fwd.events, n, npf,
                    q_slice=n, u_snap_start=n + npf,
                ),
                )
        z, _, worst, _ = reverse_joined_solve(
            bwd_stepper, aug_rhs, times, jumps, z0, n,
            rtol=adj_rtol, atol=adj_atol,
            max_steps=adj_max_steps,
            snap_values=snap_values, snap_start=snap_start,
            err_weights=wts, t_span=(t0, fwd.t_final), jump_unroll=jump_unroll,
            unroll_scan=opts.unroll,
            **ev_kwargs,
        )
        # Stability guard: the reverse ends at t0, where the TRUE u0 is
        # known — a drifted reconstruction means Jᵀλ / f_pᵀλ were
        # evaluated on the wrong trajectory (backward integration of
        # dissipative dynamics is exponentially unstable), so the gradient
        # is untrustworthy. Poison loudly (retcode 3) rather than return a
        # finite-but-wrong value; see BacksolveAdjoint.recon_guard.
        guard = getattr(sensealg, "recon_guard", None)
        if guard is not None:
            drift = jnp.linalg.norm(z[n + npf:] - u0vec) / (
                1.0 + jnp.linalg.norm(u0vec))
            # ~(drift <= guard) so an overflowed (NaN/inf) reconstruction
            # also trips the guard — NaN comparisons are False
            bad_rec = jnp.logical_not(drift <= guard)
            worst = jnp.maximum(
                worst, jnp.where(bad_rec, 3, 0).astype(
                    jnp.asarray(worst).dtype))
        return _returns(unravel_u, unravel_p, z[:n], z[n:n + npf] + q_extra,
                        saveat,
                        jnp.maximum(_rc_ok(fwd.stats.retcode), worst),
                        primals=(u0, p), d_saveat=d_saveat)

    # -- GaussAdjoint ----------------------------------------------------

    def _bwd_gauss(res, cot):
        (u0, p, saveat, fwd, u0vec, unravel_u, unravel_p, kern,
         n, npf, times, jumps, event_set, d_saveat, q_extra, _snaps,
         jump_unroll) = _common_bwd_setup(res, cot)
        dense = fwd.dense

        def aug_rhs(lam, t):
            y = dense_eval(dense, t)
            return -kern.vjp_u(y, p, t, lam)

        # Stiff reverse passes: the implicit steppers pick this analytic
        # adjoint Jacobian up instead of jacfwd-ing through the vjp-valued
        # RHS (differentiating twice per Newton refresh) — the reference's
        # -(∂f/∂u)ᵀ∘u(t) reuse, quadrature_adjoint.jl:170-192; honors a
        # user-supplied prob.jac via kern.jac_u.
        aug_rhs.jac = lambda lam, t: -kern.jac_u(
            dense_eval(dense, t), p, t).T

        M_fwd = getattr(solver, "mass_matrix", None)
        gauss_hook, q0, finish_q = make_gauss_quad_hook(
            kern, p, dense, sensealg, t0, t1, u0vec.dtype, npf,
            lam_fix=(None if M_fwd is None
                     else _dae_lam_fix(M_fwd, kern, p)),
        )

        lam0 = jnp.zeros(n, u0vec.dtype)

        if M_fwd is not None:
            # Index-1 DAE: λ-only reverse solve with mass Mᵀ; projected λ
            # jumps; the save-time quadrature corrections −f_pᵀŵ don't live
            # in the reverse state (q is in the hook carry), so they are
            # summed directly into the result. See _bwd_interpolating's DAE
            # branch for the projection math (adjoint_common.jl:790-817).
            alg_j, du0_map, lamjs, qjs = _dae_project_jumps(
                M_fwd, kern, p, dense, times, jumps, u0vec.dtype
            )
            dae_stepper = _dae_reverse_stepper(
                bwd_solver, bwd_stepper
            ).with_mass_matrix(jnp.asarray(M_fwd, u0vec.dtype).T)
            dae_ev_kwargs = {}
            if event_set is not None:
                dae_ev_kwargs = _event_kwargs(
                    fwd.events, event_set,
                    _make_dae_event_apply(
                        kern, p, event_set, fwd.events, n, npf, M_fwd,
                        u0vec.dtype, q_in_hc=True,
                    ),
                    )
            lam, qcarry, worst, _ = reverse_joined_solve(
                dae_stepper, aug_rhs, times, lamjs, lam0, n,
                rtol=adj_rtol, atol=adj_atol,
                max_steps=adj_max_steps, dt0=opts.dt0,
                hook=gauss_hook, hook_carry=q0, t_span=(t0, fwd.t_final),
                **dae_ev_kwargs,
            )
            qflat = finish_q(qcarry) + jnp.sum(qjs, axis=0)
            du0vec = du0_map(lam)
            return _returns(unravel_u, unravel_p, du0vec, qflat, saveat,
                            jnp.maximum(_rc_ok(fwd.stats.retcode), worst),
                            primals=(u0, p), d_saveat=d_saveat)

        if _pinned_on(event_set, None):
            gauss_hook_p, q0p, finish_qp = make_gauss_quad_hook(
                kern, p, dense, sensealg, t0, t1, u0vec.dtype, npf,
                pinned=True,
            )
            lam, qcarry, worst, _ = reverse_pinned_solve(
                bwd_stepper, _make_interval_rhs_lam(kern, p, dense, n),
                dense, times, jumps, lam0, n,
                rtol=adj_rtol, atol=adj_atol,
                hook=gauss_hook_p, hook_carry=q0p, jump_unroll=jump_unroll,
            )
            return _returns(unravel_u, unravel_p, lam,
                            finish_qp(qcarry) + q_extra, saveat,
                            jnp.maximum(_rc_ok(fwd.stats.retcode), worst),
                            primals=(u0, p), d_saveat=d_saveat)

        ev_kwargs = {}
        if event_set is not None:
            ev_kwargs = _event_kwargs(
                fwd.events, event_set,
                _make_event_apply(
                    kern, p, event_set, fwd.events, n, npf, q_in_hc=True
                ),
                )
        lam, qcarry, worst, _ = reverse_joined_solve(
            bwd_stepper, aug_rhs, times, jumps, lam0, n,
            rtol=adj_rtol, atol=adj_atol,
            max_steps=adj_max_steps,
            hook=gauss_hook, hook_carry=q0,
            t_span=(t0, fwd.t_final), jump_unroll=jump_unroll,
            unroll_scan=opts.unroll,
            **ev_kwargs,
        )
        return _returns(unravel_u, unravel_p, lam, finish_q(qcarry) + q_extra,
                        saveat,
                        jnp.maximum(_rc_ok(fwd.stats.retcode), worst),
                        primals=(u0, p), d_saveat=d_saveat)

    # -- QuadratureAdjoint ----------------------------------------------

    def _bwd_quadrature(res, cot):
        (u0, p, saveat, fwd, u0vec, unravel_u, unravel_p, kern,
         n, npf, times, jumps, event_set, d_saveat, q_extra, _snaps,
         jump_unroll) = _common_bwd_setup(res, cot)
        dense = fwd.dense

        def aug_rhs(lam, t):
            y = dense_eval(dense, t)
            return -kern.vjp_u(y, p, t, lam)

        # Stiff reverse passes: the implicit steppers pick this analytic
        # adjoint Jacobian up instead of jacfwd-ing through the vjp-valued
        # RHS (differentiating twice per Newton refresh) — the reference's
        # -(∂f/∂u)ᵀ∘u(t) reuse, quadrature_adjoint.jl:170-192; honors a
        # user-supplied prob.jac via kern.jac_u.
        aug_rhs.jac = lambda lam, t: -kern.jac_u(
            dense_eval(dense, t), p, t).T

        lam0 = jnp.zeros(n, u0vec.dtype)
        ev_kwargs = {}
        # quadrature accumulates in >= f32 (see make_gauss_quad_hook)
        q_ev0 = jnp.zeros(npf, jnp.promote_types(u0vec.dtype, jnp.float32))
        M_fwd = getattr(solver, "mass_matrix", None)
        if M_fwd is not None:
            # Index-1 DAE (see _bwd_interpolating's DAE branch): λ-only
            # reverse with mass Mᵀ, projected jumps; the λ dense rows carry
            # the stepper's consistent u̇ estimates so the Hermite nodes
            # below interpolate the algebraic λ components correctly.
            alg_j, du0_map, lamjs, dae_qjs = _dae_project_jumps(
                M_fwd, kern, p, dense, times, jumps, u0vec.dtype
            )
            rev_stepper = _dae_reverse_stepper(
                bwd_solver, bwd_stepper
            ).with_mass_matrix(jnp.asarray(M_fwd, u0vec.dtype).T)
            jumps_use = lamjs
            dt0_use = opts.dt0
            if event_set is not None:
                ev_kwargs = _event_kwargs(
                    fwd.events, event_set,
                    _make_dae_event_apply(
                        kern, p, event_set, fwd.events, n, npf, M_fwd,
                        u0vec.dtype, q_in_hc=True,
                    ),
                    )
        else:
            alg_j = du0_map = dae_qjs = None
            rev_stepper = bwd_stepper
            jumps_use = jumps
            dt0_use = None
            if event_set is not None:
                ev_kwargs = _event_kwargs(
                    fwd.events, event_set,
                    _make_event_apply(
                        kern, p, event_set, fwd.events, n, npf, q_in_hc=True
                    ),
                    )
        lam, q_ev, worst, lam_dense = reverse_joined_solve(
            rev_stepper, aug_rhs, times, jumps_use, lam0, n,
            rtol=adj_rtol, atol=adj_atol,
            max_steps=adj_max_steps, dt0=dt0_use,
            collect_dense=True,
            hook_carry=q_ev0,
            t_span=(t0, fwd.t_final), jump_unroll=jump_unroll,
            unroll_scan=(opts.unroll and M_fwd is None),
            **ev_kwargs,
        )

        q = adaptive_gk_dp(kern, p, dense, lam_dense, sensealg,
                           u0vec.dtype, npf, q_ev,
                           lam_fix=(None if M_fwd is None
                                    else _dae_lam_fix(M_fwd, kern, p))
                           ) + q_extra
        if M_fwd is not None:
            q = q + jnp.sum(dae_qjs, axis=0)
            lam = du0_map(lam)
        return _returns(unravel_u, unravel_p, lam, q, saveat,
                        jnp.maximum(_rc_ok(fwd.stats.retcode), worst),
                        primals=(u0, p), d_saveat=d_saveat)

    # -- ForwardDiffSensitivity (discrete forward mode) ------------------

    def _bwd_forwarddiff(res, cot):
        u0, p, saveat, fwd = res
        d_ys, d_aux = cot
        u0vec, unravel_u = ravel_pytree(u0)
        pflat, unravel_p = ravel_pytree(p)
        n = u0vec.shape[0]
        npf = pflat.shape[0]
        nt = jnp.asarray(saveat).shape[0]
        kern = _kern(u0, p)

        if symbolic_zeros and _has_cotangent(d_aux.events):
            raise NotImplementedError(
                "gradients through sol.events (raw event records) are not "
                "supported; consume sol.ys / sol(t) / sol.u_final instead"
            )

        lam = (_ravel_rows(_materialize_tree(d_ys))
               if _has_cotangent(d_ys)
               else jnp.zeros((nt, n), u0vec.dtype))  # (nt, n)
        d_uf = _materialize(d_aux.u_final)
        # t_final is a constant (== t1) except under TERMINAL events, where
        # it is τ(u0, p) — the time-to-event output. The jvp contraction
        # differentiates it exactly through the Newton-polished τ.
        d_tf = _materialize(d_aux.t_final)
        dd = d_aux.dense
        # FDS is discretize-then-optimize: dense-output cotangents contract
        # against jvp tangents of the interpolation buffers themselves —
        # exact for the discrete program, including the node *times* (the
        # continuous rules freeze the grid instead).
        # plain mode (shard_map fallback): consumption is statically
        # undecidable, but the jvp contraction of materialized zero
        # cotangents is exact — so contract whenever dense is stored. This
        # makes FDS the correct dense-gradient route inside shard_map.
        use_dense = (dd is not None and fwd.dense is not None
                     and (_has_cotangent(dd) if symbolic_zeros else True))
        if use_dense:
            d_dts = _materialize(dd.ts)
            d_dys = _materialize(dd.ys)
            d_dfs = _materialize(dd.fs)

        _, unravel_u_ = ravel_pytree(u0)

        def outs_of(u0v, pf):
            p_ = unravel_p(pf)
            fvec = lambda uv, t: kern.fvec(uv, p_, t)
            if opts.callback is not None:
                from ..callbacks import build_event_set

                es = build_event_set(opts.callback, p_, unravel_u_,
                                     opts.max_events)
            else:
                es = None
            # The jvp re-solve must run the SAME discrete program as the
            # primal: thread fixed_dt/dtmax/unroll through (omitting
            # fixed_dt here silently contracted against tangents of an
            # adaptive solve while the primal marched the dt grid).
            fr, _ = forward_saveat_solve(
                solver, fvec, u0v, t0, t1, jnp.asarray(saveat, u0v.dtype),
                rtol=opts.rtol, atol=opts.atol, dt0=opts.dt0,
                max_steps=opts.max_steps, tstops=opts.tstops,
                store_dense=use_dense, event_set=es,
                dtmax=opts.dtmax, fixed_dt=opts.fixed_dt,
                unroll_scan=opts.unroll,
            )
            out = (fr.ys_save, fr.u_final, fr.t_final)
            if use_dense:
                out = out + (fr.dense.ts, fr.dense.ys, fr.dense.fs)
            return out

        chunk = getattr(sensealg, "chunk_size", 0) or (n + npf)

        def jvp_dir(seed):
            du0v = seed[:n].astype(u0vec.dtype)
            dpv = seed[n:].astype(pflat.dtype)
            _, touts = jax.jvp(outs_of, (u0vec, pflat), (du0v, dpv))
            acc = (jnp.sum(lam * touts[0]) + jnp.sum(d_uf * touts[1])
                   + jnp.sum(d_tf.astype(touts[2].dtype) * touts[2]))
            if use_dense:
                acc = (acc
                       + jnp.sum(d_dts * touts[3])
                       + jnp.sum(d_dys * touts[4])
                       + jnp.sum(d_dfs * touts[5]))
            return acc

        # Chunked forward sweeps (reference: 12-wide Dual chunks,
        # concrete_solve.jl:1306-1345): lax.map over seed chunks bounds the
        # tangent-batch memory; each chunk is one vmapped jvp re-solve.
        eye = jnp.eye(n + npf, dtype=u0vec.dtype)
        n_dirs = n + npf
        n_chunks = -(-n_dirs // chunk)
        pad = n_chunks * chunk - n_dirs
        seeds = jnp.concatenate(
            [eye, jnp.zeros((pad, n_dirs), u0vec.dtype)]
        ).reshape(n_chunks, chunk, n_dirs)
        contracted = jax.lax.map(
            lambda block: jax.vmap(jvp_dir)(block), seeds
        ).reshape(-1)[:n_dirs]
        du0 = contracted[:n]
        dp = contracted[n:]
        du0_t, dp_t = match_cotangents(unravel_u(du0), unravel_p(dp),
                                       (u0, p))
        # dL/dt_i = Δ_i · f(u(t_i)) (see _common_bwd_setup)
        if _has_cotangent(d_ys):
            ttype = jnp.promote_types(u0vec.real.dtype, jnp.float32)
            d_saveat = jax.vmap(
                lambda y, t_, dl: jnp.real(jnp.sum(dl * kern.fvec(y, p, t_)))
            )(fwd.ys_save, jnp.asarray(saveat).real.astype(ttype),
              lam).astype(jnp.asarray(saveat).dtype)
        else:
            d_saveat = jnp.zeros_like(saveat)
        return du0_t, dp_t, d_saveat

    if isinstance(sensealg, InterpolatingAdjoint) or gauss_ckpt:
        # GaussAdjoint(checkpointing=True) shares the interval-re-solve
        # reverse (reference GaussCheckpointSolution, gauss_adjoint.jl:40-46):
        # q rides in the state with zero error weight, so the λ error control
        # matches the non-checkpointed Gauss behavior.
        bwd_rule = _bwd_interpolating
    elif isinstance(sensealg, BacksolveAdjoint):
        bwd_rule = _bwd_backsolve
    elif isinstance(sensealg, (GaussAdjoint, GaussKronrodAdjoint)):
        bwd_rule = _bwd_gauss
    elif isinstance(sensealg, QuadratureAdjoint):
        bwd_rule = _bwd_quadrature
    elif isinstance(sensealg, ForwardDiffSensitivity):
        bwd_rule = _bwd_forwarddiff
    else:
        raise NotImplementedError(f"no ODE adjoint rule for {sensealg!r}")

    solve_fn.defvjp(_fwd_rule, bwd_rule, symbolic_zeros=symbolic_zeros)
    return solve_fn
