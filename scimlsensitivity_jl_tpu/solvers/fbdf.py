"""FBDF: fixed-leading-coefficient variable-order BDF (orders 1-5).

Fills the reference's multistep stiff slot (FBDF in the OrdinaryDiffEq test
matrix — SURVEY §2 native item 4; /root/reference/test/Core2/stiff_adjoints.jl
runs Rodas4/Kvaerno5/FBDF-class integrators). Unlike the one-step stiff
solvers in this package (Rosenbrock23, SDIRK, Seulex), BDF reuses solution
*history*: one Newton solve per step regardless of order, which is the
efficiency class Seulex cannot reach (its order-K step does 1+2+…+K
linearly-implicit substeps).

Design (Shampine ode15s / SUNDIALS CVODE family, variable-step via direct
Lagrange differentiation rather than Nordsieck arrays — fixed-shape friendly):

  nodes  x₀ = t+dt, xⱼ = t_hist[j-1]  (j = 1..k, most recent first)
  BDF:   Σⱼ wⱼ M u(xⱼ) = f(u₀, x₀)  with wⱼ = dLⱼ/dt |_{x₀}
         (Lagrange differentiation weights over the k+1 nodes)
  Newton on g(v) = M(w₀ v + Σⱼ₌₁ wⱼ uⱼ) − f(v),  W = w₀M − J frozen per step
  predictor: Lagrange extrapolation of the k+1 most recent history values
  error:  est_k = (v − pred)/(k+1)  ~  C h^{k+1} u^{(k+1)}
  order:  after a cooldown of k+1 accepted steps, compare est_{k−1}, est_k,
          est_{k+1} through their implied step factors (‖est‖^{−1/(order+1)})
          and move one order toward the winner.

The integrate() driver threads the history through the loop carry via the
stateful-stepper protocol (init_state/step(state)/controller_order) and
reads the dynamic order for its PI exponents. Works as a forward solver, as
an adjoint reverse stepper, and (via with_mass_matrix) on index-1
semi-explicit DAEs with the same algebraic-row error policy as the SDIRK
steppers.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

__all__ = ["FBDF"]

K_MAX = 5          # maximum BDF order (order 6 is not zero-stable enough)
HCAP = K_MAX + 2   # history slots: order-raise test needs k+2 past values


class FBDFState(NamedTuple):
    t_hist: jnp.ndarray   # (HCAP,) times, most recent first
    u_hist: jnp.ndarray   # (HCAP, n) solutions at t_hist
    n_hist: jnp.ndarray   # valid history entries (int32, >= 1)
    k: jnp.ndarray        # current order (int32, 1..K_MAX)
    steps_at_k: jnp.ndarray  # accepted steps since the last order change
    rtol: jnp.ndarray
    atol: jnp.ndarray


def _diff_weights(xs, valid, x0):
    """Lagrange differentiation weights wⱼ = dLⱼ/dt at x0 over the masked
    node set {x0} ∪ {xs[j] : valid[j]}; invalid slots get weight 0."""
    # w0 = Σ_m 1/(x0 - x_m)
    d0 = jnp.where(valid, x0 - xs, 1.0)
    w0 = jnp.sum(jnp.where(valid, 1.0 / d0, 0.0))

    # wj = Π_{m≠j}(x0-x_m)/(x_j-x_m) · 1/(x_j - x0) · Π... — computed as
    # wj = [Π_{m≠0,j}(x0 - x_m)] / [Π_{m≠j}(x_j - x_m)] with m ranging over
    # the valid history nodes and the leading node x0 in the denominator.
    def wj(j):
        others = valid & (jnp.arange(xs.shape[0]) != j)
        num = jnp.prod(jnp.where(others, x0 - xs, 1.0))
        den = jnp.prod(jnp.where(others, xs[j] - xs, 1.0)) * (xs[j] - x0)
        return jnp.where(valid[j], num / den, 0.0)

    w = jax.vmap(wj)(jnp.arange(xs.shape[0]))
    return w0, w


def _lagrange_extrap(xs, us, valid, x0):
    """Polynomial through the masked (xs, us) evaluated at x0."""
    def lj(j):
        others = valid & (jnp.arange(xs.shape[0]) != j)
        num = jnp.prod(jnp.where(others, x0 - xs, 1.0))
        den = jnp.prod(jnp.where(others, xs[j] - xs, 1.0))
        return jnp.where(valid[j], num / den, 0.0)

    coef = jax.vmap(lj)(jnp.arange(xs.shape[0]))
    return jnp.einsum("j,jn->n", coef.astype(us.dtype), us)


class FBDF:
    """Variable-order BDF(1-5) with modified Newton.

    mass_matrix: optional constant M for M·u' = f (index-1 semi-explicit
    DAEs supported; algebraic rows excluded from the error estimate as in
    the SDIRK steppers — Hairer-Wanner VII.1 practice, reference mass-matrix
    surface adjoint_common.jl:110-139).
    """

    stateful = True
    order = 2          # static controller fallback (init dt heuristic only)
    fsal = False
    factor_max = 2.5   # BDF stability wants bounded step growth
    n_stages = 10      # honest static feval estimate per attempt (Newton)

    def __init__(self, newton_iters: int = 6, newton_tol: float = 1e-12,
                 mass_matrix=None, max_order: int = K_MAX):
        if not (1 <= max_order <= K_MAX):
            raise ValueError(f"max_order must be in 1..{K_MAX}")
        self.newton_iters = newton_iters
        self.newton_tol = newton_tol
        self.mass_matrix = mass_matrix
        self.max_order = max_order
        self.name = "FBDF"

    def with_mass_matrix(self, M):
        return FBDF(self.newton_iters, self.newton_tol, mass_matrix=M,
                    max_order=self.max_order)

    def __repr__(self):
        return f"FBDF(max_order={self.max_order})"

    def init_state(self, fvec, t0, u0, f0, rtol, atol):
        tdtype = jnp.promote_types(jnp.zeros((), u0.dtype).real.dtype, jnp.float32)
        t_hist = jnp.full((HCAP,), jnp.asarray(t0, tdtype))
        u_hist = jnp.tile(u0[None, :], (HCAP, 1))
        return FBDFState(
            t_hist=t_hist,
            u_hist=u_hist,
            n_hist=jnp.asarray(1, jnp.int32),
            k=jnp.asarray(1, jnp.int32),
            steps_at_k=jnp.asarray(0, jnp.int32),
            rtol=jnp.asarray(rtol, tdtype),
            atol=jnp.asarray(atol, tdtype),
        )

    def controller_order(self, state: FBDFState):
        return state.k

    def reset_state(self, state: FBDFState, t, u):
        """Restart from order 1 at (t, u) — multistep history is invalid
        across a state discontinuity (λ jump, event affect)."""
        return FBDFState(
            t_hist=jnp.full_like(state.t_hist, t),
            u_hist=jnp.tile(u[None, :], (HCAP, 1)),
            n_hist=jnp.asarray(1, jnp.int32),
            k=jnp.asarray(1, jnp.int32),
            steps_at_k=jnp.asarray(0, jnp.int32),
            rtol=state.rtol,
            atol=state.atol,
        )

    def step(self, fvec, t, dt, u, f0, state: FBDFState):
        n = u.shape[0]
        M = self.mass_matrix
        eyeM = (jnp.eye(n, dtype=u.dtype) if M is None
                else jnp.asarray(M, u.dtype))
        x0 = t + dt
        idx = jnp.arange(HCAP)
        k_eff = jnp.minimum(state.k, state.n_hist)
        hist_valid = idx < k_eff            # the k most recent history nodes

        w0, w = _diff_weights(state.t_hist, hist_valid, x0)
        rhs_hist = jnp.einsum(
            "j,jn->n", w.astype(u.dtype), state.u_hist
        )  # Σ_{j>=1} w_j u_j

        # Predictor: polynomial through the (k+1 if available, else k) most
        # recent values; at the very first step fall back to forward Euler.
        pv = idx < jnp.minimum(k_eff + 1, state.n_hist)
        pred_poly = _lagrange_extrap(state.t_hist, state.u_hist, pv, x0)
        pred = jnp.where(state.n_hist > 1, pred_poly, u + dt * f0)

        jac_fn = getattr(fvec, "jac", None)  # analytic hook (see sdirk.py)
        J = (jac_fn(u, x0) if jac_fn is not None
             else jax.jacfwd(lambda uu: fvec(uu, x0))(u))
        W = w0 * eyeM - J
        lu = lu_factor(W)

        def resid(v):
            Mv = (w0 * v + rhs_hist) if M is None else eyeM @ (w0 * v + rhs_hist)
            return Mv - fvec(v, x0)

        # The BDF predictor is already O(h^k)-accurate, so Newton starts in
        # the convergence basin: one damping fallback suffices (the SDIRK
        # stages, which start cold, keep three).
        alphas = jnp.asarray([1.0, 0.5], u.real.dtype)

        def newton_body(_, v):
            g = resid(v)
            delta = lu_solve(lu, g)
            cand = v[None, :] - alphas[:, None] * delta[None, :]
            gn = jax.vmap(lambda vv: jnp.linalg.norm(resid(vv)))(cand)
            gn = jnp.where(jnp.isnan(gn), jnp.inf, gn)
            return cand[jnp.argmin(gn)]

        v = jax.lax.fori_loop(0, self.newton_iters, newton_body, pred)
        rfin = jnp.linalg.norm(resid(v))
        bad = ~(rfin <= 1e-6 * (1.0 + jnp.linalg.norm(v))) | \
            ~jnp.all(jnp.isfinite(v))

        kf = k_eff.astype(u.real.dtype)
        est_k = (v - pred) / (kf + 1.0)
        if M is not None:
            alg = jnp.sum(jnp.abs(eyeM), axis=1) == 0
            est_k = jnp.where(alg, 0.0, est_k)
        err = jnp.where(bad, jnp.full_like(est_k, jnp.inf), est_k)

        # ---- order adaptation (on the accepted-step state update) --------
        sc = state.atol + state.rtol * jnp.maximum(jnp.abs(u), jnp.abs(v))

        def enorm(e):
            return jnp.sqrt(jnp.mean(jnp.abs(e / sc) ** 2))

        # est at k-1: predictor through one fewer history value
        pv_dn = idx < jnp.minimum(k_eff, state.n_hist)
        pred_dn = _lagrange_extrap(state.t_hist, state.u_hist, pv_dn, x0)
        E_dn = enorm((v - pred_dn) / kf)
        # est at k+1: predictor through one more history value
        pv_up = idx < jnp.minimum(k_eff + 2, state.n_hist)
        pred_up = _lagrange_extrap(state.t_hist, state.u_hist, pv_up, x0)
        E_up = enorm((v - pred_up) / (kf + 2.0))
        E_k = enorm(est_k)

        tiny = 1e-30
        fac_dn = (E_dn + tiny) ** (-1.0 / kf)
        fac_k = (E_k + tiny) ** (-1.0 / (kf + 1.0))
        fac_up = (E_up + tiny) ** (-1.0 / (kf + 2.0))
        can_dn = k_eff > 1
        can_up = (state.k < self.max_order) & (state.n_hist >= k_eff + 2)
        fac_dn = jnp.where(can_dn, fac_dn, -jnp.inf)
        fac_up = jnp.where(can_up, fac_up, -jnp.inf)
        cooldown = state.steps_at_k >= state.k + 1
        best = jnp.argmax(jnp.stack([fac_dn, fac_k, fac_up]))
        dk = jnp.where(cooldown, best.astype(jnp.int32) - 1, 0)
        k_new = jnp.clip(state.k + dk, 1, self.max_order)

        # shift history (most recent first)
        t_hist = jnp.concatenate([x0[None], state.t_hist[:-1]])
        u_hist = jnp.concatenate([v[None], state.u_hist[:-1]], axis=0)
        new_state = FBDFState(
            t_hist=t_hist,
            u_hist=u_hist,
            n_hist=jnp.minimum(state.n_hist + 1, HCAP),
            k=k_new,
            steps_at_k=jnp.where(dk != 0, 0, state.steps_at_k + 1),
            rtol=state.rtol,
            atol=state.atol,
        )

        f1 = fvec(v, x0)
        if M is not None:
            # Consistent derivative estimate for dense output on a DAE: the
            # BDF formula itself is the best available u̇ (exact in the
            # differential rows, index-1-consistent in the algebraic ones).
            f1 = (w0 * v + rhs_hist).astype(f1.dtype)
        return v, f1, err, new_state
