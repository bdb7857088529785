"""SDE solvers: Euler-Maruyama (Ito), EulerHeun (Stratonovich), Milstein
(Ito: diagonal noise, commutative matrix noise via RKMilCommute, and general
non-commutative matrix noise via RKMilGeneral with truncated-series Lévy
areas).

Fixed-grid `lax.scan` time loops (the reference pins SDE adjoints to the
forward grid via tstops anyway — sensitivity_interface.jl:478-491); noise is
counter-based (ops/brownian.py) so every pass regenerates identical
increments. Steppers work on flat states with

    step(fvec, gvec, t, dt, u, dw) -> u1

where gvec(u, t) is (n,) for diagonal/scalar noise and (n, m) for general
noise with dw of shape (m,).

Ito <-> Stratonovich drift conversion (reference: src/sde_tools.jl
StochasticTransformedFunction) is provided as a pure drift transform built
from one jvp of g.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "EulerMaruyama",
    "EulerHeun",
    "Milstein",
    "RKMilCommute",
    "RKMilGeneral",
    "SRA1",
    "StrongTaylor15",
    "SRIW1",
    "SOSRI",
    "ImplicitEM",
    "AdaptiveEM",
    "AdaptiveMilstein",
    "ito_to_stratonovich_drift",
    "stratonovich_to_ito_drift",
]


def _gg_jvp(gvec, u, t, v):
    """(∂g/∂u)·v by one jvp — diagonal g·g′ terms, or applied per noise
    column for matrix noise (v = g[:, j] gives L^j g)."""
    return jax.jvp(lambda uu: gvec(uu, t), (u,), (v,))[1]


def _diffusion_term(g_val, dw):
    """g·dW for diagonal (n,) or general (n, m) diffusion."""
    if g_val.ndim == 1:
        return g_val * dw
    return g_val @ dw


class EulerMaruyama:
    """Strong order 0.5 Ito scheme: u1 = u + f·dt + g·ΔW."""

    name = "EulerMaruyama"
    interpretation = "ito"
    order = 1

    def __repr__(self):
        return "EulerMaruyama()"

    def step(self, fvec, gvec, t, dt, u, dw):
        return u + dt * fvec(u, t) + _diffusion_term(gvec(u, t), dw)


class EulerHeun:
    """Stratonovich Heun scheme: predictor-corrector in the diffusion."""

    name = "EulerHeun"
    interpretation = "stratonovich"
    order = 1

    def __repr__(self):
        return "EulerHeun()"

    def step(self, fvec, gvec, t, dt, u, dw):
        g0 = gvec(u, t)
        ubar = u + dt * fvec(u, t) + _diffusion_term(g0, dw)
        g1 = gvec(ubar, t + dt)
        return u + dt * fvec(u, t) + 0.5 * _diffusion_term(g0 + g1, dw)


class Milstein:
    """Strong order 1.0 Ito Milstein scheme.

    Diagonal noise (g: (n,)):
        u1 = EM + 0.5·g·(∂g/∂u diag)·(ΔW² − dt), derivative via one jvp.

    Matrix (n, m) noise requires the COMMUTATIVITY condition
    L^j g_k = L^k g_j and the explicit opt-in ``Milstein(commutative=True)``
    (or the ``RKMilCommute()`` alias — StochasticDiffEq encodes the same
    assumption in that solver's name while its plain Milstein rejects
    non-diagonal noise). Under commutativity the iterated-integral sum
    collapses to

        0.5 · Σ_{j,k} (∂g/∂u · g_{:,j})_k · (ΔW_j ΔW_k − dt δ_{jk}),

    computed as m jvps of g (one per noise column, vmapped — batched on the
    VPU, no Jacobian materialization). For NON-commutative matrix noise use
    RKMilGeneral (truncated-series Lévy areas)."""

    name = "Milstein"
    interpretation = "ito"
    order = 1

    def __init__(self, commutative: bool = False):
        self.commutative = bool(commutative)

    def __repr__(self):
        return f"Milstein(commutative={self.commutative})"

    def step(self, fvec, gvec, t, dt, u, dw):
        g0 = gvec(u, t)
        if g0.ndim == 1:
            dg = _gg_jvp(gvec, u, t, g0)  # (∂g/∂u)·g ; diagonal: g·g'
            return (
                u + dt * fvec(u, t) + g0 * dw + 0.5 * dg * (dw ** 2 - dt)
            )
        if not self.commutative:
            raise NotImplementedError(
                "Milstein on matrix (n, m) noise assumes commutative noise "
                "(L^j g_k = L^k g_j); opt in with Milstein(commutative=True)"
                " / RKMilCommute(), or use RKMilGeneral() for the "
                "non-commutative case (Lévy-area Milstein)"
            )
        # commutative matrix noise: D[j] = (∂g/∂u)·g[:, j], shape (m, n, m)
        D = jax.vmap(lambda col: _gg_jvp(gvec, u, t, col))(g0.T)
        eye = jnp.eye(dw.shape[0], dtype=dw.dtype)
        A = dw[:, None] * dw[None, :] - dt * eye
        corr = 0.5 * jnp.einsum("jnk,jk->n", D, A)
        return u + dt * fvec(u, t) + g0 @ dw + corr


def RKMilCommute():
    """StochasticDiffEq's RKMilCommute slot: Milstein for commutative matrix
    noise — the commutativity assumption is in the name, as in the
    reference ecosystem."""
    return Milstein(commutative=True)


class RKMilGeneral:
    """Strong order 1.0 Ito Milstein for GENERAL (non-commutative) (n, m)
    noise — the slot StochasticDiffEq fills with RKMilGeneral; the Julia
    reference itself has no Lévy-area machinery (its jacNoise! handles the
    diffusion Jacobian only: /root/reference/src/derivative_wrappers.jl:1165-1409).

        u1 = EM + Σ_{j,k} L^j g_{:,k} · I_(j,k),
        I_(j,k) = ½(ΔW_j ΔW_k − dt δ_jk) + A_jk,

    with the antisymmetric Lévy area A from the truncated Kloeden–Platen
    series (ops/brownian.py grid_levy_area; `levy_terms` controls the
    truncation, strong error O(h/√P) per step). L^j g_{:,k} is computed as
    m vmapped jvps of g — no Jacobian materialization. Diagonal noise
    degenerates to plain Milstein (areas drop out)."""

    name = "RKMilGeneral"
    interpretation = "ito"
    order = 1
    needs_levy = True

    def __init__(self, levy_terms: int = 10):
        self.levy_terms = int(levy_terms)

    def __repr__(self):
        return f"RKMilGeneral(levy_terms={self.levy_terms})"

    def step(self, fvec, gvec, t, dt, u, dw, levy_a=None):
        g0 = gvec(u, t)
        if g0.ndim == 1:
            dg = _gg_jvp(gvec, u, t, g0)
            return (
                u + dt * fvec(u, t) + g0 * dw + 0.5 * dg * (dw ** 2 - dt)
            )
        D = jax.vmap(lambda col: _gg_jvp(gvec, u, t, col))(g0.T)
        eye = jnp.eye(dw.shape[0], dtype=dw.dtype)
        I2 = 0.5 * (dw[:, None] * dw[None, :] - dt * eye)
        if levy_a is not None:
            I2 = I2 + levy_a
        corr = jnp.einsum("jnk,jk->n", D, I2)
        return u + dt * fvec(u, t) + g0 @ dw + corr


class SRA1:
    """Rößler SRA1 for additive noise: strong order 1.5, weak order 2.0
    (the scheme StochasticDiffEq reaches for on additive-noise problems —
    reference SDE test matrix uses SOSRA/SRA1-class methods for its
    additive-noise adjoint tests). Needs the iterated integral
    ΔZ = ∫(W(s) − W(t))ds, generated counter-based alongside ΔW
    (ops/brownian.py grid_iterated); the driver supplies it when
    `needs_dz` is set.

    Tableau (Rößler 2010, SIAM J. Numer. Anal. 48(3), SRA1):
        c0 = (0, 3/4),  c1 = (1, 0)
        A0 = [[0,0],[3/4,0]],  B0 = [[0,0],[3/2,0]]
        α  = (1/3, 2/3),  β1 = (1, 0),  β2 = (−1, 1)
    with stage diffusion argument χ = ΔZ/h:
        H2 = u + (3/4)h f(u,t) + (3/2)·g(t+h)·χ
        u1 = u + h[f(u,t)/3 + 2f(H2, t+3h/4)/3]
               + g(t+h)·(ΔW − χ) + g(t)·χ

    g may depend on t (and formally on u — the order claims hold for
    additive noise, ∂g/∂u = 0)."""

    name = "SRA1"
    interpretation = "ito"
    order = 2
    needs_dz = True

    def __repr__(self):
        return "SRA1()"

    def step(self, fvec, gvec, t, dt, u, dw, dz):
        chi = dz / dt
        f1 = fvec(u, t)
        g_end = gvec(u, t + dt)
        g_start = gvec(u, t)
        H2 = u + 0.75 * dt * f1 + 1.5 * _diffusion_term(g_end, chi)
        f2 = fvec(H2, t + 0.75 * dt)
        return (
            u
            + dt * (f1 / 3.0 + 2.0 * f2 / 3.0)
            + _diffusion_term(g_end, dw - chi)
            + _diffusion_term(g_start, chi)
        )


class StrongTaylor15:
    """Strong order 1.5 Ito–Taylor scheme for scalar/diagonal multiplicative
    noise — the slot the reference fills with Rößler's SRIW1/SOSRI
    (StochasticDiffEq; used throughout /root/reference/test/SDE1-3 and
    test/Core4/sde_neural.jl).

    TPU-native formulation: instead of a derivative-free Runge–Kutta tableau
    (whose constants would have to be transcribed), the scheme IS the
    order-1.5 Ito–Taylor expansion (Kloeden & Platen §10.4) with every
    operator evaluated by AD — no constants beyond the expansion itself,
    and the strong order is verified by a convergence-slope test.

    Per component k (diagonal noise  du_k = f_k dt + g_k dW_k):

        u⁺_k = u_k + f_k h + g_k ΔW_k
             + ½ Σ_j g_j ∂g_k/∂u_j (ΔW_j ΔW_k − δ_jk h)       [I_(j,k)]
             + Σ_j g_j ∂f_k/∂u_j ΔZ_j                          [I_(j,0)]
             + ½ L0 f_k h²
             + (L0 g)_k (ΔW_k h − ΔZ_k)                        [I_(0,k)]
             + ½ g_k ∂_k(g_k ∂_k g_k) (⅓ ΔW_k² − h) ΔW_k       [I_(k,k,k)]

    with L0 = ∂_t + Σ f_l ∂_l + ½ Σ g_l² ∂²_ll and ΔZ = ∫(W(s)−W(t))ds.
    Cross second-iterated integrals use the commutative-noise identity
    I_(j,k)+I_(k,j) = ΔW_jΔW_k: strong 1.5 holds for scalar noise and for
    diagonal noise with ∂g_k/∂u_j |_{j≠k} = 0 (the geometric-Brownian /
    neural-SDE-diagonal class); commutative cross-dependence retains
    strong 1.0 with improved constants.
    """

    name = "StrongTaylor15"
    interpretation = "ito"
    order = 2
    needs_dz = True

    def __repr__(self):
        return "StrongTaylor15()"

    def step(self, fvec, gvec, t, dt, u, dw, dz):
        n = u.shape[0]
        h = dt
        g0 = gvec(u, t)
        if g0.ndim != 1:
            raise NotImplementedError(
                "StrongTaylor15 covers scalar/diagonal noise; use "
                "EulerMaruyama/EulerHeun for general matrix noise"
            )
        f0 = fvec(u, t)

        Jg = jax.jacfwd(lambda uu: gvec(uu, t))(u)   # (n, n): ∂g_k/∂u_j
        Jf = jax.jacfwd(lambda uu: fvec(uu, t))(u)   # ∂f_k/∂u_j
        f_t = jax.jvp(lambda tt: fvec(u, tt), (t,), (jnp.ones_like(t),))[1]
        g_t = jax.jvp(lambda tt: gvec(u, tt), (t,), (jnp.ones_like(t),))[1]

        w2 = g0 ** 2

        def weighted_lap(fn):
            # Σ_l w2_l ∂²fn/∂u_l² via nested jvp over the basis — O(n) sweeps
            def second_dir(l):
                e = jnp.zeros(n, u.dtype).at[l].set(1.0)
                return jax.jvp(
                    lambda uu: jax.jvp(fn, (uu,), (e,))[1], (u,), (e,)
                )[1]

            hs = jax.vmap(second_dir)(jnp.arange(n))  # (n, n)
            return jnp.einsum("l,lk->k", w2, hs)

        L0f = f_t + Jf @ f0 + 0.5 * weighted_lap(lambda uu: fvec(uu, t))
        L0g = g_t + Jg @ f0 + 0.5 * weighted_lap(lambda uu: gvec(uu, t))

        # Milstein block with commutative cross terms:
        # ½ Σ_j g_j ∂g_k/∂u_j (ΔW_j ΔW_k − δ_jk h)
        mil = 0.5 * ((Jg * g0[None, :]) @ dw) * dw \
            - 0.5 * jnp.diag(Jg) * g0 * h
        # Σ_j g_j ∂f_k/∂u_j ΔZ_j
        lf = (Jf * g0[None, :]) @ dz
        # triple term: m_k = g_k ∂_k g_k ; ½ g_k ∂_k m_k (⅓ΔW²−h)ΔW
        m = g0 * jnp.diag(Jg)

        def m_fn(uu):
            gg = gvec(uu, t)
            return gg * jnp.diag(jax.jacfwd(gvec, argnums=0)(uu, t))

        dm_diag = jnp.diag(jax.jacfwd(m_fn)(u))
        triple = 0.5 * g0 * dm_diag * (dw ** 2 / 3.0 - h) * dw

        return (
            u + f0 * h + g0 * dw
            + mil
            + lf
            + 0.5 * L0f * h * h
            + L0g * (dw * h - dz)
            + triple
        )


def SRIW1():
    """Reference-named alias: the strong-1.5 diagonal-noise slot SRIW1
    occupies in StochasticDiffEq, provided here by the AD-based Ito-Taylor
    scheme (see StrongTaylor15 — same problem class and strong order, not
    the Rößler tableau)."""
    return StrongTaylor15()


def SOSRI():
    """Reference-named alias (stability-optimized SRI slot): see SRIW1."""
    return StrongTaylor15()


def ito_to_stratonovich_drift(fvec, gvec):
    """f̃ = f - ½ (∂g/∂u)·g (diagonal noise) — the drift correction applied
    when an Ito problem meets a Stratonovich-converging scheme
    (reference: src/sde_tools.jl:2-27, backsolve_adjoint.jl:327-345)."""

    def f_corr(u, t):
        g0 = gvec(u, t)
        if g0.ndim == 1:
            corr = 0.5 * _gg_jvp(gvec, u, t, g0)
        else:
            # Σ_j (∂g_j/∂u)·g_j over noise columns.
            def col(j):
                return jax.jvp(lambda uu: gvec(uu, t)[:, j], (u,),
                               (g0[:, j],))[1]

            corr = 0.5 * jnp.sum(
                jax.vmap(col)(jnp.arange(g0.shape[1])), axis=0
            )
        return fvec(u, t) - corr

    return f_corr


def stratonovich_to_ito_drift(fvec, gvec):
    """Inverse correction: f̃ = f + ½ (∂g/∂u)·g."""

    def f_corr(u, t):
        g0 = gvec(u, t)
        if g0.ndim == 1:
            corr = 0.5 * _gg_jvp(gvec, u, t, g0)
        else:
            def col(j):
                return jax.jvp(lambda uu: gvec(uu, t)[:, j], (u,),
                               (g0[:, j],))[1]

            corr = 0.5 * jnp.sum(
                jax.vmap(col)(jnp.arange(g0.shape[1])), axis=0
            )
        return fvec(u, t) + corr

    return f_corr


class ImplicitEM:
    """Drift-implicit Euler-Maruyama (stiff SDEs, reference ImplicitEM slot):
    u1 = u + dt·f(u1) + g(u)·ΔW, solved by a fixed-iteration Newton with the
    step-frozen W = I - dt·J."""

    name = "ImplicitEM"
    interpretation = "ito"
    order = 1

    def __init__(self, newton_iters: int = 6):
        self.newton_iters = newton_iters

    def __repr__(self):
        return "ImplicitEM()"

    def step(self, fvec, gvec, t, dt, u, dw):
        from jax.scipy.linalg import lu_factor, lu_solve

        n = u.shape[0]
        rhs_expl = u + _diffusion_term(gvec(u, t), dw)
        jac_fn = getattr(fvec, "jac", None)  # analytic hook (see sdirk.py)
        J = (jac_fn(u, t + dt) if jac_fn is not None
             else jax.jacfwd(lambda uu: fvec(uu, t + dt))(u))
        lu = lu_factor(jnp.eye(n, dtype=u.dtype) - dt * J)

        def body(_, u1):
            r = u1 - dt * fvec(u1, t + dt) - rhs_expl
            return u1 - lu_solve(lu, r)

        u0_guess = u + dt * fvec(u, t) + _diffusion_term(gvec(u, t), dw)
        return jax.lax.fori_loop(0, self.newton_iters, body, u0_guess)


class AdaptiveMilstein:
    """Adaptive Milstein on a VirtualBrownianTree (diagonal noise).

    Propagates the strong-1.0 Milstein step; the embedded error estimate is
    the Milstein–EM difference ½ g g' (ΔW² − h) — the leading term of EM's
    local strong error, available for free from the step itself (the
    "Milstein-based adaptive error" design; no step-doubling re-evaluation).
    Same consistency property as AdaptiveEM: every (re)step reads W from the
    same tree.
    """

    name = "AdaptiveMilstein"
    interpretation = "ito"
    order = 1
    n_stages = 2

    def __init__(self, gvec, vbt):
        self.gvec = gvec
        self.vbt = vbt

    def step(self, fvec, t, dt, u, f0):
        g = self.gvec
        dW = self.vbt(t + dt) - self.vbt(t)
        g0 = g(u, t)
        if g0.ndim != 1:
            raise NotImplementedError(
                "AdaptiveMilstein covers diagonal noise; use AdaptiveEM for "
                "general matrix noise"
            )
        corr = 0.5 * _gg_jvp(g, u, t, g0) * (dW ** 2 - dt)
        u1 = u + dt * f0 + g0 * dW + corr
        f1 = fvec(u1, t + dt)
        return u1, f1, corr


class AdaptiveEM:
    """Adaptive Euler-Maruyama on a VirtualBrownianTree.

    The payoff of counter-based noise (ops/brownian.py): step-doubling error
    control with CONSISTENT Brownian increments — the full step and the two
    half steps all read W from the same tree, so rejections and re-steps see
    the same path (torchsde-style adaptivity; impossible with stored
    per-step increments). Conforms to the ODE-stepper interface so the
    adaptive drivers can run it: drift fvec comes through `step`, diffusion
    and the tree are held by the stepper.

    err = |u_two_halves - u_full| (strong step-doubling estimate); the
    propagated state is the two-half-step solution.
    """

    name = "AdaptiveEM"
    interpretation = "ito"
    order = 1
    n_stages = 3

    def __init__(self, gvec, vbt):
        self.gvec = gvec
        self.vbt = vbt

    def step(self, fvec, t, dt, u, f0):
        g = self.gvec
        w0 = self.vbt(t)
        wm = self.vbt(t + 0.5 * dt)
        w1 = self.vbt(t + dt)
        dW = w1 - w0
        dW1 = wm - w0
        dW2 = w1 - wm

        u_full = u + dt * f0 + _diffusion_term(g(u, t), dW)
        uh = u + 0.5 * dt * f0 + _diffusion_term(g(u, t), dW1)
        u_two = uh + 0.5 * dt * fvec(uh, t + 0.5 * dt) + _diffusion_term(
            g(uh, t + 0.5 * dt), dW2
        )
        err = u_two - u_full
        f1 = fvec(u_two, t + dt)
        return u_two, f1, err
