"""Round-2 SDE upgrades: strong-1.5 Taylor scheme, Milstein-error
adaptivity, and the continuous-adjoint menu on the adaptive path.

Reference slots: SRIW1/SOSRI in StochasticDiffEq
(/root/reference/test/SDE3/sde_transformation_test.jl,
 test/Core4/sde_neural.jl), SDE checkpointing (test/SDE1/sde_checkpointing.jl).
Strategy (reference test style): fixed noise realization, cross-validate
adjoints against forward-mode / DirectAdjoint over the identical noise, and
measure strong convergence orders directly.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from scimlsensitivity_jl_tpu import (
    BacksolveAdjoint,
    DirectAdjoint,
    InterpolatingAdjoint,
    Milstein,
    SDEProblem,
    SOSRI,
    SRIW1,
    StrongTaylor15,
    solve,
)
from scimlsensitivity_jl_tpu.ops.brownian import grid_increment, grid_iterated
from scimlsensitivity_jl_tpu.solvers.sde import EulerMaruyama

MU, SIG = 1.2, 0.8


def _strong_error(scheme, needs_dz, levels, n_paths=300, K=9):
    """Path-averaged strong error of `scheme` on GBM at 2^level steps,
    driven by a shared fine grid so all levels see the same W."""
    T = 1.0
    nf = 2**K
    dtf = T / nf

    def fvec(u, t):
        return MU * u

    def gvec(u, t):
        return SIG * u

    def one_path(key, level):
        dWf = jax.vmap(
            lambda i: grid_increment(key, i, (), jnp.asarray(dtf))
        )(jnp.arange(nf))
        dZf = jax.vmap(
            lambda i: grid_iterated(key, i, (), jnp.asarray(dtf), dWf[i])
        )(jnp.arange(nf))
        Wn = jnp.concatenate([jnp.zeros(1), jnp.cumsum(dWf)])
        exact = jnp.exp((MU - 0.5 * SIG**2) * T + SIG * Wn[-1])
        m = 2**level
        step = nf // m
        dt = jnp.asarray(T / m)
        dW_c = dWf.reshape(m, step).sum(1)
        Wlo = Wn[:-1].reshape(m, step)
        dZ_c = (dZf.reshape(m, step) + (Wlo - Wlo[:, :1]) * dtf).sum(1)

        def body(u, j):
            t = j * dt
            if needs_dz:
                un = scheme.step(fvec, gvec, t, dt, u, dW_c[j][None],
                                 dZ_c[j][None])
            else:
                un = scheme.step(fvec, gvec, t, dt, u, dW_c[j][None])
            return un, None

        u, _ = jax.lax.scan(body, jnp.array([1.0]), jnp.arange(m))
        return jnp.abs(u[0] - exact)

    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(n_paths))
    return [
        float(jnp.mean(jax.vmap(lambda k: one_path(k, lv))(keys)))
        for lv in levels
    ]


def test_strong_orders_on_gbm():
    """Measured strong convergence slopes: EM ~0.5, Milstein ~1.0,
    StrongTaylor15 ~1.5 (this is the tableau-free verification that the
    Ito-Taylor scheme actually delivers the SRIW1-class order)."""
    levels = [3, 4, 5, 6]

    def slopes(errs):
        return [math.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]

    e_em = _strong_error(EulerMaruyama(), False, levels)
    e_mi = _strong_error(Milstein(), False, levels)
    e_t15 = _strong_error(StrongTaylor15(), True, levels)
    s_em = np.mean(slopes(e_em))
    s_mi = np.mean(slopes(e_mi))
    s_t15 = np.mean(slopes(e_t15))
    assert 0.35 < s_em < 0.75, (s_em, e_em)
    assert 0.8 < s_mi < 1.25, (s_mi, e_mi)
    assert 1.3 < s_t15 < 1.8, (s_t15, e_t15)
    # and at equal steps the higher-order scheme is far more accurate
    assert e_t15[-1] < 0.12 * e_mi[-1] < 0.12 * e_em[-1]


def _gbm_prob(p, u0):
    return SDEProblem(lambda u, pp, t: pp[0] * u,
                      lambda u, pp, t: pp[1] * u,
                      u0, (0.0, 1.0), p, noise="diagonal")


def test_taylor15_fixed_grid_adjoints():
    """Taylor15 on a fixed grid under the full discrete adjoint menu; the
    sriw1/sosri aliases route to the same scheme."""
    p = jnp.array([1.1, 0.4])
    u0 = jnp.array([1.0, 0.5])
    ts = jnp.linspace(0.0, 1.0, 5)

    def loss(pp, alg, sch):
        sol = solve(_gbm_prob(pp, u0), sch, dt=1 / 64, saveat=ts,
                    sensealg=alg)
        return jnp.sum(sol.ys**2)

    g_d = np.asarray(jax.grad(
        lambda pp: loss(pp, DirectAdjoint(), StrongTaylor15()))(p))
    g_i = np.asarray(jax.grad(
        lambda pp: loss(pp, InterpolatingAdjoint(), StrongTaylor15()))(p))
    g_b = np.asarray(jax.grad(
        lambda pp: loss(pp, BacksolveAdjoint(), StrongTaylor15()))(p))
    np.testing.assert_allclose(g_i, g_d, rtol=1e-10)
    np.testing.assert_allclose(g_b, g_d, rtol=1e-4)
    g_alias = np.asarray(jax.grad(
        lambda pp: loss(pp, DirectAdjoint(), SRIW1()))(p))
    np.testing.assert_allclose(g_alias, g_d, rtol=1e-12)
    g_alias2 = np.asarray(jax.grad(
        lambda pp: loss(pp, DirectAdjoint(), SOSRI()))(p))
    np.testing.assert_allclose(g_alias2, g_d, rtol=1e-12)


def test_adaptive_sde_adjoint_menu():
    """The adaptive (VirtualBrownianTree) path now supports the continuous
    adjoint menu: InterpolatingAdjoint is the exact discrete adjoint of the
    realized scheme; BacksolveAdjoint reconstructs states backwards from the
    same tree with save-node snaps (round-1 verdict item 5)."""
    p = jnp.array([1.1, 0.4])
    u0 = jnp.array([1.0, 0.5])
    ts = jnp.linspace(0.0, 1.0, 5)

    def loss(pp, alg, sch):
        sol = solve(_gbm_prob(pp, u0), sch, saveat=ts, sensealg=alg,
                    rtol=1e-4, atol=1e-7, max_steps=4096)
        return jnp.sum(sol.ys**2)

    for sch in [None, Milstein()]:
        g_d = np.asarray(jax.grad(
            lambda pp: loss(pp, DirectAdjoint(), sch))(p))
        g_i = np.asarray(jax.grad(
            lambda pp: loss(pp, InterpolatingAdjoint(), sch))(p))
        g_b = np.asarray(jax.grad(
            lambda pp: loss(pp, BacksolveAdjoint(), sch))(p))
        np.testing.assert_allclose(g_i, g_d, rtol=1e-9)
        np.testing.assert_allclose(g_b, g_d, rtol=1e-3)


def test_adaptive_adjoint_vs_forward_mode_same_noise():
    """Adjoint gradients cross-validated against FORWARD mode (jvp through
    the adaptive scan) over the identical VBT noise — the reference's SDE
    test strategy (fixed noise process, adjoint vs ForwardDiff;
    test/SDE3/sde_transformation_test.jl)."""
    p = jnp.array([1.1, 0.4])
    u0 = jnp.array([1.0, 0.5])
    ts = jnp.linspace(0.0, 1.0, 5)

    def loss(pp, alg):
        sol = solve(_gbm_prob(pp, u0), None, saveat=ts, sensealg=alg,
                    rtol=1e-4, atol=1e-7, max_steps=4096)
        return jnp.sum(sol.ys**2)

    g_rev = np.asarray(jax.grad(lambda pp: loss(pp, DirectAdjoint()))(p))
    # forward mode: one jvp per parameter direction through the same solve
    g_fwd = np.zeros(2)
    for i in range(2):
        e = jnp.zeros(2).at[i].set(1.0)
        _, dv = jax.jvp(lambda pp: loss(pp, DirectAdjoint()), (p,), (e,))
        g_fwd[i] = float(dv)
    np.testing.assert_allclose(g_rev, g_fwd, rtol=1e-9)


def test_adaptive_milstein_beats_em_accuracy():
    """Adaptive Milstein propagates a strong-1.0 solution while EM is stuck
    at strong 0.5: against the EXACT GBM endpoint evaluated on the same
    Brownian tree, the Milstein path is an order of magnitude closer at
    tight tolerance (the payoff of the Milstein-based error control)."""
    from scimlsensitivity_jl_tpu.ops.brownian import VirtualBrownianTree

    mu, sig = 1.1, 0.4
    p = jnp.array([mu, sig])
    u0 = jnp.array([1.0, 0.5])
    vbt = VirtualBrownianTree.create(jax.random.PRNGKey(0), 0.0, 1.0,
                                     shape=(2,), depth=28, dtype=jnp.float64)
    W1 = np.asarray(vbt(jnp.asarray(1.0)))
    exact = np.asarray(u0) * np.exp((mu - 0.5 * sig**2) + sig * W1)

    sol_em = solve(_gbm_prob(p, u0), None, saveat=jnp.array([0.0, 1.0]),
                   sensealg=DirectAdjoint(), rtol=1e-5, atol=1e-8,
                   max_steps=32768)
    sol_mi = solve(_gbm_prob(p, u0), Milstein(), saveat=jnp.array([0.0, 1.0]),
                   sensealg=DirectAdjoint(), rtol=1e-5, atol=1e-8,
                   max_steps=32768)
    assert int(sol_em.retcode) == 0 and int(sol_mi.retcode) == 0
    err_em = float(np.max(np.abs(np.asarray(sol_em.ys[-1]) - exact)))
    err_mi = float(np.max(np.abs(np.asarray(sol_mi.ys[-1]) - exact)))
    assert err_mi < 0.2 * err_em, (err_mi, err_em)


def test_rode_continuous_adjoint_menu():
    """RODE adjoint menu (reference RODEAdjointProblem,
    interpolating_adjoint.jl:615-746, backsolve_adjoint.jl:421-521): the
    stored-trajectory and backward-reconstructed discrete adjoints agree
    with plain reverse AD through the scan to machine precision."""
    from scimlsensitivity_jl_tpu import RODEProblem
    from scimlsensitivity_jl_tpu.adjoints.sde import solve_rode

    def f(u, p, t, W):
        return -p[0] * u + p[1] * jnp.sin(W)

    p = jnp.array([1.2, 0.7])
    u0 = jnp.array([1.0, 0.5])
    ts = jnp.linspace(0.0, 1.0, 5)

    def loss(pp, alg):
        sol = solve_rode(RODEProblem(f, u0, (0.0, 1.0), pp), dt=1 / 128,
                         saveat=ts, sensealg=alg)
        return jnp.sum(sol.ys**2)

    g_d = np.asarray(jax.grad(lambda pp: loss(pp, DirectAdjoint()))(p))
    g_i = np.asarray(jax.grad(
        lambda pp: loss(pp, InterpolatingAdjoint()))(p))
    g_b = np.asarray(jax.grad(lambda pp: loss(pp, BacksolveAdjoint()))(p))
    np.testing.assert_allclose(g_i, g_d, rtol=1e-12)
    np.testing.assert_allclose(g_b, g_d, rtol=1e-10)


# ---------------------------------------------------------------------------
# RKMilGeneral: non-commutative (general) noise at strong order 1
# (reference slot: StochasticDiffEq's RKMilGeneral; adjoint-test strategy
# mirrors /root/reference/test/SDE2/sde_nondiag_stratonovich.jl — fixed
# noise, adjoint vs forward-mode over the identical realization).
# ---------------------------------------------------------------------------

def _noncommutative_g(u, q, t):
    """g columns g₁ = [q1·u2, 0.1·u1], g₂ = [q3·u1, q2·u1]:
    L¹g₂ = [q3·q1·u2, q2·q1·u2] ≠ L²g₁ = [q1·q2·u1, 0.1·q3·u1]
    — genuinely non-commutative (cross-coupled diffusion)."""
    col1 = jnp.stack([q[1] * u[1], 0.1 * u[0]])
    col2 = jnp.stack([q[3] * u[0], q[2] * u[0]])
    return jnp.stack([col1, col2], axis=1)


def test_rkmilgeneral_reduces_to_commutative_milstein():
    """On COMMUTATIVE matrix noise the Lévy-area contraction Σ D_jk·A_jk is
    symmetric×antisymmetric = 0 analytically, so RKMilGeneral must reproduce
    Milstein(commutative=True) paths to roundoff — a direct check of the
    iterated-integral wiring."""
    from scimlsensitivity_jl_tpu import RKMilGeneral

    key = jax.random.PRNGKey(3)
    p = jnp.array([0.1, 0.4, 0.25])
    u0 = jnp.array([1.0, 2.0])

    def g(u, q, t):
        return jnp.stack([q[1] * u, q[2] * u], axis=1)  # commutative

    def run(solver):
        prob = SDEProblem(lambda u, q, t: q[0] * u, g, u0, (0.0, 1.0), p,
                          noise="general", noise_dim=2)
        return solve(prob, solver, dt=1e-2, key=key).ys[-1]

    a = run(Milstein(commutative=True))
    b = run(RKMilGeneral(levy_terms=8))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-12, atol=1e-12)


def test_plain_milstein_rejects_matrix_noise():
    """ADVICE r3: plain Milstein must not silently assume commutativity."""
    import pytest

    p = jnp.array([0.1, 0.4, 0.25, 0.3])
    prob = SDEProblem(lambda u, q, t: q[0] * u, _noncommutative_g,
                      jnp.array([1.0, 0.5]), (0.0, 1.0), p,
                      noise="general", noise_dim=2)
    with pytest.raises(NotImplementedError, match="commutative"):
        solve(prob, Milstein(), dt=1e-2, key=jax.random.PRNGKey(0))


def test_levy_area_statistics():
    """Truncated KP series: antisymmetric by construction, mean 0, and
    Var(A_jk) → h²/4 (exact Lévy-area variance for j≠k) as terms grow."""
    from scimlsensitivity_jl_tpu.ops.brownian import grid_levy_area

    key = jax.random.PRNGKey(42)
    h = 0.25
    n_samp = 4000

    def one(i):
        dw = grid_increment(key, i, (2,), jnp.asarray(h))
        return grid_levy_area(key, i, 2, jnp.asarray(h), dw, terms=400)

    A = jax.vmap(one)(jnp.arange(n_samp))
    np.testing.assert_allclose(np.asarray(A[:, 0, 1]), -np.asarray(A[:, 1, 0]),
                               rtol=0, atol=1e-12)
    assert abs(float(A[:, 0, 1].mean())) < 0.05 * h
    var = float(jnp.var(A[:, 0, 1]))
    # truncated series variance is below the exact h²/4 by the O(1/P) tail
    assert 0.85 * h**2 / 4 < var < 1.1 * h**2 / 4, var


def test_rkmilgeneral_strong_order_one_noncommutative():
    """Strong order 1 on a non-commutative linear SDE, measured against a
    fine-grid self-reference over the CONSISTENT path: coarse iterated
    integrals are aggregated from fine ones by the chaining identity
    I_c(j,k) = Σ_m [I_f(j,k),m + (W_j(t_m)−W_j(0))·δW_k,m] — so every level
    sees the same Brownian path AND the same Lévy areas."""
    from scimlsensitivity_jl_tpu import RKMilGeneral
    from scimlsensitivity_jl_tpu.ops.brownian import grid_levy_area

    T = 1.0
    K = 10
    nf = 2**K
    dtf = T / nf
    p = jnp.array([0.05, 0.35, 0.3, 0.25])
    u0 = jnp.array([1.0, 0.5])
    solver = RKMilGeneral(levy_terms=12)

    def fvec_of(q):
        return lambda u, t: q[0] * u

    def gvec_of(q):
        return lambda u, t: _noncommutative_g(u, q, t)

    def one_path(key, level):
        q = p
        fvec, gvec = fvec_of(q), gvec_of(q)
        dWf = jax.vmap(
            lambda i: grid_increment(key, i, (2,), jnp.asarray(dtf))
        )(jnp.arange(nf))
        Af = jax.vmap(
            lambda i: grid_levy_area(key, i, 2, jnp.asarray(dtf), dWf[i],
                                     terms=12)
        )(jnp.arange(nf))
        # fine iterated integrals I_f(j,k) = ½δWjδWk − ½h δjk + A
        eye = jnp.eye(2)
        If = (0.5 * (dWf[:, :, None] * dWf[:, None, :] - dtf * eye)
              + Af)

        # fine reference solve
        def fine_step(u, m):
            t = m * dtf
            u1 = solver.step(fvec, gvec, t, dtf, u, dWf[m], Af[m])
            return u1, None
        uref, _ = jax.lax.scan(fine_step, u0, jnp.arange(nf))

        # coarse solve with aggregated noise
        mth = 2**level
        sub = nf // mth
        dWc = dWf.reshape(mth, sub, 2).sum(1)
        Wf_local = jnp.cumsum(dWf.reshape(mth, sub, 2), axis=1)
        W_before = Wf_local - dWf.reshape(mth, sub, 2)  # W_j(t_m)−W_j(t0_blk)
        cross = jnp.einsum("csj,csk->cjk", W_before, dWf.reshape(mth, sub, 2))
        Ic = If.reshape(mth, sub, 2, 2).sum(1) + cross
        Ac = 0.5 * (Ic - jnp.swapaxes(Ic, -1, -2))
        dtc = T / mth

        def coarse_step(u, m):
            t = m * dtc
            u1 = solver.step(fvec, gvec, t, dtc, u, dWc[m], Ac[m])
            return u1, None
        uc, _ = jax.lax.scan(coarse_step, u0, jnp.arange(mth))
        return jnp.max(jnp.abs(uc - uref))

    keys = jnp.arange(200)
    def err_at(level):
        return float(jax.vmap(
            lambda s: one_path(jax.random.PRNGKey(s), level)
        )(keys).mean())

    e4 = err_at(4)   # dt = 1/16
    e7 = err_at(7)   # dt = 1/128
    slope = math.log(e4 / e7) / math.log(2**3)
    assert slope > 0.8, (e4, e7, slope)


def test_rkmilgeneral_gradient_adjoint_vs_forward():
    """Non-diagonal-noise gradients (reference
    test/SDE2/sde_nondiag_stratonovich.jl strategy): fixed noise realization,
    reverse adjoints vs jacfwd THROUGH the same solver — exact discrete
    agreement expected."""
    from scimlsensitivity_jl_tpu import RKMilGeneral

    key = jax.random.PRNGKey(17)
    u0 = jnp.array([1.0, 0.5])
    p = jnp.array([0.2, 0.3, 0.15, 0.25])

    def loss_with(sensealg):
        def loss(q):
            prob = SDEProblem(lambda u, qq, t: qq[0] * u, _noncommutative_g,
                              u0, (0.0, 0.5), q, noise="general", noise_dim=2)
            sol = solve(prob, RKMilGeneral(levy_terms=10), dt=1e-2, key=key,
                        sensealg=sensealg)
            return jnp.sum(sol.ys[-1] ** 2)
        return loss

    g_fwd = jax.jacfwd(loss_with(DirectAdjoint()))(p)
    for sa in [DirectAdjoint(), InterpolatingAdjoint(), BacksolveAdjoint()]:
        g_rev = jax.grad(loss_with(sa))(p)
        np.testing.assert_allclose(np.asarray(g_rev), np.asarray(g_fwd),
                                   rtol=1e-4, atol=1e-9,
                                   err_msg=repr(sa))
