"""SDE tests (reference strategy, SURVEY §4 SDE groups: fixed noise process,
compare adjoint vs forward-mode over the SAME noise realization; weak
statistics for scheme correctness; Ito<->Stratonovich conversion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scimlsensitivity_jl_tpu import (
    BacksolveAdjoint,
    DirectAdjoint,
    InterpolatingAdjoint,
    ODEProblem,
    SDEProblem,
    solve,
)
from scimlsensitivity_jl_tpu.solvers.sde import EulerHeun, EulerMaruyama, Milstein

KEY = jax.random.PRNGKey(42)


def test_gbm_weak_mean():
    # dX = mu X dt + sigma X dW ; E[X(T)] = X0 exp(mu T).
    mu, sigma, T = 0.3, 0.4, 1.0

    def run(key):
        prob = SDEProblem(
            lambda u, p, t: p[0] * u,
            lambda u, p, t: p[1] * u,
            jnp.array([1.0]), (0.0, T), jnp.array([mu, sigma]),
        )
        return solve(prob, EulerMaruyama(), dt=1e-3, key=key).ys[-1, 0]

    keys = jax.random.split(KEY, 4000)
    vals = jax.vmap(run)(keys)
    assert np.isclose(float(vals.mean()), np.exp(mu * T), rtol=2e-2)


def test_milstein_strong_order_vs_exact_gbm():
    # GBM has exact solution X = X0 exp((mu - sigma^2/2) t + sigma W_t).
    mu, sigma, T = 0.2, 0.5, 1.0
    p = jnp.array([mu, sigma])

    def path_err(key, dt):
        prob = SDEProblem(
            lambda u, pp, t: pp[0] * u,
            lambda u, pp, t: pp[1] * u,
            jnp.array([1.0]), (0.0, T), p,
        )
        sol = solve(prob, Milstein(), dt=dt, key=key)
        # Reconstruct the same W_T from the same counter-based increments.
        from scimlsensitivity_jl_tpu.ops.brownian import grid_increment
        n = int(round(T / dt))
        incs = jax.vmap(lambda i: grid_increment(key, i, (1,), dt))(jnp.arange(n))
        WT = jnp.sum(incs)
        exact = jnp.exp((mu - 0.5 * sigma ** 2) * T + sigma * WT)
        return jnp.abs(sol.ys[-1, 0] - exact)

    keys = jax.random.split(KEY, 200)
    e1 = float(jax.vmap(lambda k: path_err(k, 1e-2))(keys).mean())
    e2 = float(jax.vmap(lambda k: path_err(k, 1e-3))(keys).mean())
    # Strong order 1: error ratio ~ 10.
    assert e1 / e2 > 5.0, (e1, e2)


def test_ito_stratonovich_consistency():
    # Same Ito problem via EM (Ito) and via EulerHeun (Strat solver with
    # auto drift conversion) must agree pathwise as dt -> 0.
    p = jnp.array([0.2, 0.5])
    prob = SDEProblem(
        lambda u, pp, t: pp[0] * u,
        lambda u, pp, t: pp[1] * u,
        jnp.array([1.0]), (0.0, 1.0), p, interpretation="ito",
    )
    a = solve(prob, EulerMaruyama(), dt=2e-4, key=KEY).ys[-1, 0]
    b = solve(prob, EulerHeun(), dt=2e-4, key=KEY).ys[-1, 0]
    assert np.isclose(float(a), float(b), rtol=2e-2)


def _sde_loss(sensealg, key, dt=1e-2):
    ts = jnp.linspace(0.0, 1.0, 6)

    def loss(p):
        prob = SDEProblem(
            lambda u, pp, t: jnp.stack([pp[0] * u[0] - pp[1] * u[0] * u[1],
                                        -pp[2] * u[1] + pp[3] * u[0] * u[1]]),
            lambda u, pp, t: 0.1 * u,
            jnp.array([1.0, 1.0]), (0.0, 1.0), p, interpretation="ito",
        )
        sol = solve(prob, EulerMaruyama(), dt=dt, saveat=ts, key=key,
                    sensealg=sensealg)
        return jnp.sum((sol.ys - 1.0) ** 2)

    return loss


def test_sde_direct_adjoint_vs_fd():
    p0 = jnp.array([1.5, 1.0, 3.0, 1.0])
    loss = _sde_loss(DirectAdjoint(), KEY)
    g = jax.grad(loss)(p0)
    eps = 1e-6
    g_fd = np.zeros(4)
    for i in range(4):
        pp = np.asarray(p0).copy(); pp[i] += eps
        pm = np.asarray(p0).copy(); pm[i] -= eps
        g_fd[i] = (loss(jnp.asarray(pp)) - loss(jnp.asarray(pm))) / (2 * eps)
    assert np.allclose(g, g_fd, rtol=1e-6, atol=1e-8)


def test_sde_interpolating_adjoint_exact():
    # Stored-trajectory discrete adjoint == autodiff-through-scan gradients.
    p0 = jnp.array([1.5, 1.0, 3.0, 1.0])
    g_direct = jax.grad(_sde_loss(DirectAdjoint(), KEY))(p0)
    g_interp = jax.grad(_sde_loss(InterpolatingAdjoint(), KEY))(p0)
    assert np.allclose(g_interp, g_direct, rtol=1e-10)


def test_sde_backsolve_adjoint_close():
    # O(1)-memory reconstruction: approximate, checkpoint-snapped at 6 save
    # nodes; must match the exact discrete adjoint to reconstruction error.
    p0 = jnp.array([1.5, 1.0, 3.0, 1.0])
    dt = 1e-3
    g_direct = jax.grad(_sde_loss(DirectAdjoint(), KEY, dt))(p0)
    g_back = jax.grad(_sde_loss(BacksolveAdjoint(), KEY, dt))(p0)
    assert np.allclose(g_back, g_direct, rtol=2e-2), (g_back, g_direct)


def test_sde_u0_gradient():
    key = jax.random.PRNGKey(7)

    def loss(u0, sensealg):
        prob = SDEProblem(
            lambda u, p, t: -u, lambda u, p, t: 0.2 * jnp.ones_like(u),
            u0, (0.0, 1.0), None,
        )
        sol = solve(prob, EulerMaruyama(), dt=1e-2, key=key, sensealg=sensealg)
        return jnp.sum(sol.ys[-1] ** 2)

    u0 = jnp.array([1.0, -0.5])
    g_d = jax.grad(lambda u: loss(u, DirectAdjoint()))(u0)
    g_i = jax.grad(lambda u: loss(u, InterpolatingAdjoint()))(u0)
    assert np.allclose(g_d, g_i, rtol=1e-10)


def test_scalar_and_general_noise():
    key = jax.random.PRNGKey(3)
    # scalar noise: one Wiener process shared
    prob_s = SDEProblem(
        lambda u, p, t: -u, lambda u, p, t: 0.3 * jnp.ones_like(u),
        jnp.array([1.0, 2.0]), (0.0, 0.5), None, noise="scalar",
    )
    sol_s = solve(prob_s, EulerMaruyama(), dt=1e-2, key=key)
    assert sol_s.ys.shape == (2, 2)

    # general (n x m) noise matrix
    G = jnp.array([[0.1, 0.0], [0.05, 0.2]])
    prob_g = SDEProblem(
        lambda u, p, t: -u, lambda u, p, t: G,
        jnp.array([1.0, 2.0]), (0.0, 0.5), None, noise="general", noise_dim=2,
    )
    sol_g = solve(prob_g, EulerMaruyama(), dt=1e-2, key=key)
    assert sol_g.ys.shape == (2, 2)
    assert np.all(np.isfinite(sol_g.ys))

    # gradient through general noise (Direct)
    def loss(u0):
        pr = SDEProblem(lambda u, p, t: -u, lambda u, p, t: G, u0,
                        (0.0, 0.5), None, noise="general", noise_dim=2)
        return jnp.sum(solve(pr, EulerMaruyama(), dt=1e-2, key=key).ys ** 2)

    g = jax.grad(loss)(jnp.array([1.0, 2.0]))
    assert np.all(np.isfinite(g))


def test_implicit_em_stiff_sde():
    # stiff linear SDE: dX = -50 X dt + 0.1 dW. Explicit EM at dt=0.05 is
    # unstable (|1 - 50*0.05| = 1.5 > 1); drift-implicit EM is stable.
    from scimlsensitivity_jl_tpu.solvers.sde import ImplicitEM

    prob = SDEProblem(
        lambda u, p, t: -50.0 * u,
        lambda u, p, t: 0.1 * jnp.ones_like(u),
        jnp.array([1.0]), (0.0, 2.0), None,
    )
    sol_exp = solve(prob, EulerMaruyama(), dt=0.05, key=KEY)
    sol_imp = solve(prob, ImplicitEM(), dt=0.05, key=KEY)
    assert not np.all(np.abs(np.asarray(sol_exp.ys[-1])) < 1.0)  # blew up
    assert np.all(np.abs(np.asarray(sol_imp.ys[-1])) < 0.5)      # stable

    # gradient flows through the implicit step (Direct)
    def loss(u0):
        pr = SDEProblem(lambda u, p, t: -50.0 * u,
                        lambda u, p, t: 0.1 * jnp.ones_like(u),
                        u0, (0.0, 0.2), None)
        return jnp.sum(solve(pr, ImplicitEM(), dt=0.01, key=KEY).ys ** 2)

    g = jax.grad(loss)(jnp.array([1.0]))
    assert np.all(np.isfinite(g))


def test_bfloat16_forward():
    # bf16 neural-ODE forward runs and stays finite (TPU-native dtype)
    from scimlsensitivity_jl_tpu.models.neural_ode import mlp_apply, mlp_init
    from scimlsensitivity_jl_tpu import ODEProblem, Tsit5

    params = mlp_init(jax.random.PRNGKey(0), (2, 16, 2), jnp.bfloat16)
    u0 = jnp.array([1.0, 0.5], jnp.bfloat16)
    prob = ODEProblem(lambda u, p, t: mlp_apply(p, jnp.tanh(u)), u0,
                      (0.0, 1.0), params)
    sol = solve(prob, Tsit5(), dt=1.0 / 32, adaptive=False)
    assert sol.ys.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(sol.ys, np.float32)))


def test_adaptive_sde_vbt():
    # adaptive EM on the VirtualBrownianTree: GBM vs its exact solution
    # under the SAME W_T read from the same tree.
    from scimlsensitivity_jl_tpu.ops.brownian import VirtualBrownianTree

    mu, sigma = 0.2, 0.3
    p = jnp.array([mu, sigma])
    key = jax.random.PRNGKey(9)
    prob = SDEProblem(
        lambda u, pp, t: pp[0] * u, lambda u, pp, t: pp[1] * u,
        jnp.array([1.0]), (0.0, 1.0), p,
    )
    sol = solve(prob, saveat=jnp.array([0.0, 1.0]), key=key,
                rtol=1e-5, atol=1e-8, max_steps=8192)
    assert int(sol.retcode) == 0
    vbt = VirtualBrownianTree.create(key, 0.0, 1.0, shape=(1,), depth=28,
                                     dtype=jnp.float64)
    WT = vbt(jnp.asarray(1.0))[0]
    exact = float(jnp.exp((mu - 0.5 * sigma ** 2) * 1.0 + sigma * WT))
    # strong pathwise convergence (previsible controller => unbiased)
    assert np.isclose(float(sol.ys[-1, 0]), exact, rtol=3e-3), (
        float(sol.ys[-1, 0]), exact)

    # gradients through the adaptive path (reverse AD through the scan)
    def loss(pp):
        pr = SDEProblem(lambda u, q, t: q[0] * u, lambda u, q, t: q[1] * u,
                        jnp.array([1.0]), (0.0, 1.0), pp)
        s = solve(pr, key=key, rtol=1e-4, atol=1e-7, max_steps=4096)
        return s.ys[-1, 0]

    g = jax.grad(loss)(p)
    # plain FD is noise-dominated here (the step grid changes with p while
    # the pathwise solution error is O(strong error)); compare against the
    # exact pathwise gradients of GBM instead:
    #   dL/dmu = u_T * T,  dL/dsigma = u_T * (W_T - sigma*T)
    uT = float(loss(p))
    assert np.isclose(float(g[0]), uT * 1.0, rtol=2e-2), (float(g[0]), uT)
    assert np.isclose(float(g[1]), uT * (float(WT) - sigma), rtol=2e-2)


def test_sra1_weak_order2_ou():
    # OU: dX = -theta X dt + sigma dW. SRA1 (additive noise, weak order 2)
    # must nail both moments at a coarse dt where EM's O(h) bias is visible.
    # Exact: E = u0 e^{-theta T};  Var = sigma^2 (1 - e^{-2 theta T})/(2 theta).
    from scimlsensitivity_jl_tpu.solvers.sde import SRA1

    theta, sigma, T, dt = 3.0, 1.0, 1.0, 1.0 / 16

    def run(solver, key):
        prob = SDEProblem(
            lambda u, p, t: -p[0] * u,
            lambda u, p, t: p[1] * jnp.ones_like(u),
            jnp.array([1.0]), (0.0, T), jnp.array([theta, sigma]),
        )
        return solve(prob, solver, dt=dt, key=key).ys[-1, 0]

    keys = jax.random.split(jax.random.PRNGKey(7), 16384)
    xs_sra = jax.vmap(lambda k: run(SRA1(), k))(keys)
    xs_em = jax.vmap(lambda k: run(EulerMaruyama(), k))(keys)

    mean_exact = float(np.exp(-theta * T))
    var_exact = sigma ** 2 * (1 - np.exp(-2 * theta * T)) / (2 * theta)

    m_sra, v_sra = float(xs_sra.mean()), float(xs_sra.var())
    m_em, v_em = float(xs_em.mean()), float(xs_em.var())

    # SRA1 bias ~1e-3 on both moments at this dt (MC 3sigma ~ 8e-3 on var)
    assert abs(m_sra - mean_exact) < 8e-3, (m_sra, mean_exact)
    assert abs(v_sra - var_exact) < 1e-2, (v_sra, var_exact)
    # EM bias at dt=1/16: mean ~ -0.014, var ~ +0.017 — strictly worse
    assert abs(m_em - mean_exact) > abs(m_sra - mean_exact)
    assert abs(v_em - var_exact) > abs(v_sra - var_exact)


def test_sra1_time_dependent_g():
    # dX = -theta X dt + sigma (1+t) dW: exercises the beta-weighted
    # g(t) / g(t+h) combination.  Var(X_T) = sigma^2 int_0^T e^{-2 theta (T-s)}
    # (1+s)^2 ds (computed numerically).
    from scimlsensitivity_jl_tpu.solvers.sde import SRA1

    theta, sigma, T = 2.0, 0.5, 1.0

    def run(key):
        prob = SDEProblem(
            lambda u, p, t: -p[0] * u,
            lambda u, p, t: p[1] * (1.0 + t) * jnp.ones_like(u),
            jnp.array([0.0]), (0.0, T), jnp.array([theta, sigma]),
        )
        return solve(prob, SRA1(), dt=1.0 / 16, key=key).ys[-1, 0]

    keys = jax.random.split(jax.random.PRNGKey(11), 16384)
    xs = jax.vmap(run)(keys)
    s = np.linspace(0.0, T, 100001)
    var_exact = sigma ** 2 * np.trapezoid(
        np.exp(-2 * theta * (T - s)) * (1 + s) ** 2, s
    )
    assert abs(float(xs.mean())) < 8e-3
    assert abs(float(xs.var()) - var_exact) < 1.5e-2, (float(xs.var()), var_exact)


def test_sra1_deterministic_drift_order2():
    # With g == 0 SRA1 reduces to Ralston RK2 on the drift: halving dt must
    # cut the error ~4x (order 2) on a nonlinear ODE.
    from scimlsensitivity_jl_tpu.solvers.sde import SRA1

    def run(dt):
        prob = SDEProblem(
            lambda u, p, t: u * (1.0 - u),
            lambda u, p, t: jnp.zeros_like(u),
            jnp.array([0.1]), (0.0, 2.0), None,
        )
        return float(solve(prob, SRA1(), dt=dt, key=KEY).ys[-1, 0])

    exact = 0.1 * np.exp(2.0) / (1 - 0.1 + 0.1 * np.exp(2.0))
    e1 = abs(run(1.0 / 8) - exact)
    e2 = abs(run(1.0 / 16) - exact)
    assert e1 / e2 > 3.4, (e1, e2)


def test_sra1_gradient_vs_fd():
    # Pathwise gradient through the SRA1 scheme (DirectAdjoint) against
    # same-key central finite differences.
    from scimlsensitivity_jl_tpu.solvers.sde import SRA1

    p0 = jnp.array([1.5, 0.3])

    def loss(p):
        prob = SDEProblem(
            lambda u, q, t: -q[0] * u,
            lambda u, q, t: q[1] * (1.0 + 0.5 * t) * jnp.ones_like(u),
            jnp.array([1.0]), (0.0, 1.0), p,
        )
        return jnp.sum(solve(prob, SRA1(), dt=1.0 / 32, key=KEY,
                             sensealg=DirectAdjoint()).ys[-1] ** 2)

    g = jax.grad(loss)(p0)
    eps = 1e-6
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (loss(p0 + e) - loss(p0 - e)) / (2 * eps)
        assert np.isclose(float(g[i]), float(fd), rtol=1e-5), (i, g[i], fd)


def test_noise_grid_user_supplied_path():
    """Round-2 VERDICT missing #6: user-supplied noise (NoiseGrid analogue,
    DiffEqNoiseProcess / SURVEY §2 item 7). Trajectory matches the manual
    EM recursion over the given increments bitwise-ish; adjoint gradients
    match forward mode over the SAME path; a GBM diffusion coefficient is
    recoverable from a trajectory generated on a given path."""
    from scimlsensitivity_jl_tpu import InterpolatingAdjoint, NoiseGrid
    from scimlsensitivity_jl_tpu.ops.brownian import grid_path

    a_true, b_true = 0.5, 0.3
    u0 = jnp.array([1.0])
    dt = 0.01
    n_steps = 100
    ts_nodes = jnp.arange(n_steps + 1) * dt
    W = grid_path(jax.random.PRNGKey(7), n_steps, (1,), dt)
    ng = NoiseGrid(ts=ts_nodes, W=W)

    def make_prob(p):
        return SDEProblem(
            f=lambda u, pp, t: pp[0] * u,
            g=lambda u, pp, t: pp[1] * u,
            u0=u0, tspan=(0.0, 1.0), p=p, noise="diagonal",
            noise_process=ng)

    saveat = jnp.linspace(0.0, 1.0, 11)
    p = jnp.array([a_true, b_true])
    sol = solve(make_prob(p), dt=dt, saveat=saveat)
    u = 1.0
    for i in range(n_steps):
        dw = float(W[i + 1, 0] - W[i, 0])
        u = u + a_true * u * dt + b_true * u * dw
    assert abs(u - float(sol.ys[-1, 0])) < 1e-12

    def loss(pp, sa):
        s = solve(make_prob(pp), dt=dt, saveat=saveat, sensealg=sa)
        return jnp.sum(s.ys ** 2)

    g_adj = jax.grad(lambda pp: loss(pp, InterpolatingAdjoint()))(p)
    v = jnp.array([0.3, -0.7])
    _, dv = jax.jvp(lambda pp: loss(pp, None), (p,), (v,))
    assert abs(float(g_adj @ v) - float(dv)) < 1e-9

    # grid mismatch is rejected eagerly
    bad = NoiseGrid(ts=ts_nodes + 0.5 * dt, W=W)
    with pytest.raises(ValueError, match="solve grid"):
        solve(SDEProblem(f=lambda u, pp, t: u, g=lambda u, pp, t: u,
                         u0=u0, tspan=(0.0, 1.0), p=p,
                         noise_process=bad), dt=dt, saveat=saveat)


def test_noise_callable_path():
    """A callable W(t) (e.g. a VirtualBrownianTree) drives the solve."""
    from scimlsensitivity_jl_tpu import VirtualBrownianTree

    vbt = VirtualBrownianTree.create(jax.random.PRNGKey(3), 0.0, 1.0,
                                     shape=(1,))
    prob = SDEProblem(
        f=lambda u, pp, t: pp[0] * u, g=lambda u, pp, t: pp[1] * u,
        u0=jnp.array([1.0]), tspan=(0.0, 1.0), p=jnp.array([0.5, 0.3]),
        noise_process=lambda t: vbt(t))
    s = solve(prob, dt=0.01, saveat=jnp.linspace(0.0, 1.0, 5))
    assert np.all(np.isfinite(np.asarray(s.ys)))


def test_rode_noise_process():
    """RODE with a user-supplied path (NoiseGrid): bitwise match with the
    manual Euler recursion over the same path; adjoint matches jvp."""
    from scimlsensitivity_jl_tpu import InterpolatingAdjoint, NoiseGrid
    from scimlsensitivity_jl_tpu.ops.brownian import grid_path
    from scimlsensitivity_jl_tpu.problems import RODEProblem

    dt = 0.01
    n_steps = 100
    ts_nodes = jnp.arange(n_steps + 1) * dt
    W = grid_path(jax.random.PRNGKey(5), n_steps, (1,), dt)
    ng = NoiseGrid(ts=ts_nodes, W=W)

    def f(u, p, t, w):
        return -p[0] * u + p[1] * w

    p = jnp.array([1.0, 0.5])
    prob = RODEProblem(f, jnp.array([1.0]), (0.0, 1.0), p, noise_process=ng)
    sol = solve(prob, dt=dt, saveat=jnp.array([0.0, 0.5, 1.0]))
    u = 1.0
    for i in range(n_steps):
        u = u + dt * (-1.0 * u + 0.5 * float(W[i, 0]))
    assert abs(u - float(sol.ys[-1, 0])) < 1e-12

    def loss(pp, sa=None):
        pr = RODEProblem(f, jnp.array([1.0]), (0.0, 1.0), pp,
                         noise_process=ng)
        return jnp.sum(solve(pr, dt=dt, saveat=jnp.array([0.0, 0.5, 1.0]),
                             sensealg=sa).ys ** 2)

    g = jax.grad(lambda pp: loss(pp, InterpolatingAdjoint()))(p)
    v = jnp.array([0.4, -0.2])
    _, dv = jax.jvp(loss, (p,), (v,))
    assert abs(float(g @ v) - float(dv)) < 1e-10


def test_traced_saveat_misalignment_poisons_values_and_gradient():
    # Under an outer jit the saveat is a tracer, so off-grid times cannot
    # raise eagerly — the contract is NaN rows AND a NaN gradient (additive
    # poisoning; a where() would silently zero the cotangent).
    def run(p, saveat):
        prob = SDEProblem(
            lambda u, pp, t: pp[0] * u,
            lambda u, pp, t: 0.2 * u,
            jnp.array([1.0]), (0.0, 1.0), p,
        )
        return solve(prob, dt=0.1, saveat=saveat, key=KEY,
                     sensealg=BacksolveAdjoint()).ys

    p = jnp.array([0.3])
    good = jnp.array([0.0, 0.5, 1.0])
    off = jnp.array([0.0, 0.437, 1.0])

    ys_good = jax.jit(run)(p, good)
    assert bool(jnp.isfinite(ys_good).all())

    ys_bad = jax.jit(run)(p, off)
    assert bool(jnp.isnan(ys_bad[1]).all())          # the off-grid row
    assert bool(jnp.isfinite(ys_bad[0]).all())       # aligned rows intact
    assert bool(jnp.isfinite(ys_bad[2]).all())

    g = jax.jit(jax.grad(lambda q, s: jnp.sum(run(q, s) ** 2)))(p, off)
    assert bool(jnp.isnan(g).all()), g


# ---- SDE callbacks (reference scope: discrete callbacks,
# test/Callbacks1/SDE_callbacks.jl — condition at step ends, affect applied;
# here also PresetTimeCallback doses mapped to grid nodes) ----

def _dosed_sde_loss(alg, key, dt=0.01):
    from scimlsensitivity_jl_tpu import PresetTimeCallback

    def loss(p):
        prob = SDEProblem(
            lambda u, pp, t: -pp[0] * u,
            lambda u, pp, t: pp[1] * u,
            jnp.array([1.0]), (0.0, 1.0), p,
        )
        cb = PresetTimeCallback([0.25, 0.5], lambda u, pp, t: u * pp[2])
        s = solve(prob, EulerMaruyama(), dt=dt, key=key, callback=cb,
                  saveat=jnp.array([0.0, 0.5, 1.0]), sensealg=alg)
        return jnp.sum(s.ys ** 2)

    return loss


def test_sde_preset_dose_gradient_vs_fd():
    p0 = jnp.array([0.8, 0.3, 0.6])
    loss = _dosed_sde_loss(DirectAdjoint(), KEY)
    g = np.asarray(jax.grad(loss)(p0))
    eps = 1e-6
    g_fd = np.zeros(3)
    for i in range(3):
        pp = np.asarray(p0).copy(); pp[i] += eps
        pm = np.asarray(p0).copy(); pm[i] -= eps
        g_fd[i] = (float(loss(jnp.asarray(pp)))
                   - float(loss(jnp.asarray(pm)))) / (2 * eps)
    assert np.allclose(g, g_fd, rtol=1e-5, atol=1e-8), (g, g_fd)
    # the dose parameter p[2] must actually flow
    assert abs(g[2]) > 1e-6


def test_sde_discrete_callback_interpolating_matches_direct():
    # state-dependent discrete condition (fires when u drifts above a
    # threshold after t>0.5, reference SDE_callbacks.jl pattern)
    from scimlsensitivity_jl_tpu import DiscreteCallback

    def mk_loss(alg):
        def loss(p):
            prob = SDEProblem(
                lambda u, pp, t: pp[0] * u,
                lambda u, pp, t: 0.2 * u,
                jnp.array([1.0]), (0.0, 1.0), p,
            )
            cb = DiscreteCallback(
                condition=lambda u, pp, t: (t > 0.5) & (u[0] > 1.1),
                affect=lambda u, pp, t: u * pp[1],
            )
            s = solve(prob, EulerMaruyama(), dt=0.01, key=KEY, callback=cb,
                      sensealg=alg)
            return s.ys[-1, 0]

        return loss

    p0 = jnp.array([0.4, 0.97])
    g_dir = np.asarray(jax.grad(mk_loss(DirectAdjoint()))(p0))
    g_int = np.asarray(jax.grad(mk_loss(InterpolatingAdjoint()))(p0))
    assert np.allclose(g_int, g_dir, rtol=1e-10), (g_int, g_dir)
    assert abs(g_dir[1]) > 1e-8  # the affect parameter flows


def test_sde_callback_guards():
    """Round-4 scope: adaptive+discrete, grid-continuous, and terminal
    (DirectAdjoint) SDE events are SUPPORTED; what must still raise loudly:
    Backsolve with jumps, modifies_p, terminal under node-walk adjoints."""
    import pytest as _pytest

    from scimlsensitivity_jl_tpu import ContinuousCallback, DiscreteCallback

    prob = SDEProblem(
        lambda u, p, t: -p[0] * u,
        lambda u, p, t: 0.1 * u,
        jnp.array([1.0]), (0.0, 1.0), jnp.array([1.0]),
    )
    dcb = DiscreteCallback(condition=lambda u, p, t: t > 0.5,
                           affect=lambda u, p, t: u * 0.9)
    # adaptive path (no dt): discrete callbacks now run (round-4)
    sol_a = solve(prob, key=KEY, callback=dcb, rtol=1e-3, atol=1e-6)
    assert bool(sol_a.success)
    # ... but only under DirectAdjoint
    with _pytest.raises(NotImplementedError, match="DirectAdjoint"):
        solve(prob, key=KEY, callback=dcb, rtol=1e-3, atol=1e-6,
              sensealg=InterpolatingAdjoint())
    # continuous callbacks on the grid now run (bridged sub-steps)
    ccb = ContinuousCallback(condition=lambda u, p, t: u[0] - 0.5,
                             affect=lambda u, p, t: u + 0.1)
    sol_c = solve(prob, EulerMaruyama(), dt=0.1, key=KEY, callback=ccb)
    assert bool(sol_c.success)
    # Backsolve cannot invert jumps
    with _pytest.raises(NotImplementedError):
        solve(prob, EulerMaruyama(), dt=0.1, key=KEY, callback=dcb,
              sensealg=BacksolveAdjoint())
    # terminal: runs under DirectAdjoint, raises under Interpolating
    tcb = DiscreteCallback(condition=lambda u, p, t: t > 0.5,
                           affect=lambda u, p, t: u, terminal=True)
    sol_t = solve(prob, EulerMaruyama(), dt=0.1, key=KEY, callback=tcb)
    assert int(sol_t.retcode) == 5
    with _pytest.raises(NotImplementedError):
        solve(prob, EulerMaruyama(), dt=0.1, key=KEY, callback=tcb,
              sensealg=InterpolatingAdjoint())
    # modifies_p now runs (round-4 p-lift); what still raises is the
    # combination with a user noise_process (the lift changes the state
    # and noise dimension under the user's fixed path)
    from scimlsensitivity_jl_tpu.ops.brownian import NoiseGrid

    mcb = DiscreteCallback(condition=lambda u, p, t: t > 0.5,
                           affect=lambda u, p, t: (u * 0.9, p),
                           modifies_p=True)
    sol_m = solve(prob, EulerMaruyama(), dt=0.1, key=KEY, callback=mcb)
    assert bool(sol_m.success)
    ts_ng = jnp.linspace(0.0, 1.0, 11)
    W = jnp.zeros((11, 1))
    with _pytest.raises(NotImplementedError, match="noise_process"):
        solve(SDEProblem(prob.f, prob.g, prob.u0, prob.tspan, prob.p,
                         noise_process=NoiseGrid(ts_ng, W)),
              EulerMaruyama(), dt=0.1, callback=mcb)


def test_sde_modifies_p_dose_gradient_vs_fd():
    """Parameter-modifying SDE events (round-4, beyond the reference's SDE
    scope — reference param-swap tracking is ODE-only,
    callback_tracking.jl:395-421): a dose at t=0.5 multiplies the decay
    rate p[0] by p[2], p lifted into the state with zero drift/noise rows.
    Gradients (incl. through the dose factor) vs central FD over the same
    counter-based noise; Direct and Interpolating agree."""
    from scimlsensitivity_jl_tpu import PresetTimeCallback

    cb = PresetTimeCallback(
        ts=[0.5],
        affect=lambda u, pp, t: (u, pp.at[0].set(pp[0] * pp[2])),
        modifies_p=True)

    def mk_loss(alg, noise):
        def loss(p):
            if noise == "general":
                prob = SDEProblem(
                    lambda u, pp, t: -pp[0] * u,
                    lambda u, pp, t: jnp.array([[pp[1] * u[0],
                                                 0.05 * u[0]]]),
                    jnp.array([1.0]), (0.0, 1.0), p,
                    noise="general", noise_dim=2)
            else:
                prob = SDEProblem(
                    lambda u, pp, t: -pp[0] * u,
                    lambda u, pp, t: pp[1] * u,
                    jnp.array([1.0]), (0.0, 1.0), p)
            s = solve(prob, dt=1 / 256, key=KEY, callback=cb, sensealg=alg)
            return jnp.sum(s.ys[-1] ** 2)
        return loss

    p0 = jnp.array([1.3, 0.2, 2.0])
    eps = 1e-6
    for noise in ("diagonal", "general"):
        loss = mk_loss(DirectAdjoint(), noise)
        g = np.asarray(jax.grad(loss)(p0))
        g_fd = np.zeros(3)
        for i in range(3):
            pp = np.asarray(p0).copy(); pp[i] += eps
            pm = np.asarray(p0).copy(); pm[i] -= eps
            g_fd[i] = (float(loss(jnp.asarray(pp)))
                       - float(loss(jnp.asarray(pm)))) / (2 * eps)
        assert np.allclose(g, g_fd, rtol=1e-5, atol=1e-10), (noise, g, g_fd)
        assert abs(g[2]) > 1e-6  # the dose factor flows
    g_int = np.asarray(jax.grad(mk_loss(InterpolatingAdjoint(),
                                        "diagonal"))(p0))
    g_dir = np.asarray(jax.grad(mk_loss(DirectAdjoint(), "diagonal"))(p0))
    assert np.allclose(g_int, g_dir, rtol=1e-9), (g_int, g_dir)


def test_sde_modifies_p_adaptive_near_deterministic():
    """Adaptive-path (no dt) modifies_p dose: in the near-deterministic
    regime (sigma=1e-4, where accept/reject flips are numerically
    negligible) the AD gradient matches central FD; both carry the O(sigma)
    stochastic correction vs the analytic deterministic limit."""
    from scimlsensitivity_jl_tpu import PresetTimeCallback

    cb = PresetTimeCallback(
        ts=[0.5],
        affect=lambda u, pp, t: (u, pp.at[0].set(pp[0] * pp[2])),
        modifies_p=True)

    def loss(p):
        prob = SDEProblem(lambda u, pp, t: -pp[0] * u,
                          lambda u, pp, t: pp[1] * u,
                          jnp.array([1.0]), (0.0, 1.0), p)
        s = solve(prob, key=KEY, callback=cb, rtol=1e-5, atol=1e-8)
        return jnp.sum(s.ys[-1] ** 2)

    p0 = jnp.array([1.3, 1e-4, 2.0])
    g = np.asarray(jax.grad(loss)(p0))
    eps = 1e-5
    for i in (0, 2):
        pp = np.asarray(p0).copy(); pp[i] += eps
        pm = np.asarray(p0).copy(); pm[i] -= eps
        fd = (float(loss(jnp.asarray(pp)))
              - float(loss(jnp.asarray(pm)))) / (2 * eps)
        assert abs(g[i] - fd) / max(abs(fd), 1e-12) < 5e-3, (i, g[i], fd)
    # analytic deterministic limit: u(1) = exp(-a/2)·exp(-a·c/2)
    a, c = float(p0[0]), float(p0[2])
    u1 = np.exp(-a * 0.5) * np.exp(-a * c * 0.5)
    assert abs(g[0] - 2 * u1 ** 2 * (-(0.5 + 0.5 * c))) < 1e-2 * abs(g[0]) \
        + 1e-3
    assert abs(g[2] - 2 * u1 ** 2 * (-a * 0.5)) < 1e-2 * abs(g[2]) + 1e-3


def test_milstein_commutative_matrix_noise_strong_vs_exact():
    """Commutative (n x m) noise Milstein (RKMilCommute scope): 2-state GBM
    driven by two independent Wiener processes, g[:, j] = sigma_j * u (each
    column proportional to u => L^j g_k = L^k g_j). Exact solution
    u_i(T) = u_i(0) exp((mu - 0.5*(s1^2+s2^2)) T + s1 W1 + s2 W2)."""
    mu, s1, s2, T = 0.15, 0.4, 0.25, 1.0
    p = jnp.array([mu, s1, s2])
    u0 = jnp.array([1.0, 2.0])

    def g(u, pp, t):
        return jnp.stack([pp[1] * u, pp[2] * u], axis=1)  # (2, 2)

    def path_err(key, dt, solver):
        prob = SDEProblem(lambda u, pp, t: pp[0] * u, g, u0, (0.0, T), p,
                          noise="general", noise_dim=2)
        sol = solve(prob, solver, dt=dt, key=key)
        from scimlsensitivity_jl_tpu.ops.brownian import grid_increment
        n = int(round(T / dt))
        incs = jax.vmap(lambda i: grid_increment(key, i, (2,), dt))(jnp.arange(n))
        W = jnp.sum(incs, axis=0)
        exact = u0 * jnp.exp((mu - 0.5 * (s1 ** 2 + s2 ** 2)) * T
                             + s1 * W[0] + s2 * W[1])
        return jnp.max(jnp.abs(sol.ys[-1] - exact))

    keys = jax.random.split(jax.random.PRNGKey(7), 200)
    e1 = float(jax.vmap(lambda k: path_err(k, 1e-2, Milstein(commutative=True)))(keys).mean())
    e2 = float(jax.vmap(lambda k: path_err(k, 1e-3, Milstein(commutative=True)))(keys).mean())
    # strong order 1: tenfold dt refinement ~ tenfold error drop
    assert e1 / e2 > 5.0, (e1, e2)
    # and Milstein beats EM at the same dt (EM is strong 0.5 here)
    e_em = float(jax.vmap(lambda k: path_err(k, 1e-2, EulerMaruyama()))(keys).mean())
    assert e1 < 0.7 * e_em, (e1, e_em)


def test_milstein_commutative_gradient_vs_forward_mode():
    """Gradient through the commutative-noise Milstein step (DirectAdjoint
    exact discrete adjoint) vs jacfwd over the same noise realization."""
    key = jax.random.PRNGKey(11)
    u0 = jnp.array([1.0, 0.5])

    def loss(pp):
        prob = SDEProblem(
            lambda u, q, t: q[0] * u,
            lambda u, q, t: jnp.stack([q[1] * u, q[2] * u], axis=1),
            u0, (0.0, 0.5), pp, noise="general", noise_dim=2)
        sol = solve(prob, Milstein(commutative=True), dt=1e-2, key=key,
                    sensealg=DirectAdjoint())
        return jnp.sum(sol.ys[-1] ** 2)

    p = jnp.array([0.2, 0.3, 0.15])
    g_rev = jax.grad(loss)(p)
    g_fwd = jax.jacfwd(loss)(p)
    np.testing.assert_allclose(np.asarray(g_rev), np.asarray(g_fwd),
                               rtol=1e-6, atol=1e-9)


# ---------------------------------------------------------------------------
# Round-4 SDE event scope (VERDICT r3 #5): continuous + terminal events on
# the fixed grid, crossings localized by Brownian-bridge sub-steps.
# ---------------------------------------------------------------------------


def test_sde_continuous_event_deterministic_limit():
    """g ≡ 0 degenerates to the ODE: decay crossing a barrier with a kick;
    the bridged sub-step localization must reproduce the analytic value."""
    from scimlsensitivity_jl_tpu import ContinuousCallback

    # du = -p u dt; event when u - 0.5 crosses zero, affect u -> u + 1
    cb = ContinuousCallback(condition=lambda u, p, t: u[0] - 0.5,
                            affect=lambda u, p, t: u + 1.0)
    prob = SDEProblem(lambda u, p, t: -p[0] * u,
                      lambda u, p, t: 0.0 * u,
                      jnp.array([1.0]), (0.0, 2.0), jnp.array([1.0]))
    sol = solve(prob, EulerMaruyama(), dt=1e-3, key=KEY, callback=cb,
                saveat=jnp.array([0.0, 2.0]))
    # fires TWICE: tau1 = ln 2 (1 -> 0.5 -> 1.5), tau2 = ln 2 + ln 3
    # (1.5 -> 0.5 -> 1.5); u(2) = 1.5·exp(-(2 − tau2))
    tau2 = np.log(2.0) + np.log(3.0)
    expect = 1.5 * np.exp(-(2.0 - tau2))
    np.testing.assert_allclose(float(sol.ys[-1, 0]), expect, rtol=2e-3)


def test_sde_continuous_event_gradient_vs_forward():
    """Stochastic barrier event: reverse adjoints vs jacfwd over the SAME
    noise realization (exact discrete agreement expected; dτ/dp flows
    through the differentiable bridge θ)."""
    from scimlsensitivity_jl_tpu import ContinuousCallback, InterpolatingAdjoint

    key = jax.random.PRNGKey(5)
    cb = ContinuousCallback(condition=lambda u, p, t: u[0] - 1.3,
                            affect=lambda u, p, t: 0.5 * u, direction=1)

    def loss_with(sa):
        def loss(p):
            prob = SDEProblem(lambda u, q, t: q[0] * u,
                              lambda u, q, t: q[1] * u,
                              jnp.array([1.0]), (0.0, 1.0), p)
            sol = solve(prob, EulerMaruyama(), dt=1e-2, key=key, callback=cb,
                        sensealg=sa, saveat=jnp.array([0.0, 1.0]))
            return jnp.sum(sol.ys[-1] ** 2)
        return loss

    p = jnp.array([0.4, 0.25])
    g_fwd = jax.jacfwd(loss_with(DirectAdjoint()))(p)
    assert np.all(np.isfinite(np.asarray(g_fwd))) and abs(float(g_fwd[0])) > 0
    for sa in [DirectAdjoint(), InterpolatingAdjoint()]:
        g_rev = jax.grad(loss_with(sa))(p)
        np.testing.assert_allclose(np.asarray(g_rev), np.asarray(g_fwd),
                                   rtol=1e-5, atol=1e-10, err_msg=repr(sa))


def test_sde_terminal_event():
    """Terminal barrier stop: retcode 5 (Terminated), differentiable τ via
    the bridge, held save rows, and dτ/dp matching jacfwd over the path."""
    from scimlsensitivity_jl_tpu import ContinuousCallback

    key = jax.random.PRNGKey(9)
    cb = ContinuousCallback(condition=lambda u, p, t: u[0] - 1.5,
                            affect=lambda u, p, t: u, terminal=True,
                            direction=1)

    def run(p):
        prob = SDEProblem(lambda u, q, t: q[0] * u,
                          lambda u, q, t: q[1] * u,
                          jnp.array([1.0]), (0.0, 3.0), p)
        return solve(prob, EulerMaruyama(), dt=1e-2, key=key, callback=cb,
                     saveat=jnp.array([0.0, 1.5, 3.0]))

    p = jnp.array([1.2, 0.3])
    sol = run(p)
    assert int(sol.retcode) == 5 and bool(sol.success)
    tf = float(sol.t_final)
    assert 0.0 < tf < 3.0
    # held rows: every save row at/after tau equals the stop state
    ys = np.asarray(sol.ys)
    for k, tk in enumerate(np.asarray(sol.ts)):
        if tk > tf:
            np.testing.assert_allclose(ys[k], ys[-1])
    # stop state sits on the barrier (tau localized inside the step)
    np.testing.assert_allclose(ys[-1, 0], 1.5, rtol=2e-2)

    g_rev = jax.grad(lambda q: run(q).t_final)(p)
    g_fwd = jax.jacfwd(lambda q: run(q).t_final)(p)
    np.testing.assert_allclose(np.asarray(g_rev), np.asarray(g_fwd),
                               rtol=1e-5, atol=1e-10)
    assert abs(float(g_rev[0])) > 1e-3  # larger drift -> earlier hit


def test_sde_terminal_event_wrong_sensealg_raises():
    from scimlsensitivity_jl_tpu import (ContinuousCallback,
                                         InterpolatingAdjoint)
    import pytest as _pytest

    cb = ContinuousCallback(condition=lambda u, p, t: u[0] - 1.5,
                            affect=lambda u, p, t: u, terminal=True)
    prob = SDEProblem(lambda u, q, t: q[0] * u, lambda u, q, t: q[1] * u,
                      jnp.array([1.0]), (0.0, 3.0), jnp.array([1.2, 0.3]))
    with _pytest.raises(NotImplementedError, match="DirectAdjoint"):
        solve(prob, EulerMaruyama(), dt=1e-2, key=KEY, callback=cb,
              sensealg=InterpolatingAdjoint())


def test_adaptive_sde_callbacks_dose_and_discrete():
    """VERDICT r4 #5: discrete callbacks + preset doses on the ADAPTIVE SDE
    path (VBT) — dose times as tstops, conditions at accepted nodes via the
    shared event engine; gradients by reverse AD through the masked scan,
    validated against jacfwd over the identical tree noise."""
    from scimlsensitivity_jl_tpu import DiscreteCallback, PresetTimeCallback

    key = jax.random.PRNGKey(3)
    dose = PresetTimeCallback(ts=[0.5], affect=lambda u, p, t: u + p[2])
    clamp = DiscreteCallback(condition=lambda u, p, t: u[0] > 2.0,
                             affect=lambda u, p, t: 0.9 * u)

    def loss(p):
        prob = SDEProblem(lambda u, q, t: q[0] * u, lambda u, q, t: q[1] * u,
                          jnp.array([1.0]), (0.0, 1.0), p)
        sol = solve(prob, key=key, callback=[dose, clamp], rtol=1e-3,
                    atol=1e-6, saveat=jnp.array([0.0, 0.5, 1.0]),
                    sensealg=DirectAdjoint())
        return jnp.sum(sol.ys[-1] ** 2), sol

    p = jnp.array([0.6, 0.3, 0.7])
    v, sol = loss(p)
    assert int(sol.retcode) == 0
    # the dose is visible: u(0.5+) includes +p2 exactly at the save node
    assert float(sol.ys[1, 0]) > 1.5
    g_rev = jax.grad(lambda q: loss(q)[0])(p)
    g_fwd = jax.jacfwd(lambda q: loss(q)[0])(p)
    np.testing.assert_allclose(np.asarray(g_rev), np.asarray(g_fwd),
                               rtol=1e-6)
    assert abs(float(g_rev[2])) > 0.1  # dose sensitivity present


def test_adaptive_sde_callbacks_wrong_sensealg_raises():
    import pytest as _pytest

    from scimlsensitivity_jl_tpu import (InterpolatingAdjoint,
                                         PresetTimeCallback)

    dose = PresetTimeCallback(ts=[0.5], affect=lambda u, p, t: u + 1.0)
    prob = SDEProblem(lambda u, q, t: q[0] * u, lambda u, q, t: q[1] * u,
                      jnp.array([1.0]), (0.0, 1.0), jnp.array([0.6, 0.3]))
    with _pytest.raises(NotImplementedError, match="DirectAdjoint"):
        solve(prob, key=KEY, callback=dose, rtol=1e-3, atol=1e-6,
              sensealg=InterpolatingAdjoint())


def test_sde_adjoint_problem_dt_refinement_order():
    """VERDICT r4 #10: SDEAdjointProblem's continuous reverse SDE
    re-discretizes the reverse flow, so its gradient converges to the
    exact discrete replay adjoint at strong order ~1 in dt. Measure the
    observed order across 4 grids (3 noise seeds averaged) and assert the
    log-log slope — a convergence guarantee, not a fixed tolerance."""
    import scimlsensitivity_jl_tpu as S

    p0 = jnp.array([1.5, 1.0, 0.2])
    u0 = jnp.array([1.0, 0.8])

    def f(u, p, t):
        return jnp.array([p[0] * u[0] - p[1] * u[0] * u[1],
                          -u[1] + p[1] * u[0] * u[1]])

    def g(u, p, t):
        return p[2] * u

    def dg(u, p, t, i):
        return 2.0 * u

    ts = jnp.array([0.0, 0.5, 1.0])
    dts = [1.0 / 128, 1.0 / 256, 1.0 / 512, 1.0 / 1024]
    errs = []
    for dt in dts:
        e = 0.0
        for seed in (7, 8, 9):
            prob = S.SDEProblem(f, g, u0, (0.0, 1.0), p0, noise="diagonal",
                                interpretation="stratonovich")
            sol = S.solve(prob, S.EulerHeun(), dt=dt, saveat=ts,
                          key=jax.random.PRNGKey(seed),
                          sensealg=S.InterpolatingAdjoint())
            du0_ref, dp_ref = S.adjoint_sensitivities(sol, dgdu_discrete=dg)
            spec = S.SDEAdjointProblem(sol, S.BacksolveAdjoint(),
                                       dgdu_discrete=dg)
            adj = S.solve(spec.prob, S.EulerHeun(), dt=spec.dt,
                          callback=spec.callback)
            du0, dp = spec.extract(
                jax.tree_util.tree_map(lambda a: a[-1], adj.ys))
            gref = np.concatenate([np.asarray(du0_ref).ravel(),
                                   np.asarray(dp_ref).ravel()])
            gman = np.concatenate([np.asarray(du0).ravel(),
                                   np.asarray(dp).ravel()])
            e += float(np.linalg.norm(gman - gref) / np.linalg.norm(gref))
        errs.append(e / 3.0)

    x = np.log(np.asarray(dts))
    y = np.log(np.asarray(errs))
    slope = float(np.polyfit(x, y, 1)[0])
    # strong order 1: slope ~ 1; allow path-dependent constants
    assert slope > 0.7, (slope, errs)
    # and the finest grid should be genuinely consistent
    assert errs[-1] < 2e-2, errs
