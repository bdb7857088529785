"""Stiff solvers + stiff adjoints (reference: test/Core2/stiff_adjoints.jl
strategy — Robertson-class problems, gradients cross-validated).

BASELINE config 2: stiff Robertson, Rosenbrock/SDIRK + Quadrature & Gauss
adjoints.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from scimlsensitivity_jl_tpu import (
    ForwardDiffSensitivity,
    GaussAdjoint,
    InterpolatingAdjoint,
    Kvaerno3,
    ODEProblem,
    QuadratureAdjoint,
    Rosenbrock23,
    SDIRK4,
    TRBDF2,
    solve,
)

ROBER_P = jnp.array([0.04, 3e7, 1e4])
ROBER_U0 = jnp.array([1.0, 0.0, 0.0])


def rober(u, p, t):
    y1, y2, y3 = u[0], u[1], u[2]
    k1, k2, k3 = p[0], p[1], p[2]
    return jnp.stack([
        -k1 * y1 + k3 * y2 * y3,
        k1 * y1 - k2 * y2 ** 2 - k3 * y2 * y3,
        k2 * y2 ** 2,
    ])


def scipy_rober(ts, p=ROBER_P, u0=ROBER_U0):
    r = solve_ivp(
        lambda t, y: np.asarray(rober(jnp.asarray(y), p, t)),
        (float(ts[0]), float(ts[-1])), np.asarray(u0),
        method="Radau", rtol=1e-10, atol=1e-12, t_eval=np.asarray(ts),
    )
    return r.y.T


@pytest.mark.parametrize("make_solver", [Rosenbrock23, TRBDF2, Kvaerno3, SDIRK4])
def test_robertson_forward(make_solver):
    ts = jnp.array([0.0, 1e-2, 1.0, 10.0, 100.0])
    prob = ODEProblem(rober, ROBER_U0, (0.0, 100.0), ROBER_P)
    sol = solve(prob, make_solver(), saveat=ts, rtol=1e-8, atol=1e-10,
                sensealg=GaussAdjoint(), max_steps=4096)
    ref = scipy_rober(ts)
    assert int(sol.retcode) == 0, make_solver.__name__
    assert np.allclose(sol.ys, ref, rtol=1e-5, atol=1e-8), make_solver.__name__


@pytest.mark.parametrize("make_solver", [Rosenbrock23, TRBDF2, Kvaerno3, SDIRK4])
def test_stiff_vanderpol(make_solver):
    # Van der Pol with mu=1e3 over a short window — genuinely stiff.
    def vdp(u, p, t):
        x, v = u[0], u[1]
        return jnp.stack([v, p * ((1 - x ** 2) * v - x)])

    prob = ODEProblem(vdp, jnp.array([2.0, 0.0]), (0.0, 0.3), jnp.asarray(1e3))
    sol = solve(prob, make_solver(), rtol=1e-7, atol=1e-9, max_steps=8192,
                sensealg=GaussAdjoint())
    ref = solve_ivp(
        lambda t, y: np.asarray(vdp(jnp.asarray(y), 1e3, t)),
        (0.0, 0.3), [2.0, 0.0], method="Radau", rtol=1e-10, atol=1e-12,
    )
    assert int(sol.retcode) == 0
    assert np.allclose(sol.ys[-1], ref.y[:, -1], rtol=1e-5, atol=1e-7)


def _fd(f, x, rel_eps=1e-6):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        eps = rel_eps * max(1.0, abs(x[i]))
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g[i] = (f(jnp.asarray(xp)) - f(jnp.asarray(xm))) / (2 * eps)
    return g


@pytest.mark.parametrize("sensealg", [
    QuadratureAdjoint(), GaussAdjoint(), InterpolatingAdjoint(),
], ids=lambda s: type(s).__name__)
def test_robertson_adjoint_gradient(sensealg):
    # Log-parameter gradient of y2 sum over saveat (well-scaled).
    ts = jnp.array([1e-2, 1e-1, 1.0, 10.0])

    def loss(logp):
        p = jnp.exp(logp)
        prob = ODEProblem(rober, ROBER_U0, (0.0, 10.0), p)
        # Adjoint tolerances looser than the forward: the reverse-pass RHS
        # rides on the interpolated forward trajectory whose noise is
        # amplified by k2=3e7, so demanding 1e-9 there forces microscopic
        # steps for no gradient benefit.
        sol = solve(prob, Rosenbrock23(), saveat=ts, rtol=1e-9, atol=1e-12,
                    adj_rtol=1e-6, adj_atol=1e-9,
                    sensealg=sensealg, max_steps=8192)
        return jnp.sum(sol.ys[:, 1]) * 1e4

    logp = jnp.log(ROBER_P)
    grad = jax.grad(loss)(logp)
    # Oracle: discrete forward mode through the solver (exact gradient of
    # the discrete map; plain FD is noisy here because the accepted-step
    # sequence changes discontinuously under parameter perturbation).
    from scimlsensitivity_jl_tpu import ForwardDiffSensitivity

    def loss_fds(logp):
        p = jnp.exp(logp)
        prob = ODEProblem(rober, ROBER_U0, (0.0, 10.0), p)
        sol = solve(prob, Rosenbrock23(), saveat=ts, rtol=1e-9, atol=1e-12,
                    sensealg=ForwardDiffSensitivity(), max_steps=8192)
        return jnp.sum(sol.ys[:, 1]) * 1e4

    grad_oracle = jax.grad(loss_fds)(logp)
    assert np.allclose(grad, grad_oracle, rtol=2e-4, atol=1e-8), (
        np.asarray(grad), np.asarray(grad_oracle))


def test_sdirk4_order_conditions():
    from scimlsensitivity_jl_tpu.solvers.sdirk import SDIRK4_TAB

    b = np.asarray(SDIRK4_TAB.a[-1], np.float64)
    c = np.asarray(SDIRK4_TAB.c, np.float64)
    for k in range(4):
        assert np.isclose((b * c ** k).sum(), 1.0 / (k + 1), atol=1e-14), k
    bh = b - np.asarray(SDIRK4_TAB.b_err, np.float64)
    assert np.isclose(bh.sum(), 1.0, atol=1e-14)
    assert np.isclose((bh * c).sum(), 0.5, atol=1e-14)


def test_seulex_order():
    # Extrapolated linearly-implicit Euler: K levels => order K. Single-step
    # convergence on a nonlinear problem, u' = u^2, u(0)=1 => u(t)=1/(1-t).
    from scimlsensitivity_jl_tpu.solvers.seulex import Seulex

    st = Seulex(levels=4)
    f = lambda u, t: u ** 2

    def one_step(dt):
        u0 = jnp.array([1.0])
        u1, _, _ = st.step(f, jnp.asarray(0.0), jnp.asarray(dt), u0, f(u0, 0.0))
        return float(abs(u1[0] - 1.0 / (1.0 - dt)))

    e1, e2 = one_step(0.1), one_step(0.05)
    # local order K+1 = 5: ratio ~ 32
    assert e1 / e2 > 20.0, (e1, e2)


def test_seulex_robertson():
    # Stiff accuracy end-to-end vs scipy Radau on Robertson (ODE form).
    from scipy.integrate import solve_ivp

    from scimlsensitivity_jl_tpu.solvers.seulex import Rodas4Like

    p = np.array([0.04, 3e7, 1e4])

    def rob(u, q, t):
        y1, y2, y3 = u[0], u[1], u[2]
        return jnp.stack([
            -q[0] * y1 + q[2] * y2 * y3,
            q[0] * y1 - q[1] * y2 ** 2 - q[2] * y2 * y3,
            q[1] * y2 ** 2,
        ])

    ts = jnp.array([1.0, 10.0, 100.0])
    prob = ODEProblem(rob, jnp.array([1.0, 0.0, 0.0]), (0.0, 100.0), jnp.asarray(p))
    sol = solve(prob, Rodas4Like(), saveat=ts, rtol=1e-8, atol=1e-10,
                max_steps=8192)
    r = solve_ivp(lambda t, y: np.array([
        -p[0]*y[0] + p[2]*y[1]*y[2],
        p[0]*y[0] - p[1]*y[1]**2 - p[2]*y[1]*y[2],
        p[1]*y[1]**2]), (0, 100), [1., 0., 0.], method="Radau",
        rtol=1e-10, atol=1e-12, t_eval=np.asarray(ts))
    assert int(sol.retcode) == 0
    assert np.allclose(sol.ys, r.y.T, rtol=1e-5, atol=1e-9)


def test_seulex_adjoint_gradient():
    # Seulex as forward AND reverse stepper of a continuous adjoint on a
    # stiff linear system; oracle: discrete forward mode.
    from scimlsensitivity_jl_tpu import InterpolatingAdjoint
    from scimlsensitivity_jl_tpu.solvers.seulex import Rodas4Like

    A = jnp.array([[-1.0, 1.0], [0.0, -1000.0]])

    def f(u, p, t):
        return A @ u + p

    ts = jnp.array([0.5, 1.0])

    def loss(p, sa, rt):
        prob = ODEProblem(f, jnp.array([1.0, 1.0]), (0.0, 1.0), p)
        s = solve(prob, Rodas4Like(), saveat=ts, rtol=rt, atol=rt * 1e-3,
                  sensealg=sa, max_steps=8192, adj_rtol=1e-7, adj_atol=1e-10)
        return jnp.sum(s.ys ** 2)

    p0 = jnp.array([0.3, 0.7])
    g_adj = jax.grad(lambda q: loss(q, InterpolatingAdjoint(), 1e-8))(p0)
    g_fds = jax.grad(lambda q: loss(q, ForwardDiffSensitivity(), 1e-9))(p0)
    assert np.allclose(g_adj, g_fds, rtol=1e-4), (np.asarray(g_adj),
                                                  np.asarray(g_fds))
