"""DDE tests (reference: neural-DDE layer tests, test/Core4/layers_dde.jl).

Oracle: u'(t) = -u(t-1), u(t)=1 for t<=0 has the exact method-of-steps
solution u(t) = 1 - t on [0,1], u(t) = 1 - t + (t-1)^2/2 on [1,2].
"""

import jax
import jax.numpy as jnp
import numpy as np

from scimlsensitivity_jl_tpu import DDEProblem, solve


def test_dde_exact_piecewise():
    prob = DDEProblem(
        lambda u, h, p, t: -h[0], jnp.array([1.0]), (0.0, 2.0), None,
        lags=(1.0,),
    )
    ts = jnp.array([0.0, 0.5, 1.0, 1.5, 2.0])
    sol = solve(prob, dt=1e-2, saveat=ts)

    def exact(t):
        if t <= 1.0:
            return 1.0 - t
        return 1.0 - t + (t - 1.0) ** 2 / 2.0

    expect = np.array([exact(float(t)) for t in ts])
    assert np.allclose(sol.ys[:, 0], expect, atol=1e-6), (
        np.asarray(sol.ys[:, 0]), expect)


def test_dde_order4_convergence():
    # Smooth oracle with NO breaking points: u' = -(1/e) u(t-1) with
    # history e^{-t} has the exact global solution e^{-t}.  Hermite delay
    # interpolation should keep RK4 at ~order 4.
    c = float(np.exp(-1.0))

    def err(dt):
        prob = DDEProblem(
            lambda u, h, p, t: -c * h[0], jnp.array([1.0]), (0.0, 2.0),
            None, lags=(1.0,), history=lambda t: jnp.array([jnp.exp(-t)]),
        )
        sol = solve(prob, dt=dt, saveat=jnp.array([0.0, 2.0]))
        return abs(float(sol.ys[-1, 0]) - float(np.exp(-2.0)))

    e1, e2 = err(0.1), err(0.05)
    slope = np.log2(e1 / e2)
    assert slope > 3.5, (e1, e2, slope)


def test_dde_lag_not_multiple_of_dt():
    # lag = 1/3 is not on the dt = 0.01 grid; method-of-steps oracle:
    # u' = -u(t - tau), u == 1 for t <= 0.
    tau = 1.0 / 3.0
    prob = DDEProblem(
        lambda u, h, p, t: -h[0], jnp.array([1.0]), (0.0, 0.9), None,
        lags=(tau,),
    )
    sol = solve(prob, dt=0.01, saveat=jnp.array([0.0, 0.3, 0.6, 0.9]))

    def exact(t):
        if t <= tau:
            return 1.0 - t
        if t <= 2 * tau:
            return 1.0 - t + (t - tau) ** 2 / 2.0
        return 1.0 - t + (t - tau) ** 2 / 2.0 - (t - 2 * tau) ** 3 / 6.0

    expect = np.array([exact(float(t)) for t in sol.ts])
    assert np.allclose(np.asarray(sol.ys[:, 0]), expect, atol=5e-5), (
        np.asarray(sol.ys[:, 0]), expect)


def test_dde_gradient_vs_fd():
    # parameterized delay feedback: u' = -p*u(t-0.5)
    def loss(p):
        prob = DDEProblem(
            lambda u, h, pp, t: -pp * h[0], jnp.array([1.0]), (0.0, 2.0), p,
            lags=(0.5,),
        )
        sol = solve(prob, dt=1e-2)
        return jnp.sum(sol.ys[-1] ** 2)

    p0 = jnp.asarray(1.3)
    g = jax.grad(loss)(p0)
    eps = 1e-6
    fd = (float(loss(p0 + eps)) - float(loss(p0 - eps))) / (2 * eps)
    assert np.isclose(float(g), fd, rtol=1e-6), (float(g), fd)


def test_neural_dde_trains():
    from scimlsensitivity_jl_tpu.models.neural_ode import mlp_apply, mlp_init

    params = mlp_init(jax.random.PRNGKey(0), (2, 8, 1), jnp.float64)
    target = 0.3

    def loss(p):
        prob = DDEProblem(
            lambda u, h, pp, t: mlp_apply(pp, jnp.concatenate([u, h[0]])),
            jnp.array([1.0]), (0.0, 1.0), p, lags=(0.25,),
        )
        sol = solve(prob, dt=1.0 / 40)
        return (sol.ys[-1, 0] - target) ** 2

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(x)) for x in jax.tree_util.tree_leaves(g))
    p1 = jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, params, g)
    assert float(loss(p1)) < float(loss(params))
