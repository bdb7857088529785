"""Event/callback tests (reference: test/Callbacks1-2 — continuous vs
discrete event adjoints with ForwardDiffSensitivity as ground truth,
Callbacks2/continuous_vs_discrete.jl). BASELINE config 4: bouncing ball."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scimlsensitivity_jl_tpu import (
    BacksolveAdjoint,
    ForwardDiffSensitivity,
    GaussAdjoint,
    InterpolatingAdjoint,
    ODEProblem,
    QuadratureAdjoint,
    Tsit5,
    solve,
)
from scimlsensitivity_jl_tpu.callbacks import (
    CallbackSet,
    ContinuousCallback,
    DiscreteCallback,
)

G = 9.81


def ball_f(u, p, t):
    return jnp.stack([u[1], -G])


def bounce_cb(coef=None):
    def affect(u, p, t):
        c = p[0] if coef is None else coef
        return jnp.stack([u[0], -c * u[1]])

    return ContinuousCallback(condition=lambda u, p, t: u[0], affect=affect,
                              direction=-1)


def test_forward_bounce_trajectory():
    prob = ODEProblem(ball_f, jnp.array([1.0, 0.0]), (0.0, 2.0),
                      jnp.array([0.9]))
    sol = solve(prob, Tsit5(), saveat=jnp.linspace(0.0, 2.0, 9),
                rtol=1e-10, atol=1e-12, callback=bounce_cb(),
                sensealg=GaussAdjoint())
    ev_ts, _, _, ev_count = sol.events
    assert int(ev_count) == 3
    t1 = np.sqrt(2 / G)
    expect = [t1, t1 + 2 * 0.9 * t1, t1 + 2 * 0.9 * t1 + 2 * 0.81 * t1]
    assert np.allclose(np.asarray(ev_ts[:3]), expect, rtol=1e-9)
    # height non-negative at all save points (within solver tol)
    assert np.all(np.asarray(sol.ys[:, 0]) > -1e-8)


def _ball_loss(sensealg, tspan=(0.0, 1.2)):
    # one bounce inside the window; loss on the full saved trajectory
    ts = jnp.linspace(tspan[0], tspan[1], 7)

    def loss(u0, p):
        prob = ODEProblem(ball_f, u0, tspan, p)
        sol = solve(prob, Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12,
                    callback=bounce_cb(), sensealg=sensealg)
        return jnp.sum(sol.ys[:, 0] ** 2) + jnp.sum(sol.ys[-1] ** 2)

    return loss


@pytest.mark.parametrize("sensealg", [
    InterpolatingAdjoint(), BacksolveAdjoint(), GaussAdjoint(),
    QuadratureAdjoint(),
], ids=lambda s: type(s).__name__)
def test_bounce_adjoint_gradients(sensealg):
    # ground truth: discrete forward mode through the event machinery
    # (reference Callbacks2/continuous_vs_discrete.jl strategy)
    u0 = jnp.array([1.0, 0.0])
    p = jnp.array([0.9])
    loss_fd = _ball_loss(ForwardDiffSensitivity())
    du0_ref, dp_ref = jax.grad(loss_fd, argnums=(0, 1))(u0, p)

    loss = _ball_loss(sensealg)
    du0, dp = jax.grad(loss, argnums=(0, 1))(u0, p)
    assert np.allclose(dp, dp_ref, rtol=1e-5, atol=1e-8), (
        type(sensealg).__name__, np.asarray(dp), np.asarray(dp_ref))
    assert np.allclose(du0, du0_ref, rtol=1e-5, atol=1e-8), (
        type(sensealg).__name__, np.asarray(du0), np.asarray(du0_ref))


def test_fd_oracle_against_finite_differences():
    # sanity-check the oracle itself: central differences on the smooth side
    u0 = jnp.array([1.0, 0.0])
    p = jnp.array([0.9])
    loss = _ball_loss(ForwardDiffSensitivity())
    dp = jax.grad(loss, argnums=1)(u0, p)
    eps = 1e-6
    fd = (loss(u0, p + eps) - loss(u0, p - eps)) / (2 * eps)
    assert np.isclose(float(dp[0]), float(fd), rtol=1e-5)


def test_discrete_callback():
    # apply an impulse whenever t passes 0.5 (condition on time)
    cb = DiscreteCallback(
        condition=lambda u, p, t: t > 0.5,
        affect=lambda u, p, t: u + jnp.array([0.0, 1.0]),
    )
    prob = ODEProblem(lambda u, p, t: jnp.stack([u[1], 0.0 * u[0]]),
                      jnp.array([0.0, 1.0]), (0.0, 1.0), None)
    sol = solve(prob, Tsit5(), rtol=1e-10, atol=1e-12, callback=cb,
                sensealg=GaussAdjoint())
    # impulse fires at the first accepted step past 0.5 and then at each
    # subsequent step end — at minimum velocity increased by >= 1
    assert float(sol.ys[-1, 1]) >= 2.0 - 1e-8


def test_parameter_modifying_event():
    # Dosing-style event: when u crosses below a threshold, the decay-rate
    # parameter is halved (reference param-swap events,
    # callback_tracking.jl:395-421). Gradient vs the discrete-forward oracle.
    from scimlsensitivity_jl_tpu.callbacks import ContinuousCallback as CC

    cb = CC(
        condition=lambda u, p, t: u[0] - 0.5,
        affect=lambda u, p, t: (u, p * 0.5),
        direction=-1,
        modifies_p=True,
    )

    def loss(p0, sensealg):
        prob = ODEProblem(lambda u, p, t: -p * u, jnp.array([1.0]),
                          (0.0, 2.0), p0)
        sol = solve(prob, Tsit5(), saveat=jnp.linspace(0.0, 2.0, 5),
                    rtol=1e-10, atol=1e-12, callback=cb, sensealg=sensealg)
        return jnp.sum(sol.ys ** 2)

    p0 = jnp.asarray(1.3)
    # analytic sanity: event at t* = ln(2)/p0; afterwards rate p0/2
    tstar = float(jnp.log(2.0) / p0)
    prob = ODEProblem(lambda u, p, t: -p * u, jnp.array([1.0]), (0.0, 2.0), p0)
    sol = solve(prob, Tsit5(), saveat=jnp.array([2.0]), rtol=1e-10,
                atol=1e-12, callback=cb, sensealg=GaussAdjoint())
    expect = 0.5 * np.exp(-float(p0) / 2 * (2.0 - tstar))
    assert np.allclose(sol.ys[-1, 0], expect, rtol=1e-8)

    g_ref = jax.grad(lambda p: loss(p, ForwardDiffSensitivity()))(p0)
    eps = 1e-6
    fd = (float(loss(p0 + eps, ForwardDiffSensitivity()))
          - float(loss(p0 - eps, ForwardDiffSensitivity()))) / (2 * eps)
    assert np.isclose(float(g_ref), fd, rtol=1e-5)

    for sa in [InterpolatingAdjoint(), GaussAdjoint(), BacksolveAdjoint(),
               QuadratureAdjoint()]:
        g = jax.grad(lambda p: loss(p, sa))(p0)
        assert np.isclose(float(g), float(g_ref), rtol=1e-5), (
            type(sa).__name__, float(g), float(g_ref))
