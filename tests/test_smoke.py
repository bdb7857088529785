"""Smoke tier: one fast end-to-end check per major subsystem (<60 s total).

The cheap verification loop the full group harness (tests/run_groups.py)
is too heavy for — run with

    python tests/run_groups.py smoke

Everything here is a scaled-down version of a real test elsewhere in the
suite; nothing is mocked (reference strategy, SURVEY §4).
"""

import jax
import jax.numpy as jnp
import numpy as np

import scimlsensitivity_jl_tpu as S
from scimlsensitivity_jl_tpu import (
    ContinuousCallback,
    DirectAdjoint,
    GaussAdjoint,
    InterpolatingAdjoint,
    NonlinearProblem,
    ODEProblem,
    SDEProblem,
    Tsit5,
    solve,
    solve_nonlinear,
)

P_LV = jnp.array([1.5, 1.0, 3.0, 1.0])
U0_LV = jnp.array([1.0, 1.0])


def _lv(u, p, t):
    x, y = u
    return jnp.array([p[0] * x - p[1] * x * y, -p[2] * y + p[3] * x * y])


def test_smoke_solve_forward():
    sol = solve(ODEProblem(_lv, U0_LV, (0.0, 1.0), P_LV), Tsit5(),
                saveat=jnp.linspace(0.0, 1.0, 5))
    assert sol.ys.shape == (5, 2) and bool(sol.success)


def test_smoke_grad_interpolating_vs_direct():
    def loss(p, sa):
        sol = solve(ODEProblem(_lv, U0_LV, (0.0, 1.0), p), Tsit5(),
                    saveat=jnp.linspace(0.0, 1.0, 5), sensealg=sa)
        return jnp.sum(sol.ys ** 2)

    g1 = jax.grad(loss)(P_LV, InterpolatingAdjoint())
    g2 = jax.grad(loss)(P_LV, DirectAdjoint())
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-8)


def test_smoke_gauss_default_sensealg():
    def loss(p):
        sol = solve(ODEProblem(_lv, U0_LV, (0.0, 1.0), p), Tsit5(),
                    saveat=jnp.linspace(0.0, 1.0, 5),
                    sensealg=GaussAdjoint())
        return jnp.sum(sol.ys[-1])

    assert np.all(np.isfinite(np.asarray(jax.grad(loss)(P_LV))))


def test_smoke_stiff_rosenbrock():
    from scimlsensitivity_jl_tpu import Rosenbrock23

    def f(u, p, t):
        return jnp.array([-p[0] * u[0] + u[1], -50.0 * u[1]])

    sol = solve(ODEProblem(f, jnp.array([1.0, 1.0]), (0.0, 1.0),
                           jnp.array([2.0])), Rosenbrock23(),
                saveat=jnp.array([0.0, 1.0]))
    assert bool(sol.success)


def test_smoke_sde_fixed_grid_grad():
    key = jax.random.PRNGKey(0)

    def loss(p):
        prob = SDEProblem(lambda u, q, t: q[0] * u, lambda u, q, t: q[1] * u,
                          jnp.array([1.0]), (0.0, 0.3), p)
        sol = solve(prob, S.EulerMaruyama(), dt=0.05, key=key,
                    sensealg=DirectAdjoint())
        return jnp.sum(sol.ys[-1])

    p = jnp.array([0.3, 0.2])
    g_rev = jax.grad(loss)(p)
    g_fwd = jax.jacfwd(loss)(p)
    np.testing.assert_allclose(np.asarray(g_rev), np.asarray(g_fwd),
                               rtol=1e-6)


def test_smoke_event_gradient():
    # falling body hitting the ground: d(tau)/dg analytic
    def loss(p):
        def f(u, q, t):
            return jnp.array([u[1], -q[0]])

        cb = ContinuousCallback(
            condition=lambda u, q, t: u[0],
            affect=lambda u, q, t: jnp.array([u[0], -0.9 * u[1]]),
        )
        sol = solve(ODEProblem(f, jnp.array([1.0, 0.0]), (0.0, 1.0), p),
                    Tsit5(), saveat=jnp.array([0.0, 1.0]), callback=cb,
                    sensealg=InterpolatingAdjoint())
        return sol.ys[-1, 0]

    p = jnp.array([9.8])
    g = jax.grad(loss)(p)
    fd = (loss(p + 1e-6) - loss(p - 1e-6)) / 2e-6
    np.testing.assert_allclose(float(g[0]), float(fd), rtol=1e-4)


def test_smoke_steady_state():
    def f(u, p):
        return u ** 3 + u - p

    sol = solve_nonlinear(NonlinearProblem(f, jnp.array([0.5]),
                                           jnp.array([2.0])))
    assert bool(sol.retcode == 0)
    g = jax.grad(lambda p: solve_nonlinear(
        NonlinearProblem(f, jnp.array([0.5]), p)).u.sum())(jnp.array([2.0]))
    u = float(sol.u[0])
    np.testing.assert_allclose(float(g[0]), 1.0 / (3 * u ** 2 + 1), rtol=1e-6)


def test_smoke_forward_sensitivity():
    from scimlsensitivity_jl_tpu import (ODEForwardSensitivityProblem,
                                         extract_local_sensitivities)

    prob = ODEForwardSensitivityProblem(_lv, U0_LV, (0.0, 0.5), P_LV)
    sol = solve(prob, Tsit5(), saveat=jnp.array([0.0, 0.5]))
    u, dp = extract_local_sensitivities(sol, -1)
    assert u.shape == (2,) and dp.shape == (4, 2)


def test_smoke_ensemble_vmap():
    def one(u0):
        sol = solve(ODEProblem(_lv, u0, (0.0, 0.5), P_LV), Tsit5(),
                    saveat=jnp.array([0.5]))
        return sol.ys[-1]

    outs = jax.vmap(one)(jnp.stack([U0_LV, U0_LV * 1.1, U0_LV * 0.9]))
    assert outs.shape == (3, 2) and np.all(np.isfinite(np.asarray(outs)))


def test_smoke_exports_resolve():
    for name in S.__all__:
        assert getattr(S, name, None) is not None, name
