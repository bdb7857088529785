"""Forward sensitivity + DirectAdjoint tests (reference: test/Core1/forward.jl
strategy — sensitivities vs finite differences / reverse adjoints)."""

import jax
import jax.numpy as jnp
import numpy as np

from scimlsensitivity_jl_tpu import (
    DirectAdjoint,
    ForwardSensitivity,
    GaussAdjoint,
    ODEForwardSensitivityProblem,
    ODEProblem,
    Tsit5,
    extract_local_sensitivities,
    solve,
)

LV_P = jnp.array([1.5, 1.0, 3.0, 1.0])
LV_U0 = jnp.array([1.0, 1.0])
TS = jnp.linspace(0.0, 10.0, 11)


def lv(u, p, t):
    x, y = u[0], u[1]
    a, b, c, d = p[0], p[1], p[2], p[3]
    return jnp.stack([a * x - b * x * y, -c * y + d * x * y])


def test_forward_sensitivity_problem_vs_jacfwd():
    prob = ODEForwardSensitivityProblem(lv, LV_U0, (0.0, 10.0), LV_P)
    sol = solve(prob, Tsit5(), saveat=TS, rtol=1e-10, atol=1e-12,
                sensealg=GaussAdjoint())
    u, S = extract_local_sensitivities(sol)
    assert u.shape == (11, 2) and S.shape == (11, 4, 2)

    # Oracle: jacfwd through the scan-based solve (DirectAdjoint path is the
    # one forward-mode-differentiable route; custom_vjp rules block jvp).
    def traj(p):
        pr = ODEProblem(lv, LV_U0, (0.0, 10.0), p)
        return solve(pr, Tsit5(), saveat=TS, rtol=1e-10, atol=1e-12,
                     sensealg=DirectAdjoint(), max_steps=1024).ys

    J = jax.jacfwd(traj)(LV_P)  # (nt, n, np)
    assert np.allclose(S, np.transpose(np.asarray(J), (0, 2, 1)), rtol=1e-6, atol=1e-8)


def test_forward_sensitivity_sensealg_gradient():
    def loss(u0, p, sensealg):
        prob = ODEProblem(lv, u0, (0.0, 10.0), p)
        sol = solve(prob, Tsit5(), saveat=TS, rtol=1e-10, atol=1e-12,
                    sensealg=sensealg)
        return jnp.sum((sol.ys - 1.0) ** 2)

    du0_f, dp_f = jax.grad(lambda u, p: loss(u, p, ForwardSensitivity()),
                           argnums=(0, 1))(LV_U0, LV_P)
    du0_g, dp_g = jax.grad(lambda u, p: loss(u, p, GaussAdjoint()),
                           argnums=(0, 1))(LV_U0, LV_P)
    assert np.allclose(dp_f, dp_g, rtol=1e-6, atol=1e-9)
    assert np.allclose(du0_f, du0_g, rtol=1e-6, atol=1e-9)


def test_direct_adjoint_gradient():
    def loss(u0, p, sensealg):
        prob = ODEProblem(lv, u0, (0.0, 10.0), p)
        sol = solve(prob, Tsit5(), saveat=TS, rtol=1e-8, atol=1e-10,
                    sensealg=sensealg, max_steps=1024)
        return jnp.sum((sol.ys - 1.0) ** 2)

    du0_d, dp_d = jax.grad(lambda u, p: loss(u, p, DirectAdjoint()),
                           argnums=(0, 1))(LV_U0, LV_P)
    du0_g, dp_g = jax.grad(lambda u, p: loss(u, p, GaussAdjoint()),
                           argnums=(0, 1))(LV_U0, LV_P)
    # Discrete vs continuous adjoint: agreement limited by solve tolerance.
    assert np.allclose(dp_d, dp_g, rtol=1e-5, atol=1e-8)
    assert np.allclose(du0_d, du0_g, rtol=1e-5, atol=1e-8)


def test_direct_adjoint_forward_values():
    prob = ODEProblem(lambda u, p, t: -p * u, jnp.array([1.0]), (0.0, 2.0),
                      jnp.asarray(0.7))
    sol = solve(prob, Tsit5(), saveat=jnp.linspace(0.0, 2.0, 5),
                sensealg=DirectAdjoint(), rtol=1e-9, atol=1e-11)
    assert np.allclose(sol.ys.ravel(), np.exp(-0.7 * np.asarray(sol.ts)), rtol=1e-7)
    assert int(sol.retcode) == 0
