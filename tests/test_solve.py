"""Forward-solve correctness: analytic solutions, scipy cross-check, dense
output, saveat capture, tstops, backwards integration.

Mirrors the reference test strategy (SURVEY §4): real integrators on small
ODEs, no mocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from scimlsensitivity_jl_tpu import (
    BS3,
    Dopri5,
    Heun,
    ODEProblem,
    Tsit5,
    solve,
)
from scimlsensitivity_jl_tpu.sensealg import GaussAdjoint


def lv(u, p, t):
    x, y = u[0], u[1]
    a, b, c, d = p[0], p[1], p[2], p[3]
    return jnp.stack([a * x - b * x * y, -c * y + d * x * y])


LV_P = jnp.array([1.5, 1.0, 3.0, 1.0])
LV_U0 = jnp.array([1.0, 1.0])


@pytest.mark.parametrize("make_solver", [Tsit5, Dopri5, BS3])
def test_exponential_decay(make_solver):
    prob = ODEProblem(lambda u, p, t: -p * u, jnp.array([1.0]), (0.0, 2.0), jnp.array(0.7))
    sol = solve(prob, make_solver(), saveat=jnp.linspace(0.0, 2.0, 5), rtol=1e-9, atol=1e-11,
                sensealg=GaussAdjoint())
    expected = jnp.exp(-0.7 * sol.ts)[:, None]
    assert np.allclose(sol.ys, expected, rtol=1e-7, atol=1e-9)
    assert int(sol.retcode) == 0


def test_harmonic_oscillator_energy():
    def f(u, p, t):
        return jnp.stack([u[1], -(p ** 2) * u[0]])

    prob = ODEProblem(f, jnp.array([1.0, 0.0]), (0.0, 10.0), jnp.asarray(2.0))
    ts = jnp.linspace(0.0, 10.0, 7)
    sol = solve(prob, Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12, sensealg=GaussAdjoint())
    expected = np.cos(2.0 * np.asarray(ts))
    assert np.allclose(sol.ys[:, 0], expected, atol=1e-7)


def test_lotka_volterra_vs_scipy():
    ts = np.linspace(0.0, 10.0, 21)
    ref = solve_ivp(
        lambda t, y: np.asarray(lv(jnp.asarray(y), LV_P, t)),
        (0.0, 10.0), np.asarray(LV_U0), rtol=1e-10, atol=1e-12, t_eval=ts,
        method="RK45", dense_output=False,
    )
    prob = ODEProblem(lv, LV_U0, (0.0, 10.0), LV_P)
    sol = solve(prob, Tsit5(), saveat=jnp.asarray(ts), rtol=1e-10, atol=1e-12,
                sensealg=GaussAdjoint())
    assert np.allclose(np.asarray(sol.ys), ref.y.T, rtol=1e-6, atol=1e-7)


def test_dense_output():
    prob = ODEProblem(lambda u, p, t: -u, jnp.array([1.0]), (0.0, 3.0), None)
    sol = solve(prob, Tsit5(), rtol=1e-9, atol=1e-11, dense=True,
                sensealg=GaussAdjoint())
    for t in [0.0, 0.37, 1.5, 2.9, 3.0]:
        assert np.allclose(sol(t), np.exp(-t), rtol=1e-6), t


def test_backwards_integration():
    prob = ODEProblem(lambda u, p, t: -u, jnp.array([jnp.e]), (1.0, 0.0), None)
    sol = solve(prob, Tsit5(), saveat=jnp.array([1.0, 0.5, 0.0]), rtol=1e-9, atol=1e-11,
                sensealg=GaussAdjoint())
    # u(1) = e and du/dt = -u  =>  u(t) = e^{2-t}.
    assert np.allclose(sol.ys[:, 0], np.exp(2.0 - np.array([1.0, 0.5, 0.0])), rtol=1e-7)


def test_pytree_state():
    def f(u, p, t):
        return {"a": -p["k"] * u["a"], "b": p["k"] * u["b"]}

    u0 = {"a": jnp.array([1.0, 2.0]), "b": jnp.array(3.0)}
    prob = ODEProblem(f, u0, (0.0, 1.0), {"k": jnp.asarray(0.5)})
    sol = solve(prob, Tsit5(), rtol=1e-9, atol=1e-11, sensealg=GaussAdjoint())
    final = jax.tree_util.tree_map(lambda x: x[-1], sol.ys)
    assert np.allclose(final["a"], np.array([1.0, 2.0]) * np.exp(-0.5))
    assert np.allclose(final["b"], 3.0 * np.exp(0.5))


def test_saveat_endpoint_capture():
    prob = ODEProblem(lv, LV_U0, (0.0, 5.0), LV_P)
    ts = jnp.linspace(0.0, 5.0, 11)
    sol = solve(prob, Tsit5(), saveat=ts, sensealg=GaussAdjoint())
    assert np.allclose(sol.ys[0], LV_U0)
    assert sol.ys.shape == (11, 2)


def test_fixed_dt0_and_heun():
    prob = ODEProblem(lambda u, p, t: -u, jnp.array([1.0]), (0.0, 1.0), None)
    sol = solve(prob, Heun(), dt0=1e-3, rtol=1e-7, atol=1e-9, sensealg=GaussAdjoint())
    assert np.allclose(sol.ys[-1, 0], np.exp(-1.0), rtol=1e-5)


def test_jit_and_vmap():
    ts = jnp.linspace(0.0, 5.0, 6)

    @jax.jit
    def run(u0):
        prob = ODEProblem(lv, u0, (0.0, 5.0), LV_P)
        return solve(prob, Tsit5(), saveat=ts, sensealg=GaussAdjoint()).ys

    single = run(LV_U0)
    batch = jax.vmap(run)(jnp.stack([LV_U0, LV_U0 * 1.1]))
    assert batch.shape == (2, 6, 2)
    assert np.allclose(batch[0], single)


def test_fixed_grid_unrolled_matches_adaptive():
    # the bench configuration: unrolled fixed-grid gradient vs the adaptive
    # continuous adjoint
    from scimlsensitivity_jl_tpu.models.neural_ode import spiral_data
    from scimlsensitivity_jl_tpu.sensealg import InterpolatingAdjoint

    prob, ts = spiral_data(jnp.float64)
    ref = solve(prob, Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12).ys
    sol = solve(prob, Tsit5(), saveat=ts, dt=1.5 / 58, adaptive=False,
                unroll=True)
    assert float(jnp.max(jnp.abs(sol.ys - ref))) < 1e-5

    u0 = jnp.array([2.0, 0.0])

    def loss_fixed(u):
        s = solve(ODEProblem(prob.f, u, (0.0, 1.5), None), Tsit5(),
                  saveat=ts, dt=1.5 / 58, adaptive=False, unroll=True)
        return jnp.sum(s.ys ** 2)

    def loss_adj(u):
        s = solve(ODEProblem(prob.f, u, (0.0, 1.5), None), Tsit5(),
                  saveat=ts, rtol=1e-10, atol=1e-12,
                  sensealg=InterpolatingAdjoint())
        return jnp.sum(s.ys ** 2)

    g1 = jax.grad(loss_fixed)(u0)
    g2 = jax.grad(loss_adj)(u0)
    assert np.allclose(g1, g2, rtol=1e-5, atol=1e-8)


def test_user_tstops_hit_exactly():
    # discontinuous forcing at t*=0.6180339887...: without a tstop the
    # controller steps over it; with the tstop the solver lands on it exactly
    tstar = 0.6180339887

    def f(u, p, t):
        return jnp.where(t < tstar, -u, 2.0 * u)

    prob = ODEProblem(f, jnp.array([1.0]), (0.0, 1.0), None)
    sol = solve(prob, Tsit5(), rtol=1e-10, atol=1e-12,
                tstops=jnp.array([tstar]), sensealg=GaussAdjoint())
    expect = np.exp(-tstar) * np.exp(2.0 * (1.0 - tstar))
    assert np.allclose(sol.ys[-1, 0], expect, rtol=1e-8)


def test_virtual_brownian_tree():
    from scimlsensitivity_jl_tpu.ops.brownian import VirtualBrownianTree

    key = jax.random.PRNGKey(11)
    vbt = VirtualBrownianTree.create(key, 0.0, 1.0, shape=(), depth=24,
                                     dtype=jnp.float64)
    # deterministic: same query twice is bit-identical
    a = vbt(jnp.asarray(0.37))
    b = vbt(jnp.asarray(0.37))
    assert float(a) == float(b)
    # endpoints
    assert abs(float(vbt(jnp.asarray(0.0)))) < 1e-12
    # increments over disjoint intervals have Brownian scaling statistics
    ts = jnp.linspace(0.0, 1.0, 65)
    w = jax.vmap(vbt)(ts)
    incs = np.diff(np.asarray(w))
    # variance of increments ~ dt = 1/64 (loose statistical check)
    assert 0.2 / 64 < incs.var() < 5.0 / 64


def test_gbs_extrapolation_order():
    # observed convergence order of the K=3 GBS solver should be ~6
    import math

    def f(u, p, t):
        return jnp.stack([u[1], -u[0]])

    from scimlsensitivity_jl_tpu import GBS

    prob = ODEProblem(f, jnp.array([1.0, 0.0]), (0.0, 1.0), None)
    exact = np.array([np.cos(1.0), -np.sin(1.0)])
    errs = []
    for nst in [2, 4]:
        sol = solve(prob, GBS(levels=3), dt=1.0 / nst, adaptive=False)
        errs.append(float(jnp.max(jnp.abs(sol.ys[-1] - exact))))
    order = math.log(errs[0] / errs[1], 2)
    assert order > 5.0, (errs, order)


def test_gbs_high_accuracy_adjoint():
    from scimlsensitivity_jl_tpu import GBS
    from scimlsensitivity_jl_tpu.sensealg import InterpolatingAdjoint

    def loss(p):
        prob = ODEProblem(lambda u, pp, t: -pp * u, jnp.array([1.0]),
                          (0.0, 2.0), p)
        s = solve(prob, GBS(levels=4), rtol=1e-12, atol=1e-14,
                  sensealg=InterpolatingAdjoint())
        return s.ys[-1, 0]

    g = jax.grad(loss)(jnp.asarray(0.7))
    assert np.isclose(float(g), -2 * np.exp(-1.4), rtol=1e-9)


def test_solution_reference_aliases():
    # sol.t / sol.u (the reference's field names) alias ts / ys
    prob = ODEProblem(lambda u, p, t: -u, jnp.ones(2), (0.0, 1.0), None)
    sol = solve(prob, Tsit5(), saveat=jnp.linspace(0.0, 1.0, 3))
    assert sol.t is sol.ts
    assert sol.u is sol.ys


def test_scalar_u0_and_null_parameters():
    """Reference parity: scalar states (test/Core2/scalar_u.jl) and
    p == None / unused-p solves (test/Core6/null_parameters.jl)."""
    from scimlsensitivity_jl_tpu.sensealg import GaussAdjoint, InterpolatingAdjoint

    # scalar u0: ys drops to shape (nt,), gradients flow
    def f(u, p, t):
        return u * p[0]

    ts = jnp.linspace(0.0, 1.0, 5)
    s = solve(ODEProblem(f, 0.5, (0.0, 1.0), jnp.array([2.0])), Tsit5(),
              saveat=ts, rtol=1e-10, atol=1e-12)
    assert s.ys.shape == (5,)
    np.testing.assert_allclose(float(s.ys[-1]), 0.5 * np.exp(2.0),
                               rtol=1e-8)

    def loss(p):
        sol = solve(ODEProblem(f, 0.5, (0.0, 1.0), p), Tsit5(), saveat=ts,
                    rtol=1e-10, atol=1e-12, sensealg=GaussAdjoint())
        return jnp.sum(sol.ys ** 2)

    g = float(jax.grad(loss)(jnp.array([2.0]))[0])
    eps = 1e-6
    fd = (float(loss(jnp.array([2.0 + eps])))
          - float(loss(jnp.array([2.0 - eps])))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-7)

    # p=None solves; p-unused gradients are exactly zero; u0 gradients flow
    def f2(u, p, t):
        return u

    s2 = solve(ODEProblem(f2, jnp.zeros(2), (0.0, 1.0), None), Tsit5())
    assert s2.ys.shape == (2, 2)

    gp = jax.grad(lambda p: jnp.sum(
        solve(ODEProblem(f2, jnp.ones(2), (0.0, 1.0), p), Tsit5(),
              sensealg=InterpolatingAdjoint()).ys))(jnp.array([3.0]))
    np.testing.assert_allclose(np.asarray(gp), 0.0)

    gu = jax.grad(lambda u0: jnp.sum(
        solve(ODEProblem(f2, u0, (0.0, 1.0), None), Tsit5(),
              sensealg=InterpolatingAdjoint()).ys))(jnp.ones(2))
    np.testing.assert_allclose(np.asarray(gu), 1.0 + np.e, rtol=1e-6)
