"""Gauss–Kronrod quadrature: pair construction + adaptive-knob response.

Verifies the round-2 upgrade of QuadratureAdjoint/GaussKronrodAdjoint from
fixed GL panels to true GK(7,15) pairs with tolerance-driven refinement
(reference: quadgk driver /root/reference/src/quadrature_adjoint.jl:536-633;
IntegratingGKSumCallback gauss_adjoint.jl:815-825).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scimlsensitivity_jl_tpu import (
    GaussAdjoint,
    GaussKronrodAdjoint,
    ODEProblem,
    QuadratureAdjoint,
    Tsit5,
    solve,
)
from scimlsensitivity_jl_tpu.ops.quadrature import _gk_pair_np, gauss_kronrod_01


def test_gk15_pair_construction():
    """The computed (7,15) pair matches the canonical GK15 rule: exactness
    to degree 3n+1=22 (Kronrod) and 2n-1=13 (embedded Gauss), plus two
    published node/weight spot values."""
    nodes, wk, wg = _gk_pair_np(7)
    assert nodes.shape == (15,)
    # published GK15 values (Kahaner/QUADPACK tables)
    assert abs(wk[7] - 0.209482141084728) < 1e-12  # weight at x=0
    assert abs(abs(nodes[8]) - 0.207784955007898) < 1e-12
    for d in range(0, 23):
        exact = 2.0 / (d + 1) if d % 2 == 0 else 0.0
        assert abs(np.sum(wk * nodes**d) - exact) < 1e-13, f"K deg {d}"
        if d <= 13:
            assert abs(np.sum(wg * nodes**d) - exact) < 1e-13, f"G deg {d}"


def test_gk_01_mapping():
    x, wk, wg = gauss_kronrod_01(7, jnp.float64)
    assert jnp.all((x > 0) & (x < 1))
    assert abs(float(jnp.sum(wk)) - 1.0) < 1e-12
    # error functional vanishes on polynomials the Gauss rule integrates
    f = x**9
    assert abs(float((wk - wg) @ f)) < 1e-13


def _osc_problem():
    """f has no u-dependence, so λ ≡ cotangent and the reverse solver takes
    maximal steps — quadrature error dominates and the knobs must rescue it:
    dG/dp = ∫₀³ sin(40 t) dt, known in closed form."""
    w = 40.0

    def f(u, p, t):
        return jnp.full_like(u, p * jnp.sin(w * t))

    exact = (1.0 - np.cos(w * 3.0)) / w
    return f, exact


@pytest.mark.parametrize("depths,decreasing", [((0, 2, 4), True)])
def test_quadrature_adjoint_knobs_respond(depths, decreasing):
    f, exact = _osc_problem()
    p = jnp.array(0.7)
    u0 = jnp.array([1.0])
    ts = jnp.array([0.0, 3.0])

    def grad_at(md):
        def loss(pp):
            sol = solve(
                ODEProblem(f, u0, (0.0, 3.0), pp), Tsit5(), saveat=ts,
                rtol=1e-10, atol=1e-12, adj_rtol=1e-8, adj_atol=1e-10,
                sensealg=QuadratureAdjoint(
                    abstol=1e-12, reltol=1e-10, max_depth=md
                ),
            )
            return sol.ys[-1, 0]

        return float(jax.grad(loss)(p))

    errs = [abs(grad_at(md) - exact) for md in depths]
    # depth 0 (refinement off) must be visibly wrong on this integrand,
    # and each extra depth allowance must improve it by orders of magnitude
    assert errs[0] > 1e-2
    assert errs[1] < 1e-4
    assert errs[2] < 1e-9
    assert errs == sorted(errs, reverse=True)


def test_gauss_kronrod_per_step_refinement():
    """GaussKronrodAdjoint's conditional per-step bisection handles the same
    oscillatory integrand; GaussAdjoint (plain 7-node GL, no estimate) is the
    uncontrolled baseline it must beat."""
    f, exact = _osc_problem()
    p = jnp.array(0.7)
    u0 = jnp.array([1.0])
    ts = jnp.array([0.0, 3.0])

    def grad_with(alg):
        def loss(pp):
            sol = solve(
                ODEProblem(f, u0, (0.0, 3.0), pp), Tsit5(), saveat=ts,
                rtol=1e-10, atol=1e-12, adj_rtol=1e-8, adj_atol=1e-10,
                sensealg=alg,
            )
            return sol.ys[-1, 0]

        return float(jax.grad(loss)(p))

    err_gk = abs(grad_with(GaussKronrodAdjoint(max_depth=3)) - exact)
    err_g = abs(grad_with(GaussAdjoint()) - exact)
    assert err_gk < 1e-6
    assert err_gk < err_g * 1e-2


def test_gk_agrees_on_smooth_problem():
    """On a smooth (Lotka–Volterra) problem all three quadrature designs
    agree to the adjoint-solve tolerance."""

    def f(u, p, t):
        return jnp.array([
            p[0] * u[0] - p[1] * u[0] * u[1],
            p[1] * u[0] * u[1] - p[2] * u[1],
        ])

    p = jnp.array([1.5, 1.0, 3.0])
    u0 = jnp.array([1.0, 1.0])
    ts = jnp.linspace(0.0, 3.0, 7)

    def grad_with(alg):
        def loss(pp):
            sol = solve(
                ODEProblem(f, u0, (0.0, 3.0), pp), Tsit5(), saveat=ts,
                rtol=1e-8, atol=1e-10, sensealg=alg,
            )
            return jnp.sum(sol.ys**2)

        return np.asarray(jax.grad(loss)(p))

    g_q = grad_with(QuadratureAdjoint())
    g_gk = grad_with(GaussKronrodAdjoint())
    g_g = grad_with(GaussAdjoint())
    np.testing.assert_allclose(g_q, g_gk, rtol=1e-6)
    np.testing.assert_allclose(g_q, g_g, rtol=1e-6)
