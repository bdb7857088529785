"""FBDF multistep stiff solver: accuracy, efficiency class, adjoints, DAE.

Reference slot: FBDF in the OrdinaryDiffEq stiff test matrix
(/root/reference/test/Core2/stiff_adjoints.jl, SURVEY §2 native item 4).
VERDICT r1 acceptance: Robertson forward+adjoint at tight rtol
cross-validated against Rosenbrock23/Seulex, with multistep efficiency
(fewer steps/Newton factorizations than one-step methods at equal accuracy).
"""

import jax
import jax.numpy as jnp
import numpy as np

from scimlsensitivity_jl_tpu import (
    FBDF,
    GaussAdjoint,
    ODEProblem,
    QuadratureAdjoint,
    Rosenbrock23,
    SDIRK4,
    Seulex,
    solve,
)
from scimlsensitivity_jl_tpu.solvers.integrate import integrate


def _rob_rhs(u, t):
    y1, y2, y3 = u
    return jnp.array([
        -0.04 * y1 + 1e4 * y2 * y3,
        0.04 * y1 - 1e4 * y2 * y3 - 3e7 * y2**2,
        3e7 * y2**2,
    ])


# scipy LSODA rtol=1e-12 reference value for Robertson u(100)
_ROB_U100 = np.array([6.17234882e-01, 6.15359127e-06, 3.82758964e-01])


def test_fbdf_robertson_accuracy_and_efficiency():
    u0 = jnp.array([1.0, 0.0, 0.0])
    r = integrate(FBDF(), _rob_rhs, 0.0, 100.0, u0,
                  rtol=1e-8, atol=1e-10, max_steps=4096)
    assert int(r.stats.retcode) == 0
    np.testing.assert_allclose(np.asarray(r.u_final), _ROB_U100, rtol=1e-6)

    r_ros = integrate(Rosenbrock23(), _rob_rhs, 0.0, 100.0, u0,
                      rtol=1e-8, atol=1e-10, max_steps=16384)
    r_seu = integrate(Seulex(), _rob_rhs, 0.0, 100.0, u0,
                      rtol=1e-8, atol=1e-10, max_steps=4096)
    # multistep efficiency: one Newton factorization per step, step count at
    # or below the one-step methods' (Seulex does `levels` LUs per step,
    # Rosenbrock23 needs ~1.5x the steps at this tolerance)
    assert int(r.stats.n_accepted) <= int(r_seu.stats.n_accepted) + 10
    assert int(r.stats.n_accepted) < int(r_ros.stats.n_accepted)


def test_fbdf_order_ramps_beyond_bdf1():
    """A smooth problem at tight rtol must engage the higher BDF orders:
    BDF1 alone would need ~sqrt(1/rtol)-scaled step counts."""
    def ho(u, t):
        return jnp.array([u[1], -u[0]])

    r = integrate(FBDF(), ho, 0.0, 10.0, jnp.array([1.0, 0.0]),
                  rtol=1e-8, atol=1e-10, max_steps=8192)
    assert int(r.stats.retcode) == 0
    assert abs(float(r.u_final[0]) - np.cos(10.0)) < 1e-5
    # BDF1 at err~h^2/2 with rtol 1e-8 would need ~70k steps over 10 units
    assert int(r.stats.n_accepted) < 500


def test_fbdf_long_horizon_robertson():
    u0 = jnp.array([1.0, 0.0, 0.0])
    r = integrate(FBDF(), _rob_rhs, 0.0, 1e5, u0,
                  rtol=1e-8, atol=1e-12, max_steps=8192)
    assert int(r.stats.retcode) == 0
    assert abs(float(jnp.sum(r.u_final)) - 1.0) < 1e-9  # mass conservation


def test_fbdf_adjoint_gradients_cross_validated():
    """FBDF forward + FBDF reverse gradients vs its own finite differences
    and vs the Seulex/Quadrature pairing (stiff adjoint parity)."""

    def rob(u, p, t):
        y1, y2, y3 = u
        k1, k2, k3 = p
        return jnp.array([
            -k1 * y1 + k2 * y2 * y3,
            k1 * y1 - k2 * y2 * y3 - k3 * y2**2,
            k3 * y2**2,
        ])

    p = jnp.array([0.04, 1e4, 3e7])
    u0 = jnp.array([1.0, 0.0, 0.0])
    ts = jnp.array([0.0, 10.0, 100.0])

    def loss(pp, solver, alg, bwd=None):
        sol = solve(ODEProblem(rob, u0, (0.0, 100.0), pp), solver,
                    saveat=ts, rtol=1e-10, atol=1e-14, sensealg=alg,
                    adj_rtol=1e-8, adj_atol=1e-10, max_steps=16384,
                    bwd_solver=bwd)
        return jnp.sum(sol.ys[:, 0] ** 2) + 1e4 * jnp.sum(sol.ys[:, 1] ** 2)

    g_q = np.asarray(jax.grad(
        lambda pp: loss(pp, FBDF(), QuadratureAdjoint()))(p))
    g_g = np.asarray(jax.grad(
        lambda pp: loss(pp, FBDF(), GaussAdjoint()))(p))
    # Seulex forward / SDIRK4 reverse: Seulex's own reverse stepper is
    # pathologically slow through the post-jump stiff transient (see
    # _dae_reverse_stepper's rationale) and times out at this tolerance.
    from scimlsensitivity_jl_tpu import SDIRK4
    g_s = np.asarray(jax.grad(
        lambda pp: loss(pp, Seulex(), QuadratureAdjoint(), SDIRK4()))(p))

    # finite differences on the FBDF primal, relative step per parameter
    pn = np.asarray(p)
    g_fd = np.zeros(3)
    for i in range(3):
        eps = 1e-6 * abs(pn[i])
        e = np.zeros(3)
        e[i] = eps
        g_fd[i] = (
            float(loss(jnp.asarray(pn + e), FBDF(), QuadratureAdjoint()))
            - float(loss(jnp.asarray(pn - e), FBDF(), QuadratureAdjoint()))
        ) / (2 * eps)

    np.testing.assert_allclose(g_q, g_fd, rtol=2e-4)
    np.testing.assert_allclose(g_g, g_fd, rtol=2e-4)
    np.testing.assert_allclose(g_s, g_fd, rtol=2e-4)


def test_fbdf_dae_mass_matrix():
    """Robertson in index-1 DAE form (M = diag(1,1,0), conservation row)."""

    def rob_dae(u, t):
        y1, y2, y3 = u
        return jnp.array([
            -0.04 * y1 + 1e4 * y2 * y3,
            0.04 * y1 - 1e4 * y2 * y3 - 3e7 * y2**2,
            y1 + y2 + y3 - 1.0,
        ])

    M = np.diag([1.0, 1.0, 0.0])
    u0 = jnp.array([1.0, 0.0, 0.0])
    r = integrate(FBDF().with_mass_matrix(M), rob_dae, 0.0, 100.0, u0,
                  rtol=1e-8, atol=1e-10, max_steps=8192)
    r2 = integrate(SDIRK4().with_mass_matrix(M), rob_dae, 0.0, 100.0, u0,
                   rtol=1e-8, atol=1e-10, max_steps=8192)
    assert int(r.stats.retcode) == 0
    np.testing.assert_allclose(np.asarray(r.u_final), np.asarray(r2.u_final),
                               rtol=1e-6)
    assert abs(float(jnp.sum(r.u_final)) - 1.0) < 1e-10


def test_fbdf_rejects_scan_driver():
    from scimlsensitivity_jl_tpu.solvers.integrate import integrate_scan
    import pytest

    with pytest.raises(NotImplementedError):
        integrate_scan(FBDF(), _rob_rhs, 0.0, 1.0, jnp.array([1.0, 0.0, 0.0]))
