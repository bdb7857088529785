"""DiffEqCallbacks-surface parity: VectorContinuousCallback,
PresetTimeCallback / PeriodicCallback (dosing events), terminal callbacks
(terminate! analogue) and TerminateSteadyState.

Reference surfaces: SciMLBase VectorContinuousCallback (tracked per
component, callback_tracking.jl:144-185), DiffEqCallbacks.PresetTimeCallback
(the reverse pass itself uses them, adjoint_common.jl:824-868),
integrator terminate! + retcode Terminated (truncated-solve adjoint handling,
interpolating_adjoint.jl:347-353), DiffEqCallbacks.TerminateSteadyState.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scimlsensitivity_jl_tpu import (
    BacksolveAdjoint,
    ContinuousCallback,
    DirectAdjoint,
    DiscreteCallback,
    ForwardDiffSensitivity,
    GaussAdjoint,
    InterpolatingAdjoint,
    ODEProblem,
    PeriodicCallback,
    PresetTimeCallback,
    QuadratureAdjoint,
    TerminateSteadyState,
    Tsit5,
    VectorContinuousCallback,
    solve,
)

TOLS = dict(rtol=1e-10, atol=1e-12)


# ---------------------------------------------------------------------------
# VectorContinuousCallback
# ---------------------------------------------------------------------------

def test_vector_continuous_callback_matches_scalar_composition():
    """A 2-component vector callback == two scalar callbacks, values AND
    gradients (every component is its own tracked event)."""

    def f(u, p, t):
        return jnp.array([u[1], -p[0] * u[0]])

    def vcond(u, p, t):
        return jnp.array([u[0] - 0.4, u[0] + 0.4])

    def vaffect(u, p, t, idx):
        return jnp.where(idx == 0, u * p[1], u * 0.97)

    vcb = VectorContinuousCallback(vcond, vaffect, len=2)
    scb = [
        ContinuousCallback(lambda u, p, t: u[0] - 0.4,
                           lambda u, p, t: u * p[1]),
        ContinuousCallback(lambda u, p, t: u[0] + 0.4,
                           lambda u, p, t: u * 0.97),
    ]
    u0 = jnp.array([1.0, 0.0])
    p = jnp.array([4.0, 0.9])
    ts = jnp.linspace(0.0, 2.0, 7)

    def loss(q, cb, alg):
        sol = solve(ODEProblem(f, u0, (0.0, 2.0), q), Tsit5(), saveat=ts,
                    callback=cb, sensealg=alg, max_events=64, **TOLS)
        return jnp.sum(sol.ys * jnp.arange(1.0, 15.0).reshape(7, 2))

    sol_v = solve(ODEProblem(f, u0, (0.0, 2.0), p), Tsit5(), saveat=ts,
                  callback=vcb, max_events=64, **TOLS)
    sol_s = solve(ODEProblem(f, u0, (0.0, 2.0), p), Tsit5(), saveat=ts,
                  callback=scb, max_events=64, **TOLS)
    assert int(sol_v.events[3]) >= 2
    np.testing.assert_allclose(np.asarray(sol_v.ys), np.asarray(sol_s.ys),
                               rtol=1e-9)

    g_ref = jax.grad(loss)(p, scb, ForwardDiffSensitivity())
    for alg in [ForwardDiffSensitivity(), GaussAdjoint(),
                InterpolatingAdjoint(), DirectAdjoint()]:
        g = jax.grad(loss)(p, vcb, alg)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-5, err_msg=type(alg).__name__)


# ---------------------------------------------------------------------------
# PresetTimeCallback / PeriodicCallback (dosing)
# ---------------------------------------------------------------------------

DOSE_TIMES = [0.3, 0.75]


def _dose_setup():
    def f(u, p, t):
        return -p[0] * u

    def dose(u, p, t):
        return u + p[1]

    u0 = jnp.array([1.0])
    p = jnp.array([1.3, 0.5])
    return f, dose, u0, p


def test_preset_time_callback_values_match_analytic():
    f, dose, u0, p = _dose_setup()
    cb = PresetTimeCallback(DOSE_TIMES, dose)
    sol = solve(ODEProblem(f, u0, (0.0, 1.0), p), Tsit5(),
                saveat=jnp.array([0.0, 0.5, 1.0]), callback=cb, **TOLS)
    a, d = float(p[0]), float(p[1])
    u_05 = (np.exp(-a * 0.3) + d) * np.exp(-a * 0.2)
    u_1 = ((np.exp(-a * 0.3) + d) * np.exp(-a * 0.45) + d) * np.exp(-a * 0.25)
    np.testing.assert_allclose(float(sol.ys[1, 0]), u_05, rtol=1e-8)
    np.testing.assert_allclose(float(sol.ys[2, 0]), u_1, rtol=1e-8)
    assert int(sol.events[3]) == 2


def test_preset_time_dosing_gradients_all_sensealgs():
    f, dose, u0, p = _dose_setup()
    cb = PresetTimeCallback(DOSE_TIMES, dose)
    ts = jnp.array([0.5, 1.0])

    def loss(q, alg):
        sol = solve(ODEProblem(f, u0, (0.0, 1.0), q), Tsit5(), saveat=ts,
                    callback=cb, sensealg=alg, **TOLS)
        return jnp.sum(sol.ys ** 2)

    # analytic gradient of the dosed decay
    a, d = float(p[0]), float(p[1])
    u05 = (np.exp(-0.3 * a) + d) * np.exp(-0.2 * a)
    u1 = ((np.exp(-0.3 * a) + d) * np.exp(-0.45 * a) + d) * np.exp(-0.25 * a)
    du05_da = (-0.3 * np.exp(-0.3 * a)) * np.exp(-0.2 * a) \
        + (np.exp(-0.3 * a) + d) * (-0.2) * np.exp(-0.2 * a)
    t1 = (-0.3 * np.exp(-0.3 * a)) * np.exp(-0.45 * a) \
        + (np.exp(-0.3 * a) + d) * (-0.45) * np.exp(-0.45 * a)
    du1_da = t1 * np.exp(-0.25 * a) \
        + ((np.exp(-0.3 * a) + d) * np.exp(-0.45 * a) + d) \
        * (-0.25) * np.exp(-0.25 * a)
    du05_dd = np.exp(-0.2 * a)
    du1_dd = np.exp(-0.45 * a) * np.exp(-0.25 * a) + np.exp(-0.25 * a)
    g_exact = np.array([2 * u05 * du05_da + 2 * u1 * du1_da,
                        2 * u05 * du05_dd + 2 * u1 * du1_dd])

    for alg in [ForwardDiffSensitivity(), DirectAdjoint(), GaussAdjoint(),
                InterpolatingAdjoint(), BacksolveAdjoint(),
                QuadratureAdjoint(abstol=1e-12, reltol=1e-10)]:
        g = np.asarray(jax.grad(loss)(p, alg))
        np.testing.assert_allclose(g, g_exact, rtol=1e-6,
                                   err_msg=type(alg).__name__)


def test_periodic_callback_equals_preset_times():
    f, dose, u0, p = _dose_setup()
    per = PeriodicCallback(dose, 0.25)
    pre = PresetTimeCallback([0.25, 0.5, 0.75, 1.0], dose)
    kw = dict(saveat=jnp.array([0.6, 1.0]), **TOLS)
    s1 = solve(ODEProblem(f, u0, (0.0, 1.0), p), Tsit5(), callback=per, **kw)
    s2 = solve(ODEProblem(f, u0, (0.0, 1.0), p), Tsit5(), callback=pre, **kw)
    assert int(s1.events[3]) == 4
    np.testing.assert_allclose(np.asarray(s1.ys), np.asarray(s2.ys),
                               rtol=1e-10)


# ---------------------------------------------------------------------------
# Terminal events
# ---------------------------------------------------------------------------

def test_terminal_event_time_to_event_gradient():
    """Falling body: stop when height hits 0. τ = sqrt(2 u0 / g);
    dτ/dg = -τ/(2g) — the t_final gradient must flow (DirectAdjoint via
    plain AD; FDS via the jvp contraction of t_final)."""

    def f(u, p, t):
        return jnp.array([u[1], -p[0]])

    cb = ContinuousCallback(lambda u, p, t: u[0],
                            lambda u, p, t: u, direction=-1, terminal=True)
    u0 = jnp.array([1.0, 0.0])
    g0 = jnp.array([3.0])
    tau = float(np.sqrt(2.0 / 3.0))

    sol = solve(ODEProblem(f, u0, (0.0, 2.0), g0), Tsit5(),
                saveat=jnp.array([0.0, 2.0]), callback=cb, **TOLS)
    assert int(sol.retcode) == 5 and bool(sol.success)
    np.testing.assert_allclose(float(sol.stats.retcode), 5)
    # t_final == τ, and saveat rows past τ hold the terminal state
    tf = float(sol.ts[-1])  # saveat time, still 2.0
    assert tf == 2.0
    np.testing.assert_allclose(float(sol.ys[1, 0]), 0.0, atol=1e-8)
    np.testing.assert_allclose(float(sol.ys[1, 1]), -3.0 * tau, rtol=1e-7)

    # differentiate τ via the held terminal state's velocity row: v(τ) = -g τ
    def tau_of(q, alg):
        s = solve(ODEProblem(f, u0, (0.0, 2.0), q), Tsit5(),
                  saveat=jnp.array([0.0, 2.0]), callback=cb,
                  sensealg=alg, **TOLS)
        return -s.ys[-1, 1] / q[0]

    # every discrete AND dense continuous adjoint differentiates the
    # stopping time (continuous adjoints reverse from the dynamic t_final;
    # the terminal event's implicit-τ correction pairs against f⁺ = 0)
    dtau_exact = -tau / (2 * 3.0)
    for alg in [DirectAdjoint(), ForwardDiffSensitivity(), GaussAdjoint(),
                InterpolatingAdjoint(), BacksolveAdjoint(),
                QuadratureAdjoint(abstol=1e-12, reltol=1e-10)]:
        g = float(jax.grad(lambda q: tau_of(q, alg))(g0)[0])
        np.testing.assert_allclose(g, dtau_exact, rtol=1e-9,
                                   err_msg=type(alg).__name__)

    # dτ/du0[0] = 1/(g τ) through the held velocity row
    def tau_u(v0, alg):
        s = solve(ODEProblem(f, v0, (0.0, 2.0), g0), Tsit5(),
                  saveat=jnp.array([0.0, 2.0]), callback=cb,
                  sensealg=alg, **TOLS)
        return -s.ys[-1, 1] / g0[0]

    for alg in [GaussAdjoint(), InterpolatingAdjoint()]:
        gu = np.asarray(jax.grad(lambda v: tau_u(v, alg))(u0))
        np.testing.assert_allclose(gu[0], 1.0 / (3.0 * tau), rtol=1e-9,
                                   err_msg=type(alg).__name__)


def test_terminal_event_checkpointed_adjoints():
    """Checkpointed Interpolating/Gauss reverse a Terminated solve by
    freezing intervals past the dynamic t_final (pure λ-jump accumulation)
    and clamping the boundary interval — gradients match the
    discrete-forward oracle."""
    def f(u, p, t):
        return -p * u

    cb = DiscreteCallback(lambda u, p, t: u[0] < 0.5,
                          lambda u, p, t: u, terminal=True)
    prob = ODEProblem(f, jnp.array([1.0]), (0.0, 5.0), jnp.array([1.0]))
    ts = jnp.linspace(0.0, 5.0, 6)

    def loss(q, alg):
        s = solve(ODEProblem(f, jnp.array([1.0]), (0.0, 5.0), q), Tsit5(),
                  saveat=ts, callback=cb, sensealg=alg, **TOLS)
        return jnp.sum(jnp.arange(1.0, 7.0) * s.ys[:, 0])

    g_ref = float(jax.grad(lambda q: loss(q, ForwardDiffSensitivity()))
                  (jnp.array([1.0]))[0])
    assert abs(g_ref) > 1e-8
    for alg in [InterpolatingAdjoint(checkpointing=True),
                GaussAdjoint(checkpointing=True),
                InterpolatingAdjoint(), GaussAdjoint()]:
        g = float(jax.grad(lambda q: loss(q, alg))(jnp.array([1.0]))[0])
        np.testing.assert_allclose(g, g_ref, rtol=1e-6,
                                   err_msg=repr(alg))
    # default sensealg silently upgraded to DirectAdjoint, not an error
    s = solve(prob, Tsit5(), callback=cb, **TOLS)
    assert int(s.retcode) == 5


def test_terminal_event_held_rows_and_prior_events_continuous_adjoints():
    """Damped rotation with a non-terminal event AND a terminal stop:
    held saveat rows + prior-event composition, continuous adjoints vs the
    discrete-forward oracle."""

    def f(u, p, t):
        return jnp.array([p[0] * u[1], -p[0] * u[0]])

    cbs = [
        # non-terminal; the affect pushes u[1] AWAY from the threshold so
        # the event doesn't chatter
        ContinuousCallback(lambda u, p, t: u[1] + 0.3,
                           lambda u, p, t: jnp.array(
                               [u[0] * p[1], u[1] - 0.1]),
                           direction=-1),
        ContinuousCallback(lambda u, p, t: u[0] + 0.55,
                           lambda u, p, t: u * 0.9,
                           direction=-1, terminal=True),
    ]
    u0 = jnp.array([1.0, 0.0])
    p0 = jnp.array([2.0, 0.95])
    ts = jnp.linspace(0.0, 3.0, 9)
    wts = jnp.arange(1.0, 19.0).reshape(9, 2)

    def loss(q, alg):
        s = solve(ODEProblem(f, u0, (0.0, 3.0), q), Tsit5(), saveat=ts,
                  callback=cbs, sensealg=alg, max_events=64, **TOLS)
        return jnp.sum(wts * s.ys)

    s = solve(ODEProblem(f, u0, (0.0, 3.0), p0), Tsit5(), saveat=ts,
              callback=cbs, max_events=64, **TOLS)
    assert int(s.retcode) == 5
    assert int(s.events[3]) >= 2       # prior event(s) + the terminal one

    g_ref = np.asarray(jax.grad(lambda q: loss(q, ForwardDiffSensitivity()))
                       (p0))
    assert np.linalg.norm(g_ref) > 1e-8
    for alg in [DirectAdjoint(), GaussAdjoint(), InterpolatingAdjoint(),
                BacksolveAdjoint(),
                QuadratureAdjoint(abstol=1e-12, reltol=1e-10)]:
        g = np.asarray(jax.grad(lambda q: loss(q, alg))(p0))
        # 1e-5: continuous adjoints interpolate the forward between nodes
        # (all four agree with each other to ~4e-7 — no systematic term)
        np.testing.assert_allclose(g, g_ref, rtol=1e-5,
                                   err_msg=type(alg).__name__)


def test_terminate_steady_state():
    a = jnp.array([2.0, -1.0])

    def f(u, p, t):
        return -(u - p)

    cb = TerminateSteadyState(abstol=1e-10, reltol=0.0)
    sol = solve(ODEProblem(f, jnp.zeros(2), (0.0, 100.0), a), Tsit5(),
                saveat=jnp.array([0.0, 100.0]), callback=cb, **TOLS)
    assert int(sol.retcode) == 5
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.ys[-1]), np.asarray(a),
                               rtol=1e-8)

    # gradient of the settled state wrt the target: du*/dp = I (up to the
    # termination tolerance); DirectAdjoint and FDS must agree exactly
    # (same discretization)
    def loss(q, alg):
        s = solve(ODEProblem(f, jnp.zeros(2), (0.0, 100.0), q), Tsit5(),
                  saveat=jnp.array([0.0, 100.0]), callback=cb,
                  sensealg=alg, **TOLS)
        return jnp.sum(jnp.array([1.0, 2.0]) * s.ys[-1])

    g_dir = np.asarray(jax.grad(lambda q: loss(q, DirectAdjoint()))(a))
    g_fds = np.asarray(jax.grad(
        lambda q: loss(q, ForwardDiffSensitivity()))(a))
    np.testing.assert_allclose(g_dir, g_fds, rtol=1e-9)
    np.testing.assert_allclose(g_dir, np.array([1.0, 2.0]), rtol=1e-6)


def test_event_exactly_at_t1_reverse_jump_applied():
    """Regression: an event firing exactly at t1 (here a preset dose at the
    final time) had its reverse jump silently DROPPED by every continuous
    adjoint — the in-loop stop matcher only sees stops the reverse
    integrator lands on, and it STARTS at t1. Gradient was exactly 2x the
    true value on this problem (the affect's 0.5 factor never applied)."""

    def f(u, p, t):
        return -p * u

    cb = PresetTimeCallback([1.0], lambda u, p, t: u * 0.5)

    def loss(q, alg):
        s = solve(ODEProblem(f, jnp.array([1.0]), (0.0, 1.0), q), Tsit5(),
                  saveat=jnp.array([1.0]), callback=cb, sensealg=alg, **TOLS)
        return s.ys[-1, 0]

    p0 = jnp.array([1.3])
    exact = -0.5 * np.exp(-1.3)
    for alg in [GaussAdjoint(), InterpolatingAdjoint(), BacksolveAdjoint(),
                QuadratureAdjoint(abstol=1e-12, reltol=1e-10),
                DirectAdjoint(), ForwardDiffSensitivity()]:
        g = float(jax.grad(lambda q: loss(q, alg))(p0)[0])
        np.testing.assert_allclose(g, exact, rtol=1e-7,
                                   err_msg=type(alg).__name__)


def test_terminal_preset_time_stops_early():
    """A terminal dose: integration stops at the first preset time."""

    def f(u, p, t):
        return -p * u

    cb = PresetTimeCallback([0.4], lambda u, p, t: u * 0.5, terminal=True)
    sol = solve(ODEProblem(f, jnp.array([1.0]), (0.0, 1.0),
                           jnp.array([1.0])), Tsit5(),
                saveat=jnp.array([0.0, 1.0]), callback=cb, **TOLS)
    assert int(sol.retcode) == 5
    np.testing.assert_allclose(float(sol.ys[-1, 0]),
                               0.5 * np.exp(-0.4), rtol=1e-8)
