"""DDE tests (reference: neural-DDE layer tests, test/Core4/layers_dde.jl).

Oracle: u'(t) = -u(t-1), u(t)=1 for t<=0 has the exact method-of-steps
solution u(t) = 1 - t on [0,1], u(t) = 1 - t + (t-1)^2/2 on [1,2].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_dde_state_dependent_lag_matches_constant():
    # A callable lag that returns a constant must reproduce the
    # constant-lag solve exactly (same gather, same nodes).
    def rhs(u, h, p, t):
        return -h[0]

    const = DDEProblem(rhs, jnp.array([1.0]), (0.0, 2.0), None, lags=(1.0,))
    dep = DDEProblem(rhs, jnp.array([1.0]), (0.0, 2.0), None,
                     lags=(lambda u, p, t: 1.0,), max_lag=1.0)
    ts = jnp.array([0.0, 0.7, 1.4, 2.0])
    ya = solve(const, dt=1e-2, saveat=ts).ys
    yb = solve(dep, dt=1e-2, saveat=ts).ys
    assert np.allclose(np.asarray(ya), np.asarray(yb), rtol=0, atol=0)


def test_dde_state_dependent_lag_self_convergence_and_grad():
    # Genuinely state-dependent lag tau(u) = 0.5 + 0.25*tanh(u); no closed
    # form, so oracle = dt-refinement self-convergence + gradient vs finite
    # differences (the reference's DelayDiffEq dependent_lags surface).
    def make(p):
        return DDEProblem(
            lambda u, h, pp, t: -pp * h[0], jnp.array([1.0]), (0.0, 2.0), p,
            lags=(lambda u, pp, t: 0.5 + 0.25 * jnp.tanh(u[0]),),
            max_lag=0.75,
        )

    def endpoint(p, dt):
        return solve(make(p), dt=dt).ys[-1, 0]

    p0 = jnp.asarray(1.1)
    y1 = float(endpoint(p0, 1.0 / 40))
    y2 = float(endpoint(p0, 1.0 / 80))
    y3 = float(endpoint(p0, 1.0 / 160))
    # refinement differences shrink (order >= 2 in the presence of the
    # state-dependent breaking points)
    assert abs(y2 - y3) < abs(y1 - y2) / 3, (y1, y2, y3)

    g = jax.grad(lambda p: endpoint(p, 1.0 / 80) ** 2)(p0)
    eps = 1e-6
    fd = (float(endpoint(p0 + eps, 1.0 / 80) ** 2)
          - float(endpoint(p0 - eps, 1.0 / 80) ** 2)) / (2 * eps)
    assert np.isclose(float(g), fd, rtol=1e-5), (float(g), fd)


def test_dde_state_dependent_lag_violation_poisons():
    # lag dips below dt at runtime -> retcode 3, NaN output (fail loudly,
    # never silently read unwritten nodes)
    prob = DDEProblem(
        lambda u, h, p, t: -h[0], jnp.array([1.0]), (0.0, 1.0), None,
        lags=(lambda u, p, t: jnp.where(t > 0.5, 1e-4, 0.5),),
        max_lag=0.5,
    )
    sol = solve(prob, dt=1.0 / 50)
    assert int(sol.retcode) == 3
    assert np.all(np.isnan(np.asarray(sol.ys[-1])))


def test_dde_callable_lag_requires_max_lag():
    import pytest

    prob = DDEProblem(
        lambda u, h, p, t: -h[0], jnp.array([1.0]), (0.0, 1.0), None,
        lags=(lambda u, p, t: 0.5,),
    )
    with pytest.raises(ValueError, match="max_lag"):
        solve(prob, dt=0.01)


def test_dde_stiff_trbdf2():
    # Stiff DDE u' = -A·u + B·u(t-1), A = 500: explicit RK4 at dt = 0.02
    # (A·dt = 10) is unstable, TR-BDF2 (L-stable) is not. Oracle: RK4 at
    # dt = 5e-4 (stable regime).
    from scimlsensitivity_jl_tpu import TRBDF2

    # sinusoidal forcing keeps the solution off the quasi-steady manifold
    # so the O(dt²) tracking error is visible (without it TR-BDF2 collapses
    # onto the slow manifold to machine precision and convergence slopes
    # are unmeasurable)
    A, B = 500.0, 5.0

    def rhs(u, h, p, t):
        return -A * (u - jnp.sin(2.0 * jnp.pi * t)) + B * h[0]

    def make():
        return DDEProblem(rhs, jnp.array([1.0]), (0.0, 2.0), None,
                          lags=(1.0,))

    y_ref = float(solve(make(), dt=2e-4).ys[-1, 0])

    y_imp = float(solve(make(), TRBDF2(), dt=0.02).ys[-1, 0])
    assert np.isclose(y_imp, y_ref, rtol=5e-2, atol=1e-4), (y_imp, y_ref)

    y_exp = solve(make(), dt=0.02).ys[-1, 0]
    assert (not np.isfinite(float(y_exp))) or abs(float(y_exp)) > 1e3

    # self convergence under refinement
    e1 = abs(float(solve(make(), TRBDF2(), dt=0.02).ys[-1, 0]) - y_ref)
    e2 = abs(float(solve(make(), TRBDF2(), dt=0.005).ys[-1, 0]) - y_ref)
    assert e2 < e1 / 3, (e1, e2)


def test_dde_stiff_trbdf2_gradient_vs_fd():
    from scimlsensitivity_jl_tpu import TRBDF2

    def loss(p):
        prob = DDEProblem(lambda u, h, pp, t: -200.0 * u + pp * h[0],
                          jnp.array([1.0]), (0.0, 1.5), p, lags=(0.5,))
        return solve(prob, TRBDF2(), dt=0.01).ys[-1, 0] ** 2

    p0 = jnp.asarray(3.0)
    g = jax.grad(loss)(p0)
    eps = 1e-6
    fd = (float(loss(p0 + eps)) - float(loss(p0 - eps))) / (2 * eps)
    assert np.isclose(float(g), fd, rtol=1e-5), (float(g), fd)


def test_dde_max_lag_must_cover_constant_lags():
    import pytest

    prob = DDEProblem(lambda u, h, p, t: -h[0], jnp.array([1.0]),
                      (0.0, 1.0), None, lags=(1.0,), max_lag=0.5)
    with pytest.raises(ValueError, match="max_lag"):
        solve(prob, dt=0.05)


def test_dde_rejects_explicit_solver():
    import pytest

    from scimlsensitivity_jl_tpu import Tsit5

    prob = DDEProblem(lambda u, h, p, t: -h[0], jnp.array([1.0]),
                      (0.0, 1.0), None, lags=(0.5,))
    with pytest.raises(NotImplementedError, match="RK4"):
        solve(prob, Tsit5(), dt=0.01)


def test_distributed_lag_integrodifferential():
    """Distributed lags (round-3): u' = -∫₀^τ α e^{-βs} u(t-s) ds validated
    against the linear-chain-trick ODE (u' = -I, I' = αu - βI; exact up to
    the e^{-βτ} truncation), gradients through the kernel vs finite
    differences."""
    from scimlsensitivity_jl_tpu import ODEProblem, Tsit5

    alpha, beta, tau = 2.0, 6.0, 2.0  # beta*tau = 12 -> truncation ~6e-6
    p = jnp.array([alpha, beta])
    u0 = jnp.array([1.0])

    def Kern(s, pp):
        return pp[0] * jnp.exp(-pp[1] * s)

    def f_dde(u, hist, pp, t):
        (I,) = hist
        return -I

    prob = DDEProblem(f_dde, u0, (0.0, 3.0), p, lags=(), max_lag=tau,
                      dist_kernels=(Kern,))
    ts = jnp.array([0.0, 1.0, 2.0, 3.0])
    sol = solve(prob, dt=0.005, saveat=ts)
    assert int(sol.retcode) == 0

    I0 = alpha * (1 - np.exp(-beta * tau)) / beta

    def f_ode(z, pp, t):
        u, I = z
        return jnp.stack([-I, pp[0] * u - pp[1] * I])

    oref = solve(ODEProblem(f_ode, jnp.array([1.0, I0]), (0.0, 3.0), p),
                 Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12)
    assert float(jnp.max(jnp.abs(sol.ys[:, 0] - oref.ys[:, 0]))) < 1e-4

    def loss(pp):
        pr = DDEProblem(f_dde, u0, (0.0, 3.0), pp, lags=(), max_lag=tau,
                        dist_kernels=(Kern,))
        return jnp.sum(solve(pr, dt=0.01).ys[-1])

    g = jax.grad(loss)(p)
    for i in range(2):
        e = jnp.zeros(2).at[i].set(1e-6)
        fd = (loss(p + e) - loss(p - e)) / 2e-6
        assert abs(float(g[i]) - float(fd)) < 1e-7


def test_distributed_plus_discrete_lags():
    """Mixed discrete + distributed delays: hist ordering is (discrete...,
    integrals...); smoke correctness via a constant-kernel identity
    (K = α 1: ∫₀^τ u = known for constant history at t = t0)."""
    p = jnp.array([0.5])
    u0 = jnp.array([2.0])

    def Kern(s, pp):
        return pp[0]

    def f_dde(u, hist, pp, t):
        ud, I = hist
        return -0.1 * ud - 0.05 * I

    prob = DDEProblem(f_dde, u0, (0.0, 1.0), p, lags=(0.5,), max_lag=1.0,
                      dist_kernels=(Kern,))
    sol = solve(prob, dt=0.01, saveat=jnp.array([0.0, 1.0]))
    assert int(sol.retcode) == 0
    assert np.all(np.isfinite(np.asarray(sol.ys)))
    # gradient flows through both channels
    def loss(pp):
        pr = DDEProblem(f_dde, u0, (0.0, 1.0), pp, lags=(0.5,), max_lag=1.0,
                        dist_kernels=(Kern,))
        return jnp.sum(solve(pr, dt=0.01).ys[-1])
    g = jax.grad(loss)(p)
    e = jnp.zeros(1).at[0].set(1e-6)
    fd = (loss(p + e) - loss(p - e)) / 2e-6
    assert abs(float(g[0]) - float(fd)) < 1e-8


# ---------------------------------------------------------------------------
# Adaptive (PI-controlled) constrained method of steps — DelayDiffEq's
# MethodOfSteps(Tsit5(), constrained=true) slot. Round-3 queue item.
# ---------------------------------------------------------------------------


def test_dde_adaptive_exact_piecewise():
    prob = DDEProblem(
        lambda u, h, p, t: -h[0], jnp.array([1.0]), (0.0, 2.0), None,
        lags=(1.0,),
    )
    ts = jnp.array([0.0, 0.5, 1.0, 1.5, 2.0])
    sol = solve(prob, saveat=ts, rtol=1e-8, atol=1e-10)  # no dt => adaptive

    def exact(t):
        if t <= 1.0:
            return 1.0 - t
        return 1.0 - t + (t - 1.0) ** 2 / 2.0

    expect = np.array([exact(float(t)) for t in ts])
    assert int(sol.retcode) == 0
    # breaking point t0+tau is a forced tstop, so the piecewise-polynomial
    # oracle comes out to near machine precision in a handful of steps
    assert int(sol.stats.n_accepted) < 20
    assert np.allclose(sol.ys[:, 0], expect, atol=1e-9)
    # dense output between nodes
    assert abs(float(sol(0.75)[0]) - exact(0.75)) < 1e-9


def test_dde_adaptive_tolerance_controls_error():
    def f(u, h, p, t):
        return p[0] * u * (1.0 - h[0])  # delayed logistic

    ts = jnp.array([0.0, 2.0, 4.0])
    p = jnp.array([1.7])

    def run(rtol):
        prob = DDEProblem(f, jnp.array([0.5]), (0.0, 4.0), p, lags=(0.8,))
        return solve(prob, saveat=ts, rtol=rtol, atol=rtol * 1e-2)

    ref = solve(DDEProblem(f, jnp.array([0.5]), (0.0, 4.0), p, lags=(0.8,)),
                dt=1e-4, saveat=ts)
    errs, accs = [], []
    for rt in [1e-3, 1e-6, 1e-9]:
        s = run(rt)
        assert int(s.retcode) == 0
        errs.append(float(jnp.max(jnp.abs(s.ys - ref.ys))))
        accs.append(int(s.stats.n_accepted))
    assert errs[0] > errs[1] > errs[2]          # tighter tol -> smaller err
    assert accs[0] < accs[1] < accs[2]          # ... and more steps
    assert errs[2] < 1e-7


def test_dde_adaptive_gradient_converges_to_fixed_grid():
    def f(u, h, p, t):
        return p[0] * u * (1.0 - h[0])

    ts = jnp.array([0.0, 2.0, 4.0])
    p = jnp.array([1.7])

    def loss_adaptive(pp, rtol):
        prob = DDEProblem(f, jnp.array([0.5]), (0.0, 4.0), pp, lags=(0.8,))
        return jnp.sum(solve(prob, saveat=ts, rtol=rtol,
                             atol=rtol * 1e-2).ys ** 2)

    def loss_fixed(pp):
        prob = DDEProblem(f, jnp.array([0.5]), (0.0, 4.0), pp, lags=(0.8,))
        return jnp.sum(solve(prob, dt=1e-4, saveat=ts).ys ** 2)

    g_ref = jax.grad(loss_fixed)(p)
    g = jax.jit(jax.grad(lambda q: loss_adaptive(q, 1e-10)))(p)
    assert np.isclose(float(g[0]), float(g_ref[0]), rtol=1e-6), (
        float(g[0]), float(g_ref[0]))


def test_dde_adaptive_state_dependent_lag():
    def lagfn(u, p, t):
        return 0.6 + 0.2 * jnp.sin(u[0]) ** 2  # lag in [0.6, 0.8]

    def f(u, h, p, t):
        return p[0] * u * (1.0 - h[0])

    ts = jnp.array([0.0, 2.0, 4.0])
    p = jnp.array([1.3])
    prob = DDEProblem(f, jnp.array([0.5]), (0.0, 4.0), p, lags=(lagfn,),
                      max_lag=0.8)
    # dtmax (static lag lower bound) is REQUIRED for dep lags
    with pytest.raises(ValueError, match="dtmax"):
        solve(prob, saveat=ts)
    sol = solve(prob, saveat=ts, dtmax=0.5, rtol=1e-9, atol=1e-11)
    ref = solve(prob, dt=2e-4, saveat=ts)
    assert int(sol.retcode) == 0
    assert np.allclose(np.asarray(sol.ys), np.asarray(ref.ys), atol=1e-6)

    def loss(q, **kw):
        pr = DDEProblem(f, jnp.array([0.5]), (0.0, 4.0), q, lags=(lagfn,),
                        max_lag=0.8)
        return jnp.sum(solve(pr, saveat=ts, **kw).ys ** 2)

    g = jax.grad(lambda q: loss(q, dtmax=0.5, rtol=1e-10, atol=1e-12))(p)
    g_ref = jax.grad(lambda q: loss(q, dt=2e-4))(p)
    assert np.isclose(float(g[0]), float(g_ref[0]), rtol=1e-5)


def test_dde_adaptive_dep_lag_violation_poisons():
    # realizable lag 0.01 < dtmax cap 0.3: the explicitness contract is
    # broken -> retcode 3 + NaN, never silently-clamped values
    def f(u, h, p, t):
        return -h[0]

    prob = DDEProblem(f, jnp.array([0.5]), (0.0, 4.0), None,
                      lags=(lambda u, p, t: 0.01,))
    sol = solve(prob, saveat=jnp.array([0.0, 4.0]), dtmax=0.3)
    assert int(sol.retcode) == 3
    assert bool(jnp.isnan(sol.ys).all())


def test_dde_adaptive_rejects_unsupported():
    prob_dist = DDEProblem(
        lambda u, h, p, t: -h[0], jnp.array([1.0]), (0.0, 1.0), None,
        lags=(0.5,), max_lag=1.0, dist_kernels=(lambda s, p: 1.0,),
    )
    with pytest.raises(NotImplementedError, match="fixed-grid"):
        solve(prob_dist, saveat=jnp.array([0.0, 1.0]))


def test_dde_adaptive_stiff_trbdf2():
    # Stiff DDE under the ADAPTIVE constrained method of steps: the
    # L-stable ESDIRK stepper takes O(10) steps where an explicit adaptive
    # stepper is stability-limited to dt ~ 1/A (hundreds of steps).
    from scimlsensitivity_jl_tpu import TRBDF2

    A, B = 5000.0, 5.0

    def rhs(u, h, p, t):
        return -A * (u - jnp.sin(2.0 * jnp.pi * t)) + B * h[0]

    def make(p=None):
        return DDEProblem(rhs, jnp.array([1.0]), (0.0, 2.0), p, lags=(1.0,))

    ts = jnp.array([0.0, 0.7, 1.4, 2.0])
    ref = solve(make(), TRBDF2(), dt=5e-4, saveat=ts)

    sol = solve(make(), TRBDF2(), saveat=ts, rtol=1e-4, atol=1e-7)
    assert int(sol.retcode) == 0
    assert np.allclose(np.asarray(sol.ys), np.asarray(ref.ys),
                       rtol=1e-3, atol=1e-4)
    # accuracy-limited, not stability-limited: ~O(100) steps at A=5000
    assert int(sol.stats.n_accepted) < 500

    # the explicit adaptive stepper is stability-limited to dt ~ 1/A:
    # 1024 steps cannot cover [0, 2] -> MaxIters, NaN-poisoned
    exp = solve(make(), saveat=ts, rtol=1e-4, atol=1e-7, max_steps=1024)
    assert int(exp.retcode) != 0


def test_dde_adaptive_stiff_gradient_vs_fixed_grid():
    from scimlsensitivity_jl_tpu import TRBDF2

    def rhs(u, h, p, t):
        return -p[0] * (u - jnp.sin(2.0 * jnp.pi * t)) + p[1] * h[0]

    ts = jnp.array([0.0, 1.0, 2.0])
    p = jnp.array([60.0, 4.0])

    def loss_adaptive(q):
        prob = DDEProblem(rhs, jnp.array([1.0]), (0.0, 2.0), q, lags=(1.0,))
        return jnp.sum(solve(prob, TRBDF2(), saveat=ts, rtol=1e-6,
                             atol=1e-8, max_steps=2048).ys ** 2)

    def loss_fixed(q):
        prob = DDEProblem(rhs, jnp.array([1.0]), (0.0, 2.0), q, lags=(1.0,))
        return jnp.sum(solve(prob, TRBDF2(), dt=2e-4, saveat=ts).ys ** 2)

    g = jax.jit(jax.grad(loss_adaptive))(p)
    g_ref = jax.grad(loss_fixed)(p)
    assert np.allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3,
                       atol=1e-7), (g, g_ref)

    # truncated solves poison the GRADIENT too (not just the values): at
    # rtol=1e-10 the order-2 stepper exceeds max_steps=512 -> MaxIters
    def loss_trunc(q):
        prob = DDEProblem(rhs, jnp.array([1.0]), (0.0, 2.0), q, lags=(1.0,))
        return jnp.sum(solve(prob, TRBDF2(), saveat=ts, rtol=1e-10,
                             atol=1e-12, max_steps=512).ys ** 2)

    g_bad = jax.grad(loss_trunc)(p)
    assert bool(jnp.isnan(g_bad).all()), g_bad


def test_dde_adaptive_stiff_rejects_dep_lags():
    from scimlsensitivity_jl_tpu import TRBDF2

    prob = DDEProblem(lambda u, h, p, t: -h[0], jnp.array([1.0]),
                      (0.0, 1.0), None, lags=(lambda u, p, t: 0.5,),
                      max_lag=0.6)
    with pytest.raises(NotImplementedError, match="[Ss]tate-dependent"):
        solve(prob, TRBDF2(), saveat=jnp.array([0.0, 1.0]), dtmax=0.3)
