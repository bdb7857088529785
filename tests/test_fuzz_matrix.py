"""Randomized cross-sensealg gradient fuzzing.

The bespoke tests pin each sensealg against a hand-picked oracle problem;
this file closes the COMBINATORIAL gap: randomly generated small systems
(random stable linear part + random tanh nonlinearity + forcing), random
pytree parameters, random saveat grids and random quadratic losses, with
every adjoint/forward sensealg's gradient cross-validated against the
discrete-forward oracle (jacfwd THROUGH the adaptive solver — exact for
the realized discretization) and against finite differences.

Mirrors the reference's dominant test pattern (SURVEY §4: "computes the
same gradient 3-6 ways and asserts isapprox", test/Core3/adjoint.jl) but
over a seeded random family instead of a fixed zoo, so silent-wrong-
gradient regressions in any sensealg x pytree x system combination
surface here even without a bespoke test.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from scimlsensitivity_jl_tpu import (
    BacksolveAdjoint,
    DirectAdjoint,
    ForwardDiffSensitivity,
    ForwardSensitivity,
    GaussAdjoint,
    GaussKronrodAdjoint,
    InterpolatingAdjoint,
    ODEProblem,
    QuadratureAdjoint,
    Tsit5,
    solve,
)

TOLS = dict(rtol=1e-10, atol=1e-12)


@pytest.fixture(autouse=True)
def _clear_caches_each_test():
    """This module is compile-heavy enough to hit the XLA-CPU cumulative-
    state segfault (see conftest) WITHIN one module; per-test cache drops
    keep compiler state bounded (tests share no programs across seeds)."""
    yield
    jax.clear_caches()

SENSEALGS = [
    InterpolatingAdjoint(),
    InterpolatingAdjoint(checkpointing=True),
    BacksolveAdjoint(),
    GaussAdjoint(),
    GaussKronrodAdjoint(),
    QuadratureAdjoint(abstol=1e-12, reltol=1e-10),
    DirectAdjoint(),
    ForwardSensitivity(),
    ForwardDiffSensitivity(),
]


def _random_system(seed):
    """Random 2-3 state ODE with pytree params:
    u' = A u + eps * tanh(B u) + c * sin(w t).   A is Hurwitz-shifted so
    trajectories stay O(1) over the horizon."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 4))
    A = rng.normal(size=(n, n)) * 0.4 - 0.8 * np.eye(n)
    B = rng.normal(size=(n, n)) * 0.5
    c = rng.normal(size=(n,)) * 0.5
    w = float(rng.uniform(0.5, 2.0))
    eps = float(rng.uniform(0.2, 0.6))
    u0 = rng.normal(size=(n,)) * 0.5
    T = float(rng.uniform(1.5, 3.0))
    n_save = int(rng.integers(3, 6))
    ts = np.sort(np.concatenate([[0.0, T], rng.uniform(0.05 * T, 0.95 * T,
                                                       n_save - 2)]))
    wts = rng.normal(size=(n_save, n))

    p = {"A": jnp.asarray(A), "B": jnp.asarray(B), "c": jnp.asarray(c)}

    def f(u, p, t):
        return (p["A"] @ u + eps * jnp.tanh(p["B"] @ u)
                + p["c"] * jnp.sin(w * t))

    return f, jnp.asarray(u0), (0.0, T), p, jnp.asarray(ts), jnp.asarray(wts)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_system_gradient_cross_validation(seed):
    f, u0, tspan, p, ts, wts = _random_system(seed)

    def loss(q, sensealg):
        prob = ODEProblem(f, u0, tspan, q)
        sol = solve(prob, Tsit5(), saveat=ts, sensealg=sensealg, **TOLS)
        return jnp.sum(wts * sol.ys) + jnp.sum(sol.ys[-1] ** 2)

    # discrete-forward oracle: jacfwd THROUGH the adaptive loop
    g_ref = jax.grad(loss)(p, ForwardDiffSensitivity())
    ref_flat = np.concatenate([np.ravel(x) for x in
                               jax.tree_util.tree_leaves(g_ref)])
    assert np.isfinite(ref_flat).all()
    assert np.linalg.norm(ref_flat) > 1e-6  # a zero oracle tests nothing

    # finite-difference spot check on the largest-|g| coordinate (guards
    # against the oracle itself being wrong in a correlated way)
    leaves, treedef = jax.tree_util.tree_flatten(p)
    sizes = [x.size for x in leaves]
    k = int(np.argmax(np.abs(ref_flat)))
    h = 1e-6
    flat0 = np.concatenate([np.ravel(np.asarray(x)) for x in leaves])

    def unflatten(flat):
        out, i = [], 0
        for x, s in zip(leaves, sizes):
            out.append(jnp.asarray(flat[i:i + s]).reshape(x.shape))
            i += s
        return jax.tree_util.tree_unflatten(treedef, out)

    lp = loss(unflatten(flat0 + h * np.eye(flat0.size)[k]),
              ForwardDiffSensitivity())
    lm = loss(unflatten(flat0 - h * np.eye(flat0.size)[k]),
              ForwardDiffSensitivity())
    fd = (float(lp) - float(lm)) / (2 * h)
    assert np.isclose(fd, ref_flat[k], rtol=5e-5, atol=1e-8), (fd, ref_flat[k])

    for alg in SENSEALGS[:-1]:  # oracle itself excluded
        g = jax.grad(loss)(p, alg)
        g_flat = np.concatenate([np.ravel(x) for x in
                                 jax.tree_util.tree_leaves(g)])
        assert np.allclose(g_flat, ref_flat, rtol=2e-5, atol=1e-8), (
            type(alg).__name__,
            np.max(np.abs(g_flat - ref_flat) / (np.abs(ref_flat) + 1e-8)),
        )


@pytest.mark.parametrize("seed", [3, 4])
def test_random_system_u0_gradient_cross_validation(seed):
    """Same family, gradients w.r.t. the initial condition."""
    f, u0, tspan, p, ts, wts = _random_system(seed)

    def loss(v0, sensealg):
        prob = ODEProblem(f, v0, tspan, p)
        sol = solve(prob, Tsit5(), saveat=ts, sensealg=sensealg, **TOLS)
        return jnp.sum(wts * sol.ys)

    g_ref = np.asarray(jax.grad(loss)(u0, ForwardDiffSensitivity()))
    assert np.isfinite(g_ref).all() and np.linalg.norm(g_ref) > 1e-6

    for alg in SENSEALGS[:-1]:
        g = np.asarray(jax.grad(loss)(u0, alg))
        assert np.allclose(g, g_ref, rtol=2e-5, atol=1e-8), (
            type(alg).__name__, g, g_ref)


# ---------------------------------------------------------------------------
# Event-adjoint fuzzing: random damped-rotation systems with a random
# linear event condition and a parameter-dependent jump; every continuous
# adjoint vs the discrete-forward oracle (reference
# Callbacks2/continuous_vs_discrete.jl strategy, randomized).
# ---------------------------------------------------------------------------

from scimlsensitivity_jl_tpu import ContinuousCallback

EVENT_SENSEALGS = [
    InterpolatingAdjoint(),
    BacksolveAdjoint(),
    GaussAdjoint(),
    QuadratureAdjoint(abstol=1e-12, reltol=1e-10),
    DirectAdjoint(),
]


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_random_event_system_gradient_cross_validation(seed):
    rng = np.random.default_rng(seed)
    alpha = float(rng.uniform(-0.2, 0.1))
    omega = float(rng.uniform(2.0, 4.0))
    k = float(rng.uniform(-0.5, 0.5))
    T = float(rng.uniform(1.5, 2.5))
    damp = rng.uniform(0.85, 0.98, size=(2,))
    wts = rng.normal(size=(5, 2))

    def f(u, p, t):
        A = jnp.array([[alpha, omega], [-omega, alpha]])
        return A @ u

    def condition(u, p, t):
        return u[0] + k * u[1]          # crosses zero every half period

    def affect(u, p, t):
        return u * p                    # parameter-dependent damping jump

    cb = ContinuousCallback(condition, affect)
    ts = jnp.linspace(0.0, T, 5)
    u0 = jnp.array([1.0, 0.0])
    p = jnp.asarray(damp)

    def loss(q, v0, sensealg):
        prob = ODEProblem(f, v0, (0.0, T), q)
        sol = solve(prob, Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12,
                    callback=cb, sensealg=sensealg, max_events=256)
        return jnp.sum(wts * sol.ys)

    sol0 = solve(ODEProblem(f, u0, (0.0, T), p), Tsit5(), saveat=ts,
                 rtol=1e-10, atol=1e-12, callback=cb,
                 sensealg=GaussAdjoint(), max_events=256)
    assert int(sol0.retcode) == 0
    assert int(sol0.events[3]) >= 1     # the fuzz case must actually fire

    dp_ref, du0_ref = jax.grad(loss, argnums=(0, 1))(
        p, u0, ForwardDiffSensitivity())
    assert np.isfinite(np.asarray(dp_ref)).all()
    assert np.linalg.norm(np.asarray(dp_ref)) > 1e-8

    for alg in EVENT_SENSEALGS:
        dp, du0 = jax.grad(loss, argnums=(0, 1))(p, u0, alg)
        assert np.allclose(np.asarray(dp), np.asarray(dp_ref),
                           rtol=1e-4, atol=1e-8), (
            type(alg).__name__, np.asarray(dp), np.asarray(dp_ref))
        assert np.allclose(np.asarray(du0), np.asarray(du0_ref),
                           rtol=1e-4, atol=1e-8), (
            type(alg).__name__, np.asarray(du0), np.asarray(du0_ref))


# ---------------------------------------------------------------------------
# SDE adjoint fuzzing: random drift/diffusion over one FIXED noise
# realization; Interpolating/Backsolve/Direct vs forward-mode through the
# realized scheme (reference SDE-group strategy, randomized).
# ---------------------------------------------------------------------------

from scimlsensitivity_jl_tpu import SDEProblem


@pytest.mark.parametrize("seed", [20, 21, 22])
def test_random_sde_gradient_cross_validation(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 4))
    A = rng.normal(size=(n, n)) * 0.3 - 0.6 * np.eye(n)
    sig = rng.uniform(0.05, 0.3, size=(n,))
    u0 = rng.normal(size=(n,)) * 0.3 + 1.0
    T = float(rng.uniform(0.5, 1.0))
    wts = rng.normal(size=(n,))
    key = jax.random.PRNGKey(seed)

    p = {"A": jnp.asarray(A), "sig": jnp.asarray(sig)}

    def drift(u, p, t):
        return p["A"] @ u

    def diffusion(u, p, t):
        return p["sig"] * u             # diagonal multiplicative noise

    dt = T / 64.0

    def loss(q, sensealg):
        prob = SDEProblem(drift, diffusion, jnp.asarray(u0), (0.0, T), q)
        sol = solve(prob, dt=dt, key=key, sensealg=sensealg,
                    saveat=jnp.array([0.0, T]))
        return jnp.sum(wts * sol.ys[-1])

    # forward-mode THROUGH the realized scheme over the same noise = oracle
    flat0, unflatten = jax.flatten_util.ravel_pytree(p)

    def loss_flat(fq):
        return loss(unflatten(fq), DirectAdjoint())

    g_fwd = jax.jacfwd(loss_flat)(flat0)
    assert np.isfinite(np.asarray(g_fwd)).all()
    assert np.linalg.norm(np.asarray(g_fwd)) > 1e-8

    for alg in [DirectAdjoint(), InterpolatingAdjoint(), BacksolveAdjoint()]:
        g = jax.grad(loss)(p, alg)
        g_flat, _ = jax.flatten_util.ravel_pytree(g)
        # Direct/Interp contract against the exact STORED trajectory
        # (bit-comparable to the forward-mode oracle); Backsolve
        # re-integrates u backward in O(1) memory, so its Jacobian
        # contractions ride a trajectory that differs from the stored one
        # by accumulated roundoff (~n_steps*eps*scale ~ 1e-9 over 64
        # steps in f64 — seed 71 measures 7.4e-9 max-abs).
        atol = 1e-8 if isinstance(alg, BacksolveAdjoint) else 1e-10
        assert np.allclose(np.asarray(g_flat), np.asarray(g_fwd),
                           rtol=1e-6, atol=atol), (
            type(alg).__name__,
            np.max(np.abs(np.asarray(g_flat) - np.asarray(g_fwd))))


# ---------------------------------------------------------------------------
# DAE adjoint fuzzing: random semi-explicit index-1 systems
#   ud' = A ud + B ua + c,     0 = ua - tanh(C ud)
# (algebraic states slaved through a smooth random constraint; the Jacobian
# block dg/dua = I is uniformly nonsingular so index-1 holds for every
# draw). Continuous DAE adjoints (algebraic-λ projection) vs the
# discrete-forward oracle through the mass-matrix SDIRK solver.
# ---------------------------------------------------------------------------

from scimlsensitivity_jl_tpu import SDIRK4


@pytest.mark.parametrize("seed", [30, 31])
def test_random_dae_gradient_cross_validation(seed):
    rng = np.random.default_rng(seed)
    nd = int(rng.integers(2, 4))
    na = int(rng.integers(1, 3))
    A = rng.normal(size=(nd, nd)) * 0.3 - 0.7 * np.eye(nd)
    B = rng.normal(size=(nd, na)) * 0.4
    C = rng.normal(size=(na, nd)) * 0.6
    c = rng.normal(size=(nd,)) * 0.3
    T = float(rng.uniform(0.8, 1.5))
    wts = rng.normal(size=(nd + na,))
    ud0 = rng.normal(size=(nd,)) * 0.4
    ua0 = np.tanh(C @ ud0)                      # consistent initialization
    u0 = jnp.asarray(np.concatenate([ud0, ua0]))
    M = jnp.asarray(np.diag([1.0] * nd + [0.0] * na))

    p = {"A": jnp.asarray(A), "B": jnp.asarray(B),
         "C": jnp.asarray(C), "c": jnp.asarray(c)}

    def f(u, p, t):
        ud, ua = u[:nd], u[nd:]
        fd = p["A"] @ ud + p["B"] @ ua + p["c"] * jnp.cos(t)
        ga = ua - jnp.tanh(p["C"] @ ud)
        return jnp.concatenate([fd, ga])

    ts = jnp.array([0.3 * T, 0.7 * T, T])

    def loss(q, sensealg, rt=1e-10, at=1e-12):
        prob = ODEProblem(f, u0, (0.0, T), q, mass_matrix=M)
        sol = solve(prob, SDIRK4(), saveat=ts, rtol=rt, atol=at,
                    dt0=1e-4, sensealg=sensealg, max_steps=8192,
                    adj_rtol=1e-9, adj_atol=1e-12)
        return jnp.sum(wts * sol.ys)            # touches ud AND ua rows

    g_ref = jax.grad(loss)(p, ForwardDiffSensitivity())
    ref_flat, _ = jax.flatten_util.ravel_pytree(g_ref)
    ref_flat = np.asarray(ref_flat)
    assert np.isfinite(ref_flat).all() and np.linalg.norm(ref_flat) > 1e-8

    for alg in [InterpolatingAdjoint(), GaussAdjoint(),
                QuadratureAdjoint(abstol=1e-12, reltol=1e-10)]:
        g = jax.grad(loss)(p, alg)
        g_flat = np.asarray(jax.flatten_util.ravel_pytree(g)[0])
        # 1e-3: continuous DAE adjoints interpolate the stiff forward
        # between nodes (λ-only algs additionally re-consistify algebraic
        # λ rows at quadrature nodes — _dae_lam_fix; this caught ~1e-2
        # errors before that fix)
        assert np.allclose(g_flat, ref_flat, rtol=1e-3, atol=1e-7), (
            type(alg).__name__,
            np.max(np.abs(g_flat - ref_flat) / (np.abs(ref_flat) + 1e-8)))


# ---------------------------------------------------------------------------
# Second-order fuzzing: Hessian and Hv on random systems, discrete
# forward-over-reverse AND the continuous ForwardDiffOverAdjoint path vs
# the jacfwd-of-jacfwd oracle.
# ---------------------------------------------------------------------------

from scimlsensitivity_jl_tpu import (
    second_order_sensitivities,
    second_order_sensitivity_product,
)


@pytest.mark.parametrize("seed", [40, 41])
def test_random_system_second_order_cross_validation(seed):
    rng = np.random.default_rng(seed)
    n = 2
    A = rng.normal(size=(n, n)) * 0.4 - 0.8 * np.eye(n)
    u0 = rng.normal(size=(n,)) * 0.5 + 1.0
    T = float(rng.uniform(0.8, 1.5))
    wts = rng.normal(size=(n,))
    p = jnp.asarray(np.ravel(A))

    def f(u, p, t):
        return p.reshape(n, n) @ u + 0.3 * jnp.tanh(u)

    prob = ODEProblem(f, jnp.asarray(u0), (0.0, T), p)

    def loss_of_sol(sol):
        return jnp.sum(wts * sol.ys[-1]) + jnp.sum(sol.ys[-1] ** 2)

    kw = dict(rtol=1e-10, atol=1e-12)

    # oracle: central differences of the discrete-forward gradient (jacfwd
    # OVER solve is unsupported -- the FDS rule is custom_vjp, so jvp can't
    # cross it; grad works, and its bwd is itself exact forward mode)
    def loss_flat(q):
        sol = solve(ODEProblem(f, jnp.asarray(u0), (0.0, T), q), Tsit5(),
                    sensealg=ForwardDiffSensitivity(), **kw)
        return loss_of_sol(sol)

    # NOT jitted: jit(grad(FDS-rule)) trips an XLA-CPU fusion-compiler
    # RET_CHECK (Incorrect number of arguments / llvm_module != nullptr)
    # on this while_loop program; the unjitted grad compiles fine
    g_fn = jax.grad(loss_flat)
    h = 1e-5
    cols = []
    for kk in range(p.size):
        e = jnp.zeros_like(p).at[kk].set(h)
        cols.append((np.asarray(g_fn(p + e)) - np.asarray(g_fn(p - e)))
                    / (2 * h))
    H_ref = np.stack(cols, axis=1)
    H_ref = 0.5 * (H_ref + H_ref.T)
    assert np.isfinite(H_ref).all() and np.linalg.norm(H_ref) > 1e-8

    H_disc = np.asarray(second_order_sensitivities(
        loss_of_sol, prob, Tsit5(), **kw))
    assert np.allclose(H_disc, H_ref, rtol=1e-5, atol=1e-8), (
        np.max(np.abs(H_disc - H_ref)))

    H_cont = np.asarray(second_order_sensitivities(
        loss_of_sol, prob, Tsit5(), sensealg=GaussAdjoint(), **kw))
    assert np.allclose(H_cont, H_ref, rtol=1e-4, atol=1e-7), (
        np.max(np.abs(H_cont - H_ref)))

    v = jnp.asarray(rng.normal(size=(n * n,)))
    hv_ref = H_ref @ np.asarray(v)
    for alg in [None, GaussAdjoint()]:
        hv = np.asarray(second_order_sensitivity_product(
            loss_of_sol, prob, v, Tsit5(), sensealg=alg, **kw))
        assert np.allclose(hv, hv_ref, rtol=1e-4, atol=1e-7), (alg, hv, hv_ref)


# ---------------------------------------------------------------------------
# Direct-API DAE fuzzing: adjoint_sensitivities on mass-matrix solutions
# (discrete cost vs the grad-over-solve FDS oracle; continuous cost vs an
# independent augmented-quadrature-state oracle). Before the DAE branch in
# interface.py this crashed (Interpolating) or was silently wrong by >10x
# (Gauss/Quadrature: un-projected jumps, no Mᵀ mass, no du0 map).
# ---------------------------------------------------------------------------

from scimlsensitivity_jl_tpu import adjoint_sensitivities


def _random_dae(seed):
    rng = np.random.default_rng(seed)
    nd = int(rng.integers(2, 4))
    na = int(rng.integers(1, 3))
    A = rng.normal(size=(nd, nd)) * 0.3 - 0.7 * np.eye(nd)
    B = rng.normal(size=(nd, na)) * 0.4
    C = rng.normal(size=(na, nd)) * 0.6
    c = rng.normal(size=(nd,)) * 0.3
    T = float(rng.uniform(0.8, 1.5))
    wts = rng.normal(size=(nd + na,))
    ud0 = rng.normal(size=(nd,)) * 0.4
    ua0 = np.tanh(C @ ud0)
    u0 = jnp.asarray(np.concatenate([ud0, ua0]))
    M = jnp.asarray(np.diag([1.0] * nd + [0.0] * na))
    p = {"A": jnp.asarray(A), "B": jnp.asarray(B),
         "C": jnp.asarray(C), "c": jnp.asarray(c)}

    def f(u, q, t):
        ud, ua = u[:nd], u[nd:]
        fd = q["A"] @ ud + q["B"] @ ua + q["c"] * jnp.cos(t)
        return jnp.concatenate([fd, ua - jnp.tanh(q["C"] @ ud)])

    return f, u0, T, p, M, jnp.asarray(wts), nd


@pytest.mark.parametrize("seed", [30, 31])
def test_direct_api_dae_discrete_cost(seed):
    f, u0, T, p, M, wts, _nd = _random_dae(seed)
    ts = jnp.array([0.3 * T, 0.7 * T, T])

    def loss(q):
        sol = solve(ODEProblem(f, u0, (0.0, T), q, mass_matrix=M), SDIRK4(),
                    saveat=ts, rtol=1e-10, atol=1e-12, dt0=1e-4,
                    sensealg=ForwardDiffSensitivity(), max_steps=16384)
        return jnp.sum(wts * sol.ys)

    ref = np.asarray(jax.flatten_util.ravel_pytree(jax.grad(loss)(p))[0])
    sol = solve(ODEProblem(f, u0, (0.0, T), p, mass_matrix=M), SDIRK4(),
                saveat=ts, rtol=1e-10, atol=1e-12, dt0=1e-4,
                max_steps=16384, dense=True)

    for alg in [InterpolatingAdjoint(), GaussAdjoint(), GaussKronrodAdjoint(),
                QuadratureAdjoint(abstol=1e-12, reltol=1e-10)]:
        du0, dp = adjoint_sensitivities(
            sol, t=ts, dgdu_discrete=lambda u, q, t, i: wts,
            sensealg=alg, rtol=1e-9, atol=1e-12)
        df = np.asarray(jax.flatten_util.ravel_pytree(dp)[0])
        assert np.allclose(df, ref, rtol=1e-3, atol=1e-7), (
            type(alg).__name__,
            np.max(np.abs(df - ref) / (np.abs(ref) + 1e-8)))

    with pytest.raises(NotImplementedError):
        adjoint_sensitivities(sol, t=ts,
                              dgdu_discrete=lambda u, q, t, i: wts,
                              sensealg=BacksolveAdjoint())


def test_direct_api_dae_continuous_cost():
    f, u0, T, p, M, wts, nd = _random_dae(31)

    def g(u, q, t):
        return jnp.sum(wts * u) ** 2        # touches algebraic rows too

    # independent oracle: augment with a quadrature state z' = g(u)
    Maug = jnp.asarray(np.diag(np.concatenate(
        [np.diag(np.asarray(M)), [1.0]])))
    u0a = jnp.concatenate([u0, jnp.zeros(1)])

    def faug(ua_, q, t):
        u = ua_[:-1]
        return jnp.concatenate([f(u, q, t), jnp.array([g(u, q, t)])])

    def loss_aug(q):
        sol = solve(ODEProblem(faug, u0a, (0.0, T), q, mass_matrix=Maug),
                    SDIRK4(), saveat=jnp.array([T]), rtol=1e-10, atol=1e-12,
                    dt0=1e-4, sensealg=ForwardDiffSensitivity(),
                    max_steps=16384)
        return sol.ys[-1, -1]

    ref = np.asarray(jax.flatten_util.ravel_pytree(jax.grad(loss_aug)(p))[0])
    sol = solve(ODEProblem(f, u0, (0.0, T), p, mass_matrix=M), SDIRK4(),
                rtol=1e-10, atol=1e-12, dt0=1e-4, max_steps=16384, dense=True)
    for alg in [InterpolatingAdjoint(), GaussAdjoint(),
                QuadratureAdjoint(abstol=1e-12, reltol=1e-10)]:
        du0, dp = adjoint_sensitivities(sol, t=jnp.array([T]), g=g,
                                        sensealg=alg, rtol=1e-9, atol=1e-12)
        df = np.asarray(jax.flatten_util.ravel_pytree(dp)[0])
        assert np.allclose(df, ref, rtol=1e-4, atol=1e-8), (
            type(alg).__name__,
            np.max(np.abs(df - ref) / (np.abs(ref) + 1e-8)))


# ---------------------------------------------------------------------------
# Stiff-solver fuzzing: random stiff systems (diagonal timescale spread
# ~1e3 + random rotation + tanh coupling) through the implicit steppers
# (Rosenbrock23 / TRBDF2 / FBDF), continuous adjoints vs the
# discrete-forward oracle through the SAME stepper (reference
# Core2/stiff_adjoints.jl strategy, randomized).
# ---------------------------------------------------------------------------

from scimlsensitivity_jl_tpu import FBDF, Rosenbrock23, TRBDF2


@pytest.mark.parametrize("seed,make_solver", [
    (50, Rosenbrock23), (51, TRBDF2), (52, FBDF),
])
def test_random_stiff_system_gradient_cross_validation(seed, make_solver):
    rng = np.random.default_rng(seed)
    n = 3
    d = np.sort(10.0 ** rng.uniform(0.0, 3.0, size=(n,)))   # 1..1e3 spread
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    A = -(Q * d) @ Q.T                                      # SPD-stiff part
    V = rng.normal(size=(n, n)) * 0.5
    c = rng.normal(size=(n,)) * 0.5
    u0 = rng.normal(size=(n,)) * 0.5 + 1.0
    T = float(rng.uniform(1.0, 2.0))
    n_save = 4
    ts = np.sort(np.concatenate([[T], rng.uniform(0.1 * T, 0.9 * T,
                                                  n_save - 1)]))
    wts = rng.normal(size=(n_save, n))

    p = {"A": jnp.asarray(A), "V": jnp.asarray(V), "c": jnp.asarray(c)}

    def f(u, q, t):
        return q["A"] @ u + jnp.tanh(q["V"] @ u) + q["c"] * jnp.cos(t)

    solver = make_solver()

    def loss(q, sensealg):
        prob = ODEProblem(f, jnp.asarray(u0), (0.0, T), q)
        sol = solve(prob, solver, saveat=jnp.asarray(ts), rtol=1e-9,
                    atol=1e-11, dt0=1e-5, sensealg=sensealg,
                    max_steps=16384, adj_rtol=1e-8, adj_atol=1e-11)
        return jnp.sum(jnp.asarray(wts) * sol.ys)

    g_ref = jax.grad(loss)(p, ForwardDiffSensitivity())
    ref_flat = np.asarray(jax.flatten_util.ravel_pytree(g_ref)[0])
    assert np.isfinite(ref_flat).all() and np.linalg.norm(ref_flat) > 1e-8

    for alg in [InterpolatingAdjoint(), GaussAdjoint(),
                QuadratureAdjoint(abstol=1e-12, reltol=1e-10)]:
        g = jax.grad(loss)(p, alg)
        g_flat = np.asarray(jax.flatten_util.ravel_pytree(g)[0])
        # continuous adjoints interpolate the stiff forward between nodes
        assert np.allclose(g_flat, ref_flat, rtol=2e-3, atol=1e-7), (
            type(alg).__name__,
            np.max(np.abs(g_flat - ref_flat) / (np.abs(ref_flat) + 1e-8)))


def test_event_record_overflow_flags_and_poisons():
    # Parameter-scaled jumps leave the condition near zero -> chattering
    # (seed-10 fuzz find): 164 firings overflow the default 32-slot record
    # buffer. The trajectory is still exact (affects applied in-line), but
    # every record-consuming reverse pass would be silently wrong, so the
    # solve flags retcode 4 and the continuous adjoints NaN-poison.
    # DirectAdjoint differentiates THROUGH the forward scan (no records)
    # and stays exact at any buffer size.
    rng = np.random.default_rng(10)
    alpha = float(rng.uniform(-0.2, 0.1))
    omega = float(rng.uniform(2.0, 4.0))
    k = float(rng.uniform(-0.5, 0.5))
    T = float(rng.uniform(1.5, 2.5))
    damp = rng.uniform(0.85, 0.98, size=(2,))
    wts = rng.normal(size=(5, 2))

    def f(u, p, t):
        return jnp.array([[alpha, omega], [-omega, alpha]]) @ u

    cb = ContinuousCallback(lambda u, p, t: u[0] + k * u[1],
                            lambda u, p, t: u * p)
    ts = jnp.linspace(0.0, T, 5)
    u0 = jnp.array([1.0, 0.0])
    p = jnp.asarray(damp)

    def loss(q, sensealg, me):
        sol = solve(ODEProblem(f, u0, (0.0, T), q), Tsit5(), saveat=ts,
                    rtol=1e-10, atol=1e-12, callback=cb, sensealg=sensealg,
                    max_events=me)
        return jnp.sum(wts * sol.ys)

    s = solve(ODEProblem(f, u0, (0.0, T), p), Tsit5(), saveat=ts,
              rtol=1e-10, atol=1e-12, callback=cb,
              sensealg=GaussAdjoint(), max_events=32)
    assert int(s.retcode) == 4
    assert int(s.events[3]) > 32

    g_bad = jax.grad(loss)(p, GaussAdjoint(), 32)
    assert bool(jnp.isnan(g_bad).all()), g_bad

    g_ref = jax.grad(loss)(p, ForwardDiffSensitivity(), 256)
    g_direct = jax.grad(loss)(p, DirectAdjoint(), 256)
    assert np.allclose(np.asarray(g_direct), np.asarray(g_ref), rtol=1e-6)
    g_ok = jax.grad(loss)(p, GaussAdjoint(), 256)
    assert np.allclose(np.asarray(g_ok), np.asarray(g_ref), rtol=1e-4)


# ---------------------------------------------------------------------------
# Terminal-event fuzzing (round-3 surface): random rotation systems with a
# random terminal stop (plus a prior non-terminal jump on odd seeds); the
# dense continuous adjoints reverse from the dynamic t_final — validated
# against the discrete-forward oracle through the truncated program.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [60, 61])
def test_random_terminal_event_gradient_cross_validation(seed):
    rng = np.random.default_rng(seed)
    omega = float(rng.uniform(2.0, 3.5))
    thresh = float(rng.uniform(-0.7, -0.4))
    damp = float(rng.uniform(0.85, 0.95))
    T = float(rng.uniform(2.0, 3.0))
    wts = rng.normal(size=(5, 2))
    u0 = jnp.array([1.0, 0.0])
    p0 = jnp.asarray(rng.uniform(1.5, 2.5, size=(2,)))

    def f(u, q, t):
        return jnp.array([q[0] * u[1], -q[0] * u[0] - 0.1 * q[1] * u[1]])

    cbs = [ContinuousCallback(lambda u, q, t: u[0] - thresh,
                              lambda u, q, t: u * damp,
                              direction=-1, terminal=True)]
    if seed % 2:
        cbs.insert(0, ContinuousCallback(
            lambda u, q, t: u[1] + 0.4,
            lambda u, q, t: jnp.array([u[0], u[1] - 0.05]), direction=-1))
    ts = jnp.linspace(0.0, T, 5)

    def loss(q, alg):
        sol = solve(ODEProblem(f, u0, (0.0, T), q), Tsit5(), saveat=ts,
                    rtol=1e-10, atol=1e-12, callback=cbs, sensealg=alg,
                    max_events=64)
        return jnp.sum(wts * sol.ys) + jnp.sum(sol.ys[-1] ** 2)

    s = solve(ODEProblem(f, u0, (0.0, T), p0), Tsit5(), saveat=ts,
              rtol=1e-10, atol=1e-12, callback=cbs, max_events=64)
    assert int(s.retcode) == 5          # the stop must actually fire

    g_ref = np.asarray(jax.grad(lambda q: loss(q, ForwardDiffSensitivity()))
                       (p0))
    assert np.isfinite(g_ref).all() and np.linalg.norm(g_ref) > 1e-8
    for alg in [DirectAdjoint(), GaussAdjoint(), InterpolatingAdjoint(),
                BacksolveAdjoint(),
                QuadratureAdjoint(abstol=1e-12, reltol=1e-10)]:
        g = np.asarray(jax.grad(lambda q: loss(q, alg))(p0))
        assert np.allclose(g, g_ref, rtol=1e-4, atol=1e-8), (
            type(alg).__name__, g, g_ref)


# ---------------------------------------------------------------------------
# SDE-callback fuzzing (round-3 surface): random dosed GBM over one fixed
# noise realization — Interpolating == Direct exactly; both vs forward mode
# through the realized dosed scheme.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [70])
def test_random_sde_callback_gradient_cross_validation(seed):
    from scimlsensitivity_jl_tpu import PresetTimeCallback

    rng = np.random.default_rng(seed)
    n = 2
    A = rng.normal(size=(n, n)) * 0.3 - 0.6 * np.eye(n)
    sig = rng.uniform(0.05, 0.25, size=(n,))
    dosef = rng.uniform(0.5, 0.9)
    u0 = jnp.asarray(rng.normal(size=(n,)) * 0.3 + 1.0)
    wts = jnp.asarray(rng.normal(size=(n,)))
    key = jax.random.PRNGKey(seed)
    T, nsteps = 1.0, 64
    dose_ts = [T * 16 / nsteps, T * 40 / nsteps]   # on the dt grid

    p = {"A": jnp.asarray(A), "sig": jnp.asarray(sig),
         "dose": jnp.asarray(dosef)}

    def drift(u, q, t):
        return q["A"] @ u

    def diffusion(u, q, t):
        return q["sig"] * u

    def loss(q, alg):
        cb = PresetTimeCallback(dose_ts, lambda u, qq, t: u * qq["dose"])
        prob = SDEProblem(drift, diffusion, u0, (0.0, T), q)
        sol = solve(prob, dt=T / nsteps, key=key, callback=cb, sensealg=alg,
                    saveat=jnp.array([0.0, T]))
        return jnp.sum(wts * sol.ys[-1])

    flat0, unflatten = jax.flatten_util.ravel_pytree(p)
    g_fwd = jax.jacfwd(lambda fq: loss(unflatten(fq), DirectAdjoint()))(flat0)
    assert np.isfinite(np.asarray(g_fwd)).all()
    assert abs(np.asarray(g_fwd)[-1]) > 1e-8       # dose param must flow

    for alg in [DirectAdjoint(), InterpolatingAdjoint()]:
        g = jax.grad(lambda q: loss(q, alg))(p)
        g_flat = np.asarray(jax.flatten_util.ravel_pytree(g)[0])
        assert np.allclose(g_flat, np.asarray(g_fwd), rtol=1e-6,
                           atol=1e-10), (type(alg).__name__,)


# ---------------------------------------------------------------------------
# Round-4 fuzz groups: non-commutative matrix-noise SDEs (RKMilGeneral with
# Lévy areas) and SDE continuous/terminal events — random systems, fixed
# noise realization, every supported adjoint vs the forward-mode oracle.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [70, 71])
def test_random_noncommutative_sde_gradient_cross_validation(seed):
    from scimlsensitivity_jl_tpu import RKMilGeneral, SDEProblem

    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 4))
    m = int(rng.integers(2, 4))
    A = rng.normal(size=(n, n)) * 0.3 - 0.6 * np.eye(n)
    # random state-dependent matrix diffusion: g[:, j] = 0.2·(Bj u + bj)
    B = rng.normal(size=(m, n, n)) * 0.2
    b = rng.normal(size=(m, n)) * 0.1
    u0 = rng.normal(size=(n,)) * 0.3 + 1.0
    T = float(rng.uniform(0.4, 0.8))
    wts = rng.normal(size=(n,))
    key = jax.random.PRNGKey(seed)
    p = {"A": jnp.asarray(A), "B": jnp.asarray(B), "b": jnp.asarray(b)}

    def drift(u, q, t):
        return q["A"] @ u

    def diffusion(u, q, t):
        return (jnp.einsum("jab,b->aj", q["B"], u)
                + q["b"].T)  # (n, m), generically non-commutative

    def loss(q, sensealg):
        prob = SDEProblem(drift, diffusion, jnp.asarray(u0), (0.0, T), q,
                          noise="general", noise_dim=m)
        sol = solve(prob, RKMilGeneral(levy_terms=8), dt=T / 64.0, key=key,
                    sensealg=sensealg, saveat=jnp.array([0.0, T]))
        return jnp.sum(wts * sol.ys[-1])

    flat0, unflatten = jax.flatten_util.ravel_pytree(p)
    g_fwd = jax.jacfwd(lambda fq: loss(unflatten(fq), DirectAdjoint()))(flat0)
    assert np.isfinite(np.asarray(g_fwd)).all()
    assert np.linalg.norm(np.asarray(g_fwd)) > 1e-8
    for alg in [DirectAdjoint(), InterpolatingAdjoint(), BacksolveAdjoint()]:
        g = jax.grad(loss)(p, alg)
        g_flat, _ = jax.flatten_util.ravel_pytree(g)
        # Direct/Interp contract against the exact STORED trajectory
        # (bit-comparable to the forward-mode oracle); Backsolve
        # re-integrates u backward in O(1) memory, so its Jacobian
        # contractions ride a trajectory that differs from the stored one
        # by accumulated roundoff (~n_steps*eps*scale ~ 1e-9 over 64
        # steps in f64 — seed 71 measures 7.4e-9 max-abs).
        atol = 1e-8 if isinstance(alg, BacksolveAdjoint) else 1e-10
        assert np.allclose(np.asarray(g_flat), np.asarray(g_fwd),
                           rtol=1e-6, atol=atol), (
            type(alg).__name__,
            np.max(np.abs(np.asarray(g_flat) - np.asarray(g_fwd))))


@pytest.mark.parametrize("seed", [80, 81])
def test_random_sde_continuous_event_cross_validation(seed):
    from scimlsensitivity_jl_tpu import ContinuousCallback, SDEProblem

    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 4))
    A = rng.normal(size=(n, n)) * 0.2 - 0.4 * np.eye(n)
    sig = rng.uniform(0.05, 0.2, size=(n,))
    u0 = rng.normal(size=(n,)) * 0.2 + 1.0
    thresh = float(np.sum(u0) * rng.uniform(1.02, 1.1))
    kick = rng.normal(size=(n,)) * 0.2
    wts = rng.normal(size=(n,))
    key = jax.random.PRNGKey(seed + 100)
    p = {"A": jnp.asarray(A), "sig": jnp.asarray(sig),
         "kick": jnp.asarray(kick)}

    cb = ContinuousCallback(
        condition=lambda u, q, t: jnp.sum(u) - thresh,
        affect=lambda u, q, t: u + q["kick"],
    )

    def loss(q, sensealg):
        prob = SDEProblem(lambda u, qq, t: qq["A"] @ u + 0.3,
                          lambda u, qq, t: qq["sig"] * u,
                          jnp.asarray(u0), (0.0, 1.0), q)
        sol = solve(prob, dt=1.0 / 64.0, key=key, sensealg=sensealg,
                    callback=cb, saveat=jnp.array([0.0, 1.0]))
        return jnp.sum(wts * sol.ys[-1])

    flat0, unflatten = jax.flatten_util.ravel_pytree(p)
    g_fwd = jax.jacfwd(lambda fq: loss(unflatten(fq), DirectAdjoint()))(flat0)
    assert np.isfinite(np.asarray(g_fwd)).all()
    # the kick parameter must flow iff the event fired; require a draw
    # where it fired (thresh just above the start, positive forcing)
    kick_norm = float(np.linalg.norm(np.asarray(
        jax.flatten_util.ravel_pytree(
            jax.grad(lambda q: loss(q, DirectAdjoint()))(p)["kick"])[0])))
    assert kick_norm > 1e-8, "event did not fire for this draw"
    for alg in [DirectAdjoint(), InterpolatingAdjoint()]:
        g = jax.grad(loss)(p, alg)
        g_flat, _ = jax.flatten_util.ravel_pytree(g)
        assert np.allclose(np.asarray(g_flat), np.asarray(g_fwd),
                           rtol=1e-6, atol=1e-10), (
            type(alg).__name__,
            np.max(np.abs(np.asarray(g_flat) - np.asarray(g_fwd))))


# Round-4 fuzz groups: the two new execution modes — fixed-grid forwards
# under continuous adjoints (integrate fixed_dt) and fully-unrolled
# continuous adjoints (masked-scan forward + reverse) — over the same
# random-system family with pytree params.


@pytest.mark.parametrize("seed", [11, 12])
def test_random_system_fixed_grid_continuous_cross_validation(seed):
    f, u0, tspan, p, ts, wts = _random_system(seed)
    n_steps = 192
    dt = (tspan[1] - tspan[0]) / n_steps
    # the discrete fixed-grid ORACLE needs grid-aligned saveat (the
    # continuous fixed-grid path clips-and-resumes off-grid times, but
    # the comparison must run both on identical rows) — snap to the grid
    ts = jnp.round((ts - tspan[0]) / dt) * dt + tspan[0]

    def loss(q, sensealg):
        prob = ODEProblem(f, u0, tspan, q)
        sol = solve(prob, Tsit5(), saveat=ts, dt=dt, adaptive=False,
                    sensealg=sensealg, adj_rtol=1e-9, adj_atol=1e-11)
        return jnp.sum(wts * sol.ys) + jnp.sum(sol.ys[-1] ** 2)

    # oracle: exact discrete AD through the same fixed grid
    g_ref = jax.grad(loss)(p, None)
    ref_flat = np.concatenate([np.ravel(x) for x in
                               jax.tree_util.tree_leaves(g_ref)])
    assert np.isfinite(ref_flat).all() and np.linalg.norm(ref_flat) > 1e-6

    for alg in [InterpolatingAdjoint(), BacksolveAdjoint(), GaussAdjoint(),
                QuadratureAdjoint()]:
        g = jax.grad(loss)(p, alg)
        g_flat = np.concatenate([np.ravel(x) for x in
                                 jax.tree_util.tree_leaves(g)])
        assert np.allclose(g_flat, ref_flat, rtol=5e-5, atol=1e-7), (
            type(alg).__name__,
            np.max(np.abs(g_flat - ref_flat) / (np.abs(ref_flat) + 1e-8)),
        )


@pytest.mark.parametrize("seed", [13])
def test_random_system_unrolled_continuous_cross_validation(seed):
    # Unrolled (straight-line XLA) continuous adjoints over pytree params:
    # must match the while-driver gradient of the SAME sensealg to float
    # tolerance (identical controller arithmetic, identical steps).
    f, u0, tspan, p, ts, wts = _random_system(seed)

    def loss(q, sensealg, unroll):
        prob = ODEProblem(f, u0, tspan, q)
        sol = solve(prob, Tsit5(), saveat=ts, rtol=1e-5, atol=1e-8,
                    sensealg=sensealg, unroll=unroll, max_steps=96)
        return jnp.sum(wts * sol.ys) + jnp.sum(sol.ys[-1] ** 2)

    for alg_w, alg_u in [
        (InterpolatingAdjoint(pinned_reverse=False), InterpolatingAdjoint()),
        (GaussAdjoint(), GaussAdjoint()),
    ]:
        gw = jax.grad(loss)(p, alg_w, False)
        gu = jax.grad(loss)(p, alg_u, True)
        wf = np.concatenate([np.ravel(x) for x in
                             jax.tree_util.tree_leaves(gw)])
        uf = np.concatenate([np.ravel(x) for x in
                             jax.tree_util.tree_leaves(gu)])
        assert np.isfinite(wf).all()
        assert np.allclose(uf, wf, rtol=1e-7, atol=1e-10), (
            type(alg_u).__name__,
            np.max(np.abs(uf - wf) / (np.abs(wf) + 1e-10)),
        )
