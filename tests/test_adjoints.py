"""Gradient cross-validation — the reference's dominant test pattern
(SURVEY §4): the same gradient computed many ways must agree.

Canonical config (reference: test/Core3/adjoint.jl): discrete L2-style cost
on Lotka–Volterra, gradients wrt p and u0, cross-checked against finite
differences and across every sensealg.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scimlsensitivity_jl_tpu import (
    BacksolveAdjoint,
    ForwardDiffSensitivity,
    GaussAdjoint,
    InterpolatingAdjoint,
    JacVJP,
    ODEProblem,
    QuadratureAdjoint,
    Tsit5,
    solve,
)

LV_P = jnp.array([1.5, 1.0, 3.0, 1.0])
LV_U0 = jnp.array([1.0, 1.0])
TS = jnp.linspace(0.0, 10.0, 11)


def lv(u, p, t):
    x, y = u[0], u[1]
    a, b, c, d = p[0], p[1], p[2], p[3]
    return jnp.stack([a * x - b * x * y, -c * y + d * x * y])


def make_loss(sensealg):
    def loss(u0, p):
        prob = ODEProblem(lv, u0, (0.0, 10.0), p)
        sol = solve(prob, Tsit5(), saveat=TS, rtol=1e-10, atol=1e-12,
                    sensealg=sensealg)
        return jnp.sum((sol.ys - 1.0) ** 2)

    return loss


def fd_grad(f, x, eps=1e-6):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g[i] = (f(jnp.asarray(xp)) - f(jnp.asarray(xm))) / (2 * eps)
    return g


# Finite-difference oracle computed once per session.
_ORACLE = {}


def oracle():
    if not _ORACLE:
        loss = make_loss(GaussAdjoint())
        _ORACLE["dp"] = fd_grad(lambda p: loss(LV_U0, p), LV_P)
        _ORACLE["du0"] = fd_grad(lambda u0: loss(u0, LV_P), LV_U0)
    return _ORACLE


SENSEALGS = [
    InterpolatingAdjoint(),
    InterpolatingAdjoint(checkpointing=True),
    BacksolveAdjoint(),
    BacksolveAdjoint(checkpointing=False),
    QuadratureAdjoint(),
    GaussAdjoint(),
    ForwardDiffSensitivity(),
    InterpolatingAdjoint(autojacvec=JacVJP()),
]


@pytest.mark.parametrize("sensealg", SENSEALGS, ids=lambda s: repr(s))
def test_lv_gradient_matches_fd(sensealg):
    loss = make_loss(sensealg)
    du0, dp = jax.grad(loss, argnums=(0, 1))(LV_U0, LV_P)
    ref = oracle()
    assert np.allclose(dp, ref["dp"], rtol=1e-5, atol=1e-7), (np.asarray(dp), ref["dp"])
    assert np.allclose(du0, ref["du0"], rtol=1e-5, atol=1e-7), (np.asarray(du0), ref["du0"])


def test_cross_sensealg_agreement():
    grads = []
    for sa in [InterpolatingAdjoint(), GaussAdjoint(), QuadratureAdjoint(), BacksolveAdjoint()]:
        loss = make_loss(sa)
        grads.append(np.asarray(jax.grad(loss, argnums=1)(LV_U0, LV_P)))
    for g in grads[1:]:
        assert np.allclose(g, grads[0], rtol=1e-6, atol=1e-9)


def test_pytree_params_gradient():
    def f(u, p, t):
        return jnp.tanh(p["W"] @ u + p["b"])

    key = jax.random.PRNGKey(0)
    p = {
        "W": jax.random.normal(key, (3, 3), jnp.float64) * 0.4,
        "b": jnp.array([0.1, -0.2, 0.3]),
    }
    u0 = jnp.array([1.0, 0.5, -0.5])
    ts = jnp.linspace(0.0, 2.0, 5)

    def loss_with(p_, sensealg):
        prob = ODEProblem(f, u0, (0.0, 2.0), p_)
        sol = solve(prob, Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12, sensealg=sensealg)
        return jnp.sum(sol.ys ** 2)

    g_interp = jax.grad(lambda p_: loss_with(p_, InterpolatingAdjoint()))(p)
    g_gauss = jax.grad(lambda p_: loss_with(p_, GaussAdjoint()))(p)
    g_fwd = jax.grad(lambda p_: loss_with(p_, ForwardDiffSensitivity()))(p)
    for k in p:
        assert np.allclose(g_interp[k], g_fwd[k], rtol=1e-6, atol=1e-9), k
        assert np.allclose(g_gauss[k], g_fwd[k], rtol=1e-6, atol=1e-9), k


def test_grad_no_params():
    # NullParameters analogue: gradient wrt u0 only, p=None
    def f(u, p, t):
        return jnp.stack([u[1], -u[0]])

    def loss(u0):
        prob = ODEProblem(f, u0, (0.0, 3.0), None)
        sol = solve(prob, Tsit5(), saveat=jnp.linspace(0.0, 3.0, 4),
                    rtol=1e-10, atol=1e-12, sensealg=InterpolatingAdjoint())
        return jnp.sum(sol.ys ** 2)

    u0 = jnp.array([1.0, 0.3])
    g = jax.grad(loss)(u0)
    g_fd = fd_grad(loss, u0)
    assert np.allclose(g, g_fd, rtol=1e-5, atol=1e-7)


def test_gradient_under_jit():
    loss = make_loss(GaussAdjoint())
    g1 = jax.jit(jax.grad(loss, argnums=1))(LV_U0, LV_P)
    g2 = jax.grad(loss, argnums=1)(LV_U0, LV_P)
    assert np.allclose(g1, g2, rtol=1e-12)


def test_saveat_not_spanning_tspan():
    # saveat strictly inside (t0, t1): u0-gradient still needs the tail
    # segment [t0, saveat[0]] integrated (reference forces save_start/save_end).
    ts = jnp.linspace(2.0, 8.0, 5)

    def loss(u0, p, sensealg):
        prob = ODEProblem(lv, u0, (0.0, 10.0), p)
        sol = solve(prob, Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12, sensealg=sensealg)
        return jnp.sum(sol.ys ** 2)

    for sa in [InterpolatingAdjoint(), GaussAdjoint(), BacksolveAdjoint()]:
        du0, dp = jax.grad(lambda u, p: loss(u, p, sa), argnums=(0, 1))(LV_U0, LV_P)
        du0_f, dp_f = jax.grad(
            lambda u, p: loss(u, p, ForwardDiffSensitivity()), argnums=(0, 1)
        )(LV_U0, LV_P)
        assert np.allclose(du0, du0_f, rtol=1e-5, atol=1e-8), repr(sa)
        assert np.allclose(dp, dp_f, rtol=1e-5, atol=1e-8), repr(sa)


def test_gauss_checkpointing_matches():
    loss_ck = make_loss(GaussAdjoint(checkpointing=True))
    loss_g = make_loss(GaussAdjoint())
    g1 = jax.grad(loss_ck, argnums=1)(LV_U0, LV_P)
    g2 = jax.grad(loss_g, argnums=1)(LV_U0, LV_P)
    assert np.allclose(g1, g2, rtol=1e-6, atol=1e-9)


def test_forwarddiff_chunked():
    g_full = jax.grad(make_loss(ForwardDiffSensitivity()), argnums=(0, 1))(
        LV_U0, LV_P)
    g_chunk = jax.grad(
        make_loss(ForwardDiffSensitivity(chunk_size=2)), argnums=(0, 1)
    )(LV_U0, LV_P)
    for a, b in zip(g_full, g_chunk):
        assert np.allclose(a, b, rtol=1e-10)


def test_custom_checkpoint_grid():
    """Round-2 VERDICT missing #7: InterpolatingAdjoint(checkpoints=...)
    decoupled from saveat (reference interpolating_adjoint.jl:43-126).
    A 10-unit single-save-interval LV reverse blows the per-interval
    re-solve budget (NaN-poisoned, loud); a 40-interval checkpoint grid
    rescues it and matches the dense-variant gradient."""
    from scimlsensitivity_jl_tpu.sensealg import GaussAdjoint

    def lv(u, p, t):
        x, y = u
        return jnp.stack([p[0] * x - p[1] * x * y,
                          -p[2] * y + p[3] * x * y])

    p0 = jnp.array([1.5, 1.0, 3.0, 1.0])
    u0 = jnp.array([1.0, 1.0])
    ts = jnp.array([0.0, 10.0])

    def loss(p, sa, ms):
        prob = ODEProblem(lv, u0, (0.0, 10.0), p)
        sol = solve(prob, Tsit5(), saveat=ts, rtol=1e-7, atol=1e-9,
                    sensealg=sa, max_steps=ms)
        return jnp.sum(sol.ys[-1] ** 2)

    g_ref = jax.grad(lambda p: loss(p, InterpolatingAdjoint(), 4096))(p0)
    ms = 280  # forward fits; seg budget (max_steps//8 floor 64) does not
    g_fail = jax.grad(
        lambda p: loss(p, InterpolatingAdjoint(checkpointing=True), ms))(p0)
    assert np.all(np.isnan(np.asarray(g_fail)))  # loud, not silently wrong

    cps = tuple(np.linspace(0.25, 9.75, 39))
    for sa in [InterpolatingAdjoint(checkpointing=True, checkpoints=cps),
               GaussAdjoint(checkpointing=True, checkpoints=cps)]:
        g = jax.grad(lambda p: loss(p, sa, ms))(p0)
        assert float(jnp.max(jnp.abs(g - g_ref))) < 2e-4, np.asarray(g)

    # guard: checkpoints without checkpointing is a config error
    import pytest as _pytest
    with _pytest.raises(ValueError, match="checkpointing"):
        loss(p0, InterpolatingAdjoint(checkpoints=cps), 4096)


def test_branching_rhs_derivatives():
    """Reference parity (test/Core1/branching_derivatives.jl): an RHS with
    data-dependent branches — jnp.where AND lax.cond (the JAX forms of
    `if u > c`) — differentiates correctly under every adjoint family.
    (The reference needs ReverseDiffVJP(compile=false) for branching f;
    here jax.vjp traces both branches, so nothing special is required.)"""

    def f(u, p, t):
        # where-branch: soft-plus-like switch on the state
        growth = jnp.where(u[0] > p[2], p[0] * u[0], 0.5 * p[0] * u[0])
        # cond-branch on a parameter threshold (functional lax.cond)
        decay = jax.lax.cond(t < 0.6,
                             lambda: -p[1] * u[1],
                             lambda: -2.0 * p[1] * u[1])
        return jnp.stack([growth - 0.1 * u[0] * u[1], decay + 0.2 * u[0]])

    u0 = jnp.array([1.2, 0.8])
    p0 = jnp.array([0.9, 0.7, 1.0])
    # 0.6 (the t-branch switch) IS a save time, so forward and reverse
    # integrations both stop exactly at the kink (the reference handles
    # RHS discontinuities the same way — as tstops)
    ts = jnp.array([0.0, 0.3, 0.6, 0.9, 1.2])

    def make_loss(alg):
        def loss(p):
            s = solve(ODEProblem(f, u0, (0.0, 1.2), p), Tsit5(), saveat=ts,
                      rtol=1e-10, atol=1e-12, sensealg=alg)
            return jnp.sum(s.ys ** 2)

        return loss

    # exact discrete-forward oracle + an FD sanity bound (FD noise at
    # rtol 1e-10 / h 1e-5 is ~1e-5 relative — see the verify-skill rule)
    g_ref = np.asarray(jax.grad(make_loss(ForwardDiffSensitivity()))(p0))
    base = make_loss(None)
    eps = 1e-5
    fd = np.array([
        (float(base(p0 + eps * jnp.eye(3)[i]))
         - float(base(p0 - eps * jnp.eye(3)[i]))) / (2 * eps)
        for i in range(3)
    ])
    np.testing.assert_allclose(g_ref, fd, rtol=2e-3, atol=1e-8)
    for alg in [InterpolatingAdjoint(), GaussAdjoint(), BacksolveAdjoint(),
                QuadratureAdjoint(abstol=1e-12, reltol=1e-10)]:
        g = np.asarray(jax.grad(make_loss(alg))(p0))
        np.testing.assert_allclose(g, g_ref, rtol=1e-6, atol=1e-9,
                                   err_msg=type(alg).__name__)


def test_second_order_ode_problem_adjoints():
    """SecondOrderODEProblem: u'' = -p*u, gradients wrt (du0, u0, p) under
    the four continuous adjoints, vs the exact discrete-forward oracle
    (reference test/Core6/second_order_odes.jl: same system, same cost
    sum(solution), InterpolatingAdjoint/BacksolveAdjoint/QuadratureAdjoint/
    GaussAdjoint cross-agreement)."""
    from scimlsensitivity_jl_tpu import SecondOrderODEProblem

    p0 = jnp.array([1.01, 0.9])
    du0 = jnp.array([0.0, 2.0])
    u0 = jnp.array([1.0, 2.0])
    ts = jnp.linspace(0.0, 1.0, 20)

    def ff(v, u, p, t):
        return -p * u

    def make_loss(sa):
        def loss(du0_, u0_, p_):
            prob = SecondOrderODEProblem(ff, du0_, u0_, (0.0, 1.0), p_)
            sol = solve(prob, Tsit5(), saveat=ts, rtol=1e-8, atol=1e-10,
                        sensealg=sa)
            v, u = sol.ys
            return jnp.sum(v) + jnp.sum(u)

        return loss

    refs = jax.grad(make_loss(ForwardDiffSensitivity()),
                    argnums=(0, 1, 2))(du0, u0, p0)
    for sa in [InterpolatingAdjoint(), BacksolveAdjoint(),
               QuadratureAdjoint(), GaussAdjoint()]:
        got = jax.grad(make_loss(sa), argnums=(0, 1, 2))(du0, u0, p0)
        for g, r, name in zip(got, refs, ("ddu0", "du0", "dp")):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-8,
                err_msg=f"{type(sa).__name__} {name}")


def test_backsolve_recon_guard():
    """Backward re-integration of dissipative dynamics is exponentially
    unstable (high-k heat modes decay below roundoff forward, then amplify
    as exp(D k² (T−t)) in the reverse reconstruction). The reverse ends at
    t0 where the TRUE u0 is known: BacksolveAdjoint.recon_guard compares
    them and NaN-poisons (retcode 3) instead of returning a finite but
    wrong gradient — the failure-detection convention of the repo.
    Benign horizons must stay clean (no false positives)."""
    n = 32
    h = 1.0 / n
    x = jnp.arange(n) * h
    u0 = jnp.exp(-40.0 * (x - 0.5) ** 2)
    p = jnp.array([1.0])

    def heat(u, pp, t):
        return pp[0] * (jnp.roll(u, 1) - 2.0 * u + jnp.roll(u, -1)) / h**2

    def loss(pp, T, sa):
        prob = ODEProblem(heat, u0, (0.0, T), pp)
        sol = solve(prob, Tsit5(), saveat=jnp.array([0.0, T]),
                    rtol=1e-8, atol=1e-10, sensealg=sa,
                    max_steps=16384, adj_max_steps=16384)
        return jnp.sum(sol.ys[-1] ** 2)

    # benign horizon: lam_max*T = (4/h^2)*T ~ 4 — guard must NOT trip,
    # gradient must match exact discrete AD
    sa = BacksolveAdjoint(checkpointing=False)
    g_ok = jax.grad(loss)(p, 0.001, sa)
    g_ref = jax.grad(loss)(p, 0.001, None)  # default: exact discrete path?
    assert np.all(np.isfinite(np.asarray(g_ok)))
    np.testing.assert_allclose(np.asarray(g_ok), np.asarray(g_ref),
                               rtol=1e-4)

    # unstable horizon: lam_max*T ~ 45 e-folds — the fastest modes sit at
    # absolute roundoff by T, the reconstruction amplifies that to O(1e3)
    # relative drift at t0. Guard trips -> NaN poison.
    T_bad = 45.0 / (4.0 / h**2)
    g_bad = jax.grad(loss)(p, T_bad, sa)
    assert np.all(np.isnan(np.asarray(g_bad))), np.asarray(g_bad)

    # guard disabled: the O(1)-memory trade is explicit, result is finite
    # (and for this LINEAR field even correct — J is u-independent)
    g_off = jax.grad(loss)(
        p, T_bad, BacksolveAdjoint(checkpointing=False, recon_guard=None))
    assert np.all(np.isfinite(np.asarray(g_off))), np.asarray(g_off)
