"""Continuous adjoints over a fixed-grid forward solve.

Reference parity: `solve(...; adaptive=false, dt=...)` composes with every
sensealg (the reference's fixed-dt solves run the same sensitivity
machinery — concrete_solve.jl passes solver kwargs straight through).
Here the forward marches the dt grid inside the continuous-adjoint
custom_vjp rule (integrate(..., fixed_dt=...)); the reverse pass runs at
its own adj_rtol/adj_atol (or pins to the forward grid).

Oracle: exact discrete AD through the fixed-grid scan path (sensealg=None)
on the SAME grid — the continuous adjoint must agree to quadrature/
interpolation accuracy. Trajectories must agree bitwise (identical
stepper, identical grid).
"""

import jax
import jax.numpy as jnp
import pytest

from scimlsensitivity_jl_tpu import (
    BacksolveAdjoint,
    GaussAdjoint,
    GaussKronrodAdjoint,
    InterpolatingAdjoint,
    ODEProblem,
    QuadratureAdjoint,
    Tsit5,
    solve,
)

LV_P = jnp.array([1.5, 1.0, 3.0, 1.0])
LV_U0 = jnp.array([1.0, 1.0])
T = 3.0
N = 96
DT = T / N
TS = jnp.linspace(0.0, T, 7)


def lv(u, p, t):
    x, y = u[0], u[1]
    a, b, c, d = p[0], p[1], p[2], p[3]
    return jnp.stack([a * x - b * x * y, -c * y + d * x * y])


def loss_fixed(p, u0, sensealg=None, **kw):
    sol = solve(ODEProblem(lv, u0, (0.0, T), p), Tsit5(), saveat=TS,
                dt=DT, adaptive=False, sensealg=sensealg, **kw)
    return jnp.sum(sol.ys ** 2)


@pytest.fixture(scope="module")
def oracle():
    gp = jax.grad(loss_fixed)(LV_P, LV_U0)
    gu = jax.grad(loss_fixed, argnums=1)(LV_P, LV_U0)
    return gp, gu


ALGS = [
    InterpolatingAdjoint(),
    InterpolatingAdjoint(pinned_reverse=False),
    InterpolatingAdjoint(checkpointing=True),
    BacksolveAdjoint(),
    GaussAdjoint(),
    GaussKronrodAdjoint(),
    QuadratureAdjoint(),
]


@pytest.mark.parametrize("alg", ALGS, ids=lambda a: type(a).__name__ + (
    "_ckpt" if getattr(a, "checkpointing", False) else ""
) + ("_unpin" if getattr(a, "pinned_reverse", None) is False else ""))
def test_fixed_grid_gradients_match_discrete_oracle(alg, oracle):
    gp_ref, gu_ref = oracle
    gp = jax.grad(loss_fixed)(LV_P, LV_U0, alg,
                              adj_rtol=1e-8, adj_atol=1e-10)
    gu = jax.grad(loss_fixed, argnums=1)(LV_P, LV_U0, alg,
                                         adj_rtol=1e-8, adj_atol=1e-10)
    assert jnp.max(jnp.abs(gp - gp_ref) / (jnp.abs(gp_ref) + 1)) < 2e-4
    assert jnp.max(jnp.abs(gu - gu_ref) / (jnp.abs(gu_ref) + 1)) < 2e-4


def test_fixed_grid_trajectory_bitwise_matches_discrete_path():
    s1 = solve(ODEProblem(lv, LV_U0, (0.0, T), LV_P), Tsit5(), saveat=TS,
               dt=DT, adaptive=False)
    s2 = solve(ODEProblem(lv, LV_U0, (0.0, T), LV_P), Tsit5(), saveat=TS,
               dt=DT, adaptive=False, sensealg=InterpolatingAdjoint())
    assert jnp.array_equal(s1.ys, s2.ys)


def test_fixed_grid_continuous_rejects_unroll():
    with pytest.raises(NotImplementedError, match="unroll"):
        solve(ODEProblem(lv, LV_U0, (0.0, T), LV_P), Tsit5(), saveat=TS,
              dt=DT, adaptive=False, unroll=True,
              sensealg=QuadratureAdjoint())


def test_fixed_grid_interior_saveat_rows():
    # interior save times split grid steps (dt clips to the stop and
    # resumes); rows must land exactly on the requested times
    ts = jnp.array([0.0, 0.37, 1.001, 2.5, T])
    s = solve(ODEProblem(lv, LV_U0, (0.0, T), LV_P), Tsit5(), saveat=ts,
              dt=DT, adaptive=False, sensealg=GaussAdjoint())
    s_ref = solve(ODEProblem(lv, LV_U0, (0.0, T), LV_P), Tsit5(),
                  saveat=ts, rtol=1e-10, atol=1e-12)
    assert jnp.max(jnp.abs(s.ys - s_ref.ys)) < 1e-4


def test_fixed_grid_forwarddiff_matches_discrete_oracle(oracle):
    # FDS on a fixed grid is discretize-then-optimize over the SAME
    # discrete program as sensealg=None: the jvp re-solve must march the
    # dt grid (regression: it once re-solved adaptively — a silently
    # different program), so the gradients agree to float roundoff.
    from scimlsensitivity_jl_tpu import ForwardDiffSensitivity

    gp_ref, gu_ref = oracle
    gp = jax.grad(loss_fixed)(LV_P, LV_U0, ForwardDiffSensitivity())
    gu = jax.grad(loss_fixed, argnums=1)(LV_P, LV_U0,
                                         ForwardDiffSensitivity())
    assert jnp.max(jnp.abs(gp - gp_ref) / (jnp.abs(gp_ref) + 1)) < 1e-9
    assert jnp.max(jnp.abs(gu - gu_ref) / (jnp.abs(gu_ref) + 1)) < 1e-9


def test_fixed_grid_checkpointed_long_interval():
    # saveat=endpoints means ONE checkpoint interval containing the whole
    # grid; the local re-solve budget must cover all n_grid fixed steps
    # (regression: seg_max_steps = max_steps//8 MAXITERS-poisoned any
    # interval longer than that).
    n_grid = 600
    dt = T / n_grid
    ts = jnp.array([0.0, T])

    def loss(p):
        sol = solve(ODEProblem(lv, LV_U0, (0.0, T), p), Tsit5(),
                    saveat=ts, dt=dt, adaptive=False,
                    sensealg=InterpolatingAdjoint(checkpointing=True),
                    adj_rtol=1e-8, adj_atol=1e-10)
        return jnp.sum(sol.ys ** 2)

    def loss_ref(p):
        sol = solve(ODEProblem(lv, LV_U0, (0.0, T), p), Tsit5(),
                    saveat=ts, dt=dt, adaptive=False)
        return jnp.sum(sol.ys ** 2)

    gp = jax.grad(loss)(LV_P)
    gp_ref = jax.grad(loss_ref)(LV_P)
    assert jnp.all(jnp.isfinite(gp))
    assert jnp.max(jnp.abs(gp - gp_ref) / (jnp.abs(gp_ref) + 1)) < 2e-4
