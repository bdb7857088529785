"""Pallas-fused 2-layer MLP field: fused forward + single-launch fused
pullback (dx ∥ dW0 ∥ db0 ∥ dW1 ∥ db1) validated against the plain-XLA
reference MLP, standalone and through an adjoint solve. Runs in interpret
mode on CPU; on real TPU the kernels store MXU f32 accumulations cast back
to the ref dtype (Mosaic rejects cross-dtype stores — hardware-only
behavior, so the dtype discipline is asserted here too).

Reference seam: the fused VJP is the quantity `vecjacobian!` assembles
through the backend zoo (reference: src/derivative_wrappers.jl:256)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scimlsensitivity_jl_tpu import DirectAdjoint, ODEProblem, Tsit5, solve
from scimlsensitivity_jl_tpu.models.neural_ode import mlp_apply, mlp_init
from scimlsensitivity_jl_tpu.ops.pallas_mlp import fused_mlp2, mlp2_reference


def _params(dtype, sizes=(4, 16, 4), seed=0):
    return mlp_init(jax.random.PRNGKey(seed), sizes, dtype)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 5e-2)])
def test_fused_forward_matches_reference(dtype, tol):
    p = _params(dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4), dtype)
    y1 = fused_mlp2(p, x)
    y2 = mlp2_reference(x, p["W0"], p["b0"], p["W1"], p["b1"])
    assert y1.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(y1, np.float64),
                               np.asarray(y2, np.float64),
                               rtol=tol, atol=tol)


def test_fused_forward_single_example():
    p = _params(jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (4,), jnp.float32)
    y1 = fused_mlp2(p, x)
    y2 = mlp2_reference(x, p["W0"], p["b0"], p["W1"], p["b1"])
    assert y1.shape == (4,)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-6)


def test_fused_pullback_matches_ad_of_reference():
    """One fused launch must produce ALL five cotangents of the plain AD."""
    p = _params(jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 4), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(4), (8, 4), jnp.float32)

    _, pull1 = jax.vjp(lambda q, xx: fused_mlp2(q, xx), p, x)
    _, pull2 = jax.vjp(
        lambda q, xx: mlp2_reference(xx, q["W0"], q["b0"], q["W1"], q["b1"]),
        p, x)
    dp1, dx1 = pull1(g)
    dp2, dx2 = pull2(g)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2),
                               rtol=1e-5, atol=1e-6)
    for k in ("W0", "b0", "W1", "b1"):
        np.testing.assert_allclose(np.asarray(dp1[k]), np.asarray(dp2[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_fused_field_through_adjoint_solve():
    """The fused custom_vjp rides through jax.grad(solve) unchanged: the
    neural-ODE gradient with the fused field matches the plain field."""
    p = _params(jnp.float32, sizes=(2, 8, 2), seed=5)
    u0 = jnp.array([1.0, -0.5], jnp.float32)
    ts = jnp.array([0.0, 0.5], jnp.float32)

    def loss(field):
        def run(q):
            sol = solve(ODEProblem(field, u0, (0.0, 0.5), q), Tsit5(),
                        saveat=ts, dt=1.0 / 32, adaptive=False,
                        sensealg=DirectAdjoint())
            return jnp.sum(sol.ys[-1] ** 2)
        return run

    g1 = jax.grad(loss(lambda u, q, t: fused_mlp2(q, u)))(p)
    g2 = jax.grad(loss(lambda u, q, t: mlp_apply(q, u)))(p)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
