"""Pallas-fused PDE field: fused forward + fused pullback validated against
the plain-XLA reference field, standalone and through a full adjoint solve
(the model-level Pallas VJP surface — see sensealg.py module docstring;
reference seam ext/SciMLSensitivityReactantExt.jl:32-134)."""

import jax
import jax.numpy as jnp
import numpy as np

from scimlsensitivity_jl_tpu import GaussAdjoint, ODEProblem, Tsit5, solve
from scimlsensitivity_jl_tpu.ops.pallas_pde import (
    fused_rd1d,
    make_rd1d_field,
    rd1d_reference,
)

N = 256
INV_DX2 = float(N * N)


def test_fused_rd1d_forward_and_pullback():
    u = jax.random.uniform(jax.random.PRNGKey(1), (N,), jnp.float64)
    lam = jax.random.normal(jax.random.PRNGKey(2), (N,), jnp.float64)
    D, k = jnp.asarray(0.7), jnp.asarray(2.3)

    f1 = fused_rd1d(u, D, k, INV_DX2)
    f2 = rd1d_reference(u, D, k, INV_DX2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-12)

    _, pull1 = jax.vjp(lambda a, b, c: fused_rd1d(a, b, c, INV_DX2), u, D, k)
    _, pull2 = jax.vjp(
        lambda a, b, c: rd1d_reference(a, b, c, INV_DX2), u, D, k
    )
    for g1, g2 in zip(pull1(lam), pull2(lam)):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-9, atol=1e-9)


def test_fused_field_through_adjoint_solve():
    """The fused custom_vjp rides through the continuous adjoint: the PDE
    gradient matches the plain-field gradient to machine precision."""
    field = make_rd1d_field(N, 1.0 / N)
    u0 = jnp.exp(-(((jnp.arange(N) / N) - 0.5) ** 2) * 100.0)
    p = jnp.array([0.001, 1.5])

    def loss(pp, f_):
        sol = solve(ODEProblem(f_, u0, (0.0, 0.1), pp), Tsit5(),
                    saveat=jnp.array([0.0, 0.1]), rtol=1e-8, atol=1e-10,
                    sensealg=GaussAdjoint(), max_steps=2048)
        return jnp.sum(sol.ys[-1] ** 2)

    g_pallas = jax.grad(lambda pp: loss(pp, field))(p)
    g_ref = jax.grad(lambda pp: loss(
        pp, lambda uu, qq, tt: rd1d_reference(uu, qq[0], qq[1], INV_DX2)
    ))(p)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               rtol=1e-12)
