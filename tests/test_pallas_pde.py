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


def test_rk4_megakernel_matches_scan_reference():
    """Whole-RK4-step megakernel (round-3): S steps per pallas_call with a
    hand-derived exact discrete pullback. Validated under the Pallas
    interpreter against plain-XLA scan + AD, including the chunked-grid
    halo geometry (G > 1) and the single-chunk path."""
    from scimlsensitivity_jl_tpu.ops.pallas_pde import (
        make_rd1d_rk4_block,
        rd1d_rk4_scan_reference,
    )

    n = 1024
    u0 = (jnp.exp(-(((jnp.arange(n) / n) - 0.5) ** 2) * 100.0)
          + 0.01 * jnp.sin(jnp.arange(n) * 0.1))
    D, k, inv_dx2, h = 1e-4, 1.5, float(n * n), 1e-5

    for chunk, bwd_chunk, S in [(256, 256, 4), (512, 256, 2), (1024, 1024, 4)]:
        blk = make_rd1d_rk4_block(n, S, chunk=chunk, bwd_chunk=bwd_chunk,
                                  force_kernel_interpret=True)
        y_k = blk(u0, D, k, inv_dx2, h)
        y_r = rd1d_rk4_scan_reference(u0, D, k, inv_dx2, h, S)
        assert float(jnp.max(jnp.abs(y_k - y_r))) < 1e-12

        gk = jax.grad(
            lambda u, DD, kk: jnp.sum(blk(u, DD, kk, inv_dx2, h) ** 2),
            argnums=(0, 1, 2))(u0, D, k)
        gr = jax.grad(
            lambda u, DD, kk: jnp.sum(
                rd1d_rk4_scan_reference(u, DD, kk, inv_dx2, h, S) ** 2),
            argnums=(0, 1, 2))(u0, D, k)
        assert float(jnp.max(jnp.abs(gk[0] - gr[0]))) < 1e-11
        assert abs(float(gk[1] - gr[1])) < 1e-10 * max(1.0, abs(float(gr[1])))
        assert abs(float(gk[2] - gr[2])) < 1e-10 * max(1.0, abs(float(gr[2])))
