"""Pallas-fused 1-D reaction-diffusion field (forward + fused pullback).

The large-flat-state counterpart of ops/pallas_mlp: a PDE right-hand side

    f_i(u) = D (u_{i-1} - 2 u_i + u_{i+1}) / dx²  +  k u_i (1 - u_i)

(reflect-padded Laplacian — symmetric, so its transpose is itself) with the
ENTIRE pullback

    ūᵢ  = D/dx² (λ_{i-1} - 2λ_i + λ_{i+1}) + k (1 - 2u_i) λ_i
    D̄   = 1/dx² Σ λ_i (u_{i-1} - 2u_i + u_{i+1})
    k̄   = Σ λ_i u_i (1 - u_i)

fused into ONE Pallas kernel. This is the "Pallas VJP kernel" surface of the
build plan (SURVEY §7 L1 row; reference seam ext/SciMLSensitivityReactantExt
.jl:32-134 — one compiled call returning f, λᵀ∂f/∂u, λᵀ∂f/∂p): on TPU the
per-op launch/fusion-boundary overhead of the shift/multiply chain is
replaced by a single VMEM-resident kernel, and the same fused backward rides
through every adjoint because it is attached with jax.custom_vjp at the
FIELD level — no per-sensealg plumbing needed.

Falls back to interpret mode off-TPU (used by the CPU test suite).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

__all__ = ["fused_rd1d", "rd1d_reference", "make_rd1d_field"]


def _lap(u):
    ul = jnp.concatenate([u[:, :1], u[:, :-1]], axis=1)
    ur = jnp.concatenate([u[:, 1:], u[:, -1:]], axis=1)
    return ul - 2.0 * u + ur


def rd1d_reference(u, D, k, inv_dx2):
    """Plain jnp reference (what XLA fuses on its own)."""
    u2 = u[None, :]
    return (D * inv_dx2 * _lap(u2) + k * u2 * (1.0 - u2))[0]


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(u_ref, prm_ref, f_ref):
    u = u_ref[:]
    D = prm_ref[0, 0]
    k = prm_ref[0, 1]
    inv_dx2 = prm_ref[0, 2]
    f_ref[:] = D * inv_dx2 * _lap(u) + k * u * (1.0 - u)


def _bwd_kernel(u_ref, prm_ref, lam_ref, du_ref, dp_ref):
    u = u_ref[:]
    lam = lam_ref[:]
    D = prm_ref[0, 0]
    k = prm_ref[0, 1]
    inv_dx2 = prm_ref[0, 2]
    lap_u = _lap(u)
    # reflect-padded Laplacian is symmetric: transpose contraction = itself
    du_ref[:] = D * inv_dx2 * _lap(lam) + k * (1.0 - 2.0 * u) * lam
    dD = inv_dx2 * jnp.sum(lam * lap_u)
    dk = jnp.sum(lam * u * (1.0 - u))
    dp_ref[0, 0] = dD
    dp_ref[0, 1] = dk


def _prm(D, k, inv_dx2, dtype):
    return jnp.stack([jnp.asarray(D, dtype), jnp.asarray(k, dtype),
                      jnp.asarray(inv_dx2, dtype)])[None, :]


@jax.custom_vjp
def fused_rd1d(u, D, k, inv_dx2):
    """f(u; D, k) with a fused Pallas forward and fused Pallas pullback."""
    return _rd_fwd(u, D, k, inv_dx2)[0]


def _rd_fwd(u, D, k, inv_dx2):
    n = u.shape[0]
    dtype = u.dtype
    if not _HAVE_PALLAS:
        return rd1d_reference(u, D, k, inv_dx2), None
    # scalar params ride SMEM (scalars in VMEM are rejected by Mosaic)
    f = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_use_interpret(),
    )(u[None, :], _prm(D, k, inv_dx2, dtype))
    return f[0], None


def _rd_fwd_rule(u, D, k, inv_dx2):
    y, _ = _rd_fwd(u, D, k, inv_dx2)
    return y, (u, D, k, inv_dx2)


def _rd_bwd_rule(res, lam):
    u, D, k, inv_dx2 = res
    n = u.shape[0]
    dtype = u.dtype
    if not _HAVE_PALLAS:
        _, pull = jax.vjp(lambda uu, DD, kk: rd1d_reference(uu, DD, kk, inv_dx2),
                          u, D, k)
        du, dD, dk = pull(lam)
        return du, dD, dk, jnp.zeros_like(jnp.asarray(inv_dx2))
    # dp holds two SCALAR reductions -> SMEM output ("reduce to scalar —
    # use (1,1)-style stores in SMEM", Mosaic rejects scalar VMEM stores)
    du, dp = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dtype),
            jax.ShapeDtypeStruct((1, 2), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=_use_interpret(),
    )(u[None, :], _prm(D, k, inv_dx2, dtype), lam[None, :])
    zero_t = jnp.zeros((), dtype)
    return (du[0], dp[0, 0].astype(jnp.asarray(D).dtype),
            dp[0, 1].astype(jnp.asarray(k).dtype), zero_t)


fused_rd1d.defvjp(_rd_fwd_rule, _rd_bwd_rule)


def make_rd1d_field(n: int, dx: float):
    """ODE field f(u, p, t) over a length-n 1-D grid with p = (D, k) —
    drop-in flagship field for large-state PDE adjoints; every adjoint's
    pullback of this field is one fused Pallas launch."""
    inv_dx2 = 1.0 / (dx * dx)

    def field(u, p, t):
        return fused_rd1d(u, p[0], p[1], inv_dx2)

    return field
