"""Pallas-fused 2-layer MLP field kernels (forward + custom-VJP backward).

The hot op of the neural-ODE family (BASELINE: 2→50→2 tanh MLP inside every
RK stage). On small sequential workloads the TPU is per-op-latency-bound —
each XLA op in the stage chain costs ~μs regardless of FLOPs — so fusing the
whole MLP (two matmuls + bias + tanh) into ONE Mosaic kernel, and its whole
pullback (5 products) into another, cuts the op count per RK stage by ~5×.
This is the Pallas realization of the build plan's "fused λᵀ∂f/∂u, λᵀ∂f/∂p
VJP kernels" (SURVEY §7, L1 row): for an MLP field the pullback kernel
produces du-bar and all parameter cotangents in a single launch — exactly
the quantity `vecjacobian!` assembles through its backend zoo
(reference: src/derivative_wrappers.jl:256).

Falls back to plain jnp on non-TPU backends (interpret mode is used for CPU
testing parity).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

__all__ = ["fused_mlp2", "mlp2_reference"]


def mlp2_reference(x, w0, b0, w1, b1):
    h = jnp.tanh(x @ w0 + b0)
    return h @ w1 + b1


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _acc_dtype(dtype):
    # MXU-native accumulation: bf16/f16/f32 inputs accumulate in f32;
    # f64 (CPU interpret mode only) keeps f64 so the op stays a smooth
    # f64 function for the gradient-oracle tests.
    return jnp.promote_types(dtype, jnp.float32)


def _fwd_kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, y_ref, h_ref):
    # matmuls accumulate in _acc_dtype on the MXU; stores cast back to the
    # ref dtype (Mosaic rejects f32 stores into bf16 refs on real
    # hardware — CPU interpret mode silently accepts them).
    x = x_ref[:]
    acc = _acc_dtype(x.dtype)
    h = jnp.tanh(
        jnp.dot(x, w0_ref[:], preferred_element_type=acc) + b0_ref[:]
    )
    h_ref[:] = h.astype(h_ref.dtype)
    y = jnp.dot(h.astype(x.dtype), w1_ref[:],
                preferred_element_type=acc) + b1_ref[:]
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, w0_ref, w1_ref, h_ref, g_ref,
                dx_ref, dw0_ref, db0_ref, dw1_ref, db1_ref):
    g = g_ref[:]           # (B, dout)
    h = h_ref[:]           # (B, hid)
    x = x_ref[:]           # (B, din)
    w1 = w1_ref[:]
    acc = _acc_dtype(x.dtype)
    dw1_ref[:] = jnp.dot(h.T, g, preferred_element_type=acc).astype(
        dw1_ref.dtype)
    db1_ref[:] = jnp.sum(g.astype(acc), axis=0,
                         keepdims=True).astype(db1_ref.dtype)
    dh = jnp.dot(g, w1.T, preferred_element_type=acc)
    hf = h.astype(acc)
    dz = dh * (1.0 - hf * hf)
    db0_ref[:] = jnp.sum(dz, axis=0, keepdims=True).astype(db0_ref.dtype)
    dzc = dz.astype(x.dtype)
    dw0_ref[:] = jnp.dot(x.T, dzc,
                         preferred_element_type=acc).astype(
        dw0_ref.dtype)
    dx_ref[:] = jnp.dot(dzc, w0_ref[:].T,
                        preferred_element_type=acc).astype(
        dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_core(x2, w0, b0r, w1, b1r):
    y, _ = _fused_fwd_call(x2, w0, b0r, w1, b1r)
    return y


def _fused_fwd_call(x2, w0, b0r, w1, b1r):
    B, din = x2.shape
    hid = w0.shape[1]
    dout = w1.shape[1]
    y, h = pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, dout), x2.dtype),
            jax.ShapeDtypeStruct((B, hid), x2.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=_use_interpret(),
    )(x2, w0, b0r, w1, b1r)
    return y, h


def _fused_fwd(x2, w0, b0r, w1, b1r):
    y, h = _fused_fwd_call(x2, w0, b0r, w1, b1r)
    return y, (x2, w0, w1, h)


def _fused_bwd(res, g):
    x2, w0, w1, h = res
    B, din = x2.shape
    hid = w0.shape[1]
    dout = w1.shape[1]
    dx, dw0, db0, dw1, db1 = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, din), x2.dtype),
            jax.ShapeDtypeStruct((din, hid), x2.dtype),
            jax.ShapeDtypeStruct((1, hid), x2.dtype),
            jax.ShapeDtypeStruct((hid, dout), x2.dtype),
            jax.ShapeDtypeStruct((1, dout), x2.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)),
        interpret=_use_interpret(),
    )(x2, w0, w1, h, g)
    return dx, dw0, db0, dw1, db1


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def fused_mlp2(params: Dict[str, jnp.ndarray], x):
    """Fused 2-layer tanh MLP: y = tanh(x·W0 + b0)·W1 + b1.

    params: {'W0','b0','W1','b1'} (the mlp_init layout); x: (din,) or
    (B, din). Differentiable wrt both x and params via the fused backward
    kernel. Falls back to interpret mode off-TPU.
    """
    if not _HAVE_PALLAS:
        return mlp2_reference(x, params["W0"], params["b0"], params["W1"],
                              params["b1"])
    single = x.ndim == 1
    x2 = x[None, :] if single else x
    # VMEM gate: the kernels are single-block (whole arrays in VMEM). The
    # backward holds x, w0, w1, h, g, five outputs, and three f32
    # intermediates of shape (B, hid); above ~12 MB of scoped VMEM Mosaic
    # OOMs (16 MB limit, measured 2026-08-19 at B=1024, 512->2048->512:
    # 26.3 MB demanded). Fall back to the plain-XLA reference there — at
    # those MXU-bound sizes XLA's own codegen wins anyway (measured 1.9x
    # faster than the fused kernel); the kernel's regime is small
    # latency-bound fields.
    B = x2.shape[0]
    din, hid = params["W0"].shape
    dout = params["W1"].shape[1]
    isz = x2.dtype.itemsize
    vmem_est = (2 * B * (din + dout) + din * hid + hid * dout
                + 2 * B * hid) * isz + 3 * B * hid * 4
    if vmem_est > 12 * 1024 * 1024:
        return mlp2_reference(x, params["W0"], params["b0"], params["W1"],
                              params["b1"])
    b0r = params["b0"][None, :]
    b1r = params["b1"][None, :]
    y = _fused_core(x2, params["W0"], b0r, params["W1"], b1r)
    return y[0] if single else y
