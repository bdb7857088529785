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

__all__ = ["fused_rd1d", "rd1d_reference", "make_rd1d_field",
           "make_rd1d_rk4_block", "rd1d_rk4_scan_reference"]


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


# ---------------------------------------------------------------------------
# Whole-RK4-step megakernel (round-3): S fixed-grid RK4 steps of the
# reaction-diffusion field per pallas_call, state VMEM-resident across all
# 4·S stage evaluations — the HBM round trips XLA pays between scan
# iterations/stage fusions collapse to one read + one write per S steps.
# The pullback is the EXACT discrete adjoint of the S-step block, derived by
# hand and fused into a second kernel (stage states recomputed from the
# block's entry state — O(S²/2) extra VPU work traded for zero stage
# storage, the remat trade that wins in the bandwidth-bound regime).
# Reference seam: ext/SciMLSensitivityReactantExt.jl:32-134 (one compiled
# call for the whole VJP); SURVEY §7 step 12.
# ---------------------------------------------------------------------------


def _rd_f(u, D, k, inv_dx2):
    return D * inv_dx2 * _lap(u) + k * u * (1.0 - u)


def _rk4_one(u, D, k, inv_dx2, h):
    k1 = _rd_f(u, D, k, inv_dx2)
    k2 = _rd_f(u + 0.5 * h * k1, D, k, inv_dx2)
    k3 = _rd_f(u + 0.5 * h * k2, D, k, inv_dx2)
    k4 = _rd_f(u + h * k3, D, k, inv_dx2)
    return u + (h / 6.0) * (k1 + 2.0 * (k2 + k3) + k4)


def rd1d_rk4_scan_reference(u, D, k, inv_dx2, h, n_steps: int):
    """Plain-XLA fixed-grid RK4 scan over the rd1d field (what jax.grad
    differentiates through directly)."""
    u2 = u[None, :]

    def body(uu, _):
        return _rk4_one(uu, D, k, inv_dx2, h), None

    out, _ = jax.lax.scan(body, u2, None, length=n_steps)
    return out[0]


def _chunk_geometry(n: int, S: int, chunk: int):
    """Chunked-grid geometry: each program advances one length-C interior
    chunk by S steps from a (C + 2H)-wide halo window (stencil reach is 4
    cells per RK4 step, so H = 4(S+1) covers S steps plus the reverse pass's
    stage reach). Windows are materialized by XLA (one cheap gather pass) so
    the kernels stay simple single-block programs — overlapping BlockSpecs
    are not expressible directly."""
    C = min(chunk, n)
    H = 0 if C >= n else 4 * (S + 1)
    W = min(C + 2 * H, n)
    G = -(-n // C)
    if G * C != n:
        raise ValueError(
            f"rd1d megakernel needs n divisible by the chunk; "
            f"n={n}, chunk={C}"
        )
    if H and C < H:
        # the off ∈ {0, H, 2H} window arithmetic (and the kernels' static
        # 3-way slice switch) requires chunks at least one halo wide —
        # smaller chunks would clip the second-to-last window too and
        # silently read the wrong cells
        raise ValueError(
            f"rd1d megakernel chunk ({C}) must be >= the halo width "
            f"4*(S+1) = {H}; lower S or raise chunk"
        )
    return C, H, W, G


def _window_starts(n, C, H, W, G):
    starts = jnp.clip(jnp.arange(G) * C - H, 0, n - W)
    return starts


def _make_windows(u, starts, W):
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(u, (s,), (W,))
    )(starts)[:, None, :]  # (G, 1, W)


def _rk4_fwd_kernel_factory(S: int, n: int, C: int, H: int, W: int):
    def kern(u_ref, prm_ref, out_ref):
        i = pl.program_id(0)
        D = prm_ref[0, 0]
        k = prm_ref[0, 1]
        inv_dx2 = prm_ref[0, 2]
        h = prm_ref[0, 3]
        # interior offset inside this window (0 at the left edge, 2H at the
        # right edge, H in the middle; the clipped-window arithmetic)
        start = jnp.clip(i * C - H, 0, n - W)
        off = i * C - start
        u = u_ref[0]
        u = jax.lax.fori_loop(
            0, S, lambda s, uu: _rk4_one(uu, D, k, inv_dx2, h), u
        )
        if H == 0:
            out_ref[0] = u
        else:
            # off in {0, H, 2H} (left-edge / interior / right-edge chunk);
            # Mosaic has no dynamic_slice on values, so switch over the
            # three static slices
            out_ref[0] = jax.lax.switch(off // H, [
                lambda: u[:, 0:C],
                lambda: u[:, H:H + C],
                lambda: u[:, 2 * H:2 * H + C],
            ])

    return kern


def _rk4_bwd_kernel_factory(S: int, n: int, C: int, H: int, W: int):
    """Exact discrete adjoint of S RK4 steps on one halo window. One
    forward sweep re-steps the window from its entry state, caching every
    stage state in VMEM scratch; the reverse sweep then pays only the
    transpose stencils. Per reverse step s:

        w4 = (h/6)λ ;            s4 = J(u+h·k3)ᵀ w4
        w3 = (2h/6)λ + h·s4 ;    s3 = J(u+h/2·k2)ᵀ w3
        w2 = (2h/6)λ + h/2·s3 ;  s2 = J(u+h/2·k1)ᵀ w2
        w1 = (h/6)λ + h/2·s2 ;   s1 = J(u)ᵀ w1
        λ ← λ + s1 + s2 + s3 + s4
        dD += Σ_interior (L w_i)·u_i / dx² ;  dk += Σ_interior u_i(1−u_i)·w_i

    with Jᵀv = D/dx²·L v + k(1−2u_i)·v (edge-padded L is symmetric). dD
    uses that symmetry a second time — Σ w·(L u) = Σ (L w)·u globally —
    so the stage Laplacians need neither storage NOR recomputation: L w_i
    is already computed for the λ propagation (this halved the r3 kernel's
    VMEM scratch, 32·S·W → 16·S·W bytes, buying 2× larger chunks). The
    dD/dk sums mask to the interior chunk (halo cells are another
    program's cells; the masked per-program partials partition the exact
    global sum — interior L w_i values are exact because the halo covers
    the reverse pass's stencil reach); partials are summed outside."""

    def kern(u_ref, prm_ref, lam_ref, du_ref, dp_ref, ustore):
        i = pl.program_id(0)
        D = prm_ref[0, 0]
        k = prm_ref[0, 1]
        inv_dx2 = prm_ref[0, 2]
        h = prm_ref[0, 3]
        start = jnp.clip(i * C - H, 0, n - W)
        off = i * C - start
        u0 = u_ref[0]
        lam0 = lam_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        mask = ((col >= off) & (col < off + C)).astype(u0.dtype)

        # one forward sweep caching ALL FOUR stage states in VMEM scratch
        # (S x 4 x W x 4B — single-digit MB at chunked width): the reverse
        # sweep then does ONLY the transpose stencils lap(w_i) — the stage
        # chain's 4 stencils per step are paid once here instead of once
        # per reverse step (~8 stencil-equivalents per step total)
        def store_and_step(sidx, uu):
            k1 = D * inv_dx2 * _lap(uu) + k * uu * (1.0 - uu)
            u2 = uu + 0.5 * h * k1
            k2 = D * inv_dx2 * _lap(u2) + k * u2 * (1.0 - u2)
            u3 = uu + 0.5 * h * k2
            k3 = D * inv_dx2 * _lap(u3) + k * u3 * (1.0 - u3)
            u4 = uu + h * k3
            k4 = D * inv_dx2 * _lap(u4) + k * u4 * (1.0 - u4)
            ustore[pl.ds(4 * sidx + 0, 1), :] = uu
            ustore[pl.ds(4 * sidx + 1, 1), :] = u2
            ustore[pl.ds(4 * sidx + 2, 1), :] = u3
            ustore[pl.ds(4 * sidx + 3, 1), :] = u4
            return uu + (h / 6.0) * (k1 + 2.0 * (k2 + k3) + k4)

        jax.lax.fori_loop(0, S, store_and_step, u0)

        def rev_step(j, carry):
            # dD/dk accumulate ELEMENTWISE rows (accD/acck); the mask and
            # the two scalar reductions are applied once after the loop —
            # 8 full-width reduces per step would dominate the reverse
            lam, accD, acck = carry
            s = (S - 1) - j
            u = ustore[pl.ds(4 * s + 0, 1), :]
            u2 = ustore[pl.ds(4 * s + 1, 1), :]
            u3 = ustore[pl.ds(4 * s + 2, 1), :]
            u4 = ustore[pl.ds(4 * s + 3, 1), :]

            # Jᵀ(u_st) v = D/dx²·L v + k(1−2u_st)·v; keep L v for dD
            w4 = (h / 6.0) * lam
            lw4 = _lap(w4)
            s4 = D * inv_dx2 * lw4 + k * (1.0 - 2.0 * u4) * w4
            w3 = (2.0 * h / 6.0) * lam + h * s4
            lw3 = _lap(w3)
            s3 = D * inv_dx2 * lw3 + k * (1.0 - 2.0 * u3) * w3
            w2 = (2.0 * h / 6.0) * lam + 0.5 * h * s3
            lw2 = _lap(w2)
            s2 = D * inv_dx2 * lw2 + k * (1.0 - 2.0 * u2) * w2
            w1 = (h / 6.0) * lam + 0.5 * h * s2
            lw1 = _lap(w1)
            s1 = D * inv_dx2 * lw1 + k * (1.0 - 2.0 * u) * w1

            # dD by L-symmetry: Σ w_i·(L u_i) = Σ (L w_i)·u_i globally
            accD = accD + (lw1 * u + lw2 * u2 + lw3 * u3 + lw4 * u4)
            acck = acck + (w1 * u * (1.0 - u) + w2 * u2 * (1.0 - u2)
                           + w3 * u3 * (1.0 - u3) + w4 * u4 * (1.0 - u4))
            return (lam + s1 + s2 + s3 + s4, accD, acck)

        zrow = jnp.zeros_like(lam0)
        lam, accD, acck = jax.lax.fori_loop(
            0, S, rev_step, (lam0, zrow, zrow))
        dD = inv_dx2 * jnp.sum(mask * accD)
        dk = jnp.sum(mask * acck)
        if H == 0:
            du_ref[0] = lam
        else:
            du_ref[0] = jax.lax.switch(off // H, [
                lambda: lam[:, 0:C],
                lambda: lam[:, H:H + C],
                lambda: lam[:, 2 * H:2 * H + C],
            ])
        # per-program scalar partials ride a (8, 128) VMEM tile (Mosaic
        # rejects sub-tile blocked outputs and scatter); dD at [0,0],
        # dk at [0,1] via iota masks
        rr = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        zero8 = jnp.zeros((8, 128), lam.dtype)
        dp_ref[0] = jnp.where(
            (rr == 0) & (cc == 0), dD,
            jnp.where((rr == 0) & (cc == 1), dk, zero8)
        )

    return kern


def _prm4(D, k, inv_dx2, h, dtype):
    return jnp.stack([jnp.asarray(D, dtype), jnp.asarray(k, dtype),
                      jnp.asarray(inv_dx2, dtype),
                      jnp.asarray(h, dtype)])[None, :]


def make_rd1d_rk4_block(n: int, S: int, chunk: int = 65536,
                        bwd_chunk: int = None,
                        force_kernel_interpret: bool = False):
    """S-step RK4 megakernel over a length-n rd1d grid as a custom_vjp
    function (u, D, k, inv_dx2, h) -> u_after_S_steps.

    Execution: the grid is split into length-`chunk` interior chunks, each
    advanced S steps inside VMEM from a haloed window (one program per
    chunk) — the 4·S stage evaluations never round-trip HBM. Off-TPU runs
    the plain-XLA scan (the kernels target Mosaic; interpret-mode
    fori_loops are pathologically slow at these sizes).
    force_kernel_interpret=True runs the actual kernels under the Pallas
    interpreter — the CPU test path validating the hand-derived pullback
    and the halo geometry."""
    C, H, W, G = _chunk_geometry(n, S, chunk)
    # the pullback kernel holds 4·S window-sized scratch rows (stage
    # states; Laplacians are neither stored nor recomputed — dD rides the
    # L-symmetry, see _rk4_bwd_kernel_factory) plus live temps — smaller
    # chunks keep it inside ~16 MB VMEM (scratch bytes = 16·S·W_b)
    Cb, Hb, Wb, Gb = _chunk_geometry(n, S, bwd_chunk or max(chunk // 2, 1))
    fwd_kern = _rk4_fwd_kernel_factory(S, n, C, H, W)
    bwd_kern = _rk4_bwd_kernel_factory(S, n, Cb, Hb, Wb)
    def _on_kernel_path():
        return _HAVE_PALLAS and (not _use_interpret()
                                 or force_kernel_interpret)

    @jax.custom_vjp
    def block(u, D, k, inv_dx2, h):
        return _block_fwd(u, D, k, inv_dx2, h)

    def _block_fwd(u, D, k, inv_dx2, h):
        if not _on_kernel_path():
            return rd1d_rk4_scan_reference(u, D, k, inv_dx2, h, S)
        dtype = u.dtype
        starts = _window_starts(n, C, H, W, G)
        wins = _make_windows(u, starts, W)  # (G, 1, W)
        out = pl.pallas_call(
            fwd_kern,
            grid=(G,),
            out_shape=jax.ShapeDtypeStruct((G, 1, C), dtype),
            in_specs=[
                pl.BlockSpec((1, 1, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_use_interpret(),
        )(wins, _prm4(D, k, inv_dx2, h, dtype))
        return out.reshape(n)

    def block_fwd_rule(u, D, k, inv_dx2, h):
        return _block_fwd(u, D, k, inv_dx2, h), (u, D, k, inv_dx2, h)

    def block_bwd_rule(res, lam):
        u, D, k, inv_dx2, h = res
        if not _on_kernel_path():
            _, pull = jax.vjp(
                lambda uu, DD, kk: rd1d_rk4_scan_reference(
                    uu, DD, kk, inv_dx2, h, S), u, D, k)
            du, dD, dk = pull(lam)
            return (du, dD, dk, jnp.zeros_like(jnp.asarray(inv_dx2)),
                    jnp.zeros_like(jnp.asarray(h)))
        dtype = u.dtype
        starts = _window_starts(n, Cb, Hb, Wb, Gb)
        uwins = _make_windows(u, starts, Wb)
        lwins = _make_windows(lam, starts, Wb)
        du, dp = pl.pallas_call(
            bwd_kern,
            grid=(Gb,),
            out_shape=(
                jax.ShapeDtypeStruct((Gb, 1, Cb), dtype),
                jax.ShapeDtypeStruct((Gb, 8, 128), dtype),
            ),
            in_specs=[
                pl.BlockSpec((1, 1, Wb), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, Wb), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, Cb), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((4 * S, Wb), dtype)],
            interpret=_use_interpret(),
        )(uwins, _prm4(D, k, inv_dx2, h, dtype), lwins)
        zero = jnp.zeros((), dtype)
        return (du.reshape(n),
                jnp.sum(dp[:, 0, 0]).astype(jnp.asarray(D).dtype),
                jnp.sum(dp[:, 0, 1]).astype(jnp.asarray(k).dtype),
                zero, zero)

    block.defvjp(block_fwd_rule, block_bwd_rule)
    return block


def make_rd1d_field(n: int, dx: float):
    """ODE field f(u, p, t) over a length-n 1-D grid with p = (D, k) —
    drop-in flagship field for large-state PDE adjoints; every adjoint's
    pullback of this field is one fused Pallas launch."""
    inv_dx2 = 1.0 / (dx * dx)

    def field(u, p, t):
        return fused_rd1d(u, p[0], p[1], inv_dx2)

    return field
