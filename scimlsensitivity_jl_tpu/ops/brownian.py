"""Counter-based splittable Brownian noise.

Replaces DiffEqNoiseProcess's NoiseProcess/NoiseGrid/NoiseWrapper machinery
(reference: deepcopy + reverse(W) of the recorded forward path,
backsolve_adjoint.jl:395-411, SURVEY §2 item 7). On TPU the path is never
*stored*: increments are pure functions of (key, step index), so forward and
reverse passes regenerate bit-identical noise functionally — no host memory,
no reversal, replayable inside jit.

Two generators:
  * grid increments — `grid_increment(key, i, shape, dt)`: ΔW over step i of
    a fixed grid. The workhorse for the fixed-grid SDE solvers.
  * VirtualBrownianTree — W(t) at arbitrary t by binary bisection with
    Brownian-bridge sampling (Li et al. 2020, "Scalable Gradients for SDEs"),
    counter-based keys at every tree node. Used for RODE paths and
    adaptive-time queries.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "grid_increment",
    "grid_iterated",
    "grid_levy_area",
    "grid_path",
    "NoiseGrid",
    "VirtualBrownianTree",
]


class NoiseGrid(NamedTuple):
    """User-supplied (observed) Brownian path at grid nodes — the
    DiffEqNoiseProcess NoiseGrid analogue (SURVEY §2 item 7): fitting
    against a *measured* path instead of framework-generated noise.

    ts: (N+1,) node times — must equal the solve's fixed grid
        (t0 + i·dt); validated eagerly when concrete.
    W:  (N+1,) + noise-shape path values; the solvers consume increments
        ΔW_i = W[i+1] − W[i]. Reverse passes read the same increments, so
        gradients are exact discrete adjoints over the given path.
    """

    ts: jnp.ndarray
    W: jnp.ndarray


def grid_increment(key, i, shape, dt):
    """ΔW_i ~ N(0, dt) for step i of a fixed grid — pure in (key, i)."""
    k = jax.random.fold_in(key, i)
    return jax.random.normal(k, shape) * jnp.sqrt(jnp.abs(dt))


def grid_iterated(key, i, shape, dt, dw):
    """ΔZ_i = ∫ₜ^{t+h} (W(s) − W(t)) ds for step i, conditioned on ΔW_i = dw.

    (ΔW, ΔZ) is jointly Gaussian with Var ΔZ = h³/3, Cov(ΔW, ΔZ) = h²/2, so
    ΔZ | ΔW = (h/2)(ΔW + √(h/3)·ζ), ζ ~ N(0, I) independent of ΔW. The ζ
    stream is fold_in-tagged off the same per-step key, so it is pure in
    (key, i) and bit-identical across forward/reverse passes (same property
    the reference gets by storing NoiseProcess levels — DiffEqNoiseProcess
    SRA path; SURVEY §2 item 7)."""
    k = jax.random.fold_in(jax.random.fold_in(key, i), 0x5A1)
    zeta = jax.random.normal(k, shape)
    h = jnp.abs(dt)
    return 0.5 * dt * (dw + jnp.sqrt(h / 3.0) * zeta)


def grid_levy_area(key, i, m, dt, dw, terms: int = 10):
    """Antisymmetric Lévy area A_jk = ½(I_(j,k) − I_(k,j)) for step i,
    conditioned on ΔW_i = dw (shape (m,)), by the truncated Kloeden–Platen
    Fourier series (KP 1992 §10.3.7; the reference stack has no Lévy-area
    generator at all — StochasticDiffEq's RKMilGeneral scope):

        A = (h/2π) Σ_{r=1}^{P} (1/r) (X_r b_rᵀ − b_r X_rᵀ),
        b_r = Y_r + √(2/h)·ΔW,   X_r, Y_r ~ N(0, I_m) iid.

    Truncation error is strong O(h/√P) per step. Counter-based off
    (key, i) like every other noise stream, so forward and reverse passes
    see bit-identical areas."""
    k = jax.random.fold_in(jax.random.fold_in(key, i), 0x1E4)
    h = jnp.abs(dt)
    X = jax.random.normal(jax.random.fold_in(k, 0), (terms, m), dw.dtype)
    Y = jax.random.normal(jax.random.fold_in(k, 1), (terms, m), dw.dtype)
    b = Y + jnp.sqrt(2.0 / h) * dw[None, :]
    r = jnp.arange(1, terms + 1, dtype=dw.dtype)[:, None, None]
    outer = X[:, :, None] * b[:, None, :] - b[:, :, None] * X[:, None, :]
    return (h / (2.0 * jnp.pi)) * jnp.sum(outer / r, axis=0)


def grid_path(key, n_steps: int, shape, dt):
    """W at the n_steps+1 grid nodes (cumsum of increments; W(t0)=0)."""
    incs = jax.vmap(lambda i: grid_increment(key, i, shape, dt))(
        jnp.arange(n_steps)
    )
    w = jnp.cumsum(incs, axis=0)
    zero = jnp.zeros((1,) + tuple(shape), w.dtype)
    return jnp.concatenate([zero, w], axis=0)


class VirtualBrownianTree(NamedTuple):
    """W(t) on [t0, t1] via fixed-depth bisection + Brownian bridge.

    Depth D gives resolution (t1-t0)/2^D below which W is linearly
    interpolated — queries are deterministic, so identical times in forward
    and reverse passes see identical noise.
    """

    key: jax.Array
    t0: jnp.ndarray
    t1: jnp.ndarray
    w_end: jnp.ndarray  # W(t1) sample (W(t0) = 0)
    shape: Tuple[int, ...]
    depth: int

    @classmethod
    def create(cls, key, t0, t1, shape=(), depth: int = 30, dtype=jnp.float64):
        t0 = jnp.asarray(t0, dtype)
        t1 = jnp.asarray(t1, dtype)
        k_end, key = jax.random.split(key)
        w_end = jax.random.normal(k_end, shape, dtype) * jnp.sqrt(t1 - t0)
        return cls(key=key, t0=t0, t1=t1, w_end=w_end, shape=tuple(shape),
                   depth=depth)

    def __call__(self, t):
        """W(t) for scalar t in [t0, t1]."""
        t = jnp.asarray(t, self.t0.dtype)

        def bisect(carry, _):
            key, ta, tb, wa, wb = carry
            tm = 0.5 * (ta + tb)
            # Deterministic per-node key: `key` encodes the left/right path
            # prefix down the tree (split-and-select below), so tagging it
            # with a constant yields a distinct, replayable key per node —
            # the midpoint sample depends only on the node's position.
            knode = jax.random.fold_in(
                key, jnp.asarray(0, jnp.uint32)
            )
            # Brownian bridge at midpoint: N(mean, (tb-ta)/4)
            mean = 0.5 * (wa + wb)
            std = 0.5 * jnp.sqrt(jnp.maximum(tb - ta, 0.0))
            wm = mean + std * jax.random.normal(knode, self.shape, wa.dtype)
            go_left = t < tm
            key_l, key_r = jax.random.split(key)
            key = jnp.where(go_left, key_l, key_r)
            ta, tb = jnp.where(go_left, ta, tm), jnp.where(go_left, tm, tb)
            wa = jnp.where(go_left, wa, wm)
            wb = jnp.where(go_left, wm, wb)
            return (key, ta, tb, wa, wb), None

        w0 = jnp.zeros(self.shape, self.w_end.dtype)
        (key, ta, tb, wa, wb), _ = jax.lax.scan(
            bisect, (self.key, self.t0, self.t1, w0, self.w_end), None,
            length=self.depth,
        )
        # Linear interpolation at the leaf.
        h = jnp.maximum(tb - ta, 1e-300)
        theta = jnp.clip((t - ta) / h, 0.0, 1.0)
        return wa + theta * (wb - wa)
