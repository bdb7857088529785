"""Synthetic-digits neural-ODE classification (BASELINE config 3 stand-in).

The reference's headline training claim is the spiral/MNIST neural-ODE loop
(~100× torchdiffeq, /root/reference/docs/src/Benchmark.md:22). This
environment has no dataset egress, so the classification set is generated
in-repo: 10 smooth 8×8 prototype patterns, samples = prototype rolled by a
random (dx, dy) shift + Gaussian pixel noise — shift-invariance makes the
task non-trivially nonlinear while staying deterministic (fixed key).

Model: 64 → feature linear encoder, neural-ODE block u̇ = MLP(u) integrated
over [0, 1] (the continuous-depth residual block), linear 10-way head.
Differentiated end-to-end with BacksolveAdjoint(checkpointing=True), batched
with `jax.vmap` over the solve — the reference workflow on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..problems import ODEProblem
from ..sensealg import BacksolveAdjoint
from .neural_ode import mlp_apply, mlp_init

__all__ = ["synthetic_digits", "digits_node_init", "digits_node_apply",
           "make_digits_train_step"]


def synthetic_digits(key, n: int = 1200, noise: float = 0.35,
                     dtype=jnp.float32):
    """(x (n, 64), y (n,)) — 10-class shifted-prototype images."""
    kp, ks, kn, kl = jax.random.split(key, 4)
    raw = jax.random.normal(kp, (10, 8, 8), dtype)
    # smooth the prototypes (3x3 box blur, wrap) so shifts are meaningful
    proto = raw
    for ax in (1, 2):
        proto = (jnp.roll(proto, 1, ax) + proto + jnp.roll(proto, -1, ax)) / 3.0
    proto = proto / jnp.std(proto, axis=(1, 2), keepdims=True)
    y = jax.random.randint(kl, (n,), 0, 10)
    dx = jax.random.randint(ks, (n, 2), -1, 2)  # shifts in {-1, 0, 1}

    def sample(i):
        img = proto[y[i]]
        img = jnp.roll(img, dx[i, 0], axis=0)
        img = jnp.roll(img, dx[i, 1], axis=1)
        return img.reshape(64)

    x = jax.vmap(sample)(jnp.arange(n))
    x = x + noise * jax.random.normal(kn, x.shape, dtype)
    return x.astype(dtype), y


def digits_node_init(key, feature: int = 32, hidden: int = 64,
                     dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encode": mlp_init(k1, (64, feature), dtype),
        "field": mlp_init(k2, (feature, hidden, feature), dtype),
        "head": mlp_init(k3, (feature, 10), dtype),
    }


def digits_node_apply(params, x, *, solver=None, sensealg=None,
                      rtol=1e-3, atol=1e-6, max_steps=128, unroll=False):
    """Logits for one 64-pixel image via the continuous-depth block.

    unroll=True runs the adaptive solve (and its reverse) as straight-line
    XLA (docs/tpu_performance.md) — the latency-floor training mode; bound
    max_steps accordingly (~48 covers rtol 1e-3 here)."""
    from ..solve import solve
    from ..solvers.explicit import Tsit5

    if solver is None:
        solver = Tsit5()
    if sensealg is None:
        sensealg = BacksolveAdjoint(checkpointing=True)
    h0 = mlp_apply(params["encode"], x)

    def field(u, p, t):
        return mlp_apply(p, jnp.tanh(u))

    sol = solve(ODEProblem(field, h0, (0.0, 1.0), params["field"]),
                solver, saveat=jnp.array([0.0, 1.0], x.dtype),
                rtol=rtol, atol=atol, max_steps=max_steps,
                sensealg=sensealg, unroll=unroll)
    return mlp_apply(params["head"], sol.ys[-1])


def make_digits_train_step(optimizer, **apply_kw):
    """(params, opt_state, xb, yb) -> (params, opt_state, loss) jittable
    Adam/SGD step; softmax cross-entropy over a vmapped batch of solves."""

    def loss_fn(params, xb, yb):
        logits = jax.vmap(
            lambda x: digits_node_apply(params, x, **apply_kw))(xb)
        logz = jax.nn.log_softmax(logits)
        return -jnp.mean(logz[jnp.arange(xb.shape[0]), yb])

    def step(params, opt_state, xb, yb):
        loss, grads = jax.value_and_grad(loss_fn)(params, xb, yb)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step, loss_fn
