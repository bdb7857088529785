"""Neural-ODE model family — the flagship models.

Spiral neural ODE: the reference's headline benchmark (docs/src/Benchmark.md:
Lux 2→50→2 tanh MLP, Tsit5, 30 saveat, Float32, gradient of L2 loss —
BASELINE.md). MNIST neural-ODE classifier: BASELINE config 3.

Pure-JAX parameter pytrees (dicts of W/b) — MXU-friendly batched matmuls in
the dynamics; bfloat16/float32 ready. No framework dependency so the model
rides through `solve`'s custom_vjp rules unchanged.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..problems import ODEProblem

__all__ = [
    "mlp_init",
    "mlp_apply",
    "neural_ode_field",
    "spiral_neural_ode",
    "spiral_data",
    "mnist_node_init",
    "mnist_node_apply",
    "neural_sde",
]


def mlp_init(key, sizes: Sequence[int], dtype=jnp.float32, scale=None):
    """Glorot-initialized MLP params as a pytree {'W0','b0','W1','b1',...}."""
    params = {}
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (m, n) in enumerate(zip(sizes[:-1], sizes[1:])):
        s = scale if scale is not None else jnp.sqrt(2.0 / (m + n)).astype(dtype)
        params[f"W{i}"] = (jax.random.normal(keys[i], (m, n), dtype) * s)
        params[f"b{i}"] = jnp.zeros((n,), dtype)
    return params


def mlp_apply(params, x, activation=jnp.tanh):
    n_layers = len(params) // 2
    h = x
    for i in range(n_layers):
        h = h @ params[f"W{i}"] + params[f"b{i}"]
        if i < n_layers - 1:
            h = activation(h)
    return h


def neural_ode_field(activation=jnp.tanh):
    """f(u, p, t) = MLP_p(u) — works on single states and batched (…, d)."""

    def f(u, p, t):
        return mlp_apply(p, u, activation)

    return f


def spiral_data(dtype=jnp.float32, nt: int = 30, T: float = 1.5):
    """The spiral ODE ground truth used by the reference benchmark:
    du/dt = [[-0.1, 2], [-2, -0.1]] · u³, u0 = [2, 0]."""
    ts = jnp.linspace(0.0, T, nt, dtype=dtype)
    A = jnp.array([[-0.1, 2.0], [-2.0, -0.1]], dtype)
    u0 = jnp.array([2.0, 0.0], dtype)

    def f(u, p, t):
        return (u ** 3) @ A.T

    return ODEProblem(f, u0, (0.0, float(T)), None), ts


def spiral_neural_ode(key=None, hidden: int = 50, dtype=jnp.float32):
    """2→hidden→2 tanh MLP on u³ (the standard spiral NODE parameterization)
    + problem factory. Returns (params, make_prob) with
    make_prob(params) -> ODEProblem."""
    key = key if key is not None else jax.random.PRNGKey(0)
    params = mlp_init(key, (2, hidden, 2), dtype)

    def f(u, p, t):
        return mlp_apply(p, u ** 3)

    def make_prob(p, u0=None, T=1.5):
        u0 = jnp.array([2.0, 0.0], dtype) if u0 is None else u0
        return ODEProblem(f, u0, (0.0, float(T)), p)

    return params, make_prob


# --- MNIST neural-ODE classifier (BASELINE config 3) ----------------------


def mnist_node_init(key, hidden: int = 64, feature: int = 64,
                    dtype=jnp.float32):
    """784 → feature encoder, ODE block (feature→hidden→feature), 10-way head."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encode": mlp_init(k1, (784, feature), dtype),
        "field": mlp_init(k2, (feature, hidden, feature), dtype),
        "head": mlp_init(k3, (feature, 10), dtype),
    }


def neural_sde(key=None, d: int = 2, hidden: int = 32, dtype=jnp.float32,
               sigma_scale: float = 0.1):
    """Neural SDE (reference: test/Core4/sde_neural.jl — MLP drift + MLP
    diagonal diffusion differentiated through the SDE adjoints).

    drift  f(u) = MLP_f(u)                     (d → hidden → d, tanh)
    diffusion g(u) = sigma_scale·softplus(MLP_g(u))  (diagonal, positive)

    Returns (params, make_prob): make_prob(params, u0=..., T=...) builds an
    SDEProblem with diagonal noise; solve with an SDE scheme + any SDE
    sensealg (DirectAdjoint / Interpolating / Backsolve over replayable
    counter-based noise).
    """
    from ..problems import SDEProblem

    key = key if key is not None else jax.random.PRNGKey(0)
    kf, kg = jax.random.split(key)
    params = {
        "drift": mlp_init(kf, (d, hidden, d), dtype),
        "diffusion": mlp_init(kg, (d, hidden, d), dtype),
    }

    def f(u, p, t):
        return mlp_apply(p["drift"], u)

    def g(u, p, t):
        return sigma_scale * jax.nn.softplus(mlp_apply(p["diffusion"], u))

    def make_prob(p, u0=None, T=1.0):
        u0 = jnp.ones((d,), dtype) if u0 is None else u0
        return SDEProblem(f, g, u0, (0.0, float(T)), p, noise="diagonal")

    return params, make_prob


def mnist_node_apply(params, x, solve_fn):
    """x: (batch, 784). solve_fn(prob) -> ODESolution (injected so callers
    choose solver/sensealg). Returns (batch, 10) logits."""
    h = jnp.tanh(mlp_apply(params["encode"], x))

    def f(u, p, t):
        return mlp_apply(p, jnp.tanh(u))

    prob = ODEProblem(f, h, (0.0, 1.0), params["field"])
    sol = solve_fn(prob)
    h1 = jax.tree_util.tree_map(lambda a: a[-1], sol.ys)
    return mlp_apply(params["head"], h1)
