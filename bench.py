"""Benchmark: spiral neural-ODE gradient time (the reference's headline
benchmark, docs/src/Benchmark.md / BASELINE.md).

Config mirrors the reference: 2→50→2 tanh MLP dynamics, Tsit5, 30 saveat
points on [0, 1.5], Float32, gradient of the discrete L2 loss wrt the MLP
parameters. Reference best: 1.657 ms (InterpolatingAdjoint +
ReverseDiffVJP(compile), CPU). vs_baseline = ref_ms / our_ms (>1 ⇒ faster
than the reference).

TPU-native formulation: a fixed-grid UNROLLED Tsit5 (29 steps — trajectory
error ~6e-4, the same accuracy class as the reference benchmark's
reltol=1e-3 operating point; cross-validated against the adaptive continuous
adjoints in tests/test_solve.py). Gradients are the exact discrete adjoint
through the unrolled graph.

Runtime note: on this tunnel-attached TPU runtime, any dispatch of an
executable with embedded (closure-captured) array constants permanently
degrades the process to a ~26 ms-per-dispatch slow path. The benchmark
therefore (a) passes every array as an argument and (b) prepares reference
data on the host CPU backend so the TPU path stays on the fast channel.

Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

from scimlsensitivity_jl_tpu import ODEProblem, Tsit5, solve
from scimlsensitivity_jl_tpu.models.neural_ode import mlp_apply, mlp_init

REF_MS = 1.657  # docs/src/Benchmark.md:91


def field(u, p, t):
    return mlp_apply(p, u ** 3)


def loss(p, u0, data, ts):
    prob = ODEProblem(field, u0, (0.0, 1.5), p)
    sol = solve(prob, Tsit5(), saveat=ts, dt=1.5 / 29,
                adaptive=False, unroll=True)
    return jnp.sum((sol.ys - data) ** 2)


def main():
    dtype = jnp.float32
    # Reference data via scipy on the host — no jax dispatches and no
    # device->host transfers before the timed executable (see module
    # docstring: stray slow-channel traffic degrades every later dispatch).
    import numpy as np
    from scipy.integrate import solve_ivp

    ts_np = np.linspace(0.0, 1.5, 30, dtype=np.float64)
    A = np.array([[-0.1, 2.0], [-2.0, -0.1]], np.float64)
    r = solve_ivp(
        lambda t, y: (y ** 3) @ A.T, (0.0, 1.5), [2.0, 0.0],
        rtol=1e-9, atol=1e-11, t_eval=ts_np, method="RK45",
    )
    ts = jnp.asarray(ts_np, dtype)
    u0 = jnp.asarray(np.array([2.0, 0.0]), dtype)
    params = mlp_init(jax.random.PRNGKey(0), (2, 50, 2), dtype)
    data = jnp.asarray(r.y.T, dtype)
    grad_fn = jax.jit(jax.grad(loss))

    g = grad_fn(params, u0, data, ts)
    jax.block_until_ready(g)

    n_rep = 200
    times = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        g = grad_fn(params, u0, data, ts)
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
