"""Model-family tests: spiral neural ODE training (the reference benchmark
config) and the MNIST-style neural-ODE classifier (BASELINE config 3;
synthetic data — the environment has no dataset egress)."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import optax

from scimlsensitivity_jl_tpu import (
    BacksolveAdjoint,
    InterpolatingAdjoint,
    ODEProblem,
    Tsit5,
    solve,
)
from scimlsensitivity_jl_tpu.models.neural_ode import (
    mnist_node_apply,
    mnist_node_init,
    spiral_data,
    spiral_neural_ode,
)


def test_spiral_neural_ode_trains():
    true_prob, ts = spiral_data(jnp.float64, nt=16)
    data = solve(true_prob, Tsit5(), saveat=ts, rtol=1e-10, atol=1e-12).ys

    params, make_prob = spiral_neural_ode(jax.random.PRNGKey(0), hidden=16,
                                          dtype=jnp.float64)

    def loss(p):
        sol = solve(make_prob(p), Tsit5(), saveat=ts, rtol=1e-6, atol=1e-8,
                    sensealg=InterpolatingAdjoint(), max_steps=512)
        return jnp.mean((sol.ys - data) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss))
    l0, _ = vg(params)
    p = params
    for _ in range(60):
        l, g = vg(p)
        upd, state = opt.update(g, state)
        p = optax.apply_updates(p, upd)
    assert float(l) < 0.5 * float(l0), (float(l0), float(l))


def test_mnist_node_classifier_step():
    key = jax.random.PRNGKey(0)
    params = mnist_node_init(key, hidden=32, feature=32, dtype=jnp.float64)
    # synthetic "digits": 10 class prototypes + noise
    kproto, kx, ky = jax.random.split(key, 3)
    protos = jax.random.normal(kproto, (10, 784), jnp.float64)
    labels = jax.random.randint(ky, (32,), 0, 10)
    x = protos[labels] + 0.1 * jax.random.normal(kx, (32, 784), jnp.float64)

    def solve_fn(prob):
        return solve(prob, Tsit5(), rtol=1e-4, atol=1e-6,
                     sensealg=BacksolveAdjoint(), max_steps=256)

    def loss(p):
        logits = mnist_node_apply(p, x, solve_fn)
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(32), labels]
        )

    vg = jax.jit(jax.value_and_grad(loss))
    l0, g0 = vg(params)
    assert np.isfinite(float(l0))
    # one SGD step reduces the loss
    p1 = jax.tree_util.tree_map(lambda a, b: a - 0.5 * b, params, g0)
    l1, _ = vg(p1)
    assert float(l1) < float(l0)


def test_neural_sde_trains():
    # Reference: test/Core4/sde_neural.jl — gradients through a neural SDE
    # (MLP drift + MLP diagonal diffusion) on a fixed noise realization.
    from scimlsensitivity_jl_tpu import DirectAdjoint, EulerMaruyama
    from scimlsensitivity_jl_tpu.models.neural_ode import neural_sde

    params, make_prob = neural_sde(jax.random.PRNGKey(3), d=2, hidden=8,
                                   dtype=jnp.float64)
    key = jax.random.PRNGKey(7)
    target = jnp.array([0.5, -0.25])

    def loss(p):
        sol = solve(make_prob(p, T=0.5), EulerMaruyama(), dt=1.0 / 64,
                    key=key, sensealg=DirectAdjoint())
        return jnp.sum((sol.ys[-1] - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    l0, g0 = vg(params)
    assert np.isfinite(float(l0))
    assert all(np.all(np.isfinite(x))
               for x in jax.tree_util.tree_leaves(g0))
    # gradient vs finite differences on one drift weight (same noise path)
    flat, unravel = jax.flatten_util.ravel_pytree(params)
    gflat = jax.flatten_util.ravel_pytree(g0)[0]
    i = int(jnp.argmax(jnp.abs(gflat)))
    eps = 1e-6
    lp = float(loss(unravel(flat.at[i].add(eps))))
    lm = float(loss(unravel(flat.at[i].add(-eps))))
    fd = (lp - lm) / (2 * eps)
    assert np.isclose(float(gflat[i]), fd, rtol=1e-5), (float(gflat[i]), fd)
    # one gradient step reduces the loss
    p1 = jax.tree_util.tree_map(lambda a, b: a - 0.2 * b, params, g0)
    l1, _ = vg(p1)
    assert float(l1) < float(l0)


def test_neural_feedback_control_trains():
    # Universal differential equation / optimal control (reference:
    # docs/src/examples/optimal_control/feedback_control.md): known linear
    # dynamics + neural controller trained jointly — params are a MIXED
    # pytree {"nn": MLP, "system": array}, gradients flow into both.
    from scimlsensitivity_jl_tpu import GaussAdjoint, ODEProblem, Tsit5, solve
    from scimlsensitivity_jl_tpu.models.neural_ode import mlp_apply, mlp_init

    params = {
        "nn": mlp_init(jax.random.PRNGKey(0), (2, 16, 1), jnp.float64),
        "system": jnp.array([0.5, -0.5]),
    }
    ts = jnp.linspace(0.0, 8.0, 17)

    def dynamics(u, p, t):
        control, output = u
        a, b = p["system"]
        dc = mlp_apply(p["nn"], u)[0]
        dy = a * output + b * control
        return jnp.array([dc, dy])

    def loss(p):
        prob = ODEProblem(dynamics, jnp.array([0.0, 1.1]), (0.0, 8.0), p)
        sol = solve(prob, Tsit5(), saveat=ts, rtol=1e-6, atol=1e-8,
                    sensealg=GaussAdjoint())
        return jnp.sum((sol.ys[:, 1] - 1.0) ** 2)

    import optax

    opt = optax.adam(0.05)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss))
    l0, _ = vg(params)
    p = params
    for _ in range(60):
        l, grad = vg(p)
        up, state = opt.update(grad, state)
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, up)
    assert np.isfinite(float(l))
    assert float(l) < 0.25 * float(l0), (float(l0), float(l))
    # gradient reached the known-system parameters too (joint estimation)
    g_sys = jax.grad(loss)(params)["system"]
    assert float(jnp.max(jnp.abs(g_sys))) > 0


def test_pde_constrained_heat_equation():
    # Reference docs/src/examples/pde/pde_constrained.md: recover the heat
    # equation's [a0, a1] from trajectory data by gradient descent through
    # the solve (method of lines, 200-point grid).
    from scimlsensitivity_jl_tpu import GaussAdjoint
    from scimlsensitivity_jl_tpu.models.pde import heat1d_problem

    prob, x = heat1d_problem(nx=200, T=0.3)
    ts = jnp.linspace(0.0, 0.3, 4)
    data = solve(prob, Tsit5(), saveat=ts, rtol=1e-8, atol=1e-10).ys

    def loss(p):
        sol = solve(
            ODEProblem(prob.f, prob.u0, prob.tspan, p), Tsit5(), saveat=ts,
            rtol=1e-8, atol=1e-10, sensealg=GaussAdjoint(), max_steps=8192,
        )
        return jnp.sum((sol.ys - data) ** 2)

    import optax

    p = jnp.array([1.4, 0.6])
    opt = optax.adam(0.05)
    state = opt.init(p)
    vg = jax.jit(jax.value_and_grad(loss))
    for _ in range(150):
        l, g = vg(p)
        up, state = opt.update(g, state)
        p = p + up
    assert np.allclose(np.asarray(p), [1.0, 1.0], atol=2e-2), np.asarray(p)


def test_brusselator_2d_adjoint():
    # Reference docs/src/examples/pde/brusselator.md: 2-D stiff
    # reaction-diffusion; gradient of a terminal functional wrt [A, B]
    # cross-checked against forward mode (32x32 grid = 2048 states).
    from scimlsensitivity_jl_tpu import InterpolatingAdjoint
    from scimlsensitivity_jl_tpu.models.pde import brusselator_2d_problem

    prob = brusselator_2d_problem(n=16, T=0.5)

    def loss(p, alg):
        sol = solve(
            ODEProblem(prob.f, prob.u0, prob.tspan, p), Tsit5(),
            rtol=1e-6, atol=1e-8, sensealg=alg, max_steps=16384,
        )
        return jnp.mean(sol.ys[-1] ** 2)

    from scimlsensitivity_jl_tpu import DirectAdjoint

    g_adj = jax.grad(lambda p: loss(p, InterpolatingAdjoint()))(prob.p)
    v = jnp.array([1.0, -0.5])
    # jvp oracle rides the plain-AD scan driver (custom_vjp rules reject jvp)
    _, dv = jax.jvp(lambda p: loss(p, DirectAdjoint()), (prob.p,), (v,))
    assert np.isclose(float(g_adj @ v), float(dv), rtol=1e-4), (
        float(g_adj @ v), float(dv))


def test_hybrid_ude_dosing_trains():
    # Reference docs/src/examples/hybrid_jump/hybrid_diffeq.md: explicit
    # dosing times (PresetTimeCallback u .+= 1) on a decaying system; a
    # neural UDE trains through the dose discontinuities. Here: tstops land
    # the dose times exactly, a DiscreteCallback applies the jumps, and
    # gradients flow through the event-jump VJPs.
    from scimlsensitivity_jl_tpu import DiscreteCallback, GaussAdjoint
    from scimlsensitivity_jl_tpu.models.neural_ode import mlp_apply, mlp_init

    dosetimes = jnp.array([1.0, 2.0, 4.0, 8.0])
    ts = jnp.linspace(0.0, 10.5, 22)
    u0 = jnp.array([2.0, 0.0])
    cb = DiscreteCallback(
        condition=lambda u, p, t: jnp.any(jnp.abs(t - dosetimes) < 1e-8),
        affect=lambda u, p, t: u + 1.0,
    )

    data = solve(ODEProblem(lambda u, p, t: -u, u0, (0.0, 10.5), None),
                 Tsit5(), saveat=ts, rtol=1e-8, atol=1e-10,
                 callback=cb, tstops=dosetimes).ys
    # doses visibly kick the terminal state (pure decay would be ~5e-5)
    assert float(data[-1, 0]) > 0.05

    params = mlp_init(jax.random.PRNGKey(0), (2, 16, 2), jnp.float64)

    def loss(p):
        prob = ODEProblem(lambda u, pp, t: mlp_apply(pp, u), u0,
                          (0.0, 10.5), p)
        sol = solve(prob, Tsit5(), saveat=ts, rtol=1e-6, atol=1e-8,
                    callback=cb, tstops=dosetimes, sensealg=GaussAdjoint(),
                    max_steps=2048)
        return jnp.sum((sol.ys - data) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))
    l0, g0 = vg(params)
    assert all(np.all(np.isfinite(x)) for x in jax.tree_util.tree_leaves(g0))
    opt = optax.adam(0.05)
    state = opt.init(params)
    p = params
    for _ in range(40):
        l, g = vg(p)
        up, state = opt.update(g, state)
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, up)
    assert float(l) < 0.3 * float(l0), (float(l0), float(l))
