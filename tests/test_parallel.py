"""Ensemble/parallel tests — the analogue of the reference's distributed
ensemble training test (test/Core4/distributed.jl:15-52): train through an
N-trajectory ensemble solve with AD, on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from scimlsensitivity_jl_tpu import GaussAdjoint, ODEProblem, Tsit5, remake
from scimlsensitivity_jl_tpu.parallel.ensemble import (
    EnsembleProblem,
    make_mesh,
    solve_ensemble,
)


def decay(u, p, t):
    return -p * u


BASE = ODEProblem(decay, jnp.array([1.0]), (0.0, 1.0), jnp.asarray(1.0))


def prob_func(prob, i):
    # trajectory i gets u0 scaled by (1 + i/10)
    return remake(prob, u0=prob.u0 * (1.0 + i / 10.0))


def test_vmap_ensemble():
    ens = EnsembleProblem(BASE, prob_func)
    sols = solve_ensemble(ens, Tsit5(), trajectories=8,
                          sensealg=GaussAdjoint())
    assert sols.ys.shape == (8, 2, 1)
    expect = (1.0 + np.arange(8) / 10.0) * np.exp(-1.0)
    assert np.allclose(sols.ys[:, -1, 0], expect, rtol=1e-6)


def test_shard_map_ensemble_matches_vmap():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    ens = EnsembleProblem(BASE, prob_func)
    mesh = make_mesh(8)
    s1 = solve_ensemble(ens, Tsit5(), trajectories=16, sensealg=GaussAdjoint())
    s2 = solve_ensemble(ens, Tsit5(), trajectories=16, backend="shard_map",
                        mesh=mesh, sensealg=GaussAdjoint())
    assert np.allclose(s1.ys, s2.ys, rtol=1e-12)


def test_gradient_through_sharded_ensemble():
    # The distributed.jl analogue: fit a shared parameter through an
    # ensemble loss, gradients crossing the shard_map boundary.
    mesh = make_mesh(8)
    ts = jnp.linspace(0.0, 1.0, 5)
    targets = jnp.exp(-1.3 * ts)

    def loss(p, backend):
        ens = EnsembleProblem(remake(BASE, p=p), prob_func)
        sols = solve_ensemble(
            ens, Tsit5(), trajectories=8, backend=backend,
            mesh=mesh if backend == "shard_map" else None,
            saveat=ts, sensealg=GaussAdjoint(),
        )
        scale = 1.0 + jnp.arange(8) / 10.0
        return jnp.mean((sols.ys[:, :, 0] - scale[:, None] * targets[None, :]) ** 2)

    g_vmap = jax.grad(lambda p: loss(p, "vmap"))(jnp.asarray(1.0))
    g_shard = jax.grad(lambda p: loss(p, "shard_map"))(jnp.asarray(1.0))
    assert np.allclose(g_vmap, g_shard, rtol=1e-10)
    # optimum at p = 1.3: gradient should be negative at p=1 (decay too slow)
    assert float(g_vmap) < 0


def test_sharded_state_adjoint():
    # PDE-scale sharded-state adjoint (SURVEY §2 parallelism table: sharded
    # u for single giant systems): 1-D heat equation, state sharded over the
    # 8-device mesh; XLA propagates the sharding through the solver loops
    # and inserts the halo-exchange collectives for the rolled Laplacian.
    from jax.sharding import NamedSharding, PartitionSpec as P
    from scimlsensitivity_jl_tpu import solve as _solve

    n = 1024
    mesh = make_mesh(8, axis="x")
    xs = jnp.linspace(0.0, 1.0, n, endpoint=False)
    u0 = jnp.sin(2 * jnp.pi * xs) + 0.5 * jnp.sin(6 * jnp.pi * xs)
    scale = float(n * n) / 400.0

    def heat(u, p, t):
        return p * scale * (jnp.roll(u, 1) + jnp.roll(u, -1) - 2.0 * u)

    def loss(p, u0_):
        prob = ODEProblem(heat, u0_, (0.0, 0.1), p)
        sol = _solve(prob, Tsit5(), rtol=1e-8, atol=1e-10,
                     sensealg=GaussAdjoint(), max_steps=1024)
        return jnp.sum(sol.ys[-1] ** 2)

    g_plain = jax.grad(loss)(jnp.asarray(1.3), u0)

    shard = NamedSharding(mesh, P("x"))
    g_shard = jax.jit(
        jax.grad(loss), in_shardings=(None, shard)
    )(jnp.asarray(1.3), jax.device_put(u0, shard))
    assert np.allclose(float(g_shard), float(g_plain), rtol=1e-10)


def test_nilss_shard_map_segments():
    # Shadowing on a multi-chip mesh: the transfer-operator NILSS shards
    # its segment axis over the devices (the reference's forward_sense
    # loop is serial — this parallelism has no reference analogue).
    from scimlsensitivity_jl_tpu import NILSS, NILSSProblem, shadow_forward

    assert jax.device_count() >= 8

    def lorenz_rho(u, p, t):
        x, y, z = u
        return jnp.array([10.0 * (y - x), x * (p[0] - z) - y,
                          x * y - (8.0 / 3.0) * z])

    def g(u, p, t):
        return u[2]

    p = jnp.array([28.0])
    u0 = jnp.array([-2.259143724332269, -2.47457604992522,
                    18.939914218990612])
    prob = ODEProblem(lorenz_rho, u0, (30.0, 54.0), p)
    nprob = NILSSProblem(prob, NILSS(nseg=24, nstep=81), g=g)

    res_vmap = shadow_forward(nprob, Tsit5(), rtol=1e-8, atol=1e-10,
                              segment_parallel=True)
    mesh = make_mesh(8, axis="seg")
    res_mesh = shadow_forward(nprob, Tsit5(), rtol=1e-8, atol=1e-10,
                              segment_parallel=True, mesh=mesh)
    # identical algorithm, sharded execution — results agree tightly
    assert np.allclose(np.asarray(res_mesh), np.asarray(res_vmap),
                       rtol=1e-6, atol=1e-8), (res_mesh, res_vmap)
    assert np.isclose(float(res_mesh[0]), 1.01, atol=0.3), float(res_mesh[0])


def test_ensemble_output_func_and_reduction():
    # reference EnsembleProblem output_func + reduction: per-trajectory
    # post-processing fused into the batched solve
    ens = EnsembleProblem(
        BASE, prob_func,
        output_func=lambda sol, i: sol.ys[-1, 0] * (i + 1),
    )
    outs = solve_ensemble(ens, Tsit5(), trajectories=8)
    expect = (1.0 + np.arange(8) / 10.0) * np.exp(-1.0) * (np.arange(8) + 1)
    assert np.allclose(np.asarray(outs), expect, rtol=1e-6)

    total = solve_ensemble(ens, Tsit5(), trajectories=8,
                           reduction=lambda o: jnp.sum(o))
    assert np.isclose(float(total), expect.sum(), rtol=1e-6)


def test_nilsas_shard_map_segments():
    # Adjoint shadowing on a mesh: segment transfer solves sharded over
    # devices; result equals the vmapped segment_parallel mode.
    from scimlsensitivity_jl_tpu import NILSAS
    from scimlsensitivity_jl_tpu.adjoints.shadowing.nilsas import (
        NILSASProblem,
        nilsas_shadow_adjoint,
    )

    assert jax.device_count() >= 8

    def lorenz_rho(u, p, t):
        x, y, z = u
        return jnp.array([10.0 * (y - x), x * (p[0] - z) - y,
                          x * y - (8.0 / 3.0) * z])

    p = jnp.array([28.0])
    u0 = jnp.array([-2.259143724332269, -2.47457604992522,
                    18.939914218990612])
    prob = ODEProblem(lorenz_rho, u0, (30.0, 54.0), p)
    nprob = NILSASProblem(prob, NILSAS(nseg=24, nstep=81, M=2),
                          g=lambda u, q, t: u[2])

    r_vmap = nilsas_shadow_adjoint(nprob, fwd_rtol=1e-10, max_steps=32768,
                                   segment_parallel=True)
    mesh = make_mesh(8, axis="seg")
    r_mesh = nilsas_shadow_adjoint(nprob, fwd_rtol=1e-10, max_steps=32768,
                                   segment_parallel=True, mesh=mesh)
    assert np.allclose(np.asarray(r_mesh), np.asarray(r_vmap),
                       rtol=1e-6, atol=1e-8), (r_mesh, r_vmap)
    assert np.isclose(float(r_mesh[0]), 1.01, atol=0.3), float(r_mesh[0])


def test_ensemble_summary():
    """EnsembleAnalysis/EnsembleSummary surface: per-time mean/var/median/
    quantile band over the trajectory axis, jit-safe."""
    from scimlsensitivity_jl_tpu import ensemble_summary

    key = jax.random.PRNGKey(0)
    ys = 1.0 + 0.1 * jax.random.normal(key, (64, 5, 2))
    s = jax.jit(ensemble_summary)(ys)
    assert s["mean"].shape == (5, 2)
    assert np.allclose(np.asarray(s["mean"]), np.asarray(ys).mean(0))
    assert np.allclose(np.asarray(s["var"]),
                       np.asarray(ys).var(0, ddof=1), rtol=1e-5)
    assert np.allclose(np.asarray(s["median"]),
                       np.median(np.asarray(ys), axis=0), atol=1e-6)
    assert np.all(np.asarray(s["qlow"]) <= np.asarray(s["median"]) + 1e-7)
    assert np.all(np.asarray(s["median"]) <= np.asarray(s["qhigh"]) + 1e-7)


def test_sharded_state_fixed_grid_continuous_adjoint():
    # Round-4 composition: the fixed-grid forward + continuous adjoint
    # (solve(..., adaptive=False, dt=..., sensealg=<continuous rule>))
    # under a sharded state — the PDE gradient mode that beats the 2x
    # exact-AD floor, on a multi-chip mesh. XLA propagates the sharding
    # through the fixed-dt while loop and the (pinned) reverse solve;
    # halo exchanges ride the rolled Laplacian. dt sits inside the RK
    # diffusion stability limit (p*scale*dt*4 < 2.8); Backsolve is NOT
    # used here — backward-reconstructed diffusion diverges over this
    # horizon (the dense-interpolation designs are the stable choice).
    from jax.sharding import NamedSharding, PartitionSpec as P
    from scimlsensitivity_jl_tpu import InterpolatingAdjoint
    from scimlsensitivity_jl_tpu import solve as _solve

    n = 1024
    mesh = make_mesh(8, axis="x")
    xs = jnp.linspace(0.0, 1.0, n, endpoint=False)
    u0 = jnp.sin(2 * jnp.pi * xs) + 0.5 * jnp.sin(6 * jnp.pi * xs)
    scale = float(n * n) / 400.0

    def heat(u, p, t):
        return p * scale * (jnp.roll(u, 1) + jnp.roll(u, -1) - 2.0 * u)

    def loss(p, u0_):
        prob = ODEProblem(heat, u0_, (0.0, 0.1), p)
        sol = _solve(prob, Tsit5(), dt=0.1 / 2048, adaptive=False,
                     sensealg=InterpolatingAdjoint(), adj_rtol=1e-8,
                     adj_atol=1e-10, adj_max_steps=4096)
        return jnp.sum(sol.ys[-1] ** 2)

    g_plain = jax.grad(loss)(jnp.asarray(1.3), u0)

    shard = NamedSharding(mesh, P("x"))
    g_shard = jax.jit(
        jax.grad(loss), in_shardings=(None, shard)
    )(jnp.asarray(1.3), jax.device_put(u0, shard))
    assert np.allclose(float(g_shard), float(g_plain), rtol=1e-10)
