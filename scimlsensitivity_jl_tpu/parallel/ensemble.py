"""Ensemble solves — the framework's data-parallel surface.

The reference's parallelism story is EnsembleProblem + EnsembleThreads /
EnsembleDistributed (Distributed.jl worker processes; test/Core4/
distributed.jl:15-52, docs data_parallel.md). TPU-native mapping
(SURVEY §2 parallelism table):

  * backend="vmap"      — single-chip batching: one compiled program, the
                          batch dimension rides the MXU lanes.
  * backend="shard_map" — multi-chip: trajectories sharded over a mesh axis,
                          each device vmaps its shard; XLA inserts the ICI
                          collectives for any cross-shard reduction
                          (gradient sums = psum, the only collective the
                          reference semantically needs).

AD flows through both (shard_map is differentiable), so
`jax.grad(loss-of-ensemble)` reproduces the reference's "train through a
distributed ensemble solve" test with collectives riding ICI instead of TCP.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..solve import solve

__all__ = ["EnsembleProblem", "solve_ensemble", "make_mesh",
           "ensemble_summary"]


@dataclass(frozen=True)
class EnsembleProblem:
    """prob + prob_func(prob, i) -> per-trajectory problem (a pytree, so the
    whole construction is vmappable over i).

    output_func(sol, i) -> out: per-trajectory post-processing applied
    inside the batched solve (the reference's EnsembleProblem output_func;
    vmapped/shard_mapped with the solve, so reductions over `out` stay
    on-device)."""

    prob: Any
    prob_func: Optional[Callable] = None
    output_func: Optional[Callable] = None

    def instantiate(self, i):
        if self.prob_func is None:
            return self.prob
        return self.prob_func(self.prob, i)


def make_mesh(n_devices: Optional[int] = None, axis: str = "traj") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (axis,))


def solve_ensemble(
    ens: EnsembleProblem,
    solver=None,
    *,
    trajectories: int,
    backend: str = "vmap",
    mesh: Optional[Mesh] = None,
    axis: str = "traj",
    reduction: Optional[Callable] = None,
    **solve_kwargs,
):
    """Solve `trajectories` variations of ens.prob.

    reduction: optional callable applied to the batched solution pytree
    (e.g. lambda ys: ys.mean(0)); with shard_map the reduction happens
    per-shard then cross-shard, keeping traffic on ICI.
    Returns the batched ODESolution pytree (leading axis = trajectory), or
    the reduction result.
    """

    def run_one(i):
        prob_i = ens.instantiate(i)
        sol = solve(prob_i, solver, **solve_kwargs)
        if ens.output_func is not None:
            return ens.output_func(sol, i)
        return sol

    idx = jnp.arange(trajectories)

    if backend == "vmap":
        sols = jax.vmap(run_one)(idx)
        return reduction(sols) if reduction is not None else sols

    if backend == "shard_map":
        mesh = mesh or make_mesh(axis=axis)
        n_dev = mesh.devices.size
        if trajectories % n_dev != 0:
            raise ValueError(
                f"trajectories ({trajectories}) must divide evenly over the "
                f"{n_dev}-device mesh axis '{axis}'"
            )

        def local(idx_shard):
            return jax.vmap(run_one)(idx_shard)

        # check_vma=False: the solver's while_loop carries mix shard-varying
        # state with replicated closure constants (t0, tolerances), which the
        # varying-manual-axes checker rejects; the program is still valid SPMD.
        sols = jax.shard_map(
            local, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
            check_vma=False,
        )(idx)
        # Reduction applied on the sharded result: XLA lowers the cross-shard
        # combine to ICI collectives.
        return reduction(sols) if reduction is not None else sols

    raise ValueError(f"unknown ensemble backend {backend!r}")


def ensemble_summary(ys, quantiles=(0.05, 0.95)):
    """Timeseries statistics over a batched trajectory array — the
    reference's EnsembleAnalysis/EnsembleSummary surface (SciMLBase
    `EnsembleSummary(sim; quantiles)`): per-time mean, variance, median,
    and the requested quantile band, reduced over the leading trajectory
    axis. Works on the `ys` stack returned by `solve_ensemble` (or any
    (trajectories, nt, ...) array); reductions are jit/vmap-safe and, on a
    sharded result, lower to ICI collectives.

    Returns a dict {mean, var, median, qlow, qhigh}."""
    ys = jnp.asarray(ys)
    qs = jnp.asarray(quantiles, ys.dtype)
    ql, qh = jnp.quantile(ys, qs, axis=0)
    return {
        "mean": jnp.mean(ys, axis=0),
        "var": jnp.var(ys, axis=0, ddof=1),
        "median": jnp.median(ys, axis=0),
        "qlow": ql,
        "qhigh": qh,
    }
