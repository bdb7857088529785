"""Solution objects.

ODESolution mirrors the behavior surface of SciMLBase's solution type as the
reference uses it: indexing `sol.ys`, save times `sol.ts`, dense continuous
evaluation `sol(t)` (required by every interpolating adjoint — reference:
src/interpolating_adjoint.jl:190-243), `stats`, and `retcode`. Registered as
a pytree so solutions pass through jit/vmap/grad boundaries.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from .ops.interp import DenseOutput, dense_eval, dense_eval_many
from .solvers.integrate import Stats

__all__ = ["ODESolution", "RETCODE_NAMES"]

RETCODE_NAMES = {0: "Success", 1: "MaxIters", 2: "DtLessThanMin",
                 3: "DDELagViolation", 4: "EventRecordOverflow",
                 5: "Terminated"}


@dataclass
class ODESolution:
    """Result of `solve`.

    ts: (nt,) save times.
    ys: pytree like the state with a leading time axis (nt, ...).
    dense: DenseOutput over flat states, or None if not stored.
    prob / solver / sensealg: what produced this (static).
    """

    ts: jnp.ndarray
    ys: Any
    stats: Stats
    retcode: jnp.ndarray
    prob: Any = None
    solver: Any = None
    sensealg: Any = None
    dense: Optional[DenseOutput] = None
    unravel_u: Optional[Callable] = None
    u_final: Optional[jnp.ndarray] = None  # flat state at t1
    events: Any = None  # (ev_ts, ev_upre, ev_idx, ev_count) when callbacks on
    t_final: Optional[jnp.ndarray] = None  # realized final time (< t1 iff
    #                                        Terminated by a terminal event)
    solve_args: Any = None  # SDE/RODE replay kwargs (dt, key, ...): the
    #                         direct API re-solves over the SAME noise

    @property
    def success(self):
        """True for Success AND Terminated (a deliberate terminal-callback
        stop is a successful outcome, as in the reference's
        `SciMLBase.successful_retcode`)."""
        return (self.retcode == 0) | (self.retcode == 5)

    @property
    def t(self):
        """Reference-style alias for the save times (`sol.t`)."""
        return self.ts

    @property
    def u(self):
        """Reference-style alias for the saved states (`sol.u`)."""
        return self.ys

    def __call__(self, t):
        """Continuous dense evaluation u(t); vectorizes over 1-D t."""
        if self.dense is None:
            raise ValueError(
                "solve was called without dense=True; no continuous output stored"
            )
        t = jnp.asarray(t)
        if t.ndim == 0:
            return self.unravel_u(dense_eval(self.dense, t))
        flat = dense_eval_many(self.dense, t)
        return jax.vmap(self.unravel_u)(flat)

    def __len__(self):
        return int(self.ts.shape[0])


jax.tree_util.register_dataclass(
    ODESolution,
    data_fields=["ts", "ys", "stats", "retcode", "prob", "dense", "u_final",
                 "events", "t_final", "solve_args"],
    meta_fields=["solver", "sensealg", "unravel_u"],
)
