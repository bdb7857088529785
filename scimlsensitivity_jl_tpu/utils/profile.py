"""Profiling/observability helpers (SURVEY §5 aux: the reference has no
in-package tracing — on TPU the native tool is `jax.profiler`; this module
wraps it into the two idioms that matter for solver work)."""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "timed", "solve_stats"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sml_trace"):
    """Capture a jax.profiler trace of the enclosed block (view with
    TensorBoard or Perfetto):

        with sml.utils.profile.trace("/tmp/tr"):
            jax.block_until_ready(grad_fn(p))
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "block"):
    """Wall-time the enclosed block (blocks on async dispatch only if the
    caller does — wrap the result in jax.block_until_ready)."""
    t0 = time.perf_counter()
    out = {"label": label, "seconds": None}
    try:
        yield out
    finally:
        out["seconds"] = time.perf_counter() - t0
        print(f"[{label}] {out['seconds'] * 1e3:.3f} ms", flush=True)


def solve_stats(sol):
    """Human-readable summary of a solution's work counters."""
    s = sol.stats
    return {
        "retcode": int(sol.retcode),
        "n_accepted": int(s.n_accepted),
        "n_rejected": int(s.n_rejected),
        "n_fevals": int(s.n_fevals),
        "solver": sol.solver,
        "sensealg": repr(sol.sensealg),
    }
