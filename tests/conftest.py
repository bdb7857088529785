"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip sharding is validated on host-platform virtual devices (the role
`addprocs(2)` plays in the reference's distributed test,
test/Core4/distributed.jl:15-52); float64 gives the gradient oracle precision
the reference tests assume (rtol 1e-8..1e-3 cross-validation).

Note: the environment's sitecustomize imports jax and pins
JAX_PLATFORMS=axon (the TPU tunnel) before pytest starts, so env vars are
too late here — use jax.config.update, which works post-import as long as
no backend has been initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The full suite makes ~120 compilation-heavy tests in one process; the
    XLA CPU compiler deterministically segfaults near the end of the run
    under the accumulated state (reproduced at tests/test_solve.py when run
    after everything else; any subset of modules passes). Dropping the
    executable/tracing caches at module boundaries keeps compiler state
    bounded. Costs nothing across modules (different programs anyway)."""
    yield
    jax.clear_caches()
