"""QA checks — the Aqua.jl analogue (reference test/QA/aqua.jl): public API
integrity, __all__ consistency, retcode/verbose plumbing."""

import jax
import jax.numpy as jnp

import scimlsensitivity_jl_tpu as sml


def test_all_exports_resolve():
    for name in sml.__all__:
        assert hasattr(sml, name), name


def test_no_duplicate_exports():
    assert len(sml.__all__) == len(set(sml.__all__))


def test_core_callables():
    # the main public entry points are callable
    for name in ["solve", "adjoint_sensitivities", "solve_nonlinear",
                 "shadow_forward", "shadow_adjoint",
                 "second_order_sensitivities", "solve_ensemble"]:
        assert callable(getattr(sml, name)), name


def test_verbose_retcode_notice(capfd):
    prob = sml.ODEProblem(lambda u, p, t: u * u, jnp.array([1.0]),
                          (0.0, 2.0), None)  # finite-time blowup
    sol = sml.solve(prob, sml.Tsit5(), max_steps=64, verbose=True,
                    sensealg=sml.GaussAdjoint())
    jax.block_until_ready(sol.ys)
    jax.effects_barrier()
    out = capfd.readouterr()
    assert "retcode" in out.out or "retcode" in out.err
    assert int(sol.retcode) != 0
