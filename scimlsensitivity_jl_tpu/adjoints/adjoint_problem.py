"""Public reverse-problem constructors (layer L3 surface).

The reference exports `ODEAdjointProblem` / `SDEAdjointProblem` /
`RODEAdjointProblem` / `AdjointSensitivityIntegrand`
(/root/reference/src/SciMLSensitivity.jl:94-97; e.g.
interpolating_adjoint.jl:307, quadrature_adjoint.jl:216-328) so users can
build, inspect, and solve the reverse problem themselves with any solver.
Here the same surface returns an `AdjointProblemSpec`:

    spec = ODEAdjointProblem(sol, InterpolatingAdjoint(), t=ts,
                             dgdu_discrete=dg)
    adj_sol = solve(spec.prob, Tsit5(), callback=spec.callback,
                    tstops=spec.tstops, rtol=..., atol=...)
    du0, dp = spec.extract(adj_sol.u_final)

`spec.prob` is a plain ODEProblem over the augmented reverse state with
REVERSED tspan (t1, t0) — the in-repo solvers integrate backward natively —
and `spec.callback` is an ordinary PresetTimeCallback injecting the discrete
loss cotangents into λ at each data time (the ReverseLossCallback made
user-visible, reference adjoint_common.jl:709-821).

State layouts by sensealg family (matching the sealed custom_vjp rules in
adjoints/continuous.py):

    InterpolatingAdjoint : z = [λ(n); q(npf)], y(t) from sol's interpolant
    QuadratureAdjoint    : z = λ(n) only — integrate dG/dp afterwards with
                           `AdjointSensitivityIntegrand`
    BacksolveAdjoint     : z = [λ(n); q(npf); u(n)], u re-integrated backward
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..callbacks import PresetTimeCallback
from ..ops.interp import dense_eval
from ..ops.vjp import make_vjp_kernels
from ..problems import ODEProblem
from ..sensealg import (BacksolveAdjoint, InterpolatingAdjoint,
                        QuadratureAdjoint)
from ..utils.pytree import ravel_pytree

__all__ = [
    "AdjointProblemSpec",
    "ODEAdjointProblem",
    "SDEAdjointProblem",
    "RODEAdjointProblem",
    "AdjointSensitivityIntegrand",
]


@dataclass
class AdjointProblemSpec:
    """A user-solvable reverse problem: `prob` (reversed tspan), the λ-jump
    `callback` (may be None), the data-time `tstops`, and `extract` mapping
    the reverse solution's final state to (dG/du0, dG/dp) pytrees."""

    prob: ODEProblem
    callback: Optional[Any]
    tstops: jnp.ndarray
    n: int
    npf: int
    extract: Callable
    sensealg: Any


def _cost_jumps(sol, kern, p, ts, dgdu_discrete, n, dtype):
    """λ jumps at data times from the discrete cost derivative."""
    if dgdu_discrete is None:
        return jnp.zeros((ts.shape[0], n), dtype)

    def jump(i):
        ti = ts[i]
        ui = kern.unravel_u(dense_eval(sol.dense, ti))
        return ravel_pytree(dgdu_discrete(ui, p, ti, i))[0]

    return jax.vmap(jump)(jnp.arange(ts.shape[0]))


def ODEAdjointProblem(
    sol,
    sensealg=None,
    t=None,
    dgdu_discrete: Optional[Callable] = None,
    dgdu_continuous: Optional[Callable] = None,
    dgdp_continuous: Optional[Callable] = None,
    g: Optional[Callable] = None,
    callback=None,
) -> AdjointProblemSpec:
    """Build the reversed augmented adjoint problem for an ODE solution
    (reference: interpolating_adjoint.jl:307-451, backsolve_adjoint.jl /
    quadrature_adjoint.jl ODEAdjointProblem).

    sol must carry dense output for the Interpolating/Quadrature designs
    (`solve(..., dense=True)`); Backsolve re-integrates u and only needs
    sol.u_final.

    Mass-matrix problems (incl. singular semi-explicit index-1 DAEs, e.g.
    Robertson): the returned problem carries the block mass matrix
    [Mᵀ 0; 0 I] (reference interpolating_adjoint.jl:413-426) and the loss
    jumps are projected onto the differential adjoint (the
    ReverseLossCallback algebraic projection, adjoint_common.jl:790-817);
    solve it with SDIRK4() and an explicit dt0 like any in-repo DAE.
    Interpolating layout only.

    Event solutions: pass the forward `callback=` (the same object(s)
    given to solve) and the recorded event-jump VJPs are bundled as a
    second PresetTimeCallback at the recorded event times (the reference
    wires these via generate_callbacks, adjoint_common.jl:824-868 +
    callback_tracking.jl). Non-terminal, non-p-modifying events;
    Interpolating/Backsolve layouts.
    """
    sensealg = sensealg if sensealg is not None else InterpolatingAdjoint()
    prob = sol.prob
    p = prob.p
    u0 = prob.u0
    t0, t1 = prob.tspan
    u0vec, unravel_u = ravel_pytree(u0)
    pflat, unravel_p = ravel_pytree(p)
    n, npf = u0vec.shape[0], pflat.shape[0]
    dtype = u0vec.dtype
    # solve() moves a singular mass matrix onto the solver (the problem is
    # remade with mass_matrix=None), so look in both places
    M_fwd = getattr(prob, "mass_matrix", None)
    if M_fwd is None:
        M_fwd = getattr(getattr(sol, "solver", None), "mass_matrix", None)
    if M_fwd is not None and not isinstance(sensealg, InterpolatingAdjoint):
        raise NotImplementedError(
            "ODEAdjointProblem on mass-matrix problems exposes the "
            "InterpolatingAdjoint layout (block [Mᵀ 0; 0 I]); use "
            "adjoint_sensitivities for the other designs"
        )

    has_events = getattr(sol, "events", None) is not None
    if has_events and callback is None:
        raise ValueError(
            "this solution carries event records; pass the forward "
            "callback=... so the reverse event-jump VJPs can be bundled "
            "(reference adjoint_common.jl:824-868)"
        )
    if callback is not None and not has_events:
        raise ValueError(
            "callback= given but the solution carries no event records"
        )
    if has_events and M_fwd is not None:
        raise NotImplementedError(
            "events + mass-matrix DAEs: use adjoint_sensitivities"
        )
    if has_events and isinstance(sensealg, QuadratureAdjoint):
        raise NotImplementedError(
            "QuadratureAdjoint's λ-only layout cannot carry the event "
            "q-jumps; use the Interpolating or Backsolve layout"
        )

    kern = make_vjp_kernels(prob.f, u0, p, user_jac=prob.jac,
                            user_vjp=prob.vjp, user_paramjac=prob.paramjac)

    ts = jnp.asarray(sol.ts if t is None else t, dtype)
    needs_dense = not isinstance(sensealg, BacksolveAdjoint)
    if needs_dense and sol.dense is None:
        raise ValueError(
            "ODEAdjointProblem with an interpolating design needs "
            "solve(..., dense=True)")

    if g is not None:
        if dgdu_continuous is None:
            dgdu_continuous = jax.grad(g, argnums=0)
        if dgdp_continuous is None and npf > 0:
            dgdp_continuous = jax.grad(g, argnums=1)

    def cost_u(yvec, tt):
        if dgdu_continuous is None:
            return jnp.zeros(n, dtype)
        return ravel_pytree(dgdu_continuous(unravel_u(yvec), p, tt))[0]

    def cost_p(yvec, tt):
        if dgdp_continuous is None:
            return jnp.zeros(npf, dtype)
        return ravel_pytree(dgdp_continuous(unravel_u(yvec), p, tt))[0]

    lam_jumps = _cost_jumps(sol, kern, p, ts, dgdu_discrete, n, dtype)

    # Fold jumps at/after the reverse start (t1) into z0 and jumps at the
    # reverse END (t0) into `extract` — preset callbacks fire at interior
    # step ends, not at the integration endpoints. Interior jumps become a
    # PresetTimeCallback (the user-visible ReverseLossCallback).
    at_end = jnp.abs(ts - jnp.asarray(t1, dtype)) <= 1e-12 * max(
        1.0, abs(float(t1)))
    at_start = jnp.abs(ts - jnp.asarray(t0, dtype)) <= 1e-12 * max(
        1.0, abs(float(t0)))
    lam_init = jnp.sum(jnp.where(at_end[:, None], lam_jumps, 0.0), axis=0)
    lam_final = jnp.sum(jnp.where(at_start[:, None], lam_jumps, 0.0), axis=0)
    interior = ~(at_end | at_start)

    def jump_affect(z, p_, tt):
        i = jnp.argmin(jnp.abs(ts - tt))
        return z.at[:n].add(jnp.where(interior[i], 1.0, 0.0) * lam_jumps[i])

    import numpy as _np

    ts_host = _np.asarray(ts, float)
    interior_host = _np.asarray(interior)
    cb_times = ts_host[interior_host] if interior_host.any() else None
    cb = (PresetTimeCallback(ts=cb_times, affect=jump_affect)
          if cb_times is not None and dgdu_discrete is not None else None)

    def _event_callback(u_snap_start=None):
        """Reverse event-jump PresetTimeCallback at the recorded event
        times (newest record first at coincident times), built from the
        forward callback objects + the solution's event records."""
        from ..callbacks import as_callback_set, lower_time_callbacks
        from ..callbacks import build_event_set, any_modifies_p
        from .continuous import _make_event_apply

        cbs_l, _stops = lower_time_callbacks(callback, prob.f, t0, t1)
        cbs_set = as_callback_set(cbs_l)
        if any_modifies_p(cbs_set):
            raise NotImplementedError(
                "parameter-modifying events: the p-lifted layout is not "
                "exposed as a standalone problem — use jax.grad over solve"
            )
        if any(getattr(c, "terminal", False)
               for c in tuple(cbs_set.continuous) + tuple(cbs_set.discrete)):
            raise NotImplementedError(
                "terminal events reverse from the dynamic t_final; use "
                "adjoint_sensitivities / jax.grad over solve"
            )
        ev_ts, ev_upre, ev_idx, ev_count = sol.events
        event_set = build_event_set(cbs_set, p, unravel_u,
                                    int(jnp.asarray(ev_ts).shape[0]))
        # A running cost ∫ g dt gains the moving-boundary term
        # (g⁻ − g⁺)·dτ at each CONTINUOUS event — that needs the cost
        # VALUE, exactly as in adjoint_sensitivities (interface.py).
        run_cost = None
        if g is not None:
            run_cost = lambda yvec, tt: g(unravel_u(yvec), p, tt)
        elif (event_set.n_cont > 0
              and (dgdu_continuous is not None
                   or dgdp_continuous is not None)):
            raise NotImplementedError(
                "continuous cost + continuous-event solutions: pass g= "
                "(not just dgdu_continuous/dgdp_continuous) — the "
                "moving-boundary term (g⁻ − g⁺)·dτ/d(·) at each event "
                "time needs the cost VALUE"
            )
        apply = _make_event_apply(kern, p, event_set, sol.events, n, npf,
                                  q_slice=n, u_snap_start=u_snap_start,
                                  run_cost=run_cost)
        k_ev = int(ev_count)  # eager constructor (matches ts handling)
        if k_ev == 0:
            return None, _np.zeros(0)
        ev_ts_host = _np.asarray(ev_ts, float)[:k_ev]
        span = max(abs(float(t1)), abs(float(t0)), 1.0)
        if _np.any(_np.abs(ev_ts_host - float(t0)) <= 1e-10 * span) or \
                _np.any(_np.abs(ev_ts_host - float(t1)) <= 1e-10 * span):
            raise NotImplementedError(
                "events at the integration endpoints: use jax.grad over "
                "solve (endpoint jumps fold into z0/extract there)"
            )

        # Group records by preset stop EAGERLY (exact float equality — the
        # stop list below is built from the same host array), so each
        # record is applied exactly once and the compiled affect is
        # O(k_ev) VJP blocks total (one lax.switch branch per unique
        # time), not O(k_ev²) threshold-matched conds. Nearest-stop
        # argmin matching cannot double-apply records whose times differ
        # by less than any tolerance.
        uniq_host = _np.unique(ev_ts_host)
        groups = [tuple(int(i)
                        for i in _np.nonzero(ev_ts_host == tu)[0])
                  for tu in uniq_host]
        uniq_dev = jnp.asarray(uniq_host, ts.dtype)

        def _branch(idxs):
            def run(zz, tt):
                for i in reversed(idxs):  # reverse firing order
                    zz = apply(jnp.asarray(i), tt, zz, None)[0]
                return zz
            return run

        branches = [_branch(g_) for g_ in groups]

        def event_affect(z, p_, tt):
            iu = jnp.argmin(jnp.abs(uniq_dev - jnp.asarray(tt, ts.dtype)))
            return jax.lax.switch(iu, branches, z, tt)

        return (PresetTimeCallback(ts=uniq_host, affect=event_affect),
                uniq_host)

    if isinstance(sensealg, QuadratureAdjoint):
        def aug_f(z, p_, tt):
            y = dense_eval(sol.dense, tt)
            return -kern.vjp_u(y, p_, tt, z) - cost_u(y, tt)

        z0 = lam_init
        adj_prob = ODEProblem(aug_f, z0, (t1, t0), p)

        def extract(z):
            return unravel_u(z + lam_final), unravel_p(jnp.zeros(npf, dtype))

        note = ("QuadratureAdjoint: λ(t0) = dG/du0; integrate "
                "AdjointSensitivityIntegrand for dG/dp")
    elif isinstance(sensealg, BacksolveAdjoint):
        def aug_f(z, p_, tt):
            lam, u_cur = z[:n], z[n + npf:]
            fval, ubar, pbar = kern.f_and_vjp(u_cur, p_, tt, lam)
            return jnp.concatenate([
                -ubar - cost_u(u_cur, tt),
                -ravel_pytree(pbar)[0] - cost_p(u_cur, tt),
                fval,
            ])

        u_end = ravel_pytree(sol.u_final)[0]
        z0 = jnp.concatenate([lam_init, jnp.zeros(npf, dtype), u_end])
        adj_prob = ODEProblem(aug_f, z0, (t1, t0), p)

        def extract(z):
            return unravel_u(z[:n] + lam_final), unravel_p(z[n:n + npf])

        note = "BacksolveAdjoint: z = [λ; q; u]"
    elif M_fwd is not None:
        # InterpolatingAdjoint on a mass-matrix problem: the reverse DAE
        #     Mᵀ λ' = −Jᵀλ − ∂g/∂u,   q' = −f_pᵀλ − ∂g/∂p
        # returned with the block mass matrix [Mᵀ 0; 0 I] (reference
        # interpolating_adjoint.jl:413-426); discrete loss cotangents are
        # PROJECTED onto the differential adjoint (ReverseLossCallback
        # algebraic projection, adjoint_common.jl:790-817), and
        # dG/du0 = Mᵀλ(t0).
        from .continuous import _dae_project_jumps

        _, du0_map, lamjs, qjs = _dae_project_jumps(
            jnp.asarray(M_fwd, dtype), kern, p, sol.dense, ts, lam_jumps,
            dtype)
        lam_init_d = jnp.sum(jnp.where(at_end[:, None], lamjs, 0.0), axis=0)
        q_init_d = jnp.sum(jnp.where(at_end[:, None], qjs, 0.0), axis=0)
        lam_final_d = jnp.sum(jnp.where(at_start[:, None], lamjs, 0.0),
                              axis=0)
        q_final_d = jnp.sum(jnp.where(at_start[:, None], qjs, 0.0), axis=0)

        def dae_jump_affect(z, p_, tt):
            i = jnp.argmin(jnp.abs(ts - tt))
            w = jnp.where(interior[i], 1.0, 0.0)
            z = z.at[:n].add(w * lamjs[i])
            return z.at[n:n + npf].add(w * qjs[i])

        cb = (PresetTimeCallback(ts=cb_times, affect=dae_jump_affect)
              if cb_times is not None and dgdu_discrete is not None
              else None)

        def aug_f(z, p_, tt):
            # constraint rows enforced by the user's stiffly-accurate
            # mass-matrix stages (solve with SDIRK4 + explicit dt0)
            lam = z[:n]
            y = dense_eval(sol.dense, tt)
            _, ubar, pbar = kern.f_and_vjp(y, p_, tt, lam)
            return jnp.concatenate([
                -ubar - cost_u(y, tt),
                -ravel_pytree(pbar)[0] - cost_p(y, tt),
            ])

        M_aug = _np.eye(n + npf)
        M_aug[:n, :n] = _np.asarray(M_fwd, float).T
        z0 = jnp.concatenate([lam_init_d, q_init_d])
        adj_prob = ODEProblem(aug_f, z0, (t1, t0), p,
                              mass_matrix=jnp.asarray(M_aug, dtype))

        def extract(z):
            # dL/du0 = Mᵀλ(t0) — the same convention as the sealed rule
            return (unravel_u(du0_map(z[:n] + lam_final_d)),
                    unravel_p(z[n:n + npf] + q_final_d))

        note = ("InterpolatingAdjoint DAE: z = [λ; q], mass [Mᵀ 0; 0 I] — "
                "solve with SDIRK4() and an explicit dt0; "
                "dG/du0 = Mᵀλ(t0) (algebraic rows 0 by convention)")
    else:  # InterpolatingAdjoint (default) — joined [λ; q]
        def aug_f(z, p_, tt):
            lam = z[:n]
            y = dense_eval(sol.dense, tt)
            _, ubar, pbar = kern.f_and_vjp(y, p_, tt, lam)
            return jnp.concatenate([
                -ubar - cost_u(y, tt),
                -ravel_pytree(pbar)[0] - cost_p(y, tt),
            ])

        z0 = jnp.concatenate([lam_init, jnp.zeros(npf, dtype)])
        adj_prob = ODEProblem(aug_f, z0, (t1, t0), p)

        def extract(z):
            return unravel_u(z[:n] + lam_final), unravel_p(z[n:n + npf])

        note = "InterpolatingAdjoint: z = [λ; q]"

    ev_cb, ev_times = (None, _np.zeros(0))
    if has_events:
        ev_cb, ev_times = _event_callback(
            u_snap_start=(n + npf) if isinstance(sensealg, BacksolveAdjoint)
            else None)

    cbs_out = tuple(c for c in (cb, ev_cb) if c is not None)
    cb_out = (None if not cbs_out
              else cbs_out[0] if len(cbs_out) == 1 else list(cbs_out))
    tstops_out = _np.union1d(
        ts_host[interior_host] if interior_host.any() else _np.zeros(0),
        _np.asarray(ev_times, float))

    spec = AdjointProblemSpec(
        prob=adj_prob, callback=cb_out,
        tstops=tstops_out,
        n=n, npf=npf, extract=extract, sensealg=sensealg,
    )
    spec.note = note
    return spec


def AdjointSensitivityIntegrand(sol, adj_sol, sensealg=None):
    """ρ(t) = λ(t)ᵀ ∂f/∂p as a callable over forward time — the exported
    integrand object of QuadratureAdjoint (reference:
    quadrature_adjoint.jl:216-328, integrand evaluation :486-508). Integrate
    it over [t0, t1] (any scheme) to get dG/dp as a flat vector.

    adj_sol: the solution of `ODEAdjointProblem(sol, QuadratureAdjoint())`'s
    problem, solved with dense=True."""
    prob = sol.prob
    p = prob.p
    u0vec, unravel_u = ravel_pytree(prob.u0)
    if sol.dense is None or adj_sol.dense is None:
        raise ValueError("AdjointSensitivityIntegrand needs dense=True on "
                         "both the forward and adjoint solutions")
    kern = make_vjp_kernels(prob.f, prob.u0, p, user_jac=prob.jac,
                            user_vjp=prob.vjp, user_paramjac=prob.paramjac)

    def rho(t):
        y = dense_eval(sol.dense, t)
        lam = dense_eval(adj_sol.dense, t)
        return ravel_pytree(kern.vjp_p(y, p, t, lam))[0]

    return rho


def _fixed_grid_meta(sol, kind):
    """(t0, t1, dt, n_steps, key) from a fixed-grid SDE/RODE solution."""
    sa = getattr(sol, "solve_args", None)
    if sa is None or sa.get("kind") != kind:
        raise NotImplementedError(
            f"{'SDE' if kind == 'sde' else 'RODE'}AdjointProblem needs a "
            f"FIXED-GRID solution from this package's solve() (adaptive "
            f"solutions: use adjoint_sensitivities, which replays the "
            f"realized grid exactly)"
        )
    t0, t1 = sol.prob.tspan
    dt = sa["dt"]
    n_steps = int(round((float(t1) - float(t0)) / float(dt)))
    return float(t0), float(t1), float(dt), n_steps, sa["key"]


def _forward_noise_nodes(prob, key, n_steps, dt, w_shape, dtype):
    """W at the forward grid nodes — regenerated from the counter-based
    stream (never stored by the solver), or read from the user's
    noise_process (the reference instead deepcopies + reverses the recorded
    NoiseProcess, backsolve_adjoint.jl:395-411)."""
    from ..ops.brownian import NoiseGrid, grid_path

    t0 = float(prob.tspan[0])
    src = getattr(prob, "noise_process", None)
    if src is None:
        return grid_path(key, n_steps, w_shape, dt).astype(dtype)
    if isinstance(src, NoiseGrid):
        return jnp.asarray(src.W, dtype)
    if callable(src):
        nodes = t0 + dt * jnp.arange(n_steps + 1)
        return jax.vmap(
            lambda t: jnp.broadcast_to(jnp.asarray(src(t)),
                                       w_shape).astype(dtype)
        )(nodes)
    raise TypeError(f"noise_process: NoiseGrid or callable, got {src!r}")


def _sde_data_jumps(sol, t, dgdu_discrete, p, n, dtype):
    """λ jump rows at the solution's save times (SDE/RODE solutions carry
    no dense output — cotangents anchor to the stored save nodes)."""
    if dgdu_discrete is None:
        raise ValueError(
            "SDE/RODE adjoint problems need dgdu_discrete (continuous "
            "costs on SDE paths: put a running cost in an augmented "
            "quadrature state instead)"
        )
    ts = sol.ts if t is None else jnp.asarray(t)
    import numpy as _np

    if not _np.allclose(_np.asarray(ts, float), _np.asarray(sol.ts, float)):
        raise ValueError(
            "t= must equal the solution's save times (cotangent rows "
            "anchor to sol.ys); re-solve with saveat=t"
        )

    def jump(i):
        ui = jax.tree_util.tree_map(lambda a: a[i], sol.ys)
        return ravel_pytree(dgdu_discrete(ui, p, ts[i], i))[0]

    return jnp.asarray(ts, dtype), jax.vmap(jump)(jnp.arange(ts.shape[0]))


def _reverse_jump_plumbing(ts, lam_jumps, t0, t1, n, dtype):
    """Split data-time jumps into (z0 seed at t1, extract-time fold at t0,
    interior PresetTimeCallback in reversed τ time) — shared by the
    SDE/RODE constructors. τ = t0 + t1 − t_phys."""
    import numpy as _np

    at_end = jnp.abs(ts - t1) <= 1e-12 * max(1.0, abs(t1))
    at_start = jnp.abs(ts - t0) <= 1e-12 * max(1.0, abs(t0))
    lam_init = jnp.sum(jnp.where(at_end[:, None], lam_jumps, 0.0), axis=0)
    lam_final = jnp.sum(jnp.where(at_start[:, None], lam_jumps, 0.0), axis=0)
    interior = ~(at_end | at_start)
    tau_ts = (t0 + t1) - ts

    def jump_affect(z, p_, tau):
        i = jnp.argmin(jnp.abs(tau_ts - tau))
        return z.at[:n].add(jnp.where(interior[i], 1.0, 0.0) * lam_jumps[i])

    interior_host = _np.asarray(interior)
    cb_times = _np.asarray(tau_ts, float)[interior_host]
    cb = (PresetTimeCallback(ts=cb_times, affect=jump_affect)
          if interior_host.any() else None)
    return lam_init, lam_final, cb, cb_times


def SDEAdjointProblem(
    sol,
    sensealg=None,
    t=None,
    dgdu_discrete: Optional[Callable] = None,
) -> AdjointProblemSpec:
    """Build the user-solvable continuous reverse SDE for a fixed-grid SDE
    solution (reference: SDEAdjointProblem, backsolve_adjoint.jl:274-419 /
    interpolating_adjoint.jl:453-613).

    The reverse problem is the time-flipped STRATONOVICH augmented system in
    τ = t0 + t1 − t, driven by the forward Brownian path read backwards
    (a NoiseGrid over the τ grid — the counter-based stream regenerates the
    path functionally; the reference deepcopies + reverses the recorded
    NoiseProcess). With T = t0 + t1 and W̃(τ) = W(T − τ):

        BacksolveAdjoint     z = [λ; q; u]:
            dz/dτ = [+(∂f̃/∂u)ᵀλ; +(∂f̃/∂p)ᵀλ; −f̃] dτ
                    + Σ_j [−(∂g_j/∂u)ᵀλ; −(∂g_j/∂p)ᵀλ; +g_j] ∘dW̃_j
            (noise signs from the discrete time flip ΔW̃_j = −ΔW_{N−1−j})
        InterpolatingAdjoint z = [λ; q], u(T−τ) interpolated from sol.ys
            (save densely — saveat on the solve grid — for accuracy)

    where f̃ is the Stratonovich drift (Ito problems get the −½(∂g/∂u)g
    correction). Solve spec.prob with EulerHeun() on the SAME dt; the
    returned problem carries the reversed NoiseGrid as noise_process.

    NOTE this is the reference's continuous formulation, exported for
    inspection/composition parity: it RE-DISCRETIZES the reverse flow, so
    its gradients match `adjoint_sensitivities` / `jax.grad(solve)` (exact
    discrete adjoints over the same path) only as dt → 0. Discrete costs
    only (dgdu_discrete), matching the direct-API SDE scope."""
    from ..problems import SDEProblem
    from ..ops.brownian import NoiseGrid
    from ..solvers.sde import ito_to_stratonovich_drift

    sensealg = sensealg if sensealg is not None else BacksolveAdjoint()
    if getattr(sol, "events", None) is not None:
        raise NotImplementedError(
            "SDEAdjointProblem on event solutions: use jax.grad over solve"
        )
    prob = sol.prob
    if not isinstance(prob, SDEProblem):
        raise TypeError(f"SDEAdjointProblem needs an SDEProblem solution, "
                        f"got {type(prob).__name__}")
    t0, t1, dt, n_steps, key = _fixed_grid_meta(sol, "sde")
    p = prob.p
    u0vec, unravel_u = ravel_pytree(prob.u0)
    pflat, unravel_p = ravel_pytree(p)
    n, npf = u0vec.shape[0], pflat.shape[0]
    dtype = u0vec.dtype

    if prob.noise == "general":
        m = prob.noise_dim
        w_shape = (m,)
    elif prob.noise == "scalar":
        m = 1
        w_shape = ()
    else:
        m = n
        w_shape = (n,)

    # flat fields + Stratonovich drift (time-reversal is a pathwise change
    # of variables only in Stratonovich calculus)
    def fvec(uv, tt):
        return ravel_pytree(prob.f(unravel_u(uv), p, tt))[0]

    if prob.noise == "general":
        def gvec(uv, tt):
            return jnp.asarray(prob.g(unravel_u(uv), p, tt))
    else:
        def gvec(uv, tt):
            return ravel_pytree(prob.g(unravel_u(uv), p, tt))[0]

    f_strat = (ito_to_stratonovich_drift(fvec, gvec)
               if prob.interpretation == "ito" else fvec)

    # reversed driving path on the τ grid
    W_fwd = _forward_noise_nodes(prob, key, n_steps, dt, w_shape, dtype)
    W_rev = W_fwd[::-1]
    if prob.noise == "scalar":
        W_rev = W_rev[:, None]
    tau_nodes = t0 + dt * jnp.arange(n_steps + 1)
    noise_rev = NoiseGrid(ts=tau_nodes, W=W_rev)

    ts, lam_jumps = _sde_data_jumps(sol, t, dgdu_discrete, p, n, dtype)
    lam_init, lam_final, cb, cb_times = _reverse_jump_plumbing(
        ts, lam_jumps, t0, t1, n, dtype)

    def _drift_pullback(uv, tt, lam):
        """((∂f̃/∂u)ᵀλ, (∂f̃/∂p)ᵀλ) at the physical time tt."""
        def f_of(uu, pp):
            fv = ravel_pytree(prob.f(unravel_u(uu), pp, tt))[0]
            if prob.interpretation != "ito":
                return fv
            # Stratonovich correction differentiated too
            if prob.noise == "general":
                gv = jnp.asarray(prob.g(unravel_u(uu), pp, tt))

                def col(j):
                    return jax.jvp(
                        lambda x: jnp.asarray(
                            prob.g(unravel_u(x), pp, tt))[:, j],
                        (uu,), (gv[:, j],))[1]

                corr = 0.5 * jnp.sum(jax.vmap(col)(jnp.arange(m)), axis=0)
            else:
                gv = ravel_pytree(prob.g(unravel_u(uu), pp, tt))[0]
                corr = 0.5 * jax.jvp(
                    lambda x: ravel_pytree(prob.g(unravel_u(x), pp, tt))[0],
                    (uu,), (gv,))[1]
            return fv - corr

        _, pull = jax.vjp(f_of, uv, p)
        ub, pb = pull(lam)
        return ub, ravel_pytree(pb)[0]

    def _noise_pullback(uv, tt, lam):
        """Columns j: ((∂g_j/∂u)ᵀλ, (∂g_j/∂p)ᵀλ) — one batched vjp."""
        def g_of(uu, pp):
            if prob.noise == "general":
                return jnp.asarray(prob.g(unravel_u(uu), pp, tt))
            return ravel_pytree(prob.g(unravel_u(uu), pp, tt))[0]

        _, pull = jax.vjp(g_of, uv, p)
        if prob.noise == "general":
            cots = jax.vmap(
                lambda j: lam[:, None] * (jnp.arange(m) == j)[None, :]
            )(jnp.arange(m))
        elif prob.noise == "scalar":
            cots = lam[None, :]
        else:  # diagonal: g_j = g(u)_j e_j → cotangent row j is λ_j e_j
            cots = jnp.eye(n, dtype=dtype) * lam[None, :]

        def one(c):
            ub, pb = pull(c)
            return ub, ravel_pytree(pb)[0]

        return jax.vmap(one)(cots)  # ((m, n), (m, npf))

    def _g_cols(uv, tt):
        """Full noise matrix columns g_j(u) as (m, n)."""
        if prob.noise == "general":
            return jnp.asarray(gvec(uv, tt)).T
        if prob.noise == "scalar":
            return gvec(uv, tt)[None, :]
        return jnp.eye(n, dtype=dtype) * gvec(uv, tt)[None, :]

    T = t0 + t1
    if isinstance(sensealg, BacksolveAdjoint):
        def aug_f(z, p_, tau):
            tt = T - tau
            lam, u_cur = z[:n], z[n + npf:]
            ub, pb = _drift_pullback(u_cur, tt, lam)
            return jnp.concatenate([ub, pb, -f_strat(u_cur, tt)])

        def aug_g(z, p_, tau):
            # signs from the discrete time-flip (ΔW̃_j = −ΔW_{N−1−j}):
            # Δũ = −f̃Δτ + g·ΔW̃ ; Δλ̃ = +JᵀλΔτ − (∂g/∂u)ᵀλ·ΔW̃ ;
            # Δq̃ = +(∂f̃/∂p)ᵀλΔτ − (∂g/∂p)ᵀλ·ΔW̃
            tt = T - tau
            lam, u_cur = z[:n], z[n + npf:]
            gu, gp = _noise_pullback(u_cur, tt, lam)
            cols = jnp.concatenate(
                [-gu, -gp, _g_cols(u_cur, tt)], axis=1)  # (m, N_aug)
            return cols.T  # (N_aug, m)

        u_end = ravel_pytree(
            jax.tree_util.tree_map(lambda a: a[-1], sol.ys))[0]
        z0 = jnp.concatenate([lam_init, jnp.zeros(npf, dtype), u_end])
        note = "BacksolveAdjoint: z = [λ; q; u], u re-integrated backward"
    elif isinstance(sensealg, InterpolatingAdjoint):
        ys_flat = jax.vmap(lambda i: ravel_pytree(
            jax.tree_util.tree_map(lambda a: a[i], sol.ys))[0]
        )(jnp.arange(jnp.asarray(sol.ts).shape[0]))
        ts_sol = jnp.asarray(sol.ts, dtype)

        def u_of(tt):
            return jax.vmap(
                lambda col: jnp.interp(tt, ts_sol, col))(ys_flat.T)

        def aug_f(z, p_, tau):
            tt = T - tau
            lam = z[:n]
            ub, pb = _drift_pullback(u_of(tt), tt, lam)
            return jnp.concatenate([ub, pb])

        def aug_g(z, p_, tau):
            tt = T - tau
            lam = z[:n]
            gu, gp = _noise_pullback(u_of(tt), tt, lam)
            return jnp.concatenate([-gu, -gp], axis=1).T

        z0 = jnp.concatenate([lam_init, jnp.zeros(npf, dtype)])
        note = ("InterpolatingAdjoint: z = [λ; q], u(t) interpolated from "
                "sol.ys — save densely for accuracy")
    else:
        raise NotImplementedError(
            f"SDEAdjointProblem supports BacksolveAdjoint/"
            f"InterpolatingAdjoint layouts, got {sensealg!r}"
        )

    adj_prob = SDEProblem(
        aug_f, aug_g, z0, (t0, t1), p, noise="general",
        interpretation="stratonovich", noise_dim=m, noise_process=noise_rev,
    )

    def extract(z):
        return unravel_u(z[:n] + lam_final), unravel_p(z[n:n + npf])

    spec = AdjointProblemSpec(
        prob=adj_prob, callback=cb, tstops=cb_times, n=n, npf=npf,
        extract=extract, sensealg=sensealg,
    )
    spec.note = note + "; solve with EulerHeun() on the same dt"
    spec.dt = dt
    return spec


def RODEAdjointProblem(
    sol,
    sensealg=None,
    t=None,
    dgdu_discrete: Optional[Callable] = None,
) -> AdjointProblemSpec:
    """Reverse problem for a fixed-grid RODE solution (reference:
    RODEAdjointProblem, interpolating_adjoint.jl:615-746). The RODE adjoint
    is a pathwise ODE driven by the SAME Wiener path:

        dλ/dτ = +(∂f/∂u)ᵀλ,  dq/dτ = +(∂f/∂p)ᵀλ   (τ = t0 + t1 − t)

    returned as a plain ODEProblem whose RHS reads W̃(τ) = W(T−τ) from the
    regenerated forward path (linearly interpolated between the grid nodes
    — the same path lift RandomEM samples), so ANY in-repo ODE solver,
    callback, and tstops work on it. InterpolatingAdjoint (default)
    interpolates u from sol.ys; BacksolveAdjoint appends −f rows and
    re-integrates u backward. Solve spec.prob with a fixed grid near
    spec.dt (the RHS is only as smooth as the Brownian path); gradients
    match the discrete adjoint as dt → 0."""
    from ..problems import RODEProblem

    sensealg = sensealg if sensealg is not None else InterpolatingAdjoint()
    prob = sol.prob
    if not isinstance(prob, RODEProblem):
        raise TypeError(f"RODEAdjointProblem needs an RODEProblem solution, "
                        f"got {type(prob).__name__}")
    t0, t1, dt, n_steps, key = _fixed_grid_meta(sol, "rode")
    p = prob.p
    u0vec, unravel_u = ravel_pytree(prob.u0)
    pflat, unravel_p = ravel_pytree(p)
    n, npf = u0vec.shape[0], pflat.shape[0]
    dtype = u0vec.dtype
    w_shape = (prob.noise_dim,) if prob.noise_dim else (n,)

    W_fwd = _forward_noise_nodes(prob, key, n_steps, dt, w_shape, dtype)
    if W_fwd.ndim == 1:
        W_fwd = W_fwd[:, None]
    fwd_nodes = t0 + dt * jnp.arange(n_steps + 1)

    def W_of(tt):
        """Forward path at physical time tt, linearly interpolated."""
        w = jax.vmap(lambda col: jnp.interp(tt, fwd_nodes, col))(W_fwd.T)
        return w.reshape(w_shape)

    ts, lam_jumps = _sde_data_jumps(sol, t, dgdu_discrete, p, n, dtype)
    lam_init, lam_final, cb, cb_times = _reverse_jump_plumbing(
        ts, lam_jumps, t0, t1, n, dtype)

    T = t0 + t1

    def _pullback(uv, tt, wv, lam):
        def f_of(uu, pp):
            return ravel_pytree(prob.f(unravel_u(uu), pp, tt, wv))[0]

        _, pull = jax.vjp(f_of, uv, p)
        ub, pb = pull(lam)
        return ub, ravel_pytree(pb)[0]

    if isinstance(sensealg, BacksolveAdjoint):
        def aug_f(z, p_, tau):
            tt = T - tau
            wv = W_of(tt)
            lam, u_cur = z[:n], z[n + npf:]
            ub, pb = _pullback(u_cur, tt, wv, lam)
            fv = ravel_pytree(prob.f(unravel_u(u_cur), p_, tt, wv))[0]
            return jnp.concatenate([ub, pb, -fv])

        u_end = ravel_pytree(
            jax.tree_util.tree_map(lambda a: a[-1], sol.ys))[0]
        z0 = jnp.concatenate([lam_init, jnp.zeros(npf, dtype), u_end])
        note = "BacksolveAdjoint: z = [λ; q; u]"
    else:
        ys_flat = jax.vmap(lambda i: ravel_pytree(
            jax.tree_util.tree_map(lambda a: a[i], sol.ys))[0]
        )(jnp.arange(jnp.asarray(sol.ts).shape[0]))
        ts_sol = jnp.asarray(sol.ts, dtype)

        def u_of(tt):
            return jax.vmap(
                lambda col: jnp.interp(tt, ts_sol, col))(ys_flat.T)

        def aug_f(z, p_, tau):
            tt = T - tau
            lam = z[:n]
            ub, pb = _pullback(u_of(tt), tt, W_of(tt), lam)
            return jnp.concatenate([ub, pb])

        z0 = jnp.concatenate([lam_init, jnp.zeros(npf, dtype)])
        note = ("InterpolatingAdjoint: z = [λ; q], u(t) interpolated from "
                "sol.ys — save densely for accuracy")

    adj_prob = ODEProblem(aug_f, z0, (t0, t1), p)

    def extract(z):
        return unravel_u(z[:n] + lam_final), unravel_p(z[n:n + npf])

    spec = AdjointProblemSpec(
        prob=adj_prob, callback=cb, tstops=cb_times, n=n, npf=npf,
        extract=extract, sensealg=sensealg,
    )
    spec.note = note + (f"; an ODEProblem over τ = t0+t1−t reading the "
                        f"replayed path — solve on a fixed grid near "
                        f"dt={dt} (the RHS is Brownian-rough)")
    spec.dt = dt
    return spec
