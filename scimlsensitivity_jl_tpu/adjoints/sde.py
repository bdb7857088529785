"""SDE solve + adjoints (reference: src/backsolve_adjoint.jl SDE path
:274-419, src/interpolating_adjoint.jl SDE path :453-613).

Design (TPU-first, deliberately different from the reference's
NoiseProcess-reversal):

  * fixed-grid `lax.scan` forward (the reference pins SDE reverse passes to
    the forward grid via tstops anyway, sensitivity_interface.jl:478-491);
  * counter-based noise regenerated per step index — forward and reverse see
    bit-identical ΔW with no stored path (replaces deepcopy+reverse of sol.W,
    backsolve_adjoint.jl:395-411);
  * adjoints are *discrete* adjoints of the realized scheme:
      - DirectAdjoint / default: reverse AD through the scan (exact, O(N) mem)
      - InterpolatingAdjoint: hand-rolled reverse scan over the stored node
        trajectory (exact discrete adjoint, one fused jax.vjp of the step map
        per reverse step)
      - BacksolveAdjoint: O(1)-memory — states reconstructed by integrating
        the scheme backwards, checkpoint-snapped to saved values at each save
        node (the stability device of backsolve_adjoint.jl:523-572); the λ/q
        updates are the same step-map vjp evaluated at reconstructed states.
    Discrete adjoints sidestep the reference's Ito->Stratonovich adjoint
    transformation entirely; the calculus conversion only enters in solver
    selection for the forward pass (sde_tools.jl semantics, provided by
    solvers/sde.py drift transforms).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.brownian import grid_increment, grid_iterated
from ..problems import SDEProblem
from ..sensealg import (
    BacksolveAdjoint,
    DirectAdjoint,
    InterpolatingAdjoint,
)
from ..solution import ODESolution
from ..solvers.integrate import Stats
from ..solvers.sde import (
    AdaptiveEM,
    EulerHeun,
    EulerMaruyama,
    ito_to_stratonovich_drift,
    stratonovich_to_ito_drift,
)
from ..utils.pytree import ravel_pytree

__all__ = ["solve_sde", "solve_rode"]



def _grid_save_steps(saveat, t0, t1, n_steps, dt_a, kind):
    """Map save times to fixed-grid node indices. Validated eagerly (must
    lie on the dt grid); under an outer jit the saveat is a tracer, so
    misaligned times cannot raise — they are flagged instead and the caller
    NaN-poisons those save rows (fail-loudly, matching the DDE lag check;
    silently snapping to the nearest node would return values at shifted
    times with no signal).

    Returns (save_steps, bad_mask_or_None)."""
    import numpy as _np

    try:
        steps_f = (_np.asarray(saveat) - t0) / float((t1 - t0) / n_steps)
        save_steps_np = _np.rint(steps_f).astype(int)
        if not _np.allclose(steps_f, save_steps_np, atol=1e-8):
            raise ValueError(
                f"{kind} saveat times must lie on the dt grid; got offsets "
                f"{steps_f}"
            )
        return jnp.asarray(save_steps_np), None
    except jax.errors.TracerArrayConversionError:
        steps_f = (saveat - t0) / dt_a
        steps = jnp.clip(jnp.rint(steps_f).astype(jnp.int32), 0, n_steps)
        # tolerance scales with the float spacing at the step index (f32
        # residuals reach ~eps·index for perfectly aligned times)
        eps = jnp.finfo(jnp.asarray(steps_f).dtype).eps
        tol = 64.0 * eps * jnp.maximum(jnp.abs(steps_f), 1.0)
        bad = jnp.abs(steps_f - jnp.rint(steps_f)) > tol
        bad = bad | (steps_f < -tol) | (steps_f > n_steps + tol)
        return steps, bad

def solve_rode(
    prob,
    *,
    dt,
    saveat=None,
    key=None,
    sensealg=None,
) -> ODESolution:
    """Random ODE u' = f(u, p, t, W(t)) on a fixed grid (RandomEM scheme),
    driving path W from counter-based increments.

    Adjoint menu (reference RODEAdjointProblem for Interpolating/Backsolve,
    src/interpolating_adjoint.jl:615-746, backsolve_adjoint.jl:421-521 —
    here each is the exact DISCRETE adjoint of the realized scheme over the
    regenerable path):

      DirectAdjoint / None  — plain reverse AD through the scan
      InterpolatingAdjoint  — stored node trajectory, one fused step-map vjp
                              per reverse node
      BacksolveAdjoint      — states reconstructed backwards (Picard inverse
                              of the step increment, same W regenerated),
                              snapped to saved values at each save node.
    """
    from ..ops.brownian import grid_path
    from ..problems import RODEProblem

    assert isinstance(prob, RODEProblem)
    if key is None:
        key = jax.random.PRNGKey(0)
    t0, t1 = float(prob.tspan[0]), float(prob.tspan[1])
    n_steps = max(int(round((t1 - t0) / float(dt))), 1)
    u0vec, unravel_u = ravel_pytree(prob.u0)
    dtype = u0vec.dtype
    n = u0vec.shape[0]
    dt_a = jnp.asarray((t1 - t0) / n_steps, dtype)
    ts_nodes = jnp.asarray(t0, dtype) + dt_a * jnp.arange(n_steps + 1)
    w_shape = (prob.noise_dim,) if prob.noise_dim else (n,)
    noise_src = getattr(prob, "noise_process", None)
    if noise_src is not None:
        # user-supplied driving path (NoiseGrid / callable; see solve_sde)
        from ..ops.brownian import NoiseGrid

        if isinstance(noise_src, NoiseGrid):
            W = jnp.asarray(noise_src.W, dtype)
            if W.shape != (n_steps + 1,) + w_shape:
                raise ValueError(
                    f"NoiseGrid.W must have shape {(n_steps + 1,) + w_shape}"
                    f"; got {W.shape}"
                )
            import numpy as _np

            try:
                ts_u = _np.asarray(noise_src.ts, float)
                if not _np.allclose(ts_u, _np.asarray(ts_nodes, float),
                                    atol=1e-9 * max(1.0, abs(t1 - t0))):
                    raise ValueError(
                        "NoiseGrid.ts must equal the RODE solve grid "
                        f"t0 + i*dt (dt={float(dt_a)}, n_steps={n_steps})"
                    )
            except (TypeError, jax.errors.TracerArrayConversionError,
                    jax.errors.ConcretizationTypeError):
                pass  # traced: trust the caller
        elif callable(noise_src):
            W = jax.vmap(
                lambda t: jnp.broadcast_to(
                    jnp.asarray(noise_src(t)), w_shape
                ).astype(dtype)
            )(ts_nodes)
        else:
            raise TypeError(
                f"noise_process: NoiseGrid or callable W(t), got "
                f"{noise_src!r}"
            )
    else:
        W = grid_path(key, n_steps, w_shape, dt_a).astype(dtype)

    if saveat is None:
        saveat = jnp.asarray([t0, t1], dtype)
    else:
        saveat = jnp.asarray(saveat, dtype)
    save_steps, save_bad = _grid_save_steps(saveat, t0, t1, n_steps, dt_a,
                                        "RODE")
    ns = save_steps.shape[0]
    f_user = prob.f

    def step_map(uv, p, i):
        du = ravel_pytree(f_user(unravel_u(uv), p, ts_nodes[i], W[i]))[0]
        return uv + dt_a * du

    def capture(buf, i_next, u_next):
        k = jnp.clip(jnp.searchsorted(save_steps, i_next), 0, ns - 1)
        hit = save_steps[k] == i_next
        return buf.at[k].set(jnp.where(hit, u_next, buf[k]))

    def forward_scan(u0v, p, store_traj: bool):
        buf = capture(jnp.zeros((ns, n), dtype), 0, u0v)

        def body(carry, i):
            uv, b = carry
            u1 = step_map(uv, p, i)
            b = capture(b, i + 1, u1)
            return (u1, b), (u1 if store_traj else None)

        (u_f, buf), traj = jax.lax.scan(body, (u0v, buf), jnp.arange(n_steps))
        if store_traj:
            traj = jnp.concatenate([u0v[None], traj], axis=0)
        return u_f, buf, traj

    if sensealg is None or isinstance(sensealg, DirectAdjoint):
        def run(u0, p):
            u0v, _ = ravel_pytree(u0)
            _, buf, _ = forward_scan(u0v, p, store_traj=False)
            return buf

        ys_flat = run(prob.u0, prob.p)
    elif isinstance(sensealg, (InterpolatingAdjoint, BacksolveAdjoint)):
        stored = isinstance(sensealg, InterpolatingAdjoint)
        snap = (not stored) and getattr(sensealg, "checkpointing", True)

        @jax.custom_vjp
        def run(u0, p):
            u0v, _ = ravel_pytree(u0)
            _, buf, _ = forward_scan(u0v, p, store_traj=False)
            return buf

        def run_fwd(u0, p):
            u0v, _ = ravel_pytree(u0)
            u_f, buf, traj = forward_scan(u0v, p, store_traj=stored)
            return buf, (u0, p, u_f, buf, traj)

        def run_bwd(res, d_buf):
            u0, p, u_f, sbuf, traj = res

            def node_jump(lam, u_rec, i_node):
                k = jnp.clip(jnp.searchsorted(save_steps, i_node), 0, ns - 1)
                hit = save_steps[k] == i_node
                lam = lam + jnp.where(hit, d_buf[k], jnp.zeros_like(lam))
                if snap:
                    u_rec = jnp.where(hit, sbuf[k], u_rec)
                return lam, u_rec

            def body(carry, j):
                lam, q, u_rec = carry
                lam, u_rec = node_jump(lam, u_rec, j + 1)
                if traj is not None:
                    u_j = traj[j]
                else:
                    u_j = u_rec
                    for _ in range(6):
                        u_j = u_rec - (step_map(u_j, p, j) - u_j)
                _, vjp_fn = jax.vjp(
                    lambda uv, pp: step_map(uv, pp, j), u_j, p
                )
                ubar, pbar = vjp_fn(lam)
                q = jax.tree_util.tree_map(jnp.add, q, pbar)
                return (ubar, q, u_j), None

            lam0 = jnp.zeros(n, dtype)
            q0 = jax.tree_util.tree_map(jnp.zeros_like, p)
            (lam, q, _), _ = jax.lax.scan(
                body, (lam0, q0, u_f), jnp.arange(n_steps - 1, -1, -1)
            )
            lam, _ = node_jump(lam, jnp.zeros(n, dtype), 0)
            _, unr_u0 = ravel_pytree(u0)
            return unr_u0(lam), q

        run.defvjp(run_fwd, run_bwd)
        ys_flat = run(prob.u0, prob.p)
    else:
        raise NotImplementedError(f"RODE sensealg {sensealg!r} unsupported")

    if save_bad is not None:
        # traced saveat off the dt grid: loud NaN rows, not shifted values.
        # Additive so the GRADIENT NaNs too (jnp.where would silently zero
        # the cotangent of the poisoned rows).
        ys_flat = ys_flat + jnp.where(save_bad[:, None], jnp.nan,
                                      0.0).astype(ys_flat.dtype)
    ys = jax.vmap(unravel_u)(ys_flat)
    stats = Stats(
        n_accepted=jnp.asarray(n_steps, jnp.int32),
        n_rejected=jnp.asarray(0, jnp.int32),
        n_fevals=jnp.asarray(n_steps, jnp.int32),
        retcode=jnp.asarray(0, jnp.int32),
    )
    return ODESolution(
        ts=saveat, ys=ys, stats=stats, retcode=stats.retcode, prob=prob,
        solver="RandomEM", sensealg=sensealg, dense=None, unravel_u=unravel_u,
        solve_args={"kind": "rode", "dt": dt, "key": key},
    )


def _resolve_drift(prob, solver, fvec, gvec):
    """Match problem calculus to solver calculus via drift transforms."""
    pi = prob.interpretation
    si = getattr(solver, "interpretation", "ito")
    if pi == si:
        return fvec
    if pi == "ito" and si == "stratonovich":
        return ito_to_stratonovich_drift(fvec, gvec)
    if pi == "stratonovich" and si == "ito":
        return stratonovich_to_ito_drift(fvec, gvec)
    raise ValueError(f"unknown interpretation pair {pi}/{si}")


def solve_sde(
    prob: SDEProblem,
    solver=None,
    *,
    saveat=None,
    dt=None,
    key=None,
    sensealg=None,
    max_steps=None,
    rtol=1e-3,
    atol=1e-6,
    callback=None,
) -> ODESolution:
    if dt is None:
        # Adaptive path on a VirtualBrownianTree (consistent noise across
        # retries): step-doubling Euler-Maruyama or Milstein-error control.
        from ..solvers.sde import AdaptiveMilstein, Milstein

        if getattr(prob, "noise_process", None) is not None:
            raise NotImplementedError(
                "user-supplied noise_process runs on the fixed grid: pass "
                "dt=... (the adaptive path draws from its own "
                "VirtualBrownianTree)"
            )

        if solver is None or isinstance(solver, (EulerMaruyama, AdaptiveEM)):
            adaptive_kind = "em"
        elif isinstance(solver, (Milstein, AdaptiveMilstein)):
            adaptive_kind = "milstein"
        else:
            raise NotImplementedError(
                f"adaptive SDE stepping (no dt=...) runs Euler-Maruyama "
                f"(step-doubling error) or Milstein (embedded Milstein-EM "
                f"error) on the VirtualBrownianTree; {solver!r} is only "
                f"available on the fixed grid — pass dt=..."
            )
        return _solve_sde_adaptive(
            prob, saveat=saveat, key=key, sensealg=sensealg,
            max_steps=max_steps or 1024, rtol=rtol, atol=atol,
            adaptive_kind=adaptive_kind, callback=callback,
        )
    if solver is None:
        solver = EulerMaruyama() if prob.interpretation == "ito" else EulerHeun()
    if key is None:
        key = jax.random.PRNGKey(0)
    if sensealg is None:
        sensealg = DirectAdjoint()

    t0, t1 = float(prob.tspan[0]), float(prob.tspan[1])
    n_steps = max(int(round((t1 - t0) / float(dt))), 1)
    u0vec_probe, unravel_u = ravel_pytree(prob.u0)
    dtype = u0vec_probe.dtype
    dt_a = jnp.asarray((t1 - t0) / n_steps, dtype)
    ts_nodes = jnp.asarray(t0, dtype) + dt_a * jnp.arange(n_steps + 1)

    if saveat is None:
        saveat = jnp.asarray([t0, t1], dtype)
    else:
        saveat = jnp.asarray(saveat, dtype)
    save_steps, save_bad = _grid_save_steps(saveat, t0, t1, n_steps, dt_a,
                                        "SDE")
    ns = save_steps.shape[0]

    # ---- callbacks (reference scope: DISCRETE callbacks on SDEs,
    # test/Callbacks1/SDE_callbacks.jl — the reference has no continuous-
    # event SDE adjoint either). Conditions are checked at each grid node
    # t_{i+1}; preset/periodic doses are mapped to node INDICES (validated
    # on the grid like saveat) so firing is exact under float roundoff.
    # The affect is COMPOSED INTO step_map, so the discrete adjoints
    # (DirectAdjoint through the scan, InterpolatingAdjoint's per-node
    # step-map vjp) differentiate the jump exactly with no extra machinery.
    cb_disc: tuple = ()
    cb_preset: tuple = ()
    cb_cont: tuple = ()
    cb_term: tuple = ()
    if callback is not None:
        from ..callbacks import (
            ContinuousCallback,
            DiscreteCallback,
            PeriodicCallback,
            PresetTimeCallback,
        )

        items = list(callback) if isinstance(callback, (list, tuple)) \
            else [callback]
        for c in items:
            if isinstance(c, PeriodicCallback):
                import numpy as _np

                kper = int(_np.floor(abs(t1 - t0) / float(c.period) + 1e-12))
                sgn = 1.0 if t1 >= t0 else -1.0
                c = PresetTimeCallback(
                    ts=t0 + sgn * float(c.period) * _np.arange(1, kper + 1),
                    affect=c.affect, modifies_p=c.modifies_p,
                    terminal=c.terminal,
                )
            if getattr(c, "modifies_p", False):
                # unreachable via solve(): it p-lifts modifies_p callbacks
                # before dispatching here (callbacks.lift_p_into_state_sde)
                raise NotImplementedError(
                    "SDE callbacks: modifies_p — call solve(), which lifts "
                    "p into the state automatically"
                )
            if getattr(c, "terminal", False):
                # terminal SDE events: the scan freezes the state at τ and
                # the solution flags RETCODE_TERMINATED (round-4; reference
                # has no terminal-SDE adjoint either). Differentiable under
                # DirectAdjoint (AD straight through the masked scan).
                if isinstance(c, (DiscreteCallback, ContinuousCallback)):
                    cb_term += (c,)
                    continue
                raise NotImplementedError(
                    "terminal SDE callbacks: Discrete/Continuous only"
                )
            if isinstance(c, PresetTimeCallback):
                psteps, pbad = _grid_save_steps(
                    jnp.asarray(c.ts, dtype).reshape(-1), t0, t1, n_steps,
                    dt_a, "SDE PresetTimeCallback",
                )
                if pbad is not None:
                    raise NotImplementedError(
                        "SDE PresetTimeCallback times must be concrete "
                        "(not traced) and lie on the dt grid"
                    )
                cb_preset += ((psteps, c.affect),)
            elif isinstance(c, DiscreteCallback):
                cb_disc += (c,)
            elif isinstance(c, ContinuousCallback):
                # continuous SDE events on the grid (round-4; beyond the
                # reference's discrete-only SDE scope): the crossing is
                # localized inside the step by linear interpolation of the
                # condition, τ = t + θ·dt, and the step is re-taken as two
                # scheme sub-steps around the affect with Brownian-BRIDGE
                # increments (W(τ)−W(t) = θΔW + z, z ~ N(0, θ(1−θ)dt),
                # counter-based — exact in distribution and bit-replayable).
                # Everything is differentiable in θ, so the discrete
                # adjoints get dτ/dp for free (no implicit-τ machinery).
                cb_cont += (c,)
            else:
                raise NotImplementedError(
                    f"unsupported SDE callback type {type(c).__name__}"
                )
        if (cb_cont or cb_term) and (getattr(solver, "needs_dz", False)
                                     or getattr(solver, "needs_levy", False)):
            raise NotImplementedError(
                "continuous/terminal SDE events need plain-increment "
                "schemes (EulerMaruyama/EulerHeun/Milstein): iterated-"
                "integral solvers cannot split a step at τ"
            )
        if cb_term and not (sensealg is None
                            or isinstance(sensealg, DirectAdjoint)):
            raise NotImplementedError(
                "terminal SDE events differentiate under DirectAdjoint "
                "(AD through the masked scan); Interpolating/Backsolve "
                "reverse walks do not model the frozen tail"
            )
        if isinstance(sensealg, BacksolveAdjoint) and (
                cb_disc or cb_preset or cb_cont):
            raise NotImplementedError(
                "BacksolveAdjoint + SDE callbacks: the backward Picard "
                "reconstruction cannot invert an event jump — use "
                "DirectAdjoint or InterpolatingAdjoint"
            )

    f_user, g_user = prob.f, prob.g

    def make_field(p):
        def fvec(uv, t):
            return ravel_pytree(f_user(unravel_u(uv), p, t))[0]

        if prob.noise == "general":
            def gvec(uv, t):
                return jnp.asarray(g_user(unravel_u(uv), p, t))
        else:
            def gvec(uv, t):
                return ravel_pytree(g_user(unravel_u(uv), p, t))[0]

        return _resolve_drift(prob, solver, fvec, gvec), gvec

    n = u0vec_probe.shape[0]
    if prob.noise == "general":
        if prob.noise_dim is None:
            raise ValueError("general noise needs noise_dim=m")
        w_shape = (prob.noise_dim,)
    elif prob.noise == "scalar":
        w_shape = ()
    else:
        w_shape = (n,)

    needs_dz = bool(getattr(solver, "needs_dz", False))
    # Lévy-area Milstein (RKMilGeneral): areas only exist for true matrix
    # noise; diagonal/scalar noise degenerates to plain Milstein.
    needs_levy = (bool(getattr(solver, "needs_levy", False))
                  and prob.noise == "general")

    noise_src = getattr(prob, "noise_process", None)
    if noise_src is not None:
        if needs_levy:
            raise NotImplementedError(
                f"{solver!r} needs Lévy areas, which an observed path does "
                "not determine; use EulerMaruyama/EulerHeun/"
                "Milstein(commutative=True) with noise_process"
            )
        # User-supplied driving path (NoiseGrid analogue): the solvers
        # consume its increments; the reverse pass reads the SAME
        # increments, so gradients are exact discrete adjoints over the
        # given path (reference workflow: fitting against an observed
        # Brownian path, DiffEqNoiseProcess / SURVEY §2 item 7).
        if needs_dz:
            raise NotImplementedError(
                f"{solver!r} needs iterated integrals ∫(W(s)-W(t))ds, which "
                "an observed path does not determine; use "
                "EulerMaruyama/EulerHeun/Milstein with noise_process"
            )
        from ..ops.brownian import NoiseGrid

        if isinstance(noise_src, NoiseGrid):
            Wgrid = jnp.asarray(noise_src.W)
            if Wgrid.shape[0] != n_steps + 1 or Wgrid.shape[1:] != w_shape:
                raise ValueError(
                    f"NoiseGrid.W must have shape (n_steps+1,)+noise_shape ="
                    f" {(n_steps + 1,) + w_shape}; got {Wgrid.shape}"
                )
            import numpy as _np

            try:
                ts_u = _np.asarray(noise_src.ts, float)
                if not _np.allclose(ts_u, _np.asarray(ts_nodes, float),
                                    atol=1e-9 * max(1.0, abs(t1 - t0))):
                    raise ValueError(
                        "NoiseGrid.ts must equal the solve grid "
                        f"t0 + i*dt (dt={float(dt_a)}, n_steps={n_steps})"
                    )
            except (TypeError, jax.errors.TracerArrayConversionError,
                    jax.errors.ConcretizationTypeError):
                pass  # traced: trust the caller

            def dw_at(i):
                return (Wgrid[i + 1] - Wgrid[i]).astype(dtype)
        elif callable(noise_src):
            def dw_at(i):
                wa = jnp.asarray(noise_src(ts_nodes[i]))
                wb = jnp.asarray(noise_src(ts_nodes[i + 1]))
                return jnp.broadcast_to(wb - wa, w_shape).astype(dtype)
        else:
            raise TypeError(
                f"noise_process: NoiseGrid or callable W(t), got "
                f"{noise_src!r}"
            )
    else:
        def dw_at(i):
            return grid_increment(key, i, w_shape, dt_a).astype(dtype)

    def step_map(uv, p, i):
        """One scheme step from node i to i+1 (+ any callback affects at the
        node end) — the unit of adjoint vjp."""
        fvec, gvec = make_field(p)
        t = ts_nodes[i]
        dw = dw_at(i)
        if needs_dz:
            dz = grid_iterated(key, i, w_shape, dt_a, dw).astype(dtype)
            u1 = solver.step(fvec, gvec, t, dt_a, uv, dw, dz)
        elif needs_levy:
            from ..ops.brownian import grid_levy_area

            levy_a = grid_levy_area(
                key, i, w_shape[0], dt_a, dw, terms=solver.levy_terms
            ).astype(dtype)
            u1 = solver.step(fvec, gvec, t, dt_a, uv, dw, levy_a)
        else:
            u1 = solver.step(fvec, gvec, t, dt_a, uv, dw)
        if cb_cont:
            # continuous events: localize τ by linear interpolation of the
            # condition across the step, then re-take the step as two
            # scheme sub-steps around the affect with Brownian-BRIDGE
            # increments (one firing per callback per step — repeated
            # crossings are below grid resolution by construction).
            t_next = ts_nodes[i + 1]
            for ci, c in enumerate(cb_cont):
                c0 = jnp.asarray(c.condition(unravel_u(uv), p, t)).reshape(())
                c1 = jnp.asarray(
                    c.condition(unravel_u(u1), p, t_next)).reshape(())
                crossed = c0 * c1 < 0
                if c.direction:
                    crossed = crossed & ((c1 - c0) * c.direction > 0)
                den = jnp.where(c0 == c1, jnp.ones_like(c0), c0 - c1)
                # double-where: θ enters √(θ(1−θ)) whose derivative blows
                # up at the clip boundaries — park the untaken branch at
                # θ=1/2 so reverse AD through the no-crossing path stays
                # finite (0·∞ = NaN otherwise)
                theta = jnp.where(crossed,
                                  jnp.clip(c0 / den, 0.0, 1.0),
                                  jnp.full_like(c0, 0.5)).astype(dtype)
                tau = t + theta * dt_a
                u_tau, dw_part = _bridge_substep(uv, p, i, theta, 0x1000 + ci)
                u_post = ravel_pytree(
                    c.affect(unravel_u(u_tau), p, tau))[0]
                u1_ev = solver.step(fvec, gvec, tau, (1.0 - theta) * dt_a,
                                    u_post, dw - dw_part)
                u1 = jnp.where(crossed, u1_ev, u1)
        if cb_disc or cb_preset:
            t_next = ts_nodes[i + 1]
            u = unravel_u(u1)
            for d in cb_disc:
                fire = jnp.asarray(d.condition(u, p, t_next))
                u1 = jnp.where(
                    fire, ravel_pytree(d.affect(u, p, t_next))[0], u1
                )
                u = unravel_u(u1)
            for psteps, aff in cb_preset:
                fire = jnp.any(i + 1 == psteps)
                u1 = jnp.where(fire, ravel_pytree(aff(u, p, t_next))[0], u1)
                u = unravel_u(u1)
        return u1

    def _bridge_substep(uv, p, i, theta, tag):
        """u(tᵢ + θ·dt) by the scheme's own sub-step driven by the
        Brownian-bridge increment W(τ)−W(tᵢ) = θ·ΔW + z, z ~ N(0, θ(1−θ)dt)
        counter-based off (key, i, tag) — exact in distribution,
        bit-replayable, and differentiable in θ. Observed noise_process
        paths use the bridge MEAN (z = 0): the path does not determine the
        sub-step refinement. Returns (u(τ) flat, the consumed increment)."""
        fvec, gvec = make_field(p)
        t = ts_nodes[i]
        dw = dw_at(i)
        if noise_src is None:
            xi = jax.random.normal(
                jax.random.fold_in(jax.random.fold_in(key, i), tag),
                w_shape).astype(dtype)
            z = jnp.sqrt(jnp.clip(theta * (1.0 - theta), 0.0)
                         * jnp.abs(dt_a)) * xi
        else:
            z = jnp.zeros(w_shape, dtype)
        dw_part = theta * dw + z
        return solver.step(fvec, gvec, t, theta * dt_a, uv, dw_part), dw_part

    def step_term(uv, p, i):
        """Terminal-event scan unit: (u_next, fired, τ). Terminal firing
        freezes the state at the (affect-applied) event state; continuous
        terminal conditions get the differentiable bridged τ."""
        u1 = step_map(uv, p, i)
        t = ts_nodes[i]
        t_next = ts_nodes[i + 1]
        fired = jnp.asarray(False)
        tau = t_next.astype(dtype)
        u_stop = u1
        for cj, c in enumerate(cb_term):
            from ..callbacks import DiscreteCallback as _DC

            if isinstance(c, _DC):
                hit = jnp.asarray(
                    c.condition(unravel_u(u1), p, t_next)).reshape(())
                u_aff = ravel_pytree(c.affect(unravel_u(u1), p, t_next))[0]
                tau_c = t_next.astype(dtype)
            else:
                c0 = jnp.asarray(c.condition(unravel_u(uv), p, t)).reshape(())
                c1 = jnp.asarray(
                    c.condition(unravel_u(u1), p, t_next)).reshape(())
                hit = c0 * c1 < 0
                if c.direction:
                    hit = hit & ((c1 - c0) * c.direction > 0)
                den = jnp.where(c0 == c1, jnp.ones_like(c0), c0 - c1)
                theta = jnp.where(hit, jnp.clip(c0 / den, 0.0, 1.0),
                                  jnp.full_like(c0, 0.5)).astype(dtype)
                tau_c = (t + theta * dt_a).astype(dtype)
                u_tau, _ = _bridge_substep(uv, p, i, theta, 0x2000 + cj)
                u_aff = ravel_pytree(
                    c.affect(unravel_u(u_tau), p, tau_c))[0]
            first = hit & ~fired
            u_stop = jnp.where(first, u_aff, u_stop)
            tau = jnp.where(first, tau_c, tau)
            fired = fired | hit
        return u_stop, fired, tau

    def capture(buf, i_next, u_next):
        k = jnp.clip(jnp.searchsorted(save_steps, i_next), 0, ns - 1)
        hit = save_steps[k] == i_next
        return buf.at[k].set(jnp.where(hit, u_next, buf[k]))

    def forward_scan(u0vec, p, store_traj: bool):
        buf = jnp.zeros((ns, n), dtype)
        buf = capture(buf, 0, u0vec)

        if cb_term:
            # masked scan: after the first terminal firing the state holds
            # at the event state (the dense-clamp convention) and later
            # save nodes capture it; τ and the frozen tail stay
            # differentiable under reverse AD through the scan.
            def body(carry, i):
                uv, b, done, tfin = carry
                u1, fired, tau = step_term(uv, p, i)
                first = fired & ~done
                u_next = jnp.where(done, uv, u1)
                tfin = jnp.where(first, tau, tfin)
                done = done | fired
                b = capture(b, i + 1, u_next)
                return (u_next, b, done, tfin), (
                    u_next if store_traj else None)

            (u_f, buf, done, tfin), traj = jax.lax.scan(
                body,
                (u0vec, buf, jnp.asarray(False), jnp.asarray(t1, dtype)),
                jnp.arange(n_steps),
            )
            if store_traj:
                traj = jnp.concatenate([u0vec[None], traj], axis=0)
            return u_f, buf, traj, done, tfin

        def body(carry, i):
            uv, b = carry
            u1 = step_map(uv, p, i)
            b = capture(b, i + 1, u1)
            return (u1, b), (u1 if store_traj else None)

        (u_f, buf), traj = jax.lax.scan(body, (u0vec, buf), jnp.arange(n_steps))
        if store_traj:
            traj = jnp.concatenate([u0vec[None], traj], axis=0)
        return u_f, buf, traj, None, None

    def reverse_scan(p, lam_jumps, u_source, u_final, ys_save, snap: bool):
        """Discrete adjoint walk j = N-1..0.

        u_source: (N+1, n) stored nodes, or None -> backward reconstruction.
        """
        def node_jump(lam, u_rec, i_node):
            k = jnp.clip(jnp.searchsorted(save_steps, i_node), 0, ns - 1)
            hit = save_steps[k] == i_node
            lam = lam + jnp.where(hit, lam_jumps[k], jnp.zeros_like(lam))
            if snap:
                u_rec = jnp.where(hit, ys_save[k], u_rec)
            return lam, u_rec

        def body(carry, j):
            lam, q, u_rec = carry
            lam, u_rec = node_jump(lam, u_rec, j + 1)
            if u_source is not None:
                u_j = u_source[j]
            else:
                # Backward reconstruction: solve u_rec = u_j + Δ(u_j) for
                # u_j by Picard iteration on u_j = u_rec − Δ(u_j) (the
                # increment map is an O(dt) contraction, so six sweeps
                # give an effectively exact inverse; same ΔW regenerated),
                # stabilized by the checkpoint snaps above.
                u_j = u_rec
                for _ in range(6):
                    u_j = u_rec - (step_map(u_j, p, j) - u_j)
            _, vjp_fn = jax.vjp(lambda uv, pp: step_map(uv, pp, j), u_j, p)
            ubar, pbar = vjp_fn(lam)
            q = jax.tree_util.tree_map(jnp.add, q, pbar)
            return (ubar, q, u_j), None

        lam0 = jnp.zeros(n, dtype)
        q0 = jax.tree_util.tree_map(jnp.zeros_like, p)
        (lam, q, _), _ = jax.lax.scan(
            body, (lam0, q0, u_final), jnp.arange(n_steps - 1, -1, -1)
        )
        # jump at node 0 (t0 save)
        k = jnp.clip(jnp.searchsorted(save_steps, 0), 0, ns - 1)
        hit = save_steps[k] == 0
        lam = lam + jnp.where(hit, lam_jumps[k], jnp.zeros_like(lam))
        return lam, q

    # ------------------------------------------------------------------

    term_info = None
    if isinstance(sensealg, (DirectAdjoint,)) or sensealg is None:
        def run(u0, p):
            u0vec, _ = ravel_pytree(u0)
            _, buf, _, done, tfin = forward_scan(u0vec, p, store_traj=False)
            return buf, done, tfin

        ys_flat, done, tfin = run(prob.u0, prob.p)
        if cb_term:
            term_info = (done, tfin)
    elif isinstance(sensealg, (InterpolatingAdjoint, BacksolveAdjoint)):
        stored = isinstance(sensealg, InterpolatingAdjoint)
        snap = (not stored) and getattr(sensealg, "checkpointing", True)

        @jax.custom_vjp
        def run(u0, p):
            u0vec, _ = ravel_pytree(u0)
            _, buf, _, _, _ = forward_scan(u0vec, p, store_traj=False)
            return buf

        def run_fwd(u0, p):
            u0vec, _ = ravel_pytree(u0)
            u_f, buf, traj, _, _ = forward_scan(u0vec, p, store_traj=stored)
            return buf, (u0, p, u_f, buf, traj)

        def run_bwd(res, d_buf):
            u0, p, u_f, buf, traj = res
            lam, q = reverse_scan(p, d_buf, traj if stored else None,
                                  u_f, buf, snap)
            _, unr_u0 = ravel_pytree(u0)
            return unr_u0(lam), q

        run.defvjp(run_fwd, run_bwd)
        ys_flat = run(prob.u0, prob.p)
    else:
        raise NotImplementedError(f"SDE sensealg {sensealg!r} unsupported")

    if save_bad is not None:
        # traced saveat off the dt grid: loud NaN rows, not shifted values.
        # Additive so the GRADIENT NaNs too (jnp.where would silently zero
        # the cotangent of the poisoned rows).
        ys_flat = ys_flat + jnp.where(save_bad[:, None], jnp.nan,
                                      0.0).astype(ys_flat.dtype)
    ys = jax.vmap(unravel_u)(ys_flat)
    if term_info is not None:
        done, tfin = term_info
        retcode = jnp.where(done, jnp.asarray(5, jnp.int32),
                            jnp.asarray(0, jnp.int32))
        t_final = tfin
    else:
        retcode = jnp.asarray(0, jnp.int32)
        t_final = None
    stats = Stats(
        n_accepted=jnp.asarray(n_steps, jnp.int32),
        n_rejected=jnp.asarray(0, jnp.int32),
        n_fevals=jnp.asarray(n_steps, jnp.int32),
        retcode=retcode,
    )
    return ODESolution(
        ts=saveat, ys=ys, stats=stats, retcode=stats.retcode, prob=prob,
        solver=solver, sensealg=sensealg, dense=None, unravel_u=unravel_u,
        t_final=t_final,
        solve_args={"kind": "sde", "dt": dt, "key": key},
    )


def _solve_sde_adaptive(prob, *, saveat, key, sensealg, max_steps, rtol,
                        atol, adaptive_kind="em", callback=None):
    """Adaptive SDE solve on a VirtualBrownianTree, with the adjoint menu:

      DirectAdjoint          — reverse AD through the masked scan (default)
      InterpolatingAdjoint   — stored realized nodes, hand-rolled discrete
                               reverse (one fused step-map vjp per node)
      BacksolveAdjoint       — O(1) state storage: realized TIMES stored
                               (O(max_steps) scalars), states reconstructed
                               backwards from the same tree, checkpoint-
                               snapped at each save node
                               (backsolve_adjoint.jl:523-572 semantics).

    The controller runs always-accept (previsible step sizes — h_n from past
    errors only: rejecting on the realized ΔW would bias the accepted
    increments, Gaines & Lyons 1997), so the realized grid is identical
    across forward and reverse for a fixed p, and the reverse step map reads
    bit-identical noise from the tree.
    """
    from ..ops.brownian import VirtualBrownianTree
    from ..sensealg import DirectAdjoint
    from ..solvers.integrate import integrate_scan
    from ..solvers.sde import AdaptiveEM, AdaptiveMilstein
    from .common import save_hook_factory

    if key is None:
        key = jax.random.PRNGKey(0)
    if sensealg is None:
        sensealg = DirectAdjoint()
    if not isinstance(
        sensealg, (DirectAdjoint, InterpolatingAdjoint, BacksolveAdjoint)
    ):
        raise NotImplementedError(
            "adaptive SDE gradients: DirectAdjoint, InterpolatingAdjoint "
            "(stored nodes), or BacksolveAdjoint (reconstructed nodes)"
        )
    t0, t1 = float(prob.tspan[0]), float(prob.tspan[1])
    u0vec, unravel_u = ravel_pytree(prob.u0)
    dtype = u0vec.dtype
    n = u0vec.shape[0]
    if prob.noise == "general":
        if prob.noise_dim is None:
            raise ValueError("general noise needs noise_dim=m")
        w_shape = (prob.noise_dim,)
    elif prob.noise == "scalar":
        w_shape = ()
    else:
        w_shape = (n,)
    vbt = VirtualBrownianTree.create(key, t0, t1, shape=w_shape, depth=28,
                                     dtype=dtype)

    # ---- adaptive-path callbacks (VERDICT r4 #5): conditions evaluated at
    # accepted nodes by the shared event engine inside the masked scan;
    # preset/periodic dose times forced as tstops so nodes land there; the
    # VBT makes event re-stepping from τ well-defined (consistent noise at
    # any (t, dt)). Gradients flow by reverse AD through the scan, so
    # DirectAdjoint only — the stored/reconstructed-node adjoints don't
    # model event jumps.
    cb_lowered = None
    cb_stops = None
    if callback is not None:
        from ..callbacks import any_modifies_p, as_callback_set, \
            lower_time_callbacks

        if not isinstance(sensealg, DirectAdjoint):
            raise NotImplementedError(
                "adaptive-SDE callbacks differentiate under DirectAdjoint "
                "(reverse AD through the masked scan); for "
                "Interpolating/Backsolve use the fixed grid (dt=...)"
            )
        lowered, cb_stops = lower_time_callbacks(callback, prob.f, t0, t1)
        cb_lowered = as_callback_set(lowered)
        if any_modifies_p(cb_lowered):
            # unreachable via solve(): it p-lifts modifies_p callbacks
            # before dispatching here (callbacks.lift_p_into_state_sde)
            raise NotImplementedError(
                "modifies_p on SDE paths: call solve(), which lifts p "
                "into the state automatically"
            )

    saveat = jnp.asarray([t0, t1] if saveat is None else saveat, dtype)
    nt = saveat.shape[0]
    tdir = jnp.asarray(1.0 if t1 >= t0 else -1.0, dtype)
    eps = jnp.finfo(dtype).eps

    def make_flat(p):
        def fvec(uv, t):
            return ravel_pytree(prob.f(unravel_u(uv), p, t))[0]

        if prob.noise == "general":
            def gvec(uv, t):
                return jnp.asarray(prob.g(unravel_u(uv), p, t))
        else:
            def gvec(uv, t):
                return ravel_pytree(prob.g(unravel_u(uv), p, t))[0]

        return fvec, gvec

    def make_stepper(gvec):
        if adaptive_kind == "milstein":
            return AdaptiveMilstein(gvec, vbt)
        return AdaptiveEM(gvec, vbt)

    store_nodes = isinstance(sensealg, (InterpolatingAdjoint, BacksolveAdjoint))
    keep_states = isinstance(sensealg, InterpolatingAdjoint)

    if cb_stops is not None:
        all_stops = jnp.sort(jnp.concatenate(
            [saveat, jnp.asarray(cb_stops, dtype)]))
    else:
        all_stops = saveat

    def forward(u0v, p):
        fvec, gvec = make_flat(p)
        stepper = make_stepper(gvec)
        if cb_lowered is not None:
            from ..callbacks import build_event_set

            event_set = build_event_set(cb_lowered, p, unravel_u, 32)
        else:
            event_set = None
        tol0 = 64.0 * eps * jnp.maximum(abs(t0), 1.0)
        pre = (saveat - t0) * tdir <= tol0
        k0 = jnp.sum(pre).astype(jnp.int32)
        buf0 = jnp.where(pre[:, None], u0v[None, :], jnp.zeros((nt, n), dtype))
        save_hook = save_hook_factory(saveat, tdir, dtype)

        if store_nodes:
            ts_buf0 = jnp.full((max_steps + 1,), t1, dtype).at[0].set(t0)
            us_buf0 = (jnp.tile(u0v[None], (max_steps + 1, 1))
                       if keep_states else None)

            def hook(rec, carry):
                sb, i_node, tsb, usb = carry
                t_old, t_new, y0, f0, y1, f1 = rec
                sb = save_hook(rec, sb)
                i1 = jnp.minimum(i_node + 1, max_steps)
                tsb = tsb.at[i1].set(t_new)
                if usb is not None:
                    usb = usb.at[i1].set(y1)
                return (sb, i1, tsb, usb)

            carry0 = ((buf0, k0), jnp.asarray(0, jnp.int32), ts_buf0, us_buf0)
            res = integrate_scan(
                stepper, fvec, t0, t1, u0v, rtol=rtol, atol=atol,
                max_steps=max_steps, tstops=saveat, hook=hook,
                hook_carry=carry0, always_accept=True,
                remat=getattr(sensealg, "remat", False),
            )
            (sbuf, _k), n_node, ts_nodes, us_nodes = res.hook_carry
            return sbuf, res.stats, res.u_final, n_node, ts_nodes, us_nodes
        res = integrate_scan(
            stepper, fvec, t0, t1, u0v, rtol=rtol, atol=atol,
            max_steps=max_steps, tstops=all_stops, hook=save_hook,
            hook_carry=(buf0, k0), always_accept=True,
            event_set=event_set,
            remat=getattr(sensealg, "remat", False),
        )
        buf, _ = res.hook_carry
        return buf, res.stats, res.u_final, None, None, None

    def step_map(uv, p, ta, tb):
        """Reproduce the forward step [ta, tb] exactly (same tree reads)."""
        fvec, gvec = make_flat(p)
        stepper = make_stepper(gvec)
        u1, _f1, _err = stepper.step(fvec, ta, tb - ta, uv, fvec(uv, ta))
        return u1

    if isinstance(sensealg, DirectAdjoint):
        def run(u0, p):
            u0v, _ = ravel_pytree(u0)
            buf, stats, *_ = forward(u0v, p)
            return buf, stats

        ys_flat, stats = run(prob.u0, prob.p)
    else:
        snap = isinstance(sensealg, BacksolveAdjoint) and \
            getattr(sensealg, "checkpointing", True)

        @jax.custom_vjp
        def run_vjp(u0, p):
            u0v, _ = ravel_pytree(u0)
            buf, stats, *_ = forward(u0v, p)
            return buf, stats

        def run_fwd(u0, p):
            u0v, _ = ravel_pytree(u0)
            buf, stats, u_fin, n_node, ts_nodes, us_nodes = forward(u0v, p)
            return (buf, stats), (u0, p, buf, u_fin, n_node, ts_nodes,
                                  us_nodes)

        def run_bwd(res_, cot):
            d_buf, _d_stats = cot
            u0, p, sbuf, u_fin, n_node, ts_nodes, us_nodes = res_
            tolt = 64.0 * eps * jnp.maximum(
                jnp.maximum(abs(t0), abs(t1)), 1.0
            )

            def jump_and_snap(lam, u_rec, kk, t_node):
                # Unrolled x3 like the ODE reverse matcher: duplicate
                # saveat times share one grid node, and every coincident
                # row's cotangent must be applied (ADVICE r2 — a single
                # decrement silently dropped the second row's d_buf).
                for _ in range(3):
                    kc = jnp.clip(kk, 0, nt - 1)
                    hit = (kk >= 0) & (jnp.abs(saveat[kc] - t_node) <= tolt)
                    lam = lam + jnp.where(hit, d_buf[kc],
                                          jnp.zeros_like(lam))
                    if snap:
                        u_rec = jnp.where(hit, sbuf[kc], u_rec)
                    kk = kk - hit.astype(kk.dtype)
                return lam, u_rec, kk

            def body(carry, j):
                lam, q, u_rec, kk = carry
                active = j < n_node
                ta = ts_nodes[j]
                tb = ts_nodes[j + 1]
                lam, u_rec, kk = jax.lax.cond(
                    active,
                    lambda a: jump_and_snap(a[0], a[1], a[2], tb),
                    lambda a: a,
                    (lam, u_rec, kk),
                )
                if us_nodes is not None:
                    u_j = us_nodes[j]
                else:
                    # backward reconstruction: Picard-solve the O(dt)
                    # contraction u_j = u_rec − Δ(u_j) (same tree reads),
                    # stabilized by the save-node snaps above
                    u_j = u_rec
                    for _ in range(6):
                        u_j = u_rec - (step_map(u_j, p, ta, tb) - u_j)

                def upd(args):
                    lam_, q_ = args
                    _, vjp_fn = jax.vjp(
                        lambda uv, pp: step_map(uv, pp, ta, tb), u_j, p
                    )
                    ubar, pbar = vjp_fn(lam_)
                    return ubar, jax.tree_util.tree_map(jnp.add, q_, pbar)

                lam, q = jax.lax.cond(
                    active, upd, lambda a: a, (lam, q)
                )
                u_rec = jnp.where(active, u_j, u_rec)
                return (lam, q, u_rec, kk), None

            lam0 = jnp.zeros(n, dtype)
            q0 = jax.tree_util.tree_map(jnp.zeros_like, p)
            (lam, q, _u, kk), _ = jax.lax.scan(
                body, (lam0, q0, u_fin, jnp.asarray(nt - 1, jnp.int32)),
                jnp.arange(max_steps - 1, -1, -1),
            )
            # jump at node 0 (t0 in saveat)
            lam, _ur, kk = jump_and_snap(
                lam, jnp.zeros(n, dtype), kk, jnp.asarray(t0, dtype)
            )
            _, unr_u0 = ravel_pytree(u0)
            return unr_u0(lam), q

        run_vjp.defvjp(run_fwd, run_bwd)
        ys_flat, stats = run_vjp(prob.u0, prob.p)

    ys = jax.vmap(unravel_u)(ys_flat)
    label = ("AdaptiveMilstein(VBT)" if adaptive_kind == "milstein"
             else "AdaptiveEM(VBT)")
    return ODESolution(
        ts=saveat, ys=ys, stats=stats, retcode=stats.retcode, prob=prob,
        solver=label, sensealg=sensealg, dense=None,
        unravel_u=unravel_u,
        solve_args={"kind": "sde_adaptive", "key": key, "rtol": rtol,
                    "atol": atol, "max_steps": max_steps},
    )
