"""Sensitivity-algorithm configuration types.

TPU-native analogue of the reference's sensealg menu
(reference: src/sensitivity_algorithms.jl — `BacksolveAdjoint` :254,
`InterpolatingAdjoint` :378, `QuadratureAdjoint` :486, `GaussAdjoint` :591,
`ForwardSensitivity` :54, `ForwardDiffSensitivity` :100,
`SteadyStateAdjoint` :1299, shadowing algs :915-1297).

The reference carries configuration in the Julia *type domain* so code
specializes per configuration (SURVEY §5 "Config / flag system"); here each
sensealg is a frozen dataclass — hashable, usable as a static argument to
`jax.jit`, and dispatched on at trace time.

VJP-backend choice collapses dramatically on TPU: the reference's zoo of
Zygote/Enzyme/ReverseDiff/Tracker/Mooncake/Reactant backends
(src/derivative_wrappers.jl:435-1163) is replaced by `jax.vjp` (exactly what
EnzymeVJP computes: one sweep producing f(u,p,t), λᵀ∂f/∂u, λᵀ∂f/∂p —
derivative_wrappers.jl:982-1145). The remaining genuine execution choices
are kept:

  * AutoVJP()        — one fused jax.vjp pullback (default; EnzymeVJP analogue)
  * JacVJP()         — materialize the full Jacobian then λᵀJ
                       (the reference's `Bool` path, derivative_wrappers.jl:435-554;
                       wins when the adjoint solver reuses J, e.g. stiff)
  * FiniteDiffVJP()  — central differences (the numerical fallback at the end
                       of the reference's probe chain, concrete_solve.jl:39-143)
  * user override    — prob.vjp / prob.paramjac fast paths
                       (derivative_wrappers.jl:284-433)

There is deliberately NO generic "PallasVJP" backend: a jax.vjp pullback is
already ONE fused XLA computation, so a hand-written generic pullback kernel
cannot beat the compiler (the reference's per-backend kernels exist because
Julia hosts many AD engines, not because per-backend kernels win). The
Pallas fusion surface in this framework is the FIELD itself — fused
forward+pullback kernels attached with jax.custom_vjp at the model level
(ops/pallas_mlp.fused_mlp2 for neural-ODE fields, ops/pallas_pde.fused_rd1d
for large-flat-state PDE fields), which every sensealg's reverse pass then
consumes as a single kernel launch per evaluation. That is the architectural
translation of the Reactant seam (ext/SciMLSensitivityReactantExt.jl:32-134:
one compiled call returning f, λᵀ∂f/∂u, λᵀ∂f/∂p).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

__all__ = [
    "AbstractSensealg",
    "AbstractAdjointSensealg",
    "VJPChoice",
    "AutoVJP",
    "JacVJP",
    "FiniteDiffVJP",
    "ForwardSensitivity",
    "ForwardDiffSensitivity",
    "BacksolveAdjoint",
    "InterpolatingAdjoint",
    "QuadratureAdjoint",
    "GaussAdjoint",
    "GaussKronrodAdjoint",
    "DirectAdjoint",
    "ForwardDiffOverAdjoint",
    "SteadyStateAdjoint",
    "ForwardLSS",
    "AdjointLSS",
    "NILSS",
    "NILSAS",
    "CosWindowing",
    "Cos2Windowing",
    "TimeDilation",
    "default_sensealg",
    "setvjp",
]


# ---------------------------------------------------------------------------
# VJP backend choices
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VJPChoice:
    pass


@dataclass(frozen=True)
class AutoVJP(VJPChoice):
    """One jax.vjp pullback per RHS eval (EnzymeVJP/ZygoteVJP analogue)."""


@dataclass(frozen=True)
class JacVJP(VJPChoice):
    """Materialize ∂f/∂u and ∂f/∂p, then contract (reference Bool path)."""


@dataclass(frozen=True)
class FiniteDiffVJP(VJPChoice):
    """Central-finite-difference Jacobians contracted with λ — the
    numerical fallback at the end of the reference's backend chain
    (concrete_solve.jl:39-143, sensitivity_interface.jl:409-420). For RHS
    functions that JAX cannot differentiate (external calls via pure_callback,
    lookup tables, ...)."""

    eps: float = 1e-6


# ---------------------------------------------------------------------------
# Sensealgs
# ---------------------------------------------------------------------------


class AbstractSensealg:
    pass


class AbstractAdjointSensealg(AbstractSensealg):
    pass


class AbstractShadowingSensealg(AbstractSensealg):
    pass


@dataclass(frozen=True)
class ForwardSensitivity(AbstractSensealg):
    """Continuous forward sensitivity: augmented [u; S] ODE with
    Ṡⱼ = J·Sⱼ + ∂f/∂pⱼ (reference: src/forward_sensitivity.jl:152-209).
    Each column is one `jax.jvp` of f in the (Sⱼ, eⱼ) direction, vmapped
    over columns."""

    autojacvec: VJPChoice = AutoVJP()


@dataclass(frozen=True)
class ForwardDiffSensitivity(AbstractSensealg):
    """Discrete forward mode through the solver loop — the
    discretize-then-optimize forward path (reference:
    src/concrete_solve.jl:1259-1720). `jax.jacfwd` through the adaptive
    while_loop (JVP of while_loop is exact in JAX); the reverse rule
    contracts the resulting J with the incoming cotangent. chunk_size
    bounds how many tangents propagate per sweep (reference default 12,
    concrete_solve.jl:1307-1317)."""

    chunk_size: int = 0  # 0 => all directions in one vmapped sweep


@dataclass(frozen=True)
class BacksolveAdjoint(AbstractAdjointSensealg):
    """O(1)-memory adjoint: augmented reverse state [λ; q; u], the ODE
    re-solved backwards; `checkpointing` snaps u back to forward saveat
    values at each segment boundary for stability (reference:
    src/backsolve_adjoint.jl, checkpoint snap :523-572).

    recon_guard: backward re-integration of u is exponentially UNSTABLE
    for dissipative dynamics (diffusion: errors grow as exp(D·k²·t) in
    reverse — the instability the reference's docs warn about). The
    reverse pass ends at t0, where the true u0 is known exactly; if the
    reconstructed u(t0) drifts by more than `recon_guard` relative
    (‖u_rec−u0‖/(1+‖u0‖)), the gradient was contracted against a wrong
    trajectory and is NaN-poisoned loudly (retcode 3) instead of being
    returned silently wrong. None disables the check. Remedies: denser
    saveat (each save point snaps u back), checkpointing=True (default),
    or InterpolatingAdjoint(checkpointing=True) / DirectAdjoint()."""

    autojacvec: VJPChoice = AutoVJP()
    checkpointing: bool = True
    recon_guard: Optional[float] = 1e-2
    # The reference's `noisemixing` knob (sensitivity_algorithms.jl:1679) has
    # no analogue here: the SDE adjoints replay the exact stored trajectory
    # (discrete adjoint over the forward grid), which is exact for mixing and
    # non-mixing diffusions alike, so the flag is intentionally absent.


@dataclass(frozen=True)
class InterpolatingAdjoint(AbstractAdjointSensealg):
    """Adjoint ODE over [λ; q] with the forward trajectory supplied by
    dense interpolation — or by per-interval re-solves when checkpointing
    (reference: src/interpolating_adjoint.jl).

    checkpoints: optional tuple of times (static floats) used as ADDITIONAL
    re-solve interval boundaries, decoupled from saveat (the reference
    accepts an independent checkpoint grid, interpolating_adjoint.jl:43-126)
    — denser checkpoints trade forward-state memory for shorter (cheaper,
    better-bounded) per-interval re-solves.

    pinned_reverse: None (auto) / True / False — integrate the reverse pass
    PINNED to the forward's accepted grid (one reverse step per stored
    interval, no controller, no interval searches; embedded error still
    monitored and flagged loudly). Auto enables it for explicit-RK reverse
    passes without events/DAE structure.

    pinned_fallback: with auto pinning (pinned_reverse=None), rerun the
    adaptive joined reverse when the pinned pass flags its error guard
    (stiff adjoints need finer reverse steps than the forward grid). The
    rerun is a `lax.cond`; under `vmap` (ensembles / batched training)
    cond lowers to `select`, so BOTH reverse passes execute for every
    batch element — set pinned_fallback=False there to keep the
    single-pass pinned reverse (failures then NaN-poison loudly, as with
    pinned_reverse=True)."""

    autojacvec: VJPChoice = AutoVJP()
    checkpointing: bool = False
    checkpoints: Optional[tuple] = None
    pinned_reverse: Optional[bool] = None
    pinned_fallback: bool = True


@dataclass(frozen=True)
class QuadratureAdjoint(AbstractAdjointSensealg):
    """Reverse solve of λ only (dense), then dG/dp by h-adaptive
    Gauss–Kronrod quadrature of λᵀ∂f/∂p (reference:
    src/quadrature_adjoint.jl; quadgk driver :536-633).

    The base partition is one GK(7,15) panel per recorded reverse step (the
    solver's own step clustering gives quadgk-like adaptivity for free); on
    top of that a budgeted worklist bisects the interval with the largest
    embedded error estimate until Σerr ≤ max(abstol, reltol·‖dG/dp‖) or
    every refinable interval has reached `max_depth` splits."""

    autojacvec: VJPChoice = AutoVJP()
    abstol: float = 1e-6
    reltol: float = 1e-3
    max_depth: int = 6  # per-interval bisection depth bound
    # no pinned_reverse here: the λ-only reverse collects its own dense
    # output for the post-hoc quadrature, which the pinned driver does not
    # produce — Gauss/GK are the pinnable λ-only designs


@dataclass(frozen=True)
class GaussAdjoint(AbstractAdjointSensealg):
    """Reverse solve of λ with dG/dp accumulated *during* the solve by
    fixed-order Gauss quadrature on each accepted step (integrating-callback
    design, reference: src/gauss_adjoint.jl:806-851). Default continuous
    adjoint, as in the reference heuristic (concrete_solve.jl:271-316)."""

    autojacvec: VJPChoice = AutoVJP()
    checkpointing: bool = False
    n_nodes: int = 7  # Gauss-Legendre nodes per accepted reverse step
    checkpoints: Optional[tuple] = None  # see InterpolatingAdjoint
    # pinned_reverse here is OPT-IN ONLY (measured 0.90× — the per-step
    # quadrature hook runs once per forward interval, and the forward grid
    # is the denser one); True keeps the loud NaN-poison on guard failure,
    # exactly like InterpolatingAdjoint(pinned_reverse=True). There is no
    # pinned_fallback: auto mode never pins this design.
    pinned_reverse: Optional[bool] = None


@dataclass(frozen=True)
class GaussKronrodAdjoint(AbstractAdjointSensealg):
    """GaussAdjoint with a true Gauss–Kronrod (7,15) pair per accepted
    reverse step (the reference's IntegratingGKSumCallback variant,
    src/sensitivity_algorithms.jl:689, gauss_adjoint.jl:815-825): the
    embedded 7-point Gauss estimate yields a per-step quadrature error; a
    step whose error exceeds max(abstol·|Δt|/T, reltol·‖contribution‖) is
    bisected in place up to `max_depth` levels, and the total accumulated
    error estimate is surfaced as a warning when it exceeds the tolerance
    (knobs the reference's variant does not expose)."""

    autojacvec: VJPChoice = AutoVJP()
    checkpointing: bool = False
    abstol: float = 1e-8
    reltol: float = 1e-6
    max_depth: int = 2  # per-step conditional bisection depth
    pinned_reverse: Optional[bool] = None  # opt-in only, see GaussAdjoint


@dataclass(frozen=True)
class DirectAdjoint(AbstractSensealg):
    """Discrete (discretize-then-optimize) reverse AD through a bounded,
    reverse-differentiable solver loop — the TPU-native stand-in for the
    whole TrackerAdjoint/ReverseDiffAdjoint/ZygoteAdjoint/EnzymeAdjoint
    family (reference: src/concrete_solve.jl:1722-2415). Uses a
    `lax.scan` with masked fixed trip count so XLA can build the reverse
    pass; memory O(max_steps) and exact gradients of the discrete scheme.
    remat=True rematerializes each step in the backward pass
    (jax.checkpoint) — residual memory drops from O(max_steps·stages·n)
    to O(max_steps·n) for one extra forward evaluation per step."""

    max_steps: int = 0  # 0 => inherit solve's max_steps
    remat: bool = False


@dataclass(frozen=True)
class ForwardDiffOverAdjoint(AbstractSensealg):
    """Second-order composition selector (reference:
    src/sensitivity_algorithms.jl:1760, second_order.jl): forward mode OVER
    a continuous adjoint for Hessians / Hessian-vector products.
    `second_order_sensitivities` / `second_order_sensitivity_product`
    accept it as `sensealg=` and run jacfwd over the explicit
    forward-solve + reverse-λ program of the wrapped adjoint. Not a
    first-order sensealg — `solve()` rejects it."""

    adjalg: AbstractSensealg = None  # None => GaussAdjoint()


@dataclass(frozen=True)
class SteadyStateAdjoint(AbstractAdjointSensealg):
    """Implicit-function-theorem adjoint for f(u,p)=0: solve
    (∂f/∂u)ᵀλ = ∂g/∂u then dG/dp = -λᵀ∂f/∂p (reference:
    src/steadystate_adjoint.jl). linsolve='direct' (dense) for small n,
    'gmres' matrix-free above `dense_cutoff` (reference needs_jac
    heuristic n<=50, :66-72)."""

    autojacvec: VJPChoice = AutoVJP()
    linsolve: Optional[str] = None  # None => size heuristic
    dense_cutoff: int = 50
    # Matrix-free-path robustness (reference fallback-chain semantics,
    # steadystate_adjoint.jl:162-174, sensitivity_interface.jl:409-420):
    # GMRES iterates to linsolve_reltol; the λ residual is then checked
    # against check_reltol — on failure, n <= dense_fallback_cutoff falls
    # back to a dense solve, larger systems NaN-poison the gradient.
    linsolve_reltol: float = 1e-10
    check_reltol: float = 1e-6
    dense_fallback_cutoff: int = 2000


# --- shadowing ---


@dataclass(frozen=True)
class AbstractWindowing:
    pass


@dataclass(frozen=True)
class CosWindowing(AbstractWindowing):
    """cos windowing of the LSS time average (reference :1005)."""


@dataclass(frozen=True)
class Cos2Windowing(AbstractWindowing):
    """cos^2 windowing (reference :1016)."""


@dataclass(frozen=True)
class TimeDilation(AbstractWindowing):
    """time-dilation regularization (reference :1033); `alpha` is the
    dilation strength (wE⁻¹ = Δt/(α²·dt), lss.jl:291-295)."""

    alpha: float = 10.0
    t0skip: float = 0.0
    t1skip: float = 0.0


@dataclass(frozen=True)
class ForwardLSS(AbstractShadowingSensealg):
    """Least-squares shadowing, forward formulation (reference: src/lss.jl).
    `g(u, p, t)` is the long-time-averaged objective (required for
    TimeDilation, reference check_for_g lss.jl:743)."""

    LSSregularizer: AbstractWindowing = field(default_factory=CosWindowing)
    g: Optional[object] = None


@dataclass(frozen=True)
class AdjointLSS(AbstractShadowingSensealg):
    LSSregularizer: AbstractWindowing = field(default_factory=lambda: TimeDilation(10.0))
    g: Optional[object] = None


@dataclass(frozen=True)
class NILSS(AbstractShadowingSensealg):
    """Non-intrusive LSS (reference: src/nilss.jl)."""

    nseg: int = 10
    nstep: int = 100
    nus: Optional[int] = None
    rng_seed: int = 1234
    g: Optional[object] = None


@dataclass(frozen=True)
class NILSAS(AbstractShadowingSensealg):
    """Adjoint-mode NILSS (reference: src/nilsas.jl)."""

    nseg: int = 10
    nstep: int = 100
    M: int = 2
    rng_seed: int = 1234
    g: Optional[object] = None


# ---------------------------------------------------------------------------
# Default heuristic
# ---------------------------------------------------------------------------


def default_sensealg(n: int, np_: int, has_params: bool, is_ode: bool = True,
                     has_callbacks: bool = False, fixed_grid: bool = False,
                     unroll: bool = False) -> AbstractSensealg:
    """Mirror of `automatic_sensealg_choice` (reference:
    src/concrete_solve.jl:145-345), with the VJP-probing collapsed away —
    `jax.vjp` always applies, so only the problem-shape rules remain —
    plus the MEASURED v5e execution-mode rules (docs/tpu_performance.md
    decision table; VERDICT r4 #3 wired them into dispatch):

      unroll=True, ODE      -> DirectAdjoint (the masked-scan drivers; the
                               measured-best unrolled mode — spiral device
                               grad/fwd 1.59x vs Gauss-unrolled's drift)
      fixed grid, n >= 16384,
      p <= 128, ODE,
      no callbacks          -> BacksolveAdjoint (fixed-grid continuous:
                               the lambda reverse takes only the steps
                               accuracy demands — measured 1.31-1.34x
                               forward at 262k/1M states vs the 2x-floored
                               exact discrete AD at 2.25-2.65x). The p cap
                               keeps this to the measured win regime —
                               cheap analytic fields (PDE stencils) whose
                               reverse is bandwidth-bound. A large-p field
                               is a neural network: there exact discrete
                               AD is the 3x-FLOP-floor optimum (it reuses
                               forward residuals; measured
                               neural_ode_mxu_grad roofline ~1.0), while
                               the continuous reverse re-linearizes the
                               net per reverse stage and its backward
                               u-re-integration of a trained field ground
                               to ~370x the floor in the B=1024 n=512
                               MXU bench. Backward
                               u-reconstruction can be unstable for
                               dissipative dynamics over long horizons
                               (the reference's heuristic avoids Backsolve
                               for this reason) — here the default stays
                               fast but SAFE: save-time snaps
                               (checkpointing=True) plus the recon_guard
                               drift check at t0 NaN-poison rather than
                               return silently wrong gradients; the
                               remedy list is in BacksolveAdjoint's
                               docstring.
      n + p <= 100          -> ForwardDiffSensitivity (crossover rule :177-183)
      no parameters         -> QuadratureAdjoint (:271-282)
      plain ODE             -> GaussAdjoint (:283-316)
      otherwise             -> InterpolatingAdjoint

    The fixed-grid rule changes the default gradient from exact-discrete
    to continuous-adjoint (rel err ~5e-8 at adj_rtol 1e-3 on the PDE
    bench) — same trade the reference's heuristic makes by defaulting to
    continuous adjoints everywhere.
    """
    if unroll and is_ode:
        return DirectAdjoint()
    if (fixed_grid and is_ode and has_params and not has_callbacks
            and n >= 16384 and np_ <= 128):
        return BacksolveAdjoint()
    if n + np_ <= 100 and not has_callbacks:
        return ForwardDiffSensitivity()
    if not has_params:
        return QuadratureAdjoint()
    if is_ode:
        return GaussAdjoint()
    return InterpolatingAdjoint()


def setvjp(sensealg: AbstractSensealg, vjp: VJPChoice) -> AbstractSensealg:
    """Replace the vjp backend of a sensealg (reference `setvjp`,
    sensitivity_algorithms.jl:273 etc.)."""
    if hasattr(sensealg, "autojacvec"):
        return dataclasses.replace(sensealg, autojacvec=vjp)
    return sensealg


# ---------------------------------------------------------------------------
# Migration compat aliases (reference export-list parity; mapping table in
# docs/migration_from_sciml.md). JAX has ONE AD engine, so the reference's
# five discrete-AD adjoint wrappers (sensitivity_algorithms.jl:744-913)
# collapse onto DirectAdjoint, and its per-backend VJP menu
# (:1454-1605) onto the fused AutoVJP pullback. These factories accept and
# ignore the reference's configuration arguments (compile=, mode=,
# allow_nothing=, ...) so reference call sites run unchanged.
# ---------------------------------------------------------------------------


def _discrete_ad_alias(ref_name, ref_line):
    def make(*_args, **_kwargs):
        return DirectAdjoint()

    make.__name__ = ref_name
    make.__qualname__ = ref_name
    make.__doc__ = (
        f"Reference discrete-AD adjoint (sensitivity_algorithms.jl:"
        f"{ref_line}) — alias of DirectAdjoint(); JAX has a single AD "
        f"engine, so the backend choice collapses. Configuration arguments "
        f"are accepted and ignored."
    )
    return make


TrackerAdjoint = _discrete_ad_alias("TrackerAdjoint", 744)
MooncakeAdjoint = _discrete_ad_alias("MooncakeAdjoint", 769)
ReverseDiffAdjoint = _discrete_ad_alias("ReverseDiffAdjoint", 791)
ZygoteAdjoint = _discrete_ad_alias("ZygoteAdjoint", 814)
EnzymeAdjoint = _discrete_ad_alias("EnzymeAdjoint", 845)


def _vjp_alias(ref_name, ref_line):
    def make(*_args, **_kwargs):
        return AutoVJP()

    make.__name__ = ref_name
    make.__qualname__ = ref_name
    make.__doc__ = (
        f"Reference VJP backend (sensitivity_algorithms.jl:{ref_line}) — "
        f"alias of AutoVJP(): one fused jax.vjp pullback computes "
        f"(f(y), λᵀ∂f/∂u, λᵀ∂f/∂p), exactly the reference's EnzymeVJP "
        f"triple (derivative_wrappers.jl:982-1145). Arguments (compile=, "
        f"allow_nothing=, ...) are accepted and ignored."
    )
    return make


ZygoteVJP = _vjp_alias("ZygoteVJP", 1454)
EnzymeVJP = _vjp_alias("EnzymeVJP", 1488)
TrackerVJP = _vjp_alias("TrackerVJP", 1522)
ReverseDiffVJP = _vjp_alias("ReverseDiffVJP", 1555)
MooncakeVJP = _vjp_alias("MooncakeVJP", 1574)
ReactantVJP = _vjp_alias("ReactantVJP", 1599)


@dataclass(frozen=True)
class UnconstrainedOptimizationAdjoint(SteadyStateAdjoint):
    """Differentiates argmin_u φ(u, p) by IFT on ∇_u φ = 0 — the
    SteadyStateAdjoint machinery applied to the optimality condition
    (reference sensitivity_algorithms.jl:1397, concrete_solve.jl:2679-2826).
    Accepted by `solve_unconstrained_optimization(..., sensealg=...)`."""


def supports_functor_params(_sensealg) -> bool:
    """Reference trait (sensitivity_algorithms.jl:1697): which sensealgs
    accept arbitrary structured parameters. Every algorithm here takes
    pytree `p` natively, so the answer is always True."""
    return True


__all__ += [
    "TrackerAdjoint", "MooncakeAdjoint", "ReverseDiffAdjoint",
    "ZygoteAdjoint", "EnzymeAdjoint",
    "ZygoteVJP", "EnzymeVJP", "TrackerVJP", "ReverseDiffVJP",
    "MooncakeVJP", "ReactantVJP",
    "UnconstrainedOptimizationAdjoint", "supports_functor_params",
]
