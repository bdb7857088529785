"""scimlsensitivity_jl_tpu — a TPU-native sensitivity-analysis framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
SciML/SciMLSensitivity.jl (reference mounted at /root/reference; see
SURVEY.md for the structural analysis): gradients of ODE/SDE/steady-state
solutions with respect to parameters and initial conditions, via a menu of
continuous adjoints, forward sensitivity, discrete AD-through-the-solver,
implicit-function-theorem adjoints, and chaotic-shadowing methods — each a
`jax.custom_vjp` rule whose backward pass is another XLA-compiled solve.
"""

from .problems import (
    DDEProblem,
    NonlinearProblem,
    ODEProblem,
    RODEProblem,
    SDEProblem,
    SecondOrderODEProblem,
    SteadyStateProblem,
    remake,
)
from .sensealg import (
    AdjointLSS,
    AutoVJP,
    BacksolveAdjoint,
    Cos2Windowing,
    CosWindowing,
    DirectAdjoint,
    ForwardDiffOverAdjoint,
    ForwardDiffSensitivity,
    ForwardLSS,
    FiniteDiffVJP,
    ForwardSensitivity,
    GaussAdjoint,
    GaussKronrodAdjoint,
    InterpolatingAdjoint,
    JacVJP,
    NILSAS,
    NILSS,
    QuadratureAdjoint,
    SteadyStateAdjoint,
    TimeDilation,
    default_sensealg,
    setvjp,
    # migration compat aliases (reference export-list parity)
    EnzymeAdjoint,
    EnzymeVJP,
    MooncakeAdjoint,
    MooncakeVJP,
    ReactantVJP,
    ReverseDiffAdjoint,
    ReverseDiffVJP,
    TrackerAdjoint,
    TrackerVJP,
    UnconstrainedOptimizationAdjoint,
    ZygoteAdjoint,
    ZygoteVJP,
    supports_functor_params,
)
from .adjoints.forward import (
    ODEForwardSensitivityProblem,
    extract_local_sensitivities,
)
from .solution import ODESolution
from .solve import solve
from .adjoints.adjoint_problem import (AdjointSensitivityIntegrand,
                                       ODEAdjointProblem, RODEAdjointProblem,
                                       SDEAdjointProblem)
from .adjoints.interface import adjoint_sensitivities
from .adjoints.shadowing import (
    AdjointLSSProblem,
    ForwardLSSProblem,
    NILSASProblem,
    NILSSProblem,
    nilsas_shadow_adjoint,
    shadow_adjoint,
    shadow_forward,
)
from .adjoints.steadystate import (
    NonlinearSolution,
    solve_nonlinear,
    solve_unconstrained_optimization,
)
from .adjoints.second_order import (
    second_order_sensitivities,
    second_order_sensitivity_product,
)
from .callbacks import (CallbackSet, ContinuousCallback, DiscreteCallback,
                        PeriodicCallback, PresetTimeCallback,
                        TerminateSteadyState, VectorContinuousCallback)
from .ops.brownian import NoiseGrid, VirtualBrownianTree
from .parallel.ensemble import (EnsembleProblem, ensemble_summary,
                                make_mesh, solve_ensemble)
from .solvers.explicit import BS3, Dopri5, Euler, Heun, Midpoint, Tsit5
from .solvers.extrapolation import GBS, Vern9Like
from .solvers.fbdf import FBDF
from .solvers.rosenbrock import Rosenbrock23
from .solvers.seulex import Rodas4Like, Seulex
from .solvers.sde import (SOSRI, SRA1, SRIW1, AdaptiveMilstein, EulerHeun,
                          EulerMaruyama, ImplicitEM, Milstein, RKMilCommute, RKMilGeneral,
                          StrongTaylor15)
from .solvers.sdirk import SDIRK4, TRBDF2, Kvaerno3

__version__ = "0.1.0"

__all__ = [
    "ODEProblem",
    "SDEProblem",
    "NoiseGrid",
    "VirtualBrownianTree",
    "RODEProblem",
    "NonlinearProblem",
    "SteadyStateProblem",
    "SecondOrderODEProblem",
    "DDEProblem",
    "remake",
    "solve",
    "ODEForwardSensitivityProblem",
    "extract_local_sensitivities",
    "adjoint_sensitivities",
    "ODEAdjointProblem",
    "SDEAdjointProblem",
    "RODEAdjointProblem",
    "AdjointSensitivityIntegrand",
    "second_order_sensitivities",
    "second_order_sensitivity_product",
    "NonlinearSolution",
    "solve_nonlinear",
    "solve_unconstrained_optimization",
    "ForwardLSSProblem",
    "AdjointLSSProblem",
    "NILSSProblem",
    "NILSASProblem",
    "shadow_forward",
    "shadow_adjoint",
    "nilsas_shadow_adjoint",
    "ODESolution",
    "Tsit5",
    "Dopri5",
    "BS3",
    "Heun",
    "Midpoint",
    "Euler",
    "GBS",
    "Vern9Like",
    "Seulex",
    "FBDF",
    "Rodas4Like",
    "Rosenbrock23",
    "TRBDF2",
    "Kvaerno3",
    "SDIRK4",
    "EulerMaruyama",
    "EulerHeun",
    "Milstein",
    "RKMilCommute",
    "RKMilGeneral",
    "SRA1",
    "StrongTaylor15",
    "SRIW1",
    "SOSRI",
    "AdaptiveMilstein",
    "ImplicitEM",
    "ContinuousCallback",
    "DiscreteCallback",
    "VectorContinuousCallback",
    "PresetTimeCallback",
    "PeriodicCallback",
    "TerminateSteadyState",
    "CallbackSet",
    "EnsembleProblem",
    "solve_ensemble",
    "ensemble_summary",
    "make_mesh",
    "InterpolatingAdjoint",
    "BacksolveAdjoint",
    "QuadratureAdjoint",
    "GaussAdjoint",
    "GaussKronrodAdjoint",
    "DirectAdjoint",
    "ForwardDiffOverAdjoint",
    "ForwardSensitivity",
    "ForwardDiffSensitivity",
    "SteadyStateAdjoint",
    "ForwardLSS",
    "AdjointLSS",
    "NILSS",
    "NILSAS",
    "CosWindowing",
    "Cos2Windowing",
    "TimeDilation",
    "AutoVJP",
    "JacVJP",
    "FiniteDiffVJP",
    "default_sensealg",
    "setvjp",
    "TrackerAdjoint",
    "MooncakeAdjoint",
    "ReverseDiffAdjoint",
    "ZygoteAdjoint",
    "EnzymeAdjoint",
    "ZygoteVJP",
    "EnzymeVJP",
    "TrackerVJP",
    "ReverseDiffVJP",
    "MooncakeVJP",
    "ReactantVJP",
    "UnconstrainedOptimizationAdjoint",
    "supports_functor_params",
]
