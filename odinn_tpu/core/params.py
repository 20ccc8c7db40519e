"""Typed parameter containers.

TPU-native rebuild of the reference's parameter system:
- ``PhysicalParameters``  (Sleipnir; observed fields at
  /root/reference/test/params_construction.jl:24-34)
- ``SimulationParameters`` (Sleipnir; fields at
  /root/reference/test/test_grad_loss.jl:109-121)
- ``SolverParameters``     (Huginn; /root/reference/test/params_construction.jl:5-13)
- ``Hyperparameters``      (/root/reference/src/parameters/Hyperparameters.jl:18-81)
- ``UDEParameters``        (/root/reference/src/parameters/UDEparameters.jl:14-80)
- ``InversionParameters``  (/root/reference/src/parameters/InversionParameters.jl:18-70)
- composite ``Parameters`` (/root/reference/src/parameters/UDEparameters.jl:109-128)

Design: plain frozen dataclasses. They are *static* configuration — hashable, used
as closure constants for jit-compiled functions, never traced. All array-valued
state lives in pytrees (see :mod:`odinn_tpu.core.glacier`). This replaces the
reference's mutable structs without any of their in-place semantics, which do not
map onto XLA.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple, Union

__all__ = [
    "PhysicalParameters",
    "SimulationParameters",
    "SolverParameters",
    "Hyperparameters",
    "UDEParameters",
    "InversionParameters",
    "Parameters",
]


@dataclass(frozen=True)
class PhysicalParameters:
    """Physical constants of the ice-flow problem.

    Mirrors Sleipnir.PhysicalParameters (observed at
    /root/reference/test/params_construction.jl:24-34). Units follow the
    reference: ρ [kg m⁻³], g [m s⁻²], lengths in m, time in years.
    """

    rho: float = 900.0          # ice density
    g: float = 9.81             # gravitational acceleration
    epsilon: float = 1e-3       # numerical regularization ϵ
    eta0: float = 1.0           # η₀ upstream-thickness flux-clamp factor
    min_A: float = 8.5e-20      # Glen creep coefficient bounds [Pa⁻ⁿ yr⁻¹]
    max_A: float = 8e-17
    min_C: float = 0.0          # sliding coefficient bounds
    max_C: float = 1.0
    min_T_law: float = -25.0    # temperature range seen by T→A laws
    max_T_law: float = 1.0
    noise_A_magnitude: float = 5e-18


@dataclass(frozen=True)
class SimulationParameters:
    """Global simulation switches.

    Mirrors Sleipnir.SimulationParameters (fields observed at
    /root/reference/test/test_grad_loss.jl:109-121).
    """

    tspan: Tuple[float, float] = (2010.0, 2015.0)
    use_MB: bool = True
    use_iceflow: bool = True
    use_velocities: bool = True
    plots: bool = False
    overwrite_climate: bool = False
    step_MB: float = 1.0 / 12.0      # mass-balance callback period [yr]
    multiprocessing: bool = False    # kept for API parity; superseded by mesh sharding
    workers: int = 1
    test_mode: bool = False
    working_dir: str = ""
    rgi_paths: Any = None
    grid_scaling_factor: int = 1
    f_surface_velocity_factor: float = 1.0
    mapping: Any = None
    climate_data_source: str = "dummy"
    # TPU-native extras
    float_dtype: str = "float64"     # "float32" on TPU benches, "float64" for parity tests


@dataclass(frozen=True)
class SolverParameters:
    """Time-integration configuration.

    Mirrors Huginn.SolverParameters (/root/reference/test/params_construction.jl:5-13).
    The reference defaults to the adaptive RDPK3Sp35 solver at ``reltol``
    (inversion_utils.jl:559-568); here ``reltol`` is honored three ways:

    - ``adaptive=True``: the error-controlled BS3(2) integrator at
      rtol = atol = reltol (forward-only — Prediction/ground truth; the
      while_loop has no reverse rule, so train_ude rejects it loudly).
    - ``adaptive="replay"``: record-and-replay — one adaptive forward per
      glacier records its accepted dt sequence, which then drives a fixed
      ``lax.scan`` replay that reproduces the error-controlled trajectory to
      roundoff AND is reverse-differentiable: the exact gradient of the
      adaptive solve with the accepted grid held fixed, the reference's
      InterpolatingAdjoint-through-adaptive-solve contract
      (UDEparameters.jl:14-80). Resolved by train_ude/run_prediction via
      ``prediction.resolve_replay``.
    - ``substeps="auto"``: probe solves calibrate the fixed substep count
      from reltol, which then drives the differentiable ``lax.scan`` solve —
      explicit solvers calibrate from one adaptive BS3(2) probe
      (``prediction.calibrate_substeps``); the semi-implicit solvers (SI/SI2)
      calibrate from Richardson step-halving probes whose free error
      indicator auto-sizes substeps and cg_iters
      (``prediction.calibrate_substeps_si``).
    """

    solver: str = "RK4"             # "RK4" | "SSPRK3" | "Euler" | "RKC" (stabilized
                                    # Chebyshev) | "SI" (semi-implicit, unconditionally
                                    # stable) | "SI2" (Crank–Nicolson + Picard midpoint
                                    # diffusivity: 2nd-order at ~1.6× SI cost; MB stays
                                    # Lie-applied at interval ends — the model definition)
    reltol: float = 1e-8
    step: float = 1.0 / 12.0        # save/callback step (tstop spacing) [yr]
    substeps: Union[int, str] = 20  # fixed substeps per tstop interval (scan
                                    # path); "auto" calibrates from reltol
    rkc_stages: int = 16            # stage count for the RKC stabilized stepper
    cg_iters: int = 30              # CG iterations for the semi-implicit solver
    cg_iters_predictor: int = 6     # CG iterations for SI2's predictor solve
                                    # (feeds only the midpoint-D evaluation)
    save_everystep: bool = False
    tstops: Optional[Tuple[float, ...]] = None
    progress: bool = False
    progress_steps: int = 10
    maxiters: int = 50_000
    adaptive: Union[bool, str] = False  # True: error-controlled while_loop
                                    # path (forward-only); "replay": record
                                    # accepted dts once, replay as a fixed
                                    # differentiable schedule (see class doc)
    # resolved recorded schedule, shape (n_glaciers, n_intervals, cap) — set
    # by prediction.resolve_replay, not by hand. compare/hash excluded: an
    # array field would otherwise break the frozen dataclass's generated
    # __eq__ ("truth value of an array is ambiguous") and __hash__
    replay_dts: Any = field(default=None, compare=False, hash=False)
    remat: bool = True              # rematerialize intervals in reverse-mode
                                    # (O(n_tstops) memory); False trades memory
                                    # for backward speed on small problems
    compensated: bool = False       # Kahan-compensated f32 state accumulation
                                    # (Euler/SSPRK3/RK4): removes the O(√K·ε)
                                    # per-substep rounding walk — near-f64
                                    # trajectory accuracy at f32 speed (the
                                    # TPU answer to the reference's Float64
                                    # default; see solver.integrate_scan)


@dataclass(frozen=True)
class Hyperparameters:
    """Training hyperparameters.

    Mirrors /root/reference/src/parameters/Hyperparameters.jl:18-81. ``optimizer``
    and ``epochs`` may be sequences for staged training (e.g. ADAM→LBFGS with
    warm-started θ, /root/reference/src/simulations/inversions/inversion_utils.jl:37-59).
    The reference's mutable ``current_epoch``/``current_minibatch`` progress
    counters have no analogue here: config is frozen (jit closure constants);
    run progress lives in :class:`~odinn_tpu.simulation.results.TrainingStats`
    (``niter``).
    """

    optimizer: Union[str, Tuple[str, ...]] = "lbfgs"
    learning_rate: Union[float, Tuple[float, ...]] = 1e-3
    epochs: Union[int, Tuple[int, ...]] = 50
    batch_size: int = 15
    gn_cg_iters: int = 8    # CG iterations per Gauss-Newton ("lm") stage
    gn_precond: bool = True  # per-leaf Jacobi preconditioning of the LM CG
    # Split gn_cg_iters into this many CG rounds, each restarted from the
    # EXACT residual r = -g - (JᵀJ+λD)x of the accumulated iterate. In f32,
    # single-shot CG loses conjugacy after O(100) iterations (the recurrence
    # residual rounds away from the true one) and can converge WORSE with
    # more iterations; exact-residual restarts restore monotone deep-CG
    # convergence for one extra GGN matvec per round. 1 = classic CG.
    gn_cg_restarts: int = 1
    # Per-glacier loss normalization for "lm" stages: scale glacier g's
    # residual block by 1/(L_g(θ_start) + 0.01·mean_g L_g) so slow (cold)
    # glaciers — whose residuals are small regardless of parameter error —
    # constrain the fit as strongly as fast ones. The normalized objective
    # has the same global optimum (zero residual); reported best/final losses
    # remain the UN-normalized objective.
    gn_glacier_norm: bool = False
    # LBFGS linesearch: "auto" picks zoom in f64 and backtracking-Armijo in
    # f32 — optax's zoom linesearch can loop without terminating in f32 at
    # loss scales ~0.1-1 (its bracketing interval collapses below f32
    # resolution); backtracking only ever shrinks the step, so it cannot hang
    lbfgs_linesearch: str = "auto"   # "auto" | "zoom" | "backtracking"
    # Gradient accumulation over glacier chunks (grad="jax" path): the
    # full-batch loss/gradient is computed as a sequential lax.scan over
    # ``grad_accum_chunks`` equal chunks of the glacier axis, bounding the
    # live reverse-mode trajectory to one chunk's. Exact full-batch
    # semantics at 1/k the memory — at 512 glaciers/128² this beats
    # per-interval rematerialization ~2.5x (chunking re-runs nothing;
    # remat re-runs every interval's forward in the backward sweep).
    # "auto" chunks the batch to ~64-glacier chunks (the measured TPU
    # sweet spot: chunking helps even when memory fits — at 256
    # glaciers/128² accum 1/2/4 measured 1298/1838/1943 g/s — smaller
    # live trajectories schedule better); batches under 64 stay unchunked.
    grad_accum_chunks: Union[int, str] = 1


@dataclass(frozen=True)
class UDEParameters:
    """UDE/inversion configuration.

    Mirrors /root/reference/src/parameters/UDEparameters.jl:14-80.

    ``grad`` names the adjoint method (see odinn_tpu.inverse.adjoint_types):
      - "jax"        — reverse-mode AD through the checkpointed solve
                       (TPU-native equivalent of SciMLSensitivityAdjoint)
      - "discrete"   — hand-written discrete adjoint (reverse Euler over tstops)
      - "continuous" — continuous adjoint with Gauss-quadrature θ contraction
      - "forward"    — forward-mode (tangent) gradients, beyond-parity: one
                       jvp per θ leaf via the per-glacier block structure.
                       Per-glacier SCALAR θ only (classical inversions);
                       O(1) memory in the time horizon — no reverse pass,
                       no trajectory storage
      - "dummy"      — DummyAdjoint for pipeline testing
    """

    sensealg: str = "interpolating"           # kept for parity; unused by "jax" path
    optim_autoAD: str = "jax"
    # Default differs from the reference (ContinuousAdjoint,
    # UDEparameters.jl:14-80): reverse-mode AD through the checkpointed solve
    # is exact here, so it is the default; set "continuous"/"discrete" (or
    # adjoint instances) for the manual paths.
    grad: Any = "jax"
    optimization_method: str = "AD+AD"
    empirical_loss_function: Any = None       # AbstractLoss; default MultiLoss((LossH(),),(1.0,))
    target: str = "A"                         # "A" | "D_hybrid" | "D"
    initial_condition_filter: str = "identity"  # "identity" | "softplus" | "Zang1980"


@dataclass(frozen=True)
class InversionParameters:
    """Legacy region-split inversion configuration.

    Mirrors /root/reference/src/parameters/InversionParameters.jl:18-70.
    """

    initial_conditions: Tuple[float, ...] = (1.0,)
    lower_bound: Tuple[float, ...] = (0.0,)
    upper_bound: Tuple[float, ...] = (1.0,)
    regions_split: Tuple[int, int] = (1, 1)
    x_tol: float = 1e-3
    f_tol: float = 1e-3
    solver: str = "lbfgs"


@dataclass(frozen=True)
class Parameters:
    """Composite parameter object.

    Mirrors the ``Parameters(...)`` constructor at
    /root/reference/src/parameters/UDEparameters.jl:109-128 (without
    `enable_multiprocessing`: scale-out is mesh sharding, configured in
    odinn_tpu.parallel).
    """

    physical: PhysicalParameters = field(default_factory=PhysicalParameters)
    simulation: SimulationParameters = field(default_factory=SimulationParameters)
    solver: SolverParameters = field(default_factory=SolverParameters)
    hyper: Hyperparameters = field(default_factory=Hyperparameters)
    UDE: UDEParameters = field(default_factory=UDEParameters)
    inversion: InversionParameters = field(default_factory=InversionParameters)

    def replace(self, **kwargs) -> "Parameters":
        return dataclasses.replace(self, **kwargs)
