"""Reference-compatible API facade.

One import surface mirroring the names an ODINN.jl user knows
(/root/reference/src/ODINN.jl re-exports + Huginn/Muninn/Sleipnir public API,
SURVEY §2.8), mapped onto the TPU-native implementations:

    from odinn_tpu.api import *

    params  = Parameters(simulation=SimulationParameters(...), ...)
    model   = Model(iceflow=SIA2Dmodel(params, A=LawA(nn, params)),
                    mass_balance=TImodel1())
    glaciers = initialize_glaciers(rgi_ids, params)
    sim = Inversion(model=model, glaciers=glaciers, parameters=params)
    run(sim)

Naming notes: Julia's ``run!`` is :func:`run` (dispatches on
Prediction/Inversion); ``SciMLSensitivityAdjoint`` is :class:`JaxAdjoint`
(reverse-mode AD through the solve is native here); ``EnzymeVJP`` is
:class:`AutoVJP`.
"""

from __future__ import annotations

from typing import Any, Optional

# parameters -----------------------------------------------------------------
from odinn_tpu.core.params import (
    Hyperparameters,
    InversionParameters,
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)

UDEparameters = UDEParameters  # reference spelling

# data -----------------------------------------------------------------------
from odinn_tpu.core.glacier import (
    Climate2D,
    DhdtData,
    DummyClimate2D,
    Glacier,
    SurfaceVelocityData,
    ThicknessData,
    is_in_glacier,
    regrid_velocity_data,
    stack_glaciers,
)

Glacier2D = Glacier  # reference spelling
dhdtData = DhdtData

from odinn_tpu.data.halfar import Halfar, HalfarParameters, halfar_solution, halfar_velocity
from odinn_tpu.data.rgi import (
    fake_multi_datacube,
    get_rgi_paths,
    initialize_glaciers,
)
from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate

# physics / models -----------------------------------------------------------
from odinn_tpu.models.model import Model, SIA2DModel, init_theta
from odinn_tpu.models.nn import NeuralNetwork, default_architecture, fourier_feature
from odinn_tpu.models.nn_utils import pretraining
from odinn_tpu.models.initial_condition import InitialCondition
from odinn_tpu.models.mb_machine import CustomMLP, load_model, save_model
from odinn_tpu.physics.mass_balance import TImodel1, validate_model_simulation_compatibility
from odinn_tpu.physics.sia2d import sia2d_rhs, surface_velocity, v_from_h
from odinn_tpu.physics.targets import ATarget, CappedTarget, DHybridTarget, DPureTarget

# reference spellings (/root/reference/src/models/targets/*.jl exports)
SIA2D_A_target = ATarget
SIA2D_D_hybrid_target = DHybridTarget
SIA2D_D_target = DPureTarget


def SIA2Dmodel(params=None, A=None, C=None, n=None, Y=None, U=None,
               n_H=None, n_gradS=None, n_value=None, p_value=None, q_value=None):
    """Huginn.SIA2Dmodel-style constructor (slot keywords; the ``params``
    positional is accepted for signature parity and unused, as in the
    reference where it only threads defaults)."""
    return SIA2DModel(A=A, C=C, n=n, Y=Y, U=U, n_H=n_H, n_gradS=n_gradS,
                      n_value=n_value, p_value=p_value, q_value=q_value)


# laws -----------------------------------------------------------------------
from odinn_tpu.laws.laws import (
    ConstantA,
    CuffeyPaterson,
    Law,
    LawA,
    LawA_inversion,
    LawC,
    LawC_inversion,
    LawN_inversion,
    LawU,
    LawY,
    SyntheticC,
    eval_law,
    poly_A_paterson_cuffey,
)

polyA_PatersonCuffey = poly_A_paterson_cuffey


def GlacierWideInv(params, grid_shape=None):
    """Per-glacier scalar-A inversion component
    (/root/reference/src/models/trainable_components/InvComponents.jl export
    ``GlacierWideInv``): one trainable A per glacier."""
    return LawA_inversion(params, scalar=True, grid_shape=grid_shape)


def GriddedInv(params, grid_shape):
    """Per-pixel gridded-A inversion component (reference ``GriddedInv``)."""
    return LawA_inversion(params, scalar=False, grid_shape=grid_shape)

from odinn_tpu.laws.inputs import (
    AvgGriddedTemp,
    AvgScalarTemp,
    CPDD,
    GradSInput,
    HbarInput,
    TopoRough,
)

iAvgScalarTemp = AvgScalarTemp
iAvgGriddedTemp = AvgGriddedTemp
iCPDD = CPDD
iHbar = HbarInput
iGradS = GradSInput
iTopoRough = TopoRough

# losses ----------------------------------------------------------------------
from odinn_tpu.losses.losses import L2Sum, LogSum, LossH, LossHV, LossV, MultiLoss
from odinn_tpu.losses.regularization import (
    DiffusivityRegularization,
    InitialThicknessRegularization,
    RheologyRegularization,
    TikhonovRegularization,
    VelocityRegularization,
)
from odinn_tpu.losses.time_aggregated import LossAvgV, LossDhdt

# inverse ----------------------------------------------------------------------
from odinn_tpu.inverse.adjoint_types import (
    AutoVJP,
    ContinuousAdjoint,
    ContinuousVJP,
    DiscreteAdjoint,
    DiscreteVJP,
    DummyAdjoint,
    JaxAdjoint,
    NoVJP,
)

SciMLSensitivityAdjoint = JaxAdjoint
EnzymeVJP = AutoVJP

# Hand-written VJP/gradient surface under its reference names
# (/root/reference/src/inverse exports: SIA2D_grad!, VJP_λ_∂SIA∂H_*,
# VJP_λ_∂SIA∂θ_*, backward_loss). ``∂`` is not a valid Python identifier
# character, so the ASCII spellings substitute ``d`` for it.
from functools import partial as _partial

from odinn_tpu.inverse.gradient import glacier_adjoint_value_and_grad, make_adjoint_value_and_grad
from odinn_tpu.inverse.vjps import vjp_sia_dH, vjp_sia_dtheta
from odinn_tpu.losses.losses import backward_simple_loss as backward_loss

SIA2D_grad = make_adjoint_value_and_grad
VJP_λ_dSIA_dH_discrete = _partial(vjp_sia_dH, "discrete")
VJP_λ_dSIA_dH_continuous = _partial(vjp_sia_dH, "continuous")
VJP_λ_dSIA_dθ_discrete = _partial(vjp_sia_dtheta, "discrete")
VJP_λ_dSIA_dθ_continuous = _partial(vjp_sia_dtheta, "continuous")

# simulation -------------------------------------------------------------------
from odinn_tpu.simulation.inversion import Inversion, run_inversion, train_ude
from odinn_tpu.simulation.prediction import (
    Prediction,
    calibrate_substeps,
    generate_ground_truth,
    resolve_substeps,
    run_prediction,
)
from odinn_tpu.simulation.results import Results, TrainingStats
from odinn_tpu.simulation.solver import (
    build_tstops,
    integrate_adaptive,
    integrate_scan,
    suggest_substeps,
)

train_UDE = train_ude


def run(simulation, **kwargs):
    """``run!`` equivalent: dispatch on the simulation type."""
    if isinstance(simulation, Prediction):
        return run_prediction(simulation, **kwargs)
    if isinstance(simulation, Inversion):
        return run_inversion(simulation, **kwargs)
    raise TypeError(f"cannot run {type(simulation).__name__}")


# utils --------------------------------------------------------------------------
from odinn_tpu.utils.io import (
    TrainingResult,
    load_inversion_file,
    restore_checkpoint,
    save_checkpoint,
    save_inversion_file,
    save_results_file,
)
from odinn_tpu.utils.logging import TrainingLogger
from odinn_tpu.utils.plotting import (
    plot_cumulative_mb,
    plot_glacier,
    plot_glacier_vid,
    plot_gridded_data,
    plot_law,
)
from odinn_tpu.utils.time_utils import (
    datetime_to_floatyear,
    floatyear_to_datetime,
    ind_from_t,
    stop_condition_tstops,
)

indFromT = ind_from_t

from odinn_tpu.utils.flatten import theta_to_vector, vector_to_theta

# reference's ComponentArrays bridge (Vector2ComponentVector / inverse):
# θ here is a pytree, the flat view is a jnp vector.
Vector2ComponentVector = vector_to_theta
ComponentVector2Vector = theta_to_vector

# parallel -----------------------------------------------------------------------
from odinn_tpu.parallel.mesh import make_mesh, pad_batch_to, replicate, shard_glacier_axis
from odinn_tpu.parallel.spatial import make_mesh_2d
from odinn_tpu.parallel.multiprocess import (
    gather_to_host,
    global_mesh,
    init_distributed,
)
from odinn_tpu.simulation.region_inversion import region_split_inversion

# uncertainty quantification (beyond-parity) --------------------------------------
from odinn_tpu.inverse.uncertainty import (
    LaplacePosterior,
    laplace_posterior,
    laplace_uncertainty,
)

# multi-start ensemble training (beyond-parity) ------------------------------------
from odinn_tpu.simulation.ensemble import (
    MultistartResult,
    init_restarts,
    multistart_train,
)

# derivative-free ensemble Kalman inversion (beyond-parity) ------------------------
from odinn_tpu.simulation.eki import (
    EKIResult,
    eki_train,
)


def enable_multiprocessing(params=None, workers: Optional[int] = None,
                           rows: int = 1):
    """The reference's Distributed.jl bootstrap
    (/root/reference/src/setup/config.jl:97-139), TPU-native: scale-out is
    mesh sharding, not worker processes. Builds the device mesh AND registers
    it as the session's active mesh, so subsequent ``run``/``train_ude`` calls
    shard the glacier axis over it automatically — matching the reference's
    "enable once, every run! scales" semantics. Returns the mesh.

    ``rows > 1`` builds a 2-D ``(glaciers, rows)`` mesh instead: ``rows``
    devices cooperate on each glacier's grid (spatial row sharding for
    ice-sheet-scale domains, `parallel.spatial`), the rest scale out over
    glaciers — a composition the reference's per-glacier worker processes
    cannot express."""
    import warnings

    import jax as _jax

    from odinn_tpu.parallel.mesh import set_active_mesh

    n = workers or (params.simulation.workers if params is not None else None)
    n_dev = len(_jax.devices())
    if rows > 1:
        from odinn_tpu.parallel.spatial import make_mesh_2d

        # same degrade-gracefully clamp as the 1-D path: the glacier axis
        # shrinks to what the device count leaves after the row axis
        max_g = n_dev // rows
        if max_g < 1:
            raise ValueError(
                f"rows={rows} exceeds the {n_dev} visible devices")
        if n is not None and n > max_g:
            warnings.warn(
                f"requested {n} glacier-axis workers × {rows} rows but only "
                f"{n_dev} devices are visible; clamping the glacier axis to "
                f"{max_g}"
            )
            n = max_g
        return set_active_mesh(make_mesh_2d(n_glaciers=n, n_rows=rows))
    if n is not None and n > n_dev:
        warnings.warn(
            f"requested {n} workers but only {n_dev} devices are visible; "
            "sharding over the available mesh"
        )
        n = n_dev
    return set_active_mesh(make_mesh(n))
