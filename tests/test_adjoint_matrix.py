"""Manual-adjoint FD-parity matrix: targets × losses × adjoints.

Mirrors the reference's gradient test matrix beyond the A-target rows of
tests/test_gradients.py (/root/reference/test/runtests.jl:154-205):

- D_hybrid (LawY) and D (LawU) targets under the manual adjoints
  (runtests.jl:174-193 Core5/Core6)
- LossV (L2 and Log/abs) under Discrete and Continuous adjoints
  (runtests.jl:154-170 Core4)
- MultiLoss (H + V + Tikhonov initial-thickness regularization) under the
  discrete adjoint

Gates are the reference's thresholds or tighter (each row cites its
measured value; reference rows that do not exist — e.g. DiscreteAdjoint ×
D-targets — get gates at the measured tier).
"""

import jax
import numpy as np
import pytest

from grad_utils import fd_gradient, flatten_theta, grad_metrics

from odinn_tpu.core.params import (
    Hyperparameters,
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.inverse.adjoint_types import (
    ContinuousAdjoint,
    ContinuousVJP,
    DiscreteAdjoint,
    DiscreteVJP,
)
from odinn_tpu.inverse.gradient import make_adjoint_value_and_grad
from odinn_tpu.laws.laws import ConstantA, LawA, LawU, LawY
from odinn_tpu.losses.losses import LogSum, LossH, LossV, MultiLoss
from odinn_tpu.losses.regularization import InitialThicknessRegularization
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.models.nn import NeuralNetwork, default_architecture
from odinn_tpu.simulation.inversion import (
    Inversion,
    assemble_tstops,
    batch_transient_loss,
)
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops

TSPAN = (5.0, 5.5)
A_TRUE = 6.5e-18


def _params(use_velocities, loss_cfg, grad):
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False,
                                        use_velocities=use_velocities),
        solver=SolverParameters(step=1.0 / 12.0, substeps=10),
        hyper=Hyperparameters(optimizer=("adam",), learning_rate=(0.05,), epochs=(1,)),
        UDE=UDEParameters(grad=grad, empirical_loss_function=loss_cfg),
    )


@pytest.fixture(scope="module")
def gt_h():
    params = _params(False, None, "jax")
    glaciers = [halfar_glacier(nx=32, ny=32, dx=130.0, temp=-15.0, A=A_TRUE, rgi_id="m0")]
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)))
    return generate_ground_truth(glaciers, params, truth, tstops, store=("H",))


@pytest.fixture(scope="module")
def gt_hv():
    params = _params(True, None, "jax")
    glaciers = [halfar_glacier(nx=32, ny=32, dx=130.0, temp=-15.0, A=A_TRUE, rgi_id="m1")]
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)))
    return generate_ground_truth(glaciers, params, truth, tstops, store=("H", "V"))


def mk_A(p):
    return Model(iceflow=SIA2DModel(A=LawA(
        NeuralNetwork(default_architecture(1, light=True), seed=4), p)))


def mk_Y(p):
    return Model(iceflow=SIA2DModel(Y=LawY(
        NeuralNetwork(default_architecture(2, light=True), seed=5), p,
        max_nn=8e-18, prescale_bounds=((-25.0, 0.0), (0.0, 500.0)))))


def mk_U(p):
    return Model(iceflow=SIA2DModel(U=LawU(
        NeuralNetwork(default_architecture(2, light=True), seed=3), p,
        max_nn=2000.0, prescale_bounds=((0.0, 500.0), (0.0, 0.3)))))


def _run_row(glaciers, model_fn, adjoint, loss_cfg, use_velocities, gates):
    params = _params(use_velocities, loss_cfg, adjoint)
    model = model_fn(params)
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    tst = assemble_tstops(params, inv.glaciers)
    loss_fn = jax.jit(
        lambda th: batch_transient_loss(th, inv.glaciers, model, params, tst)
    )
    g_fd = fd_gradient(loss_fn, inv.theta, eps=1e-6)
    vg = make_adjoint_value_and_grad(inv, flavor=adjoint.name)
    val, g = vg(inv.theta)
    # forward/reverse loss consistency (the reference asserts rtol 1e-8)
    np.testing.assert_allclose(float(val), float(loss_fn(inv.theta)), rtol=1e-8)
    flat, _ = flatten_theta(g)
    ratio, angle, relerr = grad_metrics(np.asarray(flat), g_fd)
    r_gate, a_gate, e_gate = gates
    assert ratio < r_gate, f"ratio {ratio:.3e} ≥ {r_gate}"
    assert angle < a_gate, f"angle {angle:.3e} ≥ {a_gate}"
    assert relerr < e_gate, f"relerr {relerr:.3e} ≥ {e_gate}"


DA = DiscreteAdjoint(VJP_method=DiscreteVJP())
CA = ContinuousAdjoint(VJP_method=DiscreteVJP())
CA120 = ContinuousAdjoint(VJP_method=DiscreteVJP(), n_quadrature=120)
CAc = ContinuousAdjoint(VJP_method=ContinuousVJP())


@pytest.mark.parametrize(
    "model_fn,adjoint,gates",
    [
        # ref Core5 gate (1e-4, 1e-8, 2e-4); measured 3.2e-5 at nq=120
        pytest.param(mk_Y, CA120, (1e-4, 1e-8, 2e-4), id="D_hybrid-CA+discVJP"),
        # ref Core5 gate (2e-3, 2e-8, 2e-3); measured 1.3e-3
        pytest.param(mk_Y, CAc, (2e-3, 2e-8, 2e-3), id="D_hybrid-CA+contVJP",
                     marks=pytest.mark.slow),
        # no reference row (their DiscreteAdjoint skips D targets); the exact
        # stage transpose measures 3.0e-6
        pytest.param(mk_Y, DA, (1e-5, 1e-8, 1e-5), id="D_hybrid-DA+discVJP"),
        # ref Core6 gate (3e-2, 5e-5, 3e-2); measured 1.4e-2
        pytest.param(mk_U, CA, (3e-2, 5e-5, 3e-2), id="D_pure-CA+discVJP",
                     marks=pytest.mark.slow),
        # no reference row; measured 1.3e-2 (pure-D target: FD curvature of
        # the capped-U law dominates, same tier as the reference's CA row)
        pytest.param(mk_U, DA, (3e-2, 5e-5, 3e-2), id="D_pure-DA+discVJP",
                     marks=pytest.mark.slow),
    ],
)
def test_d_target_manual_adjoints_vs_fd(gt_h, model_fn, adjoint, gates):
    """D-family targets under the manual adjoints (runtests.jl:174-193)."""
    _run_row(gt_h, model_fn, adjoint, None, False, gates)


@pytest.mark.parametrize(
    "model_fn,adjoint,loss_cfg,gates",
    [
        # ref Core4 gate (1e-4, 1e-7, 5e-4); measured 1.5e-9
        pytest.param(mk_A, DA, MultiLoss((LossV(),), (1.0,)),
                     (1e-6, 1e-8, 1e-6), id="A-LossV-DA+discVJP"),
        # ref Core4 gate (1e-2, 1e-5, 1e-2); measured 3.0e-5
        pytest.param(mk_A, CA, MultiLoss((LossV(),), (1.0,)),
                     (1e-3, 1e-8, 1e-3), id="A-LossV-CA+discVJP"),
        # ref Core4 Log/abs gate (1e-2, 1e-5, 1e-2); measured 1.7e-5
        pytest.param(mk_A, CA,
                     MultiLoss((LossV(loss=LogSum(), component="abs"),), (1.0,)),
                     (1e-3, 1e-8, 1e-3), id="A-LossV_log_abs-CA+discVJP",
                     marks=pytest.mark.slow),
        # no reference row (their regularized objectives run only under AD);
        # measured 2.1e-9
        pytest.param(mk_A, DA,
                     MultiLoss((LossH(), LossV(), InitialThicknessRegularization()),
                               (1.0, 0.5, 1e-7)),
                     (1e-6, 1e-8, 1e-6), id="A-HV+reg-DA+discVJP"),
        # ref Core6 gate (5e-3, 1e-6, 5e-3); measured 8.8e-4
        pytest.param(mk_U, CA, MultiLoss((LossV(),), (1.0,)),
                     (5e-3, 1e-6, 5e-3), id="D_pure-LossV-CA+discVJP",
                     marks=pytest.mark.slow),
    ],
)
def test_velocity_loss_manual_adjoints_vs_fd(gt_hv, model_fn, adjoint, loss_cfg, gates):
    """Velocity/composite losses under the manual adjoints
    (runtests.jl:154-170 + the Core6 LossV row)."""
    _run_row(gt_hv, model_fn, adjoint, loss_cfg, True, gates)
