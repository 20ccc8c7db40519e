"""Diffusivity-target model families: pure-D (LawU) and hybrid-D (LawY)
functional inversions.

Mirrors the reference's diffusivity-inversion MWE
(/root/reference/scripts/MWEs/inversion_diffusivity/inversion_setup.jl: learn
D(H̄, ∇S, θ) = H̄·NN(H̄, ∇S) against standard-SIA ground truth) and the
D_hybrid target coverage of the gradient test matrix (runtests.jl:141-235).
"""

import jax
import jax.numpy as jnp
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
from odinn_tpu.laws.laws import ConstantA, LawU, LawY
from odinn_tpu.models.model import Model, SIA2DModel, init_theta
from odinn_tpu.models.nn import NeuralNetwork, default_architecture
from odinn_tpu.physics.targets import DHybridTarget, DPureTarget
from odinn_tpu.simulation.inversion import Inversion, batch_transient_loss, run_inversion
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops

A_TRUE = 6.5e-18
TSPAN = (5.0, 5.5)


def make_params(epochs=(25,), lr=(0.05,), optimizer=("adam",)):
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False, use_velocities=False),
        solver=SolverParameters(step=1.0 / 12.0, substeps=10),
        hyper=Hyperparameters(optimizer=optimizer, learning_rate=lr, epochs=epochs),
        UDE=UDEParameters(grad="jax"),
    )


@pytest.fixture(scope="module")
def ground_truth():
    params = make_params()
    glaciers = [halfar_glacier(nx=32, ny=32, dx=130.0, temp=-15.0, A=A_TRUE, rgi_id="d0")]
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    return params, glaciers, tstops


@pytest.mark.slow
def test_pure_d_target_inversion(ground_truth):
    """Learn U(H̄, |∇S|) with D = H̄·U against standard-SIA truth."""
    params, glaciers, tstops = ground_truth
    nn = NeuralNetwork(default_architecture(2), seed=3)
    # scale the law output to the physical range of U = Γ H̄^{n+1}|∇S|^{n-1}
    u_law = LawU(nn, params, max_nn=2000.0, prescale_bounds=((0.0, 500.0), (0.0, 0.3)))
    model = Model(iceflow=SIA2DModel(U=u_law))
    assert isinstance(model.target, DPureTarget)

    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    losses = results.stats.losses
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.25 * losses[0], f"pure-D inversion stalled: {losses[0]} -> {losses[-1]}"


@pytest.mark.slow
def test_hybrid_d_target_inversion(ground_truth):
    """Learn Y(T, H̄) in the hybrid diffusivity against standard-SIA truth
    (Y ≡ A_true when n_H = n)."""
    params, glaciers, tstops = ground_truth
    nn = NeuralNetwork(default_architecture(2), seed=5)
    y_law = LawY(nn, params, max_nn=8e-18, prescale_bounds=((-25.0, 0.0), (0.0, 500.0)))
    model = Model(iceflow=SIA2DModel(Y=y_law))
    assert isinstance(model.target, DHybridTarget)

    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    losses = results.stats.losses
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.25 * losses[0], f"hybrid-D inversion stalled: {losses[0]} -> {losses[-1]}"


def test_d_targets_gradients_vs_fd(ground_truth):
    """AD-through-solve gradients for both D targets match FD (the reference's
    D/D_hybrid rows of the gradient matrix, runtests.jl:141-235)."""
    params, glaciers, tstops = ground_truth
    for make in [
        lambda: Model(iceflow=SIA2DModel(U=LawU(
            NeuralNetwork(default_architecture(2, light=True), seed=3), params,
            max_nn=2000.0, prescale_bounds=((0.0, 500.0), (0.0, 0.3))))),
        lambda: Model(iceflow=SIA2DModel(Y=LawY(
            NeuralNetwork(default_architecture(2, light=True), seed=5), params,
            max_nn=8e-18, prescale_bounds=((-25.0, 0.0), (0.0, 500.0))))),
    ]:
        model = make()
        inv = Inversion(model=model, glaciers=glaciers, parameters=params)
        loss_fn = jax.jit(
            lambda th: batch_transient_loss(th, inv.glaciers, model, params, tstops)
        )
        g = jax.jit(jax.grad(loss_fn))(inv.theta)
        flat, _ = flatten_theta(g)
        g_fd = fd_gradient(loss_fn, inv.theta, eps=1e-6)
        ratio, angle, relerr = grad_metrics(np.asarray(flat), g_fd)
        assert relerr < 1e-4, f"{model.target.name}: relerr {relerr:.2e}"
        assert angle < 1e-7, f"{model.target.name}: angle {angle:.2e}"
