"""Gradients with mass balance enabled, and heterogeneous-size batches.

Covers the ±MB rows of the reference's gradient matrix
(/root/reference/test/runtests.jl:114-266) — the MB pullback is injected at
MB boundaries in the manual adjoints (gradient.jl MB tstops) — and the
padding path for glaciers of different grid sizes.
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
from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate
from odinn_tpu.inverse.adjoint_types import AutoVJP, DiscreteAdjoint, DiscreteVJP
from odinn_tpu.inverse.gradient import make_adjoint_value_and_grad
from odinn_tpu.laws.laws import ConstantA, CuffeyPaterson, LawA_inversion
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.physics.mass_balance import TImodel1
from odinn_tpu.simulation.inversion import Inversion, batch_transient_loss, run_inversion
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops

A_TRUE = 5e-18
TSPAN = (5.0, 5.5)


def make_params(use_mb=True, epochs=(10,), lr=(0.1,)):
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=use_mb, step_MB=1.0 / 12.0,
                                        use_velocities=False),
        solver=SolverParameters(step=1.0 / 12.0, substeps=10),
        hyper=Hyperparameters(optimizer=("adam",), learning_rate=lr, epochs=epochs),
        UDE=UDEParameters(grad="jax"),
    )


@pytest.fixture(scope="module")
def mb_setup():
    params = make_params(use_mb=True)
    clim = monthly_dummy_climate(5.0, 12, temp_mean=-1.0, nx=28, ny=28)
    g = halfar_glacier(nx=28, ny=28, dx=140.0, temp=-15.0, A=A_TRUE, climate=clim)
    g = g.replace(B=jnp.full_like(g.B, 1800.0))
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)), mass_balance=TImodel1())
    glaciers = generate_ground_truth([g], params, truth, tstops, store=("H",))
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)),
                  mass_balance=TImodel1())
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    inv.theta = {"A": jnp.array([0.2])}
    loss_fn = jax.jit(lambda th: batch_transient_loss(th, inv.glaciers, model, params, tstops))
    return params, inv, model, loss_fn


def test_jax_gradient_with_mb_vs_fd(mb_setup):
    """AD differentiates through the in-scan MB application (the reference
    could not on the SciML path, inversion_utils.jl:321-323)."""
    params, inv, model, loss_fn = mb_setup
    g = jax.grad(loss_fn)(inv.theta)
    g_fd = fd_gradient(loss_fn, inv.theta, eps=1e-6)
    ratio, angle, relerr = grad_metrics(np.asarray(g["A"]), g_fd)
    assert relerr < 1e-6, f"relerr {relerr}"


@pytest.mark.parametrize("vjp", [DiscreteVJP(), AutoVJP()], ids=["discreteVJP", "autoVJP"])
def test_discrete_adjoint_with_mb(mb_setup, vjp):
    """Manual discrete adjoint with the MB pullback injected at MB boundaries
    (±MB rows of runtests.jl:114-266)."""
    params, inv, model, loss_fn = mb_setup
    adjoint = DiscreteAdjoint(VJP_method=vjp)
    p2 = params.replace(UDE=UDEParameters(grad=adjoint))
    inv2 = Inversion(model=model, glaciers=inv.glaciers, parameters=p2, theta=inv.theta)
    vg = make_adjoint_value_and_grad(inv2, flavor="discrete")
    val, grads = vg(inv.theta)
    # fp reduction-order differences only (reference asserts rtol 1e-8,
    # gradient.jl:259)
    np.testing.assert_allclose(float(val), float(loss_fn(inv.theta)), rtol=1e-8)
    g_ad = jax.grad(loss_fn)(inv.theta)
    rel = abs(float(grads["A"][0] - g_ad["A"][0])) / abs(float(g_ad["A"][0]))
    # the MB pullback linearizes at the stored post-MB state (same convention
    # as the reference's MB VJP at saved tstops); in practice it matches AD
    # to near-roundoff on this configuration
    assert rel < 1e-6, f"MB-adjoint vs AD rel {rel}"


def test_heterogeneous_batch_trains():
    """Mixed grid sizes train via pad-and-stack without contaminating the
    loss (padding has zero observations)."""
    params = make_params(use_mb=False, epochs=(8,), lr=(0.1,))
    glaciers = [
        halfar_glacier(nx=40, ny=36, dx=120.0, temp=-15.0, A=A_TRUE, rgi_id="h0"),
        halfar_glacier(nx=28, ny=32, dx=150.0, temp=-20.0, A=A_TRUE, rgi_id="h1"),
    ]
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    assert inv.glaciers.H0.shape == (2, 40, 36)
    results = run_inversion(inv)
    losses = results.stats.losses
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0]


def test_manual_adjoint_with_ic_and_regularization(mb_setup):
    """DiscreteAdjoint handles trainable IC + initial regularization terms:
    matches the AD gradient (runtests.jl ±trainable-IC rows)."""
    from odinn_tpu.losses.losses import LossH, MultiLoss
    from odinn_tpu.losses.regularization import InitialThicknessRegularization
    from odinn_tpu.models.initial_condition import InitialCondition

    params, inv, _, _ = mb_setup
    loss = MultiLoss((LossH(), InitialThicknessRegularization()), (1.0, 1e-12))
    p2 = params.replace(
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False, use_velocities=False),
        UDE=UDEParameters(grad=DiscreteAdjoint(VJP_method=AutoVJP()),
                          empirical_loss_function=loss,
                          initial_condition_filter="Zang1980"),
    )
    ic = InitialCondition(filter="Zang1980")
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(p2, scalar=True)),
                  initial_condition=ic)
    inv2 = Inversion(model=model, glaciers=inv.glaciers, parameters=p2)
    theta = inv2.theta
    tstops = build_tstops(TSPAN, p2.solver.step)
    loss_fn = lambda th: batch_transient_loss(th, inv2.glaciers, model, p2, tstops)
    g_ad = jax.grad(loss_fn)(theta)

    vg = make_adjoint_value_and_grad(inv2, flavor="discrete")
    val, g_man = vg(theta)
    np.testing.assert_allclose(float(val), float(loss_fn(theta)), rtol=1e-8)
    for k in g_ad:
        a = np.asarray(g_ad[k]).ravel()
        m = np.asarray(g_man[k]).ravel()
        denom = np.linalg.norm(a) + 1e-30
        assert np.linalg.norm(m - a) / denom < 1e-6, f"{k}: manual vs AD mismatch"


def test_manual_adjoint_with_aggregate_terms(mb_setup):
    """Time-aggregated losses on the manual adjoint: the whole-trajectory
    cotangent is injected per tstop; matches the AD gradient."""
    import dataclasses

    from odinn_tpu.core.glacier import DhdtData
    from odinn_tpu.losses.losses import LossH, MultiLoss
    from odinn_tpu.losses.time_aggregated import LossDhdt

    params, inv, model, _ = mb_setup
    tstops = build_tstops(TSPAN, params.solver.step)
    g0 = [jax.tree.map(lambda x: x[0], inv.glaciers)][0]
    td = g0.thickness_data
    dhdt = (td.H[-1] - td.H[0]) / (tstops[-1] - tstops[0])
    g0 = g0.replace(dhdt_data=DhdtData(t1=tstops[0], t2=tstops[-1], dhdt=dhdt))

    loss = MultiLoss((LossH(), LossDhdt()), (1.0, 1.0))
    p2 = params.replace(
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False, use_velocities=False),
        UDE=UDEParameters(grad=DiscreteAdjoint(VJP_method=AutoVJP()),
                          empirical_loss_function=loss),
    )
    inv2 = Inversion(model=model, glaciers=[g0], parameters=p2, theta=inv.theta)
    loss_fn = lambda th: batch_transient_loss(th, inv2.glaciers, model, p2, tstops)
    g_ad = jax.grad(loss_fn)(inv.theta)

    vg = make_adjoint_value_and_grad(inv2, flavor="discrete")
    val, g_man = vg(inv.theta)
    np.testing.assert_allclose(float(val), float(loss_fn(inv.theta)), rtol=1e-8)
    rel = abs(float(g_man["A"][0] - g_ad["A"][0])) / abs(float(g_ad["A"][0]))
    assert rel < 1e-6, f"aggregate-term manual adjoint vs AD rel {rel}"


def test_discrete_adjoint_production_config_mb_hv():
    """The PRODUCTION configuration — monthly TImodel1 MB callback + LossHV
    (H + velocities) — under the manual DiscreteAdjoint, FD- and AD-checked
    (the reference's real workflows couple exactly this,
    inversion_utils.jl:498-517 + Losses.jl:250-441)."""
    from odinn_tpu.losses.losses import LossHV, MultiLoss

    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=True, step_MB=1.0 / 12.0,
                                        use_velocities=True),
        solver=SolverParameters(step=1.0 / 12.0, substeps=10),
        hyper=Hyperparameters(optimizer=("adam",), learning_rate=(0.1,), epochs=(1,)),
        UDE=UDEParameters(grad="jax",
                          empirical_loss_function=MultiLoss((LossHV(),), (1.0,))),
    )
    clim = monthly_dummy_climate(5.0, 12, temp_mean=-1.0, nx=28, ny=28)
    g = halfar_glacier(nx=28, ny=28, dx=140.0, temp=-15.0, A=A_TRUE, climate=clim)
    g = g.replace(B=jnp.full_like(g.B, 1800.0))
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)), mass_balance=TImodel1())
    glaciers = generate_ground_truth([g], params, truth, tstops, store=("H", "V"))
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)),
                  mass_balance=TImodel1())
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    inv.theta = {"A": jnp.array([0.2])}
    loss_fn = jax.jit(
        lambda th: batch_transient_loss(th, inv.glaciers, model, params, tstops))

    adjoint = DiscreteAdjoint(VJP_method=AutoVJP())
    p2 = params.replace(UDE=UDEParameters(
        grad=adjoint, empirical_loss_function=MultiLoss((LossHV(),), (1.0,))))
    inv2 = Inversion(model=model, glaciers=glaciers, parameters=p2, theta=inv.theta)
    vg = make_adjoint_value_and_grad(inv2, flavor="discrete")
    val, grads = vg(inv.theta)
    np.testing.assert_allclose(float(val), float(loss_fn(inv.theta)), rtol=1e-8)

    g_ad = jax.grad(loss_fn)(inv.theta)
    rel = abs(float(grads["A"][0] - g_ad["A"][0])) / abs(float(g_ad["A"][0]))
    assert rel < 1e-6, f"production-config adjoint vs AD rel {rel}"
    g_fd = fd_gradient(loss_fn, inv.theta, eps=1e-6)
    ratio, angle, relerr = grad_metrics(np.asarray(grads["A"]), g_fd)
    assert relerr < 1e-5, f"production-config adjoint vs FD relerr {relerr}"


def test_continuous_adjoint_with_mb(mb_setup):
    """ContinuousAdjoint with the MB pullback injected at save boundaries
    (±MB × continuous rows of runtests.jl:114-266). λ is discontinuous at MB
    boundaries, so the Hermite interval interpolation feeding the quadrature
    degrades relative to the smooth case: measured 6.0e-3 vs AD — the
    reference's continuous-with-callbacks tier (runtests.jl holds continuous
    rows at 1e-2 under forcing); gate 1e-2."""
    from odinn_tpu.inverse.adjoint_types import ContinuousAdjoint

    params, inv, model, loss_fn = mb_setup
    adjoint = ContinuousAdjoint(VJP_method=DiscreteVJP(), n_quadrature=60)
    p2 = params.replace(UDE=UDEParameters(grad=adjoint))
    inv2 = Inversion(model=model, glaciers=inv.glaciers, parameters=p2, theta=inv.theta)
    vg = make_adjoint_value_and_grad(inv2, flavor="continuous")
    val, grads = vg(inv.theta)
    np.testing.assert_allclose(float(val), float(loss_fn(inv.theta)), rtol=1e-8)
    g_ad = jax.grad(loss_fn)(inv.theta)
    rel = abs(float(grads["A"][0] - g_ad["A"][0])) / abs(float(g_ad["A"][0]))
    assert rel < 1e-2, f"continuous MB-adjoint vs AD rel {rel}"
