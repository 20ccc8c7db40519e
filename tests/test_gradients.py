"""Gradient-correctness matrix vs finite differences.

The reference's dominant test pattern (`test_grad_finite_diff`,
/root/reference/test/test_grad_loss.jl:46-403): tiny synthetic inversion,
ground truth from a known law, gradient under test vs central finite
differences with (ratio, angle, relerr) metrics and per-configuration
thresholds (/root/reference/test/runtests.jl:114-266).

Configurations covered here:
  - JaxAdjoint (AD through the solve)          — the tight oracle
  - DiscreteAdjoint × {DiscreteVJP, AutoVJP}   — manual reverse-Euler adjoint
  - ContinuousAdjoint × ContinuousVJP          — manual continuous adjoint
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
from odinn_tpu.inverse.adjoint_types import (
    AutoVJP,
    ContinuousAdjoint,
    ContinuousVJP,
    DiscreteAdjoint,
    DiscreteVJP,
)
from odinn_tpu.inverse.gradient import make_adjoint_value_and_grad
from odinn_tpu.laws.laws import CuffeyPaterson, LawA
from odinn_tpu.models.model import Model, SIA2DModel, init_theta
from odinn_tpu.models.nn import NeuralNetwork, default_architecture
from odinn_tpu.simulation.inversion import Inversion, batch_transient_loss
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops


@pytest.fixture(scope="module")
def setup():
    tspan = (5.0, 5.5)
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=tspan, use_MB=False, use_velocities=False),
        solver=SolverParameters(step=1.0 / 12.0, substeps=12),
        hyper=Hyperparameters(),
        UDE=UDEParameters(grad="jax"),
    )
    glaciers = [
        halfar_glacier(nx=32, ny=32, dx=130.0, temp=-15.0, rgi_id="g0"),
        halfar_glacier(nx=32, ny=32, dx=130.0, temp=-22.0, rgi_id="g1"),
    ]
    tstops = build_tstops(tspan, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    nn = NeuralNetwork(default_architecture(1, light=True), seed=4)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)

    loss_fn = jax.jit(
        lambda th: batch_transient_loss(th, inv.glaciers, model, params, tstops)
    )
    g_fd = fd_gradient(loss_fn, inv.theta, eps=1e-6)
    return inv, loss_fn, g_fd


def test_jax_adjoint_vs_fd(setup):
    """AD through the solve vs FD — SciMLSensitivity gates (1e-5/1e-7/1e-5,
    runtests.jl:116-140)."""
    inv, loss_fn, g_fd = setup
    g = jax.jit(jax.grad(loss_fn))(inv.theta)
    flat, _ = flatten_theta(g)
    ratio, angle, relerr = grad_metrics(np.asarray(flat), g_fd)
    assert ratio < 1e-5, f"ratio {ratio}"
    assert angle < 1e-7, f"angle {angle}"
    assert relerr < 1e-5, f"relerr {relerr}"


@pytest.mark.parametrize(
    "adjoint,gates",
    [
        # The exact integrator transpose matches AD/FD far inside the
        # reference's 5e-3/1e-8/5e-3 gates (runtests.jl:141-196)
        (DiscreteAdjoint(VJP_method=DiscreteVJP()), (1e-5, 1e-7, 1e-5)),
        (DiscreteAdjoint(VJP_method=AutoVJP()), (1e-5, 1e-7, 1e-5)),
        # Continuous adjoint with cubic-Hermite H/λ interpolation: holds the
        # reference's flagship gates (1e-3/1e-8/1e-3, runtests.jl:127); the
        # r2 linear interpolation measured ~3e-3
        # ContinuousVJP rows the reference holds at only 2e-2/1e-5/2e-2
        # (runtests.jl:140-141); measured 6.5e-3 here — gate 3x tighter
        (ContinuousAdjoint(VJP_method=ContinuousVJP(), n_quadrature=60), (1e-2, 1e-6, 1e-2)),
        (ContinuousAdjoint(VJP_method=DiscreteVJP(), n_quadrature=60), (1e-3, 1e-8, 1e-3)),
        # the piecewise-linear fallback keeps its r2 gates
        (ContinuousAdjoint(VJP_method=DiscreteVJP(), n_quadrature=60,
                           interpolation="linear"), (1e-2, 1e-6, 1e-2)),
    ],
    ids=["discrete+discreteVJP", "discrete+autoVJP", "continuous+continuousVJP",
         "continuous+discreteVJP", "continuous+discreteVJP-linear"],
)
def test_manual_adjoints_vs_fd(setup, adjoint, gates):
    """Manual adjoints vs FD — reference gate pattern (runtests.jl:141-235).

    The DiscreteAdjoint here is the exact stage-level transpose of the forward
    RK integrator (rematerialized), so it reproduces reverse-mode AD to
    roundoff — tighter than the reference's O(Δt) reverse-Euler sweep."""
    inv, loss_fn, g_fd = setup
    params = inv.parameters.replace(UDE=UDEParameters(grad=adjoint))
    inv2 = Inversion(
        model=inv.model, glaciers=inv.glaciers, parameters=params, theta=inv.theta
    )
    vg = make_adjoint_value_and_grad(inv2, flavor=adjoint.name)
    val, g = vg(inv.theta)
    # forward loss from the adjoint driver must equal the plain loss
    # (reference asserts forward/reverse consistency at rtol 1e-8,
    # gradient.jl:259)
    np.testing.assert_allclose(float(val), float(loss_fn(inv.theta)), rtol=1e-8)
    flat, _ = flatten_theta(g)
    ratio, angle, relerr = grad_metrics(np.asarray(flat), g_fd)
    r_gate, a_gate, e_gate = gates
    assert ratio < r_gate, f"ratio {ratio:.3e} ≥ {r_gate}"
    assert angle < a_gate, f"angle {angle:.3e} ≥ {a_gate}"
    assert relerr < e_gate, f"relerr {relerr:.3e} ≥ {e_gate}"


@pytest.mark.parametrize("solver_name", ["RKC", "SI"])
def test_discrete_adjoint_stabilized_solvers_vs_fd(solver_name):
    """DiscreteAdjoint rows for the production stabilized solvers (RKC2
    stage-transpose, semi-implicit IFT transpose) — the reference hand-adjoints
    its default solver path (gradient.jl:191-253); here the manual path covers
    the perf-flagship solvers too. Gates: the reference's SciMLSensitivity
    tier (1e-5/1e-7/1e-5, runtests.jl:116-140), plus roundoff-level agreement
    with reverse-mode AD of the identical forward."""
    tspan = (5.0, 5.25)
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=tspan, use_MB=False, use_velocities=False),
        solver=SolverParameters(
            step=1.0 / 12.0, substeps=4, solver=solver_name, rkc_stages=8, cg_iters=50
        ),
        hyper=Hyperparameters(),
        UDE=UDEParameters(grad="jax"),
    )
    glaciers = [halfar_glacier(nx=24, ny=24, dx=150.0, temp=-18.0, rgi_id="g0")]
    tstops = build_tstops(tspan, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    nn = NeuralNetwork(default_architecture(1, light=True), seed=7)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)

    loss_fn = jax.jit(
        lambda th: batch_transient_loss(th, inv.glaciers, model, params, tstops)
    )
    g_ad = jax.jit(jax.grad(loss_fn))(inv.theta)
    flat_ad, _ = flatten_theta(g_ad)
    g_fd = fd_gradient(loss_fn, inv.theta, eps=1e-6)

    # AD itself vs FD (validates implicit diff / the RKC stage scan)
    ratio, angle, relerr = grad_metrics(np.asarray(flat_ad), g_fd)
    assert ratio < 1e-5 and angle < 1e-7 and relerr < 1e-5, (
        f"{solver_name} AD vs FD: ratio {ratio:.2e} angle {angle:.2e} relerr {relerr:.2e}"
    )

    adjoint = DiscreteAdjoint(VJP_method=DiscreteVJP())
    p2 = params.replace(UDE=UDEParameters(grad=adjoint))
    inv2 = Inversion(model=model, glaciers=glaciers, parameters=p2, theta=inv.theta)
    vg = make_adjoint_value_and_grad(inv2, flavor="discrete")
    val, g_man = vg(inv.theta)
    np.testing.assert_allclose(float(val), float(loss_fn(inv.theta)), rtol=1e-8)

    flat_man, _ = flatten_theta(g_man)
    ratio, angle, relerr = grad_metrics(np.asarray(flat_man), g_fd)
    assert ratio < 1e-5 and angle < 1e-7 and relerr < 1e-5, (
        f"{solver_name} manual vs FD: ratio {ratio:.2e} angle {angle:.2e} relerr {relerr:.2e}"
    )
    # exact transpose ⇒ roundoff-level agreement with AD
    rel = np.abs(np.asarray(flat_man) - np.asarray(flat_ad)) / (
        np.abs(np.asarray(flat_ad)) + 1e-30
    )
    assert rel.max() < 1e-6, f"{solver_name} manual vs AD max rel {rel.max():.2e}"


def test_gridded_A_gradient_masked_subset_vs_fd(setup):
    """Large-θ gradient parity on a random masked subset of entries — the
    reference's strategy for parameter vectors > 60 entries
    (/root/reference/test/test_grad_loss.jl:291-350). Gridded per-glacier A:
    2×31×31 = 1922 parameters, 24 probed."""
    from odinn_tpu.laws.laws import LawA_inversion
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.inverse.adjoint_types import AutoVJP, DiscreteAdjoint

    inv, _, _ = setup
    params = inv.parameters
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=False)))
    inv2 = Inversion(model=model, glaciers=inv.glaciers, parameters=params)
    theta = inv2.theta
    assert theta["A"].size > 60

    from odinn_tpu.simulation.inversion import assemble_tstops

    tstops = assemble_tstops(params, inv2.glaciers)
    loss_fn = jax.jit(
        lambda th: batch_transient_loss(th, inv2.glaciers, model, params, tstops)
    )
    g_ad = jax.jit(jax.grad(loss_fn))(theta)

    # random masked subset, biased to the glacier interior where A matters
    rng = np.random.default_rng(0)
    flat_g = np.asarray(g_ad["A"]).ravel()
    candidates = np.argsort(-np.abs(flat_g))[:200]
    subset = rng.choice(candidates, size=24, replace=False)

    from grad_utils import fd_gradient, grad_metrics

    g_fd = fd_gradient(loss_fn, {"A": theta["A"]}, eps=1e-6, indices=subset)
    ratio, angle, relerr = grad_metrics(flat_g[subset], g_fd[subset])
    assert relerr < 1e-5, f"gridded-A subset relerr {relerr:.2e}"
    assert angle < 1e-8, f"gridded-A subset angle {angle:.2e}"

    # manual adjoint agrees on the same subset
    p2 = params.replace(UDE=UDEParameters(grad=DiscreteAdjoint(VJP_method=AutoVJP())))
    inv3 = Inversion(model=model, glaciers=inv.glaciers, parameters=p2, theta=theta)
    vg = make_adjoint_value_and_grad(inv3, flavor="discrete")
    _, g_man = vg(theta)
    rel = np.abs(np.asarray(g_man["A"]).ravel()[subset] - flat_g[subset]) / (
        np.abs(flat_g[subset]) + 1e-30
    )
    assert rel.max() < 1e-8, f"manual vs AD gridded subset max rel {rel.max():.2e}"


def test_forward_mode_gradient_matches_ad():
    """grad='forward' (one jvp per θ leaf, per-glacier block structure,
    O(1) memory in the time horizon) equals reverse-mode AD exactly."""
    import dataclasses

    from odinn_tpu.laws.laws import LawA_inversion
    from odinn_tpu.simulation.inversion import _make_grad_fn, assemble_tstops

    tspan = (5.0, 5.5)
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=tspan, use_MB=False),
        solver=SolverParameters(step=1.0 / 12.0, substeps=12),
        hyper=Hyperparameters(),
        UDE=UDEParameters(grad="forward"),
    )
    glaciers = [
        halfar_glacier(nx=32, ny=32, dx=130.0, temp=-15.0, rgi_id="f0"),
        halfar_glacier(nx=32, ny=32, dx=130.0, temp=-22.0, rgi_id="f1"),
    ]
    tstops = build_tstops(tspan, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    theta = jax.tree.map(lambda x: x + 0.08, inv.theta)

    vg_fwd = _make_grad_fn(inv, None)
    val_f, g_f = jax.jit(vg_fwd)(theta, inv.glaciers)

    tst = assemble_tstops(params, inv.glaciers)
    loss = lambda th: batch_transient_loss(th, inv.glaciers, model, params, tst)
    val_r, g_r = jax.jit(jax.value_and_grad(loss))(theta)

    np.testing.assert_allclose(float(val_f), float(val_r), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g_f["A"]), np.asarray(g_r["A"]),
                               rtol=1e-9)

    # NN/gridded θ is rejected with a remedy
    bad_theta = {"A": jnp.zeros((2, 4, 4))}
    with pytest.raises(ValueError, match="per-glacier SCALAR"):
        vg_fwd(bad_theta, inv.glaciers)
