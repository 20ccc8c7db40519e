"""End-to-end functional inversion: recover A(T) from synthetic ground truth.

Mirrors the reference's integration test
(/root/reference/test/inversion_test.jl:1-165): generate ground truth with the
Cuffey–Paterson law, train a NN law A = NN(T) through the PDE solve, assert
the loss collapses and the recovered A matches the truth.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odinn_tpu.core.params import (
    Hyperparameters,
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.laws.laws import CuffeyPaterson, LawA, eval_law, poly_A_paterson_cuffey
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.models.nn import NeuralNetwork, default_architecture
from odinn_tpu.simulation.inversion import Inversion, run_inversion
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops


def make_params(tspan, substeps=20, optimizer=("adam", "lbfgs", "lm"), lr=(0.05, 1.0, 1e-3), epochs=(30, 60, 10)):
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=tspan, use_MB=False, use_velocities=False,
                                        test_mode=True),
        solver=SolverParameters(step=1.0 / 12.0, substeps=substeps),
        hyper=Hyperparameters(optimizer=optimizer, learning_rate=lr, epochs=epochs),
        UDE=UDEParameters(grad="jax", target="A"),
    )


@pytest.fixture(scope="module")
def inversion_setup():
    tspan = (5.0, 6.5)
    params = make_params(tspan)
    # truth temperatures chosen so Cuffey–Paterson A stays inside
    # [min_A, max_A] (reference bounds) and the explicit scheme is stable
    glaciers = [
        halfar_glacier(nx=40, ny=40, dx=120.0, temp=-15.0, rgi_id="toy-1"),
        halfar_glacier(nx=40, ny=40, dx=120.0, temp=-25.0, rgi_id="toy-2"),
    ]
    truth_model = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    tstops = build_tstops(tspan, params.solver.step)
    glaciers = generate_ground_truth(glaciers, params, truth_model, tstops, store=("H",))
    return params, glaciers


@pytest.mark.slow
def test_functional_inversion_converges(inversion_setup):
    params, glaciers = inversion_setup
    nn = NeuralNetwork(default_architecture(1, light=True), seed=666)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    losses = results.stats.losses
    # the reference's EXACT CI gates (/root/reference/test/inversion_test.jl:
    # 154-163): loss < 1e-6 x initial; A rel err max < 1e-3, min < 1e-4.
    # The Adam→LBFGS→Gauss-Newton staging reaches the f64 floor here
    # (measured: ratio 4.2e-31, A exact to machine epsilon)
    assert results.stats.final_loss < 1e-6 * losses[0], (
        f"loss did not collapse: {losses[0]} -> {results.stats.final_loss}"
    )
    a_true = poly_A_paterson_cuffey()
    law = model.iceflow.A
    rels = []
    for g, temp in [(0, -15.0), (1, -25.0)]:
        a_nn = float(eval_law(law, inv.theta, glaciers[g], glacier_idx=g))
        a_ref = float(a_true(jnp.asarray(temp)))
        rels.append(abs(a_nn - a_ref) / a_ref)
    assert max(rels) < 1e-3 and min(rels) < 1e-4, rels


def test_functional_inversion_smoke():
    """Fast-lane convergence smoke: a short Adam→LM ladder must gain ≥100×.
    Dedicated tiny setup (1 glacier, 32², 6 monthly intervals) so the whole
    Adam+LM pipeline runs at CI speed — the full reference-gate run (1e-6
    ratio, machine-floor A) is the slow-lane test above (the reference
    shards the same way via GROUP, runtests.jl:19)."""
    tspan = (5.0, 5.5)
    params = make_params(tspan, substeps=8,
                         optimizer=("adam", "lm"), lr=(0.08, 1e-2),
                         epochs=(12, 3))
    params = params.replace(hyper=dataclasses.replace(
        params.hyper, gn_cg_iters=6))
    glaciers = [halfar_glacier(nx=24, ny=24, dx=200.0, temp=-17.0, rgi_id="smoke")]
    truth_model = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    tstops = build_tstops(tspan, params.solver.step)
    glaciers = generate_ground_truth(glaciers, params, truth_model, tstops,
                                     store=("H",))
    nn = NeuralNetwork(default_architecture(1, light=True), seed=666)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    losses = results.stats.losses
    assert results.stats.final_loss < 1e-2 * losses[0], (
        f"smoke gain < 100x: {losses[0]} -> {results.stats.final_loss}"
    )


@pytest.mark.slow
def test_functional_inversion_converges_with_mb(inversion_setup):
    """MB-enabled end-to-end convergence at the reference's exact gates
    (/root/reference/test/inversion_test.jl:2,76-78 — use_MB=true builds a
    TImodel1 into BOTH the ground truth and the trained model; gates
    :154-163). MB gradient correctness is unit-tested in test_mb_adjoint.py;
    this drives a full training run through the monthly MB callbacks."""
    from odinn_tpu.data.synthetic import monthly_dummy_climate
    from odinn_tpu.physics.mass_balance import TImodel1

    tspan = (5.0, 6.5)
    params = make_params(tspan)
    params = params.replace(
        simulation=SimulationParameters(tspan=tspan, use_MB=True, step_MB=1.0 / 12.0,
                                        use_velocities=False, test_mode=True)
    )
    glaciers = []
    for i, temp in enumerate((-15.0, -25.0)):
        clim = monthly_dummy_climate(tspan[0], 24, temp_mean=-1.0, nx=40, ny=40,
                                     longterm_temp=temp)
        g = halfar_glacier(nx=40, ny=40, dx=120.0, temp=temp, climate=clim,
                           rgi_id=f"mb-{i}")
        g = g.replace(B=jnp.full_like(g.B, 1800.0))
        glaciers.append(g)
    truth_model = Model(iceflow=SIA2DModel(A=CuffeyPaterson()), mass_balance=TImodel1())
    tstops = build_tstops(tspan, params.solver.step)
    glaciers = generate_ground_truth(glaciers, params, truth_model, tstops, store=("H",))

    nn = NeuralNetwork(default_architecture(1, light=True), seed=666)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)), mass_balance=TImodel1())
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    losses = results.stats.losses
    assert results.stats.final_loss < 1e-6 * losses[0], (
        f"loss did not collapse through MB: {losses[0]} -> {results.stats.final_loss}"
    )
    a_true = poly_A_paterson_cuffey()
    law = model.iceflow.A
    rels = []
    for g, temp in [(0, -15.0), (1, -25.0)]:
        a_nn = float(eval_law(law, inv.theta, glaciers[g], glacier_idx=g))
        a_ref = float(a_true(jnp.asarray(temp)))
        rels.append(abs(a_nn - a_ref) / a_ref)
    assert max(rels) < 1e-3 and min(rels) < 1e-4, rels


def test_f32_lbfgs_stage_terminates():
    """f32 Adam→LBFGS must COMPLETE: optax's zoom linesearch can loop without
    terminating in f32 (its bracket collapses below f32 resolution at loss
    scales ~0.1–1); hyper.lbfgs_linesearch='auto' therefore selects
    backtracking-Armijo for f32 θ. This is the reference's canonical staging
    (Hyperparameters.jl:18-81), which r2 could not run in the f32 TPU regime."""
    from odinn_tpu.laws.laws import LawA_inversion

    tspan = (5.0, 5.5)
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=tspan, use_MB=False,
                                        float_dtype="float32", test_mode=True),
        solver=SolverParameters(step=1.0 / 12.0, solver="SI", cg_iters=15),
        hyper=Hyperparameters(optimizer=("adam", "lbfgs"), learning_rate=(0.1, 1.0),
                              epochs=(5, 8)),
        UDE=UDEParameters(grad="jax", target="A"),
    )
    glaciers = [halfar_glacier(nx=28, ny=28, dx=140.0, temp=-18.0, rgi_id="f32-1")]
    truth_model = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    tstops = build_tstops(tspan, params.solver.step)
    glaciers = generate_ground_truth(glaciers, params, truth_model, tstops, store=("H",))
    glaciers = [jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x, g)
        for g in glaciers]
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    assert inv.theta["A"].dtype == jnp.float32
    results = run_inversion(inv)
    assert np.isfinite(results.stats.losses).all()
    assert results.stats.final_loss <= results.stats.losses[0]
    # explicit selection also works
    params2 = params.replace(hyper=Hyperparameters(
        optimizer=("adam",), learning_rate=(0.1,), epochs=(1,),
        lbfgs_linesearch="bogus"))
    inv2 = Inversion(model=model, glaciers=glaciers, parameters=params2)
    run_inversion(inv2)   # adam-only: linesearch name unused
    params3 = params.replace(hyper=Hyperparameters(
        optimizer=("lbfgs",), learning_rate=(1.0,), epochs=(1,),
        lbfgs_linesearch="bogus"))
    inv3 = Inversion(model=model, glaciers=glaciers, parameters=params3)
    with pytest.raises(ValueError, match="lbfgs_linesearch"):
        run_inversion(inv3)


def test_dummy_adjoint_pipeline(inversion_setup):
    """Training-pipeline smoke test with a fake gradient (grad_free_test.jl
    equivalent, /root/reference/test/grad_free_test.jl:1-91)."""
    params, glaciers = inversion_setup
    params = params.replace(
        UDE=UDEParameters(grad="dummy", target="A"),
        hyper=Hyperparameters(optimizer="adam", learning_rate=1e-4, epochs=2),
    )
    nn = NeuralNetwork(default_architecture(1, light=True))
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    assert results.stats.niter == 2
    assert all(np.isfinite(results.stats.losses))


@pytest.mark.slow
def test_classical_inversion_scalar_A(inversion_setup):
    """Per-glacier scalar A inversion (LawA classical variant,
    /root/reference/src/laws/Laws.jl:402-460)."""
    from odinn_tpu.laws.laws import LawA_inversion

    params, glaciers = inversion_setup
    params = params.replace(
        hyper=Hyperparameters(optimizer=("adam",), learning_rate=(0.1,), epochs=(40,))
    )
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    losses = results.stats.losses
    assert losses[-1] < 0.05 * losses[0]
    a_true = poly_A_paterson_cuffey()
    phys = params.physical
    a_rec = phys.min_A + (phys.max_A - phys.min_A) * (np.tanh(np.asarray(inv.theta["A"])) + 1) / 2
    for g, temp in [(0, -15.0), (1, -25.0)]:
        a_ref = float(a_true(jnp.asarray(temp)))
        assert abs(a_rec[g] - a_ref) / a_ref < 0.2, f"glacier {g}: {a_rec[g]:.3e} vs {a_ref:.3e}"
