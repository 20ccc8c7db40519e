"""Vmapped multi-start training (`simulation.ensemble`) — beyond-parity.

Pins: (1) restart 0 reproduces the single-start Adam trajectory exactly
(same jitted step math); (2) the winner is the argmin of the final losses
and is installed on the inversion; (3) an explicit NN-seed ensemble trains
all restarts and improves over the worst start; (4) sharding the restart
axis over the 8-device CPU mesh changes nothing numerically.
"""

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
from odinn_tpu.laws.laws import CuffeyPaterson, LawA, LawA_inversion
from odinn_tpu.models.model import Model, SIA2DModel, init_theta
from odinn_tpu.models.nn import NeuralNetwork, default_architecture
from odinn_tpu.simulation.ensemble import init_restarts, multistart_train
from odinn_tpu.simulation.inversion import Inversion, run_inversion
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops

TSPAN = (5.0, 5.5)


def _params(optimizer=("adam",), lr=(0.08,), epochs=(12,)):
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False, test_mode=True),
        solver=SolverParameters(step=1.0 / 6.0, substeps=1, solver="SI",
                                cg_iters=15),
        hyper=Hyperparameters(optimizer=optimizer, learning_rate=lr,
                              epochs=epochs, batch_size=8),
        UDE=UDEParameters(grad="jax", target="A"),
    )


@pytest.fixture(scope="module")
def setup():
    params = _params()
    glaciers = [
        halfar_glacier(nx=24, ny=24, dx=150.0, temp=-18.0, rgi_id="ms-0"),
        halfar_glacier(nx=24, ny=24, dx=150.0, temp=-12.0, rgi_id="ms-1"),
    ]
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    return params, glaciers


def test_restart0_matches_single_start(setup):
    params, glaciers = setup
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    theta0 = inv.theta
    ms = multistart_train(inv, n_restarts=3, seed=1)

    # plain single-start Adam over the same stages
    import optax

    from odinn_tpu.simulation.inversion import assemble_tstops, batch_transient_loss

    tst = assemble_tstops(params, inv.glaciers)
    loss = lambda th: batch_transient_loss(th, inv.glaciers, model, params, tst)
    opt = optax.adam(0.08)
    th, st = theta0, opt.init(theta0)
    ref = []
    step = jax.jit(lambda th, st: (lambda v, g: (v,) + (
        lambda u, s: (optax.apply_updates(th, u), s))(*opt.update(g, st, th)))(
        *jax.value_and_grad(loss)(th)))
    for _ in range(12):
        v, th, st = step(th, st)
        ref.append(float(v))
    np.testing.assert_allclose(ms.losses[0], np.asarray(ref), rtol=1e-6)


def test_winner_selection_and_install(setup):
    params, glaciers = setup
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    ms = multistart_train(inv, n_restarts=4, seed=2)
    assert ms.best_idx == int(np.argmin(ms.final_losses))
    assert ms.best_loss == ms.final_losses[ms.best_idx]
    # installed winner == best_theta
    np.testing.assert_array_equal(np.asarray(inv.theta["A"]),
                                  np.asarray(ms.best_theta["A"]))
    # best can't be worse than restart 0's final loss (θ0 is restart 0)
    assert ms.best_loss <= ms.final_losses[0] * (1 + 1e-12)
    # refinement runs from the winner
    res = run_inversion(inv)
    assert res.stats.final_loss <= ms.best_loss * (1 + 1e-6)


def test_nn_seed_ensemble(setup):
    params, glaciers = setup
    arch = default_architecture(1, light=True)
    thetas = []
    model = None
    for k in range(3):
        nn = NeuralNetwork(arch, seed=k)
        m = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
        if model is None:
            model = m
        from odinn_tpu.core.glacier import stack_glaciers

        thetas.append(init_theta(m, stack_glaciers(glaciers), jnp.float64))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    ms = multistart_train(inv, thetas=thetas)
    assert ms.losses.shape == (3, 12)
    # distinct seeds -> distinct trajectories
    assert not np.allclose(ms.losses[0], ms.losses[1])
    # every restart trained (loss decreased from its own start)
    assert np.all(ms.losses[:, -1] < ms.losses[:, 0])


def test_diverged_restart_never_wins():
    # nan-safe winner selection: np.argmin([nan, 1.0]) returns 0 (the NaN);
    # select_best must skip non-finite restarts and raise when all diverged
    from odinn_tpu.simulation.ensemble import select_best

    assert select_best([np.nan, 1.0]) == 1
    assert select_best([1.0, np.nan]) == 0
    assert select_best([np.inf, 3.0, 2.0, np.nan]) == 2
    with pytest.raises(FloatingPointError, match="diverged"):
        select_best([np.nan, np.inf])


def test_non_adam_stage_raises(setup):
    params, glaciers = setup
    params = _params(optimizer=("adam", "lbfgs"), lr=(0.08, 1.0), epochs=(3, 3))
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    with pytest.raises(ValueError, match="Adam stages only"):
        multistart_train(inv, n_restarts=2)


def test_mesh_sharded_restarts_match(setup):
    params, glaciers = setup
    from odinn_tpu.parallel.mesh import make_mesh

    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv1 = Inversion(model=model, glaciers=glaciers, parameters=params)
    ms1 = multistart_train(inv1, n_restarts=8, seed=3)
    mesh = make_mesh(8)
    inv2 = Inversion(model=model, glaciers=glaciers, parameters=params)
    ms2 = multistart_train(inv2, n_restarts=8, seed=3, mesh=mesh)
    np.testing.assert_allclose(ms2.losses, ms1.losses, rtol=1e-7)
    assert ms2.best_idx == ms1.best_idx


def test_refine_top_k_lbfgs(setup):
    """Adam exploration → vmapped LBFGS refinement on the top-2 survivors
    (r3 verdict Weak #6): the refined winner must beat the Adam-only winner,
    and the result records which restarts were refined."""
    params, glaciers = setup
    params = _params(optimizer=("adam", "lbfgs"), lr=(0.08, 1.0), epochs=(8, 6))
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))

    inv_a = Inversion(model=model, glaciers=glaciers, parameters=params)
    params_a = _params(optimizer=("adam",), lr=(0.08,), epochs=(8,))
    inv_a.parameters = params_a
    ms_a = multistart_train(inv_a, n_restarts=4, seed=5)

    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    ms = multistart_train(inv, n_restarts=4, seed=5, refine_top_k=2)
    assert ms.refined_idxs is not None and len(ms.refined_idxs) == 2
    assert ms.refined_losses is not None and np.isfinite(ms.refined_losses).all()
    assert ms.best_loss <= ms_a.best_loss
    # the installed theta evaluates to the reported best loss
    from odinn_tpu.simulation.inversion import assemble_tstops, batch_transient_loss

    tst = assemble_tstops(params, inv.glaciers)
    val = float(jax.jit(lambda th, b: batch_transient_loss(
        th, b, model, params, tst))(inv.theta, inv.glaciers))
    np.testing.assert_allclose(val, ms.best_loss, rtol=1e-6)


def test_refine_top_k_lm(setup):
    """Adam → per-survivor LM refinement: the LM stage must reduce the loss
    of the winner (quadratic local convergence on the scalar-A problem)."""
    params, glaciers = setup
    params = _params(optimizer=("adam", "lm"), lr=(0.08, 1e-2), epochs=(8, 4))
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    ms = multistart_train(inv, n_restarts=3, seed=5, refine_top_k=1)
    assert ms.refined_losses is not None
    # LM refinement from the Adam winner must improve on the Adam-only finals
    assert ms.best_loss <= np.min(ms.final_losses) * (1 + 1e-12)
