"""Ensemble Kalman Inversion (`simulation.eki`) — beyond-parity.

Pins: (1) EKI recovers the scalar creep coefficient to the reference's
accuracy gate without ever evaluating a gradient; (2) the update preserves
the affine span of the initial ensemble (the subspace property — the
defining algebraic invariant of EKI); (3) EKI trains *through* the adaptive
error-controlled forward solve that every gradient trainer must refuse or
replay (`lax.while_loop` has no reverse rule); (4) a diverged member is
sanitized instead of poisoning the Kalman algebra; (5) write-back/selection
semantics and input validation.
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
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.models.nn import NeuralNetwork, default_architecture
from odinn_tpu.simulation.eki import EKIResult, _sanitize_rows, eki_train
from odinn_tpu.simulation.inversion import Inversion
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops

TSPAN = (5.0, 5.5)


def _params(**solver_kw):
    solver = dict(step=1.0 / 6.0, substeps=1, solver="SI", cg_iters=15)
    solver.update(solver_kw)
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False, test_mode=True),
        solver=SolverParameters(**solver),
        hyper=Hyperparameters(optimizer=("adam",), learning_rate=(0.05,),
                              epochs=(1,), batch_size=8),
        UDE=UDEParameters(grad="jax", target="A"),
    )


@pytest.fixture(scope="module")
def setup():
    params = _params()
    # temps chosen so both true A values lie strictly inside the tanh bounds
    # (A(-18) = 4.60e-18, A(-14) = 7.33e-18 < max_A = 8e-18); a truth outside
    # the bounds saturates θ and no trainer can meet the recovery gate
    glaciers = [
        halfar_glacier(nx=24, ny=24, dx=150.0, temp=-18.0, rgi_id="eki-0"),
        halfar_glacier(nx=24, ny=24, dx=150.0, temp=-14.0, rgi_id="eki-1"),
    ]
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    return params, glaciers


def test_eki_recovers_scalar_A(setup):
    """Derivative-free recovery of per-glacier A to the reference's accuracy
    gate (max rel err ≤ 1e-3, /root/reference/test/inversion_test.jl:158-163)
    — only forward solves are ever evaluated."""
    params, glaciers = setup
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    res = eki_train(inv, n_ensemble=8, n_iters=12, seed=0)

    assert isinstance(res, EKIResult)
    assert np.isfinite(res.misfits[-1]).all()
    # loss collapse vs the initial ensemble's best member
    assert res.best_loss <= 1e-4 * np.nanmin(res.misfits[0])

    phys = params.physical
    a_rec = phys.min_A + (phys.max_A - phys.min_A) * (
        np.tanh(np.asarray(inv.theta["A"], np.float64)) + 1) / 2
    from odinn_tpu.laws.laws import poly_A_paterson_cuffey

    a_true_fn = poly_A_paterson_cuffey()
    a_ref = np.asarray([float(a_true_fn(jnp.asarray(t)))
                        for t in (-18.0, -14.0)])
    rels = np.abs(a_rec - a_ref) / a_ref
    assert rels.max() <= 1e-3, rels

    # write-back: installed theta is the best member
    np.testing.assert_array_equal(np.asarray(inv.theta["A"]),
                                  np.asarray(res.best_theta["A"]))
    assert res.best_idx == int(np.argmin(res.misfits[-1]))


def test_eki_subspace_property(setup):
    """Every EKI update is a linear combination of member anomalies, so the
    final ensemble lies in the affine span of the initial one. Pinned on an
    NN law where d ≫ J (the span is a strict subspace)."""
    params, glaciers = setup
    nn = NeuralNetwork(default_architecture(1, light=True), seed=3)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)

    from odinn_tpu.simulation.ensemble import init_restarts

    J = 4
    thetas0 = init_restarts(inv.theta, J, init_scale=0.3, seed=7)
    Th0 = np.asarray(jax.vmap(
        lambda th: jax.flatten_util.ravel_pytree(th)[0])(thetas0), np.float64)
    d = Th0.shape[1]
    assert d > J  # otherwise the span is everything and the test is vacuous

    res = eki_train(inv, thetas=thetas0, n_iters=3, seed=7)
    ThF = np.asarray(jax.vmap(
        lambda th: jax.flatten_util.ravel_pytree(th)[0])(res.thetas), np.float64)

    mean0 = Th0.mean(axis=0)
    A0 = (Th0 - mean0).T                     # (d, J) initial anomalies
    for j in range(J):
        target = ThF[j] - mean0
        coef, *_ = np.linalg.lstsq(A0, target, rcond=None)
        resid = np.linalg.norm(A0 @ coef - target)
        scale = max(np.linalg.norm(target), 1e-12)
        assert resid / scale < 1e-4, (j, resid / scale)


def test_eki_trains_through_adaptive_forward():
    """With params.solver.adaptive=True the forward solve is the
    error-controlled BS3(2) `lax.while_loop` — no reverse rule exists, and
    `train_ude` refuses it. EKI needs only forward solves, so it optimizes
    the exact adaptive trajectory. Ground truth is generated under the SAME
    adaptive config: with a mismatched-solver truth the misfit has an
    irreducible discretization floor (measured ≈0.14 at the true θ) and no
    trainer can collapse it."""
    params = _params(substeps=15, solver="RK4", adaptive=True, reltol=1e-4)
    glaciers = [
        halfar_glacier(nx=24, ny=24, dx=150.0, temp=-18.0, rgi_id="eki-a0"),
        halfar_glacier(nx=24, ny=24, dx=150.0, temp=-14.0, rgi_id="eki-a1"),
    ]
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops,
                                     store=("H",))
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    res = eki_train(inv, n_ensemble=6, n_iters=8, seed=1)
    assert np.isfinite(res.best_loss)
    assert res.best_loss <= 1e-2 * np.nanmin(res.misfits[0])


def test_eki_select_mean_and_tol(setup):
    params, glaciers = setup
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    res = eki_train(inv, n_ensemble=6, n_iters=30, seed=2, select="mean",
                    tol=1e-3)
    # tol stops well before the requested 30 iterations on this easy problem
    assert res.n_iters < 30
    np.testing.assert_array_equal(np.asarray(inv.theta["A"]),
                                  np.asarray(res.mean_theta["A"]))
    assert np.isfinite(res.mean_loss)


def test_eki_validation(setup):
    params, glaciers = setup
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    with pytest.raises(ValueError, match="n_ensemble >= 2"):
        eki_train(inv, n_ensemble=1)
    with pytest.raises(ValueError, match="select"):
        eki_train(inv, n_ensemble=2, select="median")


def test_sanitize_rows_unit():
    R = jnp.asarray([[1.0, 2.0], [jnp.nan, 0.0], [3.0, 4.0]])
    fill = jnp.asarray([2.0, 3.0])  # finite-member mean
    out, ok = _sanitize_rows(R, fill)
    np.testing.assert_array_equal(np.asarray(ok), [True, False, True])
    np.testing.assert_allclose(np.asarray(out[1]), [2.0, 3.0])
    np.testing.assert_allclose(np.asarray(out[0]), [1.0, 2.0])


def test_eki_mesh_sharded_members_match(setup):
    """Sharding the member axis over the 8-device CPU mesh changes nothing
    numerically (embarrassingly parallel members, J×J algebra replicated)."""
    params, glaciers = setup
    from odinn_tpu.parallel.mesh import make_mesh

    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv1 = Inversion(model=model, glaciers=glaciers, parameters=params)
    r1 = eki_train(inv1, n_ensemble=8, n_iters=4, seed=4)
    mesh = make_mesh(8)
    inv2 = Inversion(model=model, glaciers=glaciers, parameters=params)
    r2 = eki_train(inv2, n_ensemble=8, n_iters=4, seed=4, mesh=mesh)
    np.testing.assert_allclose(r2.misfits, r1.misfits, rtol=1e-6)
    assert r2.best_idx == r1.best_idx
