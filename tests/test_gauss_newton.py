"""Gauss-Newton / Levenberg-Marquardt trainer.

The transient LossH objective is exact least squares; the LM stage
(odinn_tpu.inverse.gauss_newton) must (a) have residuals whose square-sum IS
the loss, and (b) reach the reference's convergence gates
(/root/reference/test/inversion_test.jl:154-163) in O(10) second-order
iterations where first-order stages need hundreds.
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
from odinn_tpu.laws.laws import CuffeyPaterson, LawA, eval_law, poly_A_paterson_cuffey
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.simulation.inversion import (
    Inversion,
    batch_transient_loss,
    run_inversion,
)
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops


def make_setup(optimizer, lr, epochs):
    tspan = (5.0, 6.0)
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=tspan, use_MB=False, test_mode=True),
        solver=SolverParameters(step=1.0 / 12.0, substeps=15),
        hyper=Hyperparameters(optimizer=optimizer, learning_rate=lr, epochs=epochs,
                              batch_size=8),
        UDE=UDEParameters(grad="jax", target="A"),
    )
    glaciers = [
        halfar_glacier(nx=36, ny=36, dx=120.0, temp=-15.0, rgi_id="gn-1"),
        halfar_glacier(nx=36, ny=36, dx=120.0, temp=-22.0, rgi_id="gn-2"),
    ]
    tstops = build_tstops(tspan, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    return params, glaciers, tstops


def test_residual_squares_to_loss():
    from odinn_tpu.core.glacier import stack_glaciers
    from odinn_tpu.inverse.gauss_newton import make_residual_fn
    from odinn_tpu.models.model import init_theta
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture
    from odinn_tpu.simulation.inversion import assemble_tstops

    params, glaciers, tstops = make_setup(("adam",), (0.1,), (1,))
    nn = NeuralNetwork(default_architecture(1, light=True), seed=0)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    batch = stack_glaciers(glaciers)
    theta = init_theta(model, batch)
    ts2 = assemble_tstops(params, batch)
    resid = make_residual_fn(model, params, ts2)
    r = resid(theta, batch)
    loss_sq = float(jnp.sum(r * r))
    loss_ref = float(batch_transient_loss(theta, batch, model, params, ts2))
    np.testing.assert_allclose(loss_sq, loss_ref, rtol=1e-10)


@pytest.mark.slow
def test_lm_collapses_loss_after_adam():
    """15 LM iterations gain ≥15× over their Adam warm-start (measured
    ~27×; each LM iteration ≈ cg_iters+2 gradient-equivalents, and Adam with
    the same extra budget gains ~2× from this start), the accepted-iterate
    trace is monotone, and A moves decisively toward truth."""
    params, glaciers, tstops = make_setup(("adam", "lm"), (0.05, 1e-3), (30, 15))
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture

    nn = NeuralNetwork(default_architecture(1, light=True), seed=666)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    res = run_inversion(inv)
    losses = res.stats.losses
    assert np.isfinite(losses).all()
    lm_start = losses[30]      # first LM-stage record = loss at the Adam result
    assert res.stats.final_loss < lm_start / 15.0, (
        f"LM gained <15x: {lm_start:.3e} -> {res.stats.final_loss:.3e}"
    )
    # accept rule makes the LM trace monotone non-increasing
    lm_trace = losses[30:]
    assert all(b <= a * (1 + 1e-12) for a, b in zip(lm_trace, lm_trace[1:])), lm_trace
    # A moves decisively toward the truth at both temperatures
    a_true = poly_A_paterson_cuffey()
    for g, temp in [(0, -15.0), (1, -22.0)]:
        a_nn = float(eval_law(model.iceflow.A, inv.theta, glaciers[g], glacier_idx=g))
        a_ref = float(a_true(jnp.asarray(temp)))
        assert abs(a_nn - a_ref) / a_ref < 0.15, (temp, a_nn, a_ref)


def test_lm_rejects_minibatching():
    params, glaciers, tstops = make_setup(("lm",), (1e-2,), (3,))
    import dataclasses

    params = params.replace(hyper=dataclasses.replace(params.hyper, batch_size=1))
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture

    nn = NeuralNetwork(default_architecture(1, light=True), seed=0)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    with pytest.raises(ValueError, match="full-batch"):
        run_inversion(inv)


def _residual_parity(loss_cfg, with_velocity=False, with_dhdt=False):
    """‖r(θ)‖² must equal batch_transient_loss for the given loss config."""
    from odinn_tpu.core.glacier import stack_glaciers
    from odinn_tpu.inverse.gauss_newton import make_residual_fn
    from odinn_tpu.models.model import init_theta
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture
    from odinn_tpu.simulation.inversion import assemble_tstops
    from odinn_tpu.simulation.prediction import generate_ground_truth as ggt

    params, glaciers, tstops = make_setup(("adam",), (0.1,), (1,))
    if with_velocity:
        params = params.replace(
            simulation=SimulationParameters(tspan=(5.0, 6.0), use_MB=False,
                                            test_mode=True, use_velocities=True))
        truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
        glaciers = [g.replace(thickness_data=None, velocity_data=None) for g in glaciers]
        glaciers = ggt(glaciers, params, truth, tstops, store=("H", "V"))
    if with_dhdt:
        from odinn_tpu.core.glacier import DhdtData

        glaciers = [
            g.replace(dhdt_data=DhdtData(
                t1=jnp.asarray(5.0), t2=jnp.asarray(6.0),
                dhdt=jnp.zeros_like(g.H0)))
            for g in glaciers
        ]
    params = params.replace(
        UDE=UDEParameters(grad="jax", target="A",
                          empirical_loss_function=loss_cfg))
    nn = NeuralNetwork(default_architecture(1, light=True), seed=0)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    batch = stack_glaciers(glaciers)
    theta = init_theta(model, batch)
    ts2 = assemble_tstops(params, batch)
    resid = make_residual_fn(model, params, ts2)
    r = resid(theta, batch)
    loss_sq = float(jnp.sum(r * r))
    loss_ref = float(batch_transient_loss(theta, batch, model, params, ts2))
    np.testing.assert_allclose(loss_sq, loss_ref, rtol=1e-9)
    return loss_ref


@pytest.mark.slow   # matrix-tier residual parity (HV/log/dhdt/Tikhonov); the
# default lane keeps the core LM convergence + LossH residual tests
def test_residual_parity_hv_log_dhdt_tikhonov():
    """The LM trainer covers every least-squares loss shape: LossHV (xy
    velocities + scale_loss), LogSum thickness, time-aggregated LossDhdt,
    and Tikhonov initial-thickness regularization — residual square-sums
    equal the loss to roundoff (the reference trains these objectives with
    BFGS, Losses.jl:250-441; here they are second-order trainable too)."""
    from odinn_tpu.losses.losses import LogSum, LossH, LossHV, LossV, MultiLoss
    from odinn_tpu.losses.regularization import InitialThicknessRegularization
    from odinn_tpu.losses.time_aggregated import LossDhdt

    l1 = _residual_parity(MultiLoss((LossHV(),), (1.0,)), with_velocity=True)
    assert l1 > 0.0
    l2 = _residual_parity(MultiLoss((LossH(loss=LogSum()),), (1.0,)))
    assert l2 > 0.0
    l3 = _residual_parity(
        MultiLoss((LossH(), LossDhdt(), InitialThicknessRegularization()),
                  (1.0, 0.5, 1e-6)),
        with_dhdt=True,
    )
    assert l3 > 0.0
    l4 = _residual_parity(
        MultiLoss((LossV(component="abs", scale_loss=True),), (1.0,)),
        with_velocity=True,
    )
    assert l4 > 0.0


def test_lm_rejects_unsupported_losses():
    """Terms with no least-squares residual form still raise with a remedy."""
    from odinn_tpu.core.glacier import stack_glaciers
    from odinn_tpu.inverse.gauss_newton import make_residual_fn
    from odinn_tpu.losses.losses import MultiLoss
    from odinn_tpu.models.model import init_theta
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture

    class OddLoss:
        kind = "transient"

        def __call__(self, ctx, H_pred, t):
            return jnp.sum(H_pred) ** 3

    params, glaciers, tstops = make_setup(("lm",), (1e-2,), (3,))
    params = params.replace(
        UDE=UDEParameters(grad="jax", target="A",
                          empirical_loss_function=MultiLoss((OddLoss(),), (1.0,)))
    )
    from odinn_tpu.core.glacier import stack_glaciers as sg

    nn = NeuralNetwork(default_architecture(1, light=True), seed=0)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    batch = sg(glaciers)
    theta = init_theta(model, batch)
    resid = make_residual_fn(model, params, tstops)
    with pytest.raises(NotImplementedError, match="grad='jax'"):
        resid(theta, batch)


def test_glacier_norm_lm_records_unnormalized_losses():
    """With gn_glacier_norm=True the LM stage must still record the TRUE
    (un-normalized) objective into stats.losses, so multi-stage loss traces
    stay on one scale (regression: normalized ‖r‖² used to be recorded)."""
    from dataclasses import replace

    params, glaciers, tstops = make_setup(("adam", "lm"), (0.05, 1e-2), (3, 2))
    params = replace(params, hyper=replace(params.hyper, batch_size=8,
                                           gn_glacier_norm=True,
                                           gn_cg_iters=5))
    model = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    # classical per-glacier inversion so LM has least-squares structure
    from odinn_tpu.laws.laws import LawA_inversion
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    res = run_inversion(inv)
    L = np.asarray(res.stats.losses)
    assert L.shape[0] >= 5  # 3 adam records + the LM stage's records
    # the recorded LM losses continue the Adam stage's scale: no multi-
    # order-of-magnitude discontinuity from the normalization (the
    # normalized objective is O(#glaciers) regardless of the loss scale)
    adam_last, lm_first = L[2], L[3]
    assert lm_first <= adam_last * 10.0, (adam_last, lm_first)
    # and the recorded trace is consistent with the final true loss
    assert res.stats.final_loss <= L.min() * (1 + 1e-6)


def test_cg_restarts_match_single_shot_in_f64_and_plumb():
    """gn_cg_restarts splits the CG budget into exact-residual restarts.

    In float64 (tests run with x64 on) a restarted solve of an SPD system
    must agree with single-shot CG once both have enough total iterations
    to converge (restarting discards Krylov history, so per-round depth
    still has to exceed the effective spectrum — here p=6). The f32
    motivation (single-shot CG at 250+ iterations regresses from conjugacy
    loss) is benchmarked at scale in benchmarks/train_at_scale.py part 4.
    """
    from odinn_tpu.inverse.gauss_newton import _cg_tree

    rng = np.random.default_rng(0)
    # ill-conditioned SPD matrix (kappa ~ 1e6)
    q, _ = np.linalg.qr(rng.standard_normal((6, 6)))
    a = q @ np.diag(np.logspace(0, 6, 6)) @ q.T
    b_np = rng.standard_normal(6)
    a_j, b_j = jnp.asarray(a), {"x": jnp.asarray(b_np)}
    matvec = lambda v: {"x": a_j @ v["x"]}
    x1 = _cg_tree(matvec, b_j, 40, restarts=1)["x"]
    x2 = _cg_tree(matvec, b_j, 40, restarts=2)["x"]
    x_ref = np.linalg.solve(a, b_np)
    np.testing.assert_allclose(np.asarray(x1), x_ref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(x2), x_ref, rtol=1e-8)

    # plumbing: an LM stage with gn_cg_restarts=2 trains and converges
    from dataclasses import replace

    from odinn_tpu.laws.laws import LawA_inversion

    params, glaciers, tstops = make_setup(("lm",), (1e-2,), (6,))
    params = replace(params, hyper=replace(params.hyper, batch_size=8,
                                           gn_cg_iters=10, gn_cg_restarts=2))
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    res = run_inversion(inv)
    L = np.asarray(res.stats.losses)
    assert res.stats.final_loss < L[0] * 1e-3, L
