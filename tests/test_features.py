"""Feature-coverage tests: trainable initial condition, velocity losses,
gridded-A inversion + regularizations, SyntheticC, time-aggregated losses,
minibatching, discrete MB VJP, time utils.

Covers the remaining rows of the reference's test matrix
(/root/reference/test/runtests.jl:114-266: ±trainable IC, velocity losses,
classical gridded inversions, regularization terms, Dhdt/AvgV losses).
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
from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate
from odinn_tpu.laws.laws import ConstantA, CuffeyPaterson, LawA, LawA_inversion, SyntheticC
from odinn_tpu.losses.losses import L2Sum, LossH, LossHV, LossV, MultiLoss
from odinn_tpu.losses.regularization import (
    InitialThicknessRegularization,
    RheologyRegularization,
)
from odinn_tpu.losses.time_aggregated import LossAvgV, LossDhdt
from odinn_tpu.models.initial_condition import InitialCondition
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.models.nn import NeuralNetwork, default_architecture
from odinn_tpu.simulation.inversion import Inversion, batch_transient_loss, run_inversion
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops

A_TRUE = 6.5e-18
TSPAN = (5.0, 5.5)


def make_params(loss=None, epochs=(12,), lr=(0.05,), optimizer=("adam",), batch_size=15,
                use_velocities=False):
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False,
                                        use_velocities=use_velocities),
        solver=SolverParameters(step=1.0 / 12.0, substeps=10),
        hyper=Hyperparameters(optimizer=optimizer, learning_rate=lr, epochs=epochs,
                              batch_size=batch_size),
        UDE=UDEParameters(grad="jax", empirical_loss_function=loss),
    )


@pytest.fixture(scope="module")
def gt():
    params = make_params(use_velocities=True)
    glaciers = [
        halfar_glacier(nx=32, ny=32, dx=130.0, temp=-15.0, A=A_TRUE, rgi_id="f0"),
        halfar_glacier(nx=32, ny=32, dx=130.0, temp=-20.0, A=A_TRUE, rgi_id="f1"),
    ]
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H", "V"))
    return params, glaciers, tstops


@pytest.mark.slow
def test_velocity_loss_inversion(gt):
    """LossHV (thickness + velocity) drives the inversion (Losses.jl LossV/HV
    rows of the matrix)."""
    params, glaciers, tstops = gt
    loss = LossHV(hLoss=LossH(), vLoss=LossV(component="abs"), scaling=1.0)
    params = make_params(loss=MultiLoss((loss,), (1.0,)), use_velocities=True)
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    losses = results.stats.losses
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0]


def test_trainable_initial_condition(gt):
    """Trainable H₀ with Zang1980 filter + InitialThicknessRegularization:
    gradient flows into θ['IC'] and training reduces the loss (runtests.jl
    ±trainable IC rows)."""
    params, glaciers, tstops = gt
    loss = MultiLoss((LossH(), InitialThicknessRegularization()), (1.0, 1e-12))
    params = make_params(loss=loss, epochs=(8,), lr=(0.05,))
    ic = InitialCondition(filter="Zang1980", init="Farinotti2019Random", noise_sigma=15.0)
    model = Model(
        iceflow=SIA2DModel(A=ConstantA(A_TRUE)),
        initial_condition=ic,
    )
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    assert "IC" in inv.theta and inv.theta["IC"].shape[0] == 2
    loss_fn = lambda th: batch_transient_loss(th, inv.glaciers, model, params, tstops)
    g = jax.grad(loss_fn)(inv.theta)
    assert float(jnp.abs(g["IC"]).max()) > 0.0, "no gradient into the initial condition"
    results = run_inversion(inv)
    losses = results.stats.losses
    assert losses[-1] < losses[0]
    assert results.stats.initial_conditions is not None


def test_gridded_A_inversion_with_regularization(gt):
    """Per-glacier gridded A (GriddedInv equivalent) with Tikhonov rheology
    regularization (classical_inversion coverage, runtests.jl:200-235)."""
    params, glaciers, tstops = gt
    reg = RheologyRegularization(min_A=8e-21, max_A=8e-18)
    loss = MultiLoss((LossH(), reg), (1.0, 1e-16))
    params = make_params(loss=loss, epochs=(15,), lr=(0.1,))
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=False)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    assert inv.theta["A"].shape == (2, 31, 31)
    results = run_inversion(inv)
    losses = results.stats.losses
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0]


def test_synthetic_c_law_in_rhs():
    """SyntheticC (CPDD + roughness → C) evaluates and feeds the sliding term
    (docs/src/inversions.md:75-79 usage)."""
    clim = monthly_dummy_climate(5.0, 24, temp_mean=2.0, nx=32, ny=32)
    g = halfar_glacier(nx=32, ny=32, dx=130.0, temp=-15.0, climate=clim)
    g = g.replace(B=jnp.full_like(g.B, 1500.0))
    params = make_params()
    c_law = SyntheticC(params, c_max=1e-18)
    model = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE), C=c_law))
    from odinn_tpu.laws.laws import eval_law
    from odinn_tpu.inverse.vjps import rhs_with_theta

    c_val = eval_law(c_law, None, g, state=g.H0, t=5.5)
    assert c_val.shape == (31, 31)
    assert float(c_val.min()) >= 0.0
    dH = rhs_with_theta(g.H0, {}, g, 0, model, params, 5.5)
    assert np.isfinite(np.asarray(dH)).all()


@pytest.mark.slow
def test_time_aggregated_losses_inversion(gt):
    """LossDhdt + LossAvgV drive gradients (TimeAggregatedLosses rows), with
    the observations produced by ``generate_ground_truth(store=("dhdt",
    "avgV"))`` — the reference generates aggregated-loss observations directly
    (test_grad_loss.jl:170-177)."""
    params, glaciers, tstops = gt
    truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)))
    glaciers2 = generate_ground_truth(
        glaciers, params, truth, tstops, store=("dhdt", "avgV")
    )
    for g, g2 in zip(glaciers, glaciers2):
        # stored dhdt must equal the rate from the stored thickness series
        td = g.thickness_data
        np.testing.assert_allclose(
            np.asarray(g2.dhdt_data.dhdt),
            np.asarray((td.H[-1] - td.H[0]) / (tstops[-1] - tstops[0])),
            rtol=1e-10,
        )
        assert g2.velocity_data.vabs.shape[0] == 1      # one annual product
        assert float(g2.velocity_data.date2) == float(tstops[-1])
    loss = MultiLoss((LossDhdt(), LossAvgV()), (1.0, 1.0))
    params = make_params(loss=loss, use_velocities=True)
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers2, parameters=params)
    tst = build_tstops(TSPAN, params.solver.step)
    loss_fn = lambda th: batch_transient_loss(th, inv.glaciers, model, params, tst)
    val, g = jax.value_and_grad(loss_fn)(inv.theta)
    assert np.isfinite(float(val))
    assert float(jnp.abs(g["A"]).max()) > 0.0

    # FD parity of the aggregated-loss gradient
    e = 1e-6
    th = inv.theta
    thp = {"A": th["A"].at[0].add(e)}
    thm = {"A": th["A"].at[0].add(-e)}
    fd = (float(loss_fn(thp)) - float(loss_fn(thm))) / (2 * e)
    np.testing.assert_allclose(float(g["A"][0]), fd, rtol=1e-5)


def test_minibatching(gt):
    """Glacier minibatching (Hyperparameters.batch_size) trains and records
    per-iteration losses."""
    params, glaciers, tstops = gt
    params = make_params(epochs=(6,), lr=(0.05,), batch_size=1)
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    assert results.stats.niter == 6
    assert np.isfinite(results.stats.losses).all()


def test_minibatching_manual_adjoint(gt):
    """Minibatching with a manual adjoint: glacier ids route through the
    gathered batch so per-glacier θ entries resolve correctly (previously
    silently unavailable for grad ∉ {jax, sciml})."""
    from odinn_tpu.inverse.adjoint_types import AutoVJP, DiscreteAdjoint

    params, glaciers, tstops = gt
    params = make_params(epochs=(4,), lr=(0.05,), batch_size=1)
    params = params.replace(
        UDE=UDEParameters(grad=DiscreteAdjoint(VJP_method=AutoVJP()))
    )
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    assert results.stats.niter == 4
    assert np.isfinite(results.stats.losses).all()
    # both glaciers' per-glacier A entries must have moved (ids routed right)
    theta0 = Inversion(model=model, glaciers=glaciers, parameters=params).theta
    moved = np.asarray(jnp.abs(inv.theta["A"] - theta0["A"]))
    assert (moved > 0).all(), f"per-glacier θ rows not all updated: {moved}"


def test_discrete_mb_vjp_matches_auto():
    """Analytic TImodel1 MB pullback vs AD (MB_VJP.jl:2-99 equivalent)."""
    from odinn_tpu.inverse.adjoint_types import AutoVJP, DiscreteVJP
    from odinn_tpu.inverse.vjps import vjp_mb_dH
    from odinn_tpu.physics.mass_balance import TImodel1

    clim = monthly_dummy_climate(5.0, 24, temp_mean=-2.0, nx=32, ny=32)
    g = halfar_glacier(nx=32, ny=32, dx=130.0, temp=-15.0, climate=clim)
    g = g.replace(B=jnp.full_like(g.B, 1800.0))
    lam = jax.random.normal(jax.random.PRNGKey(1), g.H0.shape, jnp.float64)
    mb = TImodel1()
    d_auto = vjp_mb_dH(AutoVJP(), lam, g.H0, g, mb, 5.5, 1.0 / 12.0)
    d_disc = vjp_mb_dH(DiscreteVJP(), lam, g.H0, g, mb, 5.5, 1.0 / 12.0)
    denom = float(jnp.linalg.norm(d_auto)) + 1e-30
    rel = float(jnp.linalg.norm(d_disc - d_auto)) / denom
    assert rel < 1e-10, f"discrete vs auto MB VJP mismatch: {rel}"


def test_time_utils():
    import datetime

    from odinn_tpu.utils.time_utils import (
        datetime_to_floatyear,
        floatyear_to_datetime,
        ind_from_t,
        stop_condition_tstops,
    )

    t = datetime_to_floatyear(datetime.datetime(2015, 7, 2))
    assert 2015.45 < t < 2015.55
    back = floatyear_to_datetime(t)
    assert back.year == 2015 and back.month == 7
    ts = jnp.array([0.0, 0.5, 1.0])
    assert int(ind_from_t(ts, 0.5)) == 1
    assert bool(stop_condition_tstops(0.5, ts))
    assert not bool(stop_condition_tstops(0.3, ts))


def test_numerical_failure_detection(gt):
    """Non-finite loss raises a diagnostic error (SURVEY §5 failure
    detection: the reference asserts retcodes / warns on exploding grads)."""
    import pytest as _pytest

    params, glaciers, tstops = gt
    # guaranteed blow-up: far too few substeps for max-range A
    params = params.replace(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-17),
        solver=SolverParameters(step=1.0 / 12.0, substeps=1),
        hyper=Hyperparameters(optimizer=("adam",), learning_rate=(5.0,), epochs=(20,)),
    )
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    inv.theta = {"A": jnp.array([4.0, 4.0])}   # tanh(4) ~ 1 → A near max
    with _pytest.raises(FloatingPointError, match="non-finite"):
        run_inversion(inv)
    assert inv.results is None or inv.results.stats is None  # aborted before results


def test_lawA_log_head(gt):
    """LawA(head="log"): bounded in [minA, maxA], differentiable, and
    better-conditioned at the cold end than the reference's linear-sigmoid
    map (the A range spans ~3 decades; see LawA docstring)."""
    from odinn_tpu.laws.laws import LawA, eval_law
    from odinn_tpu.models.model import init_theta

    params, glaciers, tstops = gt
    nn = NeuralNetwork(default_architecture(1, light=True), seed=1)
    law = LawA(nn, params, head="log")
    model = Model(iceflow=SIA2DModel(A=law))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    a0 = float(eval_law(law, inv.theta, glaciers[0], glacier_idx=0))
    assert params.physical.min_A <= a0 <= params.physical.max_A

    # gradient flows through the log head into the PDE loss
    loss_fn = lambda th: batch_transient_loss(th, inv.glaciers, model, params, tstops)
    g = jax.grad(loss_fn)(inv.theta)
    gmax = max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g["A"]))
    assert gmax > 0.0, "no gradient through the log head"

    with pytest.raises(ValueError, match="head"):
        LawA(nn, params, head="exp")


def test_lawA_fourier_pretrain_interpolates(gt):
    """LawA(n_fourier=...) + dense-LM pretraining interpolates recovered
    (T, A) targets far below the plain-tanh spectral-bias plateau (~1.7e-5
    max rel err; the Fourier embedding mirrors the reference's NN_utils
    Fourier features, NN_utils.jl:37-70), and eval_law reproduces the fit
    through the law's own input pipeline (prescale -> fourier -> MLP ->
    log head)."""
    from odinn_tpu.laws.laws import LawA, eval_law, poly_A_paterson_cuffey
    from odinn_tpu.models.nn import MLP
    from odinn_tpu.models.nn_utils import pretrain_law_from_A

    params, glaciers, tstops = gt
    a_fn = poly_A_paterson_cuffey()
    temps = np.linspace(-25.0, -14.0, 48)
    # targets with classical-inversion-like noise (not a smooth curve)
    rng = np.random.default_rng(0)
    A_tgt = np.asarray(jax.vmap(a_fn)(jnp.asarray(temps)), np.float64)
    A_tgt = A_tgt * (1.0 + 3e-5 * rng.standard_normal(48))

    nf = 8
    arch = MLP((2 * nf, 32, 1), ("tanh", "sigmoid"))
    nn = NeuralNetwork(arch, seed=666)
    pb = ((-25.0, 0.0),)
    th = pretrain_law_from_A(nn, params, temps, A_tgt, head="log",
                             prescale_bounds=pb, n_fourier=nf,
                             iters=300, restarts=2)
    law = LawA(nn, params, head="log", prescale_bounds=pb, n_fourier=nf)
    theta = {"A": th}
    # evaluate through the LAW (the full input pipeline), not the raw MLP
    g0 = glaciers[0]
    rels = []
    for i, (t, a) in enumerate(zip(temps[::6], A_tgt[::6])):
        gi = g0.replace(climate=dataclasses.replace(
            g0.climate, longterm_temps_scalar=jnp.asarray(float(t))))
        a_nn = float(eval_law(law, theta, gi, glacier_idx=0))
        rels.append(abs(a_nn - float(a)) / float(a))
    assert max(rels) < 1e-5, f"fourier fit does not interpolate: {max(rels):.2e}"


def test_grad_accum_chunks_matches_full_batch(gt):
    """hyper.grad_accum_chunks: sequential chunked accumulation must equal
    the full-batch loss and gradient exactly (same reduction tree per chunk;
    f64 here, so equality is tight)."""
    from odinn_tpu.simulation.inversion import _make_grad_fn, assemble_tstops, train_ude

    params, glaciers, tstops = gt
    params = make_params(epochs=(2,), lr=(0.05,), batch_size=64)
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    tst = assemble_tstops(params, inv.glaciers)

    from odinn_tpu.simulation.inversion import batch_transient_loss as btl
    loss_fn_b = lambda th, b, ids: btl(th, b, model, params, tst, glacier_ids=ids)

    vg_full = jax.jit(_make_grad_fn(inv, loss_fn_b))
    params2 = params.replace(hyper=dataclasses.replace(params.hyper, grad_accum_chunks=2))
    inv2 = Inversion(model=model, glaciers=inv.glaciers, parameters=params2,
                     theta=inv.theta)
    vg_chunk = jax.jit(_make_grad_fn(inv2, loss_fn_b))

    v1, g1 = vg_full(inv.theta, inv.glaciers)
    v2, g2 = vg_chunk(inv.theta, inv.glaciers)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)

    # grad_accum_chunks="auto" must also run and agree (resolves to
    # unchunked here: the batch is under 128 glaciers)
    params3 = params.replace(hyper=dataclasses.replace(params.hyper,
                                                       grad_accum_chunks="auto"))
    inv3 = Inversion(model=model, glaciers=inv.glaciers, parameters=params3,
                     theta=inv.theta)
    v3, g3 = jax.jit(_make_grad_fn(inv3, loss_fn_b))(inv.theta, inv.glaciers)
    np.testing.assert_allclose(float(v1), float(v3), rtol=1e-12)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


def test_staged_adam_matches_manual_optax_and_compiles_once(gt):
    """The staged-Adam ladder shares ONE jitted step across stages (the lr
    rides in the optimizer state via optax.inject_hyperparams — re-jitting
    per stage recompiled the identical fwd+grad program once per stage,
    measured ~40% of the at-scale part-1 training wall clock on the tunneled
    TPU). Semantics must be unchanged: each stage re-inits Adam moments and
    runs at its own lr, exactly like a hand-rolled per-stage optax loop."""
    import optax

    from odinn_tpu.simulation.inversion import Inversion, train_ude

    params, glaciers, tstops = gt
    params = make_params(epochs=(3, 3, 3), lr=(0.1, 0.02, 0.004),
                        optimizer=("adam", "adam", "adam"), batch_size=64)
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    theta0 = jax.tree.map(jnp.copy, inv.theta)
    res = train_ude(inv)

    # hand-rolled reference: fresh optax.adam per stage, same step order
    loss_fn = lambda th, b: batch_transient_loss(th, b, model, params, tstops)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    theta = theta0
    manual_losses = []
    for lr, n in zip((0.1, 0.02, 0.004), (3, 3, 3)):
        opt = optax.adam(lr)
        state = opt.init(theta)
        for _ in range(n):
            val, grads = vg(theta, inv.glaciers)
            updates, state = opt.update(grads, state, theta)
            theta = optax.apply_updates(theta, updates)
            manual_losses.append(float(val))
    np.testing.assert_allclose(res.stats.losses, manual_losses, rtol=1e-12)


def test_resolve_accum_chunks_auto_rule():
    """"auto" targets 64-glacier chunks (the measured TPU sweet spot) and
    never chunks batches that cannot hold >=64-glacier chunks."""
    from odinn_tpu.simulation.inversion import resolve_accum_chunks

    assert resolve_accum_chunks("auto", 128) == 2
    assert resolve_accum_chunks("auto", 256) == 4
    assert resolve_accum_chunks("auto", 512) == 8
    assert resolve_accum_chunks("auto", 64) == 1
    assert resolve_accum_chunks("auto", 96) == 1
    assert resolve_accum_chunks("auto", 15) == 1
    # n=192: k=3 gives exact 64-glacier chunks; k=2 (96) also valid — largest wins
    assert resolve_accum_chunks("auto", 192) == 3
    assert resolve_accum_chunks(4, 512) == 4
    assert resolve_accum_chunks(None, 10) == 1
