"""Record-and-replay differentiable adaptivity (``adaptive="replay"``).

The reference's default training configuration differentiates through an
adaptive RDPK3Sp35 solve (InterpolatingAdjoint sensealg,
/root/reference/src/parameters/UDEparameters.jl:14-80; ``reltol =
params.solver.reltol`` in the training solve,
/root/reference/src/simulations/inversions/inversion_utils.jl:559-568).
These tests pin the TPU-native equivalent: one error-controlled BS3(2)
forward records its accepted dt sequence, which then replays as a fixed
``lax.scan`` schedule that (a) reproduces the adaptive trajectory to
roundoff and (b) is reverse-differentiable — the exact gradient of the
error-controlled trajectory with the accepted time grid held fixed, the same
convention as the reference's interpolating adjoint.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odinn_tpu.core.glacier import stack_glaciers
from odinn_tpu.core.params import (
    Hyperparameters,
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.laws.laws import ConstantA, LawA_inversion
from odinn_tpu.models.model import Model, SIA2DModel, init_theta
from odinn_tpu.simulation.prediction import forward_glacier, resolve_replay
from odinn_tpu.simulation.solver import (
    build_tstops,
    integrate_adaptive,
    integrate_replay,
)

A_TRUE = 8e-19
TSPAN = (5.0, 5.4)


def make_params(**solver_kw):
    sim_kw = {"use_MB": False, "use_velocities": False}
    sim_kw.update(solver_kw.pop("sim", {}))
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, **sim_kw),
        solver=SolverParameters(step=1.0 / 12.0, **solver_kw),
        UDE=UDEParameters(grad="jax"),
    )


@pytest.fixture(scope="module")
def setup():
    g = halfar_glacier(nx=40, ny=40, dx=90.0, temp=-15.0, A=A_TRUE)
    model = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)))
    tstops = build_tstops(TSPAN, 1.0 / 12.0)
    return g, model, tstops


def test_solver_replay_matches_adaptive(setup):
    """integrate_replay over the recorded dts reproduces the adaptive
    trajectory to roundoff (the BS3 update replayed at the accepted steps IS
    the update the adaptive loop applied)."""
    g, model, tstops = setup

    def rhs(H, t):
        return jnp.zeros_like(H) - 0.05 * H * jnp.sin(t)

    H0 = g.H0
    traj_ad, naccs, dts = integrate_adaptive(
        rhs, H0, tstops, rtol=1e-7, atol=1e-7,
        return_stats=True, return_dts=64,
    )
    assert int(jnp.max(naccs)) <= 64
    traj_rp = integrate_replay(rhs, H0, tstops, dts)
    np.testing.assert_allclose(np.asarray(traj_rp), np.asarray(traj_ad),
                               rtol=1e-12, atol=1e-10)
    # the recorded schedule tiles each save interval exactly
    np.testing.assert_allclose(np.asarray(dts.sum(axis=1)),
                               np.diff(np.asarray(tstops)), rtol=1e-12)


def test_forward_glacier_replay_matches_adaptive(setup):
    """resolve_replay + adaptive='replay' reproduces the adaptive=True SIA2D
    trajectory through the full forward_glacier path."""
    g, model, tstops = setup
    batch = stack_glaciers([g])

    p_rp = make_params(adaptive="replay", reltol=1e-6)
    p_rp = resolve_replay(p_rp, batch, model, None, tstops)
    assert p_rp.solver.replay_dts is not None
    traj_rp = np.asarray(forward_glacier(None, g, 0, model, p_rp, tstops))

    p_ad = make_params(adaptive=True, reltol=1e-6)
    traj_ad = np.asarray(forward_glacier(None, g, 0, model, p_ad, tstops))
    np.testing.assert_allclose(traj_rp, traj_ad, rtol=1e-9,
                               atol=1e-8 * np.abs(traj_ad).max())


def test_replay_gradient_fd_parity(setup):
    """jax.grad through the replayed solve matches central finite differences
    of the same fixed-schedule loss — the exact gradient of the
    error-controlled trajectory (reference gate: FD-parity of the sensealg
    gradient, test/test_grad_loss.jl)."""
    g, _, tstops = setup
    batch = stack_glaciers([g])
    p = make_params(adaptive="replay", reltol=1e-5)
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(p, scalar=True)))
    theta = init_theta(model, batch)
    p = resolve_replay(p, batch, model, theta, tstops)

    def loss(th):
        traj = forward_glacier(th, g, 0, model, p, tstops)
        return jnp.mean(traj[-1] ** 2)

    gr = jax.grad(loss)(theta)
    (leaf,), tdef = jax.tree.flatten(theta)
    (gleaf,) = jax.tree.leaves(gr)
    eps = 1e-4 * max(abs(float(leaf[0])), 1.0)
    th_p = jax.tree.unflatten(tdef, [leaf + eps])
    th_m = jax.tree.unflatten(tdef, [leaf - eps])
    fd = (float(loss(th_p)) - float(loss(th_m))) / (2 * eps)
    assert np.isfinite(fd) and abs(fd) > 0
    np.testing.assert_allclose(float(gleaf[0]), fd, rtol=5e-5)


def test_train_ude_replay(setup):
    """End-to-end: train_ude with adaptive='replay' resolves the schedule,
    trains, and improves the loss."""
    from odinn_tpu.simulation.inversion import Inversion, train_ude
    from odinn_tpu.simulation.prediction import generate_ground_truth

    g, model, tstops = setup
    p = make_params(adaptive="replay", reltol=1e-5)
    p = p.replace(hyper=Hyperparameters(optimizer="adam", learning_rate=5e-2,
                                        epochs=8, batch_size=4))
    (g_obs,) = generate_ground_truth([g], p, model, tstops, store=("H",))
    inv_model = Model(iceflow=SIA2DModel(A=LawA_inversion(p, scalar=True)))
    inv = Inversion(model=inv_model, glaciers=[g_obs], parameters=p)
    res = train_ude(inv)
    hist = np.asarray(res.stats.losses)
    assert np.isfinite(res.stats.final_loss)
    assert res.stats.final_loss < hist[0]
    assert inv.parameters.solver.replay_dts is not None


def test_replay_trains_on_mesh(setup):
    """adaptive='replay' composes with glacier-mesh sharding: the recorded
    schedule (a closed-over constant indexed by the traced glacier_idx)
    replicates under GSPMD and training on the 8-device mesh matches the
    single-device run."""
    from odinn_tpu.parallel.mesh import make_mesh
    from odinn_tpu.simulation.inversion import Inversion, train_ude
    from odinn_tpu.simulation.prediction import generate_ground_truth

    g, model, tstops = setup
    assert len(jax.devices()) == 8
    p = make_params(adaptive="replay", reltol=1e-5)
    p = p.replace(hyper=Hyperparameters(optimizer="adam", learning_rate=5e-2,
                                        epochs=3, batch_size=16))
    glaciers = [g.replace(rgi_id=f"rp{i}") for i in range(8)]
    obs = generate_ground_truth(glaciers, p, model, tstops, store=("H",))
    inv_model = Model(iceflow=SIA2DModel(A=LawA_inversion(p, scalar=True)))

    inv_ref = Inversion(model=inv_model, glaciers=list(obs), parameters=p)
    res_ref = train_ude(inv_ref)

    inv_m = Inversion(model=inv_model, glaciers=list(obs), parameters=p)
    res_m = train_ude(inv_m, mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(res_m.stats.losses),
                               np.asarray(res_ref.stats.losses), rtol=1e-8)


def test_replay_instability_recovers_or_fails_loudly(setup):
    """The recorded schedule is held fixed for gradient consistency, so an
    optimizer that outgrows its stability region mid-stage sends the loss
    non-finite — the guarantee under test: training NEVER silently returns
    a NaN-poisoned result. It rewinds to the best finite iterate,
    re-records the schedule there with compounding step-splitting, and
    reruns the stage; if the (deterministic) optimizer path re-explodes
    past the margin on every bounded attempt, it raises the loud
    FloatingPointError — with the attempted re-recordings on the stats.
    This config is deliberately violent (A must climb three decades inside
    one stage at a hot learning rate) so the bounded-attempts → loud-raise
    leg is exercised; milder drifts recover and continue (the substeps
    analogue of that leg is test_substeps_auto_staleness_guard)."""
    from odinn_tpu.simulation.inversion import Inversion, train_ude
    from odinn_tpu.simulation.prediction import generate_ground_truth

    g, _, tstops = setup
    p = make_params(adaptive="replay", reltol=1e-2)
    p = p.replace(
        physical=PhysicalParameters(min_A=2e-19, max_A=4e-16),
        hyper=Hyperparameters(optimizer=("adam", "adam"),
                              learning_rate=(0.8, 0.1),
                              epochs=(25, 5), batch_size=4),
    )
    truth = Model(iceflow=SIA2DModel(A=ConstantA(2e-16)))
    (g_obs,) = generate_ground_truth([g], p, truth, tstops, store=("H",))
    inv_model = Model(iceflow=SIA2DModel(A=LawA_inversion(p, scalar=True)))
    inv = Inversion(model=inv_model, glaciers=[g_obs], parameters=p)
    inv.theta = {"A": jnp.asarray([-2.0])}   # start near min_A

    with pytest.raises(FloatingPointError, match="non-finite"):
        train_ude(inv)
    # the raise came AFTER the bounded recovery loop did its work: the
    # schedule was re-recorded (with step-splitting) on every attempt —
    # non-silent by construction
    inv_stats = inv.parameters
    assert inv_stats.solver.replay_dts is not None
    # re-recorded schedules were installed into inversion.parameters by the
    # recovery path; the dt record reflects the last split attempt
    import numpy as _np

    dts = _np.asarray(inv_stats.solver.replay_dts)
    spans = _np.diff(_np.asarray(tstops))
    _np.testing.assert_allclose(dts.sum(axis=-1), spans[None, :], rtol=1e-8)


def test_replay_rejects_manual_adjoints(setup):
    from odinn_tpu.simulation.inversion import Inversion, train_ude

    g, model, tstops = setup
    p = make_params(adaptive="replay", reltol=1e-5)
    p = p.replace(UDE=UDEParameters(grad="discrete"))
    inv = Inversion(model=model, glaciers=[g], parameters=p)
    with pytest.raises(ValueError, match="replay"):
        train_ude(inv)


def test_replay_unresolved_raises(setup):
    g, model, tstops = setup
    p = make_params(adaptive="replay", reltol=1e-5)
    with pytest.raises(ValueError, match="resolve_replay"):
        forward_glacier(None, g, 0, model, p, tstops)
