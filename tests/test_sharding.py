"""Mesh-sharded training: the TPU-native stand-in for the reference's
local-worker multiprocessing test (/root/reference/test/inversion_test.jl:13-18,
workers=3) — an 8-virtual-device CPU mesh with the glacier axis sharded.

Checks that the sharded loss/gradient equal the single-device values exactly
(the psum-over-mesh reduction must be bitwise-equivalent up to fp reduction
order).
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
from odinn_tpu.core.glacier import stack_glaciers
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.laws.laws import CuffeyPaterson, LawA
from odinn_tpu.models.model import Model, SIA2DModel, init_theta
from odinn_tpu.models.nn import NeuralNetwork, default_architecture
from odinn_tpu.parallel.mesh import make_mesh, pad_batch_to, replicate, shard_glacier_axis
from odinn_tpu.simulation.inversion import batch_transient_loss
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops


@pytest.fixture(scope="module")
def problem():
    tspan = (5.0, 5.5)
    # max_A bounds what the (randomly initialized) NN law can output; RK4 with
    # substeps=8 is CFL-stable up to A ≈ 4e-18 on this grid, so cap at 2e-18
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=2e-18),
        simulation=SimulationParameters(tspan=tspan, use_MB=False, use_velocities=False),
        solver=SolverParameters(step=1.0 / 12.0, substeps=8),
        hyper=Hyperparameters(optimizer="adam", learning_rate=1e-2, epochs=1),
        UDE=UDEParameters(grad="jax"),
    )
    # temps must stay inside RK4's CFL-stable range for substeps=6 — warmer
    # glaciers (≥ ~−18 °C) NaN the truth solve, and assert_allclose(nan, nan)
    # passes silently, making every comparison in this module vacuous
    temps = np.linspace(-25.0, -19.0, 8)
    glaciers = [
        halfar_glacier(nx=24, ny=24, dx=150.0, temp=float(t), rgi_id=f"s{i}")
        for i, t in enumerate(temps)
    ]
    tstops = build_tstops(tspan, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    for g in glaciers:
        assert np.isfinite(np.asarray(g.thickness_data.H)).all(), "NaN ground truth"
    nn = NeuralNetwork(default_architecture(1, light=True), seed=1)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    batch = stack_glaciers(glaciers)
    theta = init_theta(model, batch)
    return params, model, batch, theta, tstops


def test_sharded_loss_matches_single_device(problem):
    params, model, batch, theta, tstops = problem
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"

    loss_fn = lambda th, b: batch_transient_loss(th, b, model, params, tstops)
    ref_val, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(theta, batch)
    # a NaN reference makes every assert_allclose below vacuous (nan == nan)
    assert np.isfinite(float(ref_val)), "training-model loss is non-finite"

    mesh = make_mesh(8)
    sb, _ = pad_batch_to(batch, 8)
    sb = shard_glacier_axis(sb, mesh)
    st = replicate(theta, mesh)
    val, grads = jax.jit(jax.value_and_grad(loss_fn))(st, sb)

    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-12)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


def test_sharded_batch_placement(problem):
    params, model, batch, theta, tstops = problem
    mesh = make_mesh(8)
    sb, orig = pad_batch_to(batch, 8)
    assert orig == 8
    sb = shard_glacier_axis(sb, mesh)
    shard_counts = {len(sb.H0.sharding.device_set)}
    assert shard_counts == {8}, f"glacier axis not spread over mesh: {shard_counts}"


def test_pad_batch_contributes_zero(problem):
    """Padded lanes (repeated glacier, zeroed observations) add zero loss."""
    params, model, batch, theta, tstops = problem
    # take 5 glaciers, pad to 8
    batch5 = jax.tree.map(
        lambda x: x[:5] if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 8 else x,
        batch,
    )
    loss5 = float(batch_transient_loss(theta, batch5, model, params, tstops))
    padded, orig = pad_batch_to(batch5, 8)
    assert orig == 5 and padded.H0.shape[0] == 8
    loss8 = float(batch_transient_loss(theta, padded, model, params, tstops))
    np.testing.assert_allclose(loss8, loss5, rtol=1e-12)


def test_shard_map_explicit_collectives(problem):
    """Explicit shard_map + psum path equals the GSPMD-automatic path: shared
    NN θ gradient allreduced, loss identical."""
    from odinn_tpu.parallel.mesh import make_shard_map_value_and_grad

    params, model, batch, theta, tstops = problem
    mesh = make_mesh(8)
    vg = jax.jit(make_shard_map_value_and_grad(model, params, tstops, mesh))
    val, grads = vg(theta, batch)

    ref_val, ref_grads = jax.jit(
        jax.value_and_grad(lambda th: batch_transient_loss(th, batch, model, params, tstops))
    )(theta, )
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)


def test_train_ude_on_mesh_matches_single_device(problem):
    """Full ``train_ude`` consuming a mesh (the reference's automatic
    Distributed scale-out, config.jl:97-139): sharded losses per epoch equal
    the single-device run, including with a non-mesh-multiple glacier count
    (padded lanes) and through ``enable_multiprocessing`` registration."""
    from odinn_tpu.api import enable_multiprocessing
    from odinn_tpu.parallel.mesh import set_active_mesh
    from odinn_tpu.simulation.inversion import Inversion, train_ude

    params, model, batch, theta, tstops = problem
    params = params.replace(hyper=Hyperparameters(optimizer="adam", learning_rate=1e-2, epochs=3))
    # 7 glaciers: not a multiple of 8 → exercises the zero-loss padding
    batch7 = jax.tree.map(
        lambda x: x[:7] if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 8 else x,
        batch,
    )

    inv_ref = Inversion(model=model, glaciers=batch7, parameters=params,
                        theta=jax.tree.map(jnp.copy, theta))
    res_ref = train_ude(inv_ref)

    mesh = enable_multiprocessing()      # registers the active mesh
    try:
        assert mesh.size == 8
        inv_m = Inversion(model=model, glaciers=batch7, parameters=params,
                          theta=jax.tree.map(jnp.copy, theta))
        res_m = train_ude(inv_m)         # picks the mesh up automatically
    finally:
        set_active_mesh(None)

    np.testing.assert_allclose(res_m.stats.losses, res_ref.stats.losses, rtol=1e-9)
    for a, b in zip(jax.tree.leaves(inv_m.theta), jax.tree.leaves(inv_ref.theta)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)
    # results sliced back to the original glacier count (padding removed)
    assert res_m.simulation["H"].shape == res_ref.simulation["H"].shape
    assert res_m.simulation["H"].shape[0] == 7


@pytest.mark.slow   # composition edge: chunked accumulation x mesh; chunking
# alone (test_features) and mesh alone (above) stay in the default lane
def test_grad_accum_chunks_compose_with_mesh(problem):
    """Chunked gradient accumulation composes with glacier-axis sharding —
    the configuration a 512-glacier × 8-chip run uses (accum chunks bound
    HBM per chip; the mesh scales out). GSPMD repartitions the (k, n/k)
    chunk reshape; losses and θ must match the single-device chunked run."""
    from odinn_tpu.api import enable_multiprocessing
    from odinn_tpu.parallel.mesh import set_active_mesh
    from odinn_tpu.simulation.inversion import Inversion, train_ude

    params, model, batch, theta, tstops = problem
    params = params.replace(hyper=Hyperparameters(optimizer="adam", learning_rate=1e-2,
                                                  epochs=2, grad_accum_chunks=2))
    inv_ref = Inversion(model=model, glaciers=batch, parameters=params,
                        theta=jax.tree.map(jnp.copy, theta))
    res_ref = train_ude(inv_ref)

    mesh = enable_multiprocessing()
    try:
        inv_m = Inversion(model=model, glaciers=batch, parameters=params,
                          theta=jax.tree.map(jnp.copy, theta))
        res_m = train_ude(inv_m)
    finally:
        set_active_mesh(None)

    np.testing.assert_allclose(res_m.stats.losses, res_ref.stats.losses, rtol=1e-9)
    for a, b in zip(jax.tree.leaves(inv_m.theta), jax.tree.leaves(inv_ref.theta)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)


def test_shard_map_per_glacier_theta(problem):
    """Per-glacier θ (scalar A per glacier) stays sharded: local gradients,
    no collective — and matches the single-device gradient."""
    from odinn_tpu.laws.laws import LawA_inversion
    from odinn_tpu.models.model import Model, SIA2DModel, init_theta
    from odinn_tpu.parallel.mesh import make_shard_map_value_and_grad

    params, _, batch, _, tstops = problem
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    theta = init_theta(model, batch)
    assert theta["A"].shape == (8,)

    mesh = make_mesh(8)
    vg = jax.jit(make_shard_map_value_and_grad(model, params, tstops, mesh,
                                               per_glacier_keys=("A",)))
    val, grads = vg(theta, batch)
    ref_val, ref_grads = jax.jit(
        jax.value_and_grad(lambda th: batch_transient_loss(th, batch, model, params, tstops))
    )(theta)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(grads["A"]), np.asarray(ref_grads["A"]), rtol=1e-9)


def test_run_inversion_mesh_passthrough(problem):
    """``run_inversion(inv, mesh=...)`` reaches train_ude's sharding path
    without a session-registered mesh (r3 verdict Weak #6)."""
    from odinn_tpu.parallel.mesh import active_mesh
    from odinn_tpu.simulation.inversion import Inversion, run_inversion

    params, model, batch, theta, tstops = problem
    params = params.replace(hyper=Hyperparameters(
        optimizer="adam", learning_rate=1e-2, epochs=1, batch_size=8))
    assert active_mesh() is None
    mesh = make_mesh(8)
    inv = Inversion(model=model, glaciers=batch, parameters=params,
                    theta=jax.tree.map(jnp.copy, theta))
    res = run_inversion(inv, mesh=mesh)
    assert np.isfinite(res.stats.final_loss)
    assert res.simulation["H"].shape[0] == 8


def test_make_mesh_raises_on_insufficient_devices():
    """Asking for more devices than the default backend has must raise, not
    silently clamp — a clamped mesh let an '8-device' dryrun pass on one
    chip (callers that want clamping, e.g. api.enable_multiprocessing, warn
    and clamp before calling)."""
    import pytest

    from odinn_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="needs 16 devices"):
        make_mesh(16)
