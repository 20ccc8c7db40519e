"""Spatial (grid-row) sharding — the 2-D dp×sp mesh scale-out axis.

The reference's Distributed.jl parallelism is glacier-level only: one Julia
process per glacier, a single glacier's domain capped by one host's memory
(/root/reference/src/setup/config.jl:97-139).  `odinn_tpu.parallel.spatial`
adds a second mesh axis over grid rows so one huge domain (ice-sheet-scale)
spreads across chips, with XLA's SPMD partitioner inserting the stencil halo
exchanges.  These tests pin, on the 8-virtual-device CPU mesh:

- zero-dynamics row padding is loss/gradient-neutral;
- the 2-D-sharded loss/grad equal the single-device values;
- `train_ude` runs unchanged on a 2-D mesh (dispatch via `shard_inversion`)
  and returns results sliced back to the original shapes;
- grid-shaped per-glacier θ placement rules (and the padding guard).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

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
from odinn_tpu.parallel.mesh import shard_inversion
from odinn_tpu.parallel.spatial import (
    make_mesh_2d,
    pad_batch_rows,
    shard_theta_spatial,
)
from odinn_tpu.simulation.inversion import batch_transient_loss
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops


@pytest.fixture(scope="module")
def problem():
    tspan = (5.0, 5.5)
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=2e-18),
        simulation=SimulationParameters(tspan=tspan, use_MB=False, use_velocities=False),
        solver=SolverParameters(step=1.0 / 12.0, substeps=8),
        hyper=Hyperparameters(optimizer="adam", learning_rate=1e-2, epochs=1),
        UDE=UDEParameters(grad="jax"),
    )
    temps = np.linspace(-25.0, -19.0, 4)
    glaciers = [
        halfar_glacier(nx=24, ny=24, dx=150.0, temp=float(t), rgi_id=f"sp{i}")
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


def test_row_padding_contributes_zero(problem):
    """Zero-dynamics row padding (24 → 25 rows) leaves loss AND gradient
    bitwise-equal up to fp reduction order (mask = 0 on the pad ⇒ no
    numerator or normalization contribution)."""
    params, model, batch, theta, tstops = problem
    padded, nx0 = pad_batch_rows(batch, 5)
    assert nx0 == 24 and padded.H0.shape[-2] == 25
    assert padded.thickness_data.H.shape[-2] == 25

    loss_fn = lambda th, b: batch_transient_loss(th, b, model, params, tstops)
    ref_val, ref_g = jax.jit(jax.value_and_grad(loss_fn))(theta, batch)
    assert np.isfinite(float(ref_val))
    val, g = jax.jit(jax.value_and_grad(loss_fn))(theta, padded)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-12)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


def test_row_padding_noop_when_divisible(problem):
    params, model, batch, theta, tstops = problem
    padded, nx0 = pad_batch_rows(batch, 4)
    assert nx0 == 24 and padded is batch


def test_2d_mesh_loss_and_grad_match(problem):
    """(4 glaciers × 2 rows) mesh: `shard_inversion` dispatches to the spatial
    path, grids spread over all 8 devices, loss/grad equal single-device."""
    params, model, batch, theta, tstops = problem
    assert len(jax.devices()) == 8

    loss_fn = lambda th, b: batch_transient_loss(th, b, model, params, tstops)
    ref_val, ref_g = jax.jit(jax.value_and_grad(loss_fn))(theta, batch)

    mesh = make_mesh_2d(n_glaciers=4, n_rows=2)
    st, sb, n_orig = shard_inversion(theta, batch, mesh)
    assert n_orig == 4
    # grids sharded over BOTH axes → all 8 devices hold a piece
    assert len(sb.H0.sharding.device_set) == 8
    # shared NN θ replicated
    leaf = jax.tree.leaves(st)[0]
    assert leaf.sharding.is_fully_replicated

    val, g = jax.jit(jax.value_and_grad(loss_fn))(st, sb)
    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-12)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


def test_train_ude_on_2d_mesh_matches_single_device(problem):
    """Full `train_ude` on a 2-D dp×sp mesh equals the single-device run —
    same per-epoch losses, same trained θ, results sliced back to the
    original (unpadded) grid shape."""
    from odinn_tpu.simulation.inversion import Inversion, train_ude

    params, model, batch, theta, tstops = problem
    params = params.replace(
        hyper=Hyperparameters(optimizer="adam", learning_rate=1e-2, epochs=3)
    )
    inv_ref = Inversion(model=model, glaciers=batch, parameters=params,
                        theta=jax.tree.map(jnp.copy, theta))
    res_ref = train_ude(inv_ref)

    mesh = make_mesh_2d(n_glaciers=4, n_rows=2)
    inv_m = Inversion(model=model, glaciers=batch, parameters=params,
                      theta=jax.tree.map(jnp.copy, theta))
    res_m = train_ude(inv_m, mesh=mesh)

    np.testing.assert_allclose(res_m.stats.losses, res_ref.stats.losses, rtol=1e-9)
    for a, b in zip(jax.tree.leaves(inv_m.theta), jax.tree.leaves(inv_ref.theta)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)
    assert res_m.simulation["H"].shape == res_ref.simulation["H"].shape
    np.testing.assert_allclose(
        np.asarray(res_m.simulation["H"]), np.asarray(res_ref.simulation["H"]),
        rtol=1e-8, atol=1e-12,
    )


@pytest.mark.slow  # second grid shape (26 rows → padded 28) ⇒ extra jit compiles
def test_train_ude_2d_mesh_with_row_padding(problem):
    """Row count NOT divisible by the mesh's rows axis (26 % 4 = 2): the
    spatial path zero-pads to 28 rows, trains identically, and slices the
    padding back off the stored results."""
    from odinn_tpu.simulation.inversion import Inversion, train_ude

    params, model, _, _, tstops = problem
    params = params.replace(
        hyper=Hyperparameters(optimizer="adam", learning_rate=1e-2, epochs=2)
    )
    temps = [-25.0, -20.0]
    glaciers = [
        halfar_glacier(nx=26, ny=24, dx=150.0, temp=t, rgi_id=f"pad{i}")
        for i, t in enumerate(temps)
    ]
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    nn = NeuralNetwork(default_architecture(1, light=True), seed=1)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    batch = stack_glaciers(glaciers)
    theta = init_theta(model, batch)

    inv_ref = Inversion(model=model, glaciers=batch, parameters=params,
                        theta=jax.tree.map(jnp.copy, theta))
    res_ref = train_ude(inv_ref)

    mesh = make_mesh_2d(n_glaciers=2, n_rows=4)
    inv_m = Inversion(model=model, glaciers=batch, parameters=params,
                      theta=jax.tree.map(jnp.copy, theta))
    res_m = train_ude(inv_m, mesh=mesh)

    np.testing.assert_allclose(res_m.stats.losses, res_ref.stats.losses, rtol=1e-9)
    for a, b in zip(jax.tree.leaves(inv_m.theta), jax.tree.leaves(inv_ref.theta)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)
    # padding (26 → 28 rows) sliced back off the stored trajectories
    assert res_m.simulation["H"].shape == res_ref.simulation["H"].shape
    assert res_m.simulation["H"].shape[-2] == 26


def test_theta_spatial_placement(problem):
    """Grid-shaped per-glacier θ (trainable IC fields) shards on BOTH axes;
    shared θ replicates; and row padding + grid θ raises the guard."""
    from odinn_tpu.parallel.spatial import shard_inversion_spatial

    params, model, batch, theta, tstops = problem
    mesh = make_mesh_2d(n_glaciers=4, n_rows=2)

    th = dict(theta)
    th["IC"] = jnp.zeros((4, 24, 24))
    placed = shard_theta_spatial(th, mesh)
    assert placed["IC"].sharding.spec == P("glaciers", "rows", None)
    for k, v in placed.items():
        if k != "IC":
            for leaf in jax.tree.leaves(v):
                assert leaf.sharding.is_fully_replicated

    # guard: grid θ is shape-incompatible with row padding
    mesh25 = make_mesh_2d(n_glaciers=2, n_rows=4)  # 24 % 4 == 0 → no pad
    g25 = jax.tree.map(
        lambda x: x
        if not (hasattr(x, "ndim") and x.ndim >= 2 and x.shape[-2:] == (24, 24))
        else jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, 1), (0, 0)]),
        batch,
    )  # 25 rows: 25 % 4 != 0 → padding required
    th25 = dict(theta)
    th25["IC"] = jnp.zeros((4, 25, 24))
    with pytest.raises(NotImplementedError, match="spatial sharding with row padding"):
        shard_inversion_spatial(th25, g25, mesh25)


@pytest.mark.slow  # composition row: manual adjoint x LM stage x 2-D mesh
def test_manual_adjoint_and_lm_on_2d_mesh(problem):
    """The production optimizer ladder (Adam -> LM) with the MANUAL discrete
    adjoint (grad="discrete") runs unchanged on the 2-D dp x sp mesh and
    matches the single-device run — GSPMD partitions the hand-written
    adjoint sweep and the LM CG body exactly like the AD path."""
    from odinn_tpu.simulation.inversion import Inversion, train_ude

    params, model, batch, theta, tstops = problem
    params = params.replace(
        hyper=Hyperparameters(optimizer=("adam", "lm"),
                              learning_rate=(1e-2, 1e-2), epochs=(2, 2),
                              batch_size=4, gn_cg_iters=4),
        UDE=UDEParameters(grad="discrete"),
    )
    inv_ref = Inversion(model=model, glaciers=batch, parameters=params,
                        theta=jax.tree.map(jnp.copy, theta))
    res_ref = train_ude(inv_ref)

    mesh = make_mesh_2d(n_glaciers=4, n_rows=2)
    inv_m = Inversion(model=model, glaciers=batch, parameters=params,
                      theta=jax.tree.map(jnp.copy, theta))
    res_m = train_ude(inv_m, mesh=mesh)

    np.testing.assert_allclose(res_m.stats.losses, res_ref.stats.losses,
                               rtol=1e-8)
    for a, b in zip(jax.tree.leaves(inv_m.theta), jax.tree.leaves(inv_ref.theta)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
