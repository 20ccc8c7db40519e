"""Heterogeneous glacier grids: padding correctness end to end.

The reference sidesteps unequal grid sizes by running one Julia process per
glacier (/root/reference/src/setup/config.jl:97-139, ML_utils.jl:81-231);
the TPU-native batch instead pads every glacier to the max (nx, ny)
(`core.glacier.pad_glacier`/`stack_glaciers`) so one vmapped solve covers
the set. These tests pin the two properties that make that sound:

1. the padded solve equals the unpadded solve on the original interior
   (zero-dynamics padding: H0 = 0, edge-replicated bedrock, mask = 0);
2. a mixed-size batch trains — gradients are finite, the manual discrete
   adjoint agrees with AD at roundoff on the padded batch, and a short
   classical inversion recovers each glacier's A.
"""

import jax
import jax.numpy as jnp
import numpy as np

from odinn_tpu.core.glacier import pad_glacier, stack_glaciers
from odinn_tpu.core.params import (
    Hyperparameters,
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.inverse.adjoint_types import DiscreteAdjoint, DiscreteVJP
from odinn_tpu.inverse.gradient import make_adjoint_value_and_grad
from odinn_tpu.laws.laws import ConstantA, LawA_inversion
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.simulation.inversion import Inversion, batch_transient_loss, run_inversion
from odinn_tpu.simulation.prediction import forward_glacier, generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops
from grad_utils import flatten_theta

A_TRUE = 6.5e-18
TSPAN = (5.0, 5.5)


def _params(**hyper):
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False),
        solver=SolverParameters(step=1.0 / 12.0, substeps=10),
        hyper=Hyperparameters(**hyper) if hyper else Hyperparameters(),
        UDE=UDEParameters(grad="jax"),
    )


def test_padded_forward_matches_unpadded():
    """pad_glacier's contract: the solve on the padded grid reproduces the
    unpadded trajectory on the original cells (and stays identically zero on
    the padding)."""
    params = _params()
    # r0=600 keeps the margin ≥3 cells inside the 26×22 domain over the span
    # (outer-3-ring H ≤ 4e-11 m, the nonlinear-diffusion tail) — the contract
    # only holds while the ice does not interact with the original border,
    # where the two solves legitimately differ (border flux clamp vs flow
    # into the padding).
    g = halfar_glacier(nx=26, ny=22, dx=130.0, dy=130.0, r0=600.0,
                       temp=-15.0, A=A_TRUE)
    tstops = build_tstops(TSPAN, params.solver.step)
    model = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)))

    traj = forward_glacier(None, g, jnp.asarray(0), model, params, tstops)
    gp = pad_glacier(g, 32, 32)
    traj_p = forward_glacier(None, gp, jnp.asarray(0), model, params, tstops)

    np.testing.assert_allclose(
        np.asarray(traj_p[:, :26, :22]), np.asarray(traj), rtol=1e-9, atol=1e-9
    )
    pad_cells = np.concatenate([
        np.asarray(traj_p[:, 26:, :]).ravel(), np.asarray(traj_p[:, :, 22:]).ravel()
    ])
    assert float(np.abs(pad_cells).max()) < 1e-9


def test_mixed_size_batch_adjoint_parity_and_inversion():
    """Two glaciers with different (nx, ny): AD and the manual discrete
    adjoint agree at roundoff on the padded batch, and a short classical
    inversion recovers both per-glacier A's."""
    params = _params(optimizer=("adam", "adam"), learning_rate=(0.1, 0.02),
                     epochs=(40, 40), batch_size=2)
    glaciers = [
        halfar_glacier(nx=32, ny=32, dx=130.0, dy=130.0, temp=-15.0,
                       A=A_TRUE, rgi_id="big"),
        halfar_glacier(nx=22, ny=26, dx=130.0, dy=130.0, r0=600.0, h0=450.0,
                       temp=-20.0, A=3.0e-18, rgi_id="small"),
    ]
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(
        A=LawA_inversion(params, scalar=True), n_value=3.0))
    # truth θ: per-glacier A's mapped through the tanh bound
    phys = params.physical
    a_true = np.array([A_TRUE, 3.0e-18])
    th_truth = {"A": jnp.asarray(np.arctanh(
        2 * (a_true - phys.min_A) / (phys.max_A - phys.min_A) - 1))}
    glaciers = generate_ground_truth(glaciers, params, truth, tstops,
                                     theta=th_truth, store=("H",))
    batch = glaciers if not isinstance(glaciers, list) else stack_glaciers(glaciers)
    assert batch.H0.shape == (2, 32, 32)

    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True),
                                     n_value=3.0))
    inv = Inversion(model=model, glaciers=batch, parameters=params)

    loss_fn = jax.jit(
        lambda th: batch_transient_loss(th, inv.glaciers, model, params, tstops))
    g_ad = jax.jit(jax.grad(loss_fn))(inv.theta)
    flat_ad, _ = flatten_theta(g_ad)
    assert np.isfinite(np.asarray(flat_ad)).all()

    adjoint = DiscreteAdjoint(VJP_method=DiscreteVJP())
    p2 = params.replace(UDE=UDEParameters(grad=adjoint))
    inv2 = Inversion(model=model, glaciers=batch, parameters=p2, theta=inv.theta)
    val, g_man = make_adjoint_value_and_grad(inv2, flavor="discrete")(inv.theta)
    np.testing.assert_allclose(float(val), float(loss_fn(inv.theta)), rtol=1e-8)
    flat_man, _ = flatten_theta(g_man)
    rel = np.abs(np.asarray(flat_man) - np.asarray(flat_ad)) / (
        np.abs(np.asarray(flat_ad)) + 1e-30)
    assert rel.max() < 1e-6, f"manual vs AD on mixed batch: rel {rel.max():.2e}"

    results = run_inversion(inv)
    losses = results.stats.losses
    assert np.isfinite(losses).all() and losses[-1] < 1e-2 * losses[0]
    a_rec = phys.min_A + (phys.max_A - phys.min_A) * (
        np.tanh(np.asarray(inv.theta["A"], np.float64)) + 1) / 2
    rels = np.abs(a_rec - a_true) / a_true
    assert rels.max() < 0.05, f"A recovery on mixed-size batch: {rels}"


def test_loss_invariant_under_batch_padding():
    """A glacier's loss contribution must not depend on which batch it is
    stacked in: `Glacier.npix` pins the normalization to the PRE-padding
    pixel count (the reference normalizes by each glacier's own prod(size),
    Losses.jl:29-151 — its per-glacier processes never pad). Before this
    field, stacking a 22×26 glacier next to a 32×32 one silently rescaled
    its loss by (32·32)/(22·26)."""
    params = _params()
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)))
    small = halfar_glacier(nx=22, ny=26, dx=130.0, dy=130.0, r0=600.0,
                           h0=450.0, temp=-20.0, A=A_TRUE, rgi_id="small")
    big = halfar_glacier(nx=32, ny=32, dx=130.0, dy=130.0, temp=-15.0,
                         A=A_TRUE, rgi_id="big")
    (small,) = generate_ground_truth([small], params, truth, tstops, store=("H",))
    (big,) = generate_ground_truth([big], params, truth, tstops, store=("H",))

    model = Model(iceflow=SIA2DModel(A=ConstantA(2.0e-18)))
    alone = float(batch_transient_loss(
        None, stack_glaciers([small]), model, params, tstops))
    mixed = batch_transient_loss(
        None, stack_glaciers([small, big]), model, params, tstops)
    big_alone = float(batch_transient_loss(
        None, stack_glaciers([big]), model, params, tstops))
    # batch loss is the sum of per-glacier losses, each with its own
    # original-grid normalization
    np.testing.assert_allclose(float(mixed), alone + big_alone, rtol=1e-12)
