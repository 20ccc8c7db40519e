"""Trainable sliding-coefficient (C) and Glen-exponent (n) laws.

Beyond-reference capability: the reference's ``Model`` exposes C and n slots
(/root/reference/src/models/trainable_components/Model.jl:81-123) but ships
learnable constructors only for A/Y/U (/root/reference/src/laws/Laws.jl);
odinn_tpu closes both slots (laws.LawC / LawC_inversion / LawN_inversion)
through the generic exact-pullback adjoint machinery. Test pattern mirrors
the reference's FD harness (/root/reference/test/test_grad_loss.jl:46-403).
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
from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate
from odinn_tpu.inverse.adjoint_types import DiscreteAdjoint, DiscreteVJP
from odinn_tpu.inverse.gradient import make_adjoint_value_and_grad
from odinn_tpu.laws.laws import (
    ConstantA,
    Law,
    LawC,
    LawC_inversion,
    LawN_inversion,
)
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.models.nn import NeuralNetwork, default_architecture
from odinn_tpu.simulation.inversion import Inversion, batch_transient_loss, run_inversion
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops

A_TRUE = 6.5e-18
MAX_C = 1e-15
# sliding/creep diffusivity ratio ≈ C·(ρg)³ / (A·Γ_noA·H̄): C ≈ 3e-16 with
# H̄ ≈ 200 m makes sliding an O(1) fraction of the total flux — well observed
C_TRUE = (3.0e-16, 6.0e-16)
N_TRUE = (2.8, 3.2)
# D ∝ (ρg·H̄·|∇S|)ⁿ: the n = 2.8 glacier's flux is ~100x smaller at the same
# A, leaving its n weakly constrained by a shared-loss inversion. Per-glacier
# known A equalizes the flux scales (the practical setup: n inversion with A
# fixed independently per glacier).
A_GLEN = (6.0e-16, 6.5e-18)
TSPAN = (5.0, 5.5)


def per_glacier_const_law(slot, values):
    vals = jnp.asarray(values)
    return Law(
        slot=slot,
        apply_fn=lambda th, inp: vals[inp["glacier_idx"]],
        inputs=(),
        callback_freq=0.0,
        trainable=False,
        name=f"Const{slot}",
    )


def make_params(epochs=(40,), lr=(0.1,), optimizer=("adam",), solver="RK4", substeps=10):
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18, min_C=0.0, max_C=MAX_C),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False, use_velocities=False),
        solver=SolverParameters(step=1.0 / 12.0, substeps=substeps, solver=solver,
                                cg_iters=20),
        hyper=Hyperparameters(optimizer=optimizer, learning_rate=lr, epochs=epochs),
        UDE=UDEParameters(grad="jax"),
    )


@pytest.fixture(scope="module")
def gt_sliding():
    """Ground truth with a known per-glacier sliding coefficient."""
    params = make_params()
    glaciers = [
        halfar_glacier(nx=24, ny=24, dx=170.0, temp=-15.0, A=A_TRUE, rgi_id="c0"),
        halfar_glacier(nx=24, ny=24, dx=170.0, temp=-20.0, A=A_TRUE, rgi_id="c1"),
    ]
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(
        iceflow=SIA2DModel(A=ConstantA(A_TRUE), C=per_glacier_const_law("C", C_TRUE))
    )
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    return params, glaciers, tstops


def test_sliding_c_gradient_vs_fd(gt_sliding):
    """dL/dθ_C: AD through the solve and the manual discrete adjoint both
    match FD (the reference's harness pattern applied to the C slot)."""
    params, glaciers, tstops = gt_sliding
    model = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE), C=LawC_inversion(params)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    assert set(inv.theta) == {"C"} and inv.theta["C"].shape == (2,)

    loss_fn = jax.jit(
        lambda th: batch_transient_loss(th, inv.glaciers, model, params, tstops)
    )
    g_fd = fd_gradient(loss_fn, inv.theta, eps=1e-6)

    g_ad = jax.grad(loss_fn)(inv.theta)
    flat, _ = flatten_theta(g_ad)
    ratio, angle, relerr = grad_metrics(np.asarray(flat), g_fd)
    assert ratio < 1e-5 and angle < 1e-7 and relerr < 1e-5, (ratio, angle, relerr)

    adj = DiscreteAdjoint(VJP_method=DiscreteVJP())
    inv2 = Inversion(
        model=model,
        glaciers=glaciers,
        parameters=params.replace(UDE=UDEParameters(grad=adj)),
        theta=inv.theta,
    )
    val, g_man = make_adjoint_value_and_grad(inv2, flavor=adj.name)(inv.theta)
    np.testing.assert_allclose(float(val), float(loss_fn(inv.theta)), rtol=1e-8)
    flat_m, _ = flatten_theta(g_man)
    ratio, angle, relerr = grad_metrics(np.asarray(flat_m), g_fd)
    assert ratio < 1e-5 and angle < 1e-7 and relerr < 1e-5, (ratio, angle, relerr)


@pytest.mark.slow
def test_sliding_c_inversion_recovers_truth(gt_sliding):
    """Classical per-glacier sliding inversion recovers the truth C (A known)."""
    params, glaciers, tstops = gt_sliding
    params = make_params(epochs=(60,), lr=(0.2,))
    model = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE), C=LawC_inversion(params)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    losses = results.stats.losses
    assert np.isfinite(losses).all()
    assert losses[-1] < 1e-2 * losses[0]
    c_rec = MAX_C * (np.tanh(np.asarray(results.stats.theta["C"])) + 1.0) / 2.0
    rel = np.abs(c_rec - np.asarray(C_TRUE)) / np.asarray(C_TRUE)
    assert rel.max() < 0.05, f"C recovery rel err {rel}"


@pytest.fixture(scope="module")
def gt_glen():
    """Ground truth with a known per-glacier Glen exponent (creep only).

    n = 3.2 raises the diffusivity ~20x over n = 3 (Γ(n)·H̄^{n+2} at
    H̄ ≈ 300 m), far past the explicit CFL bound at these substeps — the
    unconditionally stable semi-implicit solver handles the whole n range."""
    params = make_params(solver="SI", substeps=1)
    glaciers = [
        halfar_glacier(nx=24, ny=24, dx=170.0, temp=-15.0, A=A_TRUE, rgi_id="n0"),
        halfar_glacier(nx=24, ny=24, dx=170.0, temp=-20.0, A=A_TRUE, rgi_id="n1"),
    ]
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(
        iceflow=SIA2DModel(
            A=per_glacier_const_law("A", A_GLEN),
            n=per_glacier_const_law("n", N_TRUE),
        )
    )
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    return params, glaciers, tstops


def test_glen_n_gradient_vs_fd(gt_glen):
    """dL/dθ_n is NaN-free (the _pow zero-base guard) and matches FD."""
    params, glaciers, tstops = gt_glen
    model = Model(
        iceflow=SIA2DModel(A=per_glacier_const_law("A", A_GLEN), n=LawN_inversion(params))
    )
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    assert set(inv.theta) == {"n"} and inv.theta["n"].shape == (2,)

    loss_fn = jax.jit(
        lambda th: batch_transient_loss(th, inv.glaciers, model, params, tstops)
    )
    g_ad = jax.grad(loss_fn)(inv.theta)
    assert np.isfinite(np.asarray(g_ad["n"])).all(), "NaN in dL/dn (zero-base pow)"
    g_fd = fd_gradient(loss_fn, inv.theta, eps=1e-6)
    flat, _ = flatten_theta(g_ad)
    ratio, angle, relerr = grad_metrics(np.asarray(flat), g_fd)
    assert ratio < 1e-5 and angle < 1e-7 and relerr < 1e-5, (ratio, angle, relerr)


@pytest.mark.slow
def test_glen_n_inversion_recovers_truth(gt_glen):
    """Per-glacier Glen-exponent inversion recovers the truth n (A known)."""
    params, glaciers, tstops = gt_glen
    # Adam alone needs hundreds of epochs for the cold glacier (its creep
    # flux — hence dL/dn — is ~20x smaller); an LBFGS tail converges both
    params = make_params(optimizer=("adam", "lbfgs"), epochs=(30, 30),
                         lr=(0.2, 1.0), solver="SI", substeps=1)
    model = Model(
        iceflow=SIA2DModel(A=per_glacier_const_law("A", A_GLEN), n=LawN_inversion(params))
    )
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    losses = results.stats.losses
    assert np.isfinite(losses).all()
    assert losses[-1] < 1e-2 * losses[0]
    lo, hi = 1.5, 4.2
    n_rec = lo + (hi - lo) * (np.tanh(np.asarray(results.stats.theta["n"])) + 1.0) / 2.0
    rel = np.abs(n_rec - np.asarray(N_TRUE)) / np.asarray(N_TRUE)
    assert rel.max() < 0.02, f"n recovery rel err {rel}"


def test_model_rejects_law_in_wrong_slot():
    """Assigning a law to a slot it was not built for raises (Model.jl:81-123
    slot validation): C=LawA(...) would silently feed creep values into the
    sliding term otherwise."""
    params = make_params()
    with pytest.raises(ValueError, match="slot"):
        Model(iceflow=SIA2DModel(C=LawC_inversion(params).__class__(
            slot="A",
            apply_fn=lambda th, inp: 0.0,
            inputs=(),
            callback_freq=0.0,
            trainable=False,
            name="misplaced",
        )))


@pytest.mark.slow
def test_nn_c_ude_recovers_synthetic_sliding():
    """UDE on the sliding slot: train C = NN(CPDD, topo roughness) against H
    observations generated with the SyntheticC law (A known) — the C-slot
    counterpart of the reference's A-law functional inversion, which the
    reference cannot express (no learnable C constructor)."""
    from odinn_tpu.laws.laws import SyntheticC

    glaciers = []
    for i in range(2):
        clim = monthly_dummy_climate(4.0, 30, temp_mean=2.0, nx=24, ny=24,
                                     longterm_temp=-15.0)
        g = halfar_glacier(nx=24, ny=24, dx=100.0, temp=-15.0, A=A_TRUE,
                           rgi_id=f"cu{i}", climate=clim)
        # bed bumps (~500 m wavelength, 5·dx — resolvable) with a west→east
        # amplitude ramp: roughness (bed-Laplacian std) sweeps ~0→0.03, so
        # SyntheticC's exp(−rough/1e-2) factor spans ~1→0.05 across the
        # domain — real structure for the NN to learn (uniform bumps leave C
        # within 15% of max_C everywhere)
        ramp = (g.coords_x - g.coords_x[0]) / (g.coords_x[-1] - g.coords_x[0])
        bumps = (120.0 * ramp)[:, None] * jnp.sin(g.coords_x / 80.0)[:, None] * jnp.cos(
            g.coords_y / (70.0 + 20.0 * i))[None, :]
        glaciers.append(g.replace(B=g.B + 1500.0 + bumps))

    # sliding at C ~ max_C violates the explicit CFL bound → semi-implicit
    params = make_params(optimizer=("adam", "adam", "adam"), epochs=(40, 40, 40),
                         lr=(0.1, 0.03, 0.01), solver="SI", substeps=1)
    tstops = build_tstops(TSPAN, params.solver.step)
    c_truth = SyntheticC(params, c_max=MAX_C)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE), C=c_truth))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))

    nn = NeuralNetwork(default_architecture(2, light=True), seed=11)
    model = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE), C=LawC(nn, params)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    losses = results.stats.losses
    assert np.isfinite(losses).all()
    assert results.stats.final_loss < 0.25 * losses[0], (
        f"sliding UDE did not train: {losses[0]} -> {results.stats.final_loss}"
    )
    # the learned law must track the synthetic truth pointwise on glacier 0
    from odinn_tpu.laws.laws import eval_law

    c_t = np.asarray(eval_law(c_truth, None, glaciers[0], state=glaciers[0].H0,
                              t=float(tstops[0])))
    c_l = np.asarray(eval_law(model.iceflow.C, results.stats.theta, glaciers[0],
                              state=glaciers[0].H0, t=float(tstops[0])))
    mask = np.asarray(jnp.where(
        jnp.minimum(glaciers[0].H0[:-1, :-1], glaciers[0].H0[1:, 1:]) > 50.0, 1.0, 0.0
    )) > 0
    corr = np.corrcoef(c_t[mask], c_l[mask])[0, 1]
    assert corr > 0.6, f"learned C uncorrelated with SyntheticC truth: r={corr:.3f}"


def test_nn_c_law_wiring():
    """LawC (NN sliding law): staggered-grid output in [minC, maxC], gradient
    flows into θ['C'] through the RHS exact pullback."""
    clim = monthly_dummy_climate(4.0, 24, temp_mean=2.0, nx=24, ny=24)
    g = halfar_glacier(nx=24, ny=24, dx=170.0, temp=-15.0, A=A_TRUE, climate=clim)
    g = g.replace(B=g.B + 1500.0 + 40.0 * jnp.sin(g.coords_x / 400.0)[:, None])
    params = make_params()
    nn = NeuralNetwork(default_architecture(2, light=True), seed=7)
    c_law = LawC(nn, params)
    model = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE), C=c_law))
    from odinn_tpu.laws.laws import eval_law
    from odinn_tpu.inverse.vjps import rhs_with_theta
    from odinn_tpu.models.model import init_theta

    theta = init_theta(model, [g])
    c_val = eval_law(c_law, theta, g, state=g.H0, t=5.0)
    assert c_val.shape == (23, 23)
    assert float(c_val.min()) >= 0.0 and float(c_val.max()) <= MAX_C

    def f(th):
        return jnp.sum(rhs_with_theta(g.H0, th, g, 0, model, params, 5.0) ** 2)

    grad = jax.grad(f)(theta)
    gnorm = sum(float(jnp.abs(v).max()) for v in jax.tree_util.tree_leaves(grad["C"]))
    assert np.isfinite(gnorm) and gnorm > 0.0, "no gradient into the NN sliding law"
