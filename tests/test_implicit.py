"""Semi-implicit solver: Halfar accuracy, unconditional stability, implicit
differentiation, end-to-end training without CFL sizing."""

import jax
import jax.numpy as jnp
import numpy as np

from odinn_tpu.core.params import (
    Hyperparameters,
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.data.halfar import Halfar, HalfarParameters
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.laws.laws import ConstantA, LawA_inversion
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.physics.sia2d import SIAValues, sia2d_rhs
from odinn_tpu.physics.targets import ATarget
from odinn_tpu.simulation.implicit import integrate_semi_implicit
from odinn_tpu.simulation.inversion import Inversion, run_inversion
from odinn_tpu.simulation.prediction import forward_glacier, generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops, integrate_scan

PHYS = PhysicalParameters(min_A=8e-21, max_A=8e-17)
A = 8e-19


def halfar_setup(nx=96, dx=50.0):
    p = HalfarParameters(R0=1000.0, H0=500.0, A=A, n=3.0, rho=PHYS.rho, g=PHYS.g)
    fn, _ = Halfar(p)
    xs = jnp.array([(i - nx / 2) * dx for i in range(nx)])
    x, y = jnp.meshgrid(xs, xs, indexing="ij")
    vals = SIAValues(A=jnp.asarray(A), C=jnp.asarray(0.0), n=jnp.asarray(3.0),
                     p=jnp.asarray(3.0), q=jnp.asarray(0.0))
    return fn, x, y, (lambda hb, gs: vals), vals


def test_si_matches_halfar_one_step_per_month():
    fn, x, y, vfn, _ = halfar_setup()
    H0 = fn(x, y, 5.0)
    tst = build_tstops((5.0, 7.0), 1.0 / 12.0)
    tr = jax.jit(
        lambda h: integrate_semi_implicit(h, jnp.zeros_like(h), 50.0, 50.0, vfn,
                                          ATarget(), PHYS, tst, substeps=1, cg_iters=30)
    )(H0)
    Href = fn(x, y, 7.0)
    m = np.asarray(Href > 10.0)
    rel = np.abs(np.asarray(tr[-1] - Href))[m] / np.asarray(Href)[m]
    assert rel.mean() < 2e-2


def test_si_unconditionally_stable():
    """100x the stiffness, still one step per month — explicit methods at this
    budget blow up (cf. tests/test_periodic_laws.py cap test)."""
    fn, x, y, _, vals = halfar_setup()
    H0 = fn(x, y, 5.0)
    big = vals.replace(A=jnp.asarray(8e-17))
    tst = build_tstops((5.0, 6.0), 1.0 / 12.0)
    tr = jax.jit(
        lambda h: integrate_semi_implicit(h, jnp.zeros_like(h), 50.0, 50.0,
                                          lambda hb, gs: big, ATarget(), PHYS, tst,
                                          substeps=1, cg_iters=40)
    )(H0)
    assert np.isfinite(np.asarray(tr)).all()
    assert float(tr[-1].max()) < float(H0.max())


def test_si_gradient_via_implicit_diff():
    """custom_linear_solve differentiates the solve implicitly (adjoint solve,
    not unrolled CG); matches FD."""
    fn, x, y, _, vals = halfar_setup(nx=48, dx=80.0)
    H0 = fn(x, y, 5.0)
    tst = build_tstops((5.0, 5.5), 1.0 / 12.0)

    def loss(logA):
        v = vals.replace(A=jnp.exp(logA))
        tr = integrate_semi_implicit(H0, jnp.zeros_like(H0), 80.0, 80.0,
                                     lambda hb, gs: v, ATarget(), PHYS, tst,
                                     substeps=1, cg_iters=30)
        return jnp.sum(tr[-1] ** 2)

    g = jax.grad(loss)(jnp.log(A))
    e = 1e-5
    fd = (loss(jnp.log(A) + e) - loss(jnp.log(A) - e)) / (2 * e)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)


def test_si_end_to_end_inversion():
    """Training with solver='SI' over the FULL A range — no CFL sizing, no
    max_D cap, no blow-up while the optimizer explores."""
    params = Parameters(
        physical=PHYS,   # max_A = 8e-17: explicit methods would need ~100x substeps
        simulation=SimulationParameters(tspan=(5.0, 5.5), use_MB=False,
                                        use_velocities=False),
        solver=SolverParameters(solver="SI", step=1.0 / 12.0, substeps=1, cg_iters=30),
        hyper=Hyperparameters(optimizer=("adam",), learning_rate=(0.3,), epochs=(15,)),
        UDE=UDEParameters(grad="jax"),
    )
    glaciers = [halfar_glacier(nx=36, ny=36, dx=120.0, temp=-15.0, A=5e-18, rgi_id="si0")]
    tstops = build_tstops((5.0, 5.5), params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(5e-18)))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    results = run_inversion(inv)
    losses = results.stats.losses
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.3 * losses[0], f"{losses[0]} -> {losses[-1]}"


def test_si_with_periodic_laws():
    """Periodic laws ride the scan carry on the semi-implicit path too."""
    import dataclasses

    from odinn_tpu.data.synthetic import monthly_dummy_climate
    from odinn_tpu.laws.laws import Law
    from odinn_tpu.laws import inputs as law_inputs

    clim = monthly_dummy_climate(5.0, 24, temp_mean=3.0, nx=32, ny=32)
    g = halfar_glacier_with_climate(clim)
    params = Parameters(
        physical=PHYS,
        simulation=SimulationParameters(tspan=(5.0, 5.5), use_MB=False,
                                        use_velocities=False),
        solver=SolverParameters(solver="SI", step=1.0 / 12.0, substeps=1, cg_iters=25),
        UDE=UDEParameters(grad="jax"),
    )
    tstops = build_tstops((5.0, 5.5), params.solver.step)

    def apply_fn(theta, inputs):
        from odinn_tpu.ops.stencils import avg

        return 1e-19 * jax.nn.sigmoid(avg(inputs["CPDD"]) / 200.0 - 2.0)

    c_periodic = Law(slot="C", apply_fn=apply_fn,
                     inputs=(law_inputs.CPDD(window=0.25),),
                     callback_freq=2.0 / 12.0, trainable=False, name="pC")
    c_frozen = dataclasses.replace(c_periodic, callback_freq=0.0)
    m_p = Model(iceflow=SIA2DModel(A=ConstantA(A), C=c_periodic))
    m_f = Model(iceflow=SIA2DModel(A=ConstantA(A), C=c_frozen))
    tr_p = forward_glacier(None, g, 0, m_p, params, tstops)
    tr_f = forward_glacier(None, g, 0, m_f, params, tstops)
    assert np.isfinite(np.asarray(tr_p)).all()
    assert float(jnp.abs(tr_p[-1] - tr_f[-1]).max()) > 0.0


def halfar_glacier_with_climate(clim):
    g = halfar_glacier(nx=32, ny=32, dx=130.0, temp=-15.0, A=A, climate=clim)
    return g.replace(B=jnp.full_like(g.B, 1500.0))


# ---------------------------------------------------------------------------
# SI2: Crank–Nicolson + Picard midpoint diffusivity (second order at SI cost)
# ---------------------------------------------------------------------------


def _si2_errs(substeps_list, corrector=True, theta=1.0):
    """Final-H errors of SI variants vs a converged RK4 oracle (f64)."""
    fn, x, y, vfn, _ = halfar_setup(nx=48, dx=100.0)
    H0 = fn(x, y, 5.0).astype(jnp.float64)
    tst = build_tstops((5.0, 6.0), 1.0 / 12.0)

    def rhs(H, t):
        return sia2d_rhs(H, jnp.zeros_like(H), 100.0, 100.0, vfn, ATarget(), PHYS)

    Href = jax.jit(
        lambda h: integrate_scan(rhs, h, tst, 64, method="RK4")
    )(H0)[-1]
    scale = float(jnp.abs(Href).max())
    errs = []
    for sub in substeps_list:
        tr = jax.jit(
            lambda h: integrate_semi_implicit(
                h, jnp.zeros_like(h), 100.0, 100.0, vfn, ATarget(), PHYS, tst,
                substeps=sub, cg_iters=40, corrector=corrector, theta=theta,
                cg_iters_predictor=8)
        )(H0)
        errs.append(float(jnp.abs(tr[-1] - Href).max()) / scale)
    return errs


def test_si2_second_order_convergence():
    """SI2 error drops ~4x per substep doubling (2nd order) and beats the
    first-order SI scheme by well over an order of magnitude at equal dt."""
    e1, e2 = _si2_errs([1, 2])
    assert e1 / e2 > 3.0, f"not second order: {e1:.3e} -> {e2:.3e}"
    (si1,) = _si2_errs([1], corrector=False, theta=1.0)
    assert si1 / e1 > 10.0, f"SI2 gain too small: SI {si1:.3e} vs SI2 {e1:.3e}"


def test_si2_forward_glacier_with_mb_second_order():
    """The solver='SI2' production wiring (forward_batch + monthly MB lumps):
    errors vs a dense-in-time oracle shrink ~4x per substep doubling — the MB
    jump process is shared exactly, so only the diffusion error remains."""
    import dataclasses

    from odinn_tpu.core.glacier import stack_glaciers
    from odinn_tpu.data.synthetic import monthly_dummy_climate
    from odinn_tpu.laws.laws import CuffeyPaterson
    from odinn_tpu.physics.mass_balance import TImodel1
    from odinn_tpu.simulation.prediction import forward_batch

    clim = monthly_dummy_climate(5.0, 14, temp_mean=-4.0, longterm_temp=-16.0,
                                 nx=48, ny=48)
    g = halfar_glacier(nx=48, ny=48, dx=100.0, dy=100.0, temp=-16.0,
                       rgi_id="si2", climate=clim)
    batch = stack_glaciers([g])
    batch = jax.tree.map(
        lambda v: v.astype(jnp.float64)
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating) else v,
        batch)
    model = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0),
                  mass_balance=TImodel1())
    tst = build_tstops((5.0, 6.0), 1.0 / 12.0)

    def make(solver, sub):
        return Parameters(
            physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
            simulation=SimulationParameters(
                tspan=(5.0, 6.0), use_MB=True, step_MB=1.0 / 12.0,
                use_velocities=False, float_dtype="float64"),
            solver=SolverParameters(step=1.0 / 12.0, substeps=sub,
                                    solver=solver, cg_iters=40),
            UDE=UDEParameters(grad="jax"),
        )

    def final_H(p):
        return jax.jit(lambda b: forward_batch(None, b, model, p, tst)[:, -1])(batch)

    Href = final_H(make("RK4", 64))
    scale = float(jnp.abs(Href).max())

    def err(solver, sub):
        return float(jnp.abs(final_H(make(solver, sub)) - Href).max()) / scale

    e1, e2 = err("SI2", 1), err("SI2", 2)
    assert e1 / e2 > 3.0, f"not second order with MB: {e1:.3e} -> {e2:.3e}"
    assert err("SI", 1) / e1 > 5.0


def test_si2_gradient_via_implicit_diff():
    """grad='jax' differentiates both SI2 solves per step through
    custom_linear_solve (predictor enters via the midpoint-D product rule);
    matches FD."""
    fn, x, y, _, vals = halfar_setup(nx=48, dx=80.0)
    H0 = fn(x, y, 5.0).astype(jnp.float64)
    tst = build_tstops((5.0, 5.5), 1.0 / 12.0)

    def loss(logA):
        v = vals.replace(A=jnp.exp(logA))
        tr = integrate_semi_implicit(H0, jnp.zeros_like(H0), 80.0, 80.0,
                                     lambda hb, gs: v, ATarget(), PHYS, tst,
                                     substeps=1, cg_iters=30, corrector=True)
        return jnp.sum(tr[-1] ** 2)

    g = jax.grad(loss)(jnp.log(A))
    e = 1e-5
    fd = (loss(jnp.log(A) + e) - loss(jnp.log(A) - e)) / (2 * e)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)


def test_si2_discrete_adjoint_matches_jax():
    """The SI2 discrete adjoint (two chained CN IFT transposes with the
    midpoint chain rule, gradient._make_si2_transpose) reproduces grad='jax'
    (reverse AD through both custom_linear_solves) on a converged-CG loss."""
    from odinn_tpu.inverse.adjoint_types import DiscreteAdjoint
    from odinn_tpu.inverse.gradient import make_adjoint_value_and_grad
    from odinn_tpu.laws.laws import ConstantA

    params = Parameters(
        physical=PHYS,
        simulation=SimulationParameters(tspan=(5.0, 5.5), use_MB=False,
                                        use_velocities=False),
        solver=SolverParameters(solver="SI2", step=1.0 / 12.0, substeps=1,
                                cg_iters=60, cg_iters_predictor=60),
        hyper=Hyperparameters(optimizer=("adam",), learning_rate=(0.1,),
                              epochs=(1,)),
        UDE=UDEParameters(grad=DiscreteAdjoint()),
    )
    glaciers = [halfar_glacier(nx=32, ny=32, dx=120.0, temp=-15.0, A=5e-18,
                               rgi_id="si2d")]
    tstops = build_tstops((5.0, 5.5), params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(5e-18)))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)

    from odinn_tpu.simulation.inversion import assemble_tstops, batch_transient_loss

    vg_disc = make_adjoint_value_and_grad(inv, flavor="discrete")
    l_d, g_d = vg_disc(inv.theta)

    tst = assemble_tstops(params, inv.glaciers)
    l_j, g_j = jax.value_and_grad(
        lambda th: batch_transient_loss(th, inv.glaciers, model, params, tst)
    )(inv.theta)
    np.testing.assert_allclose(float(l_d), float(l_j), rtol=1e-8)
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_j)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4)
