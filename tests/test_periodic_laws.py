"""Periodic-law scheduling (callback_freq > 0) and the diffusivity cap.

Reference semantics: a law with callback_freq = x is re-evaluated every x
years by a PeriodicCallback during the solve
(/root/reference/docs/src/inversions.md:140-156, weekly-C example at :143);
cap_D is the smooth diffusivity bound of target_utils.jl.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from odinn_tpu.core.params import (
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate
from odinn_tpu.laws.laws import ConstantA, Law, SyntheticC
from odinn_tpu.laws import inputs as law_inputs
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.physics.targets import CappedTarget
from odinn_tpu.simulation.prediction import forward_glacier
from odinn_tpu.simulation.solver import build_tstops

A = 5e-18
TSPAN = (5.0, 5.5)


def make_params():
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False, use_velocities=False),
        solver=SolverParameters(step=1.0 / 12.0, substeps=10),
        UDE=UDEParameters(grad="jax"),
    )


def test_periodic_law_reevaluates_in_solve():
    """A periodic C law sees the evolving H (via CPDD over the changing
    surface); the solve runs and differs from the frozen-at-start variant."""
    params = make_params()
    clim = monthly_dummy_climate(5.0, 24, temp_mean=3.0, nx=32, ny=32)
    g = halfar_glacier(nx=32, ny=32, dx=130.0, temp=-15.0, A=A, climate=clim)
    g = g.replace(B=jnp.full_like(g.B, 1500.0))
    tstops = build_tstops(TSPAN, params.solver.step)

    calls = []

    def apply_fn(theta, inputs):
        # C from CPDD, strongly surface-dependent so refresh matters
        from odinn_tpu.ops.stencils import avg

        calls.append(1)
        return 1e-19 * jax.nn.sigmoid(avg(inputs["CPDD"]) / 200.0 - 2.0)

    c_periodic = Law(slot="C", apply_fn=apply_fn,
                     inputs=(law_inputs.CPDD(window=0.25),),
                     callback_freq=2.0 / 12.0, trainable=False, name="periodicC")
    c_frozen = dataclasses.replace(c_periodic, callback_freq=0.0)

    m_p = Model(iceflow=SIA2DModel(A=ConstantA(A), C=c_periodic))
    m_f = Model(iceflow=SIA2DModel(A=ConstantA(A), C=c_frozen))
    traj_p = forward_glacier(None, g, 0, m_p, params, tstops)
    traj_f = forward_glacier(None, g, 0, m_f, params, tstops)
    assert np.isfinite(np.asarray(traj_p)).all()
    d = float(jnp.abs(traj_p[-1] - traj_f[-1]).max())
    assert d > 0.0, "periodic law refresh had no effect"
    # first saved state identical (refresh only after the first interval end)
    np.testing.assert_allclose(np.asarray(traj_p[1]), np.asarray(traj_f[1]), atol=1e-12)


def test_periodic_solve_is_differentiable():
    params = make_params()
    clim = monthly_dummy_climate(5.0, 24, temp_mean=3.0, nx=28, ny=28)
    g = halfar_glacier(nx=28, ny=28, dx=140.0, temp=-15.0, A=A, climate=clim)
    g = g.replace(B=jnp.full_like(g.B, 1500.0))
    tstops = build_tstops(TSPAN, params.solver.step)

    def apply_fn(theta, inputs):
        from odinn_tpu.ops.stencils import avg

        return theta["C"] * jax.nn.sigmoid(avg(inputs["CPDD"]) / 200.0 - 2.0)

    c_law = Law(slot="C", apply_fn=apply_fn, inputs=(law_inputs.CPDD(window=0.25),),
                callback_freq=2.0 / 12.0, trainable=True, name="pC",
                init_theta=lambda gl, dtype=jnp.float64: jnp.asarray(1e-19, dtype))
    model = Model(iceflow=SIA2DModel(A=ConstantA(A), C=c_law))
    theta = {"C": jnp.asarray(1e-19)}

    def loss(th):
        traj = forward_glacier(th, g, 0, model, params, tstops)
        return jnp.sum(traj[-1] ** 2)

    grad = jax.grad(loss)(theta)
    assert np.isfinite(float(grad["C"]))
    e = 1e-25
    fd = (loss({"C": jnp.asarray(1e-19 + e)}) - loss({"C": jnp.asarray(1e-19 - e)})) / (2 * e)
    np.testing.assert_allclose(float(grad["C"]), float(fd), rtol=2e-3)


def test_capped_diffusivity():
    """max_D cap keeps the solve finite at large A (cap_D equivalent)."""
    params = make_params()
    g = halfar_glacier(nx=32, ny=32, dx=130.0, temp=-15.0, A=8e-18)
    tstops = build_tstops(TSPAN, params.solver.step)
    model = Model(iceflow=SIA2DModel(A=ConstantA(8e-18), max_D=1e5))
    assert isinstance(model.target, CappedTarget)
    traj = forward_glacier(None, g, 0, model, params, tstops)
    assert np.isfinite(np.asarray(traj)).all()
    # uncapped at the same A and a too-coarse substep count blows up
    model_u = Model(iceflow=SIA2DModel(A=ConstantA(8e-18)))
    params_u = params.replace(solver=SolverParameters(step=1.0 / 12.0, substeps=1))
    traj_u = forward_glacier(None, g, 0, model_u, params_u, tstops)
    bad = np.asarray(traj_u[-1])
    assert (~np.isfinite(bad)).any() or np.abs(bad).max() > 1e6
