"""Observation/time-grid alignment: tstop assembly and time-matched lookup.

The reference assembles tstops as solver step ∪ data timestamps and skips
tstops without data (inversion_utils.jl:487-495, Losses.jl:262-267); here the
loss matches observations by time, so sparse or off-grid observations work.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from odinn_tpu.core.glacier import ThicknessData, stack_glaciers
from odinn_tpu.core.params import (
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.laws.laws import ConstantA, LawA_inversion
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.simulation.inversion import Inversion, assemble_tstops, batch_transient_loss
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops

A_TRUE = 5e-18
TSPAN = (5.0, 5.5)


def make_params():
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False, use_velocities=False),
        solver=SolverParameters(step=1.0 / 12.0, substeps=10),
        UDE=UDEParameters(grad="jax"),
    )


def test_assemble_tstops_unions_data_times():
    params = make_params()
    g = halfar_glacier(nx=28, ny=28, dx=140.0, temp=-15.0, A=A_TRUE)
    off_grid = 5.2024
    td = ThicknessData(t=jnp.array([5.0, off_grid, 5.5]),
                       H=jnp.stack([g.H0, g.H0, g.H0]))
    batch = stack_glaciers([g.replace(thickness_data=td)])
    tstops = np.asarray(assemble_tstops(params, batch))
    base = np.asarray(build_tstops(TSPAN, 1 / 12))
    assert len(tstops) == len(base) + 1
    assert np.any(np.abs(tstops - off_grid) < 1e-9)


def test_sparse_observations_drive_loss():
    """Observations at a subset of tstops: only matching tstops contribute;
    the loss still drives the inversion gradient."""
    params = make_params()
    g = halfar_glacier(nx=28, ny=28, dx=140.0, temp=-15.0, A=A_TRUE)
    tstops = build_tstops(TSPAN, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)))
    (g_full,) = generate_ground_truth([g], params, truth, tstops, store=("H",))

    td_full = g_full.thickness_data
    # keep every 2nd observation
    td_sparse = ThicknessData(t=td_full.t[::2], H=td_full.H[::2])
    g_sparse = g_full.replace(thickness_data=td_sparse)

    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv_full = Inversion(model=model, glaciers=[g_full], parameters=params)
    inv_sparse = Inversion(model=model, glaciers=[g_sparse], parameters=params)

    theta = {"A": jnp.array([0.3])}
    lf = float(batch_transient_loss(theta, inv_full.glaciers, model, params, tstops))
    ls = float(batch_transient_loss(theta, inv_sparse.glaciers, model, params, tstops))
    assert 0.0 < ls < lf, f"sparse loss {ls} vs full {lf}"

    g_grad = jax.grad(
        lambda th: batch_transient_loss(th, inv_sparse.glaciers, model, params, tstops)
    )(theta)
    assert np.isfinite(float(g_grad["A"][0])) and abs(float(g_grad["A"][0])) > 0.0

    # manual adjoint agrees on the sparse-data loss
    from odinn_tpu.inverse.adjoint_types import AutoVJP, DiscreteAdjoint
    from odinn_tpu.inverse.gradient import make_adjoint_value_and_grad

    p2 = params.replace(UDE=UDEParameters(grad=DiscreteAdjoint(VJP_method=AutoVJP())))
    inv2 = Inversion(model=model, glaciers=[g_sparse], parameters=p2, theta=theta)
    vg = make_adjoint_value_and_grad(inv2, flavor="discrete")
    val, grads = vg(theta)
    np.testing.assert_allclose(float(val), ls, rtol=1e-8)
    np.testing.assert_allclose(float(grads["A"][0]), float(g_grad["A"][0]), rtol=1e-8)


def test_velocity_datacube_regridding():
    """Non-glacier-aligned velocity datacubes regrid bilinearly onto the
    glacier grid (Sleipnir isGridGlacierAligned=false handling)."""
    import jax

    from odinn_tpu.core.glacier import SurfaceVelocityData, regrid_velocity_data

    g = halfar_glacier(nx=32, ny=32, dx=100.0, temp=-15.0)
    # datacube on a coarser, offset grid covering the glacier
    xs = jnp.linspace(float(g.coords_x[0]) - 120.0, float(g.coords_x[-1]) + 80.0, 24)
    ys = jnp.linspace(float(g.coords_y[0]) - 60.0, float(g.coords_y[-1]) + 140.0, 20)
    X, Y = jnp.meshgrid(xs, ys, indexing="ij")
    # a smooth analytic field so bilinear error is tiny
    f = 1e-3 * X + 2e-3 * Y
    vd = SurfaceVelocityData(
        t=jnp.array([5.0]), vx=f[None], vy=2 * f[None], vabs=jnp.abs(f)[None],
        x=xs, y=ys, is_grid_glacier_aligned=False,
    )
    out = regrid_velocity_data(vd, g)
    assert out.is_grid_glacier_aligned
    assert out.vx.shape == (1, 32, 32)
    GX, GY = jnp.meshgrid(g.coords_x, g.coords_y, indexing="ij")
    expect = 1e-3 * GX + 2e-3 * GY
    np.testing.assert_allclose(np.asarray(out.vx[0]), np.asarray(expect), atol=1e-9)
    # aligned data passes through untouched
    vd2 = SurfaceVelocityData(t=jnp.array([5.0]), vx=f[None], vy=f[None], vabs=f[None])
    assert regrid_velocity_data(vd2, g) is vd2


def test_build_tstops_merges_f32_rounded_times():
    """Year-scale observation times that went through float32 storage differ
    from the f64 save grid by several f32 ulps (~2.4e-4 at t=2010). The
    tstop assembly must merge them (keeping the data representative) instead
    of inserting near-duplicate save points — under an f32 solve those
    collapse to zero-length intervals and silently corrupt the objective
    (loss at exact truth was 6.15 instead of 0 before the fix)."""
    import numpy as np

    from odinn_tpu.simulation.solver import build_tstops

    grid = np.linspace(2010.0, 2011.0, 13)
    obs_f32 = np.asarray(np.asarray(grid, np.float32), np.float64)  # f32-rounded
    ts = np.asarray(build_tstops((2010.0, 2011.0), 1.0 / 12.0, extra=obs_f32))
    assert ts.shape[0] == 13, f"near-duplicates not merged: {ts.shape[0]} tstops"
    # the data (f32-representable) representative survives: exact f32 match
    np.testing.assert_array_equal(np.asarray(ts, np.float32),
                                  np.asarray(obs_f32, np.float32))
    # genuinely distinct times still get their own save points
    ts2 = np.asarray(build_tstops((2010.0, 2011.0), 1.0 / 12.0,
                                  extra=[2010.532]))
    assert ts2.shape[0] == 14 and np.any(np.isclose(ts2, 2010.532))
