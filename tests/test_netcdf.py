"""NetCDF-4 (h5py) ingestion: the reference's real-data workflow.

The reference loads OGGM/Gungnir-preprocessed NetCDF datacubes
(Sleipnir.initialize_glaciers; /root/reference/README.md:63,
/root/reference/test/test_grad_loss.jl:151-162). These tests exercise the
h5py-backed reader end-to-end: write OGGM-layout glacier directories →
initialize_glaciers → run an inversion on the loaded data.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from odinn_tpu.core.params import (
    Hyperparameters,
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.data.netcdf import parse_cf_time, read_netcdf, write_netcdf
from odinn_tpu.data.rgi import (
    generate_synthetic_oggm_dir,
    get_rgi_paths,
    initialize_glaciers,
)


def test_parse_cf_time_days_and_months():
    # OGGM climate_historical encoding: days since an epoch
    t = parse_cf_time(np.array([0.0, 365.0]), "days since 2000-01-01")
    assert abs(t[0] - 2000.0) < 1e-6
    assert abs(t[1] - (2000.0 + 365.0 / 366.0)) < 1e-6   # 2000 is a leap year
    # months since
    tm = parse_cf_time(np.array([0.0, 6.0, 12.0]), "months since 2010-01-01")
    np.testing.assert_allclose(tm, [2010.0, 2010.5, 2011.0], atol=1e-9)
    # hours since
    th = parse_cf_time(np.array([24.0]), "hours since 1999-12-31")
    assert abs(th[0] - 2000.0) < 1e-6
    with pytest.raises(ValueError):
        parse_cf_time(np.array([0.0]), "fortnights since 2000-01-01")


def test_netcdf_roundtrip_generic(tmp_path):
    path = str(tmp_path / "generic.nc")
    x = np.linspace(0.0, 900.0, 10)
    y = np.linspace(0.0, 450.0, 5)
    field = np.arange(50, dtype=np.float64).reshape(5, 10)
    write_netcdf(
        path,
        variables={"field": (("y", "x"), field)},
        coords={"x": x, "y": y},
        var_attrs={"field": {"units": "m"}},
        global_attrs={"title": "roundtrip"},
    )
    vs, va, ga = read_netcdf(path)
    np.testing.assert_allclose(vs["field"], field)
    np.testing.assert_allclose(vs["x"], x)
    assert va["field"]["units"] == "m"
    assert ga["title"] == "roundtrip"


def test_netcdf_cf_unpacking(tmp_path):
    """_FillValue → NaN and scale_factor/add_offset are applied on read."""
    import h5py

    path = str(tmp_path / "packed.nc")
    with h5py.File(path, "w") as f:
        d = f.create_dataset("v", data=np.array([1.0, -9999.0, 3.0]))
        d.attrs["_FillValue"] = -9999.0
        p = f.create_dataset("packed", data=np.array([0, 1, 2], np.int16))
        p.attrs["scale_factor"] = 0.5
        p.attrs["add_offset"] = 10.0
    vs, _, _ = read_netcdf(path)
    assert np.isnan(vs["v"][1]) and vs["v"][0] == 1.0
    np.testing.assert_allclose(vs["packed"], [10.0, 10.5, 11.0])


def test_oggm_dir_loader_roundtrip(tmp_path):
    ids = generate_synthetic_oggm_dir(str(tmp_path), n=2, nx=48, ny=48)
    paths = get_rgi_paths(str(tmp_path))
    assert set(ids) <= set(paths)
    assert paths[ids[0]].endswith("gridded_data.nc")

    params = Parameters(simulation=SimulationParameters(tspan=(2010.0, 2012.0)))
    glaciers = initialize_glaciers(ids, params, prepro_dir=str(tmp_path))
    assert len(glaciers) == 2
    g = glaciers[0]
    assert g.H0.shape == (48, 48)
    assert float(g.H0.max()) > 100.0          # a real Halfar dome came through
    assert float(g.dx) > 0 and float(g.dy) > 0
    # climate series round-tripped: monthly grid + ref height
    assert g.climate.temp.shape[-1] == 72
    assert float(g.climate.ref_hgt) == 2000.0
    assert abs(float(g.climate.t_start) - 2010.0) < 1e-6
    # B = S - H identity holds on the glacier mask
    assert np.all(np.asarray(g.H0)[np.asarray(g.mask) == 0] == 0)

    # grid_scaling_factor applies to the NetCDF path too
    params2 = Parameters(simulation=SimulationParameters(
        grid_scaling_factor=2, tspan=(2010.0, 2012.0)))
    g2 = initialize_glaciers(ids[:1], params2, prepro_dir=str(tmp_path))[0]
    assert g2.H0.shape == (24, 24)
    assert abs(float(g2.dx) - 2 * float(g.dx)) < 1e-9


def test_nc_loaded_glaciers_drive_inversion(tmp_path):
    """End-to-end: .nc → initialize_glaciers → ground truth (MB-enabled) →
    short inversion (the reference's test_grad_loss real-data pipeline
    shape, /root/reference/test/test_grad_loss.jl:151-200)."""
    from odinn_tpu.laws.laws import ConstantA, LawA_inversion
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.physics.mass_balance import TImodel1
    from odinn_tpu.simulation.inversion import Inversion, run_inversion
    from odinn_tpu.simulation.prediction import generate_ground_truth
    from odinn_tpu.simulation.solver import build_tstops

    ids = generate_synthetic_oggm_dir(str(tmp_path), n=2, nx=40, ny=40, seed=3)
    a_true = 5.0e-18
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=(2010.0, 2011.0), use_MB=True),
        # unconditionally stable implicit solver: synthetic OGGM glaciers have
        # random (possibly small) dx, so no explicit CFL tuning is needed
        solver=SolverParameters(step=1.0 / 6.0, solver="SI", cg_iters=20),
        UDE=UDEParameters(grad="jax"),
        hyper=Hyperparameters(optimizer=("adam",), learning_rate=(0.05,), epochs=(10,)),
    )
    glaciers = initialize_glaciers(ids, params, prepro_dir=str(tmp_path))
    tstops = build_tstops(params.simulation.tspan, params.solver.step)

    truth = Model(
        iceflow=SIA2DModel(A=ConstantA(a_true)),
        mass_balance=TImodel1(DDF=6.0 / 1000.0, acc_factor=1.2 / 1000.0),
    )
    obs = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))

    model = Model(
        iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)),
        mass_balance=TImodel1(DDF=6.0 / 1000.0, acc_factor=1.2 / 1000.0),
    )
    inv = Inversion(model=model, glaciers=obs, parameters=params)
    res = run_inversion(inv)
    losses = res.stats.losses
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses[0]} -> {losses[-1]}"


def test_velocity_datacube_nc_roundtrip_and_regrid(tmp_path):
    """Gungnir-style velocity cube: write → load → attach via
    initialize_glaciers(velocity_datacubes={rid: path}), including the
    non-glacier-aligned regrid path (the reference's velocityDatacubes
    kwarg, /root/reference/test/test_grad_loss.jl:151-156)."""
    import jax

    from odinn_tpu.core.glacier import SurfaceVelocityData
    from odinn_tpu.data.netcdf import load_velocity_nc, write_velocity_nc

    ids = generate_synthetic_oggm_dir(str(tmp_path), n=1, nx=40, ny=40, seed=5)
    params = Parameters(simulation=SimulationParameters(tspan=(2010.0, 2012.0)))
    g = initialize_glaciers(ids, params, prepro_dir=str(tmp_path))[0]

    # a coarser cube on its OWN grid covering the glacier footprint
    xs = np.linspace(float(g.coords_x[0]), float(g.coords_x[-1]), 15)
    ys = np.linspace(float(g.coords_y[0]), float(g.coords_y[-1]), 15)
    t = np.array([2010.5, 2011.5])
    key = jax.random.PRNGKey(0)
    vx = 10.0 + jax.random.uniform(key, (2, 15, 15))
    vd = SurfaceVelocityData(
        t=jnp.asarray(t), vx=vx, vy=2 * vx,
        vabs=jnp.sqrt(vx**2 + (2 * vx) ** 2),
        x=jnp.asarray(xs), y=jnp.asarray(ys),
        is_grid_glacier_aligned=False,
    )
    cube_path = str(tmp_path / "vel_cube.nc")
    write_velocity_nc(cube_path, vd)

    back = load_velocity_nc(cube_path)
    assert not back.is_grid_glacier_aligned
    np.testing.assert_allclose(np.asarray(back.vx), np.asarray(vd.vx), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(back.t), t, atol=1e-9)

    # attach by PATH: loads + regrids onto the 40x40 glacier grid
    g2 = initialize_glaciers(ids, params, prepro_dir=str(tmp_path),
                             velocity_datacubes={ids[0]: cube_path})[0]
    assert g2.velocity_data is not None
    assert g2.velocity_data.vx.shape == (2, 40, 40)
    assert g2.velocity_data.is_grid_glacier_aligned
    inner = np.asarray(g2.velocity_data.vx)[:, 5:-5, 5:-5]
    assert inner.min() > 9.0 and inner.max() < 12.0   # interpolated, not extrapolated


def test_downscale_coarsens_attached_observations(tmp_path):
    """grid_scaling_factor > 1 must coarsen EVERY grid-aligned attachment —
    gridded long-term temps, thickness/velocity/dhdt observations — not just
    H0/B/mask, or gridded-temp laws and LossV/dhdt losses see shape
    mismatches (the reference applies gridScalingFactor at load time to the
    whole glacier, test/test_grad_loss.jl:119)."""
    import dataclasses

    from odinn_tpu.core.glacier import (DhdtData, SurfaceVelocityData,
                                        ThicknessData)
    from odinn_tpu.data.rgi import _downscale_glacier, initialize_glaciers

    ids = generate_synthetic_oggm_dir(str(tmp_path), n=1, nx=40, ny=40, seed=7)
    params = Parameters(simulation=SimulationParameters(tspan=(2010.0, 2012.0)))
    g = initialize_glaciers(ids, params, prepro_dir=str(tmp_path))[0]
    nx, ny = g.H0.shape

    H_obs = jnp.stack([g.H0, g.H0 * 1.1])
    vcube = jnp.ones((3, nx, ny)) * 7.0
    g = g.replace(
        thickness_data=ThicknessData(t=jnp.asarray([2010.0, 2011.0]), H=H_obs),
        velocity_data=SurfaceVelocityData(
            t=jnp.asarray([2010.0, 2010.5, 2011.0]), vx=vcube, vy=vcube,
            vabs=vcube, x=g.coords_x, y=g.coords_y,
        ),
        dhdt_data=DhdtData(t1=jnp.asarray(2010.0), t2=jnp.asarray(2011.0),
                           dhdt=jnp.ones((nx, ny))),
    )
    g2 = _downscale_glacier(g, 2)
    assert g2.H0.shape == (nx // 2, ny // 2)
    assert g2.climate.longterm_temps_gridded.shape[-2:] == (nx // 2, ny // 2)
    assert g2.thickness_data.H.shape == (2, nx // 2, ny // 2)
    assert g2.velocity_data.vx.shape == (3, nx // 2, ny // 2)
    assert g2.velocity_data.x.shape[0] == nx // 2
    assert g2.dhdt_data.dhdt.shape == (nx // 2, ny // 2)
    np.testing.assert_allclose(np.asarray(g2.velocity_data.vabs), 7.0)
    # unaligned cubes must be regridded before coarsening — loud error
    g3 = g.replace(velocity_data=dataclasses.replace(
        g.velocity_data, is_grid_glacier_aligned=False))
    with pytest.raises(ValueError):
        _downscale_glacier(g3, 2)
