"""Aux subsystems: persistence, logging, plotting, RGI loader, pretraining,
MLP mass-balance models.

Mirrors the reference's save/reload round-trip test (test/save_results.jl) and
the aux inventory of SURVEY §5.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odinn_tpu.core.params import Parameters, PhysicalParameters, SimulationParameters
from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate


def test_training_result_roundtrip(tmp_path):
    from odinn_tpu.utils.io import TrainingResult, load_inversion_file, save_inversion_file

    theta = {"A": [{"w": jnp.ones((2, 3)), "b": jnp.zeros((3,))}]}
    res = TrainingResult(
        theta=theta, losses=[3.0, 2.0, 1.0], grad_norm_hist=[0.5, 0.4],
        params_meta={"target": "A"},
    )
    path = os.path.join(tmp_path, "inv.msgpack")
    save_inversion_file(path, res)
    back = load_inversion_file(path)
    np.testing.assert_allclose(np.asarray(back.theta["A"][0]["w"]), np.ones((2, 3)))
    np.testing.assert_allclose(back.losses, [3.0, 2.0, 1.0])
    assert back.params_meta["target"] == "A"


def test_results_file_roundtrip(tmp_path):
    from odinn_tpu.utils.io import load_results_file, save_results_file

    res = {"t": jnp.arange(4.0), "H": jnp.ones((2, 4, 8, 8))}
    path = os.path.join(tmp_path, "results.npz")
    save_results_file(path, res)
    back = load_results_file(path)
    assert back["H"].shape == (2, 4, 8, 8)


def test_checkpoint_roundtrip(tmp_path):
    from odinn_tpu.utils.io import restore_checkpoint, save_checkpoint

    state = {"theta": {"A": jnp.full((3,), 2.5)}, "step": jnp.asarray(7)}
    save_checkpoint(str(tmp_path / "ckpt"), 7, state)
    back = restore_checkpoint(str(tmp_path / "ckpt"))
    np.testing.assert_allclose(np.asarray(back["theta"]["A"]), 2.5)


def test_training_logger(tmp_path):
    from odinn_tpu.simulation.results import TrainingStats
    from odinn_tpu.utils.logging import TrainingLogger

    logger = TrainingLogger(str(tmp_path / "log"), use_tensorboard=False)
    stats = TrainingStats()
    stats.losses = [10.0]
    stats.grad_norm_hist = [1.0]
    stats.time_per_iter = [0.1]
    stats.niter = 1
    logger.callback(stats)
    stats.losses.append(5.0)
    stats.niter = 2
    logger.callback(stats)
    logger.close()
    lines = open(os.path.join(logger.logdir, "train_log.jsonl")).read().strip().split("\n")
    assert len(lines) == 2


def test_plotting(tmp_path):
    from odinn_tpu.laws.laws import CuffeyPaterson
    from odinn_tpu.physics.mass_balance import TImodel1
    from odinn_tpu.utils.plotting import (
        plot_cumulative_mb,
        plot_glacier,
        plot_gridded_data,
        plot_law,
        plot_glacier_vid,
        save_plot,
    )

    clim = monthly_dummy_climate(5.0, 24, nx=32, ny=32)
    g = halfar_glacier(nx=32, ny=32, dx=120.0, temp=-15.0, climate=clim)
    save_plot(plot_glacier(g, ("H0", "B")), str(tmp_path / "glacier.png"))
    save_plot(plot_gridded_data(g.H0, "H0"), str(tmp_path / "grid.png"))
    save_plot(
        plot_law(CuffeyPaterson(), None, g, {"T": (-25.0, 0.0)}, n=20),
        str(tmp_path / "law.png"),
    )
    save_plot(plot_cumulative_mb(g, TImodel1(), (5.0, 6.0)), str(tmp_path / "mb.png"))
    # 3-D surface view of a 2-input law (laws_plots.jl PlotlyJS-surface parity)
    from odinn_tpu.core.params import Parameters
    from odinn_tpu.laws.laws import LawU
    from odinn_tpu.models.model import Model, SIA2DModel, init_theta
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture

    params2 = Parameters()
    law_u = LawU(NeuralNetwork(default_architecture(2, light=True), seed=2),
                 params2, max_nn=2000.0,
                 prescale_bounds=((0.0, 500.0), (0.0, 0.3)))
    theta_u = init_theta(Model(iceflow=SIA2DModel(U=law_u)), [g])
    save_plot(
        plot_law(law_u, theta_u, g, {"Hbar": (0.0, 500.0), "gradS": (0.0, 0.3)},
                 n=12, surface=True,
                 truth_fn=lambda h, s: 1e-2 * h * s),
        str(tmp_path / "law_surface.png"),
    )
    traj = jnp.stack([g.H0, g.H0 * 0.9, g.H0 * 0.8])
    plot_glacier_vid(str(tmp_path / "vid.gif"), traj, g)
    for f in ["glacier.png", "grid.png", "law.png", "mb.png", "vid.gif"]:
        assert (tmp_path / f).exists()


def test_rgi_loader_roundtrip(tmp_path):
    from odinn_tpu.data.rgi import (
        fake_multi_datacube,
        generate_synthetic_rgi_dir,
        get_rgi_paths,
        initialize_glaciers,
    )

    ids = generate_synthetic_rgi_dir(str(tmp_path), n=3, nx=48, ny=48)
    paths = get_rgi_paths(str(tmp_path))
    assert set(ids) <= set(paths)
    params = Parameters(
        simulation=SimulationParameters(grid_scaling_factor=2, tspan=(2010.0, 2012.0))
    )
    glaciers = initialize_glaciers(ids[:2], params, prepro_dir=str(tmp_path))
    assert len(glaciers) == 2
    assert glaciers[0].H0.shape == (24, 24)   # downscaled by 2
    # velocity datacube attach
    cube = fake_multi_datacube(glaciers[0], jnp.array([2010.0, 2011.0]))
    assert cube.vx.shape[0] == 2


def test_pretraining_fits_target():
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture, scale
    from odinn_tpu.models.nn_utils import pretraining
    from odinn_tpu.laws.laws import poly_A_paterson_cuffey

    arch = default_architecture(1)
    nn = NeuralNetwork(arch, seed=0)
    params = nn.init()
    a_true = poly_A_paterson_cuffey()
    X = jnp.linspace(-25.0, -5.0, 50)[:, None]
    a_vals = jax.vmap(a_true)(X[:, 0])
    Y = 0.9 * a_vals / a_vals.max()    # inside the sigmoid head's (0, 1) range
    trained, hist = pretraining(
        arch, params, X, Y, postprocess=None, epochs=400, lr=5e-2
    )
    assert hist[-1] < 0.1 * hist[0], f"pretraining did not converge: {hist[0]} -> {hist[-1]}"


def test_custom_mlp_mb_roundtrip(tmp_path):
    from odinn_tpu.models.mb_machine import CustomMLP, load_model, save_model
    from odinn_tpu.models.nn import MLP, init_mlp
    from odinn_tpu.physics.mass_balance import mb_timestep

    arch = MLP((4, 8, 1), ("softplus", "identity"))
    params = init_mlp(arch, jax.random.PRNGKey(0))
    mlp = CustomMLP(architecture=arch, params=params)
    save_model(str(tmp_path / "mlp"), mlp)
    back = load_model(str(tmp_path / "mlp"))
    clim = monthly_dummy_climate(5.0, 24, nx=32, ny=32)
    g = halfar_glacier(nx=32, ny=32, dx=120.0, temp=-15.0, climate=clim)
    H1 = mb_timestep(g.H0, g, back, 5.5, 1.0 / 12.0)
    assert np.isfinite(np.asarray(H1)).all()
    assert (np.asarray(H1) >= 0.0).all()
    # identical output before/after serialization
    H1b = mb_timestep(g.H0, g, mlp, 5.5, 1.0 / 12.0)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H1b), atol=1e-12)

    from odinn_tpu.models.mb_machine import download_MLP

    with pytest.raises(RuntimeError):
        download_MLP()


def test_run_inversion_autosaves(tmp_path):
    """run_inversion(path=, file_name=) persists a TrainingResult as part of
    the run — the reference's run!(inversion; path, file_name) auto-save
    (/root/reference/test/inversion_test.jl:110-122)."""
    from odinn_tpu.core.params import (Hyperparameters, SolverParameters,
                                       UDEParameters)
    from odinn_tpu.laws.laws import ConstantA, LawA_inversion
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.simulation.inversion import Inversion, run_inversion
    from odinn_tpu.simulation.prediction import generate_ground_truth
    from odinn_tpu.simulation.solver import build_tstops
    from odinn_tpu.utils.io import load_inversion_file

    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=(5.0, 5.5), use_MB=False,
                                        use_velocities=False),
        solver=SolverParameters(step=1.0 / 12.0, solver="SI", cg_iters=15),
        hyper=Hyperparameters(optimizer=("adam",), learning_rate=(0.05,), epochs=(3,)),
        UDE=UDEParameters(grad="jax", target="A"),
    )
    glaciers = [halfar_glacier(nx=24, ny=24, dx=150.0, temp=-15.0, rgi_id="p1")]
    tstops = build_tstops(params.simulation.tspan, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=ConstantA(4e-18)))
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))

    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    res = run_inversion(inv, path=str(tmp_path), file_name="inv_result.msgpack")

    full = os.path.join(str(tmp_path), "inv_result.msgpack")
    assert os.path.exists(full)
    back = load_inversion_file(full)
    np.testing.assert_allclose(np.asarray(back.theta["A"]),
                               np.asarray(inv.theta["A"]))
    assert len(back.losses) == res.stats.niter
    assert back.params_meta["retcode"] == "Success"
