"""At-scale uncertainty quantification: Laplace posterior over a 128-glacier
classical inversion with NOISY observations, on the production configuration
(128² grids, f32, SI solver) — the statistic-level counterpart of
train_at_scale.py's point-estimate gates.

What it measures (written to uq_at_scale_result.json):

1. **posterior build time** with ``structure="per_glacier"`` (one jvp per θ
   leaf — the block-diagonal fast path; the generic dense path would cost
   128 HVPs) and the per-quantity query time;
2. **calibration at scale**: observations carry iid N(0, σ_obs²) thickness
   noise, so the inverted per-glacier A's scatter around truth; z_g =
   (Â_g − A_true(T_g))/σ̂_g should be ~N(0, 1) if the posterior is honest —
   we record median |z|, the 95 % coverage fraction (|z| < 1.96), and the
   min/median/max predicted relative σ_A;
3. **projection UQ**: the delta-method std of a fully downstream quantity —
   the warmest glacier's dome (peak) thickness at t_end from a forward solve
   through the fitted law (one reverse-mode gradient through the PDE + one
   covariance contraction). NOT total volume: MB-off SIA conserves volume up
   to boundary flux, so volume's A-sensitivity is ~0 by construction.

Run: JAX on the available backend (TPU in the benchmark environment);
~2-4 min including compiles.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train_at_scale import build_glaciers  # noqa: E402


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from odinn_tpu.core.glacier import stack_glaciers
    from odinn_tpu.core.params import (Hyperparameters, Parameters,
                                       PhysicalParameters, SimulationParameters,
                                       SolverParameters, UDEParameters)
    from odinn_tpu.inverse.gauss_newton import make_residual_fn
    from odinn_tpu.inverse.uncertainty import laplace_posterior
    from odinn_tpu.laws.laws import (CuffeyPaterson, LawA_inversion,
                                     poly_A_paterson_cuffey)
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.simulation.inversion import Inversion, run_inversion
    from odinn_tpu.simulation.prediction import forward_glacier, generate_ground_truth
    from odinn_tpu.simulation.solver import build_tstops

    NG = int(os.environ.get("ODINN_BENCH_NG", "128"))
    NX = int(os.environ.get("ODINN_BENCH_NX", "128"))
    SIGMA_OBS = float(os.environ.get("ODINN_UQ_SIGMA_OBS", "1.0"))  # metres

    stages = [("adam", 0.1, 60), ("adam", 0.02, 60), ("adam", 0.004, 60),
              ("adam", 8e-4, 80), ("adam", 1.6e-4, 80), ("adam", 3e-5, 80)]
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=(5.0, 7.0), use_MB=False,
                                        use_velocities=False,
                                        float_dtype="float32"),
        solver=SolverParameters(step=1 / 12, substeps=1, solver="SI",
                                cg_iters=20, remat=False),
        hyper=Hyperparameters(optimizer=tuple(s[0] for s in stages),
                              learning_rate=tuple(s[1] for s in stages),
                              epochs=tuple(s[2] for s in stages),
                              batch_size=NG, grad_accum_chunks="auto"),
        UDE=UDEParameters(grad="jax", target="A"),
    )
    tstops = build_tstops(params.simulation.tspan, params.solver.step)
    a_true_fn = poly_A_paterson_cuffey()

    temps, glaciers = build_glaciers(NG, NX)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0))
    t0 = time.time()
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    t_gt = time.time() - t0

    # observation noise: iid N(0, σ_obs²) on the thickness references where
    # ice exists (exact zeros elsewhere keep the loss masks and the
    # N_eff-counting contract intact)
    rng = np.random.default_rng(42)
    batch = stack_glaciers(glaciers)
    H = np.asarray(batch.thickness_data.H, np.float64)
    noise = rng.normal(0.0, SIGMA_OBS, size=H.shape) * (H > 0)
    batch = batch.replace(thickness_data=dataclasses.replace(
        batch.thickness_data, H=jnp.asarray((H + noise).astype(np.float32))))

    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True),
                                     n_value=3.0))
    inv = Inversion(model=model, glaciers=batch, parameters=params)
    inv.theta = jax.tree.map(lambda x: x.astype(jnp.float32), inv.theta)
    t0 = time.time()
    res = run_inversion(inv)
    t_train = time.time() - t0

    # ---- Laplace posterior (per-glacier block fast path) ----
    resid = make_residual_fn(model, params, tstops)
    t0 = time.time()
    post = laplace_posterior(inv.theta, batch, resid, structure="per_glacier")
    t_post = time.time() - t0

    # all 128 physical A's and their stds in ONE band query (the tanh-bound
    # law mapped per glacier; delta method through the bound)
    phys = params.physical
    law = model.iceflow.A

    def all_A(th):
        return jax.vmap(
            lambda i: law.apply(th, {"glacier_idx": i})
        )(jnp.arange(NG))

    t0 = time.time()
    a_hat, a_std = post.band(all_A)
    a_hat = np.asarray(a_hat, np.float64)
    a_std = np.asarray(a_std, np.float64)
    t_band = time.time() - t0

    a_ref = np.asarray([float(a_true_fn(jnp.asarray(float(t)))) for t in temps])
    z = (a_hat - a_ref) / a_std
    cover95 = float(np.mean(np.abs(z) < 1.96))
    rel_sigma = a_std / a_hat

    # joint (whitened) calibration — the falsifiable metric (r4 verdict #5):
    # score the error vector against the posterior's FULL claimed covariance;
    # T/r ~ χ²_r/r under calibration, ≪1 if the band is inflated, ≫1 if
    # overconfident. For the classical per-glacier posterior C is (block)
    # diagonal so this is also the exact aggregate of the pointwise z's,
    # with a p-value instead of an eyeballed coverage fraction (128 draws
    # give the coverage estimate itself a ±0.02 binomial std).
    from odinn_tpu.inverse.uncertainty import whitened_calibration

    _, C_cl = post.cov_band(all_A)
    joint_cl = whitened_calibration(a_hat - a_ref, C_cl)

    # ---- projection UQ: warmest glacier's dome thickness at t_end ----
    gw = jax.tree.map(lambda x: x[NG - 1], batch)

    def dome_H_t_end(th):
        traj = forward_glacier(th, gw, jnp.asarray(NG - 1), model, params,
                               tstops)
        return jnp.max(traj[-1])   # metres

    t0 = time.time()
    vol, vol_std = post.std(dome_H_t_end)
    t_proj = time.time() - t0

    # ---- NN-law posterior at scale (r3 verdict item #8) ----
    # the functional-inversion case users actually ship: A = NN(T) with the
    # production fourier8-32-1 log-head architecture (p = 609), trained on
    # the SAME noisy observations (pretrain on the noisy classical Â's +
    # PDE LM fine-tune), posterior via the dense GGN with a weight-space
    # Gaussian prior (overparameterized: p ~ N_glaciers·5? no — p >> 128
    # informative directions, so prior_std is load-bearing; see
    # inverse/uncertainty.py docstring).
    import subprocess
    import tempfile

    from odinn_tpu.laws.laws import LawA
    from odinn_tpu.models.nn import MLP, NeuralNetwork

    N_FOURIER = 8
    arch = MLP((2 * N_FOURIER, 32, 1), ("tanh", "sigmoid"))
    prescale_bounds = ((-25.0, 0.0),)
    params_nn = dataclasses.replace(params, hyper=Hyperparameters(
        optimizer=("lm",), learning_rate=(1e-2,), epochs=(10,),
        batch_size=NG, gn_cg_iters=20, gn_glacier_norm=True))
    nn = NeuralNetwork(arch, seed=666)
    law_nn = LawA(nn, params_nn, head="log", prescale_bounds=prescale_bounds,
                  n_fourier=N_FOURIER)
    model_nn = Model(iceflow=SIA2DModel(A=law_nn, n_value=3.0))

    # pretrain on the NOISY classical Â's (f64 dense fit in a subprocess)
    with tempfile.TemporaryDirectory() as td:
        fin, fout = os.path.join(td, "in.npz"), os.path.join(td, "out.npz")
        np.savez(fin, temps=np.asarray(temps, np.float64),
                 A=np.asarray(a_hat, np.float64),
                 widths=np.asarray(arch.widths),
                 acts=np.asarray(arch.activations),
                 seed=666, min_A=params.physical.min_A,
                 max_A=params.physical.max_A, head="log",
                 prescale_bounds=np.asarray(prescale_bounds, np.float64),
                 iters=600, n_fourier=N_FOURIER, restarts=3)
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                     "_pretrain_A_sub.py"), fin, fout],
                       check=True)
        fit = np.load(fout)
        theta_nn = {"A": [{k: jnp.asarray(fit[f"{k}{i}"], jnp.float32)
                           for k in ("w", "b")}
                          for i in range(len(arch.widths) - 1)]}

    inv_nn = Inversion(model=model_nn, glaciers=batch, parameters=params_nn,
                       theta=theta_nn)
    t0 = time.time()
    res_nn = run_inversion(inv_nn)
    t_train_nn = time.time() - t0

    resid_nn = make_residual_fn(model_nn, params_nn, tstops)
    from jax.flatten_util import ravel_pytree

    p_nn = int(ravel_pytree(inv_nn.theta)[0].size)
    # default = the empirically calibrated prior (joint whitened χ² study,
    # docs/uncertainty.md: τ=1.0 rejected at p=4e-9 as ~1.5× inflated,
    # τ=0.5 passes at p=0.23) — so a plain re-run reproduces the committed
    # artifact's calibrated row
    PRIOR_STD = float(os.environ.get("ODINN_UQ_PRIOR_STD", "0.5"))
    t0 = time.time()
    post_nn = laplace_posterior(inv_nn.theta, batch, resid_nn,
                                prior_std=PRIOR_STD, dense_threshold=1024)
    t_post_nn = time.time() - t0

    def all_A_nn(th):
        return jax.vmap(
            lambda T: jnp.ravel(law_nn.apply(
                th, {"T": T, "glacier_idx": jnp.asarray(0)}))[0]
        )(jnp.asarray(temps, jnp.float32))

    t0 = time.time()
    a_nn, C_nn = post_nn.cov_band(all_A_nn)
    a_nn = np.asarray(a_nn, np.float64)
    a_nn_std = np.sqrt(np.diag(C_nn))
    t_band_nn = time.time() - t0
    z_nn = (a_nn - a_ref) / a_nn_std
    rel_sigma_nn = a_nn_std / a_nn
    # joint calibration against the full law covariance: shared NN θ makes
    # the pointwise z's co-move (coverage 1.0 at max|z| 0.39 in r4 could not
    # distinguish calibrated from 3× inflated); whitening can (r4 verdict #5)
    joint_nn = whitened_calibration(a_nn - a_ref, C_nn)

    # posterior band figure for the docs (plot_law posterior=... path)
    fig_path = None
    try:
        from odinn_tpu.utils.plotting import plot_law

        plots_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "plots")
        os.makedirs(plots_dir, exist_ok=True)
        a_true_vec = np.asarray([float(a_true_fn(jnp.asarray(t)))
                                 for t in np.linspace(-25.0, -14.0, 100)])
        fig = plot_law(law_nn, inv_nn.theta, glaciers[0],
                       {"T": (-25.0, -14.0)},
                       truth_fn=lambda T: a_true_fn(jnp.asarray(T)),
                       posterior=post_nn)
        fig_path = os.path.join(plots_dir, "nn_law_posterior_band.png")
        fig.savefig(fig_path, dpi=120, bbox_inches="tight")
    except Exception as e:  # plotting must not kill the benchmark
        fig_path = f"unavailable: {e}"

    result = {
        "n_glaciers": NG, "grid": NX, "dtype": "float32", "solver": "SI",
        "sigma_obs_m": SIGMA_OBS,
        "ground_truth_s": round(t_gt, 2),
        "train_s": round(t_train, 2),
        "posterior_build_s": round(t_post, 2),
        "band_128_quantities_s": round(t_band, 2),
        "projection_uq_s": round(t_proj, 2),
        "calibration": {
            "median_abs_z": float(np.median(np.abs(z))),
            "max_abs_z": float(np.max(np.abs(z))),
            "coverage_95pct": cover95,
            "coverage_binomial_std": float(np.sqrt(0.95 * 0.05 / NG)),
            "joint_whitened": joint_cl,
            "rel_sigma_A_min": float(rel_sigma.min()),
            "rel_sigma_A_median": float(np.median(rel_sigma)),
            "rel_sigma_A_max": float(rel_sigma.max()),
        },
        "projection": {
            "dome_H_m": float(vol), "dome_H_std_m": float(vol_std),
            "rel_std": float(vol_std / vol),
        },
        "loss0": float(res.stats.losses[0]),
        "loss_final": float(res.stats.final_loss),
        "nn_law": {
            "arch": "fourier8-32-1 tanh+sigmoid, log head",
            "p": p_nn, "prior_std": PRIOR_STD,
            "train_s": round(t_train_nn, 2),
            "posterior_build_s": round(t_post_nn, 2),
            "band_s": round(t_band_nn, 2),
            "loss_final": float(res_nn.stats.final_loss),
            "calibration": {
                # NN θ is shared across glaciers, so pointwise z's are
                # correlated — coverage is a sanity check, not an iid test;
                # joint_whitened is the metric that can actually falsify
                "median_abs_z": float(np.median(np.abs(z_nn))),
                "max_abs_z": float(np.max(np.abs(z_nn))),
                "coverage_95pct": float(np.mean(np.abs(z_nn) < 1.96)),
                "joint_whitened": joint_nn,
                "rel_sigma_A_min": float(rel_sigma_nn.min()),
                "rel_sigma_A_median": float(np.median(rel_sigma_nn)),
                "rel_sigma_A_max": float(rel_sigma_nn.max()),
            },
            "band_figure": fig_path,
        },
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "uq_at_scale_result.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
