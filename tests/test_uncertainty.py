"""Laplace-approximation UQ (`inverse.uncertainty`) — beyond-parity feature
(the reference's Results carry point estimates only).

Pins, smallest problems that exercise the real PDE pipeline:

1. the dense GGN path equals a finite-difference-built Jacobian's
   JᵀJ/σ² + jitter covariance (the GN-HVP chain through the vmapped solve
   is the thing under test);
2. the matrix-free CG path equals the dense path;
3. a law confidence band evaluates finitely with per-point stds;
4. (slow) Monte-Carlo calibration: the predicted std of an inverted A
   matches the empirical scatter under repeated observation-noise draws.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odinn_tpu.core.glacier import stack_glaciers
from odinn_tpu.core.params import (
    Hyperparameters,
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.inverse.gauss_newton import make_residual_fn
from odinn_tpu.inverse.uncertainty import laplace_posterior
from odinn_tpu.laws.laws import CuffeyPaterson, LawA, LawA_inversion, eval_law
from odinn_tpu.models.model import Model, SIA2DModel, init_theta
from odinn_tpu.models.nn import NeuralNetwork, default_architecture
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops

A_TRUE = np.array([6.5e-18, 3.0e-18])
TSPAN = (5.0, 5.25)


def _params(**hyper):
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False),
        solver=SolverParameters(step=1.0 / 12.0, substeps=8),
        hyper=Hyperparameters(**hyper) if hyper else Hyperparameters(),
        UDE=UDEParameters(grad="jax"),
    )


@pytest.fixture(scope="module")
def classical():
    """2-glacier scalar-A inversion problem at truth θ (the posterior is
    defined at any θ — no training needed for the parity rows)."""
    params = _params()
    tstops = build_tstops(TSPAN, params.solver.step)
    glaciers = [
        halfar_glacier(nx=20, ny=20, dx=150.0, temp=-20.0, A=float(A_TRUE[0]),
                       rgi_id="u0"),
        halfar_glacier(nx=20, ny=20, dx=150.0, r0=600.0, h0=450.0, temp=-15.0,
                       A=float(A_TRUE[1]), rgi_id="u1"),
    ]
    truth = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    phys = params.physical
    th_truth = {"A": jnp.asarray(np.arctanh(
        2 * (A_TRUE - phys.min_A) / (phys.max_A - phys.min_A) - 1))}
    glaciers = generate_ground_truth(glaciers, params, truth, tstops,
                                     store=("H",), theta=th_truth)
    batch = stack_glaciers(glaciers)
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
    resid = make_residual_fn(model, params, tstops)
    # evaluate the posterior slightly off truth so residuals are non-trivial
    theta = {"A": th_truth["A"] + 0.05}
    return params, model, batch, theta, tstops, resid


def test_dense_ggn_matches_fd_jacobian(classical):
    params, model, batch, theta, tstops, resid = classical
    post = laplace_posterior(theta, batch, resid, sigma2=1.0)

    # finite-difference Jacobian (p = 2 columns)
    h = 1e-6
    cols = []
    for i in range(2):
        e = jnp.zeros(2).at[i].set(h)
        rp = resid({"A": theta["A"] + e}, batch)
        rm = resid({"A": theta["A"] - e}, batch)
        cols.append(np.asarray((rp - rm) / (2 * h)).ravel())
    J = np.stack(cols, axis=1)                    # (N, 2)
    H = J.T @ J                                    # σ² = 1
    H = H + 1e-8 * np.mean(np.diag(H)) * np.eye(2)  # the jitter floor
    cov_fd = np.linalg.inv(H)

    # elementwise θ std
    th_std = post.theta_std()
    np.testing.assert_allclose(np.asarray(th_std["A"]),
                               np.sqrt(np.diag(cov_fd)), rtol=1e-4)

    # delta-method std of the PHYSICAL quantity A₀ (through the tanh bound)
    g0 = jax.tree.map(lambda x: x[0], batch)
    law = model.iceflow.A
    q, s = post.std(lambda th: eval_law(law, th, g0, glacier_idx=0))
    grad = jax.grad(
        lambda th: eval_law(law, th, g0, glacier_idx=0).sum())(theta)
    g = np.asarray(grad["A"])
    np.testing.assert_allclose(float(s), np.sqrt(g @ cov_fd @ g), rtol=1e-4)
    assert float(q) > 0


def test_matrix_free_matches_dense(classical):
    params, model, batch, theta, tstops, resid = classical
    kw = dict(sigma2=1.0, prior_std=10.0)
    dense = laplace_posterior(theta, batch, resid, **kw)
    mf = laplace_posterior(theta, batch, resid, dense_threshold=0,
                           cg_iters=25, **kw)
    qd, sd = dense.std(lambda th: th["A"][0])
    qm, sm = mf.std(lambda th: th["A"][0])
    np.testing.assert_allclose(float(sm), float(sd), rtol=1e-6)
    sd_all = dense.theta_std()
    sm_all = mf.theta_std()
    np.testing.assert_allclose(np.asarray(sm_all["A"]),
                               np.asarray(sd_all["A"]), rtol=1e-6)


def test_nn_law_band(classical):
    """Confidence band of an (untrained) NN creep law over temperature:
    dense-path band is finite, positive, and its point values equal the
    law's own evaluation."""
    params, _, batch, _, tstops, _ = classical
    nn = NeuralNetwork(default_architecture(1, light=True), seed=3)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    theta = init_theta(model, batch)
    resid = make_residual_fn(model, params, tstops)
    post = laplace_posterior(theta, batch, resid, prior_std=1.0)

    law = model.iceflow.A
    temps = jnp.linspace(-25.0, -10.0, 7)

    def band_fn(th):
        return jax.vmap(
            lambda T: law.apply(th, {"T": T, "glacier_idx": jnp.asarray(0)})
        )(temps)

    vals, stds = post.band(band_fn)
    assert vals.shape == stds.shape == (7,)
    assert np.isfinite(np.asarray(vals)).all()
    assert np.isfinite(np.asarray(stds)).all() and (np.asarray(stds) > 0).all()
    np.testing.assert_allclose(np.asarray(vals), np.asarray(band_fn(theta)))
    # scalar query agrees with the band at the same point
    q0, s0 = post.std(
        lambda th: law.apply(th, {"T": temps[0], "glacier_idx": jnp.asarray(0)}))
    np.testing.assert_allclose(float(s0), float(stds[0]), rtol=1e-8)


def test_cov_band_matches_band_diag(classical):
    """cov_band's full output covariance is consistent with band: its
    diagonal equals the pointwise variances, it is symmetric PSD, and the
    off-diagonal correlation of a shared-θ NN law is strong — the reason
    pointwise coverage cannot judge calibration (VERDICT r4 weak #3)."""
    params, _, batch, _, tstops, _ = classical
    nn = NeuralNetwork(default_architecture(1, light=True), seed=3)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    theta = init_theta(model, batch)
    resid = make_residual_fn(model, params, tstops)
    post = laplace_posterior(theta, batch, resid, prior_std=1.0)

    law = model.iceflow.A
    temps = jnp.linspace(-25.0, -10.0, 7)

    def band_fn(th):
        return jax.vmap(
            lambda T: law.apply(th, {"T": T, "glacier_idx": jnp.asarray(0)})
        )(temps)

    vals_b, stds = post.band(band_fn)
    vals_c, C = post.cov_band(band_fn)
    np.testing.assert_allclose(np.asarray(vals_c), np.asarray(vals_b))
    np.testing.assert_allclose(np.sqrt(np.diag(C)), np.asarray(stds),
                               rtol=1e-10)
    assert np.allclose(C, C.T)
    lam = np.linalg.eigvalsh(C)
    assert lam.min() > -1e-12 * lam.max()
    corr = C / np.sqrt(np.outer(np.diag(C), np.diag(C)))
    # neighboring temperature points of a smooth shared-θ law co-move
    assert float(np.abs(np.diag(corr, 1)).min()) > 0.5


def test_whitened_calibration_statistic():
    """whitened_calibration is the falsifiable joint metric: for errors drawn
    from the claimed covariance it centers at T/r ≈ 1 with a healthy p-value;
    for a 3×-inflated claimed band it reports T/r ≈ 1/9 with p ≈ 0 — the
    regime pointwise coverage cannot distinguish (both give ~100 %)."""
    from odinn_tpu.inverse.uncertainty import whitened_calibration

    rng = np.random.default_rng(0)
    # a correlated low-rank-ish covariance like an NN-law band's
    G = rng.standard_normal((12, 4))
    C = G @ G.T + 1e-6 * np.eye(12)
    L = np.linalg.cholesky(C)

    stats = [whitened_calibration(L @ rng.standard_normal(12), C)
             for _ in range(64)]
    t_over_r = np.array([s["T_over_r"] for s in stats])
    assert abs(t_over_r.mean() - 1.0) < 0.25, t_over_r.mean()
    # a calibrated draw is rarely rejected at 1 %
    pvals = np.array([s["p_value"] for s in stats])
    assert np.mean(pvals < 0.01) < 0.15

    # claimed band 3× too wide (the failure mode under test): same draws
    # judged against 9·C
    stats_inflated = [whitened_calibration(L @ rng.standard_normal(12), 9 * C)
                      for _ in range(64)]
    t_infl = np.array([s["T_over_r"] for s in stats_inflated])
    assert abs(t_infl.mean() - 1.0 / 9.0) < 0.05, t_infl.mean()
    p_infl = np.array([s["p_value"] for s in stats_inflated])
    assert np.mean(p_infl < 0.01) > 0.8, "inflated band must be rejected"
    # rank resolves the true structure, not the padding jitter
    assert stats[0]["rank"] >= 4


@pytest.mark.slow
def test_monte_carlo_calibration(classical):
    """The Laplace std of an inverted per-glacier A matches the empirical
    scatter of repeated noisy inversions (the statistic it claims to be).
    K=8 noise draws, LM refits from truth-adjacent init."""
    import dataclasses

    from odinn_tpu.inverse.gauss_newton import lm_train

    params, model, batch, theta0, tstops, resid = classical
    law = model.iceflow.A
    g0 = jax.tree.map(lambda x: x[0], batch)

    sigma_obs = 0.5  # metres of thickness noise
    rng = np.random.default_rng(7)
    H = np.asarray(batch.thickness_data.H)

    recovered = []
    for k in range(8):
        noise = rng.normal(0.0, sigma_obs, size=H.shape)
        noise[..., :, :] *= (H > 0)  # keep padding/ice-free refs exactly zero
        noisy = jax.tree.map(lambda x: x, batch)
        noisy = noisy.replace(thickness_data=dataclasses.replace(
            batch.thickness_data, H=jnp.asarray(H + noise)))
        th, losses = lm_train(
            {"A": jnp.copy(theta0["A"])}, noisy, resid,
            iters=8, cg_iters=4)
        a = float(eval_law(law, th, g0, glacier_idx=0))
        recovered.append(a)
        # the last fit also prices the Laplace posterior
        if k == 7:
            post = laplace_posterior(th, noisy, resid)
            _, s_pred = post.std(
                lambda t: eval_law(law, t, g0, glacier_idx=0))

    emp = float(np.std(recovered, ddof=1))
    pred = float(s_pred)
    assert emp > 0 and pred > 0
    ratio = pred / emp
    assert 0.25 < ratio < 4.0, (
        f"Laplace std {pred:.3e} vs empirical {emp:.3e} (ratio {ratio:.2f}) "
        f"— recovered A's: {recovered}"
    )


def test_per_glacier_structure_matches_dense(classical):
    """structure='per_glacier' (one jvp per θ leaf, exploiting the
    block-diagonal J of per-glacier laws) equals the generic p-HVP dense
    GGN — same θ stds, same quantity stds."""
    params, model, batch, theta, tstops, resid = classical
    kw = dict(sigma2=1.0)
    dense = laplace_posterior(theta, batch, resid, **kw)
    fast = laplace_posterior(theta, batch, resid, structure="per_glacier", **kw)
    sd = dense.theta_std()
    sf = fast.theta_std()
    np.testing.assert_allclose(np.asarray(sf["A"]), np.asarray(sd["A"]),
                               rtol=1e-9)
    g0 = jax.tree.map(lambda x: x[0], batch)
    law = model.iceflow.A
    q = lambda th: eval_law(law, th, g0, glacier_idx=0)
    np.testing.assert_allclose(float(fast.std(q)[1]), float(dense.std(q)[1]),
                               rtol=1e-9)


def test_per_glacier_structure_respects_glacier_ids(classical):
    """Permuting the batch rows while routing θ via glacier_ids must leave
    the posterior invariant — the curvature of batch row g belongs at θ
    column ids[g], not g (regression: the fast path used to assume
    identity routing and silently swapped glaciers' variances)."""
    params, model, batch, theta, tstops, resid = classical
    kw = dict(sigma2=1.0)
    base = laplace_posterior(theta, batch, resid, structure="per_glacier",
                             **kw)
    perm = np.array([1, 0])
    batch_p = jax.tree.map(lambda x: x[perm], batch)
    ids = jnp.asarray(perm)
    permuted = laplace_posterior(theta, batch_p, resid, glacier_ids=ids,
                                 structure="per_glacier", **kw)
    np.testing.assert_allclose(np.asarray(permuted.theta_std()["A"]),
                               np.asarray(base.theta_std()["A"]), rtol=1e-9)
    # and it equals the generic dense path under the same routing
    dense = laplace_posterior(theta, batch_p, resid, glacier_ids=ids, **kw)
    np.testing.assert_allclose(np.asarray(permuted.theta_std()["A"]),
                               np.asarray(dense.theta_std()["A"]), rtol=1e-9)


def test_sigma2_overparameterized_fallback():
    """p ≥ N_eff falls back to ‖r‖²/N_eff exactly as documented (it used
    to clamp dof to 1, inflating σ² by N_eff×)."""
    from odinn_tpu.inverse.uncertainty import estimate_sigma2

    r = np.array([0.0, 1.0, 2.0, 0.0, 3.0])  # N_eff = 3, ‖r‖² = 14
    assert np.isclose(estimate_sigma2(r, 1), 14.0 / 2)   # dof = 3 - 1
    assert np.isclose(estimate_sigma2(r, 3), 14.0 / 3)   # p == N_eff
    assert np.isclose(estimate_sigma2(r, 50), 14.0 / 3)  # p >> N_eff


def test_posterior_sampling_and_predictive(classical):
    """sample(): empirical covariance of draws matches Σ; predictive():
    MC std of a LINEAR quantity matches the delta-method std (they are
    exactly equal in distribution for linear maps)."""
    params, model, batch, theta, tstops, resid = classical
    post = laplace_posterior(theta, batch, resid, sigma2=1.0)

    draws = post.sample(4000, seed=42)
    emp = np.cov(np.stack([np.ravel(np.asarray(draws["A"][:, i], np.float64))
                           for i in range(2)]), ddof=1)
    np.testing.assert_allclose(emp, post._cov, atol=5e-2 * np.max(post._cov)
                               + 1e-12)

    # linear quantity: MC predictive std ≈ delta-method std
    w = jnp.asarray([0.7, -0.3])
    q = lambda th: jnp.sum(w * th["A"])
    _, sd_delta = post.std(q)
    mean, sd_mc = post.predictive(q, n=4000, seed=7)
    assert abs(sd_mc - sd_delta) / sd_delta < 0.1
    # predictive through a real forward solve: finite, positive
    from odinn_tpu.simulation.prediction import forward_batch

    vol = lambda th: jnp.sum(forward_batch(th, batch, model, params,
                                           tstops)[:, -1])
    m, s = post.predictive(vol, n=8, seed=1)
    assert np.isfinite(m) and np.isfinite(s) and s > 0


def test_psd_projection_on_noisy_ggn():
    """f32 HVP rounding gives the mathematically-PSD GGN tiny negative
    eigenvalues; amplified by a tight fit's small sigma^2 they exceed the
    prior and Cholesky fails. `_finish_dense` must project to the PSD cone
    and still return a valid posterior (found in the at-scale NN-law UQ)."""
    from odinn_tpu.inverse.uncertainty import _finish_dense

    rng = np.random.default_rng(0)
    p = 20
    J = rng.standard_normal((5, p))           # rank-5: singular directions
    JtJ = J.T @ J
    # symmetric noise at f32-HVP scale, enough to push eigenvalues negative
    E = 1e-7 * rng.standard_normal((p, p))
    JtJ_noisy = JtJ + 0.5 * (E + E.T)
    assert np.linalg.eigvalsh(JtJ_noisy).min() < 0
    sigma2 = 1e-14                            # tight fit amplifies the noise
    theta = {"w": jnp.zeros((p,))}
    post = _finish_dense(theta, p, sigma2, prior_precision=1.0,
                         JtJ64=JtJ_noisy)
    std = post.theta_std()["w"]
    assert np.isfinite(std).all() and (std > 0).all()
    # singular directions are prior-limited: std <= prior_std (= 1)
    assert std.max() <= 1.0 + 1e-9
