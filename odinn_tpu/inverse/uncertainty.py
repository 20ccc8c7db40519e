"""Laplace-approximation uncertainty quantification for inversions.

Beyond-parity capability (the reference ships point estimates only —
``TrainingStats``/``Results`` carry no posterior, /root/reference/src/
simulations/results/results_utils.jl): every least-squares inversion this
framework trains (classical per-glacier A, NN laws, LossH/LossV/LossHV,
time-aggregated and regularized objectives — exactly the Gauss–Newton
trainer's scope, `inverse.gauss_newton`) gets error bars from the curvature
already being computed.

Model:  loss(θ) = ‖r(θ)‖²  with  r ~ N(0, σ²I)  in weighted-residual space
(the residuals carry their √(w·Δt/npix·mask) weights, so homoscedasticity in
r-space is the weighting's own modeling assumption). With an optional
Gaussian prior θ ~ N(θ̂, τ²I), the Laplace posterior at the optimum θ* is

    θ | data  ≈  N(θ*, Σ),    Σ = (JᵀJ/σ² + I/τ²)⁻¹,   J = ∂r/∂θ|θ*

— the Gauss–Newton (GGN) Hessian, the standard PSD-safe Laplace curvature.
For any scalar quantity q(θ) (a glacier's inverted A, a law evaluated at one
input, a forecast volume), the delta method gives

    var[q] ≈ gᵀ Σ g,    g = ∇q(θ*).

TPU-native construction: no Jacobian is ever materialized. (JᵀJ)v products
are one `jax.jvp` through the (vmapped, checkpointed) PDE solve followed by
the `jax.vjp` pullback — the same operator the LM trainer's CG uses. Three
curvature paths:

- **per-glacier block** (``structure="per_glacier"``, classical inversions):
  per-glacier laws route θ by ``glacier_idx``, so J is block-diagonal by
  glacier — the EXACT GGN costs one jvp per θ leaf (tangent 1 on every
  glacier at once) instead of p HVPs: G× cheaper.
- **dense** (default for ≤ `dense_threshold` parameters — the
  reference-default NN ~60 weights): p GN-HVPs under `lax.map` build the
  p×p GGN once.
- **matrix-free** (large NN θ): one CG solve per quantity.

All covariance algebra and delta-method contractions run in NUMPY float64
regardless of the PDE dtype: physical glaciology quantities live at 1e-18
scale (Pa⁻³ s⁻¹), whose *squares* (1e-36 and below) underflow float32 —
the PDE linearizations stay f32 on device, the tiny p×p algebra is exact.

Every jitted helper takes (θ, batch) as EXPLICIT arguments — zero-arg jit
closures bake the glacier batch in as constants, which remote TPU backends
re-ship per call (measured 493 s → ~1 s posterior build at 128 glaciers).

σ² defaults to the classic unbiased estimate ‖r‖²/(N_eff − p) with N_eff =
#{structurally active residuals} (masked-out entries are exactly 0.0 in
float, so `r != 0` counts the active set), clamped at ‖r‖²/N_eff when p ≥
N_eff (overparameterized NNs — set `prior_std` there; the prior is what
makes Σ well-posed).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

__all__ = ["estimate_sigma2", "laplace_posterior", "laplace_uncertainty",
           "LaplacePosterior", "whitened_calibration"]


def estimate_sigma2(r, n_params: int):
    """σ̂² = ‖r‖² / (N_eff − p), N_eff = #active residuals; falls back to
    ‖r‖²/N_eff when p ≥ N_eff (overparameterized — no dof correction left).

    Masked/padded residual entries are structurally exact zeros (weight 0.0),
    while active residuals of a float fit are never exactly zero — counting
    ``r != 0`` recovers the active-observation count without threading the
    masks out of the loss assembly."""
    r = np.ravel(np.asarray(r, np.float64))
    n_eff = int(np.sum(r != 0.0))
    dof = n_eff - n_params if n_eff > n_params else max(n_eff, 1)
    return float(np.sum(r * r) / dof)


def _chi2_sf(x: float, k: int) -> float:
    """Survival function of χ²_k at x (Wilson–Hilferty normal approximation —
    accurate to ~1e-3 for k ≥ 3, exact enough to judge calibration without a
    scipy dependency)."""
    import math

    if k <= 0:
        return float("nan")
    z = ((x / k) ** (1.0 / 3.0) - (1.0 - 2.0 / (9.0 * k))) / math.sqrt(2.0 / (9.0 * k))
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def whitened_calibration(d, C, rel_tol: float = 1e-10):
    """Joint (whitened) calibration of an error vector against its claimed
    covariance: is ``d`` plausibly a draw from N(0, C)?

    Pointwise |z| and coverage fractions CANNOT falsify a posterior whose
    outputs share parameters (an NN law's band: all temperature points move
    together under shared θ, so 100 % pointwise coverage is equally
    consistent with "calibrated" and "3× inflated"). Whitening removes the
    correlation: eigendecompose C = V diag(λ) Vᵀ, keep the numerically
    resolved modes λ > rel_tol·λ_max (an NN-law G has rank ≤ p, and the
    smooth law concentrates variance in a few modes), and score
    z_k = (vₖ·d)/√λ_k. Under a calibrated posterior z ~ N(0, I_r), so
    T = Σ z_k² ~ χ²_r — one number the measurement can actually reject:
    T/r ≫ 1 ⇒ overconfident, T/r ≪ 1 (p_value → 1) ⇒ inflated band.

    Returns a dict: effective rank ``r``, ``T``, ``T_over_r``, two-sided
    ``p_value`` (min(sf, 1−sf)·2 of χ²_r), ``max_abs_z`` and ``median_abs_z``
    over the whitened modes. numpy float64.
    """
    d = np.ravel(np.asarray(d, np.float64))
    C = np.asarray(C, np.float64)
    lam, V = np.linalg.eigh(0.5 * (C + C.T))
    keep = lam > rel_tol * max(float(lam.max()), 0.0)
    r = int(np.sum(keep))
    if r == 0:
        return {"rank": 0, "T": float("nan"), "T_over_r": float("nan"),
                "p_value": float("nan"), "max_abs_z": float("nan"),
                "median_abs_z": float("nan")}
    z = (V[:, keep].T @ d) / np.sqrt(lam[keep])
    T = float(z @ z)
    sf = _chi2_sf(T, r)
    return {
        "rank": r,
        "T": T,
        "T_over_r": T / r,
        "p_value": float(min(sf, 1.0 - sf) * 2.0),
        "max_abs_z": float(np.abs(z).max()),
        "median_abs_z": float(np.median(np.abs(z))),
    }


@dataclasses.dataclass
class LaplacePosterior:
    """Gaussian posterior N(θ*, Σ) over inversion parameters.

    Obtain via :func:`laplace_posterior`. Query with:

    - ``std(quantity_fn)`` → (value, std) of a scalar quantity q(θ);
    - ``band(vector_fn)`` → (values, stds) of a vector quantity (e.g. a law
      swept over an input grid — a pointwise confidence band);
    - ``theta_std()`` → elementwise posterior std of θ itself (pytree).

    All returned stds are float64 (the delta-method contraction runs in
    numpy f64 — f32 underflows at glaciology's 1e-18 quantity scales).
    """

    theta: object
    sigma2: float
    _p: int
    _cov: Optional[np.ndarray]            # dense/per-glacier: Σ, np.float64
    _solve_fn: Optional[Callable]         # matrix-free: g_flat ↦ Σg (f64)

    def _solve(self, g_flat: np.ndarray) -> np.ndarray:
        if self._cov is not None:
            return self._cov @ g_flat
        return self._solve_fn(g_flat)

    def _grad_flat(self, quantity_fn) -> tuple:
        # jitted: an eager vjp dispatches the whole PDE solve op-by-op on
        # remote backends (~35 ms round-trip per op over a TPU tunnel)
        q, g = jax.jit(jax.value_and_grad(
            lambda th: jnp.asarray(quantity_fn(th)).sum()))(self.theta)
        return q, np.asarray(ravel_pytree(g)[0], np.float64)

    def std(self, quantity_fn: Callable):
        """(value, posterior std) of scalar ``quantity_fn(theta)``."""
        q, g = self._grad_flat(quantity_fn)
        var = float(g @ self._solve(g))
        return q, float(np.sqrt(max(var, 0.0)))

    def _jac_flat(self, vector_fn: Callable):
        """(values, (m, p) float64 Jacobian of the raveled output wrt θ) —
        the row flattening uses ``jax.tree.leaves`` order, which is the
        contract ``ravel_pytree`` used to build Σ (one place, shared by
        :meth:`band` and :meth:`cov_band`)."""
        q = jax.jit(vector_fn)(self.theta)
        G = jax.jit(jax.jacrev(lambda th: jnp.ravel(vector_fn(th))))(self.theta)
        G_flat = np.asarray(jax.vmap(lambda *leaves: jnp.concatenate(
            [jnp.ravel(l) for l in leaves]))(*jax.tree.leaves(G)), np.float64)
        return q, G_flat

    def band(self, vector_fn: Callable):
        """(values, pointwise stds) of vector ``vector_fn(theta)`` — the
        confidence band of a law swept over an input grid."""
        q, G_flat = self._jac_flat(vector_fn)
        if self._cov is not None:
            variances = np.einsum("mp,pq,mq->m", G_flat, self._cov, G_flat)
        else:
            variances = np.array([g @ self._solve(g) for g in G_flat])
        stds = np.sqrt(np.maximum(variances, 0.0)).reshape(np.shape(q))
        return q, stds

    def cov_band(self, vector_fn: Callable):
        """(values, FULL output covariance) of vector ``vector_fn(theta)``:
        C = G Σ Gᵀ with G = ∂(vector_fn)/∂θ|θ* — the joint posterior law of
        the whole output vector, not just its pointwise stds
        (:meth:`band` returns ``sqrt(diag(C))``).

        This is what joint calibration needs: when θ is SHARED across the
        outputs (an NN law swept over a temperature grid), pointwise z-scores
        are strongly correlated and coverage fractions cannot distinguish a
        calibrated posterior from an inflated one — whiten against C instead
        (:func:`whitened_calibration`). numpy float64.
        """
        q, G_flat = self._jac_flat(vector_fn)
        if self._cov is not None:
            C = G_flat @ self._cov @ G_flat.T
        else:
            C = G_flat @ np.stack([self._solve(g) for g in G_flat], axis=1)
        return q, 0.5 * (C + C.T)

    def theta_std(self):
        """Elementwise posterior std of θ (pytree like θ, numpy float64)."""
        if self._cov is not None:
            diag = np.diag(self._cov)
        else:
            diag = np.array([
                self._solve(np.eye(self._p, dtype=np.float64)[i])[i]
                for i in range(self._p)
            ])
        return self._unravel_np(np.sqrt(np.maximum(diag, 0.0)))

    def _unravel_np(self, flat_f64: np.ndarray):
        # rebuild θ's pytree shape with numpy-f64 leaves (ravel_pytree and
        # tree.flatten share leaf order)
        leaves, tdef = jax.tree.flatten(self.theta)
        out, off = [], 0
        for l in leaves:
            n = int(np.prod(l.shape)) if l.ndim else 1
            out.append(flat_f64[off:off + n].reshape(l.shape))
            off += n
        return jax.tree.unflatten(tdef, out)

    def sample(self, n: int, seed: int = 0):
        """``n`` posterior θ draws as one stacked pytree (leading sample axis,
        θ's device dtype) — feed to a vmapped forward for predictive
        ensembles. Requires the dense/per-glacier covariance (the matrix-free
        path holds no factor; rebuild with a ``dense_threshold ≥ p``)."""
        if self._cov is None:
            raise NotImplementedError(
                "posterior sampling needs the dense covariance — rebuild the "
                "posterior with dense_threshold >= p (or "
                "structure='per_glacier' for classical inversions)"
            )
        L = np.linalg.cholesky(self._cov)
        z = np.random.default_rng(seed).standard_normal((n, self._p))
        flat0 = np.asarray(ravel_pytree(self.theta)[0], np.float64)
        draws = flat0[None, :] + z @ L.T                     # (n, p), f64
        leaves, tdef = jax.tree.flatten(self.theta)
        out, off = [], 0
        for l in leaves:
            k = int(np.prod(l.shape)) if l.ndim else 1
            out.append(jnp.asarray(
                draws[:, off:off + k].reshape((n,) + l.shape), l.dtype))
            off += k
        return jax.tree.unflatten(tdef, out)

    def predictive(self, fn: Callable, n: int = 64, seed: int = 0,
                   return_samples: bool = False):
        """Monte-Carlo predictive (mean, std) of ``fn(theta)`` under the
        posterior — one vmapped evaluation of ``fn`` over ``n`` θ draws.

        The exact nonlinear counterpart of the delta-method :meth:`std`:
        ``fn`` may run a whole forward solve (ensemble forecasting — the
        sample axis is one more vmap axis on the TPU). Statistics are
        computed in numpy float64.
        """
        thetas = self.sample(n, seed)
        vals = jax.jit(jax.vmap(fn))(thetas)
        v64 = np.asarray(vals, np.float64)
        mean, std = v64.mean(axis=0), v64.std(axis=0, ddof=1)
        if return_samples:
            return mean, std, v64
        return mean, std


def _finish_dense(theta, p, sigma2, prior_precision, JtJ64):
    """Assemble H = JᵀJ/σ² + prior, invert in f64, return the posterior.

    The GGN is PSD mathematically, but it is built from f32 JVP/VJP products:
    their rounding noise gives tiny NEGATIVE eigenvalues, and a tight fit
    (small σ²) amplifies them past any reasonable prior — Cholesky then
    fails even though the model is well-posed. Remedy: project to the PSD
    cone (eigh, clamp negative eigenvalues to 0 — they are numerical noise,
    measured |λ₋| ≲ 1e-6·λ₊ before the 1/σ² scaling) and re-add the prior;
    with a positive prior the result is PD by construction. The hard error
    remains for the genuinely singular no-prior case.
    """
    H = JtJ64 / sigma2
    if prior_precision == 0.0:
        H = H + (1e-8 * float(np.mean(np.diag(H))) + 1e-300) * np.eye(p)
    else:
        H = H + prior_precision * np.eye(p)
    try:
        np.linalg.cholesky(H)
    except np.linalg.LinAlgError:
        w, V = np.linalg.eigh(0.5 * (JtJ64 + JtJ64.T) / sigma2)
        neg = float(w.min())
        w = np.maximum(w, 0.0)
        prior = prior_precision if prior_precision > 0.0 else (
            1e-8 * float(np.mean(w)) + 1e-300)
        H = (V * (w + prior)) @ V.T
        try:
            np.linalg.cholesky(H)
        except np.linalg.LinAlgError as e:
            raise FloatingPointError(
                "GGN Cholesky failed even after PSD projection (min eig "
                f"{neg:.3e}) — the curvature is singular at this θ. Pass "
                "prior_std= to regularize, or check that the inversion "
                "converged."
            ) from e
    cov = np.linalg.inv(H)
    return LaplacePosterior(theta, sigma2, p, cov, None)


def laplace_posterior(
    theta,
    batch,
    resid,
    sigma2: Optional[float] = None,
    prior_std: Optional[float] = None,
    dense_threshold: int = 1024,
    cg_iters: int = 100,
    glacier_ids=None,
    structure: Optional[str] = None,
) -> LaplacePosterior:
    """Build the Laplace posterior N(θ*, (JᵀJ/σ² + I/τ²)⁻¹) at θ* = ``theta``.

    ``resid`` is a residual map ``r(θ, batch[, ids])`` with ‖r‖² == the
    training loss — exactly what :func:`inverse.gauss_newton.make_residual_fn`
    returns, so a trained LM/GN inversion can be priced directly:

    >>> resid = make_residual_fn(model, params, tstops)
    >>> post = laplace_posterior(inversion.theta, batch, resid)
    >>> A, A_std = post.std(lambda th: eval_law(law, th, g0, glacier_idx=0))

    ``sigma2``: observation noise in weighted-residual space; defaults to the
    unbiased estimate (see :func:`estimate_sigma2`).
    ``prior_std`` τ: Gaussian prior width on θ. ``None`` adds only a jitter
    floor (1e-8 of the mean GGN diagonal) for invertibility — appropriate
    when p ≪ N (classical inversions). Overparameterized NNs NEED a real
    τ; a warning is emitted when p ≥ N_eff and no prior is given.
    ``structure="per_glacier"``: classical-inversion fast path — θ leaves
    are per-glacier vectors (G,), J is block-diagonal by glacier, and the
    exact GGN costs one jvp per leaf instead of p HVPs (G× cheaper).
    """
    flat, unravel = ravel_pytree(theta)
    p = int(flat.size)
    dt_ = flat.dtype

    def rfn(th, b):
        return resid(th, b) if glacier_ids is None else resid(th, b, glacier_ids)

    r = jax.jit(rfn)(theta, batch)
    n_eff = int(np.sum(np.ravel(np.asarray(r)) != 0.0))
    if sigma2 is None:
        if p >= n_eff and prior_std is None:
            import warnings

            warnings.warn(
                f"Laplace posterior with p={p} parameters >= N_eff={n_eff} "
                "active residuals and no prior_std: σ² falls back to "
                "‖r‖²/N_eff and the GGN is rank-deficient — pass prior_std "
                "to get a well-posed posterior."
            )
        sigma2 = estimate_sigma2(np.asarray(r), p)
    prior_precision = 0.0 if prior_std is None else 1.0 / float(prior_std) ** 2

    if structure == "per_glacier":
        # Classical-inversion fast path: glacier g's residual block depends
        # ONLY on θ[·][g] (per-glacier laws route θ by glacier_idx), so J is
        # block-diagonal by glacier and ONE jvp per θ leaf — tangent 1 on
        # that leaf for EVERY glacier simultaneously — recovers J's (g, l)
        # column blocks exactly: L jvps instead of p = G·L HVPs.
        leaves, tdef = jax.tree.flatten(theta)
        if not leaves or leaves[0].ndim != 1:
            raise ValueError("structure='per_glacier' requires 1-D θ leaves")
        G = leaves[0].shape[0]
        for x in leaves:
            if x.ndim != 1 or x.shape[0] != G:
                raise ValueError(
                    "structure='per_glacier' requires every θ leaf to be a "
                    f"per-glacier vector of shape ({G},); got {x.shape}"
                )
        L = len(leaves)
        # batch row-block g reads θ[·][ids[g]] (per-glacier routing), so the
        # curvature of row g belongs at θ column ids[g] — and duplicate ids
        # (one θ entry shared by several batch rows) must ACCUMULATE.
        ids = (np.arange(G) if glacier_ids is None
               else np.asarray(glacier_ids, dtype=int).ravel())
        n_blocks = ids.shape[0]

        @jax.jit
        def leaf_jvs(th, b):
            lv, td = jax.tree.flatten(th)
            out = []
            for l in range(L):
                v = jax.tree.unflatten(td, [
                    jnp.ones_like(x) if i == l else jnp.zeros_like(x)
                    for i, x in enumerate(lv)])
                _, jv = jax.jvp(lambda t: rfn(t, b), (th,), (v,))
                out.append(jv.reshape(n_blocks, -1))
            return out

        jvs = [np.asarray(a, np.float64) for a in leaf_jvs(theta, batch)]
        JtJ = np.zeros((p, p), dtype=np.float64)
        for l in range(L):                            # flat layout is
            for m in range(l, L):                     # leaf-major: off_l = l·G
                s = np.sum(jvs[l] * jvs[m], axis=1)
                np.add.at(JtJ, (l * G + ids, m * G + ids), s)
                if m > l:
                    np.add.at(JtJ, (m * G + ids, l * G + ids), s)
        return _finish_dense(theta, p, sigma2, prior_precision, JtJ)

    if p <= dense_threshold:
        # p GN-HVPs (lax.map bounds the live JVP trajectories to one) build
        # the exact raw JᵀJ; numpy f64 assembles and inverts
        @jax.jit
        def build_raw(th, b):
            _, pb = jax.vjp(lambda t: rfn(t, b), th)

            def hvp(e):
                v = unravel(e)
                _, jv = jax.jvp(lambda t: rfn(t, b), (th,), (v,))
                (jtv,) = pb(jv)
                return ravel_pytree(jtv)[0]

            return jax.lax.map(hvp, jnp.eye(p, dtype=dt_))

        JtJ = np.asarray(build_raw(theta, batch), np.float64)
        JtJ = 0.5 * (JtJ + JtJ.T)
        return _finish_dense(theta, p, sigma2, prior_precision, JtJ)

    # matrix-free: one flat-space CG solve of (JᵀJ/σ² + P)x = g per query,
    # jitted with (θ, batch) as explicit args (no baked constants)
    if prior_precision == 0.0:
        @jax.jit
        def probe_scale(th, b, key):
            _, pb = jax.vjp(lambda t: rfn(t, b), th)
            v = jax.random.rademacher(key, (p,), dt_)
            _, jv = jax.jvp(lambda t: rfn(t, b), (th,), (unravel(v),))
            (jtv,) = pb(jv)
            return jnp.abs(jnp.dot(v, ravel_pytree(jtv)[0]))

        scale = float(probe_scale(theta, batch, jax.random.PRNGKey(0))) / (
            p * sigma2)
        prior_precision = 1e-8 * scale + 1e-300

    s2 = jnp.asarray(sigma2, dt_)
    pp = jnp.asarray(prior_precision, dt_)

    @jax.jit
    def cg_solve(g_flat, th, b):
        # the LM trainer's pytree CG, applied to the single-leaf flat vector
        from odinn_tpu.inverse.gauss_newton import _cg_tree

        _, pb = jax.vjp(lambda t: rfn(t, b), th)

        def mv(v):
            _, jv = jax.jvp(lambda t: rfn(t, b), (th,), (unravel(v),))
            (jtv,) = pb(jv)
            return ravel_pytree(jtv)[0] / s2 + pp * v

        return _cg_tree(mv, g_flat, cg_iters)

    def solve_fn(g64: np.ndarray) -> np.ndarray:
        g = jnp.asarray(g64, dt_)
        return np.asarray(cg_solve(g, theta, batch), np.float64)

    return LaplacePosterior(theta, sigma2, p, None, solve_fn)


def laplace_uncertainty(inversion, **kwargs) -> LaplacePosterior:
    """Posterior over a trained :class:`Inversion`'s θ in one call.

    Builds the residual map from the inversion's own model/params (the
    training objective in least-squares form) and prices the Laplace
    posterior at the trained θ. Keyword arguments are forwarded to
    :func:`laplace_posterior` (``sigma2``, ``prior_std``, ``structure``, …).
    """
    from odinn_tpu.inverse.gauss_newton import make_residual_fn
    from odinn_tpu.simulation.inversion import assemble_tstops

    params = inversion.parameters
    batch = inversion.glaciers
    tstops = assemble_tstops(params, batch)
    resid = make_residual_fn(inversion.model, params, tstops)
    return laplace_posterior(inversion.theta, batch, resid, **kwargs)
