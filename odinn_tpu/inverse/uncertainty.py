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
the `jax.vjp` pullback — the same operator the LM trainer's CG uses. Two
execution paths:

- **dense** (default for ≤ `dense_threshold` parameters — classical
  inversions have p = n_glaciers, the reference-default NN ~60 weights):
  p GN-HVPs under `lax.map` build the p×p GGN once; a single Cholesky
  factorization then prices EVERY subsequent quantity at one triangular
  solve — a band of 100 law evaluations costs ~nothing beyond its
  gradients.
- **matrix-free** (large NN θ): one preconditioned CG solve per quantity,
  reusing `gauss_newton._cg_tree` in θ-pytree space.

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

from odinn_tpu.inverse.gauss_newton import _cg_tree

__all__ = ["estimate_sigma2", "laplace_posterior", "laplace_uncertainty", "LaplacePosterior"]


def estimate_sigma2(r, n_params: int):
    """σ̂² = ‖r‖² / max(N_eff − p, 1), N_eff = #active residuals.

    Masked/padded residual entries are structurally exact zeros (weight 0.0),
    while active residuals of a float fit are never exactly zero — counting
    ``r != 0`` recovers the active-observation count without threading the
    masks out of the loss assembly."""
    r = jnp.ravel(r)
    n_eff = jnp.sum(r != 0.0)
    dof = jnp.maximum(n_eff - n_params, 1)
    return jnp.sum(r * r) / dof.astype(r.dtype)


@dataclasses.dataclass
class LaplacePosterior:
    """Gaussian posterior N(θ*, Σ) over inversion parameters.

    Obtain via :func:`laplace_posterior`. Query with:

    - ``std(quantity_fn)`` → (value, std) of a scalar quantity q(θ);
    - ``band(vector_fn)`` → (values, stds) of a vector quantity (e.g. a law
      swept over an input grid — a pointwise confidence band);
    - ``theta_std()`` → elementwise posterior std of θ itself (pytree).
    """

    theta: object
    sigma2: float
    _flat: jnp.ndarray
    _unravel: Callable
    _chol: Optional[jnp.ndarray]          # dense path: Cholesky of the GGN
    _matvec: Optional[Callable]           # matrix-free path: v ↦ (JᵀJ/σ²+P)v
    _prior_precision: float
    _cg_iters: int

    def _solve(self, g_flat):
        """Σ g for a flat gradient g (one column)."""
        if self._chol is not None:
            return jax.scipy.linalg.cho_solve((self._chol, True), g_flat)
        sol = _cg_tree(
            lambda v: self._unravel_apply(v),
            self._unravel(g_flat),
            self._cg_iters,
        )
        return ravel_pytree(sol)[0]

    def _unravel_apply(self, v_tree):
        flat = ravel_pytree(v_tree)[0]
        return self._unravel(self._matvec(flat))

    def std(self, quantity_fn: Callable):
        """(value, posterior std) of scalar ``quantity_fn(theta)``."""
        q, vjp = jax.vjp(quantity_fn, self.theta)
        (g,) = vjp(jnp.ones_like(q))
        g_flat = ravel_pytree(g)[0]
        var = jnp.dot(g_flat, self._solve(g_flat))
        return q, jnp.sqrt(jnp.maximum(var, 0.0))

    def band(self, vector_fn: Callable):
        """(values, pointwise stds) of vector ``vector_fn(theta)`` — the
        confidence band of a law swept over an input grid."""
        q = vector_fn(self.theta)
        G = jax.jacrev(lambda th: jnp.ravel(vector_fn(th)))(self.theta)
        G_flat = jax.vmap(lambda *leaves: jnp.concatenate(
            [jnp.ravel(l) for l in leaves]))(*jax.tree.leaves(G))
        if self._chol is not None:
            sols = jax.scipy.linalg.cho_solve((self._chol, True), G_flat.T)
            variances = jnp.sum(G_flat * sols.T, axis=1)
        else:
            variances = jnp.stack([
                jnp.dot(g, self._solve(g)) for g in G_flat
            ])
        return q, jnp.sqrt(jnp.maximum(variances, 0.0)).reshape(jnp.shape(q))

    def theta_std(self):
        """Elementwise posterior std of θ (pytree like θ)."""
        p = self._flat.size
        if self._chol is not None:
            cov_diag = jnp.diagonal(jax.scipy.linalg.cho_solve(
                (self._chol, True), jnp.eye(p, dtype=self._flat.dtype)))
        else:
            cov_diag = jnp.stack([
                self._solve(jnp.zeros((p,), self._flat.dtype).at[i].set(1.0))[i]
                for i in range(p)
            ])
        return self._unravel(jnp.sqrt(jnp.maximum(cov_diag, 0.0)))


def laplace_posterior(
    theta,
    batch,
    resid,
    sigma2: Optional[float] = None,
    prior_std: Optional[float] = None,
    dense_threshold: int = 1024,
    cg_iters: int = 100,
    glacier_ids=None,
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
    """
    flat, unravel = ravel_pytree(theta)
    p = int(flat.size)
    dt_ = flat.dtype

    def rfn(th):
        return (resid(th, batch) if glacier_ids is None
                else resid(th, batch, glacier_ids))

    r, pb = jax.vjp(rfn, theta)
    n_eff = int(jnp.sum(jnp.ravel(r) != 0.0))
    if sigma2 is None:
        if p >= n_eff and prior_std is None:
            import warnings

            warnings.warn(
                f"Laplace posterior with p={p} parameters >= N_eff={n_eff} "
                "active residuals and no prior_std: σ² falls back to "
                "‖r‖²/N_eff and the GGN is rank-deficient — pass prior_std "
                "to get a well-posed posterior."
            )
        sigma2 = float(estimate_sigma2(np.asarray(jnp.ravel(r)), min(p, n_eff - 1)))
    prior_precision = 0.0 if prior_std is None else 1.0 / float(prior_std) ** 2

    def gnvp_flat(v_flat):
        v = unravel(v_flat)
        _, jv = jax.jvp(rfn, (theta,), (v,))
        (jtv,) = pb(jv)
        out = ravel_pytree(jtv)[0] / sigma2
        return out + prior_precision * v_flat

    if p <= dense_threshold:
        # p GN-HVPs (lax.map bounds the live JVP trajectories to one) build
        # the exact GGN; one Cholesky then prices every query
        eye = jnp.eye(p, dtype=dt_)
        H = jax.jit(lambda: jax.lax.map(gnvp_flat, eye))()
        H = 0.5 * (H + H.T)
        if prior_precision == 0.0:
            jitter = 1e-8 * jnp.mean(jnp.diag(H)) + jnp.asarray(1e-300, dt_)
            H = H + jitter * eye
        chol = jax.scipy.linalg.cholesky(H, lower=True)
        if not bool(jnp.all(jnp.isfinite(chol))):
            raise FloatingPointError(
                "GGN Cholesky failed — the curvature is singular at this θ. "
                "Pass prior_std= to regularize, or check that the inversion "
                "converged."
            )
        return LaplacePosterior(theta, sigma2, flat, unravel, chol, None,
                                prior_precision, cg_iters)
    if prior_precision == 0.0:
        # matrix-free path needs an SPD operator for CG — give the jitter a
        # scale from a one-probe Hutchinson diagonal estimate
        probe = jax.random.rademacher(jax.random.PRNGKey(0), (p,), dt_)
        scale = jnp.abs(jnp.dot(probe, gnvp_flat(probe))) / p
        prior_precision = float(1e-8 * scale + 1e-300)
    mv = jax.jit(lambda v: gnvp_flat(v))
    return LaplacePosterior(theta, sigma2, flat, unravel, None, mv,
                            prior_precision, cg_iters)


def laplace_uncertainty(inversion, **kwargs) -> LaplacePosterior:
    """Posterior over a trained :class:`Inversion`'s θ in one call.

    Builds the residual map from the inversion's own model/params (the
    training objective in least-squares form) and prices the Laplace
    posterior at the trained θ. Keyword arguments are forwarded to
    :func:`laplace_posterior` (``sigma2``, ``prior_std``, ``cg_iters``, …).
    """
    from odinn_tpu.inverse.gauss_newton import make_residual_fn
    from odinn_tpu.simulation.inversion import assemble_tstops

    params = inversion.parameters
    batch = inversion.glaciers
    tstops = assemble_tstops(params, batch)
    resid = make_residual_fn(inversion.model, params, tstops)
    return laplace_posterior(inversion.theta, batch, resid, **kwargs)
