"""Ensemble Kalman Inversion (EKI) — derivative-free UDE training.

A third trainer family next to first-order (Adam/LBFGS, ``train_ude``) and
second-order least-squares (LM, ``inverse.gauss_newton``): the iterative
ensemble Kalman method of Iglesias, Law & Stuart (2013) applied to the same
least-squares objective the LM trainer minimizes, ‖r(θ)‖² with r from
:func:`simulation.inversion.glacier_residuals`. The reference has no
equivalent (its trainers are Optimization.jl gradient descents,
/root/reference/src/simulations/inversions/inversion_utils.jl:59-137); EKI is
the standard calibration tool of the climate-model community for exactly this
glacier-scale inverse problem shape, and it earns its place here twice over:

- **TPU-first**: one iteration is J member forward solves (a vmap axis that
  shards across a device mesh like the multistart restart axis — no
  collectives in the hot loop beyond the J×J Kalman algebra, which is a pair
  of MXU matmuls). No reverse pass, so no adjoint memory: peak HBM is the
  forward solve itself.
- **Derivative-free**: only *forward* solves are evaluated, so EKI trains
  through configurations where reverse-mode AD is unavailable or refused —
  including ``params.solver.adaptive = True`` (the error-controlled BS3(2)
  ``lax.while_loop`` forward, which has no reverse rule and which
  ``train_ude`` rejects loudly). EKI is therefore the one trainer that
  optimizes the *exact* adaptive trajectory rather than a replayed or
  fixed-step surrogate.

Algebra (subspace form). With member rows Θ ∈ R^{J×d}, residual rows
R ∈ R^{J×m} (observations y = 0, misfit G(θ) = r(θ)), anomalies
Θa = Θ − mean, Ra = R − mean, the update

    θ_j ← θ_j + C_θg (C_gg + γI)⁻¹ (y_j − r_j)

is computed without ever forming the m×m C_gg via the push-through identity
Raᵀ(Ra Raᵀ/J + γI)⁻¹ = (RaᵀRa/J + γI)⁻¹Raᵀ — everything is J×J:

    C = Ra Raᵀ / J                       (J×J)
    S = (C + γI)⁻¹ (Ra Dᵀ / J)           (J×J), D = y − R (+ perturbations)
    Θ ← Θ + Sᵀ Θa

γ plays the Levenberg–Marquardt damping role (γ = Γ/Δt in the continuous-time
reading); by default it is self-scaled to the current ensemble spread,
γ = damping · tr(C)/J, so steps stay aggressive early and shrink as the
ensemble collapses toward the optimum. The iteration preserves the affine
span of the initial ensemble (the subspace property — pinned by a test), so
J should comfortably exceed the effective parameter dimension, or the
initial spread (``init_scale``) should cover the directions that matter.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.flatten_util  # registers jax.flatten_util (NOT auto-imported by `import jax`)
import jax.numpy as jnp
import numpy as np

__all__ = ["EKIResult", "eki_train"]


@dataclass
class EKIResult:
    """Final ensemble plus per-iteration misfit history."""

    thetas: Any                # θ pytree with leading member axis (final ensemble)
    misfits: np.ndarray        # (n_done+1, J) per-member ‖r‖² incl. the initial ensemble
    best_idx: int              # member with the lowest final misfit
    best_loss: float
    best_theta: Any            # that member's θ (no member axis)
    mean_theta: Any            # ensemble-mean θ (the classical EKI estimator)
    mean_loss: float           # misfit at mean_theta
    n_iters: int               # iterations actually run (≤ requested; tol may stop early)


def _sanitize_rows(R, fill_row):
    """Replace any member row containing a non-finite residual with
    ``fill_row`` (the finite-member mean): the bad member's anomaly becomes
    zero, so it stops steering the gain and its own update pulls it back
    toward the ensemble consensus instead of poisoning every matmul with
    NaNs (a diverged forward solve must degrade one member, not the round)."""
    ok = jnp.all(jnp.isfinite(R), axis=1, keepdims=True)
    return jnp.where(ok, R, fill_row[None, :]), ok[:, 0]


def eki_train(
    inversion,
    n_ensemble: int = 32,
    n_iters: int = 20,
    init_scale: float = 0.5,
    damping: float = 1.0,
    thetas=None,
    seed: int = 0,
    mesh=None,
    perturb_obs: bool = False,
    select: str = "best",
    tol: Optional[float] = None,
) -> EKIResult:
    """Run EKI on the inversion's least-squares objective; leave
    ``inversion.theta`` at the selected estimate.

    ``thetas``: optional explicit initial ensemble (leading member axis, or a
    list of θ pytrees); by default the inversion's θ is jittered with
    :func:`simulation.ensemble.init_restarts` (member 0 = θ exactly).
    ``damping``: scales the self-adaptive Kalman regularization
    γ = damping·tr(C)/J; smaller = more aggressive Gauss–Newton-like steps.
    ``perturb_obs``: add N(0, γI) observation perturbations (the stochastic
    EnKF flavor — keeps ensemble spread for a rough posterior read; off by
    default because training wants the deterministic collapse).
    ``select``: ``"best"`` (lowest-misfit member — multistart ethos) or
    ``"mean"`` (the classical EKI estimator) for the write-back.
    ``tol``: optional early stop when the relative drop of the best misfit
    over one iteration falls below it.
    ``mesh``: optional device mesh (defaults to the registered session mesh);
    when J is divisible by the mesh size the member axis is sharded.

    Every configured loss term must expose ``.residuals`` (the same contract
    as LM training); terms without one raise with a remedy.
    """
    from odinn_tpu.inverse.gauss_newton import make_residual_fn
    from odinn_tpu.simulation.ensemble import init_restarts
    from odinn_tpu.simulation.inversion import assemble_tstops

    if select not in ("best", "mean"):
        raise ValueError(f"select must be 'best' or 'mean', got {select!r}")

    params = inversion.parameters
    model = inversion.model
    batch = inversion.glaciers
    tstops = assemble_tstops(params, batch)
    resid = make_residual_fn(model, params, tstops)

    if thetas is None:
        thetas = init_restarts(inversion.theta, n_ensemble, init_scale, seed)
    elif isinstance(thetas, (list, tuple)):
        thetas = jax.tree.map(lambda *xs: jnp.stack(xs), *thetas)
    n_ensemble = int(jax.tree.leaves(thetas)[0].shape[0])
    if n_ensemble < 2:
        raise ValueError("EKI needs n_ensemble >= 2 (covariances of one "
                         "member are identically zero)")

    # flat member matrix (J, d) + unravel for the write-back
    flat0, unravel = jax.flatten_util.ravel_pytree(inversion.theta)
    Th = jax.vmap(lambda th: jax.flatten_util.ravel_pytree(th)[0])(thetas)
    d = flat0.shape[0]
    if n_ensemble <= d:
        # not an error — the subspace property just means the search happens
        # in a J−1-dimensional affine slice; say so once, loudly, at setup
        import warnings

        warnings.warn(
            f"EKI ensemble (J={n_ensemble}) does not exceed the parameter "
            f"dimension (d={d}): updates stay in the initial ensemble's "
            f"affine span. Raise n_ensemble or init_scale coverage if the "
            f"fit stalls.", stacklevel=2)

    if mesh is None:
        from odinn_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
    if mesh is not None and mesh.size > 1 and n_ensemble % mesh.size == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        Th = jax.device_put(Th, NamedSharding(mesh, P(axis)))
        batch = jax.device_put(batch, NamedSharding(mesh, P()))

    J = n_ensemble

    def member_misfit(flat, b):
        r = resid(unravel(flat), b)
        return r.ravel()

    @jax.jit
    def residuals_of(Th, b):
        R = jax.vmap(lambda v: member_misfit(v, b))(Th)      # (J, m)
        return R, jnp.sum(R * R, axis=1)

    @jax.jit
    def kalman_step(Th, R, key):
        # sanitize diverged members before any covariance touches them
        finite = jnp.all(jnp.isfinite(R), axis=1)
        n_ok = jnp.maximum(jnp.sum(finite), 1)
        fill = jnp.sum(jnp.where(finite[:, None], R, 0.0), axis=0) / n_ok
        R, _ = _sanitize_rows(R, fill)

        Ta = Th - jnp.mean(Th, axis=0, keepdims=True)        # (J, d)
        Ra = R - jnp.mean(R, axis=0, keepdims=True)          # (J, m)
        C = (Ra @ Ra.T) / J                                  # (J, J)
        gamma = damping * jnp.trace(C) / J + 1e-30
        D = -R                                               # y = 0
        if perturb_obs:
            D = D + jnp.sqrt(gamma) * jax.random.normal(key, R.shape, R.dtype)
        M = (Ra @ D.T) / J                                   # (J, J)
        S = jnp.linalg.solve(C + gamma * jnp.eye(J, dtype=R.dtype), M)
        return Th + S.T @ Ta

    keys = jax.random.split(jax.random.PRNGKey(seed + 1), n_iters)
    R, misfit = residuals_of(Th, batch)
    history = [np.asarray(misfit)]
    n_done = 0
    for k in range(n_iters):
        Th = kalman_step(Th, R, keys[k])
        R, misfit = residuals_of(Th, batch)
        history.append(np.asarray(misfit))
        n_done = k + 1
        if tol is not None and len(history) >= 2:
            prev = float(np.nanmin(history[-2]))
            cur = float(np.nanmin(history[-1]))
            if prev > 0 and (prev - cur) / prev < tol:
                break

    misfits = np.stack(history)                              # (n_done+1, J)
    final = misfits[-1]
    if not np.isfinite(final).any():
        raise FloatingPointError(
            "every EKI member's final misfit is non-finite — the forward "
            "solve is unstable at this ensemble's θ range; lower init_scale "
            "or raise solver substeps")
    best_idx = int(np.argmin(np.where(np.isfinite(final), final, np.inf)))

    Th_host = np.asarray(Th)
    best_theta = unravel(jnp.asarray(Th_host[best_idx]))
    mean_theta = unravel(jnp.asarray(Th_host.mean(axis=0)))
    _, mean_misfit = residuals_of(jnp.asarray(Th_host.mean(axis=0))[None], batch)
    mean_loss = float(np.asarray(mean_misfit)[0])

    thetas_out = jax.vmap(unravel)(jnp.asarray(Th_host))
    result = EKIResult(
        thetas=thetas_out,
        misfits=misfits,
        best_idx=best_idx,
        best_loss=float(final[best_idx]),
        best_theta=best_theta,
        mean_theta=mean_theta,
        mean_loss=mean_loss,
        n_iters=n_done,
    )
    inversion.theta = best_theta if select == "best" else mean_theta
    return result
