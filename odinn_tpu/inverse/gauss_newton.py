"""Matrix-free Gauss–Newton / Levenberg–Marquardt training.

The transient thickness loss is an exact least-squares objective,

    loss(θ) = Σ_g Σ_τ dt_τ/npix · Σ_mask (H_{g,τ}(θ) − H_ref)²  =  ‖r(θ)‖²,

so a Gauss–Newton step solves (JᵀJ + λI)δ = −Jᵀr with J = ∂r/∂θ — quadratic
local convergence where first-order methods crawl (the reference reaches its
CI accuracy gates with Optimization.jl BFGS; this trainer is the TPU-native
second-order equivalent, and reaches the same gates in O(10) iterations).

TPU-native construction: everything is matrix-free inside ONE jitted step —
Jᵀr from a `jax.vjp` pullback, (JᵀJ)v products from a `jax.jvp` through the
(checkpointed, vmapped) PDE solve followed by the same pullback, the normal
equations solved by a fixed-iteration CG `lax.scan` in θ-pytree space, and
classic LM damping adaptation under `lax.cond`. No Hessian is ever formed;
peak memory is the stored linearization of one residual evaluation.

Scope: transient ``LossH`` (``L2Sum``) terms — the workhorse configuration.
Other loss kinds raise with a remedy (use grad="jax" + Adam/LBFGS).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from odinn_tpu.core.glacier import is_in_glacier
from odinn_tpu.losses.losses import L2Sum, LossH, MultiLoss

__all__ = ["make_residual_fn", "lm_train"]


def _tree_dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _tree_axpy(alpha, x, y):
    """alpha*x + y"""
    return jax.tree.map(lambda xi, yi: alpha * xi + yi, x, y)


def make_residual_fn(model, params, tstops):
    """Flattened residual map r(θ, batch, idxs) with ‖r‖² == the transient
    LossH loss of :func:`batch_transient_loss` (weights folded in as √w)."""
    from odinn_tpu.simulation.prediction import forward_glacier

    loss_cfg = params.UDE.empirical_loss_function or MultiLoss((LossH(),), (1.0,))
    if not isinstance(loss_cfg, MultiLoss):
        loss_cfg = MultiLoss(terms=(loss_cfg,), weights=(1.0,))
    for w, term in zip(loss_cfg.weights, loss_cfg.terms):
        if not (isinstance(term, LossH) and isinstance(term.loss, L2Sum)):
            raise NotImplementedError(
                "Gauss-Newton training currently supports transient LossH(L2Sum) "
                f"objectives only (got {term!r}); use grad='jax' with Adam/LBFGS "
                "for other losses"
            )
    weights = tuple(float(w) for w in loss_cfg.weights)
    distance = loss_cfg.terms[0].loss.distance
    tstops = jnp.asarray(tstops)
    dts = jnp.diff(tstops)

    def resid_one(theta, glacier, gidx):
        traj = forward_glacier(theta, glacier, gidx, model, params, tstops)
        npix = glacier.H0.shape[-2] * glacier.H0.shape[-1]
        td = glacier.thickness_data
        t_obs = jnp.asarray(td.t)
        H_obs = jnp.asarray(td.H)

        def at(tau):
            from odinn_tpu.simulation.observations import match_time

            t = tstops[tau]
            k, valid = match_time(t_obs, t, traj.dtype)
            h_ref = H_obs[k]
            mask = is_in_glacier(h_ref, distance).astype(traj.dtype)
            w = sum(weights) * dts[tau - 1] * valid / npix
            return jnp.sqrt(w * mask) * (traj[tau] - h_ref)

        return jax.vmap(at)(jnp.arange(1, tstops.shape[0]))

    def resid(theta, batch, idxs=None):
        ii = idxs if idxs is not None else jnp.arange(batch.H0.shape[0])
        return jax.vmap(lambda g, i: resid_one(theta, g, i))(batch, ii)

    return resid


def _cg_tree(matvec, b, iters: int):
    """Fixed-iteration CG in θ-pytree space (SPD normal-equations operator)."""
    x0 = jax.tree.map(jnp.zeros_like, b)
    r0 = b
    p0 = b
    rs0 = _tree_dot(r0, r0)

    def body(carry, _):
        x, r, p, rs = carry
        Ap = matvec(p)
        denom = _tree_dot(p, Ap)
        alpha = jnp.where(denom > 0.0, rs / jnp.maximum(denom, 1e-300), 0.0)
        x = _tree_axpy(alpha, p, x)
        r = _tree_axpy(-alpha, Ap, r)
        rs_new = _tree_dot(r, r)
        beta = jnp.where(rs > 0.0, rs_new / jnp.maximum(rs, 1e-300), 0.0)
        p = _tree_axpy(beta, p, r)
        return (x, r, p, rs_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, p0, rs0), None, length=iters)
    return x


def lm_train(
    theta,
    batch,
    resid,
    iters: int = 15,
    cg_iters: int = 8,
    init_damping: float = 1e-3,
    record=None,
) -> Tuple:
    """Levenberg–Marquardt loop; returns (theta, losses).

    Each jitted step: linearize r at θ once (`jax.vjp`), build g = Jᵀr,
    CG-solve (JᵀJ + λ·diag-free I)δ = −g with (JᵀJ)v = vjp(jvp(v)), evaluate
    the candidate, and accept/reject with the classic λ ÷3 / ×10 schedule —
    all device-side; one host sync per iteration for the loss trace.

    ``init_damping`` is RELATIVE (Marquardt-style): the working λ is
    init_damping × a one-probe Hutchinson estimate of mean diag(JᵀJ), so the
    same value works across problems whose curvature differs by orders of
    magnitude (NN weights vs per-glacier scalars).
    """

    @jax.jit
    def mean_diag(theta, batch, key):
        r, pb = jax.vjp(lambda th: resid(th, batch), theta)
        leaves, tdef = jax.tree.flatten(theta)
        n = sum(l.size for l in leaves)
        ks = jax.random.split(key, len(leaves))
        v = jax.tree.unflatten(
            tdef,
            [jax.random.rademacher(k, l.shape, l.dtype) for k, l in zip(ks, leaves)],
        )
        _, jv = jax.jvp(lambda th: resid(th, batch), (theta,), (v,))
        (jtv,) = pb(jv)
        return _tree_dot(v, jtv) / n

    @jax.jit
    def step(theta, lam, batch):
        r, pb = jax.vjp(lambda th: resid(th, batch), theta)
        loss = jnp.sum(r * r)
        (g,) = pb(r)

        def gnvp(v):
            _, jv = jax.jvp(lambda th: resid(th, batch), (theta,), (v,))
            (jtv,) = pb(jv)
            return _tree_axpy(lam, v, jtv)

        neg_g = jax.tree.map(jnp.negative, g)
        delta = _cg_tree(gnvp, neg_g, cg_iters)
        cand = jax.tree.map(jnp.add, theta, delta)
        r_new = resid(cand, batch)
        loss_new = jnp.sum(r_new * r_new)
        accept = loss_new < loss
        theta_out = jax.tree.map(
            lambda c, t: jnp.where(accept, c, t), cand, theta
        )
        lam_out = jnp.where(accept, lam / 3.0, lam * 10.0)
        return theta_out, lam_out, loss, loss_new, _tree_dot(g, g) ** 0.5

    dt_ = jnp.result_type(jax.tree.leaves(theta)[0])
    md = mean_diag(theta, batch, jax.random.PRNGKey(0))
    lam = jnp.asarray(init_damping, dt_) * jnp.maximum(md, jnp.asarray(1e-30, dt_))
    losses = []
    for it in range(iters):
        theta, lam, loss, loss_new, gnorm = step(theta, lam, batch)
        losses.append(float(loss))
        if record is not None:
            record(float(loss), theta, float(gnorm))
    # trailing evaluation so the trace covers the returned θ
    r_fin = jax.jit(lambda th, b: jnp.sum(resid(th, b) ** 2))(theta, batch)
    losses.append(float(r_fin))
    if record is not None:
        record(float(r_fin), theta, 0.0)
    return theta, losses
