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

Scope: every least-squares-shaped objective — LossH/LossV/LossHV over
L2Sum/LogSum, time-aggregated LossDhdt/LossAvgV, and the Tikhonov
regularization family (each exposes ``.residuals`` with Σ‖·‖² == its loss).
Terms without a residual form raise with a remedy (use grad="jax" +
Adam/LBFGS).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["make_residual_fn", "lm_train"]


def _tree_dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _tree_axpy(alpha, x, y):
    """alpha*x + y"""
    return jax.tree.map(lambda xi, yi: alpha * xi + yi, x, y)


def make_residual_fn(model, params, tstops):
    """Flattened residual map r(θ, batch, idxs) with ‖r‖² == the full
    :func:`batch_transient_loss` objective.

    Delegates to ``simulation.inversion.glacier_residuals`` — the same
    :class:`_LossEnv` that assembles the loss assembles the residuals, so
    every least-squares-shaped term is covered: LossH/LossV/LossHV over
    L2Sum/LogSum, the time-aggregated LossDhdt/LossAvgV, and the Tikhonov
    regularization family. Non-least-squares terms raise with a remedy.
    """
    from odinn_tpu.simulation.inversion import glacier_residuals

    tstops = jnp.asarray(tstops)

    def resid(theta, batch, idxs=None):
        ii = idxs if idxs is not None else jnp.arange(batch.H0.shape[0])
        return jax.vmap(
            lambda g, i: glacier_residuals(theta, g, i, model, params, tstops)
        )(batch, ii)

    return resid


def _cg_tree(matvec, b, iters: int, minv=None, restarts: int = 1):
    """Fixed-iteration (preconditioned) CG in θ-pytree space.

    ``minv``: optional elementwise Jacobi preconditioner pytree (1/diag of
    the SPD operator). NN normal equations are ill-conditioned (κ ≳ 1e6 —
    head weights vs first-layer biases differ by orders of magnitude in
    curvature); un-preconditioned CG at 8–30 iterations stalls 2+ orders
    above the reachable loss (the r2 cg_iters=8 plateau), Jacobi removes the
    between-leaf scale disparity.

    ``restarts``: split the ``iters`` budget into this many CG rounds, each
    restarted from the EXACT residual r = b − A·x of the accumulated
    iterate. In f32, recurrence-updated residuals lose conjugacy after
    O(100) iterations (rounding walks the recurrence r away from the true
    residual), so one deep CG can *stall or regress* — measured on the
    128-glacier Fourier-feature GGN: cg=400 single-shot converges WORSE
    than cg=250. Exact-residual restarts discard the drifted Krylov state
    for one extra matvec per round, restoring monotone convergence at
    depth. restarts=1 reproduces the classic single-shot behavior.
    """
    apply_minv = (lambda r: jax.tree.map(jnp.multiply, minv, r)) if minv is not None \
        else (lambda r: r)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        denom = _tree_dot(p, Ap)
        alpha = jnp.where(denom > 0.0, rz / jnp.maximum(denom, 1e-300), 0.0)
        x = _tree_axpy(alpha, p, x)
        r = _tree_axpy(-alpha, Ap, r)
        z = apply_minv(r)
        rz_new = _tree_dot(r, z)
        beta = jnp.where(rz > 0.0, rz_new / jnp.maximum(rz, 1e-300), 0.0)
        p = _tree_axpy(beta, p, z)
        return (x, r, p, rz_new), None

    restarts = max(int(restarts), 1)
    per_round = max(iters // restarts, 1)
    x = jax.tree.map(jnp.zeros_like, b)
    for k in range(restarts):
        # exact residual of the accumulated iterate (k=0: b − A·0 = b)
        r = b if k == 0 else jax.tree.map(jnp.subtract, b, matvec(x))
        z = apply_minv(r)
        (x, _, _, _), _ = jax.lax.scan(body, (x, r, z, _tree_dot(r, z)),
                                       None, length=per_round)
    return x


def lm_train(
    theta,
    batch,
    resid,
    iters: int = 15,
    cg_iters: int = 8,
    init_damping: float = 1e-3,
    record=None,
    precond: bool = True,
    diag_probes: int = 8,
    precond_refresh: int = 5,
    cg_restarts: int = 1,
) -> Tuple:
    """Levenberg–Marquardt loop; returns (theta, losses).

    Each jitted step: linearize r at θ once (`jax.vjp`), build g = Jᵀr,
    CG-solve (JᵀJ + λ·diag(JᵀJ))δ = −g with (JᵀJ)v = vjp(jvp(v)), evaluate
    the candidate, and accept/reject with the classic λ ÷3 / ×10 schedule —
    all device-side; one host sync per iteration for the loss trace.

    ``precond``: Jacobi-precondition the CG with a PER-LEAF scalar curvature
    estimate — mean block-diagonal of JᵀJ per θ leaf from ``diag_probes``
    Rademacher probes (E[⟨v_l, (JᵀJv)_l⟩] = tr of the leaf block; averaging
    over a leaf's elements keeps the Hutchinson variance low, where a raw
    elementwise diag estimate is noise-dominated and can destroy CG),
    refreshed every ``precond_refresh`` iterations. The same estimate scales
    the Marquardt damping (λ·diag instead of λ·I), making ``init_damping``
    dimensionless across problems whose curvature differs by orders of
    magnitude (NN layer weights vs per-glacier scalars).

    ``cg_restarts``: split each step's CG budget into rounds restarted from
    the exact residual (see :func:`_cg_tree`) — required for ``cg_iters``
    beyond ~150 in float32, where single-shot CG loses conjugacy and can
    converge worse with MORE iterations.
    """

    @jax.jit
    def diag_estimate(theta, batch, key):
        """Per-leaf mean diag(JᵀJ) (Hutchinson leaf-block traces), broadcast
        back to θ shape."""
        _, pb = jax.vjp(lambda th: resid(th, batch), theta)
        leaves, tdef = jax.tree.flatten(theta)

        def one(carry, key):
            ks = jax.random.split(key, len(leaves))
            v = jax.tree.unflatten(
                tdef,
                [jax.random.rademacher(k, l.shape, l.dtype) for k, l in zip(ks, leaves)],
            )
            _, jv = jax.jvp(lambda th: resid(th, batch), (theta,), (v,))
            (jtv,) = pb(jv)
            contrib = jax.tree.map(lambda a, b: jnp.mean(a * b), v, jtv)
            return jax.tree.map(jnp.add, carry, contrib), None

        # sequential probes via scan: unrolled probes let XLA keep several
        # full JVP residual trajectories (~[G, T, nx, ny] each) live at once,
        # which OOMs HBM at 128 glaciers / 128² grids — scan bounds the
        # working set to one probe
        n = max(diag_probes, 1)
        zeros = jax.tree.map(lambda l: jnp.zeros((), l.dtype), theta)
        acc, _ = jax.lax.scan(one, zeros, jax.random.split(key, n))
        acc = jax.tree.map(lambda x: x / n, acc)
        # floor: a leaf the residual doesn't touch (zero curvature) must not
        # blow up the inverse — clamp at a fraction of the tree-wide mean
        mean = sum(jnp.asarray(l) for l in jax.tree.leaves(acc)) / len(leaves)
        floor = jnp.maximum(mean, 1e-30) * 1e-7
        return (
            jax.tree.unflatten(
                tdef,
                [jnp.full_like(l, jnp.maximum(d, floor))
                 for l, d in zip(leaves, jax.tree.leaves(acc))],
            ),
            mean,
        )

    @jax.jit
    def step(theta, lam, batch, diag):
        r, pb = jax.vjp(lambda th: resid(th, batch), theta)
        loss = jnp.sum(r * r)
        (g,) = pb(r)

        def gnvp(v):
            _, jv = jax.jvp(lambda th: resid(th, batch), (theta,), (v,))
            (jtv,) = pb(jv)
            damp = jax.tree.map(lambda d, vi: lam * d * vi, diag, v)
            return jax.tree.map(jnp.add, jtv, damp)

        minv = jax.tree.map(lambda d: 1.0 / (d * (1.0 + lam)), diag)
        neg_g = jax.tree.map(jnp.negative, g)
        delta = _cg_tree(gnvp, neg_g, cg_iters, minv=minv,
                         restarts=cg_restarts)
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
    key = jax.random.PRNGKey(0)
    diag, md = diag_estimate(theta, batch, key)
    if not precond:
        # legacy behavior: scalar damping λ·mean-diag·I, identity preconditioner
        diag = jax.tree.map(lambda l: jnp.full_like(l, md), theta)
    lam = jnp.asarray(init_damping, dt_)
    losses = []
    for it in range(iters):
        if precond and it > 0 and it % max(precond_refresh, 1) == 0:
            key, sub = jax.random.split(key)
            diag, _ = diag_estimate(theta, batch, sub)
        theta, lam, loss, loss_new, gnorm = step(theta, lam, batch, diag)
        losses.append(float(loss))
        if record is not None:
            record(float(loss), theta, float(gnorm))
    # trailing evaluation so the trace covers the returned θ
    r_fin = jax.jit(lambda th, b: jnp.sum(resid(th, b) ** 2))(theta, batch)
    losses.append(float(r_fin))
    if record is not None:
        record(float(r_fin), theta, 0.0)
    return theta, losses
