"""Vmapped multi-start (ensemble) training — beyond-parity capability.

Nonconvex UDE inversions are sensitive to the NN initialization: the
reference trains a single Glorot draw per run (NeuralNetwork.jl:58-61) and
leans on pretraining when it lands badly (NN_utils.jl:37-139). On TPU the
restart axis is just one more vmap axis: N complete Adam optimizations run
as ONE jitted scan over epochs, vmapped over restarts — the MXU/VPU see a
batch of N·G glacier solves per step, and when a device mesh is registered
the restart axis shards across it, so N restarts cost roughly the
wall-clock of one.

Usage::

    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    ms = multistart_train(inv, n_restarts=8)      # explores; sets inv.theta
    run_inversion(inv)                            # refines the best start

``multistart_train`` runs the hyperparameters' leading Adam stages on every
restart. Trailing curvature stages (LBFGS/LM) either belong in a follow-up
``run_inversion`` on the single winner, or — with ``refine_top_k=k`` — run
on the best k surviving restarts (LBFGS vmapped as one program; LM looped,
its trust-region control flow is host-side), with the final winner selected
after refinement. Running curvature on ALL N starts would multiply their
cost for starts that are about to be discarded; top-k is the middle ground
when the Adam ranking is noisy.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["MultistartResult", "init_restarts", "multistart_train", "select_best"]


def select_best(final_losses: np.ndarray) -> int:
    """Index of the best restart, nan-safe: a diverged restart (non-finite
    final loss) must never win (plain ``np.argmin`` returns the first NaN
    index). Raises if every restart diverged."""
    final = np.asarray(final_losses, np.float64)
    if not np.isfinite(final).any():
        raise FloatingPointError(
            "every restart diverged to a non-finite loss — lower the Adam "
            "learning rate or init_scale"
        )
    return int(np.argmin(np.where(np.isfinite(final), final, np.inf)))


@dataclass
class MultistartResult:
    """All restarts' trajectories plus the selected winner."""

    thetas: Any                 # θ pytree with leading restart axis (final iterates)
    losses: np.ndarray          # (n_restarts, total_epochs) per-step losses
    final_losses: np.ndarray    # (n_restarts,) loss at the final iterate
    best_idx: int
    best_loss: float
    best_theta: Any             # winner's θ (no restart axis)
    refined_idxs: Any = None    # (k,) original restart indices that entered
                                # curvature refinement (refine_top_k)
    refined_losses: Any = None  # (k,) their post-refinement losses


def init_restarts(theta0, n_restarts: int, init_scale: float = 0.5, seed: int = 0):
    """Stack of ``n_restarts`` initializations with a leading restart axis.

    Restart 0 is ``theta0`` exactly (multistart can never do worse than the
    single start it replaces); restarts k>0 perturb every leaf with Gaussian
    noise of std ``init_scale × leaf_scale``, where leaf_scale is the leaf's
    own std (the natural per-layer scale of a Glorot-initialized NN) or 1.0
    for constant leaves (zero-initialized biases and raw classical-inversion
    parameters, where θ is already in tanh-bounded raw space).
    """
    leaves, tdef = jax.tree.flatten(theta0)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    out = []
    for leaf, key in zip(leaves, keys):
        s = jnp.std(leaf)
        s = jnp.where(s > 0, s, jnp.asarray(1.0, leaf.dtype))
        noise = init_scale * s * jax.random.normal(
            key, (n_restarts,) + leaf.shape, leaf.dtype)
        noise = noise.at[0].set(0.0)
        out.append(leaf[None] + noise)
    return jax.tree.unflatten(tdef, out)


def multistart_train(
    inversion,
    n_restarts: int = 8,
    init_scale: float = 0.5,
    thetas=None,
    seed: int = 0,
    mesh=None,
    refine_top_k: Optional[int] = None,
) -> MultistartResult:
    """Train every restart through the hyperparameters' leading Adam stages
    in one vmapped program; leave ``inversion.theta`` at the best final
    iterate.

    ``thetas``: optional explicit θ stack (leading restart axis) or list of
    θ pytrees — e.g. built from ``NeuralNetwork(arch, seed=k)`` draws; by
    default :func:`init_restarts` jitters the inversion's own θ.
    ``mesh``: optional device mesh (defaults to the one registered by
    ``api.enable_multiprocessing``); when ``n_restarts`` is divisible by the
    mesh size the restart axis is sharded across devices — embarrassingly
    parallel, no collectives in the hot loop.
    ``refine_top_k``: with trailing curvature stages (LBFGS/LM) configured,
    carry the best k post-Adam restarts through them — LBFGS as one vmapped
    program over the k survivors, LM per survivor (its trust-region accept
    loop is host-side) — and select the winner AFTER refinement.
    """
    from odinn_tpu.simulation.inversion import (
        Inversion,
        _make_grad_fn,
        _stages,
        assemble_tstops,
        batch_transient_loss,
    )

    params = inversion.parameters
    model = inversion.model
    batch = inversion.glaciers
    tstops = assemble_tstops(params, batch)

    all_stages = _stages(params.hyper)
    n_adam = 0
    while n_adam < len(all_stages) and all_stages[n_adam][0] == "adam":
        n_adam += 1
    stages = all_stages[:n_adam]
    refine_stages = all_stages[n_adam:]
    for opt_name, _, _ in refine_stages:
        if opt_name in ("adam", "adamw"):
            raise ValueError(
                "multistart_train needs the Adam (exploration) stages FIRST; "
                f"found {opt_name!r} after a curvature stage"
            )
        if opt_name not in ("lbfgs", "bfgs", "lm", "gn", "gauss_newton",
                            "gauss-newton"):
            raise ValueError(f"unknown refinement stage {opt_name!r}")
    if refine_stages and not refine_top_k:
        # refine_top_k=0 would otherwise silently drop the configured
        # curvature stages at the truthiness check below
        raise ValueError(
            "multistart_train explores with Adam stages only (got "
            f"{refine_stages[0][0]!r}); either pass refine_top_k >= 1 to run "
            "the curvature stages on the best k restarts, or run them on the "
            "winner via run_inversion(inversion) afterwards — it warm-starts "
            "at the best θ this function selects"
        )

    if thetas is None:
        thetas = init_restarts(inversion.theta, n_restarts, init_scale, seed)
    elif isinstance(thetas, (list, tuple)):
        thetas = jax.tree.map(lambda *xs: jnp.stack(xs), *thetas)
        n_restarts = jax.tree.leaves(thetas)[0].shape[0]
    else:
        n_restarts = jax.tree.leaves(thetas)[0].shape[0]

    def loss_fn_b(theta, b, ids=None):
        return batch_transient_loss(theta, b, model, params, tstops, ids)

    vg = _make_grad_fn(inversion, loss_fn_b)

    if mesh is None:
        from odinn_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
    if mesh is not None and mesh.size > 1 and n_restarts % mesh.size == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = mesh.axis_names[0]
        thetas = jax.device_put(
            thetas, NamedSharding(mesh, P(axis)))
        batch = jax.device_put(batch, NamedSharding(mesh, P()))

    loss_curves = []
    for _, lr, epochs in stages:
        opt = optax.adam(lr)
        states = jax.vmap(opt.init)(thetas)

        @jax.jit
        def stage(thetas, states, b, n=int(epochs), opt=opt):
            def one(theta, state):
                def step(carry, _):
                    th, st = carry
                    val, grads = vg(th, b)
                    updates, st = opt.update(grads, st, th)
                    return (optax.apply_updates(th, updates), st), val

                (th, st), vals = jax.lax.scan(step, (theta, state), None, length=n)
                return th, st, vals

            return jax.vmap(one)(thetas, states)

        thetas, states, vals = stage(thetas, states, batch)
        loss_curves.append(vals)

    final = jax.jit(jax.vmap(lambda th, b: loss_fn_b(th, b), in_axes=(0, None)))(
        thetas, batch)
    # ONE bulk host transfer at the end (per-step syncs over a tunneled
    # backend would dominate the wall-clock — see train_ude's rationale)
    losses, final = jax.device_get(
        (jnp.concatenate(loss_curves, axis=1), final))
    losses = np.asarray(losses, np.float64)
    final = np.asarray(final, np.float64)
    best = select_best(final)

    refined_idxs = refined_final = None
    if refine_stages and refine_top_k:
        k = min(int(refine_top_k), n_restarts)
        order = np.argsort(np.where(np.isfinite(final), final, np.inf))
        refined_idxs = order[:k]
        top = jax.tree.map(lambda x: x[jnp.asarray(refined_idxs)], thetas)
        top = _refine(top, batch, refine_stages, inversion, loss_fn_b, vg,
                      model, params, tstops)
        refined_final = np.asarray(jax.device_get(jax.jit(jax.vmap(
            lambda th, b: loss_fn_b(th, b), in_axes=(0, None)))(top, batch)),
            np.float64)
        j = select_best(refined_final)
        # refinement is warm-started from the Adam iterate but LBFGS's last
        # step is not guaranteed downhill — fall back to the unrefined winner
        # if every refined survivor ended worse
        if refined_final[j] <= final[best]:
            best_theta = jax.tree.map(lambda x: x[j], top)
            best = int(refined_idxs[j])
            best_loss = float(refined_final[j])
        else:
            best_theta = jax.tree.map(lambda x: x[best], thetas)
            best_loss = float(final[best])
    else:
        best_theta = jax.tree.map(lambda x: x[best], thetas)
        best_loss = float(final[best])

    inversion.theta = best_theta
    return MultistartResult(
        thetas=thetas,
        losses=losses,
        final_losses=final,
        best_idx=best,
        best_loss=best_loss,
        best_theta=best_theta,
        refined_idxs=refined_idxs,
        refined_losses=refined_final,
    )


def _refine(top, batch, refine_stages, inversion, loss_fn_b, vg, model,
            params, tstops):
    """Run trailing curvature stages on the top-k restart stack.

    LBFGS: ONE vmapped program (k optimizations in lockstep — the restart
    axis stays a batch axis on the VPU/MXU). LM: per-survivor ``lm_train``
    calls (its damping accept/reject loop is host-side by design).
    """
    import jax
    from jax import lax

    k = jax.tree.leaves(top)[0].shape[0]
    for opt_name, lr, epochs in refine_stages:
        if opt_name in ("lbfgs", "bfgs"):
            ls_name = params.hyper.lbfgs_linesearch
            if ls_name == "auto":
                dt_ = jnp.result_type(jax.tree.leaves(top)[0])
                ls_name = "zoom" if dt_ == jnp.float64 else "backtracking"
            if ls_name == "zoom":
                ls = optax.scale_by_zoom_linesearch(max_linesearch_steps=20)
            else:
                ls = optax.scale_by_backtracking_linesearch(
                    max_backtracking_steps=30, store_grad=True)
            opt = optax.lbfgs(linesearch=ls)

            @jax.jit
            def stage(thetas, b, n=int(epochs), opt=opt):
                def one(theta):
                    state = opt.init(theta)

                    def step(carry, _):
                        th, st = carry
                        val, grads = vg(th, b)
                        updates, st = opt.update(
                            grads, st, th, value=val, grad=grads,
                            value_fn=lambda t: loss_fn_b(t, b))
                        return (optax.apply_updates(th, updates), st), val

                    (th, _), vals = lax.scan(step, (theta, state), None, length=n)
                    return th, vals

                return jax.vmap(one)(thetas)

            top, _ = stage(top, batch)
        else:  # lm / gn
            from odinn_tpu.inverse.gauss_newton import lm_train, make_residual_fn

            resid = make_residual_fn(model, params, tstops)
            outs = []
            for j in range(k):
                th_j = jax.tree.map(lambda x: x[j], top)
                th_j, _ = lm_train(th_j, batch, resid, iters=int(epochs),
                                   cg_iters=params.hyper.gn_cg_iters,
                                   init_damping=lr,
                                   precond=params.hyper.gn_precond,
                                   cg_restarts=params.hyper.gn_cg_restarts)
                outs.append(th_j)
            top = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    return top
