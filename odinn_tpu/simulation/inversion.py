"""Inversion: UDE training through the PDE solve.

TPU-native rebuild of the reference's training layer:
- ``Inversion <: Simulation`` (/root/reference/src/simulations/inversions/Inversion.jl:16-62)
- ``run!(::Inversion)`` staged-optimizer loop (inversion_utils.jl:21-88)
- ``train_UDE!`` (inversion_utils.jl:112-238)
- forward-loss pipeline ``loss_iceflow_transient`` →
  ``batch_loss_iceflow_transient`` (inversion_utils.jl:270-610)

Design: the entire per-iteration computation — vmapped multi-glacier PDE
solve, transient loss, reverse-mode gradient — is ONE jit-compiled function.
Per-glacier batching, worker processes, and `pmap` reductions
(ML_utils.jl:81-231) collapse into a single `vmap` + tree-sum; mesh sharding
of the glacier axis happens outside via `shard_map`
(odinn_tpu.parallel.mesh), with θ-gradients psum-reduced over ICI.

Gradient path selection (params.UDE.grad, /root/reference/src/parameters/
UDEparameters.jl:14-80): "jax" (AD through the checkpointed solve — the
default correctness oracle), "discrete"/"continuous" (hand-written adjoints,
odinn_tpu.inverse), "dummy" (pipeline testing, DummyAdjoint equivalent).
"""

from __future__ import annotations

import time
import dataclasses
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from odinn_tpu.core.glacier import Glacier, loss_normalization, stack_glaciers
from odinn_tpu.losses.losses import LossContext, LossH, MultiLoss, loss_uses_velocity, term_kind
from odinn_tpu.models.model import Model, init_theta, make_values_fn, resolve_outer_values
from odinn_tpu.physics.sia2d import v_from_h
from odinn_tpu.simulation.prediction import forward_glacier
from odinn_tpu.simulation.results import Results, TrainingStats
from odinn_tpu.simulation.solver import build_tstops

__all__ = ["Inversion", "glacier_transient_loss", "batch_transient_loss", "train_ude", "run_inversion"]


def _default_loss():
    return MultiLoss(terms=(LossH(),), weights=(1.0,))


def assemble_tstops(params, batch):
    """Union of the solver save grid with every observation timestamp
    (the reference's tstop assembly: solver step ∪ user tstops ∪ data
    timestamps ∪ discrete/aggregated loss steps, inversion_utils.jl:487-495
    + discretePostIntegralLossSteps).

    Observations that fall between solver saves get exact save points, so
    transient losses never interpolate. Static (numpy) — runs at setup time.
    """
    extra = []
    if params.solver.tstops is not None:
        extra.extend(np.asarray(params.solver.tstops, float).ravel().tolist())
    td = batch.thickness_data
    if td is not None and td.t is not None:
        extra.extend(np.unique(np.asarray(td.t, float)).tolist())
    vd = batch.velocity_data
    if vd is not None and vd.t is not None:
        extra.extend(np.unique(np.asarray(vd.t, float)).tolist())
    dd = batch.dhdt_data
    if dd is not None:
        extra.extend(np.unique(np.asarray(dd.t1, float)).tolist())
        extra.extend(np.unique(np.asarray(dd.t2, float)).tolist())
    return build_tstops(params.simulation.tspan, params.solver.step,
                        extra=extra if extra else None)


class _LossEnv:
    """Shared per-glacier loss/residual environment: partitioned terms, ctx
    factory, and the τ-level observation lookup — built once and used by both
    :func:`glacier_transient_loss` and :func:`glacier_residuals` so the loss
    and its Gauss–Newton residual form cannot drift apart."""

    def __init__(self, theta, glacier, glacier_idx, model, params, tstops):
        loss_cfg = params.UDE.empirical_loss_function or _default_loss()
        if not isinstance(loss_cfg, MultiLoss):
            loss_cfg = MultiLoss(terms=(loss_cfg,), weights=(1.0,))
        self.loss_cfg = loss_cfg
        self.tstops = tstops
        self.dts = jnp.diff(tstops)
        self.normalization = loss_normalization(glacier)
        self.glacier = glacier
        self.theta = theta
        self.glacier_idx = glacier_idx
        self.model = model
        t0 = tstops[0]
        outer = resolve_outer_values(model, theta, glacier, glacier_idx, t0)
        vfn = make_values_fn(model, theta, glacier, glacier_idx, t0, outer)

        def velocity_fn(H, t):
            return v_from_h(H, glacier.B, glacier.dx, glacier.dy, vfn,
                            model.target, params.physical)

        self.velocity_fn = velocity_fn
        self.t0 = t0
        pairs = list(zip(loss_cfg.weights, loss_cfg.terms))
        self.transient = [(w, t_) for w, t_ in pairs if term_kind(t_) == "transient"]
        self.initial = [(w, t_) for w, t_ in pairs if term_kind(t_) == "initial"]
        self.aggregate = [(w, t_) for w, t_ in pairs if term_kind(t_) == "aggregate"]

    def make_ctx(self, H_ref=None, V_ref=None, Vx_ref=None, Vy_ref=None):
        g = self.glacier
        return LossContext(
            H_ref=H_ref, V_ref=V_ref, Vx_ref=Vx_ref, Vy_ref=Vy_ref,
            velocity_fn=self.velocity_fn,
            normalization=self.normalization,
            theta=self.theta,
            glacier_idx=self.glacier_idx,
            glacier=g,
            dx=g.dx,
            dy=g.dy,
        )

    def obs_at(self, tau, dtype):
        """Time-matched references + per-term validity gates at save index τ
        (the reference's per-tstop data lookup with isnothing skips,
        Losses.jl:262-267) — tstops may be a superset of the data grid."""
        from odinn_tpu.simulation.observations import thickness_at, velocity_at

        t = self.tstops[tau]
        h_ref, h_valid = thickness_at(self.glacier.thickness_data, t, dtype)
        v_ref, vx_ref, vy_ref, v_valid = velocity_at(self.glacier.velocity_data, t, dtype)
        ctx = self.make_ctx(H_ref=h_ref, V_ref=v_ref, Vx_ref=vx_ref, Vy_ref=vy_ref)
        return t, ctx, h_valid, v_valid

    @staticmethod
    def term_valid(term, h_valid, v_valid):
        """Validity gates: thickness terms need a matching H obs at this
        tstop, velocity terms a matching V obs; others both."""
        from odinn_tpu.losses.losses import LossH as _LH, LossV as _LV

        if isinstance(term, _LH):
            return h_valid
        if isinstance(term, _LV):
            return v_valid
        return h_valid * v_valid

    def initial_H(self):
        """Initial-state terms see the filtered trainable H₀ (or the data H₀)."""
        model, theta = self.model, self.theta
        if model.initial_condition is not None and theta is not None and "IC" in theta:
            return model.initial_condition.evaluate_H0(theta, self.glacier_idx)
        return self.glacier.H0


def glacier_transient_loss(theta, glacier, glacier_idx, model, params, tstops):
    """Transient loss for one glacier: Σ_τ Δt_τ · ℓ(H(t_τ), refs(t_τ)).

    Mirrors ``batch_loss_iceflow_transient``
    (/root/reference/src/simulations/inversions/inversion_utils.jl:383-460):
    solve, then accumulate the per-tstop empirical loss weighted by the step
    length, with normalization = number of grid cells.
    """
    traj = forward_glacier(theta, glacier, glacier_idx, model, params, tstops)
    env = _LossEnv(theta, glacier, glacier_idx, model, params, tstops)

    total = jnp.asarray(0.0, traj.dtype)

    if env.transient:

        def step_loss(tau):
            t, ctx, h_valid, v_valid = env.obs_at(tau, traj.dtype)
            acc = jnp.asarray(0.0, traj.dtype)
            for w, term in env.transient:
                valid = env.term_valid(term, h_valid, v_valid)
                acc = acc + w * valid * term(ctx, traj[tau], t)
            return acc

        taus = jnp.arange(1, tstops.shape[0])
        per_t = jax.vmap(step_loss)(taus)
        total = total + jnp.sum(per_t * env.dts)

    if env.initial:
        ctx0 = env.make_ctx()
        h_init = env.initial_H()
        for w, term in env.initial:
            total = total + w * term(ctx0, h_init, env.t0)

    if env.aggregate:
        ctx_a = env.make_ctx()
        for w, term in env.aggregate:
            total = total + w * term(ctx_a, traj, tstops)

    return total, traj


def glacier_residuals(theta, glacier, glacier_idx, model, params, tstops):
    """Flattened least-squares residual vector r with ‖r‖² ==
    ``glacier_transient_loss(...)`` — the Gauss–Newton trainer's objective
    form (inverse.gauss_newton).

    Every configured loss term must expose ``.residuals`` (LossH/LossV/LossHV
    over L2Sum/LogSum, LossDhdt/LossAvgV, the Tikhonov regularization
    family); terms without one raise with a remedy. Transient blocks carry
    the √(w·Δt_τ·valid) factor, initial/aggregate blocks √w — matching the
    loss weighting exactly because both come from the same :class:`_LossEnv`.
    """
    traj = forward_glacier(theta, glacier, glacier_idx, model, params, tstops)
    env = _LossEnv(theta, glacier, glacier_idx, model, params, tstops)

    def _check(term):
        if not hasattr(term, "residuals"):
            raise NotImplementedError(
                f"Gauss-Newton training needs a least-squares residual form for "
                f"{term!r} (no .residuals method); use grad='jax' with "
                f"Adam/LBFGS for this loss"
            )

    pieces = []

    if env.transient:
        for _, term in env.transient:
            _check(term)

        def step_resid(tau):
            t, ctx, h_valid, v_valid = env.obs_at(tau, traj.dtype)
            blocks = []
            for w, term in env.transient:
                valid = env.term_valid(term, h_valid, v_valid)
                c = jnp.sqrt(w * env.dts[tau - 1] * valid)
                blocks.extend(c * r for r in term.residuals(ctx, traj[tau], t))
            return tuple(blocks)

        taus = jnp.arange(1, tstops.shape[0])
        per_t = jax.vmap(step_resid)(taus)
        pieces.extend(b.ravel() for b in per_t)

    if env.initial:
        ctx0 = env.make_ctx()
        h_init = env.initial_H()
        for w, term in env.initial:
            _check(term)
            pieces.extend(
                (jnp.sqrt(jnp.asarray(w, traj.dtype)) * r).ravel()
                for r in term.residuals(ctx0, h_init, env.t0)
            )

    if env.aggregate:
        ctx_a = env.make_ctx()
        for w, term in env.aggregate:
            _check(term)
            pieces.extend(
                (jnp.sqrt(jnp.asarray(w, traj.dtype)) * r).ravel()
                for r in term.residuals(ctx_a, traj, tstops)
            )

    return jnp.concatenate(pieces) if pieces else jnp.zeros((0,), traj.dtype)


def batch_transient_loss(theta, batch, model, params, tstops, glacier_ids=None):
    """Sum of transient losses over the stacked glacier batch (the reference's
    pmap-then-sum, inversion_utils.jl:287-296, as one vmap + reduce).

    ``glacier_ids`` carries the original glacier indices when ``batch`` is a
    gathered minibatch, so per-glacier θ entries resolve correctly.
    """
    idxs = glacier_ids if glacier_ids is not None else jnp.arange(batch.H0.shape[0])
    losses, _ = jax.vmap(
        lambda g, i: glacier_transient_loss(theta, g, i, model, params, tstops)
    )(batch, idxs)
    return jnp.sum(losses)


def gather_batch(batch, idx):
    """Select glaciers ``idx`` from a stacked batch (MLUtils.DataLoader
    minibatching equivalent, ML_utils.jl:190-200) — a pytree gather along the
    leading axis."""
    n_g = batch.H0.shape[0]
    return jax.tree.map(
        lambda x: x[idx]
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_g
        else x,
        batch,
    )


@dataclass
class Inversion:
    """Functional/classical inversion simulation (ODINN.Inversion equivalent,
    /root/reference/src/simulations/inversions/Inversion.jl:16-62)."""

    model: Model
    glaciers: Any
    parameters: Any
    results: Optional[Results] = None
    theta: Any = None

    def __post_init__(self):
        if isinstance(self.glaciers, (list, tuple)):
            self.glaciers = stack_glaciers(list(self.glaciers))
        if self.theta is None:
            dtype = jnp.float64 if self.parameters.simulation.float_dtype == "float64" else jnp.float32
            self.theta = init_theta(self.model, self.glaciers, dtype)


def _stages(hyper) -> Sequence[Tuple[str, float, int]]:
    """Normalize (optimizer, lr, epochs) stages — the staged ADAM→BFGS
    training of inversion_utils.jl:37-59."""
    opts = hyper.optimizer if isinstance(hyper.optimizer, (tuple, list)) else (hyper.optimizer,)
    eps = hyper.epochs if isinstance(hyper.epochs, (tuple, list)) else (hyper.epochs,)
    lrs = hyper.learning_rate if isinstance(hyper.learning_rate, (tuple, list)) else (
        hyper.learning_rate,
    ) * len(opts)
    if len(eps) != len(opts):
        raise ValueError("hyper.epochs and hyper.optimizer stage counts differ")
    return list(zip(opts, lrs, eps))


def resolve_accum_chunks(cfg, n: int) -> int:
    """Resolve hyper.grad_accum_chunks for a batch of ``n`` glaciers.

    ``"auto"`` picks the largest chunk count that keeps chunks at >= 64
    glaciers (the measured single-chip sweet spot — chunking helps even when
    the trajectory fits HBM: at 256 glaciers/128^2 accum 1/2/4 measured
    1298/1838/1943 g/s on TPU v5e; see benchmarks/scaling_curve.py). Batches
    under 128 stay unchunked unless 64 divides them exactly.
    """
    if cfg == "auto":
        best = 1
        for k in range(2, n // 64 + 1):
            if n % k == 0 and n // k >= 64:
                best = k
        return best
    return int(cfg or 1)


def _make_grad_fn(inversion: Inversion, loss_fn_b):
    """Gradient path dispatch on params.UDE.grad (AdjointTypes equivalent).

    Every path returns ``vg(theta, b, ids=None) -> (loss, grads)`` with the
    glacier (mini)batch ``b`` as an explicit argument — so it rides through
    jit boundaries instead of becoming a closure-baked constant — and ``ids``
    carrying original glacier indices under minibatching.
    """
    grad_cfg = inversion.parameters.UDE.grad
    name = grad_cfg if isinstance(grad_cfg, str) else getattr(grad_cfg, "name", "jax")
    if name in ("jax", "sciml"):
        k_cfg = getattr(inversion.parameters.hyper, "grad_accum_chunks", 1) or 1
        if k_cfg != "auto" and int(k_cfg) <= 1:
            def vg(theta, b, ids=None):
                return jax.value_and_grad(loss_fn_b)(theta, b, ids)

            return vg

        def vg(theta, b, ids=None):
            # sequential chunked accumulation (hyper.grad_accum_chunks): a
            # lax.scan over k glacier chunks bounds the live reverse-mode
            # trajectory to one chunk's — exact full-batch loss/grad at 1/k
            # the memory (beats per-interval remat: nothing is recomputed)
            n = b.H0.shape[0]
            k = resolve_accum_chunks(k_cfg, n)
            if k <= 1:
                return jax.value_and_grad(loss_fn_b)(theta, b, ids)
            if n % k != 0:
                raise ValueError(
                    f"grad_accum_chunks={k} must divide the batch of {n} glaciers")
            idxs = ids if ids is not None else jnp.arange(n)

            def chunked(x):
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n:
                    return x.reshape((k, n // k) + x.shape[1:])
                return x

            cb = jax.tree.map(chunked, b)
            ci = idxs.reshape(k, n // k)

            def body(acc, chunk):
                bc, ic = chunk
                v, g = jax.value_and_grad(loss_fn_b)(theta, bc, ic)
                return (acc[0] + v, jax.tree.map(jnp.add, acc[1], g)), None

            init = (jnp.zeros((), b.H0.dtype), jax.tree.map(jnp.zeros_like, theta))
            (val, grads), _ = jax.lax.scan(body, init, (cb, ci))
            return val, grads

        return vg
    if name == "forward":
        # Forward-mode (tangent) gradients — beyond-parity path for classical
        # per-glacier inversions. Each glacier's loss depends ONLY on its own
        # θ slice (per-glacier laws route by glacier_idx), so ONE jvp per θ
        # leaf — tangent 1 on every glacier simultaneously, read off the
        # per-glacier loss vector's tangents — recovers the exact gradient.
        # No reverse pass, no trajectory storage: O(1) memory in the time
        # horizon (a century-scale solve differentiates in the forward
        # solve's own footprint, where reverse-mode needs the saved
        # trajectory or rematerialization).
        model = inversion.model
        params = inversion.parameters
        tstops = assemble_tstops(params, inversion.glaciers)

        def vg(theta, b, ids=None):
            n = b.H0.shape[0]
            idxs = ids if ids is not None else jnp.arange(n)
            leaves, tdef = jax.tree.flatten(theta)
            for x in leaves:
                if x.ndim != 1:
                    raise ValueError(
                        "grad='forward' requires per-glacier SCALAR θ leaves "
                        f"of shape (n_glaciers,), got {x.shape}: it reads the "
                        "gradient off per-glacier loss tangents, which only "
                        "resolves one component per glacier per leaf. Use "
                        "classical inversion laws (LawA_inversion/"
                        "LawC_inversion/LawN_inversion); gridded or NN θ "
                        "needs a reverse-mode path (grad='jax'/'discrete'/"
                        "'continuous')."
                    )

            def losses_of(th):
                ls, _ = jax.vmap(
                    lambda g, i: glacier_transient_loss(th, g, i, model, params, tstops)
                )(b, idxs)
                return ls

            val = None
            grads = []
            for l in range(len(leaves)):
                tangent = jax.tree.unflatten(tdef, [
                    jnp.ones_like(x) if i == l else jnp.zeros_like(x)
                    for i, x in enumerate(leaves)])
                primal, jv = jax.jvp(losses_of, (theta,), (tangent,))
                if val is None:
                    val = jnp.sum(primal)
                # batch row g contributes at θ index idxs[g]; duplicates add
                grads.append(jnp.zeros_like(leaves[l]).at[idxs].add(jv))
            return val, jax.tree.unflatten(tdef, grads)

        return vg
    if name == "dummy":
        # DummyAdjoint (/root/reference/src/inverse/AdjointTypes.jl:80-107):
        # pipeline testing with a random (or user-supplied) gradient.
        def vg(theta, b, ids=None):
            val = loss_fn_b(theta, b, ids)
            leaves, treedef = jax.tree.flatten(theta)
            key = jax.random.PRNGKey(0)
            keys = jax.random.split(key, len(leaves))
            grads = [jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
            return val, jax.tree.unflatten(treedef, grads)

        return vg
    if name in ("discrete", "continuous"):
        from odinn_tpu.inverse.gradient import make_adjoint_value_and_grad

        return make_adjoint_value_and_grad(inversion, flavor=name)
    raise ValueError(f"unknown adjoint method {name!r}")


def train_ude(
    inversion: Inversion,
    callback: Optional[Callable] = None,
    record_theta_hist: bool = False,
    mesh=None,
) -> Results:
    """Staged training loop (``train_UDE!`` equivalent).

    Adam stages use plain optax; LBFGS uses optax.lbfgs with zoom linesearch
    (the reference's Optimization.jl BFGS/LBFGS with backtracking,
    inversion_utils.jl:112-238). θ warm-starts across stages.
    ``record_theta_hist`` keeps θ per iteration (TrainingStats.θ_hist,
    Results.jl:19-68) — off by default to bound host memory.

    Scale-out: pass ``mesh`` (or call ``api.enable_multiprocessing`` first to
    register one) and the glacier batch is sharded along the mesh's glacier
    axis, θ replicated (per-glacier θ entries sharded), and every jitted step
    runs SPMD with XLA inserting the psum over ICI for the shared-θ gradient —
    the reference's automatic Distributed scale-out
    (/root/reference/src/setup/config.jl:97-139), mesh-native.
    """
    params = inversion.parameters
    model = inversion.model
    batch = inversion.glaciers
    tstops = assemble_tstops(params, batch)
    theta = inversion.theta
    if params.solver.adaptive == "replay":
        # record-and-replay: the accepted dt sequence of one error-controlled
        # forward becomes a fixed differentiable schedule (prediction.py
        # resolve_replay) — the reference's gradient-through-adaptive-solve
        # contract (UDEparameters.jl:14-80) under grad="jax"/"forward"
        grad_cfg = params.UDE.grad
        grad_kind = grad_cfg if isinstance(grad_cfg, str) else getattr(grad_cfg, "name", "jax")
        if grad_kind not in ("jax", "sciml", "forward", "dummy"):
            raise ValueError(
                f"solver.adaptive='replay' replays the BS3(2) stepper, which "
                f"the manual adjoints do not transpose — use grad='jax' (or "
                f"'forward'), got grad={grad_kind!r}"
            )
        from odinn_tpu.simulation.prediction import resolve_replay

        params = resolve_replay(params, batch, model, theta, tstops)
        inversion.parameters = params
    elif params.solver.adaptive:
        raise ValueError(
            "solver.adaptive error-controlled integration is forward-only "
            "(lax.while_loop has no reverse-mode rule) — it serves "
            "Prediction/generate_ground_truth. For training, either set "
            "adaptive='replay' (record the accepted dt schedule once, replay "
            "it as a fixed differentiable schedule), set fixed "
            "solver.substeps/rkc_stages/cg_iters, or set substeps='auto' to "
            "calibrate fixed substeps from solver.reltol via probe solves "
            "(with adaptive=False)."
        )
    substeps_auto = params.solver.substeps == "auto"
    if substeps_auto:
        from odinn_tpu.simulation.prediction import resolve_substeps

        params = resolve_substeps(params, batch, model, theta, tstops)
        # the adjoint drivers and create_results read inversion.parameters
        inversion.parameters = params
    # probe-staleness guard: the 'auto' calibration probes at the INITIAL θ;
    # if the optimizer drives creep/diffusivity up, an explicit-solver sizing
    # can silently leave its stability region mid-training. Re-probe at every
    # stage boundary and bump substeps (re-jitting the steps) when the current
    # θ needs more. SI/SI2 are exempt: unconditionally stable, their sizing is
    # an accuracy budget, not a stability bound.
    substeps_guard = substeps_auto and params.solver.solver not in ("SI", "SI2")
    # replay mode holds its recorded dt schedule fixed for gradient
    # consistency, so it shares the same staleness hazard: if the optimizer
    # outgrows the schedule's stability region mid-stage, the recovery path
    # below re-records the schedule at the best finite iterate instead of
    # bumping substeps
    replay_mode = params.solver.adaptive == "replay"
    orig_batch = batch
    n_results = batch.H0.shape[0]

    from odinn_tpu.parallel.mesh import active_mesh, shard_inversion

    if mesh is None:
        mesh = active_mesh()
    use_mesh = mesh is not None and mesh.size > 1
    if use_mesh:
        theta, batch, n_results = shard_inversion(theta, batch, mesh)

    # the (mini)batch is an explicit argument everywhere: closed-over device
    # arrays become baked constants, which remote-execution backends may
    # re-ship per call — pass large pytrees through the jit boundary instead
    def loss_fn_b(theta, b, ids=None):
        return batch_transient_loss(theta, b, model, params, tstops, ids)

    stats = TrainingStats()
    stats._record_theta_hist = record_theta_hist
    stats.substeps_bumps = []   # (niter, old, new) per staleness-guard bump
    vg = _make_grad_fn(inversion, loss_fn_b)

    # Best-iterate tracking (full-batch only: minibatch losses are stochastic
    # estimates). The reference's Optimization.jl returns the MINIMIZER, not
    # the last iterate — late-stage oscillation must not corrupt the result.
    # Tracked ON DEVICE inside the jitted step (one extra θ-sized buffer):
    # host-side tracking would force a blocking scalar sync every step, which
    # on remote/tunneled backends costs as much as the step itself.
    best_val = None          # device scalar, rides through the stage steps
    best_theta = None        # device pytree

    def _init_best(theta):
        nonlocal best_val, best_theta
        if best_val is None:
            dt_ = jnp.result_type(jax.tree.leaves(theta)[0])
            best_val = jnp.asarray(jnp.inf, dt_)
            best_theta = theta

    def _step_best(val, theta_in, best_val, best_theta):
        """In-jit: fold this iterate into the running best."""
        improved = val < best_val
        best_val = jnp.where(improved, val, best_val)
        best_theta = jax.tree.map(
            lambda bt, th: jnp.where(improved, th, bt), best_theta, theta_in
        )
        return best_val, best_theta

    # When no per-iteration callback is requested, per-step scalars (loss,
    # grad norm) are fetched in ONE bulk transfer at stage end — fetching
    # them eagerly doubles epoch time on remote backends.
    async_rec = callback is None and not record_theta_hist

    def _flush(pending, theta, stage_wall):
        if not pending:
            return
        host = jax.device_get(pending)
        dt_each = stage_wall / len(host)
        for v, gn in host:
            _record(stats, float(v), theta, float(gn), dt_each)

    eval_loss = jax.jit(loss_fn_b)

    def _stage_boundary(theta):
        """End of a stage: the final iterate's loss was never recorded (the
        in-jit tracker sees pre-update θ), so evaluate it, fold it into the
        best, and hand the NEXT stage the best iterate — a warm start from an
        end-of-stage oscillation peak wastes the next optimizer's budget."""
        nonlocal best_val, best_theta
        if best_val is None:
            return theta
        v_end = float(eval_loss(theta, batch))
        if v_end < float(best_val):
            best_val = jnp.asarray(v_end, jnp.result_type(best_val))
            best_theta = theta
        return best_theta

    def _recheck_substeps(theta):
        """Probe-staleness guard for ``substeps="auto"`` on EXPLICIT solvers:
        the initial calibration probed at the initial θ; if the optimizer has
        since raised creep/diffusivity, the sizing can silently leave the
        explicit stability region. Re-probe at the current θ and, when more
        substeps are needed, bump the count for the remaining stages (the
        cached jitted steps are rebuilt — an honest recompile, traded against
        silently integrating an unstable ODE)."""
        nonlocal params, eval_loss, vg
        from odinn_tpu.simulation.prediction import calibrate_substeps

        needed = calibrate_substeps(theta, batch, model, params, tstops)
        cur = int(params.solver.substeps)
        if needed <= cur:
            return
        print(f"[odinn_tpu] substeps='auto' probe went stale: current θ needs "
              f"{needed} substeps/interval (calibrated {cur} at the initial "
              f"θ) — re-sizing and re-jitting the remaining stages")
        params = params.replace(
            solver=dataclasses.replace(params.solver, substeps=int(needed)))
        inversion.parameters = params
        stats.substeps_bumps.append((stats.niter, cur, int(needed)))
        # loss_fn_b reads `params` late-bound; fresh jit wrappers force the
        # retrace, and clearing the shared-step cache rebuilds the optimizers
        _shared_steps.clear()
        eval_loss = jax.jit(loss_fn_b)
        vg = _make_grad_fn(inversion, loss_fn_b)

    def _end_stage(theta):
        theta = _stage_boundary(theta)
        if substeps_guard:
            _recheck_substeps(theta)
        return theta

    # Adam/AdamW steps are built ONCE and shared across stages, with the
    # learning rate riding in the optimizer state (optax.inject_hyperparams)
    # instead of being baked into the jitted closure: a 6-stage Adam ladder
    # otherwise recompiles the identical fwd+grad program 6 times (~3 s each
    # on the tunneled TPU — measured ~40% of the whole 420-epoch at-scale
    # part-1 training wall clock).
    _shared_steps = {}

    def _adam_machinery(opt_name):
        if opt_name in _shared_steps:
            return _shared_steps[opt_name]
        base = optax.adam if opt_name == "adam" else optax.adamw
        opt = optax.inject_hyperparams(base)(learning_rate=0.0)

        @jax.jit
        def step_full(theta, state, best_val, best_theta, b):
            val, grads = vg(theta, b)
            best_val, best_theta = _step_best(val, theta, best_val, best_theta)
            updates, state = opt.update(grads, state, theta)
            return (optax.apply_updates(theta, updates), state,
                    best_val, best_theta, val, optax.global_norm(grads))

        @jax.jit
        def step_mb(theta, state, b, ids):
            val, grads = vg(theta, gather_batch(b, ids), ids)
            updates, state = opt.update(grads, state, theta)
            return (optax.apply_updates(theta, updates), state, val,
                    optax.global_norm(grads))

        _shared_steps[opt_name] = (opt, step_full, step_mb)
        return _shared_steps[opt_name]

    def _adam_state(opt, theta, lr):
        state = opt.init(theta)
        lr_arr = jnp.asarray(lr, jnp.result_type(jax.tree.leaves(theta)[0]))
        return state._replace(hyperparams=dict(state.hyperparams,
                                               learning_rate=lr_arr))

    n_glaciers = batch.H0.shape[0]
    bsize = min(params.hyper.batch_size, n_glaciers)
    minibatching = 0 < bsize < n_glaciers
    if not minibatching:
        # The INITIAL iterate joins the best tracker: a warm-started θ (e.g.
        # a pretrained network) may already beat everything the stages reach,
        # and Optimization.jl's minimizer tracking includes it too. One
        # forward evaluation — negligible against training.
        _init_best(theta)
        v0 = eval_loss(theta, batch)
        best_val, best_theta = _step_best(v0, theta, best_val, best_theta)
    if minibatching:
        # loud, once: losses become stochastic subset sums and per-step cost
        # reflects bsize glaciers, not the full batch (hyper.batch_size
        # defaults to 15, matching the reference's DataLoader default)
        print(f"[odinn_tpu] minibatching {bsize}/{n_glaciers} glaciers per step "
              f"(set hyper.batch_size >= {n_glaciers} for full-batch)")
    # on a 2-D (dp×sp) mesh only the glacier axis constrains the minibatch
    n_gshards = mesh.shape.get("glaciers", mesh.size) if use_mesh else 1
    if minibatching and use_mesh and bsize % n_gshards != 0:
        raise ValueError(
            f"hyper.batch_size={bsize} must be a multiple of the mesh's "
            f"glacier-axis size {n_gshards} (glacier-axis sharding)"
        )
    rng = np.random.default_rng(0)

    def _run_stage(opt_name, lr, epochs):
        nonlocal theta, best_val, best_theta
        opt_name = opt_name.lower()
        if opt_name in ("adam", "adamw"):
            opt, step, step_mb = _adam_machinery(opt_name)
            state = _adam_state(opt, theta, lr)

            if minibatching:
                # glacier minibatching (Hyperparameters.batch_size; the
                # reference's DataLoader loop, ML_utils.jl:190-200)
                pending, t_stage = [], time.time()
                for it in range(epochs):
                    t_start = time.time()
                    ids = jnp.asarray(rng.choice(n_glaciers, size=bsize, replace=False))
                    theta, state, val, gnorm = step_mb(theta, state, batch, ids)
                    if async_rec:
                        pending.append((val, gnorm))
                        continue
                    _record(stats, float(val), theta, float(gnorm), time.time() - t_start)
                    if callback is not None:
                        callback(stats)
                _flush(pending, theta, time.time() - t_stage)
                theta = _end_stage(theta)
                return

            _init_best(theta)

            pending, t_stage = [], time.time()
            for it in range(epochs):
                t_start = time.time()
                theta, state, best_val, best_theta, val, gnorm = step(
                    theta, state, best_val, best_theta, batch)
                if async_rec:
                    pending.append((val, gnorm))
                    continue
                _record(stats, float(val), theta, float(gnorm), time.time() - t_start)
                if callback is not None:
                    callback(stats)
            _flush(pending, theta, time.time() - t_stage)
            theta = _end_stage(theta)
        elif opt_name in ("lbfgs", "bfgs"):
            ls_name = params.hyper.lbfgs_linesearch
            if ls_name == "auto":
                th_dt = jnp.result_type(jax.tree.leaves(theta)[0])
                ls_name = "zoom" if th_dt == jnp.float64 else "backtracking"
            # like the Adam machinery, the LBFGS step is built ONCE per
            # linesearch flavor and shared across stages — a repeated-LBFGS
            # ladder otherwise re-jits the identical fwd+grad+linesearch
            # program every stage
            cache_key = ("lbfgs", ls_name)
            if cache_key in _shared_steps:
                opt, lbfgs_step = _shared_steps[cache_key]
            else:
                if ls_name == "zoom":
                    ls = optax.scale_by_zoom_linesearch(max_linesearch_steps=20)
                elif ls_name == "backtracking":
                    # Armijo backtracking: monotone step shrinking — cannot hang
                    # where zoom's f32 bracketing collapses (see Hyperparameters)
                    ls = optax.scale_by_backtracking_linesearch(
                        max_backtracking_steps=30, store_grad=True
                    )
                else:
                    raise ValueError(
                        f"hyper.lbfgs_linesearch must be 'auto', 'zoom', or "
                        f"'backtracking', got {ls_name!r}"
                    )
                opt = optax.lbfgs(linesearch=ls)

                @jax.jit
                def lbfgs_step(theta, state, best_val, best_theta, b):
                    val, grads = vg(theta, b)
                    best_val, best_theta = _step_best(val, theta, best_val, best_theta)
                    updates, state = opt.update(
                        grads, state, theta, value=val, grad=grads,
                        value_fn=lambda th: loss_fn_b(th, b),
                    )
                    return (optax.apply_updates(theta, updates), state,
                            best_val, best_theta, val, optax.global_norm(grads))

                _shared_steps[cache_key] = (opt, lbfgs_step)
            state = opt.init(theta)

            _init_best(theta)

            pending, t_stage = [], time.time()
            for it in range(epochs):
                t_start = time.time()
                theta, state, best_val, best_theta, val, gnorm = lbfgs_step(
                    theta, state, best_val, best_theta, batch)
                if async_rec:
                    pending.append((val, gnorm))
                    continue
                _record(stats, float(val), theta, float(gnorm), time.time() - t_start)
                if callback is not None:
                    callback(stats)
            _flush(pending, theta, time.time() - t_stage)
            theta = _end_stage(theta)
        elif opt_name in ("lm", "gn", "gauss_newton", "gauss-newton"):
            # second-order stage: matrix-free Levenberg–Marquardt on the
            # least-squares transient loss (inverse.gauss_newton) — quadratic
            # local convergence where Adam/LBFGS crawl. `lr` is the initial
            # damping λ; `epochs` the LM iteration count.
            if minibatching:
                raise ValueError("Gauss-Newton stages require full-batch training "
                                 f"(hyper.batch_size >= {n_glaciers})")
            from odinn_tpu.inverse.gauss_newton import lm_train, make_residual_fn

            resid = make_residual_fn(model, params, tstops)
            glacier_norm = params.hyper.gn_glacier_norm
            if glacier_norm:
                # per-glacier loss normalization (see Hyperparameters): weight
                # rows by the inverse per-glacier loss at the stage start
                r0 = jax.jit(lambda th, b: resid(th, b))(theta, batch)
                L_g = jnp.sum(r0 * r0, axis=tuple(range(1, r0.ndim)))
                w_g = 1.0 / (L_g + 0.01 * jnp.mean(L_g))
                sqrt_w = jnp.sqrt(w_g).reshape((-1,) + (1,) * (r0.ndim - 1))
                base_resid = resid

                def resid(th, b, ids=None, _br=base_resid, _sw=sqrt_w):
                    return _br(th, b, ids) * _sw

            t_stage = time.time()
            n_before = stats.niter

            def rec(v, th, gn):
                if glacier_norm:
                    # lm_train's v is the NORMALIZED objective; stats.losses
                    # must stay on one scale across stages (core/params.py:
                    # "reported losses remain the UN-normalized objective"),
                    # so re-price the true loss (one forward per LM iter —
                    # marginal next to the iteration's CG solves; eval_loss
                    # is the shared jitted wrapper — a fresh jax.jit here
                    # would retrace the whole fwd program every iteration)
                    v = float(eval_loss(th, batch))
                _record(stats, v, th, gn, 0.0)
                if callback is not None:
                    callback(stats)

            theta, lm_losses = lm_train(theta, batch, resid, iters=epochs,
                                        cg_iters=params.hyper.gn_cg_iters,
                                        init_damping=lr, record=rec,
                                        precond=params.hyper.gn_precond,
                                        cg_restarts=params.hyper.gn_cg_restarts)
            stage_wall = time.time() - t_stage
            # rec() appended one dt=0.0 entry per record; overwrite them with
            # the stage's mean per-iteration wall time so len(time_per_iter)
            # stays == niter
            n_rec = stats.niter - n_before
            if n_rec > 0:
                stats.time_per_iter[-n_rec:] = [stage_wall / n_rec] * n_rec
            # LM's accept rule is monotone, so the returned θ is the stage's
            # best iterate; fold into the global best (host-side scalars).
            # Under glacier normalization lm_losses are the NORMALIZED
            # objective — comparable best tracking happens in _stage_boundary
            # against the true loss instead.
            _init_best(theta)
            if not glacier_norm:
                lm_best = min(lm_losses)
                if lm_best < float(best_val):
                    best_val = jnp.asarray(lm_best, jnp.result_type(best_val))
                    best_theta = theta
            theta = _end_stage(theta)
        else:
            raise ValueError(f"unknown optimizer {opt_name!r}")

    def _recover_instability(attempt=1):
        """In-flight stability failure: the loss went non-finite mid-stage —
        the optimizer left the initial calibration's stability region
        between boundary rechecks. Rewind θ to the best finite iterate,
        re-size there (bump substeps ≥2× under substeps='auto'; re-record
        the accepted-dt schedule under adaptive='replay', splitting each
        recorded step 2^(attempt−1) ways — a probe at the rewound θ cannot
        anticipate the optimizer's NEXT move, so repeated failures buy
        compounding stability margin), rebuild the jitted steps, and rerun
        the stage."""
        nonlocal theta, params, eval_loss, vg

        theta = best_theta
        # the raising _record appended the non-finite loss (and bumped
        # niter / theta_hist) but not grad_norm_hist/time_per_iter —
        # reconcile so every history stays aligned after recovery
        n = len(stats.grad_norm_hist)
        del stats.losses[n:]
        if getattr(stats, "_record_theta_hist", False):
            del stats.theta_hist[n:]
        stats.niter = n
        stats.retcode = None

        if replay_mode:
            from odinn_tpu.simulation.prediction import resolve_replay

            splits = 2 ** (attempt - 1)
            print("[odinn_tpu] adaptive='replay': non-finite loss mid-stage "
                  "— rewinding to the best iterate, re-recording the "
                  f"accepted-dt schedule there (each step split {splits}×), "
                  "and rerunning the stage")
            params = params.replace(solver=dataclasses.replace(
                params.solver, replay_dts=None))
            params = resolve_replay(params, batch, model, theta, tstops)
            if splits > 1:
                # split each recorded dt into `splits` equal sub-steps: the
                # interval tiling is preserved exactly and BS3 at smaller dt
                # is strictly more stable — compounding margin per attempt
                dts = np.asarray(params.solver.replay_dts)
                dts = np.repeat(dts / splits, splits, axis=-1)
                params = params.replace(solver=dataclasses.replace(
                    params.solver, replay_dts=dts))
            stats.substeps_bumps.append(
                (stats.niter, "replay", f"re-recorded x{splits}"))
        else:
            from odinn_tpu.simulation.prediction import calibrate_substeps

            cur = int(params.solver.substeps)
            needed = max(calibrate_substeps(theta, batch, model, params,
                                            tstops), 2 * cur)
            print(f"[odinn_tpu] substeps='auto': non-finite loss mid-stage — "
                  f"rewinding to the best iterate, re-sizing {cur} → {needed} "
                  f"substeps/interval, and rerunning the stage")
            params = params.replace(
                solver=dataclasses.replace(params.solver, substeps=int(needed)))
            stats.substeps_bumps.append((stats.niter, cur, int(needed)))
        inversion.parameters = params
        _shared_steps.clear()
        eval_loss = jax.jit(loss_fn_b)
        vg = _make_grad_fn(inversion, loss_fn_b)

    for opt_name, lr, epochs in _stages(params.hyper):
        attempts = 0
        while True:
            try:
                _run_stage(opt_name, lr, epochs)
                break
            except FloatingPointError:
                # recoverable only when this loop owns the sizing (auto
                # substeps or a recorded replay schedule) and a finite best
                # iterate exists to rewind to
                if not (substeps_guard or replay_mode) or best_theta is None \
                        or attempts >= 3:
                    raise
                attempts += 1
                _recover_instability(attempts)

    # adopt the best iterate (loss is recorded for θ *before* each update, so
    # the final θ's loss is unknown — compare it before deciding)
    if best_theta is not None and stats.losses:
        final_val, bv = jax.device_get(
            (jax.jit(loss_fn_b)(theta, batch), best_val))
        if float(bv) < float(final_val):
            theta = best_theta
        stats.final_loss = min(float(bv), float(final_val))

    stats.retcode = "Success"
    stats.theta = theta
    if model.initial_condition is not None and "IC" in theta:
        stats.initial_conditions = theta["IC"]
    inversion.theta = theta

    # final forward with trained θ stored as simulation results
    # (reference `create_results` after training, inversion_utils.jl:255-267);
    # padded mesh lanes are sliced off before results assembly
    from odinn_tpu.simulation.prediction import forward_batch
    from odinn_tpu.simulation.results import create_results

    trajs = jax.jit(lambda th, b: forward_batch(th, b, model, params, tstops))(theta, batch)
    # glacier-axis padding AND (2-D mesh) grid-row padding both slice off —
    # padded rows carry zero dynamics, so the interior equals the unpadded run
    trajs = trajs[:n_results, ..., : orig_batch.H0.shape[-2], : orig_batch.H0.shape[-1]]
    inversion.results = Results(
        simulation=create_results(trajs, tstops, glaciers=orig_batch), stats=stats
    )
    return inversion.results


def _record(stats: TrainingStats, val, theta, gnorm, dt):
    stats.losses.append(val)
    stats.niter += 1
    stats.theta = theta
    if getattr(stats, "_record_theta_hist", False):
        stats.theta_hist.append(jax.tree.map(lambda x: np.asarray(x), theta))
    # failure detection (SURVEY §5: the reference asserts solver retcodes and
    # NaN-checks gradients): a non-finite loss means the solve left the
    # integrator's stability region — fail loudly with the remedy
    if not np.isfinite(val):
        stats.retcode = "NumericalFailure"
        raise FloatingPointError(
            f"training loss became non-finite at iteration {stats.niter}. "
            "The forward solve likely violated the explicit stability limit "
            "(large creep/diffusivity). Increase solver.substeps / "
            "solver.rkc_stages (see suggest_substeps / rkc_stages_for), set "
            "SIA2DModel.max_D, or lower the learning rate."
        )
    stats.grad_norm_hist.append(gnorm)
    stats.time_per_iter.append(dt)
    if gnorm > 1e7:
        # gradient-explosion warning (gradient.jl:19-24)
        print(f"[odinn_tpu] WARNING: gradient norm {gnorm:.3e} > 1e7")


def run_inversion(inversion: Inversion, callback=None,
                  path: Optional[str] = None,
                  file_name: Optional[str] = None,
                  mesh=None) -> Results:
    """``run!(::Inversion)`` equivalent (inversion_utils.jl:21-88).

    With ``path``/``file_name`` set, the trained result is auto-saved as a
    :class:`~odinn_tpu.utils.io.TrainingResult` — the reference's
    run!-embedded persistence (``run!(inversion; path, file_name)``,
    /root/reference/test/inversion_test.jl:110-122).

    ``mesh`` passes through to :func:`train_ude` (defaults to the session
    mesh registered by ``api.enable_multiprocessing``).
    """
    results = train_ude(inversion, callback=callback, mesh=mesh)
    if path is not None or file_name is not None:
        import os

        from odinn_tpu.utils.io import TrainingResult, save_inversion_file

        full = os.path.join(path or ".", file_name or "training_result.msgpack")
        save_inversion_file(full, TrainingResult(
            theta=results.stats.theta,
            grad_norm_hist=results.stats.grad_norm_hist,
            losses=results.stats.losses,
            params_meta={"niter": results.stats.niter,
                         "final_loss": results.stats.final_loss,
                         "retcode": results.stats.retcode},
        ))
    return results
