"""Forward simulation: Prediction + ground-truth generation.

TPU-native rebuild of Huginn's ``Prediction(model, glaciers, params)`` +
``run!`` and ``generate_ground_truth`` (usage /root/reference/README.md:60-84,
test/test_grad_loss.jl:170-177).

Design: one pure per-glacier forward function, ``vmap``-ed over the stacked
glacier batch — the whole fleet of glaciers advances in lockstep on one chip
(and shards across the mesh, see odinn_tpu.parallel) instead of the
reference's one-process-per-glacier ``pmap``
(/root/reference/src/setup/config.jl:97-139).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from odinn_tpu.core.glacier import Glacier, SurfaceVelocityData, ThicknessData, stack_glaciers
from odinn_tpu.models.model import Model, init_theta, make_values_fn, resolve_outer_values
from odinn_tpu.physics.mass_balance import mb_timestep
from odinn_tpu.physics.sia2d import sia2d_rhs, v_from_h
from odinn_tpu.simulation.solver import build_tstops, integrate_scan

__all__ = ["forward_glacier", "forward_batch", "calibrate_substeps",
           "resolve_substeps", "Prediction", "run_prediction",
           "generate_ground_truth"]


def _mb_every(params) -> int:
    """MB callback cadence in save intervals: step_MB / solver.step."""
    k = round(params.simulation.step_MB / params.solver.step)
    return max(int(k), 1)


def forward_glacier(
    theta,
    glacier: Glacier,
    glacier_idx,
    model: Model,
    params,
    tstops,
    H0=None,
    _return_stats: bool = False,
):
    """Solve one glacier over ``tstops``; returns the trajectory (T, nx, ny).

    Assembles the callback set the reference builds at
    /root/reference/src/simulations/inversions/inversion_utils.jl:487-527:
    outer laws evaluated at solve start, inner laws per RHS call, MB applied
    at every ``step_MB`` interval end. Differentiable end to end (the scan
    path), including through the MB application.

    With ``params.solver.adaptive`` the solve is the error-controlled BS3(2)
    integrator at ``rtol = atol = params.solver.reltol`` — the reference's
    default adaptive forward solve (``reltol = params.solver.reltol``,
    inversion_utils.jl:559-568). Forward-only (``lax.while_loop`` has no
    reverse rule); training paths either use fixed substeps or calibrate them
    from ``reltol`` via ``substeps="auto"`` (:func:`calibrate_substeps`).
    ``_return_stats`` (adaptive only) additionally returns per-interval
    accepted step counts.
    """
    phys = params.physical
    t0 = tstops[0]
    if H0 is None:
        if model.initial_condition is not None and theta is not None and "IC" in theta:
            H0 = model.initial_condition.evaluate_H0(theta, glacier_idx)
        else:
            H0 = glacier.H0

    outer_vals = resolve_outer_values(model, theta, glacier, glacier_idx, t0, H=H0)
    values_fn = make_values_fn(model, theta, glacier, glacier_idx, t0, outer_vals)
    target = model.target

    def rhs(H, t):
        if not params.simulation.use_iceflow:
            return jnp.zeros_like(H)
        return sia2d_rhs(H, glacier.B, glacier.dx, glacier.dy, values_fn, target, phys)

    callback = None
    if params.simulation.use_MB and model.mass_balance is not None:
        k = _mb_every(params)
        step_mb = params.simulation.step_MB

        def callback(H, ta, tb, i):
            def apply(H):
                return mb_timestep(H, glacier, model.mass_balance, tb, step_mb)

            return jax.lax.cond((i + 1) % k == 0, apply, lambda H: H, H)

    periodic = model.iceflow.periodic_laws
    method = params.solver.solver if params.solver.solver in ("RK4", "SSPRK3", "Euler", "RKC", "SI", "SI2") else "RK4"
    if params.solver.adaptive:
        if periodic:
            raise NotImplementedError(
                "solver.adaptive does not support periodic laws "
                "(callback_freq > 0): their values ride the fixed-shape scan "
                "carry; use a fixed-substep solver for periodic-law models"
            )
        from odinn_tpu.simulation.solver import integrate_adaptive

        return integrate_adaptive(
            rhs, H0, tstops,
            rtol=params.solver.reltol, atol=params.solver.reltol,
            callback=callback, return_stats=_return_stats,
        )
    if isinstance(params.solver.substeps, str):
        raise ValueError(
            "solver.substeps='auto' must be resolved before the jitted solve "
            "— train_ude/run_prediction do it automatically; when driving "
            "forward_glacier directly, call "
            "odinn_tpu.simulation.prediction.resolve_substeps(params, batch, "
            "model, theta, tstops) first"
        )
    if method in ("SI", "SI2") and not periodic:
        # unconditionally stable semi-implicit path (no CFL sizing needed);
        # SI2 = Crank–Nicolson with Picard midpoint diffusivity — second
        # order in dt at two (warm-started) CG solves per step
        from odinn_tpu.simulation.implicit import integrate_semi_implicit

        si2_kwargs = {}
        if method == "SI2":
            si2_kwargs = dict(
                corrector=True,
                cg_iters_predictor=params.solver.cg_iters_predictor,
            )
        return integrate_semi_implicit(
            H0, glacier.B, glacier.dx, glacier.dy, values_fn, target, phys, tstops,
            substeps=params.solver.substeps, cg_iters=params.solver.cg_iters,
            callback=callback, checkpoint=params.solver.remat, **si2_kwargs,
        )
    if not periodic:
        return integrate_scan(
            rhs, H0, tstops, params.solver.substeps, method=method, callback=callback,
            checkpoint=params.solver.remat, rkc_stages=params.solver.rkc_stages,
            compensated=params.solver.compensated,
        )

    # Periodic laws (callback_freq > 0, docs/src/inversions.md:140-156): their
    # values ride the scan carry and are re-evaluated at save boundaries on
    # each law's own cadence — the reference's PeriodicCallback law updates.
    from odinn_tpu.simulation.solver import get_stepper

    if method == "SI2":
        raise NotImplementedError(
            "solver='SI2' does not support periodic laws (callback_freq > 0): "
            "the Strang MB halves and the law-refresh cadence would interleave "
            "ambiguously — use solver='SI' (first-order splitting) or an "
            "explicit solver for periodic-law models"
        )
    step_fn = None if method == "SI" else get_stepper(method, params.solver.rkc_stages)
    substeps = params.solver.substeps
    cadences = {
        slot: max(int(round(law.callback_freq / params.solver.step)), 1)
        for slot, law in periodic.items()
    }

    def refresh_law(vals, slot, law, H, t):
        inputs = {"glacier_idx": glacier_idx}
        for spec in law.inputs:
            inputs[spec.name] = spec.get(glacier, H, t)
        return vals.replace(**{slot: law.apply(theta, inputs)})

    def interval(carry, xs):
        H, vals = carry
        t0i, t1i, i = xs
        vfn_i = make_values_fn(model, theta, glacier, glacier_idx, t0i, vals)

        def rhs_i(Hc, t):
            if not params.simulation.use_iceflow:
                return jnp.zeros_like(Hc)
            return sia2d_rhs(Hc, glacier.B, glacier.dx, glacier.dy, vfn_i, target, phys)

        dt = (t1i - t0i) / substeps

        if method == "SI":
            from odinn_tpu.simulation.implicit import semi_implicit_step

            def sub(Hc, k):
                return semi_implicit_step(
                    Hc, glacier.B, glacier.dx, glacier.dy, vfn_i, target, phys, dt,
                    params.solver.cg_iters,
                ), None

        else:

            def sub(Hc, k):
                return step_fn(rhs_i, Hc, t0i + k * dt, dt), None

        H, _ = jax.lax.scan(sub, H, jnp.arange(substeps))
        if callback is not None:
            H = callback(H, t0i, t1i, i)
        for slot, law in periodic.items():
            k = cadences[slot]
            vals = jax.lax.cond(
                (i + 1) % k == 0,
                lambda v, s=slot, l=law: refresh_law(v, s, l, H, t1i),
                lambda v: v,
                vals,
            )
        return (H, vals), H

    tstops = jnp.asarray(tstops, dtype=jnp.result_type(H0))
    t0s, t1s = tstops[:-1], tstops[1:]
    idxs = jnp.arange(t0s.shape[0])
    body = jax.checkpoint(interval)
    (_, _), traj = jax.lax.scan(body, (H0, outer_vals), (t0s, t1s, idxs))
    return jnp.concatenate([H0[None], traj], axis=0)


def calibrate_substeps(theta, batch, model, params, tstops, safety: float = 1.5):
    """Size the fixed-shape integrators from ``solver.reltol``: run ONE
    adaptive, error-controlled forward per glacier (BS3(2) at
    rtol = atol = reltol) and return ``ceil(safety × max accepted steps per
    save interval)`` over all glaciers and intervals.

    This is how ``substeps="auto"`` makes the reference's tolerance knob
    (``reltol = params.solver.reltol``, inversion_utils.jl:559-568) govern the
    differentiable training path too: the while_loop integrator cannot be
    reverse-differentiated, but its accepted step count transfers the error
    control onto the fixed ``lax.scan`` solve (same-order SSPRK3/RK4 at
    uniform dt ≤ the adaptive max dt, with ``safety`` absorbing the
    uniform-vs-adaptive step-distribution mismatch). One extra forward solve
    per training run — amortized over every epoch.
    """
    import math

    p_ad = params.replace(
        solver=dataclasses.replace(params.solver, adaptive=True)
    )
    idxs = jnp.arange(batch.H0.shape[0])
    _, naccs = jax.jit(jax.vmap(
        lambda g, i: forward_glacier(theta, g, i, model, p_ad, tstops,
                                     _return_stats=True)
    ))(batch, idxs)
    return max(int(math.ceil(float(jnp.max(naccs)) * safety)), 1)


def resolve_substeps(params, batch, model, theta, tstops):
    """Resolve ``solver.substeps == "auto"`` into a concrete count via
    :func:`calibrate_substeps`; a no-op for integer substeps."""
    if params.solver.substeps != "auto":
        return params
    if params.solver.solver in ("SI", "SI2"):
        raise ValueError(
            "substeps='auto' calibrates explicit-solver substeps from "
            "solver.reltol; the semi-implicit solvers' error is operator "
            "splitting (O(dt) for SI, O(dt²) for SI2), not stability — set "
            "integer solver.substeps (and cg_iters), or pick an explicit "
            "solver"
        )
    n = calibrate_substeps(theta, batch, model, params, tstops)
    print(f"[odinn_tpu] substeps='auto': calibrated {n} substeps/interval "
          f"from reltol={params.solver.reltol:g} (adaptive BS3(2) probe)")
    return params.replace(
        solver=dataclasses.replace(params.solver, substeps=n)
    )


def forward_batch(theta, batch: Glacier, model: Model, params, tstops):
    """vmap the forward solve over the stacked glacier batch.

    Returns trajectories of shape (n_glaciers, T, nx, ny).
    """
    idxs = jnp.arange(batch.H0.shape[0])
    return jax.vmap(
        lambda g, i: forward_glacier(theta, g, i, model, params, tstops)
    )(batch, idxs)


@dataclass
class Prediction:
    """Forward-simulation container (Huginn.Prediction equivalent)."""

    model: Model
    glaciers: Any                       # stacked batch or list of Glacier
    parameters: Any
    theta: Any = None
    results: Any = None

    def __post_init__(self):
        if isinstance(self.glaciers, (list, tuple)):
            self.glaciers = stack_glaciers(list(self.glaciers))


def run_prediction(pred: Prediction, tstops=None):
    """Huginn ``run!(prediction)`` equivalent: jit-compiled vmapped solve;
    stores trajectories and diagnostic velocities into ``pred.results``."""
    params = pred.parameters
    if tstops is None:
        tstops = build_tstops(params.simulation.tspan, params.solver.step)
    theta = pred.theta
    params = resolve_substeps(params, pred.glaciers, pred.model, theta, tstops)

    fwd = jax.jit(
        lambda th, batch: forward_batch(th, batch, pred.model, params, tstops)
    )
    trajs = fwd(theta, pred.glaciers)

    results = {"t": tstops, "H": trajs}
    if params.simulation.use_velocities:
        batch = pred.glaciers
        idxs = jnp.arange(batch.H0.shape[0])

        def vel(g, i, H):
            t0 = tstops[0]
            outer = resolve_outer_values(pred.model, theta, g, i, t0, H=H)
            vfn = make_values_fn(pred.model, theta, g, i, t0, outer)
            return v_from_h(H, g.B, g.dx, g.dy, vfn, pred.model.target, params.physical)

        vx, vy, vabs = jax.jit(
            lambda batch, trajs: jax.vmap(
                lambda g, i, traj: jax.vmap(lambda H: vel(g, i, H))(traj)
            )(batch, idxs, trajs)
        )(batch, trajs)
        results.update({"Vx": vx, "Vy": vy, "V": vabs})
    pred.results = results
    return results


def generate_ground_truth(
    glaciers: Sequence[Glacier],
    params,
    model: Model,
    tstops,
    theta=None,
    store: Tuple[str, ...] = ("H", "V"),
):
    """Run the forward model and write synthetic observations into the
    glaciers (Huginn.generate_ground_truth equivalent; usage
    /root/reference/test/test_grad_loss.jl:170-177).

    ``store`` entries:
      - ``"H"``    — thickness time series at every tstop
      - ``"V"``    — velocity time series at every tstop
      - ``"dhdt"`` — mean thickness-change rate over the full span, as
                     consumed by LossDhdt (the reference generates these
                     aggregated-loss observations directly,
                     test_grad_loss.jl:170-177)
      - ``"avgV"`` — Δt-weighted average surface speed over the span as one
                     annual velocity product, as consumed by LossAvgV

    ``"V"`` and ``"avgV"`` both populate ``velocity_data`` and are mutually
    exclusive. Returns new Glacier objects with the observation payloads
    attached (immutably — the reference mutates its glacier structs).
    """
    if "V" in store and "avgV" in store:
        raise ValueError(
            'store cannot contain both "V" and "avgV": they populate the '
            "same velocity_data slot (time series vs annual product)"
        )
    need_velocities = ("V" in store) or ("avgV" in store)
    if need_velocities and not params.simulation.use_velocities:
        params = params.replace(
            simulation=dataclasses.replace(params.simulation, use_velocities=True)
        )
    pred = Prediction(model=model, glaciers=list(glaciers), parameters=params, theta=theta)
    results = run_prediction(pred, tstops=jnp.asarray(tstops))
    # one bulk device→host transfer: the per-glacier slicing below would
    # otherwise issue O(n_glaciers) tiny device ops, which on remote/tunneled
    # backends each pay a full round-trip
    results = jax.device_get(results)
    t = results["t"]
    out = []
    for i, g in enumerate(glaciers):
        nx, ny = g.nx, g.ny
        gi = g
        if "H" in store:
            gi = gi.replace(
                thickness_data=ThicknessData(t=t, H=results["H"][i, :, :nx, :ny])
            )
        if "V" in store and "V" in results:
            gi = gi.replace(
                velocity_data=SurfaceVelocityData(
                    t=t,
                    vx=results["Vx"][i, :, :nx, :ny],
                    vy=results["Vy"][i, :, :nx, :ny],
                    vabs=results["V"][i, :, :nx, :ny],
                )
            )
        if "dhdt" in store:
            from odinn_tpu.core.glacier import DhdtData

            H_traj = results["H"][i, :, :nx, :ny]
            t1, t2 = t[0], t[-1]
            gi = gi.replace(
                dhdt_data=DhdtData(t1=t1, t2=t2, dhdt=(H_traj[-1] - H_traj[0]) / (t2 - t1))
            )
        if "avgV" in store and "V" in results:
            # Δt-weighted mean of the per-tstop speeds — exactly LossAvgV's
            # forward aggregation (TimeAggregatedLosses.jl:171-377)
            dts = jnp.diff(t)
            w = dts / jnp.sum(dts)

            def wavg(f):
                return jnp.tensordot(w, f[1:], axes=1)

            gi = gi.replace(
                velocity_data=SurfaceVelocityData(
                    t=t[-1:],
                    vx=wavg(results["Vx"][i, :, :nx, :ny])[None],
                    vy=wavg(results["Vy"][i, :, :nx, :ny])[None],
                    vabs=wavg(results["V"][i, :, :nx, :ny])[None],
                    date1=t[0],
                    date2=t[-1],
                )
            )
        out.append(gi)
    return out
