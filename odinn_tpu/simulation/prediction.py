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
           "calibrate_substeps_si", "resolve_substeps", "resolve_replay",
           "Prediction", "run_prediction", "generate_ground_truth"]


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
    _return_dts: int = 0,
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
    accepted step counts; ``_return_dts=cap`` (adaptive only) additionally
    returns the accepted dt record consumed by :func:`resolve_replay`.

    With ``params.solver.adaptive == "replay"`` the solve replays the
    recorded accepted-dt schedule in ``params.solver.replay_dts`` (set by
    :func:`resolve_replay`) as a fixed, reverse-differentiable ``lax.scan``
    — the record-and-replay strategy for the reference's
    gradient-through-adaptive-solve contract
    (/root/reference/src/parameters/UDEparameters.jl:14-80).
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
        if params.solver.adaptive == "replay":
            if params.solver.replay_dts is None:
                raise ValueError(
                    "solver.adaptive='replay' needs the recorded step schedule "
                    "— train_ude/run_prediction resolve it automatically; when "
                    "driving forward_glacier directly, call "
                    "odinn_tpu.simulation.prediction.resolve_replay(params, "
                    "batch, model, theta, tstops) first"
                )
            from odinn_tpu.simulation.solver import integrate_replay

            dts_g = jnp.asarray(params.solver.replay_dts)[glacier_idx]
            return integrate_replay(
                rhs, H0, tstops, dts_g,
                callback=callback, checkpoint=params.solver.remat,
            )
        from odinn_tpu.simulation.solver import integrate_adaptive

        return integrate_adaptive(
            rhs, H0, tstops,
            rtol=params.solver.reltol, atol=params.solver.reltol,
            callback=callback, return_stats=_return_stats,
            return_dts=_return_dts,
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
            "the periodic-law interval loop drives single steps and does not "
            "carry the predictor–corrector warm-start state — use solver='SI' "
            "or an explicit solver for periodic-law models"
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


def calibrate_substeps_si(theta, batch, model, params, tstops,
                          max_substeps: int = 1024, cg_probe: int = 64,
                          cg_candidates=(4, 6, 8, 12, 16, 24, 32, 48)):
    """Size ``substeps`` AND ``cg_iters`` for the semi-implicit solvers (SI /
    SI2) from ``solver.reltol`` by Richardson step-halving.

    The semi-implicit solvers are unconditionally stable, so their substep
    count controls *accuracy* (splitting/linearization error: O(dt) for SI,
    O(dt²) for SI2), not stability — the adaptive BS3(2) probe that sizes the
    explicit solvers measures the wrong thing for them. Instead:

    1. **Substeps** (time-discretization error): with a generous CG budget
       (``cg_probe``, isolating splitting error from algebraic error), run
       the full forward at ``n`` and ``2n`` substeps and form the Richardson
       indicator ``err = max |H_n − H_2n| / (reltol + reltol·max(|H_n|,
       |H_2n|))`` over the whole trajectory — for a method of order p this
       estimates the error of the *coarser* run to within a factor
       (1 − 2⁻ᵖ). Double ``n`` until ``err ≤ 1`` and return ``2n``: the
       finer run's own error is then ≤ reltol/2 (SI) / reltol/4 (SI2), the
       built-in safety margin.
    2. **cg_iters** (algebraic error): at the chosen substeps, find the
       smallest candidate whose trajectory stays within reltol/2 (scaled) of
       the ``cg_probe`` reference, so the CG truncation consumes at most
       half the error budget.

    This is the tolerance contract the reference gets from its adaptive
    solver (``reltol = params.solver.reltol``,
    /root/reference/src/simulations/inversions/inversion_utils.jl:559-568;
    test/params_construction.jl:5-13), transferred onto the fixed-shape
    production solvers. A handful of one-time forward solves, amortized over
    every epoch. Returns ``(substeps, cg_iters)``.
    """
    reltol = params.solver.reltol

    def run(n, cg):
        p = params.replace(solver=dataclasses.replace(
            params.solver, substeps=int(n), cg_iters=int(cg),
            cg_iters_predictor=max(int(cg) // 2,
                                   params.solver.cg_iters_predictor),
            adaptive=False,
        ))
        return jax.jit(
            lambda th, b: forward_batch(th, b, model, p, tstops)
        )(theta, batch)

    def scaled_err(a, b):
        scale = reltol + reltol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        return float(jnp.max(jnp.abs(a - b) / scale))

    n = 1
    traj_n = run(n, cg_probe)
    while True:
        traj_2n = run(2 * n, cg_probe)
        if scaled_err(traj_n, traj_2n) <= 1.0:
            substeps = 2 * n
            ref = traj_2n
            break
        n *= 2
        traj_n = traj_2n
        if 2 * n > max_substeps:
            raise ValueError(
                f"calibrate_substeps_si: reltol={reltol:g} not reached at "
                f"{max_substeps} substeps/interval — the splitting error "
                "floor of the semi-implicit discretization is above the "
                "requested tolerance here; loosen reltol or use an explicit "
                "solver (substeps='auto' with solver='SSPRK3'/'RK4')"
            )
    cg = cg_probe
    for c in cg_candidates:
        if c >= cg_probe:
            break
        if scaled_err(run(substeps, c), ref) <= 0.5:
            cg = c
            break
    # the accepted probe ran with this predictor budget (run() above) — the
    # production solve must use the configuration that passed the
    # acceptance, so the predictor depth is returned and written back too
    cg_pred = max(int(cg) // 2, params.solver.cg_iters_predictor)
    return substeps, cg, cg_pred


def resolve_substeps(params, batch, model, theta, tstops):
    """Resolve ``solver.substeps == "auto"`` into a concrete count via
    :func:`calibrate_substeps` (explicit solvers: one adaptive BS3(2) probe)
    or :func:`calibrate_substeps_si` (SI/SI2: Richardson step-halving probes,
    which also size ``cg_iters``); a no-op for integer substeps."""
    if params.solver.substeps != "auto":
        return params
    if params.solver.solver in ("SI", "SI2"):
        n, cg, cg_pred = calibrate_substeps_si(theta, batch, model, params,
                                               tstops)
        print(f"[odinn_tpu] substeps='auto' ({params.solver.solver}): "
              f"calibrated {n} substeps/interval, cg_iters={cg} "
              f"(predictor {cg_pred}) from reltol={params.solver.reltol:g} "
              f"(Richardson step-halving)")
        return params.replace(
            solver=dataclasses.replace(params.solver, substeps=n, cg_iters=cg,
                                       cg_iters_predictor=cg_pred)
        )
    n = calibrate_substeps(theta, batch, model, params, tstops)
    print(f"[odinn_tpu] substeps='auto': calibrated {n} substeps/interval "
          f"from reltol={params.solver.reltol:g} (adaptive BS3(2) probe)")
    return params.replace(
        solver=dataclasses.replace(params.solver, substeps=n)
    )


def resolve_replay(params, batch, model, theta, tstops):
    """Resolve ``solver.adaptive == "replay"`` into a recorded accepted-dt
    schedule in ``solver.replay_dts``; a no-op otherwise (or when already
    resolved).

    Two probe solves per glacier (vmapped, jitted — each is one adaptive
    BS3(2) forward at rtol = atol = reltol): the first counts accepted steps
    per save interval to size the record exactly (so recording overflow
    cannot occur), the second re-runs the identical deterministic solve
    recording every accepted dt. The schedule then drives
    :func:`odinn_tpu.simulation.solver.integrate_replay` — a fixed
    ``lax.scan`` that reproduces the error-controlled trajectory to roundoff
    and is reverse-differentiable: the exact gradient of the adaptive solve
    with the accepted time grid held fixed, the reference's
    InterpolatingAdjoint-through-adaptive-solve contract
    (/root/reference/src/parameters/UDEparameters.jl:14-80).
    """
    if params.solver.adaptive != "replay" or params.solver.replay_dts is not None:
        return params
    p_ad = params.replace(
        solver=dataclasses.replace(params.solver, adaptive=True)
    )
    idxs = jnp.arange(batch.H0.shape[0])
    _, naccs = jax.jit(jax.vmap(
        lambda g, i: forward_glacier(theta, g, i, model, p_ad, tstops,
                                     _return_stats=True)
    ))(batch, idxs)
    cap = int(jnp.max(naccs))
    _, naccs2, dts = jax.jit(jax.vmap(
        lambda g, i: forward_glacier(theta, g, i, model, p_ad, tstops,
                                     _return_stats=True, _return_dts=cap)
    ))(batch, idxs)
    # the two probes are separately traced XLA programs; a borderline
    # accept/reject could in principle flip between them, and an accept past
    # `cap` would be silently dropped from the record — verify both ways
    if int(jnp.max(naccs2)) > cap:
        raise RuntimeError(
            "resolve_replay: the recording probe accepted more steps than "
            f"the counting probe sized for (cap {cap}) — re-run; if it "
            "persists, the two compilations disagree on a borderline "
            "accept/reject and reltol should be nudged"
        )
    sums = jnp.sum(dts, axis=-1)
    spans = jnp.diff(jnp.asarray(tstops))[None, :]
    # f32-safe gate: a ~50-term f32 accumulation carries O(1e-6) relative walk
    if not bool(jnp.all(jnp.abs(sums - spans) <= 1e-4 * jnp.abs(spans) + 1e-9)):
        raise RuntimeError(
            "resolve_replay: recorded dts do not tile the save intervals "
            "(max defect "
            f"{float(jnp.max(jnp.abs(sums - spans))):.3e}) — record corrupt"
        )
    total = int(jnp.sum(naccs))
    print(f"[odinn_tpu] adaptive='replay': recorded {total} accepted steps "
          f"({batch.H0.shape[0]} glaciers × {int(naccs.shape[1])} intervals, "
          f"cap {cap}/interval) at reltol={params.solver.reltol:g}")
    return params.replace(
        solver=dataclasses.replace(params.solver,
                                   replay_dts=jax.device_get(dts))
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
    resolved_parameters: Any = None     # last run's resolved substeps/replay
                                        # config (read-only diagnostic —
                                        # every run re-resolves from
                                        # `parameters`)

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
    # resolution stays LOCAL to this call: persisting resolved params into
    # pred.parameters would silently reuse a stale substeps sizing / replay
    # schedule on a second run_prediction call after the user changed
    # pred.theta or passed different tstops — each call re-probes, exactly
    # like the pre-resolution behavior. The resolved values are exposed for
    # inspection without becoming the next call's config:
    params = resolve_substeps(params, pred.glaciers, pred.model, theta, tstops)
    params = resolve_replay(params, pred.glaciers, pred.model, theta, tstops)
    pred.resolved_parameters = params

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
