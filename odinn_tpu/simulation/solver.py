"""Fixed-shape time integrators for the SIA2D solve.

TPU-native replacement for the reference's OrdinaryDiffEq solve
(``RDPK3Sp35()`` + tstops + callbacks,
/root/reference/src/simulations/inversions/inversion_utils.jl:551-572):

- :func:`integrate_scan` — fixed substeps per save interval driven by
  ``lax.scan`` with per-interval ``jax.checkpoint`` rematerialisation. This is
  the *differentiable* path: reverse-mode AD through it replaces the
  reference's SciMLSensitivity adjoint, and MB/law callbacks folded into the
  scan are differentiated for free (the reference could not differentiate its
  callbacks, inversion_utils.jl:321-323).
- :func:`integrate_adaptive` — embedded Bogacki–Shampine 3(2) pair with a PI
  step controller inside ``lax.while_loop``, hitting every tstop exactly.
  Forward-only (while_loop has no reverse rule); used for ``Prediction`` runs
  and ground-truth generation where the reference uses adaptive RK.

Both return the trajectory saved at the tstops — the dense saving the
reference's discrete adjoint consumes (gradient.jl:71-75).

Methods: classic RK4, SSPRK3 (Shu–Osher; a stability-optimized explicit
scheme in the same spirit as the reference's default RDPK3Sp35), and Euler.
Callbacks run at interval ends, matching PeriodicCallback apply-at-window-end
semantics (inversion_utils.jl:514).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "build_tstops",
    "integrate_scan",
    "integrate_adaptive",
    "integrate_replay",
    "rk4_step",
    "ssprk3_step",
    "euler_step",
    "suggest_substeps",
]


def suggest_substeps(
    dx, dy, h_max, a_max, n: float = 3.0, rho: float = 900.0, g: float = 9.81,
    step: float = 1.0 / 12.0, slope_max: float = 0.3, safety: float = 2.0,
) -> int:
    """Substep count per save interval satisfying the explicit diffusion
    stability limit dt ≤ dx²/(4·D_max) with D_max = Γ(a_max)·h_max^{n+2}·slope^{n−1}.

    The reference sidesteps this with adaptive RK (SolverParameters.reltol);
    the fixed-shape scan path needs the bound up front — size it for the
    *largest* A the optimizer can reach (params.physical.max_A), not the
    initial one.
    """
    import math

    gamma = 2.0 * a_max * (rho * g) ** n / (n + 2.0)
    d_max = gamma * float(h_max) ** (n + 2.0) * slope_max ** (n - 1.0)
    dt_stab = min(float(dx), float(dy)) ** 2 / (4.0 * max(d_max, 1e-30))
    return max(int(math.ceil(safety * step / dt_stab)), 1)


def build_tstops(tspan, step, extra=None):
    """Uniform tstops over tspan at ``step``, unioned with ``extra`` times
    (Huginn.define_callback_steps equivalent; tstop assembly semantics from
    inversion_utils.jl:487-495). Returns a sorted numpy-backed jnp array.

    Merging is ulp-aware: observation times that went through float32 storage
    (e.g. year-scale times ~2010, where one f32 ulp is ~2.4e-4) differ from
    the f64 save grid by several ulps. A plain union would insert
    near-duplicate tstops that collapse to zero-length intervals under an f32
    solve and break exact observation↔save matching. Times closer than a few
    f32 ulps are merged, keeping the DATA time as the representative so the
    solve saves exactly at the (f32-representable) observation instant.
    """
    import numpy as np

    t0, t1 = float(tspan[0]), float(tspan[1])
    n = int(round((t1 - t0) / step))
    grid = np.linspace(t0, t1, n + 1)
    if extra is None:
        return jnp.asarray(grid)

    data = np.asarray(extra, float).ravel()
    data = data[(data >= t0 - 1e-9) & (data <= t1 + 1e-9)]
    cands = sorted(
        [(float(t), False) for t in grid] + [(float(t), True) for t in np.unique(data)]
    )

    def tol(t):
        return 1e-9 + 5e-7 * abs(t)   # ≈4 f32 ulps

    merged = []   # (representative, has_data)
    for t, is_data in cands:
        if merged and t - merged[-1][0] <= tol(t):
            rep, had_data = merged[-1]
            # data representative wins (exact f32 match for the loss gate)
            merged[-1] = (t if (is_data and not had_data) else rep,
                          had_data or is_data)
        else:
            merged.append((t, is_data))
    return jnp.asarray(np.asarray([t for t, _ in merged]))


# ---------------------------------------------------------------------------
# Explicit steppers
# ---------------------------------------------------------------------------

def euler_step(f, y, t, dt):
    return y + dt * f(y, t)


def rk4_step(f, y, t, dt):
    k1 = f(y, t)
    k2 = f(y + 0.5 * dt * k1, t + 0.5 * dt)
    k3 = f(y + 0.5 * dt * k2, t + 0.5 * dt)
    k4 = f(y + dt * k3, t + dt)
    return y + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def ssprk3_step(f, y, t, dt):
    """3-stage 3rd-order strong-stability-preserving RK (Shu–Osher)."""
    y1 = y + dt * f(y, t)
    y2 = 0.75 * y + 0.25 * (y1 + dt * f(y1, t + dt))
    return y / 3.0 + (2.0 / 3.0) * (y2 + dt * f(y2, t + 0.5 * dt))


# Increment forms Δ = y_{n+1} − y_n (algebraically identical to the steppers
# above) for compensated accumulation: the per-step state rounding y ⊕ Δ is
# the error term Kahan summation eliminates.

def euler_increment(f, y, t, dt):
    return dt * f(y, t)


def rk4_increment(f, y, t, dt):
    k1 = f(y, t)
    k2 = f(y + 0.5 * dt * k1, t + 0.5 * dt)
    k3 = f(y + 0.5 * dt * k2, t + 0.5 * dt)
    k4 = f(y + dt * k3, t + dt)
    return (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def ssprk3_increment(f, y, t, dt):
    """SSPRK3 in increment form: Δ = dt·(k1 + k2 + 4·k3)/6 with
    k1 = f(y), k2 = f(y + dt·k1), k3 = f(y + dt(k1+k2)/4) — the Shu–Osher
    convex combinations expanded."""
    k1 = f(y, t)
    k2 = f(y + dt * k1, t + dt)
    k3 = f(y + 0.25 * dt * (k1 + k2), t + 0.5 * dt)
    return dt * (k1 + k2 + 4.0 * k3) / 6.0


_INCREMENTS = {"RK4": rk4_increment, "SSPRK3": ssprk3_increment,
               "Euler": euler_increment}


def _rkc2_coeffs(s: int, eps: float = 2.0 / 13.0):
    """Damped second-order Runge–Kutta–Chebyshev coefficients
    (van der Houwen & Sommeijer / Verwer RKC2).

    Real-axis stability interval ≈ 0.65·s² — the stabilized-explicit family
    the reference's default RDPK3Sp35 solver belongs to, extended so one
    s-stage step covers a whole save interval of stiff SIA diffusion.
    Static numpy; returns per-stage arrays for a lax.scan over stages.
    """
    import numpy as np

    w0 = 1.0 + eps / s**2

    # Chebyshev T_j(w0), T'_j(w0), T''_j(w0) by recurrence
    T = np.zeros(s + 1)
    dT = np.zeros(s + 1)
    d2T = np.zeros(s + 1)
    T[0], dT[0], d2T[0] = 1.0, 0.0, 0.0
    T[1], dT[1], d2T[1] = w0, 1.0, 0.0
    for j in range(2, s + 1):
        T[j] = 2.0 * w0 * T[j - 1] - T[j - 2]
        dT[j] = 2.0 * T[j - 1] + 2.0 * w0 * dT[j - 1] - dT[j - 2]
        d2T[j] = 4.0 * dT[j - 1] + 2.0 * w0 * d2T[j - 1] - d2T[j - 2]

    w1 = dT[s] / d2T[s]
    b = np.zeros(s + 1)
    for j in range(2, s + 1):
        b[j] = d2T[j] / dT[j] ** 2
    b[0] = b[2]
    b[1] = 1.0 / w0
    a = 1.0 - b[: s + 1] * T[: s + 1]

    mu1_t = b[1] * w1
    mu = np.zeros(s + 1)
    nu = np.zeros(s + 1)
    mu_t = np.zeros(s + 1)
    gam_t = np.zeros(s + 1)
    c = np.zeros(s + 1)
    c[1] = mu1_t  # ≈ c1
    for j in range(2, s + 1):
        mu[j] = 2.0 * b[j] * w0 / b[j - 1]
        nu[j] = -b[j] / b[j - 2]
        mu_t[j] = mu[j] * w1 / w0
        gam_t[j] = -a[j - 1] * mu_t[j]
        c[j] = (dT[s] / d2T[s]) * (d2T[j] / dT[j]) if j < s else 1.0
    return w0, w1, mu1_t, mu, nu, mu_t, gam_t, c


def make_rkc2_step(s: int):
    """Build an s-stage RKC2 stepper ``step(f, y, t, dt)`` (differentiable;
    stages run in a lax.scan with static coefficients)."""
    import numpy as np

    w0, w1, mu1_t, mu_np, nu_np, mu_t_np, gam_t_np, c_np = _rkc2_coeffs(s)
    mu1_t = float(mu1_t)  # weak-typed: never promotes an f32 state under x64

    def step(f, y, t, dt):
        # coefficients in the STATE dtype: under jax_enable_x64 the raw f64
        # numpy tables would silently promote an f32 solve to f64 (scan
        # carry dtype mismatch); Python-float scalars stay weak-typed
        mu, nu, mu_t, gam_t, c = (
            jnp.asarray(a, dtype=y.dtype)
            for a in (mu_np, nu_np, mu_t_np, gam_t_np, c_np)
        )
        f0 = f(y, t)
        y1 = y + mu1_t * dt * f0

        def stage(carry, j):
            y_jm1, y_jm2 = carry
            f_j = f(y_jm1, t + c[j - 1] * dt)
            y_j = (
                (1.0 - mu[j] - nu[j]) * y
                + mu[j] * y_jm1
                + nu[j] * y_jm2
                + mu_t[j] * dt * f_j
                + gam_t[j] * dt * f0
            )
            return (y_j, y_jm1), None

        (y_s, _), _ = lax.scan(stage, (y1, y), jnp.arange(2, s + 1))
        return y_s

    return step


def rkc_stages_for(dx, dy, h_max, a_max, n=3.0, rho=900.0, g=9.81,
                   step=1.0 / 12.0, slope_max: float = 0.3, safety: float = 1.2) -> int:
    """Stage count s with 0.65·s² ≥ safety·dt·λ_max for one save interval —
    the RKC analogue of :func:`suggest_substeps` (quadratic instead of linear
    cost in the stiffness)."""
    import math

    gamma = 2.0 * a_max * (rho * g) ** n / (n + 2.0)
    d_max = gamma * float(h_max) ** (n + 2.0) * slope_max ** (n - 1.0)
    lam = 4.0 * d_max / min(float(dx), float(dy)) ** 2
    return max(int(math.ceil(math.sqrt(safety * step * lam / 0.65))), 2)


_STEPPERS = {"RK4": rk4_step, "SSPRK3": ssprk3_step, "Euler": euler_step}


def get_stepper(method: str, rkc_stages: int = 16):
    """Resolve a stepper name; "RKC" builds an s-stage Chebyshev stepper."""
    if method == "RKC":
        return make_rkc2_step(rkc_stages)
    return _STEPPERS[method]


# ---------------------------------------------------------------------------
# Fixed-substep scan integrator (differentiable)
# ---------------------------------------------------------------------------

def integrate_scan(
    rhs: Callable,
    y0,
    tstops,
    substeps: int,
    method: str = "RK4",
    callback: Optional[Callable] = None,
    checkpoint: bool = True,
    rkc_stages: int = 16,
    compensated: bool = False,
):
    """Integrate ``dy/dt = rhs(y, t)`` saving at every tstop.

    ``callback(y, t0, t1, interval_idx) -> y`` runs at the end of each save
    interval (MB application, periodic law refresh). With ``checkpoint=True``
    each interval is rematerialized in the backward pass, so reverse-mode
    memory is O(n_tstops) states instead of O(n_tstops·substeps) — the
    TPU-native analogue of checkpointed adjoints (SURVEY §5 long-context note).

    ``compensated=True`` (Euler/SSPRK3/RK4) accumulates the state with Kahan
    compensated summation in increment form: over K substeps the plain f32
    update y ⊕ Δ random-walks an O(√K·ε·|y|) rounding error (measured
    ~5e-5–1e-4 relative over a 5-yr monthly solve — the f32 accuracy floor),
    which compensation eliminates at 4 extra VPU adds per substep, recovering
    near-f64 trajectory accuracy at f32 speed on hardware with no native f64
    (the TPU answer to the reference's Float64 default). Callback jumps are
    folded in as increments (Sterbenz-exact for |jump| ≪ |y|), preserving the
    compensation across MB applications.

    Returns the trajectory, shape ``(len(tstops), *y0.shape)`` with
    ``traj[0] = y0``.
    """
    tstops = jnp.asarray(tstops, dtype=jnp.result_type(y0))
    t0s, t1s = tstops[:-1], tstops[1:]
    idxs = jnp.arange(t0s.shape[0])

    if compensated:
        if method not in _INCREMENTS:
            raise ValueError(
                f"compensated accumulation supports Euler/SSPRK3/RK4, not "
                f"{method!r} (RKC's recursion has no cancellation-free "
                "increment form; SI compensation lives in the implicit solve)"
            )
        inc_fn = _INCREMENTS[method]

        def kahan_add(y, c, inc):
            delta = inc - c
            t = y + delta
            c = (t - y) - delta
            return t, c

        def interval(carry, xs):
            y, c = carry
            t0, t1, i = xs
            dt = (t1 - t0) / substeps

            def sub(state, k):
                yc, cc = state
                inc = inc_fn(rhs, yc, t0 + k * dt, dt)
                return kahan_add(yc, cc, inc), None

            (y, c), _ = lax.scan(sub, (y, c), jnp.arange(substeps))
            if callback is not None:
                y_cb = callback(y, t0, t1, i)
                y, c = kahan_add(y, c, y_cb - y)
            return (y, c), y

        body = jax.checkpoint(interval) if checkpoint else interval
        _, traj = lax.scan(body, (y0, jnp.zeros_like(y0)), (t0s, t1s, idxs))
        return jnp.concatenate([y0[None], traj], axis=0)

    step_fn = get_stepper(method, rkc_stages)

    def interval(y, xs):
        t0, t1, i = xs
        dt = (t1 - t0) / substeps

        def sub(yc, k):
            return step_fn(rhs, yc, t0 + k * dt, dt), None

        y, _ = lax.scan(sub, y, jnp.arange(substeps))
        if callback is not None:
            y = callback(y, t0, t1, i)
        return y, y

    body = jax.checkpoint(interval) if checkpoint else interval
    _, traj = lax.scan(body, y0, (t0s, t1s, idxs))
    return jnp.concatenate([y0[None], traj], axis=0)


# ---------------------------------------------------------------------------
# Adaptive Bogacki–Shampine 3(2) integrator (forward-only)
# ---------------------------------------------------------------------------

def _bs32_step(f, y, t, dt, k1):
    """One embedded BS3(2) step with FSAL. Returns (y3, err, k4)."""
    k2 = f(y + 0.5 * dt * k1, t + 0.5 * dt)
    k3 = f(y + 0.75 * dt * k2, t + 0.75 * dt)
    y3 = y + dt * (2.0 * k1 + 3.0 * k2 + 4.0 * k3) / 9.0
    k4 = f(y3, t + dt)
    err = dt * (-5.0 * k1 / 72.0 + k2 / 12.0 + k3 / 9.0 - k4 / 8.0)
    return y3, err, k4


def integrate_adaptive(
    rhs: Callable,
    y0,
    tstops,
    rtol: float = 1e-8,
    atol: float = 1e-8,
    dt0: Optional[float] = None,
    max_steps_per_interval: int = 100_000,
    callback: Optional[Callable] = None,
    return_stats: bool = False,
    return_dts: int = 0,
):
    """Adaptive BS3(2) integration hitting every tstop exactly.

    The error controller follows the standard PI form with safety 0.9 and
    growth clamp [0.2, 5]; dt is truncated to land on the interval end. The
    outer save loop is a scan; the inner accept/reject loop a while_loop —
    forward-only, mirroring the reference's adaptive forward solves
    (SolverParameters.reltol, /root/reference/test/params_construction.jl:5-13;
    the forward solve passes ``reltol = params.solver.reltol``,
    inversion_utils.jl:559-568).

    ``callback(y, t0, t1, interval_idx) -> y`` runs at the end of each save
    interval (MB application) — same contract as :func:`integrate_scan`; the
    FSAL derivative is recomputed after a callback since the state jumped.

    ``return_stats=True`` additionally returns the per-interval ACCEPTED step
    counts, shape ``(len(tstops) - 1,)`` — the calibration signal
    ``substeps="auto"`` uses to size the fixed-shape training integrators.

    ``return_dts=cap`` (int > 0) additionally returns the accepted step
    lengths per interval, shape ``(len(tstops) - 1, cap)``, zero-padded past
    each interval's accepted count — the record that
    :func:`integrate_replay` re-executes as a concrete (differentiable) step
    sequence. Accepted steps beyond ``cap`` are DROPPED from the record (the
    trajectory itself is unaffected); callers must check the accepted counts
    (``return_stats``) against ``cap`` — ``resolve_replay`` sizes ``cap``
    from a counting probe first so overflow cannot occur.
    """
    tstops = jnp.asarray(tstops, dtype=jnp.result_type(y0))
    dt_init = jnp.asarray(dt0 if dt0 is not None else (tstops[1] - tstops[0]) / 100.0, y0.dtype)
    record = int(return_dts) > 0

    def err_norm(err, y_a, y_b):
        scale = atol + rtol * jnp.maximum(jnp.abs(y_a), jnp.abs(y_b))
        return jnp.sqrt(jnp.mean((err / scale) ** 2))

    def interval(carry, xs):
        t0i, t1, i = xs
        y, t, dt, k1, nfe = carry
        dts0 = jnp.zeros((int(return_dts),), tstops.dtype) if record else jnp.zeros((0,), tstops.dtype)

        def cond(state):
            y, t, dt, k1, it, nacc, nfe, dts = state
            return (t < t1 - 1e-12) & (it < max_steps_per_interval)

        def body(state):
            y, t, dt, k1, it, nacc, nfe, dts = state
            dt_eff = jnp.minimum(dt, t1 - t)
            y3, err, k4 = _bs32_step(rhs, y, t, dt_eff, k1)
            en = err_norm(err, y, y3)
            accept = en <= 1.0
            fac = jnp.clip(0.9 * (en + 1e-16) ** (-1.0 / 3.0), 0.2, 5.0)
            dt_new = dt_eff * fac
            y = jnp.where(accept, y3, y)
            t = jnp.where(accept, t + dt_eff, t)
            k1 = jax.tree.map(lambda new, old: jnp.where(accept, new, old), k4, k1)
            if record:
                # record accepted dts at the accepted-count cursor; rejected
                # trials write dt 0 at an index that the next accept reuses
                dts = dts.at[nacc].set(jnp.where(accept, dt_eff, dts[nacc]),
                                       mode="drop")
            # on reject, k1 at (y, t) is unchanged (FSAL only advances on accept)
            return (y, t, dt_new, k1, it + 1, nacc + accept, nfe + 3, dts)

        y, t, dt, k1, _, nacc, nfe, dts = lax.while_loop(
            cond, body, (y, t, dt, k1, 0, jnp.asarray(0), nfe, dts0))
        if callback is not None:
            y = callback(y, t0i, t1, i)
            k1 = rhs(y, t1)          # state jumped; FSAL derivative is stale
            nfe = nfe + 1
        return (y, t, dt, k1, nfe), (y, nacc, dts)

    k1_0 = rhs(y0, tstops[0])
    idxs = jnp.arange(tstops.shape[0] - 1)
    carry0 = (y0, tstops[0], dt_init, k1_0, jnp.asarray(1))
    (yf, tf, dtf, k1f, nfe), (traj, naccs, dts) = lax.scan(
        interval, carry0, (tstops[:-1], tstops[1:], idxs))
    traj = jnp.concatenate([y0[None], traj], axis=0)
    extras = ()
    if return_stats:
        extras = extras + (naccs,)
    if record:
        extras = extras + (dts,)
    if extras:
        return (traj,) + extras
    return traj


def _bs3_step(f, y, t, dt):
    """One (non-embedded) Bogacki–Shampine 3rd-order step — the exact update
    :func:`_bs32_step` applies on accept (its y3 does not involve the FSAL
    stage k4, and its k1 = f(y, t) is what a fresh evaluation computes), so a
    replay of recorded accepted dts through this stepper reproduces the
    adaptive trajectory to roundoff."""
    k1 = f(y, t)
    k2 = f(y + 0.5 * dt * k1, t + 0.5 * dt)
    k3 = f(y + 0.75 * dt * k2, t + 0.75 * dt)
    return y + dt * (2.0 * k1 + 3.0 * k2 + 4.0 * k3) / 9.0


def integrate_replay(
    rhs: Callable,
    y0,
    tstops,
    dts,
    callback: Optional[Callable] = None,
    checkpoint: bool = True,
):
    """Replay a recorded adaptive solve as a concrete, DIFFERENTIABLE step
    sequence (the record-and-replay adjoint strategy: the reference
    differentiates through its adaptive RDPK3Sp35 solve via
    InterpolatingAdjoint, /root/reference/src/parameters/UDEparameters.jl:14-80;
    here the accepted dt sequence of one error-controlled BS3(2) forward
    becomes a fixed ``lax.scan`` schedule that reverse-mode AD and the
    checkpointed-interval machinery handle like any fixed-substep solve).

    ``dts``: shape ``(len(tstops) - 1, cap)`` — per-interval accepted step
    lengths from ``integrate_adaptive(..., return_dts=cap)``, zero-padded.
    Zero-length steps are exact no-ops of the BS3 update (y + 0·k ≡ y), so
    padding costs FLOPs but not accuracy; gradients through padded steps are
    exactly the identity. The replayed trajectory equals the adaptive one to
    roundoff, and its gradient is the exact gradient of the replayed
    (= error-controlled) trajectory with the step sizes held fixed — the same
    convention as the reference's interpolating adjoint, which also treats
    the accepted time grid as data.
    """
    tstops = jnp.asarray(tstops, dtype=jnp.result_type(y0))
    dts = jnp.asarray(dts, dtype=tstops.dtype)
    t0s, t1s = tstops[:-1], tstops[1:]
    idxs = jnp.arange(t0s.shape[0])

    def interval(y, xs):
        t0, t1, i, dts_i = xs

        def sub(carry, dt):
            yc, tc = carry
            yn = _bs3_step(rhs, yc, tc, dt)
            return (yn, tc + dt), None

        (y, _), _ = lax.scan(sub, (y, t0), dts_i)
        if callback is not None:
            y = callback(y, t0, t1, i)
        return y, y

    body = jax.checkpoint(interval) if checkpoint else interval
    _, traj = lax.scan(body, y0, (t0s, t1s, idxs, dts))
    return jnp.concatenate([y0[None], traj], axis=0)
