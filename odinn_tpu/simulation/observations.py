"""Time-matched observation lookup — the ONE implementation shared by the
forward loss (simulation.inversion), the manual adjoints (inverse.gradient),
and the Gauss–Newton residuals (inverse.gauss_newton).

Matching contract (reference: per-tstop data lookup with ``isnothing(H_ref)``
skips, /root/reference/src/losses/Losses.jl:262-267): ``build_tstops`` merges
times within a few f32 ulps (tol(t) = 1e-9 + 5e-7·|t|, solver.build_tstops)
and keeps the DATA time as the merged representative, so a tstop that carries
an observation matches it to f32 roundoff while surviving non-observation
tstops are strictly farther than tol away. The validity gate therefore uses
the SAME tolerance: a wider gate (≈1.5 days at t≈2010) can falsely match
intermediate save points under sub-weekly save steps and double-count the
observation in the transient loss.

The r2 f32 year-scale time-corruption bug lived in this logic; a single
implementation with its own unit tests (tests/test_observations.py) keeps the
three call sites from drifting apart.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["match_time", "thickness_at", "velocity_at", "TIME_MATCH_TOL"]


def TIME_MATCH_TOL(t):
    """Few-f32-ulp time tolerance — MUST equal solver.build_tstops's merge
    tolerance so 'merged into this tstop' and 'matches this tstop' agree."""
    return 1e-9 + 5e-7 * jnp.abs(t)


def match_time(t_obs, t, dtype):
    """Nearest observation index ``k`` and its validity gate (1.0 when the
    observation time coincides with ``t`` up to f32 roundoff, else 0.0)."""
    t_obs = jnp.asarray(t_obs)
    k = jnp.argmin(jnp.abs(t_obs - t))
    valid = (jnp.abs(t_obs[k] - t) < TIME_MATCH_TOL(t)).astype(dtype)
    return k, valid


def thickness_at(td, t, dtype):
    """(H_ref, valid) for a ThicknessData record at time ``t``.

    Returns ``(None, 1.0)`` when there is no thickness data (the reference's
    ``isnothing(H_ref)`` skip).
    """
    if td is None or td.t is None:
        return None, jnp.asarray(1.0, dtype)
    k, valid = match_time(td.t, t, dtype)
    return td.H[k], valid


def velocity_at(vd, t, dtype):
    """(vabs, vx, vy, valid) for a SurfaceVelocityData cube at time ``t``.

    Returns ``(None, None, None, 1.0)`` when there is no time-resolved
    velocity cube attached.
    """
    if vd is None or vd.vabs is None or vd.vabs.ndim != 3:
        return None, None, None, jnp.asarray(1.0, dtype)
    k, valid = match_time(vd.t, t, dtype)
    return vd.vabs[k], vd.vx[k], vd.vy[k], valid
