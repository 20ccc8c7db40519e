"""Time-aggregated losses: terms that cannot be written as ∫ℓ(H(t))dt.

TPU-native rebuild of /root/reference/src/losses/TimeAggregatedLosses.jl:56-377:
- ``LossDhdt``  — mean thickness-change rate between two dates vs an observed
                  dh/dt map (TimeAggregatedLosses.jl:56-170)
- ``LossAvgV``  — time-weighted average surface speed over an interval vs a
                  single (annual) velocity map (TimeAggregatedLosses.jl:171-377)

kind = "aggregate": the loss pipeline calls these once per glacier with the
full saved trajectory, selecting the required tstops with static-shape masked
reductions (the reference instead registers extra tstops via
``discretePostIntegralLossSteps`` and post-processes the solution object).
Backward passes come from reverse-mode AD through the whole trajectory.

Each loss assembles (pred, ref, mask) in ONE helper shared by ``__call__``
and ``residuals`` so the scalar loss and its Gauss–Newton residual form
cannot drift apart (the same invariant `_LossEnv` enforces for the
transient losses).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from odinn_tpu.core.glacier import is_in_glacier
from odinn_tpu.losses.losses import L2Sum, simple_loss, simple_residual

__all__ = ["LossDhdt", "LossAvgV"]


def _state_at(traj, tstops, t):
    """Trajectory state at time t by linear interpolation over saved tstops."""
    idx = jnp.clip(jnp.searchsorted(tstops, t, side="right") - 1, 0, tstops.shape[0] - 2)
    t0, t1 = tstops[idx], tstops[idx + 1]
    w = jnp.where(t1 > t0, (t - t0) / (t1 - t0), 0.0)
    return (1.0 - w) * traj[idx] + w * traj[idx + 1]


@dataclass(frozen=True)
class LossDhdt:
    """((H(t₂) − H(t₁))/(t₂ − t₁) − dh/dt_obs)² inside the glacier
    (TimeAggregatedLosses.jl:56-170)."""

    loss: Any = field(default_factory=L2Sum)
    kind: str = "aggregate"

    def _pred(self, ctx, traj, tstops):
        """(pred, ref, mask) or None when no dh/dt observation is attached."""
        dd = ctx.glacier.dhdt_data
        if dd is None:
            return None
        h1 = _state_at(traj, tstops, dd.t1)
        h2 = _state_at(traj, tstops, dd.t2)
        pred = (h2 - h1) / (dd.t2 - dd.t1)
        mask = is_in_glacier(h2, self.loss.distance)
        return pred, dd.dhdt, mask

    def __call__(self, ctx, traj, tstops):
        pm = self._pred(ctx, traj, tstops)
        if pm is None:
            return jnp.asarray(0.0)
        pred, ref, mask = pm
        return simple_loss(self.loss, pred, ref, mask, ctx.normalization)

    def residuals(self, ctx, traj, tstops):
        """Residual blocks with Σ‖·‖² == __call__ (Gauss–Newton trainer)."""
        pm = self._pred(ctx, traj, tstops)
        if pm is None:
            return ()
        pred, ref, mask = pm
        return (simple_residual(self.loss, pred, ref, mask, ctx.normalization),)


@dataclass(frozen=True)
class LossAvgV:
    """Δt-weighted average surface speed over [date1, date2] vs a single
    observed velocity map (TimeAggregatedLosses.jl:171-377)."""

    loss: Any = field(default_factory=L2Sum)
    kind: str = "aggregate"

    def _pred(self, ctx, traj, tstops):
        """(v_avg, v_ref, mask) or None when no velocity map is attached."""
        vd = ctx.glacier.velocity_data
        if vd is None:
            return None
        v_ref = vd.vabs[0] if vd.vabs.ndim == 3 else vd.vabs
        t1 = vd.date1 if vd.date1 is not None else tstops[0]
        t2 = vd.date2 if vd.date2 is not None else tstops[-1]
        t1 = jnp.reshape(jnp.asarray(t1), ())
        t2 = jnp.reshape(jnp.asarray(t2), ())

        dts = jnp.diff(tstops)
        mids_in = (tstops[1:] >= t1) & (tstops[1:] <= t2)
        w = dts * mids_in
        w = w / jnp.maximum(jnp.sum(w), 1e-12)

        speeds = jax.vmap(lambda H: ctx.velocity_fn(H, tstops[0])[2])(traj[1:])
        v_avg = jnp.tensordot(w, speeds, axes=1)
        mask = v_ref > 0.0
        return v_avg, v_ref, mask

    def __call__(self, ctx, traj, tstops):
        pm = self._pred(ctx, traj, tstops)
        if pm is None:
            return jnp.asarray(0.0)
        v_avg, v_ref, mask = pm
        return simple_loss(self.loss, v_avg, v_ref, mask, ctx.normalization)

    def residuals(self, ctx, traj, tstops):
        """Residual blocks with Σ‖·‖² == __call__ (Gauss–Newton trainer)."""
        pm = self._pred(ctx, traj, tstops)
        if pm is None:
            return ()
        v_avg, v_ref, mask = pm
        return (simple_residual(self.loss, v_avg, v_ref, mask, ctx.normalization),)
