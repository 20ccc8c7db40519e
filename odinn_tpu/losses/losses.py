"""Empirical loss functions.

TPU-native rebuild of /root/reference/src/losses/Losses.jl:
- ``L2Sum`` (masked L2 at ≥ distance px inside the margin, Losses.jl:29-151)
- ``LogSum`` (Morlighem log-ratio loss, Losses.jl:188-248)
- ``LossH`` / ``LossV`` / ``LossHV`` composite losses (Losses.jl:250-441)
- ``MultiLoss`` weighted sums (/root/reference/src/losses/MultiLoss.jl:22-194)

Design: forward-only pure functions — reverse-mode AD supplies every
``backward_loss`` the reference hand-writes. The analytic backward forms are
still provided (``backward_simple_loss``) for the hand-written discrete
adjoint path, tested against AD in tests/test_losses.py.

Masking uses ``jnp.where`` (never boolean indexing) so every loss is fixed
shape and fuses into one XLA reduction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from odinn_tpu.core.glacier import is_in_glacier

__all__ = [
    "L2Sum",
    "LogSum",
    "LossH",
    "LossV",
    "LossHV",
    "MultiLoss",
    "simple_loss",
    "simple_residual",
    "backward_simple_loss",
    "loss_uses_velocity",
]


@dataclass(frozen=True)
class L2Sum:
    """Masked L2 loss: Σ_mask (a − b)² / normalization (Losses.jl:29-151)."""

    distance: int = 3


@dataclass(frozen=True)
class LogSum:
    """Morlighem log-ratio loss: Σ_mask log²((a+ϵ)/(b+ϵ)) / normalization
    (Losses.jl:188-248)."""

    distance: int = 3
    eps: float = 0.1


def simple_loss(cfg, a, b, mask, normalization):
    """Forward of the simple losses; mask is a boolean array."""
    m = mask.astype(a.dtype)
    if isinstance(cfg, L2Sum):
        return jnp.sum(m * (a - b) ** 2) / normalization
    if isinstance(cfg, LogSum):
        r = jnp.log((jnp.maximum(a, 0.0) + cfg.eps) / (jnp.maximum(b, 0.0) + cfg.eps))
        return jnp.sum(m * r**2) / normalization
    raise TypeError(f"unknown simple loss {cfg!r}")


def simple_residual(cfg, a, b, mask, normalization):
    """Flattened-residual form: an array r with Σr² == simple_loss(...).

    Both simple losses are exact least squares, which is what lets the
    Gauss–Newton/LM trainer (inverse.gauss_newton) cover them: L2Sum's
    residual is √(m/norm)·(a−b), LogSum's is √(m/norm)·log((a+ϵ)/(b+ϵ)).
    """
    m = mask.astype(a.dtype)
    w = jnp.sqrt(m / normalization)
    if isinstance(cfg, L2Sum):
        return w * (a - b)
    if isinstance(cfg, LogSum):
        return w * jnp.log(
            (jnp.maximum(a, 0.0) + cfg.eps) / (jnp.maximum(b, 0.0) + cfg.eps)
        )
    raise TypeError(f"unknown simple loss {cfg!r}")


def backward_simple_loss(cfg, a, b, mask, normalization):
    """Analytic ∂loss/∂a (reference backward_loss, Losses.jl:142-151,218-227);
    used by the hand-written adjoints, equals jax.grad of simple_loss."""
    m = mask.astype(a.dtype)
    if isinstance(cfg, L2Sum):
        return 2.0 * m * (a - b) / normalization
    if isinstance(cfg, LogSum):
        ap = jnp.maximum(a, 0.0) + cfg.eps
        bp = jnp.maximum(b, 0.0) + cfg.eps
        grad = 2.0 * m * jnp.log(ap / bp) / ap / normalization
        return grad * (a > 0.0)
    raise TypeError(f"unknown simple loss {cfg!r}")


@dataclass(frozen=True)
class LossH:
    """Ice-thickness loss (Losses.jl:250-290)."""

    loss: Any = field(default_factory=L2Sum)

    def __call__(self, ctx, H_pred, t):
        H_ref = ctx.H_ref
        if H_ref is None:
            return jnp.asarray(0.0)
        mask = is_in_glacier(H_ref, self.loss.distance)
        return simple_loss(self.loss, H_pred, H_ref, mask, ctx.normalization)

    def residuals(self, ctx, H_pred, t):
        """Residual blocks with Σ‖·‖² == __call__ (Gauss–Newton trainer)."""
        if ctx.H_ref is None:
            return ()
        mask = is_in_glacier(ctx.H_ref, self.loss.distance)
        return (simple_residual(self.loss, H_pred, ctx.H_ref, mask, ctx.normalization),)


@dataclass(frozen=True)
class LossV:
    """Surface-velocity loss (Losses.jl:292-360).

    ``component``: "xy" compares (Vx, Vy); "abs" compares |V|. With
    ``scale_loss`` the loss is divided by the mean reference speed.
    """

    loss: Any = field(default_factory=L2Sum)
    component: str = "xy"
    scale_loss: bool = True

    def __call__(self, ctx, H_pred, t):
        if ctx.V_ref is None:
            return jnp.asarray(0.0)
        vx, vy, vabs = ctx.velocity_fn(H_pred, t)
        mask = ctx.V_ref > 0.0
        if self.component == "xy":
            l = simple_loss(self.loss, vx, ctx.Vx_ref, mask, ctx.normalization) + simple_loss(
                self.loss, vy, ctx.Vy_ref, mask, ctx.normalization
            )
        elif self.component == "abs":
            l = simple_loss(self.loss, vabs, ctx.V_ref, mask, ctx.normalization)
        else:
            raise ValueError(f"unknown velocity component {self.component!r}")
        if self.scale_loss:
            l = l / self._speed_scale(ctx, mask, vx.dtype)
        return l

    def _speed_scale(self, ctx, mask, dtype):
        m = mask.astype(dtype)
        mean_speed = jnp.sqrt(
            jnp.sum(m * (ctx.Vx_ref**2 + ctx.Vy_ref**2)) / jnp.maximum(jnp.sum(m), 1.0)
        )
        return jnp.maximum(mean_speed, 1e-12)

    def residuals(self, ctx, H_pred, t):
        """Residual blocks with Σ‖·‖² == __call__ (Gauss–Newton trainer).
        The scale_loss divisor depends on the references only, so it folds
        into the residual as a √-factor without breaking least-squares form."""
        if ctx.V_ref is None:
            return ()
        vx, vy, vabs = ctx.velocity_fn(H_pred, t)
        mask = ctx.V_ref > 0.0
        s = jnp.sqrt(1.0 / self._speed_scale(ctx, mask, vx.dtype)) \
            if self.scale_loss else jnp.asarray(1.0, vx.dtype)
        if self.component == "xy":
            return (
                s * simple_residual(self.loss, vx, ctx.Vx_ref, mask, ctx.normalization),
                s * simple_residual(self.loss, vy, ctx.Vy_ref, mask, ctx.normalization),
            )
        if self.component == "abs":
            return (s * simple_residual(self.loss, vabs, ctx.V_ref, mask, ctx.normalization),)
        raise ValueError(f"unknown velocity component {self.component!r}")


@dataclass(frozen=True)
class LossHV:
    """LossH + scaling·LossV (Losses.jl:384-441)."""

    hLoss: Any = field(default_factory=LossH)
    vLoss: Any = field(default_factory=LossV)
    scaling: float = 1.0

    def __call__(self, ctx, H_pred, t):
        return self.hLoss(ctx, H_pred, t) + self.scaling * self.vLoss(ctx, H_pred, t)

    def residuals(self, ctx, H_pred, t):
        s = jnp.sqrt(jnp.asarray(self.scaling))
        return self.hLoss.residuals(ctx, H_pred, t) + tuple(
            s * r for r in self.vLoss.residuals(ctx, H_pred, t)
        )


@dataclass(frozen=True)
class MultiLoss:
    """Weighted sum Σ λᵢ·lossᵢ (MultiLoss.jl:22-194). Terms may be empirical
    losses (called per tstop) or regularizations (see losses.regularization)."""

    terms: Tuple[Any, ...] = ()
    weights: Tuple[float, ...] = ()

    def __post_init__(self):
        if len(self.terms) != len(self.weights):
            raise ValueError("MultiLoss terms and weights must have equal length")

    def __call__(self, ctx, H_pred, t):
        total = jnp.asarray(0.0)
        for w, term in zip(self.weights, self.terms):
            total = total + w * term(ctx, H_pred, t)
        return total


def loss_uses_velocity(cfg) -> bool:
    """Trait mirror of Losses.jl:439-441."""
    if isinstance(cfg, LossV):
        return True
    if isinstance(cfg, LossHV):
        return True
    if isinstance(cfg, MultiLoss):
        return any(loss_uses_velocity(t) for t in cfg.terms)
    return False


@dataclass(frozen=True)
class LossContext:
    """Per-(glacier, tstop) loss inputs: references + the velocity diagnostic
    closure (replaces threading `simulation` through 10-arg loss signatures,
    Losses.jl:250-265)."""

    H_ref: Any = None
    V_ref: Any = None
    Vx_ref: Any = None
    Vy_ref: Any = None
    velocity_fn: Any = None
    normalization: Any = 1.0
    theta: Any = None
    glacier_idx: Any = None
    glacier: Any = None
    dx: Any = None
    dy: Any = None


def term_kind(term) -> str:
    """Evaluation cadence of a loss term: "transient" (per tstop, Δt-weighted),
    "initial" (once, at solve start), "aggregate" (once, on the trajectory)."""
    return getattr(term, "kind", "transient")
