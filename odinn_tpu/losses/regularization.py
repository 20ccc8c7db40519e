"""Regularization terms (Tikhonov/Laplacian family).

TPU-native rebuild of /root/reference/src/losses/Regularization.jl:33-390:
- ``laplacian`` (∇², staggered double-difference with zero boundary,
  Regularization.jl:330-350) + its hand adjoint ``laplacian_vjp``
  (Regularization.jl:372-383)
- ``TikhonovRegularization``     — Σ_mask (∇²a)²
- ``InitialThicknessRegularization`` — Tikhonov on the trainable H₀ at t₀
- ``VelocityRegularization``     — Tikhonov on |V|(H, θ)
- ``RheologyRegularization``     — Tikhonov on the tanh-bounded gridded A
- ``DiffusivityRegularization``  — Tikhonov on D (struct parity)

Terms expose ``kind`` so the loss pipeline evaluates them with the right
cadence: "initial" terms once per solve, "transient" terms per tstop.
backward passes come from JAX AD; the analytic Laplacian VJP is kept for the
hand-written adjoint path and tested against AD.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax.numpy as jnp

from odinn_tpu.core.glacier import is_in_glacier

__all__ = [
    "laplacian",
    "laplacian_vjp",
    "TikhonovRegularization",
    "InitialThicknessRegularization",
    "VelocityRegularization",
    "RheologyRegularization",
    "DiffusivityRegularization",
]


def laplacian(a, dx, dy):
    """∇²a on the interior, zero on the boundary ring
    (Regularization.jl:330-350)."""
    d2x = (a[..., 2:, 1:-1] - 2.0 * a[..., 1:-1, 1:-1] + a[..., :-2, 1:-1]) / dx**2
    d2y = (a[..., 1:-1, 2:] - 2.0 * a[..., 1:-1, 1:-1] + a[..., 1:-1, :-2]) / dy**2
    out = d2x + d2y
    pad = [(0, 0)] * (a.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(out, pad)


def laplacian_vjp(lam, a, dx, dy):
    """⟨λ, ∇²·⟩ pullback — VJP_λ_∂∇²a_∂a equivalent
    (Regularization.jl:372-383). The Laplacian with zero boundary is
    self-adjoint up to the boundary handling; implemented as the exact
    transpose of :func:`laplacian`."""
    lam_in = lam[..., 1:-1, 1:-1]
    pad2 = [(0, 0)] * (a.ndim - 2)
    out = jnp.zeros_like(a)
    # x second difference transpose
    out = out + jnp.pad(lam_in, pad2 + [(2, 0), (1, 1)]) / dx**2
    out = out - 2.0 * jnp.pad(lam_in, pad2 + [(1, 1), (1, 1)]) / dx**2
    out = out + jnp.pad(lam_in, pad2 + [(0, 2), (1, 1)]) / dx**2
    # y second difference transpose
    out = out + jnp.pad(lam_in, pad2 + [(1, 1), (2, 0)]) / dy**2
    out = out - 2.0 * jnp.pad(lam_in, pad2 + [(1, 1), (1, 1)]) / dy**2
    out = out + jnp.pad(lam_in, pad2 + [(1, 1), (0, 2)]) / dy**2
    return out


@dataclass(frozen=True)
class TikhonovRegularization:
    """Σ_mask (∇²a)² (Regularization.jl:33-52,113-138)."""

    distance: int = 3

    def __call__(self, a, dx, dy, mask):
        m = mask.astype(a.dtype)
        return jnp.sum(m * laplacian(a, dx, dy) ** 2)

    def residual(self, a, dx, dy, mask):
        """√m·∇²a — an array r with Σr² == __call__ (Gauss–Newton trainer)."""
        m = mask.astype(a.dtype)
        return jnp.sqrt(m) * laplacian(a, dx, dy)


@dataclass(frozen=True)
class InitialThicknessRegularization:
    """Tikhonov on the trainable initial thickness at t₀
    (Regularization.jl:58-71,141-191). kind="initial": evaluated once per
    glacier per loss evaluation."""

    reg: Any = field(default_factory=TikhonovRegularization)
    t0: float = None   # informational; evaluated at solve start
    kind: str = "initial"

    def __call__(self, ctx, H_pred, t):
        # H_pred here is the *initial* filtered thickness H₀(θ)
        mask = jnp.ones(H_pred.shape, bool)
        return self.reg(H_pred, ctx.dx, ctx.dy, mask)

    def residuals(self, ctx, H_pred, t):
        mask = jnp.ones(H_pred.shape, bool)
        return (self.reg.residual(H_pred, ctx.dx, ctx.dy, mask),)


@dataclass(frozen=True)
class VelocityRegularization:
    """Tikhonov on |V|(H, θ) inside the glacier
    (Regularization.jl:75-89,192-255). kind="transient"."""

    reg: Any = field(default_factory=TikhonovRegularization)
    components: str = "abs"
    distance: int = 3
    kind: str = "transient"

    def __call__(self, ctx, H_pred, t):
        if self.components != "abs":
            raise NotImplementedError(f"VelocityRegularization components {self.components}")
        vx, vy, v = ctx.velocity_fn(H_pred, t)
        mask = is_in_glacier(H_pred, self.distance) & (v > 0.0)
        return self.reg(v, ctx.dx, ctx.dy, mask)

    def residuals(self, ctx, H_pred, t):
        if self.components != "abs":
            raise NotImplementedError(f"VelocityRegularization components {self.components}")
        vx, vy, v = ctx.velocity_fn(H_pred, t)
        mask = is_in_glacier(H_pred, self.distance) & (v > 0.0)
        return (self.reg.residual(v, ctx.dx, ctx.dy, mask),)


@dataclass(frozen=True)
class RheologyRegularization:
    """Tikhonov on the tanh-parameterized gridded A
    (Regularization.jl:92-103,256-313). kind="initial"."""

    reg: Any = field(default_factory=TikhonovRegularization)
    min_A: float = 8.5e-20
    max_A: float = 8e-17
    kind: str = "initial"

    def __call__(self, ctx, H_pred, t):
        raw = ctx.theta["A"][ctx.glacier_idx]
        a = self.min_A + (self.max_A - self.min_A) * (jnp.tanh(raw) + 1.0) / 2.0
        mask = jnp.ones(a.shape, bool)
        return self.reg(a, ctx.dx, ctx.dy, mask)

    def residuals(self, ctx, H_pred, t):
        raw = ctx.theta["A"][ctx.glacier_idx]
        a = self.min_A + (self.max_A - self.min_A) * (jnp.tanh(raw) + 1.0) / 2.0
        mask = jnp.ones(a.shape, bool)
        return (self.reg.residual(a, ctx.dx, ctx.dy, mask),)


@dataclass(frozen=True)
class DiffusivityRegularization:
    """Struct parity with Regularization.jl:106-109 (loss not implemented in
    the reference either)."""

    reg: Any = field(default_factory=TikhonovRegularization)
    kind: str = "transient"

    def __call__(self, ctx, H_pred, t):
        raise NotImplementedError("DiffusivityRegularization loss is not defined (parity with reference)")
