"""Diffusivity targets: the algebra mapping law outputs to the SIA diffusivity.

TPU-native rebuild of the reference target hierarchy
(/root/reference/src/models/target/Target.jl:6-19):

- ``ATarget``        — learn creep A            (target_A.jl:9-170)
- ``DHybridTarget``  — learn hybrid diffusivity Y (target_D_hybrid.jl:12-372)
- ``DPureTarget``    — learn diffusive velocity U (target_D_pure.jl:34-253)

Each target supplies ``diffusivity`` and the velocity prefactor
``velocity_up`` (Velocityꜛ), plus exact partials ``d_diffusivity_dH`` /
``d_diffusivity_dgradS`` used by the hand-written adjoints. Unlike the
reference, ∂D/∂θ never needs bespoke interpolation caches here: JAX reverse-mode
through these closed-form expressions plays that role (see
odinn_tpu.inverse.vjps).

Notation (target_utils.jl:3-30):
    Γ_noA = 2 (ρg)ⁿ / (n+2)                 (creep prefactor, without A)
    Γꜛ_noA = 2 (ρg)ⁿ / (n+1)                (surface-velocity prefactor)
    S_slide = C (ρg)^{p−q}                  (sliding prefactor)

A-target diffusivity (target_A.jl:17-31):
    D = S_slide H̄^{p−q+1} |∇S|^{p−1} + A Γ_noA H̄^{n+2} |∇S|^{n−1}
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

__all__ = [
    "ATarget",
    "DHybridTarget",
    "DPureTarget",
    "gamma_no_A",
    "gamma_up_no_A",
    "sliding_prefactor",
    "cap_D",
]


def _pow(x, e):
    """x^e with strength reduction: a static integer-valued exponent lowers to
    lax.integer_pow (multiplies on the VPU) instead of the generic powf
    (exp/log) — a ~2x win on the RHS hot path when Glen's n is a static 3.0
    (see SIA2DModel.n_value).

    A *traced* exponent (trainable Glen n, laws.LawN_inversion) additionally
    guards the zero base: d(x^e)/de = x^e·log x is NaN at x = 0 (ice-free
    cells where hbar/|∇S| vanish exactly — see ops.stencils.safe_norm), so
    zero-base cells are pinned to 0 with a zero subgradient, matching the
    safe_norm convention (their diffusivity contribution is 0 there)."""
    if isinstance(e, (int, float)):
        if float(e).is_integer():
            return jax.lax.integer_pow(x, int(e))
        return x ** e
    pos = x > 0.0
    return jnp.where(pos, x, 1.0) ** e * pos


def gamma_no_A(n, rho, g):
    """Γ without A: 2(ρg)ⁿ/(n+2) (target_utils.jl:3-13)."""
    return 2.0 * (rho * g) ** n / (n + 2.0)


def gamma_up_no_A(n, rho, g):
    """Γꜛ without A: 2(ρg)ⁿ/(n+1) (target_utils.jl:21-30)."""
    return 2.0 * (rho * g) ** n / (n + 1.0)


def sliding_prefactor(C, p, q, rho, g):
    """S_slide = C(ρg)^{p−q} (target_utils.jl:15-19)."""
    return C * (rho * g) ** (p - q)


def cap_D(D, max_D):
    """Smooth tanh cap of the diffusivity (target_utils.jl `cap_D`)."""
    return max_D * jnp.tanh(D / max_D)


@dataclass(frozen=True)
class ATarget:
    """Learn the creep coefficient A (SIA2D_A_target)."""

    name: str = "A"

    def diffusivity(self, vals, hbar, grad_s, phys):
        rho, g = phys.rho, phys.g
        n, A, C, p, q = vals.n, vals.A, vals.C, vals.p, vals.q
        slide = sliding_prefactor(C, p, q, rho, g) * _pow(hbar, p - q + 1.0) * _pow(grad_s, p - 1.0)
        creep = A * gamma_no_A(n, rho, g) * _pow(hbar, n + 2.0) * _pow(grad_s, n - 1.0)
        return slide + creep

    def d_diffusivity_dH(self, vals, hbar, grad_s, phys):
        """∂D/∂H̄ (target_A.jl:33-47)."""
        rho, g = phys.rho, phys.g
        n, A, C, p, q = vals.n, vals.A, vals.C, vals.p, vals.q
        slide = (p - q + 1.0) * sliding_prefactor(C, p, q, rho, g) * _pow(hbar, p - q) * _pow(grad_s, p - 1.0)
        creep = A * gamma_no_A(n, rho, g) * (n + 2.0) * _pow(hbar, n + 1.0) * _pow(grad_s, n - 1.0)
        return slide + creep

    def d_diffusivity_dgradS(self, vals, hbar, grad_s, phys):
        """∂D/∂|∇S| / |∇S| — i.e. β with ∂D/∂∇Sᵢ = β ∇Sᵢ (target_A.jl:49-64)."""
        rho, g = phys.rho, phys.g
        n, A, C, p, q = vals.n, vals.A, vals.C, vals.p, vals.q
        slide = sliding_prefactor(C, p, q, rho, g) * (p - 1.0) * _pow(hbar, p - q + 1.0) * _pow(grad_s, p - 3.0)
        creep = A * gamma_no_A(n, rho, g) * (n - 1.0) * _pow(hbar, n + 2.0) * _pow(grad_s, n - 3.0)
        return slide + creep

    def velocity_up(self, vals, hbar, grad_s, phys):
        """Velocityꜛ: surface-velocity prefactor with V = −Velocityꜛ·∇S
        (target_A.jl:96-112)."""
        rho, g = phys.rho, phys.g
        n, A, C, p, q = vals.n, vals.A, vals.C, vals.p, vals.q
        slide = (
            sliding_prefactor(C, p, q, rho, g)
            * (p - q + 2.0)
            * _pow(hbar, p - q + 1.0)
            * _pow(grad_s, n - 1.0)
        )
        creep = A * gamma_up_no_A(n, rho, g) * _pow(hbar, n + 1.0) * _pow(grad_s, n - 1.0)
        return slide + creep


@dataclass(frozen=True)
class DHybridTarget:
    """Learn the hybrid diffusivity Y = NN(T, H̄) (SIA2D_D_hybrid_target).

    D = S_slide H̄^{p−q+1} |∇S|^{p−1} + Y Γ_noA H̄^{n_H+2} |∇S|^{n_∇S−1}
    (target_D_hybrid.jl:175-186) where n_H / n_∇S optionally decouple the
    thickness/slope exponents from Glen's n.
    """

    name: str = "D_hybrid"
    n_interp_half: int = 75   # kept for API parity; JAX AD replaces interpolation caches

    def diffusivity(self, vals, hbar, grad_s, phys):
        rho, g = phys.rho, phys.g
        n, C, p, q, Y = vals.n, vals.C, vals.p, vals.q, vals.Y
        n_H = vals.n_H if vals.n_H is not None else n
        n_gs = vals.n_gradS if vals.n_gradS is not None else n
        slide = sliding_prefactor(C, p, q, rho, g) * _pow(hbar, p - q + 1.0) * _pow(grad_s, p - 1.0)
        hybrid = Y * gamma_no_A(n, rho, g) * _pow(hbar, n_H + 2.0) * _pow(grad_s, n_gs - 1.0)
        return slide + hybrid

    def velocity_up(self, vals, hbar, grad_s, phys):
        """Velocityꜛ for the hybrid target (target_D_hybrid.jl:225-260):
        D/H̄ scaled from depth-average to surface by (n+2)/(n+1)."""
        rho, g = phys.rho, phys.g
        n, C, p, q, Y = vals.n, vals.C, vals.p, vals.q, vals.Y
        n_H = vals.n_H if vals.n_H is not None else n
        n_gs = vals.n_gradS if vals.n_gradS is not None else n
        slide = (
            sliding_prefactor(C, p, q, rho, g)
            * (p - q + 2.0)
            * hbar ** (p - q + 1.0)
            * grad_s ** (p - 1.0)
        )
        hybrid = Y * gamma_up_no_A(n, rho, g) * _pow(hbar, n_H + 1.0) * _pow(grad_s, n_gs - 1.0)
        return slide + hybrid


@dataclass(frozen=True)
class DPureTarget:
    """Learn the diffusive velocity U = NN(H̄, |∇S|): D = H̄·U
    (SIA2D_D_target, target_D_pure.jl:34-80)."""

    name: str = "D"
    n_interp_half: int = 75

    def diffusivity(self, vals, hbar, grad_s, phys):
        return hbar * vals.U

    def velocity_up(self, vals, hbar, grad_s, phys):
        """Velocityꜛ = U / f with f the surface-velocity factor
        (target_D_pure.jl Velocityꜛ: ∂Velocityꜛ∂θ = ∂U∂θ / f)."""
        f = getattr(phys, "f_surface_velocity_factor", 1.0)
        return vals.U / f


@dataclass(frozen=True)
class CappedTarget:
    """Wrap a target with the smooth diffusivity cap D ← max_D·tanh(D/max_D)
    (the reference's cap_D, target_utils.jl; applied when
    SIA2DModel.max_D is set). Closed-form partials are intentionally not
    exposed — the adjoint layer falls back to exact AD pullbacks through the
    capped expression."""

    inner: Any
    max_D: float

    @property
    def name(self) -> str:
        return self.inner.name

    def diffusivity(self, vals, hbar, grad_s, phys):
        return cap_D(self.inner.diffusivity(vals, hbar, grad_s, phys), self.max_D)

    def velocity_up(self, vals, hbar, grad_s, phys):
        return self.inner.velocity_up(vals, hbar, grad_s, phys)


def get_target(name: str):
    return {"A": ATarget(), "D_hybrid": DHybridTarget(), "D": DPureTarget()}[name]
