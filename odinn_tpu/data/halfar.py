"""Halfar analytical SIA dome solutions (validation ground truth).

TPU-native equivalent of Huginn's ``HalfarParameters`` / ``Halfar`` /
``Halfar_velocity`` / ``halfar_solution`` (reference usage:
/root/reference/test/test_grad_loss.jl:505,589;
/root/reference/scripts/MWEs/inversion_diffusivity/inversion_setup.jl:53-57).

The generalized Halfar (1981/1983) similarity solution of the flat-bed SIA
equation with Glen exponent ``n`` and optional mass balance M = (λ/t)·H
(Bueler et al. 2005, "Exact solutions and verification of numerical models for
isothermal ice sheets"):

    H(r, t) = H₀ (t/t₀)^{-α} [ 1 − ((t/t₀)^{-β} r/R₀)^{(n+1)/n} ]₊^{n/(2n+1)}

    α = (2 − (n+1)λ) / (5n+3)
    β = (1 + (2n+1)λ) / (5n+3)
    t₀ = (β/Γ) ((2n+1)/(n+1))ⁿ R₀^{n+1} / H₀^{2n+1},     Γ = 2A(ρg)ⁿ/(n+2)

At t = t₀ the dome has maximal height H₀ and margin radius R₀.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from odinn_tpu.core.params import PhysicalParameters

__all__ = ["HalfarParameters", "Halfar", "halfar_solution", "halfar_velocity", "halfar_t0"]


@dataclass(frozen=True)
class HalfarParameters:
    """Parameters of the generalized Halfar dome (mirrors Huginn.HalfarParameters)."""

    lam: float = 0.0       # λ mass-balance coefficient, M = (λ/t) H
    R0: float = 2000.0     # margin radius at t₀ [m]
    H0: float = 400.0      # dome height at t₀ [m]
    A: float = 1.1e-17     # Glen creep coefficient [Pa⁻ⁿ yr⁻¹]
    n: float = 3.0         # Glen exponent
    rho: float = 900.0
    g: float = 9.81


def _gamma(A, n, rho, g):
    return 2.0 * A * (rho * g) ** n / (n + 2.0)


def halfar_t0(p: HalfarParameters) -> float:
    """Characteristic time t₀ at which the dome has profile (H₀, R₀)."""
    n, lam = p.n, p.lam
    beta = (1.0 + (2.0 * n + 1.0) * lam) / (5.0 * n + 3.0)
    gam = _gamma(p.A, n, p.rho, p.g)
    return (beta / gam) * ((2.0 * n + 1.0) / (n + 1.0)) ** n * (
        p.R0 ** (n + 1.0) / p.H0 ** (2.0 * n + 1.0)
    )


def Halfar(p: HalfarParameters):
    """Return ``(halfar_fn, t0)`` with ``halfar_fn(x, y, t) -> H``.

    Mirrors Huginn's ``Halfar(halfar_params)`` as used at
    /root/reference/scripts/MWEs/inversion_diffusivity/inversion_setup.jl:54.
    Time runs on the solution's intrinsic clock: at ``t = t0`` the dome has
    height H₀ and radius R₀.
    """
    t0 = halfar_t0(p)
    n, lam = p.n, p.lam
    alpha = (2.0 - (n + 1.0) * lam) / (5.0 * n + 3.0)
    beta = (1.0 + (2.0 * n + 1.0) * lam) / (5.0 * n + 3.0)

    def halfar_fn(x, y, t):
        r = jnp.sqrt(jnp.asarray(x) ** 2 + jnp.asarray(y) ** 2)
        tr = t / t0
        xi = tr ** (-beta) * r / p.R0
        core = jnp.maximum(0.0, 1.0 - xi ** ((n + 1.0) / n))
        return p.H0 * tr ** (-alpha) * core ** (n / (2.0 * n + 1.0))

    return halfar_fn, t0


def halfar_solution(r, t, h0, r0, A, n, physical: PhysicalParameters, lam: float = 0.0):
    """Evaluate the Halfar dome at radius array ``r`` and intrinsic time ``t``.

    Mirrors Huginn's ``halfar_solution(R₀, t, h₀, r₀, A, n, physicalParams)``
    (usage: /root/reference/test/test_grad_loss.jl:505,589). ``t`` is intrinsic
    similarity time; the dome has profile (h₀, r₀) at t = t₀(A, n, h₀, r₀).
    """
    p = HalfarParameters(lam=lam, R0=r0, H0=h0, A=A, n=n, rho=physical.rho, g=physical.g)
    fn, _ = Halfar(p)
    return fn(r, jnp.zeros_like(jnp.asarray(r)), t)


def halfar_velocity(p: HalfarParameters):
    """Return ``vel_fn(x, y, t) -> (vx, vy)`` surface velocity of the Halfar dome.

    SIA surface velocity on a flat bed:
        V_s = −Γꜛ Hⁿ⁺¹ |∇H|ⁿ⁻¹ ∇H,   Γꜛ = 2A(ρg)ⁿ/(n+1)
    with the radial thickness gradient evaluated analytically.
    Mirrors Huginn.Halfar_velocity (usage:
    /root/reference/scripts/MWEs/inversion_diffusivity/inversion_setup.jl:55).
    """
    t0 = halfar_t0(p)
    n, lam = p.n, p.lam
    alpha = (2.0 - (n + 1.0) * lam) / (5.0 * n + 3.0)
    beta = (1.0 + (2.0 * n + 1.0) * lam) / (5.0 * n + 3.0)
    gam_up = 2.0 * p.A * (p.rho * p.g) ** n / (n + 1.0)

    def vel_fn(x, y, t):
        x = jnp.asarray(x, dtype=jnp.result_type(float))
        y = jnp.asarray(y, dtype=x.dtype)
        r = jnp.sqrt(x**2 + y**2)
        tr = t / t0
        xi = tr ** (-beta) * r / p.R0
        core = jnp.maximum(0.0, 1.0 - xi ** ((n + 1.0) / n))
        H = p.H0 * tr ** (-alpha) * core ** (n / (2.0 * n + 1.0))
        # dH/dr = H₀ tr^{-α} · n/(2n+1) · core^{n/(2n+1)-1} · (−(n+1)/n ξ^{1/n}) · tr^{-β}/R₀
        eps = jnp.asarray(1e-12, x.dtype)
        dHdr = jnp.where(
            (core > 0.0) & (r > 0.0),
            p.H0
            * tr ** (-alpha)
            * (n / (2.0 * n + 1.0))
            * jnp.maximum(core, eps) ** (n / (2.0 * n + 1.0) - 1.0)
            * (-(n + 1.0) / n)
            * jnp.maximum(xi, eps) ** (1.0 / n)
            * tr ** (-beta)
            / p.R0,
            0.0,
        )
        vmag = gam_up * H ** (n + 1.0) * jnp.abs(dHdr) ** (n - 1.0)
        rx = jnp.where(r > 0.0, x / jnp.maximum(r, eps), 0.0)
        ry = jnp.where(r > 0.0, y / jnp.maximum(r, eps), 0.0)
        return -vmag * dHdr * rx, -vmag * dHdr * ry

    return vel_fn
