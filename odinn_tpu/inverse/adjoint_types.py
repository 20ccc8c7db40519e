"""Adjoint-method and VJP-flavor taxonomy.

TPU-native rebuild of:
- ``AbstractAdjointMethod`` hierarchy (/root/reference/src/inverse/AdjointTypes.jl:16-107):
  SciMLSensitivityAdjoint → :class:`JaxAdjoint` (reverse-mode AD through the
  checkpointed solve — in JAX this is the native path, not a plugin),
  ``ContinuousAdjoint``, ``DiscreteAdjoint``, ``DummyAdjoint``.
- ``AbstractVJPMethod`` hierarchy (/root/reference/src/inverse/VJPTypes.jl:10-81):
  DiscreteVJP (hand-written stencil transposes), ContinuousVJP
  (differentiate-then-discretize), EnzymeVJP → :class:`AutoVJP` (jax.vjp of
  the RHS), NoVJP.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

__all__ = [
    "AutoVJP",
    "DiscreteVJP",
    "ContinuousVJP",
    "NoVJP",
    "JaxAdjoint",
    "DiscreteAdjoint",
    "ContinuousAdjoint",
    "DummyAdjoint",
]


# --------------------------- VJP flavors -----------------------------------

@dataclass(frozen=True)
class AutoVJP:
    """VJP of the discretized RHS by reverse-mode AD (EnzymeVJP equivalent,
    VJPTypes.jl:52-66)."""

    name: str = "auto"


@dataclass(frozen=True)
class DiscreteVJP:
    """Hand-written pullback of the discretized RHS via stencil transposes
    (VJPTypes.jl:10-30; implementation odinn_tpu.inverse.vjps)."""

    name: str = "discrete"


@dataclass(frozen=True)
class ContinuousVJP:
    """Differentiate-then-discretize VJP (VJPTypes.jl:32-50): the adjoint PDE
    dλ = ∇·(D∇λ) − ∂D/∂H ⟨∇S,∇λ⟩ + ∇·(∂D/∂∇H ⟨∇S,∇λ⟩) discretized directly."""

    name: str = "continuous"


@dataclass(frozen=True)
class NoVJP:
    """Zero VJP (VJPTypes.jl:68-81) — e.g. to disable the MB contribution."""

    name: str = "none"


# --------------------------- Adjoint methods -------------------------------

@dataclass(frozen=True)
class JaxAdjoint:
    """Reverse-mode AD through the checkpointed lax.scan solve — the
    TPU-native equivalent of SciMLSensitivityAdjoint (AdjointTypes.jl:16-30),
    and the correctness oracle for the manual adjoints."""

    name: str = "jax"


@dataclass(frozen=True)
class DiscreteAdjoint:
    """Reverse-Euler discrete adjoint over the stored tstops
    (AdjointTypes.jl:62-78; driver /root/reference/src/inverse/SIA2D/
    gradient.jl:191-253)."""

    VJP_method: Any = field(default_factory=DiscreteVJP)
    MB_VJP: Any = field(default_factory=AutoVJP)
    substeps: Any = None    # reverse substeps per saved interval (None → solver.substeps)
    name: str = "discrete"


@dataclass(frozen=True)
class ContinuousAdjoint:
    """Continuous adjoint: reverse-time λ ODE + Gauss-quadrature θ contraction
    (AdjointTypes.jl:32-60; driver gradient.jl:350-501)."""

    VJP_method: Any = field(default_factory=ContinuousVJP)
    MB_VJP: Any = field(default_factory=AutoVJP)
    n_quadrature: int = 60
    substeps: int = 10      # reverse-ODE substeps per saved interval
    rtol: float = 1e-6      # reverse λ-solve relative tolerance (AdjointTypes.jl:45)
    atol: float = 1e-8      # reverse λ-solve absolute tolerance (AdjointTypes.jl:46)
    dtmax: Optional[float] = None   # max reverse step; None = interval length
    # "hermite": cubic-Hermite interpolation of H(t) (slope Ḣ = f(H,t)) in the
    # reverse λ ODE and of both H(t) and λ(t) (slope λ̇ = -(∂f/∂H)ᵀλ) in the
    # quadrature contraction — the analogue of the reference's use of the
    # forward solution object's dense output (gradient.jl:285-301); "linear"
    # is the piecewise-linear fallback (r2 behavior, ~3e-3 gradient accuracy
    # vs hermite's reference-gate 1e-3/1e-8)
    interpolation: str = "hermite"
    name: str = "continuous"


@dataclass(frozen=True)
class DummyAdjoint:
    """Random/user gradient for pipeline testing (AdjointTypes.jl:80-107)."""

    grad_fn: Optional[Any] = None
    name: str = "dummy"
