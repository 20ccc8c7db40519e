"""SIA2D: the 2-D Shallow Ice Approximation right-hand side and diagnostics.

TPU-native rebuild of Huginn's ``SIA2D!`` (forward structure mirrored by the
reference's adjoint recomputation at
/root/reference/src/inverse/SIA2D/adjoint.jl:52-104 and documented at
/root/reference/docs/src/sensitivity.md:14-27) and of the velocity diagnostics
``surface_V`` / ``V_from_H`` (usage /root/reference/src/losses/Losses.jl:314).

    ∂H/∂t = −∇·F,     F = −D(H̄, |∇S|) ∇S|_edges (clamped at borders)

Design: a single pure function of the state — no ``SIA2DCache`` mutation
(/root/reference/src/inverse/SIA2D/adjoint.jl:70-71); evaluated law values are
ordinary traced arrays carried in the immutable :class:`SIAValues` pytree. The
full stencil chain is elementwise slices+multiplies that XLA fuses into one
bandwidth-bound kernel per RHS call; a hand-fused Pallas variant of the same
chain lives in odinn_tpu.ops.pallas.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from odinn_tpu.ops import stencils as st

__all__ = ["SIAValues", "default_values", "sia2d_rhs", "surface_velocity", "v_from_h"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SIAValues:
    """Evaluated law values for every SIA2D slot (SIA2DCache equivalent,
    /root/reference/src/inverse/SIA2D/adjoint.jl:38-76, minus mutation).

    Scalars or staggered-grid (nx−1, ny−1) arrays. ``None`` slots fall back to
    target-specific defaults.
    """

    A: Any = None          # creep coefficient
    C: Any = None          # sliding coefficient
    n: Any = None          # Glen exponent
    p: Any = None          # sliding thickness exponent (defaults to n)
    q: Any = None          # sliding slope exponent offset (defaults to 0)
    Y: Any = None          # hybrid diffusivity (D_hybrid target)
    U: Any = None          # diffusive velocity (D target)
    n_H: Any = None        # decoupled H exponent (hybrid)
    n_gradS: Any = None    # decoupled |∇S| exponent (hybrid)

    def replace(self, **kw) -> "SIAValues":
        return dataclasses.replace(self, **kw)


def default_values(glacier) -> SIAValues:
    """Slot defaults from the glacier constants (A, C, n with p = n, q = 0,
    giving the standard sliding diffusivity C(ρg)ⁿH^{n+1}|∇S|^{n−1})."""
    return SIAValues(A=glacier.A, C=glacier.C, n=glacier.n, p=glacier.n, q=jnp.zeros_like(glacier.n))


def sia2d_rhs(
    H: jnp.ndarray,
    B: jnp.ndarray,
    dx,
    dy,
    values_fn: Callable[[jnp.ndarray, jnp.ndarray], SIAValues],
    target,
    phys,
) -> jnp.ndarray:
    """dH/dt of the SIA2D equation for one glacier grid.

    Steps (mirroring /root/reference/src/inverse/SIA2D/adjoint.jl:52-104):
      1. clamp H ≥ 0; S = B + H
      2. staggered surface gradients ∇Sx, ∇Sy; slope |∇S|; thickness H̄
      3. resolve law values (``values_fn`` closes over θ, t and outer inputs)
      4. D from the target's diffusivity algebra
      5. edge surface gradients, clamped by η₀·upstream thickness
      6. fluxes Fx = −D̄x·dS/dx|e, Fy = −D̄y·dS/dy|e;  dH = −∇·F on the interior
    """
    H = st.relu_strict(H)
    # solve dtype = state dtype: under an x64 session neither the bed nor
    # constant-law values (e.g. CuffeyPaterson's f64 table fit) may promote
    # an f32 solve — and an f64 solve upcasts an f32 bed
    S = B.astype(H.dtype) + H

    gsx, gsy = st.grad_slope(S, dx, dy)           # (nx-1, ny-1) staggered
    grad_s = st.safe_norm(gsx, gsy)
    hbar = st.avg(H)

    vals = values_fn(hbar, grad_s)
    D = target.diffusivity(vals, hbar, grad_s, phys).astype(H.dtype)

    dsdx_e = st.diff_x(S[..., :, 1:-1]) / dx       # (nx-1, ny-2)
    dsdy_e = st.diff_y(S[..., 1:-1, :]) / dy       # (nx-2, ny-1)
    eta0 = phys.eta0
    dsdx_e = st.clamp_borders_dx(dsdx_e, H, eta0, dx)
    dsdy_e = st.clamp_borders_dy(dsdy_e, H, eta0, dy)

    Dx = st.avg_y(D)                               # (nx-1, ny-2)
    Dy = st.avg_x(D)                               # (nx-2, ny-1)
    Fx = -Dx * dsdx_e
    Fy = -Dy * dsdy_e

    div = st.diff_x(Fx) / dx + st.diff_y(Fy) / dy  # (nx-2, ny-2)
    return st.pad_inner(-div)


def surface_velocity(H, B, dx, dy, values_fn, target, phys):
    """Staggered surface velocity (Vx, Vy, |V|) on the (nx−1, ny−1) grid.

    Huginn.surface_V equivalent: V = −Velocityꜛ(H̄, |∇S|)·∇S
    (usage /root/reference/src/losses/TimeAggregatedLosses.jl:169)."""
    H = st.relu_strict(H)
    S = B.astype(H.dtype) + H
    gsx, gsy = st.grad_slope(S, dx, dy)
    grad_s = st.safe_norm(gsx, gsy)
    hbar = st.avg(H)
    vals = values_fn(hbar, grad_s)
    v_up = target.velocity_up(vals, hbar, grad_s, phys).astype(H.dtype)
    vx = -v_up * gsx
    vy = -v_up * gsy
    return vx, vy, st.safe_norm(vx, vy)


def v_from_h(H, B, dx, dy, values_fn, target, phys):
    """Cell-centered (nx, ny) surface velocity — Huginn.V_from_H equivalent
    (usage /root/reference/src/losses/Losses.jl:314).

    Staggered velocities are interpolated back to cell centers by averaging
    the edge-replicated staggered field.
    """
    vx_s, vy_s, _ = surface_velocity(H, B, dx, dy, values_fn, target, phys)

    def to_centers(a):
        pad = [(0, 0)] * (a.ndim - 2) + [(1, 1), (1, 1)]
        return st.avg(jnp.pad(a, pad, mode="edge"))

    vx, vy = to_centers(vx_s), to_centers(vy_s)
    return vx, vy, st.safe_norm(vx, vy)
