"""Staggered-grid finite-difference/averaging stencils and their adjoints.

TPU-native equivalents of Huginn's stencil ops (reference usage:
/root/reference/test/SIA2D_adjoint_utils.jl:8-126, forward structure mirrored at
/root/reference/src/inverse/SIA2D/adjoint.jl:52-104) and of the hand-written
adjoint (transpose) operators at
/root/reference/src/inverse/SIA2D/inversion_utils.jl:3-66.

Conventions
-----------
Arrays are laid out with the x axis second-to-last and the y axis last
(``[..., x, y]``), matching the reference's ``(nx, ny)`` layout while letting
every op broadcast over arbitrary leading batch axes — the glacier batch axis is
a plain leading dimension, so ``vmap``/sharding compose without per-op changes.

All ops are pure jnp slices/adds: XLA fuses the whole stencil chain into a
single elementwise kernel, so these are already near bandwidth-bound speed on
TPU; the fully fused RHS kernel lives in odinn_tpu.ops.pallas.

Adjoints satisfy the exact transpose identity ⟨u, A v⟩ = ⟨Aᵀ u, v⟩ that the
reference tests enforce (/root/reference/test/SIA2D_adjoint_utils.jl:8-126);
see tests/test_stencils.py.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "diff_x", "diff_y", "avg", "avg_x", "avg_y", "inn", "inn1", "grad_slope",
    "diff_x_adjoint", "diff_y_adjoint", "avg_adjoint", "avg_x_adjoint",
    "avg_y_adjoint", "clamp_borders_dx", "clamp_borders_dy",
    "clamp_borders_dx_adjoint", "clamp_borders_dy_adjoint", "pad_inner",
]


# ---------------------------------------------------------------------------
# Forward stencils
# ---------------------------------------------------------------------------

def diff_x(a):
    """Forward difference along x: out[i,j] = a[i+1,j] - a[i,j]; (nx,ny)→(nx-1,ny)."""
    return a[..., 1:, :] - a[..., :-1, :]


def diff_y(a):
    """Forward difference along y: out[i,j] = a[i,j+1] - a[i,j]; (nx,ny)→(nx,ny-1)."""
    return a[..., :, 1:] - a[..., :, :-1]


def avg(a):
    """4-point cell average; (nx,ny)→(nx-1,ny-1)."""
    return 0.25 * (a[..., :-1, :-1] + a[..., 1:, :-1] + a[..., :-1, 1:] + a[..., 1:, 1:])


def avg_x(a):
    """2-point average along x; (nx,ny)→(nx-1,ny)."""
    return 0.5 * (a[..., :-1, :] + a[..., 1:, :])


def avg_y(a):
    """2-point average along y; (nx,ny)→(nx,ny-1)."""
    return 0.5 * (a[..., :, :-1] + a[..., :, 1:])


def inn(a):
    """Interior of the grid: a[2:end-1, 2:end-1] in Julia, i.e. drop one ring."""
    return a[..., 1:-1, 1:-1]


def inn1(a):
    """a[1:end-1, 1:end-1] (Julia), i.e. drop the last row/column."""
    return a[..., :-1, :-1]


def safe_norm(x, y):
    """√(x²+y²) with a zero (not NaN) gradient at the origin.

    The raw sqrt has an infinite derivative at 0, which poisons reverse-mode
    AD over flat/ice-free cells with NaNs. The correct subgradient for the SIA
    diffusivity (D ∝ |∇S|^{n−1}, n ≥ 1) is 0 there; this matches the
    reference's nonsmoothness choices (SURVEY §7 hard parts).
    """
    sq = x * x + y * y
    pos = sq > 0.0
    return jnp.sqrt(jnp.where(pos, sq, 1.0)) * pos


def grad_slope(s, dx, dy):
    """Staggered surface-slope magnitude and components.

    Mirrors the forward structure recomputed at
    /root/reference/src/inverse/SIA2D/adjoint.jl:58-64:
    dSdx = diff_x(S)/Δx; dSdy = diff_y(S)/Δy; ∇Sx = avg_y(dSdx); ∇Sy = avg_x(dSdy).

    Returns (∇Sx, ∇Sy) of shape (nx-1, ny-1).
    """
    dsdx = diff_x(s) / dx
    dsdy = diff_y(s) / dy
    return avg_y(dsdx), avg_x(dsdy)


def pad_inner(a, like_shape=None):
    """Zero-pad a (nx-2, ny-2) interior field back to (nx, ny)."""
    return jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(1, 1), (1, 1)])


# ---------------------------------------------------------------------------
# Adjoint (transpose) stencils — mirror
# /root/reference/src/inverse/SIA2D/inversion_utils.jl:3-66
# ---------------------------------------------------------------------------

def diff_x_adjoint(i, dx):
    """Transpose of diff_x(·)/Δx: (nx-1,ny)→(nx,ny)."""
    pad = [(0, 0)] * (i.ndim - 2)
    plus = jnp.pad(i, pad + [(1, 0), (0, 0)])
    minus = jnp.pad(i, pad + [(0, 1), (0, 0)])
    return (plus - minus) / dx


def diff_y_adjoint(i, dy):
    """Transpose of diff_y(·)/Δy: (nx,ny-1)→(nx,ny)."""
    pad = [(0, 0)] * (i.ndim - 2)
    plus = jnp.pad(i, pad + [(0, 0), (1, 0)])
    minus = jnp.pad(i, pad + [(0, 0), (0, 1)])
    return (plus - minus) / dy


def avg_adjoint(i):
    """Transpose of avg: (nx-1,ny-1)→(nx,ny)."""
    pad = [(0, 0)] * (i.ndim - 2)
    o = (
        jnp.pad(i, pad + [(0, 1), (0, 1)])
        + jnp.pad(i, pad + [(1, 0), (0, 1)])
        + jnp.pad(i, pad + [(0, 1), (1, 0)])
        + jnp.pad(i, pad + [(1, 0), (1, 0)])
    )
    return 0.25 * o


def avg_x_adjoint(i):
    """Transpose of avg_x: (nx-1,ny)→(nx,ny)."""
    pad = [(0, 0)] * (i.ndim - 2)
    return 0.5 * (jnp.pad(i, pad + [(0, 1), (0, 0)]) + jnp.pad(i, pad + [(1, 0), (0, 0)]))


def avg_y_adjoint(i):
    """Transpose of avg_y: (nx,ny-1)→(nx,ny)."""
    pad = [(0, 0)] * (i.ndim - 2)
    return 0.5 * (jnp.pad(i, pad + [(0, 0), (0, 1)]) + jnp.pad(i, pad + [(0, 0), (1, 0)]))


# ---------------------------------------------------------------------------
# Flux border clamps (η₀ upstream-thickness boundary condition) and adjoints —
# mirror /root/reference/src/inverse/SIA2D/inversion_utils.jl:17-44
# ---------------------------------------------------------------------------

def relu_strict(h):
    """max(h, 0) with the tie subgradient at h = 0 fixed to 0 (the reference's
    ``dλ .*= (H .> 0)`` convention, adjoint.jl:148). Plain jnp.maximum splits
    the gradient 50/50 at ties, which would make the hand-written adjoint and
    AD disagree on every ice-free cell."""
    return jnp.where(h > 0.0, h, 0.0)


def clamp_borders_dx(ds, h, eta0, dx):
    """Clamp x-edge surface gradients by the upstream ice thickness.

    ds has shape (nx-1, ny-2); h has shape (nx, ny). ``where``-based with
    strict predicates so the AD transpose equals the hand adjoint below
    (ties route the full cotangent to ds, none to h).
    """
    upper = eta0 * h[..., 1:, 1:-1] / dx
    lower = -eta0 * h[..., :-1, 1:-1] / dx
    return jnp.where(ds > upper, upper, jnp.where(ds < lower, lower, ds))


def clamp_borders_dy(ds, h, eta0, dy):
    """Clamp y-edge surface gradients by the upstream ice thickness.

    ds has shape (nx-2, ny-1); h has shape (nx, ny).
    """
    upper = eta0 * h[..., 1:-1, 1:] / dy
    lower = -eta0 * h[..., 1:-1, :-1] / dy
    return jnp.where(ds > upper, upper, jnp.where(ds < lower, lower, ds))


def clamp_borders_dx_adjoint(dC, eta0, dx, h, ds):
    """Adjoint of clamp_borders_dx wrt (ds, h).

    Returns (∂ds, ∂h). Indicator logic mirrors
    /root/reference/src/inverse/SIA2D/inversion_utils.jl:22-29; at exact ties
    the cotangent goes to ds (the exact transpose of the where-based forward).
    """
    up = eta0 * h[..., 1:, 1:-1] / dx
    lo = -eta0 * h[..., :-1, 1:-1] / dx
    d_ds = dC * ((ds <= up) & (ds >= lo))

    pad = [(0, 0)] * (dC.ndim - 2)
    contrib_lo = -(eta0 / dx) * dC * (ds < lo)       # → h[:-1, 1:-1]
    contrib_up = (eta0 / dx) * dC * (ds > up)        # → h[1:, 1:-1]
    d_h = jnp.pad(contrib_lo, pad + [(0, 1), (1, 1)]) + jnp.pad(
        contrib_up, pad + [(1, 0), (1, 1)]
    )
    return d_ds, d_h


def clamp_borders_dy_adjoint(dC, eta0, dy, h, ds):
    """Adjoint of clamp_borders_dy wrt (ds, h); returns (∂ds, ∂h)."""
    up = eta0 * h[..., 1:-1, 1:] / dy
    lo = -eta0 * h[..., 1:-1, :-1] / dy
    d_ds = dC * ((ds <= up) & (ds >= lo))

    pad = [(0, 0)] * (dC.ndim - 2)
    contrib_lo = -(eta0 / dy) * dC * (ds < lo)       # → h[1:-1, :-1]
    contrib_up = (eta0 / dy) * dC * (ds > up)        # → h[1:-1, 1:]
    d_h = jnp.pad(contrib_lo, pad + [(1, 1), (0, 1)]) + jnp.pad(
        contrib_up, pad + [(1, 1), (1, 0)]
    )
    return d_ds, d_h
