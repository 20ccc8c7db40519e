"""Fused Pallas TPU kernel for the SIA2D right-hand side (A-target path).

The reference's hot loop is the RHS evaluation (SURVEY §3.1: hundreds–
thousands of calls per glacier per solve; the performance-critical work Julia
does via JIT-fused broadcasts + Tullio, SURVEY §2.9). Here the entire stencil
chain — S, staggered gradients, H̄, |∇S|, diffusivity, η₀-clamped edge
fluxes, interior divergence — executes in ONE Pallas program per glacier with
every intermediate resident in VMEM: one HBM read of (H, B), one HBM write of
dH, zero intermediate HBM traffic.

Grid: one program per glacier in the stacked batch; per-glacier scalars
(dx, dy, A, C, n, p, q) ride in SMEM. The VPU executes the elementwise chain;
there are no matmuls in this path (NN-law diffusivities stay on the XLA path
where the MXU handles the (npix, features) contraction).

The kernel is wrapped in ``jax.custom_vjp``: the backward pass is the
hand-written discrete adjoint chain (odinn_tpu.inverse.vjps), so the kernel is
differentiable inside the scan solve.

Falls back to interpret mode off-TPU (tests run it on CPU).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from odinn_tpu.ops import stencils as st

__all__ = ["sia2d_rhs_pallas", "pallas_available"]


def pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return True
    except Exception:
        return False


def _rhs_math(H, B, dx, dy, A, C, n, p, q, rho, g, eta0):
    """The full fused stencil chain (identical math to physics.sia2d.sia2d_rhs
    with scalar A-target values; mirrors adjoint.jl:52-104)."""
    H = jnp.where(H > 0.0, H, 0.0)
    S = B + H
    dsdx = (S[1:, :] - S[:-1, :]) / dx
    dsdy = (S[:, 1:] - S[:, :-1]) / dy
    gsx = 0.5 * (dsdx[:, :-1] + dsdx[:, 1:])
    gsy = 0.5 * (dsdy[:-1, :] + dsdy[1:, :])
    sq = gsx * gsx + gsy * gsy
    grad_s = jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0)) * (sq > 0.0)
    hbar = 0.25 * (H[:-1, :-1] + H[1:, :-1] + H[:-1, 1:] + H[1:, 1:])

    gamma_no_a = 2.0 * (rho * g) ** n / (n + 2.0)
    slide = C * (rho * g) ** (p - q) * hbar ** (p - q + 1.0) * grad_s ** (p - 1.0)
    D = slide + A * gamma_no_a * hbar ** (n + 2.0) * grad_s ** (n - 1.0)

    dsdx_e = (S[1:, 1:-1] - S[:-1, 1:-1]) / dx
    dsdy_e = (S[1:-1, 1:] - S[1:-1, :-1]) / dy
    upx = eta0 * H[1:, 1:-1] / dx
    lox = -eta0 * H[:-1, 1:-1] / dx
    dsdx_e = jnp.where(dsdx_e > upx, upx, jnp.where(dsdx_e < lox, lox, dsdx_e))
    upy = eta0 * H[1:-1, 1:] / dy
    loy = -eta0 * H[1:-1, :-1] / dy
    dsdy_e = jnp.where(dsdy_e > upy, upy, jnp.where(dsdy_e < loy, loy, dsdy_e))

    Dx = 0.5 * (D[:, :-1] + D[:, 1:])
    Dy = 0.5 * (D[:-1, :] + D[1:, :])
    Fx = -Dx * dsdx_e
    Fy = -Dy * dsdy_e
    div = (Fx[1:, :] - Fx[:-1, :]) / dx + (Fy[:, 1:] - Fy[:, :-1]) / dy
    return jnp.pad(-div, ((1, 1), (1, 1)))


def _pow_pos(x, e):
    """xᵉ for x ≥ 0 via exp/log (Mosaic has no powf legalization for runtime
    exponents); 0ᵉ := 0 (e > 0 throughout the SIA diffusivity)."""
    pos = x > 0.0
    return jnp.exp(e * jnp.log(jnp.where(pos, x, 1.0))) * pos


def _kernel(scal_ref, h_ref, b_ref, out_ref, *, eta0):
    """Pallas program: one glacier, whole grid in VMEM; the per-glacier SMEM
    table carries *derived* scalars (prefactors + exponents) so the kernel
    needs no scalar transcendentals:
      [dx, dy, creep=A·Γ_noA, slide=C(ρg)^{p−q}, n+2, n−1, p−q+1, p−1]
    """
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    H = h_ref[0]
    B = b_ref[0]
    dx = scal_ref[i, 0]
    dy = scal_ref[i, 1]
    creep = scal_ref[i, 2]
    slide = scal_ref[i, 3]
    e_hc = scal_ref[i, 4]
    e_sc = scal_ref[i, 5]
    e_hs = scal_ref[i, 6]
    e_ss = scal_ref[i, 7]

    H = jnp.where(H > 0.0, H, 0.0)
    S = B + H
    dsdx = (S[1:, :] - S[:-1, :]) / dx
    dsdy = (S[:, 1:] - S[:, :-1]) / dy
    gsx = 0.5 * (dsdx[:, :-1] + dsdx[:, 1:])
    gsy = 0.5 * (dsdy[:-1, :] + dsdy[1:, :])
    sq = gsx * gsx + gsy * gsy
    grad_s = jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0)) * (sq > 0.0)
    hbar = 0.25 * (H[:-1, :-1] + H[1:, :-1] + H[:-1, 1:] + H[1:, 1:])

    D = slide * _pow_pos(hbar, e_hs) * _pow_pos(grad_s, e_ss) + creep * _pow_pos(
        hbar, e_hc
    ) * _pow_pos(grad_s, e_sc)

    dsdx_e = (S[1:, 1:-1] - S[:-1, 1:-1]) / dx
    dsdy_e = (S[1:-1, 1:] - S[1:-1, :-1]) / dy
    upx = eta0 * H[1:, 1:-1] / dx
    lox = -eta0 * H[:-1, 1:-1] / dx
    dsdx_e = jnp.where(dsdx_e > upx, upx, jnp.where(dsdx_e < lox, lox, dsdx_e))
    upy = eta0 * H[1:-1, 1:] / dy
    loy = -eta0 * H[1:-1, :-1] / dy
    dsdy_e = jnp.where(dsdy_e > upy, upy, jnp.where(dsdy_e < loy, loy, dsdy_e))

    Fx = -0.5 * (D[:, :-1] + D[:, 1:]) * dsdx_e
    Fy = -0.5 * (D[:-1, :] + D[1:, :]) * dsdy_e
    div = (Fx[1:, :] - Fx[:-1, :]) / dx + (Fy[:, 1:] - Fy[:, :-1]) / dy
    out_ref[0] = jnp.pad(-div, ((1, 1), (1, 1)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def sia2d_rhs_pallas(H, B, scalars, rho, g, eta0):
    """Batched fused RHS: H, B of shape (n_g, nx, ny); ``scalars`` of shape
    (n_g, 7) = (dx, dy, A, C, n, p, q) per glacier.

    Differentiable w.r.t. H and the A scalar (the A-target trainables); B and
    the remaining scalars are treated as constants in the backward pass."""
    return _forward_impl(H, B, scalars, rho, g, eta0)


def _forward_impl(H, B, scalars, rho, g, eta0):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_g, nx, ny = H.shape
    interpret = jax.default_backend() not in ("tpu", "axon")
    if not interpret:
        from odinn_tpu.ops.pallas.rkc_kernel import unsupported_reason

        # one glacier per program (g_block = 1): same Mosaic shape limits as
        # the RKC kernel — fail with the remedy instead of an opaque error
        reason = unsupported_reason(nx, ny, 1, H.dtype.itemsize)
        if reason is not None:
            raise ValueError(reason.replace("RKC kernel", "RHS kernel"))
    # derive prefactors/exponents outside the kernel (scalar transcendentals
    # are XLA prologue ops; Mosaic only sees vector exp/log)
    dx, dy, A, C, n, p, q = (scalars[:, i] for i in range(7))
    derived = jnp.stack(
        [
            dx,
            dy,
            A * 2.0 * (rho * g) ** n / (n + 2.0),
            C * (rho * g) ** (p - q),
            n + 2.0,
            n - 1.0,
            p - q + 1.0,
            p - 1.0,
        ],
        axis=1,
    ).astype(H.dtype)
    kern = functools.partial(_kernel, eta0=eta0)
    return pl.pallas_call(
        kern,
        grid=(n_g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nx, ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nx, ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(H.shape, H.dtype),
        interpret=interpret,
    )(derived, H, B)


def _fwd(H, B, scalars, rho, g, eta0):
    return _forward_impl(H, B, scalars, rho, g, eta0), (H, B, scalars)


def _bwd(rho, g, eta0, res, lam):
    """Backward: the hand-written discrete adjoint chain (inverse.vjps math)
    in batched jnp form; cotangents w.r.t. (H, B) and the scalar A."""
    H, B, scalars = res
    dx = scalars[:, 0][:, None, None]
    dy = scalars[:, 1][:, None, None]
    A = scalars[:, 2][:, None, None]
    C = scalars[:, 3][:, None, None]
    n = scalars[:, 4][:, None, None]
    p = scalars[:, 5][:, None, None]
    q = scalars[:, 6][:, None, None]

    def single(lam, H, B, dx, dy, A, C, n, p, q):
        def f(h, a):
            return _rhs_math(h, B, dx, dy, a, C, n, p, q, rho, g, eta0)

        _, pb = jax.vjp(f, H, A)
        dH, dA = pb(lam)
        return dH, dA

    dH, dA = jax.vmap(single)(
        lam, H, B, dx[:, 0, 0], dy[:, 0, 0], A[:, 0, 0], C[:, 0, 0], n[:, 0, 0],
        p[:, 0, 0], q[:, 0, 0],
    )
    d_scal = jnp.zeros_like(res[2]).at[:, 2].set(dA)
    return dH, jnp.zeros_like(B), d_scal


sia2d_rhs_pallas.defvjp(_fwd, _bwd)
