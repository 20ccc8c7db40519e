"""Fused Pallas RKC-interval kernel: a whole save interval in VMEM.

The solve's HBM traffic is dominated by the time loop: every RKC stage (or RK
substep) of the XLA path round-trips the state and stage buffers through HBM.
This kernel fuses ALL s stages of one RKC2 step into a single Pallas program
per glacier — H, B and the three stage carries stay resident in VMEM, so one
save interval costs ONE HBM read of (H, B) and ONE write of H', independent
of the stage count (≈ s× reduction in memory traffic; VPU-bound thereafter).

Scope: the A-target diffusivity with per-glacier scalar values (the same
contract as ops.pallas.sia_kernel — NN-law diffusivities stay on the XLA
path). Wrapped in ``jax.custom_vjp`` with the backward pass rematerialized
through an equivalent jnp interval map, so the kernel drops into the
differentiable scan solve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from odinn_tpu.simulation.solver import _rkc2_coeffs

__all__ = ["rkc_interval_pallas", "derived_scalars", "rkc_interval_reference"]


def derived_scalars(dx, dy, A, C, n, p, q, rho, g):
    """Per-glacier derived-scalar table (n_g, 8) for the kernels:
    [dx, dy, creep=A·Γ_noA, slide=C(ρg)^{p−q}, n+2, n−1, p−q+1, p−1]."""
    return jnp.stack(
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
    )


def _pow_pos(x, e):
    """xᵉ for x ≥ 0. Static integer-valued exponents lower to integer_pow
    multiplies (no transcendentals in the stage loop); anything else uses
    exp/log with the 0ᵉ := 0 convention."""
    if isinstance(e, (int, float)):
        if float(e).is_integer():
            return jax.lax.integer_pow(x, int(e))
    pos = x > 0.0
    return jnp.exp(e * jnp.log(jnp.where(pos, x, 1.0))) * pos


def _rhs(H, B, dx, dy, creep, slide, e_hc, e_sc, e_hs, e_ss, eta0):
    """The fused SIA2D stencil chain on (..., nx, ny) blocks (the glacier
    block axis broadcasts; scalars may be (G,1,1) columns)."""
    H = jnp.where(H > 0.0, H, 0.0)
    S = B + H
    dsdx = (S[..., 1:, :] - S[..., :-1, :]) / dx
    dsdy = (S[..., :, 1:] - S[..., :, :-1]) / dy
    gsx = 0.5 * (dsdx[..., :, :-1] + dsdx[..., :, 1:])
    gsy = 0.5 * (dsdy[..., :-1, :] + dsdy[..., 1:, :])
    sq = gsx * gsx + gsy * gsy
    grad_s = jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0)) * (sq > 0.0)
    hbar = 0.25 * (H[..., :-1, :-1] + H[..., 1:, :-1] + H[..., :-1, 1:] + H[..., 1:, 1:])
    D = slide * _pow_pos(hbar, e_hs) * _pow_pos(grad_s, e_ss) + creep * _pow_pos(
        hbar, e_hc
    ) * _pow_pos(grad_s, e_sc)
    dsdx_e = (S[..., 1:, 1:-1] - S[..., :-1, 1:-1]) / dx
    dsdy_e = (S[..., 1:-1, 1:] - S[..., 1:-1, :-1]) / dy
    upx = eta0 * H[..., 1:, 1:-1] / dx
    lox = -eta0 * H[..., :-1, 1:-1] / dx
    dsdx_e = jnp.where(dsdx_e > upx, upx, jnp.where(dsdx_e < lox, lox, dsdx_e))
    upy = eta0 * H[..., 1:-1, 1:] / dy
    loy = -eta0 * H[..., 1:-1, :-1] / dy
    dsdy_e = jnp.where(dsdy_e > upy, upy, jnp.where(dsdy_e < loy, loy, dsdy_e))
    Fx = -0.5 * (D[..., :, :-1] + D[..., :, 1:]) * dsdx_e
    Fy = -0.5 * (D[..., :-1, :] + D[..., 1:, :]) * dsdy_e
    div = (Fx[..., 1:, :] - Fx[..., :-1, :]) / dx + (Fy[..., :, 1:] - Fy[..., :, :-1]) / dy
    pad = [(0, 0)] * (div.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(-div, pad)


def _interval_math(H, B, scal_row, exps, get_coef, dt, s, eta0):
    """One RKC2 step of length dt: shared by the kernel body and the
    jnp reference/backward implementation.

    ``exps`` are the four diffusivity exponents — static python floats when
    Glen's n is uniform (the common case), enabling integer_pow inside the
    stage loop. ``get_coef(k, j)`` returns coefficient row
    k ∈ {0:μ, 1:ν, 2:μ̃, 3:γ̃, 4:μ̃₁} at stage j as a scalar (SMEM only
    supports scalar loads in Mosaic).
    """
    dx, dy = scal_row[0], scal_row[1]
    creep, slide = scal_row[2], scal_row[3]
    e_hc, e_sc, e_hs, e_ss = exps

    def f(y):
        return _rhs(y, B, dx, dy, creep, slide, e_hc, e_sc, e_hs, e_ss, eta0)

    f0 = f(H)
    y1 = H + get_coef(4, 0) * dt * f0

    def stage(j, carry):
        y_jm1, y_jm2 = carry
        f_j = f(y_jm1)
        mu_j = get_coef(0, j)
        nu_j = get_coef(1, j)
        mut_j = get_coef(2, j)
        gamt_j = get_coef(3, j)
        y_j = (
            (1.0 - mu_j - nu_j) * H
            + mu_j * y_jm1
            + nu_j * y_jm2
            + mut_j * dt * f_j
            + gamt_j * dt * f0
        )
        return (y_j, y_jm1)

    y_s, _ = jax.lax.fori_loop(2, s + 1, stage, (y1, H))
    return y_s


def _make_coeff_arrays(s, dtype):
    _, _, mu1_t, mu, nu, mu_t, gam_t, _ = _rkc2_coeffs(s)
    return (
        jnp.asarray(mu, dtype),
        jnp.asarray(nu, dtype),
        jnp.asarray(mu_t, dtype),
        jnp.asarray(gam_t, dtype),
        jnp.asarray(mu1_t, dtype),
    )


def rkc_interval_reference(H, B, scalars, dt, s, eta0, exps=(5.0, 2.0, 4.0, 2.0)):
    """Batched jnp implementation (the backward/rematerialization path)."""
    mu, nu, mu_t, gam_t, mu1_t = _make_coeff_arrays(s, H.dtype)
    table = jnp.stack([mu, nu, mu_t, gam_t, jnp.full_like(mu, mu1_t)], axis=0)
    row = tuple(scalars[:, k][:, None, None] for k in range(4))
    return _interval_math(H, B, row, exps, lambda k, j: table[k, j], dt, s, eta0)


def _kernel(coef_ref, scal_ref, h_ref, b_ref, out_ref, *, dt, s, eta0, exps, g_block):
    """Program over a BLOCK of glaciers: (G, nx, ny) resident in VMEM with the
    per-glacier scalars as broadcastable (G, 1, 1) columns — big elementwise
    ops keep the VPU busy while all stage carries stay on-chip.

    The scalar table arrives whole (its trailing dims are too small for
    Mosaic block tiling when g_block < 8); each program slices its rows."""
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    scal = scal_ref[0, pl.ds(i * g_block, g_block), :]   # (G, 4) VMEM
    row = tuple(scal[:, k][:, None, None] for k in range(4))
    out_ref[:] = _interval_math(
        h_ref[:], b_ref[:], row, exps, lambda k, j: coef_ref[k, j], dt, s, eta0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def rkc_interval_pallas(H, B, scalars, dt, s, eta0, exps=(5.0, 2.0, 4.0, 2.0)):
    """One fused RKC2 interval for a stacked batch.

    H, B: (n_g, nx, ny); ``scalars``: the (n_g, 8) derived table
    (:func:`derived_scalars`; only the first 4 columns are consumed — the
    exponents come in statically via ``exps`` = (n+2, n−1, p−q+1, p−1));
    dt, s, eta0, exps static. Differentiable w.r.t. H and the creep
    prefactor column of ``scalars``.
    """
    return _forward(H, B, scalars, dt, s, eta0, exps)


def unsupported_reason(nx, ny, g_block, itemsize=4):
    """Why the whole-grid kernel cannot compile at this shape on real TPU
    (None if supported). Two hard limits, checked up front so callers get a
    clear error instead of an opaque Mosaic failure or a silent NaN row:

    - VMEM: each program holds ~7 live (g_block, nx, ny) stage arrays; past
      ~12 MB usable VMEM Mosaic cannot allocate the block.
    - g_block == 1 at grids ≥ 512²: Mosaic refuses the (1, nx−1, ny)-shaped
      scalar broadcast ("Broadcast in both sublanes and lanes") — see
      docs/pallas_kernels.md. A spatially-blocked kernel with halo exchange
      would be needed; the XLA path (measured at parity) covers this regime.
    """
    vmem = 7 * g_block * nx * ny * itemsize
    if vmem > 12e6:
        return (
            f"whole-grid RKC kernel needs ~{vmem / 1e6:.1f} MB VMEM at "
            f"g_block={g_block}, {nx}x{ny} (budget ~12 MB); lower g_block or "
            f"use the XLA path (odinn_tpu.simulation.solver, measured at "
            f"parity — docs/pallas_kernels.md)"
        )
    if g_block == 1 and nx * ny >= 512 * 512:
        return (
            f"whole-grid RKC kernel unsupported at {nx}x{ny} with g_block=1: "
            "Mosaic refuses the (1, nx-1, ny) scalar broadcast at this size "
            "(docs/pallas_kernels.md); use the XLA path for >=512^2 grids"
        )
    return None


def _forward(H, B, scalars, dt, s, eta0, exps=(5.0, 2.0, 4.0, 2.0), g_block=None):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_g, nx, ny = H.shape
    interpret = jax.default_backend() not in ("tpu", "axon")
    # Glacier block per program: Mosaic block shapes want the sublane dim
    # divisible by 8, and the stage temporaries need VMEM headroom — 8 is the
    # sweet spot for 128² f32 grids. Batches not divisible by 8 fall back to
    # the (identical) jnp implementation.
    if g_block is None:
        g_block = 8
    if n_g % g_block != 0 and not interpret:
        return rkc_interval_reference(H, B, scalars, dt, s, eta0, exps)
    if interpret and n_g % g_block != 0:
        g_block = 1
    if not interpret:
        reason = unsupported_reason(nx, ny, g_block, H.dtype.itemsize)
        if reason is not None:
            raise ValueError(reason)
    mu, nu, mu_t, gam_t, mu1_t = _make_coeff_arrays(s, H.dtype)
    coef = jnp.stack(
        [mu, nu, mu_t, gam_t, jnp.full_like(mu, mu1_t)], axis=0
    )  # (5, s+1)
    kern = functools.partial(_kernel, dt=float(dt), s=s, eta0=eta0, exps=tuple(exps),
                             g_block=g_block)
    return pl.pallas_call(
        kern,
        grid=(n_g // g_block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_g, 4), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_block, nx, ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_block, nx, ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g_block, nx, ny), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(H.shape, H.dtype),
        interpret=interpret,
    )(coef, scalars[:, :4].astype(H.dtype)[None], H, B)


def _fwd(H, B, scalars, dt, s, eta0, exps=(5.0, 2.0, 4.0, 2.0)):
    return _forward(H, B, scalars, dt, s, eta0, exps), (H, B, scalars)


def _bwd(dt, s, eta0, exps, res, lam):
    H, B, scalars = res

    def f(h, creep_col):
        sc = scalars.at[:, 2].set(creep_col)
        return rkc_interval_reference(h, B, sc, dt, s, eta0, exps)

    _, pb = jax.vjp(f, H, scalars[:, 2])
    dH, dcreep = pb(lam)
    d_scal = jnp.zeros_like(scalars).at[:, 2].set(dcreep)
    return dH, jnp.zeros_like(B), d_scal


rkc_interval_pallas.defvjp(_fwd, _bwd)
