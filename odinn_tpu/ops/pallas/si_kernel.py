"""Fused Pallas semi-implicit step: the whole warm-started PCG solve in VMEM.

The SI fast path's cost is one θ-scheme solve per save interval
(simulation/implicit.py): a frozen-diffusivity evaluation, one rhs flux, a
Jacobi diagonal, then cg_iters preconditioned-CG iterations. On the XLA path
every CG iteration materializes its operator application and the two dot
products through HBM (the reductions break elementwise fusion). This kernel
runs the ENTIRE step — D, b, diag, and the full PCG recursion — in one Pallas
program per glacier: H, B and the five CG vectors stay VMEM-resident, so a
step costs one HBM read of (H, H_D, B, x0) and one write of H', independent
of cg_iters.

Kernel shape (measured constraint, not a choice): Mosaic refuses ANY
per-glacier plane reduction on a (G, nx, ny) block — both
``sum(axis=(-2,-1), keepdims=True)`` and ``sum(axis=(-2,-1))`` abort the
compiler with a layout check at G=8, 128² (f32). The kernel therefore runs
ONE glacier per program (grid=(n_g,)) on 2-D planes, where the CG dots are
full rank-0 reductions — which Mosaic compiles cleanly (and which also
side-steps the (1, nx−1, ny) broadcast bug that caps the RKC kernel at
512²). Per-glacier scalars ride in SMEM (scalar loads only, as in
ops.pallas.rkc_kernel).

Scope mirrors ops.pallas.rkc_kernel: the A-target diffusivity with per-glacier
scalar values (the bench/production scalar-law configuration — NN-law
diffusivities stay on the XLA path). The algebra reuses the production
stencil ops (ops.stencils) and replicates implicit.semi_implicit_step's
operator/rhs/preconditioner exactly (same masks, same guards), so the kernel
is checked for numerical agreement against the XLA path, not just plausibility.

``H_D`` is the state the frozen diffusivity is evaluated at (== H for SI;
the SI2 predictor–corrector chains two kernel calls with H_D = H then
H_D = (H + H_pred)/2). Wrapped in ``jax.custom_vjp`` with the backward pass
delegated to a jnp mirror of the same math differentiated by AD, so the
kernel drops into the differentiable scan solve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from odinn_tpu.ops import stencils as st
from odinn_tpu.ops.pallas.rkc_kernel import _pow_pos

__all__ = ["si_step_pallas", "si_step_reference", "unsupported_reason"]


def _frozen_D_scalar(H_D, B, dx, dy, creep, slide, exps):
    """Frozen staggered diffusivity for per-glacier scalar laws — the
    closed-form counterpart of implicit._frozen_diffusivity for the A-target:
    D = creep·H̄^{n+2}·|∇S|^{n−1} + slide·H̄^{p−q+1}·|∇S|^{p−1}."""
    e_hc, e_sc, e_hs, e_ss = exps
    Hc = st.relu_strict(H_D)
    S = B + Hc
    gsx, gsy = st.grad_slope(S, dx, dy)
    grad_s = st.safe_norm(gsx, gsy)
    hbar = st.avg(Hc)
    return creep * _pow_pos(hbar, e_hc) * _pow_pos(grad_s, e_sc) + slide * _pow_pos(
        hbar, e_hs
    ) * _pow_pos(grad_s, e_ss)


def _div_flux(u, D, dx, dy):
    """∇·(D∇u) on the interior (zero ring) — identical to implicit._div_flux."""
    dudx_e = st.diff_x(u[..., :, 1:-1]) / dx
    dudy_e = st.diff_y(u[..., 1:-1, :]) / dy
    fx = st.avg_y(D) * dudx_e
    fy = st.avg_x(D) * dudy_e
    div = st.diff_x(fx) / dx + st.diff_y(fy) / dy
    return st.pad_inner(div)


def _jacobi_diag(D, dt_eff, dx, dy, interior):
    Dx = st.avg_y(D)
    Dy = st.avg_x(D)
    sx = (Dx[..., :-1, :] + Dx[..., 1:, :]) / (dx * dx)
    sy = (Dy[..., :, :-1] + Dy[..., :, 1:]) / (dy * dy)
    return 1.0 + dt_eff * interior * st.pad_inner(sx + sy)


def _step_math(H, H_D, B, x0, dx, dy, creep, slide, dt, theta, cg_iters, exps,
               dot):
    """One θ-scheme SI step — shared by the kernel body (2-D planes, rank-0
    ``dot``) and the jnp reference/backward implementation ((G, nx, ny)
    batches, per-glacier keepdims ``dot``)."""
    D = _frozen_D_scalar(H_D, B, dx, dy, creep, slide, exps)
    # interior mask without scatter (Mosaic-friendly): pad a ring of zeros
    # around ones — semantically identical to implicit.py's .at[...].set
    interior = st.pad_inner(jnp.ones_like(H[..., 1:-1, 1:-1]))
    ring = 1.0 - interior

    def matvec(u):
        return u - theta * dt * interior * _div_flux(interior * u, D, dx, dy)

    b = H + dt * interior * _div_flux(
        B + ring * H + (1.0 - theta) * interior * H, D, dx, dy
    )
    inv_diag = 1.0 / _jacobi_diag(D, theta * dt, dx, dy, interior)

    tiny = 1e-300  # rounds to 0 in f32 — same guard semantics as implicit._cg
    r0 = b - matvec(x0)
    z0 = r0 * inv_diag
    rz0 = dot(r0, z0)

    def body(k, carry):
        x, r, p, rz = carry
        Ap = matvec(p)
        denom = dot(p, Ap)
        alpha = jnp.where(denom > 0.0, rz / jnp.maximum(denom, tiny), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = r * inv_diag
        rz_new = dot(r, z)
        beta = jnp.where(rz > 0.0, rz_new / jnp.maximum(rz, tiny), 0.0)
        p = z + beta * p
        return (x, r, p, rz_new)

    x, _, _, _ = jax.lax.fori_loop(0, cg_iters, body, (x0, r0, z0, rz0))
    return st.relu_strict(x)


def si_step_reference(H, H_D, B, x0, scalars, dt, theta=1.0, cg_iters=6,
                      exps=(5.0, 2.0, 4.0, 2.0)):
    """Batched jnp implementation (the backward/rematerialization path and the
    numerical-agreement oracle). ``scalars``: the (n_g, 8) derived table from
    ops.pallas.rkc_kernel.derived_scalars (first 4 columns consumed)."""
    dx = scalars[:, 0][:, None, None]
    dy = scalars[:, 1][:, None, None]
    creep = scalars[:, 2][:, None, None]
    slide = scalars[:, 3][:, None, None]

    def dot(a, c):
        return jnp.sum(a * c, axis=(-2, -1), keepdims=True)

    return _step_math(H, H_D, B, x0, dx, dy, creep, slide, dt, theta,
                      cg_iters, exps, dot)


def _kernel(scal_ref, h_ref, hd_ref, b_ref, x0_ref, out_ref, *, dt, theta,
            cg_iters, exps):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    dx = scal_ref[i, 0]
    dy = scal_ref[i, 1]
    creep = scal_ref[i, 2]
    slide = scal_ref[i, 3]

    def dot(a, c):
        return jnp.sum(a * c)  # rank-0: the only plane reduction Mosaic takes

    out_ref[0] = _step_math(h_ref[0], hd_ref[0], b_ref[0], x0_ref[0], dx, dy,
                            creep, slide, dt, theta, cg_iters, exps, dot)


def unsupported_reason(nx, ny, itemsize=4):
    """Why the whole-solve kernel cannot compile at this shape (None if
    supported): the CG state budget — ~9 live (nx, ny) planes (H, H_D, B, D,
    inv_diag, x, r, p, Ap) must fit VMEM. One glacier per program, so the
    glacier count never enters."""
    vmem = 9 * nx * ny * itemsize
    if vmem > 12e6:
        return (
            f"whole-solve SI kernel needs ~{vmem / 1e6:.1f} MB VMEM at "
            f"{nx}x{ny} (budget ~12 MB); use the XLA path "
            f"(odinn_tpu.simulation.implicit, docs/pallas_kernels.md)"
        )
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def si_step_pallas(H, H_D, B, x0, scalars, dt, theta=1.0, cg_iters=6,
                   exps=(5.0, 2.0, 4.0, 2.0)):
    """One fused semi-implicit θ-step for a stacked batch.

    H, H_D, B, x0: (n_g, nx, ny); ``scalars``: the (n_g, 8) derived table
    (rkc_kernel.derived_scalars — first 4 columns consumed; exponents are
    static via ``exps`` = (n+2, n−1, p−q+1, p−1)); dt, theta, cg_iters, exps
    static. Differentiable w.r.t. H, H_D, B, x0 and the creep/slide columns of
    ``scalars`` via the jnp mirror (custom_vjp); the dx/dy geometry columns
    get zero cotangents (grid spacing is not trainable).
    """
    return _forward(H, H_D, B, x0, scalars, dt, theta, cg_iters, exps)


def _forward(H, H_D, B, x0, scalars, dt, theta, cg_iters, exps):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_g, nx, ny = H.shape
    interpret = jax.default_backend() not in ("tpu", "axon")
    if not interpret:
        reason = unsupported_reason(nx, ny, H.dtype.itemsize)
        if reason is not None:
            raise ValueError(reason)
    kern = functools.partial(_kernel, dt=float(dt), theta=float(theta),
                             cg_iters=int(cg_iters), exps=tuple(exps))
    blk = lambda i: (i, 0, 0)
    return pl.pallas_call(
        kern,
        grid=(n_g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nx, ny), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, ny), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, ny), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nx, ny), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nx, ny), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(H.shape, H.dtype),
        interpret=interpret,
    )(scalars[:, :4].astype(H.dtype), H, H_D, B, x0)


def _fwd(H, H_D, B, x0, scalars, dt, theta, cg_iters, exps):
    return _forward(H, H_D, B, x0, scalars, dt, theta, cg_iters, exps), (
        H, H_D, B, x0, scalars)


def _bwd(dt, theta, cg_iters, exps, res, lam):
    # full pullback via the jnp mirror: H, H_D, B, x0 and the creep/slide
    # scalar columns all get exact cotangents (the mirror is the same math, so
    # these are free); only the dx/dy geometry columns stay zero — grid
    # spacing is not a trainable quantity anywhere in the framework
    H, H_D, B, x0, scalars = res

    def f(h, hd, b, x0_, creep_col, slide_col):
        sc = scalars.at[:, 2].set(creep_col).at[:, 3].set(slide_col)
        return si_step_reference(h, hd, b, x0_, sc, dt, theta, cg_iters, exps)

    _, pb = jax.vjp(f, H, H_D, B, x0, scalars[:, 2], scalars[:, 3])
    dH, dHD, dB, dx0, dcreep, dslide = pb(lam)
    d_scal = jnp.zeros_like(scalars).at[:, 2].set(dcreep).at[:, 3].set(dslide)
    return dH, dHD, dB, dx0, d_scal


si_step_pallas.defvjp(_fwd, _bwd)
