"""Legacy region-split inversion.

TPU-native rebuild of the reference's (legacy) region-split inversion
configured by ``InversionParameters``
(/root/reference/src/parameters/InversionParameters.jl:18-70): partition the
glacier grid into ``regions_split`` = (rx, ry) blocks, invert one bounded
creep value per region against thickness observations, with x/f tolerances.

The region values are sigmoid-bounded into [lower_bound, upper_bound]; the
region → grid scatter is a static one-hot matmul (MXU-friendly), and the
optimization is L-BFGS through the differentiable solve.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from odinn_tpu.core.glacier import is_in_glacier, loss_normalization
from odinn_tpu.losses.losses import L2Sum, simple_loss
from odinn_tpu.physics.sia2d import SIAValues, sia2d_rhs
from odinn_tpu.physics.targets import ATarget
from odinn_tpu.simulation.solver import build_tstops, integrate_scan

__all__ = ["region_map", "region_split_inversion"]


def region_map(nx: int, ny: int, regions_split) -> np.ndarray:
    """(nx−1, ny−1) staggered-grid map of region indices (row-major blocks)."""
    rx, ry = regions_split
    ix = np.minimum((np.arange(nx - 1) * rx) // (nx - 1), rx - 1)
    iy = np.minimum((np.arange(ny - 1) * ry) // (ny - 1), ry - 1)
    return ix[:, None] * ry + iy[None, :]


def region_split_inversion(
    glacier,
    params,
    tstops=None,
    max_iters: int = 100,
):
    """Invert one A per region; returns dict(A_regions, A_field, losses, retcode).

    Convergence: stop when the loss improvement < f_tol or the θ step < x_tol
    (InversionParameters.x_tol/f_tol semantics).
    """
    inv_p = params.inversion
    phys = params.physical
    lo = float(np.asarray(inv_p.lower_bound).ravel()[0])
    hi = float(np.asarray(inv_p.upper_bound).ravel()[0])
    rx, ry = inv_p.regions_split
    n_regions = rx * ry

    if tstops is None:
        tstops = build_tstops(params.simulation.tspan, params.solver.step)
    td = glacier.thickness_data
    if td is None:
        raise ValueError("region-split inversion requires thickness observations")
    # observations may arrive as host numpy (generate_ground_truth's bulk
    # device_get); promote once so traced indexing works
    td = td.__class__(t=jnp.asarray(td.t), H=jnp.asarray(td.H))

    rmap = jnp.asarray(region_map(glacier.nx, glacier.ny, (rx, ry)))
    onehot = jax.nn.one_hot(rmap, n_regions, dtype=glacier.H0.dtype)  # (nx-1, ny-1, R)
    target = ATarget()
    # pre-padding pixel count (loss_normalization), so a θ handed between
    # this path and train_ude optimizes the same-weighted objective
    npix = float(loss_normalization(glacier))
    dts = jnp.diff(tstops)

    def a_field_of(theta):
        a_reg = lo + (hi - lo) * jax.nn.sigmoid(theta)         # (R,)
        return onehot @ a_reg                                   # (nx-1, ny-1)

    def loss_fn(theta):
        a_grid = a_field_of(theta)
        vals = SIAValues(A=a_grid, C=jnp.zeros_like(glacier.C), n=glacier.n,
                         p=glacier.n, q=jnp.zeros_like(glacier.n))
        rhs = lambda H, t: sia2d_rhs(
            H, glacier.B, glacier.dx, glacier.dy, lambda hb, gs: vals, target, phys
        )
        traj = integrate_scan(rhs, glacier.H0, tstops, params.solver.substeps)

        def at(tau):
            mask = is_in_glacier(td.H[tau], 3)
            return simple_loss(L2Sum(), traj[tau], td.H[tau], mask, npix)

        per_t = jax.vmap(at)(jnp.arange(1, tstops.shape[0]))
        return jnp.sum(per_t * dts)

    theta = jnp.zeros((n_regions,), glacier.H0.dtype)
    opt = optax.lbfgs(linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=20))
    state = opt.init(theta)
    vg = jax.jit(jax.value_and_grad(loss_fn))

    @jax.jit
    def step(theta, state, val, grads):
        updates, state = opt.update(grads, state, theta, value=val, grad=grads,
                                    value_fn=loss_fn)
        return optax.apply_updates(theta, updates), state

    losses, retcode = [], "MaxIters"
    for it in range(max_iters):
        val, grads = vg(theta)
        losses.append(float(val))
        new_theta, state = step(theta, state, val, grads)
        dx_step = float(jnp.linalg.norm(new_theta - theta))
        theta = new_theta
        if len(losses) > 1 and abs(losses[-2] - losses[-1]) < inv_p.f_tol:
            retcode = "FTolReached"
            break
        if dx_step < inv_p.x_tol:
            retcode = "XTolReached"
            break

    return {
        "A_regions": np.asarray(lo + (hi - lo) * jax.nn.sigmoid(theta)),
        "A_field": np.asarray(a_field_of(theta)),
        "losses": losses,
        "retcode": retcode,
    }
