"""Scale-out axis 2: spatial (grid-row) sharding for large domains.

The glacier-axis mesh (`odinn_tpu.parallel.mesh`) is pure data parallelism —
it stops helping when the domain is ONE huge grid (ice-sheet-scale runs,
e.g. 1024²–4096² cells) or when a batch of very large glaciers exceeds
per-chip HBM. The TPU-native answer is a second mesh axis over grid rows:

- the device mesh becomes 2-D, ``("glaciers", "rows")``;
- every grid-shaped leaf ``(…, nx, ny)`` is sharded along its row (nx) axis
  in addition to the leading glacier axis;
- the SIA stencil chain, the CG body of the semi-implicit solve, the losses,
  and reverse-mode AD are *unchanged*: under ``jit`` XLA's SPMD partitioner
  inserts the halo exchanges (collective-permute of the 1–2 boundary rows a
  stencil slice needs) and turns grid reductions (loss sums, CG dot
  products) into ``psum`` over the ``rows`` axis — the scaling-book recipe
  of annotate-shardings-and-let-XLA-insert-collectives, applied to a
  finite-difference PDE instead of a transformer.

The reference has no counterpart: its per-glacier Julia processes cannot
split one glacier (/root/reference/src/setup/config.jl:97-139); domain size
is capped by one host's memory. Here a 2-D ``Mesh((dp, sp))`` runs the same
``train_ude`` unchanged — ``shard_inversion`` dispatches on the mesh's axis
names.

Halo-exchange cost model: one RHS evaluation moves O(ny · halo) elements per
shard boundary over ICI vs O(nx·ny/sp) FLOP-heavy interior work, so spatial
sharding pays off once nx/sp ≫ halo — hundreds of rows per shard, i.e.
exactly the ice-sheet regime it exists for.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from odinn_tpu.parallel.mesh import GLACIER_AXIS, pad_batch_to

__all__ = [
    "GRID_AXIS",
    "make_mesh_2d",
    "pad_batch_rows",
    "shard_spatial",
    "shard_theta_spatial",
    "shard_inversion_spatial",
]

GRID_AXIS = "rows"


def make_mesh_2d(
    n_glaciers: Optional[int] = None,
    n_rows: int = 2,
    devices=None,
) -> Mesh:
    """2-D device mesh ``("glaciers", "rows")``.

    ``n_rows`` devices cooperate on each glacier's grid (spatial axis);
    ``n_glaciers`` groups run distinct glaciers (data axis; defaults to
    ``len(devices) // n_rows``). Keep ``rows`` the minor (fastest-varying)
    mesh dimension so halo exchanges ride neighbouring ICI links.
    """
    devs = list(jax.devices() if devices is None else devices)
    if n_glaciers is None:
        n_glaciers = len(devs) // n_rows
    need = n_glaciers * n_rows
    if need > len(devs):
        raise ValueError(
            f"mesh ({n_glaciers}×{n_rows}) needs {need} devices, "
            f"have {len(devs)}"
        )
    grid = np.array(devs[:need]).reshape(n_glaciers, n_rows)
    return Mesh(grid, (GLACIER_AXIS, GRID_AXIS))


def pad_batch_rows(batch, k: int):
    """Pad a stacked glacier batch's row (nx) axis to a multiple of ``k``.

    Same zero-dynamics contract as ``core.glacier.pad_glacier`` (padding has
    H = 0, edge-replicated bedrock, mask = 0, so the SIA RHS is identically
    zero there and the padded solve equals the unpadded one on the original
    rows — pinned by tests/test_mixed_grids.py), applied along axis -2 of
    every grid leaf of an already-stacked batch. Returns
    ``(padded_batch, nx_original)``.
    """
    nx = batch.H0.shape[-2]
    if nx % k == 0:
        return batch, nx
    px = k - (nx % k)

    def pad0(a):  # zero padding (thickness-like fields, masks, observations)
        if a is None:
            return None
        width = [(0, 0)] * (a.ndim - 2) + [(0, px), (0, 0)]
        return jnp.pad(a, width)

    def pad_edge(a):  # edge padding (bedrock, gridded temps)
        if a is None:
            return None
        width = [(0, 0)] * (a.ndim - 2) + [(0, px), (0, 0)]
        return jnp.pad(a, width, mode="edge")

    g = batch.replace(
        H0=pad0(batch.H0),
        B=pad_edge(batch.B),
        mask=pad0(batch.mask),
        # pin loss normalization to the pre-padding pixel count (see
        # core.glacier.loss_normalization) — row padding must be loss-neutral
        npix=(batch.npix if batch.npix is not None
              else jnp.full((batch.H0.shape[0],),
                            float(nx * batch.H0.shape[-1]))),
        coords_x=(
            jnp.pad(batch.coords_x, [(0, 0)] * (batch.coords_x.ndim - 1) + [(0, px)],
                    mode="edge")
            if batch.coords_x is not None else None
        ),
    )
    if g.thickness_data is not None:
        g = g.replace(thickness_data=dataclasses.replace(
            g.thickness_data, H=pad0(g.thickness_data.H)))
    if g.velocity_data is not None:
        vd = g.velocity_data
        g = g.replace(velocity_data=dataclasses.replace(
            vd, vx=pad0(vd.vx), vy=pad0(vd.vy), vabs=pad0(vd.vabs)))
    if g.dhdt_data is not None:
        g = g.replace(dhdt_data=dataclasses.replace(
            g.dhdt_data, dhdt=pad0(g.dhdt_data.dhdt)))
    clim = g.climate
    if clim is not None and getattr(clim, "longterm_temps_gridded", None) is not None:
        g = g.replace(climate=dataclasses.replace(
            clim, longterm_temps_gridded=pad_edge(clim.longterm_temps_gridded)))
    return g, nx


def shard_spatial(batch, mesh: Mesh):
    """Place a stacked glacier batch on a 2-D ``("glaciers", "rows")`` mesh.

    Placement rule per array leaf:
    - leading axis divisible by the glacier-axis size → sharded on
      ``glaciers`` (same rule as the 1-D ``shard_glacier_axis``);
    - additionally, rank ≥ 3 leaves whose axis -2 (grid rows) is divisible
      by the row-axis size → sharded on ``rows`` (grids and grid time
      series; 1-D coordinate / climate series stay replicated along rows —
      they are O(nx) bytes, not worth a collective).
    """
    n_g = mesh.shape[GLACIER_AXIS]
    n_r = mesh.shape[GRID_AXIS]

    def place(x):
        if not hasattr(x, "ndim") or x.ndim < 1:
            return jax.device_put(x, NamedSharding(mesh, P()))
        lead = GLACIER_AXIS if x.shape[0] % n_g == 0 else None
        spec = [lead] + [None] * (x.ndim - 1)
        if x.ndim >= 3 and x.shape[-2] % n_r == 0 and x.shape[-1] > 1:
            spec[-2] = GRID_AXIS
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(place, batch)


def shard_theta_spatial(theta, mesh: Mesh, per_glacier_keys=("IC",)):
    """θ placement on a 2-D dp×sp mesh.

    Shared θ (NN weights) is replicated; per-glacier θ entries (named slots
    with the glacier axis leading) shard on ``glaciers``, and *grid-shaped*
    per-glacier θ (e.g. a trainable initial-condition field, rank ≥ 3 with
    rows at axis -2) additionally shards on ``rows`` when divisible — the
    field must live with the grid shard that consumes it.
    """
    n_g = mesh.shape[GLACIER_AXIS]
    n_r = mesh.shape[GRID_AXIS]

    def place(path, x):
        key = path[0].key if path else None
        if (key in per_glacier_keys and hasattr(x, "ndim") and x.ndim >= 1
                and x.shape[0] % n_g == 0):
            spec = [GLACIER_AXIS] + [None] * (x.ndim - 1)
            if x.ndim >= 3 and x.shape[-2] % n_r == 0:
                spec[-2] = GRID_AXIS
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, theta)


def shard_inversion_spatial(theta, batch, mesh: Mesh):
    """Place (θ, glacier batch) on a 2-D dp×sp mesh for training.

    Pads the glacier axis to a glacier-shard multiple (zeroed observations ⇒
    zero loss/gradient, see ``mesh.pad_batch_to``) and the grid-row axis to a
    row-shard multiple (zero-dynamics padding), shards the batch on both
    axes, and shards per-glacier θ entries while replicating shared θ.
    Returns ``(theta, batch, n_original_glaciers)``.
    """
    nx0 = batch.H0.shape[-2]
    batch, n_orig = pad_batch_to(batch, mesh.shape[GLACIER_AXIS])
    batch, _ = pad_batch_rows(batch, mesh.shape[GRID_AXIS])
    if batch.H0.shape[-2] != nx0:
        # grid-shaped θ would be shape-inconsistent with the padded grids
        for path, x in jax.tree_util.tree_flatten_with_path(theta)[0]:
            if hasattr(x, "ndim") and x.ndim >= 3 and x.shape[-2] == nx0:
                raise NotImplementedError(
                    f"spatial sharding with row padding ({nx0} → "
                    f"{batch.H0.shape[-2]}) is not supported with grid-shaped "
                    f"trainable θ ({jax.tree_util.keystr(path)}); choose nx "
                    f"divisible by the mesh's 'rows' axis "
                    f"({mesh.shape[GRID_AXIS]})"
                )
    batch = shard_spatial(batch, mesh)
    theta = shard_theta_spatial(theta, mesh)
    return theta, batch, n_orig
