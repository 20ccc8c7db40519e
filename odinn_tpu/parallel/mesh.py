"""Scale-out: glacier-axis sharding over a device mesh.

TPU-native replacement for the reference's process-level data parallelism
(Distributed.jl addprocs + pmap over per-glacier batches,
/root/reference/src/setup/config.jl:97-139,
inversion_utils.jl:287-296, gradient.jl:6-25):

- the stacked glacier batch (leading axis) is sharded over a 1-D
  ``jax.sharding.Mesh`` axis ``"glaciers"``;
- θ is replicated; under ``jit`` XLA's SPMD partitioner turns the
  sum-over-glaciers loss/gradient reductions into ``psum`` collectives over
  ICI — the reference's driver-side gather-then-sum (`aggregate∇θ`,
  Model.jl:208-224) becomes a single all-reduce;
- per-glacier parameters (IC fields, per-glacier A) live on arrays with the
  same leading axis and stay sharded end to end.

Use :func:`shard_inversion` to place data, then jit any train step — no code
changes to the model/inversion layers are needed.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_glacier_axis", "replicate", "shard_theta", "pad_batch_to"]

GLACIER_AXIS = "glaciers"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = GLACIER_AXIS) -> Mesh:
    """1-D mesh over the available devices (ICI-contiguous order)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_glacier_axis(tree, mesh: Mesh, axis_name: str = GLACIER_AXIS):
    """Place every array leaf with its leading (glacier) axis sharded.

    Scalars / sub-glacier-rank leaves are replicated.
    """
    n = mesh.shape[axis_name]

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, tree)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (θ, optimizer state) over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def shard_theta(theta, mesh: Mesh, per_glacier_keys=("IC",), axis_name: str = GLACIER_AXIS):
    """Replicate shared θ; shard per-glacier θ entries along the glacier axis
    (the reference keeps per-glacier params on their owning worker,
    SURVEY §2.9 — here they stay sharded while regressor θ is replicated)."""
    n = mesh.shape[axis_name]

    def place(path, x):
        key = path[0].key if path else None
        if key in per_glacier_keys and hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, theta)


def pad_batch_to(batch, n: int):
    """Pad the glacier batch (leading axis) to a multiple of the mesh size by
    repeating the last glacier with zeroed observations.

    Zeroed H_ref/V_ref make every loss mask empty (is_in_glacier(0) = ∅,
    V_ref > 0 = ∅), so padded lanes contribute exactly zero loss and gradient.
    Returns (padded_batch, original_size).
    """
    b = batch.H0.shape[0]
    if b % n == 0:
        return batch, b
    pad = n - (b % n)

    def pad_leaf(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == b:
            return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        return x

    padded = jax.tree.map(pad_leaf, batch)

    def zero_padded_obs(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == b + pad:
            return x.at[b:].set(0.0)
        return x

    if padded.thickness_data is not None:
        padded = padded.replace(
            thickness_data=padded.thickness_data.__class__(
                t=padded.thickness_data.t,
                H=zero_padded_obs(padded.thickness_data.H),
            )
        )
    if padded.velocity_data is not None:
        vd = padded.velocity_data
        import dataclasses as _dc

        padded = padded.replace(
            velocity_data=_dc.replace(
                vd,
                vx=zero_padded_obs(vd.vx),
                vy=zero_padded_obs(vd.vy),
                vabs=zero_padded_obs(vd.vabs),
            )
        )
    padded = padded.replace(mask=padded.mask.at[b:].set(0.0))
    return padded, b
