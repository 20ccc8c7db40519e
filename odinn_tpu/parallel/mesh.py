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

__all__ = [
    "make_mesh",
    "shard_glacier_axis",
    "replicate",
    "shard_theta",
    "pad_batch_to",
    "shard_inversion",
    "set_active_mesh",
    "active_mesh",
]

GLACIER_AXIS = "glaciers"

# session-level mesh registered by api.enable_multiprocessing and consumed by
# train_ude — the automatic scale-out the reference gets from its Distributed
# bootstrap (/root/reference/src/setup/config.jl:97-139)
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> Optional[Mesh]:
    """Register (or clear, with None) the session's scale-out mesh."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    return mesh


def active_mesh() -> Optional[Mesh]:
    """The mesh registered by :func:`set_active_mesh`, if any."""
    return _ACTIVE_MESH


def make_mesh(n_devices: Optional[int] = None, axis_name: str = GLACIER_AXIS) -> Mesh:
    """1-D mesh over the available devices (ICI-contiguous order).

    Raises if fewer than ``n_devices`` are visible on the default backend —
    a silently smaller mesh would let an "8-device" dryrun pass on one chip
    (callers that want clamping, e.g. ``api.enable_multiprocessing``, clamp
    with a warning before calling).
    """
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"mesh needs {n_devices} devices, have {len(devs)} "
                f"on the default '{devs[0].platform}' backend"
            )
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


def make_shard_map_value_and_grad(model, params, tstops, mesh: Mesh,
                                  axis_name: str = GLACIER_AXIS,
                                  per_glacier_keys=("IC", "A")):
    """Explicit-collective training step: `shard_map` over the glacier axis
    with a hand-placed `psum` for the shared-θ gradient.

    The jit+NamedSharding path lets GSPMD insert the collectives; this variant
    pins them explicitly (the scaling-book recipe): each shard computes its
    local loss/gradient over its glaciers, then
      - the loss and shared-θ gradients are psum-reduced over ICI,
      - per-glacier θ entries (leading glacier axis, e.g. trainable IC or
        per-glacier A) stay sharded — their gradients are local by
        construction, mirroring the reference keeping per-glacier params on
        their owning worker (SURVEY §2.9).

    Returns ``value_and_grad(theta, batch)`` to be wrapped in jit. Inside a
    shard, glaciers and sharded per-glacier θ rows correspond 1:1, so
    glacier indexing is shard-local.
    """
    from jax import shard_map

    from odinn_tpu.simulation.inversion import batch_transient_loss

    n_dev = mesh.shape[axis_name]

    def make_local_value_and_grad(theta_specs):
        def local_value_and_grad(theta, batch_shard):
            import jax.numpy as _jnp

            local_ids = _jnp.arange(batch_shard.H0.shape[0])

            def local_loss(th):
                return batch_transient_loss(th, batch_shard, model, params, tstops,
                                            glacier_ids=local_ids)

            val, grads = jax.value_and_grad(local_loss)(theta)
            val = jax.lax.psum(val, axis_name)
            # reduce exactly per the input placement: sharded per-glacier θ
            # rows keep their local gradient (no collective), replicated θ
            # gets the all-reduce. Deciding by local shapes instead is wrong —
            # with one glacier per shard, any NN weight with leading dim 1
            # under a per-glacier slot key would silently skip the psum.
            grads = jax.tree.map(
                lambda g, spec: g if spec == P(axis_name) else jax.lax.psum(g, axis_name),
                grads,
                theta_specs,
            )
            return val, grads

        return local_value_and_grad

    def specs_for_theta(theta, n_g):
        def spec(path, x):
            key = path[0].key if path else None
            # per-glacier θ: named slot AND an array with the glacier axis
            # leading (distinguishes per-glacier params from an NN parameter
            # pytree that happens to live under the same slot key)
            if (
                key in per_glacier_keys
                and hasattr(x, "ndim")
                and x.ndim >= 1
                and x.shape[0] == n_g
                and n_g % n_dev == 0
            ):
                return P(axis_name)
            return P()

        return jax.tree_util.tree_map_with_path(spec, theta)

    def batch_specs(batch):
        return jax.tree.map(
            lambda x: P(axis_name)
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n_dev == 0
            else P(),
            batch,
        )

    def value_and_grad(theta, batch):
        theta_specs = specs_for_theta(theta, batch.H0.shape[0])
        return shard_map(
            make_local_value_and_grad(theta_specs),
            mesh=mesh,
            in_specs=(theta_specs, batch_specs(batch)),
            out_specs=(P(), theta_specs),
            check_vma=False,
        )(theta, batch)

    return value_and_grad


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


def shard_inversion(theta, batch, mesh: Mesh, axis_name: str = GLACIER_AXIS):
    """Place an inversion's (θ, glacier batch) on the mesh for training.

    Pads the glacier axis to a mesh multiple (padded lanes carry zeroed
    observations, so they contribute exactly zero loss/gradient), shards the
    batch along the glacier axis, and shards per-glacier θ entries while
    replicating shared θ. Returns ``(theta, batch, n_original)``.

    A 2-D mesh with a ``"rows"`` axis dispatches to the spatial path
    (`parallel.spatial.shard_inversion_spatial`): grids are additionally
    sharded along their row axis for ice-sheet-scale domains.
    """
    if "rows" in mesh.axis_names:
        from odinn_tpu.parallel.spatial import shard_inversion_spatial

        return shard_inversion_spatial(theta, batch, mesh)
    batch, n_orig = pad_batch_to(batch, mesh.shape[axis_name])
    batch = shard_glacier_axis(batch, mesh, axis_name)
    theta = shard_theta(theta, mesh, axis_name=axis_name)
    return theta, batch, n_orig
