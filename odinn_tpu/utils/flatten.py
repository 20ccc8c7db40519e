"""θ pytree ↔ flat vector utilities (ComponentVector equivalents).

The reference threads θ as a ComponentArrays.ComponentVector and converts with
``ComponentVector2Vector``/``Vector2ComponentVector``
(/root/reference/src/models/target/target_utils.jl:3-30). In JAX the pytree is
the native θ; these helpers exist for optimizers/analyses that want a flat
view (FD harnesses, L-BFGS memory inspection, parameter counting).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["theta_to_vector", "vector_to_theta", "theta_size"]


def theta_to_vector(theta):
    """Flatten θ to (vector, unflatten_fn) — ComponentVector2Vector analog."""
    flat, unravel = jax.flatten_util.ravel_pytree(theta)
    return flat, unravel


def vector_to_theta(vec, unravel):
    """Inverse — Vector2ComponentVector analog."""
    return unravel(vec)


def theta_size(theta) -> int:
    return sum(x.size for x in jax.tree.leaves(theta))
