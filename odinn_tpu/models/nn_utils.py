"""NN training utilities: supervised pretraining.

TPU-native rebuild of /root/reference/src/models/trainable_components/
NN_utils.jl:37-139: ``pretraining`` fits the regressor to (X, Y) pairs with an
MSLE loss and Adam before the UDE training starts (warm-starting the law far
from the sigmoid's flat regions); fourier features live in odinn_tpu.models.nn.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from odinn_tpu.models.nn import MLP, mlp_apply

__all__ = ["msle_loss", "pretraining"]


def msle_loss(pred, target):
    """Mean squared log error (NN_utils.jl pretraining loss)."""
    return jnp.mean((jnp.log1p(jnp.maximum(pred, 0.0)) - jnp.log1p(jnp.maximum(target, 0.0))) ** 2)


def pretraining(
    arch: MLP,
    params,
    X: jnp.ndarray,
    Y: jnp.ndarray,
    postprocess: Optional[Callable] = None,
    epochs: int = 1000,
    lr: float = 1e-2,
    loss_fn: Callable = msle_loss,
) -> Tuple[list, list]:
    """Supervised pre-fit of an MLP; returns (trained_params, loss_history).

    ``postprocess`` maps raw network output to physical units (e.g. the
    [minA, maxA] scaling of LawA) so the fit happens in the law's output
    space, matching the reference's pretraining of the scaled law.
    """
    X = jnp.atleast_2d(X)
    Y = jnp.asarray(Y)

    def objective(p):
        out = mlp_apply(arch, p, X)[..., 0]
        if postprocess is not None:
            out = postprocess(out)
        return loss_fn(out, Y)

    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        val, g = jax.value_and_grad(objective)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, val

    history = []
    for _ in range(epochs):
        params, state, val = step(params, state)
        history.append(float(val))
    return params, history
