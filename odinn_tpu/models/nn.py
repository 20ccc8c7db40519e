"""Neural-network regressors (Lux-MLP equivalents) as plain JAX pytrees.

Mirrors the reference's default architectures
(/root/reference/src/models/trainable_components/ML_utils.jl:18-39,
NeuralNetwork.jl:18-89) and the NN I/O scaling helpers
(/root/reference/src/models/target/target_utils.jl:58-120,
NN_utils.jl:37-139).

Design: a stateless ``MLP`` description (static) plus a parameter pytree
(traced). Evaluation over a grid of inputs is a single batched matmul chain
``(npix, nin) @ (nin, h) @ ...`` — the shape XLA tiles onto the TPU MXU —
instead of the reference's per-pixel broadcast closure
(/root/reference/src/laws/Laws.jl:121 ``((h, ∇s) -> _pred_NN(...)).(inp.H̄, inp.∇S)``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "MLP",
    "init_mlp",
    "mlp_apply",
    "default_architecture",
    "NeuralNetwork",
    "normalize",
    "scale",
    "prescale",
    "postscale",
    "fourier_feature",
    "predict_A_bar",
]


_ACTS = {
    "softplus": jax.nn.softplus,
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "identity": lambda x: x,
}


@dataclass(frozen=True)
class MLP:
    """Static MLP description: layer widths and activation names."""

    widths: Tuple[int, ...]            # (n_in, h1, ..., n_out)
    activations: Tuple[str, ...]       # len == len(widths) - 1

    @property
    def n_in(self) -> int:
        return self.widths[0]

    @property
    def n_out(self) -> int:
        return self.widths[-1]


def default_architecture(n_input: int = 1, light: bool = False) -> MLP:
    """Reference default net: 1→3→10→3→1 softplus×3 + sigmoid head
    (/root/reference/src/models/trainable_components/ML_utils.jl:23-39);
    ``light`` is the test-mode 2-layer variant (ML_utils.jl:24-29)."""
    if light:
        return MLP((n_input, 3, 1), ("softplus", "sigmoid"))
    return MLP((n_input, 3, 10, 3, 1), ("softplus", "softplus", "softplus", "sigmoid"))


def init_mlp(arch: MLP, key: jax.Array, dtype=jnp.float64):
    """Glorot-uniform weights, zero biases (Lux Dense defaults)."""
    params = []
    keys = jax.random.split(key, len(arch.widths) - 1)
    for k, fan_in, fan_out in zip(keys, arch.widths[:-1], arch.widths[1:]):
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(k, (fan_in, fan_out), dtype, -bound, bound)
        b = jnp.zeros((fan_out,), dtype)
        params.append({"w": w, "b": b})
    return params


def mlp_apply(arch: MLP, params, x: jnp.ndarray) -> jnp.ndarray:
    """Apply the MLP to inputs of shape (..., n_in); returns (..., n_out).

    The contraction runs on the MXU when the leading axes are a flattened
    pixel grid.
    """
    h = x
    for layer, act in zip(params, arch.activations):
        h = h @ layer["w"] + layer["b"]
        h = _ACTS[act](h)
    return h


@dataclass(frozen=True)
class NeuralNetwork:
    """Architecture + init convenience mirroring ODINN.NeuralNetwork
    (/root/reference/src/models/trainable_components/NeuralNetwork.jl:18-89).

    The parameter pytree itself lives in the trainable θ, not here.
    """

    architecture: MLP
    seed: int = 666

    def init(self, dtype=jnp.float64):
        return init_mlp(self.architecture, jax.random.PRNGKey(self.seed), dtype)

    def apply(self, params, x):
        return mlp_apply(self.architecture, params, x)


# ---------------------------------------------------------------------------
# I/O scaling helpers — /root/reference/src/models/target/target_utils.jl
# ---------------------------------------------------------------------------

def normalize(x, lims: Tuple[float, float]):
    """Affine map [m, M] → O(1) (target_utils.jl `normalize`)."""
    m, M = lims
    return (x - m) / (M - m)


def scale(x, lims: Tuple[float, float]):
    """Affine map [0,1] → [m, M] (target_utils.jl:108-118)."""
    m, M = lims
    return m + (M - m) * x


def prescale(x, bounds: Sequence[Tuple[float, float]]):
    """Per-feature normalization of (..., n_in) inputs
    (target_utils.jl `_ml_model_prescale`)."""
    lo = jnp.asarray([b[0] for b in bounds], x.dtype)
    hi = jnp.asarray([b[1] for b in bounds], x.dtype)
    return (x - lo) / (hi - lo)


def postscale(y, max_nn: float):
    """max·exp((y−1)/y) output rescaling (target_utils.jl:88-93).

    Maps (0, 1] → (0, max]; the y→0 limit is 0.
    """
    safe = jnp.maximum(y, 1e-12)
    return max_nn * jnp.exp((safe - 1.0) / safe)


def fourier_feature(x, n_freq: int = 4, scale_ff: float = 1.0):
    """Fourier-feature embedding of (..., d) inputs
    (/root/reference/src/models/trainable_components/NN_utils.jl:37-70)."""
    freqs = scale_ff * (2.0 ** jnp.arange(n_freq, dtype=x.dtype)) * jnp.pi
    xf = x[..., None, :] * freqs[:, None]
    feats = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)
    return feats.reshape(*x.shape[:-1], -1)


def predict_A_bar(arch: MLP, params, temp, lims: Tuple[float, float]):
    """A(T) = scale(NN(T), (minA, maxA)) — ODINN.predict_A̅ equivalent
    (usage /root/reference/test/test_grad_loss.jl:585)."""
    t = jnp.atleast_1d(jnp.asarray(temp))[..., None]
    out = mlp_apply(arch, params, t)[..., 0]
    return scale(out, lims)
