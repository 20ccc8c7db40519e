"""Trainable initial ice-thickness condition H₀.

TPU-native rebuild of ``InitialCondition``
(/root/reference/src/models/trainable_components/InitialCondition.jl:38-81,
InitialCondition_utils.jl:30-180): a per-glacier trainable H₀ field passed
through a positivity filter σ so the optimized thickness stays non-negative.

Filters (UDEparameters.initial_condition_filter,
/root/reference/src/parameters/UDEparameters.jl:14-80):
  - identity
  - softplus
  - Zang1980 — C¹ smooth ramp: x for x ≥ ε, (x+ε)²/(4ε) on (−ε, ε), 0 below.

The exact filter derivatives the reference hand-codes (``evaluate_∂H₀``) come
for free from JAX AD here; they are still exposed for the hand-written
adjoint path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["InitialCondition", "sigma_zang", "apply_filter", "filter_derivative", "random_field"]


def sigma_zang(x, eps: float = 1.0):
    """Zang (1980) smooth positivity filter."""
    ramp = (x + eps) ** 2 / (4.0 * eps)
    return jnp.where(x >= eps, x, jnp.where(x <= -eps, 0.0, ramp))


def _d_sigma_zang(x, eps: float = 1.0):
    ramp = (x + eps) / (2.0 * eps)
    return jnp.where(x >= eps, 1.0, jnp.where(x <= -eps, 0.0, ramp))


def apply_filter(x, name: str):
    if name == "identity":
        return x
    if name == "softplus":
        return jax.nn.softplus(x)
    if name == "Zang1980":
        return sigma_zang(x)
    raise ValueError(f"unknown initial-condition filter {name!r}")


def filter_derivative(x, name: str):
    """σ′ — ``evaluate_∂H₀`` equivalent (InitialCondition_utils.jl:30-180)."""
    if name == "identity":
        return jnp.ones_like(x)
    if name == "softplus":
        return jax.nn.sigmoid(x)
    if name == "Zang1980":
        return _d_sigma_zang(x)
    raise ValueError(f"unknown initial-condition filter {name!r}")


def _inverse_filter(h, name: str):
    """Map a target thickness to the pre-filter parameter (warm start)."""
    if name == "identity":
        return h
    if name == "softplus":
        # softplus⁻¹(h) = log(expm1(h)), clamped for h→0
        return jnp.log(jnp.expm1(jnp.maximum(h, 1e-6)))
    if name == "Zang1980":
        eps = 1.0
        # invert the ramp on (0, ε); identity above
        ramp_inv = 2.0 * jnp.sqrt(eps * jnp.maximum(h, 0.0)) - eps
        return jnp.where(h >= eps, h, ramp_inv)
    raise ValueError(f"unknown initial-condition filter {name!r}")


def random_field(key, shape, dx, corr_len: float = 500.0, sigma: float = 10.0):
    """Spatially correlated Gaussian noise (``random_matrix`` MvNormal sampler
    equivalent, InitialCondition_utils.jl:30-180) via Gaussian-smoothed white
    noise — one FFT-free separable convolution, TPU friendly."""
    white = jax.random.normal(key, shape)
    r = max(int(corr_len / float(dx)), 1)
    xs = jnp.arange(-3 * r, 3 * r + 1)
    kern = jnp.exp(-0.5 * (xs / r) ** 2)
    kern = kern / jnp.sum(kern)
    sm = jnp.apply_along_axis(lambda v: jnp.convolve(v, kern, mode="same"), 0, white)
    sm = jnp.apply_along_axis(lambda v: jnp.convolve(v, kern, mode="same"), 1, sm)
    sm = sm / jnp.maximum(jnp.std(sm), 1e-12)
    return sigma * sm


@dataclass(frozen=True)
class InitialCondition:
    """Per-glacier trainable H₀ (InitialCondition.jl:38-81).

    ``init``: "Farinotti2019" seeds θ with the glacier's H₀ product;
    "Farinotti2019Random" adds spatially correlated noise. θ["IC"] has shape
    (n_glaciers, nx, ny); ``evaluate_H0`` selects and filters one glacier's
    field.
    """

    filter: str = "identity"
    init: str = "Farinotti2019"
    noise_sigma: float = 10.0
    noise_corr_len: float = 500.0
    seed: int = 0

    def init_theta(self, glaciers, dtype=jnp.float64):
        if isinstance(glaciers, (list, tuple)):
            from odinn_tpu.core.glacier import stack_glaciers

            batch = stack_glaciers(list(glaciers))
        else:
            batch = glaciers
        h0 = batch.H0.astype(dtype)
        if self.init == "Farinotti2019Random":
            keys = jax.random.split(jax.random.PRNGKey(self.seed), h0.shape[0])
            noise = jnp.stack(
                [
                    random_field(k, h0.shape[1:], batch.dx[i], self.noise_corr_len, self.noise_sigma)
                    for i, k in enumerate(keys)
                ]
            )
            h0 = jnp.maximum(h0 + noise * (h0 > 0.0), 0.0)
        return _inverse_filter(h0, self.filter)

    def evaluate_H0(self, theta, glacier_idx):
        """H₀ = σ(θ_IC[g]) — ``evaluate_H₀`` equivalent."""
        return apply_filter(theta["IC"][glacier_idx], self.filter)

    def evaluate_dH0(self, theta, glacier_idx):
        """σ′(θ_IC[g]) — ``evaluate_∂H₀`` equivalent."""
        return filter_derivative(theta["IC"][glacier_idx], self.filter)
