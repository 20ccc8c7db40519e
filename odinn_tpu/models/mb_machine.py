"""MassBalanceMachine: pre-trained MLP mass-balance models.

TPU-native rebuild of MassBalanceMachine.jl's ``CustomMLP`` +
``save_model``/``load_model``/``download_MLP`` (reference usage:
/root/reference/docs/src/models.md:39-73,
scripts/forward_simulation_custommlp_hardangerjokulen.jl:41-46): a
PyTorch-exported MLP acting as a drop-in MB model — the monthly climate
features are assembled per grid cell, pushed through the network as one
(npix, n_features) matmul chain (MXU-friendly), and the output is the
mass balance for the window.

Interchange format (the torch→JSON export the reference's ecosystem uses,
adapted to JSON here since we read it without torch):

    model.json : {"widths": [...], "activations": [...],
                  "features": ["temp", "pdd", "snow", "elevation"],
                  "feature_means": [...], "feature_stds": [...]}
    params.json: {"layers": [{"w": [[...]], "b": [...]}, ...]}
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from odinn_tpu.models.nn import MLP, mlp_apply

__all__ = ["CustomMLP", "save_model", "load_model", "download_MLP"]

_DAYS_PER_MONTH = 30.44


@dataclass(frozen=True)
class CustomMLP:
    """MLP mass-balance model with the TImodel1-compatible interface
    (odinn_tpu.physics.mass_balance consumes any object exposing
    ``compute_mb_field(climate, S, t, step)``)."""

    architecture: MLP
    params: Any
    features: Tuple[str, ...] = ("temp", "pdd", "snow", "elevation")
    feature_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 2000.0)
    feature_stds: Tuple[float, ...] = (10.0, 100.0, 0.1, 1000.0)

    def compute_mb_field(self, climate, S, t, step):
        """MB over the window (t−step, t] per cell [m ice]."""
        n_m = climate.temp.shape[-1]
        months = jnp.arange(n_m)
        t_m = climate.t_start + (months + 0.5) / 12.0
        w = ((t_m > t - step) & (t_m <= t)).astype(S.dtype)

        t2d = climate.temp[:, None, None] + climate.gradient[:, None, None] * (
            S[None] - climate.ref_hgt
        )
        temp_avg = jnp.sum(w[:, None, None] * t2d, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
        pdd = jnp.sum(w[:, None, None] * jnp.maximum(t2d, 0.0) * _DAYS_PER_MONTH, axis=0)
        snow = jnp.sum(w * climate.snow)

        feats_map = {
            "temp": temp_avg,
            "pdd": pdd,
            "snow": jnp.broadcast_to(snow, S.shape),
            "elevation": S,
        }
        cols = []
        for name, mu, sd in zip(self.features, self.feature_means, self.feature_stds):
            cols.append((feats_map[name] - mu) / sd)
        x = jnp.stack(cols, axis=-1).reshape(-1, len(self.features))
        out = mlp_apply(self.architecture, self.params, x)[..., 0]
        return out.reshape(S.shape)


def save_model(dirpath: str, model: CustomMLP) -> None:
    """MassBalanceMachine.save_model equivalent."""
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "model.json"), "w") as f:
        json.dump(
            {
                "widths": list(model.architecture.widths),
                "activations": list(model.architecture.activations),
                "features": list(model.features),
                "feature_means": list(model.feature_means),
                "feature_stds": list(model.feature_stds),
            },
            f,
        )
    layers = [
        {"w": np.asarray(l["w"]).tolist(), "b": np.asarray(l["b"]).tolist()}
        for l in model.params
    ]
    with open(os.path.join(dirpath, "params.json"), "w") as f:
        json.dump({"layers": layers}, f)


def load_model(dirpath: str) -> CustomMLP:
    """MassBalanceMachine.load_model equivalent (reads the torch-exported
    JSON pair)."""
    with open(os.path.join(dirpath, "model.json")) as f:
        meta = json.load(f)
    with open(os.path.join(dirpath, "params.json")) as f:
        raw = json.load(f)
    params = [
        {"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])} for l in raw["layers"]
    ]
    arch = MLP(tuple(meta["widths"]), tuple(meta["activations"]))
    return CustomMLP(
        architecture=arch,
        params=params,
        features=tuple(meta.get("features", ("temp", "pdd", "snow", "elevation"))),
        feature_means=tuple(meta.get("feature_means", (0.0,) * 4)),
        feature_stds=tuple(meta.get("feature_stds", (1.0,) * 4)),
    )


def download_MLP(*args, **kwargs):
    """MassBalanceMachine.download_MLP equivalent — gated: this environment
    has no network egress. Place the exported (model.json, params.json) pair
    on disk and use :func:`load_model`."""
    raise RuntimeError(
        "download_MLP requires network access; export the MLP to "
        "(model.json, params.json) and call load_model(dir) instead"
    )
