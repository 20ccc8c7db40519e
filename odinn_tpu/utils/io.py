"""Persistence: training results and checkpoints.

TPU-native rebuild of the reference's JLD2 persistence:
- ``TrainingResult`` payload + ``save_inversion_file!``
  (/root/reference/src/results/TrainingResults.jl:6-14,
  trainingresult_utils.jl:4-33)
- intermediate checkpointing every ``save_every_iter`` iterations
  (callback_utils.jl:100-109)
- forward-results saving (`Sleipnir.save_results_file!`, referenced at
  inversion_utils.jl:14)

Format: msgpack of the flattened pytree (flax.serialization) plus a JSON
sidecar of static metadata — portable, dependency-light, and streamable from
any filesystem. Orbax-backed checkpointing is provided for full train-state
(θ + optimizer) snapshots with async-friendly semantics.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "TrainingResult",
    "save_inversion_file",
    "load_inversion_file",
    "save_results_file",
    "load_results_file",
    "save_checkpoint",
    "restore_checkpoint",
]


@dataclasses.dataclass
class TrainingResult:
    """Persisted inversion payload (TrainingResults.jl:6-14)."""

    theta: Any
    theta_hist: Any = None
    grad_norm_hist: Any = None
    losses: Any = None
    params_meta: Any = None


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_inversion_file(path: str, result: TrainingResult) -> None:
    """``save_inversion_file!`` equivalent (trainingresult_utils.jl:4-33)."""
    from flax import serialization

    payload = {
        "theta": _to_numpy_tree(result.theta),
        "losses": np.asarray(result.losses if result.losses is not None else []),
        "grad_norm_hist": np.asarray(
            result.grad_norm_hist if result.grad_norm_hist is not None else []
        ),
    }
    if result.theta_hist:
        payload["theta_hist"] = [_to_numpy_tree(t) for t in result.theta_hist]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    if result.params_meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(result.params_meta, f, indent=2, default=str)


def load_inversion_file(path: str) -> TrainingResult:
    from flax import serialization

    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = None
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return TrainingResult(
        theta=payload.get("theta"),
        theta_hist=payload.get("theta_hist"),
        grad_norm_hist=payload.get("grad_norm_hist"),
        losses=payload.get("losses"),
        params_meta=meta,
    )


def save_results_file(path: str, results: dict) -> None:
    """Forward-simulation results (trajectories/velocities) — the
    Sleipnir.save_results_file! equivalent. npz keeps big grids compact."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in results.items() if v is not None and not isinstance(v, (tuple, str))})


def load_results_file(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> None:
    """Full train-state snapshot via orbax (θ + optimizer state + counters).

    Checkpoint/resume is the reference's save_every_iter + warm-start story
    (callback_utils.jl:100-109, inversion_utils.jl:49-52) done properly:
    restore and continue any stage.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(path, f"step_{step}"), _to_numpy_tree(state), force=True)


def restore_checkpoint(ckpt_dir: str, step: Optional[int] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    if step is None:
        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(path) if d.startswith("step_")
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        step = steps[-1]
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.join(path, f"step_{step}"))
