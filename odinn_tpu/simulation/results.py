"""Results containers.

TPU-native rebuild of ODINN's result types:
- ``TrainingStats`` (/root/reference/src/simulations/results/Results.jl:19-68)
- ``Results{Sleipnir.Results, TrainingStats}`` (Results.jl:70-106)
- ``TrainingResult`` persistence payload
  (/root/reference/src/results/TrainingResults.jl:6-14)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional

__all__ = ["TrainingStats", "Results", "create_results"]


@dataclass
class TrainingStats:
    """Training diagnostics accumulated by the optimizer callback
    (Results.jl:19-68)."""

    retcode: Optional[str] = None
    losses: List[float] = field(default_factory=list)
    niter: int = 0
    theta: Any = None
    theta_hist: List[Any] = field(default_factory=list)
    grad_hist: List[Any] = field(default_factory=list)
    grad_norm_hist: List[float] = field(default_factory=list)
    initial_conditions: Any = None
    last_call: float = 0.0
    time_per_iter: List[float] = field(default_factory=list)
    final_loss: Optional[float] = None   # loss of the returned (best) iterate


@dataclass
class Results:
    """Simulation + training results (ODINN.Results equivalent)."""

    simulation: Any = None        # dict of trajectories/velocities per glacier
    stats: Optional[TrainingStats] = None


def create_results(trajs, tstops, glaciers=None, velocities=None):
    """Assemble a simulation-results dict (Sleipnir.create_results equivalent;
    usage /root/reference/src/simulations/inversions/inversion_utils.jl:534-538)."""
    out = {"t": tstops, "H": trajs}
    if velocities is not None:
        out.update(velocities)
    if glaciers is not None:
        out["rgi_ids"] = getattr(glaciers, "rgi_id", None)
    return out
