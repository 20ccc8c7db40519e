"""Law-input catalogue: pure functions of (glacier, state, t).

TPU-native rebuild of the reference's ``AbstractInput`` system
(/root/reference/docs/src/input_laws.jl:18-95; catalogue listed in SURVEY §2.6):
``iAvgScalarTemp``, ``iAvgGriddedTemp``, ``iCPDD(window)``, ``iH̄``, ``i∇S``,
``iTopoRough(window, curvature_type)``.

Each input is a small frozen dataclass with
``get(glacier, state, t) -> array`` — the functional analogue of the
reference's ``get_input(input, simulation, glacier_idx, t)``. "Inner" inputs
(H̄, ∇S) are resolved inside the PDE right-hand side from the current state;
all others depend only on (glacier, t) and can be evaluated outside the solve.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from odinn_tpu.ops import stencils as st

__all__ = [
    "AvgScalarTemp",
    "AvgGriddedTemp",
    "CPDD",
    "HbarInput",
    "GradSInput",
    "TopoRough",
    "INNER_INPUTS",
]

#: input names resolved inside the RHS from the current state
INNER_INPUTS = ("Hbar", "gradS")


@dataclass(frozen=True)
class AvgScalarTemp:
    """Mean long-term air temperature (scalar) — iAvgScalarTemp."""

    name: str = "T"

    def get(self, glacier, state, t):
        return glacier.climate.avg_scalar_temp(t)


@dataclass(frozen=True)
class AvgGriddedTemp:
    """Mean long-term air temperature (gridded) — iAvgGriddedTemp."""

    name: str = "T_grid"

    def get(self, glacier, state, t):
        return glacier.climate.avg_gridded_temp(t)


@dataclass(frozen=True)
class CPDD:
    """Cumulative positive degree-days over a trailing window — iCPDD(window).

    Reference semantics (/root/reference/docs/src/input_laws.jl:56-75): sum of
    positive downscaled temperatures over the trailing ``window`` (float
    years), per grid cell. Requires a monthly `Climate2D`; months are gathered
    with a static-size window mask so the lookup is jit-safe.
    """

    window: float = 1.0
    name: str = "CPDD"

    def get(self, glacier, state, t):
        clim = glacier.climate
        if not hasattr(clim, "temp") or clim.temp is None:
            raise ValueError("CPDD input requires a monthly Climate2D")
        n_m = clim.temp.shape[-1]
        months = jnp.arange(n_m)
        t_m = clim.t_start + (months + 0.5) / 12.0
        in_window = (t_m > t - self.window) & (t_m <= t)
        S = glacier.B + st.relu_strict(state) if state is not None else glacier.S
        # downscale: T_cell = T_ref + gradient * (S - ref_hgt)
        t2d = clim.temp[:, None, None] + clim.gradient[:, None, None] * (
            S[None] - clim.ref_hgt
        )
        # degree-months → degree-days (×30.44 days/month), positive part only
        pdd = jnp.maximum(t2d, 0.0) * 30.44
        return jnp.sum(jnp.where(in_window[:, None, None], pdd, 0.0), axis=0)


@dataclass(frozen=True)
class HbarInput:
    """Staggered average ice thickness H̄ — iH̄ (inner input)."""

    name: str = "Hbar"

    def get(self, glacier, state, t):
        return st.avg(st.relu_strict(state))


@dataclass(frozen=True)
class GradSInput:
    """Staggered surface-slope magnitude |∇S| — i∇S (inner input)."""

    name: str = "gradS"

    def get(self, glacier, state, t):
        s = glacier.B + st.relu_strict(state)
        sx, sy = st.grad_slope(s, glacier.dx, glacier.dy)
        return st.safe_norm(sx, sy)


@dataclass(frozen=True)
class TopoRough:
    """Topographic roughness — iTopoRough(window, curvature_type).

    Reference semantics (/root/reference/docs/src/input_laws.jl:77-95): local
    curvature of the bedrock within a window. Implemented as the local
    standard deviation of the bed Laplacian over a (2w+1)² neighbourhood —
    one XLA reduce-window, no gather loops.
    """

    window: int = 2
    curvature_type: str = "laplacian"
    name: str = "topo_rough"

    def get(self, glacier, state, t):
        b = glacier.B
        lap = (
            jnp.pad(st.diff_x(st.diff_x(b)), ((1, 1), (0, 0)))
            / glacier.dx**2
            + jnp.pad(st.diff_y(st.diff_y(b)), ((0, 0), (1, 1))) / glacier.dy**2
        )
        w = 2 * self.window + 1
        ones = jnp.ones_like(lap)
        win = lambda a: jax.lax.reduce_window(
            a, 0.0, jax.lax.add, (w, w), (1, 1), "SAME"
        )
        cnt = win(ones)
        mean = win(lap) / cnt
        var = win(lap**2) / cnt - mean**2
        return jnp.sqrt(jnp.maximum(var, 0.0))
