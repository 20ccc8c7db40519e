"""Time utilities: float-year ↔ datetime, tstop lookup.

TPU-native rebuild of Sleipnir's time helpers (usage:
``datetime_to_floatyear`` /root/reference/src/losses/TimeAggregatedLosses.jl:75,
``indFromT`` TimeAggregatedLosses.jl:160, ``stop_condition_tstops``
gradient.jl:328, ``partial_year`` inversion_setup.jl:84).
"""

from __future__ import annotations

import datetime as _dt

import jax.numpy as jnp
import numpy as np

__all__ = [
    "datetime_to_floatyear",
    "floatyear_to_datetime",
    "partial_year",
    "ind_from_t",
    "stop_condition_tstops",
    "t_data",
]


def datetime_to_floatyear(dt: _dt.datetime) -> float:
    """Convert a datetime to a float year (Sleipnir.datetime_to_floatyear)."""
    start = _dt.datetime(dt.year, 1, 1)
    end = _dt.datetime(dt.year + 1, 1, 1)
    return dt.year + (dt - start).total_seconds() / (end - start).total_seconds()


def floatyear_to_datetime(t: float) -> _dt.datetime:
    """Inverse of :func:`datetime_to_floatyear` (Sleipnir.partial_year class)."""
    year = int(np.floor(t))
    start = _dt.datetime(year, 1, 1)
    end = _dt.datetime(year + 1, 1, 1)
    return start + _dt.timedelta(seconds=(t - year) * (end - start).total_seconds())


def partial_year(t: float) -> _dt.datetime:
    """Alias matching the reference's ``partial_year(Day, t)`` usage."""
    return floatyear_to_datetime(t)


def ind_from_t(tstops, t, atol: float = 1e-9):
    """Index of time ``t`` in the tstops grid (Sleipnir.indFromT): jit-safe
    nearest lookup; callers assert closeness outside jit when needed."""
    tstops = jnp.asarray(tstops)
    return jnp.argmin(jnp.abs(tstops - t))


def stop_condition_tstops(t, tstops, atol: float = 1e-9):
    """True iff ``t`` coincides with one of the tstops
    (Sleipnir.stop_condition_tstops; usage gradient.jl:328)."""
    tstops = jnp.asarray(tstops)
    return jnp.any(jnp.abs(tstops - t) <= atol)


def t_data(data, tspan):
    """Timestamps of an observation container clipped to the simulation span
    (Sleipnir.tdata equivalent)."""
    ts = np.asarray(data.t)
    return ts[(ts >= tspan[0] - 1e-9) & (ts <= tspan[1] + 1e-9)]
