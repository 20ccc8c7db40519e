"""Unit tests for the unified observation-time matching
(odinn_tpu.simulation.observations) — the single implementation behind the
forward loss, the manual adjoints, and the Gauss-Newton residuals.

The r2 f32 year-scale time-corruption bug lived in this logic (reference
contract: per-tstop data lookup with isnothing skips,
/root/reference/src/losses/Losses.jl:262-267)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from odinn_tpu.core.glacier import SurfaceVelocityData, ThicknessData
from odinn_tpu.simulation.observations import match_time, thickness_at, velocity_at
from odinn_tpu.simulation.solver import build_tstops


def test_exact_match_is_valid():
    t_obs = jnp.asarray([2010.0, 2011.0, 2012.0])
    k, valid = match_time(t_obs, jnp.asarray(2011.0), jnp.float64)
    assert int(k) == 1 and float(valid) == 1.0


def test_f32_roundtripped_year_scale_times_match():
    """Observation times stored through float32 (ulp ~2.4e-4 at t~2010) must
    still match the tstop that build_tstops kept as their representative."""
    t_data = np.asarray(np.asarray([2010.512345], np.float32), np.float64)
    tstops = np.asarray(build_tstops((2010.0, 2011.0), 1.0 / 12.0, extra=t_data))
    # the data time survives as a representative tstop
    d = np.min(np.abs(tstops - t_data[0]))
    assert d == 0.0
    k, valid = match_time(jnp.asarray(t_data), jnp.asarray(t_data[0]), jnp.float64)
    assert float(valid) == 1.0
    # and an f32 re-rounding of the representative still matches
    k, valid = match_time(
        jnp.asarray(t_data), jnp.asarray(np.float64(np.float32(t_data[0]))), jnp.float64
    )
    assert float(valid) == 1.0


def test_intermediate_tstops_do_not_false_match():
    """Regression for the r2 gate (1e-6 + 2e-6·|t| ≈ 4e-3 yr at t≈2010):
    with sub-weekly save steps, tstops adjacent to an observation must NOT
    match it — the transient loss would double-count the observation."""
    t_obs = jnp.asarray([2010.5])
    step = 2e-3  # ~17.5 hours; the old gate (4e-3) spans two of these steps
    grid = 2010.5 + step * np.arange(-3, 4)
    for t in grid:
        k, valid = match_time(t_obs, jnp.asarray(t), jnp.float64)
        expect = 1.0 if abs(t - 2010.5) < 1e-9 else 0.0
        assert float(valid) == expect, (t, float(valid))


def test_gate_matches_build_tstops_merge_tolerance():
    """Any extra time merged into a grid tstop by build_tstops must be matched
    valid at that tstop, and any that survived as its own tstop must only
    match itself — the two tolerances are the same function."""
    rng = np.random.default_rng(0)
    # well-separated (≫ merge tol ~1e-3) so each observation is its own cluster
    t_data = np.linspace(2010.05, 2011.95, 17) + rng.uniform(-2e-2, 2e-2, 17)
    tstops = np.asarray(build_tstops((2010.0, 2012.0), 1.0 / 12.0, extra=t_data))
    n_valid = 0
    for t in tstops:
        _, valid = match_time(jnp.asarray(t_data), jnp.asarray(t), jnp.float64)
        n_valid += int(valid)
    assert n_valid == len(np.unique(t_data))


def test_none_data_paths():
    h, hv = thickness_at(None, jnp.asarray(1.0), jnp.float32)
    assert h is None and float(hv) == 1.0
    va, vx, vy, vv = velocity_at(None, jnp.asarray(1.0), jnp.float32)
    assert va is None and float(vv) == 1.0
    # a velocity record without a time-resolved cube is skipped too
    vd = SurfaceVelocityData(t=None, vabs=None)
    va, vx, vy, vv = velocity_at(vd, jnp.asarray(1.0), jnp.float32)
    assert va is None and float(vv) == 1.0


def test_thickness_and_velocity_lookup():
    H = jnp.stack([jnp.full((4, 4), 1.0), jnp.full((4, 4), 2.0)])
    td = ThicknessData(t=jnp.asarray([2010.0, 2011.0]), H=H)
    h, hv = thickness_at(td, jnp.asarray(2011.0), jnp.float64)
    assert float(hv) == 1.0 and float(h[0, 0]) == 2.0
    h, hv = thickness_at(td, jnp.asarray(2010.5), jnp.float64)
    assert float(hv) == 0.0

    vd = SurfaceVelocityData(
        t=jnp.asarray([2010.0, 2011.0]),
        vx=H, vy=2 * H, vabs=3 * H,
    )
    va, vx, vy, vv = velocity_at(vd, jnp.asarray(2010.0), jnp.float64)
    assert float(vv) == 1.0 and float(va[0, 0]) == 3.0 and float(vy[0, 0]) == 2.0
