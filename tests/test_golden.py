"""Golden-trajectory regression tests.

The reference pins its PDE solutions against recorded fixtures
(``test/data/PDE_refs_noMB.jld2`` / ``PDE_refs_MB.jld2``,
/root/reference/test/runtests.jl PDE-solve rows). Those JLD2s omit the
bedrock, so this repo records its own f64 CPU trajectories
(tests/data/golden_trajectories.npz, produced by tests/data/make_golden.py)
and replays them at tight tolerance — an unintended solver change fails here.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tests.data.make_golden import build_cases

_FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                        "golden_trajectories.npz")

# f64 CPU replay of an identical program: differences can only come from
# XLA scheduling — far below any physical-regression scale
_RTOL, _ATOL = 1e-10, 1e-8   # atol in metres of ice thickness


@pytest.mark.parametrize("case", ["rk4_noMB", "rk4_MB", "rkc_noMB", "si_MB"])
def test_golden_trajectory_replay(case):
    from odinn_tpu.simulation.prediction import forward_glacier
    from odinn_tpu.simulation.solver import build_tstops

    cases = {name: (params, glacier, model) for name, params, glacier, model in build_cases()}
    params, glacier, model = cases[case]

    with np.load(_FIXTURE) as z:
        ref_traj = z[f"{case}_traj"]
        ref_tstops = z[f"{case}_tstops"]

    tstops = build_tstops(params.simulation.tspan, params.solver.step)
    np.testing.assert_allclose(np.asarray(tstops), ref_tstops, rtol=0, atol=1e-12)

    traj = forward_glacier(None, glacier, jnp.asarray(0), model, params, tstops)
    traj = np.asarray(traj, np.float64)
    assert traj.shape == ref_traj.shape
    np.testing.assert_allclose(
        traj, ref_traj, rtol=_RTOL, atol=_ATOL,
        err_msg=f"{case}: solver output drifted from the recorded golden trajectory "
                "(if the change is intended, regenerate with tests/data/make_golden.py)",
    )
