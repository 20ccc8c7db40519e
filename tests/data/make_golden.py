"""Generate the golden-trajectory regression fixtures.

The reference pins solver behavior against recorded trajectories
(``test/data/PDE_refs_noMB.jld2`` / ``PDE_refs_MB.jld2``, loaded by
/root/reference/test/runtests.jl PDE-solve tests). Its JLD2 fixtures omit the
bedrock so they cannot drive this solver directly; these fixtures provide the
same protection for this repo's own solvers: recorded f64 CPU trajectories
with a tight-rtol replay test (tests/test_golden.py).

Run from the repo root to (re)generate — only when a solver change is
*intended* to alter trajectories:

    python tests/data/make_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def build_cases():
    """(name, params, glacier, model) for each pinned configuration.

    Mirrors the reference's fixture matrix: explicit solver without MB,
    explicit solver with MB, and the production implicit solver
    (runtests.jl PDE_solve rows; MB on/off).
    """
    from odinn_tpu.core.params import (
        Parameters, PhysicalParameters, SimulationParameters, SolverParameters,
    )
    from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate
    from odinn_tpu.laws.laws import ConstantA, CuffeyPaterson
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.physics.mass_balance import TImodel1

    tspan = (5.0, 6.0)
    clim = monthly_dummy_climate(5.0, 24, longterm_temp=-18.0, nx=48, ny=48)
    g_mb = halfar_glacier(nx=48, ny=48, dx=110.0, temp=-18.0, climate=clim, rgi_id="golden-mb")
    g = halfar_glacier(nx=48, ny=48, dx=110.0, temp=-18.0, rgi_id="golden")

    def mk_params(solver, use_mb, **kw):
        return Parameters(
            physical=PhysicalParameters(),
            simulation=SimulationParameters(tspan=tspan, use_MB=use_mb),
            solver=SolverParameters(step=1.0 / 12.0, solver=solver, **kw),
        )

    mb = TImodel1(DDF=6.0e-3, acc_factor=1.2e-3)
    return [
        ("rk4_noMB", mk_params("RK4", False, substeps=20), g,
         Model(iceflow=SIA2DModel(A=ConstantA(6.0e-18)))),
        ("rk4_MB", mk_params("RK4", True, substeps=20), g_mb,
         Model(iceflow=SIA2DModel(A=ConstantA(6.0e-18)), mass_balance=mb)),
        ("rkc_noMB", mk_params("RKC", False, rkc_stages=16), g,
         Model(iceflow=SIA2DModel(A=ConstantA(6.0e-18)))),
        ("si_MB", mk_params("SI", True, cg_iters=30), g_mb,
         Model(iceflow=SIA2DModel(A=CuffeyPaterson()), mass_balance=mb)),
    ]


def main():
    import jax.numpy as jnp

    from odinn_tpu.simulation.prediction import forward_glacier
    from odinn_tpu.simulation.solver import build_tstops

    out = {}
    for name, params, glacier, model in build_cases():
        tstops = build_tstops(params.simulation.tspan, params.solver.step)
        traj = forward_glacier(None, glacier, jnp.asarray(0), model, params, tstops)
        traj = np.asarray(traj, np.float64)
        assert np.isfinite(traj).all(), name
        out[f"{name}_traj"] = traj
        out[f"{name}_tstops"] = np.asarray(tstops, np.float64)
        print(f"{name}: traj {traj.shape}, final max H = {traj[-1].max():.6f} m")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden_trajectories.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
