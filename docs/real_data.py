"""Tutorial: real-data workflow — OGGM NetCDF datacubes to a trained inversion.

Mirror of the reference's quick-start real-data path
(/root/reference/docs/src/quick_start.jl + README.md:63: `initialize_glaciers`
over OGGM/Gungnir-preprocessed NetCDF rasters). NetCDF-4 files are HDF5, so
the ingestion runs on h5py with no netCDF4/xarray stack.

This script has no network access, so step 0 *generates* a synthetic dataset
in the exact OGGM glacier-directory layout
(``<dir>/<rgi_id>/gridded_data.nc`` + ``climate_historical.nc``); with real
OGGM output, skip step 0 and point ``PREPRO`` at your preprocessing directory.

Run: python docs/real_data.py     (CPU or TPU)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import tempfile

import jax
import numpy as np

# ODINN_TUTORIAL_SMOKE=1 shrinks the run for the CI tutorial lane
# (tests/test_tutorials.py) — the flow is identical, only budgets shrink
SMOKE = os.environ.get("ODINN_TUTORIAL_SMOKE") == "1"

from odinn_tpu.core.params import (
    Hyperparameters,
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.data.rgi import (
    generate_synthetic_oggm_dir,
    get_rgi_paths,
    initialize_glaciers,
)
from odinn_tpu.laws.laws import ConstantA, LawA_inversion, eval_law
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.physics.mass_balance import TImodel1
from odinn_tpu.simulation.inversion import Inversion, run_inversion
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops

# 0. Synthetic OGGM-layout dataset (skip with real data)
PREPRO = os.environ.get("ODINN_TPU_PREPRO_DIR") or tempfile.mkdtemp(prefix="oggm_")
if not get_rgi_paths(PREPRO):
    rgi_ids = generate_synthetic_oggm_dir(PREPRO, n=3, nx=48, ny=48, seed=1)
else:
    rgi_ids = sorted(get_rgi_paths(PREPRO))[:3]
print(f"glacier directories under {PREPRO}: {rgi_ids}")

# 1. Parameters: 2 years, monthly steps, mass balance on, implicit solver
#    (no CFL tuning needed for arbitrary real-data grids)
params = Parameters(
    physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
    simulation=SimulationParameters(tspan=(2010.0, 2011.0), use_MB=True),
    solver=SolverParameters(step=1.0 / 12.0, solver="SI", cg_iters=20),
    hyper=Hyperparameters(optimizer=("adam", "lm"), learning_rate=(0.1, 1e-3),
                          epochs=(3, 1) if SMOKE else (40, 6), batch_size=8),
    UDE=UDEParameters(grad="jax", target="A"),
)

# 2. Load the glaciers from the NetCDF datacubes: topo DEM, consensus ice
#    thickness, glacier mask, monthly climate at ref height. Velocity cubes
#    attach via initialize_glaciers(..., velocity_datacubes={rgi_id: path}).
glaciers = initialize_glaciers(rgi_ids, params, prepro_dir=PREPRO)
for g in glaciers:
    print(f"  {g.rgi_id}: {g.nx}x{g.ny} @ {float(g.dx):.0f} m, "
          f"max H0 {float(g.H0.max()):.0f} m, "
          f"T_longterm {float(g.climate.longterm_temps_scalar):.1f} C")

# 3. Observations. With real data these come from the datacubes themselves
#    (thickness campaigns, dh/dt, velocity products); here we simulate them.
tstops = build_tstops(params.simulation.tspan, params.solver.step)
truth = Model(iceflow=SIA2DModel(A=ConstantA(4.5e-18)),
              mass_balance=TImodel1(DDF=6e-3, acc_factor=1.2e-3))
glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))

# 4. Classical per-glacier inversion of A, staged Adam -> Gauss-Newton
model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)),
              mass_balance=TImodel1(DDF=6e-3, acc_factor=1.2e-3))
inv = Inversion(model=model, glaciers=glaciers, parameters=params)
results = run_inversion(inv)
L = results.stats.losses
print(f"loss: {L[0]:.4e} -> {results.stats.final_loss:.4e} "
      f"({results.stats.niter} iters)")
for i, g in enumerate(glaciers):
    a = float(eval_law(model.iceflow.A, inv.theta, g, glacier_idx=i))
    print(f"  {g.rgi_id}: inverted A = {a:.3e} (truth 4.5e-18)")
if not SMOKE:
    # the smoke lane runs 4 iterations — the convergence gate needs the
    # full staged budget
    assert results.stats.final_loss < 1e-2 * L[0]
print("real-data workflow OK")
