"""Tutorial: forward glacier simulation.

Mirror of the reference's forward-simulation tutorial
(/root/reference/docs/src/forward_simulation.jl): build glaciers, choose an
ice-flow + mass-balance model, run a Prediction, plot the results.

Run: python docs/forward_simulation.py   (CPU or TPU)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

if os.environ.get("JAX_PLATFORMS", "") not in ("", "tpu"):
    pass
import jax
import jax.numpy as jnp

# ODINN_TUTORIAL_SMOKE=1 shrinks the run for the CI tutorial lane
# (tests/test_tutorials.py) — the flow is identical, only budgets shrink
SMOKE = os.environ.get("ODINN_TUTORIAL_SMOKE") == "1"
YEARS = 1.0 if SMOKE else 5.0
GRID = 48 if SMOKE else 96

from odinn_tpu.core.params import (
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
)
from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate
from odinn_tpu.laws.laws import CuffeyPaterson
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.physics.mass_balance import TImodel1
from odinn_tpu.simulation.prediction import Prediction, run_prediction
from odinn_tpu.utils.plotting import plot_glacier, plot_glacier_vid, save_plot

# 1. Parameters: 5 years, monthly saves, monthly mass balance
params = Parameters(
    physical=PhysicalParameters(),
    simulation=SimulationParameters(tspan=(2010.0, 2010.0 + YEARS), use_MB=True,
                                    step_MB=1 / 12, use_velocities=True),
    solver=SolverParameters(step=1 / 12, substeps=25),
)

# 2. Glaciers: synthetic Halfar domes with seasonal climates. With real data,
#    use odinn_tpu.data.rgi.initialize_glaciers(rgi_ids, params) instead.
glaciers = []
for i, temp in enumerate([-18.0, -15.0, -22.0, -13.0]):
    clim = monthly_dummy_climate(2010.0, 64, longterm_temp=temp, nx=GRID, ny=GRID)
    glaciers.append(
        halfar_glacier(nx=GRID, ny=GRID, dx=80.0, temp=temp, t_ic=2010.0 + 5.0,
                       climate=clim, rgi_id=f"tutorial-{i}")
    )

# 3. Model: Cuffey–Paterson creep law + temperature-index mass balance
model = Model(iceflow=SIA2DModel(A=CuffeyPaterson()), mass_balance=TImodel1())

# 4. Run the prediction (vmapped over all glaciers, jit-compiled)
pred = Prediction(model=model, glaciers=glaciers, parameters=params)
results = run_prediction(pred)
print("trajectories:", results["H"].shape, "| velocity:", results["V"].shape)

# 5. Plot
os.makedirs("plots", exist_ok=True)
save_plot(plot_glacier(glaciers[0], ("H0", "B")), "plots/forward_glacier.png")
plot_glacier_vid("plots/forward_evolution.gif", results["H"][0], glaciers[0])
print("wrote plots/forward_glacier.png, plots/forward_evolution.gif")
