"""Quick start — the reference's docs/src/quick_start.jl, TPU-native.

The simplest user-level flow: initialize glaciers from an RGI directory,
build a Model (ice flow + mass balance), run a forward Prediction, and plot
the thickness evolution. The reference does exactly this for
RGI60-11.03638 over 2010-2015 (quick_start.jl:1-37); offline we generate a
synthetic RGI directory first (data.rgi.generate_synthetic_rgi_dir) — with
real OGGM data on disk, skip that step and point rgi_dir at it.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import tempfile

workdir = tempfile.mkdtemp(prefix="odinn_quickstart_")

# ODINN_TUTORIAL_SMOKE=1 shrinks the run for the CI tutorial lane
# (tests/test_tutorials.py) — the flow is identical, only budgets shrink
SMOKE = os.environ.get("ODINN_TUTORIAL_SMOKE") == "1"

# ---- data: a (synthetic) RGI glacier directory -------------------------
from odinn_tpu.data.rgi import generate_synthetic_rgi_dir, get_rgi_paths, initialize_glaciers

rgi_dir = os.path.join(workdir, "rgi")
rgi_ids = generate_synthetic_rgi_dir(rgi_dir, n=1, nx=64, ny=64)
rgi_paths = get_rgi_paths(rgi_dir)

# ---- parameters --------------------------------------------------------
from odinn_tpu.core.params import Parameters, SimulationParameters, SolverParameters

params = Parameters(
    simulation=SimulationParameters(
        tspan=(2010.0, 2011.0) if SMOKE else (2010.0, 2015.0),
        use_MB=True,
        step_MB=1.0 / 12.0,
        rgi_paths=rgi_paths,
        working_dir=workdir,
    ),
    solver=SolverParameters(solver="SI", step=1.0 / 12.0, substeps=1),
)

# ---- model: ice flow + mass balance ------------------------------------
from odinn_tpu.api import SIA2Dmodel
from odinn_tpu.models.model import Model
from odinn_tpu.physics.mass_balance import TImodel1

model = Model(
    iceflow=SIA2Dmodel(params),
    mass_balance=TImodel1(DDF=6.0 / 1000.0, acc_factor=1.2 / 1000.0),
)

# ---- run the forward simulation ----------------------------------------
from odinn_tpu.simulation.prediction import Prediction, run_prediction

glaciers = initialize_glaciers(rgi_ids, params)
prediction = Prediction(model=model, glaciers=glaciers, parameters=params)
results = run_prediction(prediction)

H0 = results["H"][0][0]    # first glacier, first save
H1 = results["H"][0][-1]   # first glacier, last save
print(f"ice thickness max: {float(H0.max()):.1f} m -> {float(H1.max()):.1f} m "
      f"over {params.simulation.tspan}")

# ---- visualize ---------------------------------------------------------
from odinn_tpu.utils.plotting import plot_gridded_data, save_plot

fig = plot_gridded_data(H1 - H0, title="thickness change 2010-2015 (m)",
                        cmap="RdBu", mask=H0 > 0)
save_plot(fig, os.path.join(workdir, "evolution_difference.png"))
print("wrote", os.path.join(workdir, "evolution_difference.png"))
