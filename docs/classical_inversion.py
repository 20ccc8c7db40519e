"""Tutorial: classical inversion (per-glacier parameters, no regressor).

Mirror of /root/reference/docs/src/classical_inversion.jl: invert one
tanh-bounded scalar A per glacier (or a gridded A with Tikhonov rheology
regularization) against thickness observations.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import jax.numpy as jnp
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
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.laws.laws import ConstantA, LawA_inversion
from odinn_tpu.losses.losses import LossH, MultiLoss
from odinn_tpu.losses.regularization import RheologyRegularization
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.simulation.inversion import Inversion, run_inversion
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops

A_TRUE = 5e-18

params = Parameters(
    physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
    simulation=SimulationParameters(tspan=(5.0, 6.0), use_MB=False),
    solver=SolverParameters(step=1 / 12, substeps=15),
    hyper=Hyperparameters(optimizer=("adam",), learning_rate=(0.1,),
                          epochs=(3 if SMOKE else 40,)),
    UDE=UDEParameters(grad="jax"),
)

glaciers = [halfar_glacier(nx=40, ny=40, dx=120.0, temp=-15.0, A=A_TRUE, rgi_id="cl-0")]
tstops = build_tstops(params.simulation.tspan, params.solver.step)
truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)))
glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))

# --- scalar A per glacier ---
model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True)))
inv = Inversion(model=model, glaciers=glaciers, parameters=params)
run_inversion(inv)
phys = params.physical
a_rec = phys.min_A + (phys.max_A - phys.min_A) * (np.tanh(float(inv.theta["A"][0])) + 1) / 2
print(f"scalar inversion: A_rec={a_rec:.3e} vs A_true={A_TRUE:.3e}")

# --- gridded A per glacier, Tikhonov-regularized ---
reg = RheologyRegularization(min_A=phys.min_A, max_A=phys.max_A)
params_g = params.replace(
    UDE=UDEParameters(grad="jax",
                      empirical_loss_function=MultiLoss((LossH(), reg), (1.0, 1e-16)))
)
model_g = Model(iceflow=SIA2DModel(A=LawA_inversion(params_g, scalar=False)))
inv_g = Inversion(model=model_g, glaciers=glaciers, parameters=params_g)
results = run_inversion(inv_g)
print(f"gridded inversion: loss {results.stats.losses[0]:.3e} -> {results.stats.losses[-1]:.3e}")
