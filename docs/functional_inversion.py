"""Tutorial: functional inversion (UDE training).

Mirror of /root/reference/docs/src/functional_inversion.jl: generate synthetic
ground truth with a known law, then learn A = NN(T) through the PDE solve with
staged Adam → LBFGS optimization, logging to TensorBoard, and plot the learned
law against the truth.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import jax.numpy as jnp

# ODINN_TUTORIAL_SMOKE=1 shrinks the run for the CI tutorial lane
# (tests/test_tutorials.py) — the flow is identical, only budgets shrink
SMOKE = os.environ.get("ODINN_TUTORIAL_SMOKE") == "1"
EPOCHS = (2, 2) if SMOKE else (30, 40)

from odinn_tpu.core.params import (
    Hyperparameters,
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.laws.laws import CuffeyPaterson, LawA, poly_A_paterson_cuffey
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.models.nn import NeuralNetwork, default_architecture
from odinn_tpu.simulation.inversion import Inversion, run_inversion
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops
from odinn_tpu.utils.io import TrainingResult, save_inversion_file
from odinn_tpu.utils.logging import TrainingLogger
from odinn_tpu.utils.plotting import plot_law, save_plot

params = Parameters(
    physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
    simulation=SimulationParameters(tspan=(5.0, 6.5), use_MB=False),
    solver=SolverParameters(step=1 / 12, substeps=20),
    hyper=Hyperparameters(optimizer=("adam", "lbfgs"),
                          learning_rate=(0.05, 1.0), epochs=EPOCHS),
    UDE=UDEParameters(grad="jax", target="A"),
)

glaciers = [halfar_glacier(nx=40, ny=40, dx=120.0, temp=-15.0, rgi_id="inv-0"),
            halfar_glacier(nx=40, ny=40, dx=120.0, temp=-25.0, rgi_id="inv-1")]
tstops = build_tstops(params.simulation.tspan, params.solver.step)
truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))

nn = NeuralNetwork(default_architecture(1, light=True), seed=666)
model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
inv = Inversion(model=model, glaciers=glaciers, parameters=params)

logger = TrainingLogger(".log/functional_inversion", total_iters=sum(EPOCHS))
results = run_inversion(inv, callback=logger.callback)
logger.close()

print(f"loss {results.stats.losses[0]:.3e} -> {results.stats.losses[-1]:.3e}")
save_inversion_file(
    "plots/functional_inversion.msgpack",
    TrainingResult(theta=inv.theta, losses=results.stats.losses,
                   grad_norm_hist=results.stats.grad_norm_hist,
                   params_meta={"target": "A"}),
)
a_true = poly_A_paterson_cuffey()
fig = plot_law(model.iceflow.A, inv.theta, glaciers[0], {"T": (-25.0, -5.0)},
               truth_fn=lambda t: a_true(jnp.asarray(t)))
save_plot(fig, "plots/learned_A_law.png")
print("wrote plots/learned_A_law.png")
