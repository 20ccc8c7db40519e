"""Tutorial: multi-device scaling over a TPU mesh.

The TPU-native replacement for the reference's multiprocessing
(/root/reference/src/setup/config.jl:97-139): shard the stacked glacier batch
over a 1-D device mesh; θ is replicated; XLA turns the loss/gradient
reductions into psum collectives over ICI.

Run on CPU with 8 virtual devices:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python docs/scaling.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from odinn_tpu.core.params import (
    Hyperparameters,
    Parameters,
    PhysicalParameters,
    SimulationParameters,
    SolverParameters,
    UDEParameters,
)
from odinn_tpu.core.glacier import stack_glaciers
from odinn_tpu.data.synthetic import halfar_glacier
from odinn_tpu.laws.laws import CuffeyPaterson, LawA
from odinn_tpu.models.model import Model, SIA2DModel, init_theta
from odinn_tpu.models.nn import NeuralNetwork, default_architecture
from odinn_tpu.parallel.mesh import make_mesh, pad_batch_to, replicate, shard_glacier_axis
from odinn_tpu.simulation.inversion import batch_transient_loss
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops, suggest_substeps

n_dev = len(jax.devices())
print(f"devices: {n_dev}")

# size the fixed substep count for the LARGEST A the optimizer can reach
substeps = suggest_substeps(dx=130.0, dy=130.0, h_max=500.0, a_max=8e-18)
params = Parameters(
    physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
    simulation=SimulationParameters(tspan=(5.0, 5.5), use_MB=False),
    solver=SolverParameters(step=1 / 12, substeps=substeps),
    hyper=Hyperparameters(optimizer="adam", learning_rate=5e-3, epochs=3),
    UDE=UDEParameters(grad="jax"),
)

# 2 glaciers per device
temps = np.linspace(-25.0, -13.0, 2 * n_dev)
glaciers = [halfar_glacier(nx=32, ny=32, dx=130.0, temp=float(t), rgi_id=f"s{i}")
            for i, t in enumerate(temps)]
tstops = build_tstops(params.simulation.tspan, params.solver.step)
truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))

nn = NeuralNetwork(default_architecture(1, light=True))
model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
batch = stack_glaciers(glaciers)
theta = init_theta(model, batch)

# --- place data on the mesh ---
mesh = make_mesh(n_dev)
batch, _ = pad_batch_to(batch, n_dev)
batch = shard_glacier_axis(batch, mesh)          # glacier axis → mesh axis
theta = replicate(theta, mesh)                   # θ replicated

opt = optax.adam(1e-2)
opt_state = replicate(opt.init(theta), mesh)


@jax.jit
def train_step(theta, opt_state, batch):
    val, grads = jax.value_and_grad(
        lambda th: batch_transient_loss(th, batch, model, params, tstops)
    )(theta)                                     # grads psum over ICI (GSPMD)
    updates, opt_state = opt.update(grads, opt_state, theta)
    return optax.apply_updates(theta, updates), opt_state, val


prev = None
for step in range(6):
    theta, opt_state, val = train_step(theta, opt_state, batch)
    d = "" if prev is None else f"  (delta {float(val) - prev:+.3e})"
    print(f"step {step}: loss {float(val):.8e}{d}")
    prev = float(val)
