"""Tutorial: laws, inputs, and targets.

Mirror of /root/reference/docs/src/laws.jl + input_laws.jl + inversions.md:
the law system binds parameterizations to PDE slots (A, C, n, Y, U), each law
consuming named inputs resolved from (glacier, state, t).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp

from odinn_tpu.core.params import Parameters, PhysicalParameters
from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate
from odinn_tpu.laws import inputs as I
from odinn_tpu.laws.laws import (
    ConstantA,
    CuffeyPaterson,
    LawA,
    LawU,
    LawY,
    SyntheticC,
    eval_law,
)
from odinn_tpu.models.model import Model, SIA2DModel, init_theta
from odinn_tpu.models.nn import NeuralNetwork, default_architecture

params = Parameters(physical=PhysicalParameters(min_A=8e-21, max_A=8e-18))
clim = monthly_dummy_climate(2010.0, 36, temp_mean=1.0, nx=48, ny=48, longterm_temp=-12.0)
glacier = halfar_glacier(nx=48, ny=48, dx=100.0, temp=-12.0, climate=clim)

# --- the input catalogue: pure functions of (glacier, state, t) ---
for spec in [I.AvgScalarTemp(), I.CPDD(window=1.0), I.TopoRough(window=2)]:
    val = spec.get(glacier, glacier.H0, 2011.0)
    print(f"input {spec.name}: shape {jnp.shape(val)}")

# --- non-learnable laws ---
print("ConstantA:", float(eval_law(ConstantA(4e-18), None, glacier)))
print("CuffeyPaterson A(-12C):", float(eval_law(CuffeyPaterson(), None, glacier)))
c = eval_law(SyntheticC(params), None, glacier, state=glacier.H0, t=2011.0)
print("SyntheticC grid:", c.shape)

# --- learnable laws; θ lives in one pytree keyed by slot ---
nn1 = NeuralNetwork(default_architecture(1))
nn2 = NeuralNetwork(default_architecture(2))
model = Model(iceflow=SIA2DModel(A=LawA(nn1, params)))            # A target
model_y = Model(iceflow=SIA2DModel(Y=LawY(nn2, params)))           # hybrid-D target
model_u = Model(iceflow=SIA2DModel(U=LawU(nn2, params)))           # pure-D target
print("targets:", model.target.name, model_y.target.name, model_u.target.name)

theta = init_theta(model, [glacier])
print("A(θ, T=-12C):", float(eval_law(model.iceflow.A, theta, glacier)))

# Law scheduling: callback_freq=0 → evaluated once at solve start (LawA);
# callback_freq=None → inner law, re-evaluated at every RHS call (LawY/LawU).
print("LawA inner?", model.iceflow.A.is_inner, "| LawY inner?", model_y.iceflow.Y.is_inner)

# --- beyond-reference: learnable C and n slots ---
# The reference's Model exposes C/n slots but ships no learnable constructors
# for them; odinn_tpu closes both (tests/test_trainable_cn.py).
from odinn_tpu.laws.laws import LawC, LawC_inversion, LawN_inversion

params_c = Parameters(physical=PhysicalParameters(min_C=0.0, max_C=1e-15))
model_c = Model(iceflow=SIA2DModel(A=ConstantA(4e-18), C=LawC(nn2, params_c)))
theta_c = init_theta(model_c, [glacier])
c_nn = eval_law(model_c.iceflow.C, theta_c, glacier, state=glacier.H0, t=2011.0)
print("NN sliding law C grid:", c_nn.shape, "| max:", float(c_nn.max()))

model_ci = Model(iceflow=SIA2DModel(A=ConstantA(4e-18), C=LawC_inversion(params_c)))
model_ni = Model(iceflow=SIA2DModel(A=ConstantA(4e-18), n=LawN_inversion(params_c)))
print("per-glacier θ:", {k: v.shape for k, v in init_theta(model_ci, [glacier]).items()},
      {k: v.shape for k, v in init_theta(model_ni, [glacier]).items()})
