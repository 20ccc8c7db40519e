"""Tutorial: the tolerance contract — adaptive forward runs, tolerance-sized
training solvers, and exact gradients through error-controlled integration.

The reference solves adaptively at ``reltol`` everywhere (RDPK3Sp35 +
InterpolatingAdjoint, /root/reference/src/parameters/UDEparameters.jl:14-80,
inversion_utils.jl:559-568). TPU training wants fixed shapes, so odinn_tpu
honors the same knob three ways (docs/sensitivity.md) — all shown here:

1. ``adaptive=True``       — error-controlled BS3(2) forward (Prediction).
2. ``substeps="auto"``     — probe-calibrated fixed solvers (training),
                             including Richardson-sized SI/SI2.
3. ``adaptive="replay"``   — record the accepted dt schedule once, replay it
                             as a fixed DIFFERENTIABLE scan: the exact
                             gradient of the error-controlled trajectory.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import jax
import jax.numpy as jnp
import numpy as np

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
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.simulation.inversion import Inversion, run_inversion
from odinn_tpu.simulation.prediction import Prediction, generate_ground_truth, run_prediction
from odinn_tpu.simulation.solver import build_tstops

SMOKE = os.environ.get("ODINN_TUTORIAL_SMOKE") == "1"
A_TRUE = 8e-19
TSPAN = (5.0, 5.5 if SMOKE else 6.0)


def make_params(**solver_kw):
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False,
                                        use_velocities=False),
        solver=SolverParameters(step=1 / 12, **solver_kw),
        hyper=Hyperparameters(optimizer="adam", learning_rate=5e-2,
                              epochs=3 if SMOKE else 25, batch_size=4),
        UDE=UDEParameters(grad="jax"),
    )


glacier = halfar_glacier(nx=48, ny=48, dx=80.0, dy=80.0, temp=-15.0, A=A_TRUE)
truth = Model(iceflow=SIA2DModel(A=ConstantA(A_TRUE)))
tstops = build_tstops(TSPAN, 1 / 12)

# ---- 1. adaptive forward: reltol is the only accuracy knob -------------
for reltol in (1e-3, 1e-7):
    pred = Prediction(model=truth, glaciers=[glacier],
                      parameters=make_params(adaptive=True, reltol=reltol))
    results = run_prediction(pred)
    print(f"adaptive forward @ reltol={reltol:g}: "
          f"max H = {float(results['H'][0, -1].max()):.4f} m")

# ---- 2. substeps='auto': the SAME reltol sizes the fixed training solvers
# Explicit solvers calibrate from one adaptive probe; the semi-implicit
# SI/SI2 from Richardson step-halving (substeps AND cg_iters auto-sized).
p_si2 = make_params(solver="SI2", substeps="auto", reltol=1e-4)
pred2 = Prediction(model=truth, glaciers=[glacier], parameters=p_si2)
run_prediction(pred2)
rs = pred2.resolved_parameters.solver
print(f"SI2 auto-sized from reltol=1e-4: {rs.substeps} substeps/interval, "
      f"cg_iters={rs.cg_iters} (predictor {rs.cg_iters_predictor})")

# ---- 3. adaptive='replay': exact gradients through the adaptive solve --
# One error-controlled forward records its accepted dt sequence; training
# replays it as a fixed lax.scan — reverse-differentiable, reproducing the
# adaptive trajectory to roundoff. The recorded schedule is verified (it
# must tile every save interval) and re-recorded automatically if the
# optimizer ever outgrows its stability region mid-stage.
p_rp = make_params(adaptive="replay", reltol=1e-5)
(g_obs,) = generate_ground_truth([glacier], p_rp, truth, tstops, store=("H",))
inv = Inversion(
    model=Model(iceflow=SIA2DModel(A=LawA_inversion(p_rp, scalar=True))),
    glaciers=[g_obs], parameters=p_rp,
)
res = run_inversion(inv)
phys = p_rp.physical
a_rec = phys.min_A + (phys.max_A - phys.min_A) * (
    np.tanh(float(inv.theta["A"][0])) + 1) / 2
print(f"replay training: loss {res.stats.losses[0]:.3e} -> "
      f"{res.stats.final_loss:.3e}; recovered A = {a_rec:.3e} "
      f"(truth {A_TRUE:.0e})")
dts = np.asarray(inv.parameters.solver.replay_dts)
print(f"recorded schedule: {dts.shape[1]} intervals x up to {dts.shape[2]} "
      f"accepted steps, {int((dts > 0).sum())} steps total")
assert np.isfinite(res.stats.final_loss) and res.stats.final_loss < res.stats.losses[0]
print("tolerance_and_adaptivity OK")
