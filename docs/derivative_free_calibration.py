"""Tutorial: derivative-free calibration with Ensemble Kalman Inversion.

odinn_tpu ships three trainer families: first-order gradient descent
(`train_ude`: Adam/LBFGS), second-order least squares (`inverse.gauss_newton`
LM), and — beyond the reference, whose trainers are all gradient-based
(/root/reference/src/simulations/inversions/inversion_utils.jl:59-137) —
**Ensemble Kalman Inversion** (`simulation.eki`, Iglesias–Law–Stuart 2013),
the climate-model community's standard calibration tool. One EKI iteration is
J vmapped member *forward* solves (the member axis shards over a device mesh
like the multistart restart axis) plus a J×J Kalman update on the MXU — no
reverse pass, no adjoint memory.

Because it never differentiates, EKI trains through the one configuration
every gradient path must refuse or approximate: ``params.solver.adaptive =
True``, the error-controlled BS3(2) ``lax.while_loop`` forward (no reverse
rule exists; ``train_ude`` raises, ``adaptive="replay"`` differentiates a
frozen accepted-step schedule). EKI optimizes the *exact* adaptive trajectory.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

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
from odinn_tpu.laws.laws import CuffeyPaterson, LawA_inversion, poly_A_paterson_cuffey
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.simulation.eki import eki_train
from odinn_tpu.simulation.inversion import Inversion
from odinn_tpu.simulation.prediction import generate_ground_truth
from odinn_tpu.simulation.solver import build_tstops

SMOKE = os.environ.get("ODINN_TUTORIAL_SMOKE") == "1"
TSPAN = (5.0, 5.5)
# temperatures chosen so the true Cuffey–Paterson A's lie strictly inside
# the tanh bounds (a truth at a bound saturates θ and no trainer recovers it)
TEMPS = (-18.0, -14.0)


def make_params(**solver_kw):
    solver = dict(step=1 / 6, substeps=1, solver="SI", cg_iters=15)
    solver.update(solver_kw)
    return Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=TSPAN, use_MB=False,
                                        test_mode=True),
        solver=SolverParameters(**solver),
        hyper=Hyperparameters(optimizer="adam", learning_rate=5e-2, epochs=1,
                              batch_size=4),
        UDE=UDEParameters(grad="jax", target="A"),
    )


def recovered_A(theta, params):
    phys = params.physical
    return phys.min_A + (phys.max_A - phys.min_A) * (
        np.tanh(np.asarray(theta["A"], np.float64)) + 1) / 2


truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
a_fn = poly_A_paterson_cuffey()

# ---- 1. derivative-free recovery of per-glacier creep ------------------
# J ensemble members explore θ-space; the Kalman gain (built from ensemble
# covariances — the push-through identity keeps every matrix J×J) pulls all
# members toward the data. Only forward solves are ever evaluated.
params = make_params()
glaciers = [halfar_glacier(nx=24, ny=24, dx=150.0, temp=t, rgi_id=f"g{i}")
            for i, t in enumerate(TEMPS)]
tstops = build_tstops(TSPAN, params.solver.step)
glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))

inv = Inversion(
    model=Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True))),
    glaciers=glaciers, parameters=params,
)
res = eki_train(inv, n_ensemble=8, n_iters=4 if SMOKE else 12, seed=0)
a_rec = recovered_A(inv.theta, params)
a_true = np.asarray([float(a_fn(t)) for t in TEMPS])
rels = np.abs(a_rec - a_true) / a_true
print(f"EKI (J=8, {res.n_iters} iters, zero gradients): misfit "
      f"{np.nanmin(res.misfits[0]):.3e} -> {res.best_loss:.3e}; "
      f"A rel err max {rels.max():.2e}")
assert res.best_loss < np.nanmin(res.misfits[0])

# ---- 2. training through the EXACT adaptive forward --------------------
# adaptive=True makes the forward an error-controlled lax.while_loop —
# reltol is the only accuracy knob and the step sequence is data-dependent.
# Gradient trainers must refuse (train_ude) or replay a frozen schedule;
# EKI just runs it.
params_a = make_params(solver="RK4", substeps=15, adaptive=True, reltol=1e-4)
glaciers_a = [halfar_glacier(nx=24, ny=24, dx=150.0, temp=t, rgi_id=f"a{i}")
              for i, t in enumerate(TEMPS)]
glaciers_a = generate_ground_truth(glaciers_a, params_a, truth, tstops,
                                   store=("H",))
inv_a = Inversion(
    model=Model(iceflow=SIA2DModel(A=LawA_inversion(params_a, scalar=True))),
    glaciers=glaciers_a, parameters=params_a,
)
res_a = eki_train(inv_a, n_ensemble=6, n_iters=3 if SMOKE else 8, seed=1)
print(f"EKI through adaptive BS3(2) @ reltol=1e-4: misfit "
      f"{np.nanmin(res_a.misfits[0]):.3e} -> {res_a.best_loss:.3e}")
assert np.isfinite(res_a.best_loss)
assert res_a.best_loss < np.nanmin(res_a.misfits[0])

# ---- 3. estimator choice + early stopping -------------------------------
# select="mean" installs the classical EKI estimator (the ensemble mean);
# tol stops when the best misfit's relative drop per iteration falls below
# it. perturb_obs=True (not shown) keeps ensemble spread for a rough
# posterior read — for a rigorous posterior use inverse.uncertainty's
# Laplace machinery on a gradient-trained optimum.
inv_m = Inversion(
    model=Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True))),
    glaciers=glaciers, parameters=params,
)
res_m = eki_train(inv_m, n_ensemble=6, n_iters=4 if SMOKE else 30, seed=2,
                  select="mean", tol=1e-3)
print(f"select='mean' stopped after {res_m.n_iters} iters "
      f"(tol=1e-3); mean-estimator misfit {res_m.mean_loss:.3e}")

print("derivative_free_calibration OK")
