"""North-star scenario (BASELINE.md): inversions over 100+ glaciers on TPU.

Two parts, both 128 Halfar glaciers / 128x128 grids / 2 years monthly /
float32 / semi-implicit solver / FULL-batch training on one chip:

1. **Classical inversion** (per-glacier scalar A, LawA_inversion): the
   honest at-scale analogue of the reference's CI convergence gates
   (/root/reference/test/inversion_test.jl:154-163 — loss < 1e-6 x initial,
   A max rel err < 1e-3, min < 1e-4). theta* is exactly representable, so the
   gates are meaningful at 128 glaciers. Measured (r2): loss_ratio 4.2e-9,
   A rel err max 3.2e-5 / median 3e-6 / min 6e-8 — all gates beaten.

2. **Functional inversion** (UDE, A = NN(T) with the log head): the perf
   flagship. At 128 glaciers the NN must fit the whole Cuffey-Paterson curve,
   so the loss floor is the architecture's capacity, not the optimizer: at a
   theta pretrained offline to the curve (max rel err 2.5e-4 — the capacity
   floor of the reference's default 1-3-10-3-1 net), the PDE loss is ~1.8
   (ratio ~6e-4 of the cold-start loss). The reference's 1e-6 gate scenario
   interpolates 2 glaciers, where the floor is machine precision; the
   at-scale equivalent is "A rel err at the capacity floor", which this
   config reaches.

Writes benchmarks/train_at_scale_result.json.

Temperatures span [-25, -14] degC: Cuffey-Paterson A(-13) = 8.29e-18 exceeds
the reference's maxA = 8e-18 bound, which would clip the warm end at an
irreducible 3.5% error (found in r2; the r1 benchmark used [-25, -13]).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_glaciers(NG, NX):
    from odinn_tpu.data.synthetic import halfar_glacier

    temps = np.linspace(-25.0, -14.0, NG)
    return temps, [
        halfar_glacier(nx=NX, ny=NX, dx=100.0, temp=float(t), rgi_id=f"s{i}")
        for i, t in enumerate(temps)
    ]


def main():
    import jax
    import jax.numpy as jnp

    from odinn_tpu.core.params import (Parameters, PhysicalParameters,
        SimulationParameters, SolverParameters, Hyperparameters, UDEParameters)
    from odinn_tpu.laws.laws import (CuffeyPaterson, LawA, LawA_inversion,
                                     eval_law, poly_A_paterson_cuffey)
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture
    from odinn_tpu.simulation.inversion import Inversion, run_inversion
    from odinn_tpu.simulation.prediction import generate_ground_truth
    from odinn_tpu.simulation.solver import build_tstops

    NG, NX = 128, 128
    a_true_fn = poly_A_paterson_cuffey()

    def make_params(stages):
        opts = tuple(s[0] for s in stages)
        lrs = tuple(s[1] for s in stages)
        eps = tuple(s[2] for s in stages)
        return Parameters(
            physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
            simulation=SimulationParameters(tspan=(5.0, 7.0), use_MB=False,
                                            use_velocities=False, float_dtype="float32"),
            # remat off: the 128×24×128² trajectory fits HBM, and storing it
            # beats recomputing intervals in the backward (~15% per epoch)
            solver=SolverParameters(step=1 / 12, substeps=1, solver="SI", cg_iters=20,
                                    remat=False),
            hyper=Hyperparameters(optimizer=opts, learning_rate=lrs, epochs=eps,
                                  batch_size=NG),   # FULL batch: one epoch = 128 glaciers
            UDE=UDEParameters(grad="jax", target="A"),
        )

    temps, glaciers = build_glaciers(NG, NX)
    params = make_params([("adam", 0.1, 1)])
    tstops = build_tstops(params.simulation.tspan, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0))
    t0 = time.time()
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    t_gt = time.time() - t0

    def a_rels(law, theta, idxs):
        out = []
        for gi in idxs:
            a_nn = float(eval_law(law, theta, glaciers[gi], glacier_idx=gi))
            a_ref = float(a_true_fn(jnp.asarray(float(temps[gi]))))
            out.append(abs(a_nn - a_ref) / a_ref)
        return out

    result = {"n_glaciers": NG, "grid": NX, "dtype": "float32", "solver": "SI",
              "batch": "full", "ground_truth_s": round(t_gt, 2)}

    # ---- part 1: classical per-glacier inversion at the reference gates ----
    stages = [("adam", 0.1, 60), ("adam", 0.02, 60), ("adam", 0.004, 60),
              ("adam", 8e-4, 80), ("adam", 1.6e-4, 80), ("adam", 3e-5, 80)]
    params = make_params(stages)
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True), n_value=3.0))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    inv.theta = jax.tree.map(lambda x: x.astype(jnp.float32), inv.theta)
    t0 = time.time()
    res = run_inversion(inv)
    t_tr = time.time() - t0
    L = res.stats.losses
    phys = params.physical
    a_rec = phys.min_A + (phys.max_A - phys.min_A) * (
        np.tanh(np.asarray(inv.theta["A"], np.float64)) + 1) / 2
    a_ref = np.asarray([float(a_true_fn(jnp.asarray(float(t)))) for t in temps])
    rels = np.abs(a_rec - a_ref) / a_ref
    result["classical"] = {
        "train_s": round(t_tr, 2), "niter": res.stats.niter,
        "s_per_epoch": round(t_tr / res.stats.niter, 3),
        "loss0": float(L[0]), "loss_best": float(res.stats.final_loss),
        "loss_ratio": float(res.stats.final_loss / L[0]),
        "A_relerr_max": float(rels.max()), "A_relerr_median": float(np.median(rels)),
        "A_relerr_min": float(rels.min()),
        "gates": {"loss_ratio<=1e-6": bool(res.stats.final_loss / L[0] <= 1e-6),
                  "relerr_max<=1e-3": bool(rels.max() <= 1e-3),
                  "relerr_min<=1e-4": bool(rels.min() <= 1e-4)},
    }
    print(json.dumps(result["classical"], indent=1), flush=True)

    # ---- part 2: functional inversion (UDE) at the capacity floor ----
    # Adam warm-up + matrix-free Levenberg-Marquardt (inverse.gauss_newton):
    # the LM tail reaches 2.2x lower loss than a 360-epoch annealed-Adam
    # ladder at similar wall clock (optax.lbfgs's zoom linesearch freezes in
    # f32 at this loss scale; measured r2)
    stages = [("adam", 0.05, 60), ("adam", 0.01, 60), ("lm", 1e-3, 40)]
    params = make_params(stages)
    nn = NeuralNetwork(default_architecture(1), seed=666)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params, head="log"), n_value=3.0))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    inv.theta = jax.tree.map(lambda x: x.astype(jnp.float32), inv.theta)
    # start the log head at A ~ 4e-18 (mid-range): the geometric midpoint of
    # the bounds is 2.5e-19, far below every glacier's truth
    import math
    frac = (math.log(4e-18) - math.log(8e-21)) / (math.log(8e-18) - math.log(8e-21))
    bias = math.log(frac / (1 - frac))
    lw = inv.theta["A"][-1]
    inv.theta["A"][-1] = {"w": lw["w"], "b": lw["b"] + bias}
    t0 = time.time()
    res = run_inversion(inv)
    t_tr = time.time() - t0
    L = res.stats.losses
    result["ude_nn"] = {
        "head": "log", "train_s": round(t_tr, 2), "niter": res.stats.niter,
        "s_per_epoch": round(t_tr / res.stats.niter, 3),
        "loss0": float(L[0]), "loss_best": float(res.stats.final_loss),
        "loss_ratio": float(res.stats.final_loss / L[0]),
        "A_relerr_cold_mid_warm": a_rels(model.iceflow.A, inv.theta,
                                         (0, NG // 2, NG - 1)),
        "capacity_floor_note": "default-arch curve-fit floor: max rel 2.5e-4; "
                               "PDE loss at that theta ~1.8 (see module docstring)",
    }
    print(json.dumps(result["ude_nn"], indent=1), flush=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "train_at_scale_result.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
