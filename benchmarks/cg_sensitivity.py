"""Semi-implicit CG iteration count: accuracy/speed trade at scale.

The SI solver runs a FIXED-trip-count Jacobi-PCG (static shapes keep the
vmapped solve one fused XLA loop; odinn_tpu/simulation/implicit.py). The
at-scale benchmarks use cg_iters=20. This script measures what the knob
actually buys: the 128-glacier classical inversion (train_at_scale.py part 1
ladder) trained at cg_iters in {8, 12, 16, 20}, each against ground truth
generated at cg_iters=30 — the truth solve is *more* accurate than the
training solve, so agreement cannot come from matched discretization error
(no inverse crime).

Reports s/epoch and the reference CI gates
(/root/reference/test/inversion_test.jl:154-163) per setting. Writes
benchmarks/cg_sensitivity_result.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from train_at_scale import build_glaciers

    from odinn_tpu.core.params import (Hyperparameters, Parameters,
                                       PhysicalParameters, SimulationParameters,
                                       SolverParameters, UDEParameters)
    from odinn_tpu.laws.laws import (CuffeyPaterson, LawA_inversion,
                                     poly_A_paterson_cuffey)
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.simulation.inversion import Inversion, run_inversion
    from odinn_tpu.simulation.prediction import generate_ground_truth
    from odinn_tpu.simulation.solver import build_tstops

    NG = int(os.environ.get("ODINN_BENCH_NG", "128"))
    NX = int(os.environ.get("ODINN_BENCH_NX", "128"))
    stages = [("adam", 0.1, 60), ("adam", 0.02, 60), ("adam", 0.004, 60),
              ("adam", 8e-4, 80), ("adam", 1.6e-4, 80), ("adam", 3e-5, 80)]

    def make_params(cg):
        return Parameters(
            physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
            simulation=SimulationParameters(tspan=(5.0, 7.0), use_MB=False,
                                            use_velocities=False,
                                            float_dtype="float32"),
            solver=SolverParameters(step=1 / 12, substeps=1, solver="SI",
                                    cg_iters=cg, remat=False),
            hyper=Hyperparameters(optimizer=tuple(s[0] for s in stages),
                                  learning_rate=tuple(s[1] for s in stages),
                                  epochs=tuple(s[2] for s in stages),
                                  batch_size=NG, grad_accum_chunks="auto"),
            UDE=UDEParameters(grad="jax", target="A"),
        )

    a_true_fn = poly_A_paterson_cuffey()
    temps, glaciers = build_glaciers(NG, NX)
    a_ref = np.asarray([float(a_true_fn(jnp.asarray(float(t)))) for t in temps])

    # truth at cg=30: strictly tighter than any training setting below
    params_gt = make_params(30)
    tstops = build_tstops(params_gt.simulation.tspan, params_gt.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0))
    glaciers = generate_ground_truth(glaciers, params_gt, truth, tstops,
                                     store=("H",))

    rows = []
    for cg in (8, 12, 16, 20):
        params = make_params(cg)
        model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True),
                                         n_value=3.0))
        inv = Inversion(model=model, glaciers=glaciers, parameters=params)
        inv.theta = jax.tree.map(lambda x: x.astype(jnp.float32), inv.theta)
        t0 = time.time()
        res = run_inversion(inv)
        t_tr = time.time() - t0
        phys = params.physical
        a_rec = phys.min_A + (phys.max_A - phys.min_A) * (
            np.tanh(np.asarray(inv.theta["A"], np.float64)) + 1) / 2
        rels = np.abs(a_rec - a_ref) / a_ref
        ratio = float(res.stats.final_loss / res.stats.losses[0])
        row = {"cg_iters": cg, "train_s": round(t_tr, 2),
               "s_per_epoch": round(t_tr / res.stats.niter, 4),
               "loss_ratio": ratio,
               "A_relerr_max": float(rels.max()),
               "A_relerr_min": float(rels.min()),
               "gates_pass": bool(ratio <= 1e-6 and rels.max() <= 1e-3
                                  and rels.min() <= 1e-4)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"n_glaciers": NG, "grid": NX, "dtype": "float32",
           "truth_cg_iters": 30, "ladder_epochs": 420, "rows": rows}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "cg_sensitivity_result.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
