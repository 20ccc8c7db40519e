"""North-star scenario (BASELINE.md): UDE functional inversion over 100+
glaciers on TPU. Trains A = NN(T) against Cuffey-Paterson synthetic truth on
128 Halfar glaciers (128x128 grids, 2 years monthly), float32, semi-implicit
solver, staged Adam -> LBFGS. Writes benchmarks/train_at_scale_result.json."""
import json, time

import numpy as np


def main():
    import jax, jax.numpy as jnp
    from odinn_tpu.core.params import (Parameters, PhysicalParameters,
        SimulationParameters, SolverParameters, Hyperparameters, UDEParameters)
    from odinn_tpu.core.glacier import stack_glaciers
    from odinn_tpu.data.synthetic import halfar_glacier
    from odinn_tpu.laws.laws import CuffeyPaterson, LawA, eval_law, poly_A_paterson_cuffey
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture
    from odinn_tpu.simulation.inversion import Inversion, run_inversion
    from odinn_tpu.simulation.prediction import generate_ground_truth
    from odinn_tpu.simulation.solver import build_tstops

    NG, NX = 128, 128
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=(5.0, 7.0), use_MB=False,
                                        use_velocities=False, float_dtype="float32"),
        solver=SolverParameters(step=1 / 12, substeps=1, solver="SI", cg_iters=20),
        # staged Adam; LBFGS linesearch is noisy in float32 at this scale
        hyper=Hyperparameters(optimizer=("adam", "adam"),
                              learning_rate=(0.05, 0.01), epochs=(60, 60)),
        UDE=UDEParameters(grad="jax", target="A"),
    )
    temps = np.linspace(-25.0, -13.0, NG)
    glaciers = [halfar_glacier(nx=NX, ny=NX, dx=100.0, temp=float(t), rgi_id=f"s{i}")
                for i, t in enumerate(temps)]
    tstops = build_tstops(params.simulation.tspan, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0))
    t0 = time.time()
    glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
    t_gt = time.time() - t0

    nn = NeuralNetwork(default_architecture(1), seed=666)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params), n_value=3.0))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    inv.theta = jax.tree.map(lambda x: x.astype(jnp.float32), inv.theta)

    t0 = time.time()
    res = run_inversion(inv)
    t_train = time.time() - t0
    L = res.stats.losses
    a_true = poly_A_paterson_cuffey()
    rels = []
    for gi in (0, NG // 2, NG - 1):
        a_nn = float(eval_law(model.iceflow.A, inv.theta, glaciers[gi], glacier_idx=gi))
        a_ref = float(a_true(jnp.asarray(float(temps[gi]))))
        rels.append(abs(a_nn - a_ref) / a_ref)
    out = {
        "n_glaciers": NG, "grid": NX, "dtype": "float32", "solver": "SI",
        "ground_truth_s": round(t_gt, 2), "train_s": round(t_train, 2),
        "niter": res.stats.niter, "s_per_epoch": round(t_train / res.stats.niter, 3),
        "loss0": float(L[0]), "loss_final": float(min(L)),
        "loss_ratio": float(min(L) / L[0]),
        "A_relerr_cold_mid_warm": [float(r) for r in rels],
    }
    print(json.dumps(out, indent=1))
    with open("benchmarks/train_at_scale_result.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
