"""Flagship convergence evidence: drive the functional inversion to the
reference's accuracy gates (loss < 1e-6 x initial; A rel err < 1e-3,
/root/reference/test/inversion_test.jl:154-163) with staged Adam->LBFGS."""
import os, json, time
if __name__ == "__main__":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp, numpy as np
    from odinn_tpu.core.params import (Parameters, PhysicalParameters,
        SimulationParameters, SolverParameters, Hyperparameters, UDEParameters)
    from odinn_tpu.data.synthetic import halfar_glacier
    from odinn_tpu.laws.laws import CuffeyPaterson, LawA, eval_law, poly_A_paterson_cuffey
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture
    from odinn_tpu.simulation.inversion import Inversion, run_inversion
    from odinn_tpu.simulation.prediction import generate_ground_truth
    from odinn_tpu.simulation.solver import build_tstops

    tspan = (5.0, 6.5)
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(tspan=tspan, use_MB=False, use_velocities=False),
        solver=SolverParameters(step=1/12, substeps=20),
        # staged Adam -> LBFGS -> Gauss-Newton: the LM tail reaches the
        # same sub-1e-20 ratio the r1 double-LBFGS config needed 280
        # iterations (27 min) for, in a fraction of the wall clock
        hyper=Hyperparameters(optimizer=("adam", "lbfgs", "lm"),
                              learning_rate=(0.05, 1.0, 1e-3), epochs=(40, 60, 15)),
        UDE=UDEParameters(grad="jax", target="A"))
    glaciers = [halfar_glacier(nx=40, ny=40, dx=120.0, temp=-15.0, rgi_id="c0"),
                halfar_glacier(nx=40, ny=40, dx=120.0, temp=-25.0, rgi_id="c1")]
    tst = build_tstops(tspan, 1/12)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))
    glaciers = generate_ground_truth(glaciers, params, truth, tst, store=("H",))
    nn = NeuralNetwork(default_architecture(1, light=True), seed=666)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    inv = Inversion(model=model, glaciers=glaciers, parameters=params)
    t0 = time.time()
    res = run_inversion(inv)
    L = res.stats.losses
    a_true = poly_A_paterson_cuffey()
    out = {"time_s": time.time()-t0, "niter": res.stats.niter,
           "loss0": L[0], "loss_final": res.stats.final_loss,
           "ratio": res.stats.final_loss/L[0]}
    for gi, T in [(0, -15.0), (1, -25.0)]:
        a_nn = float(eval_law(model.iceflow.A, inv.theta, glaciers[gi], glacier_idx=gi))
        a_ref = float(a_true(jnp.asarray(T)))
        out[f"A_relerr_T{T}"] = abs(a_nn-a_ref)/a_ref
    print(json.dumps(out, indent=1))
    with open("benchmarks/convergence_result.json", "w") as f:
        json.dump(out, f, indent=1)
