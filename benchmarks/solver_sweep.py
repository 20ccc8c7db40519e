"""Solver × gradient-path sweep — the reference's benchmark_ODINN.jl counterpart.

The reference's scripts/benchmarks/benchmark_ODINN.jl sweeps 12 OrdinaryDiffEq
solvers and a set of SciMLSensitivity sensealgs on 2 glaciers over 2010-2015,
timing one UDE train step per setting, and writes untracked
data/time_stats_benchmark_*.jld2 (benchmark_ODINN.jl:128-184; BASELINE.md).

TPU-native counterpart: 2 Halfar glaciers, 128x128 f32, 5 years, monthly
saves. For each solver in {Euler, SSPRK3, RK4, RKC, SI} we measure
  - forward: device time per full 5-yr 2-glacier solve (chained-dispatch
    slope, same methodology as bench.py), plus final-H parity vs an oracle
    trajectory (RK4, 240 substeps/month);
  - gradient: device time per loss+gradient evaluation for each gradient
    path in {jax (checkpointed reverse AD = InterpolatingAdjoint analogue),
    discrete (exact integrator transpose), continuous (adjoint ODE +
    Gauss quadrature)} with the default NN LawA.

Writes benchmarks/solver_sweep_result.json and prints a markdown table.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from odinn_tpu.core.params import (
        Parameters,
        PhysicalParameters,
        SimulationParameters,
        SolverParameters,
        UDEParameters,
    )
    from odinn_tpu.core.glacier import stack_glaciers
    from odinn_tpu.data.synthetic import halfar_glacier
    from odinn_tpu.inverse.adjoint_types import (
        ContinuousAdjoint,
        DiscreteAdjoint,
        DiscreteVJP,
    )
    from odinn_tpu.inverse.gradient import make_adjoint_value_and_grad
    from odinn_tpu.laws.laws import CuffeyPaterson, LawA
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture
    from odinn_tpu.simulation.inversion import Inversion, batch_transient_loss
    from odinn_tpu.simulation.prediction import forward_batch, generate_ground_truth
    from odinn_tpu.simulation.solver import build_tstops

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    NX = 128
    TSPAN = (2010.0, 2015.0)

    def make_params(solver, substeps, grad="jax"):
        return Parameters(
            physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
            simulation=SimulationParameters(
                tspan=TSPAN, use_MB=False, use_velocities=False,
                float_dtype="float32",
            ),
            solver=SolverParameters(
                solver=solver, step=1.0 / 12.0, substeps=substeps, cg_iters=10
            ),
            UDE=UDEParameters(grad=grad),
        )

    glaciers = [
        halfar_glacier(nx=NX, ny=NX, dx=60.0, dy=60.0, temp=-16.0, rgi_id="g0"),
        halfar_glacier(nx=NX, ny=NX, dx=60.0, dy=60.0, temp=-20.0, rgi_id="g1"),
    ]
    tstops = build_tstops(TSPAN, 1.0 / 12.0)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson()))

    def to_f32(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    batch = to_f32(stack_glaciers(glaciers))

    # oracle trajectory: RK4 at 240 substeps/month (dt ≈ 0.35 µyr — far below
    # any sweep member's dt), the RDPK3Sp35 reference-dataset analogue
    oracle_params = make_params("RK4", 240)
    H_ref = np.asarray(
        forward_batch(None, batch, truth, oracle_params, tstops)[:, -1]
    )
    scale = np.abs(H_ref).max()

    def chained_forward(params, K):
        def body(carry, _):
            b2 = batch.replace(H0=batch.H0 + carry)
            traj = forward_batch(None, b2, truth, params, tstops)
            return jnp.asarray(0.0, jnp.float32) * jnp.sum(traj[:, -1]), None

        return jax.lax.scan(
            body, jnp.asarray(0.0, jnp.float32), None, length=K
        )[0]

    def slope(make_run, k_lo, k_hi, reps=5):
        def timed(K):
            g = jax.jit(lambda: make_run(K))
            float(g())  # compile + warm
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(g())
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)

    # per-solver substep choice: the stability-limited explicit steppers need
    # fine substeps at this dx; RKC buys a ~s^2 larger stable dt; SI is
    # unconditionally stable (1 step/month, warm-started PCG)
    SOLVERS = [
        ("Euler", 40), ("SSPRK3", 20), ("RK4", 20), ("RKC", 3), ("SI", 1),
        ("SI2", 1),   # 2nd-order semi-implicit (all three gradient paths)
    ]

    results = {
        "grid": [NX, NX], "n_glaciers": 2, "tspan": list(TSPAN),
        "dtype": "float32", "backend": jax.default_backend(),
        "oracle": "RK4 @ 240 substeps/month",
        "methodology": "chained-dispatch slope (see module docstring)",
        "solvers": {},
    }

    out = os.path.join(os.path.dirname(__file__), "solver_sweep_result.json")

    def write_results():
        # incremental: a failure mid-sweep must not lose measured rows
        with open(out, "w") as f:
            json.dump(results, f, indent=1)

    print("\n| solver | substeps/month | forward (ms) | max rel H err vs oracle |")
    print("|---|---|---|---|")
    for name, sub in SOLVERS:
        try:
            p = make_params(name, sub)
            Hf = np.asarray(forward_batch(None, batch, truth, p, tstops)[:, -1])
            err = float(np.abs(Hf - H_ref).max() / scale)
            t_fwd = slope(lambda K, p=p: chained_forward(p, K), 20, 60)
        except Exception as e:  # record-and-continue, like the gradient combos
            results["solvers"][name] = {"substeps": sub, "error": f"{e}"}
            print(f"| {name} | {sub} | failed ({type(e).__name__}) | - |")
            write_results()
            continue
        results["solvers"][name] = {
            "substeps": sub, "forward_s": t_fwd, "max_rel_H_err": err,
            "gradients": {},
        }
        print(f"| {name} | {sub} | {t_fwd*1e3:.2f} | {err:.2e} |")
        write_results()

    # gradient paths on the UDE (NN LawA), per solver. To keep the 15-combo
    # sweep's compile budget sane on the tunneled chip, gradient rows use a
    # 2-year window (24 monthly intervals); relative costs are what the sweep
    # is for, and they scale linearly in intervals.
    G_TSPAN = (2010.0, 2012.0)
    g_tstops = build_tstops(G_TSPAN, 1.0 / 12.0)
    nn = NeuralNetwork(default_architecture(1, light=True), seed=3)
    gt_params = make_params("RK4", 40)
    gt_params = gt_params.replace(
        simulation=dataclasses.replace(gt_params.simulation, tspan=G_TSPAN)
    )
    glaciers_gt = generate_ground_truth(
        glaciers, gt_params, truth, g_tstops, store=("H",)
    )

    GRADS = [
        ("jax", "jax"),
        ("discrete", DiscreteAdjoint(VJP_method=DiscreteVJP())),
        ("continuous", ContinuousAdjoint(VJP_method=DiscreteVJP(), n_quadrature=30)),
    ]

    print("\n| solver | grad path | loss+grad (ms) |")
    print("|---|---|---|")
    for name, sub in SOLVERS:
        if "gradients" not in results["solvers"].get(name, {}):
            continue  # forward phase failed for this solver
        for gname, grad in GRADS:
            p = make_params(name, sub, grad=grad)
            p = p.replace(
                simulation=dataclasses.replace(p.simulation, tspan=G_TSPAN)
            )
            model = Model(iceflow=SIA2DModel(A=LawA(nn, p)))
            inv = Inversion(model=model, glaciers=glaciers_gt, parameters=p)
            theta = to_f32(inv.theta)
            gbatch = to_f32(inv.glaciers)  # Inversion stores the stacked batch
            try:
                if gname == "jax":
                    ts2 = g_tstops
                    vg_base = jax.value_and_grad(
                        lambda th, b: batch_transient_loss(th, b, model, p, ts2)
                    )

                    def chained(K, vg_base=vg_base, gbatch=gbatch, theta=theta):
                        def body(carry, _):
                            th2 = jax.tree.map(lambda x: x + carry, theta)
                            v, g = vg_base(th2, gbatch)
                            s = v + sum(jnp.sum(l) for l in jax.tree.leaves(g))
                            return jnp.asarray(0.0, jnp.float32) * s, None

                        return jax.lax.scan(
                            body, jnp.asarray(0.0, jnp.float32), None, length=K
                        )[0]
                else:
                    # time the SAME f32 inputs as the "jax" path (gbatch):
                    # under jax_enable_x64 the raw batch would silently be f64
                    inv2 = Inversion(
                        model=model, glaciers=gbatch, parameters=p, theta=theta
                    )
                    vg_m = make_adjoint_value_and_grad(inv2, flavor=grad.name)

                    def chained(K, vg_m=vg_m, theta=theta):
                        def body(carry, _):
                            th2 = jax.tree.map(lambda x: x + carry, theta)
                            v, g = vg_m(th2)
                            s = v + sum(jnp.sum(l) for l in jax.tree.leaves(g))
                            return jnp.asarray(0.0, jnp.float32) * s, None

                        return jax.lax.scan(
                            body, jnp.asarray(0.0, jnp.float32), None, length=K
                        )[0]

                t_g = slope(chained, 5, 20, reps=3)
                results["solvers"][name]["gradients"][gname] = t_g
                print(f"| {name} | {gname} | {t_g*1e3:.2f} |")
            except Exception as e:  # unsupported combo: record, don't die
                results["solvers"][name]["gradients"][gname] = f"unsupported: {e}"
                print(f"| {name} | {gname} | unsupported ({type(e).__name__}) |")
            write_results()

    write_results()
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
