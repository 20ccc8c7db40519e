"""Single-chip throughput curve: glaciers-per-chip scaling (BASELINE.md
north star — "inversions over 100+ glaciers, >=10x").

For NG in {128, 256, 512} Halfar glaciers on 128x128 grids (f32,
semi-implicit solver, full batch): time the jitted fwd+grad+Adam epoch of
the classical inversion and record HBM in use. One chip; the multi-chip
path is validated separately by dryrun_multichip (glacier-axis sharding
makes the batch dimension the scale-out axis, so s/epoch at NG glaciers on
one chip ~ s/epoch at k*NG glaciers on k chips modulo the psum).

Timing methodology: lax.fori-chained epochs inside one jit would hide the
optimizer boundary; instead the jitted full-batch step is called in a
Python loop with a final block_until_ready, discarding the compile call —
per-step dispatch (~65 us tunnel RTT) is <1% of the ~150 ms epoch.

Writes benchmarks/scaling_curve_result.json.
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
    import optax

    from train_at_scale import build_glaciers

    from odinn_tpu.core.glacier import stack_glaciers
    from odinn_tpu.core.params import (Hyperparameters, Parameters,
                                       PhysicalParameters, SimulationParameters,
                                       SolverParameters, UDEParameters)
    from odinn_tpu.laws.laws import CuffeyPaterson, LawA_inversion
    from odinn_tpu.models.model import Model, SIA2DModel, init_theta
    from odinn_tpu.simulation.inversion import batch_transient_loss
    from odinn_tpu.simulation.prediction import generate_ground_truth
    from odinn_tpu.simulation.solver import build_tstops

    NX = 128
    EPOCHS = 12
    # ODINN_SCALE_NG="1024" runs extra points; rows merge into the existing
    # JSON (sorted by n_glaciers) so prior points survive.
    ng_list = tuple(int(x) for x in
                    os.environ.get("ODINN_SCALE_NG", "128,256,512").split(","))
    results = []
    for NG in ng_list:
        # the stored fwd trajectory (remat=False, ~15-25% faster) fits HBM
        # to 256 glaciers; at 512 the fwd+grad program exceeds 15.75 GiB by
        # ~1.5 GiB. Chunked gradient accumulation bounds the live trajectory
        # WITHOUT recomputation (measured 2.7x faster than per-interval remat
        # at 512). "auto" = 64-glacier chunks, the measured sweet spot even
        # when memory fits (256: accum 1/2/4 -> 1298/1838/1943 g/s; 512:
        # accum 2/4/8 -> 1295/1856/1957; chunking schedules better).
        remat = False
        accum = "auto"
        params = Parameters(
            physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
            simulation=SimulationParameters(tspan=(5.0, 7.0), use_MB=False,
                                            use_velocities=False,
                                            float_dtype="float32"),
            solver=SolverParameters(step=1 / 12, substeps=1, solver="SI",
                                    cg_iters=20, remat=remat),
            hyper=Hyperparameters(optimizer="adam", learning_rate=0.1,
                                  epochs=EPOCHS, batch_size=NG,
                                  grad_accum_chunks=accum),
            UDE=UDEParameters(grad="jax", target="A"),
        )
        temps, glaciers = build_glaciers(NG, NX)
        tstops = build_tstops(params.simulation.tspan, params.solver.step)
        truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0))
        t0 = time.time()
        glaciers = generate_ground_truth(glaciers, params, truth, tstops,
                                         store=("H",))
        t_gt = time.time() - t0

        model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True),
                                         n_value=3.0))
        batch = stack_glaciers(glaciers)
        theta = jax.tree.map(lambda x: x.astype(jnp.float32),
                             init_theta(model, batch))
        opt = optax.adam(0.1)
        state = opt.init(theta)

        from odinn_tpu.simulation.inversion import (Inversion, _make_grad_fn,
                                                    resolve_accum_chunks)

        inv = Inversion(model=model, glaciers=glaciers, parameters=params,
                        theta=theta)
        vg = _make_grad_fn(
            inv, lambda th, b, ids: batch_transient_loss(th, b, model, params,
                                                         tstops, glacier_ids=ids))

        def step(theta, state, b):
            val, grads = vg(theta, b)
            updates, state = opt.update(grads, state, theta)
            return optax.apply_updates(theta, updates), state, val

        # AOT compile: the SAME executable is audited for HBM (compiler
        # budget; allocator stats where the backend exposes them) and timed
        from odinn_tpu.utils.memory import aot_step_memory

        step_c, mem = aot_step_memory(step, theta, state, batch)
        theta, state, val = step_c(theta, state, batch)   # warm
        jax.block_until_ready(val)
        t0 = time.time()
        for _ in range(EPOCHS):
            theta, state, val = step_c(theta, state, batch)
        jax.block_until_ready(val)
        dt = (time.time() - t0) / EPOCHS

        row = {"n_glaciers": NG, "grid": NX, "ground_truth_s": round(t_gt, 2),
               "s_per_epoch": round(dt, 4),
               "glaciers_per_s": round(NG / dt, 1),
               "hbm_gib": mem["total_gib"], "hbm_breakdown": mem,
               "remat": remat,
               "accum_chunks": resolve_accum_chunks(accum, NG), "loss": float(val)}
        results.append(row)
        print(json.dumps(row), flush=True)
        del batch, glaciers, theta, state

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scaling_curve_result.json")
    prev = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f).get("curve", [])
    merged = {r["n_glaciers"]: r for r in prev}
    merged.update({r["n_glaciers"]: r for r in results})
    out = {"device": str(jax.devices()[0]), "dtype": "float32",
           "solver": "SI",
           "curve": [merged[k] for k in sorted(merged)]}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
