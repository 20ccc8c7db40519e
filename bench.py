"""Headline benchmark: multi-glacier SIA2D forward simulation wall-clock.

Mirrors the reference's headline number — "Forward Prediction, 4 glaciers,
2010–2015, monthly MB: around 1-2 seconds" (BASELINE.md;
/root/reference/docs/src/forward_simulation.jl:133) — on the TPU-native
vmapped solve: 4 Halfar glaciers, 5 years, monthly saves with monthly
mass-balance application, 128×128 grids, float32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = reference_seconds (1.5) / our_seconds (>1 means faster).
"""

import json
import time

import numpy as np


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
    from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.laws.laws import CuffeyPaterson
    from odinn_tpu.physics.mass_balance import TImodel1
    from odinn_tpu.simulation.prediction import forward_batch
    from odinn_tpu.simulation.solver import build_tstops

    NX = NY = 128
    N_G = 4
    TSPAN = (5.0, 10.0)  # 5 years
    DX = 100.0

    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(
            tspan=TSPAN, use_MB=True, step_MB=1.0 / 12.0, use_velocities=False,
            float_dtype="float32",
        ),
        # semi-implicit solver: one unconditionally-stable step per monthly
        # save interval (matrix-free CG); fastest path and no CFL sizing
        solver=SolverParameters(step=1.0 / 12.0, substeps=1, solver="SI", cg_iters=20),
        UDE=UDEParameters(grad="jax"),
    )

    n_months = int(round((TSPAN[1] - TSPAN[0]) * 12)) + 2
    temps = np.linspace(-25.0, -13.0, N_G)
    glaciers = []
    for i, t in enumerate(temps):
        clim = monthly_dummy_climate(
            TSPAN[0], n_months, temp_mean=-4.0, longterm_temp=float(t), nx=NX, ny=NY
        )
        glaciers.append(
            halfar_glacier(nx=NX, ny=NY, dx=DX, dy=DX, temp=float(t),
                           rgi_id=f"bench-{i}", climate=clim)
        )
    batch = stack_glaciers(glaciers)
    batch = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        batch,
    )

    model = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0), mass_balance=TImodel1())
    tstops = build_tstops(TSPAN, params.solver.step)

    fwd = jax.jit(lambda b: forward_batch(None, b, model, params, tstops))
    # compile + warmup
    out = fwd(batch)
    jax.block_until_ready(out)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fwd(batch)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))

    baseline_sec = 1.5  # midpoint of the reference's "around 1-2 seconds"
    print(
        json.dumps(
            {
                "metric": "sia2d_forward_4glaciers_5yr_monthlyMB_128x128",
                "value": round(sec, 4),
                "unit": "s",
                "vs_baseline": round(baseline_sec / sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
