"""Headline benchmark: multi-glacier SIA2D forward simulation, device time.

Mirrors the reference's headline number — "Forward Prediction, 4 glaciers,
2010–2015, monthly MB: around 1-2 seconds" (BASELINE.md;
/root/reference/docs/src/forward_simulation.jl:133) — on the TPU-native
vmapped solve: 4 Halfar glaciers, 5 years, monthly saves with monthly
mass-balance application, 128×128 grids, float32, semi-implicit solver
(Jacobi-PCG with time-extrapolated warm starts, cg_iters=10: final H within
2.0e-6 of the cg=60-converged trajectory — measured sweep in STATUS.md, 5×
inside the 1e-5 H-parity north star).

Methodology — chained-dispatch slope. This dev harness reaches its single
TPU chip through an RPC tunnel whose dispatch+sync round trip is ~28 ms,
10× the simulation itself (a no-op jit with a scalar fetch costs the same
wall-clock as the whole 5-year forward). A single-dispatch timing therefore
measures the tunnel, not the hardware. Instead K independent repeats of the
full forward run inside ONE dispatch — serialized by a runtime-0 coupling
through H0 so XLA can neither dead-code nor reorder them — and the reported
value is the marginal cost (t(K=30) − t(K=10)) / 20: pure device time per
complete 5-year simulation, the number a production (non-tunneled) TPU user
pays. Same chained methodology as benchmarks/pallas_roofline.py. For the
record, the single-dispatch wall-clock including the tunnel round trip is
~0.032 s (still 47× the reference baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = reference_seconds (1.5) / our_seconds (>1 means faster).
"""

import dataclasses
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
        # save interval; warm-started Jacobi-PCG at 10 iterations (H within
        # 2.0e-6 of the converged solve — see module docstring)
        solver=SolverParameters(step=1.0 / 12.0, substeps=1, solver="SI", cg_iters=10),
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

    def chained(b, eps, K):
        # K full forwards in one dispatch; eps (0.0 at runtime) forces a
        # data dependence between repeats that XLA cannot fold away
        def body(carry, _):
            b2 = dataclasses.replace(b, H0=b.H0 + eps * carry)
            traj = forward_batch(None, b2, model, params, tstops)
            return jnp.sum(traj[:, -1]), None

        return jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None, length=K)[0]

    def timed(K, reps=5):
        g = jax.jit(lambda b, e: chained(b, e, K))
        eps = jnp.asarray(0.0, jnp.float32)
        float(g(batch, eps))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(batch, eps))  # scalar fetch = true device sync
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    K_LO, K_HI = 10, 30
    sec = (timed(K_HI) - timed(K_LO)) / (K_HI - K_LO)

    baseline_sec = 1.5  # midpoint of the reference's "around 1-2 seconds"
    print(
        json.dumps(
            {
                "metric": "sia2d_forward_4glaciers_5yr_monthlyMB_128x128_device",
                "value": round(sec, 5),
                "unit": "s",
                "vs_baseline": round(baseline_sec / sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
