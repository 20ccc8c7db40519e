"""Headline benchmark: multi-glacier SIA2D forward simulation, device time.

Mirrors the reference's headline number — "Forward Prediction, 4 glaciers,
2010–2015, monthly MB: around 1-2 seconds" (BASELINE.md;
/root/reference/docs/src/forward_simulation.jl:133) — on the TPU-native
vmapped solve: 4 Halfar glaciers, 5 years, monthly saves with monthly
mass-balance application, 128×128 grids, float32. TWO rows in one JSON line:

- **fast** (the headline `value`): semi-implicit solver, one
  unconditionally-stable step per monthly interval, warm-started Jacobi-PCG
  at cg_iters=6. Total H error vs a converged-in-time float64 oracle
  (RK4 @ 240 substeps/month, self-check 1.8e-13): **2.3e-3** relative —
  operator-splitting dominated: the sweep's SI@1 rows measure cg=10 at
  2.289e-3 / cg=8 at 2.295e-3 / cg=6 at 2.305e-3 total, so the time-
  extrapolated CG warm start makes truncation a <1% contributor down to 6
  iterations and cg=6 is the fastest config at this accuracy tier
  (benchmarks/accuracy_matched_result.json).
- **si2** (informational third row): the second-order semi-implicit solver
  (solver="SI2": Crank–Nicolson + Picard midpoint diffusivity,
  simulation/implicit.py) at one step per monthly interval — the production
  choice when unconditional stability AND accuracy must hold at once. Total
  H error vs the same f64 oracle: **9.3e-5** (25× below the fast row) at
  ~1.6× the fast row's device time.
- **accuracy_matched**: SSPRK3 @ 3 substeps/month with Kahan-COMPENSATED
  f32 accumulation (SolverParameters.compensated — removes the ~4e-5 f32
  rounding walk that floors plain f32). Total H error vs the same f64
  oracle: **1.7e-6** — 6× inside BASELINE.md's 1e-5 north star, which is
  the accuracy regime the reference's Float64 reltol=1e-8 adaptive solve
  (inversion_utils.jl:559-568) targets. The full trade curve (sweep):
  compensated SSPRK3 holds the 1.7e-7 f32-representation floor down to 8
  substeps/month, then truncation grows ~2.5×/substep removed (6→2.0e-7,
  5→3.0e-7, 4→6.2e-7, 3→1.7e-6); @3 is the fastest config inside the
  north star with margin. This is the honest apples-to-apples row; the
  fast row is what production chooses when 2.3e-3 forward error is
  acceptable (it is ~40× below typical thickness observation noise).

Error figures are measured by benchmarks/accuracy_matched.py (run modes
"float32"/"float64"/"compensated") against the f64 oracle; bench.py itself
only re-times both configurations so the driver's per-round number stays
cheap. Re-run the sweep when the solver configuration here changes.

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

    def make_params(**solver_kw):
        return Parameters(
            physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
            simulation=SimulationParameters(
                tspan=TSPAN, use_MB=True, step_MB=1.0 / 12.0,
                use_velocities=False, float_dtype="float32",
            ),
            solver=SolverParameters(step=1.0 / 12.0, **solver_kw),
            UDE=UDEParameters(grad="jax"),
        )

    # fast row: semi-implicit, warm-started Jacobi-PCG (see docstring)
    params = make_params(substeps=1, solver="SI", cg_iters=6)
    # SI2 row: second-order semi-implicit (CN + Picard midpoint diffusivity,
    # simulation/implicit.py) — 25× lower time error than the fast row at
    # 1.6× cost, same unconditional stability (H err 9.3e-5 vs f64 oracle)
    params_si2 = make_params(substeps=1, solver="SI2", cg_iters=6,
                             cg_iters_predictor=6)
    # accuracy-matched row: compensated-f32 SSPRK3 (H err 1.7e-6 vs f64)
    params_acc = make_params(substeps=3, solver="SSPRK3", compensated=True)

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

    def chained(b, eps, K, p):
        # K full forwards in one dispatch; eps (0.0 at runtime) forces a
        # data dependence between repeats that XLA cannot fold away
        def body(carry, _):
            b2 = dataclasses.replace(b, H0=b.H0 + eps * carry)
            traj = forward_batch(None, b2, model, p, tstops)
            return jnp.sum(traj[:, -1]), None

        return jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None, length=K)[0]

    def timed(K, p, reps=5):
        g = jax.jit(lambda b, e: chained(b, e, K, p))
        eps = jnp.asarray(0.0, jnp.float32)
        float(g(batch, eps))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(batch, eps))  # scalar fetch = true device sync
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def slope(p, k_lo=10, k_hi=30):
        return (timed(k_hi, p) - timed(k_lo, p)) / (k_hi - k_lo)

    sec = slope(params)
    sec_si2 = slope(params_si2)
    sec_acc = slope(params_acc, k_lo=5, k_hi=15)

    def measured_err(fname, **match):
        """Pull the measured max_rel_H_err for an exact config row from the
        checked-in accuracy_matched artifact (same problem, same configs) —
        bench.py times; the accuracy suite measures (ADVICE r4 #3: no
        hardcoded error figures)."""
        import os

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", fname)
        try:
            with open(path) as f:
                rows = json.load(f)["rows"]
            for r in rows:
                if all(r.get(k) == v for k, v in match.items()):
                    return round(r["max_rel_H_err"], 10)
        except Exception:
            pass
        return None

    err_fast = measured_err("accuracy_matched_result.json",
                            solver="SI", substeps=1, cg_iters=6)
    err_si2 = measured_err("accuracy_matched_result_comp.json",
                           solver="SI2", substeps=1, cg_iters=6)
    err_acc = measured_err("accuracy_matched_result_comp.json",
                           solver="SSPRK3", substeps=3, compensated=True)

    baseline_sec = 1.5  # midpoint of the reference's "around 1-2 seconds"
    print(
        json.dumps(
            {
                "metric": "sia2d_forward_4glaciers_5yr_monthlyMB_128x128_device",
                "value": round(sec, 5),
                "unit": "s",
                "vs_baseline": round(baseline_sec / sec, 2),
                # total H error vs the converged f64 oracle, read from the
                # checked-in benchmarks/accuracy_matched.py artifacts for the
                # EXACT configs timed here (None if the artifact is missing)
                "fast_row_max_rel_H_err": err_fast,
                "si2": {
                    "solver": "SI2@1/month (CN + Picard midpoint D), PCG-6",
                    "value": round(sec_si2, 5),
                    "vs_baseline": round(baseline_sec / sec_si2, 2),
                    "max_rel_H_err": err_si2,
                },
                "accuracy_matched": {
                    "solver": "SSPRK3@3/month, compensated f32",
                    "value": round(sec_acc, 5),
                    "vs_baseline": round(baseline_sec / sec_acc, 2),
                    "max_rel_H_err": err_acc,
                    "north_star": "H within 1e-5 (BASELINE.md)",
                    "err_source": "benchmarks/accuracy_matched_result*.json",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
