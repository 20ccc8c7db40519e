"""Find the accuracy-matched headline configuration.

The r3 verdict (Weak #1): the 1.97 ms fast row's accuracy claim measured only
CG truncation at fixed monthly SI stepping; its TOTAL time-discretization
error is ~2.5e-3 — not comparable to BASELINE.md's "H within 1e-5" north
star. This sweep measures, on the EXACT bench.py problem (4 Halfar glaciers,
5 yr, monthly MB, 128², f32), the total final-H error of candidate solver
configs against a converged-in-time oracle (RK4 @ 240 substeps/month, itself
verified by a 480-substep self-check), plus their device time — to pick the
config bench.py publishes as its accuracy-matched second row.

Writes benchmarks/accuracy_matched_result.json incrementally.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(dtype: str = "float32"):
    # "compensated" mode: f32 candidates with Kahan-compensated accumulation
    # (SolverParameters.compensated), errors measured against an f64
    # converged-in-time oracle — plain-f32 errors are floored at ~5e-5-1e-4
    # by the state-update rounding walk, so a same-dtype oracle cannot see
    # below it
    if dtype in ("float64", "compensated"):
        import jax

        jax.config.update("jax_enable_x64", True)
    import jax
    import jax.numpy as jnp

    fdt = jnp.float64 if dtype == "float64" else jnp.float32

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

    print(f"backend: {jax.default_backend()}", flush=True)

    NX = NY = 128
    N_G = 4
    TSPAN = (5.0, 10.0)
    DX = 100.0

    def make_params(solver, substeps, cg_iters=10, compensated=False,
                    rkc_stages=16):
        return Parameters(
            physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
            simulation=SimulationParameters(
                tspan=TSPAN, use_MB=True, step_MB=1.0 / 12.0,
                use_velocities=False,
                float_dtype="float64" if dtype == "float64" else "float32",
            ),
            solver=SolverParameters(step=1.0 / 12.0, substeps=substeps,
                                    solver=solver, cg_iters=cg_iters,
                                    compensated=compensated,
                                    rkc_stages=rkc_stages),
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
        lambda x: x.astype(fdt)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        batch,
    )
    model = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0),
                  mass_balance=TImodel1())
    tstops = build_tstops(TSPAN, 1.0 / 12.0)

    def final_H(params, b=None):
        b = batch if b is None else b
        return np.asarray(jax.jit(
            lambda b: forward_batch(None, b, model, params, tstops)[:, -1]
        )(b))

    batch64 = None
    if dtype == "compensated":
        batch64 = jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            batch,
        )

    def oracle_H(params):
        # f64 oracle for the compensated mode; same-dtype otherwise
        return final_H(params, batch64) if dtype == "compensated" else final_H(params)

    t0 = time.time()
    H_ref = oracle_H(make_params("RK4", 240))
    print(f"oracle RK4@240 done in {time.time()-t0:.0f}s", flush=True)
    scale = np.abs(H_ref).max()
    # oracle self-check: halving dt must move the oracle far less than the
    # 1e-5 gate, or it is not converged-in-time
    H_ref2 = oracle_H(make_params("RK4", 480))
    self_err = float(np.abs(H_ref2 - H_ref).max() / scale)
    print(f"oracle self-check (240 vs 480): {self_err:.2e}", flush=True)

    def chained(params, K):
        def body(carry, _):
            b2 = dataclasses.replace(batch, H0=batch.H0 + 0.0 * carry)
            traj = forward_batch(None, b2, model, params, tstops)
            return jnp.sum(traj[:, -1]), None

        return jax.lax.scan(body, jnp.asarray(0.0, fdt), None, length=K)[0]

    def timed_slope(params, k_lo=5, k_hi=15, reps=5):
        def timed(K):
            g = jax.jit(lambda: chained(params, K))
            float(g())
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(g())
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)

    if dtype == "compensated":
        # r4 sweep: every compensated row at substeps >= 15 measured the
        # IDENTICAL error 1.713e-7 — the f32 state-representation floor, not
        # truncation. So the substep count is set by diffusion STABILITY,
        # not accuracy: probe downward to the stability edge (unstable rows
        # show up as huge/NaN error), and probe the stabilized-Chebyshev
        # stepper (RKC2: real stability interval ~ 0.65 s² per step) at one
        # step per month, where the 60-update rounding walk stays below the
        # 1e-5 north star even without compensation.
        CANDIDATES = [
            # SI2 (CN + Picard midpoint D, 2 warm CG solves/step): f32 rows
            # measured against the f64 oracle — 60 state updates keep the
            # plain-f32 rounding walk ~5e-7, far below SI2's CN truncation
            ("SI2", 1, 10),
            ("SI2", 1, 6),
            ("SI2", 1, 4),
            ("SI2", 2, 10),
            ("SI2", 2, 6),
            ("SI2", 3, 10),
            ("SSPRK3", 15, 10, True),
            ("SSPRK3", 12, 10, True),
            ("SSPRK3", 10, 10, True),
            ("SSPRK3", 8, 10, True),
            ("SSPRK3", 6, 10, True),
            ("SSPRK3", 5, 10, True),
            ("SSPRK3", 4, 10, True),
            ("SSPRK3", 3, 10, True),
            ("SSPRK3", 2, 10, True),  # edge probe: expect ~5e-6 or unstable
            ("RK4", 15, 10, True),
            ("RKC", 1, 10, False, 30),
            ("RKC", 1, 10, False, 22),
            ("RKC", 1, 10, False, 16),
            ("RKC", 2, 10, False, 16),
            ("SSPRK3", 20, 10, False),   # plain f32 control
        ]
    elif dtype == "float64":
        CANDIDATES = [
            ("SI", 1, 10),      # the fast row's config, f64
            ("SSPRK3", 15, 10),
            ("SSPRK3", 20, 10),
            ("SSPRK3", 30, 10),
            ("RK4", 15, 10),
            ("RK4", 20, 10),
            ("RK4", 30, 10),
        ]
    else:
        CANDIDATES = [
            ("SI", 1, 10),      # the fast row, for reference
            ("SI", 1, 8),       # cheaper-CG fast-row candidates: CG truncation
            ("SI", 1, 6),       # is 2 orders below the 2.3e-3 splitting error
            ("SI", 1, 5),       # edge probes: where does CG truncation start
            ("SI", 1, 4),       # to show against the splitting floor?
            ("SI", 4, 10),
            ("SI", 16, 15),
            ("SSPRK3", 20, 10),
            ("SSPRK3", 30, 10),
            ("SSPRK3", 40, 10),
            ("RK4", 20, 10),
            ("RK4", 30, 10),
            ("RK4", 40, 10),
        ]

    suffix = {"float64": "_f64", "compensated": "_comp"}.get(dtype, "")
    out_path = os.path.join(os.path.dirname(__file__),
                            f"accuracy_matched_result{suffix}.json")
    results = {
        "problem": f"bench.py headline (4 glaciers, 5yr, monthly MB, 128^2, {dtype})",
        "oracle": "RK4 @ 240 substeps/month"
                  + (" (float64)" if dtype == "compensated" else ""),
        "oracle_self_check_240_vs_480": self_err,
        "rows": [],
    }
    for cand in CANDIDATES:
        solver, sub, cg = cand[:3]
        comp = bool(cand[3]) if len(cand) > 3 else False
        stages = int(cand[4]) if len(cand) > 4 else 16
        p = make_params(solver, sub, cg, compensated=comp, rkc_stages=stages)
        Hf = final_H(p)
        err = float(np.abs(Hf.astype(np.float64) - H_ref).max() / scale)
        sec = timed_slope(p)
        row = {"solver": solver, "substeps": sub, "cg_iters": cg,
               "compensated": comp,
               "max_rel_H_err": err if np.isfinite(err) else None,
               "device_s": sec,
               "vs_baseline": round(1.5 / sec, 1)}
        if not np.isfinite(err):
            # strict-JSON-safe instability record (NaN is invalid JSON):
            # the candidate sits beyond the explicit stepper's diffusion
            # stability edge (dt > ~C dx^2 / D_max), so the solve blows up
            row["unstable"] = True
        if solver == "RKC":
            row["rkc_stages"] = stages
        results["rows"].append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "float32")
