"""Fused Pallas SI-step kernel vs the XLA production path, on the EXACT
bench.py headline problem (4 Halfar glaciers, 5 yr, monthly MB, 128², f32).

The XLA fast row runs one warm-started Jacobi-PCG solve per monthly interval
through lax.custom_linear_solve (simulation/implicit.py); each CG iteration's
operator application and dot products round-trip HBM. The kernel variant
(ops/pallas/si_kernel.py) keeps the whole step VMEM-resident. This script
measures whether that wins at the headline shape, by chained-dispatch slope
(same methodology as bench.py), and checks final-H agreement between the two
paths. Writes benchmarks/si_pallas_result.json.
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
    from jax import lax

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
    from odinn_tpu.ops.pallas.rkc_kernel import derived_scalars
    from odinn_tpu.ops.pallas.si_kernel import si_step_pallas
    from odinn_tpu.physics.mass_balance import TImodel1, mb_timestep
    from odinn_tpu.simulation.prediction import forward_batch
    from odinn_tpu.simulation.solver import build_tstops

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}", flush=True)

    NX = NY = 128
    N_G = 4
    TSPAN = (5.0, 10.0)
    DX = 100.0
    DT = 1.0 / 12.0
    CG = 6

    def make_params(**solver_kw):
        return Parameters(
            physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
            simulation=SimulationParameters(
                tspan=TSPAN, use_MB=True, step_MB=DT,
                use_velocities=False, float_dtype="float32",
            ),
            solver=SolverParameters(step=DT, **solver_kw),
            UDE=UDEParameters(grad="jax"),
        )

    n_months = int(round((TSPAN[1] - TSPAN[0]) * 12)) + 2
    temps = np.linspace(-25.0, -13.0, N_G)
    glaciers = []
    for i, t in enumerate(temps):
        clim = monthly_dummy_climate(TSPAN[0], n_months, temp_mean=-4.0,
                                     longterm_temp=float(t), nx=NX, ny=NY)
        glaciers.append(halfar_glacier(nx=NX, ny=NY, dx=DX, dy=DX,
                                       temp=float(t), rgi_id=f"b{i}",
                                       climate=clim))
    batch = stack_glaciers(glaciers)
    batch = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        batch)
    mb = TImodel1()
    model = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0),
                  mass_balance=mb)
    tstops = build_tstops(TSPAN, DT)

    # per-glacier scalars: CuffeyPaterson A at each glacier's longterm temp —
    # the SAME values the production path resolves at solve start
    from odinn_tpu.models.model import resolve_outer_values

    idxs = jnp.arange(N_G)
    A_g = jax.vmap(
        lambda g, i: resolve_outer_values(model, None, g, i, tstops[0], H=g.H0).A
    )(batch, idxs)
    scal = derived_scalars(
        jnp.full((N_G,), DX, jnp.float32), jnp.full((N_G,), DX, jnp.float32),
        A_g.astype(jnp.float32), jnp.zeros((N_G,), jnp.float32),
        jnp.full((N_G,), 3.0, jnp.float32), jnp.full((N_G,), 3.0, jnp.float32),
        jnp.zeros((N_G,), jnp.float32), 900.0, 9.81,
    ).astype(jnp.float32)

    t0s, t1s = tstops[:-1], tstops[1:]

    def kernel_solve(b, si2=False):
        """integrate_semi_implicit's loop with si_step_pallas inside:
        warm-start extrapolation carry + monthly MB at interval ends."""
        H0 = b.H0
        B = b.B

        def interval(carry, xs):
            H, dH = carry
            t1 = xs
            x0 = H + dH   # uniform tstops: ratio == 1 (2H − H_prev guess)
            if si2:
                Hp = si_step_pallas(H, H, B, x0, scal, DT, 0.5, CG)
                Hn = si_step_pallas(H, 0.5 * (H + Hp), B, Hp, scal, DT, 0.5, CG)
            else:
                Hn = si_step_pallas(H, H, B, x0, scal, DT, 1.0, CG)
            dHn = Hn - H
            Hc = jax.vmap(lambda h, g, tb: mb_timestep(h, g, mb, tb, DT),
                          in_axes=(0, 0, None))(Hn, b, t1)
            return (Hc, dHn), Hc

        (_, _), traj = lax.scan(interval, (H0, jnp.zeros_like(H0)), t1s)
        return traj.swapaxes(0, 1)   # (G, T-1, nx, ny); [:, -1] is final H

    p_fast = make_params(substeps=1, solver="SI", cg_iters=CG)

    # --- agreement: kernel loop vs production XLA path, final H ---
    Hx = jax.jit(lambda b: forward_batch(None, b, model, p_fast, tstops)[:, -1])(batch)
    Hk = jax.jit(lambda b: kernel_solve(b)[:, -1])(batch)
    agree = float(jnp.abs(Hx - Hk).max())
    scale = float(jnp.abs(Hx).max())
    print(f"final-H agreement (kernel vs XLA path): max abs {agree:.3e} "
          f"({agree / scale:.2e} rel)", flush=True)

    # --- chained-dispatch slope timing (bench.py methodology) ---
    def chained(solve_fn, b, eps, K):
        def body(carry, _):
            b2 = dataclasses.replace(b, H0=b.H0 + eps * carry)
            traj = solve_fn(b2)
            return jnp.sum(traj[:, -1]), None

        return lax.scan(body, jnp.asarray(0.0, jnp.float32), None, length=K)[0]

    def slope(solve_fn, k_lo=10, k_hi=30, reps=5):
        def timed(K):
            g = jax.jit(lambda b, e: chained(solve_fn, b, e, K))
            eps = jnp.asarray(0.0, jnp.float32)
            float(g(batch, eps))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(g(batch, eps))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)

    rows = {}
    t_xla = slope(lambda b: forward_batch(None, b, model, p_fast, tstops))
    rows["xla_si_cg6"] = {"device_s": t_xla, "vs_baseline": round(1.5 / t_xla, 1)}
    print(json.dumps({"xla_si_cg6": rows["xla_si_cg6"]}), flush=True)

    t_k = slope(kernel_solve)
    rows["pallas_si_cg6"] = {"device_s": t_k, "vs_baseline": round(1.5 / t_k, 1),
                             "final_H_rel_agreement": agree / scale}
    print(json.dumps({"pallas_si_cg6": rows["pallas_si_cg6"]}), flush=True)

    p_si2 = make_params(substeps=1, solver="SI2", cg_iters=CG, cg_iters_predictor=CG)
    t_x2 = slope(lambda b: forward_batch(None, b, model, p_si2, tstops))
    rows["xla_si2_cg6"] = {"device_s": t_x2, "vs_baseline": round(1.5 / t_x2, 1)}
    print(json.dumps({"xla_si2_cg6": rows["xla_si2_cg6"]}), flush=True)

    t_k2 = slope(lambda b: kernel_solve(b, si2=True))
    rows["pallas_si2_cg6"] = {"device_s": t_k2, "vs_baseline": round(1.5 / t_k2, 1)}
    print(json.dumps({"pallas_si2_cg6": rows["pallas_si2_cg6"]}), flush=True)

    # --- 512² (the large-grid regime the RKC kernel cannot reach): here each
    # CG iteration's XLA round-trip moves ~6 MB through HBM, so VMEM
    # residency has 16× more bytes to save than at 128² ---
    NXL = 512
    glaciers_l = []
    for i, t in enumerate(temps):
        clim = monthly_dummy_climate(TSPAN[0], n_months, temp_mean=-4.0,
                                     longterm_temp=float(t), nx=NXL, ny=NXL)
        glaciers_l.append(halfar_glacier(nx=NXL, ny=NXL, dx=DX, dy=DX,
                                         temp=float(t), rgi_id=f"L{i}",
                                         climate=clim))
    batch_l = stack_glaciers(glaciers_l)
    batch_l = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        batch_l)

    Hx_l = jax.jit(lambda b: forward_batch(None, b, model, p_fast, tstops)[:, -1])(batch_l)
    Hk_l = jax.jit(lambda b: kernel_solve(b)[:, -1])(batch_l)
    agree_l = float(jnp.abs(Hx_l - Hk_l).max() / jnp.abs(Hx_l).max())
    print(f"512² final-H agreement: {agree_l:.2e} rel", flush=True)

    def slope_on(solve_fn, bb, k_lo=6, k_hi=16, reps=5):
        def timed(K):
            g = jax.jit(lambda b, e: chained(solve_fn, b, e, K))
            eps = jnp.asarray(0.0, jnp.float32)
            float(g(bb, eps))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(g(bb, eps))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)

    t_xl = slope_on(lambda b: forward_batch(None, b, model, p_fast, tstops), batch_l)
    rows["xla_si_cg6_512"] = {"device_s": t_xl}
    print(json.dumps({"xla_si_cg6_512": rows["xla_si_cg6_512"]}), flush=True)

    t_kl = slope_on(kernel_solve, batch_l)
    rows["pallas_si_cg6_512"] = {"device_s": t_kl,
                                 "final_H_rel_agreement": agree_l}
    print(json.dumps({"pallas_si_cg6_512": rows["pallas_si_cg6_512"]}), flush=True)

    out = os.path.join(os.path.dirname(__file__), "si_pallas_result.json")
    with open(out, "w") as f:
        json.dump({
            "problem": "bench.py headline (4 glaciers, 5yr, monthly MB, 128^2, f32)",
            "methodology": "chained-dispatch slope",
            "rows": rows,
        }, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
