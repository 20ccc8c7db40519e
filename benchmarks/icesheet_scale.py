"""Ice-sheet-scale demo: one 1024²–2048² domain on a single chip + rows mesh.

The reference's parallelism is glacier-level only — one Julia process per
glacier, a single glacier's domain capped by one host
(/root/reference/src/setup/config.jl:97-139); its largest exercised grids are
O(200²) (test/params_construction.jl workflows). This benchmark runs the
regime the 2-D dp×sp mesh (SURVEY §2.9) was built for and that the reference
cannot express: ONE Greenland-scale domain.

Per grid size N ∈ {1024, 2048} (dome radius 800 km, peak H ≈ 3000 m,
dx sized so the domain spans ~2·R0·1.28):

- **SI2 forward**: 10 years, monthly saves, substeps=1 (the unconditionally
  stable production solver — an explicit solver at dx ≈ 2 km and D ~ A·H⁵
  would need thousands of substeps/month) — device time + the compiled
  executable's XLA HBM budget (`utils.memory.aot_step_memory`).
- **loss + gradient** (grad="jax", per-interval remat): classical scalar-A
  inversion step against synthetic H observations — device time + HBM.
- **Pallas SI kernel**: `unsupported_reason(N)` is recorded verbatim — the
  whole-solve kernel needs 9·N²·4 B of VMEM (> 12 MB past ~576²), and a
  tiled variant would round-trip HBM per CG iteration exactly like XLA's
  fused stencils, so XLA *is* the answer in this regime (the kernel's win is
  128²–512², si_pallas_result.json).
- **rows-mesh dryrun** (subprocess, 8 virtual CPU devices): the same domain
  sharded over grid rows via `parallel.spatial`, one loss+grad step executed
  and checked finite — validates the ice-sheet sharding path compiles and
  runs at this exact grid without 8 real chips.

Writes benchmarks/icesheet_scale_result.json.
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "icesheet_scale_result.json")

YEARS = 10.0                   # simulated span
STEP = 1.0 / 12.0              # monthly saves
R0, H0, A_TRUE = 800_000.0, 3000.0, 8e-19


def _write(results):
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def intrinsic_t0():
    """The Halfar similarity time at which the dome has exactly (H0, R0) —
    the physically sensible start (at small t the similarity solution is a
    vastly taller/wider dome that overflows any fixed domain)."""
    from odinn_tpu.data.halfar import HalfarParameters, halfar_t0

    return float(halfar_t0(HalfarParameters(R0=R0, H0=H0, A=A_TRUE, n=3.0)))


def make_problem(N, jnp):
    from odinn_tpu.core.glacier import stack_glaciers
    from odinn_tpu.data.synthetic import halfar_glacier

    dx = 2.0 * 1.28 * R0 / N   # domain = 2.56·R0 across, ≈ 2048 km
    t0 = intrinsic_t0()
    g = halfar_glacier(nx=N, ny=N, dx=dx, dy=dx, r0=R0, h0=H0, A=A_TRUE,
                       temp=-20.0, t_ic=t0, rgi_id=f"icesheet-{N}")
    g = g.replace(H0=g.H0.astype(jnp.float32), B=g.B.astype(jnp.float32))
    return stack_glaciers([g]), dx, t0


def main():
    import jax
    import jax.numpy as jnp

    from odinn_tpu.core.params import (
        Hyperparameters,
        Parameters,
        PhysicalParameters,
        SimulationParameters,
        SolverParameters,
        UDEParameters,
    )
    from odinn_tpu.laws.laws import ConstantA, LawA_inversion
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.ops.pallas.si_kernel import unsupported_reason
    from odinn_tpu.simulation.inversion import batch_transient_loss
    from odinn_tpu.simulation.prediction import forward_batch
    from odinn_tpu.simulation.solver import build_tstops
    from odinn_tpu.utils.memory import aot_step_memory

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}", flush=True)
    T0 = intrinsic_t0()
    TSPAN = (T0, T0 + YEARS)
    tstops = build_tstops(TSPAN, STEP)
    results = {"device": str(dev), "tspan": TSPAN, "step": STEP,
               "r0_m": R0, "h0_m": H0, "intrinsic_t0_yr": T0, "sizes": {}}

    def params_for(solver="SI2", substeps=1):
        return Parameters(
            physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
            simulation=SimulationParameters(tspan=TSPAN, use_MB=False,
                                            use_velocities=False),
            solver=SolverParameters(solver=solver, step=STEP,
                                    substeps=substeps, cg_iters=12,
                                    cg_iters_predictor=6, remat=True),
            hyper=Hyperparameters(optimizer="adam", learning_rate=0.1, epochs=1),
            UDE=UDEParameters(grad="jax"),
        )

    def timed(compiled, *args, reps=3):
        r = compiled(*args)
        jax.block_until_ready(r)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(compiled(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    for N in (1024, 2048):
        print(f"\n=== {N}² ===", flush=True)
        row = {}
        try:
            batch, dx, _ = make_problem(N, jnp)
            row["dx_m"] = round(dx, 1)
            p = params_for()

            # --- SI2 forward: final H only (the trajectory at 2048² is
            # 121 × 16 MB ≈ 2 GiB of outputs — the production loss never
            # materializes it on host)
            def fwd(b):
                return forward_batch(None, b, Model(iceflow=SIA2DModel(
                    A=ConstantA(A_TRUE))), p, tstops)[:, -1]

            compiled, mem = aot_step_memory(fwd, batch)
            t_fwd = timed(compiled, batch)
            row["si2_forward"] = {
                "device_s": round(t_fwd, 4),
                "s_per_simulated_year": round(t_fwd / (TSPAN[1] - TSPAN[0]), 4),
                "hbm": mem,
            }
            H_end = np.asarray(compiled(batch))
            assert np.isfinite(H_end).all(), "non-finite forward"
            assert H_end.max() > 0.5 * H0, "dome collapsed — setup wrong"
            row["si2_forward"]["max_H_end_m"] = round(float(H_end.max()), 1)
            print(json.dumps({"si2_forward": row["si2_forward"]}), flush=True)

            # --- gradient step: classical scalar-A inversion vs synthetic obs
            from odinn_tpu.core.glacier import ThicknessData

            # stacked-batch convention: every observation leaf carries the
            # leading glacier axis (t: (n_g, T), H: (n_g, T, nx, ny))
            obs_t = jnp.asarray([[TSPAN[0], TSPAN[1]]])
            truth_fwd = jax.jit(lambda b: forward_batch(
                None, b, Model(iceflow=SIA2DModel(A=ConstantA(1.2 * A_TRUE))),
                p, tstops))
            traj = truth_fwd(batch)
            H_obs = jnp.stack([traj[:, 0], traj[:, -1]], axis=1)
            del traj
            batch_obs = batch.replace(
                thickness_data=ThicknessData(t=obs_t, H=H_obs))
            model = Model(iceflow=SIA2DModel(A=LawA_inversion(p, scalar=True)))
            theta = {"A": jnp.zeros((1,), jnp.float32)}

            def vg(th, b):
                return jax.value_and_grad(
                    lambda t_: batch_transient_loss(t_, b, model, p, tstops)
                )(th)

            compiled_g, mem_g = aot_step_memory(vg, theta, batch_obs)
            t_vg = timed(compiled_g, theta, batch_obs)
            val, grads = compiled_g(theta, batch_obs)
            row["si2_loss_grad"] = {
                "device_s": round(t_vg, 4),
                "hbm": mem_g,
                "loss": float(val),
                "grad_A": float(grads["A"][0]),
                "grad_finite": bool(np.isfinite(float(grads["A"][0]))),
            }
            print(json.dumps({"si2_loss_grad": row["si2_loss_grad"]}), flush=True)

            # --- Pallas verdict at this size
            row["pallas_si_kernel"] = unsupported_reason(N, N) or "supported"
        except Exception as e:  # honest row: record the failure, keep going
            row["error"] = f"{type(e).__name__}: {e}"
            print(f"{N}²: {row['error']}", flush=True)
        results["sizes"][str(N)] = row
        _write(results)

    # --- rows-mesh dryrun at 1024² on 8 virtual CPU devices (subprocess:
    # this process is pinned to the TPU backend)
    dryrun = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, sys
sys.path.insert(0, %(repo)r)
from benchmarks.icesheet_scale import make_problem, STEP, A_TRUE
from odinn_tpu.core.params import (Parameters, PhysicalParameters,
    SimulationParameters, SolverParameters, UDEParameters, Hyperparameters)
from odinn_tpu.core.glacier import ThicknessData
from odinn_tpu.laws.laws import LawA_inversion
from odinn_tpu.models.model import Model, SIA2DModel
from odinn_tpu.parallel.spatial import make_mesh_2d
from odinn_tpu.parallel.mesh import shard_inversion
from odinn_tpu.simulation.inversion import batch_transient_loss
from odinn_tpu.simulation.solver import build_tstops

assert len(jax.devices()) == 8, jax.devices()
N = 1024
batch, dx, t0 = make_problem(N, jnp)
# 2 intervals, 1 substep: the dryrun validates sharded compile+execute at
# the REAL grid, not wall-clock (CPU)
tstops = build_tstops((t0, t0 + 2 * STEP), STEP)
p = Parameters(
    physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
    simulation=SimulationParameters(tspan=(t0, t0 + 2 * STEP),
                                    use_MB=False, use_velocities=False),
    solver=SolverParameters(solver="SI2", step=STEP, substeps=1, cg_iters=8),
    UDE=UDEParameters(grad="jax"),
)
batch = batch.replace(thickness_data=ThicknessData(
    t=jnp.asarray(tstops)[None],
    H=jnp.broadcast_to(batch.H0[:, None], (1, len(tstops), N, N))))
model = Model(iceflow=SIA2DModel(A=LawA_inversion(p, scalar=True)))
theta = {"A": jnp.zeros((1,), jnp.float32)}
mesh = make_mesh_2d(n_glaciers=1, n_rows=8)
st, sb, _ = shard_inversion(theta, batch, mesh)
assert len(sb.H0.sharding.device_set) == 8
val, g = jax.jit(jax.value_and_grad(
    lambda t_: batch_transient_loss(t_, sb, model, p, tstops)))(st)
assert np.isfinite(float(val)) and np.isfinite(float(g["A"][0]))
print(f"ROWS_MESH_OK val={float(val):.3e} gA={float(g['A'][0]):.3e}")
""" % {"repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", dryrun], env=env,
                          capture_output=True, text=True, timeout=1800)
    ok = proc.returncode == 0 and "ROWS_MESH_OK" in proc.stdout
    results["rows_mesh_dryrun_1024"] = {
        "ok": ok,
        "detail": (proc.stdout.strip().splitlines()[-1] if ok
                   else proc.stderr[-1500:]),
        "mesh": "1 glacier x 8 row shards (virtual CPU devices)",
    }
    print(f"rows-mesh dryrun: {'OK' if ok else 'FAILED'}", flush=True)
    _write(results)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
