"""EKI benchmark: derivative-free trainer cost, convergence, and the
adaptive-forward capability on the real chip.

Three sections (written to eki_bench_result.json):

1. **Recovery at the reference gate**: `eki_train` (J=32 members > d=16
   per-glacier parameters, so the affine subspace spans the search space) on
   the ensemble_bench problem (16 Halfar glaciers, 64², f32, SI@1) — records
   wall-clock, loss collapse vs the initial ensemble, and the inverted-A
   max/min relative error against the Cuffey–Paterson truth (the reference's
   accuracy gate: max ≤ 1e-3, min ≤ 1e-4,
   /root/reference/test/inversion_test.jl:158-163) reached WITHOUT ever
   evaluating a gradient.

2. **Member-axis device scaling**: chained-dispatch slope (same methodology
   as bench.py — K chained evaluations in one dispatch, marginal cost
   (t(K_hi)−t(K_lo))/(K_hi−K_lo)) of the J-member vmapped residual batch for
   J ∈ {8, 16, 32}: the per-iteration device cost of EKI is one such batch
   plus a J×J solve (MXU noise). Shows how much member parallelism one chip
   absorbs before cost goes linear — the same "N ≈ cost of one" economics as
   the multistart restart axis, and the number that scales down by the mesh
   size on a real slice (members are embarrassingly parallel).

3. **Training through the exact adaptive forward**: `params.solver.adaptive
   = True` (error-controlled BS3(2) `lax.while_loop`) — the configuration
   every gradient trainer must refuse (no reverse rule) or replay on a
   frozen grid. EKI needs only forward solves, so it optimizes the exact
   adaptive trajectory; the row records the loss collapse on the chip.

Wall-clocks include this dev harness's ~28 ms/dispatch RPC tunnel (2
dispatches per EKI iteration: residual batch + Kalman update); the honest
device number is section 2's slope. Run: python benchmarks/eki_bench.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.ensemble_bench import build_problem  # noqa: E402


def _recover_A(theta, params, temps):
    """Map tanh-bounded per-glacier θ back to A and compare to truth."""
    import jax.numpy as jnp

    from odinn_tpu.laws.laws import poly_A_paterson_cuffey

    phys = params.physical
    a_rec = phys.min_A + (phys.max_A - phys.min_A) * (
        np.tanh(np.asarray(theta["A"], np.float64)) + 1) / 2
    a_fn = poly_A_paterson_cuffey()
    a_ref = np.asarray([float(a_fn(jnp.asarray(t))) for t in temps])
    rels = np.abs(a_rec - a_ref) / a_ref
    return float(rels.max()), float(rels.min())


def main():
    import jax
    import jax.numpy as jnp

    from odinn_tpu.inverse.gauss_newton import make_residual_fn
    from odinn_tpu.laws.laws import LawA_inversion
    from odinn_tpu.models.model import Model, SIA2DModel, init_theta
    from odinn_tpu.simulation.eki import eki_train
    from odinn_tpu.simulation.ensemble import init_restarts
    from odinn_tpu.simulation.inversion import Inversion
    from odinn_tpu.simulation.solver import build_tstops

    print(f"backend: {jax.default_backend()}", flush=True)
    N_G = 16
    temps = np.linspace(-25.0, -14.0, N_G)
    params, batch = build_problem(n_g=N_G, nx=64)
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True),
                                     n_value=3.0))

    # ---- 1. recovery at the reference gate (J=32 > d=16) -------------------
    inv = Inversion(model=model, glaciers=batch, parameters=params)
    N_ITERS = 15
    t0 = time.perf_counter()
    res = eki_train(inv, n_ensemble=32, n_iters=N_ITERS, init_scale=0.5,
                    seed=0)
    wall = time.perf_counter() - t0
    rel_max, rel_min = _recover_A(res.best_theta, params, temps)
    collapse = float(res.best_loss / np.nanmin(res.misfits[0]))
    recovery = {
        "members": 32, "iters": res.n_iters, "wall_s": round(wall, 2),
        "wall_s_per_iter": round(wall / max(res.n_iters, 1), 3),
        "best_loss": res.best_loss,
        "loss_collapse_vs_init_best": collapse,
        "A_relerr_max": rel_max, "A_relerr_min": rel_min,
        "gate_max_1e-3": rel_max <= 1e-3, "gate_min_1e-4": rel_min <= 1e-4,
        "note": ("derivative-free: only forward solves evaluated; wall "
                 "includes ~2 tunnel dispatches/iter (~56 ms) — device cost "
                 "per iter is the member_scaling slope row at J=32"),
    }
    print(json.dumps(recovery), flush=True)

    # ---- 2. member-axis device scaling (chained-dispatch slope) ------------
    tstops = build_tstops(params.simulation.tspan, params.solver.step)
    resid = make_residual_fn(model, params, tstops)
    theta0 = jax.tree.map(lambda x: x.astype(jnp.float32),
                          init_theta(model, batch))
    flat0, unravel = jax.flatten_util.ravel_pytree(theta0)

    def member_batch(Th, b, eps, K):
        # K chained J-member residual batches in one dispatch; eps (0.0 at
        # runtime) serializes them so XLA cannot fold repeats away
        def body(carry, _):
            R = jax.vmap(lambda v: resid(unravel(v), b).ravel())(Th + eps * carry)
            return jnp.sum(R * R), None

        return jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None,
                            length=K)[0]

    def timed(Th, K, reps=5):
        g = jax.jit(lambda Th, e: member_batch(Th, batch, e, K))
        eps = jnp.asarray(0.0, jnp.float32)
        float(g(Th, eps))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(Th, eps))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    scaling = []
    for J in (8, 16, 32):
        thetas = init_restarts(theta0, J, 0.5, seed=0)
        Th = jax.vmap(lambda th: jax.flatten_util.ravel_pytree(th)[0])(thetas)
        sec = (timed(Th, 12) - timed(Th, 4)) / 8
        scaling.append({
            "members": J, "device_s_per_resid_batch": round(sec, 5),
            "device_ms_per_member": round(1e3 * sec / J, 4),
        })
        print(json.dumps(scaling[-1]), flush=True)

    # ---- 3. training through the exact adaptive forward ---------------------
    from odinn_tpu.data.synthetic import halfar_glacier
    from odinn_tpu.core.glacier import stack_glaciers
    from odinn_tpu.laws.laws import CuffeyPaterson
    from odinn_tpu.simulation.prediction import generate_ground_truth

    import dataclasses

    params_a = dataclasses.replace(params, solver=dataclasses.replace(
        params.solver, solver="RK4", substeps=15, adaptive=True, reltol=1e-4))
    temps_a = np.linspace(-25.0, -14.0, 4)
    gl_a = [halfar_glacier(nx=32, ny=32, dx=100.0, temp=float(t),
                           rgi_id=f"ekia{i}") for i, t in enumerate(temps_a)]
    tstops_a = build_tstops(params_a.simulation.tspan, params_a.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0))
    gl_a = generate_ground_truth(gl_a, params_a, truth, tstops_a, store=("H",))
    gl_a = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, stack_glaciers(gl_a))
    model_a = Model(iceflow=SIA2DModel(A=LawA_inversion(params_a, scalar=True),
                                       n_value=3.0))
    inv_a = Inversion(model=model_a, glaciers=gl_a, parameters=params_a)
    t0 = time.perf_counter()
    res_a = eki_train(inv_a, n_ensemble=8, n_iters=10, seed=1)
    wall_a = time.perf_counter() - t0
    rel_max_a, _ = _recover_A(res_a.best_theta, params_a, temps_a)
    adaptive_row = {
        "problem": "4 glaciers, 32^2, f32, adaptive BS3(2) reltol=1e-4",
        "members": 8, "iters": res_a.n_iters, "wall_s": round(wall_a, 2),
        "loss_collapse_vs_init_best": float(
            res_a.best_loss / np.nanmin(res_a.misfits[0])),
        "A_relerr_max": rel_max_a,
        "note": ("the error-controlled lax.while_loop forward has no reverse "
                 "rule — train_ude refuses it, replay freezes the accepted "
                 "grid; EKI optimizes the exact adaptive trajectory"),
    }
    print(json.dumps(adaptive_row), flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "eki_bench_result.json")
    with open(out_path, "w") as f:
        json.dump({
            "problem": "16 glaciers, 64^2, f32, SI@1 cg=12 (ensemble_bench problem)",
            "recovery": recovery,
            "member_scaling": scaling,
            "adaptive_forward": adaptive_row,
        }, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
