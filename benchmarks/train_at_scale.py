"""North-star scenario (BASELINE.md): inversions over 100+ glaciers on TPU.

Five parts, 128 glaciers / float32 / semi-implicit solver / FULL-batch
training on one chip (ODINN_BENCH_PARTS selects a subset, e.g. "3"; results
merge into the JSON). Parts 4 and 5 are the r3-verdict additions: 4 proves
the PDE LM fine-tune does real work from a DEGRADED (5%-noise) pretrain;
5 runs the production MB+LossHV training on a heterogeneous fleet ingested
from OGGM-layout NetCDF directories (the real data path: mixed grid sizes,
rough DEMs, per-glacier climate). Parts 1/3/5 record the XLA HBM budget of
their training step (odinn_tpu.utils.memory).

1. **Classical inversion** (per-glacier scalar A, LawA_inversion): the
   honest at-scale analogue of the reference's CI convergence gates
   (/root/reference/test/inversion_test.jl:154-163 — loss < 1e-6 x initial,
   A max rel err < 1e-3, min < 1e-4). theta* is exactly representable, so the
   gates are meaningful at 128 glaciers. Measured (r2): loss_ratio 4.2e-9,
   A rel err max 3.2e-5 / median 3e-6 / min 6e-8 — all gates beaten.

2. **Functional inversion** (UDE, A = NN(T) with the log head), trained by
   the reference's own production recipe at capacity-appropriate settings:
   (a) classical per-glacier inversion (part 1) recovers 128 (T, A) pairs;
   (b) the network is PRETRAINED on those pairs (the reference pretrains its
   A(T) net on target values exactly this way,
   /root/reference/src/models/trainable_components/NN_utils.jl:37-139) with
   an exact dense-LM fit in f64 (models.nn_utils.pretrain_law_from_A);
   (c) matrix-free Levenberg-Marquardt fine-tunes on the PDE loss in f32.
   Architecture 1-16-16-1 tanh+sigmoid with prescaled inputs — the
   reference's 1-3-10-3-1 is its CI-test convenience (ML_utils.jl:23-39),
   not a spec; its curve-fit floor (max rel 2.5e-4) sits above the 1e-3/1e-4
   gates' needs, this one's (~2e-5) does not. Gates are the reference's CI
   gates (inversion_test.jl:154-163): loss <= 1e-6 x the cold-start loss and
   A rel err <= 1e-3, now enforced at 128 glaciers.

Writes benchmarks/train_at_scale_result.json.

Temperatures span [-25, -14] degC: Cuffey-Paterson A(-13) = 8.29e-18 exceeds
the reference's maxA = 8e-18 bound, which would clip the warm end at an
irreducible 3.5% error (found in r2; the r1 benchmark used [-25, -13]).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_glaciers(NG, NX, with_climate=False, tspan=(5.0, 7.0)):
    import jax.numpy as jnp

    from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate

    temps = np.linspace(-25.0, -14.0, NG)
    out = []
    for i, t in enumerate(temps):
        clim = None
        if with_climate:
            n_months = int(round((tspan[1] - tspan[0]) * 12)) + 1
            clim = monthly_dummy_climate(tspan[0], n_months, temp_mean=-1.0,
                                         longterm_temp=float(t))
        g = halfar_glacier(nx=NX, ny=NX, dx=100.0, temp=float(t),
                           rgi_id=f"s{i}", climate=clim)
        if with_climate:
            # bed raised to alpine altitude so the lapse-downscaled MB is a
            # mix of accumulation and melt (a sea-level bed melts everything)
            g = g.replace(B=jnp.full_like(g.B, 1800.0))
        out.append(g)
    return temps, out


def measure_epoch_memory(inv, tstops):
    """XLA's HBM budget for this inversion's full-batch Adam fwd+grad step
    (the audited executable is the shape train_ude runs); see
    odinn_tpu.utils.memory."""
    import jax
    import optax

    from odinn_tpu.simulation.inversion import _make_grad_fn, batch_transient_loss
    from odinn_tpu.utils.memory import compiled_hbm_gib

    model, params = inv.model, inv.parameters
    vg = _make_grad_fn(
        inv, lambda th, b, ids=None: batch_transient_loss(
            th, b, model, params, tstops, ids))
    opt = optax.adam(0.1)
    st = opt.init(inv.theta)

    def step(theta, state, b):
        val, grads = vg(theta, b)
        updates, state = opt.update(grads, state, theta)
        return optax.apply_updates(theta, updates), state, val

    c = jax.jit(step).lower(inv.theta, st, inv.glaciers).compile()
    return compiled_hbm_gib(c)


def main():
    import jax
    import jax.numpy as jnp

    from odinn_tpu.core.params import (Parameters, PhysicalParameters,
        SimulationParameters, SolverParameters, Hyperparameters, UDEParameters)
    from odinn_tpu.laws.laws import (CuffeyPaterson, LawA, LawA_inversion,
                                     eval_law, poly_A_paterson_cuffey)
    from odinn_tpu.models.model import Model, SIA2DModel
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture
    from odinn_tpu.simulation.inversion import Inversion, run_inversion
    from odinn_tpu.simulation.prediction import generate_ground_truth
    from odinn_tpu.simulation.solver import build_tstops

    NG = int(os.environ.get("ODINN_BENCH_NG", "128"))
    NX = int(os.environ.get("ODINN_BENCH_NX", "128"))
    a_true_fn = poly_A_paterson_cuffey()

    def make_params(stages, gn_cg_iters=8, gn_glacier_norm=False,
                    use_MB=False, use_velocities=False, loss=None,
                    gn_cg_restarts=1):
        opts = tuple(s[0] for s in stages)
        lrs = tuple(s[1] for s in stages)
        eps = tuple(s[2] for s in stages)
        return Parameters(
            physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
            simulation=SimulationParameters(tspan=(5.0, 7.0), use_MB=use_MB,
                                            step_MB=1 / 12,
                                            use_velocities=use_velocities,
                                            float_dtype="float32"),
            # remat off: the 128×24×128² trajectory fits HBM, and storing it
            # beats recomputing intervals in the backward (~15% per epoch)
            solver=SolverParameters(step=1 / 12, substeps=1, solver="SI", cg_iters=20,
                                    remat=False),
            hyper=Hyperparameters(optimizer=opts, learning_rate=lrs, epochs=eps,
                                  batch_size=NG,   # FULL batch: one epoch = 128 glaciers
                                  # 64-glacier chunks (measured sweet spot; see
                                  # docs/at_scale.md — production MB+HV Adam
                                  # epoch 0.116->0.105 s, classical 0.070->0.068)
                                  grad_accum_chunks="auto",
                                  gn_cg_iters=gn_cg_iters,
                                  gn_glacier_norm=gn_glacier_norm,
                                  gn_cg_restarts=gn_cg_restarts),
            UDE=UDEParameters(grad="jax", target="A",
                              empirical_loss_function=loss),
        )

    # ODINN_BENCH_PARTS selects which parts run (e.g. "3" after an OOM fix);
    # results merge into the existing JSON so prior parts survive.
    parts = os.environ.get("ODINN_BENCH_PARTS", "123")
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "train_at_scale_result.json")
    result_prev = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            result_prev = json.load(f)

    temps = np.linspace(-25.0, -14.0, NG)
    params = make_params([("adam", 0.1, 1)])
    tstops = build_tstops(params.simulation.tspan, params.solver.step)
    truth = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0))
    t_gt = 0.0
    if "1" in parts or "2" in parts or "4" in parts:
        temps, glaciers = build_glaciers(NG, NX)
        t0 = time.time()
        glaciers = generate_ground_truth(glaciers, params, truth, tstops, store=("H",))
        t_gt = time.time() - t0

    def a_rels(law, theta, idxs):
        out = []
        for gi in idxs:
            a_nn = float(eval_law(law, theta, glaciers[gi], glacier_idx=gi))
            a_ref = float(a_true_fn(jnp.asarray(float(temps[gi]))))
            out.append(abs(a_nn - a_ref) / a_ref)
        return out

    result = {**result_prev,
              "n_glaciers": NG, "grid": NX, "dtype": "float32", "solver": "SI",
              "batch": "full"}
    if t_gt:
        result["ground_truth_s"] = round(t_gt, 2)
    phys = params.physical
    a_ref = np.asarray([float(a_true_fn(jnp.asarray(float(t)))) for t in temps])

    # ---- part 1: classical per-glacier inversion at the reference gates ----
    if "1" in parts:
        _run_part1 = True
    else:
        _run_part1 = False
    # Adam ladder: tried Adam->LM here (60+30 adam, 15 LM @ cg=12) — worse:
    # ratio 1.5e-6 / rel 3.1e-3 in 58 s. With one scalar per glacier the GN
    # system is 128 decoupled 1-d problems; CG spends ~26 solve-equivalents
    # per LM iter mixing them, while the Adam ladder's last stages are
    # already second-order-trivial per scalar. LM earns its cost on COUPLED
    # theta (the NN in part 2, MB+HV in part 3), not here.
    stages = [("adam", 0.1, 60), ("adam", 0.02, 60), ("adam", 0.004, 60),
              ("adam", 8e-4, 80), ("adam", 1.6e-4, 80), ("adam", 3e-5, 80)]
    params = make_params(stages)
    model = Model(iceflow=SIA2DModel(A=LawA_inversion(params, scalar=True), n_value=3.0))
    if _run_part1:
        inv = Inversion(model=model, glaciers=glaciers, parameters=params)
        inv.theta = jax.tree.map(lambda x: x.astype(jnp.float32), inv.theta)
        mem1 = measure_epoch_memory(inv, tstops)
        t0 = time.time()
        res = run_inversion(inv)
        t_tr = time.time() - t0
        L = res.stats.losses
        a_rec = phys.min_A + (phys.max_A - phys.min_A) * (
            np.tanh(np.asarray(inv.theta["A"], np.float64)) + 1) / 2
        # part 2 pretrains on these recovered A's; persist so a later
        # ODINN_BENCH_PARTS=2 rerun doesn't need part 1 in the same process
        np.savez(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "classical_A.npz"), A=a_rec, temps=temps)
        rels = np.abs(a_rec - a_ref) / a_ref
        result["classical"] = {
            "hbm": mem1,
            "train_s": round(t_tr, 2), "niter": res.stats.niter,
            "s_per_epoch": round(t_tr / res.stats.niter, 3),
            "loss0": float(L[0]), "loss_best": float(res.stats.final_loss),
            "loss_ratio": float(res.stats.final_loss / L[0]),
            "A_relerr_max": float(rels.max()), "A_relerr_median": float(np.median(rels)),
            "A_relerr_min": float(rels.min()),
            "gates": {"loss_ratio<=1e-6": bool(res.stats.final_loss / L[0] <= 1e-6),
                      "relerr_max<=1e-3": bool(rels.max() <= 1e-3),
                      "relerr_min<=1e-4": bool(rels.min() <= 1e-4)},
        }
        print(json.dumps(result["classical"], indent=1), flush=True)

    # ---- part 2: functional inversion (UDE) to the reference gates ----
    # classical-A pretrain (f64 dense LM, subprocess keeps this process f32)
    # -> f32 PDE fine-tune with Jacobi-PCG Levenberg-Marquardt. Adam-from-
    # cold + LM reached only ratio 1.5e-4 / rel 4-6e-2 (r2); the pretrained
    # start lands inside LM's quadratic basin.
    if "2" in parts:
        import subprocess
        import tempfile

        if not _run_part1:
            # recovered classical A's from a previous part-1 run (the pretrain
            # targets); ODINN_BENCH_PARTS=2 without them cannot proceed
            a_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "classical_A.npz")
            if not os.path.exists(a_path):
                raise RuntimeError(
                    "part 2 pretrains on part 1's recovered A's; run with "
                    "ODINN_BENCH_PARTS including '1' first (classical_A.npz "
                    "not found)")
            a_rec = np.load(a_path)["A"]

        from odinn_tpu.models.nn import MLP
        from odinn_tpu.simulation.inversion import (assemble_tstops,
                                                    batch_transient_loss)

        # 8 Fourier frequencies -> 32 tanh -> sigmoid log head: plain tanh nets
        # plateau at ~1.7e-5 max rel err fitting the 128 recovered A's (spectral
        # bias); this architecture interpolates them to f64 machine precision
        # (f32-eval rel err ~6e-7), so the pretrained start lands essentially AT
        # the classical optimum
        N_FOURIER = 8
        arch = MLP((2 * N_FOURIER, 32, 1), ("tanh", "sigmoid"))
        prescale_bounds = ((-25.0, 0.0),)
        stages = [("lm", 1e-2, 10)]
        params = make_params(stages, gn_cg_iters=20, gn_glacier_norm=True)
        nn = NeuralNetwork(arch, seed=666)
        law = LawA(nn, params, head="log", prescale_bounds=prescale_bounds,
                   n_fourier=N_FOURIER)
        model = Model(iceflow=SIA2DModel(A=law, n_value=3.0))
        inv = Inversion(model=model, glaciers=glaciers, parameters=params)
        theta_cold = jax.tree.map(lambda x: x.astype(jnp.float32), inv.theta)
        # cold-start loss: the ratio gate's denominator (the pipeline's initial θ
        # is the default Glorot init; classical+pretrain+LM is the optimizer)
        tst = assemble_tstops(params, inv.glaciers)
        eval_true = jax.jit(lambda th, b: batch_transient_loss(th, b, model, params, tst))
        loss0_cold = float(eval_true(theta_cold, inv.glaciers))

        def pretrain(weights=None, init=None):
            with tempfile.TemporaryDirectory() as td:
                fin, fout = os.path.join(td, "in.npz"), os.path.join(td, "out.npz")
                kw = {}
                if weights is not None:
                    kw["sample_weights"] = np.asarray(weights, np.float64)
                if init is not None:
                    for i, l in enumerate(init):
                        kw[f"init_w{i}"] = np.asarray(l["w"], np.float64)
                        kw[f"init_b{i}"] = np.asarray(l["b"], np.float64)
                np.savez(fin, temps=np.asarray(temps, np.float64), A=a_rec,
                         widths=np.asarray(arch.widths), acts=np.asarray(arch.activations),
                         seed=666, min_A=phys.min_A, max_A=phys.max_A, head="log",
                         prescale_bounds=np.asarray(prescale_bounds, np.float64),
                         iters=600, n_fourier=N_FOURIER, restarts=3, **kw)
                subprocess.run([sys.executable,
                                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                             "_pretrain_A_sub.py"), fin, fout],
                               check=True)
                fit = np.load(fout)
                return [{"w": fit[f"w{i}"], "b": fit[f"b{i}"]}
                        for i in range(len(arch.widths) - 1)]

        def to_f32(th64):
            return {"A": [{k: jnp.asarray(v, jnp.float32) for k, v in l.items()}
                          for l in th64]}

        from odinn_tpu.simulation.inversion import glacier_transient_loss

        t0 = time.time()
        # pass 1: flat fit to the classical A's
        th1 = pretrain()
        theta1 = to_f32(th1)
        l1 = float(eval_true(theta1, inv.glaciers))
        # pass 2: curvature-matched refit — weight glacier g by its measured
        # PDE-loss curvature c_g = L_g/ε_g² so the weighted curve fit minimizes
        # the PREDICTED PDE loss (cold glaciers barely move → low curvature →
        # loose fit is fine there; stiff fast glaciers get fit tightest)
        per_g_fn = jax.jit(lambda th, b: jax.vmap(
            lambda g, i: glacier_transient_loss(th, g, i, model, params, tst)[0]
        )(b, jnp.arange(NG)))
        L_g = np.asarray(jax.device_get(per_g_fn(theta1, inv.glaciers)), np.float64)
        a_nn1 = np.asarray([float(eval_law(law, theta1, glaciers[i], glacier_idx=i))
                            for i in range(NG)], np.float64)
        eps_g = np.maximum(np.abs(a_nn1 - a_rec) / a_rec, 1e-7)
        c_g = L_g / eps_g**2
        w_g = np.clip(c_g / max(c_g.mean(), 1e-300), 1e-3, 1e3)
        th2 = pretrain(weights=w_g, init=th1)
        theta2 = to_f32(th2)
        l2 = float(eval_true(theta2, inv.glaciers))
        inv.theta = theta2 if l2 < l1 else theta1
        loss_pre = min(l1, l2)
        t_pre = time.time() - t0
        print(json.dumps({"pretrain_pass1_loss": l1, "pretrain_pass2_loss": l2}),
              flush=True)

        t0 = time.time()
        res = run_inversion(inv)
        t_tr = time.time() - t0
        rels_pts = a_rels(model.iceflow.A, inv.theta, range(NG))
        rels_arr = np.asarray(rels_pts)
        ratio = float(res.stats.final_loss / loss0_cold)
        result["ude_nn"] = {
            "head": "log", "arch": "fourier8-32-1 tanh (prescaled T)",
            "pipeline": "classical-A pretrain (dense LM, f64) + PDE LM fine-tune (f32, Jacobi-PCG)",
            "pretrain_s": round(t_pre, 2), "train_s": round(t_tr, 2),
            "niter": res.stats.niter,
            "s_per_epoch": round(t_tr / max(res.stats.niter, 1), 3),
            "loss0_cold": loss0_cold,
            "loss_pretrained": loss_pre,
            "loss_best": float(res.stats.final_loss),
            "loss_ratio": ratio,
            "A_relerr_max": float(rels_arr.max()),
            "A_relerr_median": float(np.median(rels_arr)),
            "A_relerr_min": float(rels_arr.min()),
            "A_relerr_cold_mid_warm": [rels_pts[0], rels_pts[NG // 2], rels_pts[NG - 1]],
            "gates": {"loss_ratio<=1e-6": bool(ratio <= 1e-6),
                      "relerr_max<=1e-3": bool(rels_arr.max() <= 1e-3),
                      "relerr_min<=1e-4": bool(rels_arr.min() <= 1e-4)},
        }
        print(json.dumps(result["ude_nn"], indent=1), flush=True)

    # ---- part 3: PRODUCTION physics — MB callbacks + LossHV at scale ----
    # the configuration the reference's real workflows run
    # (inversion_utils.jl:498-517 couples the monthly TImodel1 callback with
    # the H+V composite loss, Losses.jl:250-441): classical per-glacier
    # inversion with MB on, trained Adam-ladder -> LM (the LM residuals
    # cover LossHV exactly), reference CI gates enforced.
    if "3" in parts:
        from odinn_tpu.losses.losses import LossHV, MultiLoss
        from odinn_tpu.physics.mass_balance import TImodel1

        temps3, glaciers3 = build_glaciers(NG, NX, with_climate=True)
        stages3 = [("adam", 0.1, 60), ("adam", 0.02, 60), ("adam", 0.004, 60),
                   ("lm", 1e-2, 20)]
        params3 = make_params(stages3, gn_cg_iters=12, gn_glacier_norm=True,
                              use_MB=True, use_velocities=True,
                              loss=MultiLoss((LossHV(),), (1.0,)))
        tst3 = build_tstops(params3.simulation.tspan, params3.solver.step)
        truth3 = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0),
                       mass_balance=TImodel1())
        t0 = time.time()
        glaciers3 = generate_ground_truth(glaciers3, params3, truth3, tst3,
                                          store=("H", "V"))
        t_gt3 = time.time() - t0
        model3 = Model(iceflow=SIA2DModel(A=LawA_inversion(params3, scalar=True),
                                          n_value=3.0),
                       mass_balance=TImodel1())
        inv3 = Inversion(model=model3, glaciers=glaciers3, parameters=params3)
        inv3.theta = jax.tree.map(lambda x: x.astype(jnp.float32), inv3.theta)
        from odinn_tpu.simulation.inversion import assemble_tstops as _ats

        mem3 = measure_epoch_memory(inv3, _ats(params3, inv3.glaciers))
        t0 = time.time()
        res3 = run_inversion(inv3)
        t_tr3 = time.time() - t0
        L3 = res3.stats.losses
        a_rec3 = phys.min_A + (phys.max_A - phys.min_A) * (
            np.tanh(np.asarray(inv3.theta["A"], np.float64)) + 1) / 2
        rels3 = np.abs(a_rec3 - a_ref) / a_ref
        ratio3 = float(res3.stats.final_loss / L3[0])
        result["production_mb_hv"] = {
            "physics": "monthly TImodel1 MB callback + LossHV (H + xy velocities)",
            "hbm": mem3,
            "ground_truth_s": round(t_gt3, 2),
            "train_s": round(t_tr3, 2), "niter": res3.stats.niter,
            "s_per_epoch": round(t_tr3 / max(res3.stats.niter, 1), 3),
            "loss0": float(L3[0]), "loss_best": float(res3.stats.final_loss),
            "loss_ratio": ratio3,
            "A_relerr_max": float(rels3.max()),
            "A_relerr_median": float(np.median(rels3)),
            "A_relerr_min": float(rels3.min()),
            "gates": {"loss_ratio<=1e-6": bool(ratio3 <= 1e-6),
                      "relerr_max<=1e-3": bool(rels3.max() <= 1e-3),
                      "relerr_min<=1e-4": bool(rels3.min() <= 1e-4)},
        }
        print(json.dumps(result["production_mb_hv"], indent=1), flush=True)

    # ---- part 4: UDE fine-tune from a DEGRADED pretrain ----
    # r3 verdict Weak #2: part 2's LM stage contributed nothing measurable
    # because the pretrain already sat at the optimum. Here the pretrain
    # targets are the recovered A's corrupted by 5% multiplicative noise
    # (seeded) — the realistic case of noisy classical inversions — and the
    # f32 PDE LM stage must demonstrably pull the loss back under the 1e-6
    # gate: loss_best < loss_pretrained by a measured margin.
    if "4" in parts:
        import subprocess
        import tempfile

        from odinn_tpu.models.nn import MLP
        from odinn_tpu.simulation.inversion import (assemble_tstops,
                                                    batch_transient_loss)

        a_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "classical_A.npz")
        if "1" in parts:
            pass  # a_rec in scope from part 1
        elif os.path.exists(a_path):
            a_rec = np.load(a_path)["A"]
        else:
            raise RuntimeError("part 4 needs part 1's classical_A.npz")
        rng = np.random.default_rng(42)
        a_deg = np.clip(a_rec * (1.0 + 0.05 * rng.standard_normal(NG)),
                        phys.min_A * 1.01, phys.max_A * 0.99)
        deg_rel = float(np.abs(a_deg - a_ref).max() / a_ref.max())

        N_FOURIER = 8
        arch = MLP((2 * N_FOURIER, 32, 1), ("tanh", "sigmoid"))
        prescale_bounds = ((-25.0, 0.0),)
        # optimizer selection measured from this exact degraded start:
        # LM @ cg=20 + glacier-norm stalls (3.3x in 30 iters); Adam ladders
        # reach only 16-42x; LM WITHOUT glacier normalization converges
        # quadratically, and CG depth — not iteration count — is the lever
        # on the 577-param Fourier-feature GGN (wide spectrum):
        # cg=60/25it -> 1594x, cg=120/30it -> 14565x. Beyond ~150 f32 CG
        # iterations single-shot CG loses conjugacy and REGRESSES (cg=400
        # converges worse than cg=250); two exact-residual restarts of 125
        # (gn_cg_restarts=2, cg=250) restore deep convergence — 22153x,
        # A gate green — while 4 restarts of 120 are too shallow per round
        # (the spectrum needs ~250 contiguous Krylov directions).
        # r4 verdict #2: the plain LM fine-tune from the noise-warped
        # pretrain converges to a REPRODUCIBLE local optimum at loss
        # ~8.33e-5 / A_relerr_max 4.5e-3 — measured identical (4 digits)
        # at 40 and at 90 iterations and under a re-seeded second damping
        # stage, so it is a basin problem, not under-training (the
        # observations are NOISELESS, so the global optimum is the true
        # A's — the clean part-2 pipeline reaches it). Escape = multistart:
        # vmapped Adam exploration over jittered copies of the pretrained θ
        # (near-free on the chip — the restart axis rides the same vmap),
        # then LM refinement on the best survivor.
        # exploration split into 30-epoch dispatches: the tunneled TPU
        # worker kills minutes-long single executions (a 300-epoch scan in
        # one dispatch crashed it twice), and every prior green multistart
        # ran 30-epoch stages
        stages4 = [("adam", 2e-3, 30)] * 6 + [("lm", 1e-2, 40),
                                              ("lm", 3e-4, 20)]
        params4 = make_params(stages4, gn_cg_iters=250, gn_glacier_norm=False,
                              gn_cg_restarts=2)
        # 4 restarts hold 4 live reverse trajectories at once under the
        # restart vmap — bound each to a 16-glacier chunk (0.64 GiB) so the
        # exploration fits HBM with the same exact full-batch gradients
        import dataclasses as _dc

        params4 = params4.replace(hyper=_dc.replace(
            params4.hyper, grad_accum_chunks=8))
        nn = NeuralNetwork(arch, seed=666)
        law4 = LawA(nn, params4, head="log", prescale_bounds=prescale_bounds,
                    n_fourier=N_FOURIER)
        model4 = Model(iceflow=SIA2DModel(A=law4, n_value=3.0))
        inv4 = Inversion(model=model4, glaciers=glaciers, parameters=params4)
        theta_cold = jax.tree.map(lambda x: x.astype(jnp.float32), inv4.theta)
        tst4 = assemble_tstops(params4, inv4.glaciers)
        eval_true = jax.jit(lambda th, b: batch_transient_loss(th, b, model4,
                                                               params4, tst4))
        loss0_cold = float(eval_true(theta_cold, inv4.glaciers))

        # flat f64 dense-LM fit to the DEGRADED targets
        with tempfile.TemporaryDirectory() as td:
            fin, fout = os.path.join(td, "in.npz"), os.path.join(td, "out.npz")
            np.savez(fin, temps=np.asarray(temps, np.float64), A=a_deg,
                     widths=np.asarray(arch.widths),
                     acts=np.asarray(arch.activations),
                     seed=666, min_A=phys.min_A, max_A=phys.max_A, head="log",
                     prescale_bounds=np.asarray(prescale_bounds, np.float64),
                     iters=600, n_fourier=N_FOURIER, restarts=3)
            subprocess.run([sys.executable,
                            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                         "_pretrain_A_sub.py"), fin, fout],
                           check=True)
            fit = np.load(fout)
            th_pre = [{"w": fit[f"w{i}"], "b": fit[f"b{i}"]}
                      for i in range(len(arch.widths) - 1)]
        inv4.theta = {"A": [{k: jnp.asarray(v, jnp.float32) for k, v in l.items()}
                            for l in th_pre]}
        loss_pre = float(eval_true(inv4.theta, inv4.glaciers))

        from odinn_tpu.simulation.ensemble import multistart_train

        t0 = time.time()
        ms4 = multistart_train(inv4, n_restarts=4, init_scale=0.05, seed=7,
                               refine_top_k=1)
        t_tr4 = time.time() - t0
        n_epochs4 = sum(e for _, _, e in stages4)
        rels4 = np.asarray(a_rels(law4, inv4.theta, range(NG)))
        loss_best4 = float(ms4.best_loss)
        ratio4 = loss_best4 / loss0_cold
        improvement = loss_pre / loss_best4
        result["ude_nn_degraded"] = {
            "pipeline": "pretrain on classical A's + 5% multiplicative noise "
                        "(seed 42) -> 4-restart vmapped-Adam multistart over "
                        "jittered pretrain inits -> f32 PDE LM refinement on "
                        "the best survivor",
            "degraded_A_relerr_max": deg_rel,
            "train_s": round(t_tr4, 2), "niter": n_epochs4,
            "s_per_epoch": round(t_tr4 / n_epochs4, 3),
            "multistart": {
                "n_restarts": 4, "init_scale": 0.05,
                "post_adam_losses": [float(x) for x in ms4.final_losses],
                "best_idx": int(ms4.best_idx),
            },
            "loss0_cold": loss0_cold,
            "loss_pretrained": loss_pre,
            "loss_best": loss_best4,
            "finetune_improvement_x": improvement,
            "loss_ratio": ratio4,
            "A_relerr_max": float(rels4.max()),
            "A_relerr_median": float(np.median(rels4)),
            "A_relerr_min": float(rels4.min()),
            "gates": {"loss_ratio<=1e-6": bool(ratio4 <= 1e-6),
                      "relerr_max<=1e-3": bool(rels4.max() <= 1e-3),
                      "relerr_min<=1e-4": bool(rels4.min() <= 1e-4),
                      "finetune_improves": bool(improvement > 2.0)},
        }
        print(json.dumps(result["ude_nn_degraded"], indent=1), flush=True)

    # ---- part 5: the REAL-DATA path at scale ----
    # r3 verdict #4: every at-scale number used directly-constructed Halfar
    # pytrees. Here a heterogeneous fleet of OGGM-layout NetCDF glacier
    # directories (mixed grid sizes, rough DEMs, per-glacier monthly climate)
    # is written to disk, loaded back through initialize_glaciers (the real
    # ingestion path: h5py NetCDF, CF unpacking, mixed-grid stack padding),
    # and the production MB+LossHV training (part 3's config) runs on it.
    if "5" in parts:
        import tempfile

        from odinn_tpu.data.netcdf import write_glacier_nc
        from odinn_tpu.data.rgi import initialize_glaciers
        from odinn_tpu.data.synthetic import halfar_glacier, monthly_dummy_climate
        from odinn_tpu.losses.losses import LossHV, MultiLoss
        from odinn_tpu.physics.mass_balance import TImodel1

        rng = np.random.default_rng(7)
        temps5 = np.linspace(-25.0, -14.0, NG)
        sizes = [96, 112, 128]
        tspan5 = (5.0, 7.0)
        n_months = int(round((tspan5[1] - tspan5[0]) * 12)) + 1
        fleet_dir = tempfile.mkdtemp(prefix="odinn_fleet_")
        rgi_ids = []
        t0 = time.time()
        for i, t in enumerate(temps5):
            nx = sizes[i % len(sizes)]
            dx = float(rng.uniform(80.0, 120.0))
            clim = monthly_dummy_climate(tspan5[0], n_months,
                                         temp_mean=float(rng.uniform(-2.0, 0.0)),
                                         longterm_temp=float(t))
            g = halfar_glacier(nx=nx, ny=nx, dx=dx, temp=float(t),
                               rgi_id=f"RGI60-11.{i:05d}", climate=clim)
            # rough alpine DEM: low-frequency random topography on a 1800 m bed
            xg, yg = np.meshgrid(np.arange(nx), np.arange(nx), indexing="ij")
            rough = sum(
                rng.uniform(5.0, 25.0) * np.cos(
                    2 * np.pi * (rng.uniform(0.5, 3.0) * xg / nx
                                 + rng.uniform(0.5, 3.0) * yg / nx)
                    + rng.uniform(0, 2 * np.pi))
                for _ in range(6)
            )
            g = g.replace(B=jnp.asarray(1800.0 + rough, g.B.dtype))
            write_glacier_nc(fleet_dir, g, longterm_temp=float(t))
            rgi_ids.append(g.rgi_id)
        t_write = time.time() - t0

        stages5 = [("adam", 0.1, 60), ("adam", 0.02, 60), ("adam", 0.004, 60),
                   ("adam", 8e-4, 60), ("lm", 1e-2, 25)]
        params5 = make_params(stages5, gn_cg_iters=12, gn_glacier_norm=True,
                              use_MB=True, use_velocities=True,
                              loss=MultiLoss((LossHV(),), (1.0,)))
        t0 = time.time()
        glaciers5 = initialize_glaciers(rgi_ids, params5, prepro_dir=fleet_dir)
        t_load = time.time() - t0
        grid_sizes = sorted({(g.nx, g.ny) for g in glaciers5})

        tst5 = build_tstops(tspan5, params5.solver.step)
        truth5 = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0),
                       mass_balance=TImodel1())
        t0 = time.time()
        glaciers5 = generate_ground_truth(glaciers5, params5, truth5, tst5,
                                          store=("H", "V"))
        t_gt5 = time.time() - t0
        model5 = Model(iceflow=SIA2DModel(A=LawA_inversion(params5, scalar=True),
                                          n_value=3.0),
                       mass_balance=TImodel1())
        inv5 = Inversion(model=model5, glaciers=glaciers5, parameters=params5)
        inv5.theta = jax.tree.map(lambda x: x.astype(jnp.float32), inv5.theta)
        from odinn_tpu.simulation.inversion import assemble_tstops as _ats5

        mem5 = measure_epoch_memory(inv5, _ats5(params5, inv5.glaciers))
        t0 = time.time()
        res5 = run_inversion(inv5)
        t_tr5 = time.time() - t0
        L5 = res5.stats.losses
        a_rec5 = phys.min_A + (phys.max_A - phys.min_A) * (
            np.tanh(np.asarray(inv5.theta["A"], np.float64)) + 1) / 2
        a_ref5 = np.asarray([float(a_true_fn(jnp.asarray(float(t))))
                             for t in temps5])
        rels5 = np.abs(a_rec5 - a_ref5) / a_ref5
        ratio5 = float(res5.stats.final_loss / L5[0])
        result["real_data_mb_hv"] = {
            "source": "OGGM-layout NetCDF glacier directories -> "
                      "initialize_glaciers -> stack_glaciers (mixed-grid pad)",
            "grid_sizes": [list(s) for s in grid_sizes],
            "physics": "monthly TImodel1 MB + LossHV, rough DEMs, "
                       "per-glacier monthly climate",
            "hbm": mem5,
            "write_fleet_s": round(t_write, 2), "load_s": round(t_load, 2),
            "ground_truth_s": round(t_gt5, 2),
            "train_s": round(t_tr5, 2), "niter": res5.stats.niter,
            "s_per_epoch": round(t_tr5 / max(res5.stats.niter, 1), 3),
            "loss0": float(L5[0]), "loss_best": float(res5.stats.final_loss),
            "loss_ratio": ratio5,
            "A_relerr_max": float(rels5.max()),
            "A_relerr_median": float(np.median(rels5)),
            "A_relerr_min": float(rels5.min()),
            "gates": {"loss_ratio<=1e-6": bool(ratio5 <= 1e-6),
                      "relerr_max<=1e-3": bool(rels5.max() <= 1e-3),
                      "relerr_min<=1e-4": bool(rels5.min() <= 1e-4)},
        }
        print(json.dumps(result["real_data_mb_hv"], indent=1), flush=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "train_at_scale_result.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
