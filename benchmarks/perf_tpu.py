"""TPU performance study: RHS kernel paths and multi-glacier scaling.

Run on the TPU (default platform):  python benchmarks/perf_tpu.py

Scenarios:
  1. single fused RHS eval: XLA stencil path vs Pallas kernel
  2. forward solve (bench.py scenario) at several batch sizes
  3. UDE training epoch (forward + reverse AD + Adam) at 16/64/128 glaciers —
     the BASELINE.md north-star scenario ("100+ glaciers")
"""

import time

import numpy as np


def timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from odinn_tpu.core.params import (
        Hyperparameters,
        Parameters,
        PhysicalParameters,
        SimulationParameters,
        SolverParameters,
        UDEParameters,
    )
    from odinn_tpu.core.glacier import stack_glaciers
    from odinn_tpu.data.synthetic import halfar_glacier
    from odinn_tpu.laws.laws import CuffeyPaterson, LawA
    from odinn_tpu.models.model import Model, SIA2DModel, init_theta
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture
    from odinn_tpu.ops.pallas.sia_kernel import sia2d_rhs_pallas
    from odinn_tpu.physics.sia2d import SIAValues, sia2d_rhs
    from odinn_tpu.physics.targets import ATarget
    from odinn_tpu.simulation.inversion import batch_transient_loss
    from odinn_tpu.simulation.prediction import forward_batch, generate_ground_truth
    from odinn_tpu.simulation.solver import build_tstops

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    phys = PhysicalParameters(min_A=8e-21, max_A=8e-18)
    NX = 128

    def make_batch(n_g, dtype=jnp.float32):
        temps = np.linspace(-25.0, -13.0, n_g)
        gs = [halfar_glacier(nx=NX, ny=NX, dx=100.0, temp=float(t), rgi_id=f"p{i}")
              for i, t in enumerate(temps)]
        b = stack_glaciers(gs)
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x, b
        ), gs

    # ---- 1. RHS kernel paths ----
    for n_g in (4, 32):
        batch, _ = make_batch(n_g)
        vals = SIAValues(A=jnp.float32(6e-18), C=jnp.float32(0.0), n=jnp.float32(3.0),
                         p=jnp.float32(3.0), q=jnp.float32(0.0))
        tgt = ATarget()

        xla_rhs = jax.jit(jax.vmap(
            lambda H, B: sia2d_rhs(H, B, 100.0, 100.0, lambda hb, gs: vals, tgt, phys)))
        scal = jnp.tile(jnp.array([[100.0, 100.0, 6e-18, 0.0, 3.0, 3.0, 0.0]], jnp.float32),
                        (n_g, 1))
        pls_rhs = jax.jit(lambda H, B: sia2d_rhs_pallas(H, B, scal, phys.rho, phys.g, phys.eta0))

        t_xla = timeit(xla_rhs, batch.H0, batch.B, n=20)
        t_pls = timeit(pls_rhs, batch.H0, batch.B, n=20)
        bytes_touched = n_g * NX * NX * 4 * 3
        print(f"RHS n_g={n_g:3d}: XLA {t_xla*1e6:8.1f}us  Pallas {t_pls*1e6:8.1f}us  "
              f"(~{bytes_touched/t_xla/1e9:.0f} vs {bytes_touched/t_pls/1e9:.0f} GB/s eff)")

    # ---- 2. forward solve scaling across solver paths ----
    tstops = build_tstops((5.0, 10.0), 1 / 12)
    model_c = Model(iceflow=SIA2DModel(A=CuffeyPaterson(), n_value=3.0))
    solver_cfgs = [
        ("RK4x25", SolverParameters(step=1 / 12, substeps=25)),
        ("RKC-25", SolverParameters(step=1 / 12, substeps=1, solver="RKC", rkc_stages=25)),
        ("SI-cg20", SolverParameters(step=1 / 12, substeps=1, solver="SI", cg_iters=20)),
    ]
    for n_g in (4, 64):
        batch, _ = make_batch(n_g)
        for label, solver in solver_cfgs:
            params = Parameters(
                physical=phys,
                simulation=SimulationParameters(tspan=(5.0, 10.0), use_MB=False,
                                                use_velocities=False, float_dtype="float32"),
                solver=solver,
                UDE=UDEParameters(grad="jax"),
            )
            fwd = jax.jit(lambda b: forward_batch(None, b, model_c, params, tstops))
            t = timeit(fwd, batch, n=3)
            print(f"forward 5yr n_g={n_g:3d} {label:8s}: {t:7.3f}s  ({t/n_g*1000:6.1f} ms/glacier)")
    params = Parameters(
        physical=phys,
        simulation=SimulationParameters(tspan=(5.0, 10.0), use_MB=False,
                                        use_velocities=False, float_dtype="float32"),
        solver=SolverParameters(step=1 / 12, substeps=1, solver="SI", cg_iters=20),
        UDE=UDEParameters(grad="jax"),
    )

    # ---- 3. UDE training epoch ----
    nn = NeuralNetwork(default_architecture(1), seed=666)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params), n_value=3.0))
    params2 = params.replace(
        simulation=SimulationParameters(tspan=(5.0, 7.0), use_MB=False,
                                        use_velocities=False, float_dtype="float32"))
    tstops2 = build_tstops((5.0, 7.0), 1 / 12)
    opt = optax.adam(1e-2)
    for n_g in (16, 64, 128):
        batch, gs = make_batch(n_g)
        gt = generate_ground_truth(gs, params2, model_c, tstops2, store=("H",))
        batch = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
            stack_glaciers(gt))
        theta = init_theta(model, batch, dtype=jnp.float32)
        state = opt.init(theta)

        @jax.jit
        def epoch(theta, state, batch):
            val, g = jax.value_and_grad(
                lambda th: batch_transient_loss(th, batch, model, params2, tstops2))(theta)
            upd, state = opt.update(g, state, theta)
            return optax.apply_updates(theta, upd), state, val

        t = timeit(lambda b: epoch(theta, state, b), batch, n=3)
        print(f"UDE epoch (fwd+grad+adam) 2yr n_g={n_g:3d}: {t:7.3f}s  "
              f"({t/n_g*1000:6.1f} ms/glacier)")


if __name__ == "__main__":
    main()
