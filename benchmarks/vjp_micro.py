"""Per-VJP microbenchmarks — the reference's `benchmark/run.jl` counterpart.

The reference CI times `VJP_λ_∂SIA∂H` and `VJP_λ_∂SIA∂θ` for each VJP flavor
(EnzymeVJP / DiscreteVJP / ContinuousVJP) on one glacier with the default NN
LawA (/root/reference/benchmark/run.jl:57-72; results only ever posted as
ephemeral PR comments, BASELINE.md). This script measures the TPU-native
equivalents — `vjps.vjp_sia_dH` / `vjps.vjp_sia_dtheta` with AutoVJP (≡
EnzymeVJP: reverse-mode AD through the RHS), DiscreteVJP (hand stencil
transposes), ContinuousVJP — on one 128×128 glacier, f32.

Methodology: chained-dispatch slope, same as bench.py — K evaluations
serialized inside one jitted scan by a runtime-0 data coupling, reported
value = (t(K_hi) − t(K_lo)) / (K_hi − K_lo), i.e. pure device time per VJP
with dispatch/tunnel overhead differenced out.

Writes benchmarks/vjp_micro_result.json and prints a markdown table.
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

    from odinn_tpu.core.params import (
        Parameters,
        PhysicalParameters,
        SimulationParameters,
        SolverParameters,
        UDEParameters,
    )
    from odinn_tpu.data.synthetic import halfar_glacier
    from odinn_tpu.inverse.adjoint_types import AutoVJP, ContinuousVJP, DiscreteVJP
    from odinn_tpu.inverse import vjps
    from odinn_tpu.laws.laws import LawA
    from odinn_tpu.models.model import Model, SIA2DModel, init_theta
    from odinn_tpu.models.nn import NeuralNetwork, default_architecture

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    NX = NY = 128
    params = Parameters(
        physical=PhysicalParameters(min_A=8e-21, max_A=8e-18),
        simulation=SimulationParameters(
            tspan=(2010.0, 2015.0), use_MB=False, float_dtype="float32"
        ),
        solver=SolverParameters(step=1.0 / 12.0),
        UDE=UDEParameters(grad="discrete"),
    )
    glacier = halfar_glacier(nx=NX, ny=NY, dx=50.0, dy=50.0, temp=-16.0)
    glacier = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        glacier,
    )
    # default (non-light) architecture — what benchmark/run.jl's
    # NeuralNetwork(params) builds
    nn = NeuralNetwork(default_architecture(1), seed=1)
    model = Model(iceflow=SIA2DModel(A=LawA(nn, params)))
    theta = jax.tree.map(
        lambda x: x.astype(jnp.float32), init_theta(model, [glacier])
    )
    H = glacier.H0
    lam = jax.random.uniform(jax.random.PRNGKey(0), H.shape, jnp.float32)
    t = 2010.0

    def chained_dh(flavor):
        def body(carry, _):
            out = vjps.vjp_sia_dH(
                flavor, lam + carry, H, theta, glacier, 0, model, params, t
            )
            return jnp.asarray(0.0, jnp.float32) * jnp.sum(out), None

        def run(eps, K):
            return jax.lax.scan(body, eps, None, length=K)[0]

        return run

    def chained_dtheta(flavor):
        def body(carry, _):
            out = vjps.vjp_sia_dtheta(
                flavor, lam + carry, H, theta, glacier, 0, model, params, t
            )
            s = sum(jnp.sum(l) for l in jax.tree.leaves(out))
            return jnp.asarray(0.0, jnp.float32) * s, None

        def run(eps, K):
            return jax.lax.scan(body, eps, None, length=K)[0]

        return run

    def slope(run, k_lo=500, k_hi=2500, reps=7):
        def timed(K):
            g = jax.jit(lambda e: run(e, K))
            eps = jnp.asarray(0.0, jnp.float32)
            float(g(eps))  # compile + warm
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                float(g(eps))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        return (timed(k_hi) - timed(k_lo)) / (k_hi - k_lo)

    flavors = [
        ("EnzymeVJP(=AutoVJP)", AutoVJP()),
        ("DiscreteVJP", DiscreteVJP()),
        ("ContinuousVJP", ContinuousVJP()),
    ]
    results = {"grid": [NX, NY], "dtype": "float32",
               "backend": jax.default_backend(), "unit": "s/op",
               "methodology": "chained-dispatch slope (see module docstring)"}
    print("\n| VJP flavor | ∂SIA/∂H (µs) | ∂SIA/∂θ (µs) |")
    print("|---|---|---|")
    for name, flavor in flavors:
        s_dh = slope(chained_dh(flavor))
        s_dt = slope(chained_dtheta(flavor))
        results[name] = {"vjp_dH_s": s_dh, "vjp_dtheta_s": s_dt}
        print(f"| {name} | {s_dh*1e6:.1f} | {s_dt*1e6:.1f} |")

    out = os.path.join(os.path.dirname(__file__), "vjp_micro_result.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
