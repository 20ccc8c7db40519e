"""Pallas-vs-XLA roofline study for the fused RKC-interval kernel.

Round-1 result: at 128² grids both paths were at parity (~overhead/VPU-bound).
This study measures where (if anywhere) the fused-interval kernel's HBM-traffic
argument wins: grid sizes 128/256/512, several glacier-block sizes, f32, on
the real chip. For each config it reports time per interval, achieved
effective HBM GB/s and VPU GFLOP/s, against the chip's roofline
(v5e: ~819 GB/s HBM BW, ~0.9 TFLOP/s f32 VPU-ish envelope).

Writes benchmarks/pallas_roofline_result.json; docs/pallas_kernels.md holds
the conclusions.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_chained(interval_fn, H, B, scal, chain=50, n=5):
    """Median per-interval time with `chain` intervals fused in one jit —
    per-call dispatch latency (~30 ms over the tunneled backend) would
    otherwise swamp sub-ms kernels."""
    import jax
    from jax import lax

    @jax.jit
    def run(H, B, scal):
        return lax.fori_loop(0, chain, lambda k, h: interval_fn(h, B, scal), H)

    out = run(H, B, scal)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(H, B, scal)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / chain


def main():
    import jax
    import jax.numpy as jnp

    from odinn_tpu.ops.pallas.rkc_kernel import (
        derived_scalars,
        rkc_interval_pallas,
        _forward,
        rkc_interval_reference,
    )

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}", flush=True)
    rho, g = 900.0, 9.81
    s_stages = 16
    dt = 1.0 / 12.0 / 4.0
    eta0 = 1.0  # slope limiter scale
    results = []

    for nx in (128, 256, 512):
        for n_g in (8, 16):
            # VMEM budget: the kernel holds ~7 (G, nx, ny) f32 arrays resident.
            # Pick the largest block that fits in ~12 MB usable VMEM.
            vmem_per_g = 7 * nx * nx * 4
            g_block = max(1, min(8, int(12e6 // vmem_per_g)))
            key = jax.random.PRNGKey(0)
            H = 300.0 * jax.random.uniform(key, (n_g, nx, nx), jnp.float32)
            B = 1000.0 + 50.0 * jax.random.normal(jax.random.PRNGKey(1), (n_g, nx, nx)).astype(jnp.float32)
            A = jnp.full((n_g,), 6e-18, jnp.float32)
            C = jnp.zeros((n_g,), jnp.float32)
            n_exp = jnp.full((n_g,), 3.0, jnp.float32)
            scal = derived_scalars(
                jnp.full((n_g,), 100.0, jnp.float32), jnp.full((n_g,), 100.0, jnp.float32),
                A, C, n_exp, jnp.full((n_g,), 3.0, jnp.float32), jnp.zeros((n_g,), jnp.float32),
                rho, g,
            ).astype(jnp.float32)

            xla_fn = lambda h, b, sc: rkc_interval_reference(h, b, sc, dt, s_stages, eta0)
            pall_fn = lambda h, b, sc: _forward(h, b, sc, dt, s_stages, eta0,
                                                (5.0, 2.0, 4.0, 2.0), g_block=g_block)
            try:
                t_x = time_chained(xla_fn, H, B, scal)
            except Exception as e:  # noqa: BLE001
                print(f"XLA {nx}² n_g={n_g} failed: {e}", flush=True)
                continue
            from odinn_tpu.ops.pallas.rkc_kernel import unsupported_reason

            reason = unsupported_reason(nx, nx, g_block)
            if reason is not None:
                # the kernel refuses this shape up front (512² g_block=1
                # Mosaic broadcast limit / VMEM budget) — record the reason,
                # never a NaN row
                row = {"nx": nx, "n_g": n_g, "g_block": g_block,
                       "stages": s_stages, "skipped": reason}
                results.append(row)
                print(json.dumps(row), flush=True)
                continue
            try:
                t_p = time_chained(pall_fn, H, B, scal)
                err = float(jnp.max(jnp.abs(
                    jax.jit(pall_fn)(H, B, scal) - jax.jit(xla_fn)(H, B, scal))))
            except Exception as e:  # noqa: BLE001
                print(f"Pallas {nx}² n_g={n_g} g_block={g_block} failed: {e}", flush=True)
                row = {"nx": nx, "n_g": n_g, "g_block": g_block,
                       "stages": s_stages, "skipped": f"{type(e).__name__}: {e}"}
                results.append(row)
                continue

            # FLOP model: the fused RHS is ~70 flops/cell; s+1 evaluations
            # per interval + ~10 flops/cell/stage of axpy updates.
            flops = n_g * nx * nx * ((s_stages + 1) * 70 + s_stages * 10)
            # minimal HBM traffic: read H,B + write H' once per interval
            bytes_min = n_g * nx * nx * 4 * 3
            # XLA-path traffic: per stage, read y,B (+H,f0) and write y'
            bytes_xla = n_g * nx * nx * 4 * (s_stages * 5 + 3)
            row = {
                "nx": nx, "n_g": n_g, "g_block": g_block, "stages": s_stages,
                "t_xla_ms": round(t_x * 1e3, 3), "t_pallas_ms": round(t_p * 1e3, 3),
                "speedup": round(t_x / t_p, 3) if t_p == t_p else None,
                "max_abs_diff": err,
                "xla_gflops": round(flops / t_x / 1e9, 1),
                "pallas_gflops": round(flops / t_p / 1e9, 1) if t_p == t_p else None,
                "xla_model_gbs": round(bytes_xla / t_x / 1e9, 1),
                "pallas_min_gbs": round(bytes_min / t_p / 1e9, 2) if t_p == t_p else None,
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    with open("benchmarks/pallas_roofline_result.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
