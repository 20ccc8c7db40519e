"""Device-memory accounting.

SURVEY §5 asks for s/epoch + HBM evidence at scale. Two sources, best first:

- ``device.memory_stats()`` — live allocator stats (peak/in-use). Real TPU
  runtimes expose it; the tunneled axon dev backend returns None.
- ``Compiled.memory_analysis()`` — the XLA compiler's own HBM budget for one
  executable: argument + output + temp (the live-intermediate high-water
  mark, which for a fwd+grad training step is dominated by the stored/
  rematerialized trajectory). This is the number the compiler allocates
  against, so it is the honest "does it fit" figure — and it is exactly what
  the r3 scaling curve's 15.75 GiB OOM at 512 unchunked glaciers was about.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

__all__ = ["live_hbm_gib", "compiled_hbm_gib", "aot_step_memory"]


def live_hbm_gib() -> Optional[Dict[str, float]]:
    """Allocator stats of device 0 in GiB, or None where unsupported
    (e.g. the tunneled axon backend)."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    out = {}
    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if k in stats:
            out[k.replace("bytes", "gib")] = round(stats[k] / 2**30, 3)
    return out or None


def compiled_hbm_gib(compiled) -> Dict[str, float]:
    """XLA's HBM budget for one compiled executable, in GiB."""
    ma = compiled.memory_analysis()
    gib = lambda b: round(b / 2**30, 3)
    return {
        "args_gib": gib(ma.argument_size_in_bytes),
        "output_gib": gib(ma.output_size_in_bytes),
        "temp_gib": gib(ma.temp_size_in_bytes),
        "aliased_gib": gib(ma.alias_size_in_bytes),
        # what the executable needs resident: args + outputs + scratch,
        # minus buffers aliased onto the inputs (donated θ/opt state)
        "total_gib": gib(
            ma.argument_size_in_bytes + ma.output_size_in_bytes
            + ma.temp_size_in_bytes - ma.alias_size_in_bytes
        ),
    }


def aot_step_memory(fn, *args, **kwargs):
    """Lower+compile ``fn`` ahead of time; returns ``(compiled, memory)``
    where memory = compiler budget (+ live allocator stats when available).

    Use the returned ``compiled`` for the timed loop so the measured program
    is the audited program.
    """
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    mem: Dict[str, Any] = compiled_hbm_gib(compiled)
    live = live_hbm_gib()
    if live:
        mem["allocator"] = live
    return compiled, mem
