"""Multi-process (multi-host) distribution.

The reference's only distribution axis is worker *processes*
(Distributed.jl ``addprocs`` + pmap over per-glacier batches,
/root/reference/src/setup/config.jl:97-139). The TPU-native double:
``jax.distributed`` joins N processes into ONE global device mesh, and the
exact same mesh/psum machinery used for single-process scale-out
(:mod:`odinn_tpu.parallel.mesh`) rides on top — ``train_ude(inv, mesh=...)``
with the glacier axis spanning process boundaries, no code changes above
this layer.

Axis → interconnect mapping for real pods (SURVEY §2.9; the scaling-book
recipe):

- the **glacier (dp) axis** goes OUTERMOST and may span hosts/slices: its
  only collective is one θ-gradient ``psum`` per step (latency-tolerant,
  bandwidth-light — θ is the NN, a few kB), which XLA hierarchically reduces
  over ICI within a slice and crosses DCN once;
- the **spatial ``rows`` axis** (:mod:`odinn_tpu.parallel.spatial`) must stay
  INSIDE a slice: its per-RHS halo exchanges are latency-critical and belong
  on ICI. ``Mesh(devices.reshape(n_hosts*g_per_host, rows), ("glaciers",
  "rows"))`` with rows contiguous within a host gives exactly this.

On this dev box the axis is validated with 2 CPU processes × 4 virtual
devices each (Gloo collectives over localhost — the DCN stand-in), driven by
:mod:`odinn_tpu.parallel.mp_worker` / ``__graft_entry__.dryrun_multiprocess``.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = [
    "init_distributed",
    "global_mesh",
    "is_multiprocess",
    "gather_to_host",
    "launch_local_workers",
]


def init_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    devices_per_process: Optional[int] = None,
    platform: Optional[str] = None,
) -> int:
    """Join this process into a ``jax.distributed`` job; returns the global
    device count.

    Must run before any JAX backend touch. ``devices_per_process`` forces
    that many virtual CPU host devices (the multi-process CPU test rig);
    leave it None on real TPU pods where the runtime knows its local chips.
    """
    if devices_per_process is not None:
        os.environ["JAX_PLATFORMS"] = platform or "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={devices_per_process}"
            )
    import jax

    if devices_per_process is not None:
        jax.config.update("jax_platforms", platform or "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return len(jax.devices())


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def global_mesh(axis_name: str = "glaciers"):
    """1-D mesh over ALL global devices (every process's), glacier axis
    spanning process boundaries — build AFTER :func:`init_distributed`."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))


def gather_to_host(tree):
    """Materialize a (possibly cross-process-sharded) pytree as host numpy on
    EVERY process (``multihost_utils.process_allgather``) — how per-glacier
    results come home when their shards live on another host's devices."""
    import jax
    from jax.experimental import multihost_utils

    return jax.tree.map(
        lambda x: multihost_utils.process_allgather(x, tiled=True), tree
    )


def launch_local_workers(num_processes: int, devices_per_process: int,
                         worker_argv, timeout: float = 600.0):
    """Spawn ``num_processes`` local worker processes forming one distributed
    job (the test rig for the multi-process axis; real pods launch one
    process per host via their own runner). Each worker runs

        python -m odinn_tpu.parallel.mp_worker <pid> <nproc> <port> <devs> *argv

    Returns the list of per-worker combined stdout+stderr strings; raises on
    timeout or any nonzero exit with the failing worker's output.
    """
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)          # worker sets its own
    env["XLA_FLAGS"] = ""                   # scrub any inherited device count
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = repo + (os.pathsep + pp if pp else "")
    procs = []
    for pid in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "odinn_tpu.parallel.mp_worker",
             str(pid), str(num_processes), str(port), str(devices_per_process),
             *map(str, worker_argv)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(f"multiprocess worker {pid} timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"multiprocess worker {pid} failed (rc={p.returncode}):\n{out}"
            )
    return outs
