"""Worker entry for the multi-process distribution dryrun.

One process of an N-process ``jax.distributed`` job (the TPU-native double of
one Distributed.jl worker, /root/reference/src/setup/config.jl:97-139). The
worker is self-verifying:

1. runs the reference training single-device (no mesh — purely local), then
2. runs the SAME training through ``train_ude`` on the global mesh whose
   glacier axis spans every process's devices (collectives cross the
   process boundary — Gloo on the CPU rig, DCN on real pods), and
3. asserts per-epoch loss and final-θ equality between the two.

Launched by :func:`odinn_tpu.parallel.multiprocess.launch_local_workers`;
process 0 prints the ``MP_OK`` marker line the harness checks.

Usage: python -m odinn_tpu.parallel.mp_worker <pid> <nproc> <port> <devs>
"""

from __future__ import annotations

import json
import sys


def main(argv=None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    pid, nproc, port, devs = int(argv[0]), int(argv[1]), argv[2], int(argv[3])

    from odinn_tpu.parallel.multiprocess import global_mesh, init_distributed

    n_global = init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
        devices_per_process=devs,
    )

    import jax
    import numpy as np

    assert jax.process_count() == nproc
    assert n_global == nproc * devs, (n_global, nproc, devs)

    import __graft_entry__ as ge

    from odinn_tpu.core.params import Hyperparameters
    from odinn_tpu.simulation.inversion import Inversion, train_ude

    n_g = max(n_global, 4)
    params, model, batch, theta, tstops = ge._build_problem(
        nx=24, ny=24, n_glaciers=n_g, tspan=(5.0, 5.25), substeps=2
    )
    params = params.replace(hyper=Hyperparameters(
        optimizer="adam", learning_rate=1e-3, epochs=3, batch_size=n_g,
    ))

    # 1) purely process-local reference (no mesh): every process computes the
    # same single-device run — the equality oracle
    inv_ref = Inversion(model=model, glaciers=batch, parameters=params,
                        theta=jax.tree.map(lambda x: x.copy(), theta))
    res_ref = train_ude(inv_ref)

    # 2) the global mesh: glacier axis spans all processes' devices
    mesh = global_mesh()
    assert len(mesh.devices.ravel()) == n_global
    n_procs_spanned = len({d.process_index for d in mesh.devices.ravel()})
    assert n_procs_spanned == nproc, "mesh must span every process"
    inv_mp = Inversion(model=model, glaciers=batch, parameters=params,
                       theta=jax.tree.map(lambda x: x.copy(), theta))
    res_mp = train_ude(inv_mp, mesh=mesh)

    # 3) equality: the cross-process psum must reproduce the local run
    np.testing.assert_allclose(res_mp.stats.losses, res_ref.stats.losses,
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(inv_mp.theta), jax.tree.leaves(inv_ref.theta)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)

    if pid == 0:
        print("MP_OK " + json.dumps({
            "processes": nproc,
            "devices_per_process": devs,
            "global_devices": n_global,
            "losses": [float(v) for v in res_mp.stats.losses],
            "final_loss": float(res_mp.stats.final_loss),
        }), flush=True)


if __name__ == "__main__":
    main()
