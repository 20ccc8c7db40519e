"""Multi-process (multi-host axis) distribution.

The reference distributes across worker PROCESSES (Distributed.jl,
/root/reference/src/setup/config.jl:97-139) — the one distribution axis the
single-process mesh tests cannot cover. Here a 2-process × 4-virtual-device
``jax.distributed`` job (Gloo collectives over localhost, the DCN stand-in)
runs the FULL ``train_ude`` with the glacier axis spanning the process
boundary; each worker asserts loss/θ equality with its own single-device run
(odinn_tpu/parallel/mp_worker.py).
"""

import json

import numpy as np
import pytest


@pytest.mark.slow  # ~2 min: two subprocesses each compile the tiny problem
def test_two_process_train_matches_single_process():
    from odinn_tpu.parallel.multiprocess import launch_local_workers

    outs = launch_local_workers(2, 4, [])
    marker = [l for l in outs[0].splitlines() if l.startswith("MP_OK")]
    assert marker, f"no MP_OK marker in worker 0 output:\n{outs[0][-2000:]}"
    payload = json.loads(marker[0][len("MP_OK "):])
    assert payload["processes"] == 2
    assert payload["global_devices"] == 8
    assert np.isfinite(payload["final_loss"])
    # the workers asserted equality internally; losses must be decreasing-ish
    assert payload["losses"][-1] < payload["losses"][0]
